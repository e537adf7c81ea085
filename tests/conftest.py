"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initialises its backends, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This box's sitecustomize force-registers a remote-TPU PJRT plugin ("axon")
# in every interpreter; merely *initialising* it costs minutes even when
# JAX_PLATFORMS=cpu. Tests run on the virtual CPU mesh, so drop the factory
# before any backend initialises (backends are created lazily at first op).
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_xb._topology_factories.pop("axon", None)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
