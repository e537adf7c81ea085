"""Device mesh and sharding helpers.

The reference has no parallelism at all (single ``device`` string,
``multi_qubit_any_state/main.py:88``; no ``torch.distributed`` anywhere —
SURVEY.md §2.2). The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``:

- ``data`` axis — batch-sharded training steps and sampling scans. Params
  are replicated; with sharded batch inputs under ``jit`` XLA inserts the
  gradient all-reduce over ICI automatically.
- ``model`` axis — reserved for the transformer stretch config (shard MLP
  hidden / attention heads); size 1 for all reference-parity workloads,
  which fit one chip.

All of the reference's workloads fit a single TPU chip; multi-chip is a
throughput multiplier, not a necessity (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry point: ``jax.distributed.initialize`` wrapper.

    The SURVEY §2.2 planned equivalent of a distributed comm backend (the
    reference has none). On a multi-host TPU slice, call this once per
    process before any other JAX API; ``jax.devices()`` then spans the
    whole slice and :func:`make_mesh` lays the global mesh over it, with
    collectives riding ICI.

    Single-process runs (``num_processes`` in {None on a non-TPU-pod
    environment, 1}) are a no-op returning False, so the call is safe to
    leave in entry points unconditionally. On TPU pods all three arguments
    may be None — JAX autodetects them from the runtime environment.
    """
    import os

    if num_processes == 1:
        return False
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and not any(
            os.environ.get(v)
            for v in ("JAX_COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS")
        )
    ):
        return False  # no coordinator configured — single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(
    data: int = -1, model: int = 1, devices=None
) -> Mesh:
    """Create a ('data', 'model') mesh.

    ``data=-1`` uses all remaining devices after the model axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_data(mesh: Mesh, array) -> jax.Array:
    """Place an array with its leading axis sharded over the 'data' axis.

    Pads implicitly via the caller: the leading dim must divide evenly; the
    training loop guarantees this by dropping the remainder batch.
    """
    return jax.device_put(array, data_sharding(mesh, array.ndim))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


# --- Tensor (model) parallelism for the transformer denoiser ---------------
#
# Megatron-style layout: attention QKV projections and the MLP up-projection
# shard their *output* features over 'model'; the attention output and MLP
# down-projection shard their *input* features, so each block needs exactly
# one all-reduce per sublayer (inserted automatically by XLA from these
# shardings).

_TP_RULES = (
    # (path-suffix match, partition spec builder by param ndim)
    ("attn/query/kernel", lambda nd: P(*([None] * (nd - 2)), MODEL_AXIS, None)),
    ("attn/key/kernel", lambda nd: P(*([None] * (nd - 2)), MODEL_AXIS, None)),
    ("attn/value/kernel", lambda nd: P(*([None] * (nd - 2)), MODEL_AXIS, None)),
    ("attn/out/kernel", lambda nd: P(MODEL_AXIS, *([None] * (nd - 1)))),
    ("mlp1/kernel", lambda nd: P(*([None] * (nd - 1)), MODEL_AXIS)),
    ("mlp1/bias", lambda nd: P(MODEL_AXIS)),
    ("mlp2/kernel", lambda nd: P(MODEL_AXIS, *([None] * (nd - 1)))),
)


def transformer_param_shardings(mesh: Mesh, params):
    """NamedSharding tree for transformer params: TP over 'model'.

    Non-matching params (embeddings, norms, FiLM, head) replicate. Works on
    any pytree whose leaf paths end with the kernel names — the params tree
    itself, and equally Adam's ``mu``/``nu`` moment trees inside a
    TrainState (they mirror the param structure), so a whole train state
    can be placed with one call.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        spec = P()
        for suffix, builder in _TP_RULES:
            if name.endswith(suffix) and leaf.ndim >= 1:
                spec = builder(leaf.ndim)
                break
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_state(mesh: Mesh, state):
    """Place a TrainState for the mesh: TP param/moment shardings when the
    'model' axis is nontrivial, replication otherwise.

    The TP specs are matched by path suffix across the WHOLE state tree, so
    Adam's ``mu``/``nu`` (which mirror the param tree) land on the same
    devices as their params — the optimizer update then needs no resharding
    and XLA keeps it fully local per model shard.
    """
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return replicate(mesh, state)
    shardings = transformer_param_shardings(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def shard_params(mesh: Mesh, params, shardings=None):
    """Place params per a sharding tree (default: transformer TP rules)."""
    if shardings is None:
        shardings = transformer_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
