"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu import train as training
from ddqst_tpu.config import ModelConfig, TrainConfig
from ddqst_tpu.models import build_model
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules
from ddqst_tpu.parallel import mesh as pm

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    m = pm.make_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m = pm.make_mesh()  # all devices on data
    assert m.shape["data"] == len(jax.devices())


def test_data_parallel_training_matches_single_device(key):
    """DP training over the mesh gives the same losses as single-device."""
    n = 2
    model = build_model(
        ModelConfig(embed_dim=8, hidden_dim=32, num_blocks=1,
                    input_encoding="token"), n, 8,
    )
    sched = schedules.cosine_schedule(8)
    cfg = TrainConfig(batch_size=64, num_epochs=3, optimizer="adam",
                      log_every=0, eval_every=0)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (256, n)), jnp.int8)
    basis = jnp.asarray(rng.integers(0, 9, (256,)), jnp.int32)

    _, losses_single = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    mesh = pm.make_mesh(data=8, model=1)
    _, losses_dp = training.fit(
        key, model, bits, basis, cfg, sched, mesh=mesh,
        log_fn=lambda *a: None,
    )
    np.testing.assert_allclose(
        np.asarray(losses_single), np.asarray(losses_dp), rtol=2e-4, atol=2e-5
    )


def test_tensor_parallel_transformer_matches_replicated(key):
    """TP-sharded transformer forward == replicated forward numerically."""
    n = 4
    model = build_model(
        ModelConfig(arch="transformer", embed_dim=16, hidden_dim=64,
                    num_blocks=2, num_heads=2), n, 8,
    )
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2, (16, n)), jnp.int8)
    t = jnp.ones((16,), jnp.int32)
    b = jnp.zeros((16,), jnp.int32)
    params = model.init(key, x, t, b)["params"]
    out_ref = model.apply({"params": params}, x, t, b)

    mesh = pm.make_mesh(data=4, model=2)
    sharded = pm.shard_params(mesh, params)
    # Verify something actually got sharded over 'model'.
    leaves = jax.tree_util.tree_leaves_with_path(sharded)
    sharded_any = any(
        "model" in str(leaf.sharding.spec) for _, leaf in leaves
    )
    assert sharded_any
    out_tp = jax.jit(lambda p, x, t, b: model.apply({"params": p}, x, t, b))(
        sharded, pm.shard_data(mesh, x), t, b
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_tp), atol=2e-5
    )


def test_tensor_parallel_training_experiment_scale(key):
    """TP TRAINING at the N=10 experiment widths (shadow_transformer's
    embed 256 / hidden 1024 / 8 heads — the '3x model' of RESULTS.md's
    capacity study, depth cut to 2 blocks for CPU time): `fit` over a
    4x2 mesh with a nontrivial 'model' axis must (a) keep the attention/
    MLP kernels and their Adam moments sharded over 'model' end to end,
    and (b) produce the same losses as single-device training."""
    n = 10
    model = build_model(
        ModelConfig(arch="transformer", input_encoding="token",
                    embed_dim=256, hidden_dim=1024, num_blocks=2,
                    num_heads=8), n, 8,
    )
    sched = schedules.cosine_schedule(8)
    cfg = TrainConfig(batch_size=64, num_epochs=2, optimizer="adam",
                      log_every=0, eval_every=0)
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (256, n)), jnp.int8)
    basis = jnp.asarray(rng.integers(0, 3, (256, n)), jnp.int32)

    state_single, losses_single = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    mesh = pm.make_mesh(data=4, model=2)
    state_tp, losses_tp = training.fit(
        key, model, bits, basis, cfg, sched, mesh=mesh,
        log_fn=lambda *a: None,
    )
    np.testing.assert_allclose(
        np.asarray(losses_single), np.asarray(losses_tp),
        rtol=2e-4, atol=2e-5,
    )
    # Params AND Adam moments must still be model-sharded after the run.
    def sharded_leaves(tree):
        return [
            leaf for _, leaf in jax.tree_util.tree_leaves_with_path(tree)
            if hasattr(leaf, "sharding")
            and "model" in str(leaf.sharding.spec)
        ]

    assert len(sharded_leaves(state_tp.params)) >= 7 * 2  # 7 rules x blocks
    assert len(sharded_leaves(state_tp.opt_state)) >= 7 * 2 * 2  # mu + nu


def test_sharded_sampling(key):
    """p_sample over a batch sharded across the data axis."""
    mesh = pm.make_mesh(data=8, model=1)
    s = schedules.cosine_schedule(5)

    def fn(x, t, b):
        return jnp.zeros(x.shape + (2,), jnp.float32)

    basis = pm.shard_data(mesh, jnp.zeros((64,), jnp.int32))
    out = jax.jit(lambda k, b: diff.p_sample(k, fn, b, 3, s))(key, basis)
    assert out.shape == (64, 3)
    assert 0.2 < float(jnp.mean(out)) < 0.8


def test_grid_sampler_sharded(key):
    mesh = pm.make_mesh(data=8, model=1)
    s = schedules.cosine_schedule(5)

    def fn(x, t, b):
        return jnp.zeros(x.shape + (2,), jnp.float32)

    basis = pm.shard_data(mesh, jnp.zeros((160,), jnp.int32))
    out = jax.jit(
        lambda k, b: diff.p_sample_grid(k, fn, b, 2, s)
    )(key, basis)
    assert out.shape == (160, 2)

def test_init_distributed_single_process_noop():
    """Single-process runs (this environment) must be a safe no-op; the hook
    completes SURVEY §2.2's jax.distributed entry point."""
    from ddqst_tpu.parallel import init_distributed

    assert init_distributed(num_processes=1) is False
    # No multi-host coordinator env vars on this box -> autodetect no-ops.
    assert init_distributed() is False
