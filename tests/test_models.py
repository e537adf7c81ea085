"""Denoiser model tests: shapes, both encodings, transformer, param counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.config import ModelConfig
from ddqst_tpu.models import ConditionalD3PM, TransformerDenoiser, build_model
from ddqst_tpu.models.transformer import basis_idx_to_labels, labels_to_basis_idx


def _init_and_apply(model, key, n, batch=4, basis_shape=None):
    x = jnp.zeros((batch, n), dtype=jnp.int8)
    t = jnp.ones((batch,), dtype=jnp.int32)
    b = jnp.zeros(basis_shape or (batch,), dtype=jnp.int32)
    params = model.init(key, x, t, b)
    return params, model.apply(params, x, t, b)


@pytest.mark.parametrize("encoding", ["float", "token"])
def test_film_mlp_shapes(encoding, key):
    model = ConditionalD3PM(
        num_qubits=3, num_bases=27, num_timesteps=10,
        embed_dim=16, hidden_dim=32, num_blocks=2, input_encoding=encoding,
    )
    _, out = _init_and_apply(model, key, 3)
    assert out.shape == (4, 3, 2)
    assert out.dtype == jnp.float32


def test_film_mlp_conditioning_matters(key):
    model = ConditionalD3PM(
        num_qubits=2, num_bases=9, num_timesteps=10,
        embed_dim=8, hidden_dim=16, num_blocks=1,
    )
    x = jnp.zeros((2, 2), dtype=jnp.int8)
    t = jnp.ones((2,), dtype=jnp.int32)
    params = model.init(key, x, t, jnp.zeros((2,), jnp.int32))
    out_b0 = model.apply(params, x, t, jnp.array([0, 0]))
    out_b1 = model.apply(params, x, t, jnp.array([1, 1]))
    assert not np.allclose(np.asarray(out_b0), np.asarray(out_b1))


def test_transformer_shapes(key):
    model = TransformerDenoiser(
        num_qubits=5, num_timesteps=10, embed_dim=16, hidden_dim=32,
        num_blocks=2, num_heads=2,
    )
    _, out = _init_and_apply(model, key, 5)
    assert out.shape == (4, 5, 2)


def test_transformer_per_qubit_basis(key):
    model = TransformerDenoiser(
        num_qubits=4, num_timesteps=10, embed_dim=16, hidden_dim=32,
        num_blocks=1, num_heads=2,
    )
    x = jnp.zeros((3, 4), dtype=jnp.int8)
    t = jnp.ones((3,), dtype=jnp.int32)
    idx = jnp.array([0, 5, 80], dtype=jnp.int32)
    params = model.init(key, x, t, idx)
    out_idx = model.apply(params, x, t, idx)
    out_lab = model.apply(params, x, t, basis_idx_to_labels(idx, 4))
    np.testing.assert_allclose(np.asarray(out_idx), np.asarray(out_lab), atol=1e-6)


def test_basis_idx_label_roundtrip():
    idx = jnp.arange(27, dtype=jnp.int32)
    labels = basis_idx_to_labels(idx, 3)
    back = labels_to_basis_idx(labels)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))
    # Canonical order check: index 0 = XXX, last = ZZZ; first char slowest.
    np.testing.assert_array_equal(np.asarray(labels[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(labels[26]), [2, 2, 2])
    np.testing.assert_array_equal(np.asarray(labels[1]), [0, 0, 1])


def test_transformer_param_count_independent_of_n(key):
    def count(n):
        m = TransformerDenoiser(
            num_qubits=n, num_timesteps=10, embed_dim=16, hidden_dim=32,
            num_blocks=1, num_heads=2,
        )
        p, _ = _init_and_apply(m, key, n)
        sizes = jax.tree_util.tree_map(lambda a: a.size, p)
        total = sum(jax.tree_util.tree_leaves(sizes))
        pos = 16 * n  # only the positional table grows with N
        return total - pos

    assert count(4) == count(10)


def test_build_model_from_config(key):
    cfg = ModelConfig(arch="film_mlp", input_encoding="token", embed_dim=8,
                      hidden_dim=16, num_blocks=1)
    m = build_model(cfg, num_qubits=2, num_timesteps=10)
    _, out = _init_and_apply(m, key, 2)
    assert out.shape == (4, 2, 2)
    cfg_t = ModelConfig(arch="transformer", embed_dim=8, hidden_dim=16,
                        num_blocks=1, num_heads=2)
    m = build_model(cfg_t, num_qubits=2, num_timesteps=10)
    _, out = _init_and_apply(m, key, 2)
    assert out.shape == (4, 2, 2)


def test_bfloat16_compute_path(key):
    model = ConditionalD3PM(
        num_qubits=2, num_bases=9, num_timesteps=10, embed_dim=8,
        hidden_dim=16, num_blocks=1, dtype=jnp.bfloat16,
    )
    params, out = _init_and_apply(model, key, 2)
    assert out.dtype == jnp.float32  # logits upcast at the head
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32  # params stay f32

def test_plain_mlp_shapes_and_param_parity(key):
    """PlainMLP mirrors the notebook SimpleMLP: for N=1, embed 32, hidden
    128, 2 hidden layers, the torch model has
    (65*128+128) + (128*128+128) + (128*2+2) + (101*32) + (3*32) MLP+embed
    params (notebook cell 6)."""
    from ddqst_tpu.models import PlainMLP

    model = PlainMLP(num_qubits=1, num_bases=3, num_timesteps=100,
                     embed_dim=32, hidden_dim=128, num_blocks=2)
    params, out = _init_and_apply(model, key, 1)
    assert out.shape == (4, 1, 2)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    expected = (65 * 128 + 128) + (128 * 128 + 128) + (128 * 2 + 2) \
        + 101 * 32 + 3 * 32
    assert n_params == expected


def test_plain_mlp_build_and_conditioning(key):
    cfg = ModelConfig(arch="plain_mlp", embed_dim=8, hidden_dim=16,
                      num_blocks=2)
    model = build_model(cfg, 2, 10)
    x = jnp.zeros((2, 2), dtype=jnp.int8)
    t = jnp.ones((2,), dtype=jnp.int32)
    params = model.init(key, x, t, jnp.zeros((2,), jnp.int32))
    out_b0 = model.apply(params, x, t, jnp.array([0, 0]))
    out_b1 = model.apply(params, x, t, jnp.array([1, 1]))
    assert not np.allclose(out_b0, out_b1)
    with pytest.raises(ValueError):
        build_model(cfg, 2, 10, num_circuits=5)


def test_every_preset_builds_model_and_schedule(key):
    """Config-drift guard: each preset's (arch, schedule, sampler) triple
    must construct and run one forward on tiny inputs."""
    from ddqst_tpu.config import PRESETS
    from ddqst_tpu.ops.schedules import make_schedule

    for name, cfg in PRESETS.items():
        sched = make_schedule(cfg.diffusion.schedule, 8)
        _ = cfg.diffusion.exact  # sampler-string validation
        n = min(cfg.data.num_qubits, 4)
        model = build_model(cfg.model, n, 8)
        x = jnp.zeros((2, n), dtype=jnp.int8)
        t = jnp.ones((2,), dtype=jnp.int32)
        b = (jnp.zeros((2, n), jnp.int32)
             if cfg.model.arch == "transformer"
             else jnp.zeros((2,), jnp.int32))
        params = model.init(key, x, t, b)
        out = model.apply(params, x, t, b)
        assert out.shape == (2, n, 2), name
        assert sched.num_timesteps == 8, name
