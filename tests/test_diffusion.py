"""Diffusion op tests: q_sample statistics, posterior algebra, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules


def test_q_sample_flip_rate(key):
    s = schedules.cosine_schedule(100)
    x0 = jnp.zeros((20000, 2), dtype=jnp.int8)
    for t_val in (1, 50, 100):
        t = jnp.full((20000,), t_val)
        x_t = diff.q_sample(jax.random.fold_in(key, t_val), x0, t, s)
        rate = float(jnp.mean(x_t))
        expected = float(s.cum_flip[t_val])
        assert abs(rate - expected) < 0.01, (t_val, rate, expected)


def test_q_sample_t0_identity(key):
    s = schedules.cosine_schedule(100)
    x0 = jnp.asarray(np.random.default_rng(0).integers(0, 2, (64, 3)), jnp.int8)
    x_t = diff.q_sample(key, x0, jnp.zeros((64,), jnp.int32), s)
    np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x0))


def test_q_sample_symmetric(key):
    # Flip probability must not depend on the bit value (symmetric channel).
    s = schedules.linear_schedule(100)
    t = jnp.full((30000,), 60)
    x0_zeros = jnp.zeros((30000, 1), dtype=jnp.int8)
    x0_ones = jnp.ones((30000, 1), dtype=jnp.int8)
    r0 = float(jnp.mean(diff.q_sample(key, x0_zeros, t, s) != x0_zeros))
    r1 = float(jnp.mean(diff.q_sample(key, x0_ones, t, s) != x0_ones))
    assert abs(r0 - r1) < 0.02


def test_posterior_p1_matches_tensor_formulation(rng):
    """Closed-form binary posterior == the reference's tensor computation.

    Independent numpy re-derivation of the D3PM posterior (the spec,
    ``RQC.../diffusion.py:64-79``): trans ⊙ (p̂(x0) @ Q̄_{t-1}), normalised.
    """
    beta_t = 0.13
    cum_tm1 = 0.31
    logits = rng.normal(size=(50, 3, 2)).astype(np.float32)
    x_t = rng.integers(0, 2, size=(50, 3))

    p1 = diff._posterior_p1(
        jnp.asarray(logits), jnp.asarray(x_t),
        jnp.float32(beta_t), jnp.float32(cum_tm1),
    )

    # Reference-style tensor math in numpy:
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p_x0 = e / e.sum(-1, keepdims=True)  # [S, N, 2]
    q_bar = np.array([[1 - cum_tm1, cum_tm1], [cum_tm1, 1 - cum_tm1]])
    prior = p_x0 @ q_bar  # [S, N, 2]
    trans = np.zeros_like(prior)
    trans[..., 0] = np.where(x_t == 0, 1 - beta_t, beta_t)
    trans[..., 1] = np.where(x_t == 0, beta_t, 1 - beta_t)
    unnorm = trans * prior
    norm = unnorm / (unnorm.sum(-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(p1), norm[..., 1], atol=1e-5)


def test_denoising_loss_finite(key):
    s = schedules.cosine_schedule(10)
    x0 = jnp.asarray(np.random.default_rng(0).integers(0, 2, (32, 2)), jnp.int8)
    basis = jnp.zeros((32,), jnp.int32)

    def denoise_fn(x, t, b):
        return jnp.zeros((x.shape[0], x.shape[1], 2), jnp.float32)

    loss = diff.denoising_loss(key, denoise_fn, x0, basis, s)
    assert float(loss) == pytest.approx(np.log(2), abs=1e-5)


def _perfect_denoiser(target_bits):
    """A denoiser that always predicts `target_bits` with high confidence."""
    target = jnp.asarray(target_bits, jnp.float32)

    def fn(x, t, b):
        logit1 = (2 * target - 1) * 12.0
        return jnp.stack(
            [jnp.broadcast_to(-logit1, x.shape),
             jnp.broadcast_to(logit1, x.shape)], axis=-1
        )

    return fn


@pytest.mark.parametrize("kind", ["linear", "cosine"])
def test_p_sample_converges_to_model_prediction(kind, key):
    # With a denoiser certain that x0 = (1, 0, 1), both samplers must
    # produce exactly that bitstring.
    s = schedules.make_schedule(kind, 25)
    fn = _perfect_denoiser(jnp.array([1, 0, 1]))
    basis = jnp.zeros((128,), jnp.int32)
    out = diff.p_sample(key, fn, basis, 3, s)
    got = np.asarray(out)
    assert (got == np.array([1, 0, 1])).all(), got.mean(0)


def test_sample_all_bases_shape(key):
    s = schedules.cosine_schedule(5)

    def apply_fn(params, x, t, b):
        return jnp.zeros((x.shape[0], x.shape[1], 2), jnp.float32)

    out = diff.sample_all_bases(key, apply_fn, {}, 2, 7, s)
    assert out.shape == (9, 7, 2)
    # Uniform logits -> roughly balanced bits.
    assert 0.3 < float(jnp.mean(out)) < 0.7

def test_exact_sampler_rejects_linear_schedule(key):
    """exact=True + linear schedule is mathematically inconsistent (the
    linear family's cum_flip is the reference one-shot quirk, not a
    cumulative flip probability) and must be rejected."""
    import pytest

    from ddqst_tpu.ops.schedules import linear_schedule

    sched = linear_schedule(10)
    basis = jnp.zeros((4,), jnp.int32)

    def denoise_fn(x, t, b):
        return jnp.zeros(x.shape + (2,), jnp.float32)

    with pytest.raises(ValueError, match="one-shot quirk"):
        diff.p_sample(key, denoise_fn, basis, 2, sched, exact=True)


def test_diffusion_config_rejects_exact_linear():
    import pytest

    from ddqst_tpu.config import DiffusionConfig

    with pytest.raises(ValueError, match="inconsistent"):
        DiffusionConfig(schedule="linear", sampler="exact")
