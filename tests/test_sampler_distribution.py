"""sampler_distribution == infinite-shot limit of sample_all_bases."""

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules


def _denoiser(n):
    def fn(params, x, t, b):
        tilt = (b % 3).astype(jnp.float32)[:, None] - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 2.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    return fn


def test_distribution_matches_sampled(key):
    n = 2
    s = schedules.cosine_schedule(15)
    fn = _denoiser(n)
    dist = diff.sampler_distribution(key, fn, {}, n, s, exact=False)
    assert dist.shape == (9, 4)
    np.testing.assert_allclose(np.asarray(dist.sum(-1)), 1.0, atol=1e-5)

    samples = diff.sample_all_bases(
        jax.random.fold_in(key, 1), fn, {}, n, 4000, s, exact=False
    )
    idx = np.asarray(samples[..., 0] + 2 * samples[..., 1])
    for b in range(9):
        emp = np.bincount(idx[b], minlength=4) / 4000
        np.testing.assert_allclose(emp, np.asarray(dist[b]), atol=0.04)


def test_distribution_certain_denoiser(key):
    # A denoiser certain of x0=(1, 0) concentrates all mass on index 1.
    n = 2
    s = schedules.cosine_schedule(20)
    target = jnp.array([1, 0], jnp.float32)

    def fn(params, x, t, b):
        logit1 = jnp.broadcast_to((2 * target - 1) * 12.0, x.shape)
        return jnp.stack([-logit1, logit1], axis=-1)

    dist = diff.sampler_distribution(key, fn, {}, n, s, exact=False)
    np.testing.assert_allclose(np.asarray(dist[:, 1]), 1.0, atol=1e-3)