"""Property-based tests (hypothesis) for the math core."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from ddqst_tpu.ops import complexlib as cl
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import pauli, schedules

_settings = settings(max_examples=25, deadline=None)


@_settings
@given(st.integers(min_value=2, max_value=300))
def test_schedules_are_valid_probabilities(T):
    for kind in ("linear", "cosine"):
        s = schedules.make_schedule(kind, T)
        b = np.asarray(s.betas)
        cf = np.asarray(s.cum_flip)
        assert (b >= 0).all() and (b <= 0.999).all()
        # cum_flip can legitimately exceed 0.5 — and even dip back — when a
        # single-step beta exceeds 0.5 (the cumulative product of (1-2b)
        # turns negative; a real property of the reference's cosine
        # construction at very small T). Assert only validity bounds here;
        # monotonicity at practical T is covered in test_schedules.py.
        assert (cf >= 0).all() and (cf <= 1.0 + 1e-6).all()
        assert np.isfinite(cf).all()


@_settings
@given(
    st.floats(min_value=1e-4, max_value=0.999),
    st.floats(min_value=0.0, max_value=0.5),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_posterior_is_probability(beta_t, cum_tm1, seed):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(scale=5, size=(16, 3, 2)), jnp.float32)
    x_t = jnp.asarray(rng.integers(0, 2, (16, 3)))
    p1 = diff._posterior_p1(
        logits, x_t, jnp.float32(beta_t), jnp.float32(cum_tm1)
    )
    arr = np.asarray(p1)
    assert (arr >= 0).all() and (arr <= 1.0 + 1e-6).all()
    assert np.isfinite(arr).all()


@_settings
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_project_psd_always_valid_state(seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    h = (m + m.conj().T) / 2
    rho = cl.to_complex(cl.project_psd(cl.from_complex(h)))
    ev = np.linalg.eigvalsh(rho)
    assert ev.min() > -1e-5
    assert abs(np.trace(rho).real - 1.0) < 1e-4 or np.allclose(rho, 0)


@_settings
@given(st.integers(min_value=1, max_value=4), st.integers(0, 2**31 - 1))
def test_parity_means_bounded(n, seed):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(0, 2, (3, 20, n)))
    par = np.asarray(pauli.subset_parity_means(bits))
    assert (np.abs(par) <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(par[:, 0], 1.0, atol=1e-6)


@_settings
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_inversion_trace_one(seed):
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(rng.integers(0, 2, (9, 50, 2)))
    rho = cl.to_complex(pauli.linear_inversion(bits, 2))
    assert abs(np.trace(rho).real - 1.0) < 1e-4
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-5)