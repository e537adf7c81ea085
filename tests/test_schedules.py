"""Schedule golden tests against the reference's torch formulations.

The torch snippets below re-derive the reference's published formulas
(linear linspace betas, Nichol & Dhariwal cosine, cumulative 2x2 chain) to
produce golden values — they are the *spec*, independent re-implementations,
not imports of reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddqst_tpu.ops import schedules


def torch_linear_betas(T):
    return torch.linspace(0.001, 0.5, T + 1)


def torch_cosine_betas(T):
    steps = np.arange(T + 1, dtype=np.float64) / T
    alpha_bar = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
    alpha_bar = alpha_bar / alpha_bar[0]
    betas = [0.0]
    for t in range(1, T + 1):
        betas.append(min(1 - alpha_bar[t] / alpha_bar[t - 1], 0.999))
    return torch.tensor(betas, dtype=torch.float32)


def torch_cumulative_offdiag(betas):
    """Cumulative Q̄ chain built exactly like the reference (2x2 matmuls)."""
    T = len(betas) - 1
    out = torch.zeros(T + 1)
    curr = torch.eye(2)
    for t in range(1, T + 1):
        b = betas[t]
        qt = torch.tensor([[1 - b, b], [b, 1 - b]])
        curr = qt @ curr
        out[t] = curr[0, 1]
    return out


@pytest.mark.parametrize("T", [10, 100, 250])
def test_linear_betas_bitwise(T):
    ours = np.asarray(schedules.linear_schedule(T).betas)
    golden = torch_linear_betas(T).numpy()
    np.testing.assert_allclose(ours, golden, rtol=0, atol=2e-7)


@pytest.mark.parametrize("T", [10, 100])
def test_linear_cum_flip_is_betas(T):
    s = schedules.linear_schedule(T)
    # Reference phases 1-3 apply per-step Q_t directly to x_0 (no cumprod).
    np.testing.assert_array_equal(np.asarray(s.cum_flip), np.asarray(s.betas))
    assert not s.exact_posterior


@pytest.mark.parametrize("T", [10, 100, 250])
def test_cosine_betas_bitwise(T):
    ours = np.asarray(schedules.cosine_schedule(T).betas)
    golden = torch_cosine_betas(T).numpy()
    np.testing.assert_allclose(ours, golden, rtol=0, atol=1e-7)
    assert ours[0] == 0.0
    assert ours.max() <= 0.999


@pytest.mark.parametrize("T", [10, 100])
def test_cosine_cumulative_chain_matches_torch(T):
    s = schedules.cosine_schedule(T)
    golden = torch_cumulative_offdiag(torch_cosine_betas(T)).numpy()
    np.testing.assert_allclose(np.asarray(s.cum_flip), golden, atol=1e-6)
    assert s.exact_posterior


def test_cosine_cum_flip_closed_form():
    # Product of symmetric flip channels: cum = (1 - prod(1-2b)) / 2.
    s = schedules.cosine_schedule(100)
    betas = np.asarray(s.betas, dtype=np.float64)
    closed = (1 - np.cumprod(1 - 2 * betas[1:])) / 2
    closed = np.concatenate([[0.0], closed])
    np.testing.assert_allclose(np.asarray(s.cum_flip), closed, atol=1e-5)


def test_cum_flip_monotone_to_half():
    for kind in ("linear", "cosine"):
        s = schedules.make_schedule(kind, 100)
        cf = np.asarray(s.cum_flip)
        assert np.all(np.diff(cf) >= -1e-7)
        assert cf[-1] == pytest.approx(0.5, abs=1e-3)


def test_schedule_is_pytree():
    s = schedules.make_schedule("cosine", 50)
    mapped = __import__("jax").tree_util.tree_map(lambda x: x * 1.0, s)
    assert mapped.num_timesteps == 50
    assert jnp.allclose(mapped.betas, s.betas)


def test_notebook_schedule_matches_torch_construction():
    """betas == 1 - linspace(1.0, 0.5) as torch builds Q (notebook cell 6)."""
    sched = schedules.make_schedule("notebook", 100)
    p_stay = torch.linspace(1.0, 0.5, 101)
    np.testing.assert_allclose(
        np.asarray(sched.betas), (1.0 - p_stay).numpy(), atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(sched.cum_flip), np.asarray(sched.betas)
    )
    assert sched.kind == "notebook" and not sched.exact_posterior


def test_notebook_schedule_rejects_exact_posterior():
    from ddqst_tpu.ops.diffusion import _resolve_exact

    sched = schedules.make_schedule("notebook", 10)
    with pytest.raises(ValueError):
        _resolve_exact(sched, True)
