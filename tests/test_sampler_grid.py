"""Exhaustive-grid sampler equivalence + Pallas fused-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules


def _biased_denoiser(num_qubits):
    """Deterministic denoiser: prefers x0 = x_t (identity-ish) with a
    basis-dependent tilt, so the sampler output has checkable structure."""

    def fn(x, t, b):
        tilt = (b % 3).astype(jnp.float32)[:, None] - 1.0  # -1, 0, +1
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 3.0 + tilt * 2.0
        return jnp.stack([-logit1, logit1], axis=-1)

    return fn


@pytest.mark.parametrize("kind,exact", [("cosine", True), ("cosine", False),
                                        ("linear", False)])
def test_grid_matches_direct_distribution(kind, exact, key):
    """Grid sampler and direct sampler agree in distribution."""
    n = 2
    s = schedules.make_schedule(kind, 20)
    fn = _biased_denoiser(n)
    basis = jnp.repeat(jnp.arange(9, dtype=jnp.int32), 600)
    direct = diff.p_sample(key, fn, basis, n, s, exact=exact)
    grid = diff.p_sample_grid(jax.random.fold_in(key, 7), fn, basis, n, s,
                              exact=exact)
    # Compare per-basis outcome distributions.
    da = np.asarray(direct).reshape(9, 600, n)
    db = np.asarray(grid).reshape(9, 600, n)
    for b in range(9):
        pa = np.bincount(da[b] @ np.array([1, 2]), minlength=4) / 600
        pb = np.bincount(db[b] @ np.array([1, 2]), minlength=4) / 600
        np.testing.assert_allclose(pa, pb, atol=0.08)


def test_sample_all_bases_grid_mode_shapes(key):
    s = schedules.cosine_schedule(5)

    def apply_fn(params, x, t, b):
        return jnp.zeros((x.shape[0], x.shape[1], 2), jnp.float32)

    out_auto = diff.sample_all_bases(key, apply_fn, {}, 2, 500, s,
                                     grid_mode="auto")
    out_off = diff.sample_all_bases(key, apply_fn, {}, 2, 500, s,
                                    grid_mode="off")
    assert out_auto.shape == out_off.shape == (9, 500, 2)
    assert 0.4 < float(jnp.mean(out_auto)) < 0.6


def test_grid_sampler_converges_to_certain_prediction(key):
    """With a denoiser certain of x0=(1,0), the grid sampler locks in."""
    n = 2
    s = schedules.cosine_schedule(25)
    target = jnp.array([1, 0], jnp.float32)

    def fn(x, t, b):
        logit1 = jnp.broadcast_to((2 * target - 1) * 12.0, x.shape)
        return jnp.stack([-logit1, logit1], axis=-1)

    out = diff.p_sample_grid(key, fn, jnp.zeros((256,), jnp.int32), n, s,
                             exact=False)
    assert (np.asarray(out) == np.array([1, 0])).all()


def test_pallas_fused_chain_step_gather_pack():
    """Deterministic gather + bit-pack check (interpreter mode).

    The Pallas interpreter returns zero PRNG bits (u = 0), so a binary
    probability table makes the kernel deterministic: output bit q equals
    ``table[row, q] > 0``. This validates the one-hot MXU gather and the
    power-of-two packing exactly; RNG statistics are validated on real TPU
    (scripts/validate_pallas_tpu.py).
    """
    from jax.experimental.pallas import tpu as pltpu

    from ddqst_tpu.ops import pallas_kernels as pk

    n = 3
    g = 27 * 8
    rng = np.random.default_rng(0)
    table_bits = rng.integers(0, 2, (g, n))
    table = jnp.asarray(table_bits.astype(np.float32))
    rows = jnp.asarray(rng.integers(0, g, 4096).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        out = pk.fused_chain_step(jnp.int32(1234), table, rows, n)
    out = np.asarray(out)
    expected = (table_bits[np.asarray(rows)] * (1 << np.arange(n))).sum(1)
    np.testing.assert_array_equal(out, expected)


def test_pallas_fused_chain_step_padding():
    """Non-multiple-of-tile chain counts pad and unpad correctly."""
    from jax.experimental.pallas import tpu as pltpu

    from ddqst_tpu.ops import pallas_kernels as pk

    n = 2
    g = 9 * 4
    table = jnp.asarray(np.eye(g, n, dtype=np.float32))  # rows 0,1 set bits
    rows = jnp.asarray(np.arange(37, dtype=np.int32) % g)
    with pltpu.force_tpu_interpret_mode():
        out = pk.fused_chain_step(jnp.int32(7), table, rows, n)
    assert out.shape == (37,)
    expected = ((np.eye(g, n)[np.arange(37) % g]) * (1 << np.arange(n))).sum(1)
    np.testing.assert_array_equal(np.asarray(out), expected.astype(np.int32))

def test_pallas_fused_chain_walk_interpret():
    """Multi-step walk: table streaming, VMEM-resident state across t, and
    init/unpack layout (interpreter mode; u = 0 makes bit q deterministic:
    table[t, c, x, q] > 0)."""
    from jax.experimental.pallas import tpu as pltpu

    from ddqst_tpu.ops import pallas_kernels as pk

    n, g, c, s_chains, t_steps = 2, 4, 3, 2100, 5
    rng = np.random.default_rng(0)
    tables_bits = rng.integers(0, 2, (t_steps, c, g, n))
    tables = jnp.asarray(tables_bits.astype(np.float32))
    init = rng.integers(0, g, (c, s_chains)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = pk.fused_chain_walk(jnp.int32(3), tables, jnp.asarray(init), n)
    # numpy emulation of the deterministic walk
    x = init.copy()
    pows = 1 << np.arange(n)
    for t in range(t_steps):
        for ci in range(c):
            x[ci] = (tables_bits[t, ci, x[ci]] * pows).sum(-1)
    assert out.shape == (c, s_chains)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_grid_precompute_matches_sequential_distribution(key):
    """precompute=True (one batched table forward) must be distributionally
    identical to the per-step forward path."""
    n = 2
    s = schedules.cosine_schedule(15)

    def fn(x, t, b):
        tilt = (b % 3).astype(jnp.float32)[:, None] - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 1.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    basis = jnp.repeat(jnp.arange(9, dtype=jnp.int32), 3000)
    out_pre = diff.p_sample_grid(key, fn, basis, n, s, precompute=True)
    out_seq = diff.p_sample_grid(key, fn, basis, n, s, precompute=False)
    # Same key, same draws -> identical samples (tables are identical).
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_seq))


def test_grid_p1_tables_divisor_poor_T():
    """Chunked table precompute must be exact for prime/divisor-poor T
    (chunks are padded with dummy rows and sliced, not forced to divide T)."""
    n = 3
    t_prime = 97
    s = schedules.cosine_schedule(t_prime)
    fn = _biased_denoiser(n)

    # Force multi-chunk chunking by monkey-shrinking nothing: at n=3 the
    # grid is 6^3=216 rows, so m = 2^17//216 = 606 >= T -> single chunk.
    # Compare against the unchunked direct computation per timestep.
    tables = np.asarray(diff.grid_p1_tables(fn, n, s, exact=False))
    assert tables.shape == (t_prime, 6**n, n)
    grid_x, grid_basis = diff._grid_enum(n)
    for i, t in enumerate([t_prime, t_prime // 2, 1]):
        row = t_prime - t  # scan order T..1
        logits = fn(grid_x, jnp.full((grid_x.shape[0],), t, jnp.int32),
                    grid_basis)
        ref = diff._grid_p1_table(logits, grid_x, jnp.int32(t), s, False)
        np.testing.assert_allclose(tables[row], np.asarray(ref), atol=1e-6)


def test_grid_p1_tables_multichunk_padding():
    """Same check with the padded chunking path actually engaged: a fat
    circuit-conditioned grid shrinks the per-chunk timestep count m below
    a prime T, so T does not divide into chunks and padding is required."""
    n = 2
    t_steps = 13  # prime: no divisor-based chunking possible
    s = schedules.cosine_schedule(t_steps)

    def fn(x, t, b):
        b1 = b[..., 0] if b.ndim == 2 else b
        tilt = (b1 % 3).astype(jnp.float32)[:, None] - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 1.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    n_circ = 300  # gtot = 300*9*4 = 10800 -> m = 2^17//10800 = 12 < 13
    tables = np.asarray(
        diff.grid_p1_tables(fn, n, s, exact=False, num_circuits=n_circ)
    )
    gtot = n_circ * (3**n) * (2**n)
    assert tables.shape == (t_steps, gtot, n)
    grid_x, grid_basis = diff._grid_enum(n, n_circ)
    for t in (t_steps, 12, 1):  # rows both sides of the chunk boundary
        row = t_steps - t
        logits = fn(grid_x, jnp.full((grid_x.shape[0],), t, jnp.int32),
                    grid_basis)
        ref = diff._grid_p1_table(logits, grid_x, jnp.int32(t), s, False)
        np.testing.assert_allclose(tables[row], np.asarray(ref), atol=1e-6)


def test_sample_all_bases_walk_seq(key):
    """walk='seq' (no table precompute) must produce identically-keyed
    samples to the xla walk path at grid scale."""
    s = schedules.cosine_schedule(8)

    def apply_fn(params, x, t, b):
        tilt = (b % 3).astype(jnp.float32)[:, None] - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 1.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    out_seq = diff.sample_all_bases(key, apply_fn, {}, 2, 400, s,
                                    grid_mode="on", walk="seq")
    out_xla = diff.sample_all_bases(key, apply_fn, {}, 2, 400, s,
                                    grid_mode="on", walk="xla")
    assert out_seq.shape == (9, 400, 2)
    np.testing.assert_array_equal(np.asarray(out_seq), np.asarray(out_xla))
