"""Pallas TPU kernels for the reverse-sampler hot path.

The exhaustive-grid sampler (:func:`ddqst_tpu.ops.diffusion.p_sample_grid`)
reduces each reverse step to a memory-bound chain update: per chain, gather
a probability row from a small table, draw N Bernoulli bits, repack into an
outcome index. ``fused_chain_step`` fuses all of that into one VMEM pass —
one-hot matmul gather (the TPU-native dynamic gather: runs on the MXU),
on-chip PRNG (``pltpu.prng_random_bits``), compare, and bit-pack — so each
chain's state is read and written exactly once per step from HBM.

Layout: chains tile over a 1-D grid; the probability table (at most
6^N x N, e.g. 216 x 3 at N=3) is small enough to replicate into VMEM for
every tile. Table columns pad to the 128-lane boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024  # chains per grid step; multiple of 8*128 packing


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chain_step_kernel(
    seed_ref, table_ref, rows_ref, out_ref, *, num_qubits: int, g_rows: int
):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)  # distinct stream per tile

    rows = rows_ref[:]  # [TILE] int32 grid-row ids
    # One-hot gather via MXU: [TILE, G] @ [G, N_pad] -> [TILE, N_pad].
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_TILE, g_rows), 1)
    onehot = (row_ids == rows[:, None]).astype(jnp.float32)
    p1 = jnp.dot(onehot, table_ref[:], preferred_element_type=jnp.float32)

    # Uniform draws in [0, 1) from 32 random bits (take the top 24 bits to
    # stay exactly representable in float32; bitcast first — an arithmetic
    # shift on int32 would smear the sign bit).
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((_TILE, p1.shape[1])), jnp.uint32
    )
    # Mosaic lacks a uint32->f32 cast; after >>8 the top byte is zero, so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0
    )
    new_bits = (u < p1).astype(jnp.int32)

    # Pack qubit bits into outcome indices: dot with powers of two.
    powers = (
        1
        << jax.lax.broadcasted_iota(jnp.int32, (_TILE, p1.shape[1]), 1)
    )
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (_TILE, p1.shape[1]), 1)
        < num_qubits
    )
    packed = jnp.sum(jnp.where(mask, new_bits * powers, 0), axis=1)
    out_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("num_qubits",))
def fused_chain_step(
    seed: jnp.ndarray,
    table: jnp.ndarray,
    rows: jnp.ndarray,
    num_qubits: int,
) -> jnp.ndarray:
    """One fused reverse-sampler chain update.

    Args:
      seed: int32 scalar (fold the timestep in before calling).
      table: ``[G, N]`` float32 — P(bit=1) per grid row (G = 3^N * 2^N).
      rows: ``[B] `` int32 grid-row index per chain.
      num_qubits: N.

    Returns:
      ``[B]`` int32 new outcome index per chain.
    """
    b = rows.shape[0]
    g = table.shape[0]
    n_pad = _round_up(max(num_qubits, 1), 128)
    b_pad = _round_up(b, _TILE)
    table_p = jnp.zeros((g, n_pad), jnp.float32).at[:, :num_qubits].set(table)
    rows_p = jnp.zeros((b_pad,), jnp.int32).at[:b].set(rows)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(
            _chain_step_kernel, num_qubits=num_qubits, g_rows=g
        ),
        grid=(b_pad // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((g, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # table (replicated)
            pl.BlockSpec((_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # rows tile
        ],
        out_specs=pl.BlockSpec((_TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad,), jnp.int32),
    )(seed_arr, table_p, rows_p)
    return out[:b]


def _chain_walk_kernel(
    seed_ref, table_ref, init_ref, out_ref, *, num_qubits: int, g: int
):
    """One (basis-group, chain-tile, t) cell of the fused chain walk.

    The grid iterates t innermost with the out block index fixed, so the
    chain-state block stays resident in VMEM across ALL T reverse steps
    (the matmul-accumulator pattern) — chain state touches HBM exactly
    twice (init read, final write) instead of 2T times, and the whole walk
    is ONE kernel launch instead of T.

    The per-(t, group) table is tiny (2^N x N scalars) and lives in SMEM;
    the probability lookup is an unrolled select-accumulate over the 2^N
    outcomes per qubit — pure (8, 128)-shaped VPU ops, no gather.
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        out_ref[...] = init_ref[...]

    # Distinct stream per grid cell (prng_seed takes at most 2 values).
    cell = (
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ) * pl.num_programs(2) + t
    pltpu.prng_seed(seed_ref[0], cell)
    x = out_ref[0, 0]  # [8, 128] int32 in [0, 2^N)
    packed = jnp.zeros(x.shape, jnp.int32)
    for q in range(num_qubits):
        p1 = jnp.zeros(x.shape, jnp.float32)
        for y in range(g):
            p1 += jnp.where(x == y, table_ref[0, 0, y, q], 0.0)
        rb = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        # Top 24 bits -> uniform in [0, 1), exactly representable in f32
        # (bitcast before the shift: arithmetic int32 >> smears the sign).
        u = pltpu.bitcast(rb >> 8, jnp.int32).astype(jnp.float32) * (
            1.0 / 16777216.0
        )
        packed += (u < p1).astype(jnp.int32) * (1 << q)
    out_ref[0, 0] = packed


@functools.partial(jax.jit, static_argnames=("num_qubits",))
def fused_chain_walk(
    seed: jnp.ndarray,
    tables: jnp.ndarray,
    init_idx: jnp.ndarray,
    num_qubits: int,
) -> jnp.ndarray:
    """Run the ENTIRE T-step reverse chain walk in one Pallas kernel.

    Consumes the precomputed per-step probability tables
    (:func:`ddqst_tpu.ops.diffusion.grid_p1_tables` reshaped per
    conditioning row), so the walk needs zero model calls; chains are
    grouped by conditioning row so each tile reads a single ``[2^N, N]``
    table slice.

    Args:
      seed: int32 scalar.
      tables: ``[T, C, 2^N, N]`` float32 — P(bit=1) per (step, conditioning
        row, current outcome); index 0 = first reverse step (t = T).
      init_idx: ``[C, S]`` int32 initial outcome indices (uniform noise).
      num_qubits: N.

    Returns:
      ``[C, S]`` int32 final outcome indices (samples of x_0).
    """
    t_steps, c, g, n = tables.shape
    s = init_idx.shape[1]
    s_pad = _round_up(s, _TILE)
    tiles = s_pad // _TILE
    init_p = (
        jnp.zeros((c, s_pad), jnp.int32)
        .at[:, :s]
        .set(init_idx)
        .reshape(c, tiles, 8, 128)  # _TILE == 8 * 128
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(
            _chain_walk_kernel, num_qubits=num_qubits, g=g
        ),
        grid=(c, tiles, t_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((1, 1, g, n), lambda b, sl, t: (t, b, 0, 0),
                         memory_space=pltpu.SMEM),  # per-(t, group) table
            pl.BlockSpec((1, 1, 8, 128), lambda b, sl, t: (b, sl, 0, 0),
                         memory_space=pltpu.VMEM),  # init tile
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda b, sl, t: (b, sl, 0, 0),
                               memory_space=pltpu.VMEM),  # chain state
        out_shape=jax.ShapeDtypeStruct((c, tiles, 8, 128), jnp.int32),
    )(seed_arr, tables, init_p)
    return out.reshape(c, s_pad)[:, :s]


def make_pallas_step_impl(num_qubits: int):
    """Adapter for :func:`p_sample_grid`'s ``step_impl`` hook."""

    def impl(key: jax.Array, table: jnp.ndarray, rows: jnp.ndarray, powers):
        del powers
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        return fused_chain_step(seed, table, rows, num_qubits)

    return impl
