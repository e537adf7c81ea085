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


def make_pallas_step_impl(num_qubits: int):
    """Adapter for :func:`p_sample_grid`'s ``step_impl`` hook."""

    def impl(key: jax.Array, table: jnp.ndarray, rows: jnp.ndarray, powers):
        del powers
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        return fused_chain_step(seed, table, rows, num_qubits)

    return impl
