"""Basis rotation + Born-rule sampling (device-side, batched).

The reference builds one Qiskit circuit per (state, basis) and runs Aer
serially over 3^N bases (``data_gen.py:219-242`` — hot loop #1). Here the
rotated probability vectors for *all* circuits and *all* bases are computed
in one batched einsum on the MXU, and all shots are drawn in one categorical
sampling call.

Measurement basis rotations (reference ``data_gen.py:225-233``):
X → H, Y → S† then H (matrix H @ S†), Z → identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops.complexlib import CArray, ceinsum, f32_matmul, from_complex
from ddqst_tpu.qsim import gates as G

_ROT1 = np.stack([G.H, G.H @ G.SDG, G.I])  # [3, 2, 2]: X, Y, Z


def rotation_unitary(basis_label) -> np.ndarray:
    """Full-space rotation for one basis label (ints 0=X,1=Y,2=Z, idx q = qubit q)."""
    basis_label = tuple(int(b) for b in basis_label)
    mat = _ROT1[basis_label[0]]
    for b in basis_label[1:]:
        nxt = _ROT1[b]
        mat = np.einsum("ab,ij->aibj", nxt, mat).reshape(
            mat.shape[0] * 2, mat.shape[1] * 2
        )
    return mat


def rotation_unitaries(basis_labels: np.ndarray) -> np.ndarray:
    """``[B, d, d]`` complex64 rotations for a stack of basis labels."""
    basis_labels = np.asarray(basis_labels)
    mats = _ROT1[basis_labels[:, 0]]
    for q in range(1, basis_labels.shape[1]):
        nxt = _ROT1[basis_labels[:, q]]
        mats = np.einsum("kab,kij->kaibj", nxt, mats).reshape(
            mats.shape[0], mats.shape[1] * 2, mats.shape[2] * 2
        )
    return mats


def measurement_probs(psi, basis_label) -> jnp.ndarray:
    """Outcome probabilities of measuring |ψ⟩ in one Pauli basis.

    ``psi`` may be complex (host) or a CArray.
    """
    u = from_complex(rotation_unitary(basis_label))
    if not isinstance(psi, CArray):
        psi = from_complex(psi)
    phi = CArray(
        u.re @ psi.re - u.im @ psi.im, u.re @ psi.im + u.im @ psi.re
    )
    return phi.abs2()


@f32_matmul
@jax.jit
def batched_probs_pure(psis: CArray, rots: CArray) -> jnp.ndarray:
    """``[C, d]`` states x ``[B, d, d]`` rotations -> ``[C, B, d]`` probs.

    Split-real complex matvecs (four real einsums) — see complexlib.
    """
    phi = ceinsum("bij,cj->cbi", rots, psis)
    p = phi.abs2()
    return p / jnp.sum(p, axis=-1, keepdims=True)


@f32_matmul
@jax.jit
def batched_probs_mixed(rhos: CArray, rots: CArray) -> jnp.ndarray:
    """``[C, d, d]`` density matrices x ``[B, d, d]`` rotations -> ``[C, B, d]``.

    diag(U ρ U†)_i = Σ_k (Uρ)_ik conj(U)_ik; only the real part survives on
    the diagonal of a Hermitian product.
    """
    t = ceinsum("bij,cjk->cbik", rots, rhos)  # U ρ
    p = jnp.einsum("cbik,bik->cbi", t.re, rots.re) + jnp.einsum(
        "cbik,bik->cbi", t.im, rots.im
    )
    p = jnp.maximum(p, 0.0)
    return p / jnp.sum(p, axis=-1, keepdims=True)


@f32_matmul
@jax.jit
def batched_probs_pure_per_circuit(psis: CArray, rots: CArray) -> jnp.ndarray:
    """``[C, d]`` states x per-circuit ``[C, B, d, d]`` rotations -> ``[C, B, d]``.

    Shadow-sampled datasets draw a different random basis set per circuit
    (reference ``build_dataset.py:79-83``); this variant rotates each state
    by its own basis stack.
    """
    phi = ceinsum("cbij,cj->cbi", rots, psis)
    p = phi.abs2()
    return p / jnp.sum(p, axis=-1, keepdims=True)


@f32_matmul
@jax.jit
def batched_probs_mixed_per_circuit(rhos: CArray, rots: CArray) -> jnp.ndarray:
    """``[C, d, d]`` density matrices x ``[C, B, d, d]`` rotations."""
    t = ceinsum("cbij,cjk->cbik", rots, rhos)
    p = jnp.einsum("cbik,cbik->cbi", t.re, rots.re) + jnp.einsum(
        "cbik,cbik->cbi", t.im, rots.im
    )
    p = jnp.maximum(p, 0.0)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _num_bits(d: int) -> int:
    return int(d - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("shots",))
def sample_outcomes(key: jax.Array, probs: jnp.ndarray, shots: int) -> jnp.ndarray:
    """Draw ``shots`` categorical outcomes per leading index.

    probs ``[..., d]`` -> outcomes ``[..., shots]`` int32 in [0, d).
    """
    logits = jnp.log(jnp.maximum(probs, 1e-38))
    return jax.random.categorical(
        key, logits[..., None, :], axis=-1,
        shape=logits.shape[:-1] + (shots,),
    )


def outcomes_to_bits(outcomes: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """Unpack little-endian outcome indices into ``[..., N]`` bits (qubit 0 first)."""
    shifts = jnp.arange(num_qubits, dtype=outcomes.dtype)
    return ((outcomes[..., None] >> shifts) & 1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("shots", "num_qubits"))
def sample_bits(key, probs, shots: int, num_qubits: int) -> jnp.ndarray:
    """probs ``[..., d]`` -> bit samples ``[..., shots, N]`` int8."""
    return outcomes_to_bits(sample_outcomes(key, probs, shots), num_qubits)


@functools.partial(jax.jit, static_argnames=("shots",))
def sample_counts(key, probs, shots: int) -> jnp.ndarray:
    """probs ``[..., d]`` -> counts ``[..., d]`` int32 summing to ``shots``.

    Histogram by scatter-add — O(rows·shots) work and O(rows·d)
    output, like :func:`ddqst_tpu.ops.mle.bits_to_counts`. The previous
    one-hot formulation materialised a ``[..., shots, d]`` intermediate
    (~3.3 GB int32 at the chunked builder's N=5 defaults of 500 circuits
    x 50 bases x 1024 shots, ``data/generate.py:_simulate_chunk``).
    """
    outcomes = sample_outcomes(key, probs, shots)  # [..., shots]
    d = probs.shape[-1]
    lead = outcomes.shape[:-1]
    flat = outcomes.reshape(-1, shots)
    rows = jnp.broadcast_to(
        jnp.arange(flat.shape[0], dtype=jnp.int32)[:, None], flat.shape
    )
    out = jnp.zeros((flat.shape[0], d), jnp.int32)
    return out.at[rows, flat].add(1).reshape(lead + (d,))
