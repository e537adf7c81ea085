"""Quantum-state metrics as batched real-valued jnp linear algebra.

Replaces the reference's use of ``qiskit.quantum_info`` (``state_fidelity``,
``entropy``, ``partial_trace`` — cf. ``multi_qubit_any_state/main.py:171``
and ``reconstruct.py:69-76``) with pure JAX on the split-real complex
representation (:mod:`ddqst_tpu.ops.complexlib` — the TPU backend has no
complex lowerings; all spectral steps run as real eigh of the Hermitian
embedding).

Inputs may be ``CArray`` (the device-native form), numpy/jnp complex, or
real arrays; they are normalised via :func:`as_carray`. Entropies use log
base 2, matching qiskit's default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops.complexlib import (
    CArray,
    ceigvalsh,
    cmatmul,
    cmatvec,
    cvdot_real,
    embed_hermitian,
    f32_matmul,
    from_complex,
    sqrtm_psd,
)

_LOG2 = 0.6931471805599453  # ln(2)


def as_carray(x) -> CArray:
    if isinstance(x, CArray):
        return x
    if isinstance(x, jnp.ndarray) and not jnp.iscomplexobj(x):
        return CArray(x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32))
    return from_complex(np.asarray(x))


@f32_matmul
def state_fidelity(rho, sigma) -> jnp.ndarray:
    """Uhlmann fidelity F(ρ,σ) = (tr √(√ρ σ √ρ))².

    Accepts statevectors (1-D) for either argument — the pure shortcut
    ⟨ψ|·|ψ⟩ / |⟨ψ|φ⟩|² is used where possible. Runs at float32 matmul
    precision: the sqrtm/eigh-product chain drifts at the 1e-3 level
    under the TPU's default bf16 matmuls.
    """
    rho, sigma = as_carray(rho), as_carray(sigma)
    if rho.ndim == 1 and sigma.ndim == 1:
        re = jnp.sum(rho.re * sigma.re + rho.im * sigma.im)
        im = jnp.sum(rho.re * sigma.im - rho.im * sigma.re)
        return _clamp_fid(re * re + im * im)
    if rho.ndim == 1:
        return _clamp_fid(cvdot_real(rho, cmatvec(sigma, rho)))
    if sigma.ndim == 1:
        return _clamp_fid(cvdot_real(sigma, cmatvec(rho, sigma)))
    s = sqrtm_psd(rho)
    inner = cmatmul(cmatmul(s, sigma), s)
    # tr √M over the complex spectrum: embedding doubles eigenvalues.
    evals = jnp.linalg.eigvalsh(embed_hermitian(inner))
    return _clamp_fid((jnp.sum(jnp.sqrt(jnp.maximum(evals, 0.0))) / 2.0) ** 2)


def _clamp_fid(value: jnp.ndarray, tol: float = 1e-3) -> jnp.ndarray:
    """Absorb f32 rounding overshoot only: clamp F to 1 when within ``tol``.

    Trace-1 PSD inputs bound F <= 1 exactly, but f32 rounding in the
    estimators overshoots by ~1e-4 (observed: W-4 MLE reported 1.00016).
    A value beyond 1 + tol is a genuinely broken estimator and is passed
    through unclamped so the bug surfaces instead of reading as a perfect
    1.0. Applied uniformly across all branches (pure-pure included).
    """
    return jnp.where(
        (value > 1.0) & (value <= 1.0 + tol), 1.0, value
    )


def _pure_to_dm(psi: CArray) -> CArray:
    """|ψ⟩ -> |ψ⟩⟨ψ| in the split-real representation."""
    return CArray(
        jnp.outer(psi.re, psi.re) + jnp.outer(psi.im, psi.im),
        jnp.outer(psi.im, psi.re) - jnp.outer(psi.re, psi.im),
    )


@f32_matmul
def trace_distance(rho, sigma) -> jnp.ndarray:
    """T(ρ,σ) = ½ tr|ρ−σ| = ½ Σ|λ_i(ρ−σ)|.

    The second of the two headline metric families named by BASELINE.json
    ("fidelity/trace-distance"); the reference computes only fidelity
    (``multi_qubit_any_state/main.py:171``). Statevector arguments are
    promoted to density matrices.
    """
    rho, sigma = as_carray(rho), as_carray(sigma)
    if rho.ndim == 1:
        rho = _pure_to_dm(rho)
    if sigma.ndim == 1:
        sigma = _pure_to_dm(sigma)
    diff = CArray(rho.re - sigma.re, rho.im - sigma.im)
    return 0.5 * jnp.sum(jnp.abs(ceigvalsh(diff)))


def purity(rho) -> jnp.ndarray:
    """tr(ρ²) = Σ|ρ_ij|² for Hermitian ρ (reference ``reconstruct.py:70``)."""
    rho = as_carray(rho)
    return jnp.sum(rho.abs2())


def von_neumann_entropy(rho) -> jnp.ndarray:
    """S(ρ) = -Σ λ log2 λ (qiskit ``entropy`` default base 2)."""
    evals = jnp.maximum(ceigvalsh(as_carray(rho)), 0.0)
    logs = jnp.where(evals > 0, jnp.log(jnp.maximum(evals, 1e-38)), 0.0)
    return -jnp.sum(evals * logs) / _LOG2


def partial_trace_keep_low(rho, num_keep: int) -> CArray:
    """Trace out the high qubits, keeping qubits 0..num_keep-1 (the LSBs).

    With the little-endian convention the state index factors as
    ``i = high * 2^num_keep + low``; the reference's half-cut
    ``partial_trace(rho, range(cut, n))`` (``reconstruct.py:72-75``) keeps
    exactly these low qubits.
    """
    rho = as_carray(rho)
    d = rho.shape[-1]
    d_low = 2**num_keep
    d_high = d // d_low

    def pt(part):
        r4 = part.reshape(d_high, d_low, d_high, d_low)
        return jnp.einsum("aiaj->ij", r4)

    return CArray(pt(rho.re), pt(rho.im))


def entanglement_entropy(rho, num_qubits: int) -> jnp.ndarray:
    """Entropy of the half-cut reduced state (keep qubits 0..N//2-1)."""
    cut = num_qubits // 2
    return von_neumann_entropy(partial_trace_keep_low(rho, cut))


def get_metrics(rho, num_qubits: int):
    """(purity, von Neumann entropy, entanglement entropy) — reference
    ``get_metrics`` (``reconstruct.py:69-76``)."""
    rho = as_carray(rho)
    return (
        purity(rho),
        von_neumann_entropy(rho),
        entanglement_entropy(rho, num_qubits),
    )


def pauli_expectations(rho, labels=None) -> dict[str, float]:
    """⟨P⟩ = tr(ρP) for a set of Pauli strings (default: single-qubit X/Y/Z).

    The phase-1 notebook reports ⟨X⟩/⟨Y⟩/⟨Z⟩ for the classical-vs-DDM
    comparison (notes.pdf Table 2). tr(ρP) for Hermitian ρ, P is real:
    Σ Re(ρ)∘Re(P) + Im(ρ)∘Im(P).
    """
    from ddqst_tpu.ops.pauli import pauli_matrix

    rho = as_carray(rho)
    n = int(np.log2(rho.shape[-1]))
    if labels is None:
        labels = []
        for c in "XYZ":
            for q in range(n):
                labels.append("I" * q + c + "I" * (n - q - 1))
    out = {}
    for lab in labels:
        p = from_complex(pauli_matrix(lab))
        out[lab] = float(jnp.sum(rho.re * p.re + rho.im * p.im))
    return out


def z_bias(z_samples: jnp.ndarray) -> jnp.ndarray:
    """Fraction of zeros in computational-basis samples.

    Mode-collapse diagnostic (reference ``evaluate.py:32-38``); 0.5 means
    balanced.
    """
    return jnp.mean((z_samples == 0).astype(jnp.float32))


batched_fidelity = jax.vmap(state_fidelity)
