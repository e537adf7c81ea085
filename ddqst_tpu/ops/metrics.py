"""Quantum-state metrics as batched jnp linear algebra.

Replaces the reference's use of ``qiskit.quantum_info`` (``state_fidelity``,
``entropy``, ``partial_trace`` — cf. ``multi_qubit_any_state/main.py:171``
and ``reconstruct.py:69-76``) with pure JAX so metrics run on TPU and can be
vmapped over batches of reconstructed states.

Entropies use log base 2, matching qiskit's default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453  # ln(2)


def _sqrtm_psd(mat: jnp.ndarray) -> jnp.ndarray:
    """Matrix square root of a PSD Hermitian matrix via eigh."""
    evals, evecs = jnp.linalg.eigh(mat)
    evals = jnp.sqrt(jnp.maximum(evals, 0.0))
    return (evecs * evals.astype(evecs.dtype)) @ evecs.conj().T


def state_fidelity(rho: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Uhlmann fidelity F(ρ,σ) = (tr √(√ρ σ √ρ))² for density matrices.

    Accepts a statevector (1-D) for either argument, in which case the pure
    shortcut ⟨ψ|·|ψ⟩ is used.
    """
    if rho.ndim == 1 and sigma.ndim == 1:
        ov = jnp.vdot(rho, sigma)
        return jnp.real(ov * jnp.conj(ov))
    if rho.ndim == 1:
        return jnp.real(jnp.vdot(rho, sigma @ rho))
    if sigma.ndim == 1:
        return jnp.real(jnp.vdot(sigma, rho @ sigma))
    s = _sqrtm_psd(rho)
    inner = s @ sigma @ s
    evals = jnp.linalg.eigvalsh(inner)
    return jnp.sum(jnp.sqrt(jnp.maximum(evals, 0.0))) ** 2


def purity(rho: jnp.ndarray) -> jnp.ndarray:
    """tr(ρ²) (cf. reference ``reconstruct.py:70``)."""
    return jnp.real(jnp.trace(rho @ rho))


def von_neumann_entropy(rho: jnp.ndarray) -> jnp.ndarray:
    """S(ρ) = -Σ λ log2 λ (qiskit ``entropy`` default base 2)."""
    evals = jnp.maximum(jnp.linalg.eigvalsh(rho), 0.0)
    logs = jnp.where(evals > 0, jnp.log(jnp.maximum(evals, 1e-38)), 0.0)
    return -jnp.sum(evals * logs) / _LOG2


def partial_trace_keep_low(rho: jnp.ndarray, num_keep: int) -> jnp.ndarray:
    """Trace out the high qubits, keeping qubits 0..num_keep-1 (the LSBs).

    With the little-endian convention the state index factors as
    ``i = high * 2^num_keep + low``; the reference's half-cut
    ``partial_trace(rho, range(cut, n))`` (``reconstruct.py:72-75``) keeps
    exactly these low qubits.
    """
    d = rho.shape[-1]
    d_low = 2**num_keep
    d_high = d // d_low
    r4 = rho.reshape(d_high, d_low, d_high, d_low)
    return jnp.einsum("aiaj->ij", r4)


def entanglement_entropy(rho: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """Entropy of the half-cut reduced state (keep qubits 0..N//2-1)."""
    cut = num_qubits // 2
    return von_neumann_entropy(partial_trace_keep_low(rho, cut))


def get_metrics(rho: jnp.ndarray, num_qubits: int):
    """(purity, von Neumann entropy, entanglement entropy) — reference
    ``get_metrics`` (``reconstruct.py:69-76``)."""
    return (
        purity(rho),
        von_neumann_entropy(rho),
        entanglement_entropy(rho, num_qubits),
    )


def z_bias(z_samples: jnp.ndarray) -> jnp.ndarray:
    """Fraction of zeros in computational-basis samples.

    Mode-collapse diagnostic (reference ``evaluate.py:32-38``); 0.5 means
    balanced.
    """
    return jnp.mean((z_samples == 0).astype(jnp.float32))


batched_fidelity = jax.vmap(state_fidelity)
