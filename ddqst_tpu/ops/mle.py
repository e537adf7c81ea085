"""Maximum-likelihood density-matrix reconstruction (iterative RρR).

The reference reconstructs exclusively by linear inversion + PSD clipping
(``multi_qubit_any_state/reconstruct.py:72-96``); MLE is named in the
project's method space (README.md:9-23 "classical tomography (linear
inversion / MLE)") but never implemented. This module provides it as
batched real linear algebra on TPU:

  R(ρ) = Σ_{b,i} f_{b,i} / tr(ρ Π_{b,i}) · Π_{b,i},     ρ ← R ρ R / tr(·)

with POVM elements Π_{b,i} = U_b† |i⟩⟨i| U_b for each measured basis b and
outcome i. Readout error is handled *statistically optimally* by folding
the confusion matrix into the POVM: Π'_{b,i} = Σ_j M_{ij} Π_{b,j}, so the
likelihood is that of the actual noisy measurement — no quasi-probability
inversion needed.

Everything runs in the split-real representation (the TPU backend has no
complex lowerings; see :mod:`ddqst_tpu.ops.complexlib`). The iteration is a
``lax.fori_loop`` of d x d real matmuls — microseconds per iteration at
tomography scales.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops.complexlib import CArray, cmatmul, from_complex
from ddqst_tpu.ops.pauli import all_basis_labels


def bits_to_counts(bits: jnp.ndarray) -> jnp.ndarray:
    """``[B, S, N]`` bit samples -> ``[B, 2^N]`` outcome counts."""
    b, s, n = bits.shape
    idx = jnp.sum(
        bits.astype(jnp.int32) * (1 << jnp.arange(n, dtype=jnp.int32)), axis=-1
    )
    onehot = idx[..., None] == jnp.arange(2**n, dtype=jnp.int32)
    return jnp.sum(onehot.astype(jnp.float32), axis=1)


def _povm_elements(
    num_qubits: int, basis_labels: np.ndarray, readout_p: float
) -> np.ndarray:
    """Host-side complex POVM stack ``[B*d, d, d]`` (then split on device)."""
    # Deferred imports: qsim.measure itself imports from ddqst_tpu.ops, so a
    # module-level import here would be circular via ops/__init__.
    from ddqst_tpu.qsim.measure import rotation_unitaries
    from ddqst_tpu.qsim.noise import confusion_matrix

    d = 2**num_qubits
    rots = rotation_unitaries(basis_labels)  # [B, d, d] complex
    # Π_{b,i} = U† |i><i| U : outer product of U's i-th row conj with itself.
    rows = rots.conj()  # [B, d(out i), d] — row i of U† |i><i| U basis
    pis = np.einsum("bik,bil->bikl", rows, rows.conj())  # [B, d, d, d]
    if readout_p > 0:
        m = confusion_matrix(num_qubits, readout_p)  # [d_meas, d_true]
        pis = np.einsum("ij,bjkl->bikl", m, pis)
    b = basis_labels.shape[0]
    return pis.reshape(b * d, d, d).astype(np.complex64)


def make_mle(
    num_qubits: int,
    basis_labels: np.ndarray | None = None,
    readout_p: float = 0.0,
    iterations: int = 600,
    epsilon: float = 0.25,
):
    """Build a jitted MLE reconstructor for a fixed basis set.

    Uses the *diluted* RρR iteration (Řeháček et al.):
    ρ ← G ρ G / tr(·) with G = (1-ε) I + ε R̃, R̃ = R / num_bases so that
    tr(R̃ρ) = 1 identically (per-basis-normalised frequencies sum to the
    basis count). The plain RρR map can oscillate between fixed points on
    rank-deficient empirical data (observed: fidelity 0.988 at 50
    iterations degrading to 0.68 at 150); the diluted map converges
    monotonically for ε < 1 at a modest iteration-count cost.

    Returns ``reconstruct(counts [B, 2^N]) -> rho`` (CArray). ``counts`` may
    be raw counts or frequencies (normalised internally per basis).
    """
    if basis_labels is None:
        basis_labels = all_basis_labels(num_qubits)
    d = 2**num_qubits
    num_rows = basis_labels.shape[0]
    povm = from_complex(_povm_elements(num_qubits, basis_labels, readout_p))
    eye = jnp.eye(d, dtype=jnp.float32)

    @jax.jit
    def reconstruct(counts: jnp.ndarray) -> CArray:
        freqs = counts / jnp.maximum(
            jnp.sum(counts, axis=-1, keepdims=True), 1.0
        )
        f = freqs.reshape(-1).astype(jnp.float32)  # [B*d], sums to B
        rho0 = CArray(eye / d, jnp.zeros((d, d), jnp.float32))

        def body(_, rho):
            # tr(ρ Π_k) — real for Hermitian operands.
            p = jnp.einsum("ij,kij->k", rho.re, povm.re) + jnp.einsum(
                "ij,kij->k", rho.im, povm.im
            )
            w = (f / jnp.maximum(p, 1e-8)) * (epsilon / num_rows)
            g = CArray(
                (1.0 - epsilon) * eye + jnp.einsum("k,kij->ij", w, povm.re),
                jnp.einsum("k,kij->ij", w, povm.im),
            )
            new = cmatmul(cmatmul(g, rho), g)
            tr = jnp.trace(new.re)
            ok = (tr > 1e-20) & jnp.isfinite(tr)
            new = new.scale(jnp.where(ok, 1.0 / jnp.where(ok, tr, 1.0), 0.0))
            # If the update degenerated, keep the previous iterate.
            keep = ok & jnp.isfinite(new.re).all() & jnp.isfinite(new.im).all()
            return CArray(
                jnp.where(keep, new.re, rho.re),
                jnp.where(keep, new.im, rho.im),
            )

        return jax.lax.fori_loop(0, iterations, body, rho0)

    return reconstruct
