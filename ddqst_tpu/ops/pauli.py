"""Pauli algebra and linear-inversion density-matrix reconstruction.

TPU-first redesign of the reference reconstruction
(``multi_qubit_any_state/reconstruct.py:5-76``): instead of a Python loop
over all 4^N Pauli strings that rescans the sample arrays for each string
(``get_coefficient``), we compute *sufficient statistics once* — the mean
parity of every qubit subset per measured basis, built by an O(N) doubling
pass — and obtain every Pauli coefficient with a single einsum against a
precomputed compatibility matrix. The density matrix then assembles as one
``[4^N] x [4^N, d, d]`` contraction on the MXU.

Endianness convention (global, see package docstring): qubit q is bit q of
the computational-basis index (little-endian, qubit 0 = LSB), and index q of
every label/bitstring array. ``pauli_matrices`` therefore krons factor q=N-1
outermost — equivalent to the reference's "CRITICAL FIX" label reversal
(``multi_qubit_any_state/reconstruct.py:17-24``), but baked into one
convention instead of patched per phase.

Coefficient estimation modes:

- ``"mean"`` (default): average the parity estimate over *all* compatible
  measured bases — statistically strictly better than the reference.
- ``"first"``: use only the first compatible basis, bit-for-bit matching the
  reference (``reconstruct.py:32-46``) for parity testing.
"""

from __future__ import annotations

import functools
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops.complexlib import (
    CArray,
    f32_matmul,
    from_complex,
    project_psd as cl_project_psd,
)

_SINGLE = np.stack(
    [
        np.array([[1, 0], [0, 1]], dtype=np.complex64),  # I
        np.array([[0, 1], [1, 0]], dtype=np.complex64),  # X
        np.array([[0, -1j], [1j, 0]], dtype=np.complex64),  # Y
        np.array([[1, 0], [0, -1]], dtype=np.complex64),  # Z
    ]
)

PAULI_CHARS = "IXYZ"
BASIS_CHARS = "XYZ"


def all_pauli_labels(num_qubits: int) -> np.ndarray:
    """``[4^N, N]`` int labels (0=I,1=X,2=Y,3=Z), index q = qubit q.

    Enumeration order matches ``itertools.product('IXYZ', repeat=N)`` on the
    label string (first character = qubit 0 varies slowest), mirroring the
    reference's ``all_paulis`` list (``reconstruct.py:59``).
    """
    combos = list(product(range(4), repeat=num_qubits))
    return np.array(combos, dtype=np.int32)


def all_basis_labels(num_qubits: int) -> np.ndarray:
    """``[3^N, N]`` int labels (0=X,1=Y,2=Z), index q = qubit q.

    Row order matches the reference's canonical basis enumeration
    ``itertools.product('XYZ', repeat=N)`` (``data_gen.py:23-26``), so
    ``basis_idx`` values are interchangeable with the reference.
    """
    combos = list(product(range(3), repeat=num_qubits))
    return np.array(combos, dtype=np.int32)


def basis_label_to_str(label: np.ndarray) -> str:
    return "".join(BASIS_CHARS[i] for i in label)


def basis_str_to_label(s: str) -> np.ndarray:
    return np.array([BASIS_CHARS.index(c) for c in s], dtype=np.int32)


def pauli_matrices(labels: np.ndarray) -> np.ndarray:
    """Build ``[K, d, d]`` complex64 Pauli-string matrices from int labels.

    Qubit 0 is the innermost (fastest-varying / LSB) kron factor:
    ``P = P_{N-1} ⊗ ... ⊗ P_1 ⊗ P_0``.
    """
    labels = np.asarray(labels)
    if labels.ndim == 1:
        labels = labels[None]
    k, n = labels.shape
    mats = _SINGLE[labels[:, 0]]  # [K, 2, 2]
    for q in range(1, n):
        nxt = _SINGLE[labels[:, q]]  # [K, 2, 2]  (becomes the new MSB factor)
        mats = np.einsum("kab,kij->kaibj", nxt, mats).reshape(
            k, mats.shape[1] * 2, mats.shape[2] * 2
        )
    return mats


def pauli_matrix(label_str: str) -> np.ndarray:
    """Single Pauli-string matrix from a character label ('XZI' etc.)."""
    label = np.array([PAULI_CHARS.index(c) for c in label_str], dtype=np.int32)
    return pauli_matrices(label)[0]


def subset_parity_means(
    bits: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean parity of every qubit subset, per measured basis.

    Args:
      bits: ``[B, S, N]`` integer bit samples (basis, shot, qubit).
      weights: optional ``[B, S]`` nonnegative sample weights (e.g. counts);
        zero-weight rows are padding. Defaults to uniform.

    Returns:
      ``[B, 2^N]`` float32; column ``m`` is E[prod_{q: bit q of m} (1-2 x_q)].
      Column 0 (empty subset) is 1.
    """
    b, s, n = bits.shape
    vals = (1 - 2 * bits).astype(jnp.float32)  # [B, S, N] in {-1, +1}
    par = jnp.ones((b, s, 1), dtype=jnp.float32)
    for q in range(n):  # static N-step doubling: [B,S,2^q] -> [B,S,2^{q+1}]
        par = jnp.concatenate([par, par * vals[:, :, q : q + 1]], axis=-1)
    if weights is None:
        return jnp.mean(par, axis=1)
    w = weights.astype(jnp.float32)
    tot = jnp.sum(w, axis=1, keepdims=True)
    return jnp.einsum("bs,bsm->bm", w, par) / jnp.maximum(tot, 1.0)


def counts_parity_means(counts: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """Mean parity of every qubit subset from outcome histograms.

    The subset parities of a histogram are exactly its (unnormalised)
    Walsh–Hadamard transform: ``p[b, m] = Σ_x counts[b, x]·(-1)^popcount(x&m)
    / Σ_x counts[b, x]``. Computed with the fast WHT — N doubling passes,
    O(B·N·2^N) — so reconstruction from counts never touches a per-shot
    ``[B, S, 2^N]`` parity tensor (5.6 GB at N=7 with 2187×5000 shots).

    Args:
      counts: ``[B, 2^N]`` nonnegative outcome histograms; outcome index x
        is little-endian (bit q of x = qubit q, the global convention).

    Returns:
      ``[B, 2^N]`` float32; column ``m`` as in :func:`subset_parity_means`.
    """
    b, d = counts.shape
    x = counts.astype(jnp.float32)
    tot = jnp.sum(x, axis=1, keepdims=True)
    for q in range(num_qubits):
        # [B, hi, 2, lo]: the middle axis is bit q of the outcome index.
        xr = x.reshape(b, d // 2 ** (q + 1), 2, 2**q)
        x = jnp.stack(
            [xr[:, :, 0, :] + xr[:, :, 1, :], xr[:, :, 0, :] - xr[:, :, 1, :]],
            axis=2,
        ).reshape(b, d)
    return x / jnp.maximum(tot, 1.0)


def _compat_weights(
    num_qubits: int, basis_labels: np.ndarray, mode: str
) -> tuple[np.ndarray, np.ndarray]:
    """Precompute (W [4^N, B] float32, mask_idx [4^N] int32) on host.

    ``W[p, b]`` weights basis b's parity estimate in Pauli p's coefficient;
    rows sum to 1 (or to 0 for Pauli strings no measured basis can estimate,
    whose coefficient then comes out 0 — same as the reference's fallthrough
    ``return 0.0``, ``reconstruct.py:49``). ``mask_idx[p]`` is the subset
    mask (bit q set iff Pauli p acts nontrivially on qubit q).
    """
    paulis = all_pauli_labels(num_qubits)  # [P, N]
    nontrivial = paulis != 0  # [P, N]
    mask_idx = (nontrivial * (1 << np.arange(num_qubits))).sum(1).astype(np.int32)
    # Compatible: on every non-identity site, basis char equals pauli char.
    # pauli code 1,2,3 (X,Y,Z) matches basis code 0,1,2 (X,Y,Z).
    compat = np.all(
        ~nontrivial[:, None, :]
        | (paulis[:, None, :] - 1 == basis_labels[None, :, :]),
        axis=-1,
    )  # [P, B] bool
    if mode == "first":
        w = np.zeros(compat.shape, dtype=np.float32)
        has = compat.any(axis=1)
        first = compat.argmax(axis=1)
        w[np.nonzero(has)[0], first[has]] = 1.0
    elif mode == "mean":
        counts = compat.sum(axis=1, keepdims=True)
        w = compat.astype(np.float32) / np.maximum(counts, 1)
    else:
        raise ValueError(f"unknown compat mode: {mode!r}")
    return w, mask_idx


_SINGLE_RE = _SINGLE.real.astype(np.float32)  # [4, 2, 2]
_SINGLE_IM = _SINGLE.imag.astype(np.float32)


def coeffs_to_rho(coeff: jnp.ndarray, num_qubits: int) -> CArray:
    """Assemble ρ = (1/d) Σ_p c_p P_p by a factored per-qubit transform.

    The Pauli strings are tensor products, so the [4^N]-coefficient → ρ
    map factorises into N tiny contractions with the single-qubit Pauli
    tensor S[p, i, j]: reshape c to (4,)*N (axis q = qubit q, matching
    :func:`all_pauli_labels` order) and fold one axis at a time into the
    growing (row, col) block. O(N·4^N) work and O(4^N) memory, versus the
    dense ``[4^N, d, d]`` Pauli-stack einsum whose constants alone are
    2.1 GB at N=7 — the lever that makes full linear inversion feasible
    beyond the reference's N≤3 (``reconstruct.py:72-96`` loops Python-side
    over 4^N strings; here even the dense stack is gone).
    """
    n = num_qubits
    sr = jnp.asarray(_SINGLE_RE)
    si = jnp.asarray(_SINGLE_IM)
    tr = coeff.astype(jnp.float32).reshape((4,) * n + (1, 1))
    ti = jnp.zeros_like(tr)
    # Fold qubits N-1 .. 0 (the last remaining pauli axis each step), so
    # each new qubit lands as the LOW row/col bit beneath the higher
    # qubits already folded — the little-endian convention (qubit 0 = LSB).
    for _ in range(n):
        nr = jnp.einsum("...pab,pxy->...axby", tr, sr) - jnp.einsum(
            "...pab,pxy->...axby", ti, si
        )
        ni = jnp.einsum("...pab,pxy->...axby", tr, si) + jnp.einsum(
            "...pab,pxy->...axby", ti, sr
        )
        sh = nr.shape
        new_shape = sh[: -4] + (sh[-4] * sh[-3], sh[-2] * sh[-1])
        tr, ti = nr.reshape(new_shape), ni.reshape(new_shape)
    d = 2**n
    return CArray(tr / d, ti / d)


def project_psd(rho: CArray) -> CArray:
    """Clip negative eigenvalues and renormalise the trace to 1.

    Matches ``make_positive_semidefinite`` (``reconstruct.py:51-70``) but in
    the split-real representation (see :mod:`ddqst_tpu.ops.complexlib` — the
    TPU has no complex lowerings, so the spectral step runs as a real eigh
    of the 2d x 2d Hermitian embedding).
    """
    if not isinstance(rho, CArray):
        rho = from_complex(rho)
    return cl_project_psd(rho)


def make_inverter(
    num_qubits: int,
    basis_labels: np.ndarray | None = None,
    compat_mode: str = "mean",
    psd: bool = True,
    readout_p: float = 0.0,
):
    """Build a jitted linear-inversion function for a fixed basis set.

    Args:
      num_qubits: N.
      basis_labels: ``[B, N]`` int basis labels of the measured bases, in the
        row order of the ``bits`` argument. Defaults to all 3^N canonical.
      compat_mode: ``"mean"`` or ``"first"`` (see module docstring).
      psd: project onto the PSD cone and renormalise (reference always does).
      readout_p: symmetric per-qubit readout flip probability to *mitigate*.
        A symmetric flip channel scales every k-qubit parity by (1-2p)^k, so
        the unbiased clean estimator is the measured parity divided by
        (1-2p)^|mask| — closed-form readout error mitigation in the parity
        domain (a capability beyond the reference, which reconstructs from
        raw noisy parities; 0 disables it).

    Returns:
      ``invert(bits [B, S, N], weights=None) -> rho`` as a split-real
      :class:`~ddqst_tpu.ops.complexlib.CArray`.
    """
    parities_to_rho = _make_parities_to_rho(
        num_qubits, basis_labels, compat_mode, psd, readout_p
    )

    @f32_matmul
    @jax.jit
    def invert(bits, weights=None) -> CArray:
        return parities_to_rho(subset_parity_means(bits, weights))

    return invert


def _is_canonical_grid(basis_labels: np.ndarray, num_qubits: int) -> bool:
    """True iff ``basis_labels`` is the full 3^N canonical grid in order."""
    if basis_labels.shape != (3**num_qubits, num_qubits):
        return False
    return bool(np.array_equal(basis_labels, all_basis_labels(num_qubits)))


def _make_parities_to_rho(
    num_qubits: int,
    basis_labels: np.ndarray | None,
    compat_mode: str,
    psd: bool,
    readout_p: float,
):
    """Shared core: per-basis subset parities ``[B, 2^N]`` → ρ.

    Two paths:

    - **Factored (full canonical grid, "mean" mode)**: the dense
      compatibility weight ``W [4^N, B]`` is itself a tensor product over
      qubits, so the coefficient estimate contracts qubit-by-qubit with one
      24-float kernel ``A[pauli, basis, mask_bit]`` (I averages the 3 basis
      choices at mask bit 0; X/Y/Z select their own basis at mask bit 1).
      O(N·6^N) work, O(6^N) memory, and — decisive on the TPU relay — a
      *constant-free* program: the dense W is 1.7 GB of baked HLO literal
      at N=8 (65,536 × 6,561 f32), which exceeded the remote-compile
      request-body limit (HTTP 413). Readout mitigation folds in as a
      1/(1-2p) factor on the non-identity rows of A.
    - **Dense (arbitrary basis subsets or "first" mode)**: the original
      ``[4^N, B]`` einsum; fine at the sizes those paths run at.
    """
    if basis_labels is None:
        basis_labels = all_basis_labels(num_qubits)
    if compat_mode == "mean" and _is_canonical_grid(basis_labels, num_qubits):
        a_np = np.zeros((4, 3, 2), np.float32)
        a_np[0, :, 0] = 1.0 / 3.0
        for k in range(1, 4):
            a_np[k, k - 1, 1] = 1.0
        if readout_p > 0:
            a_np[1:] /= 1.0 - 2.0 * readout_p
        a = jnp.asarray(a_np)
        n = num_qubits

        def parities_to_rho_factored(parities: jnp.ndarray) -> CArray:
            # Axes after reshape: [b_0..b_{n-1}, m_{n-1}..m_0] (basis digit
            # q is slowest for qubit 0; mask bit q of the parity column is
            # qubit q, so the first mask axis is qubit n-1). Each step
            # contracts the adjacent (b_q, m_q) pair at the group boundary
            # into pauli digit p_q, appended on the right.
            t = parities.reshape((3,) * n + (2,) * n)
            for r in range(n, 0, -1):
                t = t.reshape(3 ** (r - 1), 3, 2, -1)
                t = jnp.einsum("ibmr,pbm->irp", t, a)
            coeff = t.reshape((4,) * n)
            coeff = coeff.transpose(tuple(range(n - 1, -1, -1))).reshape(-1)
            # <I..I> == 1 exactly (guards all-zero-weight bases, matching
            # the dense path's identity_row handling).
            coeff = coeff.at[0].set(1.0)
            rho = coeffs_to_rho(coeff, num_qubits)
            return cl_project_psd(rho) if psd else rho

        return parities_to_rho_factored
    w_np, mask_idx_np = _compat_weights(num_qubits, basis_labels, compat_mode)
    if readout_p > 0:
        mask_sizes = np.asarray(
            (all_pauli_labels(num_qubits) != 0).sum(axis=1), np.float32
        )
        w_np = w_np * ((1.0 - 2.0 * readout_p) ** -mask_sizes)[:, None]
    w = jnp.asarray(w_np)
    mask_idx = jnp.asarray(mask_idx_np)
    identity_row = jnp.asarray(
        (all_pauli_labels(num_qubits) == 0).all(1), dtype=jnp.float32
    )

    def parities_to_rho(parities: jnp.ndarray) -> CArray:
        selected = parities[:, mask_idx]  # [B, P]
        coeff = jnp.einsum("pb,bp->p", w, selected)
        coeff = coeff * (1.0 - identity_row) + identity_row  # <I..I> == 1
        rho = coeffs_to_rho(coeff, num_qubits)  # factored, no [4^N,d,d] stack
        return cl_project_psd(rho) if psd else rho

    return parities_to_rho


def make_counts_inverter(
    num_qubits: int,
    basis_labels: np.ndarray | None = None,
    compat_mode: str = "mean",
    psd: bool = True,
    readout_p: float = 0.0,
):
    """Counts-native linear inversion: ``invert(counts [B, 2^N]) -> rho``.

    Same estimator as :func:`make_inverter` but fed outcome histograms
    (counts over the 2^N little-endian outcomes per basis) instead of
    per-shot bit arrays; parities come from the fast Walsh–Hadamard
    transform (:func:`counts_parity_means`). This is the scalable path for
    large N / shot counts — O(B·N·2^N) with no per-shot intermediate —
    whereas the reference rescans raw sample lists per Pauli string
    (``multi_qubit_any_state/reconstruct.py:32-49``).
    """
    parities_to_rho = _make_parities_to_rho(
        num_qubits, basis_labels, compat_mode, psd, readout_p
    )

    @f32_matmul
    @jax.jit
    def invert_counts(counts) -> CArray:
        return parities_to_rho(counts_parity_means(counts, num_qubits))

    return invert_counts


@functools.lru_cache(maxsize=32)
def _cached_inverter(num_qubits: int, compat_mode: str, psd: bool):
    return make_inverter(num_qubits, None, compat_mode, psd)


def linear_inversion(
    bits,
    num_qubits: int,
    weights=None,
    compat_mode: str = "mean",
    psd: bool = True,
) -> jnp.ndarray:
    """One-shot linear inversion over the full canonical 3^N basis set.

    ``bits``: ``[3^N, S, N]`` samples in canonical basis order
    (``all_basis_labels`` row order). For non-canonical / partial basis sets
    use :func:`make_inverter` directly.
    """
    return _cached_inverter(num_qubits, compat_mode, psd)(bits, weights)
