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

from ddqst_tpu.ops.complexlib import CArray, cmatmul, f32_matmul, from_complex
from ddqst_tpu.ops.pauli import all_basis_labels


def bits_to_counts(bits: jnp.ndarray) -> jnp.ndarray:
    """``[B, S, N]`` bit samples -> ``[B, 2^N]`` outcome counts.

    Histogram by scatter-add — O(B·S) work and O(B·2^N) output, with no
    ``[B, S, 2^N]`` one-hot intermediate (at the N=10 shadow scale that
    intermediate would be ~2 GB).
    """
    b, s, n = bits.shape
    idx = jnp.sum(
        bits.astype(jnp.int32) * (1 << jnp.arange(n, dtype=jnp.int32)), axis=-1
    )  # [B, S]
    out = jnp.zeros((b, 2**n), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], idx.shape)
    return out.at[rows, idx].add(1.0)


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


def _rot1_split(basis_labels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-qubit 2x2 rotation stack for each basis row.

    Returns ``(re, im)`` of shape ``[B, N, 2, 2]`` — the single-qubit
    factors of U_b = ⊗_q u_{b_q} (same convention as
    :func:`ddqst_tpu.qsim.measure.rotation_unitaries`, qubit 0 = LSB).
    """
    from ddqst_tpu.qsim.measure import rotation_unitaries

    b, n = basis_labels.shape
    us = np.stack(
        [rotation_unitaries(basis_labels[:, q : q + 1]) for q in range(n)],
        axis=1,
    )  # [B, N, 2, 2] complex64
    return us.real.astype(np.float32), us.imag.astype(np.float32)


def _apply_left(tr, ti, ur, ui, q: int, n: int):
    """t <- (I ⊗ u_q ⊗ I) t for batched [B, d, d] t, per-basis u [B, 2, 2]."""
    b, d, _ = tr.shape
    hi, lo = 2 ** (n - 1 - q), 2**q
    shape = (b, hi, 2, lo, d)
    tr, ti = tr.reshape(shape), ti.reshape(shape)
    nr = jnp.einsum("bxy,bhyld->bhxld", ur, tr) - jnp.einsum(
        "bxy,bhyld->bhxld", ui, ti
    )
    ni = jnp.einsum("bxy,bhyld->bhxld", ur, ti) + jnp.einsum(
        "bxy,bhyld->bhxld", ui, tr
    )
    return nr.reshape(b, d, d), ni.reshape(b, d, d)


def _apply_right_dag(tr, ti, ur, ui, q: int, n: int):
    """t <- t (I ⊗ u_q ⊗ I)†: new[.., x] = Σ_y t[.., y] conj(u[x, y])."""
    b, d, _ = tr.shape
    hi, lo = 2 ** (n - 1 - q), 2**q
    shape = (b, d, hi, 2, lo)
    tr, ti = tr.reshape(shape), ti.reshape(shape)
    nr = jnp.einsum("bxy,bdhyl->bdhxl", ur, tr) + jnp.einsum(
        "bxy,bdhyl->bdhxl", ui, ti
    )
    ni = jnp.einsum("bxy,bdhyl->bdhxl", ur, ti) - jnp.einsum(
        "bxy,bdhyl->bdhxl", ui, tr
    )
    return nr.reshape(b, d, d), ni.reshape(b, d, d)


def _confuse_probs(p: jnp.ndarray, m2: jnp.ndarray, n: int) -> jnp.ndarray:
    """Apply the tensor-product confusion matrix to [B, d] prob rows,
    one 2x2 factor per qubit (never materialises the [d, d] kron)."""
    b, d = p.shape
    for q in range(n):
        hi, lo = 2 ** (n - 1 - q), 2**q
        p = jnp.einsum("xy,bhyl->bhxl", m2, p.reshape(b, hi, 2, lo))
        p = p.reshape(b, d)
    return p


def _auto_iters_per_call(num_qubits: int, num_rows: int, iterations: int) -> int:
    """Iterations per device dispatch, bounded so one dispatch stays well
    under the TPU relay's multi-minute crash horizon (CLAUDE.md "single
    device programs running >~2-4 min crash the worker" — observed live at
    N=7, where the full 4000-iteration while_loop is one multi-minute
    program). Per-iteration work scales as B·N·d², so the cap shrinks with
    system size; at reference scales (N≤5) the whole run stays one
    dispatch, preserving the round-2 behaviour.
    """
    d = 2**num_qubits
    cost = max(1, num_rows * num_qubits * d * d)
    return max(50, min(iterations, (1 << 31) // cost))


def _run_chunked(step, rho0: CArray, f, iterations: int, tol: float) -> CArray:
    """Drive the jitted while_loop chunk to convergence from the host.

    Each call materialises (i, delta) — one sync per dispatch — so no
    single device program exceeds the chunk bound.
    """
    i, delta, rho = 0, float("inf"), rho0
    while i < iterations and delta > tol:
        i_arr, rho, delta_arr = step(jnp.int32(i), rho, f)
        i, delta = int(i_arr), float(delta_arr)
    return rho


def make_mle(
    num_qubits: int,
    basis_labels: np.ndarray | None = None,
    readout_p: float = 0.0,
    iterations: int = 4000,
    epsilon: float = 0.25,
    tol: float = 3e-7,
    impl: str = "auto",
    iters_per_call: int = 0,
):
    """Build a jitted MLE reconstructor for a fixed basis set.

    Uses the *diluted* RρR iteration (Řeháček et al.):
    ρ ← G ρ G / tr(·) with G = (1-ε) I + ε R̃, R̃ = R / num_bases so that
    tr(R̃ρ) = 1 identically (per-basis-normalised frequencies sum to the
    basis count). The plain RρR map can oscillate between fixed points on
    rank-deficient empirical data (observed: fidelity 0.988 at 50
    iterations degrading to 0.68 at 150); the diluted map converges
    monotonically for ε < 1 at a modest iteration-count cost.

    ``iterations`` is a cap, not a fixed count: the loop stops once the
    Frobenius norm of the per-iteration ρ update falls below ``tol`` — an
    adaptive convergence stop replacing the previous fixed 600 iterations
    (which both overpaid on easy inputs and, measured on readout-noisy
    GHZ-3 exact counts, stopped well short of the fixed point: fidelity
    0.9979 at 600 vs 0.9995 at the default tol). Float32 ρ updates
    quantise to zero at genuine convergence, so the loop always halts.

    Returns ``reconstruct(counts [B, 2^N]) -> rho`` (CArray). ``counts`` may
    be raw counts or frequencies (normalised internally per basis).

    ``impl`` selects how POVM contractions run:

    - ``'dense'``: materialise the ``[B·d, d, d]`` POVM stack (original
      path). Fine to N≈4; at N=6 the stack is a 1.5 GB jit constant built
      by a multi-GB host einsum.
    - ``'factored'``: never build Π at all. Π_{b,i} = ⊗_q u†|i_q⟩⟨i_q|u is
      a tensor product, so tr(ρ Π_{b,i}) = diag(U_b ρ U_b†)_i and
      Σ_i w_i Π_{b,i} = U_b† diag(w) U_b, both computed by 2N batched
      per-qubit 2x2 contractions — O(B·N·d²) work, O(B·d²) memory,
      MXU-shaped einsums. The readout confusion matrix (also a tensor
      product) folds in as p ↦ M p and w ↦ Mᵀ w per basis.
    - ``'auto'``: 'factored' for num_qubits ≥ 5, else 'dense'.

    ``iters_per_call`` bounds the iterations per device dispatch
    (0 = auto, scaled by B·N·d² — see :func:`_auto_iters_per_call`); the
    host drives chunks to convergence, so large-N reconstructions never
    submit one multi-minute device program.
    """
    if basis_labels is None:
        basis_labels = all_basis_labels(num_qubits)
    if impl == "auto":
        impl = "factored" if num_qubits >= 5 else "dense"
    if iters_per_call <= 0:
        iters_per_call = _auto_iters_per_call(
            num_qubits, basis_labels.shape[0], iterations
        )
    if impl == "factored":
        return _make_mle_factored(
            num_qubits, basis_labels, readout_p, iterations, epsilon, tol,
            iters_per_call,
        )
    d = 2**num_qubits
    num_rows = basis_labels.shape[0]
    povm = from_complex(_povm_elements(num_qubits, basis_labels, readout_p))
    eye = jnp.eye(d, dtype=jnp.float32)

    @f32_matmul
    @jax.jit
    def step(i0, rho_in: CArray, f) -> tuple:
        def cond(carry):
            i, _, delta = carry
            return (
                (i < i0 + iters_per_call) & (i < iterations) & (delta > tol)
            )

        def body(carry):
            i, rho, _ = carry
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
            nxt = CArray(
                jnp.where(keep, new.re, rho.re),
                jnp.where(keep, new.im, rho.im),
            )
            delta = jnp.sqrt(
                jnp.sum((nxt.re - rho.re) ** 2 + (nxt.im - rho.im) ** 2)
            )
            return i + 1, nxt, delta

        return jax.lax.while_loop(
            cond, body, (i0, rho_in, jnp.float32(jnp.inf))
        )

    def reconstruct(counts: jnp.ndarray) -> CArray:
        freqs = counts / jnp.maximum(
            jnp.sum(counts, axis=-1, keepdims=True), 1.0
        )
        f = freqs.reshape(-1).astype(jnp.float32)  # [B*d], sums to B
        rho0 = CArray(eye / d, jnp.zeros((d, d), jnp.float32))
        return _run_chunked(step, rho0, f, iterations, tol)

    return reconstruct


def _make_mle_factored(
    num_qubits: int,
    basis_labels: np.ndarray,
    readout_p: float,
    iterations: int,
    epsilon: float,
    tol: float,
    iters_per_call: int,
):
    """Tensor-product MLE (see :func:`make_mle` ``impl='factored'``).

    Identical iteration (diluted RρR, adaptive stop) with the two POVM
    contractions replaced by per-qubit rotations; numerics agree with the
    dense path to f32 tolerance (tested in ``tests/test_mle.py``).
    """
    n = num_qubits
    d = 2**n
    num_rows = basis_labels.shape[0]
    ur_np, ui_np = _rot1_split(np.asarray(basis_labels))
    ur, ui = jnp.asarray(ur_np), jnp.asarray(ui_np)  # [B, N, 2, 2]
    # u† factors (for U† D U): conj-transpose each 2x2.
    udr = jnp.swapaxes(ur, -1, -2)
    udi = -jnp.swapaxes(ui, -1, -2)
    m2 = jnp.array(
        [[1.0 - readout_p, readout_p], [readout_p, 1.0 - readout_p]],
        jnp.float32,
    )
    eye = jnp.eye(d, dtype=jnp.float32)

    def rotate(tr, ti, fr, fi):
        for q in range(n):
            tr, ti = _apply_left(tr, ti, fr[:, q], fi[:, q], q, n)
        for q in range(n):
            tr, ti = _apply_right_dag(tr, ti, fr[:, q], fi[:, q], q, n)
        return tr, ti

    if num_rows * d * d > _FACTORED_BLOCK_ELEMS:
        # Row-blocked iteration (N>=8 scale): the single-block body holds
        # several [B, d, d] f32 live at once through the 2N-einsum rotate
        # chain — 1.7 GB per array at B=6561, d=256, which overruns HBM
        # (measured: the first N=8 dispatch crashed the TPU worker).
        # lax.map over row blocks bounds the live set to one block.
        return _make_factored_blocked(
            n, num_rows, ur, ui, udr, udi, m2, eye, rotate, readout_p,
            iterations, epsilon, tol, iters_per_call,
        )

    @f32_matmul
    @jax.jit
    def step(i0, rho_in: CArray, f) -> tuple:
        def cond(carry):
            i, _, delta = carry
            return (
                (i < i0 + iters_per_call) & (i < iterations) & (delta > tol)
            )

        def body(carry):
            i, rho, _ = carry
            # p[b, i] = diag(U_b ρ U_b†)_i = tr(ρ Π_{b,i}).
            sr, _ = rotate(
                jnp.broadcast_to(rho.re, (num_rows, d, d)),
                jnp.broadcast_to(rho.im, (num_rows, d, d)),
                ur, ui,
            )
            p = jnp.diagonal(sr, axis1=-2, axis2=-1)  # [B, d]
            if readout_p > 0:
                p = _confuse_probs(p, m2, n)
            w = (f / jnp.maximum(p, 1e-8)) * (epsilon / num_rows)
            if readout_p > 0:
                # Σ_i w_i Π'_{b,i} = Σ_j (Mᵀw)_j Π_{b,j}.
                w = _confuse_probs(w, m2.T, n)
            # Σ_b U_b† diag(w_b) U_b.
            rr, ri = rotate(
                eye[None] * w[:, :, None],
                jnp.zeros((num_rows, d, d), jnp.float32),
                udr, udi,
            )
            g = CArray(
                (1.0 - epsilon) * eye + jnp.sum(rr, axis=0),
                jnp.sum(ri, axis=0),
            )
            new = cmatmul(cmatmul(g, rho), g)
            tr_ = jnp.trace(new.re)
            ok = (tr_ > 1e-20) & jnp.isfinite(tr_)
            new = new.scale(jnp.where(ok, 1.0 / jnp.where(ok, tr_, 1.0), 0.0))
            keep = ok & jnp.isfinite(new.re).all() & jnp.isfinite(new.im).all()
            nxt = CArray(
                jnp.where(keep, new.re, rho.re),
                jnp.where(keep, new.im, rho.im),
            )
            delta = jnp.sqrt(
                jnp.sum((nxt.re - rho.re) ** 2 + (nxt.im - rho.im) ** 2)
            )
            return i + 1, nxt, delta

        return jax.lax.while_loop(
            cond, body, (i0, rho_in, jnp.float32(jnp.inf))
        )

    def reconstruct(counts: jnp.ndarray) -> CArray:
        freqs = counts / jnp.maximum(
            jnp.sum(counts, axis=-1, keepdims=True), 1.0
        )
        f = freqs.astype(jnp.float32)  # [B, d], rows sum to 1
        rho0 = CArray(eye / d, jnp.zeros((d, d), jnp.float32))
        return _run_chunked(step, rho0, f, iterations, tol)

    return reconstruct


# Elements of the per-iteration [B, d, d] working set above which the
# factored MLE blocks its basis dimension. 2^26 f32 = 268 MB/array keeps
# the rotate chain's live set ~1 GB; N<=7 (B·d² <= 3.6e7) stays on the
# single-block path, so its proven, relay-cached program shapes are
# untouched (CLAUDE.md round-3 protocol).
_FACTORED_BLOCK_ELEMS = 1 << 26


def factored_born_probs(rho: CArray, basis_labels: np.ndarray) -> jnp.ndarray:
    """Born probabilities ``diag(U_b ρ U_b†)`` as ``[B, d]`` rows.

    Same math as :func:`ddqst_tpu.qsim.measure.batched_probs_mixed` but by
    per-qubit 2x2 rotations over ``lax.map``'d row blocks — it never
    materialises the ``[B, d, d]`` rotation stack or the ``U ρ`` product
    (3.4 GB each at N=8, B=6561), bounding device memory at one
    ``[blk, d, d]`` block (~268 MB). Used for the MLE-projected
    distillation target at N>=8 scale (pipeline.run_experiment).
    """
    labels = np.asarray(basis_labels)
    b, n = labels.shape
    d = 2**n
    blk = max(1, min(b, _FACTORED_BLOCK_ELEMS // (d * d)))
    nb = -(-b // blk)
    pad = nb * blk - b
    ur_np, ui_np = _rot1_split(labels)
    ur = jnp.pad(jnp.asarray(ur_np), ((0, pad), (0, 0), (0, 0), (0, 0)),
                 constant_values=1.0).reshape(nb, blk, n, 2, 2)
    ui = jnp.pad(jnp.asarray(ui_np), ((0, pad), (0, 0), (0, 0), (0, 0))
                 ).reshape(nb, blk, n, 2, 2)

    @f32_matmul
    @jax.jit
    def run(rho_re, rho_im):
        def p_blk(args):
            fr, fi = args
            kr, ki = _kron_block(fr, fi)  # [blk, d, d]
            s_re = kr @ rho_re - ki @ rho_im
            s_im = kr @ rho_im + ki @ rho_re
            return jnp.sum(s_re * kr + s_im * ki, axis=-1)  # [blk, d]

        p = jax.lax.map(p_blk, (ur, ui)).reshape(nb * blk, d)[:b]
        p = jnp.maximum(p, 0.0)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    return run(rho.re, rho.im)


def _kron_block(fr: jnp.ndarray, fi: jnp.ndarray) -> tuple:
    """Dense rotations for one block: ``[blk, N, 2, 2]`` per-qubit factors
    -> split ``(re, im)`` of U = u_{N-1} ⊗ ... ⊗ u_0, shape ``[blk, d, d]``.

    log2(d) complex kron steps — O(blk·d²) total work/traffic, negligible
    next to the block's matmuls. Qubit 0 is the LSB (same convention as
    :func:`_apply_left` / ``qsim.measure.rotation_unitaries``).
    """
    n = fr.shape[1]
    b = fr.shape[0]
    tr, ti = fr[:, 0], fi[:, 0]  # build LSB-up: U = u_{n-1} ⊗ ... ⊗ u_0
    for q in range(1, n):
        ar, ai = fr[:, q], fi[:, q]  # [b, 2, 2] — the new MSB factor
        s = tr.shape[1]
        # A ⊗ B laid out so the merged column index c = j·s + l is ONE
        # trailing axis: TPU (8, 128) tiling pads a trailing dim of 2 by
        # 64x (a naive bikjl einsum intermediate at N=8 allocated 16 GB
        # for 256 MB of payload — compile-time OOM). repeat/tile keep all
        # intermediate dims large; the kron itself is a broadcast multiply.
        tar = jnp.repeat(ar, s, axis=-1)[:, :, None, :]  # A[b,i,c//s]
        tai = jnp.repeat(ai, s, axis=-1)[:, :, None, :]
        tbr = jnp.tile(tr, (1, 1, 2))[:, None, :, :]  # B[b,k,c%s]
        tbi = jnp.tile(ti, (1, 1, 2))[:, None, :, :]
        nr = tar * tbr - tai * tbi  # [b, 2, s, 2s]
        ni = tar * tbi + tai * tbr
        tr, ti = nr.reshape(b, 2 * s, 2 * s), ni.reshape(b, 2 * s, 2 * s)
    return tr, ti


def _make_factored_blocked(
    n, num_rows, ur, ui, udr, udi, m2, eye, rotate, readout_p,
    iterations, epsilon, tol, iters_per_call,
):
    """Row-blocked MLE iteration for N>=8 basis counts (see :func:`make_mle`).

    Same diluted-RρR math as the single-block factored path; two changes
    make it fit the relay's memory AND wall-time envelopes:

    - the basis dimension is blocked (lax.map), so live memory is one
      ``[blk, d, d]`` block (~0.5 GB split re/im) instead of the full
      ``[B, d, d]`` stack (3.4 GB at N=8 — crashed the worker), and
    - each block's rotations are built densely on-device from the 2x2
      factors (log2(d) kron steps) so the two POVM contractions run as
      MXU-shaped matmuls: ``S = U ρ`` (contraction d) for the Born probs,
      and ONE ``[d, blk·d] x [blk·d, d]`` product for the R-sum — the
      per-qubit 2-wide einsum chain measured ~5 s/iteration at N=8
      (16 bandwidth-bound passes over the block), putting a 50-iteration
      dispatch past the relay crash horizon; the dense-block form is
      ~0.1-0.3 s/iteration for the same O(B·d²) memory.

    Padding rows carry w = 0 (f padded with zeros), so they contribute
    nothing to the R-sum; p rows of padding are sliced off before use.
    """
    d = eye.shape[0]
    blk = max(1, _FACTORED_BLOCK_ELEMS // (d * d))
    nb = -(-num_rows // blk)
    pad = nb * blk - num_rows

    def pad_blocks(a):  # [B, ...] -> [nb, blk, ...]
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=1.0 if a.ndim == 4 else 0.0
                       ).reshape((nb, blk) + a.shape[1:])

    # Padding rotation factors are identity-ish values; they only shape
    # dead compute (w=0 rows), never results.
    ur_b, ui_b = pad_blocks(ur), pad_blocks(ui)

    @f32_matmul
    @jax.jit
    def step(i0, rho_in: CArray, f) -> tuple:
        f_pad = jnp.pad(f, ((0, pad), (0, 0)))  # zero rows -> w = 0

        def cond(carry):
            i, _, delta = carry
            return (
                (i < i0 + iters_per_call) & (i < iterations) & (delta > tol)
            )

        def body(carry):
            i, rho, _ = carry

            def p_blk(args):
                fr, fi = args
                kr, ki = _kron_block(fr, fi)  # [blk, d, d]
                # S = U ρ (batched complex matmul, contraction d).
                s_re = kr @ rho.re - ki @ rho.im
                s_im = kr @ rho.im + ki @ rho.re
                # diag(U ρ U†)_i = Σ_k S_ik conj(U_ik) (real part).
                return jnp.sum(s_re * kr + s_im * ki, axis=-1)  # [blk, d]

            p = jax.lax.map(p_blk, (ur_b, ui_b)).reshape(nb * blk, d)
            if readout_p > 0:
                p = _confuse_probs(p, m2, n)
            w = (f_pad / jnp.maximum(p, 1e-8)) * (epsilon / num_rows)
            if readout_p > 0:
                w = _confuse_probs(w, m2.T, n)
            w_b = w.reshape(nb, blk, d)

            def r_blk(args):
                fr, fi, wv = args
                kr, ki = _kron_block(fr, fi)
                # R_blk = Σ_{b,j} w_bj conj(U_b)_j,: ⊗ (U_b)_j,: as one
                # [d, blk·d] x [blk·d, d] product over flattened rows.
                u_re = kr.reshape(blk * d, d)
                u_im = ki.reshape(blk * d, d)
                v_re = wv.reshape(blk * d, 1) * u_re
                v_im = wv.reshape(blk * d, 1) * u_im
                rr = u_re.T @ v_re + u_im.T @ v_im
                ri = u_re.T @ v_im - u_im.T @ v_re
                return rr, ri

            rr, ri = jax.lax.map(r_blk, (ur_b, ui_b, w_b))
            g = CArray(
                (1.0 - epsilon) * eye + jnp.sum(rr, axis=0),
                jnp.sum(ri, axis=0),
            )
            new = cmatmul(cmatmul(g, rho), g)
            tr_ = jnp.trace(new.re)
            ok = (tr_ > 1e-20) & jnp.isfinite(tr_)
            new = new.scale(jnp.where(ok, 1.0 / jnp.where(ok, tr_, 1.0), 0.0))
            keep = ok & jnp.isfinite(new.re).all() & jnp.isfinite(new.im).all()
            nxt = CArray(
                jnp.where(keep, new.re, rho.re),
                jnp.where(keep, new.im, rho.im),
            )
            delta = jnp.sqrt(
                jnp.sum((nxt.re - rho.re) ** 2 + (nxt.im - rho.im) ** 2)
            )
            return i + 1, nxt, delta

        return jax.lax.while_loop(
            cond, body, (i0, rho_in, jnp.float32(jnp.inf))
        )

    def reconstruct(counts: jnp.ndarray) -> CArray:
        freqs = counts / jnp.maximum(
            jnp.sum(counts, axis=-1, keepdims=True), 1.0
        )
        f = freqs.astype(jnp.float32)  # [B, d], rows sum to 1
        rho0 = CArray(eye / d, jnp.zeros((d, d), jnp.float32))
        return _run_chunked(step, rho0, f, iterations, tol)

    return reconstruct
