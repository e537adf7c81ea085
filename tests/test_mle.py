"""MLE reconstruction tests: exact recovery, noise-aware POVM, counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.ops import metrics as M
from ddqst_tpu.ops import mle, pauli
from ddqst_tpu.qsim import measure, states
from ddqst_tpu.ops.complexlib import from_complex, to_complex


def _exact_counts(psi, num_qubits, shots, readout_p=0.0):
    """Expected counts (probs * shots) for every canonical basis."""
    from ddqst_tpu.qsim.noise import apply_readout_to_probs

    labels = pauli.all_basis_labels(num_qubits)
    rots = from_complex(measure.rotation_unitaries(labels))
    probs = measure.batched_probs_pure(from_complex(psi[None]), rots)[0]
    probs = apply_readout_to_probs(probs, num_qubits, readout_p)
    return probs * shots


def test_bits_to_counts():
    bits = jnp.asarray(
        [[[0, 0], [1, 1], [1, 0], [0, 0]]]
    )  # outcomes 0, 3, 1, 0
    counts = mle.bits_to_counts(bits)
    np.testing.assert_array_equal(np.asarray(counts[0]), [2, 1, 0, 1])


@pytest.mark.parametrize("state_fn,n", [(states.bell_state, 2),
                                        (lambda: states.ghz_state(3), 3)])
def test_mle_recovers_pure_state_exact_counts(state_fn, n):
    psi = state_fn()
    counts = _exact_counts(psi, n, shots=100000)
    rec = mle.make_mle(n, iterations=400)
    rho = rec(counts)
    assert float(M.state_fidelity(psi, rho)) > 0.999


@pytest.mark.parametrize("impl", ["dense", "factored"])
def test_mle_chunked_dispatch_matches_single(impl):
    """iters_per_call chunking (the relay-safe bounded-dispatch driver)
    must reach the same fixed point as one uninterrupted while_loop —
    the chunk boundary carries (i, rho, delta) exactly."""
    psi = states.ghz_state(3)
    counts = _exact_counts(psi, 3, shots=5000, readout_p=0.02)
    one = mle.make_mle(3, readout_p=0.02, iterations=300, impl=impl,
                       iters_per_call=300)(counts)
    chunked = mle.make_mle(3, readout_p=0.02, iterations=300, impl=impl,
                           iters_per_call=7)(counts)
    np.testing.assert_allclose(
        np.asarray(one.re), np.asarray(chunked.re), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(one.im), np.asarray(chunked.im), atol=1e-6
    )


def test_mle_noise_aware_beats_naive():
    """With readout noise in the counts, the confusion-aware POVM recovers
    the clean state; the naive POVM keeps the bias."""
    psi = states.ghz_state(3)
    p = 0.02
    counts = _exact_counts(psi, 3, shots=100000, readout_p=p)
    fid_naive = float(M.state_fidelity(psi, mle.make_mle(3)(counts)))
    fid_aware = float(
        M.state_fidelity(psi, mle.make_mle(3, readout_p=p)(counts))
    )
    assert fid_aware > 0.995
    assert fid_aware > fid_naive + 0.01


def test_mle_valid_density_matrix(rng):
    counts = jnp.asarray(rng.integers(1, 100, size=(9, 4)).astype(np.float32))
    rho = mle.make_mle(2, iterations=200)(counts)
    from ddqst_tpu.ops.complexlib import to_complex

    r = to_complex(rho)
    assert np.trace(r).real == pytest.approx(1.0, abs=1e-4)
    assert np.linalg.eigvalsh(r).min() > -1e-5
    np.testing.assert_allclose(r, r.conj().T, atol=1e-5)


def test_mle_partial_basis_set(rng):
    # MLE works from a shadow subset of bases too.
    psi = states.ghz_state(3)
    labels = pauli.all_basis_labels(3)
    sel = np.sort(rng.choice(len(labels), size=15, replace=False))
    counts = _exact_counts(psi, 3, shots=100000)[jnp.asarray(sel)]
    rec = mle.make_mle(3, basis_labels=labels[sel], iterations=400)
    rho = rec(counts)
    assert float(M.state_fidelity(psi, rho)) > 0.9


def test_readout_mitigated_linear_inversion(rng):
    """Parity-domain mitigation: clean parities = measured / (1-2p)^k."""
    psi = states.bell_state()
    p = 0.05
    # Sample many noisy shots from the analytically noisy distribution.
    from ddqst_tpu.qsim.noise import apply_readout_to_probs

    labels = pauli.all_basis_labels(2)
    rots = from_complex(measure.rotation_unitaries(labels))
    probs = measure.batched_probs_pure(from_complex(psi[None]), rots)[0]
    noisy = np.asarray(apply_readout_to_probs(probs, 2, p), dtype=np.float64)
    bits = []
    for b in range(9):
        idx = rng.choice(4, size=50000, p=noisy[b] / noisy[b].sum())
        bits.append((idx[:, None] >> np.arange(2)) & 1)
    bits = jnp.asarray(np.stack(bits))
    fid_plain = float(M.state_fidelity(psi, pauli.make_inverter(2)(bits)))
    fid_mit = float(
        M.state_fidelity(psi, pauli.make_inverter(2, readout_p=p)(bits))
    )
    assert fid_mit > fid_plain
    assert fid_mit > 0.99

def test_mle_early_stop_matches_full_run():
    """The adaptive Frobenius-delta stop must land on (essentially) the same
    fixed point as running the full iteration budget (tol=-1 disables the
    stop: the delta can never go negative)."""
    psi = states.ghz_state(2)
    counts = _exact_counts(psi, 2, shots=200000)
    rho_adaptive = mle.make_mle(2, iterations=3000)(counts)
    rho_full = mle.make_mle(2, iterations=3000, tol=-1.0)(counts)
    np.testing.assert_allclose(
        to_complex(rho_adaptive), to_complex(rho_full), atol=1e-3
    )
    assert float(M.state_fidelity(psi, rho_adaptive)) > 0.995


def test_bits_to_counts_scatter():
    bits = jnp.asarray(
        np.array([[[0, 0], [1, 1], [1, 1], [0, 1]]], np.int8)
    )  # one basis, 4 shots
    counts = np.asarray(mle.bits_to_counts(bits))
    # little-endian: [0,0]->0, [1,1]->3, [0,1]->2 (qubit0=0, qubit1=1)
    np.testing.assert_array_equal(counts, [[1.0, 0.0, 1.0, 2.0]])


def test_mle_factored_matches_dense(rng):
    """The tensor-product ('factored') implementation must agree with the
    dense-POVM path — same diluted iteration, same fixed point — with and
    without the confusion-folded POVM."""
    psi = states.ghz_state(3)
    for p in (0.0, 0.03):
        counts = _exact_counts(psi, 3, shots=50000, readout_p=p)
        rho_d = mle.make_mle(3, readout_p=p, impl="dense")(counts)
        rho_f = mle.make_mle(3, readout_p=p, impl="factored")(counts)
        np.testing.assert_allclose(
            np.asarray(rho_f.re), np.asarray(rho_d.re), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(rho_f.im), np.asarray(rho_d.im), atol=2e-4
        )
    # Noisy empirical counts on a partial basis set as well.
    labels = pauli.all_basis_labels(2)[:5]
    counts = jnp.asarray(rng.integers(1, 200, size=(5, 4)).astype(np.float32))
    rho_d = mle.make_mle(2, basis_labels=labels, impl="dense")(counts)
    rho_f = mle.make_mle(2, basis_labels=labels, impl="factored")(counts)
    np.testing.assert_allclose(
        np.asarray(rho_f.re), np.asarray(rho_d.re), atol=2e-4
    )


def test_mle_factored_recovers_ghz4():
    """auto -> factored beyond N=4 grid; exact counts recover GHZ-4."""
    psi = states.ghz_state(4)
    counts = _exact_counts(psi, 4, shots=100000)
    rho = mle.make_mle(4, impl="factored")(counts)
    assert float(M.state_fidelity(psi, rho)) > 0.999


def test_mle_factored_blocked_matches_single(monkeypatch):
    """The row-blocked factored iteration (the N>=8 HBM-bounded path) is
    mathematically identical to the single-block factored path: per-row
    Born probs + associative R-sum over blocks, zero-weight padding."""
    psi = states.ghz_state(3)
    for p in (0.0, 0.03):
        counts = _exact_counts(psi, 3, shots=50000, readout_p=p)
        ref = mle.make_mle(3, readout_p=p, impl="factored")(counts)
        # 27 rows x 64 elements; threshold 4*64 forces blk=4 -> 7 blocks
        # with one padding row.
        monkeypatch.setattr(mle, "_FACTORED_BLOCK_ELEMS", 4 * 64)
        got = mle.make_mle(3, readout_p=p, impl="factored")(counts)
        monkeypatch.undo()
        np.testing.assert_allclose(
            np.asarray(got.re), np.asarray(ref.re), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.im), np.asarray(ref.im), atol=2e-5
        )


def test_factored_born_probs_matches_dense(rng):
    """Blocked per-qubit Born probs == batched_probs_mixed on a mixed rho
    (the MLE-target path at N>=8 scale, exercised here at N=3)."""
    from ddqst_tpu.ops.complexlib import CArray, from_complex
    from ddqst_tpu.qsim import measure

    a = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    rho_c = (a @ a.conj().T).astype(np.complex64)
    rho_c /= np.trace(rho_c).real
    rho = from_complex(rho_c)
    labels = pauli.all_basis_labels(3)
    ref = measure.batched_probs_mixed(
        CArray(rho.re[None], rho.im[None]),
        from_complex(measure.rotation_unitaries(labels)),
    )[0]
    got = mle.factored_born_probs(rho, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
