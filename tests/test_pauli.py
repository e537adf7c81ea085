"""Pauli algebra and linear-inversion tests with analytic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.ops import metrics, pauli
from ddqst_tpu.ops.complexlib import to_complex

I2 = np.eye(2, dtype=np.complex64)
X = np.array([[0, 1], [1, 0]], dtype=np.complex64)
Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
Z = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def test_single_qubit_matrices():
    np.testing.assert_array_equal(pauli.pauli_matrix("I"), I2)
    np.testing.assert_array_equal(pauli.pauli_matrix("X"), X)
    np.testing.assert_array_equal(pauli.pauli_matrix("Y"), Y)
    np.testing.assert_array_equal(pauli.pauli_matrix("Z"), Z)


def test_kron_endianness():
    # Label 'XZ' = X on qubit 0, Z on qubit 1. Little-endian (q0 = LSB)
    # means the full matrix is Z ⊗ X (qubit-1 factor outermost).
    np.testing.assert_array_equal(pauli.pauli_matrix("XZ"), np.kron(Z, X))
    np.testing.assert_array_equal(pauli.pauli_matrix("ZX"), np.kron(X, Z))
    np.testing.assert_array_equal(
        pauli.pauli_matrix("XYZ"), np.kron(Z, np.kron(Y, X))
    )


def test_all_labels_order():
    labels = pauli.all_basis_labels(2)
    strs = [pauli.basis_label_to_str(l) for l in labels]
    # itertools.product order: first char (qubit 0) slowest.
    assert strs[:4] == ["XX", "XY", "XZ", "YX"]
    assert len(strs) == 9


def test_subset_parity_means_analytic():
    # Two bases, 4 shots, 2 qubits; hand-computed parities.
    bits = jnp.array(
        [
            [[0, 0], [0, 1], [1, 0], [1, 1]],
            [[0, 0], [0, 0], [0, 0], [0, 0]],
        ]
    )
    par = pauli.subset_parity_means(bits)
    # mask 0: always 1; mask 1 (q0): mean(1,1,-1,-1)=0; mask 2 (q1):
    # mean(1,-1,1,-1)=0; mask 3: mean(1,-1,-1,1)=0. Second basis: all ones.
    np.testing.assert_allclose(np.asarray(par[0]), [1, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(par[1]), [1, 1, 1, 1], atol=1e-7)


def test_subset_parity_weights_match_replication():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(1, 6, 3))
    w = rng.integers(1, 5, size=(1, 6)).astype(np.float32)
    # Weighted mean must equal unrolling each row w[i] times.
    unrolled = np.repeat(bits[0], w[0].astype(int), axis=0)[None]
    got = pauli.subset_parity_means(jnp.asarray(bits), jnp.asarray(w))
    want = pauli.subset_parity_means(jnp.asarray(unrolled))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def _perfect_samples_for_state(psi, num_qubits, shots, rng):
    """Sample measurement outcomes for every canonical basis from psi."""
    from ddqst_tpu.qsim import measure  # deferred; tested separately

    labels = pauli.all_basis_labels(num_qubits)
    out = []
    for lab in labels:
        probs = measure.measurement_probs(jnp.asarray(psi), tuple(lab))
        idx = rng.choice(len(probs), size=shots, p=np.asarray(probs, dtype=np.float64) / np.asarray(probs).sum())
        bits = (idx[:, None] >> np.arange(num_qubits)) & 1
        out.append(bits)
    return jnp.asarray(np.stack(out))


@pytest.mark.parametrize("state", ["plus", "bell", "ghz3"])
def test_linear_inversion_recovers_pure_states(state, rng):
    if state == "plus":
        psi = np.ones(2, dtype=np.complex64) / np.sqrt(2)
        n = 1
    elif state == "bell":
        psi = np.zeros(4, dtype=np.complex64)
        psi[0] = psi[3] = 1 / np.sqrt(2)
        n = 2
    else:
        psi = np.zeros(8, dtype=np.complex64)
        psi[0] = psi[7] = 1 / np.sqrt(2)
        n = 3
    bits = _perfect_samples_for_state(psi, n, shots=20000, rng=rng)
    rho = pauli.linear_inversion(bits, n)
    fid = metrics.state_fidelity(jnp.asarray(psi), rho)
    assert float(fid) > 0.98


def test_linear_inversion_first_vs_mean_close(rng):
    psi = np.zeros(4, dtype=np.complex64)
    psi[0] = psi[3] = 1 / np.sqrt(2)
    bits = _perfect_samples_for_state(psi, 2, shots=30000, rng=rng)
    rho_mean = pauli.linear_inversion(bits, 2, compat_mode="mean")
    rho_first = pauli.linear_inversion(bits, 2, compat_mode="first")
    assert float(metrics.state_fidelity(rho_mean, rho_first)) > 0.99


def test_project_psd_properties(rng):
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    herm = (m + m.conj().T) / 2
    rho = to_complex(pauli.project_psd(herm))
    evals = np.linalg.eigvalsh(rho)
    assert evals.min() > -1e-6
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-5)
    # Idempotent (up to float noise).
    rho2 = to_complex(pauli.project_psd(rho))
    np.testing.assert_allclose(rho2, rho, atol=1e-5)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_coeffs_to_rho_matches_dense_stack(n, rng):
    # Factored per-qubit assembly == dense [4^N, d, d] Pauli-stack einsum.
    c = rng.normal(size=(4**n,)).astype(np.float32)
    mats = pauli.pauli_matrices(pauli.all_pauli_labels(n))
    dense = np.einsum("p,pij->ij", c, mats) / 2**n
    got = pauli.coeffs_to_rho(jnp.asarray(c), n)
    np.testing.assert_allclose(np.asarray(got.re), dense.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.im), dense.imag, atol=1e-5)


def test_counts_parity_means_matches_per_shot(rng):
    # WHT-of-histogram parities == per-shot parity means on the same data.
    n, b, s = 3, 5, 64
    bits = rng.integers(0, 2, size=(b, s, n))
    idx = (bits * (1 << np.arange(n))).sum(-1)  # [B, S] little-endian
    counts = np.zeros((b, 2**n), np.float32)
    for i in range(b):
        np.add.at(counts[i], idx[i], 1.0)
    got = pauli.counts_parity_means(jnp.asarray(counts), n)
    want = pauli.subset_parity_means(jnp.asarray(bits))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_counts_inverter_matches_bits_inverter(rng):
    psi = np.zeros(4, dtype=np.complex64)
    psi[0] = psi[3] = 1 / np.sqrt(2)
    bits = _perfect_samples_for_state(psi, 2, shots=4000, rng=rng)
    idx = np.asarray((np.asarray(bits) * (1 << np.arange(2))).sum(-1))
    counts = np.zeros((bits.shape[0], 4), np.float32)
    for i in range(bits.shape[0]):
        np.add.at(counts[i], idx[i], 1.0)
    rho_bits = pauli.make_inverter(2)(bits)
    rho_counts = pauli.make_counts_inverter(2)(jnp.asarray(counts))
    np.testing.assert_allclose(
        np.asarray(rho_bits.re), np.asarray(rho_counts.re), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rho_bits.im), np.asarray(rho_counts.im), atol=1e-5
    )


def test_make_inverter_partial_bases(rng):
    # Inversion from a shadow subset of bases still returns a valid state.
    psi = np.zeros(8, dtype=np.complex64)
    psi[0] = psi[7] = 1 / np.sqrt(2)
    labels = pauli.all_basis_labels(3)
    sel = rng.choice(len(labels), size=12, replace=False)
    bits_full = _perfect_samples_for_state(psi, 3, shots=8000, rng=rng)
    inv = pauli.make_inverter(3, basis_labels=labels[sel])
    rho = inv(bits_full[jnp.asarray(sel)])
    assert np.trace(to_complex(rho)).real == pytest.approx(1.0, abs=1e-5)
    assert float(metrics.state_fidelity(jnp.asarray(psi), rho)) > 0.5


@pytest.mark.parametrize("n", [2, 3])
@pytest.mark.parametrize("readout_p", [0.0, 0.02])
def test_factored_canonical_inverter_matches_dense(n, readout_p, rng, monkeypatch):
    # The full-canonical-grid "mean" path contracts a 24-float per-qubit
    # kernel instead of the dense [4^N, B] compatibility matrix (whose
    # baked HLO literal is 1.7 GB at N=8 — over the TPU relay's
    # remote-compile body limit). Same estimator, constant-free program.
    labels = pauli.all_basis_labels(n)
    parities = rng.uniform(-1, 1, (3**n, 2**n)).astype(np.float32)
    parities[:, 0] = 1.0
    with jax.default_matmul_precision("highest"):
        fac = pauli._make_parities_to_rho(n, labels, "mean", False, readout_p)
        monkeypatch.setattr(pauli, "_is_canonical_grid", lambda *a: False)
        dense = pauli._make_parities_to_rho(n, labels, "mean", False, readout_p)
        monkeypatch.undo()
        r_fac = fac(jnp.asarray(parities))
        r_dense = dense(jnp.asarray(parities))
    np.testing.assert_allclose(
        np.asarray(r_fac.re), np.asarray(r_dense.re), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_fac.im), np.asarray(r_dense.im), atol=2e-5
    )
