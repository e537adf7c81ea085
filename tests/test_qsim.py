"""Quantum simulator tests: closed-form states, unitarity, noise channels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.qsim import gates as G
from ddqst_tpu.qsim import measure, noise, states


def test_bell_statevector():
    c = states.prep_circuit("bell", 2)
    psi = states.circuit_statevector(c)
    np.testing.assert_allclose(psi, states.bell_state(), atol=1e-6)


def test_ghz_statevector():
    c = states.prep_circuit("ghz", 3)
    psi = states.circuit_statevector(c)
    np.testing.assert_allclose(psi, states.ghz_state(3), atol=1e-6)


def test_plus_statevector():
    c = states.prep_circuit("plus", 3)
    np.testing.assert_allclose(
        states.circuit_statevector(c), states.plus_state(3), atol=1e-6
    )


def test_cx_little_endian():
    # CX control=q0, target=q1 on |01> (q0=1, q1=0, index 1) -> |11> (index 3).
    c = states.Circuit(2, (states.Gate("x", (0,)), states.Gate("cx", (0, 1))))
    psi = states.circuit_statevector(c)
    np.testing.assert_allclose(np.abs(psi), [0, 0, 0, 1], atol=1e-6)


def test_cx_reversed_qubits():
    # CX control=q1, target=q0 on |10> (q1=1, index 2) -> |11>.
    c = states.Circuit(2, (states.Gate("x", (1,)), states.Gate("cx", (1, 0))))
    psi = states.circuit_statevector(c)
    np.testing.assert_allclose(np.abs(psi), [0, 0, 0, 1], atol=1e-6)


def test_circuit_unitary_matches_statevector(rng):
    c = states.random_circuit(rng, 3, 5)
    u = states.circuit_unitary(c)
    np.testing.assert_allclose(
        u @ np.eye(8)[:, 0], states.circuit_statevector(c), atol=1e-5
    )
    np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-5)


def test_random_circuit_hash_dedup(rng):
    c1 = states.random_circuit(rng, 3, 5)
    c2 = states.random_circuit(rng, 3, 5)
    assert states.circuit_hash(c1) != states.circuit_hash(c2)
    assert states.circuit_hash(c1) == states.circuit_hash(c1)


def test_measurement_probs_plus_x_basis():
    psi = jnp.asarray(states.plus_state(1))
    # |+> in X basis -> deterministic outcome 0.
    p = measure.measurement_probs(psi, (0,))
    np.testing.assert_allclose(np.asarray(p), [1, 0], atol=1e-6)
    # |+> in Z basis -> uniform.
    p = measure.measurement_probs(psi, (2,))
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5], atol=1e-6)


def test_measurement_probs_y_eigenstate():
    # |+i> = (|0> + i|1>)/sqrt(2) measured in Y gives 0 deterministically.
    psi = jnp.asarray(np.array([1, 1j], dtype=np.complex64) / np.sqrt(2))
    p = measure.measurement_probs(psi, (1,))
    np.testing.assert_allclose(np.asarray(p), [1, 0], atol=1e-6)


def test_bell_zz_correlations(key):
    psi = jnp.asarray(states.bell_state())
    p = measure.measurement_probs(psi, (2, 2))
    np.testing.assert_allclose(np.asarray(p), [0.5, 0, 0, 0.5], atol=1e-6)
    # XX also perfectly correlated for (|00>+|11>)/sqrt(2).
    p = measure.measurement_probs(psi, (0, 0))
    np.testing.assert_allclose(np.asarray(p), [0.5, 0, 0, 0.5], atol=1e-6)


def test_batched_probs_pure_matches_single():
    from ddqst_tpu.ops.complexlib import from_complex
    from ddqst_tpu.ops.pauli import all_basis_labels

    psis = from_complex(np.stack([states.bell_state(), states.plus_state(2)]))
    rots = from_complex(measure.rotation_unitaries(all_basis_labels(2)))
    probs = measure.batched_probs_pure(psis, rots)
    assert probs.shape == (2, 9, 4)
    single = measure.measurement_probs(states.bell_state(), (2, 2))
    np.testing.assert_allclose(np.asarray(probs[0, 8]), np.asarray(single), atol=1e-6)


def test_sample_bits_distribution(key):
    probs = jnp.asarray([[0.5, 0.0, 0.0, 0.5]])
    bits = measure.sample_bits(key, probs, shots=4000, num_qubits=2)
    assert bits.shape == (1, 4000, 2)
    b = np.asarray(bits[0])
    # Perfectly correlated bits.
    assert np.all(b[:, 0] == b[:, 1])
    assert abs(b[:, 0].mean() - 0.5) < 0.05


def test_sample_counts_total(key):
    probs = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    counts = measure.sample_counts(key, probs, shots=1024)
    assert int(counts.sum()) == 1024


def test_sample_counts_leading_dims_and_distribution(key):
    """Scatter-add histogram: [C, B, d] leading dims, per-row totals, and
    agreement with a per-outcome bincount of the same draws (the builder's
    shape: circuits x bases x outcomes, ``data/generate._simulate_chunk``)."""
    rng = np.random.default_rng(0)
    p = rng.random((3, 5, 8))
    p /= p.sum(-1, keepdims=True)
    probs = jnp.asarray(p, jnp.float32)
    shots = 2048
    counts = measure.sample_counts(key, probs, shots=shots)
    assert counts.shape == (3, 5, 8)
    assert np.all(np.asarray(counts).sum(-1) == shots)
    expected = measure.sample_outcomes(key, probs, shots)  # same key/draws
    ref = np.stack([
        np.bincount(np.asarray(expected)[c, b], minlength=8)
        for c in range(3) for b in range(5)
    ]).reshape(3, 5, 8)
    np.testing.assert_array_equal(np.asarray(counts), ref)


def test_sample_counts_shadow_scale(key):
    """N=10 shadow-builder scale runs without a [rows, shots, 2^N] one-hot
    (the pre-fix intermediate would be 50 x 1024 x 1024 x 4 B = 200 MB
    here and ~3.3 GB at the chunked builder's N=5 defaults)."""
    d = 1 << 10
    rng = np.random.default_rng(1)
    p = rng.random((50, d))
    p /= p.sum(-1, keepdims=True)
    counts = measure.sample_counts(key, jnp.asarray(p, jnp.float32), 1024)
    assert counts.shape == (50, d)
    assert np.all(np.asarray(counts).sum(-1) == 1024)


def test_readout_confusion_probs(key):
    probs = jnp.asarray([1.0, 0.0])
    out = noise.apply_readout_to_probs(probs, 1, 0.01)
    np.testing.assert_allclose(np.asarray(out), [0.99, 0.01], atol=1e-7)


def test_flip_bits_rate(key):
    bits = jnp.zeros((10000, 4), dtype=jnp.int8)
    flipped = noise.flip_bits(key, bits, 0.1)
    assert abs(float(flipped.mean()) - 0.1) < 0.02


def test_depolarizing_channel_mixes():
    cfg = noise.get_noise_config("depolarizing")
    c = states.prep_circuit("bell", 2)
    rho = noise.simulate_density_matrix(c, cfg)
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-5)
    evals = np.linalg.eigvalsh(rho)
    assert evals.min() > -1e-6
    purity = np.trace(rho @ rho).real
    assert 0.25 < purity < 1.0  # noisy but not fully mixed


def test_depolarizing_full_strength_gives_mixed():
    cfg = noise.NoiseConfig(kind="depolarizing", depol_1q=1.0, depol_2q=1.0)
    c = states.Circuit(2, (states.Gate("h", (0,)), states.Gate("cx", (0, 1))))
    rho = noise.simulate_density_matrix(c, cfg)
    # Full 2q depolarizing after CX completely mixes both qubits.
    np.testing.assert_allclose(rho, np.eye(4) / 4, atol=1e-5)


def test_thermal_channel_damps_excited():
    cfg = noise.NoiseConfig(kind="thermal", t1_ns=50e3, t2_ns=70e3)
    c = states.Circuit(1, (states.Gate("x", (0,)),))
    rho = noise.simulate_density_matrix(c, cfg)
    e1 = np.exp(-50.0 / 50e3)
    assert rho[1, 1].real == pytest.approx(e1, abs=1e-5)
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-6)


def test_ideal_noise_is_pure():
    kind, state = noise.noisy_state(
        states.prep_circuit("ghz", 3), noise.get_noise_config("ideal")
    )
    assert kind == "pure"
    np.testing.assert_allclose(state, states.ghz_state(3), atol=1e-6)


def test_mixed_probs_match_pure_when_ideal():
    from ddqst_tpu.ops.complexlib import from_complex
    from ddqst_tpu.ops.pauli import all_basis_labels

    c = states.prep_circuit("bell", 2)
    psi = states.circuit_statevector(c)
    rho = np.outer(psi, psi.conj())
    rots = from_complex(measure.rotation_unitaries(all_basis_labels(2)))
    p_pure = measure.batched_probs_pure(from_complex(psi[None]), rots)
    p_mixed = measure.batched_probs_mixed(from_complex(rho[None]), rots)
    np.testing.assert_allclose(np.asarray(p_pure), np.asarray(p_mixed), atol=1e-5)


def test_w_state_circuit():
    # W-state cascade prep matches the analytic state for several N
    # (BASELINE config 3 includes N=3 W states).
    for n in (2, 3, 4):
        c = states.prep_circuit("w", n)
        psi = states.circuit_statevector(c)
        np.testing.assert_allclose(psi, states.w_state(n), atol=1e-6)


def test_w_state_native_engine():
    from ddqst_tpu.qsim import native_engine

    if not native_engine.available():
        pytest.skip("native engine unavailable")
    c = states.prep_circuit("w", 3)
    out = native_engine.statevectors([c])[0]
    np.testing.assert_allclose(out, states.w_state(3), atol=1e-6)
