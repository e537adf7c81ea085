"""Metric tests with analytic ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu.ops import metrics
from ddqst_tpu.qsim import states


def dm(psi):
    psi = np.asarray(psi)
    return jnp.asarray(np.outer(psi, psi.conj()))


def test_fidelity_pure_identical():
    psi = jnp.asarray(states.bell_state())
    assert float(metrics.state_fidelity(psi, psi)) == pytest.approx(1.0)
    assert float(metrics.state_fidelity(psi, dm(psi))) == pytest.approx(1.0, abs=1e-6)
    assert float(metrics.state_fidelity(dm(psi), dm(psi))) == pytest.approx(1.0, abs=1e-5)


def test_fidelity_orthogonal():
    a = jnp.asarray(np.array([1, 0, 0, 0], dtype=np.complex64))
    b = jnp.asarray(np.array([0, 1, 0, 0], dtype=np.complex64))
    assert float(metrics.state_fidelity(a, b)) == pytest.approx(0.0, abs=1e-7)
    assert float(metrics.state_fidelity(dm(a), dm(b))) == pytest.approx(0.0, abs=1e-6)


def test_fidelity_mixed_vs_pure_analytic():
    # F(|0><0|, I/2) = 1/2.
    pure = dm([1, 0])
    mixed = jnp.asarray(np.eye(2, dtype=np.complex64) / 2)
    assert float(metrics.state_fidelity(pure, mixed)) == pytest.approx(0.5, abs=1e-6)


def test_fidelity_two_mixed_analytic():
    # F(I/2, rho) = (tr sqrt(rho/2))^2 for commuting case; pick diag rho.
    rho = jnp.asarray(np.diag([0.75, 0.25]).astype(np.complex64))
    mixed = jnp.asarray(np.eye(2, dtype=np.complex64) / 2)
    expected = (np.sqrt(0.75 / 2) + np.sqrt(0.25 / 2)) ** 2
    assert float(metrics.state_fidelity(mixed, rho)) == pytest.approx(expected, abs=1e-6)


def test_purity():
    assert float(metrics.purity(dm(states.ghz_state(2)))) == pytest.approx(1.0, abs=1e-6)
    mixed = jnp.asarray(np.eye(4, dtype=np.complex64) / 4)
    assert float(metrics.purity(mixed)) == pytest.approx(0.25, abs=1e-7)


def test_von_neumann_entropy_base2():
    mixed = jnp.asarray(np.eye(4, dtype=np.complex64) / 4)
    assert float(metrics.von_neumann_entropy(mixed)) == pytest.approx(2.0, abs=1e-5)
    assert float(metrics.von_neumann_entropy(dm([1, 0]))) == pytest.approx(0.0, abs=1e-5)


def test_entanglement_entropy_bell():
    # Half-cut entropy of a Bell pair is exactly 1 bit.
    rho = dm(states.bell_state())
    assert float(metrics.entanglement_entropy(rho, 2)) == pytest.approx(1.0, abs=1e-5)
    # Product state has zero entanglement entropy.
    rho_prod = dm(states.plus_state(2))
    assert float(metrics.entanglement_entropy(rho_prod, 2)) == pytest.approx(0.0, abs=1e-5)


def test_partial_trace_keeps_low_qubits():
    from ddqst_tpu.ops.complexlib import to_complex

    # |0>_q0 ⊗ |+>_q1 : tracing out q1 leaves |0><0|.
    psi = np.kron(np.array([1, 1]) / np.sqrt(2), np.array([1, 0])).astype(np.complex64)
    red = to_complex(metrics.partial_trace_keep_low(dm(psi), 1))
    np.testing.assert_allclose(red, [[1, 0], [0, 0]], atol=1e-6)


def test_z_bias():
    samples = jnp.asarray(np.array([[0, 0], [1, 1], [0, 1], [0, 0]]))
    assert float(metrics.z_bias(samples)) == pytest.approx(5 / 8)


def test_get_metrics_ghz():
    rho = dm(states.ghz_state(3))
    p, s, e = metrics.get_metrics(rho, 3)
    assert float(p) == pytest.approx(1.0, abs=1e-5)
    assert float(s) == pytest.approx(0.0, abs=1e-4)
    assert float(e) == pytest.approx(1.0, abs=1e-4)  # GHZ half-cut = 1 bit


def test_trace_distance_analytic():
    # Identical states: 0. Orthogonal pure states: 1.
    psi = states.bell_state()
    assert float(metrics.trace_distance(psi, psi)) == pytest.approx(0.0, abs=1e-5)
    e0 = np.array([1, 0, 0, 0], np.complex64)
    e3 = np.array([0, 0, 0, 1], np.complex64)
    assert float(metrics.trace_distance(e0, e3)) == pytest.approx(1.0, abs=1e-5)
    # Pure vs maximally mixed in d=2: T = 1/2.
    mixed = np.eye(2, dtype=np.complex64) / 2
    plus = states.plus_state(1)
    assert float(metrics.trace_distance(plus, mixed)) == pytest.approx(0.5, abs=1e-5)
    # Fuchs–van de Graaf: 1 - sqrt(F) <= T <= sqrt(1 - F) on a random pair.
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    rho = a @ a.conj().T
    rho = (rho / np.trace(rho)).astype(np.complex64)
    f = float(metrics.state_fidelity(psi, rho))
    t = float(metrics.trace_distance(psi, rho))
    assert 1 - np.sqrt(f) - 1e-5 <= t <= np.sqrt(1 - f) + 1e-5
