"""Native C++ statevector engine vs the numpy reference path."""

import numpy as np
import pytest

from ddqst_tpu.qsim import native_engine, states


@pytest.fixture(scope="module")
def engine_ok():
    if not native_engine.available():
        pytest.skip("g++ build unavailable")
    return True


def test_named_states(engine_ok):
    circuits = [
        states.prep_circuit("bell", 2),
    ]
    out = native_engine.statevectors(circuits)
    np.testing.assert_allclose(out[0], states.bell_state(), atol=1e-6)


def test_random_circuits_match_numpy(engine_ok, rng):
    for n in (1, 2, 3, 4):
        circuits = [states.random_circuit(rng, n, 6) for _ in range(8)]
        native = native_engine.statevectors(circuits)
        ref = np.stack([states.circuit_statevector(c) for c in circuits])
        np.testing.assert_allclose(native, ref, atol=2e-6)
        # Norms preserved.
        np.testing.assert_allclose(
            np.linalg.norm(native, axis=1), 1.0, atol=1e-5
        )


def test_batch_statevectors_prefers_native(engine_ok, rng):
    circuits = [states.random_circuit(rng, 3, 4) for _ in range(4)]
    a = states.batch_statevectors(circuits, prefer_native=True)
    b = states.batch_statevectors(circuits, prefer_native=False)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_two_qubit_gate_order(engine_ok):
    # CX with control q1, target q0 after X on q1: |10> -> |11>.
    c = states.Circuit(2, (states.Gate("x", (1,)), states.Gate("cx", (1, 0))))
    out = native_engine.statevectors([c])[0]
    np.testing.assert_allclose(np.abs(out), [0, 0, 0, 1], atol=1e-6)