"""JAX quantum simulator: data generation without Qiskit.

Replaces the reference's use of Qiskit + the Aer C++ simulator as a black-box
data source (``multi_qubit_any_state/data_gen.py``). Design split:

- **Circuit construction / unitary assembly runs on host (numpy).** At the
  reference's scales (N ≤ 5, d = 2^N ≤ 32) circuit evolution is a chain of
  tiny matrix products — latency-bound scalar work that would waste a TPU.
- **Everything batched runs on device (jnp):** basis-rotation of batches of
  states, Born-rule probabilities, categorical shot sampling over
  circuits x bases x shots, and bit-level readout noise. These are the hot
  loops (reference hot loop #1, ``data_gen.py:239-242``) and they map to
  large batched matmuls + RNG on the MXU/VPU.

Noise models mirror the reference's five options
(``multi_qubit_any_state/data_gen.py:28-64``): ideal, readout, depolarizing,
thermal, and a calibrated stand-in for the FakeTorino hardware snapshot
(exact replication of IBM's calibration data is impossible without qiskit;
the deviation is documented in :mod:`ddqst_tpu.qsim.noise`).
"""

from ddqst_tpu.qsim import gates, measure, noise, states  # noqa: F401
