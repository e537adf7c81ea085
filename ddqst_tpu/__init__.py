"""DD-QST-TPU: TPU-native generative quantum state tomography.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``anik-m/Efficient-Quantum-State-Tomography-with-Denoising-Diffusion-Models-DD-QST-``:
conditional discrete denoising diffusion (D3PM) over measured bitstrings,
conditioned on the Pauli measurement basis, followed by linear-inversion
density-matrix reconstruction.

The reference's four copy-evolved phase directories
(``versions/{single_qubit_phase,multi_qubit_special_states,multi_qubit_any_state,
RQC_dataset_building_phase}``) collapse here into one configurable pipeline:

- :mod:`ddqst_tpu.ops`       — diffusion schedules, forward/reverse samplers,
  Pauli algebra, linear inversion, metrics, Pallas kernels.
- :mod:`ddqst_tpu.models`    — FiLM ResMLP denoisers (float-projection and
  bit-token variants) and a transformer denoiser for large N.
- :mod:`ddqst_tpu.qsim`      — JAX quantum simulator replacing Qiskit Aer for
  data generation: state prep, random circuits, noise channels, Born sampling.
- :mod:`ddqst_tpu.data`      — dataset builders (unique-circuit dedup, shadow
  basis capping, chunked shards), record schema, weighted loaders.
- :mod:`ddqst_tpu.parallel`  — device mesh + sharding for data/model parallel
  training and sampling.
- :mod:`ddqst_tpu.train`     — jitted training loop, optax optimizers, orbax
  checkpointing.
- :mod:`ddqst_tpu.evaluate`  — raw-vs-D3PM fidelity-lift evaluation harness.
- :mod:`ddqst_tpu.cli`       — subcommand CLI (generate / train / sample /
  reconstruct / evaluate) with per-phase presets.

Global conventions (documented deviations from the reference are noted in the
relevant modules):

- **Endianness**: qubit 0 is the least-significant bit of a computational
  basis index, and index 0 of every bitstring array / Pauli label. This is one
  explicit convention everywhere (the reference flips between conventions;
  see ``multi_qubit_any_state/reconstruct.py:17-24`` "CRITICAL FIX").
- **PRNG**: all randomness flows through threaded ``jax.random`` keys.
- **Shapes are static** under ``jit``; sequential loops are ``lax.scan``.
"""

__version__ = "0.1.0"
