"""Compute-path ops: schedules, diffusion, Pauli algebra, MLE, metrics, kernels."""

from ddqst_tpu.ops.schedules import (  # noqa: F401
    DiffusionSchedule,
    linear_schedule,
    cosine_schedule,
    make_schedule,
)
from ddqst_tpu.ops.pauli import (  # noqa: F401
    pauli_matrices,
    all_pauli_labels,
    all_basis_labels,
    linear_inversion,
    make_inverter,
    make_counts_inverter,
    coeffs_to_rho,
    counts_parity_means,
    project_psd,
    subset_parity_means,
)
from ddqst_tpu.ops.mle import make_mle, bits_to_counts  # noqa: F401
from ddqst_tpu.ops.diffusion import (  # noqa: F401
    q_sample,
    denoising_loss,
    p_sample,
    p_sample_grid,
    p_denoise,
    sample_all_bases,
    sample_for_bases,
    sampler_distribution,
    match_timestep,
)
from ddqst_tpu.ops.metrics import (  # noqa: F401
    state_fidelity,
    purity,
    von_neumann_entropy,
    entanglement_entropy,
    pauli_expectations,
    z_bias,
)
from ddqst_tpu.ops.complexlib import CArray, from_complex, to_complex  # noqa: F401
