"""Compute-path ops: schedules, diffusion, Pauli algebra, metrics, kernels."""

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
    project_psd,
)
from ddqst_tpu.ops.metrics import (  # noqa: F401
    state_fidelity,
    purity,
    von_neumann_entropy,
    entanglement_entropy,
    z_bias,
)
