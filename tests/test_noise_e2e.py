"""End-to-end pipeline under each noise model (scaled-down budgets).

Exercises the mixed-state (density-matrix) data path that gate-level noise
models take through ``pipeline.generate_training_data`` — the reference's
`--noise_type` surface (``multi_qubit_any_state/main.py:63-65``).
"""

import numpy as np
import pytest

import jax

from ddqst_tpu.config import get_preset
from ddqst_tpu import pipeline


def _cfg(noise):
    cfg = get_preset("any_state")
    return cfg.replace(
        name=f"e2e_{noise}",
        model=cfg.model.__class__(embed_dim=16, hidden_dim=64, num_blocks=1),
        diffusion=cfg.diffusion.__class__(num_timesteps=16, schedule="cosine",
                                          sampler="renoise"),
        train=cfg.train.__class__(batch_size=256, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=8,
                                  log_every=0, eval_every=0),
        data=cfg.data.__class__(num_qubits=2, state_type="bell",
                                noise_type=noise, shots_train=300,
                                shots_infer=300),
    )


@pytest.mark.parametrize("noise", ["depolarizing", "thermal", "torino"])
def test_gate_noise_pipeline_runs(noise):
    res = pipeline.run_experiment(_cfg(noise), seed=0, log_fn=lambda *a: None)
    assert 0.0 <= res["fidelity"] <= 1.001
    assert np.isfinite(res["losses"]).all()
    # Raw baseline under gate noise is below the ideal-case near-1.0 but
    # still dominated by the Bell structure.
    assert res["raw_fidelity"] > 0.5


def test_gate_noise_target_is_clean_state():
    """Fidelity target must be the clean state even under noise."""
    cfg = _cfg("depolarizing")
    data = pipeline.generate_training_data(
        cfg, jax.random.key(0), np.random.default_rng(0)
    )
    from ddqst_tpu.qsim import states

    np.testing.assert_allclose(data.target, states.bell_state(), atol=1e-5)