"""Shadow-route warm start: params_save → params_load round-trip.

The N=10 distillation iterations cost a ~25-min CE retrain each without
this; ``run_experiment(params_save=...)`` snapshots the post-distillation
params and ``params_load=...`` (same cfg + seed → identical data/bases)
resumes without CE training. Reference analogue: final ``torch.save(
state_dict)`` + ``load_state_dict`` (``RQC_dataset_building_phase/
main.py:132``, ``evaluate.py:61``).
"""

import jax.numpy as jnp

from ddqst_tpu import pipeline
from ddqst_tpu.config import get_preset


def _tiny_shadow_cfg(tmp_path):
    base = get_preset("shadow_transformer")
    return base.replace(
        name="warmstart_test",
        diffusion=base.diffusion.__class__(
            num_timesteps=10, schedule="cosine", sampler="renoise",
        ),
        model=base.model.__class__(
            arch="transformer", input_encoding="token",
            embed_dim=16, hidden_dim=32, num_blocks=1, num_heads=2,
        ),
        train=base.train.__class__(
            batch_size=128, learning_rate=1e-3, optimizer="adam",
            num_epochs=2, lr_schedule="cosine", log_every=0, eval_every=0,
        ),
        data=base.data.__class__(
            num_qubits=8, state_type="ghz", noise_type="readout",
            shots_train=64, shots_infer=200, max_bases=6,
        ),
    )


def test_params_save_load_roundtrip(tmp_path):
    cfg = _tiny_shadow_cfg(tmp_path)
    path = str(tmp_path / "params_snap")
    logs = []
    res1 = pipeline.run_experiment(
        cfg, seed=0, log_fn=logs.append, params_save=path,
    )
    assert any("saved params" in m for m in logs)

    # Warm start: same cfg + seed regenerates identical data, CE training
    # is skipped, and generation from the restored params reproduces the
    # run-1 metrics exactly (same k_sample stream).
    logs2 = []
    res2 = pipeline.run_experiment(
        cfg, seed=0, log_fn=logs2.append, params_load=path,
    )
    assert any("warm start" in m for m in logs2)
    assert not any("shadow-scale training" in m for m in logs2)
    assert res2["mean_tv_to_target"] == res1["mean_tv_to_target"]
    assert res2["classical_fidelity"] == res1["classical_fidelity"]
