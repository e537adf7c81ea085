"""Phase-1 parity: single-qubit |+> tomography end-to-end.

Scaled-down version of the reference notebook's PoC (1024 shots/basis,
readout-style noise standing in for the FakeVigoV2 snapshot; reference
numbers: classical 0.917969, DDM 0.918919 — notes.pdf Table 2). Also covers
the ⟨X⟩/⟨Y⟩/⟨Z⟩ expectation reporting and checkpoint resume.
"""

import numpy as np
import pytest

from ddqst_tpu.config import get_preset
from ddqst_tpu import pipeline


@pytest.fixture(scope="module")
def plus_results():
    cfg = get_preset("single_qubit")
    cfg = cfg.replace(
        name="e2e_plus",
        model=cfg.model.__class__(embed_dim=16, hidden_dim=64, num_blocks=2),
        diffusion=cfg.diffusion.__class__(num_timesteps=40, schedule="cosine",
                                          sampler="renoise"),
        train=cfg.train.__class__(batch_size=256, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=60,
                                  log_every=0, eval_every=0),
        data=cfg.data.__class__(num_qubits=1, state_type="plus",
                                noise_type="readout", shots_train=1024,
                                shots_infer=4000),
    )
    return pipeline.run_experiment(cfg, seed=0, log_fn=lambda *a: None)


def test_plus_fidelity_beats_reference_band(plus_results):
    # Reference: classical 0.9180, DDM 0.9189 under hardware noise; our
    # stand-in noise is milder (1% readout), so demand > 0.93.
    assert plus_results["fidelity"] > 0.93
    assert plus_results["raw_fidelity"] > 0.95


def test_plus_expectations(plus_results):
    ex = plus_results["expectations"]
    assert set(ex) == {"X", "Y", "Z"}
    # |+> has <X> = 1, <Y> = <Z> = 0 (noise shrinks X a little).
    assert ex["X"] > 0.75
    assert abs(ex["Y"]) < 0.2 and abs(ex["Z"]) < 0.2


def test_checkpoint_resume(tmp_path, key):
    import jax.numpy as jnp

    from ddqst_tpu import train as training
    from ddqst_tpu.config import TrainConfig
    from ddqst_tpu.models import ConditionalD3PM
    from ddqst_tpu.ops import schedules

    bits = jnp.zeros((128, 2), jnp.int8)
    basis = jnp.zeros((128,), jnp.int32)
    model = ConditionalD3PM(num_qubits=2, num_bases=9, num_timesteps=8,
                            embed_dim=8, hidden_dim=32, num_blocks=1)
    sched = schedules.cosine_schedule(8)
    ckdir = str(tmp_path / "ck")
    cfg1 = TrainConfig(batch_size=64, num_epochs=3, optimizer="adam",
                       log_every=0, eval_every=0, checkpoint_dir=ckdir,
                       checkpoint_every=1)
    state1, _ = training.fit(key, model, bits, basis, cfg1, sched,
                             log_fn=lambda *a: None)
    # Resume with a larger budget: starts from epoch 3, runs 2 more.
    cfg2 = cfg1.__class__(batch_size=64, num_epochs=5, optimizer="adam",
                          log_every=0, eval_every=0, checkpoint_dir=ckdir,
                          checkpoint_every=1, resume=True)
    state2, losses2 = training.fit(key, model, bits, basis, cfg2, sched,
                                   log_fn=lambda *a: None)
    assert losses2.shape[0] == 2  # only the remaining epochs ran
    assert int(state2.step) == 5 * (128 // 64)

def test_params_snapshot_templateless_restore(tmp_path):
    """restore_params(path, None) rebuilds the saved structure from
    checkpoint metadata with local-device placement — a TPU-written
    snapshot restores on a CPU-only host (the offline campaign tooling:
    scripts/average_params.py, eval_chain_ce_subset.py)."""
    import jax
    import jax.numpy as jnp

    from ddqst_tpu.utils import checkpoint as ckpt

    params = {
        "dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                  "bias": jnp.ones((3,), jnp.float32)},
        "scale": jnp.asarray(2.5, jnp.float32),
    }
    path = str(tmp_path / "snap")
    ckpt.save_params(path, params)
    out = ckpt.restore_params(path, None)
    assert jax.tree_util.tree_structure(out) == (
        jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
