"""End-to-end slice: Bell-state tomography through the full pipeline.

Scaled-down version of SURVEY.md §7.3's minimum slice (reference achieved
0.95565 Bell fidelity with the full budget, notes.pdf Table 3); this test
uses a small model/epoch budget so it runs on the CPU test mesh, with a
correspondingly looser threshold. Full-budget runs live in examples/ and
bench.py.
"""

import numpy as np
import pytest

from ddqst_tpu.config import get_preset
from ddqst_tpu import pipeline


@pytest.fixture(scope="module")
def bell_results():
    cfg = get_preset("special_states").replace(name="e2e_bell")
    cfg = cfg.replace(
        model=cfg.model.__class__(embed_dim=32, hidden_dim=128, num_blocks=2),
        diffusion=cfg.diffusion.__class__(
            num_timesteps=50, schedule="cosine", sampler="renoise"
        ),
        train=cfg.train.__class__(
            batch_size=256, learning_rate=1e-3, optimizer="adam",
            num_epochs=100, log_every=0, eval_every=0,
        ),
        data=cfg.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=1000, shots_infer=3000,
        ),
    )
    return pipeline.run_experiment(cfg, seed=0, log_fn=lambda *a: None)


def test_bell_fidelity(bell_results):
    assert bell_results["fidelity"] > 0.85, bell_results["fidelity"]


def test_raw_baseline_high(bell_results):
    # Ideal noise: linear inversion on raw data should be near-perfect.
    assert bell_results["raw_fidelity"] > 0.97


def test_z_bias_balanced(bell_results):
    assert 0.3 < bell_results["z_bias"] < 0.7


def test_rho_is_valid_state(bell_results):
    rho = bell_results["rho"]
    assert np.trace(rho).real == pytest.approx(1.0, abs=1e-4)
    assert np.linalg.eigvalsh(rho).min() > -1e-5

def test_chain_distillation_closes_generative_gap():
    """Exact-chain distillation (train.finetune_chain) must pull the
    generative pipeline's fidelity up to (near) the raw-counts MLE level —
    the round-2 headline mechanism (VERDICT item 1)."""
    base = get_preset("rqc")
    common = dict(
        diffusion=base.diffusion.__class__(
            num_timesteps=12, schedule="cosine", sampler="renoise"
        ),
        data=base.data.__class__(
            num_qubits=2, state_type="bell", noise_type="readout",
            shots_train=1500, shots_infer=8000,
            mitigate_readout=True, mitigate_train_data=True,
            reconstruction="mle",
        ),
    )

    def train_cfg(ft):
        return base.train.__class__(
            batch_size=512, learning_rate=1e-3, optimizer="adam",
            num_epochs=25, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=ft, chain_lr=5e-4,
        )

    logs = []
    plain = pipeline.run_experiment(
        base.replace(name="ce_only", train=train_cfg(0), **common),
        seed=0, log_fn=lambda *a: None,
    )
    tuned = pipeline.run_experiment(
        base.replace(name="distilled", train=train_cfg(100), **common),
        seed=0, log_fn=lambda m: logs.append(str(m)),
    )
    assert any("chain CE" in m for m in logs)
    assert tuned["fidelity"] > plain["fidelity"]
    assert tuned["fidelity"] > 0.98, (plain["fidelity"], tuned["fidelity"])


def test_chain_distillation_mle_target():
    """chain_target='mle' distills against the Born distribution of the
    MLE projection of the training counts (the cross-basis PSD constraint
    baked into the chain); it must run end-to-end and reach the same
    quality level as the counts target on an easy Bell case."""
    base = get_preset("rqc")
    cfg = base.replace(
        name="ft_mle_target",
        diffusion=base.diffusion.__class__(
            num_timesteps=12, schedule="cosine", sampler="renoise"
        ),
        train=base.train.__class__(
            batch_size=512, learning_rate=1e-3, optimizer="adam",
            num_epochs=25, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=100, chain_lr=5e-4, chain_target="mle",
            chain_val_fraction=0.15,
        ),
        data=base.data.__class__(
            num_qubits=2, state_type="bell", noise_type="readout",
            shots_train=1500, shots_infer=8000,
            mitigate_readout=True, mitigate_train_data=True,
            reconstruction="mle",
        ),
    )
    logs = []
    res = pipeline.run_experiment(cfg, seed=0, log_fn=lambda m: logs.append(str(m)))
    assert any("MLE Born probs" in m for m in logs)
    assert res["fidelity"] > 0.98, res["fidelity"]


def test_chain_distillation_skipped_on_partial_bases():
    """With a shadow basis cap the canonical-chain target is undefined —
    the pipeline must skip distillation with a warning, not mis-train."""
    base = get_preset("rqc")
    cfg = base.replace(
        name="ft_partial",
        diffusion=base.diffusion.__class__(
            num_timesteps=8, schedule="cosine", sampler="renoise"
        ),
        train=base.train.__class__(
            batch_size=256, learning_rate=1e-3, optimizer="adam",
            num_epochs=3, log_every=0, eval_every=0,
            chain_finetune_steps=20,
        ),
        data=base.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=200, shots_infer=500, max_bases=5,
        ),
    )
    logs = []
    res = pipeline.run_experiment(cfg, seed=0, log_fn=logs.append)
    assert any("distillation skipped" in str(m) for m in logs)
    assert np.isfinite(res["fidelity"])


def test_transformer_standard_route_small_n():
    """arch='transformer' through the FULL small-N pipeline (scalar basis
    indices decoded in-model): the cross-basis-sharing denoiser used for
    the GHZ-6 scaling runs must train, sample via the grid path, and
    reconstruct without shape errors."""
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("rqc")
    cfg = cfg.replace(
        name="tfm_small",
        model=cfg.model.__class__(arch="transformer", input_encoding="token",
                                  embed_dim=16, hidden_dim=32, num_blocks=1,
                                  num_heads=2),
        diffusion=cfg.diffusion.__class__(num_timesteps=8, schedule="cosine",
                                          sampler="renoise"),
        train=cfg.train.__class__(batch_size=256, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=3,
                                  log_every=0, eval_every=0,
                                  chain_finetune_steps=4, chain_lr=1e-3,
                                  chain_basis_batch=4),
        data=cfg.data.__class__(num_qubits=2, state_type="bell",
                                noise_type="readout", shots_train=200,
                                shots_infer=400, reconstruction="mle"),
    )
    res = pipeline.run_experiment(cfg, seed=0, log_fn=lambda *a: None)
    assert res["samples"].shape == (9, 400, 2)
    assert 0.0 <= res["fidelity"] <= 1.0
    assert np.isfinite(res["losses"]).all()


def test_generation_chunking_matches_single_dispatch(monkeypatch):
    """Chunked generation (cap exceeded) produces the same-shaped output
    and a working pipeline; per-chunk keys differ so chunks are not
    duplicated samples."""
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("rqc")
    cfg = cfg.replace(
        name="chunked_gen",
        diffusion=cfg.diffusion.__class__(num_timesteps=6, schedule="cosine",
                                          sampler="renoise"),
        train=cfg.train.__class__(batch_size=256, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=2,
                                  log_every=0, eval_every=0),
        data=cfg.data.__class__(num_qubits=2, state_type="bell",
                                noise_type="ideal", shots_train=100,
                                shots_infer=90),
    )
    monkeypatch.setattr(pipeline, "_GEN_CHAIN_CAP", 9 * 40)  # 40 shots/call
    res = pipeline.run_experiment(cfg, seed=0, log_fn=lambda *a: None)
    s = np.asarray(res["samples"])
    assert s.shape == (9, 90, 2)
    # Chunks drawn with distinct fold_in keys: the first and second 40-shot
    # blocks of a basis must not be identical (p ~ 2^-80 if independent).
    assert not np.array_equal(s[:, :40], s[:, 40:80])


def test_gen_tables_once_pipeline():
    """gen_tables_once=True routes generation through the amortised
    tables-once path and produces a valid reconstruction."""
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("rqc")
    cfg = cfg.replace(
        name="tables_once",
        diffusion=cfg.diffusion.__class__(num_timesteps=6, schedule="cosine",
                                          sampler="renoise",
                                          gen_tables_once=True),
        train=cfg.train.__class__(batch_size=256, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=2,
                                  log_every=0, eval_every=0),
        data=cfg.data.__class__(num_qubits=2, state_type="bell",
                                noise_type="ideal", shots_train=100,
                                shots_infer=90),
    )
    res = pipeline.run_experiment(cfg, seed=0, log_fn=lambda *a: None)
    s = np.asarray(res["samples"])
    assert s.shape == (9, 90, 2)
    assert 0.0 <= res["fidelity"] <= 1.0


def test_shadow_route_gate():
    # Full density-matrix reconstruction reaches N=8 (GHZ-8 frontier run,
    # RESULTS.md); shadow is for N>8 and capped-basis runs at N>=7.
    from ddqst_tpu.pipeline import use_shadow_route

    assert not use_shadow_route(3, 0)
    assert not use_shadow_route(7, 0)
    assert not use_shadow_route(8, 0)
    assert use_shadow_route(7, 100)
    assert use_shadow_route(8, 100)
    assert use_shadow_route(9, 0)
    assert use_shadow_route(10, 300)
