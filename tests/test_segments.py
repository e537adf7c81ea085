"""Segmented-distillation mechanics: warm start, target cache, stop_after.

These are the primitives `scripts/run_frontier_segments.py` chains to keep
frontier campaigns' distillation dispatch loops at the relay-proven length
(~160 dispatches per process; longer single-process loops wedge the TPU
relay — CLAUDE.md wedge modes).
"""

import os

import jax
import numpy as np
import pytest

from ddqst_tpu import pipeline
from ddqst_tpu import train as training
from ddqst_tpu.config import get_preset
from ddqst_tpu.models import build_model
from ddqst_tpu.ops import mle
from ddqst_tpu.ops.schedules import make_schedule


def _tiny_mle_cfg(name):
    cfg = get_preset("special_states").replace(name=name)
    return cfg.replace(
        model=cfg.model.__class__(embed_dim=16, hidden_dim=32, num_blocks=1),
        diffusion=cfg.diffusion.__class__(
            num_timesteps=10, schedule="cosine", sampler="renoise"
        ),
        train=cfg.train.__class__(
            batch_size=256, learning_rate=1e-3, optimizer="adam",
            num_epochs=2, log_every=0, eval_every=0,
            chain_finetune_steps=4, chain_lr=1e-3, chain_basis_batch=0,
            chain_steps_per_call=2, chain_val_fraction=0.0,
            chain_target="mle",
        ),
        data=cfg.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=400, shots_infer=500,
        ),
    )


def test_segmented_distillation_chain(tmp_path):
    cache = str(tmp_path / "target.npz")
    p0 = str(tmp_path / "seg0_params")
    logs = []

    # Segment 0: CE + MLE target (written to cache) + 4 distill steps,
    # stop before the generation/estimator tail.
    res0 = pipeline.run_experiment(
        _tiny_mle_cfg("seg0"), seed=0, log_fn=logs.append,
        params_save=p0, target_cache=cache, stop_after="distill",
    )
    assert os.path.exists(cache), "MLE target not cached"
    assert os.path.exists(p0), "params snapshot not saved"
    assert res0["ft_info"] is not None
    assert "fidelity" not in res0  # tail skipped
    assert any("MLE Born probs" in m and "cached" not in m for m in logs)

    # Segment 1: warm start (CE skipped), target loaded from cache.
    logs1 = []
    res1 = pipeline.run_experiment(
        _tiny_mle_cfg("seg1"), seed=0, log_fn=logs1.append,
        params_load=p0, target_cache=cache, stop_after="distill",
    )
    assert any("warm start" in m for m in logs1)
    assert any("cached" in m for m in logs1)
    assert res1["ft_info"] is not None
    # Warm-started distillation resumes from segment 0's endpoint: its
    # starting full-grid CE equals segment 0's post-distillation CE.
    np.testing.assert_allclose(
        res1["ft_info"]["train_ce_before"],
        res0["ft_info"]["train_ce_after"],
        rtol=1e-5,
    )

    # Eval segment: warm start + zero distillation steps + full tail.
    cfg_eval = _tiny_mle_cfg("seg_eval")
    cfg_eval = cfg_eval.replace(
        train=cfg_eval.train.__class__(
            batch_size=256, learning_rate=1e-3, optimizer="adam",
            num_epochs=2, log_every=0, eval_every=0,
            chain_finetune_steps=0,
        ),
    )
    res_eval = pipeline.run_experiment(
        cfg_eval, seed=0, log_fn=lambda *a: None, params_load=p0,
    )
    assert "fidelity" in res_eval and 0.0 <= res_eval["fidelity"] <= 1.0


def _tiny_shadow_cfg(name, distill_steps, salt=0):
    """N=7 shadow-route config (use_shadow_route: N>=7 with a basis cap)
    at CPU-test scale — the segment mechanics `run_shadow_segments.py`
    chains for the N=10 campaign."""
    cfg = get_preset("shadow_transformer").replace(name=name)
    return cfg.replace(
        model=cfg.model.__class__(
            arch="transformer", input_encoding="token", embed_dim=16,
            hidden_dim=32, num_blocks=1, num_heads=2,
        ),
        diffusion=cfg.diffusion.__class__(
            num_timesteps=8, schedule="cosine", sampler="renoise"
        ),
        train=cfg.train.__class__(
            batch_size=128, learning_rate=1e-3, optimizer="adam",
            num_epochs=1, log_every=0, eval_every=0,
            chain_finetune_steps=distill_steps, chain_lr=1e-3,
            chain_basis_batch=2, chain_steps_per_call=2,
            chain_val_fraction=0.25, chain_key_salt=salt,
        ),
        data=cfg.data.__class__(
            num_qubits=7, state_type="rqc", noise_type="readout",
            shots_train=64, shots_infer=128, rqc_depth=2, max_bases=4,
        ),
    )


def test_segmented_distillation_shadow_route(tmp_path):
    """The shadow route supports the same segment primitives as the full
    route: params_save + stop_after='distill' (skips the generation/
    metrics tail), warm start resuming distillation, eval-only tail."""
    p_ce = str(tmp_path / "ce_params")
    p0 = str(tmp_path / "seg0_params")
    logs = []

    # CE segment: training only, snapshot, no generation tail.
    res_ce = pipeline.run_experiment(
        _tiny_shadow_cfg("sh_ce", 0), seed=0, log_fn=logs.append,
        params_save=p_ce, stop_after="distill",
    )
    assert os.path.exists(p_ce)
    assert "mean_tv_to_target" not in res_ce  # tail skipped
    assert any("shadow-scale training" in m for m in logs)

    # Distill segment: warm start (CE skipped), 4 chain steps, snapshot.
    logs1 = []
    res0 = pipeline.run_experiment(
        _tiny_shadow_cfg("sh_seg0", 4, salt=1), seed=0, log_fn=logs1.append,
        params_load=p_ce, params_save=p0, stop_after="distill",
    )
    assert any("warm start" in m for m in logs1)
    assert any("chain distillation" in m for m in logs1)
    assert res0["ft_info"] is not None
    assert "mean_tv_to_target" not in res0

    # Eval segment: warm start + zero steps + full metrics tail.
    res_eval = pipeline.run_experiment(
        _tiny_shadow_cfg("sh_eval", 0), seed=0, log_fn=lambda *a: None,
        params_load=p0,
    )
    assert "mean_tv_to_target" in res_eval
    assert 0.0 <= res_eval["classical_fidelity"] <= 1.0


# --- Descent continuity across segment boundaries (VERDICT r3 weak #6) ---
# The round-3 GHZ-8 campaign's chain-CE descent collapsed 13x at the first
# segment boundary; the CPU diagnosis (scripts/diag_segment_descent.py)
# attributed it to a minibatch-noise floor, with params-only chaining
# costing only a mild penalty vs a single run. These tests pin that
# property at CPU scale so a real boundary-induced collapse is caught.


def _distill_setup():
    """CE-trained GHZ-3 state + counts target, shared by the arms."""
    cfg = get_preset("rqc").replace(name="continuity")
    cfg = cfg.replace(
        model=cfg.model.__class__(
            input_encoding="token", embed_dim=16, hidden_dim=32,
            num_blocks=1),
        diffusion=cfg.diffusion.__class__(
            num_timesteps=12, schedule="cosine", sampler="renoise"),
        train=cfg.train.__class__(
            batch_size=512, learning_rate=1e-3, optimizer="adam",
            num_epochs=3, log_every=0, eval_every=0),
        data=cfg.data.__class__(
            num_qubits=3, state_type="ghz", noise_type="readout",
            shots_train=300, shots_infer=300),
    )
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    k_data, k_train, _ = jax.random.split(key, 3)
    data = pipeline.generate_training_data(cfg, k_data, rng)
    x, basis = pipeline.flatten_for_training(data.bits, data.basis_idx)
    schedule = make_schedule(cfg.diffusion.schedule,
                             cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, 3, cfg.diffusion.num_timesteps)
    state, _ = training.fit(k_train, model, x, basis, cfg.train, schedule)
    target = mle.bits_to_counts(data.bits)
    return cfg, state, target, schedule, k_train


def _distill(cfg, state, target, schedule, k_train, *, steps, salt,
             accum=1, init_opt=None, hard_frac=0.0):
    return training.finetune_chain(
        state, target, schedule, 3, steps=steps, learning_rate=1e-3,
        exact=cfg.diffusion.exact, basis_batch=4,
        key=jax.random.fold_in(k_train, 0xD157 + salt),
        steps_per_call=20, accum=accum, init_opt_state=init_opt,
        hard_frac=hard_frac,
    )


def test_segmented_descent_continuity():
    """Params-only 2xS chaining descends within a factor of the single-run
    2S-step descent, and segment 2 keeps descending (no boundary collapse
    beyond the noise-floor regime's natural diminishing returns)."""
    cfg, state, target, schedule, k_train = _distill_setup()
    args = (cfg, state, target, schedule, k_train)

    _, _, info_single = _distill(*args, steps=80, salt=1)
    d_single = info_single["train_ce_before"] - info_single["train_ce_after"]

    st1, _, i1 = _distill(*args, steps=40, salt=1)
    _, _, i2 = _distill(cfg, st1, target, schedule, k_train,
                        steps=40, salt=2)
    d_seg = (i1["train_ce_before"] - i1["train_ce_after"]) + (
        i2["train_ce_before"] - i2["train_ce_after"])

    assert d_single > 0 and d_seg > 0
    # Segment 2 must make real progress (the round-3 failure signature was
    # a 13x per-segment collapse; natural diminishing returns at this
    # budget measure well under 3x).
    assert i2["train_ce_before"] - i2["train_ce_after"] > 0
    assert d_seg > 0.5 * d_single, (d_seg, d_single)


def test_accum_raises_coverage_and_descends_further():
    """chain_accum=4 at equal step count descends at least as far as
    accum=1 (the measured noise-floor fix, diag_segment_descent.json:
    0.223 vs 0.168 at GHZ-5)."""
    cfg, state, target, schedule, k_train = _distill_setup()
    args = (cfg, state, target, schedule, k_train)
    _, _, i1 = _distill(*args, steps=40, salt=1)
    _, _, i4 = _distill(*args, steps=40, salt=1, accum=4)
    d1 = i1["train_ce_before"] - i1["train_ce_after"]
    d4 = i4["train_ce_before"] - i4["train_ce_after"]
    assert d4 > 0.9 * d1, (d4, d1)


def test_chain_opt_state_roundtrip():
    """final_opt_state is portable: chaining it into a continuation is
    accepted and bit-compatible with the template from chain_opt_template."""
    cfg, state, target, schedule, k_train = _distill_setup()
    st1, _, i1 = _distill(cfg, state, target, schedule, k_train,
                          steps=10, salt=1)
    opt = i1["final_opt_state"]
    tmpl = training.chain_opt_template(st1.params)
    assert jax.tree_util.tree_structure(opt) == (
        jax.tree_util.tree_structure(tmpl))
    assert int(opt["count"]) == 10
    _, _, i2 = _distill(cfg, st1, target, schedule, k_train,
                        steps=10, salt=2, init_opt=opt)
    assert int(i2["final_opt_state"]["count"]) == 20


def _per_basis_ce(state, target, schedule, exact):
    """Exact per-basis chain CE on the full GHZ-3 grid (27 bases)."""
    import jax.numpy as jnp

    from ddqst_tpu.ops.diffusion import chain_distribution

    tgt = np.asarray(target, np.float64)
    tgt = tgt / tgt.sum(-1, keepdims=True)

    def denoise_fn(x, t, b):
        return state.apply_fn({"params": state.params}, x, t, b)

    dist = np.asarray(chain_distribution(
        denoise_fn, 3, schedule, exact,
        basis_idx=jnp.arange(27, dtype=jnp.int32)))
    return -np.sum(tgt * np.log(np.maximum(dist, 1e-12)), axis=-1)


def test_hard_basis_mining_targets_starved_bases():
    """hard_frac > 0 recovers excess-KL-concentrated bases faster than the
    uniform draw at equal budget — the round-4 GHZ-8 mechanism: the
    residual 0.011-nat grid excess was concentrated in the 256 all-X/Y
    coherence bases (~0.5 nats each) that a uniform mean-CE minibatch
    starves of gradient weight 100:1."""
    import jax.numpy as jnp

    from ddqst_tpu.ops.diffusion import chain_distribution

    cfg, state, _, schedule, k_train = _distill_setup()

    # A SMOOTH target (the campaign regime: MLE Born probs, not noisy
    # counts): the model's own chain distribution — zero excess KL
    # everywhere — with the uniform distribution planted at 3 bases, so
    # the entire excess concentrates there by construction.
    def denoise_fn(x, t, b):
        return state.apply_fn({"params": state.params}, x, t, b)

    tgt = np.asarray(chain_distribution(
        denoise_fn, 3, schedule, cfg.diffusion.exact,
        basis_idx=jnp.arange(27, dtype=jnp.int32)), np.float64)
    tgt = tgt / tgt.sum(-1, keepdims=True)
    hard = np.array([5, 13, 21])
    tgt[hard] = 1.0 / tgt.shape[-1]

    ce0 = _per_basis_ce(state, tgt, schedule, cfg.diffusion.exact)
    assert ce0[hard].mean() > ce0.mean(), "setup: excess not concentrated"

    # The mining draw distribution (info['hard_draw_p'], measured from
    # the same entry-time per-basis CE as train_ce_before) must put the
    # excess-proportional share of its mass on the planted bases. With
    # hard_frac=0.5, >=45% of the draw concentrates on 3 of 27 bases
    # (uniform would give 11%). Training-dynamics evidence at campaign
    # scale lives in scripts/diag_hard_mining.py (GHZ-5 MLE target:
    # worst-basis excess 0.19 hard50 vs 0.53 uniform at equal budget);
    # at 27 bases the uniform draw starves nothing, so the dynamics are
    # not reproducible at unit-test scale.
    _, losses, info = _distill(cfg, state, tgt, schedule, k_train,
                               steps=4, salt=3, hard_frac=0.5)
    p = info["hard_draw_p"]
    assert p.shape == (27,) and abs(p.sum() - 1.0) < 1e-5
    assert p[hard].sum() > 0.45, p[hard].sum()
    assert np.isfinite(np.asarray(losses)).all()

    # Uniform runs expose no mining distribution.
    _, _, info_u = _distill(cfg, state, tgt, schedule, k_train,
                            steps=2, salt=3)
    assert "hard_draw_p" not in info_u

    # Mechanics: the weighted draw composes with gradient accumulation.
    _, losses, info = _distill(cfg, state, tgt, schedule, k_train,
                               steps=6, salt=4, accum=2, hard_frac=0.5)
    assert np.isfinite(np.asarray(losses)).all()
    assert info["train_ce_after"] <= info["train_ce_before"] + 0.05


def test_skip_grid_ce_env_runs_without_chain_evals(monkeypatch):
    """DDQST_SKIP_GRID_CE=1 (round-5 relay fallback: the N=10 chain-eval
    program class crashed today's worker at every chunk size while the
    optimisation classes ran fine) must run the full step budget with no
    grid-CE dispatches: NaN entry/exit CE, no held-out selection, and the
    same descent machinery (losses still finite and decreasing-ish)."""
    cfg, state, target, schedule, k_train = _distill_setup()
    monkeypatch.setenv("DDQST_SKIP_GRID_CE", "1")
    counts = np.asarray(target, np.float32)
    val = counts * 0.25
    st, losses, info = training.finetune_chain(
        state, target, schedule, 3, steps=8, learning_rate=1e-3,
        exact=cfg.diffusion.exact, basis_batch=4,
        key=jax.random.fold_in(k_train, 0xD157),
        steps_per_call=4, val_counts=val, hard_frac=0.5,
    )
    assert len(losses) == 8  # no early stop without val evals
    assert np.isnan(info["train_ce_before"])
    assert np.isnan(info["train_ce_after"])
    assert "best_step" not in info
    assert "hard_draw_p" not in info  # mining disabled (needs entry CE)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_skip_grid_ce_shadow_pipeline_segment(tmp_path, monkeypatch):
    """A shadow distill segment must run end to end under
    DDQST_SKIP_GRID_CE=1 (the round-5 campaign hit a KeyError on the
    held-out log line exactly here — the fail-fast classifier caught it
    as a deterministic bug, correctly)."""
    monkeypatch.setenv("DDQST_SKIP_GRID_CE", "1")
    p0 = str(tmp_path / "seg0_params")
    logs = []
    res = pipeline.run_experiment(
        _tiny_shadow_cfg("sh_skip", 4, salt=1), seed=0, log_fn=logs.append,
        params_save=p0, stop_after="distill",
    )
    assert os.path.exists(p0)
    info = res["ft_info"]
    assert np.isnan(info["train_ce_before"])
    assert np.isnan(info["train_ce_after"])
    assert len(res["ft_losses"]) == 4
