"""End-to-end CPU tests of the segmented campaign drivers.

VERDICT r3 weak #2 / next-#4: the round-3 GHZ-8 campaign died at segment 2
on a transient RESOURCE_EXHAUSTED because the driver had no retry/health
protocol. These tests run the real drivers (fresh subprocesses, exactly as
on TPU but with DDQST_CPU=1) with an injected transient failure and assert
the campaign retries, resumes, and completes through the eval row.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _env(tmp_path, fail_flag=""):
    env = dict(os.environ)
    env["DDQST_CPU"] = "1"
    env["PYTHONPATH"] = REPO
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jax_cache")
    # The campaign children must not inherit the test process's forced
    # 8-device CPU mesh (it only slows tiny runs down).
    env.pop("XLA_FLAGS", None)
    if fail_flag:
        env["DDQST_FAIL_ONCE"] = fail_flag
    else:
        env.pop("DDQST_FAIL_ONCE", None)
    return env


def test_frontier_campaign_retries_after_transient_failure(tmp_path):
    """A distill segment that dies once (injected) is retried after the
    cooldown + health probe, and the campaign completes with an eval row
    carrying the ACTUAL step count."""
    flag = str(tmp_path / "fail_once")
    with open(flag, "w") as f:
        f.write("x")
    out = str(tmp_path / "results.jsonl")
    workdir = str(tmp_path / "work")
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_frontier_segments.py"),
        "--tag", "cpu_tiny", "--segments", "2", "--steps_per_segment", "4",
        "--cooldown", "0", "--retries", "2", "--no_warm",
        "--workdir", workdir, "--out", out,
    ]
    proc = subprocess.run(
        cmd, env=_env(tmp_path, fail_flag=flag), capture_output=True,
        text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert not os.path.exists(flag), "injected failure never fired"
    assert "attempt 2" in proc.stdout, proc.stdout
    assert "campaign complete" in proc.stdout
    with open(out) as f:
        rows = [json.loads(line) for line in f]
    assert len(rows) == 1
    assert rows[0]["distill_steps_actual"] == 8  # 2 segments x 4 steps
    assert 0.0 <= rows[0]["fidelity"] <= 1.0
    # Per-segment sidecar records chain-CE descent for the scaling curve.
    with open(os.path.join(workdir, "cpu_tiny_segments.jsonl")) as f:
        segs = [json.loads(line) for line in f]
    assert [s["segment"] for s in segs] == [0, 1]
    assert all(s["steps_run"] == 4 for s in segs)


def test_frontier_campaign_fails_after_exhausting_retries(tmp_path):
    """A deterministic failure (flag re-armed every attempt) exhausts
    --retries and exits nonzero with the resume hint."""
    flag = str(tmp_path / "fail_always")
    out = str(tmp_path / "results.jsonl")
    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    # Pre-seed a fake CE snapshot dir so segment 0 runs distill quickly?
    # Not needed: start at segment 0 with retries=0 and a standing flag.
    with open(flag, "w") as f:
        f.write("x")
    # Re-arming: retries=0 means one attempt; the injected failure fires
    # on the first distill child and the campaign must exit nonzero.
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_frontier_segments.py"),
        "--tag", "cpu_tiny", "--segments", "1", "--steps_per_segment", "2",
        "--cooldown", "0", "--retries", "0", "--no_warm",
        "--workdir", workdir, "--out", out,
    ]
    proc = subprocess.run(
        cmd, env=_env(tmp_path, fail_flag=flag), capture_output=True,
        text=True, timeout=1200,
    )
    assert proc.returncode != 0
    assert "resume with --start_segment" in proc.stdout


def test_classify_failure_rules():
    """VERDICT r4 weak #5: transient relay signatures retry; a plain
    traceback (deterministic child bug) fails fast; unclassifiable
    deaths retry."""
    sys.path.insert(0, SCRIPTS)
    from relay_protocol import classify_failure

    # Relay/infra failure modes -> transient.
    assert classify_failure(1, "jax.errors.JaxRuntimeError: UNAVAILABLE: "
                            "TPU worker process crashed") == "transient"
    assert classify_failure(1, "RESOURCE_EXHAUSTED: out of memory"
                            ) == "transient"
    assert classify_failure("timeout", "") == "transient"
    assert classify_failure(-9, "") == "transient"          # OOM-killed
    assert classify_failure(17, "[relay-protocol] injected transient "
                            "failure") == "transient"
    assert classify_failure(1, "") == "transient"           # no evidence
    # A deterministic child bug -> fatal (fail fast, don't burn retries).
    tb = ("Traceback (most recent call last):\n  File x.py, line 1\n"
          "ValueError: injected deterministic bug")
    assert classify_failure(1, tb) == "fatal"
    # A traceback whose CAUSE is a relay error is still transient.
    assert classify_failure(1, tb + "\nUNAVAILABLE: socket") == "transient"


def test_frontier_campaign_fails_fast_on_deterministic_bug(tmp_path):
    """A child that dies with a plain traceback (no relay signature) must
    NOT be retried even with retries available — retrying a code bug
    replays the crash at full data-gen cost (VERDICT r4 weak #5)."""
    out = str(tmp_path / "results.jsonl")
    workdir = str(tmp_path / "work")
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_frontier_segments.py"),
        "--tag", "cpu_tiny", "--segments", "1", "--steps_per_segment", "2",
        "--cooldown", "0", "--retries", "2", "--no_warm",
        "--start_segment", "0",  # skip the ce child: bug fires in distill
        "--workdir", workdir, "--out", out,
    ]
    env = _env(tmp_path)
    env["DDQST_FAIL_BUG"] = "1"
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode != 0
    assert "injected deterministic bug" in proc.stdout
    assert "not retrying" in proc.stdout
    assert "attempt 2" not in proc.stdout  # retries were available, unused


def test_frontier_campaign_warms_program_classes_first(tmp_path):
    """The frontier driver encodes the CLAUDE.md warm-up recipe: warm_tail
    (fresh process, tail classes) then a tiny-budget probe with identical
    program shapes, BEFORE the first segment child (VERDICT r4 next-#4).
    Asserted via the dryrun hook."""
    env = _env(tmp_path)
    env["DDQST_DRYRUN_CHILDREN"] = "1"
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_frontier_segments.py"),
        "--tag", "cpu_tiny", "--segments", "1", "--cooldown", "0",
        "--workdir", str(tmp_path / "work"),
        "--out", str(tmp_path / "results.jsonl"),
    ]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    labels = [
        line.split("[dryrun] ", 1)[1]
        for line in proc.stdout.splitlines() if "[dryrun]" in line
    ]
    assert labels == [
        "datagen", "warm_tail", "warm_probe", "ce segment -1",
        "distill segment 0", "eval segment 1",
    ], labels


def test_shadow_campaign_warms_program_classes_first(tmp_path):
    """VERDICT r4 next-#4: the shadow driver must warm the distill and
    generation program classes (fresh processes) BEFORE segment 0 —
    the round-4 campaign crashed at the first-ever cold shadow grid-CE
    dispatch inside segment 0. Asserted via the dryrun child hook (the
    real N=10 children are TPU-scale)."""
    env = _env(tmp_path)
    env["DDQST_DRYRUN_CHILDREN"] = "1"
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_shadow_segments.py"),
        "--tag", "dry", "--segments", "2", "--cooldown", "0",
        "--workdir", str(tmp_path / "work"),
        "--out", str(tmp_path / "results.jsonl"),
    ]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    labels = [
        line.split("[dryrun] ", 1)[1]
        for line in proc.stdout.splitlines() if "[dryrun]" in line
    ]
    assert labels == [
        "datagen", "warm_distill", "warm_gen", "ce segment -1",
        "distill segment 0", "distill segment 1", "eval segment 2",
    ], labels
    # --no_warm skips the warm children.
    proc = subprocess.run(
        cmd + ["--no_warm", "--start_segment", "0"], env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0
    assert "warm_" not in proc.stdout


@pytest.mark.parametrize("role", ["warm_distill", "warm_gen"])
def test_shadow_warm_children_run(tmp_path, role):
    """The warm children themselves execute end to end (tiny model /
    basis budget; the real campaign runs them at full shapes). They use
    synthetic random params/data — no data gen, so a relay crash during
    warming is cheap to retry."""
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_shadow_segments.py"),
        "--tag", "warmtest", "--child_role", role,
        "--embed", "8", "--hidden", "16", "--blocks", "1", "--heads", "2",
        "--max_bases", "4", "--shots_infer", "40",
        "--distill_basis_batch", "2", "--distill_steps_per_call", "2",
        "--hard_frac", "0.5",
        "--workdir", str(tmp_path / "work"),
        "--out", str(tmp_path / "results.jsonl"),
    ]
    proc = subprocess.run(
        cmd, env=_env(tmp_path), capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert f"== {role} done" in proc.stdout


def test_make_target_and_exact_rescore_cpu_tiny(tmp_path):
    """make_mle_target reproduces a campaign's target npz + data cache
    from cfg+seed alone (container-reset recovery), and exact_rescore
    scores a snapshot through the zero-shot-noise eval tail, with the
    sampled A/B row drawn from the same distributions."""
    import numpy as np

    workdir = str(tmp_path / "work")
    env = _env(tmp_path)
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "make_mle_target.py"),
         "--tag", "cpu_tiny", "--workdir", workdir],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    tgt = np.load(os.path.join(workdir, "cpu_tiny_target.npz"))["target"]
    assert tgt.shape == (9, 4)
    np.testing.assert_allclose(tgt.sum(-1), 1.0, atol=1e-4)
    assert os.path.exists(os.path.join(workdir, "cpu_tiny_data.npz"))

    # Snapshot: a random-init model is enough to drive the rescore path.
    from ddqst_tpu import train as training
    from ddqst_tpu.models import build_model
    from ddqst_tpu.utils import checkpoint as ckpt

    sys.path.insert(0, SCRIPTS)
    from run_scaling_ghz import experiments

    import jax

    cfg = next(c for t, c, _ in experiments() if t == "cpu_tiny")
    model = build_model(cfg.model, 2, cfg.diffusion.num_timesteps)
    st = training.create_state(jax.random.key(1), model, cfg.train, 2)
    snap = str(tmp_path / "snap")
    ckpt.save_params(snap, st.params)
    out = str(tmp_path / "rescore.jsonl")
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "exact_rescore.py"),
         "--tag", "cpu_tiny", "--params", snap, "--also_sampled",
         "--out", out],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(out) as f:
        rows = [json.loads(line) for line in f]
    kinds = [r["kind"] for r in rows]
    assert kinds == ["exact_dist", "sampled_from_dist"]
    assert all(0.0 <= r["fidelity"] <= 1.0 for r in rows)


def test_ensure_data_cache_matches_run_experiment(tmp_path):
    """pipeline.ensure_data_cache (the CPU datagen child's core) must
    derive keys byte-identically to run_experiment: an experiment run
    FROM the pre-filled cache reproduces the self-generated results."""
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("special_states").replace(name="ensure_cache_test")
    cfg = cfg.replace(
        model=cfg.model.__class__(embed_dim=16, hidden_dim=32, num_blocks=1),
        diffusion=cfg.diffusion.__class__(num_timesteps=10, schedule="cosine"),
        train=cfg.train.__class__(
            batch_size=64, learning_rate=1e-3, optimizer="adam",
            num_epochs=1, log_every=0, eval_every=0,
        ),
        data=cfg.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=100, shots_infer=100,
        ),
    )
    ref = pipeline.run_experiment(cfg, seed=3)

    cache = str(tmp_path / "data.npz")
    pipeline.ensure_data_cache(cfg, 3, cache)
    assert os.path.exists(cache)
    mtime = os.path.getmtime(cache)
    pipeline.ensure_data_cache(cfg, 3, cache)  # second call: no-op
    assert os.path.getmtime(cache) == mtime

    logs: list[str] = []
    r = pipeline.run_experiment(
        cfg, seed=3, data_cache=cache, log_fn=logs.append,
    )
    assert any("loading cached data" in line for line in logs)
    assert r["raw_fidelity"] == ref["raw_fidelity"]
    assert r["fidelity"] == pytest.approx(ref["fidelity"], abs=1e-5)


def test_frontier_datagen_child_fills_cache(tmp_path):
    """The frontier driver's CPU datagen child writes the tag's data
    cache without touching any device path (it forces CPU mode)."""
    work = tmp_path / "work"
    work.mkdir()
    cmd = [
        sys.executable, os.path.join(SCRIPTS, "run_frontier_segments.py"),
        "--tag", "cpu_tiny", "--child_role", "datagen",
        "--workdir", str(work),
        "--out", str(tmp_path / "results.jsonl"),
    ]
    proc = subprocess.run(
        cmd, env=_env(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "== datagen done" in proc.stdout
    assert (work / "cpu_tiny_data.npz").exists()


def test_run_experiment_data_cache(tmp_path):
    """data_cache: the first run persists the generated data; the second
    loads it (skipping the simulation pass) and reproduces identical
    data-dependent results."""
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("special_states").replace(name="cache_test")
    cfg = cfg.replace(
        model=cfg.model.__class__(embed_dim=16, hidden_dim=32, num_blocks=1),
        diffusion=cfg.diffusion.__class__(num_timesteps=10, schedule="cosine"),
        train=cfg.train.__class__(
            batch_size=64, learning_rate=1e-3, optimizer="adam",
            num_epochs=1, log_every=0, eval_every=0,
        ),
        data=cfg.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=100, shots_infer=100,
        ),
    )
    cache = str(tmp_path / "data.npz")
    logs: list[str] = []
    r1 = pipeline.run_experiment(
        cfg, seed=3, data_cache=cache, log_fn=logs.append,
    )
    assert os.path.exists(cache)
    assert any("cached data to" in line for line in logs)
    logs.clear()
    r2 = pipeline.run_experiment(
        cfg, seed=3, data_cache=cache, log_fn=logs.append,
    )
    assert any("loading cached data" in line for line in logs)
    assert r1["raw_fidelity"] == r2["raw_fidelity"]
    assert r1["fidelity"] == pytest.approx(r2["fidelity"], abs=1e-5)
