"""Segmented frontier campaign: bounded-length distillation dispatch loops.

The TPU relay wedges inside LONG dispatch loops in one long-lived process
(CLAUDE.md "wedge modes"): the 960-dispatch GHZ-8 v2 distillation loop
froze mid-run (flat CPU 45+ min, no log line), exactly like the two
N=10 dist1k attempts, while every <=160-dispatch loop has completed.
This driver splits a frontier experiment's distillation into K segments,
each a FRESH short-lived process at the relay-proven loop length,
chained through orbax params snapshots (`run_experiment(params_load=...,
params_save=..., stop_after='distill')`):

  ce segment: data gen + CE training only -> params_ce (distillation
              retries after a relay wedge then never re-pay the CE train)
  segment 0:  data gen (same seed = identical data) + warm start from
              params_ce + MLE target (cached to npz) + steps/K
              distillation steps -> params_seg0
  segment i:  warm start from params_seg{i-1} + cached target
              + steps/K more steps
  eval:       warm start from the last segment, 0 distillation steps,
              full generation/estimator/metrics tail -> JSONL row

The round-3 campaign's 13x chain-CE descent collapse at the first
segment boundary (VERDICT r3 weak #1) was diagnosed on CPU
(``scripts/diag_segment_descent.py``) as a minibatch-gradient NOISE
FLOOR, not the Adam reset: params-only chaining costs little, Adam
chaining is slightly worse, and 4x per-step basis coverage (gradient
accumulation) out-descends every equal-coverage protocol. ``--accum``
is therefore the campaign lever (VERDICT r3 next-#2); ``--opt_chain``
enables moment chaining for A/B runs; ``--lr_decay`` lowers the floor
geometrically per segment. The minibatch key is salted per segment so
segments see different basis subsets.

Relay protocol (VERDICT r3 weak #2): a failed segment is retried up to
``--retries`` times after the >=60 s client cooldown, each relaunch
preceded by a tiny-matmul health-check child; a RESOURCE_EXHAUSTED or
worker crash no longer ends the campaign at 03:00.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/run_frontier_segments.py --tag ghz8_mle_hot \
      --segments 6 --steps_per_segment 1600
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, SCRIPTS)

from relay_protocol import run_with_retries  # noqa: E402


def child(args) -> None:
    """One segment (or the final eval) — runs in its own fresh process."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    if os.environ.get("DDQST_CPU") == "1":
        # CPU smoke-test mode: drop the axon PJRT factory before first
        # device use (its init costs ~4 min even under JAX_PLATFORMS=cpu).
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        _xb._topology_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    if args.child_role == "probe":
        # Relay health check: one tiny matmul, materialised. Exits 0 only
        # if the device path works end to end.
        import jax.numpy as jnp

        x = jnp.ones((128, 128), jnp.float32)
        print(f"probe ok: {float(jnp.sum(x @ x)):.0f}", flush=True)
        return
    if args.child_role == "datagen":
        # Host-side data-cache fill, CPU-only (no axon init, no relay
        # dispatches): the identical data in ~1-2 min vs ~13 min of
        # device time per child/retry (round-5 addition; see
        # pipeline.ensure_data_cache).
        os.environ["DDQST_CPU"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        _xb._topology_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
        from ddqst_tpu import pipeline as _pl
        from run_scaling_ghz import experiments as _exps

        cfg = next(c for t, c, _ in _exps() if t == args.tag)
        _pl.ensure_data_cache(
            cfg, args.seed,
            os.path.join(args.workdir, f"{args.tag}_data.npz")
            if args.data_cache == "auto" else args.data_cache,
        )
        print("== datagen done", flush=True)
        return
    from relay_protocol import maybe_inject_failure

    maybe_inject_failure(args.child_role)
    import dataclasses

    from ddqst_tpu import pipeline
    from run_scaling_ghz import experiments

    tag, cfg, note = next(
        (t, c, n) for t, c, n in experiments() if t == args.tag
    )
    seg = args.child_segment

    def snap(i: int, kind: str = "params") -> str:
        name = "ce" if i < 0 else f"seg{i}"
        return os.path.join(args.workdir, f"{tag}_{name}_{kind}")

    # Segment 0 warm-starts from the CE snapshot when one exists (the
    # 'ce' role ran first); legacy campaigns without one do CE inline.
    prev = snap(seg - 1) if (seg > 0 or os.path.exists(snap(-1))) else ""
    cur = snap(seg)
    cache = os.path.join(args.workdir, f"{tag}_target.npz")
    dcache = (
        os.path.join(args.workdir, f"{tag}_data.npz")
        if args.data_cache == "auto" else args.data_cache
    )
    steps_log = os.path.join(args.workdir, f"{tag}_segments.jsonl")
    if args.ce_epochs:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, num_epochs=args.ce_epochs,
        ))
    if args.child_role == "ce":
        # CE training only, snapshotted: distillation segments (which can
        # wedge the relay and need killing/retrying) then never re-pay
        # the CE train on relaunch.
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, chain_finetune_steps=0,
        ))
        pipeline.run_experiment(
            cfg, seed=args.seed, params_save=snap(-1),
            stop_after="distill", data_cache=dcache,
        )
        print("== ce segment done", flush=True)
        return
    if args.child_role == "distill":
        overrides = dict(
            chain_finetune_steps=args.steps_per_segment,
            chain_key_salt=cfg.train.chain_key_salt + seg,
            chain_accum=args.accum,
            chain_hard_frac=args.hard_frac,
        )
        if args.chain_lr or args.lr_decay != 1.0:
            base_lr = args.chain_lr or cfg.train.chain_lr
            overrides["chain_lr"] = base_lr * args.lr_decay**seg
        if args.steps_per_call:
            overrides["chain_steps_per_call"] = args.steps_per_call
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **overrides))
        # Adam-moment chaining is opt-in (--opt_chain, A/B use): the CPU
        # diagnosis measured fresh moments per segment as slightly BETTER
        # in the noise-floor regime. Segment 0 (or a resume whose
        # predecessor predates opt snapshots) starts fresh either way.
        prev_opt = snap(seg - 1, "opt") if (args.opt_chain and seg > 0) else ""
        if prev_opt and not os.path.exists(prev_opt):
            prev_opt = ""
        res = pipeline.run_experiment(
            cfg, seed=args.seed, params_load=prev, params_save=cur,
            target_cache=cache, stop_after="distill",
            opt_load=prev_opt,
            opt_save=snap(seg, "opt") if args.opt_chain else "",
            data_cache=dcache,
        )
        info = res.get("ft_info") or {}
        steps_run = (
            0 if res.get("ft_losses") is None else len(res["ft_losses"])
        )
        with open(steps_log, "a") as f:
            f.write(json.dumps({
                "segment": seg, "steps_run": steps_run,
                "lr": cfg.train.chain_lr, "accum": args.accum,
                "hard_frac": args.hard_frac,
                "ce_before": info.get("train_ce_before"),
                "ce_after": info.get("train_ce_after"),
            }) + "\n")
        print(
            f"== segment {seg} done: chain CE "
            f"{info.get('train_ce_before', float('nan')):.5f} -> "
            f"{info.get('train_ce_after', float('nan')):.5f} "
            f"({steps_run} steps @ accum {args.accum})",
            flush=True,
        )
        return
    # eval role: no further distillation, full tail.
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, chain_finetune_steps=0,
    ))
    t0 = time.perf_counter()
    res = pipeline.run_experiment(
        cfg, seed=args.seed, params_load=prev, data_cache=dcache,
    )
    actual_steps = None
    if os.path.exists(steps_log):
        with open(steps_log) as f:
            actual_steps = sum(
                json.loads(line).get("steps_run", 0) for line in f
            )
    rec = {
        "tag": f"{tag}_seg{seg}x{args.steps_per_segment}",
        "num_qubits": cfg.data.num_qubits,
        "distill_steps_actual": actual_steps,
        "fidelity": round(res["fidelity"], 5),
        "raw_fidelity": round(res["raw_fidelity"], 5),
        "raw_fidelity_mitigated": (
            None if res.get("raw_fidelity_mitigated") is None
            else round(res["raw_fidelity_mitigated"], 5)
        ),
        "trace_distance": round(res["trace_distance"], 5),
        "note": f"{note} [segmented: {seg} x {args.steps_per_segment}]",
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(
        f"== {rec['tag']}: fidelity={rec['fidelity']} "
        f"raw={rec['raw_fidelity']} mle={rec['raw_fidelity_mitigated']} "
        f"[{rec['wall_s']}s]",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="ghz8_mle_hot")
    ap.add_argument("--segments", type=int, default=6)
    ap.add_argument("--steps_per_segment", type=int, default=1600,
                    help="keep steps_per_segment/chain_steps_per_call at "
                    "the relay-proven <=160 dispatches per process")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=os.path.join(REPO, "frontier_work"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "examples/results_scaling.jsonl"))
    ap.add_argument("--start_segment", type=int, default=-1,
                    help="-1 = run the CE-snapshot segment first; >=0 = "
                    "resume an interrupted campaign at this segment "
                    "(segment 0 loads the CE snapshot when present)")
    ap.add_argument("--cooldown", type=int, default=60,
                    help="seconds between processes (relay client protocol)")
    ap.add_argument("--ce_epochs", type=int, default=0,
                    help="override CE epochs for every child role (the "
                    "dedicated ce segment normally trains CE; segment 0 "
                    "only trains CE on legacy campaigns without a CE "
                    "snapshot); used by probes and CPU smoke tests")
    ap.add_argument("--chain_lr", type=float, default=0.0,
                    help="override the config's distillation lr (0 = keep)")
    ap.add_argument("--lr_decay", type=float, default=1.0,
                    help="geometric per-segment lr decay factor: segment i "
                    "runs at chain_lr * lr_decay**i (lowers the minibatch-"
                    "SGD noise floor as segments accumulate)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation factor (chain_accum): each "
                    "Adam step averages accum disjoint basis minibatches; "
                    "per-dispatch grid size is unchanged but walltime "
                    "grows ~accum-fold — lower --steps_per_call to match")
    ap.add_argument("--steps_per_call", type=int, default=0,
                    help="override chain_steps_per_call (0 = keep config)")
    ap.add_argument("--hard_frac", type=float, default=0.0,
                    help="hard-basis mining (TrainConfig.chain_hard_frac): "
                    "mix this fraction of excess-KL-proportional weight "
                    "into each segment's minibatch draw, re-measured from "
                    "a full-grid forward pass at segment entry — restores "
                    "gradient signal to the <1%% of bases that carry the "
                    "residual KL at N=8 (Z-sector coherence bases)")
    ap.add_argument("--opt_chain", action="store_true",
                    help="chain distillation Adam moments across segments "
                    "(A/B use; measured slightly worse than fresh moments "
                    "in the noise-floor regime)")
    ap.add_argument("--retries", type=int, default=2,
                    help="automatic relaunches of a failed segment (after "
                    "cooldown + health check) before giving up")
    ap.add_argument("--data_cache", default="auto",
                    help="npz cache for the generated data (same seed = "
                    "identical data; children/probe share one simulation "
                    "pass). 'auto' = <workdir>/<tag>_data.npz; '' disables")
    ap.add_argument("--no_warm", action="store_true",
                    help="skip program-class warming (default: warm_tail "
                    "then a tiny-budget probe run with IDENTICAL program "
                    "shapes execute in fresh processes before the first "
                    "segment — the CLAUDE.md warm-up recipe, now encoded "
                    "in the driver per VERDICT r4 next-#4; the probe also "
                    "fills the data and MLE-target caches)")
    ap.add_argument("--segment_timeout", type=int, default=0,
                    help="kill a segment child after this many seconds and "
                    "retry (0 = no timeout). A wedged relay dispatch shows "
                    "flat CPU forever, so set this to expected segment "
                    "wall + >=15 min (killed-mid-compile programs still "
                    "land in the worker cache, so the retry resumes past "
                    "the compile)")
    # Internal: child invocation.
    ap.add_argument("--child_role",
                    choices=["ce", "distill", "eval", "probe", "datagen"],
                    default="")
    ap.add_argument("--child_segment", type=int, default=0)
    args = ap.parse_args()
    if args.child_role:
        child(args)
        return

    os.makedirs(args.workdir, exist_ok=True)
    base = [
        sys.executable, os.path.abspath(__file__),
        "--tag", args.tag, "--seed", str(args.seed),
        "--workdir", args.workdir, "--out", args.out,
        "--steps_per_segment", str(args.steps_per_segment),
        "--ce_epochs", str(args.ce_epochs),
        "--chain_lr", str(args.chain_lr),
        "--lr_decay", str(args.lr_decay),
        "--accum", str(args.accum),
        "--steps_per_call", str(args.steps_per_call),
        "--hard_frac", str(args.hard_frac),
        "--data_cache", args.data_cache,
    ]
    if args.opt_chain:
        base.append("--opt_chain")
    probe = base + ["--child_role", "probe"]
    dcache_path = (
        os.path.join(args.workdir, f"{args.tag}_data.npz")
        if args.data_cache == "auto" else args.data_cache
    )
    if dcache_path and not os.path.exists(dcache_path):
        # Host-side cache fill BEFORE any relay child (round-5 addition;
        # see run_shadow_segments): CPU-only, so a cold relay cannot
        # cost the campaign its data pass.
        ok = run_with_retries(
            base + ["--child_role", "datagen"], probe, "datagen",
            retries=args.retries, cooldown=args.cooldown,
            timeout=args.segment_timeout,
        )
        if not ok:
            print("[segments] datagen FAILED; aborting", flush=True)
            sys.exit(1)
    if not args.no_warm:
        # CLAUDE.md warm-up recipe, driver-encoded (VERDICT r4 next-#4):
        # warm_tail first (generation/estimator/metrics classes, random
        # params at real shapes, fresh process), then a tiny-budget probe
        # with IDENTICAL program shapes (training + distillation classes;
        # its late-life compiles — generation, MLE — are then already
        # warm). The probe fills the data + MLE-target caches, so
        # segment 0 re-pays neither.
        dcache = (
            os.path.join(args.workdir, f"{args.tag}_data.npz")
            if args.data_cache == "auto" else args.data_cache
        )
        tcache = os.path.join(args.workdir, f"{args.tag}_target.npz")
        warm_cmds = [
            ("warm_tail", [
                sys.executable, os.path.join(SCRIPTS, "warm_tail.py"),
                "--tag", args.tag,
            ]),
            ("warm_probe", [
                sys.executable, os.path.join(SCRIPTS, "run_scaling_ghz.py"),
                "--probe", "--only", args.tag, "--seed", str(args.seed),
                "--data_cache", dcache, "--target_cache", tcache,
            ]),
        ]
        for wlabel, wcmd in warm_cmds:
            ok = run_with_retries(
                wcmd, probe, wlabel, retries=args.retries,
                cooldown=args.cooldown, timeout=args.segment_timeout,
            )
            if not ok:
                print(f"[segments] {wlabel} FAILED; aborting (rerun with "
                      "--no_warm to skip warming)", flush=True)
                sys.exit(1)
            time.sleep(args.cooldown)
    for seg in range(args.start_segment, args.segments + 1):
        if seg < 0:
            role, seg_arg = "ce", 0
        elif seg == args.segments:
            # The eval child warm-starts from the LAST distill segment.
            role, seg_arg = "eval", args.segments
        else:
            role, seg_arg = "distill", seg
        cmd = base + ["--child_role", role, "--child_segment", str(seg_arg)]
        ok = run_with_retries(
            cmd, probe, f"{role} segment {seg}",
            retries=args.retries, cooldown=args.cooldown,
            timeout=args.segment_timeout,
        )
        if not ok:
            print(f"[segments] segment {seg} FAILED after {args.retries} "
                  f"retries; resume with --start_segment {seg}", flush=True)
            sys.exit(1)
        time.sleep(args.cooldown)
    print("[segments] campaign complete", flush=True)


if __name__ == "__main__":
    main()
