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

Adam moments reset at each segment boundary (constant lr, brief
re-warmup); the minibatch key is salted per segment so segments see
different basis subsets.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/run_frontier_segments.py --tag ghz8_mle_hot \
      --segments 6 --steps_per_segment 1600
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, SCRIPTS)


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
    import dataclasses

    from ddqst_tpu import pipeline
    from run_scaling_ghz import experiments

    tag, cfg, note = next(
        (t, c, n) for t, c, n in experiments() if t == args.tag
    )
    seg = args.child_segment

    def snap(i: int) -> str:
        name = "ce" if i < 0 else f"seg{i}"
        return os.path.join(args.workdir, f"{tag}_{name}_params")

    # Segment 0 warm-starts from the CE snapshot when one exists (the
    # 'ce' role ran first); legacy campaigns without one do CE inline.
    prev = snap(seg - 1) if (seg > 0 or os.path.exists(snap(-1))) else ""
    cur = snap(seg)
    cache = os.path.join(args.workdir, f"{tag}_target.npz")
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
            stop_after="distill",
        )
        print("== ce segment done", flush=True)
        return
    if args.child_role == "distill":
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train,
            chain_finetune_steps=args.steps_per_segment,
            chain_key_salt=cfg.train.chain_key_salt + seg,
        ))
        res = pipeline.run_experiment(
            cfg, seed=args.seed, params_load=prev, params_save=cur,
            target_cache=cache, stop_after="distill",
        )
        info = res.get("ft_info") or {}
        print(
            f"== segment {seg} done: chain CE "
            f"{info.get('train_ce_before', float('nan')):.5f} -> "
            f"{info.get('train_ce_after', float('nan')):.5f}",
            flush=True,
        )
        return
    # eval role: no further distillation, full tail.
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, chain_finetune_steps=0,
    ))
    t0 = time.perf_counter()
    res = pipeline.run_experiment(cfg, seed=args.seed, params_load=prev)
    rec = {
        "tag": f"{tag}_seg{seg}x{args.steps_per_segment}",
        "num_qubits": cfg.data.num_qubits,
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
                    help="override CE epochs in segment 0 (0 = keep the "
                    "config's budget; used by probes and CPU smoke tests)")
    # Internal: child invocation.
    ap.add_argument("--child_role", choices=["ce", "distill", "eval"],
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
    ]
    for seg in range(args.start_segment, args.segments + 1):
        if seg < 0:
            role, seg_arg = "ce", 0
        elif seg == args.segments:
            # The eval child warm-starts from the LAST distill segment.
            role, seg_arg = "eval", args.segments
        else:
            role, seg_arg = "distill", seg
        cmd = base + ["--child_role", role, "--child_segment", str(seg_arg)]
        print(f"[segments] launching {role} segment {seg} "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            print(f"[segments] segment {seg} FAILED (rc={rc}); resume with "
                  f"--start_segment {seg}", flush=True)
            sys.exit(rc)
        time.sleep(args.cooldown)
    print("[segments] campaign complete", flush=True)


if __name__ == "__main__":
    main()
