"""Segmented N=10 shadow-scale distillation campaign.

The round-3 plateau analysis (RESULTS.md "N=10 shadow") found shadow-scale
chain distillation is the one lever that moves the N=10 TV plateau
(0.197 → 0.174 at 300 steps, still descending at the budget end), but the
two dist1k continuation attempts wedged the TPU relay inside long
dispatch loops (CLAUDE.md "wedge modes"), and the CE warm-start snapshot
was lost to a container reset because it lived in /tmp.

This driver applies the GHZ-8 segmented protocol
(``run_frontier_segments.py``) to the shadow route:

  ce segment:   data gen + 150-epoch CE training (~25 min), NO
                distillation -> params snapshot under the REPO workdir
                (survives container resets)
  segment i:    data gen (same seed = identical data/bases) + warm start
                from the previous snapshot + ``steps_per_segment`` more
                distillation steps in a FRESH process at the relay-proven
                dispatch shapes (steps_per_call=5, basis_batch=16,
                300 steps = 60 dispatches/process), fresh salt per
                segment so basis minibatches are not replayed
  eval:         warm start from the last segment, 0 distillation steps,
                full generation + exact-Born metrics tail -> JSONL row

Reference scale anchor: RQC depth 8 at N=10 with shadow bases, matching
``RQC_dataset_building_phase/build_dataset.py:69-87``; everything past the
data protocol (transformer denoiser, chain distillation, segmentation) is
framework-native.

Usage (full campaign: CE + 4x300 distillation + eval ~= 1h TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/run_shadow_segments.py --tag dist_seg --segments 4

Resume after an interrupted segment i (the CE snapshot is reused):
  ... run_shadow_segments.py --tag dist_seg --segments 4 --start_segment i
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

from relay_protocol import maybe_inject_failure, run_with_retries  # noqa: E402


def _cfg_for(args, *, distill_steps: int, distill_salt: int):
    from run_shadow_scale import make_cfg

    return make_cfg(
        args.tag, epochs=args.epochs, embed=args.embed, hidden=args.hidden,
        blocks=args.blocks, heads=args.heads,
        shots_infer=args.shots_infer, shots_train=args.shots_train,
        max_bases=args.max_bases,
        distill_steps=distill_steps,
        distill_basis_batch=args.distill_basis_batch,
        distill_steps_per_call=args.distill_steps_per_call,
        distill_val=args.distill_val, distill_salt=distill_salt,
        distill_hard_frac=args.hard_frac,
    )


def _warm_child(args) -> None:
    """Warm the worker's program cache for one segment-child program class,
    with RANDOM params/data at the REAL dispatch shapes (VERDICT r4 weak
    #1 / next-#4: the round-4 campaign crashed at the first-ever cold
    dispatch of the shadow grid-CE program inside segment 0, and every
    retry re-paid the full data-gen before re-reaching the crash site).

    Two roles, each a FRESH short-lived process (cold compiles late in a
    long-lived process are the wedge mode, CLAUDE.md):

    - ``warm_distill``: one tiny :func:`train.finetune_chain` run at the
      campaign's exact shapes — dispatches the full-grid CE chunk
      programs (both the full [8 x 2^N] and remainder chunk shapes at
      N=10/300 bases), the held-out val eval, and one optimisation
      ``run_chunk`` at the configured steps_per_call/basis_batch/
      hard_frac (p= vs p=None draw is a different program).
    - ``warm_gen``: the eval child's generation + histogram classes
      (``sample_for_bases`` at [max_bases, shots_infer] + bits_to_counts).

    A crash here is cheap to absorb: no data gen, and killed-mid-compile
    programs still land in the worker cache, so the retry (driven by the
    same run_with_retries loop) resumes past the compile.
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddqst_tpu import train as training
    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops import mle
    from ddqst_tpu.ops.schedules import make_schedule

    cfg = _cfg_for(args, distill_steps=args.distill_steps_per_call,
                   distill_salt=1)
    n = cfg.data.num_qubits
    T = cfg.diffusion.num_timesteps
    schedule = make_schedule(cfg.diffusion.schedule, T)
    model = build_model(cfg.model, n, T)
    state = training.create_state(jax.random.key(0), model, cfg.train, n)
    b = args.max_bases
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 3, size=(b, n)), jnp.int32)
    t0 = _time.perf_counter()

    if args.child_role == "warm_distill":
        counts = jnp.asarray(
            rng.random((b, 2**n)) + 0.1, jnp.float32
        )
        val = jnp.asarray(rng.random((b, 2**n)) + 0.1, jnp.float32)
        _, _, info = training.finetune_chain(
            state, counts, schedule, n,
            steps=args.distill_steps_per_call,
            learning_rate=cfg.train.chain_lr,
            exact=cfg.diffusion.exact,
            basis_batch=args.distill_basis_batch,
            key=jax.random.key(1),
            steps_per_call=args.distill_steps_per_call,
            val_counts=val,
            basis_labels=labels,
            hard_frac=args.hard_frac,
        )
        print(f"== warm_distill done: grid-CE + run_chunk classes warm "
              f"(ce {info['train_ce_before']:.3f} -> "
              f"{info['train_ce_after']:.3f}) "
              f"[{_time.perf_counter() - t0:.1f}s]", flush=True)
        return

    from ddqst_tpu.ops import diffusion as diff

    samples = diff.sample_for_bases(
        jax.random.key(2), state.apply_fn, {"params": state.params},
        labels, args.shots_infer, schedule, exact=cfg.diffusion.exact,
    )
    counts = mle.bits_to_counts(samples)
    print(f"== warm_gen done: generation + histogram classes warm "
          f"(sum {float(jnp.sum(counts)):.0f}) "
          f"[{_time.perf_counter() - t0:.1f}s]", flush=True)


def child(args) -> None:
    """One segment (ce / distill / eval) in its own fresh process."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    if args.child_role == "datagen":
        # Data gen never needs the device: force CPU mode so the ~4-min
        # axon init and the device dispatch path are skipped entirely
        # (measured: 75 s host-side vs ~13 min through the relay).
        os.environ["DDQST_CPU"] = "1"
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
        # Relay health check: one tiny matmul, materialised.
        import jax.numpy as jnp

        x = jnp.ones((128, 128), jnp.float32)
        print(f"probe ok: {float(jnp.sum(x @ x)):.0f}", flush=True)
        return
    if args.child_role in ("warm_distill", "warm_gen"):
        _warm_child(args)
        return
    maybe_inject_failure(args.child_role)
    from ddqst_tpu import pipeline

    if args.child_role == "datagen":
        cfg = _cfg_for(args, distill_steps=0, distill_salt=0)
        cache = (
            os.path.join(args.workdir, f"{args.tag}_data.npz")
            if args.data_cache == "auto" else args.data_cache
        )
        pipeline.ensure_data_cache(cfg, args.seed, cache)
        print("== datagen done", flush=True)
        return

    tag, seg = args.tag, args.child_segment

    def snap(i: int) -> str:
        name = "ce" if i < 0 else f"seg{i}"
        return os.path.join(args.workdir, f"{tag}_{name}_params")

    steps_log = os.path.join(args.workdir, f"{tag}_segments.jsonl")
    cache = (
        os.path.join(args.workdir, f"{tag}_data.npz")
        if args.data_cache == "auto" else args.data_cache
    )
    if args.child_role == "ce":
        cfg = _cfg_for(args, distill_steps=0, distill_salt=0)
        pipeline.run_experiment(
            cfg, seed=args.seed, params_save=snap(-1), stop_after="distill",
            data_cache=cache,
        )
        print("== ce segment done", flush=True)
        return
    if args.child_role == "distill":
        # Salt = seg+1: segment i must see different basis minibatches
        # than segment i-1 (the minibatch key is positional — CLAUDE.md).
        cfg = _cfg_for(
            args, distill_steps=args.steps_per_segment, distill_salt=seg + 1,
        )
        res = pipeline.run_experiment(
            cfg, seed=args.seed, params_load=snap(seg - 1),
            params_save=snap(seg), stop_after="distill", data_cache=cache,
        )
        info = res.get("ft_info") or {}
        # Actual steps run (held-out early stop can truncate a segment;
        # the eval record reports the sum, not the nominal count).
        steps_run = (
            0 if res.get("ft_losses") is None else len(res["ft_losses"])
        )
        with open(steps_log, "a") as f:
            f.write(json.dumps({
                "segment": seg, "steps_run": steps_run,
                "ce_before": info.get("train_ce_before"),
                "ce_after": info.get("train_ce_after"),
                "best_step": info.get("best_step"),
            }) + "\n")
        print(
            f"== segment {seg} done: chain CE "
            f"{info.get('train_ce_before', float('nan')):.5f} -> "
            f"{info.get('train_ce_after', float('nan')):.5f} "
            f"({steps_run} steps run)",
            flush=True,
        )
        return
    # eval role: no further distillation, full generation/metrics tail.
    cfg = _cfg_for(args, distill_steps=0, distill_salt=0)
    t0 = time.perf_counter()
    res = pipeline.run_experiment(
        cfg, seed=args.seed, params_load=snap(seg), data_cache=cache,
    )
    actual_steps = None
    if os.path.exists(steps_log):
        with open(steps_log) as f:
            actual_steps = sum(
                json.loads(line).get("steps_run", 0) for line in f
            )
    rec = {
        "tag": f"{tag}_seg{seg + 1}x{args.steps_per_segment}",
        "epochs": args.epochs,
        "model": [args.embed, args.hidden, args.blocks, args.heads],
        "distill_steps": (seg + 1) * args.steps_per_segment,
        "distill_steps_actual": actual_steps,
        "max_bases": args.max_bases,
        "seed": args.seed,
        "mean_tv_to_target": round(res["mean_tv_to_target"], 5),
        "tv_shot_noise_floor": round(res["tv_shot_noise_floor"], 5),
        "meas_tv_to_target": round(res["meas_tv_to_target"], 5),
        "mean_marginal_error": round(res["mean_marginal_error"], 5),
        "classical_fidelity": round(res["classical_fidelity"], 5),
        "note": f"segmented distillation: {seg + 1} x "
                f"{args.steps_per_segment} steps",
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="dist_seg")
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--steps_per_segment", type=int, default=300,
                    help="300 steps at steps_per_call=5 = 60 dispatches "
                         "per process, the relay-proven loop length; the "
                         "two 1000-step single-process attempts wedged")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--shots_infer", type=int, default=5000)
    ap.add_argument("--shots_train", type=int, default=1024)
    ap.add_argument("--max_bases", type=int, default=300,
                    help="basis diversity: 300 shadow bases is the "
                         "measured plateau-breaking config (RESULTS.md)")
    ap.add_argument("--distill_basis_batch", type=int, default=16)
    ap.add_argument("--distill_steps_per_call", type=int, default=5)
    ap.add_argument("--distill_val", type=float, default=0.15)
    ap.add_argument("--hard_frac", type=float, default=0.0,
                    help="hard-basis mining (TrainConfig.chain_hard_frac): "
                    "excess-KL-weighted minibatch draw, re-measured at "
                    "each segment entry (see run_frontier_segments.py)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=os.path.join(REPO, "shadow_work"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, "examples/results_shadow.jsonl"))
    ap.add_argument("--start_segment", type=int, default=-1,
                    help="-1 = run the CE segment first; >=0 = resume the "
                         "distillation chain at this segment (CE snapshot "
                         "must exist)")
    ap.add_argument("--cooldown", type=int, default=60,
                    help="seconds between processes (relay client protocol)")
    ap.add_argument("--retries", type=int, default=2,
                    help="automatic relaunches of a failed segment (after "
                    "cooldown + health check) before giving up")
    ap.add_argument("--segment_timeout", type=int, default=0,
                    help="kill a segment child after this many seconds and "
                    "retry (0 = none); set to expected wall + >=15 min")
    ap.add_argument("--data_cache", default="auto",
                    help="npz cache for the generated data (same seed = "
                    "identical data; children reuse the first child's "
                    "~13-min simulation pass). 'auto' = "
                    "<workdir>/<tag>_data.npz; '' disables")
    ap.add_argument("--no_warm", action="store_true",
                    help="skip the program-class warm children (default: "
                    "warm_distill + warm_gen run in fresh processes before "
                    "the first segment — VERDICT r4 weak #1: the campaign "
                    "crashed at the first-ever cold shadow grid-CE "
                    "dispatch inside segment 0)")
    # Internal: child invocation.
    ap.add_argument("--child_role",
                    choices=["ce", "distill", "eval", "probe",
                             "warm_distill", "warm_gen", "datagen"],
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
        "--epochs", str(args.epochs),
        "--embed", str(args.embed), "--hidden", str(args.hidden),
        "--blocks", str(args.blocks), "--heads", str(args.heads),
        "--shots_infer", str(args.shots_infer),
        "--shots_train", str(args.shots_train),
        "--max_bases", str(args.max_bases),
        "--distill_basis_batch", str(args.distill_basis_batch),
        "--distill_steps_per_call", str(args.distill_steps_per_call),
        "--distill_val", str(args.distill_val),
        # hard_frac/data_cache must reach the children: the round-4
        # driver omitted hard_frac from base, so a parent --hard_frac
        # silently ran children at 0.0 (fixed round 5).
        "--hard_frac", str(args.hard_frac),
        "--data_cache", args.data_cache,
    ]
    probe = base + ["--child_role", "probe"]
    cache_path = (
        os.path.join(args.workdir, f"{args.tag}_data.npz")
        if args.data_cache == "auto" else args.data_cache
    )
    if cache_path and not os.path.exists(cache_path):
        # Fill the data cache HOST-SIDE before any child touches the
        # relay: a CPU-only child (no axon init, no device dispatches)
        # regenerates the identical data in ~75 s, and every TPU child
        # and retry then starts from the cache (round-5 addition).
        ok = run_with_retries(
            base + ["--child_role", "datagen"], probe, "datagen",
            retries=args.retries, cooldown=args.cooldown,
            timeout=args.segment_timeout, log_prefix="[shadow-segments]",
        )
        if not ok:
            print("[shadow-segments] datagen FAILED; aborting", flush=True)
            sys.exit(1)
    if not args.no_warm:
        # Program-class warming, each class a fresh process (see
        # _warm_child). Retried by the same relay protocol: a crash
        # mid-warm is cheap (no data gen) and the killed compile still
        # lands in the worker cache, so attempt 2 resumes past it.
        for wrole in ("warm_distill", "warm_gen"):
            ok = run_with_retries(
                base + ["--child_role", wrole], probe, wrole,
                retries=args.retries, cooldown=args.cooldown,
                timeout=args.segment_timeout,
                log_prefix="[shadow-segments]",
            )
            if not ok:
                print(f"[shadow-segments] {wrole} FAILED; aborting "
                      "(rerun with --no_warm to skip warming)", flush=True)
                sys.exit(1)
            time.sleep(args.cooldown)
    for seg in range(args.start_segment, args.segments + 1):
        if seg < 0:
            role, seg_arg = "ce", 0
        elif seg == args.segments:
            # The eval child warm-starts from the LAST distill segment.
            role, seg_arg = "eval", args.segments - 1
        else:
            role, seg_arg = "distill", seg
        cmd = base + ["--child_role", role, "--child_segment", str(seg_arg)]
        ok = run_with_retries(
            cmd, probe,
            f"{role} segment {seg}", retries=args.retries,
            cooldown=args.cooldown, timeout=args.segment_timeout,
            log_prefix="[shadow-segments]",
        )
        if not ok:
            print(f"[shadow-segments] segment {seg} FAILED after "
                  f"{args.retries} retries; resume with --start_segment "
                  f"{seg}", flush=True)
            sys.exit(1)
        time.sleep(args.cooldown)
    print("[shadow-segments] campaign complete", flush=True)


if __name__ == "__main__":
    main()
