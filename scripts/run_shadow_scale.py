"""N=10 shadow-transformer experiments (BASELINE config-5 scale).

Runs the ``shadow_transformer`` preset (RQC depth 8 at N=10, 100 shadow
bases x 1024 shots — the scale regime of reference
``RQC_dataset_building_phase/build_dataset.py:69-87``) with configurable
training budget / model size, and records the exact-Born-probability
metrics produced by ``pipeline._run_shadow_experiment``.

Context (RESULTS.md): at this scale the three reference points are
  - tv_shot_noise_floor ~ 0.118  (ideal sampler at 5,000 generated shots)
  - meas_tv_to_target   ~ 0.264  (the noisy 1024-shot training data itself)
  - round-2 initial model TV 0.396 (150 epochs) — i.e. the model underfits:
    even memorising the empirical counts would score ~0.29.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_shadow_scale.py \
      --tag long --epochs 500 --embed 256 --hidden 1024 --blocks 6 \
      [--out examples/results_shadow.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def make_cfg(
    tag: str, *, epochs: int = 150, embed: int = 128, hidden: int = 512,
    blocks: int = 4, heads: int = 4, ema: float = 0.0, lr: float = 1e-3,
    batch: int = 1024, shots_infer: int = 5000, shots_train: int = 1024,
    max_bases: int = 100, sampler: str | None = None, mitigate: bool = False,
    distill_steps: int = 0, distill_lr: float = 1e-3,
    distill_basis_batch: int = 16, distill_steps_per_call: int = 5,
    distill_val: float = 0.15, distill_salt: int = 0,
    distill_hard_frac: float = 0.0,
):
    """The shadow_transformer preset with the study's knobs applied.

    Shared by the one-shot runner below and the segmented campaign driver
    (``run_shadow_segments.py``) so both build byte-identical configs —
    same seed + same data flags → identical data, which is what makes
    orbax warm starts resume exactly (CLAUDE.md N=10 warm-start protocol).
    """
    from ddqst_tpu.config import get_preset

    base = get_preset("shadow_transformer")
    return base.replace(
        name=f"shadow_{tag}",
        diffusion=base.diffusion.__class__(
            num_timesteps=100, schedule="cosine",
            sampler=sampler or base.diffusion.sampler,
        ),
        model=base.model.__class__(
            arch="transformer", input_encoding="token",
            embed_dim=embed, hidden_dim=hidden,
            num_blocks=blocks, num_heads=heads,
        ),
        train=base.train.__class__(
            batch_size=batch, learning_rate=lr, optimizer="adam",
            num_epochs=epochs, lr_schedule="cosine",
            ema_decay=ema, log_every=0, eval_every=0,
            chain_finetune_steps=distill_steps,
            chain_lr=distill_lr,
            chain_basis_batch=distill_basis_batch,
            chain_steps_per_call=distill_steps_per_call,
            chain_val_fraction=distill_val,
            chain_key_salt=distill_salt,
            chain_hard_frac=distill_hard_frac,
        ),
        data=base.data.__class__(
            num_qubits=10, state_type="rqc", noise_type="readout",
            shots_train=shots_train, shots_infer=shots_infer,
            rqc_depth=8, max_bases=max_bases,
            mitigate_readout=mitigate,
            mitigate_train_data=mitigate,
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--ema", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--shots_infer", type=int, default=5000)
    ap.add_argument("--shots_train", type=int, default=1024)
    ap.add_argument("--max_bases", type=int, default=100,
                    help="shadow-basis count (3^10 = 59,049 total)")
    ap.add_argument("--sampler", default=None,
                    choices=["auto", "exact", "renoise"],
                    help="reverse-sampler rule (default: preset's, renoise)")
    ap.add_argument("--mitigate", action="store_true",
                    help="train on readout-mitigated counts")
    ap.add_argument("--distill_steps", type=int, default=0,
                    help="shadow-scale exact-chain distillation steps "
                         "(2^10-state chain over the sampled bases)")
    ap.add_argument("--distill_lr", type=float, default=1e-3)
    ap.add_argument("--distill_basis_batch", type=int, default=16)
    ap.add_argument("--distill_steps_per_call", type=int, default=5)
    ap.add_argument("--distill_val", type=float, default=0.15,
                    help="held-out shot fraction for automated step "
                         "selection (0 = run all steps)")
    ap.add_argument("--distill_salt", type=int, default=0,
                    help="distillation PRNG salt — set a fresh value on "
                         "each warm-started continuation so basis "
                         "minibatches are not replayed")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="examples/results_shadow.jsonl")
    ap.add_argument("--params_save", default="",
                    help="orbax path to save post-distillation params")
    ap.add_argument("--params_load", default="",
                    help="orbax path to warm-start from (skips CE "
                         "training; use the same seed/data flags as the "
                         "run that saved them)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    from ddqst_tpu import pipeline

    cfg = make_cfg(
        args.tag, epochs=args.epochs, embed=args.embed, hidden=args.hidden,
        blocks=args.blocks, heads=args.heads, ema=args.ema, lr=args.lr,
        batch=args.batch, shots_infer=args.shots_infer,
        shots_train=args.shots_train, max_bases=args.max_bases,
        sampler=args.sampler, mitigate=args.mitigate,
        distill_steps=args.distill_steps, distill_lr=args.distill_lr,
        distill_basis_batch=args.distill_basis_batch,
        distill_steps_per_call=args.distill_steps_per_call,
        distill_val=args.distill_val, distill_salt=args.distill_salt,
    )
    t0 = time.perf_counter()
    res = pipeline.run_experiment(
        cfg, seed=args.seed,
        params_load=args.params_load, params_save=args.params_save,
    )
    rec = {
        "tag": args.tag,
        "epochs": args.epochs,
        "model": [args.embed, args.hidden, args.blocks, args.heads],
        "distill_steps": args.distill_steps,
        "ema": args.ema,
        "sampler": cfg.diffusion.sampler,
        "mitigate": args.mitigate,
        "seed": args.seed,
        "shots_infer": args.shots_infer,
        "shots_train": args.shots_train,
        "max_bases": args.max_bases,
        "mean_tv_to_target": round(res["mean_tv_to_target"], 5),
        "tv_shot_noise_floor": round(res["tv_shot_noise_floor"], 5),
        "meas_tv_to_target": round(res["meas_tv_to_target"], 5),
        "mean_marginal_error": round(res["mean_marginal_error"], 5),
        "classical_fidelity": round(res["classical_fidelity"], 5),
        "z_bias": res["z_bias"],
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    if "chain_info" in res:
        ci = res["chain_info"]
        rec["chain_ce_before"] = round(float(ci["train_ce_before"]), 5)
        rec["chain_ce_after"] = round(float(ci["train_ce_after"]), 5)
        if "val_history" in ci:
            rec["chain_best_step"] = int(ci["best_step"])
            rec["chain_val_history"] = [
                [int(s), round(float(c), 5)] for s, c in ci["val_history"]
            ]
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
