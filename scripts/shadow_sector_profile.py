"""Per-basis excess-KL profile of N=10 shadow snapshots (CPU, offline).

VERDICT r4 next-#6: nobody has measured whether the N=10 shadow-route
residual CONCENTRATES in a basis subset the way GHZ-8's did (256 all-X/Y
coherence bases carrying ~100:1 the mean excess — the structure that made
hard-basis mining work). This profiler reads the campaign's data cache
(``run_shadow_segments --data_cache``) and any number of segment
snapshots, computes the exact chain distribution for a basis subset on
the HOST while the TPU runs the campaign, and writes per-basis rows:

- ``kl_clean``  — KL(clean Born probs || chain): the true per-basis
  residual, zero-shot-noise (the data cache stores ``clean_probs``).
- ``kl_counts`` — CE(empirical counts, chain) - H(counts): what the
  distillation loss sees (shot-noise-inflated; the mining weight).
- ``n_z`` — number of Z labels in the basis (sector coordinate: GHZ
  concentration lived at n_z=0).

Usage (CPU, ~10-25 min per snapshot at 48 bases):
  env DDQST_CPU=1 PYTHONPATH=/root/repo python \
      scripts/shadow_sector_profile.py \
      --data shadow_work/dist_seg_data.npz \
      shadow_work/dist_seg_seg3_params --bases 48 \
      --out examples/shadow_sector_profile.jsonl
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
sys.path.insert(0, REPO)

if os.environ.get("DDQST_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _xb._topology_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snaps", nargs="+", help="orbax params snapshot dirs")
    ap.add_argument("--data", required=True,
                    help="campaign data cache npz (run_shadow_segments "
                    "--data_cache)")
    ap.add_argument("--bases", type=int, default=48,
                    help="random basis subset size (0 = all cached bases)")
    ap.add_argument("--chunk", type=int, default=8,
                    help="bases per forward chunk (host-memory bound)")
    ap.add_argument("--val_fraction", type=float, default=0.15,
                    help="held-out split the campaign used (kl_counts is "
                    "computed on the TRAIN share, like the distill loss)")
    ap.add_argument("--seed", type=int, default=7)
    # Campaign model dims (run_shadow_segments defaults).
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--schedule", default="cosine")
    ap.add_argument("--out",
                    default=os.path.join(
                        REPO, "examples/shadow_sector_profile.jsonl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddqst_tpu import pipeline
    from ddqst_tpu import train as training
    from ddqst_tpu.config import ModelConfig, TrainConfig
    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops import diffusion as diff
    from ddqst_tpu.ops import mle
    from ddqst_tpu.ops.schedules import make_schedule

    data = pipeline.load_data_cache(args.data)
    labels = np.asarray(data.basis_labels)
    clean = np.asarray(data.clean_probs, np.float64)
    clean /= clean.sum(-1, keepdims=True)
    bits = np.asarray(data.bits)
    b_all, s, n = bits.shape
    s_val = min(max(int(round(args.val_fraction * s)), 1), s - 1)
    counts = np.asarray(mle.bits_to_counts(
        jnp.asarray(bits[:, : s - s_val])
    ), np.float64)
    freqs = counts / counts.sum(-1, keepdims=True)

    rng = np.random.default_rng(args.seed)
    if args.bases and args.bases < b_all:
        sel = np.sort(rng.choice(b_all, size=args.bases, replace=False))
    else:
        sel = np.arange(b_all)

    schedule = make_schedule(args.schedule, args.timesteps)
    mcfg = ModelConfig(
        arch="transformer", input_encoding="token",
        embed_dim=args.embed, hidden_dim=args.hidden,
        num_blocks=args.blocks, num_heads=args.heads,
    )
    model = build_model(mcfg, n, args.timesteps)
    template = training.create_state(
        jax.random.key(0), model, TrainConfig(), n
    )
    from ddqst_tpu.utils import checkpoint as ckpt

    def kl_rows(p_rows, q_rows):
        # KL(p || q) per row; q floored like the distillation loss.
        q = np.maximum(q_rows, 1e-12)
        p = np.maximum(p_rows, 0.0)
        return np.where(
            p > 0, p * (np.log(np.maximum(p, 1e-300)) - np.log(q)), 0.0
        ).sum(-1)

    for snap in args.snaps:
        params = ckpt.restore_params(os.path.abspath(snap), template.params)
        t0 = time.time()
        dist = np.zeros((len(sel), 2**n), np.float64)
        for i in range(0, len(sel), args.chunk):
            idx = sel[i : i + args.chunk]
            lab = jnp.asarray(labels[idx], jnp.int32)
            d = diff.chain_distribution(
                lambda x, t, b: model.apply({"params": params}, x, t, b),
                n, schedule, False, basis_labels=lab,
            )
            dist[i : i + len(idx)] = np.asarray(d, np.float64)
            print(f"[profile] {snap}: {i + len(idx)}/{len(sel)} bases "
                  f"[{time.time() - t0:.0f}s]", flush=True)
        dist /= dist.sum(-1, keepdims=True)
        klc = kl_rows(clean[sel], dist)
        ent = -np.where(freqs[sel] > 0,
                        freqs[sel] * np.log(np.maximum(freqs[sel], 1e-300)),
                        0.0).sum(-1)
        ce = -(freqs[sel] * np.log(np.maximum(dist, 1e-12))).sum(-1)
        kln = ce - ent
        n_z = (labels[sel] == 2).sum(-1)
        with open(args.out, "a") as f:
            for j, bi in enumerate(sel):
                f.write(json.dumps({
                    "snap": snap, "basis": int(bi), "n_z": int(n_z[j]),
                    "kl_clean": round(float(klc[j]), 6),
                    "kl_counts": round(float(kln[j]), 6),
                }) + "\n")
        qs = np.quantile(klc, [0.5, 0.9, 0.99])
        top = sel[np.argsort(klc)[-5:]][::-1]
        print(
            f"[profile] {snap}: mean KL(clean||chain) {klc.mean():.5f} "
            f"(median {qs[0]:.5f}, p90 {qs[1]:.5f}, p99 {qs[2]:.5f}); "
            f"top-5 bases {top.tolist()}; "
            f"share in top 10% of bases "
            f"{np.sort(klc)[-max(1, len(sel) // 10):].sum() / max(klc.sum(), 1e-12):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
