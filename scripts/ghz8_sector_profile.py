"""Per-sector excess-KL profile of GHZ-8 segment snapshots (CPU).

Writes one JSONL row per (snapshot, sector): the chain's mean excess KL
over the cached MLE target on three basis sectors —

  random   : 48 uniformly-drawn bases (the bulk; converged by segment 1)
  low_ent  : the 48 lowest-entropy bases (Z-sector populations)
  xy       : 48 all-X/Y bases (the coherence-phase interference sector,
             where the round-4 diagnosis found the entire residual:
             ~0.5 nats/basis while the other sectors read ~2e-4)

This is the quantitative record of the hard-basis-mining mechanism: the
xy row should collapse after the first ``--hard_frac`` segment while the
other sectors stay at their converged values.

Usage (CPU, ~9 min for two snapshots):
  env DDQST_CPU=1 PYTHONPATH=/root/repo:/root/repo/scripts python \
      scripts/ghz8_sector_profile.py frontier_work/ghz8_mle_hot_seg3_params \
      frontier_work/ghz8_mle_hot_seg4_params
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

if os.environ.get("DDQST_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _xb._topology_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snaps", nargs="+")
    ap.add_argument("--tag", default="ghz8_mle_hot")
    ap.add_argument("--target",
                    default=os.path.join(
                        REPO, "frontier_work/ghz8_mle_hot_target.npz"))
    ap.add_argument("--bases", type=int, default=48)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out",
                    default=os.path.join(
                        REPO, "examples/ghz8_sector_excess.jsonl"))
    args = ap.parse_args()

    from run_scaling_ghz import experiments

    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops.diffusion import chain_distribution
    from ddqst_tpu.ops.pauli import all_basis_labels
    from ddqst_tpu.ops.schedules import make_schedule
    from ddqst_tpu.utils import checkpoint as ckpt

    _, cfg, _ = next((t, c, n) for t, c, n in experiments()
                     if t == args.tag)
    n = cfg.data.num_qubits
    schedule = make_schedule(
        cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, n, cfg.diffusion.num_timesteps)

    tgt = np.load(args.target)["target"].astype(np.float64)
    tgt = tgt / tgt.sum(-1, keepdims=True)
    ent_all = -np.sum(tgt * np.log(np.maximum(tgt, 1e-300)), axis=-1)
    rng = np.random.default_rng(args.seed)
    labels = all_basis_labels(n)
    xy_pool = np.where((labels != 2).all(axis=1))[0]
    sectors = {
        "random": np.sort(rng.choice(
            tgt.shape[0], size=args.bases, replace=False)),
        "low_ent": np.sort(np.argsort(ent_all)[: args.bases]),
        "xy": np.sort(rng.choice(
            xy_pool, size=min(args.bases, xy_pool.size), replace=False)),
    }

    @jax.jit
    def ce_chunk(params, tgt_chunk, bchunk):
        def denoise_fn(x, t, b):
            return model.apply({"params": params}, x, t, b)

        dist = chain_distribution(
            denoise_fn, n, schedule, cfg.diffusion.exact, basis_idx=bchunk)
        return -jnp.sum(
            tgt_chunk * jnp.log(jnp.maximum(dist, 1e-12)), axis=-1)

    for snap in args.snaps:
        params = ckpt.restore_params(snap, None)
        for sector, bidx in sectors.items():
            sub = tgt[bidx]
            t0 = time.perf_counter()
            rows = []
            for i in range(0, len(bidx), args.chunk):
                hi = min(i + args.chunk, len(bidx))
                rows.append(np.asarray(ce_chunk(
                    params, jnp.asarray(sub[i:hi], jnp.float32),
                    jnp.asarray(bidx[i:hi], jnp.int32))))
            exc = np.concatenate(rows) - (
                -np.sum(sub * np.log(np.maximum(sub, 1e-300)), axis=-1))
            rec = {
                "snap": os.path.basename(snap), "sector": sector,
                "bases": int(len(bidx)),
                "excess_mean": round(float(exc.mean()), 6),
                "excess_q50": round(float(np.percentile(exc, 50)), 6),
                "excess_max": round(float(exc.max()), 6),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
