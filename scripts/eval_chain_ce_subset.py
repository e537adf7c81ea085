"""Estimate a snapshot's full-grid chain CE on a random basis subset (CPU).

The full 3^N-basis chain CE at N=8 is a TPU-scale computation, but the
chain is independent per basis, so the mean CE over R uniformly-drawn
bases is an unbiased estimator with ~1/sqrt(R) error — cheap enough to
run on the host while the TPU is occupied by a campaign segment. Used to
A/B offline param transforms (e.g. ``scripts/average_params.py`` Polyak
averages of segment snapshots) against the live segment endpoints, and
to read every number as EXCESS KL over the target-entropy floor.

Usage (CPU, ~2 min per snapshot at N=8, R=96):
  env DDQST_CPU=1 PYTHONPATH=/root/repo python \
      scripts/eval_chain_ce_subset.py --tag ghz8_mle_hot \
      --target frontier_work/ghz8_mle_hot_target.npz --bases 96 \
      frontier_work/ghz8_mle_hot_seg2_params [more snapshots ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
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
    ap.add_argument("snaps", nargs="+", help="orbax params snapshot dirs")
    ap.add_argument("--tag", default="ghz8_mle_hot",
                    help="run_scaling_ghz experiment tag (model/schedule)")
    ap.add_argument("--target", required=True,
                    help="cached target npz ([3^N, 2^N] probs)")
    ap.add_argument("--bases", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=16,
                    help="bases per forward chunk (host-memory bound)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--lowest", action="store_true",
                    help="evaluate the --bases LOWEST-entropy target bases "
                    "instead of a random draw (the Z-sector, where the "
                    "GHZ coherence structure concentrates)")
    ap.add_argument("--no_z", action="store_true",
                    help="draw only from all-X/Y bases (no Z on any "
                    "qubit): the 2^N coherence-phase bases where the GHZ "
                    "interference pattern lives")
    args = ap.parse_args()

    from run_scaling_ghz import experiments

    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops.diffusion import chain_distribution
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
    rng = np.random.default_rng(args.seed)
    if args.lowest:
        ent_all = -np.sum(tgt * np.log(np.maximum(tgt, 1e-300)), axis=-1)
        bidx = np.sort(np.argsort(ent_all)[: args.bases])
    elif args.no_z:
        from ddqst_tpu.ops.pauli import all_basis_labels

        labels = all_basis_labels(n)
        pool = np.where((labels != 2).all(axis=1))[0]  # 0=X,1=Y: no Z
        take = min(args.bases, pool.size)
        bidx = np.sort(rng.choice(pool, size=take, replace=False))
    else:
        bidx = np.sort(
            rng.choice(tgt.shape[0], size=args.bases, replace=False))
    sub = tgt[bidx]
    floor = float(np.mean(
        -np.sum(sub * np.log(np.maximum(sub, 1e-300)), axis=-1)))
    print(f"[subset] {args.bases} bases, subset entropy floor {floor:.5f}",
          flush=True)

    sub_ent = -np.sum(sub * np.log(np.maximum(sub, 1e-300)), axis=-1)

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
        t0 = time.perf_counter()
        per_basis = []
        for i in range(0, args.bases, args.chunk):
            hi = min(i + args.chunk, args.bases)
            per_basis.append(np.asarray(ce_chunk(
                params, jnp.asarray(sub[i:hi], jnp.float32),
                jnp.asarray(bidx[i:hi], jnp.int32))))
        exc = np.concatenate(per_basis) - sub_ent  # per-basis KL(tgt||chain)
        q = np.percentile(exc, [50, 90, 99, 100])
        print(f"[subset] {snap}: CE {float(exc.mean()) + floor:.5f}  "
              f"excess {exc.mean():.5f}  per-basis KL q50/q90/q99/max "
              f"{q[0]:.4f}/{q[1]:.4f}/{q[2]:.4f}/{q[3]:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
