"""Regenerate a campaign's MLE distillation-target npz (and data cache).

frontier_work/ is deliberately outside git (params snapshots are tens of
MB), so a container reset deletes it — round 5 found the GHZ-8 target npz
and segment snapshots gone. The TARGET is cheap to reproduce: the same
cfg + seed regenerate identical measurement data (the framework's warm-
start invariant), and the MLE projection of those counts is deterministic.
This script reruns exactly the target construction from
``pipeline.run_experiment``'s distill branch (MLE on the raw counts →
factored Born probs over all bases) and writes the same
``{tag}_target.npz`` a campaign's segment 0 would, plus the data cache.

Model snapshots are NOT recoverable this way (they embody hours of
distillation); campaigns should be re-scored in the same round they run.

Usage (TPU, ~40 min at N=8: data gen + one full MLE solve):
  env PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/make_mle_target.py --tag ghz8_mle_hot
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--tag", default="ghz8_mle_hot")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=os.path.join(REPO, "frontier_work"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from run_scaling_ghz import experiments
    from ddqst_tpu import pipeline
    from ddqst_tpu.ops import mle

    cfg = next(c for t, c, _ in experiments() if t == args.tag)
    n = cfg.data.num_qubits
    os.makedirs(args.workdir, exist_ok=True)
    dcache = os.path.join(args.workdir, f"{args.tag}_data.npz")
    tcache = os.path.join(args.workdir, f"{args.tag}_target.npz")

    t0 = time.time()
    if os.path.exists(dcache):
        data = pipeline.load_data_cache(dcache)
        print(f"[make_target] data cache hit ({dcache})", flush=True)
    else:
        key = jax.random.key(args.seed)
        rng = np.random.default_rng(args.seed)
        k_data, _, _ = jax.random.split(key, 3)
        data = pipeline.generate_training_data(cfg, k_data, rng)
        pipeline.save_data_cache(dcache, data)
        print(f"[make_target] generated + cached data "
              f"[{time.time() - t0:.1f}s]", flush=True)

    # Mirror pipeline.run_experiment's chain_target='mle' construction
    # (val_fraction=0 for the frontier configs -> full counts).
    vf = cfg.train.chain_val_fraction
    if vf > 0:
        s = data.bits.shape[1]
        s_val = min(max(int(round(vf * s)), 1), s - 1)
        counts = mle.bits_to_counts(data.bits[:, : s - s_val])
    else:
        counts = mle.bits_to_counts(data.bits)
    t0 = time.time()
    rec = mle.make_mle(n, data.basis_labels)
    rho_t = rec(jnp.asarray(counts, jnp.float32))
    print(f"[make_target] MLE solve done [{time.time() - t0:.1f}s]",
          flush=True)
    t0 = time.time()
    d_t = 2**n
    if data.basis_labels.shape[0] * d_t * d_t > mle._FACTORED_BLOCK_ELEMS:
        tgt = mle.factored_born_probs(rho_t, data.basis_labels)
    else:
        from ddqst_tpu.ops.complexlib import CArray, from_complex
        from ddqst_tpu.qsim import measure

        rots = from_complex(measure.rotation_unitaries(data.basis_labels))
        tgt = measure.batched_probs_mixed(
            CArray(rho_t.re[None], rho_t.im[None]), rots
        )[0]
    np.savez_compressed(tcache, target=np.asarray(tgt))
    print(f"[make_target] wrote {tcache} shape={np.asarray(tgt).shape} "
          f"[{time.time() - t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
