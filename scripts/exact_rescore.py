"""Zero-shot-noise re-score of a model snapshot (exact-distribution eval).

The standard eval tail (reference protocol,
``RQC_dataset_building_phase/evaluate.py:70-91``) generates ``shots``
bitstrings per basis from the model and feeds the histogram to the
estimator — injecting a multinomial noise floor that, at the GHZ-8
operating point (3,000 samples x 6,561 bases), is a candidate explanation
for part of the residual fidelity deficit (VERDICT r4 missing #3).

This script re-scores a distilled snapshot with the eval noise REMOVED:
:func:`ddqst_tpu.ops.diffusion.chain_distribution_all_bases` computes the
sampler's exact output distribution per basis (the infinite-shot limit,
chunked at the relay-proven grid size), and ``dist * shots`` enters the
estimator as fractional counts. ``--also_sampled`` additionally draws one
multinomial realisation from the same distributions and scores it through
the identical estimator — the (sampled - exact) gap is the eval tail's
own noise contribution for THIS model, separating model deficit from
eval-floor deficit.

Usage (TPU, RQC-8 final segment):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/exact_rescore.py \
      --tag rqc8_mle_hot --params frontier_work/rqc8_mle_hot_seg2_params \
      --also_sampled
CPU smoke test:
  env DDQST_CPU=1 python scripts/exact_rescore.py --tag cpu_tiny \
      --params <snapshot>
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
    ap.add_argument("--tag", required=True,
                    help="experiment tag (run_scaling_ghz.experiments)")
    ap.add_argument("--params", required=True,
                    help="orbax params snapshot dir (a campaign segment)")
    ap.add_argument("--shots", type=int, default=0,
                    help="fractional-count scale (0 = cfg shots_infer); "
                    "the MLE fixed point is scale-invariant, so this only "
                    "matters for --also_sampled's multinomial draw")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--also_sampled", action="store_true",
                    help="also score one multinomial draw from the exact "
                    "distributions through the same estimator (the "
                    "sampled-eval A/B at this model)")
    ap.add_argument("--max_rows", type=int, default=1 << 14,
                    help="grid rows per chain-distribution dispatch "
                    "(16,384 = the relay-proven N=8 distillation grid)")
    ap.add_argument("--out",
                    default=os.path.join(
                        REPO, "examples/results_exact_rescore.jsonl"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from run_scaling_ghz import experiments
    from ddqst_tpu import train as training
    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops import diffusion as diff
    from ddqst_tpu.ops import metrics as M
    from ddqst_tpu.ops import mle, pauli
    from ddqst_tpu.ops.complexlib import from_complex
    from ddqst_tpu.ops.schedules import make_schedule
    from ddqst_tpu.qsim import states

    cfg = next(c for t, c, _ in experiments() if t == args.tag)
    n = cfg.data.num_qubits
    shots = args.shots or cfg.data.shots_infer
    schedule = make_schedule(cfg.diffusion.schedule,
                             cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, n, cfg.diffusion.num_timesteps)
    template = training.create_state(jax.random.key(0), model, cfg.train, n)
    # Import after first device use (CLAUDE.md: orbax-before-device-init
    # can deadlock the axon plugin).
    from ddqst_tpu.utils import checkpoint as ckpt

    params = ckpt.restore_params(os.path.abspath(args.params),
                                 template.params)

    # Clean fidelity target: prep_circuit consumes the seed rng exactly as
    # run_experiment's generate_training_data does, so the circuit (and
    # for RQC, the state) is identical to the campaign's.
    rng = np.random.default_rng(args.seed)
    circuit = states.prep_circuit(
        cfg.data.state_type, n, cfg.data.rqc_depth, rng
    )
    target = from_complex(np.asarray(states.circuit_statevector(circuit)))

    t0 = time.time()
    dist = diff.chain_distribution_all_bases(
        model.apply, params, n, schedule, exact=cfg.diffusion.exact,
        max_rows=args.max_rows,
    )
    dist_np = np.asarray(dist, np.float64)
    dist_np /= dist_np.sum(-1, keepdims=True)
    t_dist = time.time() - t0
    print(f"[exact_rescore] chain distribution over {dist_np.shape[0]} "
          f"bases [{t_dist:.1f}s]", flush=True)

    def score(counts):
        c = jnp.asarray(counts, jnp.float32)
        if cfg.data.reconstruction == "mle":
            rho = mle.make_mle(n, None, readout_p=0.0)(c)
        else:
            rho = pauli.make_counts_inverter(n, None)(c)
        fid = float(M.state_fidelity(target, rho))
        pur, vn, ent = (float(x) for x in M.get_metrics(rho, n))
        td = float(M.trace_distance(target, rho))
        return fid, pur, vn, td

    rows = []
    t0 = time.time()
    fid, pur, vn, td = score(dist_np * shots)
    rows.append({
        "tag": args.tag, "kind": "exact_dist", "params": args.params,
        "num_qubits": n, "shots_per_basis": shots,
        "fidelity": round(fid, 5), "purity": round(pur, 5),
        "vn_entropy": round(vn, 5), "trace_distance": round(td, 5),
        "dist_wall_s": round(t_dist, 1),
        "wall_s": round(time.time() - t0, 1),
    })
    print(f"[exact_rescore] {json.dumps(rows[-1])}", flush=True)

    if args.also_sampled:
        rng_s = np.random.default_rng(args.seed)
        sampled = np.stack([
            rng_s.multinomial(shots, p) for p in dist_np
        ]).astype(np.float32)
        t0 = time.time()
        fid, pur, vn, td = score(sampled)
        rows.append({
            "tag": args.tag, "kind": "sampled_from_dist",
            "params": args.params, "num_qubits": n,
            "shots_per_basis": shots,
            "fidelity": round(fid, 5), "purity": round(pur, 5),
            "vn_entropy": round(vn, 5), "trace_distance": round(td, 5),
            "wall_s": round(time.time() - t0, 1),
        })
        print(f"[exact_rescore] {json.dumps(rows[-1])}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
