"""RQC-3 information ceiling + ≥0.99 generative campaign (VERDICT r2 #1).

BASELINE.md's last unmet fidelity target: reconstruct an N=3 RQC state to
≥0.99 *through the generative pipeline*. Round 2 measured 0.98228 at 20k
shots/basis with a plausible-but-unproven "data ceiling" argument. This
script settles it from both ends:

``--ceiling`` (CPU-safe, no model): measure the true information ceiling.
  MLE on the EXACT noisy Born distribution (zero shot noise) bounds what
  any estimator can extract at infinite shots; MLE on sampled counts at
  5k/20k/50k (3 seeds) gives the practical ceiling per budget. Matches the
  protocol of ``/root/reference/versions/multi_qubit_any_state/
  main.py:150-177`` + ``data_gen.py:208-242`` (single RQC, all 27 bases).

``--run`` (TPU): the generative campaign. Quality stack (cosine, renoise,
  mitigated training, MLE reconstruction) + automated distillation
  temperature (held-out step selection) + the physics-constrained
  ``chain_target='mle'`` (distill against the Born distribution of the
  MLE projection of the training counts — bakes the cross-basis PSD
  constraint, the measured gap to MLE-on-raw, into the chain itself).

Usage:
  python scripts/run_rqc3_ceiling.py --ceiling [--out examples/rqc3_ceiling.jsonl]
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_rqc3_ceiling.py \
      --run [--only TAG] [--out examples/results_rqc3_99.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noisy_setup(seed: int, noise_type: str = "readout", depth: int = 5):
    """Reproduce run_experiment's data-generation state for this seed."""
    import numpy as np

    from ddqst_tpu.ops import pauli
    from ddqst_tpu.ops.complexlib import from_complex
    from ddqst_tpu.qsim import measure, noise, states

    rng = np.random.default_rng(seed)
    circuit = states.prep_circuit("rqc", 3, depth, rng)
    target = states.circuit_statevector(circuit)
    ncfg = noise.get_noise_config(noise_type)
    kind, state = noise.noisy_state(circuit, ncfg)
    labels = pauli.all_basis_labels(3)
    rots = from_complex(measure.rotation_unitaries(labels))
    if kind == "pure":
        probs = measure.batched_probs_pure(from_complex(state[None]), rots)[0]
    else:
        probs = measure.batched_probs_mixed(from_complex(state[None]), rots)[0]
    probs = noise.apply_readout_to_probs(probs, 3, ncfg.readout_p)
    return target, np.asarray(probs, np.float64), ncfg


def run_ceiling(out_path: str):
    import jax.numpy as jnp
    import numpy as np

    from ddqst_tpu.ops import metrics as M
    from ddqst_tpu.ops import mle, pauli

    rows = []

    def emit(rec):
        rows.append(rec)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    for seed in range(3):
        target, probs, ncfg = _noisy_setup(seed)
        p = ncfg.readout_p
        rec_mle = mle.make_mle(3, readout_p=p)
        rec_mle0 = mle.make_mle(3)
        inv = pauli.make_counts_inverter(3, readout_p=p)
        # Zero-shot-noise ceiling: estimators on the EXACT noisy distribution.
        exact = jnp.asarray(probs, jnp.float32)
        fid_mle_exact = float(M.state_fidelity(jnp.asarray(target), rec_mle(exact)))
        fid_mle0_exact = float(
            M.state_fidelity(jnp.asarray(target), rec_mle0(exact))
        )
        fid_inv_exact = float(M.state_fidelity(jnp.asarray(target), inv(exact)))
        emit({
            "mode": "exact_distribution", "seed": seed,
            "mle_noise_aware": round(fid_mle_exact, 6),
            "mle_plain": round(fid_mle0_exact, 6),
            "linear_mitigated": round(fid_inv_exact, 6),
        })
        # Practical ceiling per shot budget: noise-aware MLE on sampled counts.
        rng = np.random.default_rng(1000 + seed)
        for shots in (5000, 20000, 50000):
            counts = np.stack(
                [rng.multinomial(shots, pr / pr.sum()) for pr in probs]
            ).astype(np.float32)
            fid = float(
                M.state_fidelity(jnp.asarray(target), rec_mle(jnp.asarray(counts)))
            )
            emit({
                "mode": "sampled", "seed": seed, "shots": shots,
                "mle_noise_aware": round(fid, 6),
            })
    return rows


def experiments():
    from run_parity_suite import quality_cfg

    # Automated recipe everywhere: ample step budget, held-out step
    # selection picks the temperature (VERDICT r2 #2).
    def auto(cfg, target):
        return cfg.replace(train=cfg.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=300, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=800, chain_lr=3e-4,
            chain_val_fraction=0.15, chain_val_patience=4,
            chain_target=target,
        ))

    c20 = quality_cfg("rqc3_20k", num_qubits=3, state="rqc",
                      shots_train=20000, shots_infer=50000, noise="readout")
    yield ("rqc3_20k_mle_target", auto(c20, "mle"),
           "RQC-3 20k shots, auto distillation, MLE-projected target")
    yield ("rqc3_20k_counts", auto(c20.replace(name="rqc3_20k_counts"),
                                   "counts"),
           "RQC-3 20k shots, auto distillation, counts target (control)")
    c50 = quality_cfg("rqc3_50k", num_qubits=3, state="rqc",
                      shots_train=50000, shots_infer=50000, noise="readout")
    yield ("rqc3_50k_mle_target", auto(c50, "mle"),
           "RQC-3 50k shots, auto distillation, MLE-projected target")


def run_campaign(out_path: str, only: str, seed: int):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    from ddqst_tpu import pipeline

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as f:
            done = {json.loads(line)["tag"] for line in f}
    for tag, cfg, note in experiments():
        full_tag = f"{tag}_s{seed}" if seed else tag
        if (only and only != tag) or full_tag in done:
            continue
        t0 = time.perf_counter()
        res = pipeline.run_experiment(cfg, seed=seed)
        rec = {
            "tag": full_tag,
            "fidelity": round(res["fidelity"], 5),
            "raw_fidelity": round(res["raw_fidelity"], 5),
            "raw_fidelity_mitigated": (
                None if res.get("raw_fidelity_mitigated") is None
                else round(res["raw_fidelity_mitigated"], 5)
            ),
            "note": note,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"== {full_tag}: fid={rec['fidelity']} raw={rec['raw_fidelity']} "
              f"mle={rec['raw_fidelity_mitigated']} [{rec['wall_s']}s]",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.ceiling:
        run_ceiling(args.out or "examples/rqc3_ceiling.jsonl")
    if args.run:
        run_campaign(args.out or "examples/results_rqc3_99.jsonl",
                     args.only, args.seed)


if __name__ == "__main__":
    main()
