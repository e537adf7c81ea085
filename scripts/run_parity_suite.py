"""Full-budget parity + demonstration suite (run on the TPU).

Produces the measured numbers VERDICT round 1 asked for:

1. Phase-1 parity: 1-qubit |+> at the notebook budget (1024 shots/basis,
   ~200 epochs) — reference 0.918919 (notes.pdf Table 2) / 0.909180
   (notebook cell 16), classical StateTomography baseline 0.917969.
2. Phase-2 parity: Bell N=2 at 5,000 train shots / 10,000 synthetic per
   basis — reference 0.95565 (notes.pdf Table 3).
3. Phase-2 parity: GHZ N=3, same budget — reference 0.87092 (Table 3).
4. Phase-3 noise sweep: one RQC (N=2, depth 5) through all five noise
   models at the reference budget (``multi_qubit_any_state/main.py:57-84``).
5. RQC-3 quality demonstration: the phase-3 single-RQC protocol
   (``data_gen.py:208-242``) at N=3 full budget with the framework's
   quality stack (mitigated training + renoise + MLE + exact-chain
   distillation), with the raw-inversion control alongside.

"Parity mode" = reference-faithful settings: linear schedule + renoise
sampler, plain linear inversion, no mitigation, no distillation.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_parity_suite.py \
      [--out results_parity.jsonl] [--only TAG]

Appends one JSON line per experiment to --out (rerun-safe: finished tags
are skipped), then prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parity_cfg(name, *, num_qubits, state, shots_train, shots_infer,
               noise="readout", epochs=300, batch=256, embed=64, hidden=512,
               blocks=4, depth=5, arch="film_mlp", schedule="linear",
               lr=1e-4, optimizer="adamw"):
    from ddqst_tpu.config import get_preset

    base = get_preset("special_states")
    return base.replace(
        name=name,
        model=base.model.__class__(arch=arch, embed_dim=embed,
                                   hidden_dim=hidden, num_blocks=blocks),
        diffusion=base.diffusion.__class__(num_timesteps=100,
                                           schedule=schedule,
                                           sampler="renoise"),
        train=base.train.__class__(batch_size=batch, learning_rate=lr,
                                   optimizer=optimizer, num_epochs=epochs,
                                   log_every=0, eval_every=0),
        data=base.data.__class__(num_qubits=num_qubits, state_type=state,
                                 noise_type=noise, shots_train=shots_train,
                                 shots_infer=shots_infer, rqc_depth=depth),
    )


def quality_cfg(name, *, num_qubits, state, shots_train, shots_infer,
                noise="readout", depth=5, epochs=300):
    from ddqst_tpu.config import get_preset

    base = get_preset("rqc")
    return base.replace(
        name=name,
        diffusion=base.diffusion.__class__(num_timesteps=100,
                                           schedule="cosine",
                                           sampler="renoise"),
        train=base.train.__class__(batch_size=1024, learning_rate=1e-3,
                                   optimizer="adam", num_epochs=epochs,
                                   lr_schedule="cosine", log_every=0,
                                   eval_every=0, chain_finetune_steps=400,
                                   chain_lr=3e-4),
        data=base.data.__class__(num_qubits=num_qubits, state_type=state,
                                 noise_type=noise, shots_train=shots_train,
                                 shots_infer=shots_infer, rqc_depth=depth,
                                 mitigate_readout=True,
                                 mitigate_train_data=True,
                                 reconstruction="mle"),
    )


def experiments():
    # (tag, cfg, reference_value, note)
    yield ("phase1_plus", parity_cfg(
        "phase1_plus", num_qubits=1, state="plus", shots_train=1024,
        shots_infer=10000, noise="readout", epochs=200, batch=512,
        embed=64, hidden=256, blocks=2,
    ), 0.918919, "notes.pdf Table 2 (UpgradedMLP 202 epochs); classical 0.917969")
    # Notebook two-model comparison (cells 6/12): the exact SimpleMLP and
    # UpgradedMLP architectures + the notebook's own p_stay=linspace(1,0.5)
    # schedule, Adam 1e-3, synthetic samples = training shots (1024).
    yield ("phase1_simple_mlp", parity_cfg(
        "phase1_simple_mlp", num_qubits=1, state="plus", shots_train=1024,
        shots_infer=1024, noise="readout", epochs=200, batch=512,
        embed=32, hidden=128, blocks=2, arch="plain_mlp",
        schedule="notebook", lr=1e-3, optimizer="adam",
    ), 0.909180, "notebook cell 16 (SimpleMLP, 200 epochs)")
    yield ("phase1_upgraded_mlp", parity_cfg(
        "phase1_upgraded_mlp", num_qubits=1, state="plus", shots_train=1024,
        shots_infer=1024, noise="readout", epochs=300, batch=128,
        embed=128, hidden=256, blocks=3, arch="plain_mlp",
        schedule="notebook", lr=1e-3, optimizer="adam",
    ), 0.918919, "notes.pdf Table 2 (UpgradedMLP, 202 epochs)")
    yield ("phase2_bell", parity_cfg(
        "phase2_bell", num_qubits=2, state="bell", shots_train=5000,
        shots_infer=10000, noise="ideal",
    ), 0.95565, "notes.pdf Table 3")
    yield ("phase2_ghz3", parity_cfg(
        "phase2_ghz3", num_qubits=3, state="ghz", shots_train=5000,
        shots_infer=10000, noise="ideal",
    ), 0.87092, "notes.pdf Table 3")
    for noise in ("ideal", "readout", "depolarizing", "thermal", "torino"):
        yield (f"phase3_rqc2_{noise}", parity_cfg(
            f"phase3_rqc2_{noise}", num_qubits=2, state="rqc",
            shots_train=1000, shots_infer=10000, noise=noise, depth=5,
        ), None, "phase-3 defaults (config.py:3-24), reference prints but "
                 "does not publish per-noise numbers")
    yield ("rqc3_quality", quality_cfg(
        "rqc3_quality", num_qubits=3, state="rqc", shots_train=5000,
        shots_infer=50000, noise="readout", depth=5,
    ), None, "BASELINE target: N=3 RQC >= 0.99 (quality stack)")
    yield ("rqc3_quality_torino", quality_cfg(
        "rqc3_quality_torino", num_qubits=3, state="rqc", shots_train=5000,
        shots_infer=50000, noise="torino", depth=5,
    ), None, "torino stand-in noise (depolarizing+readout)")
    yield ("ghz3_quality", quality_cfg(
        "ghz3_quality", num_qubits=3, state="ghz", shots_train=5000,
        shots_infer=50000, noise="readout",
    ), None, "BASELINE target: GHZ-3 >= 0.99 through the generative pipeline")
    # RQC-3 at 5k shots is ceiling-limited by the data itself (MLE on raw
    # ~0.985): a generic complex state needs more shots than GHZ for the
    # same fidelity. 4x the shot budget lifts the ceiling past 0.99.
    yield ("rqc3_quality_20k", quality_cfg(
        "rqc3_quality_20k", num_qubits=3, state="rqc", shots_train=20000,
        shots_infer=100000, noise="readout", depth=5,
    ), None, "RQC-3 >= 0.99 demonstration at the shot budget that supports it")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_parity.jsonl")
    ap.add_argument("--only", default="")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    from ddqst_tpu import pipeline

    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["tag"]] = rec

    rows = []
    for tag, cfg, ref, note in experiments():
        if args.only and args.only != tag:
            continue
        if tag in done:
            rows.append(done[tag])
            continue
        t0 = time.perf_counter()
        res = pipeline.run_experiment(cfg, seed=args.seed)
        rec = {
            "tag": tag,
            "fidelity": round(res["fidelity"], 5),
            "raw_fidelity": round(res["raw_fidelity"], 5),
            "raw_fidelity_mitigated": (
                None if res.get("raw_fidelity_mitigated") is None
                else round(res["raw_fidelity_mitigated"], 5)
            ),
            "trace_distance": round(res["trace_distance"], 5),
            "reference": ref,
            "note": note,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        rows.append(rec)
        print(f"== {tag}: fidelity={rec['fidelity']} (ref {ref}) "
              f"raw={rec['raw_fidelity']} [{rec['wall_s']}s]", flush=True)

    print("\n| tag | fidelity | raw baseline | best-raw (MLE) | reference |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tag']} | {r['fidelity']} | {r['raw_fidelity']} | "
              f"{r['raw_fidelity_mitigated']} | {r['reference']} |")


if __name__ == "__main__":
    main()
