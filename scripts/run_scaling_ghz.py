"""Scaling demonstration: full density-matrix reconstruction beyond N=3.

The reference's full-reconstruction protocol stops at N=3 GHZ (27 bases,
``multi_qubit_special_states/main.py:109-134``; notes.pdf Table 3 reports
Bell-2 and GHZ-3 only). This script runs the same protocol — all 3^N
canonical bases, quality stack (cosine + renoise + mitigated training +
exact-chain distillation + noise-aware MLE) — at N=4 and N=5, where the
basis count (81 / 243), the Pauli expansion (256 / 1024 coefficients) and
the per-basis generation volume stress every stage of the pipeline.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_scaling_ghz.py \
      [--out examples/results_scaling.jsonl] [--only TAG]

Appends one JSON line per experiment (rerun-safe: finished tags skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def coverage_steps(num_qubits: int, basis_batch: int, accum: int = 1,
                   epochs_equiv: float = 94.0) -> int:
    """Distillation budget from GRID COVERAGE, not per-N constants.

    The quantity that transfers across N is grid-equivalent epochs
    (steps * effective_batch / 3^N), not steps: the N=7 closure ran 93.6
    epochs (1600 steps at 128/2187) while the under-budgeted GHZ-8 v1 ran
    only 15.6 (1600 at 64/6561) and its chain-CE descent shrank
    proportionally (VERDICT r3 weak #3). Default epochs_equiv=94 is the
    N=7-validated operating point; N=6's hand value (800 steps = 105
    epochs at 96/729) sits within 12% of it. ``accum`` is
    ``TrainConfig.chain_accum`` (gradient accumulation), which multiplies
    effective per-step coverage without growing the per-dispatch grid.
    """
    return int(round(epochs_equiv * 3**num_qubits / (basis_batch * accum)))


def auto_recipe(cfg, *, basis_batch: int = 0, steps_per_call: int = 25,
                epochs: int | None = None, target: str = "counts",
                val_patience: int = 4, val_fraction: float = 0.15,
                steps: int = 800, accum: int = 1):
    """THE automated distillation recipe (one config across N).

    Generous step budget at a hot learning rate; the held-out step
    selection (train.finetune_chain val_counts) picks the temperature —
    replacing the per-N hand tuning of round 2 (hot won +0.43 at N=6 but
    lost 0.057 at N=5; the held-out criterion adjudicates that trade
    automatically). ``basis_batch`` is a memory bound at N>=6 (grid rows
    per step), not a temperature knob.
    """
    tr = cfg.train
    return cfg.replace(train=tr.__class__(
        batch_size=1024, learning_rate=1e-3, optimizer="adam",
        num_epochs=tr.num_epochs if epochs is None else epochs,
        lr_schedule="cosine", log_every=0, eval_every=0,
        chain_finetune_steps=steps, chain_lr=1e-3,
        chain_val_fraction=val_fraction, chain_val_patience=val_patience,
        chain_basis_batch=basis_batch, chain_steps_per_call=steps_per_call,
        chain_target=target, chain_accum=accum,
    ))


def experiments():
    from run_parity_suite import quality_cfg

    # cpu_tiny: driver-test config (main() skips it unless --only): N=2
    # bell at toy budgets, so tests/test_campaign_drivers.py can run the
    # segmented campaign drivers end to end on CPU (injected failures,
    # retry protocol, opt/params chaining).
    from ddqst_tpu.config import get_preset

    tiny = get_preset("special_states").replace(name="cpu_tiny")
    tiny = tiny.replace(
        model=tiny.model.__class__(
            embed_dim=16, hidden_dim=32, num_blocks=1),
        diffusion=tiny.diffusion.__class__(
            num_timesteps=10, schedule="cosine", sampler="renoise"),
        train=tiny.train.__class__(
            batch_size=256, learning_rate=1e-3, optimizer="adam",
            num_epochs=2, log_every=0, eval_every=0,
            chain_finetune_steps=4, chain_lr=1e-3,
            chain_steps_per_call=2, chain_target="mle"),
        data=tiny.data.__class__(
            num_qubits=2, state_type="bell", noise_type="ideal",
            shots_train=400, shots_infer=500),
    )
    yield ("cpu_tiny", tiny, "CPU driver-test config (not a TPU experiment)")

    # (tag, cfg, note). shots_infer shrinks with N to bound the generated
    # sample volume (bases x shots_infer): 27x50k / 81x30k / 243x20k.
    yield ("ghz4_quality", quality_cfg(
        "ghz4_quality", num_qubits=4, state="ghz", shots_train=5000,
        shots_infer=30000, noise="readout",
    ), "GHZ-4: 81 bases x 5,000 shots (reference protocol, one N beyond)")
    yield ("w4_quality", quality_cfg(
        "w4_quality", num_qubits=4, state="w", shots_train=5000,
        shots_infer=30000, noise="readout",
    ), "W-4: 81 bases x 5,000 shots")
    cfg5 = quality_cfg(
        "ghz5_quality", num_qubits=5, state="ghz", shots_train=5000,
        shots_infer=20000, noise="readout",
    )
    # 150 distillation steps (not 400): at N=5 each step is a fwd+bwd over
    # the [3^5*2^5 = 7776, H] grid x T=100 — the remat'd chain converges in
    # ~100 steps and the shorter program is gentler on the worker.
    cfg5 = cfg5.replace(train=cfg5.train.__class__(
        batch_size=1024, learning_rate=1e-3, optimizer="adam",
        num_epochs=300, lr_schedule="cosine", log_every=0, eval_every=0,
        chain_finetune_steps=150, chain_lr=3e-4))
    yield ("ghz5_quality", cfg5,
           "GHZ-5: 243 bases x 5,000 shots (4^5=1024 Pauli coefficients)")
    # N=6 doubles the reference's max system size with full tomography;
    # feasible because MLE impl='factored' never builds the POVM stack.
    cfg6 = quality_cfg(
        "ghz6_quality", num_qubits=6, state="ghz", shots_train=5000,
        shots_infer=10000, noise="readout",
    )
    # Distillation off at N=6: the full-grid (46,656-row) distillation
    # backprop crashes the TPU worker even remat'd; see ghz6_distilled
    # below for the basis-minibatched variant.
    cfg6 = cfg6.replace(train=cfg6.train.__class__(
        batch_size=1024, learning_rate=1e-3, optimizer="adam",
        num_epochs=150, lr_schedule="cosine", log_every=0, eval_every=0))
    yield ("ghz6_quality", cfg6,
           "GHZ-6: 729 bases x 5,000 shots, 2x the reference's max N")
    # Same run + basis-minibatched distillation: 96 of 729 bases per step
    # (grid 96*64 = 6,144 rows/step, the scale the worker handles).
    cfg6d = cfg6.replace(
        name="ghz6_distilled",
        train=cfg6.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=150, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=400, chain_lr=3e-4, chain_basis_batch=96))
    yield ("ghz6_distilled", cfg6d,
           "GHZ-6 + basis-minibatched exact-chain distillation")
    # The film_mlp's 3^6 = 729-row basis embedding has no cross-basis
    # sharing; the per-qubit-token transformer factorises the basis
    # conditioning (the lever behind the N=10 shadow results) and accepts
    # global basis indices directly (decoded in-model).
    cfg6t = cfg6d.replace(
        name="ghz6_transformer",
        model=cfg6d.model.__class__(
            arch="transformer", input_encoding="token", embed_dim=128,
            hidden_dim=512, num_blocks=4, num_heads=4),
        train=cfg6d.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=300, lr_schedule="cosine", log_every=0, eval_every=0))
    yield ("ghz6_transformer", cfg6t,
           "GHZ-6, per-qubit-token transformer denoiser (CE only)")
    cfg6td = cfg6t.replace(
        name="ghz6_transformer_distilled",
        train=cfg6t.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=300, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=150, chain_lr=3e-4, chain_basis_batch=96,
            chain_steps_per_call=10))
    yield ("ghz6_transformer_distilled", cfg6td,
           "GHZ-6 transformer + minibatched distillation (10-step chunks)")
    # Shortened schedule so the whole process finishes inside the relay's
    # ~16-min wedge horizon (CLAUDE.md "TPU relay wedge modes").
    cfg6t100 = cfg6t.replace(
        name="ghz6_transformer_e100",
        train=cfg6t.train.__class__(
            batch_size=1024, learning_rate=1.5e-3, optimizer="adam",
            num_epochs=100, lr_schedule="cosine", log_every=0, eval_every=0))
    yield ("ghz6_transformer_e100", cfg6t100,
           "GHZ-6 transformer, 100-epoch schedule (wedge-horizon budget)")
    # Distillation retune: the first N=6 distillation barely moved the
    # chain CE (3.41 -> 3.44 at lr 3e-4 / 400 minibatched steps); 2x the
    # budget at ~3x the lr.
    cfg6dh = cfg6d.replace(
        name="ghz6_distilled_hot",
        train=cfg6d.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=150, lr_schedule="cosine", log_every=0, eval_every=0,
            chain_finetune_steps=800, chain_lr=1e-3, chain_basis_batch=96))
    yield ("ghz6_distilled_hot", cfg6dh,
           "GHZ-6 + hotter minibatched distillation (800 steps, lr 1e-3)")
    # Same hot recipe one N down (GHZ-5 was 0.967 at 150 steps / 3e-4).
    cfg5h = quality_cfg(
        "ghz5_distilled_hot", num_qubits=5, state="ghz", shots_train=5000,
        shots_infer=20000, noise="readout",
    )
    cfg5h = cfg5h.replace(train=cfg5h.train.__class__(
        batch_size=1024, learning_rate=1e-3, optimizer="adam",
        num_epochs=300, lr_schedule="cosine", log_every=0, eval_every=0,
        chain_finetune_steps=800, chain_lr=1e-3, chain_basis_batch=96))
    yield ("ghz5_distilled_hot", cfg5h,
           "GHZ-5 + hot distillation recipe")
    # --- Round 3: the ONE automated recipe across N (auto_recipe) --------
    # Same protocol, no per-N tuning: 800 steps @ lr 1e-3, held-out step
    # selection (chain_val_fraction=0.15). Done-criterion: matches or
    # beats the hand-tuned rows above at N=3, 5, 6 (VERDICT r2 #2).
    yield ("ghz3_auto", auto_recipe(quality_cfg(
        "ghz3_auto", num_qubits=3, state="ghz", shots_train=5000,
        shots_infer=50000, noise="readout",
    )), "GHZ-3, automated distillation recipe")
    yield ("ghz5_auto", auto_recipe(quality_cfg(
        "ghz5_auto", num_qubits=5, state="ghz", shots_train=5000,
        shots_infer=20000, noise="readout",
    )), "GHZ-5, automated distillation recipe")
    yield ("ghz6_auto", auto_recipe(quality_cfg(
        "ghz6_auto", num_qubits=6, state="ghz", shots_train=5000,
        shots_infer=10000, noise="readout",
    ), basis_batch=96, epochs=150),
        "GHZ-6, automated distillation recipe (96-basis minibatch)")
    # --- RQC at N>3: generic-state scaling (the GHZ rows above have
    # structure a model can exploit; a random circuit's state is the
    # harder, generic case — reference protocol never leaves N=3,
    # multi_qubit_any_state/main.py:150-177).
    yield ("rqc4_auto", auto_recipe(quality_cfg(
        "rqc4_auto", num_qubits=4, state="rqc", shots_train=5000,
        shots_infer=30000, noise="readout",
    )), "RQC-4 (depth 5): 81 bases, automated recipe")
    yield ("rqc5_auto", auto_recipe(quality_cfg(
        "rqc5_auto", num_qubits=5, state="rqc", shots_train=5000,
        shots_infer=20000, noise="readout",
    )), "RQC-5 (depth 5): 243 bases, automated recipe")
    # RQC-6: the generic-state ladder at 2x the reference's max N (the
    # GHZ-6 row has structure a model can exploit; this is the hard case).
    # Same memory bounds as ghz6_auto: 96-basis minibatches, 150 CE epochs.
    yield ("rqc6_auto", auto_recipe(quality_cfg(
        "rqc6_auto", num_qubits=6, state="rqc", shots_train=5000,
        shots_infer=10000, noise="readout",
    ), basis_batch=96, epochs=150),
        "RQC-6 (depth 5): 729 bases, automated recipe")
    # --- GHZ-7: 2187 bases, full density-matrix reconstruction -----------
    # 2.33x the reference's max system size. Feasible only because nothing
    # on the path materialises 4^N·d² or per-shot 2^N intermediates:
    # factored MLE (ops/mle.py), WHT counts-native inversion + factored
    # Pauli assembly (ops/pauli.py), minibatched distillation, chunked
    # generation. shots_train=3000 bounds the epoch at ~6.4M rows; 30
    # epochs keeps the training leg inside the relay wedge horizon.
    yield ("ghz7_auto", auto_recipe(quality_cfg(
        "ghz7_auto", num_qubits=7, state="ghz", shots_train=3000,
        shots_infer=5000, noise="readout",
    ), basis_batch=64, epochs=30, steps_per_call=10),
        "GHZ-7: 2187 bases, automated recipe (frontier)")
    # ghz7_auto measured 0.488 (< raw 0.558): 30 CE epochs underfit and the
    # held-out stop fired at step 60 — 64-of-2187-basis minibatch steps are
    # too noisy for patience 4. v2 distills against the MLE-projected Born
    # probs (MLE on the raw N=7 counts reads 0.99993 — the RQC-3 ≥0.99
    # mechanism), doubles CE epochs, and steadies validation (batch 128,
    # patience 12).
    yield ("ghz7_mle", auto_recipe(quality_cfg(
        "ghz7_mle", num_qubits=7, state="ghz", shots_train=3000,
        shots_infer=5000, noise="readout",
    ), basis_batch=128, epochs=60, steps_per_call=10, target="mle",
        val_patience=12),
        "GHZ-7: MLE-projected distillation target, 60 CE epochs")
    # ghz7_mle also scored 0.483: the held-out stop fired at step 0 — at
    # 128/2187 bases per step the val signal per 10-step eval is below the
    # 1e-5 threshold (a CPU diagnostic confirms the chain CE itself
    # descends fine at N=7). With the MLE-projected target the
    # bias-variance adjudication already happened in the projection
    # (the target is the physics-constrained estimate, not noisy counts),
    # so v3 drops the held-out stop and runs a fixed hot budget — the
    # N=6 recipe that took 0.49 -> 0.978, scaled to N=7 coverage.
    yield ("ghz7_mle_hot", auto_recipe(quality_cfg(
        "ghz7_mle_hot", num_qubits=7, state="ghz", shots_train=3000,
        shots_infer=5000, noise="readout",
    ), basis_batch=128, epochs=60, steps_per_call=10, target="mle",
        val_fraction=0.0, steps=1600),
        "GHZ-7: MLE target, fixed 1600-step hot distillation")
    # --- RQC-7: the generic-state ladder at the N=7 frontier -------------
    # Same v3 recipe GHZ-7 validated: at 2187-basis coverage the held-out
    # stop's per-eval signal is below threshold (128-basis minibatches),
    # and with the MLE-projected target the bias-variance adjudication is
    # already in the projection, so the fixed hot budget is safe — it
    # distills toward the physics-constrained estimate, not noisy counts
    # (the failure mode of hot+counts at N=5 does not apply). Program
    # shapes identical to ghz7_mle_hot (only the data differs), so the
    # relay worker's compiled-program cache is reused as-is.
    yield ("rqc7_mle_hot", auto_recipe(quality_cfg(
        "rqc7_mle_hot", num_qubits=7, state="rqc", shots_train=3000,
        shots_infer=5000, noise="readout",
    ), basis_batch=128, epochs=60, steps_per_call=10, target="mle",
        val_fraction=0.0, steps=1600),
        "RQC-7 (depth 5): 2187 bases, MLE target, fixed hot distillation")
    # --- GHZ-8: 6561 bases, d=256, 4^8 = 65,536 Pauli coefficients -------
    # 2.67x the reference's max system size. New requirements at this
    # scale, all in the framework: amortised generation (gen_tables_once —
    # the fused per-chunk table precompute would be ONE ~10-minute device
    # program, over the relay crash horizon; amortised, it is ~50 bounded
    # dispatches computed once), basis_batch=64 keeps the distillation
    # grid at 64x256 = 16,384 rows/step (the N=7-proven dispatch size),
    # shots_train=2000 bounds the CE epoch at 13.1M rows.
    cfg8 = auto_recipe(quality_cfg(
        "ghz8_mle_hot", num_qubits=8, state="ghz", shots_train=2000,
        shots_infer=3000, noise="readout",
    ), basis_batch=64, epochs=40, steps_per_call=10, target="mle",
        val_fraction=0.0, steps=1600)
    cfg8 = cfg8.replace(diffusion=cfg8.diffusion.__class__(
        num_timesteps=100, schedule="cosine", sampler="renoise",
        gen_tables_once=True))
    yield ("ghz8_mle_hot", cfg8,
           "GHZ-8: 6561 bases, MLE target, amortised generation (frontier)")
    # v2: matched-coverage distillation. The v1 run (fidelity 0.477 vs
    # raw 0.355, RESULTS.md) showed 1600 steps x 64/6561 bases is only
    # ~16 traversals of the basis grid (vs ~94 at N=7) and the chain-CE
    # descent shrank proportionally. 9600 steps matches N=7's coverage
    # with IDENTICAL program shapes (same 16,384-row dispatch, same
    # steps_per_call=10 scan — only 6x the dispatch count; the worker
    # cache from v1 is reused as-is). Expected wall ~4h; launch at round
    # start per CLAUDE.md relay protocol (probe first if caches cold).
    import dataclasses as _dc
    cfg8v2 = cfg8.replace(
        name="ghz8_mle_hot_v2",
        train=_dc.replace(cfg8.train, chain_finetune_steps=9600),
    )
    yield ("ghz8_mle_hot_v2", cfg8v2,
           "GHZ-8 v2: matched-coverage 9600-step distillation")
    # s4800: half-coverage fallback. The 9600-step loop (960 dispatches in
    # one process) wedged mid-loop on 2026-08-19 (flat CPU 45 min, no log
    # line — the same mode as the two N=10 dist1k attempts); v1's 160
    # dispatches completed. 480 dispatches probes the feasible loop length
    # while still tripling v1's basis coverage (~47 basis-epochs).
    cfg8s = cfg8.replace(
        name="ghz8_mle_hot_s4800",
        train=_dc.replace(cfg8.train, chain_finetune_steps=4800),
    )
    yield ("ghz8_mle_hot_s4800", cfg8s,
           "GHZ-8: 4800-step distillation (bounded loop length)")
    # --- RQC-8: the generic-state ladder at the N=8 frontier --------------
    # (VERDICT r3 next-#6.) Budget from the coverage rule, not a hand
    # constant: chain_accum=4 raises per-step coverage to 256/6561 = 3.9%
    # (the regime that closed N=7) while each accumulated sub-chunk keeps
    # the relay-proven 16,384-row dispatch grid; coverage_steps then gives
    # the 94-epoch budget directly. Run via run_frontier_segments.py
    # (--accum 4) so the dispatch loop stays segmented.
    rqc8 = auto_recipe(quality_cfg(
        "rqc8_mle_hot", num_qubits=8, state="rqc", shots_train=2000,
        shots_infer=3000, noise="readout",
    ), basis_batch=64, epochs=40, steps_per_call=10, target="mle",
        val_fraction=0.0, steps=coverage_steps(8, 64, accum=4), accum=4)
    rqc8 = rqc8.replace(diffusion=rqc8.diffusion.__class__(
        num_timesteps=100, schedule="cosine", sampler="renoise",
        gen_tables_once=True))
    yield ("rqc8_mle_hot", rqc8,
           "RQC-8 (depth 5): 6561 bases, coverage-rule budget, accum=4")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/results_scaling.jsonl")
    ap.add_argument("--only", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--probe", action="store_true",
                    help="cache-warming pass: run the selected experiment "
                    "with tiny step budgets but IDENTICAL program shapes "
                    "(same model/batch/shots/steps_per_call), so a fresh "
                    "process compiles every program class once — the "
                    "relay worker wedges on cold compiles late in "
                    "long-lived processes (CLAUDE.md wedge modes). "
                    "Results are not recorded.")
    ap.add_argument("--data_cache", default="",
                    help="npz cache for the generated data (same seed = "
                    "identical data); lets a campaign's probe/children "
                    "share one simulation pass")
    ap.add_argument("--target_cache", default="",
                    help="npz cache for the MLE distillation target "
                    "(chain_target='mle'): the probe computes the ~10-min "
                    "N=8 solve once and segment 0 reloads it")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    from ddqst_tpu import pipeline

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["tag"] for line in f}

    for tag, cfg, note in experiments():
        if (args.only and args.only != tag) or (tag in done and not args.probe):
            continue
        if tag == "cpu_tiny" and args.only != tag:
            continue  # driver-test config, never a TPU experiment
        if args.probe:
            import dataclasses
            tr = cfg.train
            cfg = cfg.replace(train=dataclasses.replace(
                tr,
                num_epochs=1,
                chain_finetune_steps=(
                    min(tr.chain_finetune_steps, 2 * tr.chain_steps_per_call)
                    if tr.chain_finetune_steps else 0
                ),
            ))
        t0 = time.perf_counter()
        res = pipeline.run_experiment(
            cfg, seed=args.seed, data_cache=args.data_cache,
            target_cache=args.target_cache,
        )
        if args.probe:
            print(f"== probe {tag} complete "
                  f"[{time.perf_counter() - t0:.1f}s]", flush=True)
            continue
        rec = {
            "tag": tag,
            "num_qubits": cfg.data.num_qubits,
            "fidelity": round(res["fidelity"], 5),
            "raw_fidelity": round(res["raw_fidelity"], 5),
            "raw_fidelity_mitigated": (
                None if res.get("raw_fidelity_mitigated") is None
                else round(res["raw_fidelity_mitigated"], 5)
            ),
            "trace_distance": round(res["trace_distance"], 5),
            "note": note,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"== {tag}: fidelity={rec['fidelity']} "
              f"raw={rec['raw_fidelity']} mle={rec['raw_fidelity_mitigated']} "
              f"[{rec['wall_s']}s]", flush=True)


if __name__ == "__main__":
    main()
