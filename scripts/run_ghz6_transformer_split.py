"""GHZ-6 transformer run, split into two processes.

In this environment, executing the (cached) sampling program after the
transformer training program in the SAME process wedges the TPU worker
(the identical program runs fine in a fresh process — see RESULTS.md
round-2 notes). This script runs each phase in its own interpreter:

  phase A (``--phase train``): generate data, train, save params + data.
  phase B (``--phase eval``):  load, sample (chunked), reconstruct, score.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/run_ghz6_transformer_split.py --phase train
  env PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/run_ghz6_transformer_split.py --phase eval
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = "examples/ghz6_transformer_work"


def build_cfg():
    from run_scaling_ghz import experiments

    for tag, cfg, _ in experiments():
        if tag == "ghz6_transformer":
            return cfg
    raise KeyError("ghz6_transformer")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["train", "eval"], required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddqst_tpu import pipeline, train as training
    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops.schedules import make_schedule

    cfg = build_cfg()
    n = cfg.data.num_qubits
    key = jax.random.key(args.seed)
    k_data, k_train, k_sample = jax.random.split(key, 3)
    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, n, cfg.diffusion.num_timesteps)

    if args.phase == "train":
        os.makedirs(WORK, exist_ok=True)
        print("generating...", flush=True)
        data = pipeline.generate_training_data(
            cfg, k_data, np.random.default_rng(args.seed)
        )
        print("training...", flush=True)
        x, basis = pipeline.flatten_for_training(data.bits, data.basis_idx)
        t0 = time.perf_counter()
        state, losses = training.fit(
            k_train, model, x, basis, cfg.train, schedule
        )
        print(f"trained in {time.perf_counter() - t0:.1f}s "
              f"loss {float(losses[-1]):.4f}", flush=True)
        # Imported late: orbax's import-time thread pools can deadlock
        # with the axon plugin when loaded before device init.
        from ddqst_tpu.utils.checkpoint import save_params

        save_params(os.path.join(WORK, "params"), state.params)
        np.savez(
            os.path.join(WORK, "data.npz"),
            bits=np.asarray(data.bits), basis_idx=np.asarray(data.basis_idx),
            basis_labels=np.asarray(data.basis_labels),
            target=np.asarray(data.target),
        )
        return

    # --- eval phase (fresh process: sampling works here) ----------------
    from ddqst_tpu.ops import diffusion as diff
    from ddqst_tpu.ops import metrics as M
    from ddqst_tpu.ops import mle, pauli
    from ddqst_tpu.ops.complexlib import from_complex

    blob = np.load(os.path.join(WORK, "data.npz"))
    x0 = jnp.zeros((8, n), jnp.int8)
    t0_ = jnp.ones((8,), jnp.int32)
    b0 = jnp.zeros((8,), jnp.int32)
    template = model.init(jax.random.key(0), x0, t0_, b0)["params"]
    from ddqst_tpu.utils.checkpoint import restore_params

    params = restore_params(os.path.join(WORK, "params"), template)

    shots = cfg.data.shots_infer
    cap = max(1, pipeline._GEN_CHAIN_CAP // 3**n)
    n_calls = -(-shots // cap)
    per_call = -(-shots // n_calls)
    t0 = time.perf_counter()
    chunks = [
        diff.sample_all_bases(
            jax.random.fold_in(k_sample, c), model.apply,
            {"params": params}, n, per_call, schedule,
            exact=cfg.diffusion.exact,
        )
        for c in range(n_calls)
    ]
    samples = jnp.concatenate(chunks, axis=1)[:, :shots]
    _ = float(jnp.sum(samples))  # reliable sync through the TPU relay
    print(f"sampled {samples.shape} in {time.perf_counter() - t0:.1f}s",
          flush=True)

    rec = mle.make_mle(n)
    rho = rec(mle.bits_to_counts(samples))
    target = from_complex(jnp.asarray(blob["target"]))
    fid = float(M.state_fidelity(target, rho))
    bits = jnp.asarray(blob["bits"])
    inv = pauli.make_inverter(n, blob["basis_labels"])
    fid_raw = float(M.state_fidelity(target, inv(bits)))
    from ddqst_tpu.qsim.noise import get_noise_config

    p = get_noise_config(cfg.data.noise_type).readout_p
    rec_raw = mle.make_mle(n, readout_p=p)
    fid_mle = float(M.state_fidelity(target, rec_raw(mle.bits_to_counts(bits))))
    out = {
        "tag": "ghz6_transformer", "num_qubits": n,
        "fidelity": round(fid, 5), "raw_fidelity": round(fid_raw, 5),
        "raw_fidelity_mitigated": round(fid_mle, 5),
        "trace_distance": round(float(M.trace_distance(target, rho)), 5),
        "note": "GHZ-6, per-qubit-token transformer (split-process run)",
    }
    with open("examples/results_scaling.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
