"""Cache-warm the generation + evaluation tail of a scaling experiment.

The TPU relay wedges on COLD compiles that happen late in a long-lived
process (CLAUDE.md "TPU relay wedge modes"); the same compile early in a
fresh process succeeds. ``run_scaling_ghz.py --probe`` warms the
training/distillation program classes but is itself long-lived by the
time it reaches generation — measured: the probe wedged at the
generation compile after 25 min. This script warms exactly the tail
program classes (generation chunk, histogram, MLE eval, raw inversion,
metrics) FIRST in a fresh process, with random params of the real
shapes, so the real run hits only warm compiles end to end.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/warm_tail.py \
      --tag ghz7_mle_hot
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="ghz7_mle_hot")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ddqst_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from run_scaling_ghz import experiments
    from ddqst_tpu import pipeline
    from ddqst_tpu.models import build_model
    from ddqst_tpu.ops import diffusion as diff
    from ddqst_tpu.ops import metrics as M
    from ddqst_tpu.ops import mle, pauli
    from ddqst_tpu.ops.complexlib import from_complex
    from ddqst_tpu.ops.schedules import make_schedule
    from ddqst_tpu.qsim import noise, states

    cfg = next(c for t, c, _ in experiments() if t == args.tag)
    n = cfg.data.num_qubits
    T = cfg.diffusion.num_timesteps
    schedule = make_schedule(cfg.diffusion.schedule, T)
    model = build_model(cfg.model, n, T)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((2, n), jnp.int8),
        jnp.ones((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32),
    )
    apply_fn = model.apply

    def mark(label, t0):
        print(f"warm: {label} [{time.perf_counter() - t0:.1f}s]", flush=True)

    num_bases = 3**n
    cap = max(1, pipeline._GEN_CHAIN_CAP // num_bases)
    n_calls = -(-cfg.data.shots_infer // cap)
    per_call = -(-cfg.data.shots_infer // n_calls)

    # 1. One generation chunk — the program the real run dispatches
    #    n_calls times (identical per chunk). gen_tables_once configs use
    #    the amortised path instead (bounded table dispatches + walks);
    #    warming it at the real shots warms both program classes.
    t0 = time.perf_counter()
    if cfg.diffusion.gen_tables_once:
        chunk = diff.sample_all_bases_chunked(
            jax.random.key(1), apply_fn, variables, n,
            cfg.data.shots_infer, schedule, exact=cfg.diffusion.exact,
            max_chains=pipeline._GEN_CHAIN_CAP,
        )
        _ = float(jnp.sum(chunk))
        mark(f"amortised generation [{num_bases}x{cfg.data.shots_infer}]", t0)
        n_calls, per_call = 1, cfg.data.shots_infer
    else:
        chunk = diff.sample_all_bases(
            jax.random.key(1), apply_fn, variables, n, per_call, schedule,
            exact=cfg.diffusion.exact,
        )
        _ = float(jnp.sum(chunk))
        mark(f"generation chunk [{num_bases}x{per_call}] (1 of {n_calls})", t0)

    # 2. Histogram of the full concatenated sample block.
    t0 = time.perf_counter()
    samples = jnp.concatenate([chunk] * n_calls, axis=1)
    samples = samples[:, : cfg.data.shots_infer]
    counts = mle.bits_to_counts(samples).astype(jnp.float32)
    _ = float(jnp.sum(counts))
    mark("bits_to_counts on generated block", t0)

    # 3. MLE eval on generated counts (labels=None, readout_p=0 — the
    #    mitigate_train_data path's estimator call).
    t0 = time.perf_counter()
    rho = mle.make_mle(n, None, readout_p=0.0)(counts)
    _ = float(jnp.sum(rho.re))
    mark("MLE eval (generated counts)", t0)

    # 4. Raw-path programs: histogram of training-shaped bits, linear
    #    inversion, noise-aware MLE with explicit labels.
    labels = pauli.all_basis_labels(n)
    mit_p = noise.get_noise_config(cfg.data.noise_type).readout_p
    t0 = time.perf_counter()
    raw_bits = (
        jax.random.randint(
            jax.random.key(2), (num_bases, cfg.data.shots_train, n), 0, 2
        ).astype(jnp.int8)
    )
    raw_counts = mle.bits_to_counts(raw_bits).astype(jnp.float32)
    _ = float(jnp.sum(raw_counts))
    mark("bits_to_counts on raw block", t0)
    t0 = time.perf_counter()
    rho_raw = pauli.make_counts_inverter(n, labels)(raw_counts)
    _ = float(jnp.sum(rho_raw.re))
    mark("linear inversion (raw)", t0)
    t0 = time.perf_counter()
    rho_best = mle.make_mle(n, labels, readout_p=mit_p)(raw_counts)
    _ = float(jnp.sum(rho_best.re))
    mark("noise-aware MLE (raw)", t0)

    # 5. Metrics programs.
    t0 = time.perf_counter()
    target = from_complex(np.asarray(states.ghz_state(n)))
    vals = [
        float(M.state_fidelity(target, rho)),
        float(M.trace_distance(target, rho)),
        float(M.state_fidelity(target, rho_raw)),
        float(M.trace_distance(target, rho_raw)),
        float(M.state_fidelity(target, rho_best)),
    ]
    M.pauli_expectations(rho)
    M.get_metrics(rho, n)
    M.z_bias(samples[-1])
    mark(f"metrics ({', '.join(f'{v:.3f}' for v in vals)})", t0)
    print("warm: tail complete", flush=True)


if __name__ == "__main__":
    main()
