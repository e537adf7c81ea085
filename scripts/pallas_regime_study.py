"""Sampler backend regime study on real TPU (VERDICT round-1 item 3).

Validates the fused Pallas chain walk statistically against the exact
chain distribution (interpreter PRNG returns zeros, so hardware only),
then measures sampling throughput across N x chain-count regimes for:

- ``scan``     — direct per-chain reverse scan (no grid), the reference's
                 computational shape, batched.
- ``grid-seq`` — round-1 grid sampler: per-step grid forward inside the
                 scan (``precompute=False``).
- ``grid-xla`` — one batched table precompute + XLA table walk (the new
                 default).
- ``grid-pallas`` — table precompute + the whole T-step walk in ONE
                 Pallas kernel (chain state resident in VMEM).

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_regime_study.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.config import ModelConfig
from ddqst_tpu.models import build_model
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules

T = 100


def make_apply(n):
    model = build_model(
        ModelConfig(input_encoding="token", embed_dim=128, hidden_dim=512,
                    num_blocks=4), n, T,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((2, n), jnp.int8),
        jnp.ones((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
    )
    return model.apply, params


def validate_walk_statistics(n=3):
    """Generated per-basis distributions must match the exact chain
    distribution of the same model (both reverse rules)."""
    apply_fn, params = make_apply(n)
    sched = schedules.cosine_schedule(T)
    shots = 20000
    for exact in (False, True):
        ref = np.asarray(diff.sampler_distribution(
            jax.random.key(0), apply_fn, params, n, sched, exact=exact))
        out = diff.sample_all_bases(
            jax.random.key(1), apply_fn, params, n, shots, sched,
            exact=exact, grid_mode="on", walk="pallas")
        counts = np.zeros((3**n, 2**n))
        idx = (np.asarray(out) * (1 << np.arange(n))).sum(-1)
        for b in range(3**n):
            counts[b] = np.bincount(idx[b], minlength=2**n)
        emp = counts / shots
        tv = 0.5 * np.abs(emp - ref).sum(-1)
        floor = np.mean([0.5 * np.abs(
            np.random.default_rng(i).multinomial(shots, p) / shots - p
        ).sum() for i, p in enumerate(ref)])
        print(f"walk stats exact={exact}: max TV {tv.max():.4f} "
              f"(shot-noise floor ~{floor:.4f})")
        assert tv.max() < max(4 * floor, 0.02), "pallas walk distribution off"
    print("pallas walk statistics ok")


def bench():
    sched = schedules.cosine_schedule(T)
    rows = []
    for n in (3, 4, 5):
        apply_fn, params = make_apply(n)
        bases = 3**n
        for target_chains in (10**5, 10**6):
            shots = max(target_chains // bases, 1)
            chains = bases * shots

            def t_of(walk, grid_mode="on", label=""):
                def call(k):
                    return diff.sample_all_bases(
                        k, apply_fn, params, n, shots, sched,
                        grid_mode=grid_mode, walk=walk)
                out = call(jax.random.key(0))
                _ = float(jnp.sum(out))  # warm (compile)
                t0 = time.perf_counter()
                out = call(jax.random.key(1))
                _ = float(jnp.sum(out))
                return time.perf_counter() - t0

            res = {
                "scan": t_of("xla", grid_mode="off"),
                "grid-seq": t_of("seq"),
                "grid-xla": t_of("xla"),
                "grid-pallas": t_of("pallas"),
                # The regime-aware default must match or beat the best
                # fixed backend in every cell (VERDICT r2 item 6).
                "auto": t_of("auto"),
            }

            line = {k: f"{chains / v / 1e6:.2f}M/s" for k, v in res.items()}
            rows.append((n, chains, line))
            print(f"N={n} chains={chains}: " + "  ".join(
                f"{k}={v}" for k, v in line.items()), flush=True)

    print("\n| N | chains | scan | grid-seq (r1) | grid-xla | grid-pallas "
          "| auto |")
    print("|---|---|---|---|---|---|---|")
    for n, chains, line in rows:
        print(f"| {n} | {chains} | {line['scan']} | {line['grid-seq']} | "
              f"{line['grid-xla']} | {line['grid-pallas']} | {line['auto']} |")


if __name__ == "__main__":
    validate_walk_statistics()
    bench()
