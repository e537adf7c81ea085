"""CPU validation of hard-basis mining (TrainConfig.chain_hard_frac).

Round-4 GHZ-8 measurement: after 4000 distillation steps the chain's
residual excess KL over the MLE Born target is ~0.011 nats on the
full-grid mean but 0.0002 on 48 random bases — the residual concentrates
in <~1% of the 6561 bases (the low-entropy Z-sector carrying the GHZ
coherence), and the uniform minibatch draw starves exactly those bases of
gradient weight. No optimisation-protocol change moves that floor
(scripts/diag_floor_escape.py: lr decay x3/x10, full-batch Adam, and
Polyak averaging all descend LESS than the control at equal budget).

This script reproduces the regime on CPU — GHZ-5, the campaign's smooth
MLE-projected Born target, basis_batch 4 at accum 4 — parks the chain at
the uniform-draw floor, then A/Bs the escape at equal budget
(300 steps @ accum 4 each, from the SAME parked state):

  uniform : hard_frac = 0   (control)
  hard50  : hard_frac = 0.5 (half the draw follows measured excess KL)
  hard90  : hard_frac = 0.9

Reported per arm: full-grid mean excess KL, the Z-sector mean (lowest-
decile-entropy bases — where GHZ coherence lives), and the worst basis.

Usage (CPU, ~15 min):
  env DDQST_CPU=1 PYTHONPATH=/root/repo nohup python \
      scripts/diag_hard_mining.py > /tmp/diag_mine.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import time

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

from ddqst_tpu import pipeline
from ddqst_tpu import train as training
from ddqst_tpu.config import get_preset
from ddqst_tpu.models import build_model
from ddqst_tpu.ops import mle
from ddqst_tpu.ops.complexlib import CArray, from_complex
from ddqst_tpu.ops.diffusion import chain_distribution
from ddqst_tpu.ops.schedules import make_schedule
from ddqst_tpu.qsim import measure

N = 5
S = 300          # steps per arm
BASIS_BATCH = 4  # 4/243 = 1.6% coverage/step (GHZ-8 runs 64/6561 = 1%)
ACCUM = 4
LR = 1e-3
WARM = 600


def make_cfg():
    base = get_preset("rqc")
    return base.replace(
        name="diag5mine",
        model=base.model.__class__(
            input_encoding="token", embed_dim=32, hidden_dim=64,
            num_blocks=2,
        ),
        diffusion=base.diffusion.__class__(
            num_timesteps=100, schedule="cosine", sampler="renoise",
        ),
        train=base.train.__class__(
            batch_size=1024, learning_rate=1e-3, optimizer="adam",
            num_epochs=10, lr_schedule="cosine", log_every=0, eval_every=0,
        ),
        data=base.data.__class__(
            num_qubits=N, state_type="ghz", noise_type="readout",
            shots_train=500, shots_infer=1000,
            mitigate_train_data=True,
        ),
    )


def main():
    cfg = make_cfg()
    key = jax.random.key(0)
    rng = np.random.default_rng(0)
    k_data, k_train, _ = jax.random.split(key, 3)
    data = pipeline.generate_training_data(cfg, k_data, rng)
    x, basis = pipeline.flatten_for_training(data.bits, data.basis_idx)
    schedule = make_schedule(
        cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, N, cfg.diffusion.num_timesteps)
    t0 = time.perf_counter()
    state0, _ = training.fit(k_train, model, x, basis, cfg.train, schedule)
    print(f"[mine] CE training done ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    # The campaign's smooth target: MLE projection of the training counts,
    # then exact Born probabilities per canonical basis.
    counts = mle.bits_to_counts(data.bits)
    rho = mle.make_mle(N, data.basis_labels)(jnp.asarray(counts, jnp.float32))
    rots = from_complex(measure.rotation_unitaries(data.basis_labels))
    target = np.asarray(measure.batched_probs_mixed(
        CArray(rho.re[None], rho.im[None]), rots)[0], np.float64)
    target = target / target.sum(-1, keepdims=True)
    ent = -np.sum(target * np.log(np.maximum(target, 1e-300)), axis=-1)
    low = np.argsort(ent)[: max(len(ent) // 10, 1)]  # Z-sector decile
    print(f"[mine] MLE target built; floor {ent.mean():.5f}, "
          f"Z-sector floor {ent[low].mean():.5f}", flush=True)

    @jax.jit
    def ce_all(params):
        def denoise_fn(x, t, b):
            return model.apply({"params": params}, x, t, b)

        dist = chain_distribution(
            denoise_fn, N, schedule, cfg.diffusion.exact,
            basis_idx=jnp.arange(3**N, dtype=jnp.int32))
        return -jnp.sum(
            jnp.asarray(target, jnp.float32)
            * jnp.log(jnp.maximum(dist, 1e-12)), axis=-1)

    def profile(params):
        exc = np.asarray(ce_all(params), np.float64) - ent
        return {
            "mean": float(exc.mean()),
            "zsector": float(exc[low].mean()),
            "max": float(exc.max()),
        }

    def distill(state, *, steps, salt, hard=0.0, accum=ACCUM):
        return training.finetune_chain(
            state, target, schedule, N, steps=steps, learning_rate=LR,
            exact=cfg.diffusion.exact, basis_batch=BASIS_BATCH,
            key=jax.random.fold_in(k_train, 0x4A8D + salt),
            steps_per_call=50, accum=accum, hard_frac=hard,
        )

    t0 = time.perf_counter()
    st_floor, _, iw = distill(state0, steps=WARM, salt=0)
    p = profile(st_floor.params)
    print(f"[mine] warmup (uniform {WARM}@{ACCUM}): excess mean "
          f"{p['mean']:.5f} zsector {p['zsector']:.5f} max {p['max']:.5f} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    results = {"floor": float(ent.mean()), "warmup": p}
    for arm, hard in [("uniform", 0.0), ("hard50", 0.5), ("hard90", 0.9)]:
        t0 = time.perf_counter()
        st, _, info = distill(st_floor, steps=S, salt=17, hard=hard)
        p = profile(st.params)
        results[arm] = p
        print(f"[mine] {arm}: excess mean {p['mean']:.5f} zsector "
              f"{p['zsector']:.5f} max {p['max']:.5f} "
              f"(CE {info['train_ce_before']:.5f} -> "
              f"{info['train_ce_after']:.5f}, "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "diag_hard_mining.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[mine] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
