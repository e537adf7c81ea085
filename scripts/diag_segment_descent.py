"""CPU A/B diagnosis of the GHZ-8 segment-boundary chain-CE descent collapse.

The round-3 campaign measured Δ(chain CE) = 0.00784 in segment 0 but only
0.00057 in segment 1 at identical step count / lr / coverage (VERDICT r3
weak #1). Two candidate mechanisms:

  (a) Adam-moment reset at the segment boundary (the driver chained only
      params) destroys the descent trajectory.
  (b) Minibatch-gradient noise floor: at ~1% basis coverage/step the SGD
      noise floor is reached within segment 0, and further equal-lr
      equal-coverage steps cannot descend — segmentation is irrelevant.

This script reproduces the regime on CPU at GHZ-5 (243 bases, basis_batch 4
= 1.6% coverage/step) and measures the per-segment full-grid chain-CE
deltas under five protocols, all from the SAME CE-trained params:

  single   : one 2S-step finetune_chain call (the no-boundary reference)
  params   : 2 x S steps, params-only chaining (the round-3 driver)
  optchain : 2 x S steps, Adam moments chained (init_opt_state)
  accum4   : 2 x S steps, opt chained + 4x gradient accumulation
             (VERDICT r3 next-#2: raise per-step coverage, not steps)
  lrdecay  : 2 x S steps, fresh opt, segment-2 lr = lr/3 (noise-floor
             lowering control)

Interpretation: if optchain's segment-2 delta ~ single's second-half delta
>> params', mechanism (a); if ALL equal-coverage arms flatline in segment 2
but accum4 keeps descending, mechanism (b) and the GHZ-8 campaign needs
coverage (chain_accum), not more steps.

Usage (CPU, ~10 min):
  env DDQST_CPU=1 PYTHONPATH=/root/repo python scripts/diag_segment_descent.py
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
from ddqst_tpu.ops.schedules import make_schedule

S = 300          # steps per segment
BASIS_BATCH = 4  # 4/243 = 1.6% coverage/step (GHZ-8 ran 64/6561 = 1%)
LR = 1e-3        # the campaign's chain_lr


def make_cfg():
    base = get_preset("rqc")
    return base.replace(
        name="diag5",
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
            num_qubits=5, state_type="ghz", noise_type="readout",
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
    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, 5, cfg.diffusion.num_timesteps)
    t0 = time.perf_counter()
    state0, _ = training.fit(k_train, model, x, basis, cfg.train, schedule)
    print(f"[diag] CE training done ({time.perf_counter() - t0:.0f}s)",
          flush=True)
    target = mle.bits_to_counts(data.bits)

    def distill(state, *, steps, salt, lr=LR, accum=1, init_opt=None):
        return training.finetune_chain(
            state, target, schedule, 5, steps=steps, learning_rate=lr,
            exact=cfg.diffusion.exact, basis_batch=BASIS_BATCH,
            key=jax.random.fold_in(k_train, 0xD157 + salt),
            steps_per_call=50, accum=accum, init_opt_state=init_opt,
        )

    results = {}

    def report(arm, deltas, ce_path):
        results[arm] = {"deltas": deltas, "ce": ce_path}
        print(f"[diag] {arm}: CE {' -> '.join(f'{c:.5f}' for c in ce_path)}"
              f"  deltas {['%.5f' % d for d in deltas]}", flush=True)

    # single: one 2S-step run (no boundary).
    t0 = time.perf_counter()
    st, losses, info = distill(state0, steps=2 * S, salt=1)
    # Mid-run CE proxy: mean minibatch loss over a window (unbiased
    # estimate of the full-grid CE at those params).
    mid_proxy = float(jnp.mean(losses[S - 50:S]))
    end_proxy = float(jnp.mean(losses[-50:]))
    report("single", [info["train_ce_before"] - info["train_ce_after"]],
           [info["train_ce_before"], info["train_ce_after"]])
    print(f"[diag] single loss-window proxies: mid {mid_proxy:.5f} "
          f"end {end_proxy:.5f} ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    # params-only chaining (round-3 driver behaviour).
    st1, _, i1 = distill(state0, steps=S, salt=1)
    st2, _, i2 = distill(st1, steps=S, salt=2)
    report("params", [i1["train_ce_before"] - i1["train_ce_after"],
                      i2["train_ce_before"] - i2["train_ce_after"]],
           [i1["train_ce_before"], i1["train_ce_after"],
            i2["train_ce_after"]])

    # opt-chained.
    st1, _, i1 = distill(state0, steps=S, salt=1)
    st2, _, i2 = distill(st1, steps=S, salt=2,
                         init_opt=i1["final_opt_state"])
    report("optchain", [i1["train_ce_before"] - i1["train_ce_after"],
                        i2["train_ce_before"] - i2["train_ce_after"]],
           [i1["train_ce_before"], i1["train_ce_after"],
            i2["train_ce_after"]])

    # accum4: opt chained + 4x coverage per step.
    st1, _, i1 = distill(state0, steps=S, salt=1, accum=4)
    st2, _, i2 = distill(st1, steps=S, salt=2, accum=4,
                         init_opt=i1["final_opt_state"])
    report("accum4", [i1["train_ce_before"] - i1["train_ce_after"],
                      i2["train_ce_before"] - i2["train_ce_after"]],
           [i1["train_ce_before"], i1["train_ce_after"],
            i2["train_ce_after"]])

    # lrdecay: fresh opt, segment 2 at lr/3.
    st1, _, i1 = distill(state0, steps=S, salt=1)
    st2, _, i2 = distill(st1, steps=S, salt=2, lr=LR / 3)
    report("lrdecay", [i1["train_ce_before"] - i1["train_ce_after"],
                       i2["train_ce_before"] - i2["train_ce_after"]],
           [i1["train_ce_before"], i1["train_ce_after"],
            i2["train_ce_after"]])

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "diag_segment_descent.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[diag] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
