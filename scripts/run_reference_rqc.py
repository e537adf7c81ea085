"""Full-budget phase-4 workflow on the reference's shipped N=3 RQC dataset.

convert -> train (phase-4 budget) -> fidelity-lift evaluation, writing
metrics + plots to examples/results_reference_rqc/.
"""
import os
import time

import jax
import numpy as np

from ddqst_tpu import evaluate as ev
from ddqst_tpu import pipeline
from ddqst_tpu.config import get_preset
from ddqst_tpu.data import records
from ddqst_tpu.ops.schedules import make_schedule

SRC = "/root/reference/Datapoints/rqc_N3_data"
WORK = "examples/results_reference_rqc"


def main():
    os.makedirs(WORK, exist_ok=True)
    shards = os.path.join(WORK, "shards")
    if not os.path.isdir(shards) or not os.listdir(shards):
        t0 = time.time()
        records.convert_reference_pt(SRC, shards)
        print(f"converted in {time.time()-t0:.1f}s")
    recs = records.load_dataset(shards)
    print(f"{len(recs)} circuits loaded")

    cfg = get_preset("rqc")  # phase-4 budget: 30 epochs, bs 1024, adam 1e-3
    t0 = time.time()
    state, eval_recs = pipeline.train_on_dataset(
        cfg, recs, save_dir=WORK, run_name="ref_model",
        num_eval_circuits=50, seed=0,
    )
    print(f"trained in {time.time()-t0:.1f}s ({int(state.step)} steps)")

    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    t0 = time.time()
    out = ev.evaluate_dataset(
        jax.random.key(1), eval_recs, state.apply_fn,
        {"params": state.params}, 3, schedule,
        shots_infer=2000, exact=cfg.diffusion.exact,
        out_dir=WORK, log_fn=lambda *a: None,
    )
    print(f"evaluated {len(out)} circuits in {time.time()-t0:.1f}s")
    raw = np.mean([r["raw_fidelity"] for r in out])
    d3 = np.mean([r["d3pm_fidelity"] for r in out])
    print(f"MEAN raw={raw:.4f} d3pm={d3:.4f} zbias={out[0]['z_bias']:.3f}")


if __name__ == "__main__":
    main()
