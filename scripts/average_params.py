"""Average K orbax params snapshots (offline Polyak / iterate averaging).

SGD at a minibatch noise floor bounces around the basin center; the
average of iterates sits closer to it than any single iterate (classical
Polyak-Ruppert averaging). Segment snapshots of a segmented distillation
campaign (scripts/run_frontier_segments.py) are exactly such iterates —
this tool averages them into a new snapshot at zero gradient cost, to be
evaluated with ``--child_role eval`` / ``eval_chain_ce_subset.py``.

Usage:
  python scripts/average_params.py --out frontier_work/avg_params \
      frontier_work/ghz8_mle_hot_seg1_params \
      frontier_work/ghz8_mle_hot_seg2_params ...
"""

from __future__ import annotations

import argparse
import os

# Pure host-side tree arithmetic: drop the axon PJRT factory (its init
# costs ~4 min) and stay on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_xb._topology_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("snaps", nargs="+", help="orbax params snapshot dirs")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from ddqst_tpu.utils import checkpoint as ckpt

    trees = [ckpt.restore_params(p, None) for p in args.snaps]
    avg = jax.tree.map(lambda *xs: sum(xs[1:], xs[0]) / len(xs), *trees)
    ckpt.save_params(args.out, avg)
    print(f"averaged {len(trees)} snapshots -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
