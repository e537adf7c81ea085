"""Orbax checkpointing: params + optimizer state + step, with resume.

The reference saves only a final ``state_dict`` (``RQC_dataset_building_
phase/main.py:132``) and restores it in ``evaluate.py:61``; there is no
mid-training checkpointing and no optimizer state (SURVEY.md §5). Here the
full train state checkpoints at a configurable cadence and training can
resume from the latest step.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(ckpt_dir: str, state, step: int) -> None:
    """Save a train state (or any pytree) at ``step``."""
    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template_state, step: int | None = None):
    """Restore into the structure of ``template_state``.

    Returns (state, step). ``template_state`` provides the pytree structure
    and shapes (create it with ``train.create_state``).
    """
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    target = _to_pytree(template_state)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    if hasattr(template_state, "replace"):
        return (
            template_state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=restored["step"],
            ),
            step,
        )
    return restored, step


def save_params(path: str, params) -> None:
    """Standalone params snapshot (the reference's final-save analogue)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params, force=True)
    ckpt.wait_until_finished()
    ckpt.close()


def restore_params(path: str, template=None):
    """Restore a params snapshot.

    ``template=None`` restores into the SAVED structure but with default
    (local-device) placement — the snapshot's recorded shardings are
    ignored, so a TPU-written snapshot restores on a CPU-only host
    (``scripts/average_params.py`` / offline evaluation tooling).
    """
    ckpt = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    if template is None:
        meta = ckpt.metadata(path).item_metadata
        dev = jax.local_devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(dev)
        template = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta,
        )
    out = ckpt.restore(path, target=template)
    ckpt.close()
    return out


def _to_pytree(state):
    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": jax.numpy.asarray(state.step),
        }
    return state
