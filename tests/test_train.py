"""Training-loop tests, incl. the reference's sanity-check memorization test.

The sanity check mirrors ``RQC_dataset_building_phase/main.py:38-59``: train
on synthetic perfectly-correlated Bell counts (50% '00', 50% '11' in the Z
basis) and verify the model can memorise the classical correlation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddqst_tpu import train as training
from ddqst_tpu.config import TrainConfig
from ddqst_tpu.models import ConditionalD3PM
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules


def _sanity_bell_data(num=512):
    """50% '00' / 50% '11' in the Z basis (basis_idx 8 of 9 for N=2)."""
    half = num // 2
    bits = np.concatenate(
        [np.zeros((half, 2), np.int8), np.ones((num - half, 2), np.int8)]
    )
    basis = np.full((num,), 8, np.int32)
    return jnp.asarray(bits), jnp.asarray(basis)


def _tiny_model(T=10):
    return ConditionalD3PM(
        num_qubits=2, num_bases=9, num_timesteps=T,
        embed_dim=16, hidden_dim=64, num_blocks=2,
    )


def test_fit_loss_decreases(key):
    bits, basis = _sanity_bell_data()
    model = _tiny_model()
    sched = schedules.cosine_schedule(10)
    cfg = TrainConfig(batch_size=128, learning_rate=3e-3, optimizer="adam",
                      num_epochs=30, log_every=0, eval_every=0)
    state, losses = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    losses = np.asarray(losses)
    # CE floor is high at large t (the channel destroys information); check
    # a clear decrease, not an absolute value.
    assert losses[-1] < losses[0] - 0.08
    assert int(state.step) == 30 * (512 // 128)


def test_sanity_check_memorization(key):
    """End of training, generated Z-basis samples are '00'/'11' correlated.

    Uses the cosine schedule with the renoise sampler (the quality path —
    the factorised exact posterior under cosine freezes correlations early;
    see ops.diffusion.p_sample docstring).
    """
    bits, basis = _sanity_bell_data()
    model = _tiny_model(T=50)
    sched = schedules.cosine_schedule(50)
    cfg = TrainConfig(batch_size=128, learning_rate=1e-3, optimizer="adam",
                      num_epochs=200, log_every=0, eval_every=0)
    state, _ = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )

    def denoise_fn(x, t, b):
        return state.apply_fn({"params": state.params}, x, t, b)

    out = diff.p_sample(
        jax.random.fold_in(key, 1), denoise_fn,
        jnp.full((512,), 8, jnp.int32), 2, sched, exact=False,
    )
    got = np.asarray(out)
    corr = (got[:, 0] == got[:, 1]).mean()
    assert corr > 0.9, f"correlation only {corr}"
    assert 0.2 < got[:, 0].mean() < 0.8  # both modes present


def test_ema_is_debiased(key):
    """Debiased EMA: with lr=0 (params frozen at init), the EMA-final
    params must equal the params exactly, for ANY epoch count — the
    naive first-epoch-seeded EMA also passes this, but only the debiased
    zero-init form keeps early epochs from dominating long runs (the
    N=10 renoise500_big regression: TV 0.405 with lagged EMA vs 0.213
    without)."""
    bits, basis = _sanity_bell_data(128)
    model = _tiny_model()
    sched = schedules.cosine_schedule(10)
    cfg = TrainConfig(batch_size=64, learning_rate=0.0, optimizer="adam",
                      num_epochs=3, ema_decay=0.999, log_every=0,
                      eval_every=0)
    state, _ = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    k_init, _ = jax.random.split(key)  # fit derives its init key this way
    ref = training.create_state(k_init, model, cfg, 2)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)


def test_eval_loss_runs(key):
    bits, basis = _sanity_bell_data(128)
    model = _tiny_model()
    sched = schedules.cosine_schedule(10)
    cfg = TrainConfig(batch_size=64, num_epochs=1, log_every=0, eval_every=0)
    state, _ = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    vl = training.eval_loss(state, key, bits, basis, sched, 64)
    assert np.isfinite(float(vl))


def test_optimizer_selection():
    assert training.make_optimizer(TrainConfig(optimizer="adamw")) is not None
    assert training.make_optimizer(TrainConfig(optimizer="adam")) is not None
    with pytest.raises(ValueError):
        training.make_optimizer(TrainConfig(optimizer="rmsprop"))


def test_checkpoint_roundtrip(key, tmp_path):
    from ddqst_tpu.utils import checkpoint as ckpt

    bits, basis = _sanity_bell_data(128)
    model = _tiny_model()
    sched = schedules.cosine_schedule(10)
    cfg = TrainConfig(batch_size=64, num_epochs=2, log_every=0, eval_every=0,
                      checkpoint_dir=str(tmp_path / "ck"))
    state, _ = training.fit(
        key, model, bits, basis, cfg, sched, log_fn=lambda *a: None
    )
    template = training.create_state(key, model, cfg, 2)
    restored, step = ckpt.restore_checkpoint(str(tmp_path / "ck"), template)
    assert step == 2
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))