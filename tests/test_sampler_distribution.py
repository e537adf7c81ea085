"""sampler_distribution == infinite-shot limit of sample_all_bases."""

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import schedules


def _denoiser(n):
    def fn(params, x, t, b):
        tilt = (b % 3).astype(jnp.float32)[:, None] - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 2.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    return fn


def test_distribution_matches_sampled(key):
    n = 2
    s = schedules.cosine_schedule(15)
    fn = _denoiser(n)
    dist = diff.sampler_distribution(key, fn, {}, n, s, exact=False)
    assert dist.shape == (9, 4)
    np.testing.assert_allclose(np.asarray(dist.sum(-1)), 1.0, atol=1e-5)

    samples = diff.sample_all_bases(
        jax.random.fold_in(key, 1), fn, {}, n, 4000, s, exact=False
    )
    idx = np.asarray(samples[..., 0] + 2 * samples[..., 1])
    for b in range(9):
        emp = np.bincount(idx[b], minlength=4) / 4000
        np.testing.assert_allclose(emp, np.asarray(dist[b]), atol=0.04)


def test_distribution_certain_denoiser(key):
    # A denoiser certain of x0=(1, 0) concentrates all mass on index 1.
    n = 2
    s = schedules.cosine_schedule(20)
    target = jnp.array([1, 0], jnp.float32)

    def fn(params, x, t, b):
        logit1 = jnp.broadcast_to((2 * target - 1) * 12.0, x.shape)
        return jnp.stack([-logit1, logit1], axis=-1)

    dist = diff.sampler_distribution(key, fn, {}, n, s, exact=False)
    np.testing.assert_allclose(np.asarray(dist[:, 1]), 1.0, atol=1e-3)

def test_chain_distribution_basis_subset():
    """chain_distribution(basis_idx=S) == full chain's rows S (each basis'
    chain is independent — exact restriction, not approximation)."""
    n = 2
    s = schedules.cosine_schedule(12)
    fn = _denoiser(n)

    def denoise(x, t, b):
        return fn({}, x, t, b)

    full = diff.chain_distribution(denoise, n, s, exact=False)
    sub = diff.chain_distribution(
        denoise, n, s, exact=False, basis_idx=jnp.asarray([7, 0, 3])
    )
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full)[[7, 0, 3]], atol=1e-6
    )


def test_chain_distribution_all_bases_chunked():
    """chain_distribution_all_bases (the zero-shot-noise eval tail) ==
    the unchunked chain over every canonical basis, for any max_rows
    chunking (per-basis chains are independent)."""
    n = 2
    s = schedules.cosine_schedule(12)
    fn = _denoiser(n)

    def denoise(x, t, b):
        return fn({}, x, t, b)

    full = np.asarray(diff.chain_distribution(denoise, n, s, exact=False))
    # max_rows=8 -> chunks of 2 bases (and a remainder), forcing the
    # chunked path; apply_fn signature matches flax's apply.
    chunked = diff.chain_distribution_all_bases(
        lambda v, x, t, b: fn(v["params"], x, t, b), {}, n, s,
        exact=False, max_rows=8,
    )
    assert chunked.shape == (9, 4)
    np.testing.assert_allclose(np.asarray(chunked), full, atol=1e-6)
    # Shadow form: label conditioning ([rows, N] b) over a basis subset.
    from ddqst_tpu.ops import pauli

    def fn_lab(params, x, t, b):
        tilt = (b[:, :1] % 3).astype(jnp.float32) - 1.0
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 2.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    labels = jnp.asarray(pauli.all_basis_labels(n)[[5, 1, 8]], jnp.int32)
    sub = diff.chain_distribution_all_bases(
        lambda v, x, t, b: fn_lab(v["params"], x, t, b), {}, n, s,
        exact=False, basis_labels=labels, max_rows=4,
    )
    direct = diff.chain_distribution(
        lambda x, t, b: fn_lab({}, x, t, b), n, s, exact=False,
        basis_labels=labels,
    )
    np.testing.assert_allclose(np.asarray(sub), np.asarray(direct), atol=1e-6)


def test_finetune_chain_basis_minibatch(key):
    """Minibatched distillation descends the same objective: the chain CE
    against the target drops after a few minibatched steps."""
    from ddqst_tpu import train as training
    from ddqst_tpu.config import TrainConfig
    from ddqst_tpu.models import ConditionalD3PM

    n = 2
    s = schedules.cosine_schedule(10)
    model = ConditionalD3PM(num_qubits=n, num_bases=9, num_timesteps=10,
                            embed_dim=16, hidden_dim=32, num_blocks=1)
    bits = jnp.zeros((64, n), jnp.int8)
    basis = jnp.tile(jnp.arange(9, dtype=jnp.int32), 8)[:64]
    cfg = TrainConfig(batch_size=32, learning_rate=1e-3, optimizer="adam",
                      num_epochs=2, log_every=0, eval_every=0)
    state, _ = training.fit(key, model, bits, basis, cfg, s,
                            log_fn=lambda *a: None)
    target = np.zeros((9, 4), np.float32)
    target[:, 0] = 1.0  # all-zeros outcome in every basis

    def chain_ce(st):
        def denoise(x, t, b):
            return st.apply_fn({"params": st.params}, x, t, b)

        dist = diff.chain_distribution(denoise, n, s, exact=False)
        return float(np.mean(
            -np.sum(target * np.log(np.maximum(np.asarray(dist), 1e-12)), -1)
        ))

    before = chain_ce(state)
    new_state, losses, info = training.finetune_chain(
        state, target, s, n, steps=30, learning_rate=3e-3, exact=False,
        basis_batch=3, key=jax.random.fold_in(key, 1),
    )
    assert losses.shape == (30,)
    after = chain_ce(new_state)
    assert after < before - 0.05
    # The info dict reports FULL-grid CE (not minibatch estimates).
    np.testing.assert_allclose(info["train_ce_before"], before, rtol=1e-4)
    np.testing.assert_allclose(info["train_ce_after"], after, rtol=1e-4)


def test_finetune_chain_heldout_step_selection(key):
    """With val_counts, the recipe keeps the params with the best held-out
    full-grid CE and can early-stop — a target that disagrees with the
    held-out counts must select (near) step 0 instead of overfitting."""
    from ddqst_tpu import train as training
    from ddqst_tpu.config import TrainConfig
    from ddqst_tpu.models import ConditionalD3PM

    n = 2
    s = schedules.cosine_schedule(10)
    model = ConditionalD3PM(num_qubits=n, num_bases=9, num_timesteps=10,
                            embed_dim=16, hidden_dim=32, num_blocks=1)
    # Train the denoiser toward the uniform distribution (random bits).
    bits = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (512, n)), jnp.int8
    )
    basis = jnp.tile(jnp.arange(9, dtype=jnp.int32), 57)[:512]
    cfg = TrainConfig(batch_size=64, learning_rate=1e-3, optimizer="adam",
                      num_epochs=5, log_every=0, eval_every=0)
    state, _ = training.fit(key, model, bits, basis, cfg, s,
                            log_fn=lambda *a: None)
    # Distillation target: a DEGENERATE distribution (all-zeros outcome);
    # held-out counts: uniform (matching what the chain already emits).
    # Descending the target overfits, so held-out CE worsens immediately
    # and step selection must stay at/near 0.
    target = np.zeros((9, 4), np.float32)
    target[:, 0] = 100.0
    val = np.full((9, 4), 25.0, np.float32)
    new_state, losses, info = training.finetune_chain(
        state, target, s, n, steps=100, learning_rate=3e-3, exact=False,
        key=jax.random.fold_in(key, 1), steps_per_call=10,
        val_counts=val, val_patience=2,
    )
    assert info["best_step"] == 0
    assert losses.shape[0] < 100  # early-stopped
    # Selected params are the step-0 (undistilled) ones.
    before = info["val_history"][0][1]
    assert info["best_val_ce"] == before
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chain_distribution_basis_labels():
    """chain_distribution(basis_labels=L) == the basis_idx path when L are
    the canonical labels of those indices (same conditioning, the shadow
    route's per-qubit form)."""
    from ddqst_tpu.ops import pauli

    n = 2
    s = schedules.cosine_schedule(12)
    labels_all = jnp.asarray(pauli.all_basis_labels(n), jnp.int32)

    def fn_lab(x, t, lab):
        tilt = jnp.sum(lab, axis=-1, keepdims=True).astype(jnp.float32) - n
        logit1 = (2.0 * x.astype(jnp.float32) - 1.0) * 2.5 + tilt
        return jnp.stack([-logit1, logit1], axis=-1)

    def fn_idx(x, t, b):
        return fn_lab(x, t, labels_all[b])

    full = diff.chain_distribution(fn_idx, n, s, exact=False)
    sub = diff.chain_distribution(
        fn_lab, n, s, exact=False,
        basis_labels=labels_all[np.asarray([7, 0, 3])],
    )
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full)[[7, 0, 3]], atol=1e-6
    )


def test_finetune_chain_basis_labels(key):
    """Shadow-form distillation: finetune_chain(basis_labels=[B,N]) with a
    transformer denoiser descends the chain CE over exactly the sampled
    bases (minibatched over label rows)."""
    from ddqst_tpu import train as training
    from ddqst_tpu.config import ModelConfig, TrainConfig
    from ddqst_tpu.models import build_model

    n, t_steps, n_bases = 3, 8, 6
    s = schedules.cosine_schedule(t_steps)
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 3, (n_bases, n)), jnp.int32)
    model = build_model(
        ModelConfig(arch="transformer", embed_dim=16, hidden_dim=32,
                    num_blocks=1, num_heads=2), n, t_steps,
    )
    bits = jnp.asarray(rng.integers(0, 2, (240, n)), jnp.int8)
    lab_rows = jnp.repeat(labels, 40, axis=0)
    cfg = TrainConfig(batch_size=64, learning_rate=2e-3, optimizer="adam",
                      num_epochs=2, log_every=0, eval_every=0)
    state, _ = training.fit(key, model, bits, lab_rows, cfg, s,
                            log_fn=lambda *a: None)
    target = np.zeros((n_bases, 2**n), np.float32)
    target[:, 0] = 1.0  # all-zeros outcome in every sampled basis

    def chain_ce(st):
        def denoise(x, t, b):
            return st.apply_fn({"params": st.params}, x, t, b)

        dist = diff.chain_distribution(
            denoise, n, s, exact=False, basis_labels=labels
        )
        return float(np.mean(
            -np.sum(target * np.log(np.maximum(np.asarray(dist), 1e-12)), -1)
        ))

    before = chain_ce(state)
    new_state, losses, info = training.finetune_chain(
        state, target, s, n, steps=30, learning_rate=3e-3, exact=False,
        basis_batch=2, key=jax.random.fold_in(key, 1),
        basis_labels=labels,
    )
    after = chain_ce(new_state)
    assert after < before - 0.05
    np.testing.assert_allclose(info["train_ce_before"], before, rtol=1e-4)
    np.testing.assert_allclose(info["train_ce_after"], after, rtol=1e-4)


def test_sample_all_bases_chunked_tables_and_distribution(key):
    """Amortised generation (sample_all_bases_chunked): the bounded-dispatch
    table chunks reproduce grid_p1_tables, and the chunked table walk's
    empirical distribution matches the exact chain distribution."""
    n = 2
    t_steps = 11  # not a multiple of the chunk size -> exercises padding
    s = schedules.cosine_schedule(t_steps)
    fn = _denoiser(n)

    def denoise(x, t, b):
        return fn({}, x, t, b)

    ref = diff.grid_p1_tables(denoise, n, s, exact=False)
    m = 4
    n_chunks = 3
    ts = jnp.arange(t_steps, 0, -1)
    ts_pad = jnp.concatenate([ts, jnp.ones((n_chunks * m - t_steps,), ts.dtype)])
    parts = [
        diff._table_chunk(fn, {}, ts_pad[i * m : (i + 1) * m], s, n, False, m)
        for i in range(n_chunks)
    ]
    got = jnp.concatenate(parts, axis=0)[:t_steps]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # max_chains below bases*shots forces the multi-walk path (3 calls).
    shots = 4200
    samples = diff.sample_all_bases_chunked(
        key, fn, {}, n, shots, s, exact=False, max_chains=9 * 1500
    )
    assert samples.shape == (9, shots, n)
    dist = diff.chain_distribution(denoise, n, s, exact=False)
    idx = np.asarray(samples[..., 0] + 2 * samples[..., 1])
    for b in range(9):
        emp = np.bincount(idx[b], minlength=4) / shots
        np.testing.assert_allclose(emp, np.asarray(dist[b]), atol=0.04)


def test_tables_row_chunked_matches_full(key):
    """The row-chunked table path (grid larger than the per-forward row
    budget — the N>=8 regime) reproduces the unbudgeted tables exactly,
    both through _tables_for_ts directly and through the donated
    multi-dispatch assembly of sample_all_bases_chunked."""
    n = 2  # Gtot = 9 * 4 = 36 rows
    t_steps = 7
    s = schedules.cosine_schedule(t_steps)
    fn = _denoiser(n)

    def denoise(x, t, b):
        return fn({}, x, t, b)

    ref = diff.grid_p1_tables(denoise, n, s, exact=False)
    ts = jnp.arange(t_steps, 0, -1)
    # row_budget=16 < Gtot=36 forces the padded lax.map-over-row-blocks
    # branch (nb=3, 12 padding rows). Equal up to one-ULP rounding (the
    # forwards run at different batch shapes).
    got = diff._tables_for_ts(denoise, ts, n, s, False, row_budget=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # max_table_rows below Gtot -> m=1, 7 dispatches assembled in place
    # via the donated buffer; the samples must follow the exact chain.
    shots = 4000
    samples = diff.sample_all_bases_chunked(
        key, fn, {}, n, shots, s, exact=False, max_table_rows=16
    )
    assert samples.shape == (9, shots, n)
    dist = diff.chain_distribution(denoise, n, s, exact=False)
    idx = np.asarray(samples[..., 0] + 2 * samples[..., 1])
    for b in range(9):
        emp = np.bincount(idx[b], minlength=4) / shots
        np.testing.assert_allclose(emp, np.asarray(dist[b]), atol=0.04)
