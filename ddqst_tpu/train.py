"""Jitted training loop: optax optimizers, scan-based epochs, checkpoints.

Replaces the reference training loops (``multi_qubit_any_state/
main.py:123-148``, ``RQC_dataset_building_phase/main.py:100-133``): the
whole dataset lives on device as ``(bits [M,N], basis [M])`` arrays, each
epoch is one jitted ``lax.scan`` over shuffled batches (one dispatch per
epoch instead of one per batch), and data parallelism comes from sharding
the batch axis over the mesh (gradients all-reduce automatically under
``jit`` with replicated params).

Optimizers mirror the reference: AdamW lr 1e-4 (phases 2-3,
``multi_qubit_special_states/main.py:77``) and Adam lr 1e-3 (phase 4,
``RQC.../main.py:98``), selected by :class:`TrainConfig`.

Checkpointing goes beyond the reference's end-of-training
``torch.save(state_dict)`` (``RQC.../main.py:132``): orbax saves params +
optimizer state + step at a configurable cadence with step-indexed resume
(SURVEY.md §5 checkpoint/resume gap). The PRNG key is NOT persisted —
resumed runs deterministically replay epoch keys from the per-epoch
``fold_in`` stream.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ddqst_tpu.config import TrainConfig
from ddqst_tpu.ops.diffusion import denoising_loss
from ddqst_tpu.ops.schedules import DiffusionSchedule


class TrainState(train_state.TrainState):
    pass


def make_optimizer(
    cfg: TrainConfig, total_steps: int | None = None
) -> optax.GradientTransformation:
    if cfg.lr_schedule == "cosine" and total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(total_steps // 20, 1),
            decay_steps=total_steps,
            end_value=cfg.learning_rate * 0.02,
        )
    else:
        lr = cfg.learning_rate
    if cfg.optimizer == "adamw":
        return optax.adamw(lr)
    if cfg.optimizer == "adam":
        return optax.adam(lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_state(
    key: jax.Array, model, cfg: TrainConfig, num_qubits: int,
    total_steps: int | None = None,
) -> TrainState:
    dummy_x = jnp.zeros((2, num_qubits), dtype=jnp.int8)
    dummy_t = jnp.ones((2,), dtype=jnp.int32)
    dummy_b = jnp.zeros((2,), dtype=jnp.int32)
    params = model.init(key, dummy_x, dummy_t, dummy_b)["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(cfg, total_steps),
    )


def loss_for_params(apply_fn, params, key, bits, basis, schedule, t_max=0):
    def denoise_fn(x, t, b):
        return apply_fn({"params": params}, x, t, b)

    return denoising_loss(key, denoise_fn, bits, basis, schedule, t_max=t_max)


def make_train_step(schedule: DiffusionSchedule, t_max: int = 0) -> Callable:
    """One gradient step; jit happens at the epoch level."""

    def step(state: TrainState, key, bits, basis):
        loss, grads = jax.value_and_grad(loss_for_params, argnums=1)(
            state.apply_fn, state.params, key, bits, basis, schedule, t_max
        )
        return state.apply_gradients(grads=grads), loss

    return step


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "batch_sharding", "t_max"),
    donate_argnums=(0,),
)
def _run_epoch(
    state: TrainState,
    epoch_key: jax.Array,
    bits: jnp.ndarray,
    basis: jnp.ndarray,
    schedule: DiffusionSchedule,
    batch_size: int,
    batch_sharding=None,
    t_max: int = 0,
):
    """One epoch: shuffle, split into full batches, scan gradient steps.

    With ``batch_sharding`` set (a NamedSharding over the 'data' axis), the
    dataset stays replicated, each gathered batch is sharding-constrained so
    per-device compute covers its slice, and the gradient all-reduce is
    inserted by XLA — the canonical jit-DP pattern.
    """
    m = bits.shape[0]
    batch_size = min(batch_size, m)  # datasets smaller than one batch
    steps = max(m // batch_size, 1)
    usable = steps * batch_size
    kp, ks = jax.random.split(epoch_key)
    perm = jax.random.permutation(kp, m)[:usable].reshape(steps, batch_size)
    step_fn = make_train_step(schedule, t_max)

    def body(st, inp):
        idx, i = inp
        xb, bb = bits[idx], basis[idx]
        if batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sh_b = NamedSharding(
                batch_sharding.mesh,
                PartitionSpec(
                    batch_sharding.spec[0], *([None] * (bb.ndim - 1))
                ),
            )
            xb = jax.lax.with_sharding_constraint(xb, batch_sharding)
            bb = jax.lax.with_sharding_constraint(bb, sh_b)
        st, loss = step_fn(st, jax.random.fold_in(ks, i), xb, bb)
        return st, loss

    state, losses = jax.lax.scan(
        body, state, (perm, jnp.arange(steps, dtype=jnp.int32))
    )
    return state, jnp.mean(losses)


@functools.partial(jax.jit, static_argnames=("batch_size",))
def eval_loss(
    state: TrainState,
    key: jax.Array,
    bits: jnp.ndarray,
    basis: jnp.ndarray,
    schedule: DiffusionSchedule,
    batch_size: int,
):
    """Mean denoising CE over an eval set (no grad) — reference validation
    monitor (``RQC.../main.py:117-129``)."""
    m = bits.shape[0]
    batch_size = min(batch_size, m)  # datasets smaller than one batch
    steps = max(m // batch_size, 1)
    usable = steps * batch_size
    bi = bits[:usable].reshape(steps, batch_size, -1)
    ba = basis[:usable].reshape((steps, batch_size) + basis.shape[1:])

    def body(_, inp):
        i, xb, bb = inp
        loss = loss_for_params(
            state.apply_fn, state.params, jax.random.fold_in(key, i), xb, bb,
            schedule,
        )
        return None, loss

    _, losses = jax.lax.scan(
        body, None, (jnp.arange(steps, dtype=jnp.int32), bi, ba)
    )
    return jnp.mean(losses)


def chain_opt_template(params):
    """Zero-valued portable Adam-state pytree for :func:`finetune_chain`.

    Matches the structure of ``info['final_opt_state']`` so callers can
    build an orbax restore template from params alone (segment chaining:
    the GHZ-8 campaign measured a 13x chain-CE descent collapse at the
    first segment boundary when only params were chained).
    """
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {"count": jnp.zeros((), jnp.int32), "mu": z, "nu": z}


def finetune_chain(
    state: TrainState,
    target_counts,
    schedule: DiffusionSchedule,
    num_qubits: int,
    steps: int = 300,
    learning_rate: float = 1e-4,
    exact: bool | None = None,
    confusion=None,
    basis_batch: int = 0,
    key: jax.Array | None = None,
    steps_per_call: int = 25,
    val_counts=None,
    val_patience: int = 4,
    basis_labels=None,
    val_every_equiv: float = 2.0,
    accum: int = 1,
    init_opt_state=None,
    hard_frac: float = 0.0,
):
    """Exact-chain distillation: fine-tune the denoiser on the SAMPLER.

    Standard D3PM training minimises a per-step denoising CE — a surrogate
    for what inference actually does (run the full T-step reverse chain and
    histogram its outputs). At tomography scales the chain is a
    differentiable Markov chain on 2^N states per basis
    (:func:`ddqst_tpu.ops.diffusion.chain_distribution`), so after CE
    training we can descend the TRUE objective directly: cross-entropy
    between the chain's exact per-basis output distribution and the
    empirical training-count frequencies. This is the "distribution
    calibration against training counts" step that closes the residual
    model-estimation bias of the surrogate (the generative-pipeline
    fidelity gap: CE-trained GHZ-3 plateaus ≈0.986 while the counts
    themselves support ≥0.999).

    TPU-native by construction: each optimisation step is one
    backprop-through-scan over T steps of [3^N·2^N, H] matmuls — no
    sampling noise anywhere in the loss, so a few hundred full-batch Adam
    steps converge. Impossible in the reference architecture (its sampler
    is a Python loop over torch.multinomial draws,
    ``RQC_dataset_building_phase/diffusion.py:53-80``).

    Args:
      state: trained TrainState (params are the CE-trained weights).
      target_counts: ``[3^N, 2^N]`` per-canonical-basis outcome counts or
        frequencies (normalised internally).
      steps: full-batch Adam steps.
      exact: reverse rule, resolved exactly as at generation time — the
        distilled objective must match the sampler that will be used.
      confusion: optional ``[2^N, 2^N]`` readout confusion matrix
        (``M[i, j] = P(measure i | true j)``). When given, the chain's
        CLEAN output distribution is pushed through the channel inside the
        loss and matched against RAW noisy counts — exact maximum
        likelihood of the measured data under the known channel (the same
        statistically-optimal treatment as folding the confusion matrix
        into the MLE POVM, :mod:`ddqst_tpu.ops.mle`). This beats training
        against confusion-inverted ("mitigated") counts, whose clip +
        resample steps destroy information: on RQC-3 at 20k shots the
        mitigated-counts target itself caps at fidelity 0.9726 while raw
        counts support 0.9907.
      basis_batch: when > 0 and < 3^N, each Adam step descends the CE over
        that many uniformly-drawn bases instead of the full set. The
        chain is independent per basis, so the minibatch gradient is an
        unbiased estimator of the full one — this bounds the per-step
        grid at ``basis_batch·2^N`` rows where the full 3^N·2^N grid
        crashes the worker (N=6: 46,656 rows even remat'd).
      key: PRNG key for the basis minibatch draw (default: key(0)).
      val_counts: optional held-out ``[3^N, 2^N]`` counts (shots NOT in
        ``target_counts``). When given, the distillation temperature is
        AUTOMATED: after every dispatch chunk the full-grid chain CE
        against the held-out counts is evaluated (forward only, chunked
        over bases), the params with the best held-out CE are kept, and
        the loop early-stops after ``val_patience`` non-improving evals.
        This is the bias-variance criterion measured in RESULTS.md
        ("distillation temperature trades bias for data noise"): distill
        until the chain matches the counts only as far as the counts
        deserve matching — held-out CE is minimised by the true noisy
        distribution, not by the training counts, so overfitting shot
        noise (the hand-tuned hot recipe's failure mode at N=5) raises
        it and stops the run. The step-0 (undistilled) params are a
        candidate too, so distillation can never make things worse by
        this criterion.
      val_patience: consecutive non-improving held-out evals before stop.
      val_every_equiv: held-out evals are spaced by this many FULL-GRID
        EQUIVALENT steps (minibatched steps count as basis_batch/B of an
        equivalent), not by dispatch chunks. Without this scaling, a
        small-coverage minibatch run (e.g. 128 of 2187 bases at N=7)
        moves the held-out CE less than the improvement threshold per
        chunk and the stop fires at step 0 — measured live at GHZ-7,
        where per-chunk evals stopped a perfectly-descending chain at
        step 0 twice.
      accum: gradient-accumulation factor for minibatched runs: each Adam
        step averages the loss/gradient over ``accum`` disjoint
        ``basis_batch``-sized minibatches (one ``accum*basis_batch``
        draw without replacement), cutting gradient variance ``accum``-fold
        while every individual chain dispatch stays at the relay-proven
        ``basis_batch * 2^N`` grid rows. This is how per-step basis
        coverage is raised at N >= 8, where a single 256-basis dispatch
        (65,536 grid rows) exceeds the worker's proven program size: the
        GHZ-8 campaign hit a minibatch-noise floor at 1% coverage/step
        (chain-CE descent collapsed 13x between equal-budget segments).
        Per-dispatch walltime grows ~accum-fold — lower ``steps_per_call``
        to compensate.
      init_opt_state: optional portable Adam state (the
        ``{'count', 'mu', 'nu'}`` dict returned in
        ``info['final_opt_state']``) to resume optimisation from — chains
        Adam moments across warm-started segments instead of resetting
        them at every boundary. Only meaningful without ``val_counts``
        (best-params selection would desynchronise params and moments).
        Measured on CPU (scripts/diag_segment_descent.py) as slightly
        WORSE than a fresh-moment restart in the noise-floor regime —
        provided for A/B studies, not the campaign default.
      hard_frac: hard-basis mining for minibatched runs. The mean-over-
        bases CE dilutes the gradient of the few bases that still carry
        excess KL: measured at GHZ-8 (round 4), the chain's mean excess
        over 48 random bases was 0.0002 nats while the full-grid mean was
        0.0109 — the entire residual is concentrated in <~1% of bases
        (the low-entropy Z-sector that carries the GHZ coherence), and a
        uniform minibatch draw starves them of weight 100:1. With
        ``hard_frac`` = m > 0, the minibatch is drawn with probabilities
        ``(1-m)/B + m * excess_b / sum(excess)`` where ``excess_b`` is
        the per-basis KL(target || chain) measured at ENTRY (one full-grid
        forward pass, already computed for ``train_ce_before``) — an
        importance-weighted CE that restores gradient signal to the
        unsolved bases while the uniform component guards the solved ones
        against drift. Ignored for full-batch runs.
      basis_labels: optional ``[B, N]`` per-qubit basis labels (the shadow
        route's conditioning form). When given, the chain is distilled
        over exactly those B sampled bases instead of the canonical 3^N
        enumeration, ``target_counts``/``val_counts`` are ``[B, 2^N]``
        rows aligned with it, and ``basis_batch`` minibatches rows of the
        label array. This is what makes distillation tractable at shadow
        scale (N=10: a 1024-state chain over ~100-300 sampled bases).

    Returns:
      ``(new_state, losses [steps_run], info)`` — new_state carries the
      selected params. ``info`` always holds ``train_ce_before`` /
      ``train_ce_after`` (FULL-grid CE vs the target, so minibatched runs
      log real descent, not subset noise) and ``final_opt_state`` (the
      portable Adam-moments dict for segment chaining; see
      ``init_opt_state``); with ``val_counts`` it adds ``val_history``
      [(step, ce)], ``best_step`` and ``best_val_ce``.
    """
    import jax.numpy as jnp

    from ddqst_tpu.ops.diffusion import chain_distribution

    target = jnp.asarray(target_counts, jnp.float32)
    target = target / jnp.maximum(jnp.sum(target, -1, keepdims=True), 1e-9)
    conf_t = None if confusion is None else jnp.asarray(confusion, jnp.float32).T
    tx = optax.adam(learning_rate)
    labels = (
        None if basis_labels is None
        else jnp.asarray(basis_labels, jnp.int32)
    )
    num_bases = 3**num_qubits if labels is None else labels.shape[0]
    minibatched = 0 < basis_batch < num_bases

    def _chain(denoise_fn, bidx):
        if labels is None:
            return chain_distribution(
                denoise_fn, num_qubits, schedule, exact, basis_idx=bidx
            )
        lab = labels if bidx is None else labels[bidx]
        return chain_distribution(
            denoise_fn, num_qubits, schedule, exact, basis_labels=lab
        )

    def loss_fn(params, bidx):
        def denoise_fn(x, t, b):
            return state.apply_fn({"params": params}, x, t, b)

        dist = _chain(denoise_fn, bidx)
        tgt = target if bidx is None else target[bidx]
        if conf_t is not None:
            dist = dist @ conf_t  # p_meas(i) = sum_j M[i,j] p_clean(j)
        ce = -jnp.sum(tgt * jnp.log(jnp.maximum(dist, 1e-12)), axis=-1)
        return jnp.mean(ce)

    # Full-grid CE evaluator (forward only), chunked over bases so no
    # single dispatch exceeds ~3^5·2^5 grid rows (the chain is independent
    # per basis, so chunking is exact). Used for the honest before/after
    # log numbers and for the held-out early-stop criterion.
    if labels is None:
        chunk_b = 3 ** min(num_qubits, 5)
    else:  # shadow scale: bound grid rows per dispatch, not basis count
        # 8192 rows (not 16384): a [16384, H] transformer chain eval at
        # N=10 sits at the relay worker's multi-minute-program crash
        # threshold — measured crash at the first in-loop held-out eval.
        # DDQST_GRID_ROWS: campaign fallback knob — if the relay worker
        # repeatedly dies compiling the 8192-row program, a smaller cap
        # is the only shape change that can unblock a campaign.
        cap_rows = int(os.environ.get("DDQST_GRID_ROWS", "8192"))
        chunk_b = max(1, min(num_bases, cap_rows // 2**num_qubits))
    # DDQST_SKIP_GRID_CE=1: campaign fallback — run NO full-grid chain
    # evals at all (entry/exit CE logged as NaN, no held-out early stop,
    # uniform minibatch draw). Round 5 measured today's relay worker
    # crashing on the N=10 chain-eval program class at EVERY chunk size
    # (8192 and 1024 rows, 7 attempts) while the optimisation chunk and
    # CE-training classes ran fine; this knob lets distillation segments
    # proceed on the proven classes only, with quality read from the
    # final generation/metrics tail instead of in-loop evals.
    skip_grid_ce = os.environ.get("DDQST_SKIP_GRID_CE") == "1"

    @jax.jit
    def _grid_ce_chunk(params, tgt_chunk, bidx):
        def denoise_fn(x, t, b):
            return state.apply_fn({"params": params}, x, t, b)

        dist = _chain(denoise_fn, bidx)
        if conf_t is not None:
            dist = dist @ conf_t
        return -jnp.sum(
            tgt_chunk * jnp.log(jnp.maximum(dist, 1e-12)), axis=-1)

    def grid_ce_per_basis(params, tgt):
        rows = []
        for i in range(0, num_bases, chunk_b):
            hi = min(i + chunk_b, num_bases)
            bidx = jnp.arange(i, hi, dtype=jnp.int32)
            rows.append(np.asarray(_grid_ce_chunk(params, tgt[i:hi], bidx)))
        return np.concatenate(rows)

    def full_grid_ce(params, tgt):
        return float(np.mean(grid_ce_per_basis(params, tgt)))

    val = None
    if val_counts is not None:
        val = jnp.asarray(val_counts, jnp.float32)
        val = val / jnp.maximum(jnp.sum(val, -1, keepdims=True), 1e-9)

    # The optimisation scan is dispatched in bounded chunks rather than one
    # XLA program over all `steps`: a single device program running for
    # more than ~2-4 minutes crashes this environment's TPU worker
    # (observed at 400-step MLP programs and 50-step transformer chunks;
    # shorter programs of the same shape survive). Params/opt state carry
    # across calls; the per-chunk program is identical. Lower
    # ``steps_per_call`` further for expensive per-step models.

    accum = max(int(accum), 1)
    if minibatched and accum * basis_batch > num_bases:
        # Without-replacement super-draw must fit the basis set; a full
        # pass is just the unminibatched loss.
        accum = max(num_bases // basis_batch, 1)

    # Entry-time per-basis CE (one full-grid forward pass; also the
    # honest ``train_ce_before``). With hard_frac > 0, the per-basis
    # EXCESS over the target's own entropy drives the minibatch draw —
    # hard-basis mining (see docstring).
    if skip_grid_ce:
        ce_before = np.full((num_bases,), np.nan)
        val = None
        hard_frac = 0.0  # mining needs the per-basis entry CE
    else:
        ce_before = grid_ce_per_basis(state.params, target)
    draw_p = None
    if hard_frac > 0 and minibatched:
        tgt_np = np.asarray(target, np.float64)
        ent = -np.sum(tgt_np * np.log(np.maximum(tgt_np, 1e-12)), axis=-1)
        excess = np.maximum(ce_before - ent, 0.0)
        tot = float(excess.sum())
        if tot > 0:
            w = (1.0 - hard_frac) / num_bases + hard_frac * excess / tot
            draw_p = jnp.asarray(w / w.sum(), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, opt_state, k0, length):
        def body(carry, ks):
            params, opt_state = carry
            if minibatched and accum > 1:
                # Gradient accumulation: one accum*basis_batch draw
                # without replacement, averaged over accum sub-chunks of
                # the relay-proven basis_batch*2^N dispatch rows each.
                sel = jax.random.choice(
                    ks, num_bases, (accum, basis_batch), replace=False,
                    p=draw_p,
                )

                def acc(c, bidx):
                    loss, grads = jax.value_and_grad(loss_fn)(params, bidx)
                    return (
                        c[0] + loss,
                        jax.tree_util.tree_map(jnp.add, c[1], grads),
                    ), None

                zero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (lsum, gsum), _ = jax.lax.scan(
                    acc, (jnp.zeros(()), zero), sel
                )
                loss = lsum / accum
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            else:
                bidx = (
                    jax.random.choice(
                        ks, num_bases, (basis_batch,), replace=False,
                        p=draw_p,
                    )
                    if minibatched else None
                )
                loss, grads = jax.value_and_grad(loss_fn)(params, bidx)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(k0, length)
        )
        return params, opt_state, losses

    params = state.params
    if init_opt_state is None:
        opt_state = tx.init(params)
    else:
        fresh = tx.init(params)
        opt_state = (
            fresh[0]._replace(
                count=jnp.asarray(init_opt_state["count"]),
                mu=init_opt_state["mu"],
                nu=init_opt_state["nu"],
            ),
        ) + tuple(fresh[1:])
    k0 = jax.random.key(0) if key is None else key
    all_losses = []
    done = 0
    info: dict = {"train_ce_before": float(np.mean(ce_before))}
    if draw_p is not None:
        # The realised mining distribution (testable wiring; also useful
        # campaign telemetry — how concentrated is the residual?).
        info["hard_draw_p"] = np.asarray(draw_p)
    best_ce = best_step = None
    best_params = params
    bad = 0
    val_history = []
    if val is not None:
        best_ce = full_grid_ce(params, val)
        best_step = 0
        val_history.append((0, best_ce))
    equiv_per_step = (
        (accum * basis_batch / num_bases) if minibatched else 1.0
    )
    since_eval = 0.0
    while done < steps:
        length = min(steps_per_call, steps - done)
        params, opt_state, losses = run_chunk(
            params, opt_state, jax.random.fold_in(k0, done), length
        )
        # Bound the remote dispatch queue: each chunk must EXECUTE before
        # the next is enqueued. Without an in-loop materialisation (e.g.
        # under DDQST_SKIP_GRID_CE, which removes every held-out eval)
        # the whole multi-chunk loop queues as one async wave and the
        # deferred execution burst at the final params pull crashes the
        # relay worker — measured round 5: 100-step loops completed, then
        # died inside the orbax save, three times. A scalar pull per
        # chunk restores the bounded-dispatch protocol at negligible cost.
        float(losses[-1])
        all_losses.append(losses)
        done += length
        since_eval += length * equiv_per_step
        if val is not None and (
            since_eval >= val_every_equiv or done >= steps
        ):
            since_eval = 0.0
            ce = full_grid_ce(params, val)
            val_history.append((done, ce))
            if ce < best_ce - 1e-5:
                best_ce, best_params, best_step = ce, params, done
                bad = 0
            else:
                bad += 1
                if bad >= val_patience:
                    break
    if val is not None:
        params = best_params
        info.update(
            val_history=val_history, best_step=best_step, best_val_ce=best_ce
        )
    info["train_ce_after"] = (
        float("nan") if skip_grid_ce else full_grid_ce(params, target)
    )
    # Portable Adam state for segment chaining (final-step moments; with
    # val selection these correspond to the LAST params, not best_params —
    # chaining is only meaningful for val-free campaign segments).
    adam = opt_state[0]
    info["final_opt_state"] = {
        "count": adam.count, "mu": adam.mu, "nu": adam.nu,
    }
    losses = (
        jnp.concatenate(all_losses) if all_losses else jnp.zeros((0,))
    )
    return state.replace(params=params), losses, info


def fit(
    key: jax.Array,
    model,
    bits,
    basis,
    cfg: TrainConfig,
    schedule: DiffusionSchedule,
    eval_bits=None,
    eval_basis=None,
    mesh=None,
    log_fn=print,
):
    """Full training run. Returns (state, per-epoch mean losses).

    If ``mesh`` is given, the dataset is sharded over its ``data`` axis;
    params are replicated (pure DP) unless the mesh has a nontrivial
    'model' axis, in which case the transformer TP rules
    (:func:`ddqst_tpu.parallel.mesh.transformer_param_shardings`) shard
    the attention/MLP kernels and their Adam moments over it — XLA inserts
    the gradient all-reduce over 'data' and the per-sublayer activation
    all-reduces over 'model' from the shardings alone.
    """
    k_init, k_train = jax.random.split(key)
    steps_per_epoch = max(bits.shape[0] // cfg.batch_size, 1)
    state = create_state(
        k_init, model, cfg, bits.shape[-1],
        total_steps=steps_per_epoch * cfg.num_epochs,
    )
    bits = jnp.asarray(bits, dtype=jnp.int8)
    basis = jnp.asarray(basis, dtype=jnp.int32)
    batch_sharding = None
    if mesh is not None:
        from ddqst_tpu.parallel.mesh import (
            data_sharding, replicate, shard_state,
        )

        bits = replicate(mesh, bits)
        basis = replicate(mesh, basis)
        state = shard_state(mesh, state)
        batch_sharding = data_sharding(mesh, 2)

    start_epoch = 0
    if cfg.checkpoint_dir and cfg.resume:
        from ddqst_tpu.utils.checkpoint import latest_step, restore_checkpoint

        step = latest_step(cfg.checkpoint_dir)
        if step is not None:
            state, step = restore_checkpoint(cfg.checkpoint_dir, state)
            start_epoch = int(step)
            log_fn(f"resumed from checkpoint at epoch {start_epoch}")

    losses = []
    ema_params = None
    ema_epochs = 0
    ema_update = None
    if cfg.ema_decay > 0:
        d = cfg.ema_decay
        ema_update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: d * a + (1.0 - d) * b, e, p
            )
        )
    t_start = time.perf_counter()
    for epoch in range(start_epoch, cfg.num_epochs):
        ek = jax.random.fold_in(k_train, epoch)
        state, loss = _run_epoch(
            state, ek, bits, basis, schedule, cfg.batch_size,
            batch_sharding=batch_sharding, t_max=cfg.t_max,
        )
        if ema_update is not None:
            # Zero-initialised EMA, debiased at the end (Adam-style): a
            # first-epoch-seeded EMA keeps weight d^(E-1) on the nearly
            # untrained epoch-1 params — at d=0.999 over 500 epochs that is
            # 61% of the average (measured to *hurt* quality: the N=10
            # renoise500_big run scored TV 0.405 vs 0.213 without EMA).
            ema_params = ema_update(
                jax.tree_util.tree_map(jnp.zeros_like, state.params)
                if ema_params is None else ema_params,
                state.params,
            )
            ema_epochs += 1
        losses.append(loss)
        if cfg.log_every and (epoch + 1) % cfg.log_every == 0:
            log_fn(
                f"epoch {epoch + 1}/{cfg.num_epochs}: "
                f"loss {float(loss):.4f} "
                f"({(epoch + 1) / (time.perf_counter() - t_start):.2f} ep/s)"
            )
        if (
            eval_bits is not None
            and cfg.eval_every
            and (epoch + 1) % cfg.eval_every == 0
        ):
            vl = eval_loss(
                state, jax.random.fold_in(ek, 0x7E7A1), eval_bits, eval_basis,
                schedule, cfg.batch_size,
            )
            log_fn(f"  val loss {float(vl):.4f}")
        if cfg.checkpoint_dir and cfg.checkpoint_every:
            if (epoch + 1) % cfg.checkpoint_every == 0:
                from ddqst_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(cfg.checkpoint_dir, state, epoch + 1)
    if ema_params is not None:
        debias = 1.0 / (1.0 - cfg.ema_decay**ema_epochs)
        state = state.replace(
            params=jax.tree_util.tree_map(lambda a: a * debias, ema_params)
        )
    if cfg.checkpoint_dir:
        from ddqst_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(cfg.checkpoint_dir, state, cfg.num_epochs)
    return state, jnp.stack(losses) if losses else jnp.zeros((0,))
