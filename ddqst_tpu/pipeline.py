"""End-to-end tomography pipeline: generate → train → sample → reconstruct.

The TPU-native equivalent of the reference's per-phase ``main.py`` flow
(``multi_qubit_any_state/main.py:86-183``): simulate measurement data for a
target state under a noise model, train the conditional D3PM on the noisy
bitstrings, generate a large synthetic dataset from the model, and linearly
invert it into a density matrix with fidelity/purity/entropy metrics — plus
the reference's scientific control, linear inversion directly on the raw
training data ("Upper Bound from Training Data",
``multi_qubit_special_states/main.py:136-164``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.config import ExperimentConfig
from ddqst_tpu.models import build_model
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import metrics as M
from ddqst_tpu.ops import mle
from ddqst_tpu.ops import pauli
from ddqst_tpu.ops.complexlib import CArray, from_complex, to_complex
from ddqst_tpu.ops.schedules import make_schedule
from ddqst_tpu.qsim import measure, noise, states
from ddqst_tpu import train as training

# Max reverse-sampler chains (bases x shots) per device dispatch; bigger
# single programs wedge this environment's TPU worker (see run_experiment).
_GEN_CHAIN_CAP = 1 << 21


def _load_chain_opt(opt_load: str, params, log_fn: Callable):
    """Restore a distillation Adam-moments snapshot (segment chaining).

    Returns the portable ``{'count','mu','nu'}`` dict for
    ``train.finetune_chain(init_opt_state=...)`` or None. NOTE the CPU
    A/B (``scripts/diag_segment_descent.py``, examples/
    diag_segment_descent.json) measured params-only chaining as only a
    mild penalty vs a single run and Adam chaining as slightly WORSE
    (the fresh-moment re-warmup helps more than trajectory continuity);
    the GHZ-8 descent collapse was a minibatch-noise floor, fixed by
    ``chain_accum`` coverage, not by opt chaining. Kept for A/B use.
    """
    if not opt_load:
        return None
    from ddqst_tpu.utils import checkpoint as ckpt

    tree = ckpt.restore_params(
        opt_load, training.chain_opt_template(params)
    )
    log_fn(f"chained distillation Adam state from {opt_load}")
    return tree


def _save_chain_opt(opt_save: str, ft_info, log_fn: Callable) -> None:
    """Persist (or drop) the final Adam moments from a distillation run.

    Always strips ``final_opt_state`` out of ``ft_info`` so results dicts
    and JSONL writers never see the params-sized moments pytree.
    """
    if ft_info is None:
        return
    tree = ft_info.pop("final_opt_state", None)
    if opt_save and tree is not None:
        from ddqst_tpu.utils import checkpoint as ckpt

        ckpt.save_params(opt_save, tree)
        log_fn(f"saved distillation Adam state to {opt_save}")


@dataclasses.dataclass
class GeneratedData:
    bits: jnp.ndarray          # [B_bases, shots, N] int8
    basis_labels: np.ndarray   # [B_bases, N] int
    basis_idx: np.ndarray      # [B_bases] canonical indices
    target: np.ndarray         # clean statevector [2^N] (fidelity target)
    # None when restored from a data cache (the circuit is only consumed
    # inside generate_training_data; nothing downstream reads it).
    circuit: states.Circuit | None
    # Exact Born outcome probabilities of the *clean* target per sampled
    # basis, [B_bases, 2^N] — the zero-noise evaluation reference for
    # shadow-scale runs (no density matrix is reconstructed there).
    clean_probs: np.ndarray | None = None


def generate_training_data(
    cfg: ExperimentConfig, key: jax.Array, rng: np.random.Generator
) -> GeneratedData:
    """Simulate per-basis measurement shots for the configured state/noise.

    Mirrors ``generate_synthetic_data`` (``data_gen.py:190-250``): one state
    preparation (one RQC if applicable — ``data_gen.py:208-210``), measured
    in all 3^N bases (or a shadow-capped random subset when
    ``cfg.data.max_bases`` is set), under the configured noise model. The
    fidelity target is always the *clean* state.
    """
    d = cfg.data
    circuit = states.prep_circuit(d.state_type, d.num_qubits, d.rqc_depth, rng)
    target = states.circuit_statevector(circuit)
    ncfg = noise.get_noise_config(d.noise_type)
    kind, state = noise.noisy_state(circuit, ncfg)

    all_labels = pauli.all_basis_labels(d.num_qubits)
    if d.max_bases and d.max_bases < len(all_labels):
        sel = rng.choice(len(all_labels), size=d.max_bases, replace=False)
        sel.sort()
    else:
        sel = np.arange(len(all_labels))
    labels = all_labels[sel]
    rots = from_complex(measure.rotation_unitaries(labels))

    if kind == "pure":
        probs = measure.batched_probs_pure(from_complex(state[None]), rots)[0]
    else:
        probs = measure.batched_probs_mixed(from_complex(state[None]), rots)[0]
    clean_probs = np.asarray(
        measure.batched_probs_pure(from_complex(target[None]), rots)[0]
    )
    probs = noise.apply_readout_to_probs(probs, d.num_qubits, ncfg.readout_p)
    bits = measure.sample_bits(key, probs, d.shots_train, d.num_qubits)

    if d.mitigate_train_data and ncfg.readout_p > 0:
        # Readout mitigation in the data path: invert the confusion matrix
        # on the *empirical* per-basis frequencies (respecting shot noise),
        # clip negatives, renormalise, and resample the training shots from
        # the cleaned distribution. The model then learns the clean state's
        # statistics directly.
        from ddqst_tpu.ops.mle import bits_to_counts

        counts = bits_to_counts(bits).astype(jnp.float32)  # [B, d]
        freqs = counts / jnp.sum(counts, axis=-1, keepdims=True)
        m_inv = jnp.asarray(
            np.linalg.inv(noise.confusion_matrix(d.num_qubits, ncfg.readout_p))
        )
        clean = jnp.maximum(jnp.einsum("ij,bj->bi", m_inv, freqs), 0.0)
        clean = clean / jnp.sum(clean, axis=-1, keepdims=True)
        bits = measure.sample_bits(
            jax.random.fold_in(key, 1), clean, d.shots_train, d.num_qubits
        )
    return GeneratedData(
        bits=bits,
        basis_labels=labels,
        basis_idx=sel.astype(np.int32),
        target=target,
        circuit=circuit,
        clean_probs=clean_probs,
    )


def save_data_cache(path: str, data: GeneratedData) -> None:
    """Persist a GeneratedData to npz (segment-campaign data cache).

    Same cfg + seed always regenerate identical data, so the cache is a
    pure walltime optimisation: every campaign child after the first
    skips the ~13-min simulate/rotate/sample pass (and its device
    dispatches) that VERDICT r4 weak #1 measured as the dominant retry
    cost. The circuit object is not stored — nothing downstream of
    generate_training_data consumes it.
    """
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: exact name, atomic rename
        np.savez_compressed(
            f,
            bits=np.asarray(data.bits, np.int8),
            basis_labels=np.asarray(data.basis_labels),
            basis_idx=np.asarray(data.basis_idx),
            target=np.asarray(data.target),
            clean_probs=(
                np.zeros((0,)) if data.clean_probs is None
                else np.asarray(data.clean_probs)
            ),
        )
    os.replace(tmp, path)


def load_data_cache(path: str) -> GeneratedData:
    """Restore a GeneratedData saved by :func:`save_data_cache`."""
    z = np.load(path)
    clean = z["clean_probs"]
    return GeneratedData(
        bits=jnp.asarray(z["bits"], jnp.int8),
        basis_labels=z["basis_labels"],
        basis_idx=z["basis_idx"],
        target=z["target"],
        circuit=None,
        clean_probs=None if clean.size == 0 else clean,
    )


def ensure_data_cache(cfg, seed: int, path: str, log_fn=print) -> str:
    """Fill a campaign's data cache if absent; no-op when it exists.

    Key derivation is byte-identical to :func:`run_experiment` (same
    ``jax.random.key(seed)`` split / ``default_rng(seed)``), so a cache
    produced here is exactly the data every campaign child would have
    generated itself. Campaign drivers run this in a CPU-only child
    BEFORE touching the TPU relay: the same N=10 shadow pass that costs
    ~13 min of device dispatches takes ~75 s host-side (measured round
    5), and the cache then survives every relay crash/retry.
    """
    if os.path.exists(path):
        return path
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    k_data, _, _ = jax.random.split(key, 3)
    log_fn(
        f"[{cfg.name}] datagen: {cfg.data.state_type} "
        f"N={cfg.data.num_qubits} noise={cfg.data.noise_type} "
        f"shots={cfg.data.shots_train} -> {path}"
    )
    data = generate_training_data(cfg, k_data, rng)
    if not os.path.exists(path):  # a racing child may have beaten us
        save_data_cache(path, data)
    return path


def flatten_for_training(
    bits: jnp.ndarray, basis_idx: np.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, N] shots + [B] indices → shuffled-ready [B*S, N], [B*S]."""
    b, s, n = bits.shape
    x = bits.reshape(b * s, n)
    basis = jnp.repeat(jnp.asarray(basis_idx, dtype=jnp.int32), s)
    return x, basis


def create_sanity_records(num_qubits: int):
    """Synthetic Bell-correlation dataset for the sanity/memorization check.

    Mirrors ``RQC_dataset_building_phase/main.py:38-59``: 500x'00..0' +
    500x'11..1' counts in the Z basis only.
    """
    from ddqst_tpu.data.records import CircuitRecord

    d = 2**num_qubits
    counts = np.zeros((1, d), np.int32)
    counts[0, 0] = 500
    counts[0, d - 1] = 500
    target = np.zeros(d, np.complex64)
    target[0] = target[-1] = 1 / np.sqrt(2)
    return [
        CircuitRecord(
            id=0,
            hash="sanity",
            depth=0,
            clean_state=target,
            basis_labels=np.full((1, num_qubits), 2, np.int8),  # Z...Z
            counts=counts,
        )
    ]


def train_on_dataset(
    cfg: ExperimentConfig,
    records,
    save_dir: str = "",
    run_name: str = "model",
    train_ratio: float = 1.0,
    num_eval_circuits: int = 50,
    seed: int = 0,
    log_fn: Callable = print,
):
    """Phase-4 style training on a prebuilt circuit dataset.

    Mirrors ``RQC_dataset_building_phase/main.py:61-133``: shuffle circuits,
    keep ``train_ratio``, eval on the first ``num_eval_circuits`` *training*
    circuits (deliberate memorization protocol, comment at ``main.py:77``),
    save the eval subset and the trained params.

    Returns (train_state, eval_records).
    """
    import os

    from ddqst_tpu.data.loader import dataset_to_training_arrays
    from ddqst_tpu.data.records import save_shard

    rng = np.random.default_rng(seed)
    records = list(records)
    rng.shuffle(records)
    num_train = max(int(len(records) * train_ratio), 1)
    training_recs = records[:num_train]
    eval_recs = training_recs[: max(1, num_eval_circuits)]

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        save_shard(
            os.path.join(save_dir, f"{run_name}_eval.npz"), eval_recs
        )

    arrays = dataset_to_training_arrays(training_recs, mode="unroll")
    eval_arrays = dataset_to_training_arrays(eval_recs, mode="unroll")
    log_fn(f"training on {arrays['bits'].shape[0]} shots "
           f"({len(training_recs)} circuits)")

    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    num_circuits = (
        len(training_recs) if cfg.model.condition_on_circuit else 0
    )
    model = build_model(
        cfg.model, cfg.data.num_qubits, cfg.diffusion.num_timesteps,
        num_circuits=num_circuits,
    )

    def cond(a):  # packed (basis, circuit) when circuit-conditioned
        if num_circuits == 0:
            return a["basis_idx"]
        return jnp.stack([a["basis_idx"], a["circuit_idx"]], axis=-1)

    state, losses = training.fit(
        jax.random.key(seed), model, arrays["bits"], cond(arrays),
        cfg.train, schedule,
        eval_bits=eval_arrays["bits"], eval_basis=cond(eval_arrays),
        log_fn=log_fn,
    )
    if save_dir:
        from ddqst_tpu.utils.checkpoint import save_params

        save_params(os.path.join(save_dir, f"{run_name}_params"), state.params)
        log_fn(f"saved params to {save_dir}/{run_name}_params")
    return state, eval_recs


def _run_shadow_experiment(
    cfg: ExperimentConfig, data: GeneratedData, k_train, k_sample,
    log_fn: Callable, mesh=None, params_load: str = "",
    params_save: str = "", stop_after: str = "",
    opt_load: str = "", opt_save: str = "",
) -> dict:
    """Large-N path: train on per-qubit basis labels, evaluate generated
    distributions against the EXACT Born probabilities of the clean target
    (``data.clean_probs``) instead of full density-matrix reconstruction
    (4^N expansion is infeasible at BASELINE config-5 scale).

    Metrics per basis (all vs the exact clean distribution, so the numbers
    measure model quality, not measurement shot noise):

    - ``mean/max_tv_to_target`` — total variation of the generated counts.
    - ``tv_shot_noise_floor`` — mean TV of fresh multinomial draws from the
      exact distribution at the same generation shot count: the TV an ideal
      generator would score. Reported explicitly so a TV near the floor
      reads as "converged", not hidden inside the number.
    - ``meas_tv_to_target`` — TV of the *measured* (noisy) counts: the data
      noise level the model had to see through.
    - ``mean_marginal_error`` — mean |E[x_q]| error over (basis, qubit):
      a low-variance per-qubit check immune to the 2^N TV noise floor.
    - ``classical_fidelity`` — Bhattacharyya fidelity (Σ√(p·q))² between
      generated and exact distributions, averaged over bases.
    """
    from ddqst_tpu.ops.mle import bits_to_counts

    n = cfg.data.num_qubits
    ft_info, ft_losses = None, None
    b_bases, s, _ = data.bits.shape
    x = data.bits.reshape(b_bases * s, n)
    labels = jnp.repeat(
        jnp.asarray(data.basis_labels, jnp.int32), s, axis=0
    )
    mcfg = cfg.model
    if mcfg.arch != "transformer":
        # Per-qubit [B, N] basis labels are the transformer's conditioning
        # form; ConditionalD3PM would parse a 2-D basis array as packed
        # (basis, circuit) and silently condition on qubit 0's label only.
        log_fn(
            f"[{cfg.name}] WARNING: arch={mcfg.arch!r} cannot condition on "
            "per-qubit basis labels at shadow scale; switching to "
            "arch='transformer'"
        )
        mcfg = dataclasses.replace(mcfg, arch="transformer")
    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(mcfg, n, cfg.diffusion.num_timesteps)
    if params_load:
        # Warm start: skip CE training, restore a previous run's params
        # (same cfg + seed → identical data/bases, so distillation resumes
        # exactly). Saves the ~25-min CE retrain per N=10 distillation
        # iteration. Import after first device use (CLAUDE.md: importing
        # orbax before device init can deadlock the axon plugin).
        from ddqst_tpu.utils import checkpoint as ckpt

        state = training.create_state(
            jax.random.split(k_train)[0], model, cfg.train, n
        )
        state = state.replace(params=ckpt.restore_params(
            params_load, state.params
        ))
        losses = jnp.zeros((0,), jnp.float32)
        log_fn(f"[{cfg.name}] warm start: params from {params_load} "
               "(CE training skipped)")
    else:
        log_fn(f"[{cfg.name}] shadow-scale training on {x.shape[0]} shots "
               f"({b_bases} bases)")
        state, losses = training.fit(
            k_train, model, x, labels, cfg.train, schedule, mesh=mesh,
            log_fn=log_fn,
        )
    if cfg.train.chain_finetune_steps > 0:
        # Shadow-scale exact-chain distillation: the 2^N-state chain is
        # tractable through N≈10 even though the 3^N basis enumeration is
        # not — the chain is computed for exactly the sampled shadow
        # bases via per-qubit label conditioning
        # (chain_distribution(basis_labels=...)). Same bias-variance
        # automation as the full route: held-out shots select the stop
        # step when chain_val_fraction > 0.
        log_fn(
            f"[{cfg.name}] shadow-scale chain distillation: "
            f"{cfg.train.chain_finetune_steps} steps over {b_bases} bases"
        )
        labels_arr = jnp.asarray(data.basis_labels, jnp.int32)
        vf = cfg.train.chain_val_fraction
        val_counts = None
        if vf > 0:
            s_val = min(max(int(round(vf * s)), 1), s - 1)
            tgt_counts = mle.bits_to_counts(data.bits[:, : s - s_val])
            val_counts = mle.bits_to_counts(data.bits[:, s - s_val :])
        else:
            tgt_counts = mle.bits_to_counts(data.bits)
        state, ft_losses, ft_info = training.finetune_chain(
            state, tgt_counts, schedule, n,
            steps=cfg.train.chain_finetune_steps,
            learning_rate=cfg.train.chain_lr,
            exact=cfg.diffusion.exact,
            basis_batch=cfg.train.chain_basis_batch,
            key=jax.random.fold_in(k_train, 0xD157 + cfg.train.chain_key_salt),
            steps_per_call=cfg.train.chain_steps_per_call,
            val_counts=val_counts,
            val_patience=cfg.train.chain_val_patience,
            basis_labels=labels_arr,
            accum=cfg.train.chain_accum,
            hard_frac=cfg.train.chain_hard_frac,
            init_opt_state=_load_chain_opt(opt_load, state.params, log_fn),
        )
        _save_chain_opt(opt_save, ft_info, log_fn)
        msg = (
            f"[{cfg.name}] chain CE (all shadow bases) "
            f"{ft_info['train_ce_before']:.5f} -> "
            f"{ft_info['train_ce_after']:.5f}"
        )
        if val_counts is not None and "best_val_ce" in ft_info:
            # Absent under DDQST_SKIP_GRID_CE=1 (no held-out evals ran).
            msg += (
                f"; held-out best {ft_info['best_val_ce']:.5f} at step "
                f"{ft_info['best_step']} (ran {ft_losses.shape[0]} of "
                f"{cfg.train.chain_finetune_steps})"
            )
        log_fn(msg)
    if params_save:
        from ddqst_tpu.utils import checkpoint as ckpt

        ckpt.save_params(params_save, state.params)
        log_fn(f"[{cfg.name}] saved params to {params_save}")
    if stop_after == "distill":
        # Segment mode (mirrors the full route): training-only result;
        # a later params_load run with chain_finetune_steps=0 does the
        # generation/metrics tail. Skips the ~500k-bitstring transformer
        # generation per distillation segment at N=10. ft_losses carries
        # the per-step chain-CE trajectory (parity with the full route —
        # the saturation-curve evidence for scaling studies).
        return {
            "losses": np.asarray(losses),
            "ft_losses": None if ft_info is None else np.asarray(ft_losses),
            "ft_info": ft_info,
        }
    shots_gen = max(cfg.data.shots_infer, 1)
    samples = diff.sample_for_bases(
        k_sample, state.apply_fn, {"params": state.params},
        jnp.asarray(data.basis_labels, jnp.int32), shots_gen, schedule,
        exact=cfg.diffusion.exact,
    )
    gen_counts = np.asarray(bits_to_counts(samples))
    meas_counts = np.asarray(bits_to_counts(data.bits))
    gen_p = gen_counts / np.maximum(gen_counts.sum(-1, keepdims=True), 1.0)
    meas_p = meas_counts / np.maximum(meas_counts.sum(-1, keepdims=True), 1.0)
    exact_p = np.asarray(data.clean_probs)  # [B, 2^N]

    tv_gen = 0.5 * np.abs(gen_p - exact_p).sum(-1)
    tv_meas = 0.5 * np.abs(meas_p - exact_p).sum(-1)
    # Shot-noise floor: TV an ideal sampler would score at this shot count.
    rng = np.random.default_rng(0)
    exact64 = exact_p.astype(np.float64)
    exact64 /= exact64.sum(-1, keepdims=True)  # exact f64 simplex for pvals
    floor = np.mean([
        0.5 * np.abs(rng.multinomial(shots_gen, p) / shots_gen - p).sum()
        for p in exact64
        for _ in range(4)
    ])
    # Per-qubit marginals: E[x_q] under generated vs exact distributions.
    outcomes = np.arange(exact_p.shape[-1])
    bit_table = ((outcomes[:, None] >> np.arange(n)) & 1).astype(np.float32)
    marg_err = np.abs((gen_p - exact_p) @ bit_table)  # [B, N]
    cf = (np.sqrt(gen_p * exact_p).sum(-1)) ** 2  # Bhattacharyya per basis

    zz_rows = np.nonzero((data.basis_labels == 2).all(axis=1))[0]
    # None = the Z...Z basis was not among the sampled shadow bases — a
    # missing diagnostic is reported as missing, not as its ideal value.
    zb = float(M.z_bias(samples[int(zz_rows[0])])) if len(zz_rows) else None
    results = {
        "fidelity": None,  # no density matrix at this scale
        "mean_tv_to_target": float(tv_gen.mean()),
        "max_tv_to_target": float(tv_gen.max()),
        "tv_shot_noise_floor": float(floor),
        "meas_tv_to_target": float(tv_meas.mean()),
        "mean_marginal_error": float(marg_err.mean()),
        "max_marginal_error": float(marg_err.max()),
        "classical_fidelity": float(cf.mean()),
        "z_bias": zb,
        "losses": np.asarray(losses),
        "target": np.asarray(data.target),
        "state": state,
        "samples": samples,
    }
    if ft_info is not None:
        # Distillation trajectory (train/held-out chain CE + selected
        # step): the saturation-curve evidence for scaling studies.
        results["chain_info"] = {
            k: v for k, v in ft_info.items()
        }
    log_fn(
        f"[{cfg.name}] shadow-scale vs exact Born probs: "
        f"TV {results['mean_tv_to_target']:.4f} "
        f"(shot-noise floor {floor:.4f}, measured-data TV "
        f"{results['meas_tv_to_target']:.4f}), marginal err "
        f"{results['mean_marginal_error']:.4f}, classical fidelity "
        f"{results['classical_fidelity']:.4f} over {b_bases} bases"
    )
    return results


def use_shadow_route(num_qubits: int, max_bases: int | None) -> bool:
    """Route to the shadow-scale path (distribution-level evaluation)?

    Full density-matrix reconstruction is feasible through N=8 (6561
    bases, 65,536 Pauli coefficients) because no stage materialises
    4^N·d² or [4^N, B] intermediates: row-blocked factored MLE, WHT
    counts-native inversion with the constant-free factored
    canonical-grid weights, factored Pauli assembly, amortised
    grid-table generation — the reference reconstructs only at N ≤ 3.
    Beyond N=8 (or under a shadow basis cap at N ≥ 7) the full 3^N
    enumeration is the binding cost, so runs switch to per-qubit basis
    conditioning and exact-Born-probability evaluation (no density
    matrix).
    """
    return num_qubits > 8 or (num_qubits >= 7 and bool(max_bases))


def run_experiment(
    cfg: ExperimentConfig,
    seed: int = 0,
    mesh=None,
    log_fn: Callable = print,
    params_load: str = "",
    params_save: str = "",
    target_cache: str = "",
    stop_after: str = "",
    opt_load: str = "",
    opt_save: str = "",
    data_cache: str = "",
) -> dict:
    """Full reference-parity run. Returns a metrics dict.

    Keys: fidelity, purity, vn_entropy, ent_entropy, raw_fidelity (linear
    inversion on the raw training shots — the reference's baseline check),
    z_bias, losses, rho, rho_raw, target.

    ``params_load``/``params_save``: orbax params snapshot paths for
    warm-starting distillation without the CE retrain (the same cfg +
    seed regenerates identical data/bases). On the full route these
    enable SEGMENTED distillation: frontier campaigns split the
    wedge-prone long dispatch loop into short-lived processes of ~160
    dispatches each (the relay-proven loop length — the 960-dispatch
    GHZ-8 v2 loop wedged mid-run; CLAUDE.md dispatch-shape protocol),
    chaining ``params_save`` → ``params_load``.

    ``opt_load``/``opt_save``: orbax snapshot paths for the DISTILLATION
    Adam moments, chained the same way (optional — the CPU A/B in
    ``scripts/diag_segment_descent.py`` measured params-only chaining as
    a mild penalty and moment chaining as slightly worse; the GHZ-8
    descent collapse was a minibatch-noise floor, fixed by
    ``train.chain_accum`` coverage, VERDICT r3 weak #1 diagnosis).

    ``target_cache`` (full route, ``chain_target='mle'``): npz path for
    the MLE-projected Born-probs target — computed once by the first
    segment (~25 min at N=8: a full MLE solve) and reloaded by the rest.

    ``stop_after='distill'`` (full route): return right after
    distillation + ``params_save`` with a training-only results dict —
    segments 1..K-1 skip the generation/estimator tail.

    ``data_cache``: npz path for the generated measurement data. Same
    cfg + seed regenerate identical data, so campaign children reuse the
    first child's data instead of re-paying the ~13-min simulation pass
    per segment/retry (VERDICT r4 weak #1). The cache key is the
    caller's responsibility (campaign drivers scope it per tag+seed in
    their workdir).
    """
    key = jax.random.key(seed)
    rng = np.random.default_rng(seed)
    k_data, k_train, k_sample = jax.random.split(key, 3)

    if data_cache and os.path.exists(data_cache):
        log_fn(f"[{cfg.name}] loading cached data from {data_cache}")
        data = load_data_cache(data_cache)
    else:
        log_fn(
            f"[{cfg.name}] generating {cfg.data.state_type} "
            f"N={cfg.data.num_qubits} noise={cfg.data.noise_type} "
            f"shots={cfg.data.shots_train}"
        )
        data = generate_training_data(cfg, k_data, rng)
        if data_cache:
            save_data_cache(data_cache, data)
            log_fn(f"[{cfg.name}] cached data to {data_cache}")
    n = cfg.data.num_qubits
    if use_shadow_route(n, cfg.data.max_bases):
        return _run_shadow_experiment(
            cfg, data, k_train, k_sample, log_fn, mesh=mesh,
            params_load=params_load, params_save=params_save,
            stop_after=stop_after, opt_load=opt_load, opt_save=opt_save,
        )
    x, basis = flatten_for_training(data.bits, data.basis_idx)

    schedule = make_schedule(cfg.diffusion.schedule, cfg.diffusion.num_timesteps)
    model = build_model(cfg.model, cfg.data.num_qubits, cfg.diffusion.num_timesteps)

    if params_load:
        # Segment warm start: skip CE training, restore the previous
        # segment's params (same cfg + seed → identical data). Import
        # after first device use (CLAUDE.md: importing orbax before
        # device init can deadlock the axon plugin).
        from ddqst_tpu.utils import checkpoint as ckpt

        state = training.create_state(
            jax.random.split(k_train)[0], model, cfg.train,
            cfg.data.num_qubits,
        )
        state = state.replace(
            params=ckpt.restore_params(params_load, state.params)
        )
        losses = jnp.zeros((0,), jnp.float32)
        log_fn(f"[{cfg.name}] warm start: params from {params_load} "
               "(CE training skipped)")
    else:
        log_fn(f"[{cfg.name}] training on {x.shape[0]} shots")
        state, losses = training.fit(
            k_train, model, x, basis, cfg.train, schedule, mesh=mesh,
            log_fn=log_fn,
        )

    ft_info, ft_losses = None, None
    if cfg.train.chain_finetune_steps > 0:
        full = 3**cfg.data.num_qubits
        if cfg.diffusion.infer_mode == "generate" and len(data.basis_idx) == full:
            # Exact-chain distillation (see train.finetune_chain): descend
            # the sampler's true output distribution against the training
            # counts — closes the CE-surrogate estimation bias. When the
            # raw (pre-mitigation) counts are available, match them through
            # the readout channel instead: exact maximum likelihood of the
            # measured data, statistically stronger than the clipped +
            # resampled mitigated counts.
            # Target = counts of the (mitigated) training bits. Two
            # alternatives were measured on hardware and are NOT used:
            # the unresampled mitigated distribution and channel-composed
            # matching against raw counts both score slightly lower (see
            # RESULTS.md "distillation target ablation") — the multiset
            # resampling acts as implicit thresholding that sharpens the
            # target, and per-basis deconvolution cannot express the
            # cross-basis PSD constraint that gives raw-count MLE its edge.
            log_fn(
                f"[{cfg.name}] exact-chain distillation: "
                f"{cfg.train.chain_finetune_steps} steps"
            )
            vf = cfg.train.chain_val_fraction
            val_counts = None
            if vf > 0:
                # Held-out split at the shot level (shots are iid per
                # basis): the last ceil(vf*S) shots per basis validate the
                # distillation temperature, the rest form the target.
                s = data.bits.shape[1]
                s_val = min(max(int(round(vf * s)), 1), s - 1)
                tgt_counts = mle.bits_to_counts(data.bits[:, : s - s_val])
                val_counts = mle.bits_to_counts(data.bits[:, s - s_val :])
            else:
                tgt_counts = mle.bits_to_counts(data.bits)
            if cfg.train.chain_target == "mle":
                # Physics-constrained target: project the training counts
                # through the (PSD, trace-1) MLE manifold and distill the
                # chain against the Born distribution of the estimate. The
                # per-basis counts target cannot express the cross-basis
                # positivity constraint — the measured gap between the
                # generative pipeline and MLE-on-raw (RESULTS.md
                # "distillation target ablation"). readout_p=0 here: the
                # target must live in the same domain the chain is matched
                # in (clean when mitigate_train_data resampled the bits,
                # raw otherwise); held-out selection still scores against
                # actual held-out counts, so a bad projection loses fairly.
                if target_cache and os.path.exists(target_cache):
                    tgt_counts = jnp.asarray(
                        np.load(target_cache)["target"], jnp.float32
                    )
                    log_fn(f"[{cfg.name}] distillation target: MLE Born "
                           f"probs (cached, {target_cache})")
                else:
                    rec = mle.make_mle(cfg.data.num_qubits, data.basis_labels)
                    rho_t = rec(jnp.asarray(tgt_counts, jnp.float32))
                    d_t = 2**cfg.data.num_qubits
                    if data.basis_labels.shape[0] * d_t * d_t > (
                        mle._FACTORED_BLOCK_ELEMS
                    ):
                        # N>=8 scale: the dense rotation stack + U rho
                        # product are ~3.4 GB each — use the blocked
                        # per-qubit path.
                        tgt_counts = mle.factored_born_probs(
                            rho_t, data.basis_labels
                        )
                    else:
                        rots = from_complex(
                            measure.rotation_unitaries(data.basis_labels)
                        )
                        tgt_counts = measure.batched_probs_mixed(
                            CArray(rho_t.re[None], rho_t.im[None]), rots
                        )[0]
                    if target_cache:
                        np.savez_compressed(
                            target_cache, target=np.asarray(tgt_counts)
                        )
                    log_fn(f"[{cfg.name}] distillation target: MLE Born probs")
            state, ft_losses, ft_info = training.finetune_chain(
                state, tgt_counts, schedule,
                cfg.data.num_qubits,
                steps=cfg.train.chain_finetune_steps,
                learning_rate=cfg.train.chain_lr,
                exact=cfg.diffusion.exact,
                basis_batch=cfg.train.chain_basis_batch,
                key=jax.random.fold_in(k_train, 0xD157 + cfg.train.chain_key_salt),
                steps_per_call=cfg.train.chain_steps_per_call,
                val_counts=val_counts,
                val_patience=cfg.train.chain_val_patience,
                accum=cfg.train.chain_accum,
                hard_frac=cfg.train.chain_hard_frac,
                init_opt_state=_load_chain_opt(opt_load, state.params, log_fn),
            )
            _save_chain_opt(opt_save, ft_info, log_fn)
            # Full-grid CE (not minibatch estimates — those conflate
            # subset noise with descent when chain_basis_batch is set).
            msg = (
                f"[{cfg.name}] chain CE (full grid) "
                f"{ft_info['train_ce_before']:.5f} -> "
                f"{ft_info['train_ce_after']:.5f}"
            )
            if val_counts is not None and "best_val_ce" in ft_info:
                # Absent under DDQST_SKIP_GRID_CE=1 (no held-out evals).
                msg += (
                    f"; held-out best {ft_info['best_val_ce']:.5f} at step "
                    f"{ft_info['best_step']} "
                    f"(ran {ft_losses.shape[0]} of "
                    f"{cfg.train.chain_finetune_steps})"
                )
            log_fn(msg)
        else:
            log_fn(
                f"[{cfg.name}] WARNING: chain distillation skipped (needs "
                "infer_mode='generate' and the full canonical basis set)"
            )

    if params_save:
        from ddqst_tpu.utils import checkpoint as ckpt

        ckpt.save_params(params_save, state.params)
        log_fn(f"[{cfg.name}] saved params to {params_save}")
    if stop_after == "distill":
        # Segment mode: training-only result; the final segment (or a
        # params_load run with chain_finetune_steps=0) does the
        # generation/estimator tail.
        return {
            "losses": np.asarray(losses),
            "ft_losses": None if ft_info is None else np.asarray(ft_losses),
            "ft_info": ft_info,
        }

    if cfg.diffusion.infer_mode == "denoise":
        # Explicit readout-channel inversion: reverse-diffuse the measured
        # shots from t* matched to the readout flip rate (p_denoise).
        ncfg = noise.get_noise_config(cfg.data.noise_type)
        t_star = diff.match_timestep(schedule, max(ncfg.readout_p, 0.01))
        reps = max(-(-cfg.data.shots_infer // cfg.data.shots_train), 1)
        log_fn(
            f"[{cfg.name}] denoising measured shots x{reps} from t*={t_star}"
        )
        b_bases, s, n = data.bits.shape
        flat_bits = jnp.tile(data.bits.reshape(b_bases * s, n), (reps, 1))
        flat_basis = jnp.tile(
            jnp.repeat(jnp.asarray(data.basis_idx, jnp.int32), s), (reps,)
        )
        out = diff.denoise_dataset(
            k_sample, state.apply_fn, {"params": state.params},
            flat_bits, flat_basis, t_star, schedule,
            exact=cfg.diffusion.exact,
        )
        samples = (
            out.reshape(reps, b_bases, s, n)
            .transpose(1, 0, 2, 3)
            .reshape(b_bases, reps * s, n)
        )
    else:
        if diff._resolve_exact(schedule, cfg.diffusion.exact):
            # Reference-parity rule, but a known quality footgun: the
            # factorised exact posterior freezes inter-qubit correlations
            # early (~0.75 Bell correlation vs ~0.99 renoise; see
            # ops.diffusion.p_sample docstring).
            log_fn(
                f"[{cfg.name}] NOTE: exact factorised posterior in use "
                "(reference parity); pass sampler='renoise' for best "
                "reconstruction quality"
            )
        log_fn(f"[{cfg.name}] sampling {cfg.data.shots_infer}/basis")
        # Chunk generation so one dispatch never walks more than ~2^22
        # chains (bases x shots): single huge device programs are what
        # this environment's TPU worker wedges/crashes on, and chunking
        # is free (the per-chunk program is identical and cached).
        num_bases = 3**cfg.data.num_qubits
        if cfg.diffusion.gen_tables_once:
            # Amortised grid path: tables once (bounded dispatches), then
            # pure table walks — the default path below repeats the table
            # precompute inside every chunk, the dominant cost at N>=7
            # and a single over-horizon dispatch at N=8.
            samples = diff.sample_all_bases_chunked(
                k_sample, state.apply_fn, {"params": state.params},
                cfg.data.num_qubits, cfg.data.shots_infer, schedule,
                exact=cfg.diffusion.exact, max_chains=_GEN_CHAIN_CAP,
            )
        else:
            cap = max(1, _GEN_CHAIN_CAP // num_bases)
            n_calls = -(-cfg.data.shots_infer // cap)
            per_call = -(-cfg.data.shots_infer // n_calls)  # equal chunks:
            chunks = [  # one compile, reused for every dispatch
                diff.sample_all_bases(
                    # Single-chunk runs consume k_sample directly so seeds
                    # reproduce pre-chunking recorded results bit-for-bit.
                    k_sample if n_calls == 1
                    else jax.random.fold_in(k_sample, c),
                    state.apply_fn,
                    {"params": state.params}, cfg.data.num_qubits, per_call,
                    schedule, exact=cfg.diffusion.exact,
                )
                for c in range(n_calls)
            ]
            samples = (
                chunks[0] if n_calls == 1
                else jnp.concatenate(chunks, axis=1)[
                    :, : cfg.data.shots_infer
                ]
            )

    mit_p = 0.0
    if cfg.data.mitigate_readout:
        mit_p = noise.get_noise_config(cfg.data.noise_type).readout_p
    denoised = cfg.diffusion.infer_mode == "denoise"
    # Samples are already clean when the reverse chain inverted the channel
    # (denoise mode) or the model was trained on mitigated data — applying
    # parity mitigation again would over-correct.
    already_clean = denoised or cfg.data.mitigate_train_data
    sample_p = 0.0 if already_clean else mit_p
    labels = data.basis_labels if denoised else None

    def reconstruct(bits, p):
        # Counts-native both ways: scatter-add histogram then WHT parities —
        # never a per-shot [B, S, 2^N] parity tensor (5.6 GB at N=7).
        counts = mle.bits_to_counts(bits).astype(jnp.float32)
        if cfg.data.reconstruction == "mle":
            rec = mle.make_mle(cfg.data.num_qubits, labels, readout_p=p)
            return rec(counts)
        return pauli.make_counts_inverter(
            cfg.data.num_qubits, labels, readout_p=p
        )(counts)

    rho = reconstruct(samples, sample_p)
    if denoised:
        # Missing Z...Z basis → report the diagnostic as missing (None),
        # never as its ideal value (VERDICT r1 weak #5).
        zz_rows = np.nonzero((data.basis_labels == 2).all(axis=1))[0]
        zb = M.z_bias(samples[int(zz_rows[0])]) if len(zz_rows) else None
    else:
        zb = M.z_bias(samples[-1])  # last canonical basis is Z...Z
    target = from_complex(data.target)
    fid = M.state_fidelity(target, rho)
    pur, vn, ent = M.get_metrics(rho, cfg.data.num_qubits)

    # Baseline: inversion on the raw (noisy) training shots — unmitigated
    # linear inversion (reference parity, ``multi_qubit_special_states/
    # main.py:136-164``) plus the configured estimator when it differs.
    raw_counts = mle.bits_to_counts(data.bits).astype(jnp.float32)
    inv_raw = pauli.make_counts_inverter(cfg.data.num_qubits, data.basis_labels)
    rho_raw = inv_raw(raw_counts)
    fid_raw = M.state_fidelity(target, rho_raw)
    fid_raw_mit = None
    if mit_p > 0 or cfg.data.reconstruction != "linear":
        if cfg.data.reconstruction == "mle":
            rec = mle.make_mle(
                cfg.data.num_qubits, data.basis_labels, readout_p=mit_p
            )
            rho_raw_best = rec(raw_counts)
        else:
            rho_raw_best = pauli.make_counts_inverter(
                cfg.data.num_qubits, data.basis_labels, readout_p=mit_p
            )(raw_counts)
        fid_raw_mit = float(M.state_fidelity(target, rho_raw_best))

    results = {
        "fidelity": float(fid),
        "raw_fidelity": float(fid_raw),
        "raw_fidelity_mitigated": fid_raw_mit,
        "trace_distance": float(M.trace_distance(target, rho)),
        "trace_distance_raw": float(M.trace_distance(target, rho_raw)),
        # Single-site ⟨X⟩/⟨Y⟩/⟨Z⟩ per qubit (notebook/notes.pdf Table 2).
        "expectations": M.pauli_expectations(rho),
        "expectations_raw": M.pauli_expectations(rho_raw),
        "purity": float(pur),
        "vn_entropy": float(vn),
        "ent_entropy": float(ent),
        "z_bias": None if zb is None else float(zb),
        "losses": np.asarray(losses),
        "rho": to_complex(rho),
        "rho_raw": to_complex(rho_raw),
        "target": np.asarray(data.target),
        "state": state,
        "samples": samples,
    }
    log_fn(
        f"[{cfg.name}] fidelity={results['fidelity']:.5f} "
        f"(raw baseline {results['raw_fidelity']:.5f}) "
        f"trace_distance={results['trace_distance']:.5f} "
        f"purity={results['purity']:.5f}"
    )
    threshold = 0.9  # reference success criterion (main.py:131-134)
    log_fn(
        f"[{cfg.name}] {'SUCCESS' if results['fidelity'] > threshold else 'WARNING'}"
        f": fidelity {'>' if results['fidelity'] > threshold else '<='} {threshold}"
    )
    return results
