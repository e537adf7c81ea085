"""Evaluation harness: per-circuit raw-vs-D3PM fidelity lift.

Rebuild of ``RQC_dataset_building_phase/evaluate.py:40-118``: for every
circuit in an eval dataset, reconstruct the state (a) from its raw measured
counts and (b) from model-generated synthetic samples, compare fidelities
against the clean ground-truth statevector, record the z-bias diagnostic,
and emit ``metrics.csv`` + ``fidelity_lift.png`` + ``universality.png``.

Structural note kept from the reference: the phase-4 model conditions only
on (t, basis) — not on which circuit produced a shot — so its generated
samples are circuit-independent and get sampled ONCE here rather than per
circuit (the reference re-runs the identical sampler per circuit,
``evaluate.py:81-88``).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ddqst_tpu.data.records import CircuitRecord
from ddqst_tpu.ops import diffusion as diff
from ddqst_tpu.ops import metrics as M
from ddqst_tpu.ops import mle as mle_mod
from ddqst_tpu.ops import pauli
from ddqst_tpu.ops.complexlib import from_complex
from ddqst_tpu.ops.schedules import DiffusionSchedule
from ddqst_tpu.utils.logging import write_metrics_csv


def _reconstruct_counts(
    num_qubits: int, basis_labels: np.ndarray, counts, method: str,
    readout_p: float,
):
    if method == "mle":
        rec = mle_mod.make_mle(num_qubits, basis_labels, readout_p=readout_p)
        return rec(counts)
    # Counts-native inversion (fast WHT parities) — O(B·N·2^N), no per-shot
    # unrolling (which at shadow scales would pad GB-sized host arrays).
    import jax.numpy as jnp

    inv = pauli.make_counts_inverter(
        num_qubits, basis_labels, readout_p=readout_p
    )
    return inv(jnp.asarray(np.asarray(counts, np.float32)))


def evaluate_dataset(
    key: jax.Array,
    records: list[CircuitRecord],
    apply_fn,
    params,
    num_qubits: int,
    schedule: DiffusionSchedule,
    shots_infer: int = 2000,
    exact: bool | None = None,
    reconstruction: str = "linear",
    readout_p: float = 0.0,
    circuit_conditioned: bool = False,
    out_dir: str | None = None,
    log_fn=print,
) -> list[dict]:
    """Run the raw-vs-D3PM comparison over an eval dataset.

    ``circuit_conditioned=True`` requires a model trained with
    ``ModelConfig.condition_on_circuit`` on these records *in this order*
    (the eval subset saved by ``pipeline.train_on_dataset`` preserves it);
    generation then runs per circuit id and each record is reconstructed
    from its own generated samples.
    """
    import jax.numpy as jnp

    num_bases = 3**num_qubits
    if circuit_conditioned:
        c = len(records)
        basis_rows = jnp.tile(
            jnp.repeat(jnp.arange(num_bases, dtype=jnp.int32), shots_infer),
            (c,),
        )
        circ_rows = jnp.repeat(
            jnp.arange(c, dtype=jnp.int32), num_bases * shots_infer
        )
        packed = jnp.stack([basis_rows, circ_rows], axis=-1)

        def denoise_fn(x, t, b):
            return apply_fn(params, x, t, b)

        flat = diff.p_sample_grid(
            key, denoise_fn, packed, num_qubits, schedule, exact=exact,
            num_circuits=c,
        )
        per_circuit = flat.reshape(c, num_bases, shots_infer, num_qubits)
        zb = float(M.z_bias(per_circuit[0, -1]))
    else:
        samples = diff.sample_all_bases(
            key, apply_fn, params, num_qubits, shots_infer, schedule,
            exact=exact,
        )
        zb = float(M.z_bias(samples[-1]))  # canonical last basis = Z...Z

    def gen_rho(bits):
        counts = mle_mod.bits_to_counts(bits).astype(jnp.float32)
        if reconstruction == "mle":
            return mle_mod.make_mle(num_qubits, readout_p=readout_p)(counts)
        return pauli.make_counts_inverter(num_qubits, readout_p=readout_p)(
            counts
        )

    rho_gen = None if circuit_conditioned else gen_rho(samples)

    out = []
    for i, rec in enumerate(records):
        target = from_complex(rec.clean_state)
        rho_raw = _reconstruct_counts(
            num_qubits, rec.basis_labels, rec.counts, reconstruction,
            readout_p,
        )
        rho_i = gen_rho(per_circuit[i]) if circuit_conditioned else rho_gen
        fid_raw = float(M.state_fidelity(target, rho_raw))
        fid_d3pm = float(M.state_fidelity(target, rho_i))
        _, s_raw, _ = (float(x) for x in M.get_metrics(rho_raw, num_qubits))
        _, s_d3pm, _ = (float(x) for x in M.get_metrics(rho_i, num_qubits))
        out.append(
            {
                "id": rec.id,
                "depth": rec.depth,
                "raw_fidelity": fid_raw,
                "d3pm_fidelity": fid_d3pm,
                "raw_trace_distance": float(M.trace_distance(target, rho_raw)),
                "d3pm_trace_distance": float(M.trace_distance(target, rho_i)),
                "raw_entropy": s_raw,
                "d3pm_entropy": s_d3pm,
                "z_bias": zb,
            }
        )
        log_fn(
            f"circuit {i} (depth={rec.depth}): raw={fid_raw:.3f} -> "
            f"d3pm={fid_d3pm:.3f}"
        )

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_metrics_csv(os.path.join(out_dir, "metrics.csv"), out)
        from ddqst_tpu import viz

        viz.plot_fidelity_lift(out, os.path.join(out_dir, "fidelity_lift.png"))
        viz.plot_universality(out, os.path.join(out_dir, "universality.png"))
        log_fn(f"wrote metrics + plots to {out_dir}/")
    return out
