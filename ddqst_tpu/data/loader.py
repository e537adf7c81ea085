"""Dataset → training-array loaders.

The reference unrolls Qiskit counts dicts into ``count`` copies of each
bitstring in RAM (``RQC_dataset_building_phase/dataset.py:45-71``). Counts
here are already dense ``[B, 2^N]`` arrays, so loaders work from sufficient
statistics:

- ``mode="unroll"`` — exact multiset expansion (reference-parity epoch
  semantics), vectorised with ``np.repeat``.
- ``mode="sampled"`` — draw M samples from the counts distribution with
  replacement (identical in distribution, O(M) memory regardless of total
  shot count; the SURVEY.md §7.4 documented deviation).

Basis conditioning comes out in both forms: canonical global indices (the
FiLM MLP's ``Embed(3^N)``) and per-qubit labels (the transformer's input),
so either model family consumes the same loader output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.data.records import CircuitRecord


def _labels_to_idx(labels: np.ndarray) -> np.ndarray:
    n = labels.shape[-1]
    powers = 3 ** np.arange(n - 1, -1, -1, dtype=np.int64)
    return (labels.astype(np.int64) * powers).sum(-1).astype(np.int32)


def counts_to_bits_exact(counts: np.ndarray, num_qubits: int) -> np.ndarray:
    """``[d]`` counts -> exact multiset of bit rows ``[sum(counts), N]``."""
    idx = np.repeat(np.arange(len(counts)), counts)
    return ((idx[:, None] >> np.arange(num_qubits)) & 1).astype(np.int8)


def dataset_to_training_arrays(
    records: list[CircuitRecord],
    mode: str = "unroll",
    num_samples: int = 0,
    seed: int = 0,
):
    """Flatten circuit records into training arrays.

    Returns dict with:
      bits ``[M, N]`` int8, basis_idx ``[M]`` int32 (canonical global),
      basis_labels ``[M, N]`` int8 (per-qubit, for the transformer).

    ``mode="sampled"`` requires ``num_samples`` (> 0).
    """
    if not records:
        raise ValueError("empty dataset")
    n = records[0].num_qubits
    all_counts = np.concatenate([r.counts for r in records])  # [R*B, d]
    all_labels = np.concatenate(
        [r.basis_labels for r in records]
    )  # [R*B, N]
    if mode == "unroll":
        rows_bits = []
        rows_basis = []
        for i, c in enumerate(all_counts):
            total = int(c.sum())
            if total == 0:
                continue
            rows_bits.append(counts_to_bits_exact(c, n))
            rows_basis.append(np.full(total, i, np.int64))
        bits = np.concatenate(rows_bits)
        row_of = np.concatenate(rows_basis)
    elif mode == "sampled":
        if num_samples <= 0:
            raise ValueError("mode='sampled' needs num_samples > 0")
        rng = np.random.default_rng(seed)
        flat = all_counts.reshape(-1).astype(np.float64)
        p = flat / flat.sum()
        draw = rng.choice(len(flat), size=num_samples, p=p)
        row_of, outcome = np.divmod(draw, all_counts.shape[1])
        bits = ((outcome[:, None] >> np.arange(n)) & 1).astype(np.int8)
    else:
        raise ValueError(f"unknown loader mode {mode!r}")
    labels = all_labels[row_of].astype(np.int8)
    rows_per_record = np.array([r.counts.shape[0] for r in records])
    row_to_circuit = np.repeat(np.arange(len(records)), rows_per_record)
    return {
        "bits": jnp.asarray(bits),
        "basis_idx": jnp.asarray(_labels_to_idx(labels)),
        "basis_labels": jnp.asarray(labels),
        # Position of the originating record in `records` — the circuit id
        # for circuit-conditioned training (ConditionalD3PM.num_circuits).
        "circuit_idx": jnp.asarray(
            row_to_circuit[row_of].astype(np.int32)
        ),
    }


def shuffle_arrays(key: jax.Array, arrays: dict) -> dict:
    m = arrays["bits"].shape[0]
    perm = jax.random.permutation(key, m)
    return {k: v[perm] for k, v in arrays.items()}
