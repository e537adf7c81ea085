"""RQC dataset builders: unique-circuit dedup, shadow capping, chunked shards.

TPU-first rebuild of the phase-4 data factory
(``RQC_dataset_building_phase/build_dataset.py:26-129`` and
``batch_build_dataset.py:24-149``). Behavioural parity:

- **Unique circuit pool** with deterministic hash dedup and a safety break
  at 50x attempts (``build_dataset.py:35-54``).
- **Shadow basis capping**: all 3^N bases when that is <= ``max_bases``,
  else ``max_bases`` random bases per circuit (``build_dataset.py:69-87``
  uses 100 for N>=5; ``batch_build_dataset.py:36-45`` caps at 50).
- **Chunked shards** ``part_K`` so long builds survive interruption
  (``batch_build_dataset.py:141-149``) — plus an improvement the reference
  lacks: ``seen_hashes`` persists to disk so a resumed build stays
  duplicate-free (SURVEY.md §5 notes the reference loses them).

TPU-first difference: the reference transpiles and runs each chunk's
13,500 circuits through Aer serially; here each chunk is ONE device
dispatch — circuit unitaries/statevectors assemble on host (tiny d x d
matrices), then basis rotation + Born sampling of every (circuit, basis)
pair run as batched einsums + categorical draws on the TPU.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu.data.records import CircuitRecord, save_shard
from ddqst_tpu.ops.complexlib import from_complex
from ddqst_tpu.ops.pauli import all_basis_labels
from ddqst_tpu.qsim import measure, noise, states


def _unique_circuits(
    rng: np.random.Generator,
    count: int,
    num_qubits: int,
    min_depth: int,
    max_depth: int,
    seen_hashes: set[str],
) -> list[tuple[states.Circuit, str]]:
    """Draw ``count`` circuits with unseen hashes (safety break at 50x)."""
    out: list[tuple[states.Circuit, str]] = []
    attempts = 0
    while len(out) < count:
        attempts += 1
        depth = int(rng.integers(min_depth, max_depth + 1))
        qc = states.random_circuit(rng, num_qubits, depth)
        h = states.circuit_hash(qc)
        if h not in seen_hashes:
            seen_hashes.add(h)
            out.append((qc, h))
        if attempts > max(count, 1) * 50:
            raise RuntimeError(
                f"could not find {count} unique circuits in {attempts} "
                "attempts; increase depth or qubit count"
            )
    return out


def _basis_plan(
    rng: np.random.Generator, num_qubits: int, num_circuits: int,
    max_bases: int,
) -> np.ndarray:
    """``[C, B, N]`` basis labels: full set or per-circuit random shadows."""
    full = all_basis_labels(num_qubits)
    if max_bases <= 0 or len(full) <= max_bases:
        return np.broadcast_to(
            full, (num_circuits,) + full.shape
        ).copy()
    return rng.integers(
        0, 3, size=(num_circuits, max_bases, num_qubits)
    ).astype(np.int32)


def _simulate_chunk(
    key: jax.Array,
    circuits: list[states.Circuit],
    basis_labels: np.ndarray,  # [C, B, N]
    shots: int,
    ncfg: noise.NoiseConfig,
) -> np.ndarray:
    """Counts ``[C, B, 2^N]`` for every circuit x basis, one device pass."""
    c, b, n = basis_labels.shape
    rots = from_complex(
        measure.rotation_unitaries(basis_labels.reshape(c * b, n)).reshape(
            c, b, 2**n, 2**n
        )
    )
    if ncfg.has_gate_noise:
        rhos = np.stack(
            [noise.simulate_density_matrix(qc, ncfg) for qc in circuits]
        )
        probs = measure.batched_probs_mixed_per_circuit(
            from_complex(rhos), rots
        )
    else:
        psis = states.batch_statevectors(circuits)
        probs = measure.batched_probs_pure_per_circuit(
            from_complex(psis), rots
        )
    probs = noise.apply_readout_to_probs(probs, n, ncfg.readout_p)
    return np.asarray(measure.sample_counts(key, probs, shots))


def build_dataset(
    seed: int,
    num_samples: int,
    num_qubits: int,
    min_depth: int = 2,
    max_depth: int = 10,
    shots: int = 1024,
    noise_type: str = "torino",
    max_bases: int = 0,
) -> list[CircuitRecord]:
    """Strict unique dataset in memory (reference ``generate_strict_dataset``).

    ``max_bases=0`` applies the reference's rule: full 3^N below 5 qubits,
    100 random bases at N >= 5 (``build_dataset.py:69-72``).
    """
    if max_bases == 0 and num_qubits >= 5:
        max_bases = 100
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    ncfg = noise.get_noise_config(noise_type)
    seen: set[str] = set()
    pool = _unique_circuits(
        rng, num_samples, num_qubits, min_depth, max_depth, seen
    )
    basis_labels = _basis_plan(rng, num_qubits, num_samples, max_bases)
    counts = _simulate_chunk(
        key, [qc for qc, _ in pool], basis_labels, shots, ncfg
    )
    clean = states.batch_statevectors([qc for qc, _ in pool])
    return [
        CircuitRecord(
            id=i,
            hash=h,
            depth=qc.depth,
            clean_state=clean[i],
            basis_labels=basis_labels[i].astype(np.int8),
            counts=counts[i],
        )
        for i, (qc, h) in enumerate(pool)
    ]


def build_dataset_chunked(
    seed: int,
    num_samples: int,
    num_qubits: int,
    out_dir: str,
    chunk_size: int = 500,
    min_depth: int = 2,
    max_depth: int = 10,
    shots: int = 1024,
    noise_type: str = "torino",
    max_bases: int = 50,
    log_fn=print,
) -> list[str]:
    """Chunked builder writing ``part_K.npz`` shards (reference
    ``generate_batched_dataset``). Returns shard paths.

    Resumable: existing shards are kept, their hashes reload into the dedup
    set, and generation continues from the next part index.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    seen: set[str] = set()
    hash_file = os.path.join(out_dir, "seen_hashes.txt")
    if os.path.exists(hash_file):
        seen.update(l.strip() for l in open(hash_file) if l.strip())
    import glob as _glob

    existing = sorted(_glob.glob(os.path.join(out_dir, "part_*.npz")))
    total = len(seen)
    part = len(existing)
    paths = list(existing)
    while total < num_samples:
        take = min(chunk_size, num_samples - total)
        pool = _unique_circuits(
            rng, take, num_qubits, min_depth, max_depth, seen
        )
        basis_labels = _basis_plan(rng, num_qubits, take, max_bases)
        counts = _simulate_chunk(
            jax.random.fold_in(key, part),
            [qc for qc, _ in pool], basis_labels, shots,
            noise.get_noise_config(noise_type),
        )
        clean = states.batch_statevectors([qc for qc, _ in pool])
        records = [
            CircuitRecord(
                id=total + i,
                hash=h,
                depth=qc.depth,
                clean_state=clean[i],
                basis_labels=basis_labels[i].astype(np.int8),
                counts=counts[i],
            )
            for i, (qc, h) in enumerate(pool)
        ]
        path = os.path.join(out_dir, f"part_{part}.npz")
        save_shard(path, records)
        with open(hash_file, "a") as f:
            f.write("".join(h + "\n" for _, h in pool))
        paths.append(path)
        total += take
        part += 1
        log_fn(f"saved {path} ({total}/{num_samples} circuits)")
    return paths
