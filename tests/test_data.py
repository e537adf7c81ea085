"""Dataset builder / records / loader tests, incl. reference .pt conversion."""

import os

import jax
import numpy as np
import pytest

from ddqst_tpu.data import generate, loader, records


def _mk_record(i, n=2, bases=9, d=4):
    rng = np.random.default_rng(i)
    psi = rng.normal(size=d) + 1j * rng.normal(size=d)
    psi /= np.linalg.norm(psi)
    return records.CircuitRecord(
        id=i,
        hash=f"hash{i}",
        depth=3,
        clean_state=psi.astype(np.complex64),
        basis_labels=rng.integers(0, 3, (bases, n)).astype(np.int8),
        counts=rng.integers(0, 50, (bases, d)).astype(np.int32),
    )


def test_shard_roundtrip(tmp_path):
    recs = [_mk_record(i) for i in range(3)]
    path = str(tmp_path / "part_0.npz")
    records.save_shard(path, recs)
    back = records.load_shard(path)
    assert len(back) == 3
    np.testing.assert_allclose(back[1].clean_state, recs[1].clean_state)
    np.testing.assert_array_equal(back[2].counts, recs[2].counts)
    assert back[0].hash == "hash0"


def test_load_dataset_skips_corrupt(tmp_path, capsys):
    records.save_shard(str(tmp_path / "part_0.npz"), [_mk_record(0)])
    (tmp_path / "part_1.npz").write_bytes(b"not a zip")
    recs = records.load_dataset(str(tmp_path))
    assert len(recs) == 1


def test_convert_reference_pt(tmp_path):
    """Read a shipped reference part without qiskit and verify structure."""
    src = "/root/reference/Datapoints/rqc_N3_data/part_1.pt"
    if not os.path.exists(src):
        pytest.skip("reference dataset not mounted")
    out = records.convert_reference_pt(src, str(tmp_path))
    recs = records.load_shard(out[0])
    assert len(recs) > 0
    r = recs[0]
    assert r.clean_state.shape == (8,)
    assert abs(np.linalg.norm(r.clean_state) - 1.0) < 1e-3
    assert r.basis_labels.shape == (27, 3)  # full 3^3 tomography
    assert (r.counts.sum(axis=1) == 1024).all()  # 1024 shots/basis
    assert 2 <= r.depth <= 10


def test_build_dataset_unique_and_valid():
    recs = generate.build_dataset(
        seed=0, num_samples=5, num_qubits=2, min_depth=2, max_depth=4,
        shots=100, noise_type="ideal",
    )
    assert len(recs) == 5
    hashes = {r.hash for r in recs}
    assert len(hashes) == 5
    for r in recs:
        assert (r.counts.sum(axis=1) == 100).all()
        assert abs(np.linalg.norm(r.clean_state) - 1) < 1e-4
        assert r.basis_labels.shape == (9, 2)


def test_build_dataset_shadow_capping():
    recs = generate.build_dataset(
        seed=0, num_samples=2, num_qubits=2, shots=50, noise_type="ideal",
        max_bases=4,
    )
    assert recs[0].basis_labels.shape == (4, 2)
    # Per-circuit random shadows differ between circuits (w.h.p.).
    assert not np.array_equal(recs[0].basis_labels, recs[1].basis_labels)


def test_build_dataset_chunked_resume(tmp_path):
    out = str(tmp_path / "ds")
    paths = generate.build_dataset_chunked(
        seed=0, num_samples=4, num_qubits=2, out_dir=out, chunk_size=2,
        shots=50, noise_type="readout", max_bases=9,
        log_fn=lambda *a: None,
    )
    assert len(paths) == 2
    # Resume: ask for 6 total -> one more chunk, previous shards kept.
    paths2 = generate.build_dataset_chunked(
        seed=1, num_samples=6, num_qubits=2, out_dir=out, chunk_size=2,
        shots=50, noise_type="readout", max_bases=9,
        log_fn=lambda *a: None,
    )
    assert len(paths2) == 3
    recs = records.load_dataset(out)
    assert len(recs) == 6
    assert len({r.hash for r in recs}) == 6  # dedup survived the resume


def test_loader_unroll_exact():
    rec = _mk_record(0)
    arrays = loader.dataset_to_training_arrays([rec], mode="unroll")
    assert arrays["bits"].shape[0] == int(rec.counts.sum())
    # Reconstruct counts from the unrolled bits for one basis row.
    bits = np.asarray(arrays["bits"])
    b_lab = np.asarray(arrays["basis_labels"])
    row0 = (b_lab == rec.basis_labels[0]).all(axis=1)
    # Row 0's label may repeat in other rows; just check global totals.
    outcome = bits[:, 0] + 2 * bits[:, 1]
    assert len(outcome) == int(rec.counts.sum())


def test_loader_sampled_distribution():
    rec = _mk_record(1)
    arrays = loader.dataset_to_training_arrays(
        [rec], mode="sampled", num_samples=5000, seed=0
    )
    assert arrays["bits"].shape == (5000, 2)
    assert arrays["basis_idx"].shape == (5000,)


def test_loader_basis_idx_consistency():
    rec = _mk_record(2)
    arrays = loader.dataset_to_training_arrays([rec], mode="unroll")
    from ddqst_tpu.models.transformer import labels_to_basis_idx
    import jax.numpy as jnp

    expect = labels_to_basis_idx(arrays["basis_labels"].astype(jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(arrays["basis_idx"]), np.asarray(expect)
    )


def test_evaluate_dataset_harness(tmp_path, key):
    from ddqst_tpu import evaluate as ev
    from ddqst_tpu import train as training
    from ddqst_tpu.config import TrainConfig
    from ddqst_tpu.models import ConditionalD3PM
    from ddqst_tpu.ops import schedules

    recs = generate.build_dataset(
        seed=0, num_samples=3, num_qubits=2, min_depth=2, max_depth=5,
        shots=200, noise_type="readout",
    )
    arrays = loader.dataset_to_training_arrays(recs, mode="unroll")
    model = ConditionalD3PM(num_qubits=2, num_bases=9, num_timesteps=10,
                            embed_dim=8, hidden_dim=32, num_blocks=1)
    sched = schedules.cosine_schedule(10)
    cfg = TrainConfig(batch_size=256, num_epochs=3, optimizer="adam",
                      log_every=0, eval_every=0)
    state, _ = training.fit(key, model, arrays["bits"], arrays["basis_idx"],
                            cfg, sched, log_fn=lambda *a: None)
    out = ev.evaluate_dataset(
        key, recs, state.apply_fn, {"params": state.params}, 2, sched,
        shots_infer=300, out_dir=str(tmp_path), log_fn=lambda *a: None,
    )
    assert len(out) == 3
    assert all(0 <= r["raw_fidelity"] <= 1.001 for r in out)
    assert os.path.exists(tmp_path / "metrics.csv")
    assert os.path.exists(tmp_path / "fidelity_lift.png")
    assert os.path.exists(tmp_path / "universality.png")

def test_train_on_reference_dataset(tmp_path, key):
    """Integration: convert a shipped reference part and train briefly."""
    src = "/root/reference/Datapoints/rqc_N3_data/part_3.pt"
    if not os.path.exists(src):
        pytest.skip("reference dataset not mounted")
    out = records.convert_reference_pt(src, str(tmp_path))
    recs = records.load_shard(out[0])[:4]
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset

    cfg = get_preset("rqc")
    cfg = cfg.replace(
        model=cfg.model.__class__(input_encoding="token", embed_dim=8,
                                  hidden_dim=32, num_blocks=1),
        diffusion=cfg.diffusion.__class__(num_timesteps=8, schedule="cosine"),
        train=cfg.train.__class__(batch_size=512, num_epochs=2,
                                  optimizer="adam", log_every=0, eval_every=0),
    )
    state, eval_recs = pipeline.train_on_dataset(
        cfg, recs, save_dir=str(tmp_path / "exp"), run_name="ref",
        num_eval_circuits=2, log_fn=lambda *a: None,
    )
    assert int(state.step) > 0
    assert os.path.exists(tmp_path / "exp" / "ref_eval.npz")


def test_circuit_conditioned_training_and_eval(tmp_path, key):
    """Circuit-ID conditioning: per-circuit d3pm reconstruction works."""
    from ddqst_tpu import evaluate as ev
    from ddqst_tpu import pipeline
    from ddqst_tpu.config import get_preset
    from ddqst_tpu.ops.schedules import make_schedule

    recs = generate.build_dataset(
        seed=0, num_samples=3, num_qubits=2, min_depth=2, max_depth=4,
        shots=400, noise_type="ideal",
    )
    cfg = get_preset("rqc")
    cfg = cfg.replace(
        model=cfg.model.__class__(input_encoding="token", embed_dim=16,
                                  hidden_dim=64, num_blocks=2,
                                  condition_on_circuit=True),
        diffusion=cfg.diffusion.__class__(num_timesteps=20, schedule="cosine",
                                          sampler="renoise"),
        train=cfg.train.__class__(batch_size=512, learning_rate=2e-3,
                                  optimizer="adam", num_epochs=40,
                                  log_every=0, eval_every=0),
        data=cfg.data.__class__(num_qubits=2),
    )
    state, eval_recs = pipeline.train_on_dataset(
        cfg, recs, num_eval_circuits=3, seed=0, log_fn=lambda *a: None
    )
    schedule = make_schedule("cosine", 20)
    out = ev.evaluate_dataset(
        key, eval_recs, state.apply_fn, {"params": state.params}, 2,
        schedule, shots_infer=500, exact=False, circuit_conditioned=True,
        log_fn=lambda *a: None,
    )
    # Per-circuit generated fidelities track the (ideal-data) raw ones.
    assert all(r["d3pm_fidelity"] > 0.5 for r in out)
    # Circuits are distinguishable: fidelity against the RIGHT target is
    # far above the fidelity the blended (unconditioned) model achieved.
    assert np.mean([r["d3pm_fidelity"] for r in out]) > 0.6
