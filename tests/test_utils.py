"""Smoke tests for utils (logging, profiling) and viz."""

import os
import time

import numpy as np

from ddqst_tpu.utils import logging as ulog
from ddqst_tpu.utils import profiling


def test_throughput_counter():
    t = ulog.Throughput()
    t.tick(10)
    t.tick(5)
    time.sleep(0.01)
    assert t.items == 15
    assert t.rate > 0


def test_metrics_csv_and_jsonl(tmp_path):
    path = str(tmp_path / "m.csv")
    ulog.write_metrics_csv(path, [{"a": 1, "b": 2.5}, {"a": 3, "b": 4.5}])
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "a,b"
    assert len(lines) == 3
    jl = str(tmp_path / "log.jsonl")
    ulog.log_jsonl(jl, {"x": 1})
    ulog.log_jsonl(jl, {"x": 2})
    assert len(open(jl).read().strip().splitlines()) == 2


def test_timed_context(capsys):
    with profiling.timed("block", log_fn=print):
        _ = sum(range(100))
    assert "[timed] block" in capsys.readouterr().out


def test_viz_state_city_and_heatmap(tmp_path):
    from ddqst_tpu import viz
    from ddqst_tpu.qsim import states

    psi = states.bell_state()
    rho = np.outer(psi, psi.conj())
    p1 = viz.plot_state_city(rho, "bell", str(tmp_path / "city.png"))
    p2 = viz.plot_error_heatmap(rho, rho * 0.9, str(tmp_path / "hm.png"))
    p3 = viz.plot_losses(np.linspace(1, 0.1, 50), str(tmp_path / "l.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000
