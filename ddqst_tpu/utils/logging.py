"""Structured metrics logging + throughput counters.

The reference's observability is bare ``print()`` every K epochs and a
pandas ``metrics.csv`` (``evaluate.py:100-102``, SURVEY.md §5). This module
keeps those behaviours (stdout lines, CSV writer) and adds the throughput
counters (steps/sec, samples/sec) that are the benchmark headline metrics.
"""

from __future__ import annotations

import csv
import json
import time


class Throughput:
    """Wall-clock counter: call ``tick(n_items)`` per step, read ``rate``."""

    def __init__(self):
        self.items = 0
        self.start = time.perf_counter()

    def tick(self, n: int = 1) -> None:
        self.items += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    @property
    def rate(self) -> float:
        e = self.elapsed
        return self.items / e if e > 0 else 0.0


def write_metrics_csv(path: str, records: list[dict]) -> None:
    """metrics.csv with one row per record (reference ``evaluate.py:100``)."""
    if not records:
        return
    keys = list(records[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(records)


def log_jsonl(path: str, record: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
