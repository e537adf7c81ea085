"""Shared TPU-relay client protocol for segmented campaign drivers.

Encodes the hard-won rules from CLAUDE.md "wedge modes" so campaigns
survive transient relay failures without a human re-driving them at 03:00
(VERDICT r3 weak #2):

- >=60 s cooldown between client processes after a kill or crash;
- never relaunch into a wedged worker — a tiny-matmul health-check child
  must succeed first;
- a wedged dispatch shows flat CPU forever, so segments can carry a
  wall-clock timeout (killed-mid-compile programs still land in the
  worker's cache, so a kill + retry resumes past the compile);
- RESOURCE_EXHAUSTED / worker crashes are usually transient (the round-3
  GHZ-8 campaign died on one at segment 2) — retry a bounded number of
  times before surfacing the failure.

Used by ``run_frontier_segments.py`` and ``run_shadow_segments.py``;
CPU-tested with injected failures (``tests/test_campaign_drivers.py``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def cpu_mode() -> bool:
    return os.environ.get("DDQST_CPU") == "1"


def maybe_inject_failure(role: str) -> None:
    """Test hook: if DDQST_FAIL_ONCE names an existing file and this child
    is a distill segment, consume the file and die — simulates the
    transient relay crash the retry loop must absorb."""
    flag = os.environ.get("DDQST_FAIL_ONCE", "")
    if flag and role == "distill" and os.path.exists(flag):
        os.remove(flag)
        print("[relay-protocol] injected transient failure", flush=True)
        sys.exit(17)


def probe_healthy(probe_cmd: list[str], tries: int = 3) -> bool:
    """Run the tiny-matmul probe child until it exits 0 (or give up)."""
    wait = 2 if cpu_mode() else 120
    for t in range(tries):
        try:
            pr = subprocess.run(probe_cmd, timeout=900)
            if pr.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[relay-protocol] health probe failed (try {t + 1}); "
              f"waiting {wait} s", flush=True)
        time.sleep(wait)
    return False


def run_with_retries(
    cmd: list[str],
    probe_cmd: list[str],
    label: str,
    retries: int = 2,
    cooldown: int = 60,
    timeout: int = 0,
    log_prefix: str = "[segments]",
) -> bool:
    """Run one segment child; on failure, cooldown + health-check + retry."""
    floor = cooldown if cpu_mode() else max(cooldown, 60)
    for attempt in range(retries + 1):
        print(f"{log_prefix} launching {label} "
              f"(attempt {attempt + 1}, {time.strftime('%H:%M:%S')})",
              flush=True)
        try:
            rc = subprocess.run(cmd, timeout=timeout or None).returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"  # child killed by subprocess.run
        if rc == 0:
            return True
        print(f"{log_prefix} {label} rc={rc} (attempt {attempt + 1})",
              flush=True)
        if attempt == retries:
            return False
        time.sleep(floor)
        if not probe_healthy(probe_cmd):
            print(f"{log_prefix} relay unhealthy after probes; aborting",
                  flush=True)
            return False
    return False
