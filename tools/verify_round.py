"""One-command round-exit verification — the ritual SCALE.md's exit
records are built from, so every round ends with the same evidence:

  1. full pytest suite
  2. full-inventory oracle sweep in STRICT (stringified-value) mode at
     sf0.01 — the closest local proxy for the driver's hash gate
  3. whole-inventory plan audit (single-partition funnels / re-scans)

Prints one summary line per stage and exits non-zero if anything fails.
Runtime ~30 min on local[32]; stages run sequentially to avoid skewing
each other's timings.

Usage: python tools/verify_round.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str]) -> tuple[bool, str, float]:
    t0 = time.time()
    # QS_FULL_TESTS=1: round-exit verification always runs the COMPLETE
    # suite and the full oracle-gate sweep — the fast default profile
    # (tests/conftest.py, r15) exists for the driver's time budget, not
    # for the builder's exit ritual.
    env = dict(os.environ, QS_FULL_TESTS="1")
    p = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, env=env
    )
    dt = time.time() - t0
    tail = (p.stdout or "").strip().splitlines() or (
        p.stderr or ""
    ).strip().splitlines()
    last = tail[-1] if tail else "(no output)"
    return p.returncode == 0, f"{label}: {last} [{dt:.0f}s]", dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    stages = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        (
            "oracle-strict",
            [sys.executable, "tools/check_oracle.py", "--strict", sf_dir],
        ),
        ("plan-audit", [sys.executable, "tools/plan_audit.py", sf_dir]),
    ]
    ok_all = True
    for label, cmd in stages:
        ok, line, _dt = _run(label, cmd)
        print(("PASS " if ok else "FAIL ") + line)
        ok_all = ok_all and ok
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
