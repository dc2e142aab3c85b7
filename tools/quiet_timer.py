"""Quiet-box isolated timer — the VERDICT r14 item 2 protocol as a
committed, repeatable tool.

Every r13/r14 per-query number carried a 9-72x calibration spread, so
"is dq_knn_recall_eval really <4 s isolated now" could not be answered
from the driver maps. This tool makes the measurement only when it
would be meaningful:

1. run bench.py's calibration child (fresh JVM);
2. gate on the verdict's quiet-box thresholds —
   spark_groupby_20m_sec.max < 1.5 AND numpy_matmul_1500_sec.max <
   0.05; exit 2 with the readings if the box is loud (re-run later);
3. if quiet, time each named query ISOLATED (one fresh JVM per
   sample) min-of-N (default 3) via bench.py --run-batch, re-checking
   the yardstick AFTER the runs so a mid-measurement mode flip is
   visible;
4. print one JSON line with the calibrations and per-query samples;
   exit 3 (after printing) if the POST yardstick is loud — the box
   mode flipped mid-measurement, so the samples were not all taken
   under the quiet gate they claim (ADVICE r15).

Usage:
    python tools/quiet_timer.py [--reps 3] [--force] name [name ...]

--force skips the gate (records the loud-box readings anyway, clearly
flagged quiet=false). SPARK_GRAFT_SF_DIR picks the fixture (default
sf0.1, matching the driver bench).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO_ROOT, "bench.py")

QUIET_GROUPBY_MAX = 1.5
QUIET_MATMUL_MAX = 0.05


def _calibrate() -> dict:
    proc = subprocess.run(
        [sys.executable, BENCH, "--calibrate"], capture_output=True, text=True
    )
    sys.stderr.write(proc.stderr)
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])["calibration"]
    except (IndexError, ValueError, KeyError):
        return {}


def _is_quiet(cal: dict) -> bool:
    sg = cal.get("spark_groupby_20m_sec") or {}
    mm = cal.get("numpy_matmul_1500_sec") or {}
    return (
        sg.get("max", float("inf")) < QUIET_GROUPBY_MAX
        and mm.get("max", float("inf")) < QUIET_MATMUL_MAX
    )


def _time_isolated(name: str) -> float:
    proc = subprocess.run(
        [sys.executable, BENCH, "--run-batch", name],
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr)
    try:
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        return float(payload["queries"][name])
    except (IndexError, ValueError, KeyError, TypeError):
        return float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    cal_pre = _calibrate()
    quiet = _is_quiet(cal_pre)
    if not quiet and not args.force:
        print(
            json.dumps(
                {"quiet": False, "calibration_pre": cal_pre, "queries": {}}
            )
        )
        return 2

    results: dict[str, dict] = {}
    for name in args.names:
        samples = [_time_isolated(name) for _ in range(args.reps)]
        good = [s for s in samples if s == s]
        results[name] = {
            "samples": [round(s, 3) for s in samples],
            "min": round(min(good), 3) if good else None,
        }
    cal_post = _calibrate()
    quiet_post = _is_quiet(cal_post)
    print(
        json.dumps(
            {
                "quiet": quiet and quiet_post,
                "calibration_pre": cal_pre,
                "calibration_post": cal_post,
                "reps": args.reps,
                "sf_dir": os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                ),
                "queries": results,
            }
        )
    )
    # a mid-measurement mode flip invalidates the quiet gate the
    # measurement was taken under — exit 3 (ADVICE r15), mirroring
    # the pre-gate's exit 2, so exit-code consumers can't accept a
    # payload whose quiet=false they never read. --force opts out of
    # gating entirely, same as it does for the pre-gate.
    if not quiet_post and not args.force:
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
