"""The rotation audit (tools/rotation_audit.py) must agree with the
repo's own artifacts: every registered entry oracled, the registry
front-window covering every would-breach / never-checked entry, and
the staleness arithmetic consistent. Driver-side only (no Spark
session; load_all only imports modules)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_audit_green_on_this_repo():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "rotation_audit.py")],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["registered"] == report["oracled"]
    assert report["sla_breach_entries_missing_from_window"] == []
    assert report["never_checked_missing_from_window"] == []
    # histogram totals must cover the whole registry
    assert sum(report["staleness_histogram"].values()) == report["registered"]
    # the audited round is the next one after the newest artifact
    assert report["audited_next_round"] == report["max_seen_round"] + 1


def test_load_latest_rounds_matches_artifacts():
    sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
    from rotation_audit import load_latest_rounds

    latest = load_latest_rounds()
    assert latest, "no CORRECTNESS artifacts found"
    # spot-check: an entry present in CORRECTNESS_r14 maps to >= 14
    with open(os.path.join(REPO_ROOT, "CORRECTNESS_r14.json")) as f:
        r14 = json.load(f)
    for k in list(r14)[:5]:
        assert latest[k] >= 14
