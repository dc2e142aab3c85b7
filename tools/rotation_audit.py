"""Rotation-window audit — the staleness/SLA arithmetic the rotation
policy (registry.py::_PRIORITY, standing policy restated r13) depends
on, as a committed tool instead of a per-round hand derivation.

Reads CORRECTNESS_r*.json + the registry and reports:

1. the staleness histogram (latest driver round per entry);
2. entries never driver-checked (must be next window's rule-2 heads);
3. SLA state: with ``--next-round N``, which entries would BREACH the
   6-round SLA if NOT in round N's window (i.e. latest <= N - 6);
4. window audit: whether the registry's front-50 (the driver's
   observed check cap) covers every would-breach entry and every
   entry of the oldest due tier, plus the window's tier composition.

Usage:
    python tools/rotation_audit.py [--next-round N] [--window 50]

With no --next-round, N defaults to (max seen round) + 1 — auditing
the window the CURRENT registry order would present to the next
driver run. Exit 1 if a would-breach or never-checked entry is
missing from the window; 0 otherwise. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: the standing rotation policy's staleness bound (registry.py):
#: no green entry goes more than this many rounds without a driver row
SLA_ROUNDS = 6


def load_latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            with open(f) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for k in rows:
            latest[k] = max(latest.get(k, 0), rnd)
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--next-round", type=int, default=None)
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    from lake_satellite_image_etl_spark.registry import load_all

    queries, oracles = load_all()
    names = list(queries)
    latest = load_latest_rounds()
    max_round = max(latest.values(), default=0)
    # `is not None`, not `or` (ADVICE r15): an explicit --next-round 0
    # must audit round 0, not silently fall back to max_round + 1
    next_round = (
        args.next_round if args.next_round is not None else max_round + 1
    )

    hist: dict[int, int] = {}
    for n in names:
        hist[latest.get(n, 0)] = hist.get(latest.get(n, 0), 0) + 1

    never = sorted(n for n in names if n not in latest)
    # an entry last green at round r is (next_round - r) rounds stale
    # when round next_round runs; it breaches if that exceeds SLA
    would_breach = sorted(
        n
        for n in names
        if n in latest and next_round - latest[n] > SLA_ROUNDS
    )
    oldest_round = min((latest[n] for n in names if n in latest), default=0)
    oldest_tier = sorted(
        n for n in names if latest.get(n) == oldest_round
    )

    window = names[: args.window]
    wset = set(window)
    breach_missing = [n for n in would_breach if n not in wset]
    never_missing = [n for n in never if n not in wset]
    oldest_missing = [n for n in oldest_tier if n not in wset]
    comp: dict[str, int] = {}
    for n in window:
        tier = f"r{latest[n]}" if n in latest else "never"
        comp[tier] = comp.get(tier, 0) + 1

    report = {
        "registered": len(names),
        "oracled": len(oracles),
        "max_seen_round": max_round,
        "audited_next_round": next_round,
        "staleness_histogram": {
            f"r{k}" if k else "never": v for k, v in sorted(hist.items())
        },
        "never_checked": never,
        "would_breach_if_skipped": would_breach,
        "window_size": len(window),
        "window_tier_composition": dict(
            sorted(comp.items(), key=lambda kv: kv[0])
        ),
        "sla_breach_entries_missing_from_window": breach_missing,
        "never_checked_missing_from_window": never_missing,
        # informational, not gating: the oldest tier is usually DUE
        # next-next round, so partial coverage is a planning choice
        "oldest_tier": f"r{oldest_round}",
        "oldest_tier_missing_from_window": oldest_missing,
        "ok": not breach_missing and not never_missing,
    }
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
