"""Plan-shape regression gate (VERDICT r11 item 5): every registered
query's physical-plan feature counts (shuffles, broadcasts, join
strategies, filter pushdown, Arrow stages) must match the committed
golden map ``tools/plan_golden.json``.

The triangle-kernel 9×-recompute (r11) was caught by a HUMAN reading
exchange counts in PLANS.md; this test makes that catch mechanical —
a plan that grows a shuffle, loses its pushed filter, or silently
picks up a SortMergeJoin fails here until the author re-runs
``python tools/plan_audit.py --write`` and commits the PLANS.md +
plan_golden.json diff (the diff IS the acknowledgment; exact equality
means the golden can't rot in either direction, the same contract as
the construction-jobs allowlist).

Determinism note: plan text depends on what is ALREADY persisted when
a plan compiles (a cached multi-consumer subtree reprints as
InMemoryTableScan), so both the golden writer and this test compile
from an empty cache in registry order.
"""

from __future__ import annotations

import json
import os

def test_plan_shape_matches_golden(spark):
    from lake_satellite_image_etl_spark import registry
    from lake_satellite_image_etl_spark.caching import release_all

    # GOLDEN_SF_DIR, not conftest's SF_ORACLE: the gate must compile
    # against the SAME path constant the golden writer pins (the
    # writer refuses to write under an env override — ADVICE r12)
    from tools.plan_audit import (
        GOLDEN_PATH,
        GOLDEN_SF_DIR,
        audit_one,
        golden_row,
    )

    assert os.path.exists(GOLDEN_PATH), (
        "no plan golden committed — run `python tools/plan_audit.py "
        "--write` and commit tools/plan_golden.json"
    )
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)

    qs, _ = registry.load_all()
    # empty-cache start + registry iteration order: the exact state
    # the golden writer (a fresh plan_audit process) compiles under
    release_all()
    spark.catalog.clearCache()

    drifted: list[str] = []
    errors: list[str] = []
    for name, fn in qs.items():
        try:
            plan = (
                fn(spark, GOLDEN_SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: PLAN ERROR {e}")
            continue
        got = golden_row(audit_one(name, plan))
        want = golden.get(name)
        if want is None:
            drifted.append(f"{name}: NEW entry, not in golden")
        elif got != want:
            delta = {
                k: f"{want[k]}->{got[k]}" for k in got if got[k] != want[k]
            }
            drifted.append(f"{name}: {delta}")
    for name in set(golden) - set(qs):
        drifted.append(f"{name}: in golden but not registered")

    assert not errors, errors
    assert not drifted, (
        "plan shape drifted vs tools/plan_golden.json — if intended, "
        "re-run `python tools/plan_audit.py --write` and commit the "
        "PLANS.md + plan_golden.json diff:\n  " + "\n  ".join(drifted)
    )
