"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is warmed once (plan compile + scan setup) and then timed on
a ``noop``-format write — the full plan executes on the executors and
every result row is materialized and discarded there, so the timing
measures the engine, not the driver transfer (a plain ``collect()``
would bill multi-100k-row results' ser/de to the query; VERDICT r1
flagged exactly that on join_fanout_1n).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entrymod
    from lake_satellite_image_etl_spark.session import get_spark

    bench_names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    if bench_names:
        names = [n for n in bench_names.split(",") if n in queries]
    else:
        names = list(queries)

    timings: dict[str, float] = {}
    total = 0.0
    for i, name in enumerate(names):
        # liveness breadcrumb on stderr (stdout stays ONE JSON line);
        # BENCH_r05 recorded a truncated tail — if a runner caps wall
        # time, the log should at least show how far the run got.
        print(f"bench [{i + 1}/{len(names)}] {name}", file=sys.stderr, flush=True)
        fn = queries[name]
        try:
            fn(spark, SF_DIR).limit(1).collect()  # warm: plan + scan setup
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 4)
        total += dt if dt == dt else 0.0
        # drop accumulated state between queries: 70 queries in one JVM
        # otherwise build up broadcasts/codegen until GC thrash inflates
        # late-running queries by 3-5× (measured) — the bench should
        # time each query cold-state, like the driver's per-query runs.
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(SF_DIR),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
