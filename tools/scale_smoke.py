"""Scale smoke for the dedup/similarity block (VERDICT r3 item 5):
run the headline LLM-pipeline queries against the ~10×-documents /
60×-embeddings fixture (tools/gen_scale_fixture.py; 50 K docs, 120 K
vectors) and compare wall time against sf0.1 in the same JVM.

What it checks, beyond "finishes":

1. EMBEDDING_BROADCAST_CAP must TRIP — dedup_embedding_cosine refuses
   120 K vectors with a ValueError naming the LSH route. The first
   empirical (not plan-shape) proof the engine never driver-collects
   past the cap.
2. The parameterized LSH geometry must carry the load the registered
   8-bit one can't: at 120 K vectors 8-bit bands have ~470 occupancy
   (~2·10⁸ candidates), so the smoke drives embedding_cosine_lsh_pairs
   at 8 bands × 16 bits (65 536 keys/band, occupancy ≈ 2) — the
   log₂(n) sizing the kernel docstring prescribes.
3. Document-side operators should scale ≲ linearly (10× rows): each
   query's ratio is printed against the row ratio. Similarity queries
   are normalized per query-vector — the fixed vec_id % 53 workload
   grows the query set 60× alongside the corpus, so raw wall time
   scales ~n²/53 BY WORKLOAD DESIGN; cost per query is the
   scale-relevant number.

Usage: python tools/scale_smoke.py [--regen]
Prints one JSON line; paste the table into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SCALE_DIR = "/root/repo/.scratch/sfscale"
BASE_DIR = "/root/testdata/sf0.1"

#: registered document-side queries: row ratio = 10×
DOC_QUERIES = [
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "graph_components_star",
    "dedup_sorted_neighborhood",
    "dedup_containment",
    "corpus_bloom_prefilter",
    "corpus_bpe_apply",
    "text_profile",
    "text_tfidf_top_terms",
    "text_bigram_lm_score",
    "text_wordpiece_tokenize",
    "pipeline_training_prep",
    # r11 additions: the keep-list and the banding-recall eval both
    # ride the bucketed MinHash machinery (10x docs)
    "dedup_canonical_keep",
    "dq_dedup_recall_eval",
    # r12: the leakage-free split composes the same closure build
    "sample_cluster_safe_split",
]

#: top-tier document rows (VERDICT r11 item 7): the two r11
#: closure-composing entries measured at the LARGEST doc step the
#: fixtures provide — sf0.01 (500 docs) → sfscale (50 000 docs),
#: 100× — the document-side analogue of the ANN entries' 240×
#: embeddings tier. Judged by the same linearity bar.
TOP_TIER_DOC_QUERIES = [
    "sample_cluster_safe_split",
    "dedup_canonical_keep",
]
TOP_TIER_BASE_DIR = "/root/testdata/sf0.01"
#: banded-rank family (VERDICT r7 item 6): exact order statistics via
#: bounded count-table shuffles instead of global sorts. These read
#: the TPC-H-ish tables (events/orders/lineitem), which the scale
#: fixture doesn't carry — smoked at the natural 10× step the
#: driver fixtures provide: sf0.01 → sf0.1.
BANDED_QUERIES = [
    "stats_robust_anomaly",
    "stats_equidepth_histogram",
    "agg_abc_pareto",
    "agg_gini_inequality",
    # r11: lineitem-based graph kernels after the lazy-persist fix
    # (the oriented edge build now computes once, not ~9x)
    "graph_triangle_count",
    "graph_clustering_coefficient",
]
BANDED_BASE_DIR = "/root/testdata/sf0.01"
BANDED_SCALE_DIR = "/root/testdata/sf0.1"
#: embedding-side CORPUS queries (work over all n vectors, no query
#: set): row ratio = 60×, judged on the same linearity bar as docs
EMB_QUERIES = ["dedup_semantic_cells"]
#: registered embedding-side queries: vectors 60×, queries 60× →
#: compare per-query, not raw
SIM_QUERIES = [
    "similarity_ivf_probe",
    "similarity_lsh_bucketed",
    "similarity_pq_adc",
    "similarity_ivf_pq",
    # derived cell geometry (r10): at 120 K vectors derive_seed_bits
    # lands on 6 bits -> 640 cells with no code change; the per-query
    # cost column is the flat-ms/query evidence for the derivation
    "similarity_ivf_autocells",
    # r11: the filtered and incremental-ingest variants
    "similarity_ann_filtered",
    "similarity_incremental_assign",
    # r12: the low-selectivity (~6%) filtered variant — its per-query
    # cost should sit BELOW similarity_ann_filtered's (the ladder
    # section proves the monotone-in-selectivity claim explicitly)
    "similarity_ann_filtered_sparse",
]


def _timed(fn, spark, sf_dir):
    """(wall seconds, output rows) for one query run.

    TIMING uses a noop-format write — the full plan executes and every
    result row materializes on the executors. It must NOT use
    ``count()``: Catalyst prunes all projection-only work under a
    count (a map-shaped query collapses to a zero-column parquet row
    count, ``ReadSchema: struct<>``), which would time nothing and let
    a real regression pass the linearity gate.

    The output ROW COUNT is taken in a separate (untimed) run because
    linearity must be judged against output growth too: the near-dup
    operators EMIT pairs, and on a denser-duplication corpus the true
    pair set grows faster than the input (SimHash on 10× word-soup
    docs legitimately finds ~68× the pairs) — wall/input-ratio alone
    would flag an operator whose per-pair throughput improved."""
    df = fn(spark, sf_dir)
    df.limit(1).collect()  # warm: plan + scan setup
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = round(time.perf_counter() - t0, 2)
    n_out = fn(spark, sf_dir).count()
    return dt, n_out


#: same policy and threshold as bench.py's isolated min-of-2: past
#: this yardstick spread the box is bimodal and a few-second
#: between-rung delta cannot be read off single timings.
YARDSTICK_ADVISORY_SPREAD = 3.0


def _yardstick(spark) -> list[float]:
    """Pure-Spark box-speed control (the bench calibration's 20 M-row
    groupBy), 3 samples in THIS JVM — brackets the noise-sensitive
    selectivity ladder so its gate can tell a real pushdown
    regression from a bimodal box (r15: the r14 ladder gate went red
    with the ladder's own rungs swinging 3x BETWEEN IDENTICAL runs
    while the plan goldens were byte-stable — the gate was reading
    machine state, not the plan)."""
    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000)
            .selectExpr("id % 1000 AS k")
            .groupBy("k")
            .count()
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(
        os.path.join(SCALE_DIR, "embeddings.parquet")
    ):
        from tools.gen_scale_fixture import main as gen

        gen()

    from lake_satellite_image_etl_spark import registry
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_embedding_cosine,
        embedding_cosine_lsh_pairs,
        simhash_pairs,
    )
    from lake_satellite_image_etl_spark.operators.similarity import (
        N_PROBE,
        ivf_assign,
        ivf_topk,
        pq_adc_topk,
    )
    from lake_satellite_image_etl_spark.caching import release_all
    from lake_satellite_image_etl_spark.session import get_spark

    queries, _ = registry.load_all()
    # the 120 K-vector tier broadcasts ~200 MB hash relations and the
    # IVF entries persist their assignment frames; one long-lived
    # local-mode JVM at the 8g default driver heap was measured to
    # fail a broadcast build mid-run (r12) — the smoke is the one
    # consumer that drives EVERY heavy entry through a single JVM.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, object] = {}

    # 1. the broadcast guard must trip at 120 K vectors
    try:
        dedup_embedding_cosine(spark, SCALE_DIR).limit(1).collect()
        report["broadcast_guard"] = "FAIL: exact baseline accepted 120K vectors"
        guard_ok = False
    except ValueError as e:
        assert "dedup_embedding_cosine_lsh" in str(e)
        report["broadcast_guard"] = "tripped (ValueError names the LSH route)"
        guard_ok = True

    # 2. the log2(n)-sized LSH geometry carries the 120 K load
    t0 = time.perf_counter()
    n_pairs = (
        embedding_cosine_lsh_pairs(
            spark.read.parquet(os.path.join(SCALE_DIR, "embeddings.parquet")),
            n_planes=128,
            band_bits=16,
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    lsh_scale_sec = round(time.perf_counter() - t0, 2)
    report["lsh_128p_16b_120k"] = {"sec": lsh_scale_sec}

    # 3. per-query timings, scale vs sf0.1. The linearity bar is
    # wall_ratio ≤ 2 × max(input_ratio, output_ratio): work is bounded
    # below by reading the input and emitting the output, so an
    # operator is "linear enough" when wall growth tracks whichever
    # grew more, with 2× slack for shuffle/log-factor costs.
    # SimHash at 10x drives the SCALED band geometry (20-bit bands,
    # 2^20 keys — the band_bits knob sized up for the larger corpus,
    # like the 16-bit embedding-LSH line above). The pair SET is
    # invariant under the knob while hamming_threshold < n_bands
    # (pigeonhole; equivalence pinned in tests/test_lsh_geometry.py),
    # so out_ratio stays comparable — only bucket occupancy/skew
    # changes.
    def _simhash_scaled(spark, sf_dir):
        return simhash_pairs(
            read_table(spark, sf_dir, "documents"), band_bits=20
        )

    # IVF at 120 K vectors drives the scaled CODEBOOK (seed_bits=5:
    # 10 labels × 32 = 320 cells ≈ √n), not the 10-cell fixture
    # codebook — 5 probes then scan ~1.6% of the corpus per query
    # instead of ~50%. Unlike the simhash knob this changes the
    # result set (different cells ⇒ different candidate recall); the
    # smoke checks cost shape, recall is pinned separately in
    # tests/test_ann_recall.py.
    def _ivf_scaled(spark, sf_dir):
        return ivf_topk(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
            seed_bits=5,
        )

    # SemDeDup at 120 K vectors drives the scaled codebook too
    # (320 cells ≈ √n): within-cell pair work is n·(n/cells) — with
    # the fixture codebook's 10 cells the self-join would be ~n²/10.
    def _semantic_scaled(spark, sf_dir):
        from lake_satellite_image_etl_spark.operators.similarity import (
            semantic_dedup_cells,
        )

        return semantic_dedup_cells(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
            seed_bits=5,
        )

    # PQ at 120 K vectors drives a SPARSE query stride: the registered
    # stride-53 set would mean ~2 265 full-corpus compressed scans in
    # one job — the smoke measures per-query cost, ~20 queries suffice.
    def _pq_scaled(spark, sf_dir):
        return pq_adc_topk(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
            query_stride=5987,
        )

    # IVF-PQ composition at 120 K vectors: the router restricts the
    # ADC scan to 32 of 320 probed lists (~10% of the corpus) — the
    # per-query cost line the similarity_ivf_pq docstring claims
    # (∝ probed-list mass, never the corpus). Same sparse stride as
    # the full-corpus PQ line so the two per-query numbers compare
    # directly.
    def _ivf_pq_scaled(spark, sf_dir):
        from lake_satellite_image_etl_spark.operators.similarity import (
            ivf_pq_topk,
        )

        return ivf_pq_topk(
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
            seed_bits=5,
            query_stride=5987,
        )

    scaled_fns = {
        "dedup_simhash": _simhash_scaled,
        "similarity_ivf_probe": _ivf_scaled,
        "dedup_semantic_cells": _semantic_scaled,
        "similarity_pq_adc": _pq_scaled,
        "similarity_ivf_pq": _ivf_pq_scaled,
    }
    scaled_geometry = {
        "dedup_simhash": "band_bits=20 (3 bands, 2^20 keys)",
        "similarity_ivf_probe": "seed_bits=5 (320 cells)",
        "dedup_semantic_cells": "seed_bits=5 (320 cells)",
        "similarity_pq_adc": "query_stride=5987 (~20 queries)",
        "similarity_ivf_pq": "seed_bits=5, 32/320 lists, stride 5987",
    }

    table: dict[str, dict[str, object]] = {}
    for name in DOC_QUERIES + EMB_QUERIES + SIM_QUERIES:
        fn = queries[name]
        base, base_rows = _timed(fn, spark, BASE_DIR)
        scale, scale_rows = _timed(scaled_fns.get(name, fn), spark, SCALE_DIR)
        entry: dict[str, object] = {
            "sf0.1_sec": base,
            "sfscale_sec": scale,
            "rows_out": {"sf0.1": base_rows, "sfscale": scale_rows},
        }
        if name in scaled_fns:
            entry["scaled_geometry"] = scaled_geometry[name]
        if name in DOC_QUERIES or name in EMB_QUERIES:
            entry["ratio"] = round(scale / base, 1) if base else float("nan")
            entry["row_ratio"] = 10.0 if name in DOC_QUERIES else 60.0
            entry["out_ratio"] = (
                round(scale_rows / base_rows, 1) if base_rows else float("nan")
            )
        else:
            # normalize by query-vector count: stride 53 at sf0.1
            # (2 000 vecs -> 38), stride 53 or the PQ smoke's sparse
            # 5987 at scale (120 000 vecs)
            n_scale_q = (
                120000 // 5987 + 1
                if name in ("similarity_pq_adc", "similarity_ivf_pq")
                else 120000 // 53 + 1
            )
            entry["per_query_ms"] = {
                "sf0.1": round(base / (2000 // 53 + 1) * 1000, 1),
                "sfscale": round(scale / n_scale_q * 1000, 1),
            }
        table[name] = entry
        release_all()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # dq_dedup_recall_eval emits ONE summary row, but its work is
    # Θ(scored pairs): the exact ground truth MATERIALIZES the
    # inverted-index join — Σ_shingle df·(df−1)/2 rows — and that
    # quantity is quadratic in per-shingle document frequency, so on
    # 10× same-vocabulary docs it legitimately grows ~40× (measured
    # 1.27 M → 50.6 M, r12). The row's own candidate/truth COUNTS
    # under-measure this (the Jaccard threshold cuts output, not
    # scored work — judging wall against them flagged a harness whose
    # per-pair throughput was flat). Normalize against the join size
    # itself, computed relationally below; the 100 TB story stays the
    # docstring's: exact eval runs on a SAMPLE, the quadratic truth
    # side is inherent to exactness, and the sampled harness keeps
    # the banded candidate path unchanged.
    if "dq_dedup_recall_eval" in table:
        from lake_satellite_image_etl_spark.io import read_table as _rt
        from lake_satellite_image_etl_spark.operators.dedup import (
            hashed_shingles,
            tokens_of,
        )
        from pyspark.sql import functions as _F

        def _join_pairs(sf_dir: str) -> int:
            docs = _rt(spark, sf_dir, "documents").select("doc_id", "text")
            ds = docs.withColumn("t", tokens_of(_F.col("text"))).select(
                "doc_id",
                _F.explode(
                    _F.array_distinct(hashed_shingles(_F.col("t")))
                ).alias("s"),
            )
            return int(
                ds.groupBy("s")
                .agg(_F.count(_F.lit(1)).alias("df"))
                .agg(
                    _F.sum(
                        _F.col("df") * (_F.col("df") - 1) / 2
                    ).alias("p")
                )
                .collect()[0]["p"]
            )

        ev = table["dq_dedup_recall_eval"]
        pair_b = _join_pairs(BASE_DIR)
        pair_s = _join_pairs(SCALE_DIR)
        ev["pairs_scored"] = {"sf0.1": pair_b, "sfscale": pair_s}
        ev["out_ratio"] = (
            round(pair_s / pair_b, 1) if pair_b else float("nan")
        )
        # sampled dedup eval (VERDICT r13 item 5): eval_sample_den
        # lands on the PROBE side of the inverted-index join before
        # the explode, so the Σ df·(df−1)/2 ground-truth work — the
        # quantity measured growing ~40× on 10× docs above — must
        # shrink ∝ the sample. GATE ON THE JOIN SIZE, not wall time
        # (r14 review: comparing two wall clocks from different
        # moments of a run on a box this round measured as bimodal
        # makes the gate a coin flip): the sampled probe-side join
        # emits Σ_s df_samp·df rows ≈ (2/den)·Σ df(df−1)/2, computed
        # relationally below — deterministic in the data, immune to
        # machine state, and red exactly when the predicate stops
        # reaching the probe side. Wall time stays as a REPORT field.
        from lake_satellite_image_etl_spark.operators.dedup import (
            dq_dedup_recall_eval as _ddre,
        )
        from lake_satellite_image_etl_spark.operators.similarity import (
            eval_sample_pred,
        )

        def _join_rows_sampled(sf_dir: str, den: int) -> int:
            docs = _rt(spark, sf_dir, "documents").select("doc_id", "text")
            ds = docs.withColumn("t", tokens_of(_F.col("text"))).select(
                "doc_id",
                _F.explode(
                    _F.array_distinct(hashed_shingles(_F.col("t")))
                ).alias("s"),
            )
            df_all = ds.groupBy("s").agg(_F.count(_F.lit(1)).alias("df"))
            df_smp = (
                ds.filter(eval_sample_pred(_F.col("doc_id"), den))
                .groupBy("s")
                .agg(_F.count(_F.lit(1)).alias("dfs"))
            )
            # dfs*(df-1), not dfs*df: exclude each sampled doc's
            # self-incidence so singleton shingles (df=1), which
            # contribute ZERO to pair_s = Σ df(df-1)/2, also
            # contribute zero here — on a singleton-dominated corpus
            # the old dfs*df sum could exceed 0.5*pair_s and flip
            # the gate red with the pushdown working (ADVICE r14).
            # Both sums now count the same pair population: this is
            # Σ_s |sampled probes in s| · |partners in s|.
            row = (
                df_all.join(df_smp, "s")
                .agg(
                    _F.sum(
                        _F.col("dfs") * (_F.col("df") - _F.lit(1))
                    ).alias("p")
                )
                .collect()[0]
            )
            return int(row["p"] or 0)

        t0 = time.perf_counter()
        srow = _ddre(spark, SCALE_DIR, eval_sample_den=8).collect()[0]
        samp_sec = round(time.perf_counter() - t0, 2)
        release_all()
        spark.catalog.clearCache()
        samp_rows = _join_rows_sampled(SCALE_DIR, 8)
        ev["sampled_den8"] = {
            "sec": samp_sec,  # report only — see gate comment
            "truth_pairs": srow["truth_pairs"],
            "banding_recall": srow["banding_recall"],
            "probe_join_rows": samp_rows,
            "full_join_pairs": pair_s,
        }
        # expected ≈ 2/den = 0.25× at den=8; 0.5× allows 2× skew in
        # which docs the md5 sample keeps, while a predicate that
        # stopped reaching the probe side reads ≈ 2.0×
        dedup_sampled_ok = (
            samp_rows <= 0.5 * pair_s
            and srow["truth_pairs"] > 0
            and 0.0 <= (srow["banding_recall"] or 0.0) <= 1.0
        )
        ev["sampled_ok"] = dedup_sampled_ok
    else:
        dedup_sampled_ok = True

    # banded-rank family at the fixtures' natural 10×: exactness
    # without a global sort must not cost super-linear wall time.
    for name in BANDED_QUERIES:
        fn = queries[name]
        base, base_rows = _timed(fn, spark, BANDED_BASE_DIR)
        scale, scale_rows = _timed(fn, spark, BANDED_SCALE_DIR)
        table[name] = {
            "sf0.01_sec": base,
            "sf0.1_sec": scale,
            "rows_out": {"sf0.01": base_rows, "sf0.1": scale_rows},
            "ratio": round(scale / base, 1) if base else float("nan"),
            "row_ratio": 10.0,
            "out_ratio": (
                round(scale_rows / base_rows, 1) if base_rows else float("nan")
            ),
        }
        release_all()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # top-tier (100×) document rows: the r11 closure-composing
    # entries at the largest doc step available
    for name in TOP_TIER_DOC_QUERIES:
        fn = queries[name]
        base, base_rows = _timed(fn, spark, TOP_TIER_BASE_DIR)
        scale, scale_rows = _timed(fn, spark, SCALE_DIR)
        table[f"{name}@100x"] = {
            "sf0.01_sec": base,
            "sfscale_sec": scale,
            "rows_out": {"sf0.01": base_rows, "sfscale": scale_rows},
            "ratio": round(scale / base, 1) if base else float("nan"),
            "row_ratio": 100.0,
            "out_ratio": (
                round(scale_rows / base_rows, 1) if base_rows else float("nan")
            ),
        }
        release_all()
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    # filtered-ANN selectivity ladder (VERDICT r11 item 6): per-query
    # cost must FALL with predicate selectivity — the pre-filter
    # semi-join empties probed lists before distance work. Stride 53
    # (~2 265 queries), NOT the PQ smoke's sparse 5987: with ~21
    # queries the selectivity-independent index-build cost dominates
    # and the ladder reads as noise; at 2 265 queries the per-query
    # marginal scan cost is the signal (measured r12: 9.7 ms/query at
    # 50% vs 1.5 at 6% on the registered entries). A post-filter
    # would cost the same at every selectivity and return fewer rows.
    from pyspark.sql import functions as F

    ladder: dict[str, dict[str, float]] = {}
    emb_scale_path = os.path.join(SCALE_DIR, "embeddings.parquet")
    emb_scale = spark.read.parquet(emb_scale_path)
    n_q = 120000 // 53 + 1
    # memo_path: codebook training is first-touch index build (the
    # registered entries' contract) — without it every rung's timed
    # run RE-TRAINS (~11 s fixed) and the per-query marginal scan
    # cost the ladder exists to compare drowns in the training
    # constant (measured r13: an untrained ladder read 5.5/6.2/5.0
    # ms/q — flat — while the trained one reads the real monotone
    # pre-filter slope).
    # ORDER-BALANCED timing (r13): by ladder time this JVM has run
    # dozens of heavy queries and accumulates monotone drift (GC /
    # storage-memory churn) that can exceed the few-second per-rung
    # scan deltas — a single forward pass measured the slope
    # INVERTED purely from rung position. Two passes in opposite rung
    # orders, min per rung: each rung gets one early and one late
    # placement, so monotone drift cancels in the min and the
    # marginal scan cost is the surviving signal.
    rungs = [
        ("50pct", "vec_id % 2 = 0"),
        ("6pct", "vec_id % 16 = 7"),
        ("1pct", "vec_id % 100 = 7"),
    ]
    ys_pre = _yardstick(spark)
    best: dict[str, tuple[float, int]] = {}
    for ordered in (rungs, list(reversed(rungs))):
        for sel_name, pred in ordered:
            fn = lambda spark, sf_dir, _p=pred: ivf_topk(  # noqa: E731
                emb_scale,
                seed_bits=5,
                candidate_ids=emb_scale.filter(F.expr(_p)).select("vec_id"),
                memo_path=emb_scale_path,
            )
            sec, rows_out = _timed(fn, spark, SCALE_DIR)
            if sel_name not in best or sec < best[sel_name][0]:
                best[sel_name] = (sec, rows_out)
            release_all()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
    for sel_name, (sec, rows_out) in best.items():
        ladder[sel_name] = {
            "sec": sec,
            "per_query_ms": round(sec / n_q * 1000, 1),
            "rows_out": rows_out,
        }
    report["filtered_ann_selectivity_ladder"] = ladder
    # THE GATE IS DETERMINISTIC PRUNED WORK, NOT WALL TIME (r15 —
    # the same adjudication the r14 dedup-sampling gate made): a
    # quiet-yardstick run (groupBy control 0.37-0.93 s) still read
    # the 6pct rung 1.5x ABOVE 50pct in wall time, while the pruned
    # pair-work — Σ over cells of probing-queries × surviving
    # candidates, the rows actually entering the distance kernel —
    # measured 1 368 539 / 171 322 / 27 324 (ratios 0.125 / 0.020,
    # exactly the candidate selectivities). At this corpus size the
    # selectivity-DEPENDENT distance work is tens of ms inside a
    # 5-9 s fixed-cost wall (assignment scan + semi-join shuffle +
    # top-k window), so the wall-time slope the gate used to compare
    # is ~99% machine state. Wall times stay in the report; the gate
    # now asserts the pre-filter reaches the probe lists BEFORE
    # distance work by measuring the work itself — a post-filter
    # would leave pair_work IDENTICAL across rungs.
    assigned_l = ivf_assign(emb_scale, seed_bits=5, memo_path=emb_scale_path)
    members_l = assigned_l.filter(F.col("crank") == 1).select(
        "vec_id", F.col("c_label").alias("cell")
    )
    probers_l = (
        assigned_l.filter(F.col("crank") <= N_PROBE)
        .filter(F.expr("vec_id % 53 = 0"))
        .groupBy(F.col("c_label").alias("cell"))
        .agg(F.count(F.lit(1)).alias("nq"))
    )
    work: dict[str, int] = {}
    for sel_name, pred in rungs:
        cand_l = (
            members_l.filter(F.expr(pred))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        row = (
            probers_l.join(cand_l, "cell")
            .agg(F.sum(F.col("nq") * F.col("nc")).alias("w"))
            .collect()[0]
        )
        work[sel_name] = int(row["w"] or 0)
        ladder[sel_name]["pair_work"] = work[sel_name]
    # true ratios are 0.125 (6pct) and 0.02 (1pct); 2x skew allowance,
    # same style as the dedup sampled gate
    sel_ok = (
        work["50pct"] > 0
        and work["6pct"] <= 0.25 * work["50pct"]
        and work["1pct"] <= 0.05 * work["50pct"]
    )
    report["filtered_selectivity_ok"] = sel_ok
    # the yardstick stays as CONTEXT for the wall-time columns (it no
    # longer affects the gate, which is deterministic)
    ys_post = _yardstick(spark)
    ys_all = ys_pre + ys_post
    ys_spread = (
        round(max(ys_all) / min(ys_all), 2) if min(ys_all) > 0 else None
    )
    report["selectivity_yardstick"] = {
        "groupby_pre": ys_pre,
        "groupby_post": ys_post,
        "spread": ys_spread,
    }

    # sampled n²-eval harness at the 120 K tier (VERDICT r12 item 3):
    # dq_knn_recall_eval's exact side is corpus² when run full —
    # 1.4×10¹⁰ pairs here, deliberately NOT attempted. With
    # eval_sample_den the exact side is |sample| × n (collected
    # sample matrix streamed against Arrow candidate batches), so
    # eval cost must track the SAMPLE: a warm-up run pays the
    # one-time index/memo construction, then two sample sizes 14.5×
    # apart (den 960 → 60, ~129 → ~1 873 query vectors) isolate the
    # MARGINAL per-sampled-query cost from the fixed graph-side
    # recompute. Measured r13: ~5 ms/query over the 120 K corpus —
    # the full 120 K-query exact side would add ~650 s, which is the
    # wall the knob removes at scale.
    from lake_satellite_image_etl_spark.operators.similarity import (
        dq_knn_recall_eval,
    )

    dq_knn_recall_eval(spark, SCALE_DIR, eval_sample_den=960).collect()
    sampled_eval: dict[str, object] = {}
    timings: dict[int, tuple[float, int]] = {}
    rows_by_den: dict[int, object] = {}
    # order-balanced min-of-two, like the ladder: the fixed
    # graph-side recompute inside each call swings by seconds in the
    # late-smoke JVM — a single forward pass once measured a NEGATIVE
    # marginal purely from that noise. Each den gets one early and
    # one late placement; the min is the low-noise estimate the
    # marginal is computed from.
    for ordered in ((960, 60), (60, 960)):
        for den in ordered:
            t0 = time.perf_counter()
            row = dq_knn_recall_eval(
                spark, SCALE_DIR, eval_sample_den=den
            ).collect()[0]
            sec = round(time.perf_counter() - t0, 2)
            if den not in timings or sec < timings[den][0]:
                timings[den] = (sec, row["n_vectors"])
                rows_by_den[den] = row
            release_all()
            spark.catalog.clearCache()
    for den in (960, 60):
        sec, n_vec = timings[den]
        sampled_eval[f"den{den}"] = {
            "sec": sec,
            "n_vectors": n_vec,
            "graph_recall": rows_by_den[den]["graph_recall"],
        }
    dq = timings[60][1] - timings[960][1]
    # clamp at 0: a negative diff means the exact-side delta is
    # below residual noise, i.e. indistinguishable from free
    per_q_ms = round(
        max(timings[60][0] - timings[960][0], 0.0) / dq * 1000, 2
    )
    sampled_eval["marginal_ms_per_sampled_query"] = per_q_ms
    sampled_eval["extrapolated_full_exact_side_sec"] = round(
        per_q_ms * 120000 / 1000, 1
    )
    # 50 ms/query over a 120 K corpus is ~10× the measured marginal
    # cost — a failure here means the exact side regressed to
    # corpus-bound work (e.g. the sample filter stopped reaching the
    # gram), not timer noise.
    sampled_ok = (
        per_q_ms <= 50.0
        and 0.0 <= (sampled_eval["den60"]["graph_recall"] or 0.0) <= 1.0
        and dedup_sampled_ok
    )
    report["sampled_n2_eval_120k"] = sampled_eval
    report["sampled_eval_ok"] = sampled_ok

    report["queries"] = table

    def _linear(t: dict) -> bool:
        if "ratio" not in t:
            return True
        bound = 2.0 * max(t["row_ratio"], t.get("out_ratio") or 0.0)
        return t["ratio"] <= bound

    # linear_scaling_ok is the LINEARITY-ONLY verdict (ADVICE r13: a
    # sampled-eval or selectivity regression must not masquerade as a
    # scaling failure when diagnosing a red run); all_gates_ok — and
    # the exit code — is the conjunction of every gate.
    linear_ok = all(_linear(t) for t in table.values())
    report["linear_scaling_ok"] = linear_ok
    ok = guard_ok and sel_ok and sampled_ok and linear_ok
    report["all_gates_ok"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
