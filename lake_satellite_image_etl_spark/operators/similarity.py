"""Similarity search over ``embeddings`` — SURVEY.md §2.4/§2.10 EXT:
brute-force cosine top-k (the exact baseline) and a sign-random-
projection LSH-bucketed variant (the 100 TB path).

The random hyperplanes are derived from md5 at module import
(deterministic, data-independent) and inlined as literals into BOTH
the Spark plan and the oracle SQL — so the bucket assignment is
bit-identical across engines and the probabilistic recall loss of LSH
does not affect the correctness gate.

Arithmetic: quantized integer vectors (see functions/vectors.py) —
integer projections and dot products are exact, so bucket signs and
cosine ordering can never diverge between engines.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import numpy as np

from lake_satellite_image_etl_spark.functions.vectors import (
    SQL_QVEC,
    dot_long,
    norm,
    qvec_of,
    sql_dot,
    sql_norm,
)
from lake_satellite_image_etl_spark.caching import (
    memo_per_path,
    persist_bounded,
)
from lake_satellite_image_etl_spark.functions.text import tok_hash60
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

TOP_K = 5
QUERY_STRIDE = 53  # vec_id % 53 == 0 → ~10 query vectors at sf0.01


def eval_sample_pred(id_col, den: int):
    """Deterministic hash-membership predicate for SAMPLED eval runs
    of the n²-exact-side harnesses (``dq_ann_recall_eval`` /
    ``dq_knn_recall_eval``): keeps ids whose md5 bucket ≡ 0 mod
    ``den`` — ~1/den of the population, stable across runs, engines,
    partitionings, and cluster sizes (the same determinism rule as
    ``sample_deterministic``; no randomness, so a sampled eval is
    reproducible and its recall row is comparable run-over-run).
    md5-bucketed on purpose: uncorrelated with the arithmetic
    residues the fixtures use for query strides / filter predicates
    (``vec_id % 53``, ``vec_id % 16``), so sampling never aliases
    the workload definition."""
    return tok_hash60(id_col.cast("string")) % int(den) == 0


def sql_eval_sample_pred(col: str, den: int) -> str:
    """DuckDB twin of ``eval_sample_pred``, COMPOSED from
    text.py::_sql_key_hash rather than restating it (r14 review:
    the engine-critical md5-bucket recipe must live in one place —
    two copies that drift would silently desynchronize Spark-vs-
    DuckDB sampling between the two families). A sampled eval run is
    therefore fully oracle-checkable: the predicate is deterministic
    and SQL-expressible, which is what lets the sampled siblings of
    the n²-exact-side harnesses carry a complete DuckDB oracle
    instead of a rows-only check (VERDICT r13 item 2)."""
    from lake_satellite_image_etl_spark.functions.text import (
        _sql_key_hash,
    )

    return f"{_sql_key_hash(col)} % {int(den)} = 0"


#: pinned denominator of the REGISTERED sampled-eval siblings
#: (dq_ann/knn_recall_eval_sampled): ~1/4 of ids keeps the sf0.01
#: fixture sample large enough to be a meaningful recall estimate
#: while exercising the distributed |sample| × n mapInPandas shape —
#: the plan that ships at 100 TB — under the driver's hash gate.
EVAL_SAMPLE_DEN_REGISTERED = 4

N_PLANES = 8

#: Hard cap on collected IVF codebook cells (the coarse quantizer is
#: a √n-row model artifact — 65536 cells × 64 ints ≈ 32 MB broadcast
#: covers n ≈ 4×10⁹ vectors at the √n sizing rule; trips loudly past
#: it, the same contract as EMBEDDING_BROADCAST_CAP).
IVF_CODEBOOK_CAP = 65536
DIM = 64

#: Hard cap on the collected query sample of a sampled n²-eval run
#: (dq_ann/knn_recall_eval eval_sample_den): the sample is a model
#: artifact broadcast into the candidate stream — 65536 × 64 ints
#: ≈ 32 MB; trips loudly past it, same contract as the codebook cap.
EVAL_SAMPLE_CAP = 65536

#: collect cap for dq_knn_recall_eval's FULL exact side (its corpus
#: matrix broadcast, VERDICT r15 item 3): the full all-pairs graph is
#: fixture-scale by contract — n² pair work makes it impractical long
#: before the collect does — so past this the harness refuses loudly
#: and names eval_sample_den, the sampled shape that ships at scale.
EVAL_FULL_EXACT_CAP = 131072


def _plane_weight(p: int, d: int) -> int:
    """Deterministic integer hyperplane component in [-1000, 1000]:
    md5-derived, public recipe, identical in any language/engine."""
    h = int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001) - 1000


#: N_PLANES × DIM integer hyperplane matrix, inlined on both sides.
PLANES: list[list[int]] = [
    [_plane_weight(p, d) for d in range(DIM)] for p in range(N_PLANES)
]

_SQL_PLANES = (
    "[" + ", ".join("[" + ", ".join(str(w) for w in row) + "]" for row in PLANES) + "]"
)


def _sql_bucket(n_planes: int = N_PLANES) -> str:
    """DuckDB twin of ``_bucket_expr``: sign-LSH bucket id over the
    first ``n_planes`` hyperplanes of the shared PLANES matrix,
    evaluated against a ``qv`` column in scope."""
    return f"""list_sum(list_transform(generate_series(1, {n_planes}),
    p -> CASE WHEN list_sum(list_transform(generate_series(1, {DIM}),
                  d -> qv[d] * ({_SQL_PLANES})[p][d])) >= 0
              THEN (1::BIGINT << (p - 1)) ELSE 0::BIGINT END))::BIGINT"""


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id, {SQL_QVEC} AS qv FROM embeddings),
    n AS (SELECT vec_id, qv, {sql_norm("qv")} AS nrm FROM q),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS candidate_id,
               {sql_dot("a.qv", "b.qv")}::DOUBLE / (a.nrm * b.nrm) AS cos_sim
        FROM n a JOIN n b ON b.vec_id != a.vec_id
        WHERE a.vec_id % {QUERY_STRIDE} = 0
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate scan, rank per query.

    Scale: the query side broadcasts (queries are always the small
    side of ANN search), so candidates stream through map-side —
    the only shuffle is the per-query top-k window, keyed by query_id
    with ≤ |candidates| rows per key; a 100 TB refinement is partial
    top-k per partition before the window (same result, bounded
    shuffle), which AQE approximates here. The true scale path is the
    LSH-bucketed variant below."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", qvec_of(F.col("embedding")).alias("qv"))
    n = q.select("vec_id", "qv", norm(F.col("qv")).alias("nrm"))
    queries = n.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nrm").alias("q_nrm"),
    )
    cands = n.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("qv").alias("c_qv"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = dot_long(F.col("q_qv"), F.col("c_qv")).cast("double") / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_exact"), F.asc("candidate_id")
    )
    return (
        cands.join(
            F.broadcast(queries), F.col("candidate_id") != F.col("query_id")
        )
        .select("query_id", "candidate_id", cos.alias("cos_sim_exact"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "candidate_id",
            F.round("cos_sim_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


N_PROBE = 5

#: the IVF codebook as SQL — seed per-label integer centroids, one
#: exact Lloyd refinement, final cell assignment. Shared verbatim by
#: the ``similarity_ivf_probe`` and ``dedup_semantic_cells`` oracles
#: so both mirror the SAME codebook the Spark side builds
#: (``ivf_assign``); ends with ``assigned`` (every vector × every
#: cell, ranked by cosine affinity) and ``lists`` (the crank-1 cell
#: membership).
def sql_ivf_cell_ctes(seed_bits: int = 0) -> str:
    """The IVF codebook CTE block, parameterized on the cell-count
    dial exactly like ``ivf_assign(seed_bits)``: when ``seed_bits >
    0`` the seed label is split ``2**seed_bits`` ways by the same
    sign-LSH bits the Spark side folds in (``_bucket_expr``), so the
    oracle mirrors the SCALE-geometry codebook, not just the 10-cell
    label one."""
    if seed_bits:
        q_cte = f"""q0 AS (SELECT vec_id, label, {SQL_QVEC} AS qv FROM embeddings),
    q AS (SELECT vec_id,
                 label || '#' || ({_sql_bucket(seed_bits)})::VARCHAR
                     AS label,
                 qv
          FROM q0)"""
    else:
        q_cte = f"q AS (SELECT vec_id, label, {SQL_QVEC} AS qv FROM embeddings)"
    return q_cte + f""",
    e AS (
        SELECT vec_id, label, unnest(qv) AS qc,
               unnest(generate_series(1, len(qv))) AS pos
        FROM q
    ),
    comp AS (SELECT label, pos, sum(qc)::BIGINT AS sq FROM e GROUP BY 1, 2),
    cent AS (SELECT label AS c_label, array_agg(sq ORDER BY pos) AS cq
             FROM comp GROUP BY label),
    n AS (SELECT vec_id, qv, {sql_norm("qv")} AS nrm FROM q),
    aff0 AS (
        SELECT n.vec_id, n.qv, n.nrm, cent.c_label,
               {sql_dot("n.qv", "cent.cq")}::DOUBLE
                   / (n.nrm * {sql_norm("cent.cq")}) AS c_cos
        FROM n CROSS JOIN cent
    ),
    asg0 AS (
        SELECT vec_id, qv, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY c_cos DESC, c_label) AS crank
        FROM aff0
    ),
    cells AS (SELECT vec_id, qv, c_label FROM asg0 WHERE crank = 1),
    e1 AS (
        SELECT c_label, unnest(qv) AS qc,
               unnest(generate_series(1, len(qv))) AS pos
        FROM cells
    ),
    comp1 AS (SELECT c_label, pos, sum(qc)::BIGINT AS sq FROM e1 GROUP BY 1, 2),
    cent1 AS (SELECT c_label, array_agg(sq ORDER BY pos) AS cq
              FROM comp1 GROUP BY c_label),
    affinity AS (
        SELECT n.vec_id, n.qv, n.nrm, cent1.c_label,
               {sql_dot("n.qv", "cent1.cq")}::DOUBLE
                   / (n.nrm * {sql_norm("cent1.cq")}) AS c_cos
        FROM n CROSS JOIN cent1
    ),
    assigned AS (
        SELECT vec_id, qv, nrm, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY c_cos DESC, c_label) AS crank
        FROM affinity
    ),
    lists AS (SELECT vec_id, qv, nrm, c_label FROM assigned WHERE crank = 1)"""


SQL_IVF_CELL_CTES = sql_ivf_cell_ctes(0)


@query(
    "similarity_ivf_probe",
    oracle=f"""
    WITH {SQL_IVF_CELL_CTES},
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               {sql_dot("qn.qv", "l.qv")}::DOUBLE / (qn.nrm * l.nrm) AS cos_sim
        FROM probes p
        JOIN lists l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k, IVF shape — the registered (label-seeded,
    {N_PROBE}-probe) instantiation of ``ivf_topk`` (the oracle
    mirrors that codebook exactly). Recall measured at {N_PROBE}
    probes on the refined codebook is pinned ≥ 0.8 in
    tests/test_ann_recall.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, memo_path=_emb_path(sf_dir))


#: scale-geometry IVF dials (VERDICT r7 item 2): 2^5 sign-LSH
#: subcells per label → 320 cells (√n-ish for the smoke's 120 K
#: corpus; the fixture holds 500 vectors, so the DEMONSTRATED probe
#: fraction is n_probe/cells = 10% — vs ~50% for the 10-cell entry
#: above). At production scale the probe COUNT stays put while the
#: cell count tracks √n, so the fraction keeps shrinking.
IVF_SCALED_SEED_BITS = 5
IVF_SCALED_N_PROBE = 32


def derive_seed_bits(n: int, n_labels: int) -> int:
    """Cell-count dial DERIVED from corpus size (VERDICT r9 item 2):
    cells should track √n for the classic n·√n inverted-list cost, so
    with ``n_labels`` seed labels each splitting ``2^bits`` ways,
    ``bits = ⌈log₂(√n / labels)⌉`` (clamped to [0, N_PLANES] — the
    sign-plane matrix caps the split at 2^{N_PLANES} subcells per
    label). A pinned bit count means n²/cells pair work grows
    quadratically at 100× the fixture; deriving keeps it ~n^1.5."""
    import math

    if n <= 0 or n_labels <= 0:
        return 0
    return max(
        0,
        min(
            N_PLANES,
            math.ceil(math.log2(max(1.0, math.sqrt(n) / n_labels))),
        ),
    )


#: derive_seed_bits at the sf0.01 oracle fixture (500 vectors, 10
#: labels → ⌈log₂(22.4/10)⌉ = 2 → 40 cells): the similarity_ivf_autocells
#: and similarity_knn_graph oracles bake this value into their SQL
#: codebook CTEs, and
#: tests/test_ann_recall.py::test_autocells_oracle_geometry_in_sync
#: fails loudly if the fixture ever drifts from it.
IVF_AUTO_BITS_SF001 = 2

_AUTO_BITS_MEMO_ATTR = "_lse_auto_bits_memo"


def auto_seed_bits(spark: SparkSession, sf_dir: str) -> int:
    """The derived-geometry dial for the registered autocell entries,
    MEMOIZED per (session, embeddings-path stat) exactly like the
    io.py schema memo (ADVICE r10): the √n derivation is one count
    job that belongs to INDEX BUILD, not to every DataFrame
    construction — plan-only tooling (explain audits, bench warm
    passes) re-constructs entries many times per session and must not
    pay a Spark job each time. The stat key (mtime_ns, size) means an
    overwritten fixture path re-derives instead of silently reusing a
    stale geometry; keeping ONE live entry per path (replace, don't
    accumulate stat keys — ADVICE r11) bounds the memo in long-lived
    sessions that rewrite tmp fixture dirs."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(path)
        stat_key = (st.st_mtime_ns, st.st_size)
    except OSError:
        stat_key = None
    memo = getattr(spark, _AUTO_BITS_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _AUTO_BITS_MEMO_ATTR, memo)
    hit = memo.get(path)
    if hit is None or hit[0] != stat_key:
        q = (
            read_table(spark, sf_dir, "embeddings")
            .select("label", qvec_of(F.col("embedding")).alias("qv"))
            .filter(F.col("qv").isNotNull())
        )
        row = q.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("label").alias("l"),
        ).collect()[0]
        memo[path] = (stat_key, derive_seed_bits(row["n"], row["l"]))
    return memo[path][1]


@query(
    "similarity_ivf_scaled",
    oracle=f"""
    WITH {sql_ivf_cell_ctes(IVF_SCALED_SEED_BITS)},
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {IVF_SCALED_N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               {sql_dot("qn.qv", "l.qv")}::DOUBLE / (qn.nrm * l.nrm) AS cos_sim
        FROM probes p
        JOIN lists l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k at SCALE geometry — the same ``ivf_topk`` kernel as
    ``similarity_ivf_probe`` but with the cell-count dial engaged:
    ``seed_bits={IVF_SCALED_SEED_BITS}`` splits each label into
    sign-LSH subcells (320 cells total) before the Lloyd refinement,
    and {IVF_SCALED_N_PROBE} probes scan ~10% of the corpus per query
    instead of the label-codebook entry's ~50%. The oracle rebuilds
    the IDENTICAL seeded+refined codebook in SQL
    (``sql_ivf_cell_ctes(seed_bits)``), so cell assignment, probe
    sets, and ranking are compared end-to-end. Recall@5 vs the exact
    brute force is pinned ≥ 0.8 in tests/test_ann_recall.py — equal
    to the 10-cell entry's measured recall at a fifth of its scan
    fraction."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        seed_bits=IVF_SCALED_SEED_BITS,
        n_probe=IVF_SCALED_N_PROBE,
        memo_path=_emb_path(sf_dir),
    )


@query(
    "similarity_ivf_autocells",
    oracle=f"""
    -- IVF with DERIVED cell geometry: cells ≈ √n from the corpus
    -- size itself (⌈log₂(√n/labels)⌉ = {IVF_AUTO_BITS_SF001} seed
    -- bits at the 500-vector oracle fixture), instead of a pinned
    -- bit count. The codebook CTEs bake the derived value; a sync
    -- test pins it against derive_seed_bits on the live fixture.
    WITH {sql_ivf_cell_ctes(IVF_AUTO_BITS_SF001)},
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {IVF_SCALED_N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               {sql_dot("qn.qv", "l.qv")}::DOUBLE / (qn.nrm * l.nrm) AS cos_sim
        FROM probes p
        JOIN lists l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_ivf_autocells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k with cell geometry DERIVED from corpus size
    (VERDICT r9 item 2): ``seed_bits=None`` makes ``ivf_assign``
    count the corpus once and size cells ≈ √n via
    ``derive_seed_bits`` — at the oracle fixture that lands on
    {2 ** IVF_AUTO_BITS_SF001} subcells per label (40 cells); at the
    60× smoke it derives 6 bits (640 cells) with NO code change, so
    probe-fraction per query keeps shrinking as the corpus grows and
    pair work stays ~n^1.5 instead of n²/constant. The oracle
    rebuilds the seeded+refined codebook at the fixture's DERIVED
    geometry ({IVF_AUTO_BITS_SF001} bits, pinned by the sync-guard
    test), so assignment, probe sets, and ranking are compared
    end-to-end; recall is floored alongside the other IVF entries in
    tests/test_ann_recall.py. The derivation count is memoized per
    (session, fixture stat) via ``auto_seed_bits`` — construction of
    this DataFrame after the first touch pays no derivation job
    (ADVICE r10; the Lloyd codebook collects remain, as for every
    IVF entry — that is the training step)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        seed_bits=auto_seed_bits(spark, sf_dir),
        n_probe=IVF_SCALED_N_PROBE,
        memo_path=_emb_path(sf_dir),
    )


#: the demonstration metadata predicate for filtered ANN: even label
#: (≈50% selectivity at the fixture — enough to change every top-k
#: list without starving any query's probe set).
ANN_FILTER_PRED = "label % 2 = 0"


@query(
    "similarity_ann_filtered",
    oracle=f"""
    -- FILTERED vector search (pre-filter strategy): top-{TOP_K} among
    -- candidates satisfying a metadata predicate ({ANN_FILTER_PRED}),
    -- probing the same label-seeded IVF codebook as
    -- similarity_ivf_probe. The predicate applies to the inverted
    -- LIST scan — before any distance work — so results always
    -- satisfy it and cost shrinks with selectivity.
    WITH {{IVF_CTES}},
    flt AS (
        SELECT l.vec_id, l.qv, l.nrm, l.c_label
        FROM lists l JOIN q e ON e.vec_id = l.vec_id
        WHERE e.{ANN_FILTER_PRED}
    ),
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               {sql_dot("qn.qv", "l.qv")}::DOUBLE / (qn.nrm * l.nrm) AS cos_sim
        FROM probes p
        JOIN flt l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """.replace("{IVF_CTES}", SQL_IVF_CELL_CTES),
)
def similarity_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN — similarity search under a metadata predicate
    (the production-common case: 'nearest neighbors among docs in
    this language / after this date / in this license class'). The
    PRE-FILTER strategy: ``ivf_topk(candidate_ids=...)`` semi-joins
    the predicate against the inverted-list scan before any distance
    arithmetic, so (a) every returned row satisfies the predicate,
    (b) per-query cost is predicate-selectivity × probe cost, and
    (c) one index serves every predicate (no per-filter rebuild).
    Post-filtering (score, then discard) would return < k rows at low
    selectivity and waste the discarded distance work — the known
    filtered-search trap this entry exists to demonstrate around.

    The oracle rebuilds codebook, predicate semi-join, probe sets and
    ranking end-to-end; recall vs the exact FILTERED brute force is
    pinned in tests/test_ann_recall.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.expr(ANN_FILTER_PRED)).select("vec_id")
    return ivf_topk(
        emb, candidate_ids=allowed, memo_path=_emb_path(sf_dir)
    )


#: LOW-selectivity predicate (~6% at the fixture: 31 of 500 pass):
#: the regime where pre-filter actually beats post-filter — a
#: post-filter would discard ~94% of its distance work and return
#: fewer than k rows for most queries, while the pre-filter's pair
#: work SHRINKS ∝ selectivity (proven at the 240× smoke tier in
#: tools/scale_smoke.py). On larger corpora a query CAN be its own
#: candidate (ids ≡ 7 mod 16 that are also stride multiples exist —
#: the smallest is 583 = 53·11, just past this fixture's 500
#: vectors); self-overlap is handled by the explicit
#: vec_id != query_id exclusion in BOTH the kernel and the oracle,
#: not by any parity property of the predicate (ADVICE r12).
ANN_FILTER_PRED_SPARSE = "vec_id % 16 = 7"


@query(
    "similarity_ann_filtered_sparse",
    oracle=f"""
    -- FILTERED vector search at LOW (~6%) selectivity: same
    -- pre-filter strategy as similarity_ann_filtered, the regime
    -- where it matters — the predicate semi-join empties ~94% of
    -- every probed inverted list BEFORE distance work, so per-query
    -- cost falls with selectivity instead of being paid and thrown
    -- away post-hoc.
    WITH {{IVF_CTES}},
    flt AS (
        SELECT l.vec_id, l.qv, l.nrm, l.c_label
        FROM lists l JOIN q e ON e.vec_id = l.vec_id
        WHERE e.{ANN_FILTER_PRED_SPARSE}
    ),
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               {sql_dot("qn.qv", "l.qv")}::DOUBLE / (qn.nrm * l.nrm) AS cos_sim
        FROM probes p
        JOIN flt l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """.replace("{IVF_CTES}", SQL_IVF_CELL_CTES),
)
def similarity_ann_filtered_sparse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered ANN at ~6% predicate selectivity (VERDICT r11 item 6)
    — the sibling of ``similarity_ann_filtered`` (~50%) that
    demonstrates the regime pre-filtering exists for. With sparse
    probe lists a query may legitimately return FEWER than
    {TOP_K} rows (only the allowed candidates its probed cells hold);
    a post-filter implementation would instead silently rank
    non-qualifying vectors first and discard them — the recall test
    pins both the predicate contract and recall vs the exact
    filtered brute force at this selectivity."""
    emb = read_table(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.expr(ANN_FILTER_PRED_SPARSE)).select("vec_id")
    return ivf_topk(
        emb, candidate_ids=allowed, memo_path=_emb_path(sf_dir)
    )


def _sql_ann_recall_oracle(sample_den: int | None = None) -> str:
    """The ANN-recall-eval oracle, parameterized on the sampled-eval
    denominator so the full entry and its ``_sampled`` sibling share
    one SQL body (same pattern as ``_sql_knn_recall_oracle``). The
    predicate filters the QUERY side of both kernels — a pre-rank
    partition-key filter, equivalent to the Spark path's post-filter
    on the kernel outputs."""
    samp = (
        ""
        if sample_den is None
        else f" AND {sql_eval_sample_pred('a.vec_id', sample_den)}"
    )
    samp_p = (
        ""
        if sample_den is None
        else f"\n              AND {sql_eval_sample_pred('vec_id', sample_den)}"
    )
    return f"""
    -- ANN INDEX EVALUATION: recall@{TOP_K} of the registered IVF
    -- index (label codebook, {N_PROBE} probes) vs the exact cosine
    -- brute force, measured on the corpus itself — the number the
    -- n_probe dial is tuned against.
    WITH {{IVF_CTES}},
    expairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS candidate_id,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {sql_dot("a.qv", "b.qv")}::DOUBLE
                            / (a.nrm * b.nrm) DESC,
                       b.vec_id) AS rank
        FROM n a JOIN n b ON b.vec_id != a.vec_id
        WHERE a.vec_id % {QUERY_STRIDE} = 0{samp}
    ),
    ex AS (SELECT query_id, candidate_id FROM expairs
           WHERE rank <= {TOP_K}),
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {N_PROBE} AND vec_id % {QUERY_STRIDE} = 0{samp_p}
    ),
    ivfp AS (
        SELECT p.query_id, l.vec_id AS candidate_id,
               row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {sql_dot("qn.qv", "l.qv")}::DOUBLE
                            / (qn.nrm * l.nrm) DESC,
                       l.vec_id) AS rank
        FROM probes p
        JOIN lists l ON l.c_label = p.c_label AND l.vec_id != p.query_id
        JOIN n qn ON qn.vec_id = p.query_id
    ),
    ann AS (SELECT query_id, candidate_id FROM ivfp
            WHERE rank <= {TOP_K}),
    m AS (
        SELECT (SELECT count(DISTINCT query_id) FROM ex)::BIGINT
                   AS n_queries,
               (SELECT count(*) FROM ex)::BIGINT AS exact_pairs,
               (SELECT count(*) FROM ann)::BIGINT AS ann_pairs,
               (SELECT count(*) FROM ex
                JOIN ann USING (query_id, candidate_id))::BIGINT AS hits
    )
    SELECT n_queries, exact_pairs, ann_pairs, hits,
           round(hits::DOUBLE / NULLIF(exact_pairs, 0), 6) AS recall_at_k
    FROM m
    """.replace("{IVF_CTES}", SQL_IVF_CELL_CTES)


@query("dq_ann_recall_eval", oracle=_sql_ann_recall_oracle())
def dq_ann_recall_eval(
    spark: SparkSession, sf_dir: str, eval_sample_den: int | None = None
) -> DataFrame:
    """ANN-index EVALUATION harness ("measure, don't guess" — the
    vector-search sibling of ``dq_dedup_recall_eval``): how much of
    the exact top-{TOP_K} neighbor set does the registered IVF index
    actually return? Emits one row — query count, exact/ANN pair
    counts, hits, recall@{TOP_K} — so the recall number the pytest
    floors pin becomes a DRIVER-HASH-VERIFIED, per-corpus measurable
    the n_probe / cell-count dials are tuned against. Composes the
    two registered kernels unchanged (``similarity_topk_bruteforce``
    as ground truth, ``similarity_ivf_probe`` as the candidate) and
    reduces via one union + pair-group + aggregate — no
    scalar-subquery cross joins in the Spark plan. Counts coalesce
    to 0 and recall NULLs on a degenerate corpus (no queries), the
    same guard class as the dedup eval (ADVICE r11).

    Scale (VERDICT r12 item 3 — now a code path, not a docstring):
    ground truth is |queries| × n — at 100 TB pass
    ``eval_sample_den`` and the harness measures recall on the
    ~1/den deterministic md5-sampled SUBSET of the query set
    (``eval_sample_pred``). The predicate lands on ``query_id``,
    which Catalyst pushes through the top-k window (it is the
    partition key) and through the join into the BROADCAST query
    side of both kernels — so exact-side pair work shrinks ∝ the
    sample, it is not a post-filter on n² output. Sampled recall is
    an unbiased estimate of the full number (per-query recalls are
    averaged over a hash-uniform subset); the fixture test pins
    |sampled − full| ≤ ε. Default None = full query set, so the
    registered oracle row is unchanged."""
    exact = similarity_topk_bruteforce(spark, sf_dir).select(
        "query_id", "candidate_id"
    )
    ann = similarity_ivf_probe(spark, sf_dir).select(
        "query_id", "candidate_id"
    )
    if eval_sample_den is not None:
        pred_e = eval_sample_pred(F.col("query_id"), eval_sample_den)
        exact = exact.filter(pred_e)
        ann = ann.filter(pred_e)
    tagged = exact.select(
        "query_id",
        "candidate_id",
        F.lit(1).alias("in_exact"),
        F.lit(0).alias("in_ann"),
    ).unionByName(
        ann.select(
            "query_id",
            "candidate_id",
            F.lit(0).alias("in_exact"),
            F.lit(1).alias("in_ann"),
        )
    )
    pairs = tagged.groupBy("query_id", "candidate_id").agg(
        F.max("in_exact").alias("e"), F.max("in_ann").alias("a")
    )
    counts = pairs.agg(
        F.count_distinct(
            F.when(F.col("e") == 1, F.col("query_id"))
        ).alias("n_queries"),
        F.coalesce(F.sum("e"), F.lit(0)).alias("exact_pairs"),
        F.coalesce(F.sum("a"), F.lit(0)).alias("ann_pairs"),
        F.coalesce(F.sum(F.col("e") * F.col("a")), F.lit(0)).alias("hits"),
    )
    return counts.select(
        "n_queries",
        "exact_pairs",
        "ann_pairs",
        "hits",
        F.round(
            F.col("hits").cast("double")
            / F.when(F.col("exact_pairs") > 0, F.col("exact_pairs")),
            6,
        ).alias("recall_at_k"),
    )


@query(
    "dq_ann_recall_eval_sampled",
    oracle=_sql_ann_recall_oracle(EVAL_SAMPLE_DEN_REGISTERED),
)
def dq_ann_recall_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED ANN-recall eval as a driver-checked entry
    (VERDICT r13 item 2): the query-side ``eval_sample_pred``
    restriction is the plan that ships at 100 TB — exact-side pair
    work shrinks ∝ the sample because Catalyst pushes the predicate
    through the top-k window (partition key) into the broadcast
    query side of both composed kernels — so the rotation
    hash-verifies that plan every cycle, not only a pytest path.
    Denominator pinned at {EVAL_SAMPLE_DEN_REGISTERED}; the
    md5-bucket predicate is SQL-expressible, so the sibling carries
    the same FULL DuckDB oracle, predicate-filtered on both sides.
    The full-query-set form stays registered as the cross-check."""
    return dq_ann_recall_eval(
        spark, sf_dir, eval_sample_den=EVAL_SAMPLE_DEN_REGISTERED
    )


@query(
    "dq_ivf_balance_eval",
    oracle=f"""
    -- IVF INDEX BALANCE: per-cell population skew of the derived
    -- √n-cell codebook. Balance is the quantity that decides whether
    -- the inverted-list shuffle is uniform at scale — a hot cell is
    -- a hot shuffle partition AND a recall hole (its probes drown in
    -- candidates); this row is the measured justification for every
    -- "bounded, near-uniform after the Lloyd refinement" claim the
    -- IVF docstrings make.
    WITH {{IVF_CTES}},
    sz AS (
        SELECT c_label, count(*)::BIGINT AS m
        FROM lists GROUP BY c_label
    )
    SELECT count(*)::BIGINT AS n_cells,
           sum(m)::BIGINT AS n_vectors,
           min(m)::BIGINT AS min_cell,
           max(m)::BIGINT AS max_cell,
           round(avg(m), 6) AS mean_cell,
           round(max(m) / avg(m), 6) AS balance_factor
    FROM sz
    """.replace(
        "{IVF_CTES}", sql_ivf_cell_ctes(IVF_AUTO_BITS_SF001)
    ),
)
def dq_ivf_balance_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-index BALANCE evaluation ("measure, don't guess", third of
    the eval-harness family after ``dq_dedup_recall_eval`` and
    ``dq_ann_recall_eval``): one row of cell-population statistics —
    cell count, corpus size, min/max/mean cell, and the BALANCE
    FACTOR max/mean — for the same derived √n codebook the
    registered autocell entries build (``auto_seed_bits`` +
    ``ivf_assign``, construction jobless after first touch via the
    codebook memo). At 1000 executors the balance factor IS the
    shuffle-skew multiplier of every inverted-list operation, and a
    factor drifting upward on a new corpus is the signal to re-seed
    or add Lloyd rounds — measured 1.44 at the fixture's 40 cells
    and 1.69 at the 120 K-vector / 512-cell smoke tier (balance
    HOLDS as cells track √n). The hot-cell kernel guards (blocked
    gram, salting) bound the damage; this row measures whether they
    are needed."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(
        emb,
        auto_seed_bits(spark, sf_dir),
        keep_ranks=1,
        memo_path=_emb_path(sf_dir),
    )
    sz = (
        assigned.filter(F.col("crank") == 1)
        .groupBy("c_label")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return sz.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("m").alias("n_vectors"),
        F.min("m").alias("min_cell"),
        F.max("m").alias("max_cell"),
        F.round(F.avg("m"), 6).alias("mean_cell"),
        F.round(F.max("m") / F.avg("m"), 6).alias("balance_factor"),
    )


#: the "new tranche" stride for the incremental-assignment entry:
#: vec_id % 5 == 4 plays the nightly ingest batch; the rest is the
#: already-indexed corpus the codebook was trained on.
INCR_TRANCHE_MOD = 5


@query(
    "similarity_incremental_assign",
    oracle=f"""
    -- incremental index maintenance: the codebook (seed + one Lloyd
    -- round) is trained on the EXISTING corpus only (vec_id %
    -- {INCR_TRANCHE_MOD} != {INCR_TRANCHE_MOD - 1}); the NEW tranche
    -- then ranks against that frozen codebook — assignment without
    -- retraining, exactly what a nightly embedding ingest does.
    WITH {{CTES}},
    qn AS (SELECT vec_id, {SQL_QVEC} AS qv FROM embeddings
           WHERE vec_id % {INCR_TRANCHE_MOD} = {INCR_TRANCHE_MOD - 1}),
    nn AS (SELECT vec_id, qv, {sql_norm("qv")} AS nrm FROM qn),
    aff AS (
        SELECT nn.vec_id, cent1.c_label,
               {sql_dot("nn.qv", "cent1.cq")}::DOUBLE
                   / (nn.nrm * {sql_norm("cent1.cq")}) AS c_cos
        FROM nn CROSS JOIN cent1
    ),
    rk AS (
        SELECT vec_id, c_label, c_cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY c_cos DESC, c_label) AS r
        FROM aff
    )
    SELECT vec_id, c_label AS cell, round(c_cos, 6) AS cell_cos
    FROM rk WHERE r = 1
    """.replace(
        "{CTES}",
        sql_ivf_cell_ctes(0).replace(
            "FROM embeddings",
            "FROM embeddings "
            f"WHERE vec_id % {INCR_TRANCHE_MOD} != {INCR_TRANCHE_MOD - 1}",
            1,
        ),
    ),
)
def similarity_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance — assign a NEW vector
    tranche to the EXISTING trained codebook without retraining (the
    nightly-ingest path every production vector index needs: rebuild
    is an offline, occasional event; ingest is continuous). The
    ``train=`` split in ``ivf_assign`` freezes the codebook on the
    already-indexed corpus; the new tranche only pays the
    broadcast-codebook matmul — one map-side pass, no shuffle of the
    existing corpus, no Lloyd re-run.

    The oracle trains the identical codebook on the old tranche in
    SQL and cross-ranks the new tranche against its refined
    centroids, so the frozen-codebook contract (new data must never
    move a centroid) is hash-verified: any leakage of new vectors
    into training shifts a centroid and flips the driver row."""
    emb = read_table(spark, sf_dir, "embeddings")
    is_new = F.col("vec_id") % INCR_TRANCHE_MOD == INCR_TRANCHE_MOD - 1
    a = ivf_assign(
        emb.filter(is_new), 0, keep_ranks=1, train=emb.filter(~is_new)
    )
    return a.filter(F.col("crank") == 1).select(
        "vec_id",
        F.col("c_label").alias("cell"),
        F.round("c_cos", 6).alias("cell_cos"),
    )


def _emb_path(sf_dir: str) -> str:
    """Codebook-memo key path for the registered entries (the
    embeddings fixture the codebook trains on)."""
    import os

    return os.path.join(sf_dir, "embeddings.parquet")


#: session-attr memo for TRAINED codebook artifacts, keyed
#: (fixture path, seed_bits) → ((mtime_ns, size), arrays); one live
#: entry per key, stale stat replaced (the auto_seed_bits pattern)
_CODEBOOK_MEMO_ATTR = "_lse_codebook_memo"


def ivf_assign(
    emb: DataFrame,
    seed_bits: int | None = 0,
    keep_ranks: int | None = None,
    train: DataFrame | None = None,
    memo_path: str | None = None,
) -> DataFrame:
    """Build the IVF codebook and rank every vector against every
    cell: coarse quantizer seeded by per-label integer centroids —
    split ``2**seed_bits`` ways per label by deterministic sign-LSH
    bits when ``seed_bits > 0`` (the CELL-COUNT dial: size
    ``labels × 2^seed_bits ≈ √n`` for your n, exactly like the
    ``band_bits`` knobs on the dedup paths; the registered entries
    pin 0 because their DuckDB oracles mirror the 10-cell label
    codebook) — then refined by one exact Lloyd iteration (assign
    every vector to its nearest seed centroid, recompute centroids
    from the assignment): the k-means training step itself, expressed
    relationally, so cells are geometry-driven. Exact integer sums
    keep the assignment engine-independent.

    ``keep_ranks`` caps how many cell ranks each vector emits (None =
    all cells): consumers only ever read ``crank <= n_probe``, and at
    √n cells emitting the full ranking would materialize n·√n rows —
    the cap keeps the assignment output at n·n_probe. The Lloyd
    refinement round internally uses keep 1 (it only needs each
    vector's nearest seed).

    Returns ``(vec_id, qv, nrm, c_label, c_cos, crank)`` — crank 1 is
    the vector's cell (the ``lists`` CTE of ``SQL_IVF_CELL_CTES``);
    crank ≤ n_probe is its probe set. Shared by ``ivf_topk`` (ANN)
    and ``dedup_semantic_cells`` (SemDeDup).

    Scale: assignment is n × cells broadcast-map work (the codebook
    broadcasts — it is √n rows of DIM ints); with √n cells the
    downstream inverted-list ops are the classic n·√n cost instead of
    n²; more Lloyd rounds would chain the same two DataFrame blocks.

    ``memo_path`` (VERDICT r11 item 4): when set (the fixture's
    embeddings path) and ``train`` is None, the TRAINED codebook
    arrays memoize per (session, path stat, seed_bits) exactly like
    ``auto_seed_bits`` — training is a first-touch index-build event,
    so repeated DataFrame construction (plan audits, bench warm
    passes, the driver's schema probe) after the first touch runs
    ZERO Spark jobs. The stat key re-trains on an overwritten path;
    one live entry per (path, seed_bits)."""
    q = emb.select(
        "vec_id", "label", qvec_of(F.col("embedding")).alias("qv")
    ).filter(F.col("qv").isNotNull())
    if seed_bits is None:
        # derive cells ≈ √n from one cheap count — the index-build
        # step of a real deployment. NOTE this runs the count at
        # DataFrame-construction time; the REGISTERED entries
        # (similarity_ivf_autocells, similarity_knn_graph) instead
        # pass auto_seed_bits(spark, sf_dir) — the same derivation
        # memoized per (session, fixture stat) so repeated
        # construction is jobless (ADVICE r10)
        stats = q.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("label").alias("l"),
        ).collect()[0]
        seed_bits = derive_seed_bits(stats["n"], stats["l"])
    if seed_bits:
        if seed_bits > N_PLANES:
            raise ValueError(
                f"seed_bits {seed_bits} exceeds the {N_PLANES}-plane "
                "matrix; extend PLANES to split finer"
            )
        # label-local geometric split: seed cell = label # first
        # seed_bits sign-plane bits (coherent subcells, unlike a
        # random mod split, so the Lloyd step starts near k-means++
        # quality)
        q = q.withColumn(
            "label",
            F.concat_ws(
                "#", F.col("label"), _bucket_expr(F.col("qv"), seed_bits)
            ),
        )
    # ``train`` decouples codebook TRAINING from assignment (the
    # incremental-ingest path: nightly vector tranches assign to the
    # existing index without retraining — similarity_incremental_
    # assign). Default: train on the assignment corpus itself.
    if train is None:
        tq = q
    else:
        tq = train.select(
            "vec_id", "label", qvec_of(F.col("embedding")).alias("qv")
        ).filter(F.col("qv").isNotNull())
        if seed_bits:
            tq = tq.withColumn(
                "label",
                F.concat_ws(
                    "#", F.col("label"), _bucket_expr(F.col("qv"), seed_bits)
                ),
            )

    def centroids(rows: DataFrame, key: str) -> DataFrame:
        """Exact integer centroid (component-wise sum) per cell."""
        e = rows.select(key, F.posexplode("qv").alias("pos", "qc"))
        return (
            e.groupBy(key, "pos")
            .agg(F.sum("qc").alias("sq"))
            .groupBy(key)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sq"))),
                    lambda s: s["sq"],
                ).alias("cq")
            )
            .select(F.col(key).alias("c_label"), "cq")
        )

    n = q.select("vec_id", "qv", norm(F.col("qv")).alias("nrm"))
    tn = n if train is None else tq.select(
        "vec_id", "qv", norm(F.col("qv")).alias("nrm")
    )
    spark = emb.sparkSession

    def materialize(cent: DataFrame):
        """Collect one codebook into broadcast-ready arrays.

        The FAISS coarse-quantizer shape: the trained codebook is a
        MODEL ARTIFACT of √n rows, so it is materialized once
        (structurally capped at IVF_CODEBOOK_CAP cells ≈ 32 MB —
        √n cells covers n ≈ 4×10⁹ vectors before the cap trips,
        and past it the guard names the dial) and broadcast; every
        vector batch then ranks against it as ONE int64 numpy
        matmul inside mapInPandas. Relational spellings of the
        n × cells affinity were measured 17.6 s (HOF fold per
        pair), 12.1 s (Arrow pair dot — ships the codebook row per
        pair), 6.8 s (unrolled 64-term codegen) on the 320-cell
        sf0.1 geometry; the matmul form is ~1 s and transfers each
        vector ONCE. Exactness is preserved end to end: integer
        dots are exact in int64 (the equivalence rule pinned by
        tests/test_properties.py::test_pdot_matches_hof_dot), the
        norms stay JVM-computed (collected with the codebook /
        carried on n), the divide is one IEEE op in either engine,
        and the (-cos, label) tie order is a stable argsort over
        label-presorted columns."""
        cn = cent.withColumn("c_nrm", norm(F.col("cq")))
        # cell labels keep the source label's type (bigint for the
        # plain per-label codebook, string for the seed_bits split);
        # the kernel's pre-sort and output schema must follow it so
        # tie order and join keys match the relational spelling.
        label_type = cent.schema["c_label"].dataType.simpleString()
        cb = sorted(cn.collect(), key=lambda r: r["c_label"])
        if len(cb) > IVF_CODEBOOK_CAP:
            raise ValueError(
                f"ivf_assign: {len(cb)} cells exceed the codebook "
                f"broadcast cap ({IVF_CODEBOOK_CAP}); lower seed_bits "
                "— cells should scale as √n, not n"
            )
        labels = np.array([r["c_label"] for r in cb])
        cmat = np.array([r["cq"] for r in cb], dtype=np.int64)
        cnrm = np.array([r["c_nrm"] for r in cb], dtype=np.float64)
        return labels, cmat, cnrm, label_type

    def assign(art, rows: DataFrame, keep: int | None = None) -> DataFrame:
        labels, cmat, cnrm, label_type = art
        bc = spark.sparkContext.broadcast((labels, cmat, cnrm))

        def rank_batches(batches):
            import numpy as _np
            import pandas as _pd

            lab, cm, cnr = bc.value
            k = len(lab)
            for pdf in batches:
                b = len(pdf)
                if not b:
                    continue
                x = _np.stack(pdf["qv"].values).astype(_np.int64, copy=False)
                nrm = pdf["nrm"].to_numpy(dtype=_np.float64)
                cos = (x @ cm.T).astype(_np.float64) / (
                    nrm[:, None] * cnr[None, :]
                )
                # columns are pre-sorted by label, so a STABLE argsort
                # on -cos reproduces orderBy(desc(c_cos), asc(c_label))
                kk = k if keep is None else min(keep, k)
                order = _np.argsort(-cos, axis=1, kind="stable")[:, :kk]
                rows = _np.repeat(_np.arange(b), kk)
                cols = order.ravel()
                # qv/nrm ride ALONG in the kernel output (r16, guide
                # §2.4): the batch already holds them, so re-attaching
                # them with a post-kernel equi-join on vec_id — which
                # every consumer of the assignment then paid as a full
                # shuffle of the vector table per action — is a free
                # column copy here instead. keep ≤ n_probe bounds the
                # duplication at n_probe vectors per input vector, and
                # no exchange replaces a removed one.
                yield _pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy()[rows],
                        "qv": pdf["qv"].values[rows],
                        "nrm": nrm[rows],
                        "c_label": lab[cols],
                        "c_cos": cos[rows, cols],
                        "crank": _np.tile(
                            _np.arange(1, kk + 1, dtype=_np.int32), b
                        ),
                    }
                )

        return rows.mapInPandas(
            rank_batches,
            schema=(
                f"vec_id long, qv array<long>, nrm double, "
                f"c_label {label_type}, c_cos double, crank int"
            ),
        )

    # trained-codebook memo (VERDICT r11 item 4): frozen-geometry
    # registered entries pass memo_path so repeated construction
    # after first touch reuses the collected arrays — zero jobs
    memo = None
    stat_key = None
    art = None
    if memo_path is not None and train is None:
        import os as _os

        memo = getattr(spark, _CODEBOOK_MEMO_ATTR, None)
        if memo is None:
            memo = {}
            setattr(spark, _CODEBOOK_MEMO_ATTR, memo)
        try:
            st = _os.stat(memo_path)
            stat_key = (st.st_mtime_ns, st.st_size)
        except OSError:
            stat_key = None
        hit = memo.get((memo_path, seed_bits))
        if hit is not None and hit[0] == stat_key:
            art = hit[1]
    if art is None:
        # seed codebook: per-label integer sums; one Lloyd refinement:
        # nearest-seed assignment → recompute centroids per cell
        cent0 = centroids(tq, "label")
        cells = (
            assign(materialize(cent0), tn, keep=1)
            .filter(F.col("crank") == 1)
            .select("vec_id", "qv", "c_label")
        )
        art = materialize(centroids(cells, "c_label"))
        if memo is not None:
            memo[(memo_path, seed_bits)] = (stat_key, art)
    return assign(art, n, keep=keep_ranks)


def ivf_topk(
    emb: DataFrame,
    seed_bits: int | None = 0,
    n_probe: int = N_PROBE,
    query_stride: int = QUERY_STRIDE,
    top_k: int = TOP_K,
    candidate_ids: DataFrame | None = None,
    memo_path: str | None = None,
) -> DataFrame:
    """ANN top-k over a (vec_id, label, embedding) DataFrame, IVF
    shape: ``ivf_assign`` codebook → inverted lists → probe the
    n_probe nearest lists → exact re-rank. The parameterized kernel
    behind similarity_ivf_probe.

    ``candidate_ids`` (one ``vec_id`` column) restricts the CANDIDATE
    side to a metadata predicate — filtered vector search, the
    PRE-FILTER strategy: the predicate lands on the inverted-list
    scan BEFORE any distance work, so every returned row satisfies it
    and the per-query cost shrinks with selectivity (the post-filter
    alternative scores first and discards after, returning < k rows
    at low selectivity). One index serves every predicate — the
    filter is a semi-join against the list scan, not a rebuild.

    Scale: a query probes n_probe/cells of the corpus; the probe join
    shuffles on the centroid id (bounded, near-uniform after the
    Lloyd refinement)."""
    # plan-lazy persist: the ranked assignment feeds lists, probes
    # and the query-norm table — without it the codebook matmul
    # kernel (and its emb scan) re-runs once per consumer. persist
    # (not localCheckpoint(eager=False), which was measured to run
    # ONE Spark job at DataFrame construction even when lazy) keeps
    # construction jobless after the codebook memo hit (VERDICT r11
    # item 4); the bounded registry unpersists old frames.
    assigned = persist_bounded(
        ivf_assign(emb, seed_bits, keep_ranks=n_probe, memo_path=memo_path)
    )
    lists = assigned.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("candidate_id"),
        F.col("qv").alias("c_qv"),
        F.col("nrm").alias("c_nrm"),
        "c_label",
    )
    if candidate_ids is not None:
        lists = lists.join(
            candidate_ids.select(F.col("vec_id").alias("candidate_id")),
            "candidate_id",
            "left_semi",
        )
    probes = (
        assigned.filter(
            (F.col("crank") <= n_probe) & (F.col("vec_id") % query_stride == 0)
        )
        .select(F.col("vec_id").alias("query_id"), "c_label")
    )
    qn = assigned.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = dot_long(F.col("q_qv"), F.col("c_qv")).cast("double") / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_exact"), F.asc("candidate_id")
    )
    return (
        probes.join(lists, "c_label")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .join(F.broadcast(qn), "query_id")
        .select("query_id", "candidate_id", cos.alias("cos_sim_exact"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "candidate_id",
            F.round("cos_sim_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


def _bucket_expr(qv, n_planes: int = N_PLANES):
    """LSH bucket id over the first ``n_planes`` hyperplanes: bit p =
    sign of the integer projection onto hyperplane p. Planes are
    literal arrays — data-independent, known at plan time,
    constant-folded by Catalyst."""
    # one F.expr per constant array: the 8×64 plane matrix spelled as
    # individual F.lit().cast() Columns costs ~1,500 py4j round-trips
    # (~1.2 s of DRIVER time per fresh-session IVF construction —
    # profiled r14); a single SQL string parses JVM-side in one call
    # and constant-folds to the identical Literal array
    planes = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{w}L" for w in row) + ")"
            for row in PLANES[:n_planes]
        )
        + ")"
    )
    powers = F.expr(
        "array(" + ", ".join(f"{1 << p}L" for p in range(n_planes)) + ")"
    )
    projections = F.transform(
        planes,
        lambda row: F.aggregate(
            F.zip_with(qv, row, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    bits = F.transform(projections, lambda pr: F.when(pr >= 0, 1).otherwise(0))
    return F.aggregate(
        F.zip_with(bits, powers, lambda x, p: x.cast("long") * p),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_SQL_BUCKET = _sql_bucket()


#: multi-probe deltas: the query's own bucket plus every Hamming-1
#: neighbor (one sign bit flipped). Radius-1 multi-probe is the
#: standard recall dial for sign-LSH: a near neighbor that disagrees
#: on exactly one of the 8 planes is still found. Probes ~9/256 of
#: the corpus per query (vs 1/256 single-probe), which lifted
#: measured recall@5 on the fixture from 0.02 to the tested floor in
#: tests/test_ann_recall.py while keeping the same equi-join shape.
PROBE_DELTAS = [0] + [1 << i for i in range(N_PLANES)]

_SQL_PROBE_DELTAS = "[" + ", ".join(str(d) for d in PROBE_DELTAS) + "]"


@query(
    "similarity_lsh_bucketed",
    oracle=f"""
    WITH q AS (SELECT vec_id, {SQL_QVEC} AS qv FROM embeddings),
    b AS (SELECT vec_id, qv, {sql_norm("qv")} AS nrm, {_SQL_BUCKET} AS bucket
          FROM q),
    probes AS (
        SELECT vec_id, qv, nrm, xor(bucket, delta) AS probe
        FROM b, unnest({_SQL_PROBE_DELTAS}::BIGINT[]) AS pd(delta)
        WHERE vec_id % {QUERY_STRIDE} = 0
    ),
    pairs AS (
        SELECT a.vec_id AS query_id, c.vec_id AS candidate_id,
               {sql_dot("a.qv", "c.qv")}::DOUBLE / (a.nrm * c.nrm) AS cos_sim
        FROM probes a JOIN b c ON a.probe = c.bucket
        WHERE c.vec_id != a.vec_id
    ),
    ranked AS (
        SELECT query_id, candidate_id, cos_sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, candidate_id) AS rank
        FROM pairs
    )
    SELECT query_id, candidate_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k, scale path: sign-random-projection LSH — 8
    deterministic hyperplanes → 256 buckets → radius-1 multi-probe
    (the query's bucket + its 8 one-bit-flip neighbors) → equi-join to
    candidates on bucket id → exact cosine re-rank.

    Scale: candidate generation is an equi-join on a uniform 8-bit
    key — the pair space shrinks by ~2⁸/9 vs brute force and shuffles
    by bucket with no skew (hyperplane signs of centered data are
    ~balanced). The probe expansion lives on the QUERY side, which is
    the broadcast side — 9 probe rows per query is free; probe radius
    is the recall/cost dial (tests/test_ann_recall.py pins measured
    recall@5). Both engines share the identical plane matrix and probe
    set, so the gate compares exactly."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", qvec_of(F.col("embedding")).alias("qv"))
    b = q.select(
        "vec_id",
        "qv",
        norm(F.col("qv")).alias("nrm"),
        _bucket_expr(F.col("qv")).alias("bucket"),
    )
    queries = (
        b.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in PROBE_DELTAS])
            ).alias("delta"),
            "bucket",
        )
        .select(
            "query_id",
            "q_qv",
            "q_nrm",
            F.col("bucket").bitwiseXOR(F.col("delta")).alias("bucket"),
        )
    )
    cands = b.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("qv").alias("c_qv"),
        F.col("nrm").alias("c_nrm"),
        "bucket",
    )
    cos = dot_long(F.col("q_qv"), F.col("c_qv")).cast("double") / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim_exact"), F.asc("candidate_id")
    )
    return (
        cands.join(F.broadcast(queries), "bucket")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .select("query_id", "candidate_id", cos.alias("cos_sim_exact"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "candidate_id",
            F.round("cos_sim_exact", 6).alias("cos_sim"),
            "rank",
        )
    )


#: SemDeDup duplicate threshold — same cosine bar as the global
#: brute-force dedup (operators/dedup.py COSINE_DUP_THRESHOLD) so the
#: two paths are directly comparable: semantic dedup finds the subset
#: of those pairs whose ends land in the same IVF cell.
SEMANTIC_DUP_TAU = 0.4


@query(
    "dedup_semantic_cells",
    oracle=f"""
    WITH {SQL_IVF_CELL_CTES},
    sizes AS (
        SELECT c_label, count(*)::BIGINT AS cell_size FROM lists GROUP BY 1
    ),
    dups AS (
        SELECT a.vec_id, min(b.vec_id) AS keeper
        FROM lists a
        JOIN lists b ON b.c_label = a.c_label AND b.vec_id < a.vec_id
        WHERE {sql_dot("a.qv", "b.qv")}::DOUBLE / (a.nrm * b.nrm)
                  >= {SEMANTIC_DUP_TAU}
        GROUP BY a.vec_id
    )
    SELECT l.vec_id, l.c_label AS cell, s.cell_size, d.keeper,
           d.keeper IS NOT NULL AS is_dup
    FROM lists l
    JOIN sizes s ON s.c_label = l.c_label
    LEFT JOIN dups d ON d.vec_id = l.vec_id
    """,
)
def dedup_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup shape (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space (the ``ivf_assign``
    k-means codebook — shared with the ANN index, built once in a
    real pipeline), then compare vectors ONLY within their cluster
    and mark as duplicate any vector with a smaller-id in-cell
    neighbor at cosine ≥ {SEMANTIC_DUP_TAU}; ``keeper`` is that
    group's canonical representative (the minimum such neighbor),
    NULL for kept vectors.

    vs the other embedding-dedup paths: ``dedup_embedding_cosine`` is
    the exact all-pairs baseline (n², hard-capped), and
    ``dedup_embedding_cosine_lsh`` buckets by random hyperplanes —
    SemDeDup instead blocks by LEARNED geometry, which is what makes
    it the web-scale standard: within-cell pairs are n·(n/cells) and
    the cells follow the data's density rather than fixed planes.
    Recall vs the global baseline is the fraction of dup pairs whose
    ends share a cell (measured in tests/test_semantic_dedup.py);
    missed pairs are the price of never comparing across clusters.

    Scale: one broadcast assignment pass (codebook is √n rows), one
    self-join shuffled on the cell id with per-cell cardinality
    bounded by the Lloyd-balanced cells, one min-aggregate. No
    all-pairs stage anywhere; cell count is the ``seed_bits`` dial
    (the registered entry pins 0 = the 10-cell oracle codebook; the
    10× smoke drives ``semantic_dedup_cells`` at seed_bits=5)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup_cells(emb, memo_path=_emb_path(sf_dir))


def semantic_dedup_cells(
    emb: DataFrame,
    seed_bits: int = 0,
    tau: float = SEMANTIC_DUP_TAU,
    memo_path: str | None = None,
) -> DataFrame:
    """The parameterized kernel behind ``dedup_semantic_cells``:
    ``seed_bits`` sizes the codebook (cells = labels × 2^seed_bits ≈
    √n — within-cell pair work is then n·√n total), ``tau`` is the
    duplicate bar; ``memo_path`` forwards to the shared codebook memo
    so the registered entry trains first-touch-only (r13 — the last
    Lloyd-training row left the construction-jobs allowlist)."""
    assigned = ivf_assign(emb, seed_bits, keep_ranks=1, memo_path=memo_path)
    # compute the cell assignment ONCE: it feeds three consumers
    # (both self-join sides + the cell-size aggregate), and without the
    # cut Catalyst replays the whole two-phase codebook build per
    # consumer (audited 28 exchanges → 4). Bounded lazy persist (r13;
    # was an eager localCheckpoint, which billed a job to every
    # plan-only construction); production would persist the
    # assignment as a table the ANN index also reads.
    lists = persist_bounded(
        assigned.filter(F.col("crank") == 1).select(
            "vec_id", "qv", "nrm", "c_label"
        )
    )
    a = lists.select(
        F.col("vec_id"),
        F.col("qv").alias("a_qv"),
        F.col("nrm").alias("a_nrm"),
        "c_label",
    )
    b = lists.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("qv").alias("b_qv"),
        F.col("nrm").alias("b_nrm"),
        "c_label",
    )
    cos = dot_long(F.col("a_qv"), F.col("b_qv")).cast("double") / (
        F.col("a_nrm") * F.col("b_nrm")
    )
    dups = (
        a.join(b, "c_label")
        .filter(F.col("b_vec_id") < F.col("vec_id"))
        .filter(cos >= tau)
        .groupBy("vec_id")
        .agg(F.min("b_vec_id").alias("keeper"))
    )
    sizes = lists.groupBy("c_label").agg(F.count("*").alias("cell_size"))
    return (
        lists.join(F.broadcast(sizes), "c_label")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            F.col("c_label").alias("cell"),
            "cell_size",
            "keeper",
            F.col("keeper").isNotNull().alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------

#: PQ geometry: DIM is split into PQ_M subspaces of PQ_SUB dims; each
#: subspace gets a 2^PQ_BITS-entry codebook, so a vector compresses to
#: PQ_M * PQ_BITS bits (64 d × 4 B floats → 8 codes = 32× smaller).
PQ_M = 8
PQ_SUB = DIM // PQ_M
PQ_BITS = 8
PQ_K = 1 << PQ_BITS
#: centroid components are stored as fixed-point integers at
#: QUANT*PQ_SCALE — the quantized-codebook trick that keeps every ADC
#: dot product exact integer arithmetic (truncating div toward zero,
#: identical in Spark `div` and DuckDB `//`).
PQ_SCALE = 256
#: ADC shortlist size fed to the exact re-rank stage.
PQ_RERANK = 40

# bounded lazy persist for the multi-consumer PQ codebook (ADVICE
# r10): see caching.persist_bounded — newest frames stay cached,
# evicted ones unpersist, construction stays jobless.
_persist_bounded = persist_bounded


def _pq_assign_salt(spark: SparkSession) -> int:
    """Salt fan-out for the cogrouped code-assignment kernel: bounds
    any one task to n/SALT vectors' subrows and lifts kernel
    parallelism from PQ_M groups to PQ_M·SALT. Derived from the
    cluster's parallelism (≈2 groups per core) rather than pinned:
    a fixed salt either under-parallelizes a big cluster or drowns a
    small one in per-group Arrow overhead (256 groups over 16k rows
    measured +1 s vs 64 groups at sf0.1). The codebook side
    replicates per salt (≤ PQ_K tiny rows each) — the standard
    replicate-the-bounded-side skew treatment. Results are
    salt-invariant (grouping only, never arithmetic)."""
    return max(1, -(-2 * spark.sparkContext.defaultParallelism // PQ_M))


def _pq_seed_cell_sql() -> str:
    """Same seed cell with ``m`` as a SQL column: plane weights inlined
    as literal arrays indexed by m*PQ_SUB+d (1-based)."""
    bits = []
    for b in range(PQ_BITS):
        wlit = "[" + ", ".join(str(w) for w in PLANES[b]) + "]"
        dot = " + ".join(
            f"qv[m * {PQ_SUB} + {d + 1}] * ({wlit})[m * {PQ_SUB} + {d + 1}]"
            for d in range(PQ_SUB)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(bits)


@query(
    "similarity_pq_adc",
    oracle=f"""
    -- product quantization + ADC: train {PQ_M} sub-codebooks of
    -- {PQ_K} fixed-point centroids (sign-LSH seed cells -> truncated
    -- integer mean), encode every vector as {PQ_M} codes, then score
    -- query-vs-corpus entirely in the compressed domain: per-query
    -- lookup table T[m][cell] = <q_m, centroid>, candidate score =
    -- sum of table hits, normalized by the reconstruction norm.
    WITH q AS (SELECT vec_id, {SQL_QVEC} AS qv FROM embeddings),
    sub AS (
        SELECT vec_id, m, qv,
               list_slice(qv, m * {PQ_SUB} + 1, m * {PQ_SUB} + {PQ_SUB})
                   AS sv,
               {_pq_seed_cell_sql()} AS cell
        FROM q, range({PQ_M}) r(m)
    ),
    cnt AS (SELECT m, cell, count(*) AS n FROM sub GROUP BY 1, 2),
    comp AS (
        SELECT m, cell, pos, sum(sv[pos])::BIGINT AS s
        FROM sub, range(1, {PQ_SUB} + 1) p(pos)
        GROUP BY 1, 2, 3
    ),
    cent AS (
        SELECT comp.m, comp.cell,
               list((comp.s * {PQ_SCALE}) // cnt.n ORDER BY comp.pos)
                   AS cq
        FROM comp JOIN cnt USING (m, cell)
        GROUP BY comp.m, comp.cell, cnt.n
    ),
    centn AS (SELECT m, cell, cq, {sql_dot("cq", "cq")} AS cn2 FROM cent),
    aff AS (
        SELECT s.vec_id, s.m, c.cell, c.cn2,
               {sql_dot("s.sv", "c.cq")}::DOUBLE
                   / (sqrt({sql_dot("s.sv", "s.sv")}::DOUBLE)
                      * sqrt(c.cn2::DOUBLE)) AS a,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY {sql_dot("s.sv", "c.cq")}::DOUBLE
                       / (sqrt({sql_dot("s.sv", "s.sv")}::DOUBLE)
                          * sqrt(c.cn2::DOUBLE)) DESC, c.cell) AS rk
        FROM sub s JOIN centn c USING (m)
    ),
    codes AS (SELECT vec_id, m, cell, cn2 FROM aff WHERE rk = 1),
    rn AS (SELECT vec_id, sum(cn2)::BIGINT AS rnorm2 FROM codes GROUP BY 1),
    qn AS (SELECT vec_id, sqrt({sql_dot("qv", "qv")}::DOUBLE) AS qnrm
           FROM q WHERE vec_id % {QUERY_STRIDE} = 0),
    lut AS (
        SELECT q.vec_id AS query_id, c.m, c.cell,
               {sql_dot(f"list_slice(q.qv, c.m * {PQ_SUB} + 1, c.m * {PQ_SUB} + {PQ_SUB})", "c.cq")}
                   AS t
        FROM q JOIN centn c ON q.vec_id % {QUERY_STRIDE} = 0
    ),
    score AS (
        SELECT l.query_id, k.vec_id AS candidate_id,
               sum(l.t)::BIGINT AS ip
        FROM codes k JOIN lut l USING (m, cell)
        WHERE k.vec_id != l.query_id
        GROUP BY 1, 2
    ),
    shortlist AS (
        SELECT s.query_id, s.candidate_id,
               s.ip::DOUBLE / (qn.qnrm * sqrt(rn.rnorm2::DOUBLE))
                   AS adc_cos,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY s.ip::DOUBLE
                         / (qn.qnrm * sqrt(rn.rnorm2::DOUBLE)) DESC,
                       s.candidate_id) AS adc_rank
        FROM score s
        JOIN qn ON qn.vec_id = s.query_id
        JOIN rn ON rn.vec_id = s.candidate_id
    ),
    rerank AS (
        SELECT sl.query_id, sl.candidate_id, sl.adc_cos,
               {sql_dot("cq2.qv", "qq.qv")}::DOUBLE
                   / (sqrt({sql_dot("cq2.qv", "cq2.qv")}::DOUBLE)
                      * sqrt({sql_dot("qq.qv", "qq.qv")}::DOUBLE))
                   AS cos_exact,
               row_number() OVER (
                   PARTITION BY sl.query_id
                   ORDER BY {sql_dot("cq2.qv", "qq.qv")}::DOUBLE
                         / (sqrt({sql_dot("cq2.qv", "cq2.qv")}::DOUBLE)
                            * sqrt({sql_dot("qq.qv", "qq.qv")}::DOUBLE)) DESC,
                       sl.candidate_id) AS rank
        FROM shortlist sl
        JOIN q cq2 ON cq2.vec_id = sl.candidate_id
        JOIN q qq ON qq.vec_id = sl.query_id
        WHERE sl.adc_rank <= {PQ_RERANK}
    )
    SELECT query_id, candidate_id, round(adc_cos, 6) AS adc_cos,
           round(cos_exact, 6) AS cos_exact, rank
    FROM rerank WHERE rank <= {TOP_K}
    """,
)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN in the COMPRESSED domain — product quantization with
    asymmetric distance computation, the memory-side half of every
    large-scale vector index (FAISS IVF-PQ shape): {PQ_M} sub-codebooks
    × {PQ_K} centroids compress a {DIM}-d vector to {PQ_M} codes
    ({PQ_M * PQ_BITS} bits, 32× smaller than float32), and queries
    score candidates WITHOUT decompressing — one {PQ_M}×{PQ_K} integer
    lookup table per query, candidate score = {PQ_M} table hits.

    Determinism: codebooks are truncated-integer means of sign-LSH
    seed cells (same PLANES matrix as the LSH/IVF paths), stored as
    fixed-point ints, so codes, lookup tables, and scores are exact
    integer arithmetic; doubles appear only in the final
    norm-divide.

    Scale shape: training = one groupBy over n×{PQ_M} subvector rows
    with the argmax as a map-side-combining max_by (no n×K window
    sort); encoding = broadcast-codebook map; scoring = the code rows
    BroadcastHashJoin'd against the per-query distance tables + one
    combining sum — all integer table hits, one pair-keyed shuffle,
    then the top-k window. At 100 TB you compose this with the IVF
    router (`ivf_topk`): probe selects lists, ADC scans them
    compressed — this entry is that scan kernel, full-corpus so the
    oracle covers every candidate."""
    emb = read_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb)


def pq_adc_topk(
    emb: DataFrame,
    query_stride: int = QUERY_STRIDE,
    rerank: int = PQ_RERANK,
    top_k: int = TOP_K,
    router: DataFrame | None = None,
) -> DataFrame:
    """Parameterized PQ+ADC kernel behind ``similarity_pq_adc``:
    ``query_stride`` sizes the query set (the smoke drives a sparse
    stride at 60x vectors — the registered dense stride would mean
    thousands of full-corpus compressed scans in one job).

    ``router``, when given, is a (query_id, candidate_id) DataFrame
    restricting WHICH candidates each query ADC-scores — the IVF-PQ
    composition (``ivf_pq_topk``): per-query cost becomes ∝ the
    routed candidate set instead of the corpus. Codebook training and
    encoding still cover the full corpus (the index is built once)."""
    q = emb.select(
        "vec_id", qvec_of(F.col("embedding")).alias("qv")
    ).filter(F.col("qv").isNotNull())
    # ---- seed-cell assignment: ONE numpy sign-matmul kernel -------
    # History: the relational spelling went literal-arrays (512 copies
    # of a 64-literal array in codegen, ~12 s of Janino) -> broadcast
    # weight table with a 512-term scalar expression (fast steady-
    # state but ~5 s of Janino compile at EVERY construction — expr
    # ids differ per DataFrame, so the codegen cache never hits). The
    # kernel form is the same trick ivf_assign uses for its codebook:
    # the plane matrix is a plan-time constant, each Arrow batch does
    # one integer einsum, and the sign bits are exact in int64 —
    # equivalence pinned by the unchanged DuckDB oracle.
    wmat = np.array(
        [
            [
                [PLANES[b][m * PQ_SUB + d] for d in range(PQ_SUB)]
                for b in range(PQ_BITS)
            ]
            for m in range(PQ_M)
        ],
        dtype=np.int64,
    )
    bitvals = np.array([1 << b for b in range(PQ_BITS)], dtype=np.int64)

    def seed_cells(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            nb = len(pdf)
            if not nb:
                continue
            x = _np.stack(pdf["qv"].values).astype(_np.int64, copy=False)
            xs = x.reshape(nb, PQ_M, PQ_SUB)
            dots = _np.einsum("vms,mbs->vmb", xs, wmat)
            cells = ((dots >= 0) * bitvals[None, None, :]).sum(axis=2)
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(pdf["vec_id"].to_numpy(), PQ_M),
                    "m": _np.tile(
                        _np.arange(PQ_M, dtype=_np.int32), nb
                    ),
                    "sv": list(xs.reshape(nb * PQ_M, PQ_SUB)),
                    "cell": cells.reshape(-1).astype(_np.int32),
                }
            )

    # localCheckpoint: two consumers below (cell counts, component
    # sums) must not each recompute the kernel scan.
    subs = (
        q.mapInPandas(
            seed_cells,
            schema="vec_id long, m int, sv array<long>, cell int",
        )
        .localCheckpoint(eager=False)
    )
    # ONE aggregation trains the codebook (r16, guide §2.3/§2.4): the
    # former posexplode → groupBy(m, cell, pos) → join(counts) →
    # groupBy(m, cell) + collect_list/array_sort spelling paid two
    # extra shuffles, a join, and a per-group sort to reassemble what
    # is simply PQ_SUB positional sums — sv is fixed-width, so
    # count + sum(sv[pos]) per position in a single partial-agg pass
    # produces the identical truncated-mean centroid (same int64
    # sums, same (s·SCALE) div n per component, same order by
    # construction).
    cent = (
        subs.groupBy("m", "cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col("sv")[pos]).alias(f"s{pos}")
                for pos in range(PQ_SUB)
            ],
        )
        .select(
            "m",
            "cell",
            F.array(
                *[
                    F.expr(f"(s{pos} * {PQ_SCALE}) div n")
                    for pos in range(PQ_SUB)
                ]
            ).alias("cq"),
        )
        .withColumn("cn2", dot_long(F.col("cq"), F.col("cq")))
    )
    cent = _persist_bounded(cent)
    # NOTE persist(), NOT localCheckpoint(eager=False): under AQE a
    # localCheckpoint materializes the frame's shuffle stages at
    # CONSTRUCTION (toRdd finalizes query stages) — exactly the
    # plan-time job leak r9 flagged. persist() is plan-lazy (zero
    # jobs until the first action) and computes the ~PQ_M·PQ_K-row
    # codebook once for its two consumers (code assignment + the
    # per-query lookup tables). Identical re-constructions reuse one
    # CacheManager entry (keyed by canonicalized plan), and DISTINCT
    # sources can no longer accumulate unboundedly: _persist_bounded
    # keeps the newest _PQ_CENT_MAX codebooks and unpersists evicted
    # ones (ADVICE r10 — a long-lived shared session previously
    # stacked one entry per sf_dir until someone called clearCache).
    # ---- code assignment: salted-cogroup numpy argmax -------------
    # (r10, VERDICT item 3) The previous form collected the trained
    # codebook at DataFrame-CONSTRUCTION time — two Spark jobs before
    # any action (plan-only tooling paid them on every explain) plus
    # a Python broadcast that was never unpersisted and accumulated
    # in shared sessions. The codebook now travels through the DATA
    # PLANE instead of the driver: cogroup the subvector rows with
    # the per-m codebook rows and run the same exact int64
    # einsum-argmax per Arrow group. Construction runs ZERO jobs and
    # nothing driver-held leaks. (A pure relational spelling —
    # BroadcastHashJoin on m + max(struct) — was measured 2.05 s vs
    # ~0.4 s for this kernel at sf0.1: the n·PQ_M·PQ_K row explosion
    # through join machinery loses to one vectorized matmul per
    # batch.) The salt bounds per-task rows to n·PQ_M/(PQ_M·SALT)
    # and keeps parallelism at PQ_M·SALT tasks instead of PQ_M; the
    # codebook side replicates per salt (≤ PQ_K tiny rows each), the
    # classic replicate-the-small-side skew treatment. Exactness is
    # byte-identical to the oracle: integer dots are exact in int64,
    # the divide is one IEEE op, and numpy argmax over cell-sorted
    # columns reproduces `ORDER BY a DESC, cell` including NaN
    # (argmax sticks at the first NaN = the lowest NaN cell, which
    # is DESC-NaN-first + min-cell tie).
    # the cent side's key columns are RENAMED (cm/csalt): both sides
    # descend from `subs`, and identically-named lineage columns trip
    # the ambiguous-self-join check on the cogroup
    salt_n = _pq_assign_salt(emb.sparkSession)
    cent_rep = cent.select(
        F.col("m").alias("cm"),
        "cell",
        "cq",
        "cn2",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_n - 1))
        ).alias("csalt"),
    )
    subs_k = subs.select(
        "vec_id",
        "m",
        "sv",
        (F.col("vec_id") % salt_n).cast("int").alias("salt"),
    )

    def assign_codes(left, right):
        import numpy as _np
        import pandas as _pd

        if not len(left):
            return _pd.DataFrame(
                {
                    "vec_id": _np.array([], dtype=_np.int64),
                    "m": _np.array([], dtype=_np.int32),
                    "cell": _np.array([], dtype=_np.int64),
                    "cn2": _np.array([], dtype=_np.int64),
                }
            )
        right = right.sort_values("cell").reset_index(drop=True)
        cm = _np.stack(right["cq"].values).astype(_np.int64, copy=False)
        cn2 = right["cn2"].to_numpy(dtype=_np.int64)
        labels = right["cell"].to_numpy(dtype=_np.int64)
        x = _np.stack(left["sv"].values).astype(_np.int64, copy=False)
        svn2 = _np.einsum("vs,vs->v", x, x).astype(_np.float64)
        a = (x @ cm.T).astype(_np.float64) / (
            _np.sqrt(svn2)[:, None]
            * _np.sqrt(cn2.astype(_np.float64))[None, :]
        )
        best = _np.argmax(a, axis=1)
        return _pd.DataFrame(
            {
                "vec_id": left["vec_id"].to_numpy(),
                "m": left["m"].to_numpy(),
                "cell": labels[best],
                "cn2": cn2[best],
            }
        )

    codes = (
        subs_k.groupBy("m", "salt")
        .cogroup(cent_rep.groupBy("cm", "csalt"))
        .applyInPandas(
            assign_codes,
            schema="vec_id long, m int, cell long, cn2 long",
        )
    )
    # Candidate-side reconstruction norm: sum of the 8 chosen
    # centroids' cn2. It is folded into the SCORE aggregate below
    # (sum(cn2) alongside sum(t)) instead of a separate
    # codes.groupBy(vec_id) table: every (query, candidate, m)
    # triple appears exactly once in the score join (the per-query
    # lookup table covers every (m, cell) in the codebook), so the
    # group's sum(cn2) IS rnorm2 — and codes then has exactly ONE
    # consumer, so the n·PQ_M·PQ_K affinity join computes once
    # without any checkpoint (a second consumer would re-run it:
    # Catalyst does not reuse non-exchange subtrees).
    # per-query lookup tables, keyed m*PQ_K+cell, broadcast to the scan
    qside = q.filter(F.col("vec_id") % query_stride == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    # the per-query distance tables as ROWS (query, m, cell, <q_m, c>)
    # broadcast against the code scan: the ADC lookup becomes a
    # BroadcastHashJoin + map-side-combining sum — a MapType
    # element_at per code is a LINEAR key scan in Spark (measured 6 s
    # of the whole query at sf0.1); the join form is the same integer
    # table hit at hash-lookup cost.
    lut = qside.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "m",
        "cell",
        dot_long(
            F.expr(f"slice(q_qv, m * {PQ_SUB} + 1, {PQ_SUB})"),
            F.col("cq"),
        ).alias("t"),
    )
    qn_pq = qside.select(
        "query_id", norm(F.col("q_qv")).alias("qnrm")
    )
    if router is not None:
        # routed scan: the (query, candidate) pair set drives the code
        # lookup — each pair expands to its PQ_M codes, each code hits
        # the broadcast per-query table once. Pairs are unique by
        # construction (a candidate lives in exactly one IVF list), so
        # grouping additionally by the router's IVF cell (when it
        # carries one) keeps the same groups — the label is constant
        # within each (query, candidate) pair — and feeds the
        # two-stage top-k below.
        route_cell = ["c_label"] if "c_label" in router.columns else []
        score = (
            router.select("query_id", "candidate_id", *route_cell)
            .join(
                codes.select(
                    F.col("vec_id").alias("candidate_id"),
                    "m",
                    "cell",
                    "cn2",
                ),
                "candidate_id",
            )
            .join(F.broadcast(lut), ["query_id", "m", "cell"])
            .groupBy("query_id", "candidate_id", *route_cell)
            .agg(
                F.sum("t").cast("long").alias("ip"),
                F.sum("cn2").cast("long").alias("rnorm2"),
            )
        )
    else:
        route_cell = []
        score = (
            codes.join(F.broadcast(lut), ["m", "cell"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", F.col("vec_id").alias("candidate_id"))
            .agg(
                F.sum("t").cast("long").alias("ip"),
                F.sum("cn2").cast("long").alias("rnorm2"),
            )
        )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_raw"), F.asc("candidate_id")
    )
    scored = score.join(F.broadcast(qn_pq), "query_id").select(
        "query_id",
        "candidate_id",
        *route_cell,
        (
            F.col("ip").cast("double")
            / (F.col("qnrm") * F.sqrt(F.col("rnorm2").cast("double")))
        ).alias("adc_raw"),
    )
    if route_cell:
        # two-stage top-k (r17, guide §2.3): rank within each routed
        # (query, IVF cell) list first and keep only its top-`rerank`
        # — exact, because any row in the global per-query top-rerank
        # has at most rerank−1 better rows overall, hence at most
        # that many within its own cell, so it always survives the
        # cell cut (ties are totally ordered by candidate_id, and all
        # globally-better rows survive too, so adc_rank is unchanged).
        # The global window's input drops from the probed-list mass
        # (~n_probe·n/cells rows per query — at 100 TB one task per
        # query over ~10% of the corpus) to ≤ n_probe·rerank rows per
        # query, and the per-cell stage partitions by (query, cell) —
        # n_probe× more, list-bounded partitions.
        w_cell = Window.partitionBy("query_id", "c_label").orderBy(
            F.desc("adc_raw"), F.asc("candidate_id")
        )
        scored = (
            scored.withColumn("cell_rank", F.row_number().over(w_cell))
            .filter(F.col("cell_rank") <= rerank)
            .drop("cell_rank", "c_label")
        )
    shortlist = scored.withColumn(
        "adc_rank", F.row_number().over(w_adc)
    ).filter(F.col("adc_rank") <= rerank)
    # exact re-rank of the PQ_RERANK-deep shortlist — the standard
    # refine stage: only queries x PQ_RERANK full vectors are touched,
    # the corpus scan above stayed compressed.
    cand_full = q.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("qv").alias("c_qv"),
        norm(F.col("qv")).alias("c_nrm"),
    )
    query_full = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qq_qv"),
        norm(F.col("qv")).alias("qq_nrm"),
    )
    w_ex = Window.partitionBy("query_id").orderBy(
        F.desc("cos_exact_raw"), F.asc("candidate_id")
    )
    return (
        shortlist.join(cand_full, "candidate_id")
        .join(F.broadcast(query_full), "query_id")
        .select(
            "query_id",
            "candidate_id",
            "adc_raw",
            (
                dot_long(F.col("c_qv"), F.col("qq_qv")).cast("double")
                / (F.col("c_nrm") * F.col("qq_nrm"))
            ).alias("cos_exact_raw"),
        )
        .withColumn("rank", F.row_number().over(w_ex))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "candidate_id",
            F.round("adc_raw", 6).alias("adc_cos"),
            F.round("cos_exact_raw", 6).alias("cos_exact"),
            "rank",
        )
    )


# ------------------------------------------------------------- IVF-PQ

#: IVF-PQ router geometry — same dials as similarity_ivf_scaled so
#: the two entries share the probed-candidate story: 320 cells, 32
#: probes ≈ 10% of the fixture corpus ADC-scanned per query.
IVF_PQ_SEED_BITS = IVF_SCALED_SEED_BITS
IVF_PQ_N_PROBE = IVF_SCALED_N_PROBE


def ivf_pq_topk(
    emb: DataFrame,
    seed_bits: int = IVF_PQ_SEED_BITS,
    n_probe: int = IVF_PQ_N_PROBE,
    query_stride: int = QUERY_STRIDE,
    rerank: int = PQ_RERANK,
    top_k: int = TOP_K,
    memo_path: str | None = None,
) -> DataFrame:
    """The production FAISS shape — IVF router over PQ-compressed
    lists: the coarse quantizer (``ivf_assign``) picks each query's
    ``n_probe`` nearest cells, and ONLY the vectors in those lists are
    ADC-scored against the query's lookup table, then exact-reranked
    ``rerank`` deep. Per-query scan cost ∝ probed-list mass (compressed
    codes, no full vectors) — never the corpus."""
    # plan-lazy persist: the router reads the assignment twice
    # (lists + probes); one materialization instead of two codebook
    # rank runs, with zero construction jobs (see ivf_topk)
    assigned = persist_bounded(
        ivf_assign(emb, seed_bits, keep_ranks=n_probe, memo_path=memo_path)
    )
    lists = assigned.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("candidate_id"), "c_label"
    )
    probes = assigned.filter(
        (F.col("crank") <= n_probe) & (F.col("vec_id") % query_stride == 0)
    ).select(F.col("vec_id").alias("query_id"), "c_label")
    router = (
        probes.join(lists, "c_label")
        .filter(F.col("candidate_id") != F.col("query_id"))
        # c_label rides along (r17, guide §2.3 two-stage top-k): the
        # ADC kernel pre-cuts each routed list to its per-(query,
        # cell) top-`rerank` before the global per-query window, so
        # the window input is bounded at n_probe·rerank rows per
        # query instead of the probed-list mass
        .select("query_id", "candidate_id", "c_label")
    )
    return pq_adc_topk(
        emb,
        query_stride=query_stride,
        rerank=rerank,
        top_k=top_k,
        router=router,
    )


@query(
    "similarity_ivf_pq",
    oracle=f"""
    -- IVF-PQ: the coarse quantizer routes each query to its
    -- {IVF_PQ_N_PROBE} nearest cells (same seeded+refined codebook
    -- as similarity_ivf_scaled) and ONLY the routed lists' vectors
    -- are ADC-scored (same PQ codebooks/codes/lookup tables as
    -- similarity_pq_adc), then exact-reranked {PQ_RERANK} deep.
    WITH {sql_ivf_cell_ctes(IVF_PQ_SEED_BITS)},
    probes AS (
        SELECT vec_id AS query_id, c_label FROM assigned
        WHERE crank <= {IVF_PQ_N_PROBE} AND vec_id % {QUERY_STRIDE} = 0
    ),
    cand AS (
        SELECT p.query_id, l.vec_id AS candidate_id
        FROM probes p
        JOIN lists l ON l.c_label = p.c_label AND l.vec_id != p.query_id
    ),
    psub AS (
        SELECT vec_id, m, qv,
               list_slice(qv, m * {PQ_SUB} + 1, m * {PQ_SUB} + {PQ_SUB})
                   AS sv,
               {_pq_seed_cell_sql()} AS cell
        FROM q, range({PQ_M}) r(m)
    ),
    pcnt AS (SELECT m, cell, count(*) AS n FROM psub GROUP BY 1, 2),
    pcomp AS (
        SELECT m, cell, pos, sum(sv[pos])::BIGINT AS s
        FROM psub, range(1, {PQ_SUB} + 1) p(pos)
        GROUP BY 1, 2, 3
    ),
    pcent AS (
        SELECT pcomp.m, pcomp.cell,
               list((pcomp.s * {PQ_SCALE}) // pcnt.n ORDER BY pcomp.pos)
                   AS cq
        FROM pcomp JOIN pcnt USING (m, cell)
        GROUP BY pcomp.m, pcomp.cell, pcnt.n
    ),
    pcentn AS (SELECT m, cell, cq, {sql_dot("cq", "cq")} AS cn2 FROM pcent),
    paff AS (
        SELECT s.vec_id, s.m, c.cell, c.cn2,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY {sql_dot("s.sv", "c.cq")}::DOUBLE
                       / (sqrt({sql_dot("s.sv", "s.sv")}::DOUBLE)
                          * sqrt(c.cn2::DOUBLE)) DESC, c.cell) AS rk
        FROM psub s JOIN pcentn c USING (m)
    ),
    pcodes AS (SELECT vec_id, m, cell, cn2 FROM paff WHERE rk = 1),
    prn AS (SELECT vec_id, sum(cn2)::BIGINT AS rnorm2 FROM pcodes GROUP BY 1),
    pqn AS (SELECT vec_id, sqrt({sql_dot("qv", "qv")}::DOUBLE) AS qnrm
            FROM q WHERE vec_id % {QUERY_STRIDE} = 0),
    plut AS (
        SELECT q.vec_id AS query_id, c.m, c.cell,
               {sql_dot(f"list_slice(q.qv, c.m * {PQ_SUB} + 1, c.m * {PQ_SUB} + {PQ_SUB})", "c.cq")}
                   AS t
        FROM q JOIN pcentn c ON q.vec_id % {QUERY_STRIDE} = 0
    ),
    pscore AS (
        SELECT cd.query_id, cd.candidate_id, sum(pl.t)::BIGINT AS ip
        FROM cand cd
        JOIN pcodes k ON k.vec_id = cd.candidate_id
        JOIN plut pl ON pl.query_id = cd.query_id
                    AND pl.m = k.m AND pl.cell = k.cell
        GROUP BY 1, 2
    ),
    shortlist AS (
        SELECT s.query_id, s.candidate_id,
               s.ip::DOUBLE / (pqn.qnrm * sqrt(prn.rnorm2::DOUBLE))
                   AS adc_cos,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY s.ip::DOUBLE
                         / (pqn.qnrm * sqrt(prn.rnorm2::DOUBLE)) DESC,
                       s.candidate_id) AS adc_rank
        FROM pscore s
        JOIN pqn ON pqn.vec_id = s.query_id
        JOIN prn ON prn.vec_id = s.candidate_id
    ),
    rerank AS (
        SELECT sl.query_id, sl.candidate_id, sl.adc_cos,
               {sql_dot("cq2.qv", "qq.qv")}::DOUBLE
                   / (sqrt({sql_dot("cq2.qv", "cq2.qv")}::DOUBLE)
                      * sqrt({sql_dot("qq.qv", "qq.qv")}::DOUBLE))
                   AS cos_exact,
               row_number() OVER (
                   PARTITION BY sl.query_id
                   ORDER BY {sql_dot("cq2.qv", "qq.qv")}::DOUBLE
                         / (sqrt({sql_dot("cq2.qv", "cq2.qv")}::DOUBLE)
                            * sqrt({sql_dot("qq.qv", "qq.qv")}::DOUBLE)) DESC,
                       sl.candidate_id) AS rank
        FROM shortlist sl
        JOIN q cq2 ON cq2.vec_id = sl.candidate_id
        JOIN q qq ON qq.vec_id = sl.query_id
        WHERE sl.adc_rank <= {PQ_RERANK}
    )
    SELECT query_id, candidate_id, round(adc_cos, 6) AS adc_cos,
           round(cos_exact, 6) AS cos_exact, rank
    FROM rerank WHERE rank <= {TOP_K}
    """,
)
def similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production ANN index — IVF routing over
    PQ-compressed lists (FAISS IVFPQ shape, the docstring claim on
    ``similarity_pq_adc`` made real): coarse cells from the SAME
    seeded+refined codebook as ``similarity_ivf_scaled``, compressed
    codes/lookup tables from the SAME PQ training as
    ``similarity_pq_adc``, per-query ADC cost ∝ the ~10% of the
    corpus the {IVF_PQ_N_PROBE} probed lists hold, exact re-rank
    {PQ_RERANK} deep. The oracle rebuilds router AND codec end-to-end
    in SQL. Recall@5 vs exact brute force is pinned in
    tests/test_ann_recall.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, memo_path=_emb_path(sf_dir))


# ----------------------------------------------------------- kNN graph

#: neighbors per vector in the kNN graph
KNN_K = 3
#: cells each vector PROBES for graph neighbors (its own cell plus
#: the next ranks): multi-probe assignment — the recall patch for
#: cross-cell near-neighbors that single-cell restriction misses by
#: construction (VERDICT r9 item 1b). Probe work scales linearly in
#: this dial: pair cost is n·KNN_PROBES·(n/cells). At the DERIVED
#: √n cell geometry (VERDICT r10 item 1: 40 cells at the 500-vector
#: fixture instead of the pinned 10) the fixture recall ladder is
#: 0.248 (2 probes) → 0.413 (4) → 0.525 (6) → 0.609 (8); 8 probes
#: scan 20% of the corpus here — HALF the pinned-geometry entry's
#: pair work (50k vs 100k candidate pairs) — and at production scale
#: the probe COUNT stays put while cells track √n, so pair cost is
#: n·8·√n, not 0.4·n². SYMMETRIZING the scored pair set (VERDICT r11
#: item 2: every computed (q, v) also counts as a candidate for v —
#: cosine is symmetric, so the reverse edge is FREE, no extra gram
#: work, pair count unchanged) lifts fixture recall 0.609 → 0.807,
#: above the pinned-geometry entry's 0.690 at half its pair work.
KNN_PROBES = 8
#: hot-cell OOM guard (VERDICT r9 item 1a): the per-cell gram is
#: computed in ROW BLOCKS of at most this many float64 elements
#: (4M ≈ 32 MB), so one skewed/hot cell of m members costs
#: O(block) memory instead of O(m²) in a single task. Exactness is
#: unaffected — each query row still scores against every member
#: column; only the row batching changes.
KNN_GRAM_BLOCK_ELEMS = 4_000_000

#: test hook (VERDICT r10 item 6): when a Spark accumulator is
#: installed here (captured into the kernel closure at DataFrame
#: construction), the kNN cell kernel adds the number of gram ROW
#: BLOCKS it computed per cell — so a test can prove a hot/skewed
#: cell was actually processed in bounded-memory blocks (count > 1)
#: rather than one O(m²) gram. None in production: zero overhead.
KNN_BLOCK_ACC = None

#: float64 integer-exactness envelope: every intermediate of an
#: integer-valued float64 matmul (products, partial sums in any
#: order, FMA contractions) is exact as long as its magnitude stays
#: below 2^53 — integers up to 2^53 are representable and integer
#: add/mul within the bound round to themselves. The check itself
#: runs in exact Python integer arithmetic inside _gram_int_exact.
_F64_EXACT_BOUND = 2**53


def _gram_int_exact(a, b_t, a_absmax=None, b_absmax=None):
    """Exact integer gram ``a @ b_t`` (both int64), computed through
    float64 BLAS when the exactness envelope holds — returns float64.

    numpy's int64 matmul gets no BLAS dispatch (generic C loops;
    measured 6.1 s for a 2000×64 self-gram in the r13 driver bench —
    VERDICT r13 item 1), while the float64 path is one dgemm call
    (~0.05 s). Exactness: inputs are quantized integer vectors
    (functions/vectors.py, |component| ≤ QUANT·|x|), so every
    product is ≤ amax·bmax and every partial sum ≤ d·amax·bmax;
    when that bound is < 2^53 all intermediates are exactly
    representable integers regardless of summation order, blocking,
    or FMA — the dgemm result is bit-identical to the int64 loop.
    The envelope is CHECKED per call (data, not assumption); outside
    it we fall back to the exact-but-slow int64 loops.

    ``a_absmax`` / ``b_absmax``: pass ``np.abs(m).max()`` precomputed
    for whichever matrix is loop-invariant at the call site (the
    fixed corpus/candidate matrix under row blocks, or the fixed
    broadcast sample matrix under Arrow batches), so the O(n·d) scan
    and its full-size abs() temp run once per matrix, not once per
    batch (r14 review)."""
    import numpy as _np

    amax = (
        float(_np.abs(a).max(initial=0))
        if a_absmax is None
        else float(a_absmax)
    )
    bmax = (
        float(_np.abs(b_t).max(initial=0))
        if b_absmax is None
        else float(b_absmax)
    )
    # envelope check in EXACT Python integer arithmetic (ADVICE
    # r14): the float64 product amax*bmax*d can itself round down a
    # few ulps near 2^53 and admit a gram whose true bound is
    # marginally above it. ceil, not int (ADVICE r15): int() truncates
    # toward zero, so a contract-violating FRACTIONAL max (inputs are
    # supposed to be integer-valued) would weaken the bound (2.9 → 2)
    # and could admit the inexact-float path for out-of-contract
    # data; ceil only ever tightens. For in-contract integer maxima
    # ceil == int, so the branch taken is unchanged.
    if math.ceil(amax) * math.ceil(bmax) * a.shape[1] < _F64_EXACT_BOUND:
        return a.astype(_np.float64) @ b_t.astype(_np.float64)
    return (a @ b_t).astype(_np.float64)


def _topk_cols_stable(cos, kk):
    """Row-wise top-``kk`` column selection of ``cos`` under the
    (value desc, column-index asc) order — bit-identical to
    ``np.argsort(-cos, axis=1, kind="stable")[:, :kk]`` but built on
    ``np.argpartition`` so the per-row cost is O(m + kk·log kk)
    instead of a full O(m·log m) stable sort (the 15.2 s line of the
    r13 dq_knn_recall_eval regression — VERDICT r13 item 1). Columns
    MUST be id-sorted by the caller (they are: every kernel sorts
    its batch by vec_id) so index-asc == id-asc.

    Tie safety: argpartition guarantees the slice holds the P
    largest VALUES but picks arbitrarily among ties at the slice
    boundary. The slice is padded (P = kk + 8) and any row whose
    kk-th kept value still equals the slice minimum — the only case
    where a lower-id tie could have been cut — falls back to the
    full stable argsort for that row alone (rare: needs ≥ 9-way
    cosine ties straddling the boundary).

    Returns flat ``(rows, cols)`` index arrays with -inf (masked)
    entries dropped — the exact post-``keep`` shape the kernels
    consumed from the argsort form."""
    import numpy as _np

    nr, m = cos.shape
    kk = min(kk, m)
    if kk <= 0 or nr == 0:
        z = _np.array([], dtype=_np.int64)
        return z, z
    pad = min(m, kk + 8)
    if pad >= m:
        order = _np.argsort(-cos, axis=1, kind="stable")[:, :kk]
    else:
        neg = -cos
        part = _np.argpartition(neg, pad - 1, axis=1)[:, :pad]
        part.sort(axis=1)  # ascending col index → id-stable ties
        pv = _np.take_along_axis(neg, part, axis=1)
        o2 = _np.argsort(pv, axis=1, kind="stable")
        pvs = _np.take_along_axis(pv, o2, axis=1)
        order = _np.take_along_axis(part, o2[:, :kk], axis=1)
        # fallback unless the kk-th kept value is STRICTLY above the
        # slice minimum: `~(a < b)` (not `a == b`) so NaN — which
        # compares False to everything and sorts last like the
        # reference argsort, but lands arbitrarily in the partition
        # slice — also routes to the exact full sort (r14 review)
        unsafe = _np.flatnonzero(~(pvs[:, kk - 1] < pvs[:, pad - 1]))
        if unsafe.size:
            order[unsafe] = _np.argsort(
                neg[unsafe], axis=1, kind="stable"
            )[:, :kk]
    rows = _np.repeat(_np.arange(nr), kk)
    cols = order.ravel()
    keep = cos[rows, cols] > -_np.inf
    return rows[keep], cols[keep]


def _topk_rows_idx(cos, kk):
    """Column-wise (axis-0) twin of ``_topk_cols_stable``: the top-``kk``
    ROW indices per column under (value desc, row-index asc), shape
    ``(min(kk, nr), m)`` — bit-identical to
    ``np.argsort(-cos, axis=0, kind="stable")[:kk]`` including -inf
    (masked) entries, which the kNN-graph column-direction merge
    filters at the end. Same argpartition + padded-slice + rare
    full-sort-fallback tie rule as the row helper."""
    import numpy as _np

    nr, m = cos.shape
    kk = min(kk, nr)
    neg = -cos
    pad = min(nr, kk + 8)
    if kk <= 0 or m == 0 or pad >= nr:
        return _np.argsort(neg, axis=0, kind="stable")[:kk]
    part = _np.argpartition(neg, pad - 1, axis=0)[:pad]
    part.sort(axis=0)  # ascending row index → id-stable ties
    pv = _np.take_along_axis(neg, part, axis=0)
    o2 = _np.argsort(pv, axis=0, kind="stable")
    pvs = _np.take_along_axis(pv, o2, axis=0)
    order = _np.take_along_axis(part, o2[:kk], axis=0)
    # NaN-safe boundary check: `~(a < b)`, same rule as the row
    # helper (NaN in either position → exact full-sort fallback)
    unsafe = _np.flatnonzero(~(pvs[kk - 1] < pvs[pad - 1]))
    if unsafe.size:
        order[:, unsafe] = _np.argsort(
            neg[:, unsafe], axis=0, kind="stable"
        )[:kk]
    return order

#: the kNN-graph oracle's CTE chain (derived-geometry codebook →
#: multi-probe pair set → symmetrized edges → per-vector ranking),
#: shared VERBATIM by the similarity_knn_graph oracle and the
#: dq_knn_recall_eval harness so the two can never drift apart.
SQL_KNN_GRAPH_CTES = f"""{{IVF_CTES}},
    probes AS (
        SELECT vec_id, c_label FROM assigned WHERE crank <= {KNN_PROBES}
    ),
    edges AS (
        SELECT p.vec_id, b.vec_id AS neighbor_id,
               {sql_dot("qn.qv", "b.qv")}::DOUBLE / (qn.nrm * b.nrm)
                   AS cos
        FROM probes p
        JOIN lists b
          ON b.c_label = p.c_label AND b.vec_id <> p.vec_id
        JOIN n qn ON qn.vec_id = p.vec_id
    ),
    sym AS (
        SELECT vec_id, neighbor_id, max(cos) AS cos FROM (
            SELECT vec_id, neighbor_id, cos FROM edges
            UNION ALL
            SELECT neighbor_id AS vec_id, vec_id AS neighbor_id, cos
            FROM edges
        ) GROUP BY vec_id, neighbor_id
    ),
    rk AS (
        SELECT vec_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, neighbor_id)
                   AS rank
        FROM sym
    )""".replace("{IVF_CTES}", sql_ivf_cell_ctes(IVF_AUTO_BITS_SF001))


@query(
    "similarity_knn_graph",
    oracle=f"""
    -- multi-probe cell-restricted kNN graph: every vector's top-{KNN_K}
    -- exact cosine neighbors within the SYMMETRIZED probe pair set
    -- (q scores cell members; each scored pair also counts in the
    -- reverse direction — cosine is symmetric, so the reverse edge
    -- is free), at the DERIVED √n cell geometry
    -- ({IVF_AUTO_BITS_SF001} seed bits at the sf0.01 fixture — the
    -- same derived codebook as similarity_ivf_autocells, pinned by
    -- the sync-guard test) — the graph SemDeDup-style semantic
    -- filtering and connectivity-based curation consume.
    WITH {SQL_KNN_GRAPH_CTES}
    SELECT vec_id, neighbor_id, round(cos, 6) AS cos_sim, rank
    FROM rk WHERE rank <= {KNN_K}
    """,
)
def similarity_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN GRAPH construction — every vector's top-{KNN_K} exact-cosine
    neighbors within the SYMMETRIZED multi-probe pair set, the
    all-vectors sibling of the query-set ANN entries: semantic-dedup
    clustering, graph-based curation (connectivity filtering, label
    propagation over embeddings), and diversity sampling all start
    from this edge list. Cell restriction is what makes an n-vector
    graph buildable (exact all-pairs is n² and unshippable at
    100 TB); MULTI-PROBE assignment (``keep_ranks={KNN_PROBES}``)
    recovers the cross-cell near-neighbors single-cell restriction
    misses by construction — a vector sitting on a cell boundary
    also scores the members of its runner-up cell — and
    SYMMETRIZATION (VERDICT r11 item 2) recovers the rest of them
    for free: every scored (q, v) pair is also a candidate for v
    (cosine is symmetric — the reverse edge costs zero extra gram
    work and leaves the candidate-pair count unchanged), which lifts
    fixture recall 0.609 → 0.807 because probing is NOT symmetric —
    v may not probe q's home cell even when q probes v's. The kernel
    emits per-cell top-{KNN_K} in BOTH gram directions (per prober
    row over members, per member column over probers), which keeps
    the per-cell cut lossless against the untruncated symmetrized
    oracle: any cut candidate is dominated by ≥{KNN_K} candidates
    that are themselves in the final candidate set, under the same
    (cos desc, id asc) order. Recall vs the exact graph is pinned in
    tests/test_ann_recall.py.

    Scale shape (VERDICT r10 item 1 closed): the cell count is
    DERIVED ≈ √n from the corpus itself (``auto_seed_bits``, the
    memoized derivation shared with ``similarity_ivf_autocells``;
    the oracle bakes the fixture's derived {IVF_AUTO_BITS_SF001}
    bits, guarded by the sync test), so registered pair work is
    n·{KNN_PROBES}·√n — sub-quadratic by construction, where the r9
    pinned 10-cell dial made it ~0.4·n². One cell-assignment pass
    (broadcast √n-row codebook, each vector emitting its
    top-{KNN_PROBES} cells), then one shuffle on the cell id groups
    members and probe rows together. Inside each cell the gram
    matrix is
    computed in ≤{KNN_GRAM_BLOCK_ELEMS}-element ROW BLOCKS, so a
    hot cell costs bounded memory per task instead of O(m²) (the
    r9-flagged OOM-at-skew risk); per-cell top-{KNN_K} lists then
    merge to the global top-{KNN_K} in a per-vector window whose
    input is ≤ {KNN_PROBES}·{KNN_K} rows per vector."""
    emb = read_table(spark, sf_dir, "embeddings")
    assigned = ivf_assign(
        emb,
        auto_seed_bits(spark, sf_dir),
        keep_ranks=KNN_PROBES,
        memo_path=_emb_path(sf_dir),
    )

    # per-cell matmul kernel instead of a within-cell self-join: the
    # join materializes the pair rows EACH CARRYING both 64-int
    # vectors (~GBs at sf0.1); grouping by cell and doing blocked
    # integer gram matrices per group keeps every vector in memory
    # once and emits only the top-K edge rows. Exactness: int64
    # matmul + one IEEE divide are the oracle's ops; ties break to
    # the lowest neighbor id via a stable argsort over id-sorted
    # member columns, and the per-cell top-K cut is lossless for the
    # global top-K (a candidate's rank within one cell never exceeds
    # its rank across the probed union).
    _block_acc = KNN_BLOCK_ACC  # captured at construction (test hook)

    def cell_knn(pdf):
        import numpy as _np
        import pandas as _pd

        empty = _pd.DataFrame(
            {
                "vec_id": _np.array([], dtype=_np.int64),
                "neighbor_id": _np.array([], dtype=_np.int64),
                "cos": _np.array([], dtype=_np.float64),
            }
        )
        # probe rows sorted by vec_id: the COLUMN-direction top-kk
        # below breaks ties to the lowest prober id via stable sorts,
        # which needs id-ordered rows (members were already sorted)
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        members = (
            pdf[pdf["crank"] == 1]
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        m = len(members)
        if m == 0 or len(pdf) < 2:
            return empty
        xm = _np.stack(members["qv"].values).astype(_np.int64, copy=False)
        nm = members["nrm"].to_numpy(dtype=_np.float64)
        mids = members["vec_id"].to_numpy()
        xq = _np.stack(pdf["qv"].values).astype(_np.int64, copy=False)
        nq = pdf["nrm"].to_numpy(dtype=_np.float64)
        qids = pdf["vec_id"].to_numpy()
        kk = min(KNN_K, m)
        kk_c = min(KNN_K, len(pdf))
        block = max(1, KNN_GRAM_BLOCK_ELEMS // m)
        xm_absmax = _np.abs(xm).max(initial=0)  # loop-invariant bound
        if _block_acc is not None:
            _block_acc.add((len(pdf) + block - 1) // block)
        # running COLUMN-direction bests (member → best probers):
        # the reverse half of the symmetrized edge set. Kept as a
        # (kk_c × m) rolling top-k merged across row blocks so the
        # hot-cell memory bound is unchanged; ids for empty slots are
        # int64-max so the id-ordered tie-break never picks them.
        col_vals = _np.full((kk_c, m), -_np.inf)
        col_ids = _np.full((kk_c, m), _np.iinfo(_np.int64).max, dtype=_np.int64)
        out = []
        for lo in range(0, len(pdf), block):
            hi = min(lo + block, len(pdf))
            # f64 BLAS gram (exactness-checked) — int64 matmul gets
            # no BLAS; bit-identical within the asserted envelope
            cos = _gram_int_exact(xq[lo:hi], xm.T, b_absmax=xm_absmax) / (
                nq[lo:hi, None] * nm[None, :]
            )
            cos[mids[None, :] == qids[lo:hi, None]] = -_np.inf  # self
            # row direction: per prober, top-kk members (ties → lowest
            # member id: member columns are id-sorted + the helper's
            # index-stable selection — argpartition, not a full sort)
            rows, cols = _topk_cols_stable(cos, kk)
            out.append(
                _pd.DataFrame(
                    {
                        "vec_id": qids[lo:hi][rows],
                        "neighbor_id": mids[cols],
                        "cos": cos[rows, cols],
                    }
                )
            )
            # column direction: this block's per-member top-kk_c
            # probers (rows are id-sorted + stable sort → lowest
            # prober id wins ties), merged into the running bests
            oc = _topk_rows_idx(cos, kk_c)
            bv = _np.take_along_axis(cos, oc, axis=0)
            bi = qids[lo:hi][oc]
            vcat = _np.vstack([col_vals, bv])
            icat = _np.vstack([col_ids, bi])
            # select top kk_c by (cos desc, prober id asc): sort by id
            # first, then a stable sort on -cos keeps the lowest id
            # among ties — block-invariant, so forcing tiny blocks
            # reproduces the default output bit-for-bit
            o1 = _np.argsort(icat, axis=0, kind="stable")
            v2 = _np.take_along_axis(vcat, o1, axis=0)
            i2 = _np.take_along_axis(icat, o1, axis=0)
            o2 = _np.argsort(-v2, axis=0, kind="stable")[:kk_c]
            col_vals = _np.take_along_axis(v2, o2, axis=0)
            col_ids = _np.take_along_axis(i2, o2, axis=0)
        ckeep = col_vals > -_np.inf
        ccols = _np.tile(_np.arange(m), (kk_c, 1))
        out.append(
            _pd.DataFrame(
                {
                    "vec_id": mids[ccols[ckeep]],
                    "neighbor_id": col_ids[ckeep],
                    "cos": col_vals[ckeep],
                }
            )
        )
        return _pd.concat(out, ignore_index=True) if out else empty

    per_cell = (
        assigned.select("vec_id", "qv", "nrm", "c_label", "crank")
        .groupBy("c_label")
        .applyInPandas(
            cell_knn,
            schema="vec_id long, neighbor_id long, cos double",
        )
    )
    # merge the per-cell lists per vector — ≤ KNN_PROBES·KNN_K rows
    # from the probe (row) direction plus KNN_K from the reverse
    # (column) direction, never bounded by cell size. A directed pair
    # can arrive from BOTH directions (q probes v's home cell AND v
    # probes back), with bitwise-identical cos (same gram entry /
    # same IEEE ops), so dedupe by max before ranking — matching the
    # oracle's sym CTE exactly.
    dedup = per_cell.groupBy("vec_id", "neighbor_id").agg(
        F.max("cos").alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            "vec_id",
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
            "rank",
        )
    )


def _sql_knn_recall_oracle(sample_den: int | None = None) -> str:
    """The kNN-recall-eval oracle, parameterized on the sampled-eval
    denominator so the full entry and its ``_sampled`` sibling share
    one SQL body and can never drift. The predicate lands on the
    EXACT side's query vectors and the graph side's ``vec_id`` —
    both pre-rank partition-key filters, so filtering before or
    after the per-vector top-{KNN_K} ranking is equivalent (exactly
    the shape the Spark sampled path produces)."""
    samp_e = (
        ""
        if sample_den is None
        else f"\n        WHERE {sql_eval_sample_pred('a.vec_id', sample_den)}"
    )
    samp_g = (
        ""
        if sample_den is None
        else f"\n                AND {sql_eval_sample_pred('vec_id', sample_den)}"
    )
    return f"""
    -- kNN-GRAPH EVALUATION: recall of the symmetrized multi-probe
    -- graph vs the exact all-pairs top-{KNN_K} graph, measured on the
    -- corpus itself — the number the KNN_PROBES dial (and the r12
    -- symmetrization) is tuned against.
    WITH {SQL_KNN_GRAPH_CTES},
    graph AS (SELECT vec_id, neighbor_id FROM rk
              WHERE rank <= {KNN_K}{samp_g}),
    expairs AS (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {sql_dot("a.qv", "b.qv")}::DOUBLE
                            / (a.nrm * b.nrm) DESC,
                       b.vec_id) AS rank
        FROM n a JOIN n b ON b.vec_id <> a.vec_id{samp_e}
    ),
    ex AS (SELECT vec_id, neighbor_id FROM expairs
           WHERE rank <= {KNN_K}),
    m AS (
        SELECT (SELECT count(DISTINCT vec_id) FROM ex)::BIGINT
                   AS n_vectors,
               (SELECT count(*) FROM ex)::BIGINT AS exact_edges,
               (SELECT count(*) FROM graph)::BIGINT AS graph_edges,
               (SELECT count(*) FROM ex
                JOIN graph USING (vec_id, neighbor_id))::BIGINT AS hits
    )
    SELECT n_vectors, exact_edges, graph_edges, hits,
           round(hits::DOUBLE / NULLIF(exact_edges, 0), 6)
               AS graph_recall
    FROM m
    """


@query("dq_knn_recall_eval", oracle=_sql_knn_recall_oracle())
def dq_knn_recall_eval(
    spark: SparkSession, sf_dir: str, eval_sample_den: int | None = None
) -> DataFrame:
    """kNN-GRAPH EVALUATION harness (fourth of the eval family):
    recall of the registered symmetrized multi-probe graph vs the
    exact all-pairs top-{KNN_K} graph, as one hash-verified row —
    the measurement behind the r12 symmetrization story (fixture
    recall 0.609 → 0.807 at unchanged pair work) now lives in the
    driver contract instead of only a pytest floor. The graph side
    is the registered kernel unchanged.

    Scale (VERDICT r12 item 3 — now a code path, not a docstring):
    the exact side is n² over the corpus, so at 100 TB pass
    ``eval_sample_den`` and recall is measured over the ~1/den
    deterministic md5-sampled subset of vectors
    (``eval_sample_pred``). The sampled exact side switches SHAPE:
    instead of the broadcast-corpus gram (bounded by
    EVAL_FULL_EXACT_CAP — right at fixture scale, wrong at 100 TB),
    the collected
    sample matrix (bounded by EVAL_SAMPLE_CAP) streams the full
    candidate set through mapInPandas — per-Arrow-batch partial
    top-k grams, then one global per-query top-k window over the
    small partials — the distributed |sample| × n plan that ships at
    any corpus size with memory bounded by (sample × batch); the
    gram's int64-dot / IEEE-divide / id-stable-tie arithmetic is
    reproduced exactly, so sampled rows are bitwise-comparable to
    full rows over the shared subset. The
    graph side filters to the same sampled vec_ids (a pushable
    narrow predicate — the production kernel is unchanged). Sampled
    recall is an unbiased estimate of the full number; the fixture
    test pins |sampled − full| ≤ ε and the 120 K-vector smoke pins
    that eval cost tracks the SAMPLE, not the corpus. Default
    None = full corpus via the gram, so the registered oracle row
    is unchanged."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", qvec_of(F.col("embedding")).alias("qv")
    ).filter(F.col("qv").isNotNull())
    n = q.select("vec_id", "qv", norm(F.col("qv")).alias("nrm"))

    # exact side (full path): a DISTRIBUTED blocked integer gram via
    # _gram_int_exact (exactness-checked float64 BLAS, int64 fallback
    # outside the 2^53 envelope) + _topk_cols_stable (argpartition
    # with the id-stable tie rule) — bit-identical to the oracle's
    # relational dot + IEEE divide, while ~40× cheaper than spelling
    # the 64-term dot per pair in codegen (measured 35 s → <2 s at
    # sf0.1's 2 000 vectors / 4 M pairs, VERDICT r13 item 1).
    if eval_sample_den is None:
        # VERDICT r15 item 3: the former one-group applyInPandas gram
        # was a SINGLE ~0.5 s numpy task, and a single-task stage is
        # maximally exposed to per-core throttling — the r15
        # adjudication measured the same stage at [1.55, 22.5, 0.76] s
        # on consecutive identical runs. Now the id-sorted corpus
        # matrix rides a broadcast (a bounded model artifact, memoized
        # per path like the IVF codebook) while query rows stream
        # through mapInPandas over a hash repartition, so the stage
        # averages over cores like the graph side does. Per query row
        # the arithmetic is unchanged — same gram against the same
        # id-sorted corpus columns, same self-mask, same argpartition
        # top-k — so the output SET is bit-identical to the one-group
        # form (each row's neighbors never depended on which batch the
        # row sat in). The full exact side stays fixture-scale by
        # contract (n² pair work; the 100 TB shape is eval_sample_den)
        # and the collect cap makes that contract loud, not an OOM.
        def _corpus_matrix():
            rows = n.collect()
            if len(rows) > EVAL_FULL_EXACT_CAP:
                raise ValueError(
                    f"dq_knn_recall_eval: full exact side collected "
                    f"{len(rows)} vectors (cap {EVAL_FULL_EXACT_CAP}) — "
                    "the all-pairs exact graph is fixture-scale only; "
                    "pass eval_sample_den for the sampled shape that "
                    "ships at scale"
                )
            if len(rows) < 2:
                return None
            ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
            o = np.argsort(ids, kind="stable")
            return spark.sparkContext.broadcast(
                (
                    ids[o],
                    np.stack([rows[i]["qv"] for i in o]).astype(np.int64),
                    np.array(
                        [rows[i]["nrm"] for i in o], dtype=np.float64
                    ),
                )
            )

        bc_full = memo_per_path(
            spark,
            "knn_eval_full_corpus",
            _emb_path(sf_dir),
            _corpus_matrix,
            on_evict=lambda old: (
                old.unpersist(blocking=False) if old is not None else None
            ),
        )
        if bc_full is None:
            # degenerate corpus (< 2 vectors): no exact edges, same
            # contract as the old one-group kernel's m < 2 guard
            exact = spark.createDataFrame(
                [], "vec_id long, neighbor_id long"
            )
        else:

            def exact_full(batches):
                import numpy as _np
                import pandas as _pd

                c_ids, c_mat, c_nrm = bc_full.value
                m = c_ids.shape[0]
                kk = min(KNN_K, m - 1)
                c_absmax = _np.abs(c_mat).max(initial=0)  # invariant
                for pdf in batches:
                    if not len(pdf):
                        continue
                    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
                    x = _np.stack(pdf["qv"].values).astype(
                        _np.int64, copy=False
                    )
                    nrm = pdf["nrm"].to_numpy(dtype=_np.float64)
                    ids = pdf["vec_id"].to_numpy()
                    block = max(1, KNN_GRAM_BLOCK_ELEMS // m)
                    for lo in range(0, len(pdf), block):
                        hi = min(lo + block, len(pdf))
                        cos = _gram_int_exact(
                            x[lo:hi], c_mat.T, b_absmax=c_absmax
                        ) / (nrm[lo:hi, None] * c_nrm[None, :])
                        cos[c_ids[None, :] == ids[lo:hi, None]] = -_np.inf
                        rows_i, cols_i = _topk_cols_stable(cos, kk)
                        yield _pd.DataFrame(
                            {
                                "vec_id": ids[lo:hi][rows_i],
                                "neighbor_id": c_ids[cols_i],
                            }
                        )

            exact = n.repartition("vec_id").mapInPandas(
                exact_full, schema="vec_id long, neighbor_id long"
            )
        graph = similarity_knn_graph(spark, sf_dir).select(
            "vec_id", "neighbor_id"
        )
    else:
        # sampled exact side: |sample| × n, MAP-SIDE — the shape that
        # ships at 100 TB. The sampled query matrix is a bounded
        # model artifact (collected under EVAL_SAMPLE_CAP, the same
        # contract as the IVF codebook); candidates STREAM through
        # mapInPandas in Arrow batches, each batch emitting a partial
        # per-query top-k from one int64 gram; a final per-query
        # window over the small partials (≤ k · n_batches rows per
        # query) produces the global top-k. Per-batch ties break
        # (cos desc, id asc) after an id-sort of the batch, so a
        # boundary tie dropped in-batch is always dominated by k
        # kept lower-id equals — the global top-k never needs it.
        pred = eval_sample_pred(F.col("vec_id"), eval_sample_den)

        def _sample_matrix():
            qrows = n.filter(pred).collect()
            if len(qrows) > EVAL_SAMPLE_CAP:
                # name the dial AND its minimal workable value: the
                # sample is ~n/den, so den must grow with the corpus
                # (the REGISTERED _sampled sibling pins den=4 for the
                # fixture-scale hash gate; production corpora past
                # ~den·cap vectors call the base harness with a
                # corpus-sized den — r14 review)
                need = -(-len(qrows) * int(eval_sample_den) // EVAL_SAMPLE_CAP)
                raise ValueError(
                    f"dq_knn_recall_eval: eval_sample_den={eval_sample_den} "
                    f"keeps {len(qrows)} query vectors (cap {EVAL_SAMPLE_CAP})"
                    f" — use eval_sample_den >= {need}; the sample is a"
                    " broadcast model artifact and must stay bounded"
                )
            if not qrows:
                return None
            # explicit broadcast (ADVICE r13): the cap-sized sample
            # matrix (~32 MB at EVAL_SAMPLE_CAP) ships once per
            # EXECUTOR via the torrent broadcast and is dereferenced
            # inside the generator — not captured in the closure,
            # which would re-ship it with every serialized task
            return spark.sparkContext.broadcast(
                (
                    np.array([r["vec_id"] for r in qrows], dtype=np.int64),
                    np.stack([r["qv"] for r in qrows]).astype(np.int64),
                    np.array([r["nrm"] for r in qrows], dtype=np.float64),
                )
            )

        # the collected sample is a per-(path, den) model artifact —
        # memoized like the IVF codebook and the embedding-cosine
        # candidate matrix, so a REGISTERED sampled entry constructs
        # jobless after first touch (a raise is NOT memoized; the
        # over-cap guard re-raises on every construction)
        bc_q = memo_per_path(
            spark,
            f"knn_eval_sample_den{eval_sample_den}",
            _emb_path(sf_dir),
            _sample_matrix,
            on_evict=lambda old: (
                old.unpersist(blocking=False) if old is not None else None
            ),
        )
        if bc_q is None:
            # degenerate sample (den larger than any md5 bucket
            # hits): same contract as the empty-corpus guard —
            # counts 0, recall NULL, never a driver exception (the
            # ANN sibling degrades the same way via its coalesces)
            empty = spark.createDataFrame(
                [], "vec_id long, neighbor_id long"
            )
            exact, graph = empty, empty
        else:

            def exact_partials(batches):
                import numpy as _np
                import pandas as _pd

                q_ids, q_mat, q_nrm = bc_q.value
                q_absmax = _np.abs(q_mat).max(initial=0)  # batch-invariant
                for pdf in batches:
                    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
                    m = len(pdf)
                    if m == 0:
                        continue
                    c = _np.stack(pdf["qv"].values).astype(_np.int64, copy=False)
                    c_nrm = pdf["nrm"].to_numpy(dtype=_np.float64)
                    c_ids = pdf["vec_id"].to_numpy()
                    # (n_queries, batch) cosine gram (f64 BLAS,
                    # exactness-checked), self masked; argpartition
                    # top-k — same r13-regression fix as the full path
                    cos = _gram_int_exact(q_mat, c.T, a_absmax=q_absmax) / (
                        q_nrm[:, None] * c_nrm[None, :]
                    )
                    cos[q_ids[:, None] == c_ids[None, :]] = -_np.inf
                    kk = min(KNN_K, m)
                    rows, cols = _topk_cols_stable(cos, kk)
                    yield _pd.DataFrame(
                        {
                            "vec_id": q_ids[rows],
                            "neighbor_id": c_ids[cols],
                            "cos_ex": cos[rows, cols],
                        }
                    )

            partials = n.mapInPandas(
                exact_partials,
                schema="vec_id long, neighbor_id long, cos_ex double",
            )
            w = Window.partitionBy("vec_id").orderBy(
                F.desc("cos_ex"), F.asc("neighbor_id")
            )
            exact = (
                partials.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= KNN_K)
                .select("vec_id", "neighbor_id")
            )
            graph = (
                similarity_knn_graph(spark, sf_dir)
                .filter(pred)
                .select("vec_id", "neighbor_id")
            )
    tagged = exact.select(
        "vec_id",
        "neighbor_id",
        F.lit(1).alias("in_exact"),
        F.lit(0).alias("in_graph"),
    ).unionByName(
        graph.select(
            "vec_id",
            "neighbor_id",
            F.lit(0).alias("in_exact"),
            F.lit(1).alias("in_graph"),
        )
    )
    pairs = tagged.groupBy("vec_id", "neighbor_id").agg(
        F.max("in_exact").alias("e"), F.max("in_graph").alias("g")
    )
    counts = pairs.agg(
        F.count_distinct(
            F.when(F.col("e") == 1, F.col("vec_id"))
        ).alias("n_vectors"),
        F.coalesce(F.sum("e"), F.lit(0)).alias("exact_edges"),
        F.coalesce(F.sum("g"), F.lit(0)).alias("graph_edges"),
        F.coalesce(F.sum(F.col("e") * F.col("g")), F.lit(0)).alias("hits"),
    )
    return counts.select(
        "n_vectors",
        "exact_edges",
        "graph_edges",
        "hits",
        F.round(
            F.col("hits").cast("double")
            / F.when(F.col("exact_edges") > 0, F.col("exact_edges")),
            6,
        ).alias("graph_recall"),
    )


@query(
    "dq_knn_recall_eval_sampled",
    oracle=_sql_knn_recall_oracle(EVAL_SAMPLE_DEN_REGISTERED),
)
def dq_knn_recall_eval_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED kNN-recall eval as a driver-checked entry
    (VERDICT r13 item 2): at 100 TB the shape that ships is the
    ``eval_sample_den`` one — collected-sample query matrix
    broadcast into a distributed |sample| × n mapInPandas stream,
    NOT the broadcast-corpus gram — so the rotation should hash-verify that
    plan every cycle, not only a pytest path. Denominator pinned at
    {EVAL_SAMPLE_DEN_REGISTERED} (~1/4 of vectors); the md5-bucket
    predicate is deterministic and SQL-expressible, so this sibling
    carries the same FULL DuckDB oracle as the fixture-scale entry,
    just predicate-filtered on both sides. The full-corpus form
    stays registered as the cross-check.

    The PINNED den verifies the sampled PLAN SHAPE at fixture scale
    (the oracle must inline a literal denominator); it is not the
    production dial — past ~den·EVAL_SAMPLE_CAP vectors this entry's
    cap guard trips by design (naming the minimal workable den) and
    a real deployment calls the base harness with a corpus-sized
    ``eval_sample_den``."""
    return dq_knn_recall_eval(
        spark, sf_dir, eval_sample_den=EVAL_SAMPLE_DEN_REGISTERED
    )
