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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.functions.vectors import (
    SQL_QVEC,
    dot_long,
    norm,
    qvec_of,
    sql_dot,
    sql_norm,
)
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

TOP_K = 5
QUERY_STRIDE = 53  # vec_id % 53 == 0 → ~10 query vectors at sf0.01

N_PLANES = 8
DIM = 64


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
SQL_IVF_CELL_CTES = f"""q AS (SELECT vec_id, label, {SQL_QVEC} AS qv FROM embeddings),
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
    return ivf_topk(emb)


def ivf_assign(emb: DataFrame, seed_bits: int = 0) -> DataFrame:
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

    Returns ``(vec_id, qv, nrm, c_label, c_cos, crank)`` — crank 1 is
    the vector's cell (the ``lists`` CTE of ``SQL_IVF_CELL_CTES``);
    crank ≤ n_probe is its probe set. Shared by ``ivf_topk`` (ANN)
    and ``dedup_semantic_cells`` (SemDeDup).

    Scale: assignment is n × cells broadcast-map work (the codebook
    broadcasts — it is √n rows of DIM ints); with √n cells the
    downstream inverted-list ops are the classic n·√n cost instead of
    n²; more Lloyd rounds would chain the same two DataFrame blocks."""
    q = emb.select(
        "vec_id", "label", qvec_of(F.col("embedding")).alias("qv")
    ).filter(F.col("qv").isNotNull())
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
    wc = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_label"))

    def assign(cent: DataFrame) -> DataFrame:
        aff = n.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "qv",
            "nrm",
            "c_label",
            (
                dot_long(F.col("qv"), F.col("cq")).cast("double")
                / (F.col("nrm") * norm(F.col("cq")))
            ).alias("c_cos"),
        )
        return aff.withColumn("crank", F.row_number().over(wc))

    # seed codebook: per-label integer sums; one Lloyd refinement:
    # nearest-seed assignment → recompute centroids per assigned cell
    cent0 = centroids(q, "label")
    cells = assign(cent0).filter(F.col("crank") == 1).select("vec_id", "qv", "c_label")
    cent1 = centroids(cells, "c_label")
    return assign(cent1)


def ivf_topk(
    emb: DataFrame,
    seed_bits: int = 0,
    n_probe: int = N_PROBE,
    query_stride: int = QUERY_STRIDE,
    top_k: int = TOP_K,
) -> DataFrame:
    """ANN top-k over a (vec_id, label, embedding) DataFrame, IVF
    shape: ``ivf_assign`` codebook → inverted lists → probe the
    n_probe nearest lists → exact re-rank. The parameterized kernel
    behind similarity_ivf_probe.

    Scale: a query probes n_probe/cells of the corpus; the probe join
    shuffles on the centroid id (bounded, near-uniform after the
    Lloyd refinement)."""
    assigned = ivf_assign(emb, seed_bits)
    lists = assigned.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("candidate_id"),
        F.col("qv").alias("c_qv"),
        F.col("nrm").alias("c_nrm"),
        "c_label",
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
    planes = F.array(
        *[
            F.array(*[F.lit(w).cast("long") for w in row])
            for row in PLANES[:n_planes]
        ]
    )
    powers = F.array(*[F.lit(1 << p).cast("long") for p in range(n_planes)])
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


_SQL_BUCKET = f"""list_sum(list_transform(generate_series(1, {N_PLANES}),
    p -> CASE WHEN list_sum(list_transform(generate_series(1, {DIM}),
                  d -> qv[d] * ({_SQL_PLANES})[p][d])) >= 0
              THEN (1::BIGINT << (p - 1)) ELSE 0::BIGINT END))::BIGINT"""


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
    return semantic_dedup_cells(emb)


def semantic_dedup_cells(
    emb: DataFrame, seed_bits: int = 0, tau: float = SEMANTIC_DUP_TAU
) -> DataFrame:
    """The parameterized kernel behind ``dedup_semantic_cells``:
    ``seed_bits`` sizes the codebook (cells = labels × 2^seed_bits ≈
    √n — within-cell pair work is then n·√n total), ``tau`` is the
    duplicate bar."""
    assigned = ivf_assign(emb, seed_bits)
    # materialize the cell assignment ONCE: it feeds three consumers
    # (both self-join sides + the cell-size aggregate), and without the
    # cut Catalyst replays the whole two-phase codebook build per
    # consumer (audited 28 exchanges → 4). Same lineage-cut precedent
    # as label_propagate_components; production would persist the
    # assignment as a table the ANN index also reads.
    lists = (
        assigned.filter(F.col("crank") == 1)
        .select("vec_id", "qv", "nrm", "c_label")
        .localCheckpoint(eager=True)
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
