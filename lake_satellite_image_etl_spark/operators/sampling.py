"""Deterministic sampling operators — the training-data-pipeline
trio: reproducible subsampling, train/val/test splitting, and
label-balanced downsampling.

``sample()``/``rand()`` are the WRONG tool for corpus work at scale:
re-runs, retries, and engine changes all reshuffle the sample, so
lineage breaks. The production pattern is *hash-based* sampling — a
row's fate is a pure function of its stable key (here the md5-derived
60-bit hash, portable across engines), which makes samples
reproducible, composable (a 10% sample of an 80% split is stable),
and shardable with zero coordination. Every operator below is a
narrow scan-speed map stage with a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.functions.text import (
    _sql_key_hash,  # noqa: F401 — re-export; DuckDB twin of tok_hash60,
    # defined beside it in the leaf text module (r15: breaks the
    # sampling → dedup → similarity → sampling import cycle that a
    # decorator-time oracle build would otherwise hit)
    tok_hash60,
)
from lake_satellite_image_etl_spark.operators.dedup import (
    sql_minhash_pair_ctes,
)
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

SAMPLE_PCT = 10
TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test
BALANCED_N = 50


@query(
    "sample_deterministic",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_sql_key_hash("doc_id")} % 100 < {SAMPLE_PCT}
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~{SAMPLE_PCT}% reproducible sample keyed on doc_id: membership
    is hash(key) mod 100 — stable across runs, engines, partitionings,
    and cluster sizes; the filter is a pushable narrow predicate."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(
        tok_hash60(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT
    ).select("doc_id", "source", "n_chars")


@query(
    "sample_train_test_split",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, {_sql_key_hash("doc_id")} % 100 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{TRAIN_PCT}/{VAL_PCT}/{100 - TRAIN_PCT - VAL_PCT} train/val/test
    assignment from the same hash buckets — every document lands in
    exactly one split, forever, on any engine; downstream jobs filter
    on the split column (or recompute the bucket — same answer)."""
    docs = read_table(spark, sf_dir, "documents")
    bucket = tok_hash60(F.col("doc_id").cast("string")) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "sample_cluster_safe_split",
    oracle=f"""
    -- LEAKAGE-FREE train/val/test split: the split bucket hashes the
    -- near-dup CLUSTER id, not the document id, so no near-duplicate
    -- pair ever straddles train and eval (the doc-hash split
    -- sample_train_test_split puts ~{100 - TRAIN_PCT}% of each
    -- cluster's members into eval — training-set leakage into the
    -- benchmark, the decontamination failure cluster-aware splitting
    -- exists to prevent). Same recursive-closure components as
    -- dedup_cluster_assign; singletons are their own cluster.
    WITH RECURSIVE {{PAIR_CTES}},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM dup_pairs
    ),
    reach(v, u) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u
    ),
    comp AS (SELECT v AS doc_id, min(u) AS cluster_id FROM reach GROUP BY v),
    lab AS (
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           CASE WHEN {_sql_key_hash("cluster_id")} % 100 < {TRAIN_PCT}
                    THEN 'train'
                WHEN {_sql_key_hash("cluster_id")} % 100
                         < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM lab
    """.replace("{PAIR_CTES}", sql_minhash_pair_ctes("documents")),
)
def sample_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-AWARE {TRAIN_PCT}/{VAL_PCT}/{100 - TRAIN_PCT - VAL_PCT}
    split — the decontaminated form of ``sample_train_test_split``:
    the hash bucket keys on the near-dup CLUSTER id, so a document
    and its near-duplicates always land in the SAME split and the
    eval set cannot contain paraphrases of training documents (the
    leakage class document-level splitting cannot prevent — a real
    LLM-pipeline failure mode, cf. decontamination practice in
    Gopher/GPT-3 appendix analyses). Deterministic forever on any
    engine, same hash contract as the flat split.

    Scale: components from the bucketed MinHash graph (never
    all-pairs), one left join onto the corpus (the cluster side is
    sparse), then a narrow hash projection — the split itself adds
    no shuffle beyond the cluster assignment it reuses."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        dedup_cluster_assign,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    comp = dedup_cluster_assign(spark, sf_dir)
    lab = docs.join(comp, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )
    bucket = tok_hash60(F.col("cluster_id").cast("string")) % 100
    return lab.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "sample_balanced_downsample",
    oracle=f"""
    WITH ranked AS (
        SELECT vec_id, label,
               row_number() OVER (
                   PARTITION BY label
                   ORDER BY {_sql_key_hash("vec_id")}, vec_id) AS rn
        FROM embeddings
    )
    SELECT vec_id, label FROM ranked WHERE rn <= {BALANCED_N}
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balanced downsample: at most {BALANCED_N} rows per label,
    chosen by hash order (a deterministic 'random' draw). One shuffle
    on label; at 100 TB with few labels, salt the row_number pass or
    take per-partition partial top-N first — the hash order makes
    either refinement produce the same final set."""
    emb = read_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        tok_hash60(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BALANCED_N)
        .select("vec_id", "label")
    )


#: mixture weights in quarter-units: a source's target epoch rate is
#: weight = w_num/4 with w_num = 1 + (hash(source) % 8) ∈ [1, 8], so
#: rates span 0.25×-2.0× — downsampling AND upsampling in one rule.
#: md5-derived like every sampling key here: deterministic, portable,
#: and documentable; a production run replaces the hash with a real
#: per-source weight table (broadcast join instead of the hash — the
#: plan shape is identical).
MIX_QUARTER_UNITS = 4


@query(
    "corpus_mix_weighted",
    oracle=f"""
    -- weighted corpus mixing: each document is emitted
    -- floor(weight) times plus one more iff its own hash falls under
    -- the fractional remainder — exact integer arithmetic in
    -- quarter-units, so expected per-source volume is weight × docs
    -- with zero randomness. epoch numbers the repeats (the
    -- upsampling "pass" the copy belongs to).
    WITH w AS (
        SELECT doc_id, source, n_chars,
               1 + ({_sql_key_hash("source")} % 8) AS w_num,
               {_sql_key_hash("doc_id")} % {MIX_QUARTER_UNITS} AS frac_bucket
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_chars, w_num,
               (w_num // {MIX_QUARTER_UNITS})
                   + CASE WHEN frac_bucket < w_num % {MIX_QUARTER_UNITS}
                          THEN 1 ELSE 0 END AS n_copies
        FROM w
    )
    SELECT doc_id, source, n_chars,
           (w_num / {MIX_QUARTER_UNITS}.0) AS weight,
           unnest(generate_series(1, n_copies)) AS epoch
    FROM c
    WHERE n_copies > 0
    """,
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction — the per-source up/down-sampling
    step that turns N corpora plus a weight vector into one epoch
    stream: emit each document ``floor(weight)`` times, plus one more
    iff hash(doc_id) lands under the fractional remainder. With
    weights in exact quarter-units there is no randomness anywhere:
    per-source volume is exactly reproducible, re-runs and engines
    agree row-for-row, and a document's epoch membership never
    changes as the corpus around it grows (the property ``sample()``
    cannot give you).

    Plan: a narrow map stage (two hash computations, integer
    arithmetic) then ``posexplode(sequence(...))`` for the ≤2 copies —
    no shuffle; output volume is Σ weight_s × |source_s|. At 100 TB
    upsampling inflates bytes exactly as configured and downsampled
    rows are dropped BEFORE the explode, pushable to the scan."""
    docs = read_table(spark, sf_dir, "documents")
    w_num = 1 + (tok_hash60(F.col("source")) % 8)
    frac_bucket = tok_hash60(F.col("doc_id").cast("string")) % MIX_QUARTER_UNITS
    n_copies = (w_num / F.lit(MIX_QUARTER_UNITS)).cast("long") + F.when(
        frac_bucket < w_num % MIX_QUARTER_UNITS, 1
    ).otherwise(0)
    c = docs.select(
        "doc_id",
        "source",
        "n_chars",
        w_num.alias("w_num"),
        n_copies.alias("n_copies"),
    ).filter(F.col("n_copies") > 0)
    return c.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("w_num") / MIX_QUARTER_UNITS).alias("weight"),
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("epoch"),
    )


#: PPS sampling: inclusion probability = n_chars / PPS_UNIT (docs are
#: far below the unit, so p < 1 always holds on this corpus; the
#: operator still clamps defensively).
PPS_UNIT = 1024


@query(
    "sample_pps_weighted",
    oracle=f"""
    -- probability-proportional-to-size Poisson sampling with exact
    -- integer inclusion arithmetic: include a document iff
    -- hash(doc_id) mod {PPS_UNIT} < n_chars, i.e. p = n_chars/{PPS_UNIT}
    -- — long documents (more training tokens) are proportionally more
    -- likely to be drawn, and the Horvitz-Thompson weight 1/p makes
    -- any downstream sum over the sample an unbiased corpus estimate.
    SELECT doc_id, source, n_chars,
           round(least(n_chars, {PPS_UNIT}) / {PPS_UNIT}.0, 6)
               AS inclusion_prob,
           round({PPS_UNIT}.0 / least(n_chars, {PPS_UNIT}), 6) AS ht_weight
    FROM documents
    WHERE {_sql_key_hash("doc_id")} % {PPS_UNIT}
              < least(n_chars, {PPS_UNIT})
    """,
)
def sample_pps_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (probability-proportional-to-size) Poisson sampling —
    the survey-statistics draw a corpus-metrics job wants: each
    document enters the sample with probability proportional to its
    size (p = n_chars/{PPS_UNIT}), decided by EXACT integer arithmetic
    on its stable hash, never a float comparison, so every engine and
    every re-run draws the identical set. The emitted
    Horvitz-Thompson weight (1/p) turns sample sums into unbiased
    estimates of corpus totals.

    Plan: a narrow pushable filter (hash + integer compare) and two
    arithmetic columns — scan-speed, no shuffle, no coordination
    between rows; at 100 TB this is the cheapest possible sampling
    primitive and composes with the hash splits above (a PPS draw of
    the train split is stable too)."""
    docs = read_table(spark, sf_dir, "documents")
    sz = F.least(F.col("n_chars"), F.lit(PPS_UNIT))
    return (
        docs.filter(
            tok_hash60(F.col("doc_id").cast("string")) % PPS_UNIT < sz
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(sz / F.lit(float(PPS_UNIT)), 6).alias("inclusion_prob"),
            F.round(F.lit(float(PPS_UNIT)) / sz, 6).alias("ht_weight"),
        )
    )


#: stratified sampling: proportional allocation at this rate, with a
#: floor of one row per stratum so rare strata never vanish.
STRAT_PCT = 10


@query(
    "sample_stratified_exact",
    oracle=f"""
    -- exact proportional stratified sample: each source contributes
    -- EXACTLY greatest(1, floor(|stratum| * {STRAT_PCT}%)) rows,
    -- chosen by deterministic hash order within the stratum.
    WITH sized AS (
        SELECT doc_id, source, n_chars,
               count(*) OVER (PARTITION BY source) AS stratum_n,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_sql_key_hash("doc_id")}, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source, n_chars, stratum_n
    FROM sized
    WHERE rn <= greatest(1, stratum_n * {STRAT_PCT} // 100)
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling — every stratum (source) contributes
    exactly ⌊{STRAT_PCT}% · |stratum|⌋ rows (min 1), not the
    binomially-noisy count ``sampleBy`` gives: quota sampling is what
    evaluation-set construction and per-domain corpus caps actually
    require. Row choice is hash-ordered, so the drawn set is stable
    across runs, engines, and cluster layouts, and shrinking the rate
    yields a SUBSET of the larger sample (nested samples).

    Plan: one shuffle on source; the count and the row_number share
    the same window partitioning, so Catalyst plans a single exchange
    + sort. At 100 TB with few giant strata, replace the row_number
    with the decomposed rank used by corpus_quality_filter (count
    table + intra-bucket row_number) — the hash order makes both
    forms pick the identical set."""
    docs = read_table(spark, sf_dir, "documents")
    wn = Window.partitionBy("source")
    wr = Window.partitionBy("source").orderBy(
        tok_hash60(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    sized = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.count(F.lit(1)).over(wn).alias("stratum_n"),
        F.row_number().over(wr).alias("rn"),
    )
    quota = F.greatest(
        F.lit(1),
        F.floor(F.col("stratum_n") * STRAT_PCT / 100),
    )
    return sized.filter(F.col("rn") <= quota).select(
        "doc_id", "source", "n_chars", "stratum_n"
    )


#: contrastive negatives per anchor document (before the self/
#: same-source exclusions — slots that hit an exclusion are DROPPED,
#: not re-drawn, keeping the draw pure and join-free)
NEG_PER_ANCHOR = 4


@query(
    "sample_contrastive_negatives",
    oracle=f"""
    -- deterministic contrastive negative sampling: each document
    -- draws {NEG_PER_ANCHOR} candidate negatives by slot-salted hash
    -- mod corpus size (doc_ids are dense 0..n-1, so the mod IS the
    -- target id); candidates that hit the anchor itself or share its
    -- source (in-corpus false-negative guard) are dropped. Same
    -- md5-based 60-bit hash as the sampling family, so the drawn
    -- pairs are engine- and layout-independent.
    WITH n AS (SELECT count(*) AS n FROM documents),
    cand AS (
        SELECT d.doc_id AS anchor_id, d.source AS a_src, s.slot,
               ('0x' || substring(
                    md5(d.doc_id::VARCHAR || ':' || s.slot::VARCHAR),
                    1, 15))::BIGINT % n.n AS neg_id
        FROM documents d
        CROSS JOIN n
        CROSS JOIN (SELECT unnest(range(1, {NEG_PER_ANCHOR} + 1))
                        AS slot) s
    )
    SELECT c.anchor_id, c.slot::BIGINT AS slot, c.neg_id
    FROM cand c JOIN documents nd ON nd.doc_id = c.neg_id
    WHERE c.neg_id <> c.anchor_id AND nd.source <> c.a_src
    """,
)
def sample_contrastive_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive-training negative sampling — each anchor document
    deterministically draws {NEG_PER_ANCHOR} negatives by slot-salted
    hash mod corpus size, excluding itself and same-source documents
    (the standard in-corpus false-negative guard). Slots that hit an
    exclusion are dropped rather than re-drawn: re-draw loops are
    data-dependent and unbounded; a dropped slot costs one negative
    out of {NEG_PER_ANCHOR} and keeps the draw a pure per-row
    expression.

    Scale shape: one narrow scan fans out ×{NEG_PER_ANCHOR} (inline
    slot array, no join for the draw), the 1-row corpus count rides a
    broadcast, and the only real join — fetching the negative's
    source for the exclusion — is a plain equi-join on the hashed id,
    which is UNIFORM by construction (hash output), so it cannot skew
    regardless of the corpus's own source distribution. Downstream
    trainers join text/embeddings onto (anchor_id, neg_id) the same
    way."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    cand = (
        docs.select(
            F.col("doc_id").alias("anchor_id"),
            F.col("source").alias("a_src"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "a_src",
            F.explode(
                F.sequence(F.lit(1), F.lit(NEG_PER_ANCHOR))
            ).alias("slot"),
            "n",
        )
        .select(
            "anchor_id",
            "a_src",
            F.col("slot").cast("long").alias("slot"),
            (
                tok_hash60(
                    F.concat_ws(
                        ":",
                        F.col("anchor_id").cast("string"),
                        F.col("slot").cast("string"),
                    )
                )
                % F.col("n")
            ).alias("neg_id"),
        )
    )
    neg_src = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("n_src")
    )
    return (
        cand.join(neg_src, "neg_id")
        .where(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("n_src") != F.col("a_src"))
        )
        .select("anchor_id", "slot", "neg_id")
    )
