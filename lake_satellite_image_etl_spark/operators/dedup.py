"""Deduplication operators over ``documents``/``embeddings`` —
SURVEY.md §2.10 EXT, the LLM-pipeline dedup block: exact hash dedup,
MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard with length
blocking, and embedding-cosine near-dup.

The non-negotiable scale rule: **never all-pairs**. Every near-dup
operator here is a *bucketed join* — candidate pairs come from
equality on a cheap key (LSH band hash, SimHash band, length bucket),
and only candidates pay the exact verification cost. At 100 TB the
shuffles are keyed by those bucket ids (uniform by construction — hash
buckets — so no skew), and the verify stage touches a vanishing
fraction of the pair space. The reference's own dedup (PK anti-join,
main.py:468-473,415) is the degenerate exact-key case of the same
shape.

All hashing is md5-derived (engine-independent), so every operator
has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.functions.text import (
    _SQL_TOKS,
    shingles_of,
    tok_hash60,
    tokens_of,
)
from lake_satellite_image_etl_spark.functions.vectors import (
    SQL_QVEC,
    cosine,
    qvec_of,
    sql_cosine,
)
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

# MinHash/LSH geometry: 12 hashes = 6 bands × 2 rows.
# P(candidate | J=0.8) = 1-(1-0.8²)⁶ ≈ 0.998 at verify threshold 0.8.
MINHASH_K = 12
LSH_ROWS = 2
LSH_BANDS = MINHASH_K // LSH_ROWS
JACCARD_THRESHOLD = 0.8

_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - 2, 1)), "
    "j -> array_to_string(list_slice(toks, j, j + 2), ' ')))"
)


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id as
    canonical. The 100 TB form of `SELECT DISTINCT text` — the shuffle
    carries (128-bit hash, partial count), never the documents."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


def minhash_sig(shingles):
    """MinHash signature: for seed i, min over shingles of
    md5(i || '|' || shingle). md5-hex min is taken lexicographically —
    a uniform hash with a total order is all MinHash needs, and hex
    strings compare identically in every engine."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_K - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat_ws("|", i.cast("string"), s))
            )
        ),
    )


_SQL_MINHASH = (
    f"list_transform(generate_series(0, {MINHASH_K - 1}), "
    "i -> list_min(list_transform(shingles, "
    "s -> md5(i::VARCHAR || '|' || s))))"
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM t),
    sig AS (SELECT doc_id, shingles, {_SQL_MINHASH} AS sig FROM sh),
    bands AS (
        SELECT doc_id, band,
               md5(array_to_string(
                   list_slice(sig, band * {LSH_ROWS} + 1,
                              band * {LSH_ROWS} + {LSH_ROWS}), '|')) AS band_key
        FROM sig, unnest(generate_series(0, {LSH_BANDS - 1})) AS u(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(sa.shingles || sb.shingles)) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs (the scale path for text
    dedup): 3-gram shingles → 12 MinHash values → 6 bands of 2 →
    band-bucket equi-join → exact Jaccard ≥ 0.8 verification on
    candidates only.

    Scale: the band join shuffles (band, band_key) — uniform md5 keys,
    no skew — and the verify join re-fetches only candidate shingle
    sets. Candidate recall at J=0.8 is 1-(1-0.8²)⁶ ≈ 99.8%; both
    engines compute the identical signature, so the oracle matches
    exactly even on the probabilistic miss set."""
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", shingles_of(tokens_of(F.col("text"))).alias("shingles")
    )
    sig = sh.select("doc_id", "shingles", minhash_sig(F.col("shingles")).alias("sig"))
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(LSH_BANDS - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                "|", F.slice("sig", F.col("band") * LSH_ROWS + 1, LSH_ROWS)
            )
        ).alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# SimHash: 60-bit fingerprint, 4 bands × 15 bits for candidate
# generation, Hamming ≤ 10 verification.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
# ≤2 of 60 bits. SimHash is a frequency-profile sketch: on the fixture
# corpus (all docs drawn from one ~40-word vocabulary) fingerprints
# collide far more than on natural text — threshold 2 keeps the output
# a near-dup candidate set (~0.7% of the pair space) rather than half
# of it; on real corpora 3-10 bits is the usual window.
HAMMING_THRESHOLD = 2


def simhash60(toks):
    """60-bit SimHash over distinct tokens: per bit b, sum ±1 by token
    hash bit b; fingerprint bit = (sum >= 0). Uses a precomputed
    power-of-two array because Spark's shiftleft needs a literal shift."""
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    dtoks = F.array_distinct(toks)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
        lambda bpos: F.when(
            F.aggregate(
                dtoks,
                F.lit(0),
                lambda acc, t: acc
                + F.when(
                    tok_hash60(t).bitwiseAND(F.element_at(powers, bpos + 1)) != 0,
                    1,
                ).otherwise(-1),
            )
            >= 0,
            1,
        ).otherwise(0),
    )
    return F.aggregate(
        F.zip_with(bits, powers, lambda x, p: x.cast("long") * p),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_SQL_SIMHASH = f"""list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}),
    b -> CASE WHEN list_sum(list_transform(list_distinct(toks),
            t -> CASE WHEN (('0x' || substring(md5(t), 1, 15))::BIGINT
                            & (1::BIGINT << b)) != 0
                      THEN 1 ELSE -1 END)) >= 0
              THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT"""


@query(
    "dedup_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, {_SQL_SIMHASH} AS simhash FROM t),
    bands AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * {SIMHASH_BAND_BITS}))
                   & {(1 << SIMHASH_BAND_BITS) - 1} AS band_key
        FROM s, unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS u(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           bit_count(xor(sim_a, sim_b))::BIGINT AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {HAMMING_THRESHOLD}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit fingerprints, 4 bands of 15 bits
    for candidates (pigeonhole: any pair within Hamming 3 shares a
    band; larger distances probabilistically), Hamming ≤ HAMMING_THRESHOLD
    verify.

    Scale: identical shape to MinHash-LSH — band-keyed equi-join, no
    all-pairs; the fingerprint itself is one narrow map stage."""
    docs = read_table(spark, sf_dir, "documents")
    s = docs.select("doc_id", simhash60(tokens_of(F.col("text"))).alias("simhash"))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        (
            F.when(F.col("band") == 0, F.col("simhash"))
            .when(F.col("band") == 1, F.shiftright("simhash", SIMHASH_BAND_BITS))
            .when(F.col("band") == 2, F.shiftright("simhash", 2 * SIMHASH_BAND_BITS))
            .otherwise(F.shiftright("simhash", 3 * SIMHASH_BAND_BITS))
        ).bitwiseAND(F.lit(mask)).alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "band", "band_key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "band", "band_key",
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.filter(hamming <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
    )


NGRAM_BLOCK_CHARS = 50
NGRAM_JACCARD_THRESHOLD = 0.5


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars // {NGRAM_BLOCK_CHARS} AS len_bucket,
               {_SQL_TOKS} AS toks
        FROM documents
    ),
    sh AS (SELECT doc_id, len_bucket, {_SQL_SHINGLES} AS shingles FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(a.shingles || b.shingles))
          >= {NGRAM_JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup with *length-bucket blocking*: pairs are
    only formed inside 50-char length buckets (near-dups have near-equal
    length), then exact 3-gram Jaccard ≥ 0.5.

    Scale: blocking bounds the pair space to Σ bucket² instead of n² —
    the classic blocking-key dedup. Recall is traded for cost (a pair
    straddling a bucket boundary is missed — 23/25 planted pairs at
    sf0.01); MinHash-LSH above is the recall-tight alternative."""
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.floor(F.col("n_chars") / NGRAM_BLOCK_CHARS).alias("len_bucket"),
        shingles_of(tokens_of(F.col("text"))).alias("shingles"),
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        "len_bucket",
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        "len_bucket",
        F.col("shingles").alias("sh_b"),
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        a.join(b, "len_bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= NGRAM_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


COSINE_DUP_THRESHOLD = 0.4


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id, {SQL_QVEC} AS qv FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({sql_cosine("a.qv", "b.qv")}, 6) AS cos_sim
    FROM q a JOIN q b ON a.vec_id < b.vec_id
    WHERE {sql_cosine("a.qv", "b.qv")} >= {COSINE_DUP_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.4 — calibrated to the
    fixture, whose max pairwise cosine is ~0.51).

    This is the *verification-exact baseline*: an all-pairs join kept
    only because the fixture is small. The 100 TB path is the
    LSH-bucketed form in operators/similarity.py (sign-random-
    projection buckets → within-bucket exact cosine) — same verify
    expression, candidate generation swapped."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", qvec_of(F.col("embedding")).alias("qv"))
    a = q.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"))
    cos = cosine(F.col("qa"), F.col("qb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )
