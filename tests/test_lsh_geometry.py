"""Band-geometry regression for the embedding-LSH dedup scale path
(ADVICE r3): the old 4-bands-of-2-bits layout had only 16
(band, band_key) buckets, so ~68% of ALL pairs collided on some band
— a quadratic candidate set at exactly the >100 K-vector scale the
path exists for. The 8-bands-of-8-bits layout must keep the candidate
fraction small. Checked in numpy against the real fixture so the
assertion is about the geometry, not the Spark plan (which
tests/test_plans.py covers)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from lake_satellite_image_etl_spark.functions.vectors import QUANT
from lake_satellite_image_etl_spark.operators.dedup import (
    LSH_DEDUP_BAND_BITS,
    LSH_DEDUP_N_BANDS,
    LSH_DEDUP_N_PLANES,
    _dedup_planes,
)

SF_DIR = "/root/testdata/sf0.01"


def _band_keys(qv: np.ndarray) -> np.ndarray:
    """(n, n_bands) int band keys — numpy mirror of
    _dedup_band_keys_expr / the DuckDB oracle's bands CTE."""
    planes = np.array(_dedup_planes(), dtype=np.int64)  # (64, dim)
    bits = (qv @ planes.T >= 0).astype(np.int64)  # (n, 64)
    weights = 1 << (np.arange(LSH_DEDUP_N_PLANES) % LSH_DEDUP_BAND_BITS)
    keys = (bits * weights).reshape(len(qv), LSH_DEDUP_N_BANDS, LSH_DEDUP_BAND_BITS)
    return keys.sum(axis=2)


def test_planes_extend_similarity_matrix():
    from lake_satellite_image_etl_spark.operators.similarity import PLANES

    assert _dedup_planes()[: len(PLANES)] == PLANES
    assert len(_dedup_planes()) == LSH_DEDUP_N_PLANES


def test_band_collision_fraction_is_selective():
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    qv = np.round(np.array(tbl["embedding"].to_pylist(), dtype=np.float64) * QUANT)
    keys = _band_keys(qv.astype(np.int64))
    n = len(keys)
    collide = np.zeros((n, n), dtype=bool)
    for b in range(LSH_DEDUP_N_BANDS):
        col = keys[:, b]
        collide |= col[:, None] == col[None, :]
    iu = np.triu_indices(n, k=1)
    frac = collide[iu].mean()
    # real fixture data is correlated, so allow slack over the random
    # ~3% bound — but the broken 16-bucket geometry sat at ~0.68, and
    # anything in that regime is a quadratic candidate set.
    assert frac < 0.15, f"band collision fraction {frac:.3f} — geometry too coarse"


def test_vectorized_band_keys_match_hof_expr(spark):
    """The hot path computes band keys via an Arrow numpy matmul
    (_band_keys_frame); the Catalyst HOF expression
    (_dedup_band_keys_expr) remains the semantic spec. They must be
    bit-identical — integer quantization makes this exact, not
    approximate. Run on the real fixture so any divergence (dtype
    overflow, sign convention, band packing order) shows up."""
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.functions.vectors import qvec_of
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.dedup import (
        _band_keys_frame,
        _dedup_band_keys_expr,
    )

    q = (
        read_table(spark, SF_DIR, "embeddings")
        .limit(200)
        .select("vec_id", qvec_of(F.col("embedding")).alias("qv"))
    )
    fast = {
        (r.vec_id, r.band): r.band_key
        for r in _band_keys_frame(q).collect()
    }
    spec = {
        (r.vec_id, r.band): r.band_key
        for r in q.select(
            "vec_id",
            F.posexplode(_dedup_band_keys_expr(F.col("qv"))).alias(
                "band", "band_key"
            ),
        ).collect()
    }
    assert fast == spec


def test_vectorized_simhash_matches_hof_expr(spark):
    """Same contract for the simhash fingerprint: the numpy fold
    (_simhash_frame) must be bit-identical to the simhash_fold_expr
    HOF spec — the ONE shared definition, not a test-local copy —
    including the empty-token-list edge (all 60 bits set)."""
    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.functions.text import (
        tok_hash60,
        tokens_of,
    )
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.dedup import (
        _simhash_frame,
        simhash_fold_expr,
    )

    docs = read_table(spark, SF_DIR, "documents").limit(300)
    # append a degenerate row to force the zero-length-hashes branch
    extra = docs.sparkSession.createDataFrame(
        [(-1, "")], "doc_id long, text string"
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    hs = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens_of(F.col("text"))), tok_hash60
        ).alias("hashes"),
    )
    # "" tokenizes to [""], not [] — drop it to reach the empty case
    hs = hs.withColumn(
        "hashes",
        F.when(F.col("doc_id") == -1, F.array().cast("array<long>")).otherwise(
            F.col("hashes")
        ),
    )
    fast = {r.doc_id: r.simhash for r in _simhash_frame(hs).collect()}
    spec = {
        r.doc_id: r.simhash
        for r in hs.select(
            "doc_id", simhash_fold_expr(F.col("hashes")).alias("simhash")
        ).collect()
    }
    assert fast == spec


def test_lsh_pairs_drop_null_embeddings(spark):
    """A NULL embedding must be dropped declaratively before the
    numpy band kernel (which would crash on None), matching the old
    posexplode(NULL)-drops-the-row semantics and the oracle."""
    from lake_satellite_image_etl_spark.operators.dedup import (
        embedding_cosine_lsh_pairs,
    )

    emb = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None), (3, [0.5] * 64)],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r.vec_a, r.vec_b) for r in embedding_cosine_lsh_pairs(emb).collect()
    }
    assert pairs == {(1, 3)}


def test_simhash_band_geometry_equivalence(spark):
    """The band_bits knob must be result-invariant while the
    pigeonhole bound holds (hamming_threshold < n_bands): a pair
    within Hamming h differs in at most h bands, so with h < n_bands
    some band matches under ANY split of the 60 bits. 20-bit bands
    (3 bands, 2^20 keys — the scaled geometry the 10x smoke drives)
    must emit exactly the 15-bit default's pair set."""
    import pytest

    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.dedup import simhash_pairs

    docs = read_table(spark, SF_DIR, "documents")
    rows = lambda df: {tuple(r) for r in df.collect()}
    assert rows(simhash_pairs(docs, band_bits=20)) == rows(
        simhash_pairs(docs, band_bits=15)
    )
    # past the bound the guarantee is gone -> loud error, not silent
    # recall loss
    with pytest.raises(ValueError, match="exact recall"):
        simhash_pairs(docs, band_bits=30)
    with pytest.raises(ValueError, match="divide"):
        simhash_pairs(docs, band_bits=17)
