"""Structural properties of the r7 corpus operators beyond the oracle
gate: chunk geometry (coverage, overlap, reconstruction) and vocabulary
consistency (tf/df accounting against an independent recount).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def chunks(spark):
    from lake_satellite_image_etl_spark.operators.corpus import (
        corpus_chunk_documents,
    )

    rows = corpus_chunk_documents(spark, SF_ORACLE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for lst in by_doc.values():
        lst.sort(key=lambda r: r["chunk_id"])
    return by_doc


def test_chunk_geometry(chunks):
    from lake_satellite_image_etl_spark.operators.corpus import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    assert chunks
    for doc_id, lst in chunks.items():
        n = lst[0]["n_tokens"]
        # contiguous ids, stride starts, full coverage, bounded windows
        assert [r["chunk_id"] for r in lst] == list(range(len(lst)))
        for r in lst:
            assert r["start_tok"] == r["chunk_id"] * CHUNK_STRIDE
            assert 1 <= r["n_chunk_tokens"] <= CHUNK_TOKENS
        last = lst[-1]
        assert last["start_tok"] + last["n_chunk_tokens"] == n
        # no chunk starts past the end; exactly the spec'd count
        expected = 1 if n <= CHUNK_TOKENS else -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE) + 1
        assert len(lst) == expected


def test_chunk_reconstruction(spark, chunks):
    """Concatenating each chunk's first CHUNK_STRIDE tokens (plus the
    tail) reproduces the document's token stream exactly."""
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.corpus import CHUNK_STRIDE

    texts = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in read_table(spark, SF_ORACLE, "documents").collect()
    }
    for doc_id, lst in chunks.items():
        rebuilt: list[str] = []
        for r in lst[:-1]:
            rebuilt.extend(r["chunk_text"].split(" ")[:CHUNK_STRIDE])
        rebuilt.extend(lst[-1]["chunk_text"].split(" "))
        assert rebuilt == texts[doc_id], f"doc {doc_id} token stream diverged"


def test_vocab_accounting(spark):
    from collections import Counter

    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.corpus import (
        corpus_vocab_topk,
    )

    tf = Counter()
    df = Counter()
    for r in read_table(spark, SF_ORACLE, "documents").collect():
        toks = r["text"].lower().split(" ")
        tf.update(toks)
        df.update(set(toks))
    got = corpus_vocab_topk(spark, SF_ORACLE).collect()
    assert got
    for r in got:
        assert r["tf"] == tf[r["term"]]
        assert r["df"] == df[r["term"]]
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, len(got) + 1))
    ordered = sorted(got, key=lambda r: r["rank"])
    assert all(
        a["tf"] > b["tf"] or (a["tf"] == b["tf"] and a["term"] < b["term"])
        for a, b in zip(ordered, ordered[1:])
    )


def test_mix_weighted_accounting(spark):
    """Recount the mixture independently: per-document copy counts
    from the md5 recipe must match, and per-source volume must equal
    sum of exact quarter-unit weights (no randomness anywhere)."""
    import hashlib

    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.sampling import (
        MIX_QUARTER_UNITS,
        corpus_mix_weighted,
    )
    from tests.conftest import SF_ORACLE

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = read_table(spark, SF_ORACLE, "documents").collect()
    expected: dict[int, int] = {}
    for d in docs:
        w_num = 1 + (h60(d["source"]) % 8)
        extra = 1 if h60(str(d["doc_id"])) % MIX_QUARTER_UNITS < w_num % MIX_QUARTER_UNITS else 0
        expected[d["doc_id"]] = w_num // MIX_QUARTER_UNITS + extra

    got: dict[int, list] = {}
    for r in corpus_mix_weighted(spark, SF_ORACLE).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in expected.items():
        rows = got.get(doc_id, [])
        assert len(rows) == n, f"doc {doc_id}: {len(rows)} copies != {n}"
        assert sorted(r["epoch"] for r in rows) == list(range(1, n + 1))
    # both regimes must actually occur on the fixture
    assert any(n >= 2 for n in expected.values()), "no upsampling hit"
    assert any(n == 0 for n in expected.values()), "no downsampling hit"


def test_bloom_prefilter_is_superset_of_exact_hits(spark):
    """A bloom filter can false-positive but never false-negative:
    every shingle the exact decontamination join counts must also be a
    bloom candidate, so per-doc candidate counts dominate exact shared
    counts and no contaminated doc escapes the prefilter."""
    from lake_satellite_image_etl_spark.operators.corpus import (
        corpus_bloom_prefilter,
        corpus_contamination_flag,
    )

    exact = {
        r["doc_id"]: r["n_shared"]
        for r in corpus_contamination_flag(spark, SF_ORACLE).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_candidates"]
        for r in corpus_bloom_prefilter(spark, SF_ORACLE).collect()
    }
    assert exact, "exact contamination op returned no hits (vacuous)"
    for doc_id, n_shared in exact.items():
        assert doc_id in bloom, f"doc {doc_id} lost by bloom prefilter"
        assert bloom[doc_id] >= n_shared, (
            f"doc {doc_id}: bloom candidates {bloom[doc_id]} < exact "
            f"shared {n_shared}"
        )


def test_bpe_merges_are_distinct_and_counts_monotone_sane(spark):
    """Learned merge rules must be distinct pairs; the first merge's
    count must be the global max over all initial adjacent char pairs
    (independently recounted); counts stay positive."""
    from collections import Counter

    from pyspark.sql import functions as F

    from lake_satellite_image_etl_spark.functions.text import tokens_of
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.corpus import (
        corpus_bpe_learn,
    )

    rows = sorted(
        corpus_bpe_learn(spark, SF_ORACLE).collect(), key=lambda r: r["rank"]
    )
    assert len(rows) == 8
    pairs = [(r["l_sym"], r["r_sym"]) for r in rows]
    assert len(set(pairs)) == len(pairs)
    assert all(r["pair_count"] > 0 for r in rows)

    words = (
        read_table(spark, SF_ORACLE, "documents")
        .select(F.explode(tokens_of(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    c = Counter()
    for r in words:
        w, f = r["w"], r["count"]
        for a, b in zip(w, w[1:]):
            c[(a, b)] += f
    best = max(c.items(), key=lambda kv: (kv[1], tuple(map(lambda x: [-ord(ch) for ch in x], kv[0]))))
    # recount: first learned pair must have the max count
    assert rows[0]["pair_count"] == max(c.values())
    assert c[pairs[0]] == max(c.values())
