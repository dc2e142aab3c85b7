"""Plan-hygiene sweep (VERDICT r10 item 5): constructing a registered
query's DataFrame must not run Spark jobs — plan-only tooling (explain
audits, bench warm passes, the driver's schema probe) constructs
entries hundreds of times per session, and an eager construction bills
a job to every one of them (the r9 PQ-codebook leak, fixed in r10;
the r10 autocells count, fixed in r11 via the memoized
``auto_seed_bits``).

Entries that MUST run jobs at construction are allowlisted below with
the reason, one line each. The sweep asserts EXACT equality between
the offender set and the allowlist — a new entry that silently
eagerizes fails the test, and an allowlisted entry that becomes clean
fails it too (so the list can't rot)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE

#: name -> why construction legitimately runs jobs. Three classes:
#: "training" (a bounded model artifact — codebook, vocabulary,
#: bloom filter — is materialized and broadcast; the artifact is
#: √n-or-smaller by construction), "iterative" (fixed-superstep
#: relational loops whose per-round frontier must materialize before
#: the next round's plan exists), and "mechanics" (streaming runners
#: and external-system sinks that execute their micro-batch /
#: round-trip when invoked — the returned DataFrame is the post-run
#: result table by contract).
CONSTRUCTION_JOB_ALLOWLIST: dict[str, str] = {
    # -- training: bounded model artifact collected + broadcast --
    # (the IVF-family entries left this list in r12: the trained
    # codebook memoizes per (session, fixture stat, seed_bits) — see
    # ivf_assign(memo_path=...) — so training is first-touch-only and
    # the warm phase below pays it, exactly like schema inference)
    "similarity_incremental_assign": "training: frozen codebook collect "
    "(trained on the old tranche, assigned to the new — train != "
    "assignment corpus, so the fixture-stat memo key does not apply)",
    "dedup_semantic_cells": "training: Lloyd codebook collect",
    "dedup_embedding_cosine": "training: corpus-size guard + candidate "
    "matrix broadcast (capped by EMBEDDING_BROADCAST_CAP)",
    "corpus_bpe_learn": "training: BPE merge loop materializes each "
    "merge rank (bounded by N_MERGES)",
    "pipeline_corpus_dedup": "training: composes the BPE/vocab stages",
    "corpus_bloom_prefilter": "training: bloom bitset aggregated + "
    "broadcast (fixed BLOOM_BITS size)",
    "text_tfidf_top_terms": "training: corpus doc count for IDF "
    "(one metadata-scan scalar)",
    "dedup_simhash": "lineage cut: eager checkpoint of the 60-bit "
    "fingerprint frame so the band self-join evaluates it once",
    "dedup_ngram_jaccard": "lineage cut: eager checkpoint before the "
    "banded self-join",
    "dedup_sorted_neighborhood": "lineage cut: eager checkpoint of the "
    "sorted-key frame before the neighbor self-join",
    "dedup_containment": "training: document-frequency cap table",
    "multimodal_image_dedup": "lineage cut: eager checkpoint of decoded "
    "feature frame before the band self-join",
    "analytics_market_basket": "training: frequent-item support counts "
    "feed the pair-generation plan's literal threshold",
    # -- iterative: fixed-superstep loops, frontier materialized/round --
    "graph_pagerank": "iterative: rank relaxation rounds",
    "graph_components_star": "iterative: star-contraction rounds",
    "graph_bfs_distance": "iterative: level-synchronous frontier rounds",
    "graph_shortest_path_weighted": "iterative: Bellman-Ford rounds",
    "graph_clustering_coefficient": "iterative: shares the triangle/"
    "degree checkpointed build",
    "analytics_markov_steady_state": "iterative: power-method rounds "
    "after relational reduction",
    "dedup_cluster_assign": "iterative: label-propagation rounds",
    "dedup_canonical_keep": "iterative: composes dedup_cluster_assign's "
    "label-propagation rounds",
    "sample_cluster_safe_split": "iterative: composes "
    "dedup_cluster_assign's label-propagation rounds",
    # -- mechanics: streaming runners / external round-trips --
    "stream_cdc_batch": "mechanics: AvailableNow micro-batch executes",
    "stream_dedup_batch": "mechanics: AvailableNow micro-batch executes",
    "stream_stream_join_batch": "mechanics: AvailableNow micro-batch",
    "stream_window_batch": "mechanics: AvailableNow micro-batch",
    "jdbc_scan": "mechanics: Derby DDL + seed round-trip",
    "sink_artifact_manifest": "mechanics: the sink write executes; the "
    "returned manifest frame is the post-write result by contract",
}


def test_construction_job_sweep(spark):
    from lake_satellite_image_etl_spark import registry
    from lake_satellite_image_etl_spark.io import TABLES, read_table
    from lake_satellite_image_etl_spark.operators.similarity import (
        auto_seed_bits,
    )

    qs, _ = registry.load_all()
    unknown = set(CONSTRUCTION_JOB_ALLOWLIST) - set(qs)
    assert not unknown, f"allowlist names not in registry: {unknown}"

    # warm the one-job-per-path memos (schema inference, derived cell
    # geometry, trained IVF codebooks) so the sweep measures the
    # operators, not first-touch fixture IO / index build — the same
    # contract production tooling gets after its first query against
    # a path.
    for t in TABLES:
        read_table(spark, SF_ORACLE, t)
    auto_seed_bits(spark, SF_ORACLE)
    from lake_satellite_image_etl_spark.operators.similarity import (
        IVF_AUTO_BITS_SF001,
        IVF_SCALED_SEED_BITS,
        _emb_path,
        ivf_assign,
    )

    emb = read_table(spark, SF_ORACLE, "embeddings")
    for bits in (0, IVF_AUTO_BITS_SF001, IVF_SCALED_SEED_BITS):
        ivf_assign(emb, bits, keep_ranks=1, memo_path=_emb_path(SF_ORACLE))

    sc = spark.sparkContext
    offenders: dict[str, int] = {}
    for name, fn in sorted(qs.items()):
        group = f"construction-sweep-{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, SF_ORACLE)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = list(sc.statusTracker().getJobIdsForGroup(group))
        if jobs:
            offenders[name] = len(jobs)

    eager = set(offenders) - set(CONSTRUCTION_JOB_ALLOWLIST)
    assert not eager, (
        "entries run Spark jobs at DataFrame construction without an "
        f"allowlist reason: { {n: offenders[n] for n in sorted(eager)} }"
    )
    stale = set(CONSTRUCTION_JOB_ALLOWLIST) - set(offenders)
    assert not stale, (
        "allowlisted entries constructed joblessly — remove them so "
        f"the list can't rot: {sorted(stale)}"
    )
