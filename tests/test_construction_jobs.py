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
    # (r13 audit, VERDICT r12 item 7 — TEN rows left this list:
    #  dedup_semantic_cells / dedup_embedding_cosine /
    #  corpus_bloom_prefilter / text_tfidf_top_terms migrated their
    #  bounded training artifact to caching.memo_per_path — the
    #  generalized IVF-codebook pattern — and the lineage-cut rows
    #  dedup_simhash / dedup_ngram_jaccard / dedup_sorted_neighborhood
    #  / dedup_containment / multimodal_image_dedup moved from eager
    #  localCheckpoint to the bounded plan-lazy persist registry;
    #  analytics_market_basket moved too — even a LAZY
    #  localCheckpoint submits a construction job in PySpark 4.1.)
    "similarity_incremental_assign": "training: frozen codebook collect "
    "(trained on the old tranche, assigned to the new — train != "
    "assignment corpus, so the fixture-stat memo key does not apply)",
    "corpus_bpe_learn": "training: the ENTRY is the training loop — "
    "its output IS the merge-table artifact (per-round argmax frames "
    "must materialize for the next round's plan to exist); memoizing "
    "the output would move the entire measured computation out of "
    "the timed path, unlike the IVF memo which moves only index "
    "build (r13 audit: memo pattern does not apply)",
    "pipeline_corpus_dedup": "training: composes corpus_bpe_learn's "
    "merge loop (same reasoning — the training IS the query)",
    # -- iterative: loops whose control flow needs a materialized
    #    frontier (convergence checks) -- (r16, per the measured
    #    loop-form results in OPTIMIZATION_r16.md §10: ONLY
    #    analytics_markov_steady_state left this list — its 8
    #    straight-line rounds over tiny state compose into one lazy
    #    plan with zero construction jobs. graph_pagerank and
    #    graph_shortest_path_weighted STAY listed: their lazy
    #    mega-plan forms measured slower (91 / 825 exchanges), so
    #    they keep per-round localCheckpoints — but their edge builds
    #    and node-count constants are now plan-lazy, leaving exactly
    #    the round cuts as construction jobs.)
    "graph_pagerank": "iterative: rank relaxation rounds",
    "graph_shortest_path_weighted": "iterative: Bellman-Ford rounds",
    "graph_components_star": "iterative: star-contraction rounds",
    "graph_bfs_distance": "iterative: level-synchronous frontier rounds",
    "graph_clustering_coefficient": "iterative: shares the triangle/"
    "degree checkpointed build",
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
    # r13 memo_per_path artifacts (the generalized pattern): corpus
    # doc count (tfidf IDF), bloom mask words, the capped
    # embedding-cosine candidate matrix — constructing each entry
    # once populates its memo, the same first-touch contract as the
    # codebook warms above.
    for warm_name in (
        "text_tfidf_top_terms",
        "corpus_bloom_prefilter",
        "dedup_embedding_cosine",
        # r14: the registered sampled kNN eval collects its bounded
        # query-sample broadcast first-touch (memoized per
        # (path, den), the candidate-matrix pattern)
        "dq_knn_recall_eval_sampled",
        # r16: the FULL kNN eval's exact side now broadcasts the
        # id-sorted corpus matrix (VERDICT r15 item 3 — the one-group
        # gram was a single-task core lottery); same memo_per_path
        # first-touch contract
        "dq_knn_recall_eval",
    ):
        qs[warm_name](spark, SF_ORACLE)

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
