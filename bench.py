"""Benchmark harness — prints ONE JSON line for the driver
(BENCH_r{N}.json): headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Headline set: one representative per operator family (scan+filter,
fact-fact join, star join, agg, window top-k, set op, array HOF,
exact+near dedup, ANN, TF-IDF, streaming-window batch form) — the
queries whose plans carry the 100 TB design decisions.

``value`` = total wall seconds over the headline suite (lower is
better); per-query timings in ``queries``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_filter_compound",
    "q_join_sortmerge",
    "q_join_multiway_star",
    "q_agg_groupby",
    "q_window_topk_pergroup",
    "q_intersect",
    "q_array_hof",
    "q_udaf_grouped",
    "q_dedup_exact",
    "q_dedup_near_minhash",
    "q_dedup_ngram_jaccard",
    "q_similarity_knn_cosine",
    "q_similarity_pairs_threshold",
    "q_similarity_ann_ivf",
    "q_tfidf_topterms",
    "q_multimodal_features",
    "q_source_npy_scan",
    "q_stream_tumbling",
    "q_stream_session",
    # Round-6 breadth (VERDICT r05 item 7): the heaviest post-r5
    # operators, so regressions in the expensive tail stay visible
    # round-over-round.  Their first-inclusion baselines are recorded
    # in BASELINE.md §round-6.
    "q_multimodal_video_frames",
    "q_text_bigram_lm",
    "q_dedup_clusters",
    # Round-7 additions: the production near-dup output mode (linear
    # rep mapping instead of quadratic pairs) and the completed audio
    # path (real polyphase PCM synthesis).  First-inclusion baselines
    # in BASELINE.md §round-7.
    "q_dedup_ngram_cluster_rep",
    "q_multimodal_audio_pcm",
    # Round-7 seventh wave: the heaviest plan in the engine (41M
    # oriented wedges at sf0.1) — the graph-join tail stays
    # regression-visible.  First-inclusion baseline in BASELINE.md.
    "q_graph_triangles",
    # Round-7 late waves: the sketch family (geometry-bounded state),
    # join-driven partition pruning, and the frontier-BFS loop —
    # cheap individually but structurally distinct plans worth
    # regression-watching.  First-inclusion baselines in BASELINE.md
    # §round-7 late waves.
    "q_agg_sketch_countmin",
    "q_agg_sketch_bloom",
    "q_scan_dpp_join",
    "q_graph_bfs_levels",
    # Round-7 session-3: the heaviest new plans — fuzzy-match CC
    # closure (the engine's longest iterative loop after triangles),
    # the Gram/power-iteration pair, and the LSH cost-model audit
    # (signature + 4-band explode).  First-inclusion baselines in
    # BASELINE.md §round-7 session-3.
    "q_entity_resolution",
    "q_embedding_pca_power",
    "q_dedup_lsh_bucket_audit",
    # Round-8 additions: the fully-checked md5 LSH end-to-end pipeline
    # (the most hash-intensive plan), the relative-minsupport basket
    # skeleton, the 64-bit pHash band join, the IVF recall audit
    # (index probe + exact GEMM side), BM25 (explode + double
    # aggregate + postings join), and the per-frame video decode.
    # First-inclusion baselines in BASELINE.md §round-8.
    "q_dedup_minhash_lsh_verified",
    "q_basket_assoc_rules_rel",
    "q_dedup_phash64_hamming",
    "q_similarity_ivf_recall_curve",
    "q_text_bm25_search",
    "q_multimodal_scene_cuts",
    # Round-8 late waves: the iterative-learning plans (4 collect-
    # driven rounds each — the multi-action shape the suite otherwise
    # lacks) and the k-core peel.
    "q_text_bpe_merges",
    "q_graph_kcore_peel",
    # Round-9 additions (VERDICT r08 items 6+8): the interval-overlap
    # aggregate (rewritten round 10 from the Θ(pairs) grid join to the
    # O(n log n) sweep-line — VERDICT r09 item 1; was 353 s here, now
    # seconds) and the partition-column IVF mirror probe (the
    # production serving layout).  First-inclusion baselines in
    # BASELINE.md §round-9; post-rewrite baseline in §round-10.
    "q_join_interval_grid",
    "q_similarity_ann_ivf_partitioned",
    # Round-9 waves 4-6: the heaviest new plans — the collapsed
    # TF-IDF posting self-join, the two-ranker RRF fusion, the
    # two-round HITS iteration, and the full Lloyd k-means iteration
    # (two argmin folds + an M-step).  First-inclusion baselines in
    # BASELINE.md §round-9 wave-4/5/6.
    "q_text_tfidf_cosine",
    "q_similarity_hybrid_rrf",
    "q_graph_hits",
    "q_embedding_kmeans_update",
    # Round-9 waves 13-16: the heaviest new plans — the md5-family
    # SimHash twin (64 vote accumulators, the widest codegen
    # expression in the engine) and LPA-community conductance (the 4
    # LPA rounds plus an edge-sized two-key label join — conductance
    # subsumes q_graph_label_propagation's plan, so one entry watches
    # both).  First-inclusion baselines in BASELINE.md §round-9
    # wave-13/16.
    "q_dedup_simhash_verified",
    "q_graph_conductance",
]

#: Timed in pass 1 only — queries too expensive to triple.  Empty
#: since round 10: the one former member (q_join_interval_grid,
#: ~305 s/pass as the Θ(pairs) grid join) became an O(n log n)
#: sweep-line (VERDICT r09 item 1) and rides the normal min-of-3.
#: The mechanism stays for future audit-class heavyweights.
HEAVY: set[str] = set()

#: The round-1 headline set — the stable cross-round regression
#: subset (VERDICT r09 item 8: emit the core/heavy split so the
#: shared-subset ratio is computable without reverse-engineering
#: query lists).  ``core_suite_wall_seconds`` sums exactly these;
#: ``heavy_suite_wall_seconds`` is everything added since (the
#: audit-class / first-inclusion tail).
LEGACY_CORE = {
    "q_filter_compound", "q_join_sortmerge", "q_join_multiway_star",
    "q_agg_groupby", "q_window_topk_pergroup", "q_intersect",
    "q_array_hof", "q_udaf_grouped", "q_dedup_exact",
    "q_dedup_near_minhash", "q_dedup_ngram_jaccard",
    "q_similarity_knn_cosine", "q_similarity_pairs_threshold",
    "q_similarity_ann_ivf", "q_tfidf_topterms", "q_multimodal_features",
    "q_source_npy_scan", "q_stream_tumbling", "q_stream_session",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from i3cols_spark.session import get_spark

    spark = get_spark("i3cols-bench", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from i3cols_spark.operators import QUERIES

    # Warm the JVM + parquet footers once (not measured): tiny scan.
    QUERIES["q_topk"](spark, sf_dir).collect()

    # min over 3 passes: the host is multi-tenant and single-run
    # timings vary 2-3×; the minimum is the reproducible cost (pass 1
    # also pays each query's whole-stage-codegen compile, so only the
    # later passes measure the steady-state plan).
    # Timed sink is `noop`: full engine-side materialization of every
    # result row WITHOUT the py4j/pickle transfer of collecting to the
    # Python driver — a real pipeline writes to a sink, and collect()
    # was charging 600 k-row results ~4 s of serialization the plan
    # never pays.  Row counts (reported, untimed) come from a separate
    # count() pass.
    timings: dict[str, float] = {}
    construction: dict[str, float] = {}
    rows: dict[str, int] = {}
    for pass_i in range(3):
        for name in HEADLINE:
            if name in HEAVY and pass_i > 0:
                continue
            # SERIES CONVENTION (r01..): the timer covers the ACTION
            # only.  Construction — py4j expression building (seconds
            # for the 32-perm minhash / wedge-join trees) and any
            # driver-paced loop iterations — happens before t0, as in
            # every prior round's numbers this file is compared
            # against.  Operators must therefore not do eager
            # cluster-side work at construction (checkpoints are
            # eager=False, materialized by the timed action); an r12
            # A/B that moved construction inside the timer re-priced
            # the suite 50 s -> 110 s purely on py4j/driver-loop time
            # and was reverted to keep the series comparable.
            #
            # ADDITIONS-ONLY honesty field (VERDICT r12 item 2): a few
            # pre-r12 operators run real cluster work at construction
            # under historical EAGER checkpoints (q_dedup_near_minhash's
            # exact-Jaccard truth side, q_text_tfidf_cosine's weighted
            # postings, the triangle family's edge/wedge builds), which
            # the action-only convention does not price.  We therefore
            # also report per-query construction wall seconds from the
            # SAME run: `value`/`queries` keep the r01-comparable
            # action-only numbers, `construction_wall_seconds` makes
            # the untimed construction cost visible per query (min over
            # passes, same reduction as the action timings).
            tc0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            tc = round(time.perf_counter() - tc0, 3)
            construction[name] = min(construction.get(name, tc), tc)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            if name not in rows:
                rows[name] = QUERIES[name](spark, sf_dir).count()
            print(
                f"# {name}: {dt}s (constr {tc}s, {rows[name]} rows)",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    core = round(sum(t for n, t in timings.items() if n in LEGACY_CORE), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "core_suite_wall_seconds": core,
                "heavy_suite_wall_seconds": round(total - core, 3),
                "queries": timings,
                "construction_wall_seconds": construction,
                "construction_total_seconds": round(sum(construction.values()), 3),
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
