"""Plan-quality tests (SURVEY §4.2) — assert the physical properties
that matter at 100 TB, not just result correctness: pushdown, pruning,
join strategy.  A regression here is correct-but-100×-slower."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from i3cols_spark.operators import QUERIES
from i3cols_spark.plans.checks import (
    explain_str,
    has_broadcast_hash_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)


def test_filter_pushed_to_parquet_scan(spark, sf_dir):
    df = QUERIES["q_filter_simple"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_quantity" in f and "GreaterThan" in f for f in pushed), pushed


def test_projection_prunes_read_schema(spark, sf_dir):
    df = QUERIES["q_scan_project"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas, "no ReadSchema found"
    for cols in schemas.values():
        assert set(cols) == {
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        }, cols


def test_star_join_broadcasts_dims_and_aggregates_partially(spark, sf_dir):
    df = QUERIES["q_join_multiway_star"](spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    # partial+final aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    # the orders date filter must reach its scan
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_fact_fact_join_is_sort_merge(spark, sf_dir):
    assert has_sort_merge_join(QUERIES["q_join_sortmerge"](spark, sf_dir))


def test_dim_join_is_broadcast(spark, sf_dir):
    assert has_broadcast_hash_join(QUERIES["q_join_broadcast"](spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = explain_str(QUERIES["q_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "global sort planned for top-k"


def test_range_join_is_keyed_not_cartesian(spark, sf_dir):
    """The follower-count range query must plan as an ordered window
    (range frame), not a pair-materializing self-join: the join form's
    intermediate grows with squared per-user density (9.4× at the 10×
    probe vs 1.9× for the window)."""
    plan = explain_str(QUERIES["q_join_theta_range"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_semi_anti_plans(spark, sf_dir):
    semi = explain_str(QUERIES["q_join_semi"](spark, sf_dir))
    anti = explain_str(QUERIES["q_join_anti"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed pays the shuffle once: a later self-key join of two
    bucketed tables plans with zero Exchange operators."""
    import shutil

    from i3cols_spark.sources.ingest import write_bucketed
    from i3cols_spark.sources.tables import table

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    # merge hint: at fixture scale Catalyst would broadcast the tiny side
    # (also shuffle-free, but that wouldn't prove bucket co-location).
    bl, bo = spark.table("b_lineitem").hint("merge"), spark.table("b_orders")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("l_orderkey").count()


    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    # formatted plan names shuffle nodes "(n) Exchange" (BroadcastExchange
    # is a different node name and wouldn't match).
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
    assert joined.count() > 0
    # contrast: the same join over non-bucketed parquet does shuffle
    nb = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    assert re.search(r"\(\d+\) Exchange\b", explain_str(nb))


def test_star_join_leaves_fact_dim_join_to_aqe(spark, sf_dir):
    """The facts⋈dims side must NOT carry a hard broadcast hint: the
    customer-side dim grows with scale factor, and a pinned broadcast
    measured 14.5× slower at 10× data (driver-side hash build) and
    OOMs at real scale.  The logical plan may contain the geo-dim
    (nation×region) hint only — i.e. at most the joins Catalyst was
    explicitly told about, with the big join left to runtime sizing."""
    df = QUERIES["q_join_multiway_star"](spark, sf_dir)
    logical = df._jdf.queryExecution().logical().toString()


    hints = re.findall(r"UnresolvedHint broadcast", logical)
    assert len(hints) <= 2, f"fact-dim join must be AQE's call:\n{logical}"


def test_pair_similarity_is_cell_gemm_not_row_join(spark, sf_dir):
    """Pair scoring must stay the block-nested-loop GEMM: a per-pair
    row join (interpreted HOF dot per pair) measured 47× slower at 10×
    data.  The plan shape that guarantees it: one MapInPandas (the
    cell scorer) and no per-row join expansion after it."""
    for q in ("q_similarity_pairs_threshold", "q_dedup_embedding"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        assert "MapInPandas" in plan, q
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_ann_ivf_assignment_is_single_gemm_pass(spark, sf_dir):
    """The index-BUILD assignment must be one MapInPandas GEMM over the
    scan (centroids ride in the closure — no join against a centroid
    table); the PROBE query must be the payoff: a partition-pruned
    index scan (no GEMM, no per-call count) ending in a
    TakeOrderedAndProject heap, not a global sort."""
    import numpy as np

    from i3cols_spark.operators.similarity import ivf_assignment
    from i3cols_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    cid = np.array([1, 5], dtype=np.int64)
    cmat = np.ones((2, 64), dtype=np.float64)
    build = explain_str(ivf_assignment(emb, cid, cmat))
    # formatted explain names each node twice (tree line + detail
    # block), so one GEMM pass shows exactly one "MapInPandas (n)".
    assert build.count("MapInPandas (") == 1
    assert "Join" not in build

    probe = explain_str(QUERIES["q_similarity_ann_ivf"](spark, sf_dir))
    assert "MapInPandas" not in probe  # index reused, not rebuilt inline
    assert "CartesianProduct" not in probe
    assert "BroadcastNestedLoopJoin" not in probe
    assert "TakeOrderedAndProject" in probe
    assert "PartitionFilters" in probe and "cell#" in probe, probe


def test_ann_ivf_rebuilds_on_fixture_mutation(spark, sf_dir, tmp_path):
    """An in-place mutation of embeddings.parquet (same path, new
    bytes — exactly what the round-3 testdata regeneration did) must
    invalidate the cached index: the fingerprint check rebuilds instead
    of silently serving stale neighbors."""
    import json
    import os
    import shutil

    from i3cols_spark.operators.similarity import build_ivf_index

    d = tmp_path / "sfmut"
    d.mkdir()
    src = f"{sf_dir}/embeddings.parquet"
    dst = str(d / "embeddings.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    idx = build_ivf_index(spark, str(d))
    marker = os.path.join(idx, "_CENTROIDS.json")
    fp0 = json.load(open(marker))["fingerprint"]
    # Cached path: same content → same index, no rebuild.
    assert build_ivf_index(spark, str(d)) == idx
    assert json.load(open(marker))["fingerprint"] == fp0

    # Mutate in place (bump mtime on every data file).
    if os.path.isdir(dst):
        for dp, _, fs in os.walk(dst):
            for f in fs:
                os.utime(os.path.join(dp, f))
    else:
        os.utime(dst)
    build_ivf_index(spark, str(d))
    assert json.load(open(marker))["fingerprint"] != fp0


def test_python_udaf_aggregates_per_partition_not_per_group(spark, sf_dir):
    """The custom UDAF must be mapInPandas after a shuffle-by-key, not
    groupBy().applyInPandas (FlatMapGroupsInPandas): per-group Python
    invocation measured ~2 ms × group overhead, and its cost scales
    with group count instead of rows."""
    plan = explain_str(QUERIES["q_udaf_grouped"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_ngram_jaccard_collapses_exact_dups_first(spark, sf_dir):
    """The inverted index must run on distinct texts: two aggregates
    before the self-join (the (lang, text-hash) collapse plus the
    common-shingle count), with the text-hash grouping visible in the
    plan.  Without the collapse, a duplication factor of d multiplies
    the quadratic pair term by d² (measured 13.7× at 10× data)."""
    plan = explain_str(QUERIES["q_dedup_ngram_jaccard"](spark, sf_dir))
    assert "xxhash64" in plan
    assert plan.count("HashAggregate") >= 4  # collapse + common, partial+final


def test_simhash_collapses_exact_dups_first(spark, sf_dir):
    """The 64-vote aggregate must run on distinct texts only: the
    (normalized-text-hash) collapse groups first, the token explode +
    vote sums run per distinct text, and member doc_ids are exploded
    back at the end.  Makes the plan distinct-text-bound: measured
    ratio 1.2 at 100× replicated docs (vs ~linear without)."""
    from i3cols_spark.operators.dedup import simhash_sketches

    plan = explain_str(simhash_sketches(spark, sf_dir))
    assert "xxhash64" in plan
    # collapse agg + vote agg, each partial+final
    assert plan.count("HashAggregate") >= 4
    assert "Generate" in plan  # explode(ids) expansion back out


def test_stream_join_batch_twin_is_keyed_not_cartesian(spark, sf_dir):
    """The view→purchase interval join must hash on user_id with the
    time bounds as residual predicates — never a cartesian/BNLJ."""
    plan = explain_str(QUERIES["q_stream_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_shuffle_free_scan_filter(spark, sf_dir):
    """Hash-threshold sampling must stay a pure projection+filter over
    the scan: no Exchange at any SF, and only the three output columns
    (plus the filter inputs) in the read schema."""


    df = QUERIES["q_sample_stratified"](spark, sf_dir)
    plan = explain_str(df)
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
    schemas = read_schema_columns(df)
    for cols in schemas.values():
        assert set(cols) == {"o_orderkey", "o_orderpriority", "o_totalprice"}, cols


def test_stat_aggregates_combine_map_side(spark, sf_dir):
    """corr/covar/regr and exact percentile are proper partial+final
    aggregates — constant-size state shuffles per group, not rows."""
    for q in ("q_agg_stats_corr", "q_agg_percentile"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        assert plan.count("HashAggregate") >= 2, q


def test_salted_join_matches_plain_join(spark, sf_dir):
    from i3cols_spark.sources.ingest import salted_join
    from i3cols_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    dim = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "user_total")
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_total")
    salted = salted_join(ev, dim, "user_id").select("event_id", "user_total")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_fans_hot_key_across_salts(spark, sf_dir):
    """The skew claim itself (VERDICT r06 item 2): a hot key's rows
    must leave the salted join spread across all n_salts sub-keys —
    i.e. the hot key's fact rows carry ≥ n_salts-1 distinct salt
    values — and the dim side must be replicated exactly n_salts×.
    The wall-clock spread collapse is measured by scripts/
    skew_probe.py (BASELINE.md round 7: 31.2× → 4.2×)."""
    from pyspark.sql import functions as F

    from i3cols_spark.sources.ingest import salted_join
    from i3cols_spark.sources.tables import table

    n_salts = 8
    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1).collect()
    )[0]["user_id"]
    dim = ev.select("user_id").distinct()

    # Reconstruct the salted sides exactly as salted_join builds them.
    salted_left = ev.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast(
            "int"
        ),
    )
    got_salts = (
        salted_left.filter(F.col("user_id") == hot)
        .select("__salt")
        .distinct()
        .count()
    )
    assert got_salts >= n_salts - 1, got_salts

    # Dim replication factor is exactly n_salts (the explode fan-out).
    out = salted_join(ev.filter(F.col("user_id") == hot), dim, "user_id")
    assert out.count() == ev.filter(F.col("user_id") == hot).count()


def test_contamination_broadcasts_bench_side(spark, sf_dir):
    """The benchmark shingle set is small by definition — it must be
    the broadcast side, and the corpus must never shuffle against it
    (no SortMergeJoin anywhere in the plan)."""
    plan = explain_str(QUERIES["q_text_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_quantize_and_repetition_are_shuffle_free(spark, sf_dir):
    """Per-row HOF operators must plan as pure scans: a shuffle in
    int8 quantization or repetition scoring would be a 100 TB-scale
    regression (both are per-document arithmetic)."""


    for q in ("q_embedding_quantize", "q_text_repetition"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        # spread() may add one round-robin repartition of the single
        # -split fixture; no OTHER exchange (join/agg) is allowed.
        exchanges = re.findall(r"\(\d+\) Exchange\b.*", plan)
        assert len(exchanges) <= 1, (q, exchanges)
        assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, q


def test_pack_and_keep_best_single_window_shuffle(spark, sf_dir):
    """Sequence packing and keep-best selection are one hash-partition
    window each: exactly one Exchange, no join.  (q_merge_latest_state
    left this list in round 5: it became a max_by aggregate — see
    test_merge_latest_is_partial_maxby_not_window.)"""


    for q in ("q_pack_sequences", "q_dedup_keep_best"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, q
        assert "Window" in plan, q
        assert "Join" not in plan, q


def test_centroids_aggregate_partially(spark, sf_dir):
    """The centroid mean must partial-aggregate map-side (partial +
    final HashAggregate pair): the shuffle carries |labels|x dim sums,
    never vectors."""
    plan = explain_str(QUERIES["q_embedding_centroids"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_merge_latest_is_partial_maxby_not_window(spark, sf_dir):
    """CDC compaction must pre-combine map-side (VERDICT r04 item 4):
    a row_number window ships a hot key's ENTIRE history to one
    reducer; the max_by aggregate sends one candidate row per upstream
    partition.  The plan must show partial/final aggregation and no
    Window node."""
    plan = explain_str(QUERIES["q_merge_latest_state"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "max_by" in plan
    # partial + final pair (map-side combine before the exchange)
    assert plan.count("Aggregate") >= 2, plan


def test_funnel_filters_inside_collect_not_before_groupby(spark, sf_dir):
    """Funnel skew containment (VERDICT r04 item 3): non-funnel events
    must be dropped inside the partial collect_list (CASE WHEN guard —
    collect_list skips nulls) rather than by a pre-groupBy filter,
    because a user with only non-funnel events still counts at stage
    0.  Assert the guard reached the aggregate and no events-sized
    join/window appeared."""
    df = QUERIES["q_funnel_conversion"](spark, sf_dir)
    plan = explain_str(df)
    assert "collect_list(CASE WHEN" in plan, plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_percentile_scans_lineitem_once(spark, sf_dir):
    """q_agg_percentile profiles two value columns; the stacked
    exact_percentiles_multi form must read lineitem ONCE (the two-call
    form planned two FileScans — VERDICT r04 item 5)."""


    plan = explain_str(QUERIES["q_agg_percentile"](spark, sf_dir))
    # formatted mode prints each node twice (tree + detail); count the
    # numbered detail entries
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_data_fingerprint_detects_mtime_preserving_rewrite(tmp_path):
    """A regeneration that preserves file sizes and mtimes (rsync -a /
    tar -p restore) must still change the fingerprint: the tail-bytes
    (parquet footer) sample is what catches it (ADVICE r04 item 3)."""
    import os

    from i3cols_spark.operators.similarity import _data_fingerprint

    d = tmp_path / "ds"
    d.mkdir()
    f = d / "part-0.parquet"
    f.write_bytes(b"A" * 10_000)
    st = os.stat(f)
    fp1 = _data_fingerprint(str(d))
    # same size, same mtime, different bytes
    f.write_bytes(b"A" * 5_000 + b"B" * 5_000)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp2 = _data_fingerprint(str(d))
    assert fp1 != fp2


def test_fixed_n_sample_uses_take_ordered(spark, sf_dir):
    """The bottom-k hash sample must plan as TakeOrderedAndProject
    (per-task N-row heaps merged on the driver), never a global sort
    of the table."""
    plan = explain_str(QUERIES["q_sample_fixed_n"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_zscore_broadcasts_stats_no_rowwise_shuffle(spark, sf_dir):
    """The 3σ screen must broadcast the tiny per-type stats frame onto
    the event scan: a SortMergeJoin or Window here would shuffle every
    raw event row."""
    plan = explain_str(QUERIES["q_anomaly_zscore"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_chunking_and_pii_scrub_are_shuffle_free(spark, sf_dir):
    """Chunking and PII scrubbing are per-row generators/projections —
    they must pipeline with the scan (spread() may add one round-robin
    repartition of the single-split fixture; nothing else)."""


    for q in ("q_text_chunking", "q_text_pii_scrub"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        exchanges = re.findall(r"\(\d+\) Exchange\b", plan)
        assert len(exchanges) <= 1, (q, exchanges)
        assert "Join" not in plan and "HashAggregate" not in plan, q


def test_heavy_hitters_partial_agg_and_take_ordered(spark, sf_dir):
    """Exact frequent items: token counts must combine map-side
    (partial+final pair — raw token rows never shuffle) and the top-25
    must plan as TakeOrderedAndProject heaps, not a global sort."""
    plan = explain_str(QUERIES["q_agg_heavy_hitters"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_source_overlap_collapses_texts_first(spark, sf_dir):
    """The bigram vocabulary must build from DISTINCT texts (the
    (source, text-hash) collapse) so replicated corpora shingle each
    text once — the uncollapsed form measured 3.4× at 10× replicated
    data."""
    plan = explain_str(QUERIES["q_source_overlap"](spark, sf_dir))
    assert "xxhash64" in plan, plan
    # collapse + vocab-distinct + intersection count, each partial+final
    assert plan.count("HashAggregate") >= 4, plan


def test_scd2_is_single_window_exchange(spark, sf_dir):
    """SCD2 interval build is ONE lead window on the user key: exactly
    one Exchange, no join, no second pass."""


    plan = explain_str(QUERIES["q_scd2_intervals"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "Window" in plan and "Join" not in plan


def test_gapfill_and_wau_are_keyed_not_cartesian(spark, sf_dir):
    """The gap-fill spine join and the WAU day-trim join must stay
    keyed equi-joins — a BETWEEN range join over days × activity
    would plan cartesian/BNLJ and explode at scale."""
    for q in ("q_ts_gapfill", "q_rolling_active_users"):
        plan = explain_str(QUERIES[q](spark, sf_dir))
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_knn_batch_ranks_candidates_not_corpus(spark, sf_dir):
    """Batch kNN: the corpus is scored inside one vectorized Python
    stage (local per-partition top-k), and the final exact rank is a
    window over the candidate frame — the corpus-sized frame must
    never reach the window's exchange."""
    plan = explain_str(QUERIES["q_similarity_knn_batch"](spark, sf_dir))
    assert "MapInPandas" in plan, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_ohlc_is_partial_aggregate_without_window(spark, sf_dir):
    """Open/close ride min_by/max_by inside a map-side-combinable
    groupBy — a per-bar Window sort over raw events would be the
    100 TB anti-pattern."""
    df = QUERIES["q_ts_ohlc"](spark, sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan
    # struct-ordered min_by buffers aren't hash-aggregable, so the
    # combine is a SortAggregate — what matters is the partial phase
    # (map-side combine) and a single exchange of pre-folded bars.
    assert "partial_min_by" in plan, plan
    # formatted mode lists each node twice (tree + detail header):
    # one physical Exchange of pre-folded bars.
    assert plan.count("Exchange (") == 1, plan


def test_kmeans_argmin_is_aggregate_not_window(spark, sf_dir):
    """The per-vector argmin folds into min(struct) partial
    aggregation; centroids broadcast (nested-loop of k rows)."""
    df = QUERIES["q_embedding_kmeans_assign"](spark, sf_dir)
    plan = explain_str(df)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_is_codegen_prefilter_before_semi_join(spark, sf_dir):
    """The k bit-tests are pure column arithmetic (no Python eval) in
    a Filter that runs BEFORE the exact semi join, and the 1-row
    bitmap arrives by broadcast."""
    df = QUERIES["q_join_bloom_prefilter"](spark, sf_dir)
    plan = explain_str(df)
    assert "xxhash64" in plan and "shiftleft" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bloom bitmap
    assert "LeftSemi" in plan


def test_snapshot_diff_is_conditional_agg_not_outer_join(spark, sf_dir):
    """One conditional aggregation replaces the naive two-scan full
    outer join; the cutoff scalar joins as a broadcast single row."""
    df = QUERIES["q_snapshot_diff"](spark, sf_dir)
    plan = explain_str(df)
    assert "FullOuter" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cutoff scalar


def test_registered_bucketed_join_is_exchange_free(spark, sf_dir):
    """q_join_bucketed's mirror tables co-locate both join sides: the
    join subplan is a SortMergeJoin with ZERO shuffle exchanges (the
    full query's only exchange belongs to the final groupBy)."""


    from pyspark.sql import functions as F

    from i3cols_spark.operators.joins import _bucketed_mirror

    bl_name, bo_name = _bucketed_mirror(spark, sf_dir)
    bl, bo = spark.table(bl_name).hint("merge"), spark.table(bo_name)
    joined = bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    assert not re.search(r"\(\d+\) Exchange\b", plan), plan
    # and the registered query's full plan has exactly the agg exchange
    full = explain_str(QUERIES["q_join_bucketed"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange\b", full)) == 1, full


def test_zorder_layout_prunes_2d_box_better_than_linear(spark, sf_dir):
    """The claim behind q_scan_zorder, measured: over the same events,
    the fraction of layout units (files) whose (user_id, us) min-max
    stats overlap the query's 2-D box is strictly smaller for the
    Morton layout than for the single-key sort — i.e. a stats-pruning
    reader skips more of the z-ordered table.  The linear layout prunes
    the user dimension perfectly but must read EVERY file for the time
    slice of the kept users; z-order prunes both at once."""
    import glob
    import os

    import pyarrow.parquet as pq

    from i3cols_spark.operators.layout import zorder_mirror

    lo_u, hi_u = 3, 75
    lo_us, hi_us = 1_704_672_000_000_000, 1_705_276_800_000_000

    def rows_fetched(path: str) -> tuple[int, int]:
        """Rows inside files whose stats overlap the box — the bytes a
        stats-pruning reader must actually fetch.  (Raw file COUNTS
        aren't comparable across layouts: the two mirrors may pack
        different row counts per file.)"""
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        hit = total = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            total += md.num_rows
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema:
                    md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                su, st = cols["user_id"], cols["us"]
                if (
                    su.min <= hi_u and su.max >= lo_u
                    and st.min < hi_us and st.max >= lo_us
                ):
                    hit += md.num_rows
                    break  # file-level: any overlapping row group counts
        assert len(files) > 1
        return hit, total

    z_hit, z_total = rows_fetched(zorder_mirror(spark, sf_dir, "z"))
    l_hit, l_total = rows_fetched(zorder_mirror(spark, sf_dir, "linear"))
    assert z_total == l_total  # same data, different layout
    assert z_hit < l_hit, (
        f"z-order must fetch fewer rows: z {z_hit}/{z_total} "
        f"vs linear {l_hit}/{l_total}"
    )


def test_write_once_mirror_rebuilds_on_source_mutation(spark, tmp_path):
    """The shared mirror protocol (sources/mirrors.write_once): an
    in-place source mutation — same path, same size, new bytes — must
    trigger a rebuild (footer-sample fingerprint), while an untouched
    source must be served from cache; a layout-parameter change must
    also rebuild."""
    import os
    import shutil

    from i3cols_spark.sources.mirrors import write_once

    src = tmp_path / "src.parquet"
    shutil.copy("/root/testdata/sf0.001/orders.parquet", src)
    calls = []

    def build(out: str) -> None:
        os.makedirs(out, exist_ok=True)
        calls.append(out)

    args = (spark, "test_mirror", "m1", [str(src)], build)
    p1, r1 = write_once(*args, {"v": 1})
    p2, r2 = write_once(*args, {"v": 1})
    assert r1 and not r2 and p1 == p2 and len(calls) == 1

    # same-size in-place byte mutation IN THE SAMPLED TAIL (a parquet
    # rewrite always changes the footer), mtime preserved — the
    # rsync-a/tar-p restore class the footer sample exists to catch.
    # A mid-file-only flip with identical size+mtime+footer is the
    # protocol's documented blind spot.
    st = os.stat(src)
    data = bytearray(src.read_bytes())
    data[-100] ^= 0xFF
    src.write_bytes(bytes(data))
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))
    _, r3 = write_once(*args, {"v": 1})
    assert r3 and len(calls) == 2

    # layout-parameter change alone must rebuild too
    _, r4 = write_once(*args, {"v": 2})
    assert r4 and len(calls) == 3


def test_knn_batch_tiles_bound_the_query_collect(spark, sf_dir, monkeypatch):
    """The batch-kNN query side must run as bounded tiles: forcing a
    tile size of 2 (fixture has 4 queries → 2 tiles, two corpus scans,
    two bounded collects) must reproduce the single-tile result
    EXACTLY — the r05 weak finding was one unbounded collect growing
    with the corpus."""
    from i3cols_spark.operators import similarity

    def run():
        rows = QUERIES["q_similarity_knn_batch"](spark, sf_dir).collect()
        return sorted(tuple(r) for r in rows)

    baseline = run()
    assert len(baseline) > 0
    monkeypatch.setattr(similarity, "_KNN_TILE", 2)
    assert run() == baseline


def test_knn_batch_routes_to_ivf_past_tile_threshold(spark, sf_dir):
    """Past _KNN_IVF_ROUTE_TILES tiles the batch must auto-route to
    the IVF index (VERDICT r06 item 5).  With nprobe = nlist the IVF
    route is exhaustive, so its results must EXACTLY equal the tiled
    exact path — and the route must actually engage (pinned by
    shrinking the tile size so the fixture's 4 queries become 4 tiles
    against a threshold of 1)."""
    from i3cols_spark.operators import similarity

    exact = sorted(
        tuple(r)
        for r in similarity._knn_batch_impl(spark, sf_dir).collect()
    )
    assert len(exact) > 0

    routed_df = similarity._knn_batch_impl(
        spark, sf_dir, tile_rows=1, route_tiles=1, nprobe=10**9
    )
    # The routed plan must scan the IVF index parquet, not the raw
    # embeddings table (proof the route engaged).
    plan = routed_df._jdf.queryExecution().executedPlan().toString()
    assert "ivf_" in plan, plan[:2000]
    routed = sorted(tuple(r) for r in routed_df.collect())
    assert routed == exact

    # Default nprobe (genuinely approximate) still returns k rows per
    # query with valid ranks — the recall trade, not a crash path.
    approx = similarity._knn_batch_impl(
        spark, sf_dir, tile_rows=1, route_tiles=1
    ).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r["qid"], []).append(r["knn_rank"])
    assert set(by_q) == {r[0] for r in exact}
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_knn_batch_tile_bound_is_exact_for_strided_ids(spark, sf_dir):
    """ADVICE r06: tile membership is a dense row_number, so the
    per-tile collect bound holds for ANY vec_id distribution.  With
    tile_rows=3 and 4 fixture queries the tiles must be [3, 1] — the
    old floor(id/mod) % n_tiles scheme put ids 0,125,250,375 → tiles
    [0,1,0,1] only because the fixture ids happen to be uniform."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from i3cols_spark.operators import similarity
    from i3cols_spark.operators.scans import table
    from i3cols_spark.functions.vectors import as_double

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") % similarity._KNN_QUERY_MOD == 0).withColumn(
        "qtile",
        F.floor((F.row_number().over(Window.orderBy("vec_id")) - 1) / 3),
    )
    sizes = {
        int(r["qtile"]): int(r["n"])
        for r in q.groupBy("qtile").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 3 for n in sizes.values())
    assert sorted(sizes) == list(range(len(sizes)))


def test_interval_grid_is_sweep_not_pair_join(spark, sf_dir):
    """VERDICT r09 item 1: the interval-overlap AGGREGATE must run as
    the O(n log n) sweep-line over the day-value distribution — never
    by enumerating candidate pairs.  Concretely: no nested-loop or
    cartesian shape anywhere, no grid-cell explode (the Θ(pairs)
    plan's signature), and the only self-combination of interval data
    happens on day-granular aggregates."""
    from i3cols_spark.plans.checks import explain_str

    plan = explain_str(QUERIES["q_join_interval_grid"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the old quadratic plan exploded every interval to its grid
    # cells before a (priority, cell) self-join — sequence+explode
    # must be gone from the sweep plan
    assert "sequence(" not in plan.lower()
    assert "explode" not in plan.lower()


def test_substring_dedup_joins_on_gram_hash_only(spark, sf_dir):
    """q_dedup_substring's candidate space is the gram-hash inverted
    index — the plan must contain no nested-loop/cartesian fallback,
    and the final left join keeps every document (zero-partner rows
    included)."""
    from i3cols_spark.plans.checks import explain_str
    from i3cols_spark.sources.tables import table

    df = QUERIES["q_dedup_substring"](spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert df.count() == table(spark, sf_dir, "documents").count()


def test_ivfpq_scans_partition_pruned_index(spark, sf_dir):
    """IVF-PQ must read the cell-partitioned index with the probe
    filter bound to the partition column — the pruned-scan contract it
    shares with q_similarity_ann_ivf."""
    from i3cols_spark.plans.checks import explain_str

    from i3cols_spark.operators.similarity import ivfpq_topk

    plan = explain_str(ivfpq_topk(spark, sf_dir))
    assert "ivf_" in plan
    assert "PartitionFilters" in plan


def test_incremental_near_probe_side_is_batch_only(spark, sf_dir):
    """The incremental near-dedup join must meet batch shingles with
    corpus shingles through the equi key — and emit exactly one row
    per BATCH document (cost ∝ batch, the operator's contract)."""
    from pyspark.sql import functions as F

    from i3cols_spark.sources.tables import table

    df = QUERIES["q_dedup_incremental_near"](spark, sf_dir)
    n_batch = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .count()
    )
    assert df.count() == n_batch


def test_triangles_joins_are_equi_with_partial_agg(spark, sf_dir):
    """Degree-oriented triangle counting must run on hash-partitionable
    EQUI joins (the orientation's total order lives in filter
    conditions, not a cartesian) and the corner count must map-side
    combine (partial HashAggregate) before the |V|-sized shuffle."""
    from i3cols_spark.plans.checks import explain_str

    plan = explain_str(QUERIES["q_graph_triangles"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine on the corner agg


def test_cooccurrence_support_filter_precedes_jaccard_join(spark, sf_dir):
    """The HAVING >= 2 support filter must apply to the aggregated
    pair counts BEFORE the two per-part count joins — the jaccard join
    may only see recurring pairs, and no nested-loop shape appears."""


    from i3cols_spark.plans.checks import explain_str

    plan = explain_str(QUERIES["q_graph_cooccurrence"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"common_orders.* >= 2", plan) or ">= 2" in plan


def test_media_hash_dedups_shuffle_only_scalars(spark, sf_dir):
    """Image aHash / audio fingerprint dedup: exactly ONE exchange in
    the plan (the 16-bit-key groupBy), placed AFTER the mapInPandas
    decode — payload bytes must never shuffle."""


    from i3cols_spark.plans.checks import explain_str

    for name in ("q_multimodal_phash_dedup", "q_multimodal_audio_fingerprint"):
        plan = explain_str(QUERIES[name](spark, sf_dir))
        exchanges = re.findall(r"\(\d+\) Exchange\b", plan)
        assert len(exchanges) == 1, f"{name}: {len(exchanges)} exchanges"
        assert "payload" not in plan.split("Exchange", 1)[1].split("\n")[0]
        assert "MapInPandas" in plan


def test_countmin_sketch_broadcasts_grid_and_partials(spark, sf_dir):
    """q_agg_sketch_countmin: the d×w grid (512 rows) must come back
    to the key set as a BROADCAST hash join — a shuffled join keyed on
    (d, bucket) would funnel the whole key domain through 512 reduce
    groups at 100 TB — and both the grid build and the count build
    must partial-aggregate map-side."""
    plan = explain_str(QUERIES["q_agg_sketch_countmin"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_bloom_sketch_broadcasts_bits_no_probe_shuffle(spark, sf_dir):
    """q_agg_sketch_bloom: the (h, bit) set is geometry-bounded
    (≤ k·m = 6144 rows) and must reach the probe side as a broadcast
    semi-join — shuffling a 100 TB probe table on (h, bit) to meet a
    6 KB filter would be the exact inversion of why blooms exist."""
    plan = explain_str(QUERIES["q_agg_sketch_bloom"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_dpp_join_prunes_fact_partitions(spark, sf_dir):
    """q_scan_dpp_join: the month-partitioned fact scan must carry a
    dynamicpruningexpression in its PartitionFilters (join-driven
    pruning — without it the plan full-scans 80 month directories to
    keep 12's worth of rows)."""
    df = QUERIES["q_scan_dpp_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan
    assert "partitionfilters" in plan


def test_kmv_synopsis_uses_heaps_not_global_sort(spark, sf_dir):
    """q_agg_sketch_kmv: the k smallest hashes must come from
    TakeOrderedAndProject (per-partition heap + driver merge of k) —
    a global Sort to pick 64 rows of a 100 TB key set would be the
    classic limit-after-orderBy scale bug."""
    plan = explain_str(QUERIES["q_agg_sketch_kmv"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_kmv_setops_synopsis_uses_heaps_not_global_sort(spark, sf_dir):
    """q_agg_sketch_kmv_setops: same TakeOrderedAndProject discipline
    as the base KMV — the union synopsis is a per-partition heap, and
    the per-key membership flags come from one map-side-combined
    aggregate (partial HashAggregate before the key shuffle)."""
    plan = explain_str(QUERIES["q_agg_sketch_kmv_setops"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan


def test_histogram_sketch_broadcasts_extrema_and_combines_cells(spark, sf_dir):
    """q_agg_sketch_histogram: the extrema row must reach the binning
    scan as a broadcast (a shuffle join keyed on nothing would
    repartition the whole fact table), and the 256-cell reduction must
    be a partial+final hash aggregate so each task ships at most 256
    cells — the fixed-size-synopsis property the sketch exists for."""
    plan = explain_str(QUERIES["q_agg_sketch_histogram"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("HashAggregate") >= 2


def test_sssp_relaxation_is_hash_join_not_cartesian(spark, sf_dir):
    """q_graph_sssp: every relaxation round must be an equi-join on
    the node key (hash-joinable) — a BNLJ/cartesian in the loop would
    be |frontier|×|edges| per hop at 100 TB — and the min-combine must
    be a partial+final hash aggregate so candidate volume combines
    map-side before the node shuffle.  The round is tested via
    graph._sssp_relax because the query's per-round localCheckpoints
    make the loop invisible in the final explain."""
    from pyspark.sql import functions as F

    from i3cols_spark.operators.graph import _sssp_relax
    from i3cols_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("src"),
        F.col("l_suppkey").alias("dst"),
        F.lit(1).alias("w"),
    )
    frontier = li.select(
        F.col("l_orderkey").alias("node"), F.lit(0).cast("long").alias("d")
    ).distinct()
    plan = explain_str(_sssp_relax(frontier, edges))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_bootstrap_replicates_broadcast_and_combine_map_side(spark, sf_dir):
    """q_stats_bootstrap_ci: the 200-replicate table must reach the
    scan as a broadcast (shuffling the fact side to meet 200 rows
    would be absurd) and the replicate means must come from a
    partial+final hash aggregate — the per-task 2B-accumulator
    property that makes the Poisson bootstrap shardable."""
    plan = explain_str(QUERIES["q_stats_bootstrap_ci"](spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_weighted_median_reduces_to_distinct_values(spark, sf_dir):
    """q_agg_weighted_median: the corpus-sized reduction must be the
    groupBy(flag, value) weight aggregate (map-side combinable,
    exact_percentiles discipline) — raw rows never hit the window."""
    plan = explain_str(QUERIES["q_agg_weighted_median"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_concurrency_sweep_windows_are_day_partitioned(spark, sf_dir):
    """q_ts_concurrency_sweep: the delta running sum must be a
    DAY-partitioned window (parallel sweep) — the single global-order
    window lives only in the DuckDB oracle; a Spark plan whose big
    window has an empty partition spec serializes the whole history
    through one task."""
    df = QUERIES["q_ts_concurrency_sweep"](spark, sf_dir)
    plan = explain_str(df)
    assert "hashpartitioning(day" in plan or "hashpartitioning(day#" in plan


def test_chi2_reduces_to_cells_before_windows(spark, sf_dir):
    """q_stats_chi2_indep: the corpus-sized reduction must be the
    (priority, status) cell histogram — a partial+final hash
    aggregate — with marginals/statistic as windows over the r×c
    table; dims must arrive broadcast.  Raw orders rows never hit a
    window or a shuffle keyed on anything but the cell key."""
    plan = explain_str(QUERIES["q_stats_chi2_indep"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_welch_ttest_is_single_pass_no_join(spark, sf_dir):
    """q_stats_welch_ttest: both samples' moments must come from ONE
    conditional-aggregation scan (FILTER-clause idiom) — no join, no
    window, no second pass over lineitem."""
    df = QUERIES["q_stats_welch_ttest"](spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "Window" not in plan


def test_dp_counts_broadcasts_dims_and_ladder(spark, sf_dir):
    """q_quality_dp_counts: the nation dim and the ε ladder must both
    arrive broadcast (the class histogram is the only fact-sized
    shuffle, map-side combined); the noise is expression-level — no
    Python UDF may appear in the plan."""
    plan = explain_str(QUERIES["q_quality_dp_counts"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2, plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_assoc_rules_combine_pairs_before_marginal_joins(spark, sf_dir):
    """q_basket_assoc_rules: per-pair support must be a partial+final
    hash aggregate over the basket-width-bounded pair expansion, the
    support floor must prune BEFORE the marginal joins, and the basket
    total must arrive broadcast — no cartesian anywhere."""
    plan = explain_str(QUERIES["q_basket_assoc_rules"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-20 is a heap, not a sort


def test_pca_projection_is_one_arrow_pass_with_heap_topk(spark, sf_dir):
    """q_embedding_pca_power: the returned plan is the PROJECTION pass
    — one mapInPandas over the scan (direction + means ride in the
    closure, no join against a vector table) ending in a top-k heap,
    never a global sort.  The Gram fold happened at build time and
    shuffles batch-proportional partials (asserted by the covariance
    twin's test)."""
    plan = explain_str(QUERIES["q_embedding_pca_power"](spark, sf_dir))
    assert plan.count("MapInPandas (") == 1, plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_sql_text_path_keeps_physical_quality(spark, sf_dir):
    """q_sql_tpch_q3/q5: plans submitted as SQL TEXT must get the same
    physical treatment the DataFrame path is held to — date filters
    pushed to the parquet scans, partial+final aggregation, and the
    bounded dims (nation/region in q5) broadcast."""
    q3 = QUERIES["q_sql_tpch_q3"](spark, sf_dir)
    assert any("o_orderdate" in f for f in pushed_filters(q3))
    assert any("l_shipdate" in f for f in pushed_filters(q3))
    plan3 = explain_str(q3)
    assert plan3.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan3
    q5 = QUERIES["q_sql_tpch_q5"](spark, sf_dir)
    plan5 = explain_str(q5)
    assert "BroadcastHashJoin" in plan5
    assert any("o_orderdate" in f for f in pushed_filters(q5))


def test_asof_nearest_is_one_shuffle_no_join(spark, sf_dir):
    """q_join_asof_nearest: both direction candidates must come from
    windows over ONE (user_id) partitioning of the tagged union — no
    join operator, no candidate-pair materialization (the q_join_asof
    plan contract, run bidirectionally)."""
    plan = explain_str(QUERIES["q_join_asof_nearest"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Window" in plan


def test_dp_noise_secret_seed_changes_noise(spark):
    """ADVICE r07: the secret-free noise is a cross-engine test
    vector, not a privacy mechanism — a production release mixes a
    config-supplied secret into the hash preimage.  Pin the API: a
    secret changes the realized noise (so the public-key form cannot
    be subtracted by an attacker without the seed), the same secret
    is deterministic across evaluations, and secret=None reproduces
    the documented test-vector values."""
    from i3cols_spark.operators.quality import dp_laplace_noise

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    out = df.select(
        dp_laplace_noise(F.col("k"), F.lit(0.5)).alias("open"),
        dp_laplace_noise(F.col("k"), F.lit(0.5), secret="s3cr3t").alias("sealed"),
        dp_laplace_noise(F.col("k"), F.lit(0.5), secret="s3cr3t").alias("sealed2"),
        dp_laplace_noise(F.col("k"), F.lit(0.5), secret="other").alias("sealed3"),
    ).collect()
    for r in out:
        assert r["open"] != r["sealed"]
        assert r["sealed"] == r["sealed2"]
        assert r["sealed"] != r["sealed3"]


def test_bm25_broadcasts_query_side_no_python(spark, sf_dir):
    """q_text_bm25_search: the ≤3-term query side and the 1-row corpus
    stats must arrive broadcast (the score join is postings-sized, the
    inverted-index access pattern), tf/df are partial+final hash
    aggregates, and the whole scorer stays JVM-side."""
    plan = explain_str(QUERIES["q_text_bm25_search"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2, plan
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_assoc_rules_rel_floor_broadcast_no_cartesian(spark, sf_dir):
    """q_basket_assoc_rules_rel: the relative floor is a 1-row
    broadcast into the pair-support filter (never a second fact pass),
    the pair expansion is the in-row basket form (a generator over the
    collected arrays — no order-key self-join), and no cartesian
    appears anywhere."""
    plan = explain_str(QUERIES["q_basket_assoc_rules_rel"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan, plan  # in-row pair expansion
    assert plan.count("HashAggregate") >= 4


def test_phash64_single_decode_pass_band_join(spark, sf_dir):
    """q_dedup_phash64_hamming: exactly ONE Python decode pass feeds
    both join sides (localCheckpoint reuse — a second MapInPandas
    would re-decode every image per side), and the candidate join is
    an equi-join on the band key, never a cartesian."""
    plan = explain_str(QUERIES["q_dedup_phash64_hamming"](spark, sf_dir))
    assert plan.count("MapInPandas") == 0, plan  # checkpointed upstream
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed hash table


def test_ivf_recall_curve_probe_ladder_broadcast(spark, sf_dir):
    """q_similarity_ivf_recall_curve: the (qid, cell, rank) probe
    ladder and the query-vector set must broadcast against the
    cell-partitioned index; no row-at-a-time Python appears (the only
    Python in the family is the index BUILD, amortized write-once)."""
    plan = explain_str(QUERIES["q_similarity_ivf_recall_curve"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_scene_cuts_single_decode_windowed(spark, sf_dir):
    """q_multimodal_scene_cuts: one mapInPandas decode pass emitting
    per-frame scalars, one window (the lag), one aggregate — pixels
    never shuffle."""
    plan = explain_str(QUERIES["q_multimodal_scene_cuts"](spark, sf_dir))
    # formatted plans list each node in tree + detail: 2 nodes → 4 hits
    assert plan.count("MapInPandas") == 4, plan  # synth payload + decode
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 1


def test_lsh_verified_signature_computed_once(spark, sf_dir):
    """q_dedup_minhash_lsh_verified: the banded keys derive from ONE
    signature projection reused across the 4 band branches and the
    two verify sides (union of projections over the same exchange /
    reused subtree), never a per-band recompute of the shingle HOF —
    and the bucket expansion is the collect-expand form (Generate),
    not a banded self-join."""
    plan = explain_str(QUERIES["q_dedup_minhash_lsh_verified"](spark, sf_dir))
    assert "Generate" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bpe_rounds_jvm_only_vocab_sized(spark, sf_dir):
    """q_text_bpe_merges: the whole learner stays JVM-side (wrapped-
    symbol replace + zip-with pair expansion — zero Python in any
    round) and the final assembled result is a driver-literal table
    (Scan ExistingRDD / LocalTableScan over 4 rows), proving the
    per-round state the driver touched was 1-row metadata, never
    data."""
    plan = explain_str(QUERIES["q_text_bpe_merges"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan


def test_kcore_rounds_use_semi_joins(spark, sf_dir):
    """q_graph_kcore_peel: trace rows are driver literals; the
    per-round survivor filtering must never appear as a cartesian
    (the semi-join pruning shape is asserted indirectly — the final
    plan is the 5-row literal, and the round lineage was truncated by
    localCheckpoint, so a regression that re-plans rounds as wide
    joins shows up in the probe, not here)."""
    plan = explain_str(QUERIES["q_graph_kcore_peel"](spark, sf_dir))
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "CartesianProduct" not in plan


def test_ann_ivf_partitioned_scans_exactly_nprobe_cells(spark, sf_dir):
    """VERDICT r08 item 6 evidence: the write_once partition-column
    mirror's probe must READ exactly _IVF_NPROBE of the cell
    directories (partition pruning at the file-listing level, not a
    post-scan filter), agree row-for-row with q_similarity_ann_ivf,
    and carry the cell PartitionFilter in its plan."""


    from i3cols_spark.operators.similarity import (
        _IVF_NLIST,
        _IVF_NPROBE,
        ivf_partitioned_mirror,
    )

    df = QUERIES["q_similarity_ann_ivf_partitioned"](spark, sf_dir)
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "cell#" in plan, plan
    assert "MapInPandas" not in plan  # mirror reused, not rebuilt inline

    # File-level evidence from the EXECUTED scan's own metrics (the
    # logical inputFiles() listing ignores pruning): the scan must
    # report exactly nprobe partitions read.
    df.collect()

    def walk(n, out):
        out.append(n)
        ch = n.children()
        for i in range(ch.length()):
            walk(ch.apply(i), out)
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.executedPlan(), out)
        if cls.endswith("QueryStageExec"):
            walk(n.plan(), out)
        return out

    scans = [
        n
        for n in walk(df._jdf.queryExecution().executedPlan(), [])
        if "FileSourceScan" in n.getClass().getSimpleName()
    ]
    assert scans, "no FileSourceScan in the executed plan"
    read = {
        k: scans[0].metrics().apply(k).value()
        for k in ("numFiles", "numPartitions")
    }
    assert read["numPartitions"] == _IVF_NPROBE, read
    assert read["numFiles"] >= _IVF_NPROBE, read

    # The mirror itself holds (up to) _IVF_NLIST cell directories —
    # pruning, not a tiny index, is what kept the scan narrow.
    import os

    root = ivf_partitioned_mirror(spark, sf_dir)
    n_dirs = sum(1 for e in os.listdir(root) if e.startswith("cell="))
    assert n_dirs > _IVF_NPROBE
    assert n_dirs <= _IVF_NLIST

    # Row-for-row agreement with the sidecar-protocol flavor.
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(
        tuple(r)
        for r in QUERIES["q_similarity_ann_ivf"](spark, sf_dir).collect()
    )
    assert a == b


def _nodes(plan: str) -> list[str]:
    """Physical node names from formatted explain (each node appears
    once as '(id) Name' in the details section)."""
    return re.findall(r"^\(\d+\) (\w+)", plan, re.M)


def test_interval_merge_single_exchange_two_windows(spark, sf_dir):
    """q_ts_interval_merge: both windows (running-max flag + episode
    cumsum) must ride ONE customer-keyed exchange and ONE sort — the
    second Exchange in the plan is only the final presentation
    ORDER BY."""
    plan = explain_str(QUERIES["q_ts_interval_merge"](spark, sf_dir))
    nodes = _nodes(plan)
    assert nodes.count("Window") == 2, nodes
    assert nodes.count("Exchange") == 2, nodes
    assert plan.count("hashpartitioning") == 1


def test_roc_pr_folds_before_windows(spark, sf_dir):
    """q_ml_eval_roc_pr: the scan must fold to the |scores|-row sweep
    table via a partial+final aggregate BEFORE any window sorts —
    windows over raw data would be the correct-but-unscalable plan."""
    plan = explain_str(QUERIES["q_ml_eval_roc_pr"](spark, sf_dir))
    nodes = _nodes(plan)
    # partial+final pairs for the per-score fold and the totals fold
    assert nodes.count("HashAggregate") >= 4, nodes
    # totals + trapezoid numerator arrive broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in nodes or "BroadcastHashJoin" in nodes
    assert "SortMergeJoin" not in nodes


def test_ndcg_windows_share_exchange(spark, sf_dir):
    """q_ml_eval_ndcg: both row_number windows partition by the SAME
    order key, so exactly one hashpartitioning exchange feeds them;
    the aggregate then map-side-combines."""
    plan = explain_str(QUERIES["q_ml_eval_ndcg"](spark, sf_dir))
    assert plan.count("hashpartitioning(l_orderkey") == 1, plan
    assert _nodes(plan).count("Window") == 2


def test_lpa_final_plan_is_checkpoint_scan(spark, sf_dir):
    """q_graph_label_propagation: the returned plan must read the
    localCheckpointed final round (no window sorts, no replay of
    rounds 1..k-1 — the _cc_loop lineage-truncation discipline)."""
    plan = explain_str(QUERIES["q_graph_label_propagation"](spark, sf_dir))
    nodes = _nodes(plan)
    assert "Window" not in nodes
    assert "Scan" in nodes or "ExistingRDD" in " ".join(nodes), nodes


def test_path_summary_sessionize_shares_exchange(spark, sf_dir):
    """q_event_path_summary: the lag window, the session cumsum and
    the per-session path aggregate are all user-keyed — exactly one
    user-id hashpartitioning exchange, and the sessionize subtree is
    computed ONCE (a second paths consumer would double it — the
    regression this test pins after the window-sum-total fix)."""
    plan = explain_str(QUERIES["q_event_path_summary"](spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") == 1, plan
    # lag + session cumsum (user-keyed) + total-sum + rank (both over
    # the tiny distinct-path corpus)
    assert _nodes(plan).count("Window") == 4


def test_lateral_topk_decorrelates_to_window(spark, sf_dir):
    """q_sql_lateral_topk: Catalyst must decorrelate the LATERAL into
    the rank-window plan — a correlated nested-loop execution would
    be the correct-but-quadratic strategy."""
    plan = explain_str(QUERIES["q_sql_lateral_topk"](spark, sf_dir))
    nodes = _nodes(plan)
    assert "Window" in nodes
    assert "BroadcastNestedLoopJoin" not in nodes


def test_eval_fold_aggregates_scan_once(spark, sf_dir):
    """The round-10 eval/stats ops whose tiny first aggregate feeds
    two downstream folds must NOT re-scan the fact table per consumer
    (2-4 FileScans before the fix): the aggregate is localCheckpointed,
    so the executed plan carries ZERO parquet scans (one scan ran at
    checkpoint time) and no join beyond the 1-row crossJoins."""
    for q in (
        "q_ml_eval_calibration",
        "q_ml_eval_brier",
        "q_ml_eval_confusion",
        "q_stats_permutation_signflip",
    ):
        plan = (
            QUERIES[q](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FileScan parquet") == 0, q
        assert "CartesianProduct" not in plan, q


def test_asof_forward_is_union_window_not_range_join(spark, sf_dir):
    """q_join_asof_forward's union-and-carry emulation: one user-keyed
    sort, a forward first-non-null frame — never a sort-merge range
    join or nested loop over event pairs."""
    from i3cols_spark.plans.checks import explain_str

    plan = explain_str(QUERIES["q_join_asof_forward"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_interval_pairs_grid_is_equi_not_nested_loop(spark, sf_dir):
    """The pair-emitting interval join must meet candidates through
    the (cell) EQUI join — never BroadcastNestedLoopJoin or a
    cartesian product (the shapes grid binning exists to avoid)."""
    from i3cols_spark.plans.checks import explain_str

    plan = explain_str(QUERIES["q_join_interval_pairs"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    # Round-11 salting fix: probe side a must be explicitly
    # hash-repartitioned on (cell, salt) — without it AQE coalesces
    # the small filtered slice to one partition and the Σ n_cell² pair
    # generation runs as a single task (measured 988 s+ at ×10).
    assert "hashpartitioning(cell" in plan and "salt" in plan, plan


def test_referential_integrity_single_pass_per_relation(spark, sf_dir):
    """r13: each FK audit is ONE left join + ONE aggregate — the old
    anti-join form scanned every child table twice (bare count +
    anti join) and stitched the two single-row aggregates with a
    crossJoin (19 scheduler jobs for 5 relations).  Five relations →
    exactly 10 scan mentions in the formatted plan (child + parent
    each), no cartesian stitching, and n_child/n_orphans come from
    one aggregate per relation."""
    df = QUERIES["q_quality_referential_integrity"](spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # 5 relations × (child scan + parent scan), each mentioned twice
    # in "formatted" output (tree + details) = 20; the old form had 30.
    assert plan.count("Scan parquet") == 20, plan.count("Scan parquet")


def test_rollup_fact_stream_probes_one_broadcast(spark, sf_dir):
    """r13: the dimension chain (customer ⋈ nation ⋈ region) is
    pre-joined inside the broadcast build, so the orders fact stream
    probes exactly ONE BroadcastHashJoin instead of three in
    sequence."""
    df = QUERIES["q_agg_rollup"](spark, sf_dir)
    plan = explain_str(df)
    # orders is node (1); walk the tree section: the fact scan's
    # ancestors must contain exactly one BroadcastHashJoin.
    tree = plan.split("\n\n")[0]
    # In the committed plan shape the fact side is the FIRST (stream)
    # child of the outermost BroadcastHashJoin; the two dim joins live
    # under a BroadcastExchange.  Assert the outer join's streamed
    # side is a bare filter+scan, i.e. no nested join above the fact.
    lines = tree.splitlines()
    bhj_idx = [i for i, ln in enumerate(lines) if "BroadcastHashJoin" in ln]
    assert len(bhj_idx) == 3  # 1 fact probe + 2 inside the dim build
    first = bhj_idx[0]
    # the streamed child of the outer join (the next ":-" branch) must
    # be a scan, not another join
    stream_branch = lines[first + 1]
    assert "Scan parquet" in lines[first + 2] or "Filter" in stream_branch
    # and every other join must sit below a BroadcastExchange
    bx_idx = [i for i, ln in enumerate(lines) if "BroadcastExchange" in ln]
    assert all(any(b < j for b in bx_idx) for j in bhj_idx[1:])


def test_simhash_verified_pins_verify_stage_width(spark, sf_dir):
    """r13 core-scaling probe finding: AQE sizes post-shuffle
    partitions by BYTES, but the banding pair-explode multiplies rows
    quadratically and every verify row pays two hash probes + a
    16-word hamming — at a 10× probe the whole verify chain collapsed
    to 10 tasks (304 s of 439 s executor-run; 8→32 cores = 1.04×).
    The plan must pin the stage width with explicit repartitions
    (which AQE never coalesces) at the bucket explode and on the sig
    lineage feeding the verify joins."""
    df = QUERIES["q_dedup_simhash_verified"](spark, sf_dir)
    plan = explain_str(df)
    # pinned round-robin respreads: collapse respread (pre-existing),
    # bucket explode, pair dedup, and the sig verify lineage
    assert plan.count("REPARTITION_BY_NUM") >= 4, plan.count(
        "REPARTITION_BY_NUM"
    )
