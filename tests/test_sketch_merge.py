"""Mergeability proofs for the synopsis family.

Every sketch query's docstring claims its state merges the way
distributed/streaming deployment needs (CMS cells add, Bloom bits
union, KMV synopses union-keep-k-smallest, histogram cells add).
These tests EXECUTE that claim: build the synopsis independently on
two disjoint shards of the data, merge the partial synopses with the
documented rule, and require bit-for-bit equality with the synopsis
built over the whole input.  Shard = event/key parity, so both shards
are non-trivial at every SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from i3cols_spark.operators.aggregates import (
    _BLOOM_BITS,
    _BLOOM_K,
    _CMS_DEPTH,
    _HIST_BINS,
    _KMV_K,
    cms_bucket,
)
from i3cols_spark.sources.tables import table


def _cms_grid(ev):
    """Raw-increment CMS grid (the stream_countmin_grid form): one
    +1 per event row, exploded over the depth axis."""
    return (
        ev.select(
            F.col("user_id"),
            F.explode(F.array([F.lit(d) for d in range(_CMS_DEPTH)])).alias("d"),
        )
        .withColumn("bucket", cms_bucket(F.col("user_id"), F.col("d")))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("bsum"))
    )


def _cells(df, keys, val):
    return {tuple(r[k] for k in keys): r[val] for r in df.collect()}


def test_cms_partial_grids_merge_by_cellwise_add(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    full = _cells(_cms_grid(ev), ("d", "bucket"), "bsum")
    a = _cells(_cms_grid(ev.filter(F.col("event_id") % 2 == 0)), ("d", "bucket"), "bsum")
    b = _cells(_cms_grid(ev.filter(F.col("event_id") % 2 == 1)), ("d", "bucket"), "bsum")
    merged = dict(a)
    for cell, v in b.items():
        merged[cell] = merged.get(cell, 0) + v
    assert merged == full


def _bloom_bits(keys_df):
    h = F.explode(F.array([F.lit(h) for h in range(_BLOOM_K)])).alias("h")
    hashed = keys_df.select("k", h).select(
        "h",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("h").cast("string"),
                            F.lit(":"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_BITS
        ).alias("bit"),
    )
    return {(r["h"], r["bit"]) for r in hashed.distinct().collect()}


def test_bloom_partial_filters_merge_by_bit_union(spark, sf_dir):
    members = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 475000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    full = _bloom_bits(members)
    a = _bloom_bits(members.filter(F.col("k") % 2 == 0))
    b = _bloom_bits(members.filter(F.col("k") % 2 == 1))
    assert a | b == full
    # the filter is useful only if both shards contributed
    assert a and b


def _kmv_synopsis(keys_df):
    hashed = keys_df.select(
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    return [r["h"] for r in hashed.orderBy("h").limit(_KMV_K).collect()]


def test_kmv_synopses_merge_by_union_keep_k_smallest(spark, sf_dir):
    keys = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    full = _kmv_synopsis(keys)
    a = _kmv_synopsis(keys.filter(F.col("k") % 2 == 0))
    b = _kmv_synopsis(keys.filter(F.col("k") % 2 == 1))
    merged = sorted(set(a) | set(b))[: _KMV_K]
    assert merged == full


def _hist_cells(orders, mn, mx):
    width = (mx - mn) / float(_HIST_BINS)
    binned = orders.select(
        F.least(
            F.lit(_HIST_BINS - 1),
            F.floor((F.col("o_totalprice") - F.lit(mn)) / F.lit(width)),
        )
        .cast("bigint")
        .alias("bin")
    )
    return _cells(binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")), ("bin",), "cnt")


def test_histogram_partial_grids_merge_by_cellwise_add(spark, sf_dir):
    """Shards share the bin EDGES (at scale a catalog owns them —
    the schema-evolution argument applied to sketch geometry); under
    shared edges partial histograms add cell-wise."""
    orders = table(spark, sf_dir, "orders")
    mn, mx = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    full = _hist_cells(orders, mn, mx)
    a = _hist_cells(orders.filter(F.col("o_orderkey") % 2 == 0), mn, mx)
    b = _hist_cells(orders.filter(F.col("o_orderkey") % 2 == 1), mn, mx)
    merged = dict(a)
    for cell, v in b.items():
        merged[cell] = merged.get(cell, 0) + v
    assert merged == full


def _hll_registers(ev):
    """Sparse HLL register map (bucket → max rank) for a key slice —
    the q_agg_sketch_hll construction, pre-spine."""
    from i3cols_spark.operators.aggregates import _HLL_REM_BITS

    h32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    parts = (
        ev.select(h32.alias("h32"))
        .distinct()
        .select(
            F.shiftright(F.col("h32"), _HLL_REM_BITS).alias("bucket"),
            F.pmod(F.col("h32"), F.lit(2**_HLL_REM_BITS)).alias("w"),
        )
    )
    rank = F.when(F.col("w") == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS) - F.length(F.bin(F.col("w"))) + 1
    )
    return parts.groupBy("bucket").agg(F.max(rank).alias("m_rank"))


def test_hll_registers_merge_by_max(spark, sf_dir):
    """HLL partial register arrays must merge by element-wise MAX into
    exactly the whole-input registers — the property that makes HLL
    the distributed/streaming cardinality sketch (and what a
    checkpoint restore of a streaming distinct-count relies on)."""
    ev = table(spark, sf_dir, "events")
    full = _cells(_hll_registers(ev), ("bucket",), "m_rank")
    a = _cells(
        _hll_registers(ev.filter(F.col("user_id") % 2 == 0)), ("bucket",), "m_rank"
    )
    b = _cells(
        _hll_registers(ev.filter(F.col("user_id") % 2 == 1)), ("bucket",), "m_rank"
    )
    merged = dict(a)
    for cell, v in b.items():
        merged[cell] = max(merged.get(cell, 0), v)
    assert merged == full and len(full) > 0
