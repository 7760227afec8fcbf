"""Streaming ≡ batch equivalence (SURVEY §5.2.3): each Structured
Streaming job run with the availableNow trigger over the static events
parquet must equal its operators.stream_batch twin."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from i3cols_spark.operators import QUERIES
from i3cols_spark.streaming import jobs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "stream_fn,batch_name",
    [
        (jobs.stream_tumbling_counts, "q_stream_tumbling"),
        (jobs.stream_ohlc_bars, "q_ts_ohlc"),
        (jobs.stream_point_in_time_features, "q_join_point_in_time"),
        (jobs.stream_sliding_counts, "q_stream_sliding"),
        (jobs.stream_session_windows, "q_stream_session"),
        (jobs.stream_view_purchase_join, "q_stream_join"),
    ],
)
def test_stream_equals_batch(spark, sf_dir, stream_fn, batch_name):
    sdf = stream_fn(spark, sf_dir)
    name = f"mem_{batch_name}"
    jobs.run_to_memory(sdf, name)
    streamed = spark.table(name)
    batch = QUERIES[batch_name](spark, sf_dir)
    assert _rows(streamed) == _rows(batch)


def test_stream_dedup_within_watermark(spark, sf_dir):
    """Append-mode dedup: one row per (user_id, event_type); with all
    data in one availableNow batch the kept event is the first by
    arrival within the file — check keys, not which id won."""
    sdf = jobs.stream_dedup_within_watermark(spark, sf_dir)
    jobs.run_to_memory(sdf, "mem_dedup")
    streamed = spark.table("mem_dedup")
    batch_keys = _rows(QUERIES["q_stream_dedup"](spark, sf_dir).select("user_id", "event_type"))
    stream_keys = _rows(streamed.select("user_id", "event_type"))
    assert stream_keys == batch_keys
    assert streamed.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_stateful_user_peaks_matches_batch(spark, sf_dir):
    """applyInPandasWithState over availableNow ≡ batch groupBy max/count."""
    sdf = jobs.stream_user_peaks_stateful(spark, sf_dir)
    q = (
        sdf.writeStream.format("memory")
        .queryName("mem_peaks")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit once per batch per key; keep the last emission
    from i3cols_spark.sources.tables import table

    streamed = (
        spark.table("mem_peaks")
        .groupBy("user_id")
        .agg(F.max("peak_value").alias("peak_value"), F.max("n_events").alias("n_events"))
    )
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("peak_value"), F.count("*").alias("n_events"))
    )
    assert _rows(streamed) == _rows(batch)


def test_rollup_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """foreachBatch upsert rollup: after availableNow drains the
    source, the window-partitioned parquet equals the batch tumbling
    aggregate, and partition layout is by window start."""
    out = str(tmp_path / "rollup")
    jobs.run_rollup_maintenance(spark, sf_dir, out)
    rolled = spark.read.parquet(out).select(
        "window_start_us", "event_type", "n_events", "total_value"
    )
    batch = QUERIES["q_stream_tumbling"](spark, sf_dir)
    assert _rows(rolled) == _rows(batch)
    # partition pruning works: one window's read touches one partition dir
    one = rolled.limit(1).collect()[0]
    pruned = spark.read.parquet(out).filter(
        F.col("window_start_us") == one.window_start_us
    )
    assert pruned.count() >= 1


def test_stream_contamination_matches_batch_flags(spark, sf_dir):
    """The streaming decontamination probe's distinct contaminated
    doc set must equal the batch q_text_contamination flagged set,
    and every emitted hit must land on a benchmark shingle."""
    sdf = jobs.stream_contaminated_hits(spark, sf_dir)
    jobs.run_to_memory(sdf, "mem_contam")
    streamed = spark.table("mem_contam")
    stream_docs = {r["doc_id"] for r in streamed.select("doc_id").distinct().collect()}
    batch_flagged = {
        r["doc_id"]
        for r in QUERIES["q_text_contamination"](spark, sf_dir)
        .filter(F.col("flagged"))
        .collect()
    }
    assert stream_docs == batch_flagged
    assert streamed.count() >= len(stream_docs)


def test_funnel_stage0_users(spark):
    """A user whose events are ALL non-funnel types must still be
    counted at funnel_stage 0 — this is why q_funnel_conversion guards
    event types INSIDE collect_list instead of pre-filtering the scan
    (a pre-filter silently drops such users from the denominator)."""
    import datetime

    from i3cols_spark.operators.stream_batch import funnel_stages

    t0 = datetime.datetime(2025, 1, 1)
    rows = [
        # u1: full funnel within the window
        (1, t0, 101, "view"),
        (1, t0 + datetime.timedelta(hours=1), 102, "click"),
        (1, t0 + datetime.timedelta(hours=2), 103, "purchase"),
        # u2: only non-funnel events -> stage 0, must NOT disappear
        (2, t0, 201, "error"),
        (2, t0 + datetime.timedelta(hours=1), 202, "signup"),
        # u3: view then click outside the 24 h window -> stage 1
        (3, t0, 301, "view"),
        (3, t0 + datetime.timedelta(hours=30), 302, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r["funnel_stage"]: r["n_users"] for r in funnel_stages(ev).collect()}
    assert out == {3: 1, 0: 1, 1: 1}


def test_stream_anomaly_screen_matches_batch(spark, sf_dir):
    """The stream-static anomaly screen must flag exactly the rows the
    batch q_anomaly_zscore flags, with identical z-scores (the static
    stats side makes the screen arrival-order-independent)."""
    sdf = jobs.stream_anomaly_screen(spark, sf_dir)
    jobs.run_to_memory(sdf, "mem_anomaly")
    streamed = {
        (r["event_id"], r["z"])
        for r in spark.table("mem_anomaly").collect()
    }
    batch = {
        (r["event_id"], r["z"])
        for r in QUERIES["q_anomaly_zscore"](spark, sf_dir).collect()
    }
    assert streamed == batch and len(batch) > 0
