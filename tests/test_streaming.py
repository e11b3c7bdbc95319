"""Structured Streaming tests: the unified-API property — streaming output on
bounded input equals the batch run of the same transformation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sarpro_spark import frames
from sarpro_spark.streaming import events as se


def test_tumbling_batch_equals_streaming(spark, sf_dir, tmp_path):
    batch_events = frames.load_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in se.tumbling_counts(batch_events).collect()
    }

    # the file stream source requires a directory — stage the single file
    import shutil

    stage = tmp_path / "events_stream"
    stage.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stage / "events.parquet")
    stream = se.stream_events_from_parquet(spark, str(stage))
    assert stream.isStreaming
    q = se.run_stream_to_memory(se.tumbling_counts(stream), "tumbling_test")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0


def test_sliding_counts_batch(spark, sf_dir):
    e = frames.load_table(spark, sf_dir, "events")
    out = se.sliding_counts(e)
    rows = out.collect()
    # every event lands in window/slide = 4 buckets; total bucket-events = 4x
    total = sum(r["n"] for r in rows)
    assert total == e.count() * 4


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),  # same session
        (1, base + dt.timedelta(minutes=50), 3.0),  # gap 40min -> new session
        (2, base, 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = se.sessionize(df, gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert sorted(r["n_events"] for r in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1
