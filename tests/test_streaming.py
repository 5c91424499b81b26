"""Streaming tests (SURVEY.md §5.2.4): file-source micro-batches with
availableNow triggers; results compared against the equivalent batch plans."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from aws_kinesis_spark.sources.envelope import synthesize_envelope
from aws_kinesis_spark.sources.lake import read_manifest
from aws_kinesis_spark.streaming.pipeline import (
    ProgressRecorder,
    envelope_stream,
    event_stream,
    start_alert_path,
    start_lake_path,
    start_stream_dedup,
    start_windowed_agg,
)
from aws_kinesis_spark.tables import load

SF = "/root/testdata/sf0.001"


def _uniq(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@pytest.fixture()
def env_input(spark, tmp_path):
    """Envelope records written as 4 files => 4 producer batches."""
    inp = str(tmp_path / "input")
    orders = load(spark, SF, "orders")
    synthesize_envelope(orders).repartition(4).write.mode("overwrite").parquet(inp)
    return inp


def test_lake_path_streaming(spark, env_input, tmp_path):
    """E2E lake path: micro-batches -> partitioned lake + manifest per batch."""
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    stream = envelope_stream(spark, env_input, max_files_per_trigger=1)
    q = start_lake_path(stream, lake, ckpt)
    q.awaitTermination(120)

    total = spark.read.parquet(os.path.join(lake, "data")).count()
    expected = load(spark, SF, "orders").count()
    assert total == expected

    # one manifest per micro-batch, files exist
    manifests = sorted(os.listdir(os.path.join(lake, "_manifests")))
    assert len(manifests) >= 2  # maxFilesPerTrigger=1 over 4 files
    m0 = read_manifest(lake, 0)
    assert all(os.path.exists(e["url"]) for e in m0["entries"])

    # resume-after-checkpoint (README.md:305-309): restarting with the same
    # checkpoint reprocesses nothing
    q2 = start_lake_path(envelope_stream(spark, env_input), lake, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(os.path.join(lake, "data")).count() == expected


def test_two_independent_consumers(spark, env_input, tmp_path):
    """E8 (README.md:30-32): alert path + lake path on the same source with
    separate checkpoints progress independently."""
    lake = str(tmp_path / "lake")
    alerts_tbl = _uniq("alerts")
    q1 = start_lake_path(
        envelope_stream(spark, env_input), lake, str(tmp_path / "ckpt1")
    )
    q2 = start_alert_path(
        envelope_stream(spark, env_input), str(tmp_path / "ckpt2"), alerts_tbl
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    orders = load(spark, SF, "orders")
    expected_alerts = orders.filter(F.col("o_orderkey") % 3 == 2).count()  # op == 'D'
    got = spark.table(alerts_tbl).count()
    assert got == expected_alerts
    assert spark.read.parquet(os.path.join(lake, "data")).count() == orders.count()


def test_streaming_dedup(spark, tmp_path):
    """E5 (README.md:51): duplicate sequence numbers across micro-batches
    collapse to one."""
    inp = str(tmp_path / "input")
    orders = load(spark, SF, "orders").limit(200)
    env = synthesize_envelope(orders)
    env.repartition(2).write.mode("overwrite").parquet(inp)
    env.repartition(2).write.mode("append").parquet(inp)  # replay: same seq numbers

    tbl = _uniq("dedup")
    q = start_stream_dedup(
        envelope_stream(spark, inp, max_files_per_trigger=1),
        str(tmp_path / "ckpt"),
        tbl,
    )
    q.awaitTermination(120)
    out = spark.table(tbl)
    assert out.count() == 200
    assert out.select("sequence_number").distinct().count() == 200


def test_stream_tumbling_matches_batch(spark, tmp_path):
    """E1: streaming tumbling-window agg == batch tumbling-window agg."""
    inp = str(tmp_path / "events")
    ev = load(spark, SF, "events")
    ev.repartition(3).write.mode("overwrite").parquet(inp)

    tbl = _uniq("tumble")
    q = start_windowed_agg(event_stream(spark, inp), str(tmp_path / "ckpt"), tbl)
    q.awaitTermination(120)

    got = (
        spark.table(tbl)
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
    )
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_stream_session_window_matches_batch(spark, tmp_path):
    """E3: streaming session windows (30 min gap) == batch session windows."""
    inp = str(tmp_path / "events")
    ev = load(spark, SF, "events")
    ev.write.mode("overwrite").parquet(inp)

    tbl = _uniq("sess")
    q = start_windowed_agg(
        event_stream(spark, inp),
        str(tmp_path / "ckpt"),
        tbl,
        session_gap="30 minutes",
    )
    q.awaitTermination(120)
    got = spark.table(tbl).select(
        F.col("w.start").alias("ws"), "user_id", "n_events", "sum_value"
    )
    want = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "user_id", "n_events", "sum_value")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_progress_listener(spark, env_input, tmp_path):
    """B12: StreamingQueryListener surfaces the lag/throughput metrics."""
    import time

    rec = ProgressRecorder(spark)
    try:
        tbl = _uniq("alerts")
        q = start_alert_path(envelope_stream(spark, env_input), str(tmp_path / "c"), tbl)
        q.awaitTermination(120)
        spark.streams.resetTerminated()
        # listener events are delivered asynchronously
        for _ in range(50):
            if rec.progress:
                break
            time.sleep(0.2)
    finally:
        rec.close()
    assert rec.progress, "no progress events recorded"
    assert sum(p["numInputRows"] for p in rec.progress) > 0
