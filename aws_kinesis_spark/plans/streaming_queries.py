"""Streaming parity queries (SURVEY.md §2.E): each runs a real Structured
Streaming query (availableNow trigger) and returns its result as a batch
DataFrame, so the driver's DuckDB oracle can verify that the streaming
engine produces exactly the batch-SQL answer.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_spark.registry import register
from aws_kinesis_spark.sources.envelope import synthesize_envelope
from aws_kinesis_spark.streaming.pipeline import (
    envelope_stream,
    event_stream,
    start_lake_path,
    start_stream_dedup,
    start_windowed_agg,
)
from aws_kinesis_spark.tables import load


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"kinesis_{prefix}_")


@register(
    "e01_stream_tumbling_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def e01_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window streaming aggregation (README.md:131, 130): the events
    fixture replayed through micro-batches produces exactly the batch
    hourly rollup."""
    root = _tmp("e01")
    inp = os.path.join(root, "events")
    load(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(inp)
    tbl = f"e01_{uuid.uuid4().hex[:8]}"
    q = start_windowed_agg(
        event_stream(spark, inp), os.path.join(root, "ckpt"), tbl, window_duration="1 hour"
    )
    q.awaitTermination(300)
    return spark.table(tbl).select(
        F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
    )


@register(
    "e05_stream_dedup",
    oracle="""
        SELECT o_orderkey AS id,
               o_orderstatus AS status,
               CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op
        FROM orders
    """,
)
def e05_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming dedup (README.md:51): the envelope replayed
    twice across micro-batches deduplicates to exactly one record per
    sequence number."""
    root = _tmp("e05")
    inp = os.path.join(root, "input")
    env = synthesize_envelope(load(spark, sf_dir, "orders"))
    env.repartition(2).write.mode("overwrite").parquet(inp)
    env.repartition(2).write.mode("append").parquet(inp)  # replayed producer batch
    tbl = f"e05_{uuid.uuid4().hex[:8]}"
    q = start_stream_dedup(
        envelope_stream(spark, inp, max_files_per_trigger=2),
        os.path.join(root, "ckpt"),
        tbl,
    )
    q.awaitTermination(300)
    return spark.table(tbl).select("id", "status", "op")


@register(
    "e08_stream_lake_path",
    oracle="""
        SELECT o_orderkey AS id,
               o_orderstatus AS status,
               CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
               'sales-orders-' || o_orderkey AS partition_key
        FROM orders
    """,
)
def e08_stream_lake_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship streaming lake lifecycle end-to-end (README.md:113-135):
    envelope micro-batches -> decode -> partitioned parquet + manifest; the
    lake read back equals the source records exactly (zero loss, zero dup,
    README.md:204)."""
    root = _tmp("e08")
    inp = os.path.join(root, "input")
    lake = os.path.join(root, "lake")
    synthesize_envelope(load(spark, sf_dir, "orders")).repartition(4).write.mode(
        "overwrite"
    ).parquet(inp)
    q = start_lake_path(
        envelope_stream(spark, inp, max_files_per_trigger=2),
        lake,
        os.path.join(root, "ckpt"),
    )
    q.awaitTermination(300)
    return spark.read.parquet(os.path.join(lake, "data")).select(
        "id", "status", "op", "partition_key"
    )
