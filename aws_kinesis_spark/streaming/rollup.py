"""Continuous aggregate / materialized rollup (SURVEY.md D9+A7 composed; the
reference's "hourly analytics on every order change", README.md:38, kept
continuously fresh instead of recomputed).

Each micro-batch computes its partial hourly rollup and MERGES it into a
materialized lake table: combine-by-key (counts/sums add), then an atomic
versioned swap — readers always see a complete consistent version, never a
half-written one (the manifest-commit discipline of README.md:429 applied to
a view).

Scale: per batch the work is O(batch) + a combine against only the touched
keys' current values; the rollup table itself is O(windows x groups), not
O(events). State lives in the lake, not executor memory, so a restart
resumes from the last committed version via the checkpoint + version
pointer.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_POINTER = "_CURRENT"

ROLLUP_SCHEMA = (
    "hour_start TIMESTAMP, event_type STRING, n_events BIGINT, sum_value DOUBLE"
)


def _current_version(rollup_dir: str) -> int | None:
    ptr = os.path.join(rollup_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return json.load(fh)["version"]


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Read the current committed rollup version (empty frame before the
    first commit)."""
    v = _current_version(rollup_dir)
    if v is None:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return spark.read.parquet(os.path.join(rollup_dir, f"v{v}")).select(
        "hour_start", "event_type", "n_events", "sum_value"
    )


def start_continuous_rollup(
    events: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain an hourly (hour, event_type) rollup incrementally.

    foreachBatch: delta = batch rollup; new = combine(current, delta) summed
    by key; write vN+1; atomically repoint _CURRENT. Idempotent under batch
    replay because the version written for a batchId overwrites itself."""
    os.makedirs(rollup_dir, exist_ok=True)

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = (
            batch_df.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .select(
                F.col("w.start").alias("hour_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        # combine against the newest version OLDER than this batch — not the
        # pointer: if batch N committed its version but the checkpoint write
        # failed, the replayed batch N would otherwise double-count itself
        prev = [
            int(d[1:])
            for d in os.listdir(rollup_dir)
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
        ]
        if prev:
            # select away the day partition column so the combine schema
            # stays the logical rollup schema
            current = spark.read.parquet(
                os.path.join(rollup_dir, f"v{max(prev)}")
            ).select("hour_start", "event_type", "n_events", "sum_value")
        else:
            current = spark.createDataFrame([], ROLLUP_SCHEMA)
        combined = (
            current.unionByName(delta)
            .groupBy("hour_start", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
        # version = batchId so a replayed batch rewrites its own version
        # instead of double-counting (README.md:204 zero-duplicates).
        # Partitioned by day: writers parallelize across time buckets
        # (repartition(1) would serialize every version through one task)
        # and readers prune to the days they query.
        vdir = os.path.join(rollup_dir, f"v{batch_id}")
        # REPLAY-SAFE swap (round-11 review): a replayed batch used to
        # overwrite v{N} in place while _CURRENT still pointed at it —
        # a concurrent reader resolved the pointer into a half-deleted
        # dir. Same two-rename + crash-heal protocol as the lake's leaf
        # compaction: write beside, swap, sweep.
        vtmp, vold = vdir + ".tmp", vdir + ".old"
        if os.path.exists(vold):  # heal a prior crashed swap
            if not os.path.exists(vdir):
                os.replace(vold, vdir)
            else:
                shutil.rmtree(vold, ignore_errors=True)
        shutil.rmtree(vtmp, ignore_errors=True)
        (
            combined.withColumn("day", F.to_date("hour_start"))
            .repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(vtmp)
        )
        if os.path.exists(vdir):
            os.replace(vdir, vold)
        os.replace(vtmp, vdir)
        shutil.rmtree(vold, ignore_errors=True)
        tmp = os.path.join(rollup_dir, f"._CURRENT.{batch_id}")
        with open(tmp, "w") as fh:
            json.dump({"version": batch_id}, fh)
        os.replace(tmp, os.path.join(rollup_dir, _POINTER))  # atomic commit

    return (
        events.writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
