"""Custom stateful streaming operator (SURVEY.md E6 / B5): the reference's
record buffer that accumulates per shard until a record-count or byte bound
and flushes as one unit (README.md:117, 131, 258-264, 367-380).

Built on ``applyInPandasWithState``: per-shard running (count, bytes, flush_id)
state carried across micro-batches, Arrow-batched in and out. This is the only
operator in the engine that needs custom state — everything else rides
built-in windows/dedup (SURVEY.md §7 hard-point 5).

Scale: state is O(shards) tuples of three longs — independent of stream
length. Rows are processed in sequence-number order WITHIN EACH
MICRO-BATCH of a shard (README.md:53 per-shard ordering); across triggers
they are consumed in trigger order. On the real connector the two orders
coincide (Kinesis assigns sequence numbers in arrival order, and triggers
consume the shard in order), and under checkpoint replay the source WAL
pins each batch's exact composition, so flush boundaries are deterministic
and replayable either way — but a file fixture that SPLITS one shard's
out-of-order files across triggers (maxFilesPerTrigger) gets per-trigger
order only, not a global sequence sort (round-13 review: the old claim of
unconditional sequence order was stronger than the code).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# output: one row per completed flush
FLUSH_SCHEMA = "shard INT, flush_id BIGINT, n_records BIGINT, n_bytes BIGINT"
# state: running buffer per shard
STATE_SCHEMA = "count BIGINT, bytes BIGINT, flush_id BIGINT"


def make_buffer_fn(max_records: int, max_bytes: int):
    """Flush function: accumulate (count, bytes) per shard; emit a flush row
    whenever EITHER size bound is reached. A partial buffer is NOT flushed
    at micro-batch end — it carries in checkpointed state (durable, never
    lost) until later records complete it, which is the continuous-stream
    contract this operator certifies (e06's oracle counts completed
    flushes). The reference's 60 s TIME bound maps to
    GroupStateTimeout.ProcessingTimeTimeout flushing the remainder on
    expiry — a production dial this availableNow-driven harness cannot
    exercise (timeouts never fire once the backlog drains), so it is
    deliberately not wired here."""

    def buffer_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, nbytes, fid = state.get if state.exists else (0, 0, 0)
        flushes: list[tuple[int, int, int, int]] = []
        shard = key[0]
        # the iterator chunks one micro-batch's group arbitrarily: gather and
        # sort so records are consumed in sequence order (README.md:53) and
        # flush boundaries are deterministic. Batch size is bounded by the
        # trigger (maxFilesPerTrigger), so this buffers one micro-batch's
        # shard, not the stream.
        # materialize first: a generator is always truthy, so `if pdfs` would
        # pass even when empty and pd.concat([]) raises
        chunks = list(pdfs)
        batch = (
            pd.concat(chunks)
            if chunks
            else pd.DataFrame(columns=["sequence_number", "n_bytes"])
        )
        batch = batch.sort_values("sequence_number") if len(batch) else batch
        # a NULL payload arrives as NaN in the Arrow batch; int(NaN) raises
        # and kills the streaming query — count such records as 0 bytes
        # (they still occupy a record slot) instead (round-12 review)
        for sz in batch["n_bytes"].fillna(0):
            count += 1
            nbytes += int(sz)
            if count >= max_records or nbytes >= max_bytes:
                flushes.append((shard, fid, count, nbytes))
                fid += 1
                count = 0
                nbytes = 0
        state.update((count, nbytes, fid))
        yield pd.DataFrame(flushes, columns=["shard", "flush_id", "n_records", "n_bytes"])

    return buffer_fn


def start_buffer_accounting(
    env_stream: DataFrame,
    checkpoint_dir: str,
    sink_table: str,
    n_shards: int = 4,
    max_records: int = 1000,
    max_bytes: int = 1 << 40,
) -> StreamingQuery:
    """B5/E6: shard the envelope stream, run the stateful buffer, emit one
    row per completed flush (the reference's per-flush accounting lines
    "Records: 1000 / 1.38 MB", README.md:260-276)."""
    keyed = env_stream.select(
        # o_orderkey-derived shard so tests/oracles can reproduce it in SQL;
        # production keys have no numeric tail, so the non-numeric case
        # falls back to pmod(hash(partition_key), n_shards) (README.md:47)
        # via try_cast instead of an ANSI CAST_INVALID_INPUT that killed
        # the query on the first real Kinesis key (round-13 review)
        F.coalesce(
            F.element_at(F.split("partition_key", "-"), -1).try_cast("long")
            % n_shards,
            F.pmod(F.xxhash64("partition_key"), F.lit(n_shards)),
        )
        .cast("int")
        .alias("shard"),
        F.col("sequence_number"),
        F.length("data").cast("long").alias("n_bytes"),
    )
    flushed = keyed.groupBy("shard").applyInPandasWithState(
        make_buffer_fn(max_records, max_bytes),
        outputStructType=FLUSH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        flushed.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --- transformWithState (Spark 4.x successor API) ---------------------------

import threading

# serializes the session-global state-store-provider swap below
_PROVIDER_SWAP_LOCK = threading.Lock()

RUNNING_COUNT_SCHEMA = "user_id BIGINT, event_id BIGINT, seq BIGINT"


def _make_running_count_processor():
    """Build the StatefulProcessor class lazily: the import lives here so
    environments running an older Spark (no transformWithState) can still
    import this module for the applyInPandasWithState operator above."""
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import LongType, StructField, StructType

    class RunningCountProcessor(StatefulProcessor):
        """E6 on the modern API: per-user running event sequence in a
        ValueState, the 'last processed position per key' bookkeeping the
        reference keeps per shard (README.md:305-309) — here keyed state
        survives micro-batches in the RocksDB state store."""

        def init(self, handle) -> None:
            self._cnt = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            chunks = list(rows)
            if not chunks:
                return
            batch = (
                pd.concat(chunks)
                .sort_values(["ts", "event_id"])
                .reset_index(drop=True)
            )
            base = self._cnt.get()[0] if self._cnt.exists() else 0
            self._cnt.update((base + len(batch),))
            yield pd.DataFrame(
                {
                    "user_id": batch["user_id"],
                    "event_id": batch["event_id"],
                    "seq": base + pd.RangeIndex(1, len(batch) + 1),
                }
            )

        def close(self) -> None:
            pass

    return RunningCountProcessor()


def run_running_count(
    ev_stream: DataFrame, checkpoint_dir: str, sink_table: str, timeout_s: int = 300
) -> None:
    """E6 (transformWithState flavor): per-user running event count.
    Raises TimeoutError if the backlog does not drain within ``timeout_s``
    (the query is stopped first) — silently returning on timeout left an
    orphaned query running against a half-filled memory sink with no
    handle to stop it (round-12 review).

    transformWithState requires the RocksDB state store (the provider conf is
    swapped in for this query and restored after) AND a working
    ``google.protobuf`` install for its driver-side state server — gate
    callers with ``pytest.importorskip("google.protobuf.descriptor")`` or
    equivalent; ``applyInPandasWithState`` (above) is the dependency-free E6
    path and the one the registry exposes.

    The provider conf is SESSION-GLOBAL: a module lock serializes
    concurrent run_running_count calls (interleaved swap/restore otherwise
    leaked RocksDB into the session permanently — round-13 review), but a
    DIFFERENT stateful query started elsewhere on the session during this
    call still plans on RocksDB; don't start other stateful streams
    concurrently with this helper."""
    spark = ev_stream.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    with _PROVIDER_SWAP_LOCK:
        prev = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        _run_running_count_locked(spark, ev_stream, checkpoint_dir, sink_table,
                                  timeout_s, key, prev)


def _run_running_count_locked(
    spark, ev_stream, checkpoint_dir, sink_table, timeout_s, key, prev
) -> None:
    try:
        out = (
            ev_stream.select("user_id", "event_id", "ts")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_make_running_count_processor(),
                outputStructType=RUNNING_COUNT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )
        q = (
            out.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"running-count stream did not drain in {timeout_s}s; "
                f"sink table {sink_table!r} holds a partial result"
            )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
