"""A Python DataSource V2 ("kinesis_sim") that replays a simulated Kinesis
stream as a first-class Spark source (SURVEY.md A1; reference README.md:44-53,
222-252).

This upgrades the file-replay stand-in to real source plumbing: the registered
format participates in Spark's reader machinery with one ``InputPartition``
PER SHARD — the exact parallelism model of the stream it simulates (one
GetRecords iterator per shard, records ordered by sequence number within a
shard, README.md:47, 53). Executors generate their shard's records
independently; nothing flows through the driver.

The record stream is fully deterministic (shard s, slot i):

    id           = s * records_per_shard + i
    status       = O/F/P cycling on id (the orders-fixture status codes)
    op           = I/U/D cycling on id        (README.md:224 CDC op)
    PartitionKey = sales-orders-<id>          (README.md:225 composite key)
    SequenceNumber = SEQ_BASE + id            (30-digit decimal, README.md:238)
    arrival_ts   = 2025-11-07T12:00:00Z + i seconds

so a DuckDB ``range()`` oracle reproduces the decoded table exactly — the
simulated source is differential-testable like every other operator.
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from aws_kinesis_spark.sources.envelope import SEQ_BASE

_STATUS = ["O", "F", "P"]
_OPS = ["I", "U", "D"]
_EPOCH = dt.datetime(2025, 11, 7, 12, 0, 0)


class _ShardPartition(InputPartition):
    def __init__(self, shard_id: int):
        self.shard_id = shard_id


class KinesisSimDataSource(DataSource):
    """spark.read.format("kinesis_sim").option("shards", 4)
    .option("recordsPerShard", 1000).load()"""

    @classmethod
    def name(cls) -> str:
        return "kinesis_sim"

    def schema(self) -> str:
        # the envelope, 1:1 with ENVELOPE_SCHEMA / the connector surface
        return (
            "data binary, partition_key string, "
            "sequence_number decimal(38,0), arrival_ts timestamp"
        )

    def reader(self, schema) -> "KinesisSimReader":
        return KinesisSimReader(
            n_shards=int(self.options.get("shards", 4)),
            records_per_shard=int(self.options.get("recordsPerShard", 1000)),
        )


class KinesisSimReader(DataSourceReader):
    def __init__(self, n_shards: int, records_per_shard: int):
        self.n_shards = n_shards
        self.records_per_shard = records_per_shard

    def partitions(self):
        return [_ShardPartition(s) for s in range(self.n_shards)]

    def read(self, partition: _ShardPartition):
        m = self.records_per_shard
        for i in range(m):
            rid = partition.shard_id * m + i
            payload = json.dumps(
                {
                    "data": {"id": rid, "status": _STATUS[rid % 3]},
                    "metadata": {"op": _OPS[rid % 3]},
                },
                separators=(",", ":"),
            )
            yield (
                base64.b64encode(payload.encode()),
                f"sales-orders-{rid}",
                # construct from exact int: Decimal ARITHMETIC honors the
                # context precision (default 28 digits) and silently rounds
                # a 30-digit sum; construction is always exact
                decimal.Decimal(int(SEQ_BASE) + rid),
                _EPOCH + dt.timedelta(seconds=i),
            )


def register(spark) -> None:
    """Idempotently register the format on this session."""
    spark.dataSource.register(KinesisSimDataSource)
