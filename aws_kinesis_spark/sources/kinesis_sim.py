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

Resharding: ``splitAtRecord=K`` closes every parent shard after K records
and hash-splits its remainder onto two child shards; ``mergeAtRecord=K``
closes adjacent parent pairs and unions their remainders onto one child
(README.md:36 "4 shards auto-scaled", 74 "auto-scales shards in 30 s"). The
record set is unchanged either way; the streaming reader enforces Kinesis's
parent(s)-before-child drain order per lineage (see _Topology).
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from aws_kinesis_spark.sources.envelope import SEQ_BASE

_STATUS = ["O", "F", "P"]
_OPS = ["I", "U", "D"]
# tz-AWARE: PySpark's Arrow converter interprets a naive datetime in the
# host OS zone (value.astimezone(utc)), so a naive epoch shifted every
# arrival_ts by the host's UTC offset on non-UTC machines — silently
# breaking the source's byte-determinism contract and every oracle
# comparison over arrival_ts (round-12 review; verified +5 h under
# TZ=America/New_York). Instant in UTC = the documented 12:00:00Z.
_EPOCH = dt.datetime(2025, 11, 7, 12, 0, 0, tzinfo=dt.timezone.utc)


class _ShardPartition(InputPartition):
    def __init__(self, shard_id: int):
        self.shard_id = shard_id


class _Topology:
    """Shard layout, optionally after ONE reshard event — a SplitShard scale-up
    or a MergeShards scale-down (README.md:36 "4 shards auto-scaled", 74
    "auto-scales shards in 30 s").

    Without a reshard: shards 0..S-1, each holding slots 0..M-1.

    ``split_at=K`` (0 < K < M): every parent shard s is CLOSED after its
    first K records, and its remaining slots i in [K, M) land on two child
    shards S+2s (even parity) and S+2s+1 (odd parity) — the hash-range
    halving of a real SplitShard.

    ``merge_at=K`` (0 < K < M, S even): adjacent parent pairs (2p, 2p+1)
    are CLOSED after K records each; their remainders land interleaved
    (arrival order: by slot, then parent) on ONE child shard S+p — the
    hash-range union of a real MergeShards.  A merge child has TWO parents
    and must wait for both.

    Global record ids are unchanged either way (rid = parent*M + slot), so
    the record SET is identical with or without the reshard; only shard
    placement moves — exactly Kinesis's contract (resharding never loses,
    duplicates, or reorders records within a key's shard lineage)."""

    def __init__(
        self,
        n_shards: int,
        records_per_shard: int,
        split_at: int = 0,
        merge_at: int = 0,
    ):
        if n_shards < 1 or records_per_shard < 1:
            # shards=0 silently "drained" zero records on the streaming
            # path (passing any drain-based test) and crashed the batch
            # path with a bare AttributeError when pyspark substituted
            # [None] for the empty partition list (round-13 review) —
            # same silent-exhaustion class as the pollRecords<=0 guard
            raise ValueError(
                f"shards ({n_shards}) and recordsPerShard "
                f"({records_per_shard}) must be >= 1"
            )
        if split_at and merge_at:
            raise ValueError("splitAtRecord and mergeAtRecord are exclusive")
        for k, name in ((split_at, "splitAtRecord"), (merge_at, "mergeAtRecord")):
            if k and not 0 < k < records_per_shard:
                raise ValueError(f"{name} must be in (0, recordsPerShard)")
        if merge_at and n_shards % 2:
            raise ValueError("mergeAtRecord needs an even shard count")
        self.S, self.M = n_shards, records_per_shard
        self.K = split_at or merge_at
        self.mode = "split" if split_at else ("merge" if merge_at else None)

    def shard_ids(self) -> list[int]:
        n_children = {"split": 2 * self.S, "merge": self.S // 2, None: 0}[self.mode]
        return list(range(self.S + n_children))

    def parents_of(self, sid: int) -> tuple[int, ...]:
        """The closed parent(s) a child must fully drain first; () for
        original shards."""
        if sid < self.S or not self.mode:
            return ()
        c = sid - self.S
        return (c // 2,) if self.mode == "split" else (2 * c, 2 * c + 1)

    def _split_first_slot(self, sid: int) -> int:
        b = (sid - self.S) % 2
        return self.K if self.K % 2 == b else self.K + 1

    def shard_len(self, sid: int) -> int:
        if not self.mode:
            return self.M
        if sid < self.S:  # closed parent
            return self.K
        if self.mode == "merge":
            return 2 * (self.M - self.K)
        i0 = self._split_first_slot(sid)
        return 0 if i0 >= self.M else (self.M - i0 + 1) // 2

    def record_at(self, sid: int, j: int) -> tuple[int, int]:
        """(global id, original slot) of the j-th record of shard `sid`."""
        if sid < self.S or not self.mode:
            parent, slot = sid, j
        elif self.mode == "merge":
            parent = self.parents_of(sid)[j % 2]
            slot = self.K + j // 2
        else:
            parent = self.parents_of(sid)[0]
            slot = self._split_first_slot(sid) + 2 * j
        return parent * self.M + slot, slot


def _record(rid: int, slot: int):
    """The deterministic envelope record for global id `rid` at per-shard
    slot `slot` — shared by the batch reader, the streaming reader, and its
    replay path so all three emit identical bytes."""
    payload = json.dumps(
        {
            "data": {"id": rid, "status": _STATUS[rid % 3]},
            "metadata": {"op": _OPS[rid % 3]},
        },
        separators=(",", ":"),
    )
    return (
        base64.b64encode(payload.encode()),
        f"sales-orders-{rid}",
        # construct from exact int: Decimal ARITHMETIC honors the context
        # precision (default 28 digits) and silently rounds a 30-digit sum;
        # construction is always exact
        decimal.Decimal(int(SEQ_BASE) + rid),
        _EPOCH + dt.timedelta(seconds=slot),
    )


class KinesisSimDataSource(DataSource):
    """spark.read.format("kinesis_sim").option("shards", 4)
    .option("recordsPerShard", 1000).load() — also registers a STREAMING
    reader (spark.readStream.format("kinesis_sim")...) that models the
    polling consumer: each micro-batch is one bounded GetRecords poll per
    shard, offsets are per-shard consumed counts checkpointed by the
    engine (resume-exactly-after, README.md:305-309), and recovery replays
    any offset range deterministically (the retention-window replay,
    README.md:81-83)."""

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
            split_at=int(self.options.get("splitAtRecord", 0)),
            merge_at=int(self.options.get("mergeAtRecord", 0)),
        )

    def simpleStreamReader(self, schema) -> "KinesisSimStreamReader":
        return KinesisSimStreamReader(
            n_shards=int(self.options.get("shards", 4)),
            records_per_shard=int(self.options.get("recordsPerShard", 1000)),
            poll_records=int(self.options.get("pollRecords", 100)),
            consumer_mode=str(self.options.get("consumerMode", "polling")),
            arrival_sets=int(self.options.get("arrivalSets", 5)),
            split_at=int(self.options.get("splitAtRecord", 0)),
            merge_at=int(self.options.get("mergeAtRecord", 0)),
        )


class KinesisSimStreamReader(SimpleDataSourceStreamReader):
    """Consumer semantics (SURVEY.md A2/A3): offset = {shard_id:
    consumed_count}; readBetweenOffsets() regenerates any committed range
    bit-identically for recovery. Two modes:

    - ``polling`` (A2, the shared-throughput GetRecords consumer): each
      read() advances every shard by at most poll_records — the GetRecords
      limit bounds every micro-batch, however much data is waiting.
    - ``efo`` (A3, enhanced fan-out / SubscribeToShard push): records
      arrive in ``arrival_sets`` bursts per shard and each read() delivers
      ONE complete burst with NO per-poll bound — the push model where the
      subscriber receives everything the moment it arrives (the reference's
      ~70 ms vs polling latency distinction, README.md:109-111). Every EFO
      consumer has its own subscription: two streaming queries over the
      same stream each hold independent offsets and both receive the full
      stream (dedicated-throughput isolation, asserted in tests)."""

    def __init__(
        self,
        n_shards: int,
        records_per_shard: int,
        poll_records: int,
        consumer_mode: str = "polling",
        arrival_sets: int = 5,
        split_at: int = 0,
        merge_at: int = 0,
    ):
        if consumer_mode not in ("polling", "efo"):
            raise ValueError(f"unknown consumerMode: {consumer_mode!r}")
        if poll_records <= 0:
            # a zero cap made every poll return end == start, so the query
            # drained "successfully" with zero records delivered — and a
            # negative value regressed committed offsets (round-12 review)
            raise ValueError(
                f"pollRecords must be >= 1, got {poll_records} — a "
                "non-positive cap silently exhausts the stream at offset 0"
            )
        self.topo = _Topology(n_shards, records_per_shard, split_at, merge_at)
        self.poll_records = poll_records
        self.consumer_mode = consumer_mode
        self.arrival_sets = max(1, arrival_sets)

    def initialOffset(self) -> dict:
        # TRIM_HORIZON: start at the oldest retained record of every shard
        # (child shards appear at offset 0, gated behind their parent)
        return {str(s): 0 for s in self.topo.shard_ids()}

    def _rows(self, start: dict, end: dict):
        for s in self.topo.shard_ids():
            lo, hi = int(start.get(str(s), 0)), int(end.get(str(s), 0))
            for j in range(lo, hi):
                yield _record(*self.topo.record_at(s, j))

    def _next_offset(self, sid: int, cur: int, start: dict) -> int:
        for parent in self.topo.parents_of(sid):
            if str(parent) not in start:
                # a checkpoint written under a different topology (e.g.
                # restarted with new shards/splitAtRecord options) lacks
                # the parent's offset — fail with the actual cause, not a
                # bare KeyError escaping from read() (round-12 review)
                raise ValueError(
                    f"checkpoint offsets have no entry for shard {parent} "
                    f"(parent of {sid}): the checkpoint predates this "
                    "stream topology — use a fresh checkpoint when "
                    "changing shards/splitAtRecord/mergeAtRecord"
                )
            if int(start[str(parent)]) < self.topo.shard_len(parent):
                # Kinesis reshard contract: a child shard may not be consumed
                # until its closed parent(s) are fully drained — this
                # preserves per-key ordering across the shard lineage
                return cur
        n = self.topo.shard_len(sid)
        if self.consumer_mode == "efo":
            # push: deliver the whole next arrival burst, no poll bound
            step = -(-n // self.arrival_sets) if n else 1
            return min((cur // step + 1) * step, n)
        return min(cur + self.poll_records, n)

    def read(self, start: dict):
        # the other direction of the topology-mismatch guard (round-13
        # review, live-repro'd): a committed offset EXCEEDING the current
        # topology's shard length means the checkpoint was written under a
        # topology with more records per shard — min(cur+poll, shard_len)
        # would silently REGRESS the committed offset (end < start) and
        # child shards would re-deliver records the old topology already
        # served. Same remedy as the missing-parent case: fail with the
        # cause, never dedupe-by-luck.
        for s in self.topo.shard_ids():
            cur = int(start.get(str(s), 0))
            if cur > self.topo.shard_len(s):
                raise ValueError(
                    f"checkpoint offset {cur} for shard {s} exceeds this "
                    f"topology's shard length {self.topo.shard_len(s)}: the "
                    "checkpoint predates this stream topology — use a fresh "
                    "checkpoint when changing shards/splitAtRecord/"
                    "mergeAtRecord"
                )
        # the THIRD topology-mismatch direction (round-13 review,
        # live-repro'd): a checkpoint carrying offsets for shards ABSENT
        # from this topology (a reshard option removed, shard count
        # lowered) — silently ignoring them re-delivers records the
        # missing shards already served (the parents' post-split slots
        # replay as duplicates). Same remedy: fail with the cause.
        known = {str(s) for s in self.topo.shard_ids()}
        stray = sorted(k for k in start if k not in known)
        if stray:
            raise ValueError(
                f"checkpoint offsets name shards {stray} that do not exist "
                "in this topology: the checkpoint predates this stream "
                "topology — use a fresh checkpoint when changing shards/"
                "splitAtRecord/mergeAtRecord"
            )
        end = {
            str(s): self._next_offset(s, int(start.get(str(s), 0)), start)
            for s in self.topo.shard_ids()
        }
        # an ITERATOR per the SimpleDataSourceStreamReader contract: on an
        # empty poll (end == start, stream exhausted) the engine probes
        # next(it)/StopIteration to verify the offset legitimately did not
        # advance — a list here fails that probe with TypeError
        return iter(list(self._rows(start, end))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start, end)

    def commit(self, end: dict) -> None:
        # source-side checkpointing is the engine's job; the simulated
        # stream retains everything (no trim on commit)
        pass


class KinesisSimReader(DataSourceReader):
    def __init__(
        self,
        n_shards: int,
        records_per_shard: int,
        split_at: int = 0,
        merge_at: int = 0,
    ):
        self.topo = _Topology(n_shards, records_per_shard, split_at, merge_at)

    def partitions(self):
        # one InputPartition per shard, closed parents AND children — a
        # batch scan reads the whole retained stream across the reshard
        return [_ShardPartition(s) for s in self.topo.shard_ids()]

    def read(self, partition: _ShardPartition):
        s = partition.shard_id
        for j in range(self.topo.shard_len(s)):
            yield _record(*self.topo.record_at(s, j))


def register(spark) -> None:
    """Idempotently register the format on this session."""
    spark.dataSource.register(KinesisSimDataSource)
