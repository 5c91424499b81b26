"""Streaming parity queries (SURVEY.md §2.E): each runs a real Structured
Streaming query (availableNow trigger) and returns its result as a batch
DataFrame, so the driver's DuckDB oracle can verify that the streaming
engine produces exactly the batch-SQL answer.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_spark.registry import register
from aws_kinesis_spark.sources.envelope import synthesize_envelope
from aws_kinesis_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    _file_stream,
    envelope_stream,
    event_stream,
    start_lake_path,
    start_stream_dedup,
    start_stream_static_join,
    start_windowed_agg,
)
from aws_kinesis_spark.tables import load


_TMP_ROOT = tempfile.mkdtemp(prefix=f"kinesis_stream_{os.getpid()}_")
atexit.register(shutil.rmtree, _TMP_ROOT, ignore_errors=True)


def _tmp(prefix: str) -> str:
    """Per-invocation scratch (checkpoints, sinks, per-call indexes):
    deterministic per (process, prefix), WIPED on reuse, and the whole
    root removed at interpreter exit — a bench/differential loop
    re-invoking a streaming query overwrites one tree instead of leaking
    an events-sized fixture + checkpoint per invocation (the
    pipeline_queries._scratch discipline; round-12 review). Callers must
    fully materialize results before re-invoking the same query. Fixture
    dirs that must SURVIVE reuse use a unique per-(kind, sf) prefix plus
    an isdir-checked cache, so they are only re-entered on rebuild."""
    d = os.path.join(_TMP_ROOT, prefix)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _sf_tag(sf_dir: str) -> str:
    """Collision-proof per-sf_dir fixture tag: basename for readability
    plus a hash of the FULL resolved path (two sf dirs named alike must
    not share a fixture path — the _envelope_fixture precedent)."""
    import hashlib

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{base}-{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}"


def _sink(spark, name: str) -> str:
    """Deterministic memory-sink name with the PREVIOUS run's sink dropped
    at entry (the a03/_scratch wipe-on-reuse discipline, round-13 review):
    a uuid-named sink per invocation materialized the full query result
    into a NEW session-lifetime temp table every run — a bench loop held
    every prior run's result in driver memory with no release point."""
    spark.catalog.dropTempView(name)
    return name


def _drain_continuous(q, timeout_s: int = 300) -> None:
    """Bounded drain for a processingTime-trigger query (Python streaming
    sources do not support availableNow): processAllAvailable on a worker
    thread with a join timeout, then stop — an unbounded
    processAllAvailable hung the whole harness forever on a wedged stream
    where every availableNow query gets _drain's 300 s stop-and-raise
    (round-13 review). The query is stopped in EVERY exit path."""
    import threading

    t = threading.Thread(target=q.processAllAvailable, daemon=True)
    t.start()
    t.join(timeout_s)
    timed_out = t.is_alive()
    q.stop()
    if timed_out:
        raise TimeoutError(
            f"continuous streaming query did not drain within {timeout_s}s; "
            "the sink holds a partial result"
        )


def _drain(q, timeout_s: int = 300) -> None:
    """Fully drain an availableNow query before its sink is read.
    awaitTermination(timeout) returns False on timeout — it does NOT
    raise — so ignoring the return read a PARTIAL sink as the query's
    answer (a spurious correctness divergence) while the orphaned query
    kept running and mutating it (round-12 review). Stop and fail loudly
    instead: a timeout here is a host problem, not a wrong answer."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query did not drain within {timeout_s}s; the sink "
            "holds a partial result"
        )


# per-process cache of g35's deterministic arrival fixture (sf_dir -> path)
_G35_FIXTURES: dict[str, str] = {}


def _stamp_hive_dir_mtimes(inp: str) -> None:
    """Pin file-source arrival order = hive-dir order: dir q=i's files get
    mtime i*1000, so the oldest-first file source replays the quarters in
    order even though ONE write job landed them all. Shared by g35 and b12
    (round-12 review: two inline copies of the protocol drift when one is
    fixed)."""
    for qdir in sorted(d for d in os.listdir(inp) if d.startswith("q=")):
        i = int(qdir.split("=")[1])
        for f in os.listdir(os.path.join(inp, qdir)):
            if f.endswith(".parquet"):
                os.utime(os.path.join(inp, qdir, f), (i * 1000, i * 1000))

# per-process cache of b12's deterministic arrival fixture (sf_dir -> path)
_B12_FIXTURES: dict[str, str] = {}

# per-process cache of the sentinel fixtures ((variant, sf_dir) -> (path, n))
_SENTINEL_FIXTURES: dict[tuple[str, str], tuple[str, int]] = {}


def _events_with_flush_sentinel(
    spark: SparkSession,
    sf_dir: str,
    variant: str = "flush",
    sentinel_rows=None,
) -> tuple[str, int]:
    """Write the events fixture plus far-future sentinel event(s) in a
    strictly LATER file-source batch (explicit mtimes, same technique as
    e04's golden trace).

    This is what lets e01-e03 run in APPEND output mode — the scale-safe
    form where the watermark closes each window exactly once — yet still
    emit EVERY real window over a finite fixture: the sentinel advances the
    watermark a year past the data, closing all real windows; its own
    window stays open forever and is therefore never emitted. Returns
    (input_dir, n_fixture_files) so the caller can set maxFilesPerTrigger
    = n_fixture_files, putting the sentinel in its own micro-batch (the
    watermark used to emit batch N's windows is the one computed from data
    through batch N-1).

    ``sentinel_rows`` (a callable of the far-future timestamp returning
    EVENTS_SCHEMA tuples) customizes the sentinel set — e11's outer join
    needs one per stream side, and sharing this builder keeps the
    arrival-order-pinning protocol in ONE place (round-12 review: an
    inline copy would drift when the technique is fixed here). The fixture
    is a pure function of (variant, sf_dir) and cached per process — the
    input dir is read-only to every consumer (checkpoints live in each
    call's own scratch), so rebuilding it per invocation just charged the
    measured streaming operator for input prep."""
    import datetime as dt

    key = (variant, sf_dir)
    hit = _SENTINEL_FIXTURES.get(key)
    if hit is not None and os.path.isdir(hit[0]):
        return hit
    inp = os.path.join(_tmp(f"evfix-{variant}-{_sf_tag(sf_dir)}"), "events")
    ev = load(spark, sf_dir, "events")
    ev.repartition(3).write.mode("overwrite").parquet(inp)
    fixture = {f for f in os.listdir(inp) if f.endswith(".parquet")}
    for f in fixture:
        os.utime(os.path.join(inp, f), (1_700_000_000, 1_700_000_000))
    far = ev.agg(F.max("ts")).first()[0] + dt.timedelta(days=365)
    rows = (
        sentinel_rows(far)
        if sentinel_rows is not None
        else [(-1, far, -1, "__flush", 0.0, "{}")]
    )
    spark.createDataFrame(rows, EVENTS_SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(inp)
    for f in os.listdir(inp):
        if f.endswith(".parquet") and f not in fixture:
            os.utime(os.path.join(inp, f), (1_700_000_100, 1_700_000_100))
    _SENTINEL_FIXTURES[key] = (inp, len(fixture))
    return inp, len(fixture)


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
    hourly rollup — in APPEND mode: each window is emitted once when the
    watermark closes it (the flush sentinel closes the trailing windows)."""
    root = _tmp("e01")
    inp, nfiles = _events_with_flush_sentinel(spark, sf_dir)
    tbl = _sink(spark, "e01_sink")
    q = start_windowed_agg(
        event_stream(spark, inp, max_files_per_trigger=nfiles),
        os.path.join(root, "ckpt"),
        tbl,
        window_duration="1 hour",
    )
    _drain(q)
    return (
        spark.table(tbl)
        .filter(F.col("event_type") != "__flush")
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "e02_stream_sliding_window",
    oracle="""
        SELECT CAST(ws AS TIMESTAMP) AS window_start,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM (SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                             date_trunc('hour', ts)]) AS ws,
                     value
              FROM events)
        GROUP BY 1
    """,
)
def e02_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming aggregation (SURVEY.md E2; the reference's
    1-min enhanced metrics over a continuous stream, README.md:64): 2 h
    windows sliding by 1 h — every event lands in exactly two windows, which
    is what the oracle's unnest of the two candidate starts replicates.
    Append mode: the flush sentinel closes every real window; the
    sentinel's own two windows stay open and never emit, but its groupBy
    key is shared with real events (no event_type in the key), so its two
    far-future window rows can never collide with a real window anyway."""
    root = _tmp("e02")
    inp, nfiles = _events_with_flush_sentinel(spark, sf_dir)
    tbl = _sink(spark, "e02_sink")
    q = start_windowed_agg(
        event_stream(spark, inp, max_files_per_trigger=nfiles),
        os.path.join(root, "ckpt"),
        tbl,
        window_duration="2 hours",
        slide="1 hour",
    )
    _drain(q)
    return spark.table(tbl).select(
        F.col("w.start").alias("window_start"), "n_events", "sum_value"
    )


@register(
    "e03_stream_session_window",
    oracle="""
        WITH brk AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM brk
        )
        SELECT user_id,
               CAST(min(ts) AS TIMESTAMP) AS session_start,
               CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM sess
        GROUP BY user_id, sid
    """,
)
def e03_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window streaming aggregation (SURVEY.md E3, clickstream
    sessionization): 30 min inactivity gap per user. The oracle is the
    classic gaps-and-islands rewrite — a new session starts exactly when the
    gap >= 30 min, and session_end = last event + gap, matching Spark's
    half-open session_window semantics. Append mode: the watermark (pushed
    by the flush sentinel, whose user_id=-1 session stays open and never
    emits) closes every real session exactly once."""
    root = _tmp("e03")
    inp, nfiles = _events_with_flush_sentinel(spark, sf_dir)
    tbl = _sink(spark, "e03_sink")
    q = start_windowed_agg(
        event_stream(spark, inp, max_files_per_trigger=nfiles),
        os.path.join(root, "ckpt"),
        tbl,
        session_gap="30 minutes",
    )
    _drain(q)
    return (
        spark.table(tbl)
        .filter(F.col("user_id") != -1)
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "e04_stream_late_data",
    oracle="""
        SELECT * FROM (VALUES
            (TIMESTAMP '2025-11-07 10:00:00', 2),
            (TIMESTAMP '2025-11-07 12:00:00', 2)
        ) AS t(window_start, n_events)
    """,
)
def e04_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / late-data semantics (SURVEY.md E4; README.md:48, 156) as
    a golden trace, the reference's own test style (README.md:554-559):
    controlled micro-batches where one event arrives after the watermark
    passed its window. Expected output is fully determined: the 10:00
    window closes with its 2 on-time events (late event dropped), the
    12:00 window with its 2; the 13:00 window stays open at stream end."""
    import datetime as dt

    schema = EVENTS_SCHEMA

    def batch(*hm):
        return [
            (i, dt.datetime(2025, 11, 7, h, m), 1, "error", 1.0, "{}")
            for i, (h, m) in enumerate(hm)
        ]

    root = _tmp("e04")
    inp = os.path.join(root, "ev")

    # the file source replays files in modification-time order; stamp each
    # batch's files with explicit, strictly increasing mtimes so the replay
    # order is deterministic (sleeping between writes flakes on slow I/O)
    stamped: set[str] = set()

    def stamp(epoch: int) -> None:
        for f in os.listdir(inp):
            if f.endswith(".parquet") and f not in stamped:
                os.utime(os.path.join(inp, f), (epoch, epoch))
                stamped.add(f)

    # watermark becomes operative one batch after it advances, so the late
    # file is two batch boundaries after the 12:30 advancer
    # repartition(1), not coalesce(1): coalescing a row-list local
    # relation chains its ~parallelism pickled partitions into ONE task's
    # sequential python-worker round-trips (~5 s measured for tiny data);
    # repartition evaluates them in parallel and shuffles 3 rows
    spark.createDataFrame(batch((10, 5), (10, 40), (12, 30)), schema).repartition(
        1
    ).write.mode("overwrite").parquet(inp)
    stamp(1_700_000_000)
    spark.createDataFrame(batch((12, 45)), schema).repartition(1).write.mode(
        "append"
    ).parquet(inp)
    stamp(1_700_000_100)
    spark.createDataFrame(batch((10, 15), (13, 30)), schema).repartition(1).write.mode(
        "append"
    ).parquet(inp)
    stamp(1_700_000_200)

    agg = (
        event_stream(spark, inp, max_files_per_trigger=1)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    tbl = _sink(spark, "e04_sink")
    q = (
        agg.writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(tbl).select(F.col("w.start").alias("window_start"), "n_events")


@register(
    "e06_stream_stateful_buffer",
    oracle="""
        WITH env AS (
            SELECT o_orderkey % 4 AS shard,
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + o_orderkey AS DECIMAL(38,0)) AS seq,
                   length(to_base64(encode(
                       '{"data":{"id":' || o_orderkey || ',"status":"' || o_orderstatus
                       || '"},"metadata":{"op":"'
                       || CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END
                       || '"}}'))) AS n_bytes
            FROM orders
        ),
        r AS (
            SELECT shard, n_bytes,
                   row_number() OVER (PARTITION BY shard ORDER BY seq) - 1 AS rn
            FROM env
        ),
        g AS (
            SELECT shard, rn // 500 AS flush_id,
                   count(*) AS n_records,
                   CAST(sum(n_bytes) AS BIGINT) AS n_bytes  -- hugeint->float in pandas otherwise
            FROM r GROUP BY 1, 2
        )
        SELECT shard, flush_id, n_records, n_bytes FROM g WHERE n_records = 500
    """,
)
def e06_stream_stateful_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (SURVEY.md E6/B5): per-shard record buffer
    with a 500-record flush bound via applyInPandasWithState — the
    reference's buffer accounting ("Records: 1000 / 1.38 MB",
    README.md:258-276). The oracle reconstructs the flush boundaries with a
    row_number partition walk; only completed flushes are emitted (the
    trailing partial buffer stays in state, exactly like an unflushed
    Firehose buffer)."""
    from aws_kinesis_spark.streaming.stateful import start_buffer_accounting

    root = _tmp("e06")
    inp = os.path.join(root, "input")
    synthesize_envelope(load(spark, sf_dir, "orders")).repartition(4).write.mode(
        "overwrite"
    ).parquet(inp)
    tbl = _sink(spark, "e06_sink")
    q = start_buffer_accounting(
        envelope_stream(spark, inp),
        os.path.join(root, "ckpt"),
        tbl,
        n_shards=4,
        max_records=500,
    )
    _drain(q)
    return spark.table(tbl)


@register(
    "e07_stream_static_join",
    oracle="""
        SELECT o.o_orderkey AS id,
               o.o_orderstatus AS status,
               CASE o.o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
               c.c_name AS c_name,
               n.n_name AS n_name
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def e07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (SURVEY.md E7): the CDC order stream joins a
    broadcast customer->nation dimension; the dim-dim join happens once,
    statically, before the stream starts."""
    root = _tmp("e07")
    inp = os.path.join(root, "input")
    synthesize_envelope(load(spark, sf_dir, "orders")).repartition(4).write.mode(
        "overwrite"
    ).parquet(inp)
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    dim = (
        orders.select(F.col("o_orderkey").alias("id"), "o_custkey")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("id", "c_name", "n_name")
    )
    tbl = _sink(spark, "e07_sink")
    q = start_stream_static_join(
        envelope_stream(spark, inp, max_files_per_trigger=2),
        dim,
        os.path.join(root, "ckpt"),
        tbl,
    )
    _drain(q)
    return spark.table(tbl)


@register(
    "e09_continuous_rollup",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def e09_continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate (D9+A7 composed): the hourly rollup maintained
    incrementally across micro-batches via versioned merge-and-swap; after
    the stream drains, the materialized table equals the batch rollup of
    all events — the TimescaleDB-style continuous-aggregate contract."""
    from aws_kinesis_spark.streaming.rollup import read_rollup, start_continuous_rollup

    root = _tmp("e09")
    inp = os.path.join(root, "events")
    load(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(inp)
    q = start_continuous_rollup(
        event_stream(spark, inp, max_files_per_trigger=2),
        os.path.join(root, "rollup"),
        os.path.join(root, "ckpt"),
    )
    _drain(q)
    out = read_rollup(spark, os.path.join(root, "rollup"))
    return out.select(
        "hour_start", "event_type", "n_events", F.round("sum_value", 4).alias("sum_value")
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
    # explicit mtimes pin micro-batch order = write order (the e01-e04
    # technique): with a 365-day dedup watermark against a multi-year
    # arrival_ts span, an mtime TIE between the two writes could mix both
    # copies' files into batch 1 — advancing the watermark before batch 2's
    # first occurrences arrive, which then drop as late (round-12 review)
    first = {f for f in os.listdir(inp) if f.endswith(".parquet")}
    for f in first:
        os.utime(os.path.join(inp, f), (1_700_000_000, 1_700_000_000))
    env.repartition(2).write.mode("append").parquet(inp)  # replayed producer batch
    for f in os.listdir(inp):
        if f.endswith(".parquet") and f not in first:
            os.utime(os.path.join(inp, f), (1_700_000_100, 1_700_000_100))
    tbl = _sink(spark, "e05_sink")
    q = start_stream_dedup(
        envelope_stream(spark, inp, max_files_per_trigger=2),
        os.path.join(root, "ckpt"),
        tbl,
    )
    _drain(q)
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
    _drain(q)
    return spark.read.parquet(os.path.join(lake, "data")).select(
        "id", "status", "op", "partition_key"
    )


def _attribution_join(
    spark: SparkSession, inp: str, how: str, nfiles: int | None = None
) -> DataFrame:
    """THE click->purchase attribution join shared by e10 (inner) and e11
    (left outer) — one copy of the stream construction, watermarks, and
    the 30-minute interval condition (round-13 review: the two queries
    carried ~45 verbatim lines each, so a condition or watermark fix in
    one would silently drift the other)."""
    clicks = (
        event_stream(spark, inp, max_files_per_trigger=nfiles)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        event_stream(spark, inp, max_files_per_trigger=nfiles)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        how,
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
    )


@register(
    "e10_stream_stream_join",
    oracle="""
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id,
               round(p.value, 4) AS purchase_value
        FROM events c
        JOIN events p
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def e10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join (SURVEY.md §2.E extension; the attribution
    join: each click joined to the same user's purchases within 30 min).
    Both sides are real file streams with event-time watermarks and a time
    -interval join condition, so the state store holds only a bounded
    30-minute-plus-watermark window per side — the scale-safe
    stream-stream shape. Inner-join emission is match-driven (not
    watermark-gated), so the availableNow drain produces exactly the
    batch join; the oracle is that batch join."""
    root = _tmp("e10")
    inp = os.path.join(root, "events")
    load(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(inp)
    joined = _attribution_join(spark, inp, "inner")
    tbl = _sink(spark, "e10_sink")
    q = (
        joined.writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(tbl)


@register(
    "e11_stream_stream_outer_join",
    oracle="""
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id,
               round(p.value, 4) AS purchase_value
        FROM events c
        LEFT JOIN events p
          ON p.event_type = 'purchase'
         AND p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click'
    """,
)
def e11_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: unlike e10's inner form, the
    null-extended rows (clicks with no purchase in the window) can only be
    emitted when the WATERMARK proves no future match can arrive — the
    genuinely stateful outer-join semantics. Far-future sentinel events on
    BOTH streams (the join watermark is the min of the two sides) push the
    watermark past every real click so all outer rows flush; the
    sentinels' own rows are filtered out. Oracle is the batch left join."""
    root = _tmp("e11")
    # the shared sentinel builder, with one far-future sentinel per stream
    # side (the join watermark is the min of the two sides' watermarks)
    inp, nfiles = _events_with_flush_sentinel(
        spark,
        sf_dir,
        variant="e11",
        sentinel_rows=lambda far: [
            (-1, far, -1, "click", 0.0, "{}"),
            (-2, far, -1, "purchase", 0.0, "{}"),
        ],
    )

    joined = _attribution_join(spark, inp, "left_outer", nfiles=nfiles)
    tbl = _sink(spark, "e11_sink")
    q = (
        joined.writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(tbl).filter(F.col("user_id") != -1)


@register(
    "e12_stream_stream_join_kinesis_source",
    oracle="""
        WITH recs AS (
            SELECT i AS id,
                   TIMESTAMP '2025-11-07 12:00:00'
                       + (i % 500) * INTERVAL 1 SECOND AS ts
            FROM (SELECT unnest(range(0, 2000)) AS i)
        ),
        clicks AS (SELECT id, id % 50 AS user_id, ts FROM recs WHERE id % 3 = 0),
        purchases AS (SELECT id, id % 50 AS user_id, ts FROM recs WHERE id % 3 = 1)
        SELECT c.id AS click_id,
               p.id AS purchase_id,
               c.user_id,
               p.ts AS purchase_ts
        FROM clicks c
        JOIN purchases p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 SECOND
    """,
)
def e12_stream_stream_join_kinesis_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM join fed by the kinesis_sim STREAMING source — the
    composition a real pipeline runs (README.md:30-32: two independent
    consumers over one stream): two readStream.format("kinesis_sim")
    instances poll the same simulated stream with per-shard offsets
    (sources/kinesis_sim.py), each side decodes the envelope through the
    production decode stage, and the attribution join (clicks to the same
    user's purchases within 30 s of event time) runs with watermarks
    bounding both state stores.

    The drain uses processAllAvailable over a processingTime trigger —
    Python streaming sources do not support Trigger.AvailableNow (the
    engine logs a single-batch fallback), so the finite stream is drained
    by successive bounded polls, exactly as the infinite production stream
    would be. Inner-join emission is match-driven, so the drained result
    equals the batch join; the oracle regenerates the deterministic stream
    with a SQL range()."""
    from aws_kinesis_spark.sources import kinesis_sim
    from aws_kinesis_spark.sources.envelope import decode_envelope

    kinesis_sim.register(spark)
    root = _tmp("e12")

    def side(op: str, id_alias: str, ts_alias: str):
        raw = (
            spark.readStream.format("kinesis_sim")
            .option("shards", 4)
            .option("recordsPerShard", 500)
            .option("pollRecords", 200)
            .load()
        )
        return (
            decode_envelope(raw)
            .filter(F.col("op") == op)
            .select(
                F.col("id").alias(id_alias),
                (F.col("id") % 50).alias(f"{id_alias}_user"),
                F.col("arrival_ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "10 minutes")
        )

    clicks = side("I", "click_id", "click_ts")
    purchases = side("U", "purchase_id", "purchase_ts")
    joined = clicks.join(
        purchases,
        (F.col("click_id_user") == F.col("purchase_id_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 SECONDS")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("click_id_user").alias("user_id"),
        "purchase_ts",
    )
    tbl = _sink(spark, "e12_sink")
    q = (
        joined.writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain_continuous(q)
    return spark.table(tbl)


@register(
    "e13_stream_reshard_drain",
    oracle="""
        SELECT CAST(i % 3 AS VARCHAR) AS op_bucket,
               count(*) AS n,
               CAST(min(i) AS BIGINT) AS min_id,
               CAST(max(i) AS BIGINT) AS max_id
        FROM (SELECT unnest(range(0, 1200)) AS i)
        GROUP BY i % 3
    """,
)
def e13_stream_reshard_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 x resharding through the FULL streaming stack: the simulated
    stream is split mid-retention (splitAtRecord — README.md:36's shard
    auto-scaling), so the polling consumer must drain closed parents, hold
    every child at offset 0 until its parent lineage is exhausted, then
    drain the children — all under engine-checkpointed per-shard offsets
    (sources/kinesis_sim.py:_Topology). The drained aggregate proves
    exactly-once across the reshard: every record id 0..1199 appears once,
    per op bucket, or the counts/min/max cannot match the range() oracle."""
    from aws_kinesis_spark.sources import kinesis_sim
    from aws_kinesis_spark.sources.envelope import decode_envelope

    kinesis_sim.register(spark)
    root = _tmp("e13")
    raw = (
        spark.readStream.format("kinesis_sim")
        .option("shards", 3)
        .option("recordsPerShard", 400)
        .option("splitAtRecord", 150)
        .option("pollRecords", 100)
        .load()
    )
    decoded = decode_envelope(raw).select(
        "id", (F.col("id") % 3).cast("string").alias("op_bucket")
    )
    tbl = _sink(spark, "e13_sink")
    q = (
        decoded.writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain_continuous(q)
    return (
        spark.table(tbl)
        .groupBy("op_bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )


@register(
    "o08_stream_scd2",
    oracle="""
        WITH cdc AS (
            SELECT o_orderkey AS id, o_orderstatus AS status,
                   CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + o_orderkey AS DECIMAL(38,0)) AS seq
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'U2', 'U',
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + 1000000000 + o_orderkey AS DECIMAL(38,0))
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, 'D',
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + 2000000000 + o_orderkey AS DECIMAL(38,0))
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        versioned AS (
            SELECT id, status, op,
                   CAST(seq AS VARCHAR) AS valid_from,
                   CAST(lead(seq) OVER (PARTITION BY id ORDER BY seq) AS VARCHAR)
                       AS valid_to,
                   lead(seq) OVER (PARTITION BY id ORDER BY seq) IS NULL AS is_current
            FROM cdc
        )
        SELECT id, status, valid_from, valid_to, is_current
        FROM versioned WHERE op <> 'D'
    """,
)
def o08_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 maintained INCREMENTALLY over the real stream: the three
    producer epochs (initial ops, update wave, delete wave) arrive as
    file micro-batches in ARBITRARY order relative to epochs, and
    start_scd2_maintenance folds each into the versioned dimension by
    rebuilding only the touched keys' chains from their exact event sets
    (streaming/pipeline.py, operators/upsert.py:scd2_merge_increment).
    Parity with o05's whole-log oracle is the order-independence proof:
    the incrementally-maintained table equals the batch recompute."""
    from aws_kinesis_spark.streaming.pipeline import (
        SCD2_SCHEMA,
        read_warehouse_table,
        start_scd2_maintenance,
    )

    root = _tmp("o08")
    inp = os.path.join(root, "input")
    o = load(spark, sf_dir, "orders")
    synthesize_envelope(o, epoch=0).repartition(2).write.mode("overwrite").parquet(inp)
    synthesize_envelope(
        o.filter(F.col("o_orderkey") % 5 == 0).withColumn("o_orderstatus", F.lit("U2")),
        epoch=1,
        force_op="U",
    ).repartition(2).write.mode("append").parquet(inp)
    synthesize_envelope(
        o.filter(F.col("o_orderkey") % 10 == 0), epoch=2, force_op="D"
    ).repartition(2).write.mode("append").parquet(inp)

    table_dir = os.path.join(root, "dim")
    q = start_scd2_maintenance(
        envelope_stream(spark, inp, max_files_per_trigger=2),
        table_dir,
        os.path.join(root, "ckpt"),
    )
    _drain(q)
    dim = read_warehouse_table(spark, table_dir, empty_schema=SCD2_SCHEMA)
    return dim.filter(F.col("op") != "D").select(
        "id",
        "status",
        F.col("__valid_from").cast("string").alias("valid_from"),
        F.col("__valid_to").cast("string").alias("valid_to"),
        F.col("__is_current").alias("is_current"),
    )


@register(
    "g35_stream_dedup_ingest",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ),
        sh AS (SELECT doc_id,
                      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in range(1, len(w) - 1)]) AS s
               FROM toks),
        dropped AS (
            SELECT DISTINCT b.doc_id
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
        )
        SELECT d.doc_id, d.source, d.lang
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
)
def g35_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G20 made CONTINUOUS: near-dup dedup AT INGEST — the document
    stream lands with kept/dropped verdicts against a standing LSH band
    index that grows with the corpus (streaming/pipeline.py:
    start_dedup_ingest). Files arrive in doc_id order (one per trigger),
    so first-occurrence-wins is deterministic; parity with the all-pairs
    oracle (a doc survives iff NO smaller-id near-dup exists anywhere)
    proves the standing index reaches full recall batch after batch.
    Per batch the corpus is never re-signed: O(batch + candidates)."""
    from aws_kinesis_spark.streaming.pipeline import (
        read_dedup_corpus,
        start_dedup_ingest,
    )

    root = _tmp("g35")
    d = load(spark, sf_dir, "documents")
    # the arrival fixture is a pure function of the input table — build it
    # once per sf_dir and reuse across repeat calls (bench reruns); the
    # INDEX and CHECKPOINT are fresh per call, so the measured operator —
    # the streaming ingest itself — always starts from an empty state
    inp = _G35_FIXTURES.get(sf_dir)
    if inp is None or not os.path.isdir(inp):
        # sf-tagged fixture prefix: _tmp wipes on prefix reuse, so a
        # second sf_dir building under the SAME prefix would clobber the
        # first fixture behind its still-live cache entry
        inp = os.path.join(_tmp(f"g35fix-{_sf_tag(sf_dir)}"), "input")
        hi = d.agg(F.max("doc_id").alias("m")).first()["m"] + 1
        # ONE write job lands all four arrival quarters (hive dirs q=0..3);
        # per-dir mtimes then pin arrival order = id order (the file source
        # processes oldest-first), exactly as the four sequential writes did
        (
            d.withColumn("q", (F.col("doc_id") * 4 / hi).cast("int"))
            .repartition(4, "q")
            .write.partitionBy("q")
            .mode("overwrite")
            .parquet(inp)
        )
        _stamp_hive_dir_mtimes(inp)
        _G35_FIXTURES[sf_dir] = inp
    stream = _file_stream(
        spark, d.schema, inp, max_files_per_trigger=1, recursive_file_lookup=True
    )
    idx = os.path.join(root, "index")
    # compact_every=2 exercises the index-folding path inside the 4-batch
    # ingest (batch 2 folds batches 0-1); the verdicts must be unchanged.
    # n_buckets=16 suits the fixture: a 1250-doc batch touches every
    # bucket regardless, so finer buckets buy no pruning here and only
    # multiply per-trigger file count (64 is the documented scale default)
    q = start_dedup_ingest(
        stream, idx, os.path.join(root, "ckpt"), n_buckets=16, compact_every=2
    )
    _drain(q)
    corpus = read_dedup_corpus(spark, idx)
    return corpus.filter(F.col("kept")).select("doc_id", "source", "lang")


@register(
    "b12_stream_progress",
    oracle="""
        SELECT CAST(o_orderkey % 4 AS INT) AS batch,
               count(*) AS n_rows
        FROM orders
        GROUP BY 1
    """,
)
def b12_stream_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 hard-certified: STREAM METRICS — the observability surface the
    reference reads from CloudWatch (IteratorAge, MillisBehindLatest,
    per-stage counts, README.md:64, 179, 230, 252-254) maps onto
    Structured Streaming's progress events; this query certifies the one
    metric with a deterministic oracle: per-trigger numInputRows. Four
    arrival-ordered files stream one per trigger, and the counts the
    ENGINE reports in query.recentProgress must equal the fixture's
    per-quarter row counts — if the metrics pipeline dropped, merged or
    double-counted a batch, the parity breaks. Latency metrics
    (batchDuration, watermark lag) ride the same progress events and are
    asserted non-deterministically in tests/test_streaming.py.

    The returned frame is built from query METADATA (4 progress rows) —
    driver-side by nature, like any metrics scrape."""
    o = load(spark, sf_dir, "orders")
    root = _tmp("b12")
    # the arrival fixture is a pure function of the input table — build it
    # once per sf_dir and reuse across repeat calls (the g35 fixture
    # precedent); the CHECKPOINT is fresh per call, so the measured
    # operator — the engine's per-trigger progress metrics — always runs
    # a fresh 4-trigger stream
    inp = _B12_FIXTURES.get(sf_dir)
    if inp is None or not os.path.isdir(inp):
        inp = os.path.join(_tmp(f"b12fix-{_sf_tag(sf_dir)}"), "input")
        # ONE write lands all four arrival quarters (hive dirs q=0..3, one
        # file each: a quarter's rows hash to one task); per-dir mtimes
        # then pin arrival order = quarter order, exactly as the four
        # sequential writes did
        (
            o.withColumn("q", (F.col("o_orderkey") % 4).cast("int"))
            .repartition(4, "q")
            .write.partitionBy("q")
            .mode("overwrite")
            .parquet(inp)
        )
        _stamp_hive_dir_mtimes(inp)
        _B12_FIXTURES[sf_dir] = inp
    stream = _file_stream(
        spark, o.schema, inp, max_files_per_trigger=1, recursive_file_lookup=True
    )
    query = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(query)
    # number the DATA batches after dropping no-data progress events: a
    # leading or interleaved zero-row trigger (timing-dependent with
    # availableNow) must not shift the quarter ids the oracle expects
    nonzero = [
        int(p["numInputRows"])
        for p in query.recentProgress
        if int(p["numInputRows"]) > 0
    ]
    rows = list(enumerate(nonzero))
    return spark.createDataFrame(rows, "batch int, n_rows bigint")
