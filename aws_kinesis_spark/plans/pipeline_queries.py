"""Pipeline operator queries (SURVEY.md §2.B-2.C batch form + D15 + A7/O4).

Each query exercises one pipeline operator from the reference's streaming
path as a deterministic batch plan with a DuckDB oracle twin.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_kinesis_spark.operators.asof import asof_join
from aws_kinesis_spark.operators.upsert import apply_cdc, staging_upsert
from aws_kinesis_spark.registry import register
from aws_kinesis_spark.sources.envelope import decode_envelope, synthesize_envelope
from aws_kinesis_spark.tables import load

_SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), f"kinesis_scratch_{os.getpid()}")
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)


_ENV_FIXTURES: dict[tuple[str, str], str] = {}


def _envelope_fixture(spark, sf_dir: str, name: str, build) -> "DataFrame":
    """Materialize a deterministic envelope ARRIVAL FIXTURE to parquet once
    per (query, sf_dir) and re-read it on every later call — the
    _G35_FIXTURES pattern: the fixture is a pure function of the input
    table, so re-synthesizing (or re-checkpointing) it per invocation
    charges the measured operator for input prep. Multi-consumer queries
    get cheap re-readable parquet scans instead of a localCheckpoint."""
    key = (name, sf_dir)
    path = _ENV_FIXTURES.get(key)
    if path is None or not os.path.isdir(path):
        # the sf tag keeps each scale factor's fixture at its OWN path — a
        # shared path would let a second sf_dir's build silently replace
        # the data behind the first one's cache entry (one process runs
        # multiple scale factors: bench warmup vs timed dir, test suites).
        # The tag hashes the FULL resolved sf_dir, not just its basename:
        # two sf dirs named alike (/data/small/run vs /data/big/run) would
        # otherwise share one path and the second build would clobber the
        # first behind its still-live cache entry (round-12 review)
        import hashlib

        base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        tag = f"{base}-{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}"
        path = os.path.join(_scratch(f"{name}-{tag}"), "env")
        build().write.mode("overwrite").parquet(path)
        _ENV_FIXTURES[key] = path
    return spark.read.parquet(path)


def _scratch(name: str) -> str:
    """Per-query scratch dir for queries that write a lake to read it back.

    Deterministic per (process, query) and WIPED on reuse, with the whole
    per-process root removed at interpreter exit — so a bench/differential
    loop re-invoking a lake query overwrites one tree instead of leaking an
    events/orders-sized parquet copy per invocation (ADVICE r5). The pid in
    the root keeps concurrent test processes apart. Callers must fully
    materialize the returned DataFrame before re-invoking the same query
    (the harness and tests do — each run collects/writes before the next)."""
    d = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


# --------------------------------------------------------------------------
# C1-C8: the record-transform scalar surface
# --------------------------------------------------------------------------


@register(
    "c01_envelope_roundtrip",
    oracle="""
        SELECT o_orderkey AS id,
               o_orderstatus AS status,
               CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
               'sales-orders-' || o_orderkey AS partition_key,
               CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                    + o_orderkey AS VARCHAR) AS sequence_number,
               o_orderdate AS arrival_ts
        FROM orders
    """,
)
def c01_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope codec round-trip (README.md:100, 144-146, 224): base64-encode
    the nested CDC JSON, then decode_envelope() recovers id/status/op exactly.
    30-digit sequence numbers stay DecimalType(38,0) — never cast to long
    (README.md:238)."""
    env = synthesize_envelope(load(spark, sf_dir, "orders"))
    return decode_envelope(env).select(
        "id",
        "status",
        "op",
        "partition_key",
        # DECIMAL(38,0) internally; stringified at the comparison boundary
        # (pandas renders >18-digit decimals as lossy float64 otherwise)
        F.col("sequence_number").cast("string").alias("sequence_number"),
        "arrival_ts",
    )


@register(
    "c06_time_partition_cols",
    oracle="""
        SELECT o_orderkey,
               EXTRACT(year FROM o_orderdate)::INT  AS year,
               EXTRACT(month FROM o_orderdate)::INT AS month,
               EXTRACT(day FROM o_orderdate)::INT   AS day,
               EXTRACT(hour FROM o_orderdate)::INT  AS hour,
               printf('year=%d/month=%02d/day=%02d/hour=%02d',
                      EXTRACT(year FROM o_orderdate)::INT,
                      EXTRACT(month FROM o_orderdate)::INT,
                      EXTRACT(day FROM o_orderdate)::INT,
                      EXTRACT(hour FROM o_orderdate)::INT) AS partition_path
        FROM orders
    """,
)
def c06_time_partition_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive partition-column derivation — the `!{timestamp:yyyy}/MM/dd/HH`
    prefix template (README.md:130, 285, 424)."""
    o = load(spark, sf_dir, "orders")
    y, m, d, h = (
        F.year("o_orderdate"),
        F.month("o_orderdate"),
        F.dayofmonth("o_orderdate"),
        F.hour("o_orderdate"),
    )
    return o.select(
        "o_orderkey",
        y.alias("year"),
        m.alias("month"),
        d.alias("day"),
        h.alias("hour"),
        F.format_string("year=%d/month=%02d/day=%02d/hour=%02d", y, m, d, h).alias(
            "partition_path"
        ),
    )


@register(
    "c07_composite_key",
    oracle="""
        SELECT 'sales' || '-' || 'orders' || '-' || o_orderkey AS partition_key,
               'orders' || '‖' || CAST(o_orderkey % 1000 AS VARCHAR) AS salted_key,
               o_orderkey
        FROM orders
    """,
)
def c07_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key construction: `schema-table-id` (README.md:75, 225) and
    the salted hot-key form `table=orders||random(1000)` (README.md:85-86) —
    salt made deterministic (keyed hash, not rand()) for replayability."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.concat_ws("-", F.lit("sales"), F.lit("orders"), F.col("o_orderkey")).alias(
            "partition_key"
        ),
        F.concat(F.lit("orders"), F.lit("‖"), (F.col("o_orderkey") % 1000).cast("string")).alias(
            "salted_key"
        ),
        "o_orderkey",
    )


@register(
    "c08_hashing",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               length(text) AS text_len
        FROM documents
    """,
)
def c08_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing / checksums (README.md:47, 287, 418): content digests of the
    kind used for PartitionKey routing and ETag integrity checks."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    )


# --------------------------------------------------------------------------
# B2-B4: salting / sequencing / dedup
# --------------------------------------------------------------------------


@register(
    "b02_salted_aggregation",
    oracle="""
        SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
)
def b02_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation by salting (README.md:84-86): two-phase aggregate —
    partial agg on (key, salt) spreads a skewed key over 8 reducers, final
    agg re-combines. Result is identical to the direct group-by."""
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn("__salt", (F.col("event_id") % 8).cast("int"))
        .groupBy("user_id", "__salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"), F.round(F.sum("pv"), 4).alias("total_value")
    )


@register(
    "b02b_salted_join",
    oracle="""
        SELECT e.event_id, e.user_id, c.c_name
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def b02b_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salted JOIN (README.md:84-86): the fact side salted by a
    deterministic row hash, the dim side replicated — row-identical to the
    plain join (the oracle) while spreading any hot user over 8 reducers."""
    from aws_kinesis_spark.operators.partitioning import salted_join

    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    return salted_join(ev, cust, "user_id", salts=8, salt_source="event_id")


@register(
    "b03_sequence_numbering",
    oracle="""
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events
    """,
)
def b03_sequence_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone per-shard sequence assignment (README.md:48, 238): the shard
    is the partition key; order is arrival time."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select("event_id", "user_id", F.row_number().over(w).alias("seq"))


@register(
    "b04_dedup_by_sequence",
    oracle="""
        SELECT DISTINCT event_id, ts, event_type, round(value, 4) AS value_r
        FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
)
def b04_dedup_by_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest dedup (README.md:51, 204): a replayed producer
    batch (the doubled input) yields zero duplicates after sequence-number
    dedup."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", F.round("value", 4).alias("value_r")
    )
    return ev.unionByName(ev).dropDuplicates(["event_id"])


@register(
    "b04b_bloom_first_seen",
    oracle="""
        WITH hist AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE ts < TIMESTAMP '2024-01-03'
        )
        SELECT b.user_id, b.event_type,
               min(b.ts) AS first_ts, count(*) AS n_events
        FROM events b
        ANTI JOIN hist h
          ON b.user_id = h.user_id AND b.event_type = h.event_type
        WHERE b.ts >= TIMESTAMP '2024-01-03'
        GROUP BY b.user_id, b.event_type
    """,
)
def b04b_bloom_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 scale path (README.md:51's "seen before?" at 100 TB of history):
    never-before-seen (user, action) pairs in today's batch, decided by a
    broadcast Bloom filter over history keys instead of shuffling the full
    history keyset — filter-rejected keys (the bulk of a mostly-new batch)
    skip the anti-join entirely; only the ~1% might-contain fraction pays
    the exact verify, so the output is EXACT (oracle is the plain anti-join).
    """
    from aws_kinesis_spark.operators.bloom import first_seen

    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-03").cast("timestamp")
    history = ev.filter(F.col("ts") < cutoff)
    batch = ev.filter(F.col("ts") >= cutoff)
    new_rows = first_seen(batch, history, ["user_id", "event_type"])
    return new_rows.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.count("*").alias("n_events")
    )


# --------------------------------------------------------------------------
# A7 / O4: upserts;  D15: as-of join
# --------------------------------------------------------------------------


@register(
    "a07_staging_upsert",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 4) AS totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey, round(o_totalprice * 2, 4) AS totalprice, 'R' AS o_orderstatus
        FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def a07_staging_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's zero-duplicate staging upsert (README.md:573-575):
    DELETE-USING + INSERT-SELECT == anti-join + union."""
    o = load(spark, sf_dir, "orders")
    target = o.select(
        "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"), "o_orderstatus"
    )
    staging = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 2, 4).alias("totalprice"),
            F.lit("R").alias("o_orderstatus"),
        )
    )
    return staging_upsert(target, staging, ["o_orderkey"])


@register(
    "o04_cdc_apply",
    oracle="""
        WITH cdc AS (
            SELECT o_orderkey AS id, o_orderstatus AS status,
                   CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + o_orderkey AS DECIMAL(38,0)) AS sequence_number
            FROM orders
            UNION ALL
            SELECT o_orderkey AS id, 'U2' AS status, 'U' AS op,
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + 1000000000 + o_orderkey AS DECIMAL(38,0)) AS sequence_number
            FROM orders WHERE o_orderkey % 5 = 0
        ),
        latest AS (
            SELECT id, status, op,
                   row_number() OVER (PARTITION BY id ORDER BY sequence_number DESC) AS rn
            FROM cdc
        )
        SELECT id, status, op FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def o04_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog -> final state (README.md:167-168, 573-575): two epochs
    of envelope records collapse to latest-per-key, deletes removed."""
    o = load(spark, sf_dir, "orders")
    epoch0 = decode_envelope(synthesize_envelope(o, epoch=0))
    epoch1 = decode_envelope(
        synthesize_envelope(
            o.filter(F.col("o_orderkey") % 5 == 0).withColumn("o_orderstatus", F.lit("U2")),
            epoch=1,
        )
    ).withColumn("op", F.lit("U"))
    cdc = epoch0.unionByName(epoch1).select("id", "status", "op", "sequence_number")
    return apply_cdc(cdc, ["id"], "sequence_number").select("id", "status", "op")


@register(
    "d15_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.event_id AS prior_event_id,
               round(p.value, 4) AS prior_value
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def d15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md D15): for each error event, the most recent
    prior purchase by the same user — union + LOCF window, not a range
    cross-join, so it scales (operators/asof.py)."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("pe_id"), F.round("value", 4).alias("pv"))
    )
    joined = asof_join(
        errors,
        purchases,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["pe_id", "pv"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("pe_id").alias("prior_event_id"),
        F.col("pv").alias("prior_value"),
    )


@register(
    "b01_keyed_partition_order",
    oracle="""
        SELECT 'sales-orders-' || o_orderkey AS partition_key,
               2 AS n_records,  -- one record per epoch in the replayed log
               CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                    + 1000000000 + o_orderkey AS VARCHAR) AS last_seq
        FROM orders
    """,
)
def b01_keyed_partition_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 (README.md:47, 53): hash-partition by key, order by sequence
    within partitions, then per-key accounting computed from the laid-out
    stream (last = max sequence). The layout invariant itself (one
    partition per key, sorted within) is asserted in tests/test_lake.py."""
    from aws_kinesis_spark.operators.partitioning import keyed_ordered_partitions

    o = load(spark, sf_dir, "orders")
    log = synthesize_envelope(o, epoch=0).unionByName(synthesize_envelope(o, epoch=1))
    laid_out = keyed_ordered_partitions(log, n_partitions=8)
    return laid_out.groupBy("partition_key").agg(
        F.count("*").alias("n_records"),
        F.max("sequence_number").cast("string").alias("last_seq"),
    )


@register(
    "b05_bucketed_join",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, c.c_name,
               round(o.o_totalprice, 4) AS totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def b05_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (SCALE.md §0): both sides bucketed by the
    join key at write time, so the join itself needs no exchange (the
    no-shuffle plan is asserted in tests/test_plans.py). At 100 TB this is
    the difference between shuffling the fact table every query and never."""
    from aws_kinesis_spark.operators.partitioning import bucketed_join, write_bucketed

    root = _scratch("b05_bucketed")
    # deterministic names + DROP-first (a10's discipline): uuid-suffixed
    # tables leaked two catalog entries per invocation, each pointing at a
    # scratch path the NEXT invocation's _scratch wipe deletes — unbounded
    # catalog growth plus dead-LOCATION entries in a persistent metastore
    # (round-13 review)
    ot, ct = "b05_orders_bucketed", "b05_customer_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {ct}")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice")
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(o, ot, os.path.join(root, "o"), "o_custkey")
    write_bucketed(c, ct, os.path.join(root, "c"), "o_custkey")
    return bucketed_join(spark, ot, ct, "o_custkey")


@register(
    "c09_orc_roundtrip",
    oracle="""
        SELECT EXTRACT(year FROM o_orderdate)::INT AS year,
               count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders GROUP BY 1
    """,
)
def c09_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format conversion, ORC variant (README.md:606 "ORC 15% smaller"):
    write orders hive-partitioned as ORC, read back, aggregate — the same
    engine-level conversion surface as Parquet (C9), different codec."""
    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("c09_orc"), "orders")
    (
        o.withColumn("year", F.year("o_orderdate"))
        .repartition("year")
        .write.mode("overwrite")
        .partitionBy("year")
        .orc(lake)
    )
    back = spark.read.orc(lake)
    return back.groupBy("year").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total")
    )


@register(
    "c15_xml_roundtrip",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               round(sum(o_totalprice), 4) AS total,
               min(o_orderkey) AS first_key
        FROM orders GROUP BY 1
    """,
)
def c15_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format conversion, XML variant (C9 family): write orders as XML
    (Spark 4's built-in XML source — the spark-xml package folded into the
    engine, public), read back under an EXPLICIT schema (XML carries no
    types, so inference would wobble dates/decimals across engines), and
    aggregate — proving the third text interchange format next to JSONL
    (c12) and CSV (c13) roundtrips losslessly through the engine.
    Reference: the C9 conversion surface (README.md:606)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    lake = os.path.join(_scratch("c15_xml"), "orders")
    (
        o.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(lake)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .load(lake)
    )
    return back.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
        F.min("o_orderkey").alias("first_key"),
    )


@register(
    "d10b_approx_distinct",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS hll_ok
        FROM events GROUP BY event_type
    """,
)
def d10b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 scale path: approx_count_distinct (HyperLogLog++) — the sketch
    you use when exact distinct would shuffle 100 TB of keys.

    Driver-checkable oracle form: DuckDB cannot reproduce Spark's HLL++
    register values, but it CAN verify the sketch's published accuracy
    claim — the query returns per-group exact counts (hash-anchored
    against the SQL twin) plus ``hll_ok`` = |approx − exact| ≤ 5%·exact
    computed in-plan; HLL++ is deterministic for a given dataset, so the
    boolean is stable. The exact count rides the same shuffle purely as
    the verification anchor — the sketch is the operator under test."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_ok"),
    )


@register(
    "b07_replay_from_offset",
    oracle="""
        SELECT o_orderkey AS id,
               'U2' AS status,
               CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                    + 1000000000 + o_orderkey AS VARCHAR) AS sequence_number
        FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def b07_replay_from_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay/resume-after-checkpoint (README.md:52, 305-309, 81-83): given
    the retained log of two producer epochs and a consumer checkpoint at the
    end of epoch 0, the resumed read returns exactly the epoch-1 records —
    strictly after the checkpointed sequence number, as a DECIMAL(38,0)
    comparison (30-digit sequences never fit int64, README.md:238)."""
    o = load(spark, sf_dir, "orders")
    epoch0 = synthesize_envelope(o, epoch=0)
    epoch1 = synthesize_envelope(
        o.filter(F.col("o_orderkey") % 5 == 0).withColumn("o_orderstatus", F.lit("U2")),
        epoch=1,
    )
    log = epoch0.unionByName(epoch1)
    checkpoint = epoch0.agg(F.max("sequence_number")).collect()[0][0]
    resumed = log.filter(F.col("sequence_number") > F.lit(checkpoint))
    return decode_envelope(resumed).select(
        "id", "status", F.col("sequence_number").cast("string").alias("sequence_number")
    )


@register(
    "a10_catalog_partition_discovery",
    oracle="""
        SELECT EXTRACT(day FROM ts)::INT AS day,
               EXTRACT(hour FROM ts)::INT AS hour,
               count(*) AS n_events
        FROM events
        WHERE EXTRACT(day FROM ts) = 7
        GROUP BY 1, 2
    """,
)
def a10_catalog_partition_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog registration + partition discovery (README.md:121, 163,
    541-549): the crawler's job is CREATE EXTERNAL TABLE + partition sync —
    here CREATE TABLE USING parquet over the partitioned prefix followed by
    MSCK REPAIR TABLE, then a partition-pruned SQL query THROUGH the catalog
    table (the pruning is visible as PartitionFilters in the scan)."""
    ev = load(spark, sf_dir, "events")
    lake = os.path.join(_scratch("a10_catalog"), "events")
    (
        ev.withColumn("day", F.dayofmonth("ts"))
        .withColumn("hour", F.hour("ts"))
        .repartition("day", "hour")
        .write.mode("overwrite")
        .partitionBy("day", "hour")
        .parquet(lake)
    )
    tbl = f"cdc_events_{abs(hash(lake)) % 10**8}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"""CREATE TABLE {tbl} (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
            event_type STRING, value DOUBLE, props STRING, day INT, hour INT)
            USING parquet PARTITIONED BY (day, hour) LOCATION '{lake}'"""
    )
    spark.sql(f"MSCK REPAIR TABLE {tbl}")
    return spark.sql(
        f"""SELECT day, hour, count(*) AS n_events FROM {tbl}
            WHERE day = 7 GROUP BY day, hour"""
    )


@register(
    "d15b_range_join_binned",
    oracle="""
        SELECT e.event_id AS error_id, p.event_id AS purchase_id,
               e.user_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id
         AND p.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts
    """,
)
def d15b_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (SURVEY.md D15 range flavor): purchases within the 10
    minutes before each error by the same user.

    Scale shape: a naive `BETWEEN` theta-join degenerates to per-key
    nested loops. Instead, bucket time into bins of the range width and
    equi-join on (user_id, bin) with each error probing its own bin and the
    previous one — any in-range pair must share one of the two bins
    (pigeonhole over a 10-minute window), then the exact BETWEEN predicate
    filters. The join stays a hash/sort-merge equi-join at any scale."""
    ev = load(spark, sf_dir, "events")
    width = 600  # seconds = the range width
    bin_of = lambda c: (F.unix_timestamp(c) / width).cast("long")  # noqa: E731
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("e_ts"),
        F.explode(F.array(bin_of("ts"), bin_of("ts") - 1)).alias("bin"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        bin_of("ts").alias("bin"),
    )
    # No distinct needed: the error side's two exploded bins are DISTINCT
    # values and the purchase carries one bin, so each (error, purchase)
    # pair can meet on at most one bin — a dedup here was a full extra
    # shuffle over the join output for zero effect (round-12 review;
    # contrast d29, where multi-bin intervals genuinely double-hit and the
    # distinct is load-bearing).
    return (
        errors.join(purchases, ["user_id", "bin"])
        .filter(
            (F.col("p_ts") <= F.col("e_ts"))
            & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        )
        .select("error_id", "purchase_id", "user_id")
    )


# --------------------------------------------------------------------------
# A12: batch lake scan round-trip (write partitioned -> read -> aggregate)
# --------------------------------------------------------------------------


@register(
    "a12_lake_roundtrip",
    oracle="""
        SELECT EXTRACT(year FROM o_orderdate)::INT AS year,
               count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders GROUP BY 1
    """,
)
def a12_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-lake write + partition-discovery read (README.md:130,
    441-449): write orders hive-partitioned by year, read the directory back
    (automatic partition discovery — no crawler, README.md:446), aggregate.
    Exercises A4 (partitioned sink) + A10 (discovery) + A12 (batch scan)."""
    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a12_lake"), "orders")
    (
        o.withColumn("year", F.year("o_orderdate"))
        .repartition("year")
        .write.mode("overwrite")
        .partitionBy("year")
        .parquet(lake)
    )
    back = spark.read.parquet(lake)
    return back.groupBy("year").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total")
    )


# --------------------------------------------------------------------------
# A13: dynamic key-derived partitioning (per-table folders)
# --------------------------------------------------------------------------


@register(
    "a13_dynamic_table_partitioning",
    oracle="""
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'orders' ELSE 'returns' END AS tbl,
               count(*) AS n,
               count(DISTINCT o_orderkey) AS n_ids
        FROM orders
        GROUP BY 1
    """,
)
def a13_dynamic_table_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partitioning (README.md:157, 434 — the
    ``!{partitionKeyFromLambda:path}`` per-table-folder template): a mixed
    CDC stream whose composite keys name two tables flushes through the lake
    with ``dynamic_tables=True``; the re-read lake is grouped by the
    ``table`` hive partition, so the counts come from the FOLDER layout the
    dynamic partitioner produced, not from re-deriving the key."""
    from aws_kinesis_spark.sources.lake import run_lake_batch

    # materialized fixture: the flush consumes env twice (count + write),
    # so the inline synthesis ran 2x per invocation (round-13 review)
    env = _envelope_fixture(
        spark,
        sf_dir,
        "a13fix",
        lambda: synthesize_envelope(load(spark, sf_dir, "orders")),
    )
    # alternate records between two payload-derived tables
    mixed = env.withColumn(
        "partition_key",
        F.when(
            F.element_at(F.split("partition_key", "-"), 3).cast("long") % 2 == 0,
            F.col("partition_key"),
        ).otherwise(F.regexp_replace("partition_key", "-orders-", "-returns-")),
    )
    lake = _scratch("a13_dynlake")
    run_lake_batch(mixed, lake, batch_id=0, raw_backup=False, dynamic_tables=True)
    back = spark.read.parquet(os.path.join(lake, "data", "batch=0"))
    return back.groupBy(F.col("table").alias("tbl")).agg(
        F.count("*").alias("n"), F.countDistinct("id").alias("n_ids")
    )


# --------------------------------------------------------------------------
# C10: cost accounting (reference cost snapshots, README.md:323-330, 592-599)
# --------------------------------------------------------------------------


@register(
    "c10_cost_accounting",
    oracle="""
        WITH payload AS (
            SELECT CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
                   length('{"data":{"id":' || o_orderkey || ',"status":"' || o_orderstatus
                          || '"},"metadata":{"op":"'
                          || (CASE o_orderkey % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END)
                          || '"}}') AS n
            FROM orders
        )
        SELECT op,
               count(*) AS n_records,
               CAST(sum(n) AS BIGINT) AS n_bytes,
               round(count(*)/1e6*14.0 + sum(n)/1073741824.0*0.08, 8) AS ingest_usd,
               round(sum(n)/1073741824.0*0.04, 8) AS retrieval_usd,
               round(count(*)/1e6*3.74, 8) AS transform_usd,
               round(round(count(*)/1e6*14.0 + sum(n)/1073741824.0*0.08, 8)
                     + round(sum(n)/1073741824.0*0.04, 8)
                     + round(count(*)/1e6*3.74, 8), 8) AS total_usd
        FROM payload GROUP BY 1
    """,
)
def c10_cost_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-op-type cost snapshot (README.md:323-330): ingest, retrieval and
    transform dollars from record counts and decoded payload bytes — the
    reference's cost table as one aggregation plus a pure cost projection
    (functions/cost.py with_cost_cols; no extra shuffle)."""
    from aws_kinesis_spark.functions.cost import with_cost_cols

    env = synthesize_envelope(load(spark, sf_dir, "orders"))
    decoded = decode_envelope(env)
    payload_len = F.length(
        F.try_to_binary(F.col("data").cast("string"), F.lit("base64")).cast("string")
    )
    per_op = decoded.groupBy("op").agg(
        F.count("*").alias("n_records"),
        F.sum(payload_len).alias("n_bytes"),
    )
    return with_cost_cols(per_op)


@register(
    "a01_kinesis_sim_source",
    oracle="""
        SELECT i AS id,
               CASE i % 3 WHEN 0 THEN 'O' WHEN 1 THEN 'F' ELSE 'P' END AS status,
               CASE i % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
               'sales-orders-' || i AS partition_key,
               CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0)) + i
                    AS VARCHAR) AS sequence_number
        FROM (SELECT unnest(range(0, 2000)) AS i)
    """,
)
def a01_kinesis_sim_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a REAL Spark source: the kinesis_sim Python DataSource V2
    (sources/kinesis_sim.py) reads one InputPartition per shard — the
    stream's own parallelism model — and the rows decode through the same
    decode_envelope stage as production. The oracle regenerates the
    deterministic stream with a SQL range()."""
    from aws_kinesis_spark.sources import kinesis_sim
    from aws_kinesis_spark.sources.envelope import decode_envelope

    kinesis_sim.register(spark)
    env = (
        spark.read.format("kinesis_sim")
        .option("shards", 4)
        .option("recordsPerShard", 500)
        .load()
    )
    return decode_envelope(env).select(
        "id",
        "status",
        "op",
        "partition_key",
        F.col("sequence_number").cast("string").alias("sequence_number"),
    )


@register(
    "a01b_kinesis_reshard",
    oracle="""
        SELECT i AS id,
               CASE i % 3 WHEN 0 THEN 'O' WHEN 1 THEN 'F' ELSE 'P' END AS status,
               'sales-orders-' || i AS partition_key,
               CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0)) + i
                    AS VARCHAR) AS sequence_number
        FROM (SELECT unnest(range(0, 2000)) AS i)
    """,
)
def a01b_kinesis_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 across a reshard (README.md:36 "4 shards auto-scaled", 74): the
    stream was split mid-retention (splitAtRecord), so the batch scan reads
    closed parents plus both children of each — and decodes the IDENTICAL
    record set as the unsplit stream (sources/kinesis_sim.py:_Topology;
    resharding moves shard placement, never data). Oracle: the same range()
    regeneration as a01."""
    from aws_kinesis_spark.sources import kinesis_sim
    from aws_kinesis_spark.sources.envelope import decode_envelope

    kinesis_sim.register(spark)
    env = (
        spark.read.format("kinesis_sim")
        .option("shards", 4)
        .option("recordsPerShard", 500)
        .option("splitAtRecord", 200)
        .load()
    )
    return decode_envelope(env).select(
        "id",
        "status",
        "partition_key",
        F.col("sequence_number").cast("string").alias("sequence_number"),
    )


@register(
    "a03_efo_push_consumer",
    oracle="""
        SELECT i AS id,
               CASE i % 3 WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
               'sales-orders-' || i AS partition_key
        FROM (SELECT unnest(range(0, 1200)) AS i)
    """,
)
def a03_efo_push_consumer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (enhanced fan-out) as a STREAMING drain: the kinesis_sim source in
    consumerMode=efo delivers one complete arrival burst per micro-batch
    with NO per-poll record bound — the SubscribeToShard push model
    (README.md:109-111), vs the polling consumer's GetRecords-bounded
    batches (a01/A2). Per-consumer isolation (each EFO subscriber holds its
    own offsets and receives the full stream) is asserted in
    tests/test_streaming.py."""
    from aws_kinesis_spark.sources import kinesis_sim
    from aws_kinesis_spark.sources.envelope import decode_envelope

    kinesis_sim.register(spark)
    raw = (
        spark.readStream.format("kinesis_sim")
        .option("shards", 3)
        .option("recordsPerShard", 400)
        .option("consumerMode", "efo")
        .option("arrivalSets", 4)
        .load()
    )
    # deterministic sink name, previous sink dropped at entry (the
    # _scratch wipe-on-reuse analogue): a uuid-named memory sink per
    # invocation materialized 1200 rows into a NEW session-lifetime temp
    # table every run — a bench loop held N of them with no release point
    # (round-13 review)
    tbl = "a03_efo_sink"
    spark.catalog.dropTempView(tbl)
    q = (
        decode_envelope(raw)
        .select("id", "op", "partition_key")
        .writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .option("checkpointLocation", _scratch("a03_ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(tbl)


@register(
    "c12_jsonl_roundtrip",
    oracle="""
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def c12_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 companion for the training-data interchange format: the documents
    corpus written as JSON Lines and read back with an explicit schema must
    round-trip byte-exactly (unicode text included). JSONL is how LLM
    corpora actually move between pipelines; the explicit read schema keeps
    the scan one pass (no inference job) and is the 100 TB posture."""
    d = load(spark, sf_dir, "documents")
    out = os.path.join(_scratch("c12_jsonl"), "docs_jsonl")
    d.repartition(4).write.mode("overwrite").json(out)
    return spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).json(out)


@register(
    "c13_csv_roundtrip",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 4) AS o_totalprice, o_orderdate
        FROM orders
    """,
)
def c13_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 companion #2: the classic lake-input format. Orders written as
    headered CSV and read back with an explicit schema (one pass, no
    inference job) must round-trip exactly — timestamps included."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"), "o_orderdate",
    )
    out = os.path.join(_scratch("c13_csv"), "orders_csv")
    o.repartition(4).write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema(
            "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
            "o_totalprice DOUBLE, o_orderdate TIMESTAMP"
        )
        .option("header", True)
        .csv(out)
    )


@register(
    "a05_manifest_time_travel",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               count(DISTINCT o_orderkey) AS n_ids
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY o_orderstatus
    """,
)
def a05_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 manifest commit as TIME TRAVEL (README.md:291-303, 429, 453-455:
    'COPY reads the manifest, never the folder'): two producer batches land
    in the lake, each with its own atomic manifest; reading strictly
    through batch 0's manifest yields EXACTLY batch 0's records — the
    later commit is invisible, which is the snapshot-isolation property an
    external warehouse load relies on. Oracle: batch 0's record subset."""
    from aws_kinesis_spark.sources.lake import read_via_manifest, run_lake_batch

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a05_timetravel"), "lake")
    run_lake_batch(
        synthesize_envelope(o.filter(F.col("o_orderkey") % 3 == 0)),
        lake,
        batch_id=0,
        raw_backup=False,
        files_per_partition=32,
    )
    run_lake_batch(
        synthesize_envelope(o.filter(F.col("o_orderkey") % 3 != 0)),
        lake,
        batch_id=1,
        raw_backup=False,
        files_per_partition=32,
    )
    snapshot = read_via_manifest(spark, lake, batch_id=0)
    return snapshot.groupBy(F.col("status")).agg(
        F.count("*").alias("n"), F.count_distinct("id").alias("n_ids")
    )


@register(
    "o05_scd2_history",
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
def o05_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 from the CDC log (the warehouse-history complement of
    o04's type-1 LWW; README.md:167-168, 573-575): three producer epochs —
    initial ops, an update wave, a delete wave — become versioned dimension
    rows with [valid_from, valid_to) sequence intervals; a delete closes
    the prior version without opening one; the open-ended version is
    current (operators/upsert.py:scd2_history — one key shuffle, one
    ordered window, linear in events)."""
    from aws_kinesis_spark.operators.upsert import scd2_history

    o = load(spark, sf_dir, "orders")
    epoch0 = decode_envelope(synthesize_envelope(o, epoch=0))
    epoch1 = decode_envelope(
        synthesize_envelope(
            o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_orderstatus", F.lit("U2")
            ),
            epoch=1,
        )
    ).withColumn("op", F.lit("U"))
    epoch2 = decode_envelope(
        synthesize_envelope(o.filter(F.col("o_orderkey") % 10 == 0), epoch=2)
    ).withColumn("op", F.lit("D"))
    cdc = (
        epoch0.unionByName(epoch1)
        .unionByName(epoch2)
        .select("id", "status", "op", "sequence_number")
    )
    hist = scd2_history(cdc, ["id"], "sequence_number")
    return hist.select(
        "id",
        "status",
        F.col("__valid_from").cast("string").alias("valid_from"),
        F.col("__valid_to").cast("string").alias("valid_to"),
        F.col("__is_current").alias("is_current"),
    )


@register(
    "o06_cdc_net_changes",
    oracle="""
        WITH cdc AS (
            SELECT o_orderkey AS id, 'U2' AS status, 'U' AS op,
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + 1000000000 + o_orderkey AS DECIMAL(38,0)) AS seq
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, 'D',
                   CAST(CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                        + 2000000000 + o_orderkey AS DECIMAL(38,0))
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        latest AS (
            SELECT id, status, op,
                   row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
            FROM cdc
        )
        SELECT id,
               CASE WHEN op = 'D' THEN 'DELETE' ELSE 'UPSERT' END AS net_op,
               CASE WHEN op = 'D' THEN NULL ELSE status END AS status
        FROM latest WHERE rn = 1
    """,
)
def o06_cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC consumption (README.md:305-309: consumers checkpoint
    a sequence number and resume strictly after it): the NET changeset
    since a cursor — one DELETE/UPSERT row per key touched after the
    checkpoint, nothing for untouched keys. The full 3-epoch log is
    synthesized (same producer as o04/o05) but the consumer's cursor sits
    after epoch 0, so only the update and delete waves contribute; the
    oracle builds the post-cursor slice directly, proving the cursor
    filter is exactly a log truncation (operators/upsert.py:net_changes —
    pushed range predicate, then one key shuffle over the delta only)."""
    from decimal import Decimal

    from aws_kinesis_spark.operators.upsert import net_changes

    o = load(spark, sf_dir, "orders")
    epoch0 = decode_envelope(synthesize_envelope(o, epoch=0))
    epoch1 = decode_envelope(
        synthesize_envelope(
            o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_orderstatus", F.lit("U2")
            ),
            epoch=1,
        )
    ).withColumn("op", F.lit("U"))
    epoch2 = decode_envelope(
        synthesize_envelope(o.filter(F.col("o_orderkey") % 10 == 0), epoch=2)
    ).withColumn("op", F.lit("D"))
    cdc = (
        epoch0.unionByName(epoch1)
        .unionByName(epoch2)
        .select("id", "status", "op", "sequence_number")
    )
    cursor = Decimal("100000000000000000000000000000") + Decimal(1_000_000_000)
    net = net_changes(cdc, ["id"], "sequence_number", cursor)
    return net.select(
        "id",
        F.col("__net_op").alias("net_op"),
        F.when(F.col("__net_op") == "DELETE", F.lit(None)).otherwise(
            F.col("status")
        ).alias("status"),
    )


@register(
    "d29_interval_overlap_join",
    oracle="""
        WITH act AS (
            SELECT user_id, min(ts) AS act_start, max(ts) AS act_end
            FROM events GROUP BY user_id, date_trunc('day', ts)
        ),
        inc AS (
            SELECT date_trunc('hour', ts) AS inc_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS inc_end,
                   count(*) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY date_trunc('hour', ts) HAVING count(*) >= 5
        )
        SELECT a.user_id,
               CAST(a.act_start AS VARCHAR) AS act_start,
               CAST(a.act_end AS VARCHAR) AS act_end,
               CAST(i.inc_start AS VARCHAR) AS inc_start,
               i.n_errors
        FROM act a JOIN inc i
          ON a.act_start <= i.inc_end AND i.inc_start <= a.act_end
    """,
)
def d29_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 third flavor: interval x interval OVERLAP join with NO equi key —
    per-user daily activity intervals joined to global error-storm windows
    they overlap. d15 is as-of (point vs point), d15b is point-in-range;
    this is the [a,b] x [c,d] case both leave open.

    Scale shape: a bare overlap predicate is a nested-loop/cartesian plan.
    Instead both interval sets are CHUNKED onto a fixed hour grid — each
    interval explodes to the hour bins it covers — and the join becomes a
    hash equi-join on the bin: any overlapping pair shares at least one
    covered bin, the exact predicate then filters, distinct removes the
    multi-bin double-hits. Bin width is the tuning dial (set it near the
    typical interval length so explode factors stay small); the join stays
    shuffle-hash/SMJ at any scale, and either side broadcasts when small
    enough. Activity intervals span <= 1 day (24 bins worst case), incident
    windows exactly 1 hour (2 bins, closed-interval edge)."""
    ev = load(spark, sf_dir, "events")
    width = 3600  # seconds: the chunk grid
    act = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("__d")).agg(
        F.min("ts").alias("act_start"), F.max("ts").alias("act_end")
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("inc_start"))
        .agg(F.count("*").alias("n_errors"))
        .filter(F.col("n_errors") >= 5)
        .withColumn("inc_end", F.col("inc_start") + F.expr("INTERVAL 1 HOUR"))
    )
    bin_of = lambda c: (F.unix_timestamp(c) / width).cast("long")  # noqa: E731
    act_b = act.withColumn(
        "bin",
        F.explode(F.sequence(bin_of("act_start"), bin_of("act_end"))),
    )
    inc_b = inc.withColumn(
        "bin",
        F.explode(F.sequence(bin_of("inc_start"), bin_of("inc_end"))),
    )
    return (
        act_b.join(inc_b, "bin")
        .filter(
            (F.col("act_start") <= F.col("inc_end"))
            & (F.col("inc_start") <= F.col("act_end"))
        )
        # dedupe the multi-bin double-hits BEFORE the string casts: the
        # distinct shuffles 8-byte timestamps/longs, not 26-char strings,
        # and the casts then run once per surviving row
        .select("user_id", "act_start", "act_end", "inc_start", "n_errors")
        .distinct()
        .select(
            "user_id",
            F.col("act_start").cast("string").alias("act_start"),
            F.col("act_end").cast("string").alias("act_end"),
            F.col("inc_start").cast("string").alias("inc_start"),
            "n_errors",
        )
    )


@register(
    "a14_lake_compaction",
    oracle="""
        SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS id_sum,
               min(event_id) AS id_min,
               max(event_id) AS id_max
        FROM events GROUP BY 1
    """,
)
def a14_lake_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake maintenance round-trip (README.md:378-380 — "1 PUT instead of
    1,000" at rest): the events table lands as a day-partitioned lake with
    MANY small files per leaf (one per micro-batch flush), compact_lake
    bin-packs every leaf through its crash-safe two-rename swap, and the
    result is read back FROM THE COMPACTED FILES and aggregated per day.
    Parity with the oracle (count + id sum/min/max per day against the
    original table) proves the rewrite changed file layout and nothing
    else. File-count collapse and crash-window recovery are pinned in
    tests/test_lake.py; this query gives the content-preservation
    invariant a driver row."""
    from aws_kinesis_spark.sources.lake import compact_lake

    ev = load(spark, sf_dir, "events")
    lake = _scratch("a14_compact")
    data = os.path.join(lake, "data")
    (
        ev.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .repartition(8)  # force ~8 small files per day leaf
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(data)
    )
    compacted = compact_lake(spark, lake, min_files=2)
    assert compacted, "every day leaf should have had small files"
    back = spark.read.parquet(data)
    return back.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum("event_id").alias("id_sum"),
        F.min("event_id").alias("id_min"),
        F.max("event_id").alias("id_max"),
    )


@register(
    "a15_schema_evolution",
    oracle="""
        SELECT o_orderkey AS id, o_orderstatus AS status, 0 AS epoch,
               NULL AS channel
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderstatus, 1,
               CASE o_orderkey % 2 WHEN 0 THEN 'web' ELSE 'store' END
        FROM orders WHERE o_orderkey % 4 = 0
    """,
)
def a15_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer schema evolution through the lake (README.md's Glue-crawler
    role: downstream SQL keeps working when the CDC payload grows a field,
    SURVEY §1.5): epoch-0 flushes land WITHOUT the ``channel`` column,
    epoch-1 flushes carry it; a mergeSchema read unifies the file set and
    backfills the missing column with NULL — no rewrite of the old files,
    which at 100 TB is the difference between a metadata operation and a
    full-corpus migration. (Field-level payload inference for the same
    problem inside the JSON envelope: sources/envelope.py:
    infer_payload_schema.)"""
    o = load(spark, sf_dir, "orders")
    lake = _scratch("a15_evolve")
    v0 = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.lit(0).alias("epoch"),
    )
    v1 = o.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("epoch"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("web"))
        .otherwise(F.lit("store"))
        .alias("channel"),
    )
    v0.write.mode("append").parquet(lake)
    v1.write.mode("append").parquet(lake)
    return spark.read.option("mergeSchema", "true").parquet(lake)


@register(
    "a16_retention_expiry",
    oracle="""
        SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
        GROUP BY 1
    """,
)
def a16_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention enforcement round-trip (README.md:9, 60, 83: records age
    out beyond the configured retention window): the events table lands as
    an hour-partitioned lake, expire_partitions removes every hour leaf
    wholly before now - retention (pure directory metadata work — no Spark
    job, no row scan), and the surviving lake is read back and aggregated
    per day. Parity against the oracle's timestamp cutoff proves partition
    expiry == the WHERE clause: exactly the rows at-or-after the horizon
    survive. The clock is injected (now = 2024-01-31, retention 10 days ->
    horizon 2024-01-21) so every engine and rerun sees the same horizon."""
    import datetime as dt

    from aws_kinesis_spark.sources.lake import expire_partitions

    ev = load(spark, sf_dir, "events")
    lake = _scratch("a16_expiry")
    (
        ev.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
        .withColumn("hour", F.hour("ts"))
        .repartition("day", "hour")
        .write.mode("overwrite")
        .partitionBy("year", "month", "day", "hour")
        .parquet(os.path.join(lake, "data"))
    )
    stats = expire_partitions(
        lake, retention_hours=10 * 24, now=dt.datetime(2024, 1, 31)
    )
    assert stats.n_partitions > 0, "the 20-day-old head of the lake must expire"
    back = spark.read.parquet(os.path.join(lake, "data"))
    return back.groupBy(
        F.to_date(F.format_string("%d-%02d-%02d", "year", "month", "day"))
        .cast("string")
        .alias("day")
    ).agg(F.count("*").alias("n_events"), F.sum("event_id").alias("id_sum"))


@register(
    "a17_snapshot_diff",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               count(DISTINCT o_orderkey) AS n_ids
        FROM orders WHERE o_orderkey % 3 <> 0
        GROUP BY o_orderstatus
    """,
)
def a17_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ incremental consumption between manifest commits (README.md:
    291-303, 429): three producer batches land, each with its own atomic
    manifest; a consumer that checkpointed batch 0 catches up by reading
    ONLY the files batches 1-2 committed — file-level pruning via the
    manifest union, no rescan of the standing table
    (sources/lake.py:read_incremental). Oracle: exactly the records of the
    two later batches."""
    from aws_kinesis_spark.sources.lake import read_incremental, run_lake_batch

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a17_diff"), "lake")
    for b in range(3):
        run_lake_batch(
            synthesize_envelope(o.filter(F.col("o_orderkey") % 3 == b)),
            lake,
            batch_id=b,
            raw_backup=False,
            files_per_partition=32,
        )
    delta = read_incremental(spark, lake, after_batch=0, upto_batch=2)
    return delta.groupBy(F.col("status")).agg(
        F.count("*").alias("n"), F.count_distinct("id").alias("n_ids")
    )


@register(
    "o07_log_compaction",
    oracle="""
        WITH cdc AS (
            SELECT o_orderkey AS id, o_orderstatus AS status, 'I' AS op,
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
        cursor AS (
            SELECT CAST('100000000000000000000000000000' AS DECIMAL(38,0))
                   + 1500000000 AS c
        ),
        snap AS (
            SELECT id, status, op, seq,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY seq DESC,
                                               CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC,
                                               op DESC) AS rn
            FROM cdc WHERE seq <= (SELECT c FROM cursor)
        )
        SELECT id, status, op, CAST(seq AS VARCHAR) AS sequence_number
        FROM snap WHERE rn = 1 AND op <> 'D'
        UNION ALL
        SELECT id, status, op, CAST(seq AS VARCHAR)
        FROM cdc WHERE seq > (SELECT c FROM cursor)
    """,
)
def o07_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: Kafka-style changelog compaction bounded by the slowest consumer
    cursor (operators/upsert.py:compact_changelog): the pre-cursor slice
    (epochs 0-1 here) collapses to one latest-state row per key; the
    post-cursor tail (epoch 2's delete wave) is retained verbatim so any
    consumer at >= cursor replays identically against the compacted log.
    Retained size drops from O(history) to O(live keys + delta)."""
    from decimal import Decimal

    from aws_kinesis_spark.operators.upsert import compact_changelog

    o = load(spark, sf_dir, "orders")
    epoch0 = decode_envelope(synthesize_envelope(o, epoch=0)).withColumn(
        "op", F.lit("I")
    )
    epoch1 = decode_envelope(
        synthesize_envelope(
            o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_orderstatus", F.lit("U2")
            ),
            epoch=1,
        )
    ).withColumn("op", F.lit("U"))
    epoch2 = decode_envelope(
        synthesize_envelope(o.filter(F.col("o_orderkey") % 10 == 0), epoch=2)
    ).withColumn("op", F.lit("D"))
    cdc = (
        epoch0.unionByName(epoch1)
        .unionByName(epoch2)
        .select("id", "status", "op", "sequence_number")
    )
    cursor = Decimal("100000000000000000000000000000") + Decimal(1_500_000_000)
    compacted = compact_changelog(cdc, ["id"], "sequence_number", cursor)
    return compacted.select(
        "id",
        "status",
        "op",
        F.col("sequence_number").cast("string").alias("sequence_number"),
    )


@register(
    "c14_gzip_jsonl_roundtrip",
    oracle="""
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def c14_gzip_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 companion #3: GZIP-compressed JSON Lines — the reference's
    Firehose delivery format (README.md:276-278: GZIP'd objects, the
    compression ratio the cost accounting in c10 models). Written with
    codec=gzip, read back with an explicit schema: byte-exact round-trip.
    Scale note: gzip is NOT splittable — one file = one task on read, so
    the writer's repartition(4) bounds file size to keep read parallelism;
    at 100 TB the lake path uses snappy parquet (splittable) and gzip only
    at the interchange boundary, exactly like the reference."""
    d = load(spark, sf_dir, "documents")
    out = os.path.join(_scratch("c14_gzjsonl"), "docs_jsonl_gz")
    d.repartition(4).write.mode("overwrite").option("compression", "gzip").json(out)
    import glob as _glob

    assert _glob.glob(os.path.join(out, "*.json.gz")), "gzip codec not applied"
    return spark.read.schema(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).json(out)


@register(
    "a18_orphan_vacuum",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               count(DISTINCT o_orderkey) AS n_ids
        FROM orders WHERE o_orderkey % 3 <> 2
        GROUP BY o_orderstatus
    """,
)
def a18_orphan_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ lake maintenance: ORPHAN-FILE VACUUM (the Delta VACUUM /
    Iceberg remove_orphan_files analogue). A producer crash between data
    PUT and manifest PUT (README.md:413-430) leaves durable-but-
    uncommitted files: invisible to manifest readers but visible to folder
    readers. Simulated here by committing batches 0-1 normally, landing
    batch 2's data, then deleting its manifest; vacuum_orphans removes
    exactly batch 2's files, restoring folder-read/manifest-read
    equivalence — the oracle is the two committed batches' content, read
    back through the FOLDER (sources/lake.py:vacuum_orphans)."""
    from aws_kinesis_spark.sources.lake import run_lake_batch, vacuum_orphans

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a18_vacuum"), "lake")
    for b in range(3):
        run_lake_batch(
            synthesize_envelope(o.filter(F.col("o_orderkey") % 3 == b)),
            lake,
            batch_id=b,
            raw_backup=False,
            files_per_partition=32,
        )
    # crash simulation: batch 2's data landed but its manifest never did.
    # older_than=0: this harness owns every writer, so no commit can be
    # in flight — production sweeps keep the mtime retention guard.
    os.remove(os.path.join(lake, "_manifests", "manifest-0000000002.json"))
    stats = vacuum_orphans(lake, older_than_seconds=0)
    assert stats.n_orphans > 0 and stats.n_kept > 0
    back = spark.read.parquet(os.path.join(lake, "data"))
    return back.groupBy(F.col("status")).agg(
        F.count("*").alias("n"), F.count_distinct("id").alias("n_ids")
    )


@register(
    "a19_deletion_vectors",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS id_sum
        FROM orders
        WHERE o_orderkey % 7 <> 3 AND o_orderkey % 11 <> 5
        GROUP BY o_orderstatus
    """,
)
def a19_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ row-level deletes: MERGE-ON-READ DELETION VECTORS (the Iceberg
    v2 / Delta DV pattern grafted onto this lake's immutable-object
    protocol, README.md:413-430 — data objects are never mutated; deletes
    land as new atomic-renamed objects under _deletes/). Two delete
    vectors are committed against the orders lake (GDPR-style key
    deletes), then the table is read back through read_with_deletes —
    one AQE-strategized LEFT ANTI join — and aggregated. Parity with the
    oracle (orders minus both key sets) proves the vectors subtract
    exactly their keys and nothing else. The copy-on-write fold
    (materialize_deletes) and its crash-safe swap are pinned in
    tests/test_lake.py."""
    from aws_kinesis_spark.sources.lake import (
        read_with_deletes,
        run_lake_batch,
        write_delete_vector,
    )

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a19_deletes"), "lake")
    # files_per_partition=32: the whole batch lands in one processing-hour
    # partition, so the salt spreads decode+write across every local core
    # instead of serializing on the single per-partition writer (lake.py
    # dial; a cluster run sizes this to cores-per-flush the same way).
    # The envelope ARRIVAL FIXTURE is a pure function of the input table —
    # landed to parquet once per sf_dir and re-read per call (the g35
    # fixture precedent): run_lake_batch's two consumers each scan cheap
    # parquet instead of re-paying (or checkpointing) the base64/JSON
    # synthesis, while the measured operator — lake write, DV commits,
    # merge-on-read — still starts from fresh lake state every call.
    env = _envelope_fixture(spark, sf_dir, "a19fix", lambda: synthesize_envelope(o))
    # the lake flush and the two delete-vector commits are mutually
    # independent (different inputs — env fixture vs orders scan — and
    # disjoint output objects; each DV lands atomically under its own id):
    # run all three as concurrent Spark jobs so the small DV scans
    # back-fill executors the flush's stage tail leaves idle (guide §2.6).
    # Only read_with_deletes below needs every commit durable.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(
                write_delete_vector,
                o.filter(F.col("o_orderkey") % m == r).select(
                    F.col("o_orderkey").alias("id")
                ),
                lake,
                delete_id=i,
                key_col="id",
            )
            for i, (m, r) in enumerate([(7, 3), (11, 5)], start=1)
        ]
        futs.append(
            pool.submit(
                run_lake_batch, env, lake, batch_id=0, raw_backup=False,
                files_per_partition=32,
            )
        )
        for f in futs:
            f.result()
    live = read_with_deletes(spark, lake, key_col="id")
    return live.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
    )


@register(
    "a20_zone_map_pruning",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               min(event_id) AS id_min,
               max(event_id) AS id_max
        FROM events
        WHERE event_id BETWEEN 100 AND 299
        GROUP BY event_type
    """,
)
def a20_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+ FILE SKIPPING via zone maps (Iceberg column-stats / Delta
    file-skipping pattern over this lake's manifest discipline,
    README.md:429 "readers consume the manifest, never the folder"): the
    events table lands range-clustered on event_id (repartitionByRange —
    each file owns a disjoint id span), build_zone_maps records per-file
    min/max in one distributed pass, and the range scan opens ONLY the
    overlapping files with the exact predicate as residual. Parity with
    the oracle proves skipping drops files, never rows; the
    files-actually-skipped count is pinned in tests/test_lake.py. At
    100 TB this is the difference between a metadata lookup + a few file
    reads and a full-table scan."""
    from aws_kinesis_spark.sources.lake import build_zone_maps, read_zone_pruned

    ev = load(spark, sf_dir, "events")
    lake = _scratch("a20_zonemap")
    data = os.path.join(lake, "data")
    # clustered layout: 8 files, each owning a contiguous event_id span
    ev.repartitionByRange(8, "event_id").write.mode("overwrite").parquet(data)
    build_zone_maps(spark, lake, ["event_id"])
    pruned = read_zone_pruned(spark, lake, "event_id", 100, 299)
    return pruned.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("event_id").alias("id_min"),
        F.max("event_id").alias("id_max"),
    )


@register(
    "a21_write_audit_publish",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS id_sum
        FROM orders
        WHERE o_orderkey % 2 = 0
        GROUP BY o_orderstatus
    """,
)
def a21_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ WRITE-AUDIT-PUBLISH (the Iceberg WAP workflow on this lake's
    manifest protocol — the quality-gated completion of the reference's
    ordered-two-PUT commit, README.md:413-430): a GOOD batch (even order
    keys) and a BAD batch (odd keys collapsed mod 10 — duplicate ids,
    violating the unique-key gate) are both staged; audits pass the good one and fail the bad
    one; the good manifest publishes via one atomic rename, the bad batch
    is dropped with its files. The manifest read — production's only
    sanctioned read path — sees exactly the audited batch: parity with
    the even-keys oracle proves the gate held and publish was
    all-or-nothing."""
    from aws_kinesis_spark.sources.lake import (
        audit_staged_batch,
        drop_staged_batch,
        publish_staged_batch,
        read_via_manifest,
        stage_lake_batch,
    )

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a21_wap"), "lake")
    good = synthesize_envelope(o.filter(F.col("o_orderkey") % 2 == 0))
    # bad batch: ids collapsed mod 10 -> massive duplication, fails the
    # unique-key audit gate
    bad = synthesize_envelope(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
            "o_orderkey", F.col("o_orderkey") % 10
        )
    )
    s0 = stage_lake_batch(good, lake, batch_id=0, raw_backup=False)
    stage_lake_batch(bad, lake, batch_id=1, raw_backup=False)
    ok0 = audit_staged_batch(spark, lake, 0, not_null=["id"], unique_key="id")
    ok1 = audit_staged_batch(spark, lake, 1, not_null=["id"], unique_key="id")
    assert ok0.passed and not ok1.passed, (ok0, ok1)
    # publish under the stage's fencing token (a concurrent re-stage of
    # batch 0 would fail this loudly instead of publishing foreign data)
    publish_staged_batch(lake, 0, writer=s0.writer)
    drop_staged_batch(lake, 1)
    back = read_via_manifest(spark, lake, 0)
    return back.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
    )


@register(
    "d34_asof_tolerance",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               CASE WHEN p.ts >= e.ts - INTERVAL 2 HOUR
                    THEN p.event_id END AS prior_event_id,
               CASE WHEN p.ts >= e.ts - INTERVAL 2 HOUR
                    THEN round(p.value, 4) END AS prior_value
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def d34_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 with a STALENESS BOUND (kdb wj / pandas merge_asof(tolerance)):
    the most recent prior purchase counts only if it happened within 2
    hours of the error — older carries reject to NULL. Same union+LOCF
    plan as d15 (one key shuffle + one sort, no range join); the bound is
    a post-window predicate on the carried match timestamp
    (operators/asof.py:asof_join(tolerance=...))."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pe_id"), F.round("value", 4).alias("pv")
    )
    joined = asof_join(
        errors,
        purchases,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["pe_id", "pv"],
        suffix="",
        tolerance="2 hours",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("pe_id").alias("prior_event_id"),
        F.col("pv").alias("prior_value"),
    )


@register(
    "a22_manifest_integrity",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS id_sum
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def a22_manifest_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ storage-rot detection: the manifest's byte totals and record
    counts (README.md:295-303, 516-523) let a consumer CERTIFY a batch
    before trusting it. A committed batch validates clean; truncating one
    data file flips the check to failed (byte-sum mismatch) without any
    reader crashing; restoring the file (idempotent batch replay) heals
    it. The returned aggregate reads the certified batch through the
    manifest — parity with the oracle proves the healed lake is
    byte-identical to the source (`sources/lake.py:validate_manifest`)."""
    from aws_kinesis_spark.sources.lake import (
        read_manifest,
        read_via_manifest,
        run_lake_batch,
        validate_manifest,
    )

    o = load(spark, sf_dir, "orders")
    # ONE materialized fixture (the a19 pattern): each run_lake_batch
    # flush consumes its env twice (count + write), so building the
    # envelope inline re-ran the full base64+to_json synthesis 4x per
    # invocation where a cheap parquet re-scan serves (round-13 review)
    env = _envelope_fixture(spark, sf_dir, "a22fix", lambda: synthesize_envelope(o))
    lake = os.path.join(_scratch("a22_integrity"), "lake")
    run_lake_batch(env, lake, batch_id=0, raw_backup=False,
                   files_per_partition=32)
    ok = validate_manifest(lake, 0, spark)
    assert ok.passed, ok.failures

    # storage rot: truncate one committed file
    victim = read_manifest(lake, 0)["entries"][0]["url"]
    original = open(victim, "rb").read()
    with open(victim, "wb") as fh:
        fh.write(original[: len(original) // 2])
    rotted = validate_manifest(lake, 0)
    assert not rotted.passed and "byte sum" in rotted.failures[0]

    # heal by idempotent replay, then certify and read
    run_lake_batch(env, lake, batch_id=0, raw_backup=False,
                   files_per_partition=32)
    healed = validate_manifest(lake, 0, spark)
    assert healed.passed, healed.failures
    back = read_via_manifest(spark, lake, 0)
    return back.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
    )


@register(
    "a23_zorder_clustering",
    oracle="""
        WITH z AS (
            SELECT list_sum([ ((((user_id % 128) >> i) & 1) << (2 * i))
                            + ((((EXTRACT(hour FROM ts) * 60
                                  + EXTRACT(minute FROM ts)) >> i) & 1) << (2 * i + 1))
                              for i in range(0, 11)]) AS zkey,
                   user_id % 128 AS ub,
                   EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts) AS mn
            FROM events
        )
        SELECT CAST(zkey >> 12 AS BIGINT) AS zbucket,
               count(*) AS n,
               CAST(min(ub) AS BIGINT) AS min_user, CAST(max(ub) AS BIGINT) AS max_user,
               CAST(min(mn) AS BIGINT) AS min_minute, CAST(max(mn) AS BIGINT) AS max_minute
        FROM z
        GROUP BY 1
    """,
)
def a23_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12+ layout maintenance: Z-ORDER (Morton-curve) clustering key over
    two dimensions — user bucket x minute-of-day — the multi-dimensional
    upgrade of compact_lake's single-column clustered rewrite (Delta
    OPTIMIZE ZORDER / Iceberg sort-order analogue; Morton 1966). Files
    sorted by the interleaved key hold tight min/max envelopes on BOTH
    dimensions, so zone maps prune point/range queries on either column
    — a lexicographic (user, minute) sort only prunes user. The query
    certifies the curve arithmetic (pure JVM bit ops, map-only) and the
    locality it buys: per curve-bucket row counts and per-dimension
    envelopes, byte-identical to the oracle's interleave. The clustered
    rewrite path itself (compact_lake(cluster_col=<zorder expr>)) is
    exercised in tests/test_lake.py."""
    from aws_kinesis_spark.operators.partitioning import zorder_key

    ev = load(spark, sf_dir, "events").select(
        F.pmod("user_id", F.lit(128)).alias("ub"),
        (F.hour("ts") * 60 + F.minute("ts")).alias("mn"),
    )
    z = ev.select("ub", "mn", zorder_key(["ub", "mn"], bits=11).alias("zkey"))
    return z.groupBy(F.shiftright("zkey", 12).alias("zbucket")).agg(
        F.count("*").alias("n"),
        F.min("ub").alias("min_user"),
        F.max("ub").alias("max_user"),
        F.min("mn").alias("min_minute"),
        F.max("mn").alias("max_minute"),
    )


@register(
    "a24_symlink_manifest_export",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS id_sum
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def a24_symlink_manifest_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ EXTERNAL-ENGINE INTEROP: export the lake's committed snapshot
    as Hive SYMLINK_TEXT_INPUT_FORMAT manifests — the layout Presto/
    Trino/Athena consume (Delta's Athena-compatibility mode), and exactly
    how the reference's Athena tier reads this lake without Spark
    (README.md:446, 468). Two batches land through the normal flush, the
    export derives one text manifest per partition dir FROM THE COMMIT
    PROTOCOL (never a folder listing, so uncommitted/superseded objects
    can't leak into it), and the read-back scans precisely the listed
    objects the way an external split planner would. Parity with the
    oracle over the source table proves the exported file set is the
    complete committed snapshot and nothing else
    (`sources/lake.py:export_symlink_manifests`)."""
    from aws_kinesis_spark.sources.lake import (
        export_symlink_manifests,
        read_via_symlink_manifests,
        run_lake_batch,
    )

    o = load(spark, sf_dir, "orders")
    lake = os.path.join(_scratch("a24_symlink"), "lake")
    # independent batch commits (disjoint batch=N prefixes, one manifest
    # each) — flush them as concurrent Spark jobs, the same overlap two
    # producers landing separate buffers would have
    from concurrent.futures import ThreadPoolExecutor

    # each half-envelope is a pure function of orders — parquet fixture
    # per sf_dir (g35/a19 precedent); each flush's two consumers re-scan
    # cheap parquet instead of re-synthesizing
    halves = [
        _envelope_fixture(
            spark, sf_dir, f"a24fix{i}",
            lambda i=i: synthesize_envelope(o.filter(F.col("o_orderkey") % 2 == i)),
        )
        for i in range(2)
    ]
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                run_lake_batch,
                halves[i],
                lake, batch_id=i, raw_backup=False, files_per_partition=16,
            )
            for i in range(2)
        ]
        for f in futs:
            f.result()
    n = export_symlink_manifests(lake)
    assert n > 0
    back = read_via_symlink_manifests(spark, lake)
    return back.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("id").cast("bigint").alias("id_sum"),
    )


@register(
    "a09_dlq_split",
    oracle="""
        SELECT 'ok' AS side,
               count(*) AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS id_sum
        FROM orders WHERE o_orderkey % 13 <> 0
        UNION ALL
        SELECT 'dlq',
               count(*),
               CAST(0 AS BIGINT)
        FROM orders WHERE o_orderkey % 13 = 0
    """,
)
def a09_dlq_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/B11 hard-certified: the DLQ split's ZERO-RECORDS-LOST invariant
    (README.md:134, 155-156, 383-384 — bad records are quarantined with
    an error prefix, never dropped silently, and one poison record never
    kills the batch). Every 13th record's payload is mangled into
    invalid base64 BEFORE decode; the decode stage routes exactly those
    to the DLQ branch as a boolean filter (no exception path), and the
    ok side decodes byte-identically to the source. Parity proves both
    directions at once: nothing leaked into ok (id_sum matches the
    untainted keys exactly) and nothing vanished (the two sides
    partition the input, n_ok + n_dlq = |orders|).

    Scale: the split is the `_corrupt` boolean the decode expressions
    emit — per-record constant cost inside whole-stage codegen — and the
    certifying aggregate groups ON that boolean, so both sides come out
    of ONE pass over the decode (a per-side filter+agg union would scan
    and decode the batch once per side)."""
    from aws_kinesis_spark.sources.envelope import decode_envelope

    o = load(spark, sf_dir, "orders")
    env = synthesize_envelope(o)
    # the envelope's composite key ends in "-<id>": taint by key so the
    # corruption is decided WITHOUT decoding (as storage rot would be)
    key_id = F.regexp_extract("partition_key", r"(\d+)$", 1).cast("long")
    env = env.withColumn(
        "data",
        F.when(key_id % 13 == 0, F.lit("%%not-base64%%")).otherwise(F.col("data")),
    )
    dec = decode_envelope(env)
    return dec.groupBy(
        F.when(F.col("_corrupt"), F.lit("dlq")).otherwise(F.lit("ok")).alias("side")
    ).agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.when(~F.col("_corrupt"), F.col("id"))), F.lit(0)
        ).cast("bigint").alias("id_sum"),
    )


@register(
    "a11_raw_backup",
    oracle="""
        SELECT count(*) AS n_backup,
               CAST(sum(CASE WHEN o_orderkey % 13 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ok,
               CAST(sum(CASE WHEN o_orderkey % 13 <> 0 THEN o_orderkey END)
                    AS BIGINT) AS id_sum_ok
        FROM orders
    """,
)
def a11_raw_backup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 hard-certified: RAW BACKUP COMPLETENESS (README.md:605
    S3BackupMode=AllData — the unparsed envelope lands in backup/
    regardless of what the transform thinks of it). Every 13th payload is
    tainted into invalid base64; the main path quarantines those to the
    DLQ, but the raw backup must still hold EVERY input record untouched
    — including the poison ones — or disaster recovery silently loses
    exactly the records that were having problems. The certificate
    aggregates the backup alone: its total row count covers the whole
    input, and re-decoding it yields the same ok-subset the main path
    kept (byte-fidelity of the backed-up payloads, not just the count).

    Scale: the backup write is a straight unparsed copy (no decode on
    that branch); the certificate is one pass over the backup with a
    conditional aggregate."""
    from aws_kinesis_spark.sources.envelope import decode_envelope
    from aws_kinesis_spark.sources.lake import run_lake_batch

    o = load(spark, sf_dir, "orders")

    def _tainted():
        key_id = F.regexp_extract("partition_key", r"(\d+)$", 1).cast("long")
        return synthesize_envelope(o).withColumn(
            "data",
            F.when(key_id % 13 == 0, F.lit("%%not-base64%%")).otherwise(F.col("data")),
        )

    # four consumers (write, count, DLQ write, backup) — each scans the
    # per-sf parquet fixture (pure function of the input; g35 precedent)
    env = _envelope_fixture(spark, sf_dir, "a11fix", _tainted)
    lake = os.path.join(_scratch("a11_backup"), "lake")
    run_lake_batch(env, lake, batch_id=0, raw_backup=True, files_per_partition=32)
    # spread the certificate's re-decode: the backup mirrors arrival shape
    # (one object per flush), so scanning it yields ONE partition and the
    # whole base64+JSON verification chain would run on a single core —
    # the same serial-decode trap run_lake_batch itself closed this round
    # (interleaved A/B: 4.39 -> 4.08 s min at sf0.1)
    back = spark.read.parquet(os.path.join(lake, "raw", "batch=0")).repartition(
        spark.sparkContext.defaultParallelism
    )
    dec = decode_envelope(back)
    return dec.agg(
        F.count("*").alias("n_backup"),
        F.sum(F.when(~F.col("_corrupt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ok"),
        F.sum(F.when(~F.col("_corrupt"), F.col("id")))
        .cast("bigint")
        .alias("id_sum_ok"),
    )
