"""Relational / analytical operator surface over the lake (SURVEY.md §2.D).

The reference delegates this surface to Athena/Redshift/DuckDB/Spark
(README.md:160-168, 441-456, 551-575 in /root/reference/); our engine answers
natively via Catalyst. Every query here is declarative DataFrame API so
predicate pushdown / column pruning / join selection are free (SURVEY.md §4).

Float discipline: aggregates over doubles are rounded to 4-6 decimals in BOTH
the Spark query and the oracle SQL, so engine-order-dependent last-bit float
differences cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_kinesis_spark.registry import register
from aws_kinesis_spark.tables import load


# --------------------------------------------------------------------------
# D1-D4: projection / filter / partition-pruned filter / limit
# --------------------------------------------------------------------------


@register(
    "d01_projection",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def d01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection (README.md:554): column pruning reaches the parquet scan."""
    return load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "d02_filter_predicate",
    oracle="""
        SELECT l_orderkey, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def d02_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate pushed to the parquet scan (README.md:164, 443)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")


@register(
    "d03_time_pruned_filter",
    oracle="""
        SELECT event_id, ts, event_type, value
        FROM events
        WHERE EXTRACT(hour FROM ts) = 14
    """,
)
def d03_time_pruned_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`WHERE hour = 14` (README.md:556-558). On the hive-partitioned lake this
    is partition pruning (tested in tests/test_lake.py); here the SQL-surface
    twin on the raw events table."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.hour("ts") == 14).select("event_id", "ts", "event_type", "value")


@register(
    "d04_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def d04_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT with deterministic order (README.md:557)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# D5-D7: joins / set ops
# --------------------------------------------------------------------------


@register(
    "d05_join_star",
    oracle="""
        SELECT r_name, n_name,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
)
def d05_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join (README.md:574 pattern): dims broadcast so the
    only shuffle is the final aggregation; at 100 TB the fact side never
    shuffles for the join itself."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


@register(
    "d06_join_semi_anti",
    oracle="""
        SELECT c_custkey, c_name, 'no_orders' AS reason
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, c_name, 'has_open' AS reason
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def d06_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti + left-semi joins — the two halves of the reference's
    staging-table upsert (README.md:573-575)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    no_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("reason", F.lit("no_orders"))
    )
    has_open = (
        customer.join(
            orders.filter(F.col("o_orderstatus") == "O"),
            customer.c_custkey == orders.o_custkey,
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .withColumn("reason", F.lit("has_open"))
    )
    return no_orders.unionByName(has_open)


@register(
    "d07_set_ops",
    oracle="""
        WITH hi AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000),
             urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT o_orderkey, 'union' AS op FROM (SELECT * FROM hi UNION SELECT * FROM urgent)
        UNION ALL
        SELECT o_orderkey, 'intersect' AS op FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent)
        UNION ALL
        SELECT o_orderkey, 'except' AS op FROM (SELECT * FROM hi EXCEPT SELECT * FROM urgent)
    """,
)
def d07_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / intersect / except (README.md:575 INSERT-SELECT append; the
    zero-duplicate audits at README.md:178)."""
    orders = load(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        hi.union(urgent).distinct().withColumn("op", F.lit("union"))
        .unionByName(hi.intersect(urgent).withColumn("op", F.lit("intersect")))
        # subtract() IS EXCEPT DISTINCT — exceptAll().distinct() built the
        # bag-difference plan plus a second aggregation for the same rows
        .unionByName(hi.subtract(urgent).withColumn("op", F.lit("except")))
    )


# --------------------------------------------------------------------------
# D8-D10: aggregation / time buckets / distinct
# --------------------------------------------------------------------------


@register(
    "d08_agg_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)       AS sum_qty,
               round(sum(l_extendedprice), 4)  AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               round(avg(l_quantity), 4)       AS avg_qty,
               round(avg(l_extendedprice), 4)  AS avg_price,
               round(avg(l_discount), 4)       AS avg_disc,
               count(*)                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def d08_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with count/sum/avg (README.md:260, 172, 38) — TPC-H
    Q1 shape; Catalyst does partial (map-side) + final aggregation."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "d09_tumbling_hourly_agg",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def d09_tumbling_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (README.md:130, 38) via the same
    `window()` operator the streaming path uses."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "d10_distinct",
    oracle="""
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def d10_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct / duplicate detection (README.md:204, 178)."""
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# D11-D13: sort / top-k / window functions
# --------------------------------------------------------------------------


@register(
    "d11_sort_topn",
    oracle="""
        SELECT event_id, user_id, value
        FROM events
        ORDER BY value DESC, event_id
        LIMIT 100
    """,
)
def d11_sort_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-by with deterministic tiebreak (README.md:53, 309): Spark plans
    this as TakeOrderedAndProject — no global sort materialized."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
    )


@register(
    "d12_latest_per_key",
    oracle="""
        SELECT user_id, event_id, ts, event_type
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def d12_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key — the OpenSearch keep-latest-doc-per-id semantics
    (README.md:167-168, 307)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "d13_window_functions",
    oracle="""
        SELECT event_id, user_id,
               round(value, 4) AS value_r,
               round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS prev_value,
               round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS next_value,
               rank()       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
        FROM events
    """,
)
def d13_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead for CDC before/after-image analysis
    (README.md:224, 307), rank, running sum."""
    ev = load(spark, sf_dir, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    w_run = w_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value_r"),
        F.round(F.lag("value").over(w_ts), 4).alias("prev_value"),
        F.round(F.lead("value").over(w_ts), 4).alias("next_value"),
        F.rank().over(w_val).alias("value_rank"),
        F.round(F.sum("value").over(w_run), 4).alias("running_sum"),
    )


# --------------------------------------------------------------------------
# D14: rollup / cube / grouping sets
# --------------------------------------------------------------------------


@register(
    "d14_rollup",
    oracle="""
        SELECT EXTRACT(year FROM l_shipdate)::INT AS ship_year,
               l_returnflag,
               count(*) AS n,
               round(sum(l_extendedprice), 4) AS sum_price
        FROM lineitem
        GROUP BY ROLLUP (1, l_returnflag)
    """,
)
def d14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup across the time hierarchy (README.md:130, 323-330)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("ship_year", F.year("l_shipdate"))
        .rollup("ship_year", "l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("sum_price"))
    )


@register(
    "d14b_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 4) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def d14b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube aggregation (README.md:592-599 cost/volume rollups)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )


# --------------------------------------------------------------------------
# D16-D21: scalar function families
# --------------------------------------------------------------------------


@register(
    "d16_string_functions",
    oracle="""
        SELECT p_partkey,
               upper(p_brand)                                   AS brand_up,
               lower(p_type)                                    AS type_lo,
               substring(p_name, 1, 8)                          AS name_pfx,
               length(p_name)                                   AS name_len,
               concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
               regexp_extract(p_name, '([a-z]+)$', 1)           AS name_last,
               replace(p_name, ' ', '_')                        AS name_us,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0')        AS key_pad,
               (p_name LIKE '%red%')                            AS has_red,
               trim('  ' || p_brand || '  ')                    AS brand_trim
        FROM part
    """,
)
def d16_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface (README.md:85, 130, 224): concat/substr/regexp/
    case/pad/like — all JVM-side, whole-stage-codegen friendly. The regexp,
    LIKE, and trim columns run over p_name/p_brand, which VARY on the
    fixture — pointed at p_type (all-uppercase) and a literal they were
    vacuous constants, differentially proving nothing (round-12 review)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("name_last"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    )


@register(
    "d17_datetime_functions",
    oracle="""
        SELECT event_id,
               EXTRACT(year FROM ts)::INT   AS y,
               EXTRACT(month FROM ts)::INT  AS mo,
               EXTRACT(day FROM ts)::INT    AS d,
               EXTRACT(hour FROM ts)::INT   AS h,
               EXTRACT(minute FROM ts)::INT AS mi,
               strftime(ts, '%Y-%m-%d')     AS day_str,
               epoch_ms(date_trunc('millisecond', ts)) AS epoch_millis,
               date_diff('day', TIMESTAMP '2024-01-01', ts) AS days_since,
               date_trunc('day', ts)        AS day_ts,
               ts + INTERVAL 90 MINUTE      AS ts_plus
        FROM events
    """,
)
def d17_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (README.md:248, 145, 204): component
    extraction, formatting, epoch math, interval arithmetic."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        (F.unix_millis(F.date_trunc("millisecond", F.col("ts")))).alias("epoch_millis"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_trunc("day", "ts").alias("day_ts"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
    )


@register(
    "d18_math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net,
               abs(l_discount - 0.05)                        AS disc_dev,
               CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
               round(power(l_quantity, 2), 4)                AS qty_sq,
               l_orderkey % 7                                AS key_mod,
               round(sqrt(l_extendedprice), 4)               AS price_sqrt,
               CAST(trunc(l_quantity) AS INT)                AS qty_int
        FROM lineitem
    """,
)
def d18_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface (README.md:278, 323-330): rounding, powers,
    modulo, casts — the compression/cost accounting arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow("l_quantity", 2), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        # cast(double as int) TRUNCATES in Spark but rounds half-to-even
        # in DuckDB — the oracle pins truncation explicitly via trunc()
        # so the twin stays equivalent for non-integral quantities too
        # (round-12 review; the fixture happens to be integral today)
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


@register(
    "d19_array_functions",
    oracle="""
        SELECT vec_id,
               len(embedding)                                      AS dim,
               round(CAST(embedding[1] AS DOUBLE), 6)              AS first_elem,
               round(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
               len(list_filter(embedding, x -> x > 0))             AS n_positive
        FROM embeddings
    """,
)
def d19_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface (README.md:295-303 manifest entries[]):
    size/element_at/transform/filter/aggregate — higher-order functions stay
    JVM-side (no Python round-trip)."""
    em = load(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            6,
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "d20_json_functions",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k,
               (CAST(json_extract_string(props, '$.k') AS INT) > 50) AS k_high
        FROM events
    """,
)
def d20_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface (README.md:144): get_json_object / from_json over
    the events props column."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k"), (k > 50).alias("k_high"))


@register(
    "d21_conditional_null",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'partial' END AS status_label,
               coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio,
               (o_totalprice IS NULL) AS price_missing,
               CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
        FROM orders
    """,
)
def d21_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null handling (README.md:142, 156, 300): the Ok-vs-
    ProcessingFailed routing expressed as when/otherwise + coalesce/nullif."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")).alias(
            "prio"
        ),
        F.isnull("o_totalprice").alias("price_missing"),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_class"),
    )


@register(
    "d14c_grouping_sets",
    oracle="""
        SELECT EXTRACT(year FROM o_orderdate)::INT AS year,
               o_orderstatus AS status,
               count(*) AS n, round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY GROUPING SETS ((year, status), (year), ())
    """,
)
def d14c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (SURVEY.md §3.3 — the
    interactive `spark.sql` path is literally Catalyst): the same one-pass
    expand-aggregate as rollup/cube, with a hand-picked set list."""
    o = load(spark, sf_dir, "orders")
    view = "orders_d14c"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""SELECT year(o_orderdate) AS year,
                   o_orderstatus AS status,
                   count(*) AS n, round(sum(o_totalprice), 4) AS total
            FROM {view}
            GROUP BY GROUPING SETS ((year, status), (year), ())"""
    )


@register(
    "d22_golden_point_lookup",
    oracle="""
        SELECT o_orderkey AS id,
               o_orderstatus AS status,
               EXTRACT(hour FROM o_orderdate)::INT AS hour
        FROM orders
        WHERE o_orderkey = 98 AND EXTRACT(hour FROM o_orderdate)::INT = 0
    """,
)
def d22_golden_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's golden query (README.md:554-559: `SELECT id, status,
    processed_at FROM cdc.orders WHERE hour=14 LIMIT 1` returning one known
    row): decode the CDC envelope into the lake shape, point-look-up one id
    inside one hour partition. processed_at is wall-clock (README.md:145) so
    the deterministic twin keys the hour off arrival_ts instead — the
    fixture's envelope carries date-grain arrivals (FIXTURES.md §2), so the
    selected hour partition is 0; the hour PREDICATE still evaluates in the
    plan on both engines (a regression in hour() extraction empties the
    result), where it used to be projected but never filtered on
    (round-12 review)."""
    from aws_kinesis_spark.sources.envelope import decode_envelope, synthesize_envelope

    env = synthesize_envelope(load(spark, sf_dir, "orders"))
    lake = decode_envelope(env).withColumn("hour", F.hour("arrival_ts"))
    return lake.filter((F.col("id") == 98) & (F.col("hour") == 0)).select(
        "id", "status", "hour"
    )


@register(
    "d14d_pivot",
    oracle="""
        SELECT EXTRACT(year FROM o_orderdate)::INT AS year,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS total_open
        FROM orders
        GROUP BY 1
    """,
)
def d14d_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status columns per year) — one pass with an explicit pivot
    value list, so Spark skips the extra distinct-values job and the plan
    stays a single hash aggregate (the FILTER-aggregation form the oracle
    uses is exactly what pivot compiles to)."""
    o = load(spark, sf_dir, "orders")
    p = (
        o.withColumn("year", F.year("o_orderdate"))
        .groupBy("year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )
    # Spark pivot yields NULL counts for (year, status) combos with no rows;
    # SQL's count(*) FILTER yields 0 — coalesce so empty combos agree.
    return p.select(
        "year",
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).alias("n_pending"),
        F.col("O_total").alias("total_open"),
    )


# --------------------------------------------------------------------------
# D23-D24: subqueries through the raw-SQL surface; D08b: statistical aggs
# --------------------------------------------------------------------------


@register(
    "d23_correlated_scalar_subquery",
    oracle="""
        SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 4) AS acctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def d23_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via the raw-SQL entry point (run_sql):
    customers above their nation's average balance. Catalyst decorrelates
    this into an aggregate + join — the per-nation average is computed once,
    not per outer row, so the plan scales as one shuffle on c_nationkey."""
    from aws_kinesis_spark.tables import run_sql

    return run_sql(
        spark,
        sf_dir,
        """SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 4) AS acctbal
           FROM customer c
           WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                                WHERE c2.c_nationkey = c.c_nationkey)""",
    )


@register(
    "d24_exists_subquery",
    oracle="""
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def d24_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS subqueries via the raw-SQL entry point: customers
    with an open order but no pending one. Catalyst rewrites the pair into a
    left-semi + left-anti join on o_custkey (same physical shape as d06), so
    the subquery surface costs nothing extra at scale."""
    from aws_kinesis_spark.tables import run_sql

    return run_sql(
        spark,
        sf_dir,
        """SELECT c.c_custkey, c.c_name
           FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
             AND NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""",
    )


@register(
    "d08b_stats_aggregates",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def d08b_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 statistical extension: sample stddev / covariance / correlation per
    return flag — second-moment aggregates Catalyst computes in the same
    single partial+final hash-aggregate pass as sum/avg (values kept in
    well-conditioned ranges so 4-6 decimal rounding is oracle-stable)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@register(
    "d10c_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.25), 4) AS p25,
               round(quantile_cont(l_quantity, 0.50), 4) AS p50,
               round(quantile_cont(l_quantity, 0.95), 4) AS p95
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def d10c_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics). The exact form needs the per-group
    values collected at the reducer, which is fine for low-cardinality
    groups; high-cardinality/100 TB paths switch to approx_percentile
    (t-digest, mergeable partial state) — d10b is that pattern's twin."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95"),
    )


@register(
    "d26_sessionization",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts)
                             - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id))
                             > 1800000000
                             OR lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess,
                   event_id
            FROM events
        ),
        numbered AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round(sum(value), 4) AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def d26_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks after a
    30-minute silence per user. lag -> new-session flag -> running sum
    assigns ids in ONE window pass (single shuffle on user_id, reused by
    both window functions and carried into the final aggregation), then a
    per-session rollup — the batch twin of the streaming session window
    (e03). Gap math as a timestamp-difference interval so it binds for both
    TIMESTAMP and TIMESTAMP_NTZ source columns (parquet timestamp[us]
    without tz infers NTZ) at exact microsecond precision."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0)
    )
    numbered = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "d27_rolling_time_window",
    oracle="""
        SELECT o_custkey, o_orderkey,
               count(*) OVER w AS n_90d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                    AS DOUBLE) AS sum_90d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
    """,
)
def d27_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 range-frame flavor: per-customer rolling 90-day order count and
    spend — RANGE BETWEEN over event time (as epoch seconds, identical
    numeric frame semantics on both engines), the trailing-window analytic
    the hourly-rollup lake serves (README.md:38 "hourly analytics on every
    order change").

    Money sums go through DECIMAL(18,2) so accumulation order can't wobble
    the float result. Scale: one shuffle on o_custkey; frame state per key is
    bounded by the 90-day row span, independent of total history length."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_90d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_90d"),
    )


@register(
    "d28_relational_division",
    oracle="""
        SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_priorities
        FROM orders
        GROUP BY o_custkey
        HAVING count(DISTINCT o_orderpriority) =
               (SELECT count(DISTINCT o_orderpriority) FROM orders)
    """,
)
def d28_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (universal quantification): customers whose
    orders span EVERY priority level in the data — the 'for all' query shape
    (served in SQL by HAVING count(DISTINCT) = scalar subquery).

    Plan: one distinct-agg per customer plus a 1-row broadcast of the global
    distinct count — no per-element anti-join cascade. Scale: the only
    shuffle is the groupBy on the division key; the divisor side is a scalar."""
    orders = load(spark, sf_dir, "orders")
    total = orders.select(
        F.countDistinct("o_orderpriority").alias("__t")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_priorities")
    )
    return (
        per_cust.join(F.broadcast(total))
        .filter(F.col("n_priorities") == F.col("__t"))
        .select("o_custkey", "n_priorities")
    )


@register(
    "d30_recursive_hierarchy",
    oracle="""
        WITH RECURSIVE walk AS (
            SELECT o_orderkey AS k, o_orderkey AS cur, 0 AS depth FROM orders
            UNION ALL
            SELECT k, cur // 10, depth + 1 FROM walk WHERE cur >= 10
        )
        SELECT k AS o_orderkey, cur AS root_digit, depth
        FROM walk WHERE cur < 10
    """,
)
def d30_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative/hierarchical SQL (the query family Athena/Redshift serve
    with WITH RECURSIVE): every order key walks its decimal-digit parent
    chain (parent = key DIV 10) to its root digit, carrying the depth —
    the BOM-explosion / org-chart traversal shape, run through Spark 4's
    native recursive CTE (UnionLoop) so Catalyst owns the iteration
    instead of a driver-side loop. Rounds are bounded by log10(max key)
    (~6 at sf1), each one map-only — no shuffle in the recursive step; the
    same SQL text (modulo the integer-division spelling) runs on DuckDB."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__d30_orders")
    return spark.sql("""
        WITH RECURSIVE walk AS (
            SELECT o_orderkey AS k, o_orderkey AS cur, 0 AS depth
            FROM __d30_orders
            UNION ALL
            SELECT k, cur DIV 10, depth + 1 FROM walk WHERE cur >= 10
        )
        SELECT k AS o_orderkey, cur AS root_digit, depth
        FROM walk WHERE cur < 10
    """)


@register(
    "d31_unpivot",
    oracle="""
        WITH a AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 4)      AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS sum_disc_price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_base_price', sum_base_price FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM a
    """,
)
def d31_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 inverse: UNPIVOT/melt — wide metric columns back to long
    (metric, value) rows via the native DataFrame.unpivot (Spark's Expand
    node: each input row fans out in-place, map-only — the same zero-extra-
    shuffle shape rollup/cube use; the only exchange is the aggregation's
    own). The wide side comes from the d08-style pricing aggregate so the
    pair (d14d pivot, d31 unpivot) closes the reshaping round-trip."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "sum_disc_price"],
        "metric",
        "value",
    )


@register(
    "d32_gap_fill",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   count(*) AS n, round(sum(value), 4) AS sv
            FROM events WHERE user_id < 30 GROUP BY 1, 2
        ),
        bounds AS (
            SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
            FROM bounds
        )
        SELECT s.user_id, s.hour_start,
               coalesce(h.n, 0) AS n_events,
               last_value(h.sv IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.hour_start)
                   AS filled_value
        FROM spine s
        LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour_start = h.h
    """,
)
def d32_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9+: hypertable-style GAP FILL — the time-series completion a
    continuous-aggregate consumer needs: every hour between each key's
    first and last activity materializes (empty hours included, n_events=0)
    and a gauge column carries forward (LOCF) across the gaps.

    Plan: one hourly aggregate (partial+final), per-key bounds from a
    re-aggregation of the tiny hourly table, the dense spine generated
    IN-ROW by sequence()+explode (no driver loop, no cross join with a
    calendar table), a left join back on (key, hour), and one LOCF window.
    Every stage shuffles on the key or (key, hour) — linear in the spine,
    immune to the calendar-cross-join blowup; spine width is bounded by
    each key's own activity range, not the table's global span."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    filled = spine.join(
        hourly,
        (spine["user_id"] == hourly["user_id"])
        & (spine["hour_start"] == hourly["h"]),
        "left",
    ).select(spine["user_id"], "hour_start", "n", "sv")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.last("sv", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "d33_histogram",
    oracle="""
        WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                   FROM orders)
        SELECT CAST(least(floor((o_totalprice - lo) * 10 / (hi - lo)), 9)
                    AS BIGINT) AS bucket,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders CROSS JOIN b
        GROUP BY 1
    """,
)
def d33_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ profiling: equi-width histogram with IN-PLAN bounds — the
    EDA/monitoring primitive behind data-drift dashboards. The min/max
    bounds fold in as one broadcast scalar row (no driver round-trip, no
    two-pass collect-then-requery); the bucket id is a pure IEEE
    expression (floor((x-lo)*n/(hi-lo)), clamped so the max lands in the
    top bucket) written identically in both engines, and the aggregate
    carries map-side partials — shuffle traffic is O(buckets)."""
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) * 10 / (F.col("hi") - F.col("lo"))
        ),
        F.lit(9),
    ).cast("bigint")
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "d35_percentile_profile",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) + 0.0 AS p25,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50), 4) + 0.0 AS p50,
               round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 4) + 0.0 AS p75,
               round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50), 4) + 0.0 AS med_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def d35_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ profiling: EXACT continuous percentiles per group (linear
    interpolation at p*(n-1) — the quantile_cont/percentile_cont
    definition both engines implement identically over doubles). The
    exact form needs the group's values sorted, so it shuffles once on
    the group key and sorts within groups — right when groups are many
    and each fits an executor. For a 100 TB single-group profile use
    approx_percentile (t-digest sketch, map-side mergeable, one scalar
    row out) — exactness there is neither needed nor worth a global
    sort; this registered form is the oracle-grade profile."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    qty = F.col("l_quantity").cast("double")
    # ONE percentile buffer for all three price quantiles (array form) —
    # four scalar percentile aggregates would hold four copies of the
    # group's values; this holds two (price + qty), same exact math
    prices = F.percentile(price, F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75)))
    out = li.groupBy("l_returnflag").agg(
        prices.alias("__p"),
        F.percentile(qty, F.lit(0.50)).alias("__mq"),
    )
    return out.select(
        "l_returnflag",
        (F.round(F.element_at("__p", 1), 4) + F.lit(0.0)).alias("p25"),
        (F.round(F.element_at("__p", 2), 4) + F.lit(0.0)).alias("p50"),
        (F.round(F.element_at("__p", 3), 4) + F.lit(0.0)).alias("p75"),
        (F.round("__mq", 4) + F.lit(0.0)).alias("med_qty"),
    )


@register(
    "d36_approx_percentile_check",
    oracle="""
        SELECT l_returnflag, count(*) AS n, true AS within_bounds
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def d36_approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ SKETCH path of d35, certified: the t-digest/GK median
    (approx_percentile, accuracy=1000 => rank error <= 0.1%) must land
    inside the EXACT percentile band [p50 - 2eps, p50 + 2eps] computed in
    the same aggregate — the self-check-oracle pattern the ANN recall
    queries use (the oracle pins the per-group row counts as exact
    anchors and the bound as an always-true claim the Spark plan actually
    evaluates). This is the form a 100 TB profile runs: the sketch is
    map-side mergeable with O(accuracy) state per group, no per-group
    value buffer, no sort — d35's exact form stays the oracle-grade
    answer when groups are small enough to hold."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    eps = 1.0 / 1000
    # The tight interpolated band is only a VALID bound once the group is
    # large enough that the sketch's rank guarantee (eps*n) dominates the
    # ±1 discrete-element slop — percentile_approx returns a data ELEMENT,
    # and for a tiny group both candidate elements can sit outside the
    # interpolated 0.498..0.502 band (round-12 review; guaranteed from
    # roughly n >= 2000, enforced at 5000 for margin). Small groups fall
    # back to the membership bound the sketch does guarantee: the element
    # lies within the group's [min, max].
    approx = F.percentile_approx(price, F.lit(0.5), F.lit(1000))
    # ONE array-percentile buffer for both band edges: percentile(col,
    # array(lo, hi)) sorts/counts the group's values once and interpolates
    # both ranks from the same state, where two scalar percentile() calls
    # are distinct aggregate expressions Catalyst cannot merge — each
    # keeping its own per-group value map (plan before: two
    # partial_percentile functions; after: one). Values are identical:
    # the array form runs the same interpolation per element.
    band = F.percentile(price, F.array(F.lit(0.5 - 2 * eps), F.lit(0.5 + 2 * eps)))
    tight = approx.between(F.element_at(band, 1), F.element_at(band, 2))
    loose = approx.between(F.min(price), F.max(price))
    # branch on count(PRICE), not count(*): the sketch's rank guarantee
    # scales with NON-NULL values, so a big mostly-NULL group must take
    # the loose membership bound it can actually satisfy — and a group
    # with NO prices makes a vacuously-true claim (every aggregate is
    # NULL, so between() was NULL, diverging from the oracle's pinned
    # true) (round-13 review)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.when(F.count(price) == 0, F.lit(True))
        .when(F.count(price) >= 5000, tight)
        .otherwise(loose)
        .alias("within_bounds"),
    )


@register(
    "d38_funnel_steps",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t0
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t1
            GROUP BY e.user_id
        )
        SELECT 1 AS stage, 'view' AS step, (SELECT count(*) FROM v) AS n_users
        UNION ALL
        SELECT 2, 'click_after_view', (SELECT count(*) FROM c)
        UNION ALL
        SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p)
    """,
)
def d38_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ ORDERED-FUNNEL analysis (the view -> click -> purchase question
    every product-analytics engine answers): users counted at stage k only
    if step k happened strictly AFTER their first completion of stage k-1
    — ordering matters, so this is NOT three independent filters. Shape:
    per-stage conditional min-ts aggregates chained by equi-joins on
    user_id; each stage's frame shrinks monotonically, so later joins are
    broadcast-eligible (AQE decides) and the events scan is touched once
    per stage with the event-type predicate pushed down. At 100 TB the
    same chain runs per (user-bucket) partition; no window over the full
    event stream is ever needed."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    rows = [
        (1, "view", v),
        (2, "click_after_view", c),
        (3, "purchase_after_click", p),
    ]
    out = None
    for stage, step, df in rows:
        one = df.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"), F.lit(step).alias("step"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "d39_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
            FROM events GROUP BY user_id
        ),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS wk
            FROM events
        )
        SELECT CAST(f.cohort AS VARCHAR) AS cohort_week,
               CAST(floor(date_diff('day', f.cohort, a.wk) / 7) AS BIGINT)
                   AS week_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM firsts f JOIN active a USING (user_id)
        GROUP BY 1, 2
    """,
)
def d39_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ COHORT RETENTION (the week-k retention triangle): users grouped
    by the ISO week of their FIRST event, counted in every later week
    they were active — the second canonical product-analytics shape next
    to d38's funnel. Two aggregates (first-week per user, distinct
    active-weeks per user) joined on user_id, then one count-distinct per
    (cohort, offset) cell. Scale: both aggregates are map-side partial
    over the same user-hashed shuffle; the cell count is O(users x
    active-weeks), never O(events), after the distinct."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            F.col("cohort").cast("string").alias("cohort_week"),
            F.floor(F.datediff("wk", "cohort") / 7).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "d40_ordered_sequence_agg",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_types,
               string_agg(event_type, ',' ORDER BY ts, event_id)
                   AS event_sequence
        FROM events
        GROUP BY user_id
    """,
)
def d40_ordered_sequence_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8+ ORDER-SENSITIVE AGGREGATION (SQL's string_agg ... ORDER BY /
    listagg WITHIN GROUP): each user's chronologically ordered event-type
    sequence — the per-entity event-history assembly behind funnel mining,
    next-action models, and conversation/session reconstruction for
    training data. Spark has no ordered collect (collect_list order is
    partition-arrival nondeterministic), so the deterministic form is
    sort_array(collect_list(struct(ts, event_id, type))) — the struct
    sorts lexicographically (ts, then event_id as the tie-break), making
    the sequence reproducible on ANY partitioning — then a transform/
    array_join projection peels the ordering keys off. Scale: one
    user-hashed shuffle with map-side partial collect; the sort is
    per-group over that user's own events (never a global or per-partition
    sort), so a 100 TB event log costs one exchange and group-local
    sorts. HOT-KEY BOUND (round-13 VERDICT #4): the per-key array is
    unbounded BY CONSTRUCTION — the operator's contract is each key's
    FULL ordered history, so one aggregation state buffers that key's
    entire sequence; per-key memory is O(that key's events), not O(rows /
    parallelism). At 100 TB a pathological key (a bot account, a null-ish
    default id) can exceed one task's heap. The guard is composition, not
    a silent truncation inside this operator: pre-cap the hot keys with
    g50's skew-safe ``cap_per_key(events, "user_id", "event_id", K)``
    (deterministic, skew-immune) or segment genuinely unbounded keys by a
    time bucket (group on (user_id, day) so each state holds one day).
    tests/test_properties.py pins correctness under a deliberately hot
    key and the cap_per_key composition. Reference: the per-key ordered
    consumption contract (README.md:75-76, 204 — records with the same
    key replay in order)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return ordered_sequence_agg(ev)


def ordered_sequence_agg(ev: DataFrame) -> DataFrame:
    """d40's kernel over an explicit (user_id, ts, event_id, event_type)
    frame — factored out so the hot-key property test (and any caller
    composing the g50 pre-cap) can drive it on synthetic inputs. See
    d40_ordered_sequence_agg's docstring for semantics and the hot-key
    memory bound."""
    seq = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ",",
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        seq.alias("event_sequence"),
    )


@register(
    "d41_linear_interpolate",
    oracle="""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   round(avg(value), 4) AS sv
            FROM events WHERE user_id < 30 GROUP BY 1, 2
        ),
        bounds AS (
            SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
            FROM bounds
        ),
        f AS (
            SELECT s.user_id, s.hour_start, h.sv
            FROM spine s
            LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour_start = h.h
        ),
        m AS (
            SELECT user_id, hour_start, sv,
                   last_value(sv IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_start) AS pv,
                   last_value(CASE WHEN sv IS NOT NULL THEN hour_start END
                              IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_start) AS ph,
                   first_value(sv IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_start
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN sv IS NOT NULL THEN hour_start END
                               IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY hour_start
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
            FROM f
        )
        SELECT user_id, hour_start,
               floor((CASE WHEN sv IS NOT NULL THEN sv
                      ELSE pv + (nv - pv)
                           * (CAST(epoch(hour_start) - epoch(ph) AS DOUBLE)
                              / CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END)
                     * 10000 + 0.5) / 10000.0 AS gauge,
               sv IS NULL AS interpolated
        FROM m
    """,
)
def d41_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9+ LINEAR-INTERPOLATION gap fill — d32's twin for GAUGE series
    where carry-forward lies (TimescaleDB's interpolate() next to locf()):
    every missing hour gets the value linearly interpolated between the
    nearest known readings on either side. Gaps are strictly interior
    (the spine spans each key's own first..last known hour), so both
    anchors always exist and no boundary branch is needed.

    Plan: the d32 spine machinery (hourly partial+final agg, in-row
    sequence()+explode spine, one left join back), then FOUR window
    expressions over the SAME (user_id, hour_start) sort — previous/next
    known value and their timestamps via last/first ignorenulls over the
    preceding/following frames — Spark evaluates them in one exchange +
    two sorts (asc frame pair, desc frame pair share the asc sort).
    The interpolation itself is in-row double math on exact whole-second
    epochs, identical expression order in both engines; the output
    quantizes via explicit floor(x*1e4 + 0.5) rather than round(x, 4) —
    interpolated values legitimately land ON decimal half-way points
    (rational step fractions over 4-decimal anchors), where Spark rounds
    the exact binary expansion and DuckDB the shortest decimal repr
    (seen live: 101.72025 -> 101.7203 vs 101.7202); floor on the
    bit-identical double is engine-independent (the g14 quantizer
    trick)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.avg("value"), 4).alias("sv"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    filled = spine.join(
        hourly,
        (spine["user_id"] == hourly["user_id"])
        & (spine["hour_start"] == hourly["h"]),
        "left",
    ).select(spine["user_id"], "hour_start", "sv")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("sv").isNotNull(), F.col("hour_start"))
    pv = F.last("sv", ignorenulls=True).over(wp)
    ph = F.last(known_h, ignorenulls=True).over(wp)
    nv = F.first("sv", ignorenulls=True).over(wn)
    nh = F.first(known_h, ignorenulls=True).over(wn)
    frac = (
        (F.unix_timestamp("hour_start") - F.unix_timestamp(ph)).cast("double")
        / (F.unix_timestamp(nh) - F.unix_timestamp(ph)).cast("double")
    )
    gauge = F.when(F.col("sv").isNotNull(), F.col("sv")).otherwise(
        pv + (nv - pv) * frac
    )
    return filled.select(
        "user_id",
        "hour_start",
        (F.floor(gauge * 10000 + F.lit(0.5)) / 10000.0).alias("gauge"),
        F.col("sv").isNull().alias("interpolated"),
    )


@register(
    "d42_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type,
                   round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type
        )
        SELECT e.event_type,
               count(*) AS n,
               m.med   AS median_value,
               d.mad   AS mad,
               CAST(count(*) FILTER (
                   WHERE abs(e.value - m.med) > 3 * 1.4826 * d.mad
               ) AS BIGINT) AS n_outliers
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        GROUP BY e.event_type, m.med, d.mad
    """,
)
def d42_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18+ ROBUST outlier detection per group: median absolute deviation
    (MAD) with the 1.4826 normal-consistency constant — the robust
    z-score fence (|x - median| > 3 * 1.4826 * MAD) that mean/stddev
    fences (d08b's surface) cannot provide, because a heavy-tailed
    metric's outliers inflate the very stddev meant to catch them
    (Hampel's estimator; Leys et al. 2013, public). The per-group
    medians are EXACT continuous percentiles (the d35 posture), rounded
    to 6 decimals BEFORE the fence comparison in BOTH engines so the
    boundary predicate cannot de-synchronize on a last-ulp interpolation
    difference (the g53 integer-boundary principle, applied to doubles).

    Scale: exactly THREE scans of the events table — median pass, MAD
    pass, fence pass — each a partial-agg hash shuffle on event_type;
    the two per-group scalar frames are pinned with an eager
    localCheckpoint (the g48/g52 convention) so the later passes read
    the tiny materialized frames instead of re-deriving their
    corpus-scan lineage (the naive dataflow re-scans events four times,
    visible in its physical plan), then broadcast back (group count is
    tiny by definition of a profiling key). Exact percentiles buffer
    each group's values (d35's caveat): for 100 TB single-group
    profiles, swap both median passes for approx_percentile t-digests
    certified by d36's in-band check — identical plan shape,
    O(accuracy) state. Reference: metric profiling / threshold alerting
    over the delivered stream (README.md:155-158)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias("__med")
    ).localCheckpoint(eager=True)
    e2 = ev.join(F.broadcast(med), "event_type")
    mad = e2.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("__med")), F.lit(0.5)), 6
        ).alias("__mad")
    ).localCheckpoint(eager=True)
    e3 = e2.join(F.broadcast(mad), "event_type")
    fence = F.abs(F.col("value") - F.col("__med")) > 3 * 1.4826 * F.col("__mad")
    return e3.groupBy("event_type", "__med", "__mad").agg(
        F.count("*").alias("n"),
        F.count(F.when(fence, 1)).alias("n_outliers"),
    ).select(
        "event_type",
        "n",
        F.col("__med").alias("median_value"),
        F.col("__mad").alias("mad"),
        "n_outliers",
    )


@register(
    "d43_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type,
               event_type AS next_type,
               count(*) AS n,
               round(count(*) * 1.0 /
                     sum(count(*)) OVER (PARTITION BY prev_type), 4) AS p
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
)
def d43_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13+ first-order Markov transition matrix over per-user event
    streams: for every ordered (prev, next) event-type pair, the
    transition count and the row-normalized probability — the
    next-action model behind session simulation, churn prediction, and
    the synthetic-trajectory generators that train agentic models (the
    aggregate twin of d40's full-sequence assembly: d40 materializes
    each user's history, this distills the corpus-wide transition
    structure). Ordering is (ts, event_id) with the event_id tie-break,
    the d40 determinism contract.

    Scale: ONE user-hashed exchange for the lag window (sorts are
    group-local per user; a hot user costs one task's sort, state is one
    row of lookback — no d40-style array buffering), then a (prev, next)
    partial-agg shuffle whose cardinality is |event_types|^2 — metadata-
    scale — and the row-normalizing window runs over THAT tiny frame,
    not the events. The probability is a ratio of exact counts, so
    round(4) is engine-exact. Reference: the per-key ordered consumption
    contract (README.md:75-76, 204)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(wseq))
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wrow), 4).alias("p"),
    )
