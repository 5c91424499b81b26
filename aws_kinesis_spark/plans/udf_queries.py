"""UDF/UDAF surface queries (SURVEY.md §2.F): the Arrow-vectorized Python
escape hatches for logic Catalyst can't express.

The reference's transform stage is a row-map user function over record
batches (README.md:139-148 — ``records.map(r => ...)`` invoked once per
buffered batch, README.md:390-392). Spark-first, that surface is:

- F1 scalar ``pandas_udf`` (Series -> Series, Arrow batch transfer) for
  per-row logic — never row-at-a-time Python UDFs;
- F3 grouped-agg ``pandas_udf`` (Series... -> scalar) for custom
  aggregations, executing as a real partial-free grouped aggregate;
- F2 grouped-map ``applyInPandas`` (the per-buffer batch invocation of the
  transform, README.md:390-392): one pandas DataFrame per group key;
- F4 Python UDTF (1->N lateral expansion, the manifest ``entries[]``
  fan-out of README.md:295-303), plus d19's native ``explode``.

These queries intentionally compute SQL-expressible things: the point is
differential proof that the Arrow UDF path produces bit-identical results to
the declarative plan, so swapping a real model/tokenizer into the same
signature is safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from aws_kinesis_spark.registry import register
from aws_kinesis_spark.tables import load


# DataType instances, not DDL strings: string return types are parsed at
# decoration time and require a live SparkContext, which breaks import
# during test collection.
@pandas_udf(DoubleType())
def _charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # numpy elementwise math over one Arrow batch; identical float semantics
    # to the JVM expression price*(1-discount)*(1+tax).
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "f01_scalar_pandas_udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(round(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               AS DECIMAL(18,6)), 4) AS DOUBLE) AS charge
        FROM lineitem
        WHERE l_quantity >= 45
    """,
)
def f01_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: Arrow-batched scalar UDF (the Lambda row-map surface,
    README.md:139-148). The filter stays a native predicate so pushdown
    still reaches the parquet scan; only the projection crosses to Python.

    Rounding goes through DECIMAL(18,6) on both engines: the product of
    2-dp inputs is decimal-exact at 6 dp, so double->decimal->round(4) is
    deterministic, where round(double, 4) directly would diverge on
    binary-vs-shortest-repr ties."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            _charge("l_extendedprice", "l_discount", "l_tax").cast("decimal(18,6)"), 4
        )
        .cast("double")
        .alias("charge"),
    )


@pandas_udf(DoubleType())
def _median_price(price: pd.Series) -> float:
    # custom UDAF body (F3). Median is selection + one midpoint average, so
    # it is bit-exact across engines regardless of accumulation order —
    # unlike a float sum, which would wobble under Spark's partial aggs.
    # NULLs are dropped to match SQL median semantics (np.median would
    # propagate NaN through the whole group — round-12 review); an
    # all-NULL group yields NULL like the oracle's median() does.
    # KNOWN LIMIT: Arrow hands SQL NULL and a literal NaN double to pandas
    # identically, so a group containing a true NaN VALUE is also dropped
    # here while DuckDB's median orders NaN greatest — undistinguishable
    # at the pandas_udf layer; the fixture carries neither (round-13
    # review).
    vals = price.dropna().to_numpy()
    return float(np.median(vals)) if len(vals) else None


@pandas_udf(LongType())
def _n_items(price: pd.Series) -> int:
    return int(len(price))


@register(
    "f03_grouped_agg_udaf",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               median(l_extendedprice) AS median_price,
               count(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def f03_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: grouped-agg pandas UDFs (custom per-group accounting, the
    per-buffer byte/compression bookkeeping of README.md:276-278). Grouped-agg
    pandas UDFs cannot mix with native aggregates in one agg, so the row
    count is a second pandas UDAF."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _median_price("l_extendedprice").alias("median_price"),
        _n_items("l_extendedprice").alias("n_items"),
    )


def _order_cadence(pdf: pd.DataFrame) -> pd.DataFrame:
    # One customer's full order history arrives as a single pandas frame
    # (grouped-map contract). Sort is deterministic via the orderkey
    # tiebreak; gap arithmetic is integer seconds, so no float wobble.
    # Grouped-map pays the kernel ONCE PER GROUP, and order keys are
    # high-cardinality (tiny groups), so per-call constant cost IS the
    # query's runtime: the numpy lexsort/diff form measures 7x faster
    # than pandas sort_values + diff on group-sized frames.
    dates = pdf["o_orderdate"].to_numpy()
    keys = pdf["o_orderkey"].to_numpy()
    order = np.lexsort((keys, dates))
    d = dates[order].astype("datetime64[s]").astype("int64")
    gaps = np.empty(len(d), dtype=np.int64)
    if len(d):
        gaps[0] = -1
        gaps[1:] = d[1:] - d[:-1]
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"].to_numpy()[order],
            "o_orderkey": keys[order],
            "order_seq": np.arange(1, len(d) + 1, dtype=np.int32),
            "gap_s": gaps,
        }
    )


@register(
    "f02_grouped_map",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS INT) AS order_seq,
               coalesce(CAST(date_diff('second', lag(o_orderdate) OVER w,
                                       o_orderdate) AS BIGINT), -1) AS gap_s
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def f02_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: grouped-map ``applyInPandas`` — the reference invokes its user
    transform once per buffered batch (README.md:390-392); Spark's grouped-map
    hands each key's rows to Python as one Arrow-backed pandas frame.

    Per-customer order cadence: sequence position and seconds since the
    previous order (first order = -1). The oracle is the pure-SQL window
    formulation, proving the imperative per-group code is plan-equivalent.

    Scale: one shuffle on the group key, group state bounded by a single
    customer's history — safe at 100 TB where any per-key history fits an
    Arrow batch; no driver collection. The repartition is EXPLICIT and
    pinned to the cluster parallelism: grouped-map cost is per-GROUP
    Python dispatch, which AQE's byte-based partition coalescing cannot
    see — left to AQE, a small-byte/high-group-count shuffle folds to one
    partition and serializes every group on one core (measured 21 s ->
    2.7 s at sf0.1 for the identical plan otherwise)."""
    orders = load(spark, sf_dir, "orders")
    par = spark.sparkContext.defaultParallelism
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .repartition(par, "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(
            _order_cadence,
            schema="o_custkey bigint, o_orderkey bigint, order_seq int, gap_s bigint",
        )
    )


@register(
    "f04_python_udtf",
    oracle="""
        SELECT doc_id, CAST(u[2] AS INT) AS pos, u[1] AS token
        FROM (
            SELECT doc_id,
                   unnest(list_zip(string_split(text, ' '),
                                   generate_series(1, len(string_split(text, ' '))))) AS u
            FROM documents
            WHERE doc_id < 50
        )
    """,
)
def f04_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: Python UDTF (Spark 3.5+/4.x) — one input row fans out to N output
    rows via LATERAL, the manifest ``entries[]`` explosion pattern
    (README.md:295-303). Tokenizes each document into (position, token).

    The doc_id filter sits under the lateral join so Catalyst pushes it into
    the parquet scan; the UDTF only ever sees the 50 selected rows. For pure
    splitting the native ``posexplode(split(...))`` is preferred (JVM-side);
    the UDTF surface exists for logic that genuinely needs Python per-row
    fan-out (tokenizers, samplers)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class _Tokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("f04_tokens", _Tokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("f04_documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM f04_documents d, LATERAL f04_tokens(d.text) t
        WHERE d.doc_id < 50
        """
    )
