"""UDF/UDAF surface queries (SURVEY.md §2.F): the Arrow-vectorized Python
escape hatches for logic Catalyst can't express.

The reference's transform stage is a row-map user function over record
batches (README.md:139-148 — ``records.map(r => ...)`` invoked once per
buffered batch, README.md:390-392). Spark-first, that surface is:

- F1 scalar ``pandas_udf`` (Series -> Series, Arrow batch transfer) for
  per-row logic — never row-at-a-time Python UDFs;
- F3 grouped-agg ``pandas_udf`` (Series... -> scalar) for custom
  aggregations, executing as a real partial-free grouped aggregate;
- F2/F4 (grouped-map / 1->N) are exercised by g07b_multimodal_features
  (mapInPandas) and d19's explode respectively.

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
    return float(np.median(price.to_numpy()))


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
