"""Fixture table loaders (TESTDATA.md / FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_kinesis_spark.session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; pins session semantics (UTC) first.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark cannot
    represent; with ``nanosAsLong`` it arrives as epoch-nanos LongType and is
    truncated here to a microsecond TimestampType — the same ns->us
    truncation DuckDB applies, so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
