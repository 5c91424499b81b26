"""aws_kinesis_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Mallick17/AWS-Kinesis reference pipeline.

The reference (/root/reference/README.md) describes a CDC streaming pipeline:
sharded ordered record log -> per-record transform -> partitioned Parquet lake
-> SQL analytics + keyed upserts. This package re-expresses those semantics
Spark-first:

- ``sources``    : envelope codecs + lake readers/writers (manifest, DLQ, backup)
- ``functions``  : scalar function surface (codec, text analysis, vector math)
- ``operators``  : dedup (exact/minhash/simhash), similarity search, as-of join,
                   upsert, salting
- ``plans``      : the relational query catalog (each query + its DuckDB oracle)
- ``streaming``  : Structured Streaming realization of the hot path + lake path
"""

from aws_kinesis_spark.session import get_spark

__all__ = ["get_spark"]
