"""Kinesis stream source factory (SURVEY.md A1-A3; reference README.md:44-111).

Production reads the real stream through a Kinesis connector for Structured
Streaming (e.g. the spark-sql-kinesis / Kinesis EFO connector packages, loaded
with --packages); tests and the driver fixtures replay the identical envelope
schema from files. ``stream_source`` is the single switch point — swapping
``kind`` is the ONLY change between a test run and a production run, which is
what makes the file-source differential tests meaningful for the Kinesis path.

Consumer-mode mapping (README.md:91-111):
- standard polling consumer  -> trigger(processingTime='1 second')-style
- Enhanced Fan-Out (push)    -> connector consumerArn option + low-latency
  trigger; per-consumer isolation = one streaming query per consumer, each
  with its own checkpoint (README.md:30-32, 52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_kinesis_spark.sources.envelope import ENVELOPE_SCHEMA
from aws_kinesis_spark.streaming.pipeline import envelope_stream

#: options accepted for kind="kinesis", mirroring the connector surface
KINESIS_OPTIONS = (
    "streamName",       # stream to read (README.md:56)
    "region",           # AWS region
    "startingPosition", # TRIM_HORIZON | LATEST | AT_TIMESTAMP (replay, README.md:81-83)
    "consumerArn",      # registered EFO consumer for push delivery (README.md:94-98)
)


def stream_source(
    spark: SparkSession,
    kind: str = "file",
    path: str | None = None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    **kinesis_options: str,
) -> DataFrame:
    """Build the envelope stream from the configured source kind.

    kind="file": replay parquet envelope batches (tests / fixtures).
    kind="kinesis": the production connector; requires the connector package
    on the classpath — raises a clear error here because this container
    cannot ship external jars. The returned schema is ENVELOPE_SCHEMA either
    way (the connector's data/partitionKey/sequenceNumber/
    approximateArrivalTimestamp map 1:1, SURVEY.md §1.2).
    """
    if kind == "file":
        if path is None:
            raise ValueError("kind='file' requires path=")
        return envelope_stream(
            spark, path, max_files_per_trigger, max_bytes_per_trigger
        )
    if kind == "kinesis":
        reader = spark.readStream.format("kinesis")
        for k, v in kinesis_options.items():
            reader = reader.option(k, v)
        try:
            return reader.load().selectExpr(
                "CAST(data AS BINARY) AS data",
                "partitionKey AS partition_key",
                "CAST(sequenceNumber AS DECIMAL(38,0)) AS sequence_number",
                "approximateArrivalTimestamp AS arrival_ts",
            )
        except Exception as e:  # connector jar absent in this environment
            raise RuntimeError(
                "Kinesis connector not on the classpath; launch with the "
                "spark-sql-kinesis connector package, or use kind='file' "
                f"with the same ENVELOPE_SCHEMA ({ENVELOPE_SCHEMA.simpleString()})"
            ) from e
    raise ValueError(f"unknown stream source kind: {kind!r}")
