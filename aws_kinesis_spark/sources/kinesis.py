"""Kinesis stream source factory (SURVEY.md A1-A3; reference README.md:44-111).

Production reads the real stream through a Kinesis connector for Structured
Streaming (e.g. the spark-sql-kinesis / Kinesis EFO connector packages, loaded
with --packages); tests and the driver fixtures replay the identical envelope
schema from files. ``stream_source`` is the single switch point — swapping
``kind`` is the ONLY change between a test run and a production run, which is
what makes the file-source differential tests meaningful for the Kinesis path.

Consumer-mode mapping (README.md:91-111):
- standard polling consumer  -> GetRecords polling; shared 2 MB/s/shard
  throughput, ``startingPosition`` controls replay (README.md:81-83)
- Enhanced Fan-Out (push)    -> connector ``consumerArn`` option, dedicated
  2 MB/s/shard pipe per registered consumer; per-consumer isolation = one
  streaming query per consumer, each with its own checkpoint
  (README.md:30-32, 52)

The connector reader is built by an injectable ``reader_factory`` so the real
connector is a drop-in when its jar is on the classpath, and the option
translation for BOTH consumer modes is contract-testable without the jar
(tests/test_streaming.py::test_kinesis_branch_contract).
"""

from __future__ import annotations

from collections.abc import Callable

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

#: consumer modes (README.md:91-111): polling GetRecords vs EFO push
CONSUMER_MODES = ("polling", "efo")


def _default_reader_factory(spark: SparkSession):
    """The production reader: requires the spark-sql-kinesis connector jar."""
    return spark.readStream.format("kinesis")


def _is_missing_datasource(e: Exception) -> bool:
    """True only for the connector-jar-missing failure (Spark's
    DATA_SOURCE_NOT_FOUND error class or a JVM ClassNotFoundException),
    NOT for other connector errors that merely mention 'data source' in
    their message (e.g. DATA_SOURCE_OPTION validation failures)."""
    for getter in ("getCondition", "getErrorClass"):
        fn = getattr(e, getter, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            continue
        if cond is not None:
            return "DATA_SOURCE_NOT_FOUND" in cond
    msg = str(e)
    return (
        "DATA_SOURCE_NOT_FOUND" in msg
        or "ClassNotFoundException" in msg
        or ("Failed to find" in msg and "data source" in msg.lower())
    )


def kinesis_reader_options(mode: str, **options: str) -> dict[str, str]:
    """Validate and translate consumer-mode options to connector options.

    polling: ``consumerArn`` must be absent — its presence would silently
    switch the connector to EFO billing/throughput (README.md:94: EFO is a
    per-consumer paid feature, not a default).
    efo: ``consumerArn`` is REQUIRED — push delivery only exists for a
    registered consumer (README.md:94-98).
    Either mode defaults ``startingPosition`` to LATEST (the connector's
    own default, made explicit so replay intent is always visible)."""
    if mode not in CONSUMER_MODES:
        raise ValueError(f"unknown consumer mode: {mode!r} (use {CONSUMER_MODES})")
    unknown = set(options) - set(KINESIS_OPTIONS)
    if unknown:
        raise ValueError(f"unknown kinesis options: {sorted(unknown)}")
    out = {"startingPosition": "LATEST", **options}
    if mode == "efo" and not out.get("consumerArn"):
        raise ValueError("mode='efo' requires consumerArn= (README.md:94-98)")
    if mode == "polling" and "consumerArn" in out:
        raise ValueError(
            "mode='polling' must not set consumerArn (that selects EFO); "
            "use mode='efo' to opt into push delivery"
        )
    if not out.get("streamName"):
        raise ValueError(
            "streamName= is required in every consumer mode — a reader "
            "with no stream configured would only fail later inside the "
            "connector with a less actionable error"
        )
    return out


def stream_source(
    spark: SparkSession,
    kind: str = "file",
    path: str | None = None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    mode: str = "polling",
    reader_factory: Callable[[SparkSession], object] | None = None,
    **kinesis_options: str,
) -> DataFrame:
    """Build the envelope stream from the configured source kind.

    kind="file": replay parquet envelope batches (tests / fixtures).
    kind="kinesis": the production connector, in ``mode`` "polling" or
    "efo" (README.md:91-111). ``reader_factory`` injects the reader
    construction (config injection — a deployment passes a factory bound to
    its connector package; default requires the connector jar on the
    classpath and raises a clear error here because this container cannot
    ship external jars). The returned schema is ENVELOPE_SCHEMA either way
    (the connector's data/partitionKey/sequenceNumber/
    approximateArrivalTimestamp map 1:1, SURVEY.md §1.2).

    Payload contract: ``data`` carries base64 TEXT bytes — the reference's
    producers put base64-encoded JSON as the record payload itself
    (README.md:100 "Every record arrives base64-encoded", 144: the
    transform decodes ``Buffer.from(r.data, 'base64')``), so the bytes the
    connector delivers ARE that base64 text and decode_envelope's
    try_to_binary(..., 'base64') applies identically to both kinds.
    """
    if kind == "file":
        if path is None:
            raise ValueError("kind='file' requires path=")
        if kinesis_options:
            raise ValueError(
                f"kind='file' does not take kinesis options "
                f"{sorted(kinesis_options)} — silently absorbing them would "
                "let a mis-set kind run tests against the wrong contract"
            )
        if mode != "polling" or reader_factory is not None:
            # symmetric with the stray-kinesis-options guard above: a
            # caller that flipped kind back to 'file' but kept consumer-
            # mode/connector-injection arguments would otherwise silently
            # validate nothing about the EFO contract (round-13 review)
            raise ValueError(
                "kind='file' does not take mode=/reader_factory= — those "
                "configure the kinesis connector; a mis-set kind would "
                "silently run the file branch against the wrong contract"
            )
        return envelope_stream(
            spark, path, max_files_per_trigger, max_bytes_per_trigger
        )
    if kind == "kinesis":
        if path is not None or max_files_per_trigger or max_bytes_per_trigger:
            raise ValueError(
                "kind='kinesis' does not take path/max_files_per_trigger/"
                "max_bytes_per_trigger — the file-source backpressure dials "
                "do not translate; bound the fetch on the connector's own "
                "dials (e.g. kinesis.executor.maxFetchRecordsPerShard via "
                "a reader_factory that sets them). Dropping them silently "
                "would unbound production micro-batches a caller tuned in "
                "tests"
            )
        opts = kinesis_reader_options(mode, **kinesis_options)
        reader = (reader_factory or _default_reader_factory)(spark)
        for k, v in opts.items():
            reader = reader.option(k, v)
        try:
            # Real Kinesis sequence numbers run ~56 digits (the API allows
            # up to 128), far past DECIMAL(38,0) — a plain CAST dies with a
            # generic ANSI overflow on the first production micro-batch
            # (round-13 review). try_cast + a NAMED raise keeps the
            # contract explicit: the envelope schema's decimal is the
            # engine-wide ordering key, so oversized upstream numbers need
            # an explicit remapping (e.g. a per-shard monotonic surrogate),
            # not a silent NULL that would break ordering and dedup.
            return reader.load().selectExpr(
                "CAST(data AS BINARY) AS data",
                "partitionKey AS partition_key",
                """CASE
                     WHEN sequenceNumber IS NULL THEN NULL
                     WHEN TRY_CAST(sequenceNumber AS DECIMAL(38,0)) IS NULL
                       THEN RAISE_ERROR(CONCAT(
                         'kinesis sequenceNumber exceeds DECIMAL(38,0): ',
                         sequenceNumber,
                         ' — map it to a per-shard surrogate before the ',
                         'envelope schema'))
                     ELSE TRY_CAST(sequenceNumber AS DECIMAL(38,0))
                   END AS sequence_number""",
                "approximateArrivalTimestamp AS arrival_ts",
            )
        except Exception as e:
            # ONLY the missing-data-source failure is rebranded with the
            # actionable classpath hint; every other connector error (bad
            # region, missing stream, auth, bad option) propagates
            # untouched — a catch-all here sent operators chasing
            # --packages for what was really a credentials problem
            # (round-11 review). Matched on the SPECIFIC error condition:
            # Spark's DATA_SOURCE_NOT_FOUND error class (via
            # getCondition/getErrorClass when available) or a JVM
            # ClassNotFoundException — a loose 'data source' substring also
            # caught DATA_SOURCE_OPTION_* / bad-option errors (round-12
            # review).
            if not _is_missing_datasource(e):
                raise
            raise RuntimeError(
                "Kinesis connector not on the classpath; launch with the "
                "spark-sql-kinesis connector package, or use kind='file' "
                f"with the same ENVELOPE_SCHEMA ({ENVELOPE_SCHEMA.simpleString()})"
            ) from e
    raise ValueError(f"unknown stream source kind: {kind!r}")
