"""The stream record envelope (SURVEY.md §1.2; reference README.md:222-252).

Every stream record carries (Data base64-bytes, PartitionKey, SequenceNumber,
ApproximateArrivalTimestamp). The decoded Data payload is the nested CDC JSON
``{"data": {"id", "status"}, "metadata": {"op"}}`` (README.md:224).

``synthesize_envelope`` materializes the FIXTURES.md §2 deterministic fixture
from the ``orders`` table; ``decode_envelope`` is the Lambda-transform stage
(README.md:139-148) as pure Catalyst expressions: unbase64 -> from_json ->
flatten -> add ``processed_at`` — no Python UDF anywhere on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Nested CDC payload schema (README.md:224 decoded; SURVEY.md §1.2).
CDC_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("status", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType([T.StructField("op", T.StringType())]),
        ),
    ]
)

# Envelope schema (README.md:222-252; SURVEY.md §1.6).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("sequence_number", T.DecimalType(38, 0)),
        T.StructField("arrival_ts", T.TimestampType()),
    ]
)

# 30-digit sequence base: reference sequence numbers are 30-digit decimals
# that must NOT fit in int64 (README.md:238; SURVEY.md §7 hard-point 4).
SEQ_BASE = "100000000000000000000000000000"


def synthesize_envelope(
    orders: DataFrame,
    epoch: int = 0,
    status_col: str = "o_orderstatus",
    force_op: str | None = None,
) -> DataFrame:
    """Deterministic CDC envelope from ``orders`` (FIXTURES.md §2).

    op is keyed off o_orderkey % 3 -> I/U/D (or ``force_op`` for a whole
    epoch — update/delete waves); PartitionKey is the composite
    ``schema-table-id`` key (README.md:47, 225); sequence numbers are
    30-digit decimals, monotone in (epoch, orderkey).
    """
    payload = F.to_json(
        F.struct(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.col(status_col).alias("status"),
            ).alias("data"),
            F.struct(
                (
                    F.lit(force_op)
                    if force_op is not None
                    else F.element_at(
                        F.array(F.lit("I"), F.lit("U"), F.lit("D")),
                        (F.col("o_orderkey") % 3 + 1).cast("int"),
                    )
                ).alias("op")
            ).alias("metadata"),
        )
    )
    # stride bound: the (epoch, orderkey) packing collides across epochs
    # once orderkey >= 1e9 (TPC-H SF ≳ 170) — fail loudly instead of
    # silently aliasing a later-epoch update with an unrelated earlier
    # event (round-11 review; the oracles hardcode the same stride, so
    # widening it is a coordinated fixture change, not a local one)
    guarded_key = F.when(
        F.col("o_orderkey") >= F.lit(1000000000),
        F.raise_error(
            F.lit(
                "synthesize_envelope: o_orderkey exceeds the 1e9 epoch "
                "stride — sequence numbers would collide across epochs"
            )
        ).cast("long"),
    ).otherwise(F.col("o_orderkey"))
    seq = (
        F.lit(SEQ_BASE).cast(T.DecimalType(38, 0))
        # the product must be LONG before the decimal cast: int32 x int32
        # overflows at epoch >= 3 (3e9 > 2^31-1) — ANSI kills the job, and
        # with ANSI off the wrap produced sequence numbers BELOW epoch 0's,
        # inverting latest-wins across epochs (round-13 review)
        + (F.lit(epoch).cast("long") * F.lit(1000000000).cast("long")).cast(
            T.DecimalType(38, 0)
        )
        + guarded_key.cast(T.DecimalType(38, 0))
    ).cast(T.DecimalType(38, 0))
    return orders.select(
        F.base64(payload.cast("binary")).cast("binary").alias("data"),
        F.concat_ws("-", F.lit("sales"), F.lit("orders"), F.col("o_orderkey")).alias(
            "partition_key"
        ),
        seq.alias("sequence_number"),
        F.col("o_orderdate").alias("arrival_ts"),
    )


def infer_payload_schema(env: DataFrame, sample_rows: int = 256) -> T.StructType:
    """Crawler-style dynamic schema inference (SURVEY.md §1.5; the Glue
    crawler inferring the lake schema from observed data, README.md:163,
    545-549): decode a bounded sample of payloads and infer the JSON shape.

    The sample is ``limit(sample_rows)`` — bounded regardless of corpus
    size, exactly like a crawler sampling objects. Use the result as
    ``decode_envelope(..., payload_schema=...)`` so NEW payload fields that
    producers start emitting become queryable without a code change.

    Batch frames only: sampling is an action, which a STREAMING frame
    cannot run (limit/rdd are unsupported mid-plan) — callers sample a
    batch read of the same source instead (the crawler never runs inside
    the stream). Named here rather than surfacing as a deep
    AnalysisException (the decode_envelope hardening discipline).

    Inference runs DROPMALFORMED: a record that base64-decodes but is not
    JSON (a binary producer on the same stream) otherwise polluted the
    inferred schema with a phantom ``_corrupt_record`` string field that
    no producer emits — persisted into the lake schema for every later
    batch once passed to keep_payload=True (round-13 review)."""
    if env.isStreaming:
        raise ValueError(
            "infer_payload_schema: cannot sample a streaming DataFrame — "
            "run it on a batch read of the same source (spark.read) and "
            "pass the inferred schema to the streaming decode"
        )
    spark = env.sparkSession
    decoded = (
        env.select(
            F.try_to_binary(F.col("data").cast("string"), F.lit("base64"))
            .cast("string")
            .alias("j")
        )
        .filter(F.col("j").isNotNull())
        .limit(sample_rows)
    )
    return (
        spark.read.option("mode", "DROPMALFORMED")
        .json(decoded.rdd.map(lambda r: r[0]))
        .schema
    )


def decode_envelope(
    env: DataFrame,
    corrupt_col: str = "_corrupt",
    payload_schema: T.StructType | None = None,
    keep_payload: bool = False,
) -> DataFrame:
    """The transform stage (README.md:139-148): base64-decode, JSON-parse into
    the nested struct, flatten, and append ``processed_at`` (README.md:145).

    Parse failures yield NULL payloads; callers route them to the DLQ branch
    (README.md:156) via ``col(corrupt_col)`` — never dropped silently.

    ``payload_schema`` overrides the stable CDC schema (pass the result of
    ``infer_payload_schema`` for evolved payloads); ``keep_payload=True``
    appends the full parsed struct as a ``payload`` column so fields beyond
    the flattened envelope stay queryable (schema evolution, SURVEY §1.5).
    """
    if payload_schema is not None:
        # fail with a NAMED contract error, not a deep AnalysisException:
        # schema evolution is ADDITIVE — an inferred schema missing the
        # stable envelope core (a corrupt-only sample window, or a producer
        # that renamed the wrappers) cannot be decoded by this stage
        def _struct_fields(name: str) -> set[str]:
            names = {f.name: f.dataType for f in payload_schema.fields}
            dt = names.get(name)
            return {f.name for f in dt.fields} if isinstance(dt, T.StructType) else set()

        missing = []
        if not {"id", "status"} <= _struct_fields("data"):
            missing.append("data.id/data.status")
        if "op" not in _struct_fields("metadata"):
            missing.append("metadata.op")
        if missing:
            raise ValueError(
                "decode_envelope: payload schema lacks the stable envelope "
                f"core {missing}; evolved payloads must keep it (new fields "
                "ride in keep_payload=True's payload struct)"
            )
    # try_to_binary returns NULL on malformed base64 (unbase64 would throw),
    # which is what routes bad records to the DLQ instead of failing the batch.
    parsed = F.from_json(
        F.try_to_binary(F.col("data").cast("string"), F.lit("base64")).cast("string"),
        payload_schema or CDC_PAYLOAD_SCHEMA,
    )
    return env.select(
        F.col("data"),
        F.col("partition_key"),
        F.col("sequence_number"),
        F.col("arrival_ts"),
        parsed.alias("payload"),
    ).select(
        F.col("payload.data.id").alias("id"),
        F.col("payload.data.status").alias("status"),
        F.col("payload.metadata.op").alias("op"),
        F.col("partition_key"),
        F.col("sequence_number"),
        F.col("arrival_ts"),
        F.current_timestamp().alias("processed_at"),
        # a NULL op is corrupt too: valid JSON missing metadata.op used to
        # pass this gate and then fail BOTH null-unsafe op branches of every
        # downstream split (op != 'D' / op == 'D') — vanishing from latest
        # AND deletes, the silent loss the DLQ contract forbids (round-13
        # review). NULL status likewise: the stable-core contract requires
        # data.status at the SCHEMA level (the evolved-schema check above),
        # and a status-less record passing the gate overwrote a key's real
        # status with NULL through every latest-wins merge instead of
        # landing in the DLQ (round-13 review) — the data-level gate now
        # enforces the same core.
        (
            F.col("payload").isNull()
            | F.col("payload.data.id").isNull()
            | F.col("payload.data.status").isNull()
            | F.col("payload.metadata.op").isNull()
        ).alias(corrupt_col),
        F.col("data"),  # raw envelope payload, kept for the DLQ/backup branch
        *([F.col("payload")] if keep_payload else []),
    )
