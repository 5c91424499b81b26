"""Multimodal columns (SURVEY.md §2.G G5): image/audio/video as opaque
binary payloads with typed metadata — the same envelope pattern as the
stream's base64 `Data` column (reference README.md:224).

The Spark-side plumbing (schema, partitioning, Arrow batch shape through
mapInPandas) is real and tested; the actual media decode is STUBBED because
image/audio libraries are not in this container — `decode_media` raises
NotImplementedError and `extract_features` uses a clearly-marked
deterministic fake (leading payload bytes) in its place.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.IntegerType())),
    ]
)

N_FEATURES = 8


def to_media_envelope(
    docs: DataFrame,
    payload_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata struct —
    the multimodal analogue of the stream envelope (README.md:224). All
    three consumed columns are parameterized (round-13 review: only the
    payload was, so any frame without literal doc_id/source columns —
    the non-documents callers the parameter exists for — failed with
    UNRESOLVED_COLUMN), as is the declared mime type."""
    payload = F.col(payload_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> object:
    """STUB: real image/audio decode (PIL/libav) is not available in this
    container. The Spark plumbing around it is real; swap this body for the
    actual decoder in a full environment."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires image/audio libraries not present here"
    )


def extract_features(envelope: DataFrame) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas: Arrow-batched,
    one output row per input row, fixed feature width. (Arrow batch size is
    governed by spark.sql.execution.arrow.maxRecordsPerBatch — the former
    batch_size_hint parameter was dead and is gone, round-11 review.)

    A NULL payload (missing media) yields NULL features/n_bytes — 1->1 is
    preserved and missing is distinguishable from empty.

    DETERMINISTIC FAKE standing in for the stubbed decoder: features are the
    first N_FEATURES byte values of the payload (zero-padded). The batch
    shape, schema, and partitioning are exactly what a real embedding model
    UDF would use."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            nbytes: list = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    nbytes.append(None)
                else:
                    feats.append(
                        [int(b) for b in payload[:N_FEATURES].ljust(N_FEATURES, b"\0")]
                    )
                    nbytes.append(len(payload))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": nbytes, "features": feats}
            )

    return envelope.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_media(envelope: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Resize/thumbnail over media payloads via mapInPandas (1 row -> 1 row).

    DETERMINISTIC FAKE for the stubbed decoder: the "thumbnail" is the
    leading width*height/8 payload bytes. A real implementation decodes via
    decode_media, resizes, and re-encodes — same schema, same Arrow batch
    flow, same partitioning; only the body changes."""
    n_out = max(1, (width * height) // 8)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    # NULL payload -> NULL thumb (missing media, 1->1 kept)
                    "thumb": [
                        None if p is None else bytes(p[:n_out])
                        for p in pdf["payload"]
                    ],
                }
            )

    return envelope.mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FRAME_SIZE = 16


def sample_frames(
    envelope: DataFrame, stride: int = 4, max_frames: int = 4
) -> DataFrame:
    """Video frame sampling via mapInPandas (1 row -> N rows, the UDTF
    shape): emit every stride-th fixed-size "frame" up to max_frames.

    DETERMINISTIC FAKE: frames are FRAME_SIZE-byte payload slices at
    stride*FRAME_SIZE offsets — the real body would seek/decode keyframes,
    with identical fan-out schema and batching."""
    if stride < 1 or max_frames < 1:
        # stride=0 emitted max_frames identical copies of frame 0 (every
        # offset collapses to 0) and a negative stride sliced garbage from
        # the payload TAIL via negative offsets, both silently violating
        # the every-stride-th contract (round-13 review)
        raise ValueError(
            f"sample_frames: stride ({stride}) and max_frames ({max_frames}) "
            "must be >= 1"
        )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # missing media: zero frames, natural for 1->N
                for k in range(max_frames):
                    off = k * stride * FRAME_SIZE
                    if off >= len(payload):
                        break
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(bytes(payload[off : off + FRAME_SIZE]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return envelope.mapInPandas(_frames, FRAME_SCHEMA)
