"""Embedding-column compression operators (SURVEY.md §2.G extension):
int8 symmetric quantization for the embedding store of a training-data
pipeline — 4x smaller vectors for ANN candidate generation, with exact
reconstruction-error accounting so the precision loss is measured, not
assumed.

Pure projections over the in-row array: no shuffle, no UDF, no driver
state — every expression is JVM-side (``transform``/``aggregate`` higher-
order functions), so quantizing a 100 TB embedding table is a single
embarrassingly-parallel scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant_cols(vec_col: str) -> tuple[Column, Column, Column]:
    """(doubles, scale, codes): symmetric per-vector int8 quantization.

    scale = max|x| / 127; code_i = floor(x_i / scale + 0.5) — explicit
    round-half-up via floor so every engine (and the DuckDB oracle)
    reproduces identical codes; codes land in [-127, 127]. A zero vector
    (scale 0) quantizes to all-zero codes via a guarded divisor.

    A vector containing NaN yields scale NULL and codes NULL — the
    quantization is undefined, and the row is visibly broken instead of
    silently corrupted: NaN sorts greatest in array_max, so one failed
    upstream embed otherwise poisoned scale to NaN and floored EVERY
    code (valid elements included) to 0 — an all-zero vector written
    into the ANN store with no error (round-13 review; verified live).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    has_nan = F.exists(v, F.isnan)
    scale = F.when(
        ~has_nan, F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    )
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    codes = F.when(
        ~has_nan, F.transform(v, lambda x: F.floor(x / safe + F.lit(0.5)))
    )
    return v, scale, codes


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Quantize each embedding to int8 codes + a per-vector float scale.

    Returns (id, scale, codes) — the compact ANN-store representation;
    dequantization is ``code * scale`` per element.
    """
    _, scale, codes = _quant_cols(vec_col)
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        # ByteType: codes provably land in [-127, 127], and storing int8
        # (not int32) is the whole point of the 4x-smaller claim.
        F.transform(codes, lambda c: c.cast("byte")).alias("codes"),
    )


def quantization_error(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector reconstruction-error report for the int8 quantizer:
    (id, n_dims, scale, max_abs_err, mse). The worst-case error of the
    symmetric scheme is scale/2 per element; this measures the actual
    values so a pipeline can gate quantization on a measured error budget
    rather than the bound."""
    v, scale, codes = _quant_cols(vec_col)
    err = F.zip_with(codes, v, lambda c, x: c * scale - x)
    # empty-vector guard: 0.0/0 raises DIVIDE_BY_ZERO under this engine's
    # ANSI mode, killing the whole scan for one failed upstream embed —
    # an empty vector reports mse NULL with n_dims 0 (round-13 review)
    mse = F.when(
        F.size(v) > 0,
        F.aggregate(err, F.lit(0.0), lambda a, e: a + e * e) / F.size(v),
    )
    return emb.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.round(scale, 8).alias("scale"),
        F.round(F.array_max(F.transform(err, F.abs)), 8).alias("max_abs_err"),
        F.round(mse, 10).alias("mse"),
    )
