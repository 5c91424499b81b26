"""Embedding-column compression operators (SURVEY.md §2.G extension):
int8 symmetric quantization for the embedding store of a training-data
pipeline — 4x smaller vectors for ANN candidate generation, with exact
reconstruction-error accounting so the precision loss is measured, not
assumed — plus Matryoshka-style dimension-truncation recall, the other
axis of embedding compression (fewer dims vs fewer bits), measured the
same way: against the exact full-precision ranking, never assumed.

Pure projections over the in-row array: no shuffle, no UDF, no driver
state — every expression is JVM-side (``transform``/``aggregate`` higher-
order functions), so quantizing a 100 TB embedding table is a single
embarrassingly-parallel scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def truncation_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Recall@k of the first-``dims`` prefix-cosine ranking against the
    exact full-dimension top-k, per query — the acceptance gate for
    Matryoshka-style dimension truncation (Kusupati et al. 2022, public):
    serve ANN candidates from a ``dims``-wide prefix only if its measured
    recall against the full ranking clears the budget.

    The query frame BROADCASTS (with a full-width and a sliced vector per
    row), so it must stay executor-memory sized; ``max_queries`` makes
    that contract fail LOUDLY — a bounded ``limit(n+1).count()`` probe
    raises ValueError before the corpus scan instead of dying inside the
    broadcast exchange (round-13 ADVICE). Recall evaluation is a sampled
    acceptance gate, not a serving path: thousands of probe queries
    already give tight confidence intervals, so the dial is a guard rail,
    not a capability limit — raise it deliberately if you truly need
    more, or shard the query set across calls. The probe costs one tiny
    Spark job per call; pass ``max_queries=None`` to skip it when the
    caller already bounds the frame (plan-only contexts, hot loops).
    Like cap_per_key's two-pass precondition, the probe counts ONE
    evaluation of the lineage — a NONDETERMINISTIC query frame (unseeded
    sample/rand) can pass the probe and still oversize the broadcast's
    re-evaluation: pin such frames (localCheckpoint) before calling
    (round-14 review).

    Returns (query_id, n_true, n_hit, recall_at_k) where n_true is the
    query's exact top-k size (< k only when the corpus is small or vectors
    are degenerate), n_hit counts true neighbors the truncated ranking
    also placed in ITS top-k, and recall = n_hit / n_true. A query whose
    full-dim vector is zero-norm/NULL scores no neighbors and returns no
    row (the knn contract, cosine_topk_from_candidates); a query whose
    PREFIX is zero-norm simply finds nothing truncated (recall 0.0).

    Scale shape: both rankings come out of ONE corpus scan — the query
    frame (with its sliced twin) broadcasts, each candidate row scores
    both cosines in-row, and the two row_number windows share one
    (query_id) exchange. No corpus shuffle, no second pass; the per-query
    k-row frames that remain are metadata-scale. Ranking ties break on
    neighbor id, so the report is deterministic and any engine reproduces
    it bit-for-bit (the g03/g14b posture).
    """
    from aws_kinesis_spark.functions.vectors import cosine

    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_queries is not None:
        if max_queries < 1:
            raise ValueError(f"max_queries must be >= 1, got {max_queries}")
        # bounded probe: reads at most max_queries+1 query rows, never the corpus
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"queries frame exceeds max_queries={max_queries}; it broadcasts "
                "with two vectors per row — sample it, shard it across calls, or "
                "raise the dial deliberately"
            )
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.slice(F.col(vec_col), 1, dims).alias("__qvec_t"),
    )
    pairs = corpus.join(F.broadcast(q), F.col(id_col) != F.col("__qid"))
    scored = pairs.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine("__qvec", F.col(vec_col)).alias("__cf"),
        cosine("__qvec_t", F.slice(F.col(vec_col), 1, dims)).alias("__ct"),
    )
    wf = Window.partitionBy(query_id_col).orderBy(F.desc("__cf"), F.asc("neighbor_id"))
    wt = Window.partitionBy(query_id_col).orderBy(F.desc("__ct"), F.asc("neighbor_id"))
    ranked = (
        scored.withColumn("__rf", F.row_number().over(wf))
        .withColumn("__rt", F.row_number().over(wt))
        # exact-top-k rows only; NULL full-dim cosines are not neighbors
        # (desc NULLS LAST, so real rows hold the same ranks — the
        # cosine_topk_from_candidates contract)
        .filter((F.col("__rf") <= k) & F.col("__cf").isNotNull())
        .withColumn(
            "__hit",
            ((F.col("__rt") <= k) & F.col("__ct").isNotNull()).cast("int"),
        )
    )
    return ranked.groupBy(query_id_col).agg(
        F.count("*").alias("n_true"),
        F.sum("__hit").alias("n_hit"),
        F.round(F.sum("__hit") / F.count("*"), 4).alias("recall_at_k"),
    )
