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


# --------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, public): the THIRD embedding-
# compression axis next to int8 scalar codes (fewer bits per dim) and
# Matryoshka truncation (fewer dims) — fewer CODES per vector: split the
# (L2-normalized) vector into M subspaces, vector-quantize each against
# its own K-centroid codebook, store M small codes. ADC (asymmetric
# distance computation) scores a full-precision query against codes via
# per-subspace lookup tables, so candidate generation never decodes.


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_rows: int = 2048,
    n_iter: int = 10,
):
    """Train M per-subspace codebooks of K centroids each; returns a
    (m, k, dim//m) float64 numpy array.

    Deterministic end to end (the train_ivf_centroids discipline,
    operators/similarity.py): the sample is the top ``train_rows`` rows
    by xxhash64(id) — identical on any partition layout — rows are
    L2-normalized (the stack ranks by cosine; PQ of unit vectors makes
    ADC's L2 order the cosine order), init takes the first K DISTINCT
    subvectors in id order, and Lloyd's iterations are a FIXED count with
    argmin's first-wins tie-break and empty clusters keeping their old
    centroid — no RNG anywhere, so a rebuilt codebook is byte-identical.
    The one driver collect is the bounded training sample (whitelisted,
    tests/test_plans.py::test_collect_sites_whitelisted)."""
    import numpy as np

    from aws_kinesis_spark.operators.similarity import _batch_matrix, _unit_rows
    import pandas as pd

    if m < 1 or k < 1:
        raise ValueError(f"m and k must be >= 1, got m={m} k={k}")
    ordered = corpus.select(id_col, vec_col).orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    sample = ordered.limit(train_rows).collect()
    sample.sort(key=lambda r: r[0])
    if not sample:
        raise ValueError("train_pq_codebooks: corpus sample is empty")
    vals = [r[1] for r in sample]
    first = next((v for v in vals if v is not None), None)
    dim = len(first) if first is not None else 0
    if dim == 0 or dim % m != 0:
        raise ValueError(f"embedding dim {dim} is not divisible by m={m}")
    x = _batch_matrix(pd.Series(vals), dim)
    x = _unit_rows(x, np.zeros((1, dim)))
    d_sub = dim // m
    books = np.zeros((m, k, d_sub), dtype=np.float64)
    for mi in range(m):
        sub = x[:, mi * d_sub : (mi + 1) * d_sub]
        # first K distinct subvectors in sample order (duplicate rows
        # would seed coincident centroids and waste codes)
        seen: list = []
        for row in sub:
            if not any(np.array_equal(row, s) for s in seen):
                seen.append(row)
            if len(seen) == k:
                break
        cent = np.array(seen + [seen[-1]] * (k - len(seen)))
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first-wins tie-break
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cent[j] = sub[mask].mean(axis=0)
        books[mi] = cent
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to its M nearest-centroid codes: (id, codes
    array<tinyint>). One Arrow mapInPandas pass — the codebooks broadcast
    inside the serialized closure (m*k*d_sub floats, metadata-scale), the
    corpus streams through batch-at-a-time numpy argmins, no shuffle. A
    NULL or ragged vector raises the named _batch_matrix error rather
    than poisoning the store (the IVF discipline)."""
    import numpy as np

    books = codebooks
    m, k, d_sub = books.shape
    schema = f"{id_col} long, codes array<tinyint>"

    def enc(batches):
        import pandas as pd

        from aws_kinesis_spark.operators.similarity import _batch_matrix, _unit_rows

        for pdf in batches:
            if not len(pdf):
                continue
            x = _batch_matrix(pdf[vec_col], m * d_sub)
            if x.shape[1] != m * d_sub:
                raise ValueError(
                    f"embedding dim {x.shape[1]} != codebook dim {m * d_sub}"
                )
            x = _unit_rows(x, np.zeros((1, m * d_sub)))
            codes = np.empty((len(x), m), dtype=np.int8)
            for mi in range(m):
                sub = x[:, mi * d_sub : (mi + 1) * d_sub]
                d2 = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = d2.argmin(axis=1).astype(np.int8)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(enc, schema=schema)


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    max_queries: int = 1024,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adc_dist) — the
    K approximate nearest neighbors per query, scored from CODES only.

    Each query builds an (m, k) lookup table of exact squared distances
    from its own subvectors to every centroid; a candidate's ADC distance
    is the sum of M table lookups — the codes are never decoded. Queries
    are L2-normalized like the encoded corpus, so ADC's L2 order is the
    cosine order on unit vectors. Ranking breaks ties (dist asc, then
    neighbor id) so the result is deterministic.

    Scale shape: the query frame is driver-collected (BOUNDED by
    ``max_queries`` — raises above it; the g48 max_queries dial
    convention, whitelisted) into the closure; the encoded corpus streams
    through one Arrow pass emitting each batch's per-query top-k only
    (candidates never exceed batches*k per query), and one final
    (query_id) window cuts the global exact ADC top-k."""
    import numpy as np

    from aws_kinesis_spark.operators.similarity import _batch_matrix, _unit_rows

    books = codebooks
    m, kk, d_sub = books.shape
    qrows = queries.select(query_id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"query frame exceeds max_queries={max_queries}; shard it or "
            "raise the dial deliberately"
        )
    qrows.sort(key=lambda r: r[0])
    if not qrows:
        raise ValueError("pq_adc_topk: empty query frame")
    import pandas as pd

    qids = np.array([r[0] for r in qrows])
    qx = _unit_rows(
        _batch_matrix(pd.Series([r[1] for r in qrows]), m * d_sub),
        np.zeros((1, m * d_sub)),
    )
    # tables[q, mi, j] = ||q_sub - c_j||^2, exact doubles
    tabs = np.stack(
        [
            ((qx[:, mi * d_sub : (mi + 1) * d_sub][:, None, :]
              - books[mi][None, :, :]) ** 2).sum(axis=2)
            for mi in range(m)
        ],
        axis=1,
    )

    out_schema = f"{query_id_col} long, neighbor_id long, adc_dist double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            # dist[n, q] = sum_m tabs[q, m, codes[n, m]]
            dist = np.zeros((len(ids), len(qids)))
            for mi in range(m):
                dist += tabs[:, mi, :][:, codes[:, mi]].T
            frames = []
            for qi, qid in enumerate(qids):
                mask = ids != qid
                d = dist[mask, qi]
                nid = ids[mask]
                top = np.lexsort((nid, d))[:k]
                frames.append(pd.DataFrame({
                    query_id_col: qid,
                    "neighbor_id": nid[top],
                    "adc_dist": d[top],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cands = codes_df.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pq_ann_rerank(
    corpus: DataFrame,
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    shortlist: int = 200,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ serving pipeline: ADC candidate generation + EXACT rerank —
    (query_id, neighbor_id, cos_sim) top-k. ADC over 4-bit codes is a
    lossy ranker (top-10-direct recall ~40% on near-random vectors); its
    production role is the SHORTLIST: take the ADC top-``shortlist``,
    fetch only those vectors, score exact cosine, cut the true top-k of
    the shortlist. Recall@k then equals shortlist containment (any true
    neighbor in the shortlist must out-rank every non-member under exact
    scoring) — 84-98% at shortlist = 4-40% of this fixture's corpus.
    Size ``shortlist`` proportionally to the corpus (FAISS practice), not
    to k.

    Scale: the candidate frame is queries x shortlist rows
    (metadata-scale) and BROADCASTS into one corpus join that fetches
    candidate vectors; exact cosine is in-row (functions/vectors.py);
    the final cut is a (query_id) window over candidates. The corpus's
    full-precision vectors are read once here and never shuffled; ADC
    itself reads only the 32x-smaller codes table."""
    from aws_kinesis_spark.functions.vectors import cosine

    cand = pq_adc_topk(
        codes_df, queries, codebooks, k=shortlist,
        id_col=id_col, query_id_col=query_id_col, vec_col=vec_col,
    ).select(query_id_col, "neighbor_id")
    qv = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    fetched = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    ).join(F.broadcast(cand), "neighbor_id")
    scored = fetched.join(F.broadcast(qv), F.col(query_id_col) == F.col("__qid"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__cos"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            query_id_col,
            "neighbor_id",
            cosine("__qvec", F.col("__nvec")).alias("__cos"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("__cos", 4).alias("cos_sim"),
        )
    )
