"""Similarity search over embedding columns (SURVEY.md §2.G G3).

Two strategies:
- ``knn_bruteforce``: exact top-k by cosine — broadcast the (small) query
  set against the corpus, compute cosine JVM-side, take per-query top-k
  with a window. One pass over the corpus, no corpus self-shuffle; this is
  the correctness oracle and is the right plan whenever |queries| is small.
- ``knn_lsh``: sign-bucket LSH (random-hyperplane family, derived
  deterministically from the first dims' signs): corpus is bucketed once;
  each query probes its own bucket plus all hamming<=1 neighbors. Recall is
  tunable via probe radius; candidate count per query drops by ~2^bits.
  This is the 100 TB path — bucket-join instead of cross-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from aws_kinesis_spark.functions.vectors import cosine


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (no shuffle
    of the corpus); ranking is deterministic: cosine desc, then neighbor id.
    Self-matches (same id) are excluded."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    pairs = corpus.join(F.broadcast(q), F.col(id_col) != F.col("__qid"))
    return cosine_topk_from_candidates(
        pairs.withColumnRenamed("__qid", query_id_col),
        k,
        vec_col,
        id_col,
        query_id_col,
        dedup=False,  # the cross join emits each (query, neighbor) once
    )


def sign_bucket_at(vec_col: str, offset: int, bits: int = 8) -> F.Column:
    """Deterministic random-hyperplane LSH bucket: the sign pattern of
    dimensions [offset, offset+bits) (for unit vectors from a
    rotation-invariant distribution, axis hyperplanes are as good as
    sampled ones and need no stored model)."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(
            F.element_at(F.col(vec_col), offset + i + 1) > 0, F.lit(1 << i)
        ).otherwise(0)
    return b.cast("int")


def _spherical_kmeans(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Driver-side spherical k-means (Lloyd's on the unit sphere) over a
    bounded corpus sample. Centroids are tiny (nlist x dim) regardless of
    corpus size — at 100 TB you train on a fixed-size sample and broadcast;
    the full corpus is only ever *assigned*, never collected."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = x[rng.choice(len(x), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(nlist):
            m = x[assign == c]
            if len(m):
                v = m.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 32,
    train_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train IVF cell centroids on a BOUNDED sample (the one collect of the
    IVF family, capped at train_rows rows). The sample is the top
    train_rows rows by xxhash64(id) — a deterministic pseudo-random
    subset, so the seeded k-means sees an identical matrix regardless of
    partition planning (a bare limit() takes whatever partitions scan
    first — round-11 review) and the index (and therefore recall) is
    reproducible across cluster layouts. TakeOrdered keeps it one
    per-partition heap + driver merge, never a global sort."""
    ordered = corpus.select(id_col, vec_col).orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    sample = ordered.limit(train_rows).collect()
    sample.sort(key=lambda r: r[0])
    if not sample:
        raise ValueError("train_ivf_centroids: corpus sample is empty")
    vals = [r[1] for r in sample]
    first = next((v for v in vals if v is not None), None)
    # _batch_matrix, not a bare np.array: a NULL or ragged embedding in
    # the sample otherwise dies in the cryptic 'setting an array element
    # with a sequence' on the driver during every index build (the named
    # error class _batch_matrix exists for; round-13 review)
    train = _batch_matrix(pd.Series(vals), len(first) if first is not None else 0)
    return _spherical_kmeans(train, nlist=min(nlist, len(train)))


def _unit_rows(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n x dim) float matrix -> L2-normalized, with a NAMED dim check (a
    mismatched embedding otherwise dies in a cryptic BLAS shape error
    deep in an executor)."""
    if x.ndim != 2 or x.shape[1] != cent.shape[1]:
        raise ValueError(
            f"embedding dim {x.shape[1] if x.ndim == 2 else '?'} does not "
            f"match the index's centroid dim {cent.shape[1]}"
        )
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _batch_matrix(vecs: pd.Series, dim: int) -> np.ndarray:
    """Arrow batch -> (n x dim) float64 matrix with NAMED failures: a NULL
    embedding or a ragged batch otherwise dies in a cryptic numpy/BLAS
    error deep in an executor, long after e.g. a rebuild already
    uncommitted the store (round-13 review)."""
    lst = vecs.tolist()
    if not lst:
        return np.zeros((0, dim), dtype=np.float64)
    n_null = sum(1 for v in lst if v is None)
    if n_null:
        raise ValueError(
            f"{n_null} NULL embedding(s) in an assign/probe batch: drop or "
            "repair NULL vectors before indexing/querying — a NULL cannot "
            "be assigned a cell or scored"
        )
    try:
        return np.array(lst, dtype=np.float64)
    except (ValueError, TypeError) as e:
        raise ValueError(
            "ragged or non-numeric embedding batch: every vector must be "
            f"a numeric array of the index dimension ({dim})"
        ) from e


def _unit_batch(vecs: pd.Series, cent: np.ndarray) -> np.ndarray:
    """Arrow batch -> L2-normalized matrix (see _unit_rows)."""
    return _unit_rows(_batch_matrix(vecs, cent.shape[1]), cent)


def probe_top_cells(x: np.ndarray, cent: np.ndarray, nprobe: int) -> np.ndarray:
    """THE probe kernel (normalize + matmul + stable argsort, so ties
    break toward the LOWER cell id — matching nearest_cell's argmax
    first-wins rule; the default quicksort is NOT stable): top-nprobe
    nearest cells per row. The single implementation behind both the
    Arrow probe UDF and knn_ivf_indexed's driver-side probe — the two
    strategies must agree by construction."""
    u = _unit_rows(x, cent)
    top = np.argsort(-(u @ cent.T), axis=1, kind="stable")[:, : min(nprobe, len(cent))]
    return top.astype(np.int32)


def nearest_cell_udf(cent: np.ndarray):
    """Arrow-batched nearest-centroid assignment; ``cent`` (nlist x dim)
    rides to executors in the UDF closure — tiny regardless of corpus."""

    @F.pandas_udf(IntegerType())
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        x = _unit_batch(vecs, cent)
        return pd.Series(np.argmax(x @ cent.T, axis=1).astype(np.int32))

    return nearest_cell


def probe_cells_udf(cent: np.ndarray, nprobe: int):
    """Arrow-batched top-nprobe cell probe for the QUERY side — wraps the
    shared probe_top_cells kernel, so the query table is never collected
    and can be arbitrarily large."""

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        top = probe_top_cells(_batch_matrix(vecs, cent.shape[1]), cent, nprobe)
        return pd.Series([t.tolist() for t in top])

    return probe_cells


def cosine_topk_from_candidates(
    cand: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    dedup: bool = True,
) -> DataFrame:
    """THE shared kNN tail (brute force, LSH, IVF — one ranking contract):
    score (query, candidate) rows by cosine JVM-side and keep the
    deterministic per-query top-k (cosine desc, neighbor id asc). Expects
    ``__qvec`` alongside the candidate's vec_col. ``dedup=False`` skips
    the (query, neighbor) dropDuplicates shuffle for generators whose
    pairs are unique by construction (the brute-force cross join)."""
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine("__qvec", vec_col).alias("__cos"),
    )
    if dedup:
        scored = scored.dropDuplicates([query_id_col, "neighbor_id"])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    # NULL cosines (zero-norm or NULL query/candidate vector) are NOT
    # neighbors: ranked NULLS LAST they filled the top-k with k arbitrary
    # lowest-id rows scored NULL, which downstream recall/threshold logic
    # counted as neighbors (round-13 review) — such queries now return no
    # rows, matching the IVF path's refusal to score degenerate vectors.
    # The filter sits AFTER the rank, where __cos is a materialized window
    # input: placed in the scan stage it re-evaluated the O(dim) cosine
    # fold per row (Filter and Project cannot share the subexpression
    # across operators — measured ~1.3-1.4x on g03/g41). Identical
    # results: desc NULLS LAST ranks every non-NULL row ahead of the NULL
    # block, so real neighbors hold the same ranks either way.
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") <= k) & F.col("__cos").isNotNull())
        .select(query_id_col, "neighbor_id", (F.round("__cos", 4) + F.lit(0.0)).alias("cos_sim"))
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    index_dir: str | None = None,
    queries_are_small: bool = True,
) -> DataFrame:
    """ANN top-k with an IVF (inverted-file) index — the ONE-SHOT form of
    the standing store in operators/ivf_index.py, and since round 11 a
    thin delegation to it so the one-shot and serving paths share kernels
    end-to-end (train / assign / probe / top-k are literally the same
    functions): build_ivf_index trains nlist spherical k-means centroids
    on the bounded train_rows sample and assigns the corpus in one
    Arrow-batched matmul pass (no shuffle before the cell-clustered
    write); knn_ivf_indexed then opens only each query's nprobe probed
    ``cell=C`` partitions.

    ``index_dir=None`` (the ad-hoc default) builds into a temp dir and
    drops it after the result is MATERIALIZED (eager localCheckpoint cuts
    the lineage off the temp files — the result is k x |queries| rows, the
    final answer's own size). Passing an ``index_dir`` keeps the store for
    reuse and returns the lazy plan (the caller owns the lifecycle — the
    right call at 100 TB, where the build is the expensive half).
    nprobe/nlist is the recall dial — recall vs knn_bruteforce is measured
    in tests/test_ext.py."""
    import shutil
    import tempfile

    from aws_kinesis_spark.operators.ivf_index import build_ivf_index, knn_ivf_indexed

    spark = corpus.sparkSession
    ephemeral = index_dir is None
    idx = tempfile.mkdtemp(prefix="kinesis_ivf_") if ephemeral else index_dir
    try:
        build_ivf_index(
            corpus,
            idx,
            nlist=nlist,
            train_rows=train_rows,
            vec_col=vec_col,
            id_col=id_col,
        )
        out = knn_ivf_indexed(
            spark,
            idx,
            queries,
            k=k,
            nprobe=nprobe,
            query_id_col=query_id_col,
            queries_are_small=queries_are_small,
        )
        if ephemeral:
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        if ephemeral:
            shutil.rmtree(idx, ignore_errors=True)


def max_sim_vs_reference(
    corpus: DataFrame,
    reference: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_reference: int = 1 << 16,
) -> DataFrame:
    """Max cosine similarity of every corpus vector against a BOUNDED
    reference set — the embedding-space analogue of g13's n-gram
    decontamination probe (flag training docs too close to any eval/
    benchmark item), and the semantic-similarity mirror of the Bloom
    first-seen probe.

    Scale shape: the reference side (an eval benchmark — thousands of
    vectors by construction) rides to executors inside the kernel closure;
    the corpus STREAMS through one Arrow-batched BLAS matmul pass — no
    join, no shuffle, no corpus movement at all (plan-locked: zero
    Exchange). This is the right orientation at 100 TB: broadcasting the
    huge side (what reusing knn_bruteforce's broadcast-queries plan here
    would do) dies at scale; streaming it is one map pass. The reference
    collect is bounded by ``max_reference`` and raises above it — the
    explicit-dial convention of the IVF training sample.

    Returns one row per corpus vector: (id, max_ref_sim)."""
    ref = reference.select(vec_col).limit(max_reference + 1).collect()
    if len(ref) > max_reference:
        raise ValueError(
            f"reference set exceeds max_reference={max_reference}; a "
            "reference this large should use the banded/IVF candidate "
            "paths, not an exact broadcast probe"
        )
    if not ref:
        raise ValueError("reference set is empty — nothing to probe against")
    vals = [r[0] for r in ref]
    first = next((v for v in vals if v is not None), None)
    # named NULL/ragged errors (see _batch_matrix) instead of a cryptic
    # np.array failure on a malformed reference row
    mref = _batch_matrix(pd.Series(vals), len(first) if first is not None else 0)
    mref = mref / np.maximum(np.linalg.norm(mref, axis=1, keepdims=True), 1e-12)

    def max_sim(batches):
        for b in batches:
            if not len(b):
                continue
            # _unit_batch, not an inline normalize: its NAMED dim check
            # turns a reference set embedded at a different dim than the
            # corpus into a ValueError instead of the cryptic executor
            # BLAS shape error it used to die with (round-13 review)
            x = _unit_batch(b[vec_col], mref)
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "max_ref_sim": np.round((x @ mref.T).max(axis=1), 4) + 0.0,
                }
            )

    # id type derived from the corpus schema (semdedup's discipline): a
    # hardcoded bigint broke any corpus whose ids are not longs with a
    # cryptic Arrow cast error at runtime (round-13 review)
    id_sql = corpus.schema[id_col].dataType.simpleString()
    return corpus.select(id_col, vec_col).mapInPandas(
        max_sim, schema=f"{id_col} {id_sql}, max_ref_sim double"
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    tables: int = 8,
    bits: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    validate_geometry: bool = True,
) -> DataFrame:
    """ANN top-k with multi-table LSH (OR-amplification): table t buckets on
    the sign pattern of dims [t*bits, (t+1)*bits); a point is a candidate if
    it shares a (possibly hamming<=probe_hamming-probed) bucket with the
    query in ANY table.

    The (tables, bits, probe_hamming) triple is the recall/pruning dial:
    on uniform unit vectors 8x8 with hamming<=1 measures ~0.6 top-10 recall
    at ~4x candidate pruning; real clustered embeddings do much better.
    Candidates are found via an equi-join on (table, bucket) — the corpus
    shuffles once on bucket id, never all-pairs."""
    if probe_hamming > 2:
        raise ValueError(
            f"probe_hamming={probe_hamming} is not implemented (flip masks "
            "cover radii 0-2); a silent cap would leave the recall dial "
            "disconnected"
        )
    # the sign pattern reads dims [0, tables*bits): past-the-end element_at
    # would yield NULL -> bit 0 for EVERY row (or throw under ANSI),
    # silently collapsing the high tables into one all-corpus bucket — the
    # exact cross-join blowup the bucketing exists to avoid. One bounded
    # driver probe (first non-NULL vector — a NULL first row used to skip
    # the check entirely, round-12 review) validates the geometry up front;
    # hot paths that already know their dim pass validate_geometry=False to
    # skip the eager plan-construction-time job.
    if validate_geometry:
        # BOTH sides probe: sign_bucket_at reads the same [0, tables*bits)
        # dims of the query vectors, so a query table embedded at a smaller
        # dim than the corpus died with the same cryptic executor error the
        # corpus-side check exists to prevent (round-13 review)
        for side, frame in (("corpus", corpus), ("query", queries)):
            first = (
                frame.filter(F.col(vec_col).isNotNull())
                .select(F.size(vec_col).alias("__d"))
                .first()
            )
            lsh_dim = first["__d"] if first is not None else None
            if lsh_dim is not None and tables * bits > lsh_dim:
                raise ValueError(
                    f"tables*bits = {tables * bits} exceeds the {side} "
                    f"embedding dim {lsh_dim}; lower tables/bits so every "
                    "table reads real dimensions"
                )
    bucket_cols = [
        sign_bucket_at(vec_col, t * bits, bits).alias(f"__b{t}") for t in range(tables)
    ]
    bucketed = corpus.select(F.col(id_col), F.col(vec_col), *bucket_cols)
    stacked = bucketed.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b"))
                    for t in range(tables)
                ]
            )
        ).alias("e"),
    ).select(id_col, vec_col, F.col("e.t").alias("__t"), F.col("e.b").alias("__b"))

    q_base = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    q = q_base.select(
        "__qid",
        *[
            sign_bucket_at("__qvec", t * bits, bits).alias(f"__qb{t}")
            for t in range(tables)
        ],
    )
    # probes per table: the bucket itself plus every hamming<=probe_hamming flip
    flip_sets: list[list[int]] = [[0]]
    if probe_hamming >= 1:
        flip_sets.append([1 << i for i in range(bits)])
    if probe_hamming >= 2:
        flip_sets.append(
            [(1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)]
        )
    masks = [m for group in flip_sets for m in group]
    probe_structs = [
        F.struct(
            F.lit(t).alias("t"), F.col(f"__qb{t}").bitwiseXOR(F.lit(m)).alias("b")
        )
        for t in range(tables)
        for m in masks
    ]
    # probe rows carry (qid, table, bucket) ONLY — three scalars. Exploding
    # the query VECTOR into the probes duplicated it tables x masks times
    # (~72x under defaults: 8 tables x 9 masks), inflating the broadcast
    # from |Q| vectors to |Q| x 72 and OOMing at moderate query counts
    # (round-13 review); the vector re-attaches from the compact |Q|-row
    # q_base broadcast AFTER the bucket join instead.
    q = q.select("__qid", F.explode(F.array(*probe_structs)).alias("p")).select(
        "__qid", F.col("p.t").alias("__t"), F.col("p.b").alias("__b")
    )

    cand = (
        stacked.join(F.broadcast(q), ["__t", "__b"])
        .filter(F.col(id_col) != F.col("__qid"))
        .join(F.broadcast(q_base), "__qid")
    )
    return cosine_topk_from_candidates(
        cand.withColumnRenamed("__qid", query_id_col), k, vec_col, id_col, query_id_col
    )


def _block_pair_rows(
    embeddings: DataFrame, vec_col: str, id_col: str, n_blocks: int
) -> DataFrame:
    """THE blocked-matmul scaffolding shared by knn_join and
    hard_negative_mining (one copy — the two carried ~25 verbatim lines
    each that had to be edited in lockstep; round-13 review): every row
    tagged with its block, replicated onto each unordered block pair it
    participates in, as (pair_id, blk_a, blk_b, side, __id, __v).

    NULL vectors are excluded up front (a single NULL crashed np.stack
    inside the kernels), and blocks come from xxhash64(id), not the raw
    id residue: pmod on a non-numeric id coerces to NULL and silently
    dropped EVERY row at the bp_df join (an empty result, no error), and
    stride-allocated numeric ids collapsed into few blocks, voiding the
    per-group memory bound — the hash blocks uniformly for any id type
    or layout with identical pair coverage."""
    spark = embeddings.sparkSession
    bp = [
        (a * n_blocks + b, a, b)
        for a in range(n_blocks)
        for b in range(n_blocks)
        if a <= b
    ]
    bp_df = F.broadcast(spark.createDataFrame(bp, "pair_id INT, blk_a INT, blk_b INT"))
    emb = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("__blk"),
    )
    side_a = emb.join(bp_df, emb["__blk"] == F.col("blk_a")).select(
        "pair_id", "blk_a", "blk_b", F.lit("a").alias("side"), "__id", "__v"
    )
    side_b = emb.join(bp_df, emb["__blk"] == F.col("blk_b")).select(
        "pair_id", "blk_a", "blk_b", F.lit("b").alias("side"), "__id", "__v"
    )
    return side_a.unionByName(side_b)


def _pair_gram(a: pd.DataFrame, b: pd.DataFrame):
    """ids + cosine matrix for one block pair — the matmul preamble shared
    by the blocked kernels, with _batch_matrix's NAMED ragged-batch errors
    instead of a cryptic np.stack failure. NaN cosines (zero-norm rows)
    become -inf: never a neighbor."""
    ids_a = a["__id"].to_numpy()
    ids_b = b["__id"].to_numpy()
    dim = len(a["__v"].iloc[0])
    ma = _batch_matrix(a["__v"], dim)
    mb = _batch_matrix(b["__v"], dim)
    na = np.sqrt((ma * ma).sum(axis=1))
    nb = np.sqrt((mb * mb).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = (ma @ mb.T) / np.outer(na, nb)
    return ids_a, ids_b, np.nan_to_num(cos, nan=-np.inf)


def knn_join(
    embeddings: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact kNN self-join: EVERY vector's top-k cosine neighbors — the
    similarity-search shape a training-data pipeline actually runs (pair
    mining, retrieval eval), not just a handful of probe queries.

    Blocked matmul, two-level top-k: the corpus splits into n_blocks row
    blocks; each of the B(B+1)/2 unordered block pairs is one applyInPandas
    group that BLAS-multiplies its two blocks and keeps each row's partial
    top-k *under the same total order as the final ranking* (cos desc,
    neighbor id asc — so the global top-k is provably contained in the
    union of partial top-ks). The final stage is one window over n*B*k
    candidate rows. Shuffle volume is O(n*B*k), never O(n^2); B sizes a
    block pair to executor memory."""

    def partial_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort each side by id so a stable argsort on -cos breaks ties in
        # neighbor-id order — the exact total order of the final window
        a = pdf[pdf["side"] == "a"].sort_values("__id")
        b = pdf[pdf["side"] == "b"].sort_values("__id")
        if not len(a) or not len(b):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "__cos": []})
        ids_a, ids_b, cos = _pair_gram(a, b)

        def emit(q_ids, c_ids, mat):
            m = np.where(q_ids[:, None] == c_ids[None, :], -np.inf, mat)
            idx = np.argsort(-m, axis=1, kind="stable")[:, :k]
            keep = np.take_along_axis(m, idx, axis=1)
            qq = np.repeat(q_ids, idx.shape[1])
            return qq[keep.ravel() > -np.inf], c_ids[idx].ravel()[keep.ravel() > -np.inf], keep.ravel()[keep.ravel() > -np.inf]

        qa, na_ids, ca = emit(ids_a, ids_b, cos)
        frames = [pd.DataFrame({"query_id": qa, "neighbor_id": na_ids, "__cos": ca})]
        if a["blk_a"].iloc[0] != a["blk_b"].iloc[0]:
            qb, nb_ids, cb = emit(ids_b, ids_a, cos.T)
            frames.append(pd.DataFrame({"query_id": qb, "neighbor_id": nb_ids, "__cos": cb}))
        return pd.concat(frames, ignore_index=True)

    # id type derived from the input schema — a hardcoded bigint broke
    # non-long id columns with an Arrow cast error (round-13 review)
    id_sql = embeddings.schema[id_col].dataType.simpleString()
    candidates = (
        _block_pair_rows(embeddings, vec_col, id_col, n_blocks)
        .groupBy("pair_id")
        .applyInPandas(
            partial_topk,
            schema=f"query_id {id_sql}, neighbor_id {id_sql}, __cos double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", (F.round("__cos", 4) + F.lit(0.0)).alias("cos_sim"))
    )


def hard_negative_mining(
    embeddings: DataFrame,
    pos_threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Contrastive-training data mining: for every ANCHOR that has at
    least one positive (cosine >= pos_threshold neighbor — a near-dup /
    paraphrase), return its HARDEST NEGATIVE — the single most similar
    vector strictly BELOW the threshold (the SimCSE/DPR-style hard
    negative that carries most of the training signal; easy random
    negatives teach nothing).

    Same blocked-matmul shape as knn_join (one applyInPandas group per
    unordered block pair, O(n*B) candidate rows, never O(n^2) shuffle):
    each group emits per query row a has-positive flag and its partial
    below-threshold top-1 under the final total order (cos desc, id asc),
    so the global argmax is provably in the partial union; the final
    stage is one window + one semi join against the anchor set."""

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == "a"].sort_values("__id")
        b = pdf[pdf["side"] == "b"].sort_values("__id")
        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "__cos": [], "__is_pos": []}
        )
        if not len(a) or not len(b):
            return empty
        ids_a, ids_b, cos = _pair_gram(a, b)

        def emit(q_ids, c_ids, mat):
            m = np.where(q_ids[:, None] == c_ids[None, :], -np.inf, mat)
            frames = []
            has_pos = (m >= pos_threshold).any(axis=1)
            if has_pos.any():
                # NULL sentinel, not -1: the flag rows' neighbor_id is
                # never read, and a numeric sentinel cannot survive the
                # id-typed output schema for non-numeric id columns
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[has_pos],
                            "neighbor_id": None,
                            "__cos": np.inf,
                            "__is_pos": True,
                        }
                    )
                )
            neg = np.where(m >= pos_threshold, -np.inf, m)
            # stable argsort (c_ids ascending within a sorted side) makes
            # the partial argmax follow the final (cos desc, id asc) order
            idx = np.argsort(-neg, axis=1, kind="stable")[:, 0]
            best = neg[np.arange(len(q_ids)), idx]
            keep = best > -np.inf
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[keep],
                            "neighbor_id": c_ids[idx][keep],
                            "__cos": best[keep],
                            "__is_pos": False,
                        }
                    )
                )
            return frames

        frames = emit(ids_a, ids_b, cos)
        if a["blk_a"].iloc[0] != a["blk_b"].iloc[0]:
            frames += emit(ids_b, ids_a, cos.T)
        return pd.concat(frames, ignore_index=True) if frames else empty

    id_sql = embeddings.schema[id_col].dataType.simpleString()
    candidates = (
        _block_pair_rows(embeddings, vec_col, id_col, n_blocks)
        .groupBy("pair_id")
        .applyInPandas(
            partial,
            schema=(
                f"query_id {id_sql}, neighbor_id {id_sql}, "
                "__cos double, __is_pos boolean"
            ),
        )
    ).localCheckpoint(eager=False)
    anchors = candidates.filter("__is_pos").select("query_id").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    negs = (
        candidates.filter(~F.col("__is_pos"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return negs.join(anchors, "query_id", "left_semi").select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        (F.round("__cos", 4) + F.lit(0.0)).alias("neg_sim"),
    )


def assign_clusters(
    embeddings: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment with the n_clusters LOWEST-ID vectors as
    centroids (a deterministic seeding — k-means++ iterations would converge
    tighter clusters but make the result depend on float iteration order;
    the dedup guarantee downstream only needs SOME locality-preserving
    partition of the space, per SemDeDup, Abbas et al. 2023, §3). The seed
    makes no assumption about the id space: ids need not start at 0 or be
    dense — orderBy(id).limit(n) is a TakeOrderedAndProject (per-partition
    top-k then driver merge), never a global sort.

    Plan shape: the centroids are collected (bounded: n_clusters rows — the
    dial bounds driver memory exactly like knn_ivf's train_rows) and inlined
    as array LITERALS, so assignment is a map-only projection over the
    corpus: per row, argmax of n_clusters sequential-double cosines via
    array_max over (cos, -centroid_id) structs — ties go to the LOWEST
    centroid id (centroid ids are the 0-based rank of the seed vector's id,
    not the raw id). Zero shuffle, zero Python; at 10^9 rows this is one
    whole-stage-codegen pass."""
    # seeds come from the lowest-id rows WITH a vector: a NULL embedding
    # cannot be a centroid (iterating it to build the literal array raised
    # TypeError before any job ran, aborting the whole operator when the
    # lowest-id row happened to be NULL; round-13 review) — NULL-vector
    # rows still get assigned (cluster 0 via the coalesced cosine) and are
    # never dropped downstream.
    seed = embeddings.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    rows = seed.orderBy(id_col).limit(n_clusters).collect()  # bounded: n_clusters rows
    if not rows:
        raise ValueError(
            "assign_clusters: embeddings is empty or holds no non-NULL "
            f"vectors — no rows to seed {n_clusters} centroids from"
        )
    choices = []
    for cid, row in enumerate(rows):
        lit_vec = F.array(*[F.lit(float(x)) for x in row[vec_col]])
        cs = F.coalesce(cosine(F.col(vec_col), lit_vec), F.lit(-2.0))
        choices.append(F.struct(cs.alias("c"), F.lit(-cid).alias("ni")))
    best = F.array_max(F.array(*choices))
    return embeddings.withColumn("cluster_id", (-best["ni"]).cast("int"))


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.55,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    bounds the quadratic pair search by clustering first — near-duplicates
    in embedding space land in the same cluster, so only WITHIN-cluster
    pairs are examined. A row is dropped when a LOWER-id row in its cluster
    has cosine >= threshold (the deterministic keeper convention shared
    with g05/g19; the paper's keep-farthest-from-centroid variant is a
    one-line orderBy swap).

    Returns every input row as (id, cluster_id, is_kept).

    Scale: assignment is the map-only literal-centroid pass of
    assign_clusters; the pair stage is ONE applyInPandas over
    groupBy(cluster_id) — each cluster's pairwise cosines are a blocked
    numpy gram matrix (BLAS), so every vector crosses Arrow once per
    cluster instead of riding one join row per pair, and work is
    sum(c_i^2) not n^2. The operator's contract is n_clusters ∝ corpus
    size, holding expected cluster size (and so per-task pair count and
    the b x c gram block) CONSTANT as the corpus grows; a hot cluster is
    bounded by the in-kernel row blocking, not executor memory. float64
    matmul vs the oracle's sequential-double sum differ only in ulp-level
    accumulation order — decisions are thresholded, so any pair nearer
    the threshold than ~1e-12 is flagged by no engine reliably (the
    expression-cosine twin stayed in g05/g41 for oracle-grade scoring)."""
    av = assign_clusters(embeddings, n_clusters, vec_col, id_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "cluster_id"
    )

    id_sql = embeddings.schema[id_col].dataType.simpleString()

    def cluster_verdicts(pdf: pd.DataFrame) -> pd.DataFrame:
        # The kernel emits the FULL per-row verdict (id, cluster, is_kept)
        # instead of dropped ids only: the old dropped-ids shape needed a
        # join back onto `av`, which re-ran the literal-centroid
        # assignment (n_clusters interpreted HOF cosines per row) over the
        # whole corpus a second time — `av` fed both the pandas stage and
        # the join side (r15; one corpus pass instead of two, join and its
        # exchanges gone: 1.97 -> 1.54 s min-of-5 at sf0.1 back-to-back).
        ids_all = pdf["__id"].to_numpy()
        kept = np.ones(len(ids_all), dtype=bool)
        # NULL vectors ride through assign_clusters (cluster 0 via the
        # coalesced cosine) but have no cosine to anything — they are
        # never dups and never drop others, so they skip the matrix build
        # (round-13 review) and land kept=True.
        sub = pdf[pdf["__v"].notna()]
        if len(sub):
            ids = sub["__id"].to_numpy()
            order = np.argsort(ids)  # lower-id keeper convention
            ids = ids[order]
            V = np.array(sub["__v"].to_numpy()[order].tolist(), dtype=np.float64)
            nm = np.linalg.norm(V, axis=1, keepdims=True)
            # zero-norm rows: cosine undefined (NULL in the expression
            # twin) -> never a dup and never drop others; a zeroed row
            # scores 0 < t
            np.divide(V, nm, out=V, where=nm > 0)
            V[(nm == 0).ravel()] = 0.0
            n = len(ids)
            dup = np.zeros(n, dtype=bool)
            block = 1024  # rows of the gram matrix per BLAS call: O(block*n)
            for s in range(0, n, block):
                e = min(s + block, n)
                G = V[s:e] @ V.T  # (block, n)
                hit = G >= threshold
                # row i may only drop strictly higher-id columns j > i
                for bi in range(e - s):
                    hit[bi, : s + bi + 1] = False
                dup |= hit.any(axis=0)
            kept &= ~np.isin(ids_all, ids[dup])
        return pd.DataFrame(
            {
                "__id": ids_all,
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "is_kept": kept,
            }
        )

    return (
        av.groupBy("cluster_id")
        .applyInPandas(
            cluster_verdicts,
            schema=f"__id {id_sql}, cluster_id int, is_kept boolean",
        )
        .withColumnRenamed("__id", id_col)
    )
