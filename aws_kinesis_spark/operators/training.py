"""Training-data assembly operators (SURVEY.md §2.G extension): the steps
between a cleaned corpus and a training run — deterministic splits live in
plans/ext_queries.py (g09); here: stratified sampling and sequence packing.

Both are pure window/projection plans: reproducible on any engine, no
sampling state, no driver participation — the properties a 100 TB data
pipeline needs so a backfill or re-run yields byte-identical training data.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_kinesis_spark.functions.text import md5_uniform, shingles, token_count


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsample by content-free key hash — the
    class-rebalancing step of a training mixture (e.g. cap the dominant
    language at 25% while keeping the tail at 100%).

    A row is kept iff the first md5 hex byte of its key falls below the
    stratum's threshold (fraction * 256, compared as two lowercase hex
    chars — the same seedless trick as the g09 split, so any engine
    reproduces the sample bit-for-bit). Pure projection: no shuffle, no
    sampling state, stable under repartitioning and incremental appends."""

    # NULL keys hash a sentinel, not NULL: md5(NULL) is NULL and a NULL
    # threshold predicate silently DROPPED every NULL-key row from any
    # stratum with fraction < 1, while fraction >= 1 strata kept them —
    # inconsistent, unsampled data loss (round-13 review). The sentinel
    # keeps NULL-key rows one deterministic coin flip like everyone else.
    h2 = F.substring(
        F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))), 1, 2
    )

    def pred(frac: float) -> F.Column:
        # the threshold is two lowercase hex chars; frac >= 1 must keep
        # everything (a '100' threshold would break the 2-char compare)
        if frac >= 1.0:
            return F.lit(True)
        return h2 < format(max(0, min(255, round(frac * 256))), "02x")

    expr = None
    for stratum, frac in fractions.items():
        branch = (F.col(strata_col) == stratum, pred(frac))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    cond = expr.otherwise(pred(default_fraction)) if expr is not None else pred(
        default_fraction
    )
    return df.filter(cond)


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are concatenated in id
    order within a shard and chunked into fixed token budgets — each doc's
    bin is the budget-chunk its FIRST token lands in. This is the standard
    LLM pretraining packing (documents concatenated with separators, split
    into budget-sized sequences), expressed as one running-sum window.

    Scale shape: one shuffle on the shard key (pmod(id, n_shards)), one sort
    within shards; no global sort, no driver state. Shard count bounds
    window-partition size; bins are (shard, bin_id) pairs so packing
    parallelizes across shards exactly like the training loader reads them.

    PRECONDITION: ``id_col`` must be NUMERIC (the shard is its modulus —
    the SQL-oracle-matched contract; a string id dies mid-stage in an
    ANSI CAST_INVALID_INPUT, so it is rejected at the API boundary
    instead), non-NULL and unique (training_order's posture: a NULL id
    has no shard and duplicate ids tie the running-sum order, making
    bin assignment run-dependent). A NULL text packs as 0 tokens — the
    doc occupies a deterministic slot; F.sum skipping the NULL otherwise
    emitted a NULL bin_id while not advancing the running sum, silently
    misplacing the row for any loader keyed on (shard, bin_id)
    (round-13 review)."""
    if budget < 1 or n_shards < 1:
        # under this engine's ANSI mode floor(x/0) / pmod(x, 0) raise
        # DIVIDE_BY_ZERO mid-job (the old comment claimed ANSI was off and
        # NULLs would flow — wrong both ways, round-13 review); fail at
        # the API boundary with the actual contract instead
        raise ValueError(
            f"pack_sequences: budget ({budget}) and n_shards ({n_shards}) "
            "must be >= 1"
        )
    from pyspark.sql import types as T

    if not isinstance(docs.schema[id_col].dataType, T.NumericType):
        raise ValueError(
            f"pack_sequences: id_col {id_col!r} must be numeric (its modulus "
            "is the shard key); hash non-numeric ids to a LONG first"
        )
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    tok = F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0).cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(F.col(id_col), shard.alias("shard"), tok.alias("n_tokens"))
        .withColumn("__end", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            F.floor((F.col("__end") - F.col("n_tokens")) / budget).alias("bin_id"),
            "n_tokens",
        )
    )


def training_order(
    docs: DataFrame,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order WITHOUT a global sort: the
    order key is md5(epoch:id); its first hex byte is the bucket, and rank
    is a row_number window per bucket. Global order = (bucket, rank) — the
    loader reads buckets in hex order — but the engine only ever sorts 256
    independent partitions, so shuffling a 100 TB corpus for each epoch is
    256 bounded sorts instead of one global one.

    Seedless and engine-reproducible (same md5 trick as the g09 split):
    re-running any epoch, on any engine, yields the identical order, and
    different epochs decorrelate because the epoch is folded into the
    hash.

    PRECONDITION: ``id_col`` must be non-NULL and unique. concat_ws skips
    a NULL id, so every NULL-id doc would share md5('<epoch>') — one
    bucket, tied order keys, and row_number breaks the tie arbitrarily
    per run, voiding the reproducible-order contract for exactly those
    rows (round-13 review)."""
    h = F.md5(F.concat_ws(":", F.lit(str(epoch)), F.col(id_col).cast("string")))
    w = Window.partitionBy("bucket").orderBy("__h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("__h"), F.substring(h, 1, 2).alias("bucket"))
        .withColumn("rank_in_bucket", F.row_number().over(w))
        .select(id_col, "bucket", "rank_in_bucket")
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: score every training document by the
    fraction of its token n-grams that also occur anywhere in the eval/
    benchmark corpus, and flag docs at or above ``threshold`` for removal.
    This is the standard pre-training hygiene step (strip eval-set leakage
    from the training mix) expressed as a broadcast inverted-index probe.

    Scale shape: the eval side of the join is the BENCHMARK set — tiny
    (thousands of docs) next to a 100 TB train corpus — so its distinct
    gram set is broadcast and the train side streams through a map-side
    hash probe with no shuffle of eval data. The train path's only
    unconditional shuffle is the per-doc re-aggregation of exploded grams,
    which partial-aggregates map-side to at most one row per
    (doc, partition) before exchanging. (_spread may add one round-robin
    exchange, but only when the input scans as fewer partitions than half
    the cluster's parallelism — never on a real many-split corpus.)

    Output: (id, n_grams, n_shared, contamination, contaminated) — docs
    with fewer than ``n`` tokens carry no n-grams and are excluded (they
    cannot leak an n-gram). Deterministic: no hashing approximations; the
    score is the exact distinct-gram overlap fraction.
    """
    from aws_kinesis_spark.operators.partitioning import spread_input as _spread

    # same input-parallelism guard as the dedup pipelines (SCALE.md §4b):
    # a small dense parquet gives the scan ONE partition, serializing the
    # shingle+explode work; measured 6x end-to-end at sf0.1. No-op (no
    # exchange) when the input already scans wide.
    train_sh = (
        _spread(train_docs)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__s"))
        .filter(F.size("__s") >= 1)
    )
    eval_grams = (
        eval_docs.select(F.explode(shingles(F.col(text_col), n)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = train_sh.select(
        id_col, F.size("__s").alias("__n"), F.explode("__s").alias("__g")
    )
    joined = exploded.join(F.broadcast(eval_grams), "__g", "left")
    frac = F.count("__hit") / F.max("__n")
    return joined.groupBy(id_col).agg(
        F.max("__n").alias("n_grams"),
        F.count("__hit").alias("n_shared"),
        F.round(frac, 4).alias("contamination"),
        (frac >= threshold).alias("contaminated"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """RAG-style token-window chunking: split each document into
    ``chunk_tokens``-token chunks whose starts step by ``chunk_tokens -
    overlap``, so consecutive chunks share ``overlap`` tokens of context.

    Semantics (deterministic, engine-independent):
      - tokens = whitespace split, empties dropped; 0-token docs emit nothing
      - chunk c starts at token s = 1 + c*(chunk_tokens - overlap), 1-based
      - a start past the first is emitted only if it contributes at least one
        NEW token (s <= n_tokens - overlap) — no fully-redundant tail chunk
      - the last chunk may be shorter than chunk_tokens

    Pure JVM column ops (split/sequence/explode/slice/array_join): chunking
    happens inside the scan stage with zero shuffle and no Python — at 100 TB
    this is a map-only pass whose output partitioning follows the input, so a
    downstream embed/index stage starts from co-located chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    # 0-token pre-filter on rlike('\S'), not size(__t): a size() predicate
    # gets pushed below the projection with the tokenizer expression
    # inlined, so the split+filter HOF would run TWICE per row (seen in the
    # plan dump). "contains a non-whitespace char" is exactly "has at least
    # one token" for EVERY whitespace class — trim() was tried first and
    # crashed on tab/newline-only docs (it strips ASCII spaces only, so a
    # 0-token row reached sequence(1, 0, step), which throws).
    t = docs.filter(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col), toks.alias("__t")
    )
    n = F.size("__t")
    starts = t.select(
        id_col,
        "__t",
        F.explode(F.sequence(F.lit(1), n, F.lit(step))).alias("__s"),
    ).filter((F.col("__s") == 1) | (F.col("__s") <= F.size("__t") - overlap))
    s = F.col("__s")
    chunk_len = F.least(F.lit(chunk_tokens), n - s + 1)
    return starts.select(
        id_col,
        ((s - 1) / step).cast("bigint").alias("chunk_id"),
        F.array_join(F.slice(F.col("__t"), s, chunk_len), " ").alias("chunk_text"),
        chunk_len.cast("bigint").alias("n_tokens"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    hex_chars: int = 2,
    checkpoint: bool = False,
) -> DataFrame:
    """Exact per-key frequency cap WITHOUT a per-key global sort: keep the
    first ``k`` rows of every key in deterministic hash order — result-
    identical to ``row_number() OVER (PARTITION BY key ORDER BY
    md5(cast(id AS string)), id) <= k``, the CCNet/RefinedWeb "at most K
    documents per domain" step — but skew-safe at 100 TB where a hot key
    (a crawl's top domain) would serialize that window's sort onto one
    task.

    Two-phase hash-bucket cutoff:
      1. Bucket every row by the first ``hex_chars`` hex chars of
         md5(id) — the bucket integer orders exactly like the md5 string
         prefix, so bucket-ascending is a prefix of the (md5, id) order
         the cap is defined over. One map-side-combinable count per
         (key, bucket) and a cumulative sum over each key's <= 16^hex_chars
         count rows locate, per key, which buckets fall wholly inside the
         cap (cum <= k) and the single boundary bucket the k-th rank lands
         in (start < k < cum), with its remaining quota k - start.
      2. Join the rows to the surviving cutoffs on (key, bucket) — at most
         min(16^hex_chars, k) rows per key, so AQE broadcasts it — and
         rank WITHIN the bucket only: rows in dropped buckets die at the
         map-side join before any shuffle, and the ranking window's
         partitions are (key, bucket) slices — a hot key's sort shrinks by
         the bucket fan-out and the shuffle moves ~keys*k rows, not the
         table.

    Deterministic and seedless (the g09/g40 md5 trick), so a backfill
    re-run keeps the identical row set on any partitioning.

    PRECONDITION: ``df`` itself must be deterministic. The plan evaluates
    ``df`` twice (the counts pass and the join/rank pass); a
    nondeterministic input (rand()/uuid()/sample without a seed, a scan of
    data mutating underneath) can desync the two passes and silently over-
    or under-fill buckets. Pass ``checkpoint=True`` to have the kernel
    pin the input itself — it eagerly ``localCheckpoint``s ``df`` so both
    passes read the SAME materialized rows (truncating lineage; the
    checkpoint blocks live in executor storage for the query's lifetime,
    so reserve it for inputs that are actually nondeterministic — a
    deterministic parquet scan pays the materialization for nothing), or
    persist/localCheckpoint such inputs yourself before calling
    (round-12 + round-13 ADVICE)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not 1 <= hex_chars <= 4:
        raise ValueError(f"hex_chars must be in [1, 4], got {hex_chars}")
    reserved = {"__hx", "__b", "__rn", "__ck", "__cb", "__full", "__quota",
                "__n", "__cum", "__start"}
    clash = reserved & set(df.columns)
    if clash:
        # withColumn REPLACES same-named input columns, so a clash would
        # corrupt the caller's data instead of failing (round-12 ADVICE)
        raise ValueError(
            f"df columns collide with cap_per_key temp names: {sorted(clash)}"
        )
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    hx = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(hx, 1, hex_chars), 16, 10).cast("int")
    rows = df.withColumn("__hx", hx).withColumn("__b", bucket)
    counts = rows.groupBy(key_col, "__b").agg(F.count("*").alias("__n"))
    wcum = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cuts = (
        counts.withColumn("__cum", F.sum("__n").over(wcum))
        .withColumn("__start", F.col("__cum") - F.col("__n"))
        .filter(F.col("__start") < k)
        .select(
            key_col,
            "__b",
            (F.col("__cum") <= k).alias("__full"),
            (F.lit(k) - F.col("__start")).alias("__quota"),
        )
    )
    wb = Window.partitionBy(key_col, "__b").orderBy("__hx", id_col)
    # NULL-SAFE join keys: window partitioning groups NULL keys together
    # (one NULL stratum, capped like any other), but a plain equi-join
    # never matches NULL = NULL — NULL-key rows would silently vanish
    # instead of being capped, a semantic the result-identity contract
    # with the window form forbids (round-12 review).
    c = cuts.select(
        F.col(key_col).alias("__ck"),
        F.col("__b").alias("__cb"),
        "__full",
        "__quota",
    )
    return (
        rows.join(
            c,
            rows[key_col].eqNullSafe(c["__ck"]) & rows["__b"].eqNullSafe(c["__cb"]),
        )
        .withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__full") | (F.col("__rn") <= F.col("__quota")))
        .select(*df.columns)
    )


def oversample_mixture(
    df: DataFrame,
    weight: F.Column,
    id_col: str,
    epoch_col: str = "epoch",
    max_copies: int = 100,
) -> DataFrame:
    """Training-mixture materialization with FRACTIONAL EPOCHS — the
    Dolma/LLaMA recipe step where a high-value source trains for 2.75
    epochs while a bulk crawl trains for 0.5: each row is emitted
    ``floor(w)`` times plus one more with probability ``frac(w)``, tagged
    with an ``epoch_col`` repeat index. Generalizes the existing
    downsamplers (g24/g29/g36 keep-rate <= 1) to weights ABOVE 1 — the
    direction they cannot express.

    Deterministic and seedless: the fractional coin is the g29
    md5-uniform draw on the row id (an md5-derived 32-bit integer /
    2^32), and the keep/extra-copy boundary uses only IEEE-exact ops
    (integer floor, one subtract of exactly-representable doubles, one
    compare — no ln/pow), so any engine reproduces the emitted multiset
    bit-for-bit and a backfill re-run is byte-identical.

    Scale: map-only — copies is an in-row expression and the repeat is
    explode(sequence(0, copies-1)) in the scan stage; zero shuffle, no
    sampling state, no driver participation. Output size is
    sum(w_i) +- nothing (exact in expectation per row, exact per row up
    to the single fractional coin). ``max_copies`` is a TWO-STAGE
    in-plan tripwire (raise_error, not a silent cap): absurd weights die
    on the double BEFORE any integer math (so neither an ANSI
    CAST_OVERFLOW nor a non-ANSI silent wrap can ever reach the copy
    count), and the exact long copy count is checked against the cap —
    a malformed weight column cannot explode a row into millions of
    copies or silently emit a bogus count.

    Semantics pinned by tests: NULL id draws through a sentinel (one
    deterministic coin like everyone else, the stratified_sample
    posture); NULL or negative weight means 0 copies (the row leaves
    the mixture, matching keep-rate-0 in the downsamplers).

    PRECONDITION: ``weight`` must be a DETERMINISTIC expression (the
    cap_per_key posture). It is referenced several times in the plan
    (NULL/negative guard, both tripwires, floor, fractional coin), and
    Catalyst does not common-subexpression-eliminate nondeterministic
    expressions — a rand()-derived weight would draw independently per
    reference, desynchronizing the copy count from its guards and
    silently voiding the bit-for-bit multiset contract."""
    if max_copies < 1:
        raise ValueError(f"max_copies must be >= 1, got {max_copies}")
    if epoch_col == "__copies":
        # the set-union guard below collapses {__copies, epoch_col} to one
        # name, so this aliasing slipped the clash check — and the final
        # drop('__copies') would then delete the just-built epoch column,
        # returning replicated rows with no repeat index (round-13 review)
        raise ValueError(
            "epoch_col must not be the reserved temp name '__copies'"
        )
    reserved = {"__copies", epoch_col}
    clash = reserved & set(df.columns)
    if clash:
        # withColumn REPLACES same-named input columns (round-12 ADVICE
        # precedent on cap_per_key): fail instead of corrupting
        raise ValueError(
            f"df columns collide with oversample_mixture names: {sorted(clash)}"
        )
    w = F.when(weight.isNull() | (weight < 0), F.lit(0.0)).otherwise(
        weight.cast("double")
    )
    # stage-1 tripwire BEFORE any integer math: an absurd double weight
    # (2^31, 1e300) must die with the NAMED error, not a generic ANSI
    # CAST_OVERFLOW inside floor/cast — and on a non-ANSI engine a silent
    # long->int wrap could otherwise emit a bogus copy count (round-13
    # review). Everything at or below max_copies+1 is exact long math.
    w = F.when(
        w > F.lit(float(max_copies) + 1.0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"oversample_mixture: weight exceeds max_copies={max_copies}"
                    " for id "
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(w)
    u = md5_uniform(F.col(id_col), prefix="os:")
    # copies stays LONG end-to-end (floor(double) is BIGINT); no int
    # narrowing anywhere, so the only overflow surface is the guarded
    # double above
    copies = (F.floor(w) + (u < (w - F.floor(w))).cast("long")).alias("__copies")
    guarded = F.when(
        F.col("__copies") > max_copies,
        F.raise_error(
            F.concat(
                F.lit(
                    f"oversample_mixture: copies exceeds max_copies={max_copies} "
                    "for id "
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.col("__copies"))
    return (
        df.withColumn("__copies", copies)
        .withColumn("__copies", guarded)
        .filter(F.col("__copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__copies") - 1)),
        )
        .drop("__copies")
    )
