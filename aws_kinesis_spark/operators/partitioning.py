"""Keyed partitioning with per-key ordering (SURVEY.md B1; reference
README.md:47, 53) and bucketed co-located joins (SCALE.md §0).

The stream guarantee is "records with the same PartitionKey never reorder"
WITHIN a shard — in Spark terms: hash-repartition on the key so each key
lives in exactly one partition, then sort within partitions by sequence
number. Global order across keys is explicitly NOT promised (same as the
reference).

Bucketing is the at-rest analogue: two tables bucketed by the same key into
the same bucket count join WITHOUT a shuffle — the co-location was paid once
at write time, which is the right trade for a 100 TB fact table joined every
hour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def keyed_ordered_partitions(
    df: DataFrame,
    key: str = "partition_key",
    seq: str = "sequence_number",
    n_partitions: int | None = None,
) -> DataFrame:
    """B1: the shard layout — hash(key) -> partition, ordered by sequence
    within the partition (README.md:47, 53). AQE must not coalesce away the
    layout mid-plan, so callers write/consume it directly."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key)).sortWithinPartitions(key, seq)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist a table bucketed (and sorted) by the join key. Joins between
    tables bucketed the same way skip the exchange entirely — verified in
    tests/test_plans.py."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """B2 join form (reference README.md:84-86 hot-key salting): when one
    join key dominates, a plain shuffle join puts the whole hot key on one
    reducer. Salt the fact side (a DETERMINISTIC hash — of a caller-named
    row-unique column, or of all columns by default — replayable across
    task retries, unlike rand() or physical row ids) and replicate the dim
    side `salts` times, so the hot key spreads across `salts` reducers.

    Result is row-identical to `fact.join(dim, key)`: every fact row meets
    exactly the one dim replica carrying its salt. AQE's skew-join handles
    moderate skew automatically; explicit salting is the knob for the
    pathological single-key case."""
    if salt_source == key:
        raise ValueError(
            "salt_source must differ from the join key: hashing the key "
            "gives every row of a hot key the SAME salt — zero mitigation"
        )
    # default: row-content hash over ALL columns — DETERMINISTIC, which a
    # join key must be: a nondeterministic component (partition id /
    # monotonic id / rand) re-evaluates differently when a shuffle-map
    # task retries, routing the recomputed rows to different reducers
    # than the original attempt's already-fetched blocks — rows joined
    # twice or zero times (round-12 review; Spark only guards round-robin
    # repartition against this, not join keys). The content hash
    # degenerates to hash(key) when every non-key column is constant or
    # functionally determined by the key — silent zero mitigation — so a
    # key-only fact (the provable case) is rejected up front, and callers
    # whose non-key columns don't vary within the hot key must pass a
    # row-unique salt_source (sequence number, event id).
    if salt_source is None and fact.columns == [key]:
        raise ValueError(
            "fact has no non-key column to salt on: the default content "
            "hash would equal hash(key) — zero mitigation; pass a "
            "row-unique salt_source or add a distinguishing column"
        )
    salt_expr = (
        F.xxhash64(*[F.col(c) for c in fact.columns])
        if salt_source is None
        else F.xxhash64(F.col(salt_source))
    )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(salt_expr, F.lit(salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) curve key over 2+ non-negative integer columns —
    the multi-dimensional clustering analogue of the single-column sort in
    compact_lake(cluster_col=...) (Delta OPTIMIZE ZORDER / Iceberg
    sort-order with a space-filling curve; Morton 1966).

    Interleaves the low `bits` bits of each column round-robin (dimension
    d contributes bit i to output position i*ndims + d), so rows close in
    EVERY dimension land close on the curve. Sorting files by this key
    gives each file a tight min/max envelope on ALL the interleaved
    columns at once — zone maps (build_zone_maps/read_zone_pruned) then
    prune on any of them, where a lexicographic sort only prunes its
    leading column.

    Pure JVM bit arithmetic (shiftright/bitwise_and/shiftleft, unrolled at
    plan-build time into one flat expression) — map-only, no Python, no
    shuffle; the shuffle happens only in the range-repartition of the
    clustered rewrite that consumes the key. Callers must clamp/bucket
    inputs into [0, 2^bits): the key uses bits*ndims bits of a long, so
    2 dims at 16 bits fits comfortably."""
    ndims = len(cols)
    if bits * ndims > 63:
        raise ValueError(
            f"zorder_key: bits*ndims = {bits * ndims} exceeds a long's 63 "
            "value bits — interleaved bits would land in the sign bit and "
            "corrupt the sort order; lower bits or drop a dimension"
        )
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), i * ndims + d
            )
    return key


def spread_input(docs: DataFrame) -> DataFrame:
    """Spread a dense small-file scan across the cluster before heavy
    per-row work (owned here with the other layout/parallelism helpers;
    it lived module-private in operators/dedup.py while operators/
    training.py reached into the underscore name — round-13 review).

    Documents often arrive as one dense parquet file (a few MB for
    thousands of rows), so Spark gives the scan ONE partition and every
    downstream explode/hash/shingle runs single-threaded. One cheap row
    shuffle spreads the corpus across the cluster before the heavy
    per-doc work (measured 3x end-to-end at sf0.1).

    CONDITIONAL: a corpus that already scans as >= half the cluster's
    parallelism is returned untouched — repartition() is a full shuffle of
    every row, and at 100 TB the input is already thousands of splits, so
    the unconditional form would have paid a corpus-wide shuffle for
    nothing. The at-scale exit checks the file index first (driver
    metadata, no plan-to-RDD conversion); only a small-file-count input
    pays the one-off getNumPartitions conversion to decide precisely."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    enough = max(2, target // 2)
    try:
        # file count lower-bounds the split count, so >= enough files means
        # the scan is already parallel — the 100 TB fast path, zero cost
        if len(docs.inputFiles()) >= enough:
            return docs
    except Exception:
        pass  # non-file source: decide from the RDD below
    if docs.rdd.getNumPartitions() >= enough:
        return docs
    return docs.repartition(target)
