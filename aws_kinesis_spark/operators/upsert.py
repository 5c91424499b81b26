"""Keyed upsert semantics (reference README.md:562-575).

The reference's zero-duplicate warehouse load is: COPY into a staging table,
``DELETE FROM target USING staging WHERE target.id = staging.id`` then
``INSERT INTO target SELECT * FROM staging``. In Spark that is exactly
anti-join + union — no MERGE-capable catalog needed, and at 100 TB the
anti-join shuffles only on the key (broadcast when staging is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def staging_upsert(target: DataFrame, staging: DataFrame, keys: Sequence[str]) -> DataFrame:
    """DELETE-USING + INSERT-SELECT as anti-join + union (README.md:573-575).

    staging is broadcast when small (Catalyst auto-selects; at the reference's
    scale staging is one flush window — always broadcastable).
    """
    kept = target.join(staging.select(*keys), list(keys), "left_anti")
    return kept.unionByName(staging)


def merge_into_sql(
    target_table: str,
    staging_view: str,
    keys: Sequence[str],
    columns: Sequence[str] | None = None,
    delete_op: tuple[str, str] | None = None,
) -> str:
    """The ANSI ``MERGE INTO`` statement for the reference's staging upsert
    (README.md:573-575; SURVEY.md A7 "MERGE INTO on a v2 table").

    ``columns`` are the target's columns (explicit UPDATE SET / INSERT
    lists — required when staging carries extra columns like the CDC op);
    with None both clauses use ``*``. ``delete_op=(col, value)`` adds a
    WHEN MATCHED AND col = value THEN DELETE clause and guards the insert
    so unmatched delete markers are ignored (CDC delete routing,
    README.md:224 metadata.op)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    guard = f" AND s.{delete_op[0]} <> '{delete_op[1]}'" if delete_op else ""
    delete = (
        f"WHEN MATCHED AND s.{delete_op[0]} = '{delete_op[1]}' THEN DELETE\n"
        if delete_op
        else ""
    )
    if columns:
        update = "UPDATE SET " + ", ".join(f"t.{c} = s.{c}" for c in columns)
        insert = (
            "INSERT ("
            + ", ".join(columns)
            + ") VALUES ("
            + ", ".join(f"s.{c}" for c in columns)
            + ")"
        )
    else:
        update, insert = "UPDATE SET *", "INSERT *"
    return (
        f"MERGE INTO {target_table} t\n"
        f"USING {staging_view} s\n"
        f"ON {on}\n"
        f"{delete}"
        f"WHEN MATCHED{guard} THEN {update}\n"
        f"WHEN NOT MATCHED{guard} THEN {insert}"
    )


def merge_upsert(
    spark: SparkSession,
    target_table: str,
    staging: DataFrame,
    keys: Sequence[str],
    delete_op: tuple[str, str] | None = None,
) -> DataFrame:
    """A7 MERGE-INTO variant: run the ANSI MERGE when the target's catalog
    supports it (Delta/Iceberg-style v2 tables); on a v1 catalog (plain
    parquet tables — this environment) fall back to the semantically
    identical plan: latest-staging-row-per-key resolved against the target
    via anti-join + union, deletes dropped.

    Staging is expected to hold at most one row per key (pre-collapse a CDC
    changelog with apply_cdc) — multiple matches are a MERGE cardinality
    error on v2 and nondeterministic in any engine.

    Returns the post-merge table state as a DataFrame. The fallback never
    writes in place (v1 tables can't); callers persist the result — which is
    exactly the reference's staging-swap discipline. Both paths shuffle only
    on the key and broadcast the staging side when small."""
    import uuid

    from pyspark.errors import (
        AnalysisException,
        ParseException,
        UnsupportedOperationException,
    )

    target = spark.table(target_table)
    # uuid view name: a (table, keys)-derived name let two concurrent
    # merges against one table clobber each other's staging view mid-MERGE
    # (and hash() is PYTHONHASHSEED-randomized across restarts)
    view = f"__staging_{uuid.uuid4().hex}"
    staging.createOrReplaceTempView(view)
    sql = merge_into_sql(target_table, view, keys, target.columns, delete_op)
    try:
        try:
            spark.sql(sql)
            return spark.table(target_table)
        except (AnalysisException, ParseException, UnsupportedOperationException):
            # v1 catalog: MERGE INTO unsupported — rewrite to the equivalent
            # relational plan (README.md:573-575 DELETE-USING + INSERT-SELECT).
            # ONLY planning-time errors take the fallback: an execution-time
            # MERGE failure (cardinality violation, executor loss) must
            # propagate, not silently re-run as a differently-shaped plan
            if delete_op:
                col, val = delete_op
                keep = staging.filter(F.col(col) != val).select(*target.columns)
                # matched deletes remove the target row; unmatched are ignored
                dropped_keys = staging.filter(F.col(col) == val).select(*keys)
                merged = staging_upsert(target, keep, keys)
                return merged.join(dropped_keys, list(keys), "left_anti")
            return staging_upsert(target, staging.select(*target.columns), keys)
    finally:
        # the MERGE runs eagerly and neither returned plan references the
        # view, so it is droppable in every path — a foreachBatch loop
        # otherwise leaks one catalog entry (pinning its staging plan) per
        # micro-batch for the session's lifetime (round-13 review)
        spark.catalog.dropTempView(view)


def apply_cdc(
    cdc: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC changelog to final state: latest record per key wins
    (OpenSearch doc-id upsert, README.md:167-168), deletes drop the key.

    One shuffle on the key; the window never materializes more than a
    partition's rows, so this scales linearly with key cardinality.

    Ties on the sequence number (a producer that reuses one) resolve
    DELETE-WINS: a tombstone sharing a sequence number with an update
    beats it (the convention CDC consumers expect — discarding a
    same-seq tombstone silently resurrects the key), then by op for a
    total order that is identical across runs/partitions.
    """
    return collapse_cdc(cdc, keys, seq_col, op_col, delete_op).filter(
        F.col(op_col) != delete_op
    )


def collapse_cdc(
    cdc: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """The winning (rank-1) record per key under apply_cdc's exact order —
    TOMBSTONES INCLUDED. A consumer that needs both the surviving state
    AND the deleted-key set (the warehouse merge) derives them from ONE
    collapse, so both sides share the same delete-wins tie-break: deriving
    the delete set from a second window with a different order lost tied
    tombstones and resurrected their keys (round-11 review).

    The final payload-hash term makes the order TOTAL even when two events
    share key+seq+op with different payloads (a producer double-send with
    drift): without it row_number picks a partition-order-dependent winner
    and replays diverge."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col),
        F.desc((F.col(op_col) == delete_op).cast("int")),
        F.desc(op_col),
        F.desc(F.xxhash64(F.struct(*[F.col(c) for c in cdc.columns]))),
    )
    return (
        cdc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def net_changes(
    cdc: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    from_seq,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Net effect of the CDC log since a consumer cursor (README.md:305-309:
    consumers checkpoint a sequence number and resume strictly after it).
    ``from_seq`` is an EXCLUSIVE cursor — the checkpointed (last-applied)
    sequence number itself is not re-delivered. The last event per key
    strictly after ``from_seq`` decides that key's ONE net operation for
    the increment: a delete marker becomes ``DELETE``, anything else an
    ``UPSERT`` carrying the final values. Keys untouched in the window emit
    nothing — downstream applies a bounded changeset instead of re-reading
    the whole log (apply_cdc's full collapse). Sequence-number ties resolve
    delete-wins, then by op (same convention as apply_cdc) so the net row
    is deterministic across runs.

    Scale: the cursor predicate is a pushed-down range filter on the scan
    (sequence-sorted lake files prune whole splits), then one key shuffle
    over the increment only — cost proportional to the delta, never the
    retained log."""
    # ONE collapse kernel: the winning-row order (desc seq, delete-wins,
    # op, payload-hash total order) lives only in collapse_cdc — this
    # path carried a private byte-identical copy of the window, and that
    # window has been patched twice (rounds 11 and 12); a third fix would
    # have missed the copy (round-13 review)
    return collapse_cdc(
        cdc.filter(F.col(seq_col) > F.lit(from_seq)),
        keys,
        seq_col,
        op_col,
        delete_op,
    ).withColumn(
        "__net_op",
        F.when(F.col(op_col) == delete_op, F.lit("DELETE")).otherwise(
            F.lit("UPSERT")
        ),
    )


def compact_changelog(
    cdc: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    cursor,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Kafka-style log compaction bounded by the SLOWEST consumer cursor
    (README.md:305-309 checkpointing + the retention window the reference's
    24h stream enforces physically): events at-or-before ``cursor``
    collapse to ONE snapshot row per key (latest state wins, per
    apply_cdc's deterministic order; keys whose final head op is a delete
    vanish — every consumer at >= cursor already applied the tombstone),
    while events after the cursor are retained VERBATIM so any consumer
    resuming from >= cursor replays exactly what it would have from the
    full log.

    Scale: the head collapses through one key shuffle over only the
    pre-cursor slice; the tail is a pushed-down range filter, untouched.
    Retained size is O(live keys + post-cursor delta) instead of O(full
    history) — the property that keeps a 100 TB changelog replayable."""
    head = cdc.filter(F.col(seq_col) <= F.lit(cursor))
    tail = cdc.filter(F.col(seq_col) > F.lit(cursor))
    snapshot = apply_cdc(head, keys, seq_col, op_col, delete_op)
    return snapshot.unionByName(tail)


def scd2_history(
    cdc: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    keep_deletes: bool = False,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 from the same CDC changelog
    apply_cdc collapses to type 1: every non-delete event opens a version
    valid from its own sequence number until the key's NEXT event (any op —
    an update supersedes, a delete closes); the open-ended version is the
    current one. Deletes emit no row of their own, they only terminate the
    prior version via the lead().

    Same scale shape as apply_cdc: one shuffle on the key, one ordered
    window pass, linear in events. Columns added: __valid_from, __valid_to
    (NULL = still open), __is_current. Sequence ties order the delete LAST
    (the exact mirror of apply_cdc's delete-wins collapse: the tombstone
    closes the same-seq update's version rather than being closed by it),
    then by op, then by payload hash — the same total-order final term as
    collapse_cdc, so two same-key+seq+op events with drifted payloads
    chain identically on every replay instead of swapping version order
    with partition luck."""
    w = Window.partitionBy(*keys).orderBy(
        F.asc(seq_col),
        F.asc((F.col(op_col) == delete_op).cast("int")),
        F.asc(op_col),
        F.asc(F.xxhash64(F.struct(*[F.col(c) for c in cdc.columns]))),
    )
    nxt = F.lead(seq_col).over(w)
    out = (
        cdc.withColumn("__valid_from", F.col(seq_col))
        .withColumn("__valid_to", nxt)
        .withColumn("__is_current", nxt.isNull())
    )
    if keep_deletes:
        # tombstones retained: each version row then doubles as its
        # originating CDC event, which is what lets scd2_merge_increment
        # rebuild chains from state alone
        return out
    return out.filter(F.col(op_col) != delete_op)


def _dedup_events(
    df: DataFrame, klist: Sequence[str], seq_col: str, op_col: str
) -> DataFrame:
    """One row per (key, seq, op) event identity, DETERMINISTICALLY: a
    byte-identical replayed event collapses regardless of which copy wins,
    but a drifted payload (producer re-send with changed values) must keep
    the SAME copy on every run — ``dropDuplicates`` keeps a
    partition-order-dependent one; rank by the payload hash instead (the
    collapse_cdc total-order term)."""
    w = Window.partitionBy(*klist, seq_col, op_col).orderBy(
        F.desc(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_merge_increment(
    versions: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """ORDER-INDEPENDENT incremental SCD2: merge one CDC micro-batch into a
    versioned dimension (with tombstones — build with keep_deletes=True).

    Because every version row retains its originating event (seq_col ==
    __valid_from, delete tombstones kept), the chain for each TOUCHED key
    is rebuilt from the exact event set (prior events ∪ batch events,
    de-duplicated on key+seq+op so a replayed batch is a no-op): correct
    under ANY cross-batch arrival order — a late event reopens or splits
    an existing interval naturally, which cursor-style merges get wrong.
    Untouched keys pass through without a rewrite of their chains.

    Scale: one semi/anti join pair on the touched-key set plus one window
    over (versions of touched keys + batch) — O(delta × chain depth) per
    batch, never O(dimension). The public view filters tombstones."""
    vcols = ["__valid_from", "__valid_to", "__is_current"]
    klist = list(keys)
    if versions is None:
        src = _dedup_events(batch, klist, seq_col, op_col)
        return scd2_history(src, keys, seq_col, op_col, delete_op, keep_deletes=True)
    touched = batch.select(*klist).distinct()
    untouched = versions.join(touched, klist, "left_anti")
    prior_events = versions.join(touched, klist, "left_semi").drop(*vcols)
    src = _dedup_events(
        prior_events.unionByName(batch), klist, seq_col, op_col
    )
    rebuilt = scd2_history(src, keys, seq_col, op_col, delete_op, keep_deletes=True)
    return untouched.unionByName(rebuilt)
