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


def _check_reserved(df: DataFrame, names: Sequence[str], where: str) -> None:
    """withColumn REPLACES same-named input columns silently — an input
    frame already carrying one of our temp/output column names would have
    it overwritten and then dropped/reinterpreted, corrupting the caller's
    data with no error (round-13 review; the cap_per_key validation
    style)."""
    clash = set(names) & set(df.columns)
    if clash:
        raise ValueError(
            f"{where}: input columns {sorted(clash)} collide with reserved "
            "column names — rename them before calling"
        )


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
    README.md:224 metadata.op).

    Identifiers are backtick-quoted and the delete value single-quote
    escaped: an op value or column name containing a quote otherwise
    broke the statement — and because merge_upsert's fallback caught the
    resulting ParseException, the MERGE path was silently abandoned for a
    differently-shaped plan with no signal (round-13 review); an
    externally-sourced op value could even smuggle SQL into spark.sql()."""

    def q(ident: str) -> str:  # backtick-quote, doubling embedded backticks
        return "`" + ident.replace("`", "``") + "`"

    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    if delete_op:
        dcol, dval = q(delete_op[0]), delete_op[1].replace("'", "''")
        guard = f" AND s.{dcol} <> '{dval}'"
        delete = f"WHEN MATCHED AND s.{dcol} = '{dval}' THEN DELETE\n"
    else:
        guard, delete = "", ""
    if columns:
        update = "UPDATE SET " + ", ".join(f"t.{q(c)} = s.{q(c)}" for c in columns)
        insert = (
            "INSERT ("
            + ", ".join(q(c) for c in columns)
            + ") VALUES ("
            + ", ".join(f"s.{q(c)}" for c in columns)
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

    Returns the post-merge table state as a DataFrame — but note the two
    paths' side-effect contracts DIFFER: the v2 MERGE has already committed
    to the target when this returns (the frame is a read of the committed
    table; writing it back would be a redundant full rewrite, and on a
    non-transactional sink a read-overwrite hazard), while the fallback
    only returns a plan that the caller must persist (v1 tables cannot be
    mutated in place — the reference's staging-swap discipline). Callers
    that must behave identically on both catalog kinds should persist
    through a staging swap to a NEW location, which is safe in either
    case. Both paths shuffle only on the key and broadcast the staging
    side when small."""
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

    def fallback() -> DataFrame:
        # v1 catalog: MERGE INTO unsupported — rewrite to the equivalent
        # relational plan (README.md:573-575 DELETE-USING + INSERT-SELECT)
        if delete_op:
            col, val = delete_op
            keep = staging.filter(F.col(col) != val).select(*target.columns)
            # matched deletes remove the target row; unmatched are ignored
            dropped_keys = staging.filter(F.col(col) == val).select(*keys)
            merged = staging_upsert(target, keep, keys)
            return merged.join(dropped_keys, list(keys), "left_anti")
        return staging_upsert(target, staging.select(*target.columns), keys)

    try:
        try:
            spark.sql(sql)
            return spark.table(target_table)
        except UnsupportedOperationException as ex:
            # ONLY the catalog's "this table kind cannot MERGE" refusal
            # (condition UNSUPPORTED_FEATURE.*, measured on v1 parquet)
            # takes the fallback. The bare class is NOT enough: PySpark
            # maps EVERY java.lang.UnsupportedOperationException to it —
            # including execution-time MERGE failures like Delta's
            # duplicate-staging-row cardinality violation, which a broad
            # catch silently re-ran as the relational plan WITHOUT the
            # collapse, returning duplicated-key state (round-13 review).
            cond = ex.getCondition() or ""
            if not cond.startswith("UNSUPPORTED_FEATURE"):
                raise
            return fallback()
        except (AnalysisException, ParseException):
            # planning-time only (unresolved MERGE analysis / no MERGE
            # grammar in the catalog's parser); execution-time failures
            # surface as different classes and propagate
            return fallback()
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

    A winning row with a NULL op is kept (surfaces as state), not
    dropped: ``op != 'D'`` evaluates to NULL for it, so the plain filter
    silently deleted keys whose latest record was malformed — a vanished
    key with no error (round-13 review). Null-safe comparison keeps it;
    a pipeline that wants to reject malformed ops filters them upstream
    (the decode path's _corrupt routing).
    """
    return collapse_cdc(cdc, keys, seq_col, op_col, delete_op).filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
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
    _check_reserved(cdc, ["__rn"], "collapse_cdc")
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
    _check_reserved(cdc, ["__net_op"], "net_changes")
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
    history) — the property that keeps a 100 TB changelog replayable.

    A NULL sequence number routes to the HEAD slice: it fails both range
    predicates, so the row used to vanish from the compacted log entirely
    (in neither head nor tail), breaking replay equivalence with the full
    log. In the full-log collapse desc(seq) orders NULLs LAST — oldest —
    and no cursor-based consumer can position after a NULL, so folding it
    into the snapshot is the replay-equivalent placement (round-13
    review)."""
    head = cdc.filter((F.col(seq_col) <= F.lit(cursor)) | F.col(seq_col).isNull())
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
    _check_reserved(
        cdc, ["__valid_from", "__valid_to", "__is_current"], "scd2_history"
    )
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
    # null-safe: a NULL-op event opens a (malformed but visible) version
    # instead of silently vanishing like a tombstone (apply_cdc's posture)
    return out.filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))


def _dedup_events(
    df: DataFrame, klist: Sequence[str], seq_col: str, op_col: str
) -> DataFrame:
    """One row per (key, seq, op) event identity, DETERMINISTICALLY: a
    byte-identical replayed event collapses regardless of which copy wins,
    but a drifted payload (producer re-send with changed values) must keep
    the SAME copy on every run — ``dropDuplicates`` keeps a
    partition-order-dependent one; rank by the payload hash instead (the
    collapse_cdc total-order term)."""
    _check_reserved(df, ["__rn"], "_dedup_events")
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
