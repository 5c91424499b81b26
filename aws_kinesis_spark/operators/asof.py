"""As-of join (SURVEY.md §2 D15) — "most recent right row at or before each
left row's timestamp, per key".

Implemented as union + sorted last-observation-carried-forward window rather
than a range join: a range join is O(|L|x|R|) per key, while this is one
shuffle on the key and a single sort — the strategy that survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the ``by`` keys (inclusive, like DuckDB's
    ASOF JOIN ``>=``). Right-side ties on timestamp resolve to the row that
    sorts last by ``value_cols[0]``.

    ``tolerance`` (an SQL interval string, e.g. ``"2 hours"``) bounds the
    match's staleness: a carried right row older than ``left_ts -
    tolerance`` is rejected and the value columns come back NULL — the
    kdb/pandas ``merge_asof(tolerance=...)`` semantics. Implemented as a
    post-window predicate on the carried match timestamp, so the plan
    shape (one key shuffle + one sort, no range join) is unchanged.

    Returns all left columns plus ``{c}{suffix}`` for each value col.

    The right row's value columns are packed into ONE struct carried by a
    single ``last(ignorenulls=True)`` — per-column carry-forward would
    stitch values from DIFFERENT right rows whenever the latest right row
    holds a NULL in one column (that column would backfill from an older
    row), diverging from ASOF semantics. The struct itself is non-null for
    every right row, so a NULL field in the matched row stays NULL.
    """
    by = list(by)
    out_cols = [f"{c}{suffix}" for c in value_cols]
    if not out_cols:
        # the carry window's tie-break dereferences out_cols[0]; fail with
        # the contract instead of a bare IndexError from plan construction
        raise ValueError(
            "asof_join: value_cols must name at least one right column to "
            "carry (an existence-only probe can pass the right timestamp "
            "column itself)"
        )

    # a NULL right_ts sorts NULLS FIRST in the carry window, so its struct
    # would be carried as a "match" for every later left row — but a NULL
    # timestamp satisfies no `right_ts <= left_ts` predicate (the DuckDB
    # ASOF oracle agrees: e.ts >= p.ts is false for NULL). Drop such rows
    # up front (round-12 review). NULL join KEYS are dropped for the same
    # reason: Window.partitionBy groups NULLs into one partition, so a
    # NULL-keyed right row would be carried as the match for NULL-keyed
    # left rows — but NULL = NULL satisfies no equi-join predicate, and
    # the SQL/DuckDB ASOF semantics this operator promises return NULL
    # values for such left rows (round-13 review).
    right = right.filter(F.col(right_ts).isNotNull())
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
        ).alias("__vals"),
    )
    left_cols = left.columns
    l = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__vals"].dataType).alias("__vals"),
        *[F.col(c) for c in left_cols if c not in by],
    )
    r = r.select(*by, "__ts", "__side", "__vals", *[
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left_cols
        if c not in by
    ])

    unioned = r.unionByName(l)
    # right rows (side=0) sort before left rows at equal ts => inclusive >=;
    # among right ties the last by sort order is carried forward.
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side", F.col(f"__vals.{out_cols[0]}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        "__ts",
        "__side",
        F.last("__vals", ignorenulls=True).over(w).alias("__vals"),
        *[c for c in left_cols if c not in by],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        fresh = F.col("__vals.__matched_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn(
            "__vals", F.when(fresh, F.col("__vals")).otherwise(F.lit(None))
        )
    return out.select(
        *by,
        F.col("__ts").alias(left_ts),
        *[c for c in left_cols if c not in by and c != left_ts],
        *[F.col(f"__vals.{o}").alias(o) for o in out_cols],
    )
