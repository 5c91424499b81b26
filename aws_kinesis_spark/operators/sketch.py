"""Frequency-sketch operators (SURVEY.md §2.G extension): corpus-level
heavy hitters (most frequent tokens) — the vocabulary/stopword-discovery
pass of a training-data pipeline.

Two shapes:

- ``token_topk_exact``: explode + hash aggregate + top-k. One shuffle with
  map-side partial aggregation; shuffle volume is O(distinct tokens per
  partition), and the final top-k is a TakeOrderedAndProject (no global
  sort). This is exact and is the DuckDB-oracle query.
- ``token_topk_spacesaving``: the bounded-memory scale path. Each input
  partition streams its rows through a SpaceSaving summary of ``capacity``
  counters (Metwally et al., "Efficient Computation of Frequent and Top-k
  Elements in Data Streams", ICDT 2005); only O(partitions x capacity)
  (token, count, overestimate) triples are shuffled for the merge, no
  matter how large the vocabulary is. Any token with true frequency
  > partition_rows/capacity is guaranteed present in its partition summary;
  merged counts carry per-counter overestimation bounds so the caller can
  see which ranks are certain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_topk_exact(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Exact global top-k tokens by frequency, ties broken by token order
    (deterministic on any engine)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def token_topk_spacesaving(
    docs: DataFrame,
    k: int = 100,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Approximate top-k tokens via per-partition SpaceSaving summaries.

    Returns (token, n_est, err) — n_est upper-bounds the true GLOBAL
    count, err the summed overestimation; n_est - err lower-bounds it.
    The distributed merge is bound-preserving: a token ABSENT from a
    partition's summary may still have occurred up to that partition's
    minimum-counter value ("floor") there, so the merge adds every absent
    partition's floor to both n_est and err (floor is 0 for partitions
    that never filled). Exact whenever each partition's distinct-token
    count stays within ``capacity`` (asserted against the exact top-k in
    tests).

    Eviction is a lazy-deletion heap (counts only grow, so a stale heap
    entry always surfaces before the live one) — O(log capacity) amortized
    instead of an O(capacity) min-scan per evicted newcomer."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import heapq

        from pyspark import TaskContext

        counts: dict[str, tuple[int, int]] = {}  # token -> (count, overestimate)
        heap: list[tuple[int, str]] = []  # (count-at-push, token), lazily stale
        for pdf in batches:
            for tok, c in (
                pdf[text_col].str.split(" ").explode().value_counts().items()
            ):
                c = int(c)
                if tok in counts:
                    cur, err = counts[tok]
                    counts[tok] = (cur + c, err)
                    heapq.heappush(heap, (cur + c, tok))
                elif len(counts) < capacity:
                    counts[tok] = (c, 0)
                    heapq.heappush(heap, (c, tok))
                else:
                    # SpaceSaving eviction: replace the minimum live counter;
                    # the newcomer inherits its count as overestimation
                    while True:
                        vcount, victim = heapq.heappop(heap)
                        if counts.get(victim, (None,))[0] == vcount:
                            break  # live entry; stale ones discard silently
                    counts.pop(victim)
                    counts[tok] = (vcount + c, vcount)
                    heapq.heappush(heap, (vcount + c, tok))
        floor = (
            min(c for c, _ in counts.values())
            if len(counts) >= capacity
            else 0
        )
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            [(pid, t, c, e, floor) for t, (c, e) in counts.items()],
            columns=["part_id", "token", "n_est", "err", "floor"],
        )

    summaries = docs.select(text_col).mapInPandas(
        summarize,
        schema="part_id INT, token STRING, n_est LONG, err LONG, floor LONG",
    )
    total_floor = summaries.select("part_id", "floor").distinct().agg(
        F.coalesce(F.sum("floor"), F.lit(0)).alias("total_floor")
    )
    per_token = summaries.groupBy("token").agg(
        F.sum("n_est").alias("s_est"),
        F.sum("err").alias("s_err"),
        F.sum("floor").alias("s_floor_present"),
    )
    absent = F.col("total_floor") - F.col("s_floor_present")
    return (
        per_token.crossJoin(F.broadcast(total_floor))
        .select(
            "token",
            (F.col("s_est") + absent).alias("n_est"),
            (F.col("s_err") + absent).alias("err"),
        )
        .orderBy(F.desc("n_est"), F.asc("token"))
        .limit(k)
    )
