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

    Returns (token, n_est, err) — n_est is an upper bound on the true
    count, err the summed overestimation bound; n_est - err is a lower
    bound. Exact whenever each partition's distinct-token count stays
    within ``capacity`` (asserted against the exact top-k in tests on the
    fixture vocabulary)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, tuple[int, int]] = {}  # token -> (count, overestimate)
        for pdf in batches:
            for tok, c in (
                pdf[text_col].str.split(" ").explode().value_counts().items()
            ):
                c = int(c)
                if tok in counts:
                    cur, err = counts[tok]
                    counts[tok] = (cur + c, err)
                elif len(counts) < capacity:
                    counts[tok] = (c, 0)
                else:
                    # SpaceSaving eviction: replace the minimum counter; the
                    # newcomer inherits its count as the overestimation bound
                    victim = min(counts, key=lambda t: counts[t][0])
                    vcount, _ = counts.pop(victim)
                    counts[tok] = (vcount + c, vcount)
        yield pd.DataFrame(
            [(t, c, e) for t, (c, e) in counts.items()],
            columns=["token", "n_est", "err"],
        )

    summaries = docs.select(text_col).mapInPandas(
        summarize, schema="token STRING, n_est LONG, err LONG"
    )
    return (
        summaries.groupBy("token")
        .agg(F.sum("n_est").alias("n_est"), F.sum("err").alias("err"))
        .orderBy(F.desc("n_est"), F.asc("token"))
        .limit(k)
    )
