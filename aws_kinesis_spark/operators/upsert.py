"""Keyed upsert semantics (reference README.md:562-575).

The reference's zero-duplicate warehouse load is: COPY into a staging table,
``DELETE FROM target USING staging WHERE target.id = staging.id`` then
``INSERT INTO target SELECT * FROM staging``. In Spark that is exactly
anti-join + union — no MERGE-capable catalog needed, and at 100 TB the
anti-join shuffles only on the key (broadcast when staging is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def staging_upsert(target: DataFrame, staging: DataFrame, keys: Sequence[str]) -> DataFrame:
    """DELETE-USING + INSERT-SELECT as anti-join + union (README.md:573-575).

    staging is broadcast when small (Catalyst auto-selects; at the reference's
    scale staging is one flush window — always broadcastable).
    """
    kept = target.join(staging.select(*keys), list(keys), "left_anti")
    return kept.unionByName(staging)


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
    """
    w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
    return (
        cdc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(F.col(op_col) != delete_op)
    )
