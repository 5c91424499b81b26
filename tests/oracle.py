"""Local mirror of the driver's DuckDB differential check (SURVEY.md §5.2.1):
row count + schema-insensitive column alignment + order-insensitive value
comparison. Stricter than a hash — reports the first mismatching cell."""

from __future__ import annotations

import math

import duckdb

from aws_kinesis_spark.tables import TABLES


def duckdb_frame(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df):
    """Sort columns by name, then rows by all values (as strings), mirroring
    an order-insensitive hash."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    if df.empty:
        # agg over axis=1 of an empty frame returns a DataFrame, not a
        # Series — and there is nothing to sort anyway (zero-row results
        # are legitimate at tiny SFs, e.g. no overlapping intervals)
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return math.isclose(fa, fb, rel_tol=0, abs_tol=0)  # exact: queries must round
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def assert_frames_match(spark_df, oracle_df, name: str) -> None:
    import pandas as pd

    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(sp) == len(oracle_df), f"{name}: row count {len(sp)} != {len(oracle_df)}"
    a, b = _canon(sp), _canon(oracle_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # pandas NaN/None normalization
            if x is pd.NaT or (isinstance(x, float) and math.isnan(x)):
                x = None
            if y is pd.NaT or (isinstance(y, float) and math.isnan(y)):
                y = None
            if x is None and y is None:
                continue
            if x is None or y is None or not _cell_eq(x, y):
                raise AssertionError(
                    f"{name}: value mismatch col={col} row={i}: spark={x!r} oracle={y!r}"
                )
            if str(x) != str(y):
                # Numerically equal but string forms differ (e.g. DuckDB
                # HUGEINT -> 412345.0 vs Spark LongType 412345).  The driver's
                # order-insensitive hash is computed over STRING forms, so this
                # passes locally but fails the driver.  Fix the oracle with an
                # explicit CAST so both engines agree on the type.
                raise AssertionError(
                    f"{name}: driver-hash repr mismatch col={col} row={i}: "
                    f"spark={x!r} vs oracle={y!r} — numerically equal but "
                    f"str() differs; CAST the oracle column to match Spark"
                )
