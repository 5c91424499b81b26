"""Interactive SQL CLI (SURVEY.md §3.3) — the reference's ad-hoc query
surface ("query with Athena/DuckDB/Spark over the lake", README.md:164,
441-456) as a one-command entry point:

    python -m aws_kinesis_spark "SELECT count(*) FROM orders" \
        [--sf /root/testdata/sf0.01] [--lake /path/to/lake] [--limit 50]

Fixture tables (region/nation/.../documents/embeddings) are registered as
views; ``--lake`` additionally registers a lake written by this engine as
the ``lake`` view (partition discovery included). Output is one JSON line
per row, so results pipe into jq/DuckDB the way the reference's users
consume query output.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m aws_kinesis_spark")
    p.add_argument("sql", help="ANSI SQL over the registered views")
    p.add_argument("--sf", default="/root/testdata/sf0.01", help="fixture dir")
    p.add_argument("--lake", default=None, help="lake dir -> view `lake`")
    p.add_argument("--limit", type=int, default=100, help="max rows printed")
    p.add_argument("--explain", action="store_true", help="print the plan instead")
    args = p.parse_args(argv)

    from aws_kinesis_spark.session import get_spark
    from aws_kinesis_spark.sources.lake import register_lake_table
    from aws_kinesis_spark.tables import run_sql

    spark = get_spark("aws-kinesis-sql", cpus="*")
    spark.sparkContext.setLogLevel("ERROR")
    if args.lake:
        register_lake_table(spark, "lake", args.lake)
    df = run_sql(spark, args.sf, args.sql)
    if args.explain:
        df.explain("formatted")
        return 0
    for line in df.limit(args.limit).toJSON().collect():
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
