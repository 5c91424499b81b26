"""Per-query profiling harness for optimization rounds.

Usage:
    python scripts/profile_query.py QUERY [QUERY ...] [--runs N] [--sf DIR]
        [--plan-out DIR] [--tag TAG]

For each named registry query: warm up once at sf0.001, then time
``--runs`` noop-sink materializations at ``--sf`` (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1) and print min/median/max.
With ``--plan-out DIR`` also writes ``<query>_<tag>.txt`` holding
``explain("formatted")`` of the query's returned frame (plan evidence
for OPTIMIZATION_r*.md).

Timing methodology matches bench.py (noop sink, min-of-N) so numbers
are comparable; the bench stays the artifact of record.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_spark import registry
from aws_kinesis_spark.session import get_spark

WARM_SF = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--plan-out", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("profile-query")
    qmap = registry.queries()
    unknown = [q for q in args.queries if q not in qmap]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in args.queries:
        fn = qmap[name]
        if not args.no_warm and os.path.isdir(WARM_SF):
            try:
                fn(spark, WARM_SF).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: warmup failed: {exc!r}", file=sys.stderr)
        if args.plan_out:
            os.makedirs(args.plan_out, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(args.plan_out, f"{name}_{args.tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> {out}")
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        ts = sorted(times)
        med = ts[len(ts) // 2]
        print(f"{name}: min={ts[0]:.3f}s median={med:.3f}s max={ts[-1]:.3f}s "
              f"runs={args.runs}")


if __name__ == "__main__":
    main()
