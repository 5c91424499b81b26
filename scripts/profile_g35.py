"""Per-trigger, per-phase breakdown of g35_stream_dedup_ingest (VERDICT
r14 #2): attributes the query's wall time to (a) the flush's serial Spark
phases via the _PROFILE_SINK hook in streaming/pipeline.py, and (b) the
engine's own trigger accounting (StreamingQueryProgress durationMs).

Usage:
    python scripts/profile_g35.py [--runs N] [--sf DIR] [--out FILE]

Writes a JSON artifact (default plans/r15/g35_trigger_breakdown.json)
holding every run's end-to-end seconds, per-trigger phase timings, and
per-trigger engine durations, plus a phase summary over the best run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_kinesis_spark import registry
from aws_kinesis_spark.session import get_spark
from aws_kinesis_spark.plans import streaming_queries as SQ
from aws_kinesis_spark.streaming import pipeline as P

WARM_SF = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15", "g35_trigger_breakdown.json"))
    args = ap.parse_args()

    spark = get_spark("profile-g35")
    fn = registry.queries()["g35_stream_dedup_ingest"]

    progress_runs: list[list[dict]] = []
    orig_drain = SQ._drain

    def capturing_drain(q, timeout_s: int = 300) -> None:
        orig_drain(q, timeout_s)
        progress_runs.append([
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
            for p in (json.loads(j) if isinstance(j, str) else j
                      for j in q.recentProgress)
        ])

    SQ._drain = capturing_drain
    runs = []
    try:
        if os.path.isdir(WARM_SF):  # codegen/Arrow warmup, not recorded
            P._PROFILE_SINK = []
            fn(spark, WARM_SF).write.format("noop").mode("overwrite").save()
            progress_runs.clear()
        for _ in range(args.runs):
            sink: list = []
            P._PROFILE_SINK = sink
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            runs.append({
                "total_sec": round(total, 4),
                "phases": [
                    {"batch": b, "phase": ph, "sec": s} for b, ph, s in sink
                ],
                "progress": progress_runs[-1] if progress_runs else None,
            })
    finally:
        P._PROFILE_SINK = None
        SQ._drain = orig_drain

    best = min(runs, key=lambda r: r["total_sec"])
    by_phase: dict[str, float] = {}
    for row in best["phases"]:
        by_phase[row["phase"]] = round(
            by_phase.get(row["phase"], 0.0) + row["sec"], 4
        )
    record = {
        "sf": args.sf,
        "runs": runs,
        "best_total_sec": best["total_sec"],
        "best_phase_totals": by_phase,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"total": best["total_sec"], "phases": by_phase}))
    for r in runs:
        print("run", r["total_sec"], "s")


if __name__ == "__main__":
    main()
