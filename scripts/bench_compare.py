"""Cross-round bench comparison from BENCH_FULL.json artifacts.

Usage:
    python scripts/bench_compare.py OLD NEW [--threshold 1.25]

OLD / NEW are either paths to BENCH_FULL.json-shaped files or git
revisions (the file is read as ``<rev>:BENCH_FULL.json``). Prints one
line per query present in both records:

    name  old_min  new_min  raw_ratio  norm_ratio  flag

``norm_ratio`` divides the raw new/old ratio by the two runs' canary
ratio (min-based — the like-for-like normalizer, SCALE.md §10), so a
slower host epoch does not read as a code regression. ``flag`` marks
norm_ratio above ``--threshold`` as REGRESSION and below 1/threshold as
WIN. Exits 1 if any REGRESSION is flagged (CI-friendly).

Host-noise caveat (SCALE.md §10): even normalized, cross-round numbers
carry epoch spread — two same-code runs 40 minutes apart flag ~1/3 of
queries at threshold 1.1, which is why the default is 1.25; treat a
flag as "investigate with an interleaved A/B", never as proof by
itself.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def load_record(ref: str) -> dict:
    """A path to a JSON file, or a git rev holding BENCH_FULL.json."""
    if os.path.exists(ref):
        with open(ref) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", f"{ref}:BENCH_FULL.json"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(
            f"cannot read {ref!r}: not a file, and `git show "
            f"{ref}:BENCH_FULL.json` failed: {out.stderr.strip()}"
        )
    return json.loads(out.stdout)


def compare(old: dict, new: dict, threshold: float) -> tuple[list[tuple], float]:
    """Rows (name, old_min, new_min, raw, norm, flag) + the epoch factor."""
    old_canary = (old.get("canary") or {}).get("ratio_vs_r10_min")
    new_canary = (new.get("canary") or {}).get("ratio_vs_r10_min")
    # epoch factor: how much slower NEW's host epoch was than OLD's; with
    # either canary missing, fall back to host_index_sec, then to 1.0
    if old_canary and new_canary:
        epoch = new_canary / old_canary
    elif old.get("host_index_sec") and new.get("host_index_sec"):
        epoch = new["host_index_sec"] / old["host_index_sec"]
    else:
        epoch = 1.0
    rows = []
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    for name in shared:
        o, n = old["queries"][name], new["queries"][name]
        if not o:
            continue
        raw = n / o
        norm = raw / epoch
        flag = ""
        if norm > threshold:
            flag = "REGRESSION"
        elif norm < 1.0 / threshold:
            flag = "WIN"
        rows.append((name, o, n, raw, norm, flag))
    return rows, epoch


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    args = ap.parse_args()
    old, new = load_record(args.old), load_record(args.new)
    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: different scale factors ({old.get('sf')} vs "
            f"{new.get('sf')}) — ratios are not comparable",
            file=sys.stderr,
        )
    rows, epoch = compare(old, new, args.threshold)
    print(f"# epoch factor (new/old host speed): {epoch:.4f} — norm = raw / factor")
    width = max((len(r[0]) for r in rows), default=4)
    regressions = 0
    for name, o, n, raw, norm, flag in sorted(rows, key=lambda r: -r[4]):
        print(f"{name:<{width}}  {o:8.3f}  {n:8.3f}  {raw:6.3f}  {norm:6.3f}  {flag}")
        regressions += flag == "REGRESSION"
    missing_old = sorted(set(new["queries"]) - set(old["queries"]))
    missing_new = sorted(set(old["queries"]) - set(new["queries"]))
    if missing_old:
        print(f"# only in NEW: {', '.join(missing_old)}")
    if missing_new:
        print(f"# only in OLD: {', '.join(missing_new)}")
    print(
        f"# {len(rows)} shared queries; total {old['value']:.2f} -> "
        f"{new['value']:.2f} s; {regressions} flagged"
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
