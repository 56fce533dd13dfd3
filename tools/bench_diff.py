#!/usr/bin/env python
"""Round-over-round bench comparison, CANARY-NORMALIZED (VERDICT r12
item 1b operationalized): compare two bench artifacts and separate
environmental drift from real regressions.

Accepts either artifact shape:
  - a complete ``BENCH_LOCAL_rNN.json`` payload (bench.py writes one
    per run since round 13), or
  - a driver ``BENCH_rNN.json`` record, whose ``tail`` field holds
    the truncated last 2000 chars of bench stdout — per-query pairs
    are recovered by regex from whatever survived the cut.

When BOTH artifacts carry ``calibration_jvm_canary`` (a fixed
pure-JVM query measured first by bench.py), every ratio is divided
by the canary ratio before flagging: a machine that ran uniformly
1.3x hot shows canary 1.3x and normalized fleet ~1.0x — the round-12
situation (driver artifact median 1.27x over an unchanged fleet)
reads as environment, not regression.

Usage:
  python tools/bench_diff.py BENCH_LOCAL_r12.json BENCH_LOCAL_r13.json
  python tools/bench_diff.py BENCH_r12.json BENCH_LOCAL_r13.json --threshold 1.3
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import sys

CANARY = "calibration_jvm_canary"
# ignore sub-floor rows: below ~2x the Spark job-scheduling floor the
# ratio is pure noise (BASELINE.md documents +-25-35% session jitter)
MIN_SECONDS = 0.02


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc and isinstance(doc["queries"], dict):
        return {k: float(v) for k, v in doc["queries"].items()}
    if "tail" in doc:  # driver artifact: recover pairs from the tail
        pairs = re.findall(r'\\?"([a-z0-9_]+)\\?":\s*([0-9.]+)', doc["tail"])
        # the tail also carries payload scalars ("value", "sf", ...);
        # treating them as query rows polluted the shared-row set and
        # the median (ADVICE r13)
        scalars = {"value", "sf", "pid", "shuffle_partitions"}
        return {k: float(v) for k, v in pairs if k not in scalars}
    raise SystemExit(f"{path}: neither a bench payload nor a driver artifact")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag normalized ratios above this (default 1.3)")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    shared = [k for k in new if k in old and k != CANARY
              and old[k] >= MIN_SECONDS and new[k] >= MIN_SECONDS]
    if not shared:
        raise SystemExit("no shared rows above the timing floor")

    canary_ratio = None
    if CANARY in old and CANARY in new and old[CANARY] > 0:
        canary_ratio = new[CANARY] / old[CANARY]

    rows = []
    for k in shared:
        raw = new[k] / old[k]
        rows.append((raw / canary_ratio if canary_ratio else raw, raw, k))
    rows.sort(reverse=True)

    norm_note = (
        f"canary {old[CANARY]:.3f}s -> {new[CANARY]:.3f}s ({canary_ratio:.2f}x); "
        "ratios below are canary-normalized"
        if canary_ratio
        else "NO canary in one or both artifacts; ratios are RAW "
        "(environmental drift not separable — pre-r13 artifact?)"
    )
    med = statistics.median(r[0] for r in rows)
    flagged = [r for r in rows if r[0] > args.threshold]
    print(f"{len(rows)} shared rows | median {med:.3f}x | {norm_note}")
    print(f"{len(flagged)} rows above {args.threshold}x:")
    for norm, raw, k in flagged:
        print(f"  {k}: {old[k]:.3f}s -> {new[k]:.3f}s "
              f"(raw {raw:.2f}x, normalized {norm:.2f}x)")
    sys.exit(0 if not flagged else 1)


if __name__ == "__main__":
    main()
