"""Merge two back-to-back quiet-host bench runs into the committed round
map by taking the PER-ENTRY MINIMUM (VERDICT r11 #7): single-run entries
carry up to ~3x ambient noise (JIT interplay, page-cache churn), so the
per-entry min across two runs is a less noisy estimate of the engine's
steady state than either whole run — and strictly less noisy than
picking one run wholesale.

Usage: python tools/bench_minmerge.py RUN1 RUN2 [-o OUT]

RUN1/RUN2 are bench.py stdout files (first line = the full JSON record
with "queries"). The merged record keeps the union schema of run 1 and
adds "merge": "per-entry min of two runs" provenance.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().splitlines()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run1")
    ap.add_argument("run2")
    ap.add_argument("-o", "--out", default="BENCH_FULL_latest.json")
    args = ap.parse_args()
    r1, r2 = load(args.run1), load(args.run2)
    q1, q2 = r1["queries"], r2["queries"]
    if set(q1) != set(q2):
        raise SystemExit(f"entry sets differ: {set(q1) ^ set(q2)}")
    merged = {k: min(q1[k], q2[k]) for k in q1}
    out = dict(r1)
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    out["merge"] = "per-entry min of two back-to-back quiet-host runs"
    out["run_totals"] = [r1["value"], r2["value"]]
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {out['value']}s over {len(merged)} entries "
          f"(runs: {r1['value']}s / {r2['value']}s)")


if __name__ == "__main__":
    main()
