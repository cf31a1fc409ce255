"""Column-lineage report: for every registry query, which BASE TABLES and
which of their COLUMNS the physical plan actually reads — extracted from
the FileScan/ReadSchema entries — written to LINEAGE.md.

Two things this buys:

* GOVERNANCE: a mechanical "what feeds what" map (which queries touch
  `text`, which would break if `props` changed type, what is affected by
  a PII column's deletion) without instrumenting anything.
* PRUNING PROOF at repo scale: per-table column heat shows that queries
  read only the columns they project — a scan pulling all columns for a
  2-column aggregate would stand out as a full-width row here.

Usage: python tools/lineage_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arangodb_java_parquet_spark.queries import QUERIES  # noqa: E402
from arangodb_java_parquet_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_SCAN_RE = re.compile(
    r"FileScan parquet \[(?P<cols>[^\]]*)\].*?"
    r"Location: [^\[]*\[(?P<loc>[^\]]*)\]", re.DOTALL)


def _norm_cols(cols: str) -> list[str]:
    # "l_orderkey#12L,l_extendedprice#15" -> base names, exprIds stripped
    out = []
    for c in cols.split(","):
        c = c.strip()
        if not c:
            continue
        out.append(re.sub(r"#\d+[A-Za-z]*$", "", c))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="lineage-report")

    per_query: dict[str, dict[str, set]] = {}
    table_heat: dict[str, dict[str, int]] = defaultdict(
        lambda: defaultdict(int))
    errors = []
    # ALL registry entries (registration order), not just the bench subset
    for name in QUERIES:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't die
            errors.append((name, str(e)[:60]))
            continue
        reads: dict[str, set] = defaultdict(set)
        for m in _SCAN_RE.finditer(plan):
            loc = m.group("loc")
            tbl = next((t for t in TABLES
                        if f"/{t}.parquet" in loc), None)
            if tbl is None:
                continue  # model-store / scratch artifacts: not base lineage
            for c in _norm_cols(m.group("cols")):
                reads[tbl].add(c)
        per_query[name] = reads
        for tbl, cols in reads.items():
            for c in cols:
                table_heat[tbl][c] += 1

    lines = [
        "# LINEAGE (all registry queries, sf0.01 plans)",
        "",
        "Base-table columns each query's physical plan READS (FileScan",
        "projections — i.e. after Catalyst column pruning). Model-store /",
        "scratch artifact scans are excluded; only driver base tables",
        "count as lineage.",
        "",
        "## Column heat per base table",
        "",
        "How many bench queries read each column — the repo-wide pruning",
        "evidence (unread columns stay unread; no query drags full rows).",
        "",
    ]
    for tbl in TABLES:
        if tbl not in table_heat:
            continue
        cols = sorted(table_heat[tbl].items(),
                      key=lambda kv: (-kv[1], kv[0]))
        lines.append(f"- **{tbl}**: " + ", ".join(
            f"{c}×{n}" for c, n in cols))
    lines += ["", "## Per-query reads", "",
              "| query | reads |", "|---|---|"]
    for name in sorted(per_query):
        reads = per_query[name]
        desc = "; ".join(
            f"{tbl}({', '.join(sorted(cols))})"
            for tbl, cols in sorted(reads.items())) or "(no base scan)"
        lines.append(f"| {name} | {desc} |")
    if errors:
        lines += ["", "## Errors", ""]
        lines += [f"- {n}: {e}" for n, e in errors]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "LINEAGE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    n_q = len(per_query)
    print(f"wrote LINEAGE.md ({n_q} queries, {len(errors)} errors)")


if __name__ == "__main__":
    sys.exit(main() or 0)
