"""Oracle-SQL lint (VERDICT r13 #3): enumerate the two silent-divergence
classes that have each cost a debugging cycle, across EVERY registered
oracle and its paired Spark module source.

Class A — FIXED-RANGE LITERALS in oracle SQL: ``UNNEST(range(1, 2001))``
style position bounds silently TRUNCATE the oracle side when a
regenerated corpus (CLAUDE.md: the driver may regenerate /root/testdata
between rounds) grows longer documents, while the Spark side
(posexplode) keeps every row — rows/hash mismatch with no error.
Fixed r12 in diversity.py, r14 in relational2.py (LATERAL over the
per-row list length). Rule: any ``range(<lit>, <lit>)`` whose upper
bound is a 4+-digit literal must instead derive the bound from the data.

Class B — BIGINT OVERFLOW PRODUCTS: a product of group-size-scale
factors kept in BIGINT inside/around a SUM (``n * s2``,
``SUM(c * c * c)``) overflows ~10x past sf1 where DuckDB RAISES and
non-ANSI Spark silently WRAPS — the drift_cramer_von_mises /
stats_bartlett class, fixed r13 by multiplying in DOUBLE
(operands individually exact, IEEE product deterministic). Rule:
moment-product shapes must cast one operand to DOUBLE; cube-of-count
shapes must either do the same or carry a boundedness argument in
ALLOWED_B below.

Usage: python tools/oracle_lint.py   (exit 1 on unreviewed hits)
Wired into pytest via tests/test_oracle_lint.py.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Reviewed Class-B hits: exact BIGINT tie/occurrence-count cubes whose
# group cardinality is structurally bounded at the tested scale factors
# AND whose 100 TB deployment note is explicit here. Each entry maps
# (file basename, alias) -> boundedness rationale. Sum of cubes stays
# exact while sum(tt^3) < 2^63, i.e. largest tie group < ~2.1e6 rows.
ALLOWED_B = {
    ("evaluation2.py", "s3"):
        "k_occ = kNN in-degree occurrence counts, bounded by k * n_probe "
        "(hub cap), cubes ~1e3 at any corpus scale",
    ("evaluation3.py", "ties"):
        "c = per-(v,grp) tie-group size over the bounded eval-grid "
        "table, calendar/grid-bounded, not corpus-row-scale",
    ("forecast2.py", "ts"):
        "tt = tie-group sizes over the CALENDAR-bounded day series "
        "(~2.4k rows at any corpus scale)",
    ("stat_tests.py", "ts"):
        "tt = tie-group sizes over the calendar-bounded day series; "
        "at true row-scale inputs swap to the DOUBLE-product rule "
        "(drift_cramer_von_mises) before deploying",
}

QUERIES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "arangodb_java_parquet_spark", "queries")

RANGE_RE = re.compile(r"range\(\s*\d+\s*,\s*\d{4,}\s*\)")
# cube-or-higher self-product summed into BIGINT:
#   CAST(SUM(x * x * x ...) AS BIGINT) [AS alias]
CUBE_RE = re.compile(
    r"CAST\(SUM\(\s*(\w+)(?:\s*\*\s*\1){2,}[^)]*\)\s*AS\s+BIGINT\)"
    r"(?:\s*AS\s+(\w+))?", re.IGNORECASE)
# group-size x second-moment product with NEITHER operand cast to
# DOUBLE: `n * s2` / `s1 * s1` shapes (the Bartlett/Welch overflow
# class). A fixed site reads `n * CAST(s2 AS DOUBLE)`.
#
# NAMING-CONVENTION DEPENDENCY (ADVICE r14): this pattern only matches
# the repo's conventional moment aliases — counts named n/nt/cnt and
# second/fourth moments named s2/s4/ss/m2. A BIGINT moment product
# using ANY other alias (e.g. `k * sumsq`) silently escapes the lint;
# the convention is therefore part of the contract — name count columns
# n/nt/cnt and raw-moment sums s2/s4/ss/m2 in oracle SQL, or extend the
# alias classes here when a new convention is introduced. (The fixed
# shape `n * CAST(s2 AS DOUBLE)` already fails the core `\b(s2|…)\b`
# match because the token after `*` is `CAST`, so no lookahead is
# needed to exempt it.)
MOMENT_RE = re.compile(
    r"\b(n|nt|cnt)\s*\*\s*(s2|s4|ss|m2)\b")


def lint() -> list[str]:
    problems = []
    for fn in sorted(os.listdir(QUERIES_DIR)):
        if not fn.endswith(".py"):
            continue
        path = os.path.join(QUERIES_DIR, fn)
        src = open(path).read()
        for i, line in enumerate(src.split("\n"), 1):
            if line.strip().startswith(("--", "#")):
                continue  # comments (often describe the fixed rule)
            if RANGE_RE.search(line):
                problems.append(
                    f"{fn}:{i}: Class A fixed-range literal: {line.strip()}")
            m = CUBE_RE.search(line)
            if m:
                alias = m.group(2) or ""
                if (fn, alias) not in ALLOWED_B:
                    problems.append(
                        f"{fn}:{i}: Class B BIGINT cube-sum not in "
                        f"ALLOWED_B: {line.strip()}")
            m = MOMENT_RE.search(line)
            if m:
                # the fixed shape multiplies via CAST(x AS DOUBLE)
                seg = line[m.start():m.start() + 60]
                if "CAST" not in seg.upper():
                    problems.append(
                        f"{fn}:{i}: Class B BIGINT moment product "
                        f"(multiply in DOUBLE): {line.strip()}")
    return problems


def main() -> int:
    problems = lint()
    for p in problems:
        print(p)
    print(f"oracle_lint: {len(problems)} unreviewed hits "
          f"({len(ALLOWED_B)} reviewed Class-B allowlist entries)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
