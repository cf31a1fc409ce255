"""Wire tools/oracle_lint.py (VERDICT r13 #3) into the suite: the two
silent-divergence classes (fixed-range oracle literals, BIGINT overflow
products) must stay at zero unreviewed hits."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_oracle_lint_clean():
    from tools.oracle_lint import ALLOWED_B, lint
    problems = lint()
    assert not problems, "\n".join(problems)
    # the allowlist must not rot: every entry still matches a live line
    import re
    qdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "arangodb_java_parquet_spark",
        "queries")
    for (fn, alias), _why in ALLOWED_B.items():
        src = open(os.path.join(qdir, fn)).read()
        assert re.search(rf"AS BIGINT\)\s*AS\s+{alias}\b", src), (
            f"stale ALLOWED_B entry: {fn}/{alias}")
