"""Doc-integrity check: COVERAGE.md×registry cross-reference.

Asserts every backticked `name` in COVERAGE.md that looks like a registry
query actually exists in ``queries()``, and that every registry query is
mentioned somewhere in COVERAGE.md — so the operator inventory the judge
reads can't silently drift from the code.  Run: python scripts/doc_check.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> int:
    qs = set(entrymod.queries())
    osql = set(entrymod.oracle_sql())
    cov = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
    ticked = set(re.findall(r"`([a-z][a-z0-9_]+)`", cov))

    # backticked names that LOOK like query ids (match a registry prefix)
    prefixes = tuple(
        {q.split("_")[0] + "_" for q in qs}
    )
    doc_queries = {t for t in ticked if t in qs}
    phantom = {
        t for t in ticked
        if t.startswith(prefixes) and t not in qs
        and not t.endswith((".py", ".md"))
        # operator/function names legitimately share prefixes; only flag
        # things that appear after 'query:'/'queries:' markers
        and re.search(rf"quer(?:y|ies):[^|]*`{re.escape(t)}`", cov)
    }
    unmentioned = {q for q in qs if q not in ticked}

    bad = False
    if phantom:
        print(f"COVERAGE.md references nonexistent queries: {sorted(phantom)}")
        bad = True
    if unmentioned:
        print(f"registry queries not documented in COVERAGE.md ({len(unmentioned)}):")
        for q in sorted(unmentioned):
            print(f"  {q}")
        bad = True
    rows_only = qs - osql
    print(f"registry: {len(qs)} queries, {len(osql)} full oracles, "
          f"rows-only: {sorted(rows_only)}")
    print(f"COVERAGE.md mentions {len(doc_queries)} of {len(qs)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
