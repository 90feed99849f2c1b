"""Driver-contract smoke tests: entry() + queries()/oracle_sql() shape."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_sample_query_runs_at_sf0001(spark, sf_dir):
    qs = entrymod.queries()
    df = qs["tpch_q1"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_coverage_doc_query_names_exist(spark):
    """Every `query: name` claim in COVERAGE.md must be a real queries()
    entry (docs can't drift from the contract)."""
    import os
    import re

    qs = set(entrymod.queries())
    doc = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "COVERAGE.md")
    ).read()
    claimed = set(re.findall(r"query: `([a-z0-9_]+)`", doc))
    missing = claimed - qs
    assert not missing, f"COVERAGE.md references unknown queries: {sorted(missing)}"


def test_bench_headline_names_exist(spark):
    from bench import HEADLINE

    qs = set(entrymod.queries()) | {"flagship_events_hourly"}
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, missing
