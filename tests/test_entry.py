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
