"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations


import pytest


from check import compare, duck_connect  # noqa: E402

from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


QUERIES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = all_queries()[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke: plan executes
        return
    odf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
