"""The primary correctness gate, run locally at sf0.001: every declared
query with an oracle is executed on Spark and DuckDB and value-compared
(SURVEY.md §5.2.1). This mirrors the driver's t2 harness."""

import pytest

import __spark_entry__ as entry_mod
from tests.harness import compare, duckdb_conn

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    odf = con.execute(ORACLE[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
