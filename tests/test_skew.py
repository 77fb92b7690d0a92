"""salted_join semantics: identical rows to the plain join, salt never leaks."""

import pytest
from pyspark.sql import Row

from eurostat_energy_etl_pipeline_spark.functions.skew import salted_join


@pytest.fixture(scope="module")
def tables(spark):
    # skewed fact: one hot key (90% of rows) + tail
    fact = spark.createDataFrame(
        [Row(k="HOT" if i % 10 else f"k{i}", v=i) for i in range(1000)]
    )
    dim = spark.createDataFrame(
        [Row(k="HOT", name="hot"), Row(k="k10", name="ten"), Row(k="zzz", name="none")]
    )
    return fact, dim


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(tables):
    fact, dim = tables
    plain = fact.join(dim, ["k"], "inner")
    salted = salted_join(fact, dim, ["k"], "inner", buckets=8)
    assert _sorted(salted) == _sorted(plain)
    assert "__salt" not in salted.columns


def test_left_matches_plain_join(tables):
    fact, dim = tables
    plain = fact.join(dim, ["k"], "left")
    salted = salted_join(fact, dim, ["k"], "left", buckets=8)
    assert _sorted(salted) == _sorted(plain)


def test_unsupported_how_raises(tables):
    fact, dim = tables
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], "full")
