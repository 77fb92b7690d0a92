"""Bucketed-layout gate: a same-bucketed fact-fact equi-join must plan with
ZERO Exchange nodes — the co-located join path that replaces the dominant
shuffle of a 100 TB join (SCALE.md §fact-table layout)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.catalog import load_tables
from eurostat_energy_etl_pipeline_spark.etl.bucketing import bucketed_join, write_bucketed


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    write_bucketed(
        t["orders"].select("o_orderkey", "o_totalprice"),
        "bt_orders", "o_orderkey", 8,
    )
    write_bucketed(
        t["lineitem"]
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "bt_lineitem", "o_orderkey", 8,
    )
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Force the shuffle-join path (at test SF the small side would
    # broadcast, which hides the property under test): with matching
    # bucket specs the SortMergeJoin must read co-located buckets —
    # zero Exchange on either side.
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_rows_match_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    t = load_tables(spark, sf_dir)
    expected = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .count()
    )
    assert bucketed_join(spark, left, right, "o_orderkey").count() == expected


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # A group-by on the bucket key is pre-partitioned by the layout:
    # the aggregate runs in one stage, no Exchange.
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert "Exchange" not in plan_of(agg)
