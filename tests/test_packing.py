"""pack_sequences: greedy per-shard fill semantics (hand-computed case),
determinism under repartitioning, bin monotonicity, and the documented
overflow bound (a bin exceeds the budget by at most one document)."""

import pyspark.sql.functions as F
import pytest

from eurostat_energy_etl_pipeline_spark.operators.packing import pack_sequences


def _pack(spark, rows, budget=10):
    df = spark.createDataFrame(rows, ["doc_id", "shard", "nt"])
    out = pack_sequences(df, F.col("nt"), budget, "shard", "doc_id")
    return {(r["shard"], r["doc_id"]): r["bin_id"] for r in out.collect()}


def test_hand_computed_fill(spark):
    # shard a: tokens 4,4,4 -> cumsums before: 0,4,8 -> bins 0,0,0 (8<10);
    # next doc at prev=12 -> bin 1. shard b independent.
    rows = [(1, "a", 4), (2, "a", 4), (3, "a", 4), (4, "a", 5), (5, "b", 25), (6, "b", 1)]
    got = _pack(spark, rows)
    assert got == {
        ("a", 1): 0, ("a", 2): 0, ("a", 3): 0,  # prev 0,4,8
        ("a", 4): 1,                              # prev 12
        ("b", 5): 0,                              # prev 0 (oversized doc)
        ("b", 6): 2,                              # prev 25 -> bin 2
    }


def test_empty_and_zero_token_docs(spark):
    rows = [(1, "a", 0), (2, "a", 0), (3, "a", 7)]
    got = _pack(spark, rows)
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 0}


def test_partitioning_invariance(spark):
    rows = [(i, f"s{i % 3}", (i * 7) % 13) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "nt"])
    a = pack_sequences(df, F.col("nt"), 17, "shard", "doc_id").collect()
    b = pack_sequences(df.repartition(11), F.col("nt"), 17, "shard", "doc_id").collect()
    key = lambda r: (r["shard"], r["doc_id"], r["bin_id"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_bins_are_monotone_in_doc_order(spark):
    rows = [(i, "a", 3) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "nt"])
    out = pack_sequences(df, F.col("nt"), 10, "shard", "doc_id").orderBy("doc_id")
    bins = [r["bin_id"] for r in out.collect()]
    assert bins == sorted(bins) and bins[0] == 0


def test_overflow_bounded_by_one_document(spark, sf_dir):
    from eurostat_energy_etl_pipeline_spark.catalog import load_tables
    from eurostat_energy_etl_pipeline_spark.operators.text import token_count

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", token_count(F.col("text")).alias("nt")
    )
    packed = pack_sequences(docs, F.col("nt"), 2048, "lang", "doc_id")
    stats = (
        packed.groupBy("lang", "bin_id")
        .agg(F.sum("nt").alias("tok"))
        .agg(F.max("tok").alias("worst"))
        .first()
    )
    max_doc = docs.agg(F.max("nt")).first()[0]
    assert stats["worst"] < 2048 + max_doc


def test_invalid_budget_rejected(spark):
    df = spark.createDataFrame([(1, "a", 5)], ["doc_id", "shard", "nt"])
    with pytest.raises(ValueError):
        pack_sequences(df, F.col("nt"), 0, "shard", "doc_id")
