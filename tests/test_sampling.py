"""Deterministic sampling operators: the properties that make them usable
for reproducible dataset releases — partitioning-invariance, monotone
rates, salt independence, exact per-stratum caps with a stable kept-set."""

import pyspark.sql.functions as F

from eurostat_energy_etl_pipeline_spark.catalog import load_tables
from eurostat_energy_etl_pipeline_spark.operators.sampling import (
    hash_sample,
    sample_threshold,
    stratified_cap,
)


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_threshold_encoding():
    assert sample_threshold(0.2) == "3333"
    assert sample_threshold(1.0) == "ffff"
    assert sample_threshold(1 / 65536) == "0001"


def test_sample_is_partitioning_invariant(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = _ids(hash_sample(docs, "text", 0.3))
    b = _ids(hash_sample(docs.repartition(13, "lang"), "text", 0.3))
    assert a == b and a


def test_sample_rate_is_monotone(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    small = _ids(hash_sample(docs, "text", 0.1))
    big = _ids(hash_sample(docs, "text", 0.4))
    assert small < big  # strict subset: more rate only adds documents


def test_salt_draws_a_different_sample(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = _ids(hash_sample(docs, "text", 0.3))
    b = _ids(hash_sample(docs, "text", 0.3, salt="v2"))
    assert a != b
    # independent draws at rate .3 overlap ~.09 of corpus, not ~.3
    n = docs.count()
    assert len(a & b) < 0.2 * n


def test_sample_rate_is_approximately_honored(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    n = docs.count()
    k = hash_sample(docs, "text", 0.5).count()
    assert abs(k / n - 0.5) < 0.1


def test_stratified_cap_exact_and_stable(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    capped = stratified_cap(docs, "lang", "doc_id", cap=10)
    per = {r["lang"]: r["n"] for r in capped.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per and all(v <= 10 for v in per.values())
    # stable under repartitioning
    again = stratified_cap(docs.repartition(7), "lang", "doc_id", cap=10)
    assert _ids(capped) == _ids(again)


def test_stratified_cap_keeps_small_strata_whole(spark):
    df = spark.createDataFrame(
        [(i, "x" if i < 3 else "y") for i in range(20)], ["doc_id", "lang"]
    )
    out = stratified_cap(df, "lang", "doc_id", cap=5)
    got = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["lang"]] += 1
    assert got == {"x": 3, "y": 5}


def test_hash_split_partitioning_invariant(spark, sf_dir):
    from eurostat_energy_etl_pipeline_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = hash_split(docs, "text").select("doc_id", "split").toPandas()
    b = (
        hash_split(docs.repartition(13), "text")
        .select("doc_id", "split")
        .toPandas()
    )
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True)
    )
    counts = a["split"].value_counts(normalize=True)
    assert 0.7 < counts.get("train", 0) < 0.9  # ~80/10/10 at this SF


def test_hash_split_growing_train_keeps_members(spark, sf_dir):
    """Nested intervals: every row that was 'train' at 70% is 'train' at
    85%, and no former test row enters train when test shrinks."""
    from eurostat_energy_etl_pipeline_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = hash_split(docs, "text", (0.7, 0.15, 0.15)).select("doc_id", "split")
    big = hash_split(docs, "text", (0.85, 0.1, 0.05)).select("doc_id", "split")
    j = (
        small.withColumnRenamed("split", "s_small")
        .join(big.withColumnRenamed("split", "s_big"), "doc_id")
        .toPandas()
    )
    was_train = j[j["s_small"] == "train"]
    assert (was_train["s_big"] == "train").all()
    now_train = j[j["s_big"] == "train"]
    assert (now_train["s_small"] != "test").all()  # no test->train leakage


def test_hash_split_rejects_bad_fractions(spark):
    import pytest as _pytest

    from eurostat_energy_etl_pipeline_spark.operators.sampling import hash_split

    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with _pytest.raises(ValueError):
        hash_split(df, "k", (0.5, 0.2, 0.2))


def test_mixture_sample_allocations_and_determinism(spark, sf_dir):
    """mixture_sample: per-stratum kept counts equal the temperature-scaled
    allocation, and the drawn set is identical after a repartition."""
    import math

    from eurostat_energy_etl_pipeline_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    denom = sum(n**0.7 for n in counts.values())
    expect_alloc = {lang: math.floor(n**0.7 / denom * 100) for lang, n in counts.items()}

    got = mixture_sample(docs, "lang", "doc_id", budget=100)
    got_counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got_counts == {k: v for k, v in expect_alloc.items() if v > 0}

    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    reparted = mixture_sample(docs.repartition(7), "lang", "doc_id", budget=100)
    assert sorted(r["doc_id"] for r in reparted.select("doc_id").collect()) == ids


class TestWeightedSample:
    def test_matches_reference_formula_and_is_layout_invariant(self, spark):
        """A-ES keys replayed in pure Python must pick the same top-k, and
        the draw must be identical under a different partitioning (the
        hash_sample reproducibility contract extended to weighted draws)."""
        import hashlib
        import math

        from pyspark.sql import functions as F

        from eurostat_energy_etl_pipeline_spark.operators.sampling import (
            weighted_sample_topk,
        )

        rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
        df = spark.createDataFrame(rows, "id LONG, w LONG")

        def ref_key(i, w):
            u = (int(hashlib.md5(f"{i}wsamp".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
            return math.floor(math.log(u) / w * 1e9 + 0.5) / 1e9

        want = sorted(((ref_key(i, w), i) for i, w in rows), key=lambda t: (-t[0], t[1]))[:25]
        got = [
            (r["samp_key"], r["id"])
            for r in weighted_sample_topk(df, "id", "w", k=25).collect()
        ]
        assert got == want
        got13 = [
            (r["samp_key"], r["id"])
            for r in weighted_sample_topk(
                df.repartition(13), "id", "w", k=25
            ).collect()
        ]
        assert got13 == want

    def test_weights_bias_inclusion(self, spark):
        """Heavier rows must be sampled disproportionately: with weights
        1 vs 100 split half/half, the heavy half should dominate the
        sample (A-ES inclusion probability rises with weight)."""
        from eurostat_energy_etl_pipeline_spark.operators.sampling import (
            weighted_sample_topk,
        )

        rows = [(i, 100 if i < 500 else 1) for i in range(1000)]
        df = spark.createDataFrame(rows, "id LONG, w LONG")
        got = weighted_sample_topk(df, "id", "w", k=50).collect()
        heavy = sum(1 for r in got if r["id"] < 500)
        assert heavy >= 45, heavy
