"""Int8 quantization invariants: dtype/bounds, round-trip error bound
(half a quantization step), zero-vector contract, and scale formula."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.quantize import (
    quantize_embeddings,
    reconstruction_error,
)

VECS = [
    (0, [0.5, -1.0, 0.25, 0.125]),
    (1, [3.0, 0.0, -1.5, 2.25]),
    (2, [0.0, 0.0, 0.0, 0.0]),  # unrepresentable: all-zero
    (3, [1e-4, -2e-4, 5e-5, 0.0]),  # tiny magnitudes still scale to 127
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in VECS]
    )


def test_dtype_and_bounds(spark, emb):
    q = quantize_embeddings(emb)
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    rows = {r["id"]: r for r in q.collect()}
    for i in (0, 1, 3):
        assert all(-127 <= v <= 127 for v in rows[i]["qvec"])
        # the max-|x| slot maps to exactly +/-127
        assert max(abs(v) for v in rows[i]["qvec"]) == 127


def test_zero_vector_is_null(spark, emb):
    r = {x["id"]: x for x in quantize_embeddings(emb).collect()}
    assert r[2]["scale"] is None and r[2]["qvec"] is None


def test_scale_formula(spark, emb):
    r = {x["id"]: x for x in quantize_embeddings(emb).collect()}
    assert r[0]["scale"] == pytest.approx(127.0 / 1.0)
    assert r[1]["scale"] == pytest.approx(127.0 / 3.0)


def test_roundtrip_error_within_half_step(spark, emb):
    """|x - q/scale| <= 0.5/scale for every element, so the audited max
    reconstruction error is bounded by half a quantization step."""
    emax = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double")))
    )
    scale = F.lit(127.0) / emax
    checked = (
        emb.where(emax > 0)
        .select(
            "vec_id",
            reconstruction_error(F.col("embedding"), scale).alias("err"),
            (F.lit(0.5) / scale).alias("bound"),
        )
        .collect()
    )
    assert len(checked) == 3
    for r in checked:
        assert r["err"] <= r["bound"] + 1e-12


def test_fixture_embeddings_quantize_cleanly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_embeddings(emb)
    n = emb.count()
    assert q.where(F.col("qvec").isNotNull()).count() == n
    flat = q.select(F.explode("qvec").alias("v")).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    assert -127 <= flat["lo"] and flat["hi"] <= 127
