"""Training-shard export invariants: exact shard sizes, deterministic
partitioning-invariant membership, manifest/shard agreement, checksum
tamper detection."""

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.etl.export import (
    export_training_shards,
    verify_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shard_sizes_exact(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "run")
    manifest = export_training_shards(docs, out, docs_per_shard=64).toPandas()
    n = docs.count()
    full, tail = divmod(n, 64)
    assert list(manifest["n_docs"])[:full] == [64] * full
    if tail:
        assert list(manifest["n_docs"])[-1] == tail
    # rank spans tile the corpus with no gaps or overlaps
    assert list(manifest["rank_lo"]) == [i * 64 + 1 for i in range(len(manifest))]
    assert int(manifest["rank_hi"].iloc[-1]) == n


def test_membership_is_partitioning_invariant(spark, docs, tmp_path_factory):
    a = str(tmp_path_factory.mktemp("exp") / "a")
    b = str(tmp_path_factory.mktemp("exp") / "b")
    export_training_shards(docs, a, docs_per_shard=64)
    export_training_shards(docs.repartition(7), b, docs_per_shard=64)
    sa = (
        spark.read.parquet(f"{a}/shards")
        .select("doc_id", "shard_id")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    sb = (
        spark.read.parquet(f"{b}/shards")
        .select("doc_id", "shard_id")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert sa.equals(sb)


def test_verify_shards_empty_on_clean_export(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "run")
    export_training_shards(docs, out, docs_per_shard=100)
    assert verify_shards(spark, out).count() == 0


def test_verify_shards_custom_text_col(spark, docs, tmp_path_factory):
    """verify_shards must mirror a non-default text_col: the checksum is
    recomputed over the column the export hashed, so a renamed-column
    export verifies clean instead of failing on a missing 'text'."""
    out = str(tmp_path_factory.mktemp("exp") / "run")
    renamed = docs.withColumnRenamed("text", "content")
    export_training_shards(renamed, out, docs_per_shard=100, text_col="content")
    assert verify_shards(spark, out, text_col="content").count() == 0


def test_verify_shards_catches_tampering(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp") / "run")
    export_training_shards(docs, out, docs_per_shard=100)
    # Corrupt the manifest's checksum for one shard.
    m = spark.read.parquet(f"{out}/manifest")
    bad = m.withColumn(
        "checksum",
        F.when(F.col("shard_id") == 0, F.col("checksum") + 1).otherwise(
            F.col("checksum")
        ),
    )
    bad.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{out}/manifest"
    )
    broken = verify_shards(spark, out).toPandas()
    assert list(broken["shard_id"]) == [0]
