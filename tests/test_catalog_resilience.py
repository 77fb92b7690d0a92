"""Harness-robustness guarantees for the table catalog (VERDICT r1 items 1-3).

The driver's correctness harness passes its OWN plain SparkSession into
`queries()`; round 1 died because the fixture-required confs lived only in
`session.get_spark`. These tests pin the runtime-side hardening:

1. `ensure_session_confs` repairs a session whose confs are wrong/absent.
2. Table resolution is lazy + per-table: one unreadable file fails only the
   queries that touch it, with an error naming the table.
3. Fixture-schema landmines (TIMESTAMP(NANOS) in events.ts) are normalized
   to the documented dtype at read time.
"""

import os
import shutil

import pytest

from eurostat_energy_etl_pipeline_spark.catalog import (
    TABLES,
    TableCatalog,
    ensure_session_confs,
    load_tables,
)


def test_ensure_session_confs_repairs_foreign_session(spark):
    # Simulate the driver's plain session: deliberately wrong values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    ensure_session_confs(spark)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # Cached-view consumers must not inherit the cache's pre-coalesce
    # partition count (the 4x insights-chain regression; see BENCHNOTES.md).
    assert (
        spark.conf.get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
        == "true"
    )


def test_ensure_session_confs_respects_user_tuned_shuffle_partitions(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        ensure_session_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        # The global default 200 is treated as "untuned" and right-sized.
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        ensure_session_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_load_tables_is_called_through_queries_on_plain_confs(spark, sf_dir):
    # load_tables itself must harden the session (queries call nothing else).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    t = load_tables(spark, sf_dir)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert dict(t["events"].dtypes)["ts"] == "timestamp"


def test_one_bad_table_does_not_poison_the_rest(spark, sf_dir, tmp_path):
    scratch = tmp_path / "sf"
    scratch.mkdir()
    for name in TABLES:
        src = f"{sf_dir}/{name}.parquet"
        dst = scratch / f"{name}.parquet"
        if name == "events":
            dst.write_bytes(b"not a parquet file")  # corrupted
        else:
            os.symlink(src, dst)
    cat = TableCatalog(spark, str(scratch))
    # Healthy tables resolve and run fine.
    assert cat["orders"].limit(1).count() in (0, 1)
    assert cat["region"].count() > 0
    # The broken one raises an error naming the table, not a generic blowup.
    with pytest.raises(RuntimeError, match="table 'events'"):
        cat["events"]


def test_missing_table_fails_only_itself(spark, sf_dir, tmp_path):
    scratch = tmp_path / "sf"
    scratch.mkdir()
    for name in TABLES:
        if name == "documents":
            continue  # absent entirely
        os.symlink(f"{sf_dir}/{name}.parquet", scratch / f"{name}.parquet")
    cat = TableCatalog(spark, str(scratch))
    assert cat["lineitem"].limit(1).count() in (0, 1)
    with pytest.raises(RuntimeError, match="table 'documents'"):
        cat["documents"]


def test_unknown_table_name_is_a_keyerror(spark, sf_dir):
    with pytest.raises(KeyError):
        load_tables(spark, sf_dir)["no_such_table"]


def test_nanos_fixture_normalized_through_catalog(spark, sf_dir):
    # events.parquet stores TIMESTAMP(NANOS); the catalog must deliver a
    # microsecond timestamp column regardless of which session reads it.
    ev = load_tables(spark, sf_dir)["events"]
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.limit(5).count() >= 0


def test_catalog_supports_mapping_protocol(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    assert set(iter(t)) == set(TABLES)
    assert len(t) == len(TABLES)
    assert "orders" in t
    assert dict(t.items()).keys() == set(TABLES)
