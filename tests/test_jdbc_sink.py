"""JDBC warehouse sink (K1-K3 parity with /root/reference/etl/main.py:167-207).

The reference's actual load target is a JDBC database (Postgres) with
per-mode DDL; `write_warehouse_jdbc` maps those modes onto Spark's JDBC
writer. Exercised end-to-end against the Derby embedded driver that ships
with Spark (same writer code path as Postgres — only the dialect differs);
skipped if no driver is on the classpath.
"""

import pytest

from eurostat_energy_etl_pipeline_spark.etl.job import clean, stamp, write_warehouse_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no Derby JDBC driver on the classpath")
    return f"jdbc:derby:{tmp_path}/wh;create=true"


def _read(spark, url, table="observations"):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_mode_matrix(spark, derby_url):
    from tests.test_etl_modes import _batch

    out = stamp(clean(_batch(spark)))
    opts = {"driver": DERBY_DRIVER}
    # full-refresh: drop + recreate (reference's DROP TABLE branch)
    write_warehouse_jdbc(out, derby_url, "full-refresh", options=opts)
    assert _read(spark, derby_url).count() == 5
    # append: insert on top (reference's CREATE IF NOT EXISTS + to_sql)
    write_warehouse_jdbc(out, derby_url, "append", options=opts)
    assert _read(spark, derby_url).count() == 10
    # truncate: empty the table but keep DDL (reference's TRUNCATE branch)
    write_warehouse_jdbc(out, derby_url, "truncate", options=opts)
    assert _read(spark, derby_url).count() == 5
    # round-trip values survive the dialect mapping
    got = {r["country_code"]: r["value"] for r in _read(spark, derby_url).collect()}
    assert got["C3"] == 3.0


def test_jdbc_merge_upserts(spark, derby_url):
    """merge = staging table + engine-side ANSI MERGE: matched natural keys
    take the batch's values, new keys insert, untouched rows survive, and
    the staging table is dropped afterwards."""
    from datetime import datetime

    from pyspark.sql import Row

    from tests.test_etl_modes import _batch

    opts = {"driver": DERBY_DRIVER}
    first = stamp(clean(_batch(spark)))
    # first merge: target absent -> degenerates to append (creates table)
    write_warehouse_jdbc(first, derby_url, "merge", options=opts)
    assert _read(spark, derby_url).count() == 5

    update = stamp(
        clean(
            spark.createDataFrame(
                [
                    Row(  # same natural key as C3 -> value replaced
                        dataset_code="nrg_cb_e",
                        country_code="C3",
                        country_name="Country 3",
                        indicator_code="GEP",
                        indicator_label="label",
                        unit_code="GWH",
                        unit_label="Gigawatt-hour",
                        time=datetime(2023, 1, 1).date(),
                        value=99.0,
                    ),
                    Row(  # new key -> inserted
                        dataset_code="nrg_cb_e",
                        country_code="C9",
                        country_name="Country 9",
                        indicator_code="GEP",
                        indicator_label="label",
                        unit_code="GWH",
                        unit_label="Gigawatt-hour",
                        time=datetime(2029, 1, 1).date(),
                        value=9.0,
                    ),
                ]
            )
        )
    )
    write_warehouse_jdbc(update, derby_url, "merge", options=opts)
    got = {r["country_code"]: r["value"] for r in _read(spark, derby_url).collect()}
    assert len(got) == 6
    assert got["C3"] == 99.0  # updated in place
    assert got["C9"] == 9.0  # inserted
    assert got["C1"] == 1.0  # untouched row survives
    # staging table cleaned up
    with pytest.raises(Exception):
        _read(spark, derby_url, "observations_staging").count()


def test_jdbc_invalid_mode_rejected(spark):
    from tests.test_etl_modes import _batch

    with pytest.raises(ValueError, match="mode"):
        write_warehouse_jdbc(_batch(spark), "jdbc:derby:memory:x", "replace")
