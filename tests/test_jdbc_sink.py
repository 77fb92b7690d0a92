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


def test_jdbc_merge_refused(spark, derby_url):
    from tests.test_etl_modes import _batch

    with pytest.raises(NotImplementedError, match="staging"):
        write_warehouse_jdbc(stamp(clean(_batch(spark))), derby_url, "merge")


def test_jdbc_invalid_mode_rejected(spark):
    from tests.test_etl_modes import _batch

    with pytest.raises(ValueError, match="mode"):
        write_warehouse_jdbc(_batch(spark), "jdbc:derby:memory:x", "replace")
