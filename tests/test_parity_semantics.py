"""Parity tests for the documented semantic footguns (SURVEY.md §4.2):
pandas min_periods rolling guard, stddev ddof=1, text feature columns,
trend/growth edge cases."""

import math

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eurostat_energy_etl_pipeline_spark.functions import (
    growth_pct,
    rolling_mean_min_periods,
    rolling_std_min_periods,
    trend_label,
)
from eurostat_energy_etl_pipeline_spark.operators import text as T


@pytest.fixture(scope="module")
def series(spark):
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    return (
        spark.createDataFrame(
            [Row(g="a", yr=2000 + i, v=v) for i, v in enumerate(vals)]
        ),
        pd.Series(vals),
    )


def test_rolling_mean_matches_pandas_min_periods(series):
    df, pds = series
    w = Window.partitionBy("g").orderBy("yr").rowsBetween(-2, 0)
    got = (
        df.select("yr", rolling_mean_min_periods("v", w).alias("m"))
        .orderBy("yr")
        .toPandas()["m"]
    )
    expect = pds.rolling(3, min_periods=3).mean()
    for g, e in zip(got, expect):
        assert (g is None or pd.isna(g)) == pd.isna(e)
        if not pd.isna(e):
            assert math.isclose(g, e)


def test_rolling_std_is_sample_std(series):
    df, pds = series
    w = Window.partitionBy("g").orderBy("yr").rowsBetween(-2, 0)
    got = (
        df.select("yr", rolling_std_min_periods("v", w).alias("s"))
        .orderBy("yr")
        .toPandas()["s"]
    )
    expect = pds.rolling(3, min_periods=3).std()  # pandas ddof=1
    for g, e in zip(got, expect):
        if not pd.isna(e):
            assert math.isclose(g, e)


def test_growth_pct_zero_start_is_null(spark):
    df = spark.createDataFrame([Row(s=0.0, e=5.0), Row(s=2.0, e=3.0)])
    out = df.select(growth_pct(F.col("s"), F.col("e")).alias("g")).collect()
    assert out[0]["g"] is None  # start=0 -> NULL (P11)
    assert math.isclose(out[1]["g"], 50.0)


def test_trend_label_threshold(spark):
    df = spark.createDataFrame(
        [Row(s=0.02), Row(s=-0.02), Row(s=0.005), Row(s=-0.005), Row(s=0.01)]
    )
    got = [r["t"] for r in df.select(trend_label(F.col("s")).alias("t")).collect()]
    # threshold is strict: exactly 0.01 is 'stable' (reference uses >)
    assert got == ["rising", "declining", "stable", "stable", "stable"]


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [Row(t=""), Row(t="   "), Row(t="one"), Row(t="a  b   c")]
    )
    got = [r["n"] for r in df.select(T.token_count(F.col("t")).alias("n")).collect()]
    assert got == [0, 0, 1, 3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog is in that house with food"),
            Row(t="der hund und die katze ist nicht ein problem mit"),
            Row(t="xyzzy plugh"),
        ]
    )
    got = [r["l"] for r in df.select(T.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "und"]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(T.quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] and stats["hi"] <= 1.0


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame([Row(t="a b c"), Row(t="c b a")])
    got = [r["h"] for r in df.select(T.rolling_hash(F.col("t")).alias("h")).collect()]
    assert got[0] != got[1]


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """q41 self-certifies: the HLL estimate (rsd=0.02) must land within 2%
    of the exact distinct count, and the exact count must be real."""
    import __spark_entry__ as m
    from pyspark.sql import functions as F

    got = m.queries()["q41_approx_distinct"](spark, sf_dir).first()
    exact = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.countDistinct("text"))
        .first()[0]
    )
    assert got["exact_distinct_texts"] == exact
    assert got["hll_within_2pct"] == 1


# --- cross-engine round-tie parity (round-3 q74 red cell) -------------------
#
# A yearly mean sum(DECIMAL(18,2))/count with count = 2^a*5^b lands exactly
# on a .xxxx5 decimal tie. Spark's round() (and its double->decimal cast)
# rounds the SHORTEST DECIMAL REPRESENTATION half-up, DuckDB's round() rounds
# the BINARY value — the two disagree whenever the nearest double sits on the
# other side of the tie (e.g. 190445.32875 -> Spark .3288, DuckDB .3287).
# portable_round uses only IEEE double ops (floor(x*10^n + 0.5)/10^n), which
# both engines evaluate bit-identically, so the pair can never diverge.

_TIE_VALUES = [
    248412.53625,   # binary sits above the printed tie
    190445.32875,   # binary sits below the printed tie (the round-3 q74 cell)
    195407.43625,
    300607.82125,
    217425.78125,   # exactly representable (13925/64): a TRUE binary tie
    -248412.53625,
]


def test_portable_round_matches_duckdb_on_ties(spark):
    import duckdb

    from eurostat_energy_etl_pipeline_spark.functions import (
        portable_round,
        portable_round_sql,
    )

    df = spark.createDataFrame([Row(x=v) for v in _TIE_VALUES])
    got = {
        r["x"]: r["p"]
        for r in df.select("x", portable_round("x", 4).alias("p")).collect()
    }
    con = duckdb.connect()
    for v in _TIE_VALUES:
        want = con.execute(
            f"SELECT {portable_round_sql('?', 4)}", [v]
        ).fetchone()[0]
        assert got[v] == want, (v, got[v], want)


def test_spark_round_does_diverge_on_ties(spark):
    """Documents WHY portable_round exists: at least one tie value flips
    between Spark round() and DuckDB round() — if this ever stops failing
    the engines changed and portable_round can be retired."""
    import duckdb

    df = spark.createDataFrame([Row(x=v) for v in _TIE_VALUES])
    got = {
        r["x"]: r["r"] for r in df.select("x", F.round("x", 4).alias("r")).collect()
    }
    con = duckdb.connect()
    duck = {v: con.execute("SELECT round(?, 4)", [v]).fetchone()[0] for v in _TIE_VALUES}
    assert any(got[v] != duck[v] for v in _TIE_VALUES)


def test_oracle_sql_uses_double_literals_in_floor_rounding():
    """Guard against reintroducing decimal literals in the floor-rounding
    idiom: Spark SQL parses `10000.0` as DECIMAL, so `bigint / 10000.0`
    replayed through spark.sql comes back as a decimal column and breaks
    the shared-dialect dtype contract (round-4 q06 regression). Exponent
    literals (`1e4`) are DOUBLE in both Spark and DuckDB."""
    import re

    import __spark_entry__ as entry_mod

    bad = {
        name: m.group(0)
        for name, sql in entry_mod.oracle_sql().items()
        if (m := re.search(r"\+\s*0\.5\s*\)\s*/\s*1\d*0\.0", sql))
    }
    assert not bad, f"decimal literals in floor-round oracles: {bad}"
