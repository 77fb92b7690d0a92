"""Unit gates for the graph operators added beyond connected components:
`count_triangles` (degree-oriented census) against hand-computable graphs,
and the strict point-in-time attribution ordering trick (q106) on a
crafted micro-stream where the same-instant transition MUST NOT win.
The corpus-scale differential runs via test_oracle_differential."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.plans.graph import count_triangles


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["a", "b"]).astype("int64")
    )


def _census(spark, pairs):
    return count_triangles(_edges(spark, pairs)).collect()[0].asDict()


def test_triangle_census_k4(spark):
    # Complete graph on 4 nodes: C(4,3)=4 triangles; oriented wedge count
    # for K4 under any acyclic orientation is Σ C(d⁺,2) = C(3,2)+C(2,2)+0+0
    # ... orientation-dependent in general but K4's degree-tiebreak-by-id
    # orientation gives d⁺ = (3,2,1,0) ⇒ 3+1+0+0 = 4 wedges, all closing.
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _census(spark, k4)
    assert got == {"n_nodes": 4, "n_edges": 6, "n_wedges": 4, "n_triangles": 4}


def test_triangle_census_path_has_none(spark):
    # A path has wedges but zero triangles.
    got = _census(spark, [(1, 2), (2, 3), (3, 4)])
    assert got["n_triangles"] == 0
    assert got["n_wedges"] >= 1
    assert got["n_edges"] == 3


def test_triangle_census_star_hub_produces_no_wedges(spark):
    # Degree orientation points every spoke INTO the hub, so the hub owns
    # zero oriented out-pairs: the O(d²) naive hub blow-up is provably
    # absent (the scale property the operator exists for).
    star = [(10, i) for i in range(1, 8)]
    got = _census(spark, star)
    assert got == {"n_nodes": 8, "n_edges": 7, "n_wedges": 0, "n_triangles": 0}


def test_pit_attribution_same_instant_transition_excluded(spark):
    """The q106 ordering contract in isolation: a purchase at the exact ts
    of its own state transition must attribute to the PREVIOUS state, and
    a purchase with no earlier transition attributes to '(none)'."""
    from pyspark.sql.window import Window

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view at 12:00, purchase at 12:05 (purchase is itself a
        # transition at 12:05 — must NOT self-attribute).
        (1, 1, t0, "view"),
        (2, 1, t0 + datetime.timedelta(minutes=5), "purchase"),
        # user 2: purchase is the very first event -> '(none)'.
        (3, 2, t0, "purchase"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            "ts",
            F.lit(1).alias("kind"),
            "event_id",
            F.col("event_type").alias("state"),
            F.lit(None).cast("long").alias("pid"),
        )
    )
    probes = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("pid"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r["pid"]: r["prior_state"]
        for r in transitions.unionByName(probes)
        .withColumn("prior_state", F.last("state", ignorenulls=True).over(w2))
        .where(F.col("pid").isNotNull())
        .collect()
    }
    assert got == {2: "view", 3: None}


def test_enc_node_order_isomorphic_and_invertible(spark):
    """r15: the int64 node encoding must be STRICTLY order-isomorphic to
    the bytewise order of the 'c'||key / 's'||key strings (min/least/
    sort over encodings == over strings) and exactly invertible — the
    two properties the q99/q172/q189 relabeling stands on."""
    from eurostat_energy_etl_pipeline_spark.plans.graph import (
        _dec_node,
        _enc_node,
    )

    # adversarial key set: prefix pairs (1 vs 10), lex-vs-numeric flips
    # (19 vs 2 vs 21), max-ish widths, and equal-length runs
    keys = [1, 2, 9, 10, 11, 19, 20, 21, 99, 100, 101, 999, 1000,
            12345, 99999999, 10**10, 10**13, 10**14 - 1]
    rows = [(k, s) for k in keys for s in (0, 1)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "is_s"]).astype("int64")
    )
    got = df.select(
        F.concat(
            F.when(F.col("is_s") == 1, F.lit("s")).otherwise(F.lit("c")),
            F.col("k"),
        ).alias("label"),
        F.when(F.col("is_s") == 1, _enc_node("k", is_supplier=True))
        .otherwise(_enc_node("k", is_supplier=False))
        .alias("enc"),
    ).withColumn("back", _dec_node("enc")).collect()
    # exact inversion
    for r in got:
        assert r["back"] == r["label"], (r["label"], r["enc"], r["back"])
    # strict order isomorphism against Spark's own string ordering
    # (UTF8_BINARY == Python str comparison for ASCII)
    by_enc = [r["label"] for r in sorted(got, key=lambda r: r["enc"])]
    by_str = sorted((r["label"] for r in got))
    assert by_enc == by_str
    # injectivity
    assert len({r["enc"] for r in got}) == len(got)
