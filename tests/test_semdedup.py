"""SemDeDup keep-list semantics (`operators/semdedup.py`): planted
near-duplicate structure, greedy keep-lowest-id rule (including the
chained-ball asymmetry the paper accepts), cell isolation (cross-cell
near-dups are deliberately NOT compared), and the no-all-pairs plan
contract. The corpus-level DuckDB differential for q97 lives in
test_oracle_differential (auto-discovered)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.semdedup import (
    semantic_dedup_keep_list,
)

# Two well-separated cells on the x/y axes; within cell 0 a chain
# A~B~C where cos(A,B) and cos(B,C) clear eps=0.95 but cos(A,C) does
# not; within cell 1 an exact duplicate pair and a lone vector.
#   cell 0 centroid ~ (1, 0, 0); cell 1 centroid ~ (0, 1, 0)
_VECS = [
    (0, [1.0, 0.0, 0.0]),        # A: kept (lowest id in its ball)
    (1, [0.97, 0.243, 0.0]),     # B: cos(A,B)=0.97 >= eps -> dup_of 0
    (2, [0.881, 0.472, 0.0]),    # C: cos(B,C)~0.969, cos(A,C)~0.881 < eps
    (3, [0.0, 1.0, 0.0]),        # D: kept
    (4, [0.0, 1.0, 0.0]),        # E: exact dup of D -> dup_of 3
    (5, [0.3, 0.954, 0.0]),      # F: cos(D,F)=0.954 >= 0.95? just over
]
_CENTROIDS = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in _VECS], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )


def test_keep_list_planted_structure(spark, vecs):
    out = {
        r["vec_id"]: (r["cid"], r["keep"], r["dup_of"])
        for r in semantic_dedup_keep_list(vecs, _CENTROIDS, eps=0.95).collect()
    }
    assert len(out) == 6
    # Cell assignment: x-axis group -> cell 0, y-axis group -> cell 1.
    assert [out[i][0] for i in range(6)] == [0, 0, 0, 1, 1, 1]
    # A kept; B dropped against A; C dropped against B (chained ball:
    # cos(A,C) < eps but the greedy rule still drops C — dup_of is the
    # LOWEST in-eps cell-mate, which for C is B, not A).
    assert out[0] == (0, 1, -1)
    assert out[1] == (0, 0, 0)
    assert out[2][1] == 0 and out[2][2] == 1
    # D kept; exact duplicate E dropped against D.
    assert out[3] == (1, 1, -1)
    assert out[4] == (1, 0, 3)
    # F: cos(D,F) = 0.954 >= 0.95 -> dropped against D.
    assert out[5] == (1, 0, 3)


def test_cross_cell_near_dups_not_compared(spark):
    """Vectors near the cell boundary that land in DIFFERENT cells are
    never paired — the recall/cost tradeoff SemDeDup accepts by design
    (cells bound the candidate set)."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.99, 0.0]), (1, [0.99, 1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_keep_list(df, _CENTROIDS, eps=0.9).collect()
    }
    assert out == {0: 1, 1: 1}  # cos ~ 0.9998 but cells differ -> both kept


def test_plan_has_no_all_pairs_stage(spark, vecs):
    """The no-all-pairs contract: candidates come from the cell equi-join
    (hash-joinable), never a cartesian/BNLJ pair stream."""
    df = semantic_dedup_keep_list(vecs, _CENTROIDS, eps=0.95)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eps_boundary_on_grid(spark):
    """Cosines are gridded (1e-6 floor) BEFORE the threshold: a cosine
    that rounds exactly onto eps is a duplicate on both engines."""
    import math

    # cos = exactly 0.95 between (1,0) and (0.95, sqrt(1-0.95^2)).
    y = math.sqrt(1 - 0.95**2)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.95, y, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_keep_list(df, _CENTROIDS, eps=0.95).collect()
    }
    assert out == {0: 1, 1: 0}
