"""BM25 retrieval invariants: Lucene-formula parity on a hand-computable
corpus, top-k ordering, tf saturation, and length normalization. The full
cross-engine check is the q75 DuckDB differential
(tests/test_oracle_differential.py)."""

import math

import pytest
from pyspark.sql import Row

from eurostat_energy_etl_pipeline_spark.rag.bm25 import (
    B,
    K1,
    _query_unigrams,
    bm25_search,
    build_bm25_index,
)

CORPUS = [
    (0, "solar solar solar output rising"),
    (1, "solar output stable"),
    (2, "wind output declining declining declining declining declining"),
    (3, "hydro reservoirs stable"),
]


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in CORPUS])
    return build_bm25_index(df)


def _expected(tf, df, dl, n_docs, avgdl):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_matches_hand_formula(spark, index):
    hits = {
        r["id"]: r["score"]
        for r in bm25_search(index, "solar", k=4).collect()
    }
    # doc lengths after the (no-op here) stopword filter: 5, 3, 7, 3.
    avgdl = (5 + 3 + 7 + 3) / 4
    assert hits[0] == pytest.approx(_expected(3, 2, 5, 4, avgdl))
    assert hits[1] == pytest.approx(_expected(1, 2, 3, 4, avgdl))
    assert 2 not in hits and 3 not in hits


def test_multi_term_scores_sum(spark, index):
    single = {
        t: {r["id"]: r["score"] for r in bm25_search(index, t, k=4).collect()}
        for t in ("solar", "output")
    }
    both = {
        r["id"]: r["score"]
        for r in bm25_search(index, "solar output", k=4).collect()
    }
    for doc in (0, 1):
        assert both[doc] == pytest.approx(
            single["solar"].get(doc, 0.0) + single["output"].get(doc, 0.0)
        )


def test_tf_saturates_not_linear(spark, index):
    """3 occurrences must score more than 1 but far less than 3x (the k1
    saturation that distinguishes BM25 from raw tf weighting). Compare at
    equal document length by computing the formula directly."""
    avgdl = 18 / 4
    one = _expected(1, 2, 5, 4, avgdl)
    three = _expected(3, 2, 5, 4, avgdl)
    assert one < three < 2.2 * one


def test_length_normalization_penalizes_long_docs(spark, index):
    """Same tf=1 and df, shorter doc scores higher (b>0)."""
    avgdl = 18 / 4
    assert _expected(1, 2, 3, 4, avgdl) > _expected(1, 2, 7, 4, avgdl)


def test_ordering_and_k(spark, index):
    hits = bm25_search(index, "solar output declining", k=2).toPandas()
    assert len(hits) == 2
    s = hits["score"].values
    assert (s[:-1] >= s[1:]).all()


def test_stopword_and_empty_query(spark, index):
    assert _query_unigrams("the and of") == []
    assert bm25_search(index, "the and of", k=3).count() == 0


def test_unknown_terms_drop_out(spark, index):
    assert bm25_search(index, "fusion tokamak", k=3).count() == 0
