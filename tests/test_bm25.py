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


def _scores(df):
    return [(r["id"], round(r["score"], 4)) for r in df.collect()]


def test_postings_index_merge_differential(spark, tmp_path):
    """Maintained at-rest index == scratch rebuild over the effective
    corpus: adds, text updates, tombstones (winning over upserts), then
    compaction preserving results while dropping dead generations."""
    from pyspark.sql import functions as F

    from eurostat_energy_etl_pipeline_spark.rag.bm25 import (
        bm25_index_search,
        compact_postings_index,
        merge_into_postings_index,
        write_postings_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS]
        + [Row(doc_id=9, text="solar wind hydro mixed")],
        "doc_id long, text string",
    )
    base = docs.where(F.col("doc_id") <= 2)
    path = str(tmp_path / "pidx")
    write_postings_index(base, path, num_term_buckets=4, num_id_buckets=4)
    # batch: add 3 and 9; update 1; tombstone 2 and also 9 (tombstone
    # wins over its own add)
    ups = docs.where(F.col("doc_id").isin(3, 9)).unionByName(
        docs.where(F.col("doc_id") == 1).select(
            "doc_id", F.concat("text", F.lit(" solar")).alias("text")
        )
    )
    audit = merge_into_postings_index(
        spark, path, upserts=ups, tombstone_ids=[2, 9]
    )
    assert audit == {"gen": 1, "n_upserts": 2, "n_tombstones": 2}
    eff = spark.createDataFrame(
        [
            Row(doc_id=0, text=CORPUS[0][1]),
            Row(doc_id=1, text=CORPUS[1][1] + " solar"),
            Row(doc_id=3, text=CORPUS[3][1]),
        ],
        "doc_id long, text string",
    )
    want = _scores(bm25_search(build_bm25_index(eff), "solar stable", k=5))
    got = _scores(bm25_index_search(spark, path, "solar stable", k=5))
    assert got == want, (got, want)
    # dead generations exist pre-compaction, none after; results stable
    n_before = spark.read.parquet(f"{path}/postings").count()
    caudit = compact_postings_index(spark, path)
    assert caudit["postings_before"] == n_before
    assert caudit["postings_after"] < n_before
    assert caudit["docs_after"] == 3
    got2 = _scores(bm25_index_search(spark, path, "solar stable", k=5))
    assert got2 == want


def test_postings_index_search_prunes_term_buckets(spark, tmp_path):
    """The query's terms prune the postings scan to their hash-bucket
    partitions: the physical plan carries a tb IN-list partition filter."""
    import contextlib
    import io

    from eurostat_energy_etl_pipeline_spark.rag.bm25 import (
        bm25_index_search,
        write_postings_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in CORPUS], "doc_id long, text string"
    )
    path = str(tmp_path / "prune")
    write_postings_index(docs, path, num_term_buckets=8)
    df = bm25_index_search(spark, path, "solar", k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "tb#" in plan and "IN (" in plan or "tb IN" in plan, plan
    assert len(_scores(df)) > 0
