"""RAG invariants (FIXTURES.md §3.4): top-k size, non-increasing scores,
exact-text query ranks its own document first, intent routing."""

import pytest
from pyspark.sql import Row

from eurostat_energy_etl_pipeline_spark.rag.chatbot import route
from eurostat_energy_etl_pipeline_spark.rag.tfidf import semantic_search

CORPUS = [
    (0, "germany gross electricity production is rising steadily"),
    (1, "france household energy consumption is declining"),
    (2, "italy transport energy consumption is stable"),
    (3, "spain industrial energy consumption is rising"),
    (4, "poland commercial services energy consumption is declining"),
    (5, "norway gross electricity production is stable overall"),
    (6, "sweden household consumption compare trends"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in CORPUS])


def test_topk_size_and_order(spark, corpus):
    hits = semantic_search(spark, corpus, "energy consumption trends", k=5).toPandas()
    assert len(hits) <= 5
    scores = hits["score"].values
    assert (scores[:-1] >= scores[1:]).all()


def test_exact_text_ranks_first(spark, corpus):
    q = CORPUS[3][1]
    hits = semantic_search(spark, corpus, q, k=5).toPandas()
    assert hits["id"].iloc[0] == 3


def test_irrelevant_query_low_overlap(spark, corpus):
    hits = semantic_search(spark, corpus, "zzz qqq unrelated tokens", k=5).toPandas()
    assert len(hits) == 0  # no shared terms -> no postings -> no hits


def test_intent_routing():
    assert route("Which country's GEP is rising fastest?") == "intent"
    assert route("is gross electricity production growing anywhere") == "intent"
    assert route("compare household consumption") == "semantic"
    assert route("rising unemployment") == "semantic"  # rising but not GEP
