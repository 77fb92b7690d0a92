"""Planted-span invariants for the substring-dedup operator (VERDICT r9
item 5): exact expected output on documents with KNOWN repeated spans —
the q52 decontamination shape — plus the one-sided recall contract and
the pre-exchange text-pruning plan gate."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.substrings import (
    duplicated_gram_positions,
    duplicated_span_profile,
)

SPAN = "alpha bravo charlie delta echo"  # 5 tokens, planted verbatim


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1/2 share the planted 5-token span inside distinct text
        (1, f"one two three {SPAN} four five six"),
        (2, f"zz yy {SPAN} xx ww vv uu tt"),
        # doc 3: repeats the span TWICE within itself (within-doc repeat)
        (3, f"{SPAN} mid1 mid2 mid3 {SPAN}"),
        # doc 4: unique text, nothing repeated
        (4, "q w e r t y u i o p unique only here"),
        # doc 5: too short for any k=5 gram
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans_exact_profile(docs):
    got = {
        r["doc_id"]: r
        for r in duplicated_span_profile(docs, k=5, min_count=2).collect()
    }
    # docs 4 and 5 must not appear; 1, 2, 3 must.
    assert set(got) == {1, 2, 3}
    # doc 1: 11 tokens -> 7 grams; only the gram starting at the span
    # (pos 4) repeats; one span of exactly k tokens.
    assert got[1]["n_grams"] == 7
    assert got[1]["dup_grams"] == 1
    assert got[1]["n_spans"] == 1
    assert got[1]["dup_tokens"] == 5
    # doc 2: 12 tokens -> 8 grams; span starts at pos 3.
    assert got[2]["n_grams"] == 8
    assert (got[2]["dup_grams"], got[2]["n_spans"], got[2]["dup_tokens"]) == (
        1, 1, 5,
    )
    # doc 3: 13 tokens -> 9 grams; the span occurs at pos 1 and pos 9 —
    # two separate maximal spans, 10 covered tokens.
    assert got[3]["n_grams"] == 9
    assert (got[3]["dup_grams"], got[3]["n_spans"], got[3]["dup_tokens"]) == (
        2, 2, 10,
    )


def test_one_sided_recall_contract(docs, spark):
    """Every repeated span of length >= k is found (all its grams repeat);
    nothing is reported for a corpus with no repeated k-gram. Also: a
    span of length k+1 repeated verbatim yields ADJACENT duplicated
    positions that merge into ONE maximal span of k+1 tokens."""
    rows = [
        (1, "a b c d e f zzz"),
        (2, "qq a b c d e f ww"),  # 6-token span repeated, k=5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in duplicated_span_profile(df, k=5, min_count=2).collect()
    }
    assert (got[1]["dup_grams"], got[1]["n_spans"], got[1]["dup_tokens"]) == (
        2, 1, 6,
    )
    assert (got[2]["dup_grams"], got[2]["n_spans"], got[2]["dup_tokens"]) == (
        2, 1, 6,
    )
    # no repeats -> empty result
    uniq = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    assert duplicated_span_profile(uniq, k=5).count() == 0


def test_gram_exchange_carries_hashes_not_text(docs):
    """The 100 TB gate: the gram stream crosses exactly ONE
    content-keyed exchange (count-over-window, not aggregate + join
    back, which would shuffle it twice), the exchange ships the 60-bit
    gh key — never tk/text — and there is no join node at all."""
    df = duplicated_gram_positions(docs, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    exchanges = [
        b
        for b in plan.split("\n\n")
        if b.lstrip().startswith("(") and ") Exchange" in b.splitlines()[0]
    ]
    assert len(exchanges) == 1, plan
    for b in exchanges:
        assert "gh#" in b
        assert "text#" not in b and "tk#" not in b, (
            f"row content crosses an exchange:\n{b}"
        )


def test_cut_duplicated_spans_keep_first_policy(spark):
    """q156 semantics: the corpus-FIRST occurrence (by doc_id, pos) of a
    repeated k-gram survives, every later occurrence's tokens are cut;
    untouched documents pass through with ORIGINAL text (case intact);
    a within-document repeat loses its second copy; blank docs are
    no-ops."""
    from eurostat_energy_etl_pipeline_spark.operators.substrings import (
        cut_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "A b c d e f g h x y"),          # first occurrence: kept
            (2, "z a b c d e f g h w"),          # second: span cut
            (3, "totally different words here"),  # clean: untouched
            (4, "a b c d e f g h a b c d e f g h"),  # within-doc repeat
            (5, ""),                              # blank
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in cut_duplicated_spans(docs, k=8, min_count=2).collect()
    }
    # doc 1 holds the canonical copy — original text, original case
    assert got[1]["text"] == "A b c d e f g h x y"
    assert (got[1]["tokens_before"], got[1]["tokens_after"]) == (10, 10)
    assert got[1]["spans_cut"] == 0
    # doc 2's copy is cut: surviving tokens re-joined normalized
    assert got[2]["text"] == "z w"
    assert (got[2]["tokens_before"], got[2]["tokens_after"]) == (10, 2)
    assert got[2]["spans_cut"] == 1
    # doc 3 untouched
    assert got[3]["text"] == "totally different words here"
    # doc 4: both its occurrences are non-first (doc 1 owns the gram) and
    # the two cut intervals [1,8] [9,16] merge into one maximal span
    assert got[4]["text"] == ""
    assert (got[4]["tokens_after"], got[4]["spans_cut"]) == (0, 1)
    assert got[5]["text"] == "" and got[5]["tokens_before"] == 0


def test_cut_duplicated_spans_disjoint_spans_counted(spark):
    """Two separated repeated regions in one doc stay two merged spans,
    and the in-between tokens survive in order."""
    from eurostat_energy_etl_pipeline_spark.operators.substrings import (
        cut_duplicated_spans,
    )

    span_a = "p q r s t"
    span_b = "u v w x y"
    docs = spark.createDataFrame(
        [
            (1, f"{span_a} one {span_b}"),
            (2, f"{span_a} KEEP me please {span_b}"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in cut_duplicated_spans(docs, k=5, min_count=2).collect()
    }
    assert got[1]["spans_cut"] == 0  # doc 1 is first for both grams
    assert got[2]["spans_cut"] == 2
    assert got[2]["text"] == "keep me please"
    assert got[2]["tokens_after"] == 3


def test_cut_gram_exchange_ships_hashes_not_text(docs):
    """100 TB gate for the apply stage: the content-keyed (gh) exchange
    carries 15-byte hashes — text/token arrays never cross it. (The
    doc_id rewrite join may exchange text once; that one is doc-keyed
    and bucketing-eliminable.)"""
    from eurostat_energy_etl_pipeline_spark.operators.substrings import (
        cut_duplicated_spans,
    )

    df = cut_duplicated_spans(docs, k=5, min_count=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    gh_exchanges = [
        b
        for b in plan.split("\n\n")
        if b.lstrip().startswith("(")
        and ") Exchange" in b.splitlines()[0]
        and "gh#" in b
    ]
    assert len(gh_exchanges) == 1, plan
    for b in gh_exchanges:
        assert "text#" not in b and "tk#" not in b, (
            f"row content crosses the content-keyed exchange:\n{b}"
        )
