"""BPE trainer semantics (`operators/bpe.py`): the Spark implementation
must match a pure-Python greedy Sennrich-BPE reference exactly —
including the adversarial merge cases (same-symbol runs, alternating
overlaps) where a naive space-separated replace() encoding diverges from
greedy left-to-right semantics. The corpus-level DuckDB differential for
q93 lives in test_oracle_differential (auto-discovered)."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.bpe import (
    apply_merge,
    encode_symbols,
    segment_words,
    train_bpe,
    word_type_table,
)


def _ref_bpe(texts: list[str], n_merges: int):
    """Pure-Python greedy reference (Sennrich alg. 1)."""
    wf = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if len(w) >= 2 and re.fullmatch(r"[a-z]+", w):
                wf[w] += 1
    words = {tuple(w): m for w, m in wf.items()}
    merges = []
    for k in range(n_merges):
        pc = Counter()
        for syms, m in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += m
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((k + 1, a, b, a + b, n))
        new = {}
        for syms, m in words.items():
            out, pend = [], None
            for s in syms:
                if pend == a and s == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            new[tuple(out)] = new.get(tuple(out), 0) + m
        words = new
    return merges, words


# Runs of one symbol ('aaaa' -> aa aa, 'aaaaaa' -> aa aa aa) and
# alternating chains ('ababab' -> ab ab ab) are exactly where greedy
# left-to-right merging and naive string replacement part ways.
ADVERSARIAL = [
    "aaaa aaaa aaa aaaaaa",
    "ababab abab ab ba",
    "banana bananas banana",
    "aa aa aa ab",
]


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "doc_id INT, text STRING"
    )


def test_train_matches_greedy_reference(spark, adv_docs):
    got = [tuple(r) for r in train_bpe(adv_docs, n_merges=6).orderBy("rank").collect()]
    want, _ = _ref_bpe(ADVERSARIAL, 6)
    assert got == want


def test_apply_merge_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([("aaaaaa",), ("ababab",), ("aab",)], "w STRING")
    enc = df.select("w", encode_symbols(F.col("w")).alias("enc"))
    got = {
        r["w"]: r["enc"]
        for r in apply_merge(enc, "a", "a").orderBy("w").collect()
    }
    # six a's -> three 'aa' symbols; no cross-pair leakage in runs
    assert got["aaaaaa"] == "_aa__aa__aa_"
    assert got["aab"] == "_aa__b_"
    assert got["ababab"] == "_a__b__a__b__a__b_"  # (a,a) never adjacent


def test_segmentation_matches_reference_and_roundtrips(spark, adv_docs):
    merges, ref_words = _ref_bpe(ADVERSARIAL, 6)
    rules = [(a, b) for _, a, b, _, _ in merges]
    wt = word_type_table(adv_docs)
    seg = segment_words(wt, rules).collect()
    ref = {"".join(k): list(k) for k in ref_words}
    for r in seg:
        assert list(r["pieces"]) == ref[r["w"]], r["w"]
        assert "".join(r["pieces"]) == r["w"]


def test_word_type_table_filters_and_counts(spark):
    docs = spark.createDataFrame(
        [(0, "The the THE x a1b ok"), (1, "ok  ok\tthe")], "doc_id INT, text STRING"
    )
    got = {r["w"]: r["m"] for r in word_type_table(docs).collect()}
    # 'x' (len 1) and 'a1b' (non-alpha) excluded; case-folded counts
    assert got == {"the": 4, "ok": 3}


def test_driver_traffic_is_one_row_per_merge(spark, adv_docs):
    """The argmax plans as a limit-1 collect: the returned merge table is
    built from exactly n_merges driver-side rows."""
    out = train_bpe(adv_docs, n_merges=3)
    assert out.count() == 3
    assert out.schema.simpleString() == (
        "struct<rank:int,left_sym:string,right_sym:string,"
        "merged:string,n:bigint>"
    )


# ---- property fuzz: the delimiter-doubled encoding IS greedy merge ----
# Python's str.replace has the same left-to-right non-overlapping contract
# as Spark's and DuckDB's replace, so the encoding claim — one replace()
# call == one greedy BPE merge — is fuzzable at zero Spark cost.

from hypothesis import given, settings
from hypothesis import strategies as st

_SYMS = ["a", "b", "c", "ab", "ba", "aa"]


def _greedy(syms, a, b):
    out, pend = [], None
    for s in syms:
        if pend == a and s == b:
            out.append(a + b)
            pend = None
        else:
            if pend is not None:
                out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


@settings(max_examples=500, deadline=None)
@given(
    syms=st.lists(st.sampled_from(_SYMS), min_size=1, max_size=12),
    a=st.sampled_from(_SYMS),
    b=st.sampled_from(_SYMS),
)
def test_replace_on_doubled_encoding_is_greedy_merge(syms, a, b):
    enc = "_" + "__".join(syms) + "_"
    merged = enc.replace(f"_{a}__{b}_", f"_{a}{b}_")
    got = merged.strip("_").split("__")
    assert got == _greedy(syms, a, b), (syms, a, b)


def test_train_crosses_repersist_window(spark):
    """A merge count past _REPERSIST_EVERY exercises the cache re-pin
    (bounded-lineage) path: results must still match the pure-Python
    greedy reference exactly across the window boundary."""
    from eurostat_energy_etl_pipeline_spark.operators.bpe import (
        _REPERSIST_EVERY,
    )

    texts = [
        "interdependence independence interdependent dependency",
        "the theory there then these those theater",
        "banana bananas bandana bandanas anagram",
        "abracadabra cadabra abra abracadabras",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    n = _REPERSIST_EVERY + 4
    got = [tuple(r) for r in train_bpe(docs, n_merges=n).orderBy("rank").collect()]
    want, _ = _ref_bpe(texts, n)
    assert got == want
    assert len(got) > _REPERSIST_EVERY  # the window boundary was crossed
