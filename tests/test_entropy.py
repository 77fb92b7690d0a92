"""Character-entropy kernel semantics (`operators/entropy.py`). The
corpus-level DuckDB differential for q94 is auto-discovered by
test_oracle_differential; here the numpy batch kernel is pinned against
a per-document reference on edge cases (empty, single-char, unicode,
batch packing)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from eurostat_energy_etl_pipeline_spark.operators.entropy import (
    _batch_entropy,
    char_entropy_table,
)


def _ref(t: str) -> float:
    cnt = Counter(t)
    n = len(t)
    return -sum((c / n) * math.log2(c / n) for c in cnt.values()) if n else 0.0


CASES = ["", "aaaa", "ab", "abcd", "héllo wörld", "的是了在我有", "a" * 1000 + "b"]


def test_kernel_matches_reference_per_doc():
    lens, ent = _batch_entropy(pd.Series(CASES))
    for t, n, e in zip(CASES, lens, ent):
        assert n == len(t)
        assert abs(e - _ref(t)) < 1e-12, repr(t)


def test_kernel_batch_packing_independent():
    """Entropy of a doc must not depend on which batch-mates surround it
    (the packed uint64 key must never collide across docs)."""
    solo = [_batch_entropy(pd.Series([t]))[1][0] for t in CASES]
    packed = _batch_entropy(pd.Series(CASES))[1]
    assert np.allclose(solo, packed, atol=0)


def test_kernel_null_text_is_zero():
    lens, ent = _batch_entropy(pd.Series([None, "ab"]))
    assert lens[0] == 0 and ent[0] == 0.0
    assert abs(ent[1] - 1.0) < 1e-12


def test_table_is_scan_side_no_shuffle(spark, sf_dir):
    df = char_entropy_table(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # widen_if_narrow may add its narrow-input repartition; beyond that the
    # kernel composes onto the scan with no aggregation exchange.
    assert "HashAggregate" not in plan
    assert ") Window" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}
    raw = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    for did, t in list(raw.items())[:50]:
        assert rows[did]["n_chars"] == len(t)
        assert abs(rows[did]["entropy"] - _ref(t)) < 1e-9


# ---- property fuzz: the packed-key batch kernel vs per-doc reference ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-32-le", max_codepoint=0x10FFFF),
            max_size=60,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_kernel_fuzz_matches_reference(texts):
    lens, ent = _batch_entropy(pd.Series(texts, dtype=object))
    for t, n, e in zip(texts, lens, ent):
        assert n == len(t)
        assert abs(e - _ref(t)) < 1e-9, repr(t)
