"""Unit semantics for the corpus-construction operators (chunking, PII
scan/redaction, decontamination, label cohesion) on planted fixtures —
the oracle differential (test_oracle_differential.py) covers the declared
queries; these pin the operator edge cases the fixtures can't reach."""

import math

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators import text as T
from eurostat_energy_etl_pipeline_spark.operators.chunking import chunk_documents
from eurostat_energy_etl_pipeline_spark.operators.dedup import contaminated_ids
from eurostat_energy_etl_pipeline_spark.operators.similarity import label_cohesion


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunking:
    def test_exact_windows(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        out = chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=4, stride=3
        ).collect()
        got = {(r.chunk_id, r.n_chunk_tokens, r.chunk_text) for r in out}
        assert got == {
            (0, 4, "w0 w1 w2 w3"),
            (1, 4, "w3 w4 w5 w6"),
            (2, 4, "w6 w7 w8 w9"),
        }

    def test_short_doc_single_chunk(self, spark):
        out = chunk_documents(
            _docs(spark, [(1, "a b")]), chunk_tokens=64, stride=48
        ).collect()
        assert len(out) == 1
        assert (out[0].chunk_id, out[0].n_chunk_tokens, out[0].chunk_text) == (0, 2, "a b")

    def test_exact_multiple_no_phantom_chunk(self, spark):
        # n == chunk_tokens: exactly one chunk, not a trailing empty one.
        text = " ".join(f"w{i}" for i in range(8))
        out = chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=8, stride=4
        ).collect()
        assert [r.chunk_id for r in out] == [0]

    def test_full_coverage_with_overlap(self, spark):
        # Every token index appears in at least one chunk.
        n, chunk, stride = 103, 16, 10
        text = " ".join(f"w{i}" for i in range(n))
        out = chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=chunk, stride=stride
        ).collect()
        covered = set()
        for r in out:
            covered.update(r.chunk_text.split(" "))
        assert covered == {f"w{i}" for i in range(n)}
        assert len(out) == math.ceil((n - chunk) / stride) + 1

    def test_invalid_stride_raises(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=4, stride=5)


class TestPii:
    def test_counts_and_redaction(self, spark):
        rows = [
            (1, "contact a.user+x@example.org or visit https://ex.org/p?q=1 id 4711"),
            (2, "no pii here"),
            (3, "twice 12 and 345 digits"),
        ]
        df = _docs(spark, rows)
        got = df.select(
            "doc_id",
            T.pattern_count(F.col("text"), T.EMAIL_PATTERN).alias("e"),
            T.pattern_count(F.col("text"), T.URL_PATTERN).alias("u"),
            T.pattern_count(F.col("text"), T.NUMSEQ_PATTERN).alias("n"),
            T.redact_pii(F.col("text")).alias("red"),
        ).collect()
        by_id = {r.doc_id: r for r in got}
        assert (by_id[1].e, by_id[1].u, by_id[1].n) == (1, 1, 1)
        assert by_id[1].red == "contact [EMAIL] or visit [URL] id [NUM]"
        assert (by_id[2].e, by_id[2].u, by_id[2].n) == (0, 0, 0)
        assert by_id[2].red == "no pii here"
        assert by_id[3].n == 2
        assert by_id[3].red == "twice [NUM] and [NUM] digits"

    def test_email_digits_not_double_redacted(self, spark):
        # Digits inside an email vanish with the email, not as a second [NUM].
        df = _docs(spark, [(1, "mail bob123@host99.com end")])
        red = df.select(T.redact_pii(F.col("text")).alias("r")).first().r
        assert red == "mail [EMAIL] end"


class TestDecontamination:
    def test_planted_overlap(self, spark):
        bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        corpus = _docs(
            spark,
            [
                (1, "x y alpha beta gamma delta z"),  # shares a 4-gram
                (2, "alpha beta gamma x delta"),  # max shared run is 3 tokens
                (3, "totally unrelated words here now"),
            ],
        )
        got = sorted(
            r.doc_id for r in contaminated_ids(corpus, bench, k=4).collect()
        )
        assert got == [1]

    def test_short_doc_whole_text_gram(self, spark):
        # Docs shorter than k fall back to the whole-text shingle: only an
        # exact short-text match is contamination.
        bench = _docs(spark, [(100, "tiny doc")])
        corpus = _docs(spark, [(1, "tiny doc"), (2, "tiny dog")])
        got = sorted(r.doc_id for r in contaminated_ids(corpus, bench, k=4).collect())
        assert got == [1]

    def test_no_false_hits_when_disjoint(self, spark):
        bench = _docs(spark, [(100, "p q r s t")])
        corpus = _docs(spark, [(1, "a b c d e f")])
        assert contaminated_ids(corpus, bench, k=4).count() == 0


class TestLabelCohesion:
    def test_known_geometry(self, spark):
        # Label 0: orthogonal unit vectors -> centroid (.5,.5),
        # cos(v, c) = 1/sqrt(2) for both members. Label 1: identical
        # vectors -> cohesion exactly 1.
        df = spark.createDataFrame(
            [
                (0, 0, [1.0, 0.0]),
                (1, 0, [0.0, 1.0]),
                (2, 1, [3.0, 4.0]),
                (3, 1, [3.0, 4.0]),
            ],
            ["vec_id", "label", "embedding"],
        )
        got = {r.label: r for r in label_cohesion(df).collect()}
        assert got[0].n == 2 and got[1].n == 2
        assert got[0].avg_norm == pytest.approx(1.0)
        assert got[0].avg_cos_centroid == pytest.approx(1 / math.sqrt(2))
        assert got[1].avg_norm == pytest.approx(5.0)
        assert got[1].avg_cos_centroid == pytest.approx(1.0)

    def test_zero_vector_guard(self, spark):
        df = spark.createDataFrame(
            [(0, 0, [0.0, 0.0]), (1, 0, [1.0, 1.0])],
            ["vec_id", "label", "embedding"],
        )
        row = label_cohesion(df).first()
        # Zero vector contributes cos=0 by the guard, not NaN.
        assert row.avg_cos_centroid == pytest.approx(0.5, abs=1e-9)
