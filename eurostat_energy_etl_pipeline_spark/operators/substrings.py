"""Exact substring-level deduplication (the suffix-array family of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): find verbatim k-token spans that occur more than once ANYWHERE
in the corpus — inside otherwise-distinct documents included — and
report, per document, how much of it is covered by repeated spans.

Every other dedup operator in this library is document-grain (exact
hash, MinHash/SimHash, prefix-filter Jaccard, edit-distance,
SemDeDup, sorted-neighborhood); none of them catches a verbatim
50-token quote pasted into two otherwise-different documents. This is
that operator (VERDICT r9 item 5).

Distributed shape — sorted k-gram keys + run detection, NEVER a driver
suffix array (a 100 TB corpus's suffix array does not fit anywhere):

1. tokenize -> slide a k-token window -> emit (gram_hash, doc_id, pos).
   The gram itself is hashed scan-side (60-bit md5 prefix), so the ONE
   content-keyed exchange carries 15-byte keys, not text (the q19/q23
   pre-exchange pruning discipline).
2. one hash-keyed aggregate marks gram hashes with corpus frequency
   >= min_count; the position stream joins back on the same key (the
   exchange is reused, not repeated).
3. per-document run detection: duplicated positions union into maximal
   covered token intervals with a classic gaps-and-islands window
   (islands merge while pos <= previous_max_end + 1) — integer
   arithmetic end to end, so a SQL engine replays it exactly.

Like a suffix array, the k-gram recall contract is one-sided and exact:
every repeated span of length >= k is covered (all its k-grams repeat);
nothing shorter than k is reported. Lee et al. use 50 BPE tokens; the
fixtures here are short synthetic documents, so the registered query
uses k=8 whitespace tokens — the operator takes k as a parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eurostat_energy_etl_pipeline_spark.operators.text import whitespace_tokens


def duplicated_gram_positions(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, n_grams) for every window position whose k-token
    gram occurs >= min_count times corpus-wide (within-document repeats
    count — a verbatim span repeated twice in one document is still a
    repeated span). `pos` is 1-based; `n_grams` = len(tokens) - k + 1 is
    carried so callers don't rescan."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    ).where(F.size("tk") >= k)
    g = tok.select(
        "doc_id",
        (F.size("tk") - F.lit(k - 1)).cast("long").alias("n_grams"),
        F.explode(
            F.sequence(F.lit(1), F.size("tk") - F.lit(k - 1))
        ).alias("pos"),
        "tk",
    ).select(
        "doc_id",
        "n_grams",
        "pos",
        # 60-bit md5 prefix of the space-joined gram — the only
        # content-derived value that crosses an exchange
        F.substring(
            F.md5(F.array_join(F.slice(F.col("tk"), F.col("pos"), k), " ")),
            1,
            15,
        ).alias("gh"),
    )
    # corpus frequency as a count over the gh-partitioned window: ONE
    # exchange of the gram stream, no aggregate-then-join-back (which
    # would shuffle it twice — column pruning makes the two exchange
    # subtrees non-identical, so ReusedExchange cannot save it). gh is a
    # high-cardinality key whose partition size is bounded by how often
    # one exact span repeats — no skew lever needed.
    cnt = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    return (
        g.withColumn("cnt", cnt)
        .where(F.col("cnt") >= min_count)
        .select("doc_id", "pos", "n_grams")
    )


def duplicated_span_profile(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repeated-span profile: (doc_id, n_grams, dup_grams,
    n_spans, dup_tokens) for every document containing at least one
    k-token span that occurs >= min_count times corpus-wide.

    - dup_grams: window positions whose gram repeats corpus-wide;
    - n_spans:   maximal covered token intervals after union-merging
                 [pos, pos+k-1] ranges (contiguous coverage = one span);
    - dup_tokens: total tokens under those intervals — the number a
                 span-level dedup pass would remove (Lee et al. report
                 corpus fractions of exactly this).
    """
    dp = duplicated_gram_positions(docs, k, min_count, id_col, text_col)
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(w_prev)
    brk = dp.select(
        "doc_id",
        "n_grams",
        "pos",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    isl = brk.select(
        "doc_id",
        "n_grams",
        "pos",
        F.sum("brk").over(w_run).alias("island"),
    )
    spans = isl.groupBy("doc_id", "n_grams", "island").agg(
        F.count(F.lit(1)).alias("npos"),
        (F.max("pos") + F.lit(k - 1) - F.min("pos") + F.lit(1))
        .cast("long")
        .alias("covered"),
    )
    return spans.groupBy("doc_id", "n_grams").agg(
        F.sum("npos").cast("long").alias("dup_grams"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("covered").cast("long").alias("dup_tokens"),
    )
