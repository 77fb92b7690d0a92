"""Distributed BPE tokenizer training (Sennrich et al. 2016, the algorithm
behind the reference stack's tokenizers; no counterpart file in
/root/reference — this is north-star LLM-pipeline scope, SURVEY.md §2.9).

Scale shape
-----------
Everything runs on the **word-type grain**, never the token-instance
stream: the corpus is reduced once to ``(word, multiplicity)`` by a
map-side-combined aggregate (Zipf makes the type table orders of
magnitude smaller than the corpus — "the" is one row no matter how many
billion times it occurs), and every merge iteration is

  1. one ``groupBy(a, b).sum(m)`` over the cached type table (shuffle
     volume O(distinct pairs), corpus-size independent), plus
  2. a ``TakeOrderedAndProject``-style ``orderBy(...).limit(1)`` argmax —
     the driver receives exactly ONE row per iteration, and
  3. a narrow string ``replace`` re-encoding (no shuffle at all).

So an N-merge training run is N tiny aggregation jobs over a persisted
vocabulary-sized table — the same driver-coordinated-iteration shape as
the full-corpus Lloyd step (``operators/clustering.lloyd_update``), with
O(1) driver traffic per step.

Greedy-merge encoding
---------------------
A merge must replace **non-overlapping occurrences left-to-right**
(greedy): applying ``(a, a)`` to ``a a a`` yields ``aa a``. Word symbol
sequences are encoded as delimiter-doubled strings::

    ['a', 'b', 'c']  ->  '_a__b__c_'

so the single builtin ``replace(enc, '_a__b_', '_ab_')`` IS exactly the
greedy merge: adjacent occurrences each own one ``_`` of the shared
``__`` separator, so consuming a match never steals the next match's
leading delimiter (the classic failure of space-separated encodings,
where ``replace(' a b ', ...)`` skips every other occurrence in a run).
The oracle SQL in ``plans/corpus.py`` (q93) runs the SAME encoding
through DuckDB's ``replace``, and ``tests/test_bpe.py`` pins both
against a pure-Python greedy reference. Words are restricted to
``^[a-z]+$`` (tokenizer training normalizes its corpus first), so the
``_`` delimiter can never collide with symbol text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from eurostat_energy_etl_pipeline_spark.operators.text import whitespace_tokens

#: Words eligible for training: pure ASCII-lowercase, >= 2 chars (a
#: 1-char word has no pair and only bloats the type table).
WORD_RE = "^[a-z]+$"


def word_type_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Reduce a corpus to its (word type, multiplicity) table — the one
    instance-grain shuffle in the whole training run."""
    tok = docs.select(F.explode(whitespace_tokens(F.col(text_col))).alias("w"))
    return (
        tok.where((F.length("w") >= 2) & F.col("w").rlike(WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("m"))
    )


def encode_symbols(word: Column) -> Column:
    """Delimiter-doubled single-character seed segmentation:
    'abc' -> '_a__b__c_'."""
    return F.concat(F.lit("_"), F.array_join(F.split(word, ""), "__"), F.lit("_"))


def _symbols(enc_col: str) -> Column:
    """Inverse of the encoding: '_ab__c_' -> ['ab', 'c']."""
    return F.split(F.expr(f"trim(BOTH '_' FROM {enc_col})"), "__")


def _pair_counts(encoded: DataFrame, enc_col: str = "enc") -> DataFrame:
    """Adjacent-symbol pair frequencies weighted by word multiplicity.
    Pure Catalyst (transform over sequence + explode); one
    map-side-combined aggregate."""
    syms = _symbols(enc_col)
    # Adjacent pairs as zip(syms[:-1], syms[1:]): slice-based so a fully
    # merged single-symbol word degrades to an empty pair list (sequence()
    # would flip to a descending [1, 0] range there and index out of bounds).
    n1 = F.size(syms) - 1
    pairs = encoded.select(
        F.explode(
            F.zip_with(
                F.slice(syms, 1, n1),
                F.slice(syms, 2, n1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
        "m",
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("m").alias("n"))


def apply_merge(encoded: DataFrame, a: str, b: str, enc_col: str = "enc") -> DataFrame:
    """Apply one merge rule greedily (narrow map — no shuffle)."""
    return encoded.withColumn(
        enc_col,
        F.replace(F.col(enc_col), F.lit(f"_{a}__{b}_"), F.lit(f"_{a}{b}_")),
    )


#: Merges between cache re-pins in train_bpe. Within a window the encoded
#: table carries at most this many stacked replace() expressions; the
#: per-iteration cost is flat in the number of merges already learned.
_REPERSIST_EVERY = 16


def train_bpe(docs: DataFrame, n_merges: int = 5, text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a corpus.

    Returns a driver-built DataFrame (rank, left_sym, right_sym, merged,
    n) — n_merges rows, the argmax pair of each iteration with its
    corpus frequency. Ties break on (count DESC, a ASC, b ASC) so the
    result is deterministic and oracle-comparable.
    """
    spark = docs.sparkSession
    base = word_type_table(docs, text_col).select(
        encode_symbols(F.col("w")).alias("enc"), "m"
    )
    # The type table is vocabulary-sized (Zipf-bounded), not corpus-sized:
    # persisting it is what makes each of the N iterations a small job
    # instead of a corpus re-scan. Each merge stacks one replace() on the
    # plan, so without re-pinning, iteration k would re-apply k-1 prior
    # merges over the persisted base — O(N^2) work and unbounded
    # plan-analysis cost at tokenizer-realistic merge counts (10k+). Every
    # _REPERSIST_EVERY merges the encoded table is therefore materialised
    # into a fresh persist and the predecessor dropped, keeping both the
    # executed lineage and the analyzed plan bounded by the window size.
    pinned = base.persist()
    cur = pinned
    try:
        rows: list[tuple[int, str, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(cur)
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:  # corpus exhausted (every word a single symbol)
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            rows.append((rank, a, b, a + b, n))
            cur = apply_merge(cur, a, b)
            if rank % _REPERSIST_EVERY == 0:
                nxt = cur.persist()
                nxt.count()  # materialise BEFORE dropping the predecessor
                pinned.unpersist()
                pinned = cur = nxt
        # Return as an Arrow-backed LocalTableScan: createDataFrame over a
        # plain Python list parallelizes into a defaultParallelism-wide
        # python RDD, and every later execution pays one Python-worker
        # round-trip PER PARTITION (~3.3 s for 5 rows under coalesce(1),
        # which folds all 32 evals into one task). The pandas path embeds
        # the rows in the plan — execution is driver-local and free.
        out = pd.DataFrame(
            rows, columns=["rank", "left_sym", "right_sym", "merged", "n"]
        )
        return spark.createDataFrame(
            out,
            "rank INT, left_sym STRING, right_sym STRING, merged STRING, n BIGINT",
        )
    finally:
        pinned.unpersist()


def fertility_table(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenizer-application stats as a scan-side Arrow
    kernel: (id_col, n_words, n_pieces) for every document, where words
    are the trainer's eligible tokens (lowercased whitespace tokens,
    >= 2 chars, pure [a-z]) and n_pieces applies the ``merges`` list via
    the delimiter-doubled replace chain — Python ``str.replace`` has the
    same left-to-right non-overlapping contract as Spark's and DuckDB's
    ``replace`` (fuzzed in test_bpe), so all three engines segment
    identically.

    Scale shape: ZERO shuffle — one mapInPandas pass over the documents,
    embarrassingly parallel per partition (the q94 entropy-kernel
    class). The encode/replace chain runs once per word TYPE via a
    per-partition memo, so Zipf makes the amortized per-instance cost a
    dict hit; the earlier broadcast-vocabulary formulation paid a
    distinct shuffle + broadcast build for the same memoization.
    Tokenizer contract: ASCII words only count (the [a-z]+ filter), so
    engine differences in whitespace classes or case folding outside
    ASCII cannot change which words are counted."""
    import re as _re

    ws = _re.compile(r"\s+")
    word = _re.compile(r"[a-z]+")
    pats = [(f"_{a}__{b}_", f"_{a}{b}_") for a, b in merges]

    def run(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words = np.zeros(len(pdf), dtype=np.int64)
            n_pieces = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                if not text:
                    continue
                wc = pc = 0
                for w in ws.split(text.strip().lower()):
                    if len(w) < 2 or not word.fullmatch(w):
                        continue
                    np_w = memo.get(w)
                    if np_w is None:
                        enc = "_" + "__".join(w) + "_"
                        for s, r in pats:
                            enc = enc.replace(s, r)
                        np_w = enc.strip("_").count("__") + 1
                        memo[w] = np_w
                    wc += 1
                    pc += np_w
                n_words[i] = wc
                n_pieces[i] = pc
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_words long, n_pieces long"
    )


def segment_words(words: DataFrame, merges: list[tuple[str, str]],
                  word_col: str = "w") -> DataFrame:
    """Tokenize with a trained merge list: adds a ``pieces`` array column
    by replaying the merges in rank order over the encoded word. Narrow
    expressions only — composes onto any plan without a shuffle, which is
    how a trained tokenizer is meant to be applied at corpus scale."""
    enc = encode_symbols(F.col(word_col))
    for a, b in merges:
        enc = F.replace(enc, F.lit(f"_{a}__{b}_"), F.lit(f"_{a}{b}_"))
    pieces = F.split(F.regexp_replace(enc, "^_|_$", ""), "__")
    return words.withColumn("pieces", pieces)
