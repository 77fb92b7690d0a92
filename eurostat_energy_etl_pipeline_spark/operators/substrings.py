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


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS algorithm): hash every k-token gram, then in every window
    of `w` consecutive gram positions select the minimum hash (position
    as tiebreak). The selected set is the document's fingerprint sketch:
    any shared substring of length >= k + w - 1 tokens is GUARANTEED to
    contribute at least one common selected fingerprint (winnowing's
    correctness theorem), at an expected density of only 2/(w+1) of the
    gram stream — which is the scale point: the cross-document exchange
    ships the SELECTED 15-byte hashes, ~one third of the grams at w=4,
    never the text.

    Returns (doc_id, gh, pos) — the distinct selected fingerprints per
    document. Docs shorter than k + w - 1 tokens have no full window and
    are absent. The min key is `gh || ':' || lpad(pos)` so the
    (hash, position) tiebreak is one portable lexicographic comparison
    in any engine."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    ).where(F.size("tk") >= k + w - 1)
    g = tok.select(
        "doc_id",
        (F.size("tk") - F.lit(k - 1)).alias("n_grams"),
        F.explode(
            F.sequence(F.lit(1), F.size("tk") - F.lit(k - 1))
        ).alias("pos"),
        "tk",
    ).select(
        "doc_id",
        "n_grams",
        "pos",
        F.concat(
            F.substring(
                F.md5(
                    F.array_join(F.slice(F.col("tk"), F.col("pos"), k), " ")
                ),
                1,
                15,
            ),
            F.lit(":"),
            # 10-digit pad: positions are gram indices, bounded by
            # per-document token count; 10 digits covers documents up to
            # ~10^10 tokens (far past any single doc at 100 TB corpus
            # scale), where the previous 6 digits silently truncated the
            # tiebreak past 999,999 grams.
            F.lpad(F.col("pos").cast("string"), 10, "0"),
        ).alias("key"),
    )
    fwd = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = (
        g.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min("key").over(fwd).alias("sel_key"),
        )
        .where(F.col("pos") <= F.col("n_grams") - F.lit(w - 1))
        .select(
            "doc_id",
            F.substring("sel_key", 1, 15).alias("gh"),
            F.substring("sel_key", 17, 10).cast("long").alias("pos"),
        )
        .distinct()
    )
    return sel


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_k: int = 5,
) -> DataFrame:
    """WITHIN-document repetition metrics — the Gopher / MassiveText
    repetition quality rules (Rae et al. 2021, token-level variant):

    - top2_frac / top3_frac: tokens attributable to occurrences of the
      document's most frequent 2-gram / 3-gram (count x n / n_tokens;
      Gopher's own rule multiplies naively too, so pathological overlap
      can exceed 1 — it is a filter signal, not a measure);
    - dup5_frac: fraction of tokens covered by `dup_k`-grams occurring
      >= 2 times WITHIN the document (interval-union coverage — the
      within-doc twin of duplicated_span_profile's corpus-wide run
      detection).

    Top-gram tie-break is (count desc, gram asc) so both engines pick
    the same gram. All fractions are ratios of exact integers, gridded
    at 1e-6. Complements the corpus-wide q141: that finds spans repeated
    ACROSS documents; this flags documents that repeat THEMSELVES (the
    boilerplate/keyword-stuffing failure mode the MassiveText rules
    exist for).

    Scale shape: everything is (doc, gram)-keyed — shuffle cardinality
    is the per-document gram-type count, and no key is corpus-global, so
    there is no hot key by construction; the three metrics then reduce
    to doc grain before the final join of three doc-grain tables."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    ).where(F.size("tk") >= dup_k)
    # r14: the tokenized table feeds FOUR consumers (2-gram counts,
    # 3-gram counts, the 5-gram coverage pass, and the doc-grain base) —
    # unpinned, each replayed the regex tokenize from the scan.
    from eurostat_energy_etl_pipeline_spark import plans as _plans

    tok = _plans.pin(
        tok.select("doc_id", "tk", F.size("tk").alias("n_tokens"))
    )

    def gram_positions(n: int):
        return tok.select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.sequence(F.lit(1), F.size("tk") - F.lit(n - 1))
            ).alias("pos"),
            "tk",
        ).select(
            "doc_id",
            "n_tokens",
            "pos",
            F.array_join(F.slice(F.col("tk"), F.col("pos"), n), " ").alias(
                "gram"
            ),
        )

    def top_frac(n: int, out: str):
        counts = (
            gram_positions(n)
            .groupBy("doc_id", "n_tokens", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("cnt"), F.asc("gram")
        )
        return (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select(
                "doc_id",
                (
                    F.floor(
                        F.col("cnt").cast("double")
                        * n
                        / F.col("n_tokens").cast("double")
                        * 1e6
                        + 0.5
                    )
                    / 1e6
                ).alias(out),
            )
        )

    g5 = gram_positions(dup_k)
    within_cnt = F.count(F.lit(1)).over(Window.partitionBy("doc_id", "gram"))
    dp = (
        g5.withColumn("cnt", within_cnt)
        .where(F.col("cnt") >= 2)
        .select("doc_id", "n_tokens", "pos")
    )
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
    prev_end = F.max(F.col("pos") + F.lit(dup_k - 1)).over(w_prev)
    brk = dp.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1))
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    isl = brk.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.sum("brk").over(w_run).alias("island"),
    )
    cov = (
        isl.groupBy("doc_id", "n_tokens", "island")
        .agg(
            (F.max("pos") + F.lit(dup_k - 1) - F.min("pos") + F.lit(1)).alias(
                "covered"
            )
        )
        .groupBy("doc_id", "n_tokens")
        .agg(F.sum("covered").alias("dup_cov"))
        .select(
            "doc_id",
            (
                F.floor(
                    F.col("dup_cov").cast("double")
                    / F.col("n_tokens").cast("double")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("dup5_frac"),
        )
    )
    base = tok.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
    out = (
        base.join(top_frac(2, "top2_frac"), "doc_id", "left")
        .join(top_frac(3, "top3_frac"), "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("top3_frac", F.lit(0.0)).alias("top3_frac"),
            F.coalesce("dup5_frac", F.lit(0.0)).alias("dup5_frac"),
        )
    )
    # MassiveText-style go/no-go flag (token-variant thresholds)
    return out.withColumn(
        "flagged",
        (
            (F.col("top2_frac") > 0.20)
            | (F.col("top3_frac") > 0.18)
            | (F.col("dup5_frac") > 0.30)
        ).cast("int"),
    )


def _gram_stream(tok: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gh) stream of 60-bit md5-prefix k-token gram hashes
    from a (doc_id, tk) token table — scan-side expressions only; the
    text never survives past this projection, so any downstream
    content-keyed exchange carries 15-byte keys."""
    return (
        tok.where(F.size("tk") >= k)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("tk") - F.lit(k - 1))
            ).alias("pos"),
            "tk",
        )
        .select(
            "doc_id",
            "pos",
            F.substring(
                F.md5(
                    F.array_join(F.slice(F.col("tk"), F.col("pos"), k), " ")
                ),
                1,
                15,
            ).alias("gh"),
        )
    )


def span_gram_index(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The at-rest ExactSubstr GRAM INDEX: (gh, n_occ) — every distinct
    k-token gram hash present anywhere in ``docs`` with its corpus
    occurrence count. A daily-ingest pipeline stores this next to the
    span-cut corpus so tomorrow's batch can be cut against the full
    history WITHOUT re-scanning it: pass the stored table to
    :func:`cut_duplicated_spans` as ``base_gram_index``. Carrying the
    count (not bare existence) keeps the BATCH-side incremental cut
    exact for any ``min_count`` (base docs stay valid without re-cutting
    only at ``min_count <= 2`` — see the caveat on
    :func:`cut_duplicated_spans`), and gives rank information for free
    — every base
    occurrence precedes every batch occurrence under the (doc_id, pos)
    total order when batch ids are larger, so ``n_occ`` IS the batch
    occurrence's rank offset.

    Scale shape: one scan-side gram expansion + one map-side-combinable
    count on the 15-byte hash key; text never shuffles."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    )
    return (
        _gram_stream(tok, k)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )


def cut_duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_gram_index: DataFrame | None = None,
) -> DataFrame:
    """The APPLY stage of substring-level dedup (Lee et al. 2022 §4,
    "ExactSubstr" removal; completes q141's measure-only profile): emit
    the REWRITTEN corpus with every non-first occurrence of a repeated
    k-token span cut out, keep-first-occurrence policy.

    Semantics (deterministic, engine-replayable):
    - a gram occurrence (doc, pos) is a CUT occurrence iff its k-token
      gram occurs >= min_count times corpus-wide AND it is not the
      corpus-FIRST occurrence of that gram under the total order
      (doc_id, pos) — so one copy of every repeated span survives;
    - a token is removed iff it lies under the interval
      [pos, pos + k - 1] of at least one cut occurrence (cut intervals
      are union-merged per document, gaps-and-islands);
    - untouched documents pass through with their ORIGINAL text;
      rewritten documents re-join the surviving lowercased whitespace
      tokens with single spaces (the tokenizer's normal form — the same
      contract every text operator in this library uses).

    Boundary caveat (Lee et al. have the same one): when two distinct
    repeated spans overlap inside the first-occurrence document, the
    overlap tokens can be cut there too, so a heavily-duplicated region
    may lose its "kept" copy; the guarantee is no repeated span of
    length >= 2k - 1 survives twice, not that every span survives once.

    Returns (doc_id, <passthrough cols>, tokens_before, tokens_after,
    spans_cut, text) at document grain — `text` is the rewritten corpus
    column a training pipeline consumes downstream.

    Incremental mode (``base_gram_index``): pass the stored
    :func:`span_gram_index` of an already-cut base corpus whose doc_ids
    are all SMALLER than this batch's, and the batch is cut with
    full-corpus semantics while scanning ONLY the batch: a batch
    occurrence's corpus-wide count is ``n_occ + cnt`` and its corpus-wide
    first-occurrence rank is ``n_occ + rk`` (every base occurrence
    precedes every batch occurrence under the (doc_id, pos) order), so
    the cut predicate ``cnt >= min_count AND rk >= 2`` evaluates exactly.
    Base documents themselves never need re-cutting under append-only
    ingest when ``min_count <= 2``: a base occurrence is cut iff an
    EARLIER occurrence exists, and all of those are in the base — the
    q192 monotonicity contract. With ``min_count > 2`` the claim does
    NOT hold for the base side: batch occurrences raise a gram's corpus
    count, which can flip an uncut base occurrence (rk >= 2 but
    cnt < min_count within the base) to cut under a full recompute —
    a caller folding appends into a stored corpus at min_count > 2 must
    re-cut base docs holding grams whose count crossed the threshold.

    Scale shape: the gram stream is hashed scan-side (15-byte 60-bit md5
    prefixes — text never crosses the content-keyed exchange); corpus
    frequency AND first-occurrence rank come from TWO window functions
    over the SAME gh-hashed exchange (count + row_number, one shuffle);
    cut positions then reduce per document (doc-keyed exchange) into
    O(#spans) merged intervals, and the rewrite is ONE doc_id equi-join
    of the interval lists against the token arrays with a scan-side
    higher-order filter (no UDF, no second pass over text). Bucketing
    the corpus by doc_id makes the rewrite join co-located."""
    passthrough = [c for c in docs.columns if c not in (id_col, text_col)]
    from eurostat_energy_etl_pipeline_spark import plans as _plans

    # r14: the token table feeds the gram stream AND the rewrite join —
    # unpinned, the regex tokenize of the whole corpus ran twice per
    # execution. The pin carries text (the rewrite needs _orig), so at
    # cluster scale it spills MEMORY_AND_DISK and degrades to the
    # recompute it replaces; at bench scale it halves the tokenize cost.
    tok = _plans.pin(
        docs.select(
            F.col(id_col).alias("doc_id"),
            *passthrough,
            F.col(text_col).alias("_orig"),
            F.filter(
                whitespace_tokens(F.col(text_col)), lambda x: x != ""
            ).alias("tk"),
        )
    )
    g = _gram_stream(tok.select("doc_id", "tk"), k)
    w_cnt = Window.partitionBy("gh")
    w_first = Window.partitionBy("gh").orderBy("doc_id", "pos")
    if base_gram_index is not None:
        # one equi-join on the 15-byte key; the join output is already
        # hash-partitioned on gh, so the two windows reuse the exchange
        g = g.join(
            base_gram_index.select("gh", F.col("n_occ").alias("_base_occ")),
            "gh",
            "left",
        )
        base_occ = F.coalesce(F.col("_base_occ"), F.lit(0))
    else:
        base_occ = F.lit(0)
    cutpos = (
        g.withColumn("cnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("rk", F.row_number().over(w_first))
        .where(
            (base_occ + F.col("cnt") >= min_count)
            & (base_occ + F.col("rk") >= 2)
        )
        .select("doc_id", "pos")
        # distinct is unnecessary (one row per (doc,pos) by construction)
    )
    return rewrite_cut_positions(tok, cutpos, k, passthrough)


def rewrite_cut_positions(tok, cutpos, k, passthrough):
    """Apply a (doc_id, pos) CUT-POSITION set to a token table — the
    island-merge + rewrite tail of :func:`cut_duplicated_spans`, exposed
    so index-driven paths (the q197 deletion fold recomputes cut
    positions for AFFECTED docs from the stored occurrence index) reuse
    the exact same interval semantics. ``tok`` carries (doc_id,
    *passthrough, _orig, tk); returns the cut_duplicated_spans output
    schema. Docs with no cut positions pass through with ``_orig``."""
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
    isl = cutpos.select(
        "doc_id",
        "pos",
        F.sum(
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .over(w_run)
        .alias("island"),
    )
    ivs = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + F.lit(k - 1)).alias("e"),
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("s", "e")).alias("ivs"),
            F.count(F.lit(1)).cast("long").alias("spans_cut"),
        )
    )
    out = tok.join(ivs, "doc_id", "left")
    # token index from F.filter's lambda is 0-based; intervals are
    # 1-based token positions. Merged islands are disjoint, so "covered
    # by some interval" is a plain exists().
    kept = F.filter(
        F.col("tk"),
        lambda x, i: ~F.exists(
            F.col("ivs"),
            lambda iv: (i + 1 >= iv["s"]) & (i + 1 <= iv["e"]),
        ),
    )
    return out.select(
        "doc_id",
        *passthrough,
        F.size("tk").cast("long").alias("tokens_before"),
        F.when(F.col("ivs").isNull(), F.size("tk"))
        .otherwise(F.size(kept))
        .cast("long")
        .alias("tokens_after"),
        F.coalesce(F.col("spans_cut"), F.lit(0)).alias("spans_cut"),
        F.when(F.col("ivs").isNull(), F.col("_orig"))
        .otherwise(F.array_join(kept, " "))
        .alias("text"),
    )


def gram_occurrences(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw (gh, doc_id, pos) k-gram occurrence stream with NO frequency
    filter — the q197 deletion fold re-derives a resurrected duplicate's
    occurrences with this before the touched-gram recompute (grams below
    the index's min_count are absent from storage by design)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    )
    return _gram_stream(tok, k)


def span_occurrence_index(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The at-rest OCCURRENCE-GRAIN ExactSubstr index: (gh, doc_id, pos,
    cut) for every k-gram occurrence whose gram occurs >= min_count
    times corpus-wide — `cut` is the :func:`cut_duplicated_spans`
    predicate (non-first occurrence under the (doc_id, pos) total
    order). This is what :func:`span_gram_index`'s count table cannot
    give a DELETION fold: removing documents decrements counts AND
    shifts first-occurrence ranks, both of which can UN-cut surviving
    occurrences — recomputing that exactly needs the surviving
    occurrences of every touched gram, which this index stores.

    The storage contract mirrors Lee et al.'s suffix array: O(corpus
    tokens) rows, but text-free (15-byte gram hash + two integers + a
    flag), partitionable by gh for the touched-gram probe and by doc_id
    for the per-doc rewrite. Grams below min_count are excluded — a
    deletion only ever LOWERS counts, so an excluded gram can never
    become cut, and a resurrected duplicate's re-derived occurrences
    are unioned in before the touched-gram recompute (q197).

    Scale shape: identical to the cut itself — one scan-side gram
    expansion, one gh-keyed exchange reused by the count and rank
    windows, no text past the projection."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(whitespace_tokens(F.col(text_col)), lambda x: x != "").alias(
            "tk"
        ),
    )
    g = _gram_stream(tok, k)
    w_cnt = Window.partitionBy("gh")
    w_first = Window.partitionBy("gh").orderBy("doc_id", "pos")
    return (
        g.withColumn("cnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("rk", F.row_number().over(w_first))
        .where(F.col("cnt") >= min_count)
        .select(
            "gh",
            "doc_id",
            "pos",
            (F.col("rk") >= 2).alias("cut"),
        )
    )
