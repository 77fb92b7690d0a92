"""Round-14 tests: multi-tick closure for the incremental curation
funnel (VERDICT r13 item 1) and restart-safety of the fold from at-rest
parquet storage (VERDICT r13 item 6).

The load-bearing contracts are differential: folding two batches one at
a time through `fold_funnel_batch` must land on EXACTLY the state a
scratch `build_funnel_state` over the union produces — with planted
rows that force every cross-tick artifact path to act (a b2 doc deduped
against a b1 hash, a b2 span cut by a gram b1 introduced, a b2
benchmark doc contaminating a b1 doc) — and the fold must behave
identically whether its input state is warm localCheckpoint leaves or
tables re-loaded from parquet (a restarted pipeline has only the
latter)."""

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.text import (
    whitespace_tokens,
)
from eurostat_energy_etl_pipeline_spark.plans.funnel import (
    build_funnel_state,
    fold_funnel_batch,
)

SF_DIR = "/root/testdata/sf0.001"

# 8-token spans for the k=8 cut (no accidental repeats in filler text)
SPAN_A = "alpha beta gamma delta epsilon zeta eta theta"
SPAN_B = "one two three four five six seven eight"

META_COLS = [
    "doc_id",
    "lang",
    "n_tok_norm",
    "chars_norm",
    "tokens_after",
    "chars_cut",
    "q_i",
    "score_i",
    "contam",
]


def _slice(spark, rows):
    """(doc_id, text) rows -> the `_FUNNEL_INPUT_COLS` contract the
    funnel-state builders consume (mirrors `_funnel_input`)."""
    df = spark.createDataFrame(rows or [], "doc_id long, text string")
    ntok = F.size(
        F.filter(whitespace_tokens(F.col("ntext")), lambda x: x != "")
    ).cast("long")
    return (
        df.select(
            "doc_id",
            F.lit("en").alias("lang"),
            F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias(
                "ntext"
            ),
        )
        .withColumn("chars_norm", F.length("ntext").cast("long"))
        .withColumn("n_tok_norm", ntok)
    )


def _meta_rows(state, drop_delta=True):
    cols = META_COLS if drop_delta else META_COLS + ["is_delta"]
    return sorted(
        tuple(r[c] for c in cols)
        for r in state["meta"].select(*cols, "is_delta").collect()
    )


BASE_TRAIN = [
    (1, f"intro words here {SPAN_A} closing base remark number ten"),
    (2, "completely unique base document with plain filler content inside"),
    (3, "shared duplicate body text that reappears verbatim much later"),
]
BASE_BENCH = [(97, "benchmark paragraph about solar capacity factors")]
B1_TRAIN = [
    # same hash as base doc 3: dropped by the A1 probe in tick 1
    (10, "shared duplicate body text that reappears verbatim much later"),
    # introduces SPAN_B (corpus-first occurrence, kept in tick 1)
    (11, f"batch one opens {SPAN_B} batch one closes here"),
    # carries the 4-token shingle the TICK-2 benchmark will quote
    (12, "the quarterly wind generation report shows steady growth"),
]
B1_BENCH = []
B2_TRAIN = [
    # same hash as b1 doc 11: dedup must consult tick 1's MERGED A1
    (20, f"batch one opens {SPAN_B} batch one closes here"),
    # repeats SPAN_B: corpus count 2 only via tick 1's MERGED gram index
    (21, f"batch two text {SPAN_B} with a different ending"),
    # repeats SPAN_A from the BASE: the original index carried forward
    (22, f"batch two prefix {SPAN_A} batch two suffix words"),
    (23, "entirely novel final document with unique closing vocabulary"),
]
B2_BENCH = [
    # quotes doc 12's shingle: must flip doc 12 via tick 1's MERGED A4
    (294, "analysts cite the quarterly wind generation report findings")
]


def _two_tick(spark):
    s0 = build_funnel_state(
        _slice(spark, BASE_TRAIN), _slice(spark, BASE_BENCH)
    )
    s1, flips1 = fold_funnel_batch(
        s0, _slice(spark, B1_TRAIN), _slice(spark, B1_BENCH)
    )
    s2, flips2 = fold_funnel_batch(
        s1, _slice(spark, B2_TRAIN), _slice(spark, B2_BENCH)
    )
    return s1, s2, flips1, flips2


def test_two_tick_fold_equals_scratch_state(spark):
    """fold(fold(base, b1), b2) == scratch over base ∪ b1 ∪ b2, on the
    full artifact state: metadata (the determinant of every downstream
    stage), the gram index, the exact-hash index, and the doc-shingle
    index. The planted rows force each cross-tick path: doc 20 dedups
    against a TICK-1 hash, doc 21's span is cut only because tick 1's
    gram merge carried SPAN_B's count, doc 22's span is cut via the
    base index carried through two merges, and bench 294 contaminates
    tick-1 doc 12 through the merged doc-shingle index."""
    _s1, s2, _f1, flips2 = _two_tick(spark)
    scratch = build_funnel_state(
        _slice(spark, BASE_TRAIN + B1_TRAIN + B2_TRAIN),
        _slice(spark, BASE_BENCH + B1_BENCH + B2_BENCH),
    )
    assert _meta_rows(s2) == _meta_rows(scratch)
    for key in ("hash_idx", "gram_idx", "doc_sh_idx", "bench_keys"):
        assert sorted(map(tuple, s2[key].collect())) == sorted(
            map(tuple, scratch[key].collect())
        ), key

    meta = {r["doc_id"]: r for r in s2["meta"].collect()}
    assert 10 not in meta and 20 not in meta  # cross-tick hash dedup
    assert meta[21]["tokens_after"] == meta[21]["n_tok_norm"] - 8  # b1 gram
    assert meta[22]["tokens_after"] == meta[22]["n_tok_norm"] - 8  # base gram
    assert meta[11]["tokens_after"] == meta[11]["n_tok_norm"]  # first copy
    assert meta[12]["contam"]  # flipped by the tick-2 benchmark
    assert [r["doc_id"] for r in flips2.collect()] == [12]


def test_fold_with_empty_batch_is_identity_on_state(spark):
    """Folding an empty tick (no new docs, no new benchmark) must leave
    every artifact semantically unchanged — the no-op day."""
    s0 = build_funnel_state(
        _slice(spark, BASE_TRAIN), _slice(spark, BASE_BENCH)
    )
    s1, flips = fold_funnel_batch(s0, _slice(spark, []), _slice(spark, []))
    assert flips.count() == 0
    assert _meta_rows(s1) == _meta_rows(s0)
    for key in ("hash_idx", "gram_idx", "doc_sh_idx", "bench_keys"):
        assert sorted(map(tuple, s1[key].collect())) == sorted(
            map(tuple, s0[key].collect())
        ), key


def test_fold_from_parquet_reload_matches_warm_fold(spark, tmp_path):
    """Restart safety (VERDICT r13 item 6): the in-session artifacts are
    localCheckpoint leaves, which a driver restart LOSES — a real
    pipeline reloads them from storage. Write every tick-1 artifact to
    parquet, reload, fold tick 2 from the reloaded tables, and require
    the result to match the warm-leaf fold exactly (state AND flip
    certificate)."""
    s1, s2, _f1, flips2 = _two_tick(spark)
    reloaded = {}
    for key, df in s1.items():
        path = str(tmp_path / key)
        df.write.mode("overwrite").parquet(path)
        reloaded[key] = spark.read.parquet(path)
    r2, rflips2 = fold_funnel_batch(
        reloaded, _slice(spark, B2_TRAIN), _slice(spark, B2_BENCH)
    )
    assert _meta_rows(r2, drop_delta=False) == _meta_rows(
        s2, drop_delta=False
    )
    for key in ("hash_idx", "gram_idx", "doc_sh_idx", "bench_keys"):
        assert sorted(map(tuple, r2[key].collect())) == sorted(
            map(tuple, s2[key].collect())
        ), key
    assert sorted(r["doc_id"] for r in rflips2.collect()) == sorted(
        r["doc_id"] for r in flips2.collect()
    )


# ---------------------------------------------------------------------------
# q197 deletion fold — planted fixtures forcing every non-monotone path
# ---------------------------------------------------------------------------

TX = f"copy body text {SPAN_A} end marker"  # SPAN_A at token 4, 13 tokens

DEL_TRAIN = [
    # SPAN_B's corpus-FIRST occurrence; deleting doc 2 drops the gram's
    # count to 1, so doc 3's cut occurrence must UN-cut (count drop)
    (2, f"early doc holds {SPAN_B} and some filler words"),
    (3, f"later doc repeats {SPAN_B} trailing tokens differ"),
    # exact-dup group {5, 9, 12}: deleting keeper 5 must resurrect 9
    # (and ONLY 9 — 12 stays shadowed)
    (5, TX),
    # shares SPAN_A with the group: doc 5 held rank 1, so doc 7 was
    # cut; after the delete doc 7 takes rank 1 (UN-cut via rank shift)
    # and the resurrected doc 9 (larger id) takes rank 2 (cut)
    (7, f"middle document quotes {SPAN_A} more words after"),
    (9, TX),
    (12, TX),
    (14, "standalone untouched document with plain words only here"),
]
DEL_BENCH = [
    # 4-token shingle inside SPAN_A: doc 7's grown-back text must
    # become NEWLY contaminated after the delete
    (100, "benchmark cites alpha beta gamma delta verbatim today")
]
DEL_IDS = [2, 5]


def _del_setup(spark):
    from eurostat_energy_etl_pipeline_spark.operators.dedup import (
        shingle_keys,
    )
    from eurostat_energy_etl_pipeline_spark.plans import at_rest
    from eurostat_energy_etl_pipeline_spark.plans.funnel import (
        build_deletion_state,
        fold_deletion,
    )

    bench_keys = at_rest(
        shingle_keys(
            _slice(spark, DEL_BENCH).select(F.col("ntext").alias("text")),
            k=4,
        )
    )
    train = _slice(spark, DEL_TRAIN)
    del_ids = spark.createDataFrame(
        [(i,) for i in DEL_IDS], "doc_id long"
    )
    state = build_deletion_state(train, bench_keys)
    new_state, extras = fold_deletion(state, train, bench_keys, del_ids)
    return state, new_state, extras, bench_keys


def test_deletion_fold_equals_scratch_on_survivors(spark):
    """Incremental delete == delete-then-recompute, on the full
    artifact state: metadata, the occurrence index (per-occurrence cut
    flags included), and the hash map — with planted rows forcing
    resurrection, count-drop un-cut, rank-shift un-cut, and grown-back
    contamination simultaneously."""
    from eurostat_energy_etl_pipeline_spark.plans.funnel import (
        build_deletion_state,
    )

    state, new_state, extras, bench_keys = _del_setup(spark)
    survivors = [r for r in DEL_TRAIN if r[0] not in DEL_IDS]
    scratch = build_deletion_state(_slice(spark, survivors), bench_keys)
    assert _meta_rows(new_state) == _meta_rows(scratch)
    for key in ("hash_map", "occ_idx"):
        assert sorted(map(tuple, new_state[key].collect())) == sorted(
            map(tuple, scratch[key].collect())
        ), key


def test_deletion_fold_planted_non_monotone_effects(spark):
    """The specific planted semantics all fired: doc 9 resurrected
    (doc 12 still shadowed), doc 3 un-cut by the count drop, doc 7
    un-cut by the rank shift AND newly contaminated by the restored
    shingle, the resurrected doc 9 cut at rank 2."""
    state, new_state, extras, _bench = _del_setup(spark)
    m0 = {r["doc_id"]: r for r in state["meta"].collect()}
    m1 = {r["doc_id"]: r for r in new_state["meta"].collect()}

    # before: keeper 5 kept SPAN_A (rank 1) and was contaminated;
    # doc 7 lost its 8-token span (rank 2) and was clean
    assert set(m0) == {2, 3, 5, 7, 14}
    assert m0[5]["tokens_after"] == m0[5]["n_tok_norm"] and m0[5]["contam"]
    assert m0[7]["tokens_after"] == m0[7]["n_tok_norm"] - 8
    assert not m0[7]["contam"]
    assert m0[3]["tokens_after"] == m0[3]["n_tok_norm"] - 8

    # after the fold
    assert set(m1) == {3, 7, 9, 14}  # 2,5 deleted; 9 resurrected; 12 shadowed
    assert [r["doc_id"] for r in extras["res"].collect()] == [9]
    assert m1[3]["tokens_after"] == m1[3]["n_tok_norm"]  # count-drop un-cut
    assert m1[7]["tokens_after"] == m1[7]["n_tok_norm"]  # rank-shift un-cut
    assert m1[7]["contam"]  # grown-back text newly contaminates
    assert m1[9]["tokens_after"] == m1[9]["n_tok_norm"] - 8  # rank-2 cut
    assert m1[14]["tokens_after"] == m1[14]["n_tok_norm"]  # untouched
    assert not m1[14]["is_delta"]  # carried over, not re-written


# ---------------------------------------------------------------------------
# q200 lifecycle — append fold then delete fold over one artifact set
# ---------------------------------------------------------------------------

DUPTXT = "plain duplicate content shared across the append boundary here"
LC_BASE = [
    (1, DUPTXT),
    (3, f"base document carries {SPAN_B} before the append happens"),
    (5, "independent base document with nothing repeated anywhere at all"),
]
LC_BATCH = [
    # duplicates BASE doc 1: shadowed by the append's hash probe; the
    # later DELETE of doc 1 must resurrect it (cross-operation path 1)
    (21, DUPTXT),
    # repeats BASE doc 3's span: the append must cut it using the STORED
    # rank-1 occurrence (min_count=1 storage); the later DELETE of doc 3
    # must UN-cut it (cross-operation path 2)
    (23, f"appended document repeats {SPAN_B} after the append happens"),
    (25, "freshly appended document with its own unique vocabulary only"),
]
LC_DEL = [1, 3]


def _lc_setup(spark):
    from eurostat_energy_etl_pipeline_spark.operators.dedup import (
        shingle_keys,
    )
    from eurostat_energy_etl_pipeline_spark.plans import at_rest
    from eurostat_energy_etl_pipeline_spark.plans.funnel import (
        build_deletion_state,
        fold_deletion,
        fold_deletion_append,
    )

    bench_keys = at_rest(
        shingle_keys(
            _slice(spark, DEL_BENCH).select(F.col("ntext").alias("text")),
            k=4,
        )
    )
    s0 = build_deletion_state(_slice(spark, LC_BASE), bench_keys)
    s1 = fold_deletion_append(s0, _slice(spark, LC_BATCH), bench_keys)
    full = _slice(spark, LC_BASE + LC_BATCH)
    del_ids = spark.createDataFrame([(i,) for i in LC_DEL], "doc_id long")
    s2, extras = fold_deletion(s1, full, bench_keys, del_ids)
    return s1, s2, extras, bench_keys


def test_append_fold_equals_scratch_state(spark):
    """fold_deletion_append(build(base), batch) == build(base ∪ batch)
    on every artifact — hash map, occurrence index (cut flags
    included), metadata. The planted rows force the stored-rank path
    (doc 23 cut via base doc 3's stored rank-1 occurrence) and the
    cross-boundary hash shadow (doc 21)."""
    from eurostat_energy_etl_pipeline_spark.plans.funnel import (
        build_deletion_state,
    )

    s1, _s2, _ex, bench_keys = _lc_setup(spark)
    scratch = build_deletion_state(
        _slice(spark, LC_BASE + LC_BATCH), bench_keys
    )
    assert _meta_rows(s1) == _meta_rows(scratch)
    for key in ("hash_map", "occ_idx"):
        assert sorted(map(tuple, s1[key].collect())) == sorted(
            map(tuple, scratch[key].collect())
        ), key
    m1 = {r["doc_id"]: r for r in s1["meta"].collect()}
    assert 21 not in m1  # shadowed across the append boundary
    assert m1[23]["tokens_after"] == m1[23]["n_tok_norm"] - 8  # stored rank
    assert m1[3]["tokens_after"] == m1[3]["n_tok_norm"]  # base rank-1 kept


def test_delete_after_append_equals_scratch_on_survivors(spark):
    """The full lifecycle: fold_delete(fold_append(build(base), b)) ==
    build((base ∪ b) ∖ tombstones) — deleting base docs must resurrect
    a BATCH duplicate (doc 21) and UN-cut a BATCH row whose cut was
    caused by a base occurrence (doc 23), i.e. the two folds' artifact
    shapes compose exactly."""
    from eurostat_energy_etl_pipeline_spark.plans.funnel import (
        build_deletion_state,
    )

    _s1, s2, extras, bench_keys = _lc_setup(spark)
    survivors = [r for r in LC_BASE + LC_BATCH if r[0] not in LC_DEL]
    scratch = build_deletion_state(_slice(spark, survivors), bench_keys)
    assert _meta_rows(s2) == _meta_rows(scratch)
    for key in ("hash_map", "occ_idx"):
        assert sorted(map(tuple, s2[key].collect())) == sorted(
            map(tuple, scratch[key].collect())
        ), key
    m2 = {r["doc_id"]: r for r in s2["meta"].collect()}
    assert set(m2) == {5, 21, 23, 25}
    assert [r["doc_id"] for r in extras["res"].collect()] == [21]
    assert m2[23]["tokens_after"] == m2[23]["n_tok_norm"]  # un-cut
    assert m2[21]["tokens_after"] == m2[21]["n_tok_norm"]


def test_q200_equals_q197_row_for_row(spark):
    """The registered lifecycle query must equal q197 on every column:
    both report the same delete against the same full-corpus state —
    q197 scratch-builds it, q200 reaches it through the append fold."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    scratch_path = sorted(
        map(tuple, QUERIES["q197_deletion_fold"](spark, SF_DIR).collect())
    )
    lifecycle = sorted(
        map(tuple, QUERIES["q200_lifecycle_fold"](spark, SF_DIR).collect())
    )
    assert lifecycle == scratch_path


def test_media_fold_from_parquet_reload_matches_warm_fold(spark, tmp_path):
    """Restart safety at media grain: write every tick-1 media artifact
    (stats, keeper table, band index, pair list) to parquet, reload,
    fold tick 2 from the reloaded tables, and require the merged state
    AND the derived keep-list to match the warm-leaf fold exactly."""
    from eurostat_energy_etl_pipeline_spark.catalog import load_tables
    from eurostat_energy_etl_pipeline_spark.plans.northstar import (
        build_media_state,
        fold_media_batch,
        media_keep,
        media_table,
    )

    media = media_table(load_tables(spark, SF_DIR)["documents"])
    max_id = media.agg(F.max("media_id")).first()[0]
    cut = (max_id * 9) // 10
    s0 = build_media_state(media.where(F.col("media_id") <= cut))
    batch = media.where(F.col("media_id") > cut)
    warm = fold_media_batch(s0, batch)
    reloaded = {}
    for key, df in s0.items():
        path = str(tmp_path / key)
        df.write.mode("overwrite").parquet(path)
        reloaded[key] = spark.read.parquet(path)
    cold = fold_media_batch(reloaded, batch)
    for key in ("stats", "dd", "bands", "pairs"):
        assert sorted(map(tuple, cold[key].collect())) == sorted(
            map(tuple, warm[key].collect())
        ), key
    assert sorted(
        r["media_id"] for r in media_keep(cold).collect()
    ) == sorted(r["media_id"] for r in media_keep(warm).collect())


def test_q198_equals_q194_row_for_row(spark):
    """The containment fold lands on the batch recompute exactly:
    q198 (at-rest memberships + pair counts + totals, delta folded via
    the disjoint-union decomposition) must equal q194 (full-corpus
    scratch matrix) on every row — both run the same sf0.001 corpus,
    q198 splitting it 90/10 by doc_id."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    scratch = sorted(
        map(tuple, QUERIES["q194_source_containment"](spark, SF_DIR).collect())
    )
    folded = sorted(
        map(
            tuple,
            QUERIES["q198_incremental_containment"](spark, SF_DIR).collect(),
        )
    )
    assert folded == scratch


def test_q199_equals_q195_row_for_row(spark):
    """Media-grain closure: q199's two-tick fold must equal q195's
    one-shot fold on every column (stage accounting, delta_items,
    old_flipped vs the 90% state) — fold(fold(base, b1), b2) ==
    fold(base, b1 ∪ b2), which with each query's scratch oracle closes
    the composition triangle at media grain."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    one_shot = sorted(
        map(tuple, QUERIES["q195_incremental_media"](spark, SF_DIR).collect())
    )
    two_tick = sorted(
        map(tuple, QUERIES["q199_multitick_media"](spark, SF_DIR).collect())
    )
    assert two_tick == one_shot


def test_q196_equals_q192_row_for_row(spark):
    """fold(fold(base, b1), b2) == fold(base, b1 ∪ b2) on the REGISTERED
    queries: q196's two-tick report must equal q192's one-shot fold on
    every column — same stage accounting, same delta_docs (both count
    the top-10% batch), same old_flipped certificates (both measure
    flips against the 90%-cutoff state). Together with each query's own
    scratch-recompute oracle this closes the composition triangle."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    one_shot = sorted(
        map(tuple, QUERIES["q192_incremental_funnel"](spark, SF_DIR).collect())
    )
    two_tick = sorted(
        map(tuple, QUERIES["q196_multitick_funnel"](spark, SF_DIR).collect())
    )
    assert two_tick == one_shot
