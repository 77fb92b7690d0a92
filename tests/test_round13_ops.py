"""Round-13 operator tests: the incremental-curation kernels behind
q192 (VERDICT r12 item 1). The load-bearing contracts are differential
— incremental-against-at-rest-artifacts must HASH-EQUAL the scratch
recompute — plus planted fixtures for the two ways base state can
change (a new benchmark document contaminating an old doc; the budget
boundary moving), which the stock fixtures exercise only thinly."""

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.dedup import (
    contaminated_ids,
    doc_shingle_keys,
    shingle_keys,
)
from eurostat_energy_etl_pipeline_spark.operators.substrings import (
    cut_duplicated_spans,
    span_gram_index,
)

SF_DIR = "/root/testdata/sf0.001"

# 8-token spans for the k=8 cut; tokens chosen so no span repeats by
# accident across the filler sentences.
SPAN_A = "alpha beta gamma delta epsilon zeta eta theta"
SPAN_B = "one two three four five six seven eight"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE_ROWS = [
    (1, f"intro words here {SPAN_A} closing base remark number ten"),
    (2, f"other leading text {SPAN_A} different tail follows here now"),
    (3, "completely unique base document with plain filler content inside"),
    (4, "another standalone base document nothing repeated anywhere at all"),
]
DELTA_ROWS = [
    # repeats SPAN_A: only occurrence IN THE BATCH, so a batch-only cut
    # would keep it — the at-rest gram index is what cuts it
    (10, f"fresh batch prefix {SPAN_A} fresh batch suffix words"),
    # SPAN_B repeats within the batch only: first kept, second cut
    (11, f"batch doc start {SPAN_B} batch doc end marker"),
    (12, f"later batch text {SPAN_B} entirely different ending tokens"),
    (13, "untouched new document with its own vocabulary only"),
]


def test_incremental_span_cut_matches_full_recompute(spark):
    """cut_duplicated_spans(base_gram_index=...) over the batch alone
    must reproduce the full-corpus rewrite exactly: base docs are
    provably invariant under append-only ingest (every earlier
    occurrence is in the base), so full == base-cut UNION batch-cut."""
    base = _docs(spark, BASE_ROWS)
    delta = _docs(spark, DELTA_ROWS)
    full = {
        r["doc_id"]: (r["text"], r["tokens_after"], r["spans_cut"])
        for r in cut_duplicated_spans(
            base.unionByName(delta), k=8, min_count=2
        ).collect()
    }
    idx = span_gram_index(base, k=8)
    incr = {
        r["doc_id"]: (r["text"], r["tokens_after"], r["spans_cut"])
        for r in cut_duplicated_spans(base, k=8, min_count=2)
        .unionByName(
            cut_duplicated_spans(delta, k=8, min_count=2, base_gram_index=idx)
        )
        .collect()
    }
    assert incr == full
    # the planted semantics actually fired: doc 10's span was cut via
    # the INDEX (no second batch occurrence exists), doc 11 kept the
    # batch-first SPAN_B occurrence, doc 12 lost it, doc 13 untouched
    assert incr[10][2] == 1 and SPAN_A not in incr[10][0]
    assert incr[11][2] == 0 and SPAN_B in incr[11][0]
    assert incr[12][2] == 1 and SPAN_B not in incr[12][0]
    assert incr[13][2] == 0


def test_incremental_span_cut_min_count_3_uses_base_counts(spark):
    """The gram index carries OCCURRENCE COUNTS, not bare existence, so
    min_count > 2 stays exact: a gram seen once in the base and once in
    the batch reaches corpus count 2 < 3 (kept), while a gram seen
    twice in the base and once in the batch reaches 3 (batch copy cut —
    its corpus rank is n_occ + 1 >= 2)."""
    base = _docs(
        spark,
        [
            (1, f"padding start words {SPAN_A} padding end words here"),
            (2, f"more padding tokens {SPAN_A} other trailing words now"),
            (3, f"single base copy {SPAN_B} never repeated in base"),
        ],
    )
    delta = _docs(
        spark,
        [
            (10, f"batch copy of {SPAN_A} should be cut here"),
            (11, f"batch copy of {SPAN_B} must survive the cut"),
        ],
    )
    full = {
        r["doc_id"]: r["spans_cut"]
        for r in cut_duplicated_spans(
            base.unionByName(delta), k=8, min_count=3
        ).collect()
    }
    incr = {
        r["doc_id"]: r["spans_cut"]
        for r in cut_duplicated_spans(
            delta, k=8, min_count=3, base_gram_index=span_gram_index(base, k=8)
        ).collect()
    }
    assert incr == {d: full[d] for d in (10, 11)}
    assert incr[10] == 1  # SPAN_A corpus count 3 -> cut
    assert incr[11] == 0  # SPAN_B corpus count 2 < 3 -> kept


def test_contaminated_ids_keys_path_equals_text_path(spark):
    """benchmark_keys= (the at-rest shingle index) must select exactly
    the ids the benchmark-text path selects."""
    corpus = _docs(spark, BASE_ROWS + DELTA_ROWS)
    bench = _docs(
        spark,
        [
            (100, f"exam question mentions {SPAN_A} verbatim"),
            (101, "benchmark text sharing nothing with anything"),
        ],
    )
    via_text = {
        r["doc_id"]
        for r in contaminated_ids(corpus, bench, k=4).collect()
    }
    via_keys = {
        r["doc_id"]
        for r in contaminated_ids(
            corpus, benchmark_keys=shingle_keys(bench, k=4), k=4
        ).collect()
    }
    assert via_keys == via_text
    assert via_keys == {1, 2, 10}  # every doc carrying SPAN_A


def test_contaminated_ids_requires_exactly_one_benchmark_side(spark):
    corpus = _docs(spark, BASE_ROWS)
    bench = _docs(spark, [(100, "whatever text")])
    with pytest.raises(ValueError):
        contaminated_ids(corpus)
    with pytest.raises(ValueError):
        contaminated_ids(
            corpus, bench, benchmark_keys=shingle_keys(bench, k=4)
        )


def test_doc_shingle_index_reverse_probe_finds_new_contamination(spark):
    """The q192 stage-5 mechanism: a NEW benchmark document's shingle
    keys probe the at-rest doc-shingle index and surface exactly the
    old docs it newly contaminates — no old-corpus re-scan."""
    old_corpus = _docs(spark, BASE_ROWS)
    idx = doc_shingle_keys(old_corpus, k=4)
    new_bench = _docs(spark, [(200, f"new eval item quotes {SPAN_B} exactly")])
    hit = {
        r["doc_id"]
        for r in idx.join(
            F.broadcast(shingle_keys(new_bench, k=4)), "_g", "left_semi"
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert hit == set()  # SPAN_B absent from the base corpus
    new_bench2 = _docs(
        spark, [(201, f"new eval item quotes {SPAN_A} exactly")]
    )
    hit2 = {
        r["doc_id"]
        for r in idx.join(
            F.broadcast(shingle_keys(new_bench2, k=4)), "_g", "left_semi"
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert hit2 == {1, 2}


def test_span_gram_index_counts(spark):
    """n_occ is the corpus occurrence count per gram hash — the rank
    offset the incremental cut shifts by."""
    docs = _docs(
        spark,
        [
            (1, SPAN_A),  # exactly one 8-gram
            (2, SPAN_A),  # same gram again
            (3, SPAN_B),
        ],
    )
    idx = {r["gh"]: r["n_occ"] for r in span_gram_index(docs, k=8).collect()}
    assert sorted(idx.values()) == [1, 2]


def test_q193_media_funnel_every_stage_acts(spark, tmp_path):
    """Planted media corpus where EVERY funnel stage drops something
    (the stock sf0.01 fixture has no media dups, so stages 3-4 are
    pass-through there): a short payload and a zero-entropy padding
    payload die at byte_quality, an exact byte-duplicate dies at
    exact_dedup, and a STRICT near-dup chain A~B~C (A!~C — only
    transitive clustering can merge it, the q186 fixture) collapses to
    its smallest-id member at near_dedup. Both engines replay it."""
    import duckdb

    from eurostat_energy_etl_pipeline_spark.plans import ORACLE
    from eurostat_energy_etl_pipeline_spark.plans.northstar import q193
    from tests.test_round12_ops import _write_documents

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        * 8
    )

    def flip(s, positions):
        bb = bytearray(s.encode())
        for p in positions:
            bb[p] = 33 + ((bb[p] + 40 - 33) % 94)
        return bb.decode()

    a_txt = base
    b_txt = flip(base, [0, 9])          # hamming(A,B) == 2
    c_txt = flip(base, [0, 9, 30, 39])  # hamming(B,C) == 2, (A,C) == 4
    rows = [
        # all doc_id % 3 == 0 -> 'image' (near pairs are within-type)
        (0, a_txt, "en", "s1"),
        (3, b_txt, "en", "s1"),
        (6, c_txt, "en", "s1"),
        (9, a_txt, "en", "s1"),      # exact byte dup of 0 -> stage 3
        (12, "short payload under sixtyfour", "en", "s1"),  # stage 2 (L)
        (15, "a" * 400, "en", "s1"),  # stage 2 (zero entropy)
    ]
    total = sum(len(r[1].encode()) for r in rows)
    _write_documents(spark, tmp_path, rows)
    got = {
        r["stage"]: (r["label"], r["items"], r["bytes"])
        for r in q193(spark, str(tmp_path)).collect()
    }
    L = len(base.encode())
    assert got == {
        1: ("input", 6, total),
        2: ("byte_quality", 4, 4 * L),   # 12 and 15 dropped
        3: ("exact_dedup", 3, 3 * L),    # 9 dropped
        4: ("near_dedup", 1, L),         # chain keeps smallest id only
        5: ("shard_pack", 1, L),         # one 64 KiB shard
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    ora = con.execute(ORACLE["q193_media_funnel"]).fetch_df()
    assert {
        int(r.stage): (r.label, int(r.items), int(r.bytes))
        for r in ora.itertuples()
    } == got


def test_q194_containment_directional(spark, tmp_path):
    """Planted asymmetry: source A has 2 distinct 3-shingles, source B
    has 1, they share exactly 1 — so C(A->B) = 0.5 while C(B->A) = 1.0
    (B is fully contained in A; the directionality is the point of the
    operator). A third source shares nothing and must not pair."""
    import duckdb

    from eurostat_energy_etl_pipeline_spark.plans import ORACLE
    from eurostat_energy_etl_pipeline_spark.plans.corpus import q194
    from tests.test_round12_ops import _write_documents

    rows = [
        (1, "alpha beta gamma delta", "en", "srcA"),  # 2 shingles
        (2, "beta gamma delta", "en", "srcB"),        # 1 shingle (shared)
        (3, "totally different words here", "en", "srcC"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        (r["src_a"], r["src_b"]): (
            r["a_shingles"],
            r["shared_shingles"],
            r["containment"],
        )
        for r in q194(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("srcA", "srcB"): (2, 1, 0.5),
        ("srcB", "srcA"): (1, 1, 1.0),
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    ora = con.execute(ORACLE["q194_source_containment"]).fetch_df()
    assert {
        (r.src_a, r.src_b): (
            int(r.a_shingles),
            int(r.shared_shingles),
            float(r.containment),
        )
        for r in ora.itertuples()
    } == got


def test_q195_incremental_media_bridge_and_flip(spark, tmp_path):
    """The two ways base media can change under append-only ingest,
    staged on one fixture: a new item BRIDGES two old clusters ({A,B}
    and {D,E} merge through F, so old keeper D flips kept->dropped —
    old_flipped must count exactly it), and exact-dup probes drop one
    old copy and one new copy of A. The fixture self-validates its
    planted hamming topology via the signature kernel before asserting
    funnel output, and the DuckDB scratch recompute must agree."""
    import duckdb

    from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
        media_signatures,
        media_table,
    )
    from eurostat_energy_etl_pipeline_spark.plans import ORACLE
    from eurostat_energy_etl_pipeline_spark.plans.northstar import q195
    from tests.test_round12_ops import _write_documents

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        * 8
    )

    def flip(s, positions):
        bb = bytearray(s.encode())
        for p in positions:
            bb[p] = 33 + ((bb[p] + 40 - 33) % 94)
        return bb.decode()

    a_txt = base
    b_txt = flip(base, [0, 9])              # A~B (hamming 2)
    d_txt = flip(base, [30, 39, 78, 112])   # D: 4 from A, 6 from B
    e_txt = flip(d_txt, [130, 200])         # D~E (hamming 2); 6+ from A/B
    f_txt = flip(base, [0, 30, 39])         # F: 3 from each of A, B, D
    # byte-diverse so its entropy clears the 4.0-bit quality gate
    un = (
        "Unrelated payload #42: MIXED casing, digits 0123456789, symbols "
        "&%$@!; plus Zebra, Quartz, Jukebox, VeXing glyphs? " * 4
    )
    # cut = (33 * 9) // 10 = 29 -> F(30) and H(33) are the ingest batch
    rows = [
        (0, a_txt, "en", "s1"),
        (3, b_txt, "en", "s1"),
        (6, d_txt, "en", "s1"),
        (9, e_txt, "en", "s1"),
        (12, un, "en", "s1"),
        (15, a_txt, "en", "s1"),   # old exact dup of A
        (30, f_txt, "en", "s1"),   # new: bridges {A,B} and {D,E}
        (33, a_txt, "en", "s1"),   # new exact dup of A -> index probe
    ]
    _write_documents(spark, tmp_path, rows)
    # fixture self-validation: the planted hamming topology must hold
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    sig = {
        r["media_id"]: r["ahash"]
        for r in media_signatures(media_table(docs)).collect()
    }
    ham = lambda x, y: bin(sig[x] ^ sig[y]).count("1")  # noqa: E731
    assert ham(0, 3) <= 3 and ham(6, 9) <= 3            # old pairs
    assert ham(30, 3) <= 3 and ham(30, 6) <= 3          # the bridge
    assert ham(0, 6) > 3 and ham(3, 6) > 3              # no old A-D link
    assert ham(0, 9) > 3 and ham(3, 9) > 3              # nor A/B-E
    got = {
        r["stage"]: (r["label"], r["items"], r["bytes"], r["delta_items"],
                     r["old_flipped"])
        for r in q195(spark, str(tmp_path)).collect()
    }
    L = len(base.encode())
    U = len(un.encode())
    assert got == {
        1: ("input", 8, 7 * L + U, 2, 0),
        2: ("byte_quality", 8, 7 * L + U, 2, 0),
        3: ("exact_dedup", 6, 5 * L + U, 1, 0),   # 15 and 33 dropped
        # {A,B,D,E,F} merge through F; equal sizes -> keep A; D flips
        4: ("near_dedup", 2, L + U, 0, 1),
        5: ("shard_pack", 1, L + U, 0, 0),        # one image shard
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    ora = con.execute(ORACLE["q195_incremental_media"]).fetch_df()
    assert {
        int(r.stage): (r.label, int(r.items), int(r.bytes),
                       int(r.delta_items), int(r.old_flipped))
        for r in ora.itertuples()
    } == got


def test_hamming_probe_pairs_equals_batch_slice_of_full_join(spark):
    """The at-rest band-index probe must produce exactly the
    cross-partition slice of the full self-join: pairs(old ∪ new)
    restricted to (old, new) == probe(bands(old), new)."""
    from eurostat_energy_etl_pipeline_spark.operators.dedup import (
        hamming_band_pairs,
        hamming_bands,
        hamming_probe_pairs,
    )

    old = spark.createDataFrame(
        [(1, 0b1111), (2, 0b1100), (3, 0b0011_0000_0000_0000_0000)],
        "id long, sig long",
    )
    new = spark.createDataFrame(
        [(10, 0b1110), (11, 0b0011_0000_0000_0000_0001)],
        "id long, sig long",
    )
    kw = dict(id_col="id", sig_col="sig", sig_bits=60, band_bits=15)
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_band_pairs(old.unionByName(new), **kw).collect()
        if r["id_a"] < 10 and r["id_b"] >= 10
    }
    probed = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_probe_pairs(
            hamming_bands(old, **kw), new, **kw
        ).collect()
    }
    assert probed == full and probed  # non-empty and identical


def test_q195_equals_q193_on_shared_stage_accounting(spark):
    """Merge-equals-recompute, in-repo: the incremental media funnel's
    (items, bytes) per stage must equal the batch funnel q193's on the
    same corpus — different execution paths, same answer."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    scratch = {
        r["stage"]: (r["label"], r["items"], r["bytes"])
        for r in QUERIES["q193_media_funnel"](spark, SF_DIR).collect()
    }
    incr = {
        r["stage"]: (r["label"], r["items"], r["bytes"])
        for r in QUERIES["q195_incremental_media"](spark, SF_DIR).collect()
    }
    assert incr == scratch


def test_q192_equals_q185_on_shared_stage_accounting(spark):
    """The merge-equals-recompute differential, in-repo: the
    incremental funnel's (docs, tokens, chars) per stage must equal the
    batch funnel q185's — same corpus, same knobs, different
    execution paths (q185 recomputes from scratch; q192 folds the top
    10% of doc_ids into at-rest artifacts of the bottom 90%)."""
    from eurostat_energy_etl_pipeline_spark.plans import QUERIES, load_all

    load_all()
    scratch = {
        r["stage"]: (r["label"], r["docs"], r["tokens"], r["chars"])
        for r in QUERIES["q185_curation_funnel"](spark, SF_DIR).collect()
    }
    incr = {
        r["stage"]: (r["label"], r["docs"], r["tokens"], r["chars"])
        for r in QUERIES["q192_incremental_funnel"](spark, SF_DIR).collect()
    }
    assert incr == scratch
