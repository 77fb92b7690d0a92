"""Planted-duplicate fixtures for the dedup family: exact, fingerprint,
MinHash+LSH recall/precision, SimHash hamming, shingle Jaccard."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators import dedup as D
from eurostat_energy_etl_pipeline_spark.operators.text import fingerprint

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = BASE.replace("lazy dog", "lazy hound")  # one-token change
FAR = "completely different content about spark shuffle partitions and adaptive query execution at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text=BASE),
        Row(doc_id=1, text=BASE),  # exact dup of 0
        Row(doc_id=2, text=NEAR),  # near dup of 0/1
        Row(doc_id=3, text=FAR),
        Row(doc_id=4, text="  " + BASE.upper() + "  "),  # case/space variant
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(docs):
    assert D.exact_dedup(docs.select("text")).count() == 4


def test_hash_groups(docs):
    groups = D.hash_dup_groups(docs).toPandas()
    assert groups["n_docs"].sum() == 5
    dup = groups[groups["n_docs"] > 1]
    assert len(dup) == 1 and dup["canonical_id"].iloc[0] == 0


def test_fingerprint_catches_case_and_space(docs):
    fp = docs.select(fingerprint(F.col("text")).alias("fp")).toPandas()["fp"]
    # 0, 1 and 4 share a fingerprint; 2 and 3 are distinct
    assert fp.nunique() == 3


def test_minhash_lsh_finds_planted_pair(docs):
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in found  # exact dup always survives
    assert (0, 2) in found or (1, 2) in found  # near dup
    # jaccard on the exact pair is 1.0
    assert pairs.set_index(["id_a", "id_b"]).loc[(0, 1), "jacc"] == 1.0
    # unrelated doc never pairs with anything
    assert not any(3 in p for p in found)


def test_simhash_identical_and_near(docs):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", D.simhash(F.col("text")).alias("sig")
        ).collect()
    }
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    ham = bin((sigs[0] ^ sigs[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    # one token changed out of ~24: well below the ~32 expected for
    # unrelated docs (short docs have small per-bit margins, so not tiny)
    assert ham <= 20
    pairs = D.simhash_near_dup_pairs(docs, max_hamming=3).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in found
    assert pairs.set_index(["id_a", "id_b"]).loc[(0, 1), "hamming"] == 0


def test_ngram_jaccard_consecutive(docs):
    out = D.ngram_jaccard_pairs(docs).toPandas().set_index(["id_a", "id_b"])
    assert out.loc[(0, 1), "jacc"] == 1.0
    assert 0.5 < out.loc[(1, 2), "jacc"] < 1.0  # near dup
    assert out.loc[(2, 3), "jacc"] == 0.0  # unrelated


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="one two")])
    sh = df.select(D.token_shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert sh == ["one two"]  # whole-doc shingle when shorter than k


def test_incremental_index_probe(spark, tmp_path, docs):
    """write_minhash_index + match_against_index: a new batch containing an
    exact copy and a near-dup of corpus text must match; novel text must
    not. The probe never re-reads corpus text."""
    from pyspark.sql import Row

    idx = str(tmp_path / "nd_index")
    D.write_minhash_index(docs, idx)
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=BASE),  # exact copy of corpus 0/1
            Row(doc_id=101, text=NEAR.replace("cat", "kitten")),  # near dup
            Row(doc_id=102, text="novel text about watermarked state stores"),
        ]
    )
    hits = D.match_against_index(spark, batch, idx, threshold=0.5).toPandas()
    matched_new = set(hits["new_id"])
    assert 100 in matched_new  # exact copy always collides and verifies
    assert 102 not in matched_new  # novel content stays clean
    assert (hits["jacc"] >= 0.5).all()
    exact = hits[(hits["new_id"] == 100) & (hits["corpus_id"] == 0)]
    assert len(exact) == 1 and exact["jacc"].iloc[0] == 1.0


def test_incremental_probe_clean_batch_empty(spark, tmp_path, docs):
    idx = str(tmp_path / "nd_index2")
    D.write_minhash_index(docs, idx)
    clean = spark.createDataFrame(
        [(200, "entirely fresh sentence with zero overlap tokens qqq www eee")],
        ["doc_id", "text"],
    )
    assert D.match_against_index(spark, clean, idx).count() == 0


def test_row_fold_signature_equals_aggregate_signature(spark, docs):
    """minhash_signature_col (streaming-safe per-row fold) must produce
    bit-identical signatures to minhash_signatures (batch explode+agg)."""
    agg = D.minhash_signatures(docs).toPandas().set_index("id")["sig"]
    fold = (
        docs.select(
            F.col("doc_id").alias("id"),
            D.minhash_signature_col(F.col("text")).alias("sig"),
        )
        .toPandas()
        .set_index("id")["sig"]
    )
    assert set(agg.index) == set(fold.index)
    for i in agg.index:
        assert list(agg[i]) == list(fold[i]), f"doc {i} signatures diverge"


def test_dup_span_coverage_planted(spark):
    # d10/d11 share one 8-gram region; d11's copy sits mid-doc. d12 repeats
    # an 8-gram WITHIN itself only — must not count (cross-doc requires two
    # distinct ids). d13 is short (<8 tokens) — no spans, coverage 0.
    # d14/d15 share a 9-token run — two overlapping 8-grams that must merge
    # into ONE island covering 9 tokens, not 16.
    shared8 = "alpha beta gamma delta epsilon zeta eta theta"
    run9 = shared8 + " iota"
    rows = [
        Row(doc_id=10, text=shared8 + " filler1 filler2"),
        Row(doc_id=11, text="pre1 pre2 " + shared8 + " post1"),
        Row(doc_id=12, text="self1 self2 " + " ".join(["loop"] * 20)),
        Row(doc_id=13, text="tiny doc only six tokens here"),
        Row(doc_id=14, text=run9 + " tail1 tail2"),
        Row(doc_id=15, text="lead1 " + run9),
    ]
    out = {
        r["id"]: r
        for r in D.dup_span_coverage(spark.createDataFrame(rows), k=8).collect()
    }
    assert out[10]["covered_tokens"] >= 8 and out[10]["n_tokens"] == 10
    assert out[11]["covered_tokens"] >= 8
    assert out[12]["covered_tokens"] == 0  # within-doc repeats don't count
    assert out[13]["covered_tokens"] == 0 and out[13]["dup_coverage"] == 0.0
    # the 9-token shared run merges into one island of exactly 9
    assert out[14]["n_spans"] >= 1
    covered_14 = out[14]["covered_tokens"]
    assert covered_14 >= 9  # overlapping grams merged, 9-token union...
    assert covered_14 < 16  # ...never double-counted
    assert out[15]["covered_tokens"] >= 9
    assert abs(out[10]["dup_coverage"] - out[10]["covered_tokens"] / 10) < 1e-9


def test_prefix_jaccard_join_is_exact(spark, docs):
    """prefix_jaccard_join must equal the brute-force all-pairs Jaccard
    join: zero false negatives (the prefix-filter lemma) and zero false
    positives (the verify stage) at any threshold."""
    import itertools
    import math

    extra = docs.union(
        spark.createDataFrame(
            [
                (10, BASE.replace("quick brown", "slow red")),
                (11, "the quick brown fox jumps over the fence"),
                (12, FAR + " with an extra tail of tokens"),
            ],
            schema=docs.schema,
        )
    )
    sets = {
        r["doc_id"]: frozenset(r["s"])
        for r in extra.select(
            "doc_id",
            F.array_distinct(D.token_shingles(F.col("text"), 3)).alias("s"),
        ).collect()
    }
    for t in (0.3, 0.8):
        got = {
            (r["id_a"], r["id_b"]): r["jacc"]
            for r in D.prefix_jaccard_join(extra, threshold=t, k=3).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            j = math.floor(j * 1e6 + 0.5) / 1e6
            if j >= t:
                want[(a, b)] = j
        assert got == want, f"threshold {t}: {got} != {want}"


def _index_state(spark, path):
    bands = spark.read.parquet(f"{path}/bands").select("id", "band_idx", "band_hash")
    sh = spark.read.parquet(f"{path}/shingles").select("id", "shset")
    return (
        sorted(map(tuple, bands.collect())),
        sorted((r["id"], tuple(sorted(r["shset"]))) for r in sh.collect()),
    )


def test_merge_into_minhash_index_differential(spark, tmp_path):
    """Incremental maintenance must land on EXACTLY the index a from-scratch
    build over the post-state corpus produces: adds, text updates, and
    tombstones (including tombstones-win-over-upserts inside one batch,
    and a bucket emptied entirely by tombstones)."""
    docs = spark.createDataFrame(
        [(i, f"{BASE} variant token_{i} tail_{i * 7 % 13}") for i in range(24)],
        ["doc_id", "text"],
    )
    base = docs.where(F.col("doc_id") < 16)
    inc = str(tmp_path / "inc")
    D.write_minhash_index(base, inc, num_buckets=8)
    assert D.read_index_meta(inc)["num_buckets"] == 8

    # batch: adds 16..19 (buckets 0..3 only), update 3 and 5 with new text,
    # tombstone 5 (wins over its own upsert), 7, and 6+14 — the only base
    # members of bucket 6, which no add refills, so bucket 6 empties.
    upserts = (
        docs.where((F.col("doc_id") >= 16) & (F.col("doc_id") < 20))
        .unionByName(
            docs.where(F.col("doc_id").isin(3, 5)).select(
                "doc_id", F.concat("text", F.lit(" zzz updated")).alias("text")
            )
        )
    )
    audit = D.merge_into_minhash_index(
        spark, inc, upserts=upserts, tombstone_ids=[5, 7, 6, 14]
    )
    assert audit["n_tombstones"] == 4
    assert audit["n_upserts"] == 5  # 4 adds + update of 3 (5's lost to tomb)

    state = docs.where(
        (F.col("doc_id") < 20) & ~F.col("doc_id").isin(5, 7, 6, 14)
    ).withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.concat("text", F.lit(" zzz updated"))).otherwise(
            F.col("text")
        ),
    )
    scratch = str(tmp_path / "scratch")
    D.write_minhash_index(state, scratch, num_buckets=8)
    assert _index_state(spark, inc) == _index_state(spark, scratch)

    # emptied bucket's partition directory is gone, not stale
    import os

    assert not os.path.exists(f"{inc}/shingles/bucket=6")

    # the maintained index still probes correctly
    probe = spark.createDataFrame(
        [(900, f"{BASE} variant token_3 tail_{3 * 7 % 13} zzz updated")],
        ["doc_id", "text"],
    )
    hits = D.match_against_index(spark, probe, inc, threshold=0.5).toPandas()
    assert (
        len(hits[(hits["new_id"] == 900) & (hits["corpus_id"] == 3)]) == 1
        and hits.set_index(["new_id", "corpus_id"]).loc[(900, 3), "jacc"] == 1.0
    )


def test_merge_minhash_tombstone_only_batch(spark, tmp_path, docs):
    idx = str(tmp_path / "tombonly")
    D.write_minhash_index(docs, idx, num_buckets=4)
    audit = D.merge_into_minhash_index(spark, idx, tombstone_ids=[0, 1])
    assert audit["n_upserts"] == 0 and audit["n_tombstones"] == 2
    remaining = {r["id"] for r in spark.read.parquet(f"{idx}/shingles").collect()}
    assert remaining == {2, 3, 4}


def test_edit_distance_join_is_exact(spark):
    """edit_distance_join must equal brute-force all-pairs levenshtein —
    including across the short-string boundary (len < 2*seg_len+1), where
    pairs must flow through the shared '#SHORT' bucket, and for indels
    (suffix keys align from the end, so a mid-string insert still agrees
    on one segment)."""
    import itertools

    names = [
        "alphabet soup kitchen",   # long: substitution partner below
        "alphabet soup kitchee",   # ED1 substitution (suffix differs)
        "alphabet soup kitchens",  # ED1 insertion at the end
        "xlphabet soup kitchen",   # ED1 substitution (prefix differs)
        "alphabet sxup kitchen",   # ED1 substitution mid-string
        "totally different name",
        "shortstr",                # short bucket (len 8 < 9)
        "shortstx",                # ED1 of shortstr
        "shortst",                 # ED1 deletion, also short
        "borderly1",               # len 9 = boundary: emits segments AND #SHORT
        "borderly",                # len 8: short; pairs with borderly1 across the seam
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], ["id", "name"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in D.edit_distance_join(
            df, max_dist=1, seg_len=4, id_col="id", text_col="name"
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {}
    for a, b in itertools.combinations(range(len(names)), 2):
        d = lev(names[a], names[b])
        if d <= 1:
            want[(a, b)] = d
    assert got == want, f"{got} != {want}"


def test_edit_distance_join_rejects_max_dist_above_one(spark):
    """The two-segment pigeonhole is only exact for d=1 (two edits can
    touch both the prefix and the suffix key) — an operator documented
    as EXACT must refuse rather than silently drop candidates."""
    df = spark.createDataFrame([(0, "abcdefghij")], ["id", "name"])
    with pytest.raises(ValueError, match="max_dist=1"):
        D.edit_distance_join(df, max_dist=2)


def test_merge_into_minhash_index_upserts_only_no_tombstones(spark, tmp_path):
    """Regression (r11): tombstone_ids=None exercised the pandas
    empty-frame schema inference, which raises CANNOT_INFER_EMPTY_SCHEMA
    on this pyspark — an adds-only maintenance batch must work."""
    docs = spark.createDataFrame(
        [(i, f"{BASE} variant token_{i}") for i in range(12)],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "addsonly")
    D.write_minhash_index(docs.where(F.col("doc_id") < 8), idx, num_buckets=4)
    audit = D.merge_into_minhash_index(
        spark, idx, upserts=docs.where(F.col("doc_id") >= 8)
    )
    assert audit["n_upserts"] == 4 and audit["n_tombstones"] == 0
    got = {
        r["id"]
        for r in spark.read.parquet(f"{idx}/bands").select("id").distinct().collect()
    }
    assert got == set(range(12))
