"""Semantic invariants for the round-9 operators — properties the driver's
oracle fixtures don't independently exercise: the sorted-neighborhood
block join's exactly-once/window-completeness, the Bloom filter's
one-sided guarantee, HLL's error envelope and register-merge law, and the
PCA power iteration against an independent numpy replication."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_sorted_neighborhood_equals_rank_window_bruteforce(spark):
    """Every pair within rank distance w must surface exactly once from
    the block equi-join — compared against a brute-force enumeration of
    the rank windows (including pairs spanning a block boundary)."""
    from eurostat_energy_etl_pipeline_spark.operators.ranking import (
        global_row_number,
    )

    names = [
        (i, n)
        for i, n in enumerate(
            ["apple", "appla", "banana", "bananna", "cherry", "cherrx",
             "aaple", "zzz", "zza", "zzb", "mango", "mangoo", "mang"]
        )
    ]
    df = spark.createDataFrame(names, ["id", "nm"])
    base = df.select("id", "nm", F.lower("nm").alias("key"))
    w = 3
    ranked = global_row_number(base, ["key", "id"], out_col="r").select(
        "id", "nm", "r", F.floor((F.col("r") - 1) / w).alias("blk")
    )
    left = ranked.select(
        F.col("id").alias("id_a"), F.col("r").alias("ra"),
        F.col("blk").alias("jb"),
    )
    right = ranked.select(
        F.col("id").alias("id_b"), F.col("r").alias("rb"),
        F.explode(F.array(F.col("blk"), F.col("blk") - 1)).alias("jb"),
    )
    got = [
        (r["id_a"], r["id_b"])
        for r in left.join(right, "jb")
        .where((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w))
        .collect()
    ]
    rank_of = {r["id"]: r["r"] for r in ranked.collect()}
    want = [
        (a, b)
        for a in rank_of
        for b in rank_of
        if 0 < rank_of[b] - rank_of[a] <= w
    ]
    assert sorted(got) == sorted(want)  # complete AND exactly-once
    assert len(got) == len(set(got))


def test_bloom_filter_never_prunes_a_true_match(spark, queries=None):
    """The one-sided CMS/Bloom guarantee: every key inserted into the
    bitmap must pass the probe — pruning a true match would make the
    q138 plan silently lossy. Probed with the same salted md5-prefix
    hash grid the query uses, over adversarial key shapes."""
    m, k = 1024, 3

    def h(col, i):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(f"#{i}"))),
                    1, 15,
                ), 16, 10,
            ).cast("long"),
            F.lit(m),
        )

    keys = spark.createDataFrame(
        [(x,) for x in [0, 1, 63, 64, 1023, 1024, 2**31, 2**40 + 7, 999983]],
        ["key"],
    )
    kh = keys.select(*[h(F.col("key"), i).alias(f"h{i}") for i in range(k)])
    bits = None
    for i in range(k):
        part = kh.select(
            F.expr(f"h{i} div 32").alias("w"),
            (F.col(f"h{i}") % 32).cast("int").alias("bit"),
        )
        bits = part if bits is None else bits.unionByName(part)
    bm = bits.groupBy("w").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("v")
    )
    probe = keys.select(
        "key", *[h(F.col("key"), i).alias(f"h{i}") for i in range(k)]
    )
    cand = probe
    for i in range(k):
        bmi = bm.select(F.col("w").alias(f"w{i}"), F.col("v").alias(f"v{i}"))
        cand = cand.join(
            F.broadcast(bmi),
            (F.expr(f"h{i} div 32") == F.col(f"w{i}"))
            & (F.expr(f"shiftright(v{i}, CAST(h{i} % 32 AS INT)) & 1") == 1),
        ).drop(f"w{i}", f"v{i}")
    assert cand.count() == keys.count()  # no inserted key is ever pruned


def test_hll_error_envelope_and_merge_law(spark):
    """(a) The q136 estimate lands within the 3-sigma HLL envelope
    (sigma = 1.04/sqrt(m)) on the fixture corpus; (b) register-wise max
    of two half-corpus sketches equals the whole-corpus sketch — the
    mergeability that makes HLL a per-shard sidecar."""
    qs = entry_mod.queries()
    row = qs["q136_hll_audit"](spark, SF_DIR).collect()[0]
    sigma = 1.04 / math.sqrt(row["m"])
    assert abs(row["rel_err"]) <= 3 * sigma, row

    from eurostat_energy_etl_pipeline_spark.catalog import load_tables
    from eurostat_energy_etl_pipeline_spark.operators.text import (
        whitespace_tokens,
    )

    docs = load_tables(spark, SF_DIR)["documents"]
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(whitespace_tokens(F.col("text")), lambda x: x != "")
        ).alias("tk"),
    )

    def registers(token_df):
        h = token_df.select(
            F.conv(F.substring(F.md5("tk"), 1, 15), 16, 10)
            .cast("long")
            .alias("hv")
        ).distinct()
        rem = F.col("hv") % F.lit(18014398509481984)
        r = h.select(
            F.expr("hv div 18014398509481984").cast("int").alias("reg"),
            F.when(rem == 0, F.lit(55))
            .otherwise(F.instr(F.lpad(F.bin(rem), 54, "0"), "1").cast("int"))
            .alias("rho"),
        )
        return {
            row["reg"]: row["mr"]
            for row in r.groupBy("reg").agg(F.max("rho").alias("mr")).collect()
        }

    whole = registers(tok.select("tk"))
    a = registers(tok.where(F.col("doc_id") % 2 == 0).select("tk"))
    b = registers(tok.where(F.col("doc_id") % 2 == 1).select("tk"))
    merged = {
        reg: max(a.get(reg, 0), b.get(reg, 0)) for reg in set(a) | set(b)
    }
    assert merged == whole


def test_pca_power_matches_numpy_replication(spark):
    """q127's loadings replayed independently: numpy builds the gramian
    from the same 1e-12-gridded products and runs the same three
    integer-grid power steps — loadings and eigenvalue must agree to the
    presentation grid. (Catches any Spark-side aggregation or driver
    arithmetic drift without trusting the production code path.)"""
    import pyarrow.parquet as pq

    qs = entry_mod.queries()
    got = {
        r["pos"]: (r["loading"], r["eigenvalue"])
        for r in qs["q127_pca_power"](spark, SF_DIR).collect()
    }
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    d = X.shape[1]

    def g12(x):
        return math.floor(x * 1e12 + 0.5) / 1e12

    # exact decimal fold == exact sum of 1e-12-grid values: replay with
    # integer accumulation to avoid float-order effects
    Gi = np.zeros((d, d), dtype=object)
    for row in X:
        for i in range(d):
            Gi[i] = Gi[i] + np.array(
                [int(math.floor(row[i] * row[j] * 1e12 + 0.5)) for j in range(d)],
                dtype=object,
            )
    G = np.array([[float(Gi[i][j]) / 1e12 for j in range(d)] for i in range(d)])
    v = [g12(1.0 / math.sqrt(d))] * d
    nrm = 0.0
    for _ in range(3):
        x = [
            sum(int(math.floor(G[i][j] * v[j] * 1e12 + 0.5)) for j in range(d))
            / 1e12
            for i in range(d)
        ]
        nrm = math.sqrt(
            sum(int(math.floor(xi * xi * 1e12 + 0.5)) for xi in x) / 1e12
        )
        v = [math.floor(xi / nrm * 1e12 + 0.5) / 1e12 for xi in x]
    for pos in range(d):
        want = math.floor(v[pos] * 1e6 + 0.5) / 1e6
        assert got[pos][0] == pytest.approx(want, abs=2e-6), pos
    assert got[0][1] == pytest.approx(math.floor(nrm * 1e4 + 0.5) / 1e4, abs=2e-4)


def test_weighted_quantiles_match_pure_python(spark):
    """q135's integer-threshold definition replayed in pure python over
    the same parquet — certifies the distributed prefix-sum path against
    a trivially-correct sequential fold."""
    import pyarrow.parquet as pq

    qs = entry_mod.queries()
    row = qs["q135_weighted_quantiles"](spark, SF_DIR).collect()[0]
    t = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_extendedprice", "l_orderkey", "l_linenumber", "l_quantity"],
    ).to_pandas()
    recs = sorted(
        zip(t["l_extendedprice"], t["l_orderkey"], t["l_linenumber"],
            t["l_quantity"].astype(int))
    )
    W = sum(r[3] for r in recs)
    assert row["total_weight"] == W

    def quantile(num, den):
        cw = 0
        for price, _, _, wt in recs:
            cw += wt
            if cw * den >= W * num:
                return price
        raise AssertionError

    assert row["wmedian"] == quantile(1, 2)
    assert row["wp90"] == quantile(9, 10)


def test_q139_canonical_rendering_is_injective(spark, tmp_path):
    """The r10 fix for the r9 ADVICE aliasing classes: a '|' inside text
    must not realign field boundaries, and a NULL must not silently drop
    a field (concat_ws skips NULLs). Two crafted row pairs that alias
    under the old rendering must checksum differently now, and both rows
    of each pair must still count."""
    from eurostat_energy_etl_pipeline_spark.plans.corpus import q139

    rows = [
        # old aliasing class 1: '|' migrates between adjacent fields
        (1, "a|b", "c", "s1", 3),
        (2, "a", "b|c", "s1", 3),
        # old aliasing class 2: NULL skipped by concat_ws shifts fields
        (3, None, "xx", "s2", 7),
        (4, "xx", None, "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["source"]: r
        for r in q139(spark, str(tmp_path)).collect()
    }
    assert out["s1"]["n_rows"] == 2 and out["s2"]["n_rows"] == 2
    # injectivity: within each pair the two rows hash differently, so the
    # per-source checksum cannot equal 2x either row's hash; cheapest
    # observable proof — recompute each single row's checksum alone.
    import hashlib

    def h(doc_id, text, lang, source, n_chars):
        def f(v):
            return "~N" if v is None else f"{len(str(v))}:{v}"
        canon = "|".join([f(doc_id), f(text), f(lang), f(source), f(n_chars)])
        return int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)

    assert int(out["s1"]["checksum"]) == h(*rows[0]) + h(*rows[1])
    assert int(out["s2"]["checksum"]) == h(*rows[2]) + h(*rows[3])
    assert h(*rows[0]) != h(*rows[1])
    assert h(*rows[2]) != h(*rows[3])
