"""Multimodal plumbing invariants: schema, determinism, batch shape, the
stubbed decoder contract."""

import pytest
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_image,
    extract_features,
    frame_sample,
    media_table,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_table(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "media_type",
        "format",
        "n_bytes",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_media_types_partition(media):
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_extract_features_schema_and_rows(media):
    feats = extract_features(media.limit(50))
    assert feats.schema == FEATURE_SCHEMA
    pdf = feats.toPandas()
    assert len(pdf) == 50
    assert all(len(f) == 8 for f in pdf["features"])


def test_features_deterministic(media):
    a = extract_features(media.limit(20)).toPandas().sort_values("media_id")
    b = extract_features(media.limit(20)).toPandas().sort_values("media_id")
    assert a["features"].apply(tuple).tolist() == b["features"].apply(tuple).tolist()


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL present: real decode active")
def test_decode_without_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


@pytest.mark.skipif(not _pil_available(), reason="PIL not in this container")
def test_decode_image_real_pil(spark):
    """Gated end-to-end check of the real decode path: a synthetic 4x2
    gradient PNG round-trips through decode_image and the decoder='pil'
    mapInPandas kernel with the documented (width, height, dim-band
    features) contract."""
    import io

    import PIL.Image

    from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    img = PIL.Image.new("L", (4, 2))
    img.putdata([0, 64, 128, 255, 0, 64, 128, 255])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()

    w, h, feats = decode_image(payload, dim=4)
    assert (w, h) == (4, 2)
    assert len(feats) == 4
    # band means follow the horizontal gradient
    assert feats[0] < feats[1] < feats[2] < feats[3]

    media = spark.createDataFrame(
        [(1, bytearray(payload), "image", "png", len(payload))],
        schema="media_id long, payload binary, media_type string, "
        "format string, n_bytes long",
    )
    row = extract_features(media, decoder="pil").first()
    assert (row["width"], row["height"]) == (4, 2)
    assert len(row["features"]) == 8


def test_frame_sample_offsets(media):
    frames = frame_sample(media.limit(5), every_n_bytes=64).toPandas()
    assert (frames["byte_offset"] % 64 == 0).all()
    g = frames.groupby("media_id")["frame_idx"].apply(list)
    for idxs in g:
        assert idxs == list(range(len(idxs)))


def test_ahash_dhash_kernel_properties():
    """Kernel edges: empty payload -> 0/0; identical payloads -> equal
    signatures; a uniform payload has no above-mean chunk (ahash 0) and
    no gradient (dhash 0); signatures are non-negative int64 (< 2^60)."""
    import numpy as np

    from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
        ahash_dhash_kernel,
    )

    payload = np.array(
        [b"", b"\x05" * 100, b"hello world " * 20, b"hello world " * 20],
        dtype=object,
    )
    ah, dh = ahash_dhash_kernel(payload)
    assert ah[0] == 0 and dh[0] == 0
    assert ah[1] == 0 and dh[1] == 0  # uniform bytes: no bit set
    assert (ah[2], dh[2]) == (ah[3], dh[3])  # identical bytes, equal sigs
    assert all(0 <= int(x) < (1 << 60) for x in ah)
    assert all(0 <= int(x) < (1 << 59) for x in dh)


def test_media_dedup_planted_duplicates(spark):
    """Recall pin for the binary dedup tiers: byte-identical payloads are
    found by BOTH tiers (sha group + hamming-0 pair); a payload with one
    byte flipped lands within hamming<=3 of its source (near tier);
    unrelated payloads produce no near pair."""
    from eurostat_energy_etl_pipeline_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
        PERCEPTUAL_HASH_BITS,
        media_signatures,
    )

    base = b"The quick brown fox jumps over the lazy dog. " * 10
    near = bytearray(base)
    near[7] = ord("X")  # one byte: at most a few chunk means move
    rows = [
        (1, bytes(base), "image", "raw", len(base)),
        (2, bytes(base), "image", "raw", len(base)),   # exact dup of 1
        (3, bytes(near), "image", "raw", len(near)),   # near dup of 1
        (4, bytes(reversed(base)), "image", "raw", len(base)),
        (5, b"completely unrelated bytes %s" % bytes(range(200)),
         "image", "raw", 228),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, format string,"
        " n_bytes long",
    )
    sigs = media_signatures(media)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(
            sigs,
            id_col="media_id",
            sig_col="ahash",
            sig_bits=PERCEPTUAL_HASH_BITS,
            band_bits=15,
            max_hamming=3,
            key_cols=("media_type",),
        ).collect()
    }
    assert pairs.get((1, 2)) == 0, pairs  # exact dup: hamming 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 3, pairs  # near dup found
    assert (1, 5) not in pairs and (2, 5) not in pairs
    # exact tier: one sha group with 2 members
    ex = (
        media.groupBy(F.sha2("payload", 256).alias("bh"))
        .count()
        .where(F.col("count") >= 2)
        .collect()
    )
    assert len(ex) == 1 and ex[0]["count"] == 2


def test_byte_quality_kernel_properties():
    """Byte-quality edges: empty -> 0/0/0; uniform bytes -> entropy 0,
    one distinct byte; a 256-value ramp -> exactly 8 bits; printable
    ratio counts ASCII 32-126 only."""
    import numpy as np

    from eurostat_energy_etl_pipeline_spark.operators.multimodal import (
        byte_quality_kernel,
    )

    payload = np.array(
        [b"", b"\x05" * 64, bytes(range(256)), b"AB\x00\x01"],
        dtype=object,
    )
    lens, ent, dis, pr = byte_quality_kernel(payload)
    assert list(lens) == [0, 64, 256, 4]
    assert ent[0] == 0 and dis[0] == 0 and pr[0] == 0.0
    assert ent[1] == 0.0 and dis[1] == 1 and pr[1] == 0.0  # 0x05 < 32
    assert abs(ent[2] - 8.0) < 1e-12 and dis[2] == 256
    assert abs(pr[2] - 95 / 256) < 1e-12  # bytes 32..126 inclusive
    assert dis[3] == 4 and abs(pr[3] - 0.5) < 1e-12
