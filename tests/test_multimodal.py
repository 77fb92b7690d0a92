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


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_offsets(media):
    frames = frame_sample(media.limit(5), every_n_bytes=64).toPandas()
    assert (frames["byte_offset"] % 64 == 0).all()
    g = frames.groupby("media_id")["frame_idx"].apply(list)
    for idxs in g:
        assert idxs == list(range(len(idxs)))
