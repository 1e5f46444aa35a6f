"""Multimodal plumbing: schema, Arrow batch shape, stub gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arkouda_njit_spark.functions import (
    extract_features,
    generate_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return generate_media(spark, n=60, seed=42).persist()


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "data": "binary",
        "meta": "map<string,string>",
    }
    assert media.count() == 60


def test_extract_features_fake(media):
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] == 64
        v = np.array(r["feature"])
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-5)
    # deterministic across partitionings
    again = extract_features(media.repartition(7), dim=16)
    a = {r["media_id"]: tuple(r["feature"]) for r in rows}
    b = {r["media_id"]: tuple(r["feature"]) for r in again.collect()}
    assert a == b


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as exc:
        extract_features(media, dim=8, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_resize_images_meta(media):
    out = resize_images(media, 224, 224)
    rows = out.collect()
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    assert all(dict(r["meta"])["resized_to"] == "224x224" for r in rows)


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_n_bytes=16)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() == n_videos * 4  # 64 bytes / 16
    assert frames.groupBy("media_id").count().filter(F.col("count") != 4).count() == 0
