from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_crawling_prj_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    resize_images,
    sample_video_frames,
    synth_media_udf,
)


@pytest.fixture(scope="module")
def media(spark):
    return (
        spark.range(30)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod("id", F.lit(3)).cast("int").alias("mtype"),
        )
        .withColumn("media", synth_media_udf("doc_id", "mtype"))
        .drop("mtype")
        .cache()
    )


def test_decode_metadata(media):
    out = decode_metadata(media)
    rows = out.collect()
    assert len(rows) == 30
    assert {r.media_type for r in rows} == {"image", "audio", "video"}
    assert all(16 <= r.width <= 512 and 16 <= r.height <= 512 for r in rows)
    assert all(r.payload_bytes == 17 + 64 for r in rows)
    # determinism: same doc_id → same metadata
    again = {r.doc_id: (r.width, r.height) for r in decode_metadata(media).collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_extract_features_unit_norm(media):
    out = extract_features(media, dim=16).collect()
    assert all(len(r.feature) == 16 for r in out)
    norms = [sum(x * x for x in r.feature) for r in out]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)


def test_resize_clamps_dims(media):
    resized = decode_metadata(resize_images(media, max_side=64))
    assert resized.where((F.col("width") > 64) | (F.col("height") > 64)).count() == 0
    # aspect ratio preserved within rounding
    orig = {r.doc_id: (r.width, r.height) for r in decode_metadata(media).collect()}
    for r in resized.collect():
        ow, oh = orig[r.doc_id]
        rel = abs((r.width / r.height) / (ow / oh) - 1.0)
        assert rel < 0.5  # integer rounding dominates at tiny resized dims


def test_sample_video_frames(media):
    frames = sample_video_frames(media, every_ms=5000)
    rows = frames.groupBy("doc_id").agg(F.count("*").alias("n"), F.first("duration_ms").alias("d")).collect()
    assert len(rows) == 10  # only the video third
    for r in rows:
        assert r.n == max(1, (max(r.d - 1, 0)) // 5000 + 1)
