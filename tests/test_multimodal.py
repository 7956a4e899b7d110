"""Multimodal plumbing tests: schema, Arrow batch shape, stub behaviors."""

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(50):
        payload = bytes([i % 251]) * (100 + i)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, modality, f"application/x-{modality}", payload, 32, 24, float(i % 7 + 1))
        )
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_images_fake_deterministic(media):
    out1 = MM.decode_images(media).orderBy("media_id").collect()
    out2 = MM.decode_images(media).orderBy("media_id").collect()
    assert out1 == out2
    assert len(out1) == 50
    r = out1[0]
    assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
    assert len(r["features"]) == 8
    assert all(0.0 <= v <= 1.0 for v in r["features"])


def test_decode_schema(media):
    out = MM.decode_images(media)
    assert out.schema == MM.IMAGE_FEATURES_SCHEMA


def test_strict_stub_raises(media):
    with pytest.raises(Exception) as exc:
        MM.decode_images(media, decoder="strict").collect()
    assert "NotImplementedError" in str(exc.value) or "Pillow" in str(exc.value)


def test_frame_sampling_explodes_by_duration(media):
    frames = MM.sample_video_frames(media, every_s=1.0)
    pdf = frames.groupBy("media_id").count().toPandas().set_index("media_id")["count"]
    durations = {
        r["media_id"]: int(r["meta_duration_s"])
        for r in media.filter(F.col("modality") == "video").collect()
    }
    for mid, dur in durations.items():
        assert pdf[mid] == max(dur, 1)


def test_media_stats(media):
    stats = {r["modality"]: r for r in MM.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert all(r["null_payloads"] == 0 for r in stats.values())
    assert all(r["total_bytes"] > 0 for r in stats.values())
