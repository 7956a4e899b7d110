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


def _png_encode(pixels) -> bytes:
    """Minimal spec-correct PNG writer (8-bit RGB, filter None, one IDAT).
    Driver-side test helper; stdlib only — Pillow is not in this container."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_png_decoder():
    """REAL image decode (PNG container + zlib inflate + unfilter) for
    injection as the codec.  Returned as a CLOSURE so cloudpickle ships it
    by value — a module-level test function would pickle by reference and
    executors cannot import the test module."""

    def png_decoder(payload: bytes) -> dict:
        import struct
        import zlib

        assert payload[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
        pos, idat, w, h = 8, b"", None, None
        while pos < len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w, h, bit, ctype = struct.unpack(">IIBB", data[:10])
                assert (bit, ctype) == (8, 2), "test codec handles 8-bit RGB only"
            elif typ == b"IDAT":
                idat += data
        raw = zlib.decompress(idat)
        stride = 1 + 3 * w
        px = []
        for y in range(h):
            row = raw[y * stride : (y + 1) * stride]
            assert row[0] == 0, "filter None only"
            px.append(
                [(row[1 + 3 * x], row[2 + 3 * x], row[3 + 3 * x]) for x in range(w)]
            )
        n = w * h * 255.0
        means = [sum(p[c] for r in px for p in r) / n for c in range(3)]
        return {"width": w, "height": h, "features": means}

    return png_decoder


def test_decode_images_real_codec_roundtrip(spark):
    """VERDICT r4 task 6: the injected-callable path with a REAL codec — a
    tiny generated PNG decoded on executors (Arrow-batched mapInPandas),
    exact dimensions + per-channel means recovered."""
    colors = {0: (255, 0, 0), 1: (0, 128, 0), 2: (10, 20, 30)}
    rows = [
        (i, "image", "image/png", _png_encode([[c] * 4 for _ in range(3)]), 4, 3, 0.0)
        for i, c in colors.items()
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in MM.decode_images(media, decoder=_make_png_decoder()).collect()
    }
    assert len(out) == 3
    for i, c in colors.items():
        r = out[i]
        assert (r["width"], r["height"]) == (4, 3)
        for got, want in zip(r["features"], [v / 255.0 for v in c]):
            assert abs(got - want) < 1e-9


def test_resize_images_real_codec_roundtrip(spark):
    """Injected resizer: PNG decode → nearest-neighbour resample → PNG
    re-encode, then decode the RESIZED payload again to prove the bytes
    coming back through the binary column are a valid image at the target
    size with the source color preserved."""

    def _resizer(payload: bytes, target) -> bytes:
        import struct
        import zlib

        pos, idat, w, h = 8, b"", None, None
        while pos < len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                w, h = struct.unpack(">II", data[:8])
            elif typ == b"IDAT":
                idat += data
        raw = zlib.decompress(idat)
        stride = 1 + 3 * w
        tw, th = target
        out_rows = []
        for ty in range(th):
            sy = ty * h // th
            row = raw[sy * stride : (sy + 1) * stride]
            out_rows.append(
                [tuple(row[1 + 3 * (tx * w // tw) + c] for c in range(3)) for tx in range(tw)]
            )

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", tw, th, 8, 2, 0, 0, 0)
        body = b"".join(
            b"\x00" + bytes(v for px in r for v in px) for r in out_rows
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b"")
        )

    src = _png_encode([[(40, 80, 120)] * 8 for _ in range(8)])
    media = spark.createDataFrame(
        [(7, "image", "image/png", src, 8, 8, 0.0)], MM.MEDIA_SCHEMA
    )
    out = MM.resize_images(media, target=(4, 2), resizer=_resizer).collect()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (4, 2)
    decoded = _make_png_decoder()(bytes(out[0]["payload_resized"]))
    assert (decoded["width"], decoded["height"]) == (4, 2)
    for got, want in zip(decoded["features"], [40 / 255.0, 80 / 255.0, 120 / 255.0]):
        assert abs(got - want) < 1e-9


def test_media_stats(media):
    stats = {r["modality"]: r for r in MM.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert all(r["null_payloads"] == 0 for r in stats.values())
    assert all(r["total_bytes"] > 0 for r in stats.values())
