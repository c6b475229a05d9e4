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


# --- real PNG kernel (stdlib codec, functions.png) ---


def _gradient_rgb(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 7) % 256, (y * 13) % 256, (x * y + 3) % 256], axis=2).astype(np.uint8)


def test_png_roundtrip_exact():
    import numpy as np

    from web_crawling_prj_spark.functions.png import decode_ihdr, png_decode, png_encode

    rgb = _gradient_rgb(23, 17)
    grey = (_gradient_rgb(9, 31)[:, :, 0]).astype(np.uint8)
    for img in (rgb, grey):
        blob = png_encode(img)
        assert decode_ihdr(blob)[:2] == (img.shape[1], img.shape[0])
        np.testing.assert_array_equal(png_decode(blob), img)


def test_png_decoder_handles_all_filter_types():
    """Decode a PNG assembled INDEPENDENTLY in this test with explicit Sub/Up/
    Average/Paeth/None filtered rows — proves the decoder implements the spec,
    not merely the inverse of our filter-0 encoder."""
    import struct
    import zlib

    import numpy as np

    from web_crawling_prj_spark.functions.png import PNG_MAGIC, png_decode

    img = _gradient_rgb(5, 6)
    h, w, ch = 5, 6, 3
    stride = w * ch
    rows = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    filters = [0, 1, 2, 3, 4]
    for y, f in enumerate(filters):
        raw.append(f)
        for x in range(stride):
            cur = int(rows[y, x])
            a = int(rows[y, x - ch]) if x >= ch else 0
            b = int(rows[y - 1, x]) if y > 0 else 0
            c = int(rows[y - 1, x - ch]) if (y > 0 and x >= ch) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
            raw.append((cur - pred) & 0xFF)

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)

    blob = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(blob), img)


@pytest.fixture(scope="module")
def png_media(spark):
    """Mixed table: 2 real PNG blobs + 1 synthetic WCPM audio blob."""
    from web_crawling_prj_spark.functions.png import png_encode

    blobs = [
        (0, bytearray(png_encode(_gradient_rgb(40, 64)))),
        (1, bytearray(png_encode(_gradient_rgb(8, 8)[:, :, 0]))),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, media binary")
    wcpm = (
        spark.createDataFrame([(2, 1)], "doc_id long, mtype int")
        .withColumn("media", synth_media_udf("doc_id", "mtype"))
        .drop("mtype")
    )
    return df.unionByName(wcpm)


def test_decode_metadata_real_png(png_media):
    meta = {r.doc_id: r for r in decode_metadata(png_media).collect()}
    assert (meta[0].media_type, meta[0].width, meta[0].height) == ("image", 64, 40)
    assert (meta[1].media_type, meta[1].width, meta[1].height) == ("image", 8, 8)
    assert meta[2].media_type == "audio"  # WCPM path untouched


def test_resize_real_png_pixels_exact(png_media):
    """The resized PNG's PIXELS equal the reference nearest-neighbor resample
    computed directly in numpy — real decode, real resample, real re-encode."""
    import numpy as np

    from web_crawling_prj_spark.functions.png import png_decode

    out = {r.doc_id: bytes(r.media) for r in resize_images(png_media, max_side=16).collect()}
    src = _gradient_rgb(40, 64)
    scale = 16 / 64
    nh, nw = int(40 * scale), int(64 * scale)
    yi = np.minimum((np.arange(nh) / scale).astype(int), 39)
    xi = np.minimum((np.arange(nw) / scale).astype(int), 63)
    np.testing.assert_array_equal(png_decode(out[0]), src[yi][:, xi])
    # small image: no upscale, byte-identical content
    np.testing.assert_array_equal(png_decode(out[1]), _gradient_rgb(8, 8)[:, :, 0])


def test_extract_features_real_png(png_media):
    """PNG features are grid-pooled REAL luminance values (unit-norm), exactly
    reproducible from the pixels."""
    import numpy as np

    from web_crawling_prj_spark.functions.png import png_decode, resize_nearest

    rows = {r.doc_id: np.array(r.feature) for r in extract_features(png_media, dim=16).collect()}
    img = _gradient_rgb(40, 64).astype(np.float64).mean(axis=2)
    v = resize_nearest(img, 4).reshape(-1)[:16]
    v = np.pad(v, (0, 16 - len(v)))  # a 40x64 image pools to a 2x4 grid → pad
    expect = v / np.linalg.norm(v)
    np.testing.assert_allclose(rows[0], expect, rtol=1e-6)
    assert abs(np.linalg.norm(rows[2]) - 1.0) < 1e-5  # WCPM path still unit-norm


# --- GIF codec (round 4: second real stdlib media kernel) ---


def _quantized_rgb(h, w, levels=5):
    """Deterministic test image with ≤ levels³ distinct colors (GIF-safe)."""
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    r = (y * levels // max(h, 1)) * (255 // (levels - 1))
    g = (x * levels // max(w, 1)) * (255 // (levels - 1))
    b = ((x + y) % levels) * (255 // (levels - 1))
    return np.stack([r, g, b], axis=2).astype("uint8")


def test_gif_roundtrip_exact():
    import numpy as np

    from web_crawling_prj_spark.functions.gif import decode_screen, gif_decode, gif_encode

    img = _quantized_rgb(23, 37)
    data = gif_encode(img)
    assert data[:6] == b"GIF89a"
    assert decode_screen(data) == (37, 23)
    np.testing.assert_array_equal(gif_decode(data), img)
    # big enough to exercise LZW code-width growth past 9 bits
    big = _quantized_rgb(64, 96, levels=6)
    np.testing.assert_array_equal(gif_decode(gif_encode(big)), big)


def test_gif_interlaced_roundtrip():
    import numpy as np

    from web_crawling_prj_spark.functions.gif import gif_decode, gif_encode

    img = _quantized_rgb(19, 11)
    np.testing.assert_array_equal(gif_decode(gif_encode(img, interlace=True)), img)


def test_gif_decodes_independent_hand_built_bytes():
    """Goldens NOT produced by our encoder: (1) the classic 43-byte 1x1
    tracking pixel (white, GCE extension present); (2) a hand-assembled 2x2
    four-color image whose LZW stream was packed by hand from the spec."""
    import numpy as np

    from web_crawling_prj_spark.functions.gif import gif_decode

    pixel = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"\x21\xf9\x04\x01\x00\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    np.testing.assert_array_equal(gif_decode(pixel), [[[255, 255, 255]]])

    # 2x2, GCT = [red, green, blue, white], pixels [[R,G],[B,W]].
    # LZW (min code size 2): codes clear,0,1,2 at 3 bits; after code 2 the
    # dictionary reaches 8 entries so the width grows — the second clear is
    # read at 4 bits, then 3,end at 3 bits again:
    # bits 4|0<<3|1<<6|2<<9|4<<12(4b)|3<<16|5<<19 → 0x44 0x44 0x2B.
    two = (
        b"GIF89a\x02\x00\x02\x00\xf1\x00\x00"
        b"\xff\x00\x00" b"\x00\xff\x00" b"\x00\x00\xff" b"\xff\xff\xff"
        b"\x2c\x00\x00\x00\x00\x02\x00\x02\x00\x00"
        b"\x02\x03\x44\x44\x2b\x00\x3b"
    )
    np.testing.assert_array_equal(
        gif_decode(two),
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
    )


def test_gif_corrupt_streams_raise():
    import pytest as _pytest

    from web_crawling_prj_spark.functions.gif import gif_decode, gif_encode

    data = gif_encode(_quantized_rgb(8, 8))
    with _pytest.raises(ValueError):
        gif_decode(data[:20])  # truncated before image data
    with _pytest.raises(ValueError):
        gif_decode(b"NOTGIF" + data[6:])


@pytest.fixture(scope="module")
def gif_media(spark):
    from web_crawling_prj_spark.functions.gif import gif_encode

    blobs = [(0, bytearray(gif_encode(_quantized_rgb(24, 36))))]
    df = spark.createDataFrame(blobs, "doc_id long, media binary")
    wcpm = (
        spark.createDataFrame([(1, 2)], "doc_id long, mtype int")
        .withColumn("media", synth_media_udf("doc_id", "mtype"))
        .drop("mtype")
    )
    return df.unionByName(wcpm)


def test_decode_metadata_real_gif(gif_media):
    meta = {r.doc_id: r for r in decode_metadata(gif_media).collect()}
    assert (meta[0].media_type, meta[0].width, meta[0].height) == ("image", 36, 24)
    assert meta[1].media_type == "video"  # WCPM path untouched


def test_resize_and_features_real_gif(gif_media):
    import numpy as np

    from web_crawling_prj_spark.functions.gif import gif_decode
    from web_crawling_prj_spark.functions.png import resize_nearest

    out = {r.doc_id: bytes(r.media) for r in resize_images(gif_media, max_side=12).collect()}
    src = _quantized_rgb(24, 36)
    np.testing.assert_array_equal(gif_decode(out[0]), resize_nearest(src, 12))

    rows = {r.doc_id: np.array(r.feature) for r in extract_features(gif_media, dim=16).collect()}
    img = src.astype(np.float64).mean(axis=2)
    v = resize_nearest(img, 4).reshape(-1)[:16]
    v = np.pad(v, (0, 16 - len(v)))  # 24x36 pools to a 2x4 grid → pad
    expect = v / np.linalg.norm(v)
    np.testing.assert_allclose(rows[0], expect, rtol=1e-6)


def test_auto_backend_family_fallback_without_pil(spark):
    """Under the default 'auto' backend with NO image library installed, a
    real-media blob keeps the deterministic FAKE contract instead of raising:
    a partial install (or none) must never break a family that the fake path
    handled before auto-activation existed. Strict 'real' is the only mode
    that raises for the environment gap (test_png_path_is_backend_independent
    covers it)."""
    import numpy as np

    from web_crawling_prj_spark.operators import multimodal as mm

    if mm._has_lib("PIL"):
        pytest.skip("PIL installed — the fallback branch is unreachable here")
    assert mm.DECODE_BACKEND == "auto"
    jpeg_df = spark.createDataFrame(
        [(0, bytearray(b"\xff\xd8\xff\xe0" + bytes(range(64))))], "doc_id long, media binary"
    )
    # features: fake projection, unit-norm, no NotImplementedError
    feat = np.array(extract_features(jpeg_df, dim=16).collect()[0].feature)
    assert np.isclose(np.linalg.norm(feat), 1.0, atol=1e-5)
    # metadata: undecodable real media is a DATA error under auto (same
    # contract as fake), never the strict backend's environment-gap stub
    with pytest.raises(Exception, match="ValueError|not a WCPM"):
        decode_metadata(jpeg_df).collect()


def test_resize_passthrough_when_within_max_side(spark):
    """A PNG already within max_side passes through BYTE-identical — no
    same-size re-encode (which for lossy formats would degrade pixels on
    every pipeline pass)."""
    import numpy as np

    from web_crawling_prj_spark.functions.png import png_encode

    blob = png_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))
    df = spark.createDataFrame([(0, bytearray(blob))], "doc_id long, media binary")
    out = resize_images(df, max_side=16).collect()[0]
    assert bytes(out.media) == blob


# --- auto-activating real backends (skip-marked, mirror the SCD2 MERGE
# engine test: these run end-to-end the moment PIL / PyAV appear in the
# image — until then the skip marker documents the environment gap) ---

from web_crawling_prj_spark.operators.multimodal import _has_lib  # noqa: E402

HAS_PIL = _has_lib("PIL")
HAS_AV = _has_lib("av")


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed — auto-activates when it is")
def test_real_jpeg_end_to_end_with_pil(spark):
    """With PIL present, a real JPEG decodes / resizes / featurizes through
    the SAME operators with no config change, and the stub gate is
    unreachable (the default 'auto' backend detects PIL per family)."""
    import io

    import numpy as np
    from PIL import Image

    from web_crawling_prj_spark.operators import multimodal as mm

    assert mm.DECODE_BACKEND == "auto" and mm._has_lib("PIL")
    img = np.tile(np.arange(48, dtype=np.uint8) * 5, (32, 1))  # 32x48 gradient
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=95)
    df = spark.createDataFrame([(0, bytearray(buf.getvalue()))], "doc_id long, media binary")

    meta = decode_metadata(df).collect()[0]
    assert (meta.media_type, meta.width, meta.height) == ("image", 48, 32)

    out = resize_images(df, max_side=16).collect()[0]
    with Image.open(io.BytesIO(bytes(out.media))) as im2:
        assert max(im2.size) <= 16 and im2.format == "JPEG"

    feat = np.array(extract_features(df, dim=16).collect()[0].feature)
    assert np.isclose(np.linalg.norm(feat), 1.0, atol=1e-5)
    assert np.std(feat) > 0  # real pixels, not a constant stub


@pytest.mark.skipif(not HAS_AV, reason="PyAV not installed — auto-activates when it is")
def test_real_audio_container_metadata_with_av(spark):
    """With PyAV present, a real audio container's duration flows into the
    typed metadata struct through the same decode_metadata operator."""
    import io

    import av
    import numpy as np

    from web_crawling_prj_spark.operators import multimodal as mm

    assert mm.DECODE_BACKEND == "auto" and mm._has_lib("av")
    buf = io.BytesIO()
    with av.open(buf, mode="w", format="wav") as c:
        stream = c.add_stream("pcm_s16le", rate=8000, layout="mono")
        frame = av.AudioFrame.from_ndarray(
            np.zeros((1, 8000), dtype=np.int16), format="s16", layout="mono"
        )
        frame.sample_rate = 8000
        for packet in stream.encode(frame):
            c.mux(packet)
        for packet in stream.encode(None):
            c.mux(packet)
    df = spark.createDataFrame([(0, bytearray(buf.getvalue()))], "doc_id long, media binary")
    meta = decode_metadata(df).collect()[0]
    assert meta.media_type == "audio"
    assert meta.duration_ms >= 900  # ~1 s of PCM
