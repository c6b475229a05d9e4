"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payload columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
operators so the JVM↔Python boundary moves whole columnar batches, never rows.

**PNG images are decoded for REAL** — functions.png is a pure-stdlib
(zlib+struct+numpy) spec subset, so ``decode_metadata`` / ``resize_images`` /
``extract_features`` on PNG blobs parse/resample/pool actual pixels with zero
extra dependencies. The remaining kernels (JPEG, audio, video: PIL/ffmpeg/
torchaudio are NOT in this container) stay stubbed behind ``DECODE_BACKEND``:

- ``"auto"`` (default): per-blob, PER-FAMILY capability detection (mirrors
  operators.scd2's provider-based MERGE detection) — the moment PIL (images)
  or PyAV (audio/video) appears in the image, that family's blobs
  decode/resize/extract for real with no code or config change; a family
  whose library is absent keeps the deterministic fake contract below. A
  partial install (e.g. PyAV without PIL) therefore never breaks the other
  family — it upgrades only its own.
- ``"fake"``: deterministic synthetic decode — parses the payload's
  self-describing header (our synthetic media blobs carry width/height/etc. in
  the first bytes) and emits real-shaped features; NEVER probes the real
  libraries, so output is deterministic even on a machine that has them. All
  Spark-side plumbing — schema, batch shape, partitioning, UDF signatures —
  is REAL and tested.
- ``"real"``: strict — a blob neither the stdlib codecs nor an installed
  library can decode raises NotImplementedError with the dependency note
  (the honest environment-gap stub).

The import probes are cached per process (workers re-import this module, so
each worker probes once — never once per blob). Skip-marked end-to-end tests
(tests/test_multimodal.py) run the real paths automatically once the
libraries exist.

Per-blob dispatch: a PNG magic prefix always takes the real stdlib path
(backend-independent — it needs no missing dependency); WCPM-magic synthetic
blobs take the backend path.

Synthetic payload format (media_blob): b"WCPM" + mtype(1B) + width(4B LE) +
height(4B LE) + duration_ms(4B LE) + seeded noise bytes. Deterministic per
(doc_id, mtype).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

import functools


@functools.lru_cache(maxsize=None)
def _has_lib(name: str) -> bool:
    """Cached import-probe for an optional real-media backend — once per
    process (driver OR worker; workers re-import this module and probe their
    own env), never per blob: a failed ``import`` is NOT cached by Python, so
    an uncached probe inside the mapInPandas hot loop would re-scan sys.path
    for every blob."""
    import importlib.util

    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


#: "auto" = per-family capability detection (see module docstring); set to
#: "fake" for bit-deterministic output everywhere, "real" for the strict
#: environment-gap stub
DECODE_BACKEND = "auto"


def _pil_open(blob: bytes):
    """Real-image decode via PIL when available; None when PIL is absent or
    the blob isn't a PIL-decodable image (caller falls through to the stub
    gate). Probed per worker process, short-circuited per blob."""
    if not _has_lib("PIL"):
        return None
    from PIL import Image
    import io

    try:
        im = Image.open(io.BytesIO(blob))
        im.load()
        return im
    except Exception:
        return None


def _av_meta(blob: bytes):
    """Container metadata via PyAV when available: (media_type, width,
    height, duration_ms) or None."""
    if not _has_lib("av"):
        return None
    import av
    import io

    try:
        with av.open(io.BytesIO(blob)) as c:
            dur_ms = int((c.duration or 0) / 1000)  # av duration is in µs
            vs = next((s for s in c.streams if s.type == "video"), None)
            if vs is not None and vs.codec_context is not None:
                return (
                    "video",
                    int(vs.codec_context.width or 0),
                    int(vs.codec_context.height or 0),
                    dur_ms,
                )
            if any(s.type == "audio" for s in c.streams):
                return "audio", 0, 0, dur_ms
    except Exception:
        return None
    return None

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms int, payload_bytes long"
)
_MAGIC = b"WCPM"
_MTYPES = {0: "image", 1: "audio", 2: "video"}


@F.pandas_udf(BinaryType())
def synth_media_udf(doc_id: pd.Series, mtype: pd.Series) -> pd.Series:
    """Deterministic synthetic media blob per (doc_id, media type)."""
    out = []
    for d, m in zip(doc_id, mtype):
        rng = np.random.default_rng(int(d) * 3 + int(m))
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        dur = int(rng.integers(0, 60_000)) if m else 0
        noise = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        out.append(_MAGIC + struct.pack("<BIII", int(m), w, h, dur) + noise)
    return pd.Series(out, dtype=object)


# magics of real media containers this container CANNOT decode (no PIL/av):
# JPEG, BMP, RIFF (WAV/AVI/WebP), MP4 ftyp at offset 4, Ogg, MP3 ID3.
# PNG and GIF are NOT here — functions.png / functions.gif decode them for
# real, stdlib-only.
_REAL_MEDIA_MAGICS = (b"\xff\xd8\xff", b"BM", b"RIFF", b"OggS", b"ID3")


def _parse_header(blob: bytes, backend: str = "fake") -> tuple[str, int, int, int]:
    from web_crawling_prj_spark.functions.gif import GIF_MAGICS, decode_screen
    from web_crawling_prj_spark.functions.png import PNG_MAGIC, decode_ihdr

    # classify the blob FIRST: null/garbage is a DATA error (ValueError) under
    # every backend; the environment-gap NotImplementedError is reserved for
    # structurally plausible real media we genuinely cannot decode here.
    # `backend` is CAPTURED on the driver at operator construction — Python
    # workers re-import this module, so reading the global here would always
    # see the default, never the caller's setting.
    if blob is None or len(blob) < 12:
        raise ValueError("null or truncated media blob")
    if blob[:8] == PNG_MAGIC:  # real image: stdlib parse under any backend
        w, h, _, _ = decode_ihdr(bytes(blob))
        return "image", w, h, 0
    if blob[:6] in GIF_MAGICS:  # real image: stdlib parse under any backend
        w, h = decode_screen(bytes(blob))
        return "image", w, h, 0
    if blob[:4] == _MAGIC:  # synthetic self-describing WCPM header
        if len(blob) < 17:
            raise ValueError("truncated WCPM media blob")
        m, w, h, dur = struct.unpack("<BIII", blob[4:17])
        return _MTYPES.get(m, "unknown"), w, h, dur
    head = bytes(blob[:12])
    plausible = head.startswith(_REAL_MEDIA_MAGICS) or head[4:8] == b"ftyp"
    if plausible and backend != "fake":
        # auto/real: per-family capability detection — when PIL/av exist the
        # strict stub below is unreachable for their family
        im = _pil_open(bytes(blob))
        if im is not None:
            return "image", int(im.width), int(im.height), 0
        # image-only magics (JPEG, BMP) never fall through to the av probe:
        # ffmpeg's jpeg_pipe/bmp_pipe demuxers expose them as a single-frame
        # "video" stream, so a PyAV-without-PIL install would silently
        # reclassify every JPEG as media_type='video' — exactly the
        # cross-family breakage per-family activation promises not to have.
        # (RIFF stays eligible for both: WebP→PIL above, WAV/AVI→av here.)
        if not head.startswith((b"\xff\xd8\xff", b"BM")):
            meta = _av_meta(bytes(blob))
            if meta is not None:
                return meta
        if backend == "real":  # strict: environment gap, not a data error
            raise NotImplementedError(
                "real non-PNG media decode needs PIL/av — not in this container "
                "(or the blob is undecodable by the installed backends)"
            )
    # fake (never probes), or auto with the family's library absent: real
    # media the stdlib codecs can't parse is a data error, same as garbage
    raise ValueError("not a WCPM media blob or PNG")


def decode_metadata(media: DataFrame, blob_col: str = "media") -> DataFrame:
    """mapInPandas decode: binary → typed metadata struct columns.

    PNG blobs are parsed for REAL (stdlib IHDR decode, functions.png); WCPM
    synthetic blobs read the self-describing header (a real backend would do
    PIL.Image.open / av.open for JPEG/audio/video). Batch shape and output
    schema are identical either way.
    """
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += ", " + MEDIA_META_SCHEMA

    backend = DECODE_BACKEND  # driver-side capture, closed over into workers

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_parse_header(b, backend) for b in pdf[blob_col]]
            yield pdf.assign(
                media_type=[m[0] for m in metas],
                width=pd.array([m[1] for m in metas], dtype="int32"),
                height=pd.array([m[2] for m in metas], dtype="int32"),
                duration_ms=pd.array([m[3] for m in metas], dtype="int32"),
                payload_bytes=pd.array([len(b) for b in pdf[blob_col]], dtype="int64"),
            )

    return media.mapInPandas(fn, schema=out_schema)


def extract_features(media: DataFrame, blob_col: str = "media", dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: binary → array<float> embedding.

    PNG blobs get REAL features: decoded luminance pooled to a grid
    (nearest-resample to ⌈√dim⌉², first `dim` cells, unit-norm) — the
    classical pre-CNN image descriptor, computed from actual pixels. Other
    blobs: fake backend = seeded projection of the payload bytes
    (deterministic, unit-norm, real schema); real backend would run CNN/CLIP
    batch inference here.
    """
    import math

    from web_crawling_prj_spark.functions.gif import GIF_MAGICS, gif_decode
    from web_crawling_prj_spark.functions.png import PNG_MAGIC, png_decode, resize_nearest

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += ", feature array<float>"
    grid = math.ceil(math.sqrt(dim))
    backend = DECODE_BACKEND  # driver-side capture (workers re-import the module)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(SEED_FEATURES)
        proj = rng.standard_normal((64, dim))
        for pdf in it:
            feats = []
            for b in pdf[blob_col]:
                if b[:8] == PNG_MAGIC or bytes(b[:6]) in GIF_MAGICS:
                    decode = png_decode if b[:8] == PNG_MAGIC else gif_decode
                    img = decode(bytes(b)).astype(np.float64)
                    if img.ndim == 3:
                        img = img.mean(axis=2)  # luminance
                    v = resize_nearest(img, grid).reshape(-1)[:dim]
                    if len(v) < dim:
                        v = np.pad(v, (0, dim - len(v)))
                else:
                    im = None
                    if backend != "fake" and bytes(b[:4]) != _MAGIC:
                        im = _pil_open(bytes(b))  # auto/real: family probe
                    if im is not None:  # auto-activated real image path
                        img = np.asarray(im.convert("L"), dtype=np.float64)
                        v = resize_nearest(img, grid).reshape(-1)[:dim]
                        if len(v) < dim:
                            v = np.pad(v, (0, dim - len(v)))
                    elif backend == "real":  # strict: PNG/GIF above stay real
                        raise NotImplementedError(
                            "real non-PNG feature extraction needs a model runtime"
                        )
                    else:  # fake, or auto with the image library absent
                        raw = np.frombuffer(b[-64:], dtype=np.uint8).astype(np.float64)
                        if len(raw) < 64:
                            raw = np.pad(raw, (0, 64 - len(raw)))
                        v = raw @ proj
                n = np.linalg.norm(v)
                feats.append([float(x) for x in (v / n if n else v)])
            yield pdf.assign(feature=feats)

    return media.mapInPandas(fn, schema=out_schema)


SEED_FEATURES = 42


def resize_images(media: DataFrame, blob_col: str = "media", max_side: int = 256) -> DataFrame:
    """Aspect-preserving downscale to max_side. PNG blobs take the REAL path:
    stdlib decode → nearest-neighbor resample → re-encode (functions.png).
    WCPM synthetic blobs rewrite the self-describing header dims (the fake
    backend's stand-in for a JPEG/etc. re-encode)."""
    from web_crawling_prj_spark.functions.gif import GIF_MAGICS, gif_decode, gif_encode
    from web_crawling_prj_spark.functions.png import (
        PNG_MAGIC,
        png_decode,
        png_encode,
        resize_nearest,
    )

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)

    backend = DECODE_BACKEND  # driver-side capture (workers re-import the module)

    from web_crawling_prj_spark.functions.gif import decode_screen
    from web_crawling_prj_spark.functions.png import decode_ihdr

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf[blob_col]:
                # already within max_side → byte passthrough: no upscale ever,
                # and no wasted (for JPEG: LOSSY) same-size re-encode — cheap
                # header-only dims check, the pixel decode never runs
                if b[:8] == PNG_MAGIC:  # real pixels, real resample
                    w, h, _, _ = decode_ihdr(bytes(b))
                    if max(w, h) <= max_side:
                        out.append(bytes(b))
                        continue
                    out.append(png_encode(resize_nearest(png_decode(bytes(b)), max_side)))
                    continue
                if bytes(b[:6]) in GIF_MAGICS:  # real pixels, real re-encode
                    w, h = decode_screen(bytes(b))
                    if max(w, h) <= max_side:
                        out.append(bytes(b))
                        continue
                    out.append(gif_encode(resize_nearest(gif_decode(bytes(b)), max_side)))
                    continue
                if backend != "fake" and bytes(b[:4]) != _MAGIC:
                    im = _pil_open(bytes(b))  # auto/real: family probe
                    if im is not None:  # PIL resample + re-encode
                        import io

                        if max(im.width, im.height) <= max_side:
                            out.append(bytes(b))
                            continue
                        scale = max_side / max(im.width, im.height)
                        nw = max(1, int(im.width * scale))
                        nh = max(1, int(im.height * scale))
                        buf = io.BytesIO()
                        im.resize((nw, nh)).save(buf, format=im.format or "PNG")
                        out.append(buf.getvalue())
                        continue
                mt, w, h, dur = _parse_header(b, backend)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out.append(_MAGIC + struct.pack("<BIII", {v: k for k, v in _MTYPES.items()}.get(mt, 0), nw, nh, dur) + b[17:])
            pdf = pdf.copy()
            pdf[blob_col] = out
            yield pdf

    return media.mapInPandas(fn, schema=out_schema)


def sample_video_frames(media: DataFrame, blob_col: str = "media", every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub: one output row per sampled timestamp (explode on a
    native sequence over the decoded duration — the per-frame decode is the
    stubbed kernel; the row fan-out is real Spark)."""
    with_meta = decode_metadata(media, blob_col)
    frames = with_meta.where(F.col("media_type") == "video").withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
    )
    return frames.withColumn("frame", F.lit(None).cast("binary"))  # real: decoded JPEG bytes
