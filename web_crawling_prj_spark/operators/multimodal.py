"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` payload columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
operators so the JVM↔Python boundary moves whole columnar batches, never rows.
The decode kernels themselves (PIL/ffmpeg/torchaudio) are NOT in this
container, so each kernel is stubbed behind ``DECODE_BACKEND``:

- ``"fake"`` (default): deterministic synthetic decode — parses the payload's
  self-describing header (our synthetic media blobs carry width/height/etc. in
  the first bytes) and emits real-shaped features. All Spark-side plumbing —
  schema, batch shape, partitioning, UDF signatures — is REAL and tested.
- ``"real"``: raises NotImplementedError with the dependency note.

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

DECODE_BACKEND = "fake"  # the only backend available in this container

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


def _parse_header(blob: bytes) -> tuple[str, int, int, int]:
    if blob is None or len(blob) < 17 or blob[:4] != _MAGIC:
        raise ValueError("not a WCPM media blob")
    m, w, h, dur = struct.unpack("<BIII", blob[4:17])
    return _MTYPES.get(m, "unknown"), w, h, dur


def decode_metadata(media: DataFrame, blob_col: str = "media") -> DataFrame:
    """mapInPandas decode: binary → typed metadata struct columns.

    Real backend would do PIL.Image.open / av.open here; the fake backend reads
    the self-describing header. Batch shape and output schema are identical.
    """
    if DECODE_BACKEND != "fake":
        raise NotImplementedError("real media decode needs PIL/av — not in this container")

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += ", " + MEDIA_META_SCHEMA

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_parse_header(b) for b in pdf[blob_col]]
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

    Real backend: CNN/CLIP encoder batch inference. Fake backend: seeded
    projection of the payload bytes — deterministic, unit-norm, real schema.
    """
    if DECODE_BACKEND != "fake":
        raise NotImplementedError("real feature extraction needs a model runtime")

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)
    out_schema += f", feature array<float>"

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(SEED_FEATURES)
        proj = rng.standard_normal((64, dim))
        for pdf in it:
            feats = []
            for b in pdf[blob_col]:
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
    """Resize stub: fake backend rewrites the header dims clamped to max_side
    preserving aspect ratio (the real kernel would re-encode pixels)."""
    if DECODE_BACKEND != "fake":
        raise NotImplementedError("real resize needs PIL")

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf[blob_col]:
                mt, w, h, dur = _parse_header(b)
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
