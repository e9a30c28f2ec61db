"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
`kind` discriminator and extracted metadata.  The decode step needs codec
libraries that are NOT in this environment, so decoding is stubbed behind
`decode_available()` with a clearly-marked deterministic fake — but the
Spark-side plumbing (schemas, Arrow batch iteration via mapInPandas, UDF
signatures, partitioning) is real and tested.

Scale notes: payload bytes never cross a shuffle — metadata extraction is a
narrow mapInPandas pass; downstream joins/groupBys use only the (id, meta)
projection.  `spark.sql.execution.arrow.maxRecordsPerBatch` bounds per-batch
memory when payloads are large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("id long, kind string, payload binary, "
                "meta struct<n_bytes: long, sha256: string>")

FEATURE_SCHEMA = ("id long, kind string, width int, height int, channels int, "
                  "n_frames int, feature array<double>")


def decode_available() -> bool:
    """True if real image/audio codecs are importable (they are not in this
    container; the fake path below is used instead)."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", kind: str = "image") -> DataFrame:
    """Test/demo source: wrap a text column as an opaque binary payload with
    typed metadata — the shape a real multimodal table has."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"), F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(F.length(payload).cast("long").alias("n_bytes"),
                 F.sha2(payload, 256).alias("sha256")).alias("meta"))


def payload_meta(df: DataFrame) -> DataFrame:
    """Metadata projection (id, kind, n_bytes, sha256) — built-ins only, so
    the parquet scan prunes the payload column out entirely when `meta` was
    materialized at ingest."""
    return df.select("id", "kind", F.col("meta.n_bytes").alias("n_bytes"),
                     F.col("meta.sha256").alias("sha256"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode: deterministic fake dimensions derived from the payload
    hash.  Replace with PIL/libav decode where codecs exist."""
    h = int.from_bytes(bytes(payload)[:8].ljust(8, b"\0"), "big")
    width = 16 + (h % 1009) % 512
    height = 16 + (h // 1009) % 512
    return width, height, 3, 1


def extract_features(df: DataFrame, n_features: int = 8,
                     strict: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    With `strict=True` and no codec libraries installed this raises
    NotImplementedError (the honest production behavior); otherwise the
    deterministic fake decoder exercises the full distributed plumbing:
    batch iteration, per-row binary access, fixed-width feature output.
    """
    use_real = decode_available()
    if strict and not use_real:
        raise NotImplementedError(
            "image/audio codecs not installed; extract_features requires "
            "PIL/libav for real decoding (deterministic fake available with "
            "strict=False)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dims = [_fake_decode(p) for p in pdf["payload"]]
            w = np.array([d[0] for d in dims], dtype=np.int32)
            h = np.array([d[1] for d in dims], dtype=np.int32)
            # fake feature vector: deterministic moments of the payload bytes
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                if arr.size == 0:
                    arr = np.zeros(1)
                base = np.array([arr.mean(), arr.std(), arr.min(), arr.max()])
                feats.append(np.resize(base, n_features).round(6))
            yield pd.DataFrame({
                "id": pdf["id"], "kind": pdf["kind"],
                "width": w, "height": h,
                "channels": np.full(len(pdf), 3, dtype=np.int32),
                "n_frames": np.full(len(pdf), 1, dtype=np.int32),
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4,
                 strict: bool = False) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames per video payload →
    (id, frame_idx, frame binary, n_bytes) — one output row per sampled
    frame, via mapInPandas.

    STUB decode (no libav in this container): a "frame" is the payload's
    byte-slice for that index — deterministic, size-preserving, so the
    distributed shape (row explosion factor, per-frame binary column,
    batch memory bounds) is exactly what a real ffmpeg/PyAV sampler
    produces.  ``strict=True`` raises where real codecs are required.
    """
    if strict and not decode_available():
        raise NotImplementedError(
            "video codecs not installed; frame_sample requires PyAV/ffmpeg "
            "for real decoding (deterministic fake available with "
            "strict=False)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                raw = bytes(p)
                step = max(1, len(raw) // n_frames)
                for f in range(n_frames):
                    chunk = raw[f * step:(f + 1) * step]
                    if not chunk:
                        break
                    ids.append(i)
                    idxs.append(f)
                    frames.append(chunk)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
                "n_bytes": pd.Series([len(f) for f in frames],
                                     dtype="int64"),
            })

    return df.mapInPandas(
        run, schema="id long, frame_idx int, frame binary, n_bytes long")


def resize_stub(df: DataFrame, width: int, height: int,
                strict: bool = False) -> DataFrame:
    """STUB resize: downsample each payload to ``width*height`` bytes by a
    deterministic stride subsample (positions ``0, s, 2s, ...`` with
    ``s = n_bytes // (width*height)``; payloads already at or under the
    target pass through).  A real implementation swaps the subsample for a
    PIL/libav rescale (``strict=True`` raises until codecs exist) — but
    the distributed shape is the real one: a separate narrow mapInPandas
    pass whose OUTPUT is the size-reduced payload, so downstream stages
    shuffle at most ``width*height`` bytes per doc and the original
    payload bytes still never cross a shuffle.  The fake is pure byte
    selection, so it is hash-verified cross-engine (hex-domain DuckDB
    twin, like frame_sample)."""
    if strict and not decode_available():
        raise NotImplementedError(
            "image codecs not installed; resize requires PIL for real "
            "rescaling (deterministic fake available with strict=False)")
    target = int(width) * int(height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            resized = []
            for p in pdf["payload"]:
                raw = bytes(p)
                if len(raw) <= target:
                    resized.append(raw)
                else:
                    s = len(raw) // target
                    resized.append(raw[: target * s : s])
            out = pdf[["id", "kind"]].copy()
            out["payload"] = pd.Series(resized, dtype=object,
                                       index=pdf.index)
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.mapInPandas(
        run, schema="id long, kind string, payload binary, width int, height int")
