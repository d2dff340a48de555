"""Multimodal columns: opaque binary media with typed metadata.

Media payloads are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas`` UDFs.
Image/audio codec libraries are not available in this environment, so the decode step
is STUBBED: ``decode_media(..., impl="fake")`` derives deterministic pseudo-metadata
from the bytes (so the Spark plumbing — schema, batch shape, partitioning — is real and
tested end-to-end), and ``impl="real"`` raises NotImplementedError at the exact seam
where PIL/ffmpeg decoding plugs in on a production image.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha1", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])


def media_payloads(media_spans: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload derived from media_ref (sha1 → bytes). In
    production the payload column comes from the lake; everything downstream only
    assumes (doc_id, span_idx, kind, payload:binary)."""
    return media_spans.withColumn(
        "payload", F.unhex(F.repeat(F.substring(F.sha1(F.col("media_ref")), 1, 32), 4))
    )


def decode_media(media: DataFrame, impl: str = "fake") -> DataFrame:
    """(doc_id, span_idx, kind, payload) → typed metadata. ``impl='real'`` is the
    production seam (PIL/soundfile/ffmpeg per kind) — intentionally unimplemented here."""
    if impl == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/soundfile/ffmpeg, not present in this "
            "environment; use impl='fake' (deterministic metadata from bytes)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "kind", "n_bytes", "sha1",
                                   "width", "height", "duration_ms")}
            for doc_id, span_idx, kind, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                sha = hashlib.sha1(b).hexdigest()
                out["doc_id"].append(doc_id)
                out["span_idx"].append(int(span_idx))
                out["kind"].append(kind)
                out["n_bytes"].append(len(b))
                out["sha1"].append(sha)
                if kind == "image":
                    out["width"].append(64 + b[0] if b else 0)
                    out["height"].append(64 + b[1] if len(b) > 1 else 0)
                    out["duration_ms"].append(0)
                elif kind == "audio":
                    out["width"].append(0)
                    out["height"].append(0)
                    out["duration_ms"].append(1000 + (b[0] << 8 | b[1]) if len(b) > 1 else 0)
                else:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["duration_ms"].append(0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("resized_sha1", T.StringType()),
])


def resize_media(media: DataFrame, width: int = 32, height: int = 32,
                 impl: str = "fake") -> DataFrame:
    """Image resize over opaque payloads → (…, resized:binary, resized_sha1).
    ``impl='real'`` is the PIL seam (decode → thumbnail → re-encode) — absent from
    this environment; the fake derives a deterministic ``width×height``-sized byte
    grid from the payload so partitioning/batch shape/schema are exercised for real."""
    if impl == "real":
        raise NotImplementedError(
            "real image resizing requires PIL, not present in this environment; "
            "use impl='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "kind", "width", "height",
                                   "resized", "resized_sha1")}
            for doc_id, span_idx, kind, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                seed = hashlib.sha1(b + f":{width}x{height}".encode()).digest()
                n = width * height
                resized = (seed * (n // len(seed) + 1))[:n]
                out["doc_id"].append(doc_id)
                out["span_idx"].append(int(span_idx))
                out["kind"].append(kind)
                out["width"].append(width)
                out["height"].append(height)
                out["resized"].append(resized)
                out["resized_sha1"].append(hashlib.sha1(resized).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("span_idx", T.IntegerType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("t_ms", T.IntegerType()),
    T.StructField("frame_sha1", T.StringType()),
])


def sample_frames(decoded: DataFrame, interval_ms: int = 250,
                  impl: str = "fake") -> DataFrame:
    """Frame/window sampling over time-based media (duration_ms > 0): one row per
    sampled instant. ``impl='real'`` is the ffmpeg seek/decode seam; the fake emits a
    deterministic frame fingerprint per (sha1, t_ms) so row fan-out and schema are
    real. Input = decode_media output (doc_id, span_idx, kind, duration_ms, sha1)."""
    if impl == "real":
        raise NotImplementedError(
            "real frame sampling requires ffmpeg/soundfile, not present in this "
            "environment; use impl='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "frame_idx", "t_ms",
                                   "frame_sha1")}
            for doc_id, span_idx, dur, sha in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["duration_ms"], pdf["sha1"]
            ):
                for i, t in enumerate(range(0, int(dur), interval_ms)):
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(int(span_idx))
                    out["frame_idx"].append(i)
                    out["t_ms"].append(t)
                    out["frame_sha1"].append(
                        hashlib.sha1(f"{sha}:{t}".encode()).hexdigest())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_features(media: DataFrame, dim: int = 16, impl: str = "fake") -> DataFrame:
    """Feature extraction → fixed-dim float embedding column (the input shape of the
    ANN/near-dup operators). ``impl='real'`` is the vision/audio-encoder seam; the
    fake derives a deterministic unit-norm vector from the payload digest."""
    if impl == "real":
        raise NotImplementedError(
            "real media feature extraction requires a vision/audio encoder, not "
            "present in this environment; use impl='fake'"
        )
    import math

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "kind", "embedding")}
            for doc_id, span_idx, kind, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                raw = []
                d = b
                while len(raw) < dim:
                    d = hashlib.sha1(d).digest()
                    raw.extend(x / 255.0 - 0.5 for x in d)
                vec = raw[:dim]
                norm = math.sqrt(sum(x * x for x in vec)) or 1.0
                out["doc_id"].append(doc_id)
                out["span_idx"].append(int(span_idx))
                out["kind"].append(kind)
                out["embedding"].append([x / norm for x in vec])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=schema)
