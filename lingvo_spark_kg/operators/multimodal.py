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
