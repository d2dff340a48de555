"""Multimodal columns: opaque binary media with typed metadata.

Media payloads are opaque ``binary`` columns plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas`` UDFs.
Two implementations per operator:

- ``impl="fake"`` derives deterministic pseudo-metadata from the bytes — the
  original plumbing-only mode (schema, batch shape, partitioning exercised with
  zero codec cost), kept as the cheap default for plumbing tests.
- ``impl="real"`` decodes the payload FOR REAL via the pure-stdlib codecs in
  lingvo_spark_kg/codecs.py: PNG (zlib scanline inflate + unfilter), baseline
  JPEG/JFIF (Huffman + DCT, 4:4:4/4:2:0, restart markers), WAVE/PCM16, CSV
  tables. Payload formats outside that set (progressive JPEG, MP4, compressed
  audio …) raise NotImplementedError inside the codec — that narrower seam is
  where PIL/libjpeg-turbo/ffmpeg plug in on a production image; every span
  kind of the interleaved corpus (image/audio/table) decodes for real here.
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


def media_payloads(media_spans: DataFrame, codec: str = "fake") -> DataFrame:
    """Attach a synthetic binary payload derived from media_ref. In production the
    payload column comes from the lake; everything downstream only assumes
    (doc_id, span_idx, kind, payload:binary). ``codec='fake'`` = 64 opaque
    sha1-derived bytes (pure column expression, zero Python); ``codec='real'`` =
    actual PNG / WAV / CSV bytes synthesized deterministically per media_ref
    (codecs.synth_payload) so the real decoders have real input;
    ``codec='real_jpeg'`` = the same corpus with image spans carried as
    baseline JFIF instead of PNG (codecs.jpeg_encode, seed-varied 4:4:4/4:2:0
    + restart layouts)."""
    if codec == "fake":
        return media_spans.withColumn(
            "payload",
            F.unhex(F.repeat(F.substring(F.sha1(F.col("media_ref")), 1, 32), 4)))
    image_format = "jpeg" if codec == "real_jpeg" else "png"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lingvo_spark_kg.codecs import synth_payload

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_payload(k, r, image_format=image_format)
                              for k, r in zip(pdf["kind"], pdf["media_ref"])]
            yield pdf

    out_schema = T.StructType(
        media_spans.schema.fields + [T.StructField("payload", T.BinaryType())])
    return media_spans.mapInPandas(run, schema=out_schema)


def decode_media(media: DataFrame, impl: str = "fake") -> DataFrame:
    """(doc_id, span_idx, kind, payload) → typed metadata. ``impl='real'`` parses
    the actual bytes (codecs.py): PNG dimensions come from the IHDR without
    inflating pixel data, JPEG dimensions from the SOF header without decoding
    the scan, WAV duration from the PCM header, CSV shape from the parsed
    table — dispatch is on sniffed magic bytes, not the claimed kind. Formats
    beyond PNG/JPEG/WAV/CSV raise inside the codec (the PIL/ffmpeg seam)."""
    if impl == "real":
        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lingvo_spark_kg import codecs as C

            for pdf in batches:
                out = {k: [] for k in ("doc_id", "span_idx", "kind", "n_bytes",
                                       "sha1", "width", "height", "duration_ms")}
                for doc_id, span_idx, kind, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    fmt = C.sniff_kind(b)
                    width = height = duration = 0
                    if fmt in ("png", "jpeg"):
                        width, height = C.image_dimensions(b)
                    elif fmt == "wav":
                        duration = C.wav_duration_ms(b)
                    elif fmt == "csv":
                        rows = C.csv_decode(b)
                        height = len(rows)
                        width = len(rows[0]) if rows else 0
                    else:
                        raise NotImplementedError(
                            f"payload format for span ({doc_id},{span_idx}) not "
                            "PNG/JPEG/WAV/CSV — decoding it needs PIL/ffmpeg "
                            "(production seam)")
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(int(span_idx))
                    out["kind"].append(kind)
                    out["n_bytes"].append(len(b))
                    out["sha1"].append(hashlib.sha1(b).hexdigest())
                    out["width"].append(int(width))
                    out["height"].append(int(height))
                    out["duration_ms"].append(int(duration))
                yield pd.DataFrame(out)

        return media.mapInPandas(run_real, schema=MEDIA_META_SCHEMA)

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
    ``impl='real'`` decodes PNG/JPEG payloads, nearest-neighbor-resamples to
    ``width×height`` and re-encodes in the source format (codecs.py —
    deterministic; PIL's filter zoo is the production upgrade at this seam,
    and JPEG re-encode is lossy by nature). Non-image payloads
    pass through with NULL resized columns so the operator composes over mixed
    media without a filter upstream. The fake derives a deterministic byte grid
    from the payload digest so partitioning/batch shape/schema are exercised
    codec-free."""
    if impl == "real":
        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lingvo_spark_kg import codecs as C

            for pdf in batches:
                out = {k: [] for k in ("doc_id", "span_idx", "kind", "width",
                                       "height", "resized", "resized_sha1")}
                for doc_id, span_idx, kind, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    fmt = C.sniff_kind(b)
                    if fmt in ("png", "jpeg"):
                        # decode → nearest-neighbor → re-encode IN-FORMAT
                        arr = C.resize_nearest(C.decode_image(b), width,
                                               height)
                        small = (C.png_encode(arr) if fmt == "png"
                                 else C.jpeg_encode(arr, quality=90))
                        sha = hashlib.sha1(small).hexdigest()
                    else:
                        small = sha = None
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(int(span_idx))
                    out["kind"].append(kind)
                    out["width"].append(width)
                    out["height"].append(height)
                    out["resized"].append(small)
                    out["resized_sha1"].append(sha)
                yield pd.DataFrame(out)

        return media.mapInPandas(run_real, schema=RESIZED_SCHEMA)

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
    sampled instant. ``impl='real'`` decodes WAV payloads and fingerprints the
    ACTUAL PCM window starting at each sampled instant (sha1 over the samples in
    [t, t+interval)); its input therefore must carry the ``payload`` column
    (media_payloads output), while the fake — a deterministic per-(sha1, t_ms)
    fingerprint exercising row fan-out codec-free — consumes decode_media output.
    Video containers are the remaining ffmpeg seam (none exist in this corpus)."""
    if impl == "real":
        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lingvo_spark_kg import codecs as C

            for pdf in batches:
                out = {k: [] for k in ("doc_id", "span_idx", "frame_idx", "t_ms",
                                       "frame_sha1")}
                for doc_id, span_idx, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    if C.sniff_kind(b) != "wav":
                        continue  # time-based media only; images/tables have no axis
                    samples, rate = C.wav_decode(b)
                    dur = samples.shape[0] * 1000 // rate
                    for i, t in enumerate(range(0, dur, interval_ms)):
                        lo = t * rate // 1000
                        hi = min((t + interval_ms) * rate // 1000, samples.shape[0])
                        win = samples[lo:hi]
                        out["doc_id"].append(doc_id)
                        out["span_idx"].append(int(span_idx))
                        out["frame_idx"].append(i)
                        out["t_ms"].append(t)
                        out["frame_sha1"].append(
                            hashlib.sha1(win.tobytes()).hexdigest())
                yield pd.DataFrame(out)

        return decoded.mapInPandas(run_real, schema=FRAMES_SCHEMA)

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
    ANN/near-dup operators). ``impl='real'`` computes content features from the
    DECODED payload (codecs.real_feature_vector: PNG channel/block statistics,
    WAV envelope bins, CSV shape — a learned vision/audio encoder is the
    production upgrade at that seam); the fake derives a deterministic unit-norm
    vector from the payload digest."""
    import math

    if impl == "real":
        real_schema = T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("span_idx", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ])

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lingvo_spark_kg.codecs import real_feature_vector

            for pdf in batches:
                out = {k: [] for k in ("doc_id", "span_idx", "kind", "embedding")}
                for doc_id, span_idx, kind, payload in zip(
                    pdf["doc_id"], pdf["span_idx"], pdf["kind"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(int(span_idx))
                    out["kind"].append(kind)
                    out["embedding"].append(real_feature_vector(b, dim))
                yield pd.DataFrame(out)

        return media.mapInPandas(run_real, schema=real_schema)

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
