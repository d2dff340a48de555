"""Pure-stdlib media codecs: PNG (zlib + struct), WAVE/PCM16 (struct), CSV table.

The multimodal operators (operators/multimodal.py) treat media as opaque binary
columns; until this module existed their decode step was stubbed behind
``impl='fake'``. These codecs make ``impl='real'`` genuinely real for the three
binary span kinds the interleaved corpus contains (image → PNG, audio → WAV,
table → CSV) with zero external dependencies — PNG needs only ``zlib`` (the
format IS zlib-compressed scanlines, per the W3C PNG spec / RFC 2083) and WAVE
is plain RIFF framing over little-endian PCM16. JPEG / MP4 / etc. remain the
declared production seam (PIL / ffmpeg): the decoders sniff magic bytes and
raise ``NotImplementedError`` for formats outside this set.

Everything here is deterministic (integer math end-to-end; the synth generators
derive every parameter from a SHA-1 of ``media_ref``), so golden mirrors and
Spark executors reproduce identical bytes — the same single-source discipline as
the chunk policy in model/backend.py.
"""

from __future__ import annotations

import csv
import hashlib
import io
import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (bit depth 8 only; palette/interlace unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------- PNG

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prior: bytes, bpp: int) -> bytearray:
    """Invert PNG filter ``ftype`` in place (decoder side, spec §6)."""
    if ftype == 0:
        return row
    if ftype == 2:  # Up — no intra-row dependency, vectorizable
        np_row = (np.frombuffer(bytes(row), np.uint8).astype(np.int32)
                  + np.frombuffer(prior, np.uint8)) & 0xFF
        return bytearray(np_row.astype(np.uint8).tobytes())
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        row[i] = (row[i] + pred) & 0xFF
    return row


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array [h, w] (gray) or [h, w, {1,2,3,4}] → PNG bytes (bit depth 8).
    ``filter_type`` applies one filter to every scanline — 0 in production; the
    tests encode with each of 0–4 so every decoder unfilter path is round-tripped."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = a.reshape(h, w * ch)
    prior = b"\x00" * (w * ch)
    lines = bytearray()
    for y in range(h):
        row = raw[y].tobytes()
        lines.append(filter_type)
        lines += _filter_row(filter_type, row, prior, ch)
        prior = row
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _png_chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array [h, w, channels]. Supports bit depth 8, color types
    0/2/4/6 (gray, RGB, gray+alpha, RGBA), all five scanline filters, multiple
    IDAT chunks. Palette or interlaced images raise NotImplementedError (the
    production-codec seam); non-PNG bytes raise ValueError."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} needs a full "
                    "codec library (PIL) — this decoder covers 8-bit gray/RGB/±alpha")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG needs PIL")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length does not match dimensions")
    out = np.empty((height, stride), dtype=np.uint8)
    prior = b"\x00" * stride
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        row = _unfilter_row(ftype, row, prior, channels)
        prior = bytes(row)
        out[y] = np.frombuffer(prior, np.uint8)
    return out.reshape(height, width, channels)


def png_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing pixel data — the
    metadata-only fast path ``decode_media`` uses (scanning 100 TB for dimensions
    must not inflate every payload)."""
    if not data.startswith(PNG_SIGNATURE) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG: bad signature/IHDR")
    w, h = struct.unpack_from(">II", data, 16)
    return w, h


# ---------------------------------------------------------------------- WAVE

def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 array [n] or [n, channels] → RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 array [n, channels], sample_rate). PCM16 only;
    compressed WAVE (or any other audio container) raises NotImplementedError."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos = 12
    rate = ch = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_format, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAVE format {audio_format}/{bits}-bit needs an audio library "
                    "(soundfile) — this decoder covers PCM16")
        elif cid == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAVE missing fmt/data chunk")
    s = np.frombuffer(pcm, dtype="<i2")
    return s.reshape(-1, ch), rate


def wav_duration_ms(data: bytes) -> int:
    """Integer duration in ms from the header + data length (metadata fast path)."""
    samples, rate = wav_decode(data)
    return samples.shape[0] * 1000 // rate


# ----------------------------------------------------------------- CSV table

def csv_encode(rows: list[list]) -> bytes:
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerows(rows)
    return buf.getvalue().encode("utf-8")


def csv_decode(data: bytes) -> list[list[str]]:
    return list(csv.reader(io.StringIO(data.decode("utf-8"))))


# ------------------------------------------------------- payload sniffing

def sniff_kind(data: bytes) -> str:
    """'png' | 'wav' | 'csv' | 'unknown' from magic bytes (decode_media dispatches
    on content, not on the claimed span kind — lake payloads lie)."""
    if data.startswith(PNG_SIGNATURE):
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        return "unknown"
    return "csv" if text and "," in text.splitlines()[0] else "unknown"


# ------------------------------------------------- deterministic synthesis

def _seed_bytes(media_ref: str) -> bytes:
    return hashlib.sha1(media_ref.encode()).digest()


def synth_image(media_ref: str) -> bytes:
    """Deterministic small RGB PNG from media_ref: seeded dimensions (16–63 ×
    16–47) and an integer gradient+hash texture. Pure integer math — identical
    bytes on every host."""
    d = _seed_bytes(media_ref)
    w, h = 16 + d[0] % 48, 16 + d[1] % 32
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    k = np.array([d[2], d[3], d[4]], dtype=np.int64)[None, None, :]
    pix = ((x * (3 + c) + y * (5 + c) + k * (x * y % 7 + 1)) % 256).astype(np.uint8)
    return png_encode(pix)


def synth_audio(media_ref: str, rate: int = 8000) -> bytes:
    """Deterministic mono PCM16 WAV: seeded duration (500–1999 ms) and an integer
    sawtooth at a seeded frequency (110–870 Hz) — no float waveform math, so the
    sample bytes are host-independent."""
    d = _seed_bytes(media_ref)
    duration_ms = 500 + ((d[0] << 8 | d[1]) % 1500)
    freq = 110 + (d[2] << 2) % 760
    n = rate * duration_ms // 1000
    t = np.arange(n, dtype=np.int64)
    saw = ((t * freq) % rate) * 65535 // rate - 32768
    amp = 8192 + (d[3] << 6)
    samples = (saw * amp // 32768).astype(np.int16)
    return wav_encode(samples, rate)


def synth_table(media_ref: str) -> bytes:
    """Deterministic small CSV: seeded shape (3–8 rows × 2–5 cols), integer cells."""
    d = _seed_bytes(media_ref)
    n_rows, n_cols = 3 + d[0] % 6, 2 + d[1] % 4
    rows = [[f"c{j}" for j in range(n_cols)]]
    rows += [[(d[(i * n_cols + j) % 20] * (i + 1) + j * 7) % 1000
              for j in range(n_cols)] for i in range(n_rows)]
    return csv_encode(rows)


SYNTH_BY_KIND = {"image": synth_image, "audio": synth_audio, "table": synth_table}


def synth_payload(kind: str, media_ref: str) -> bytes:
    """Real-format payload for a media span of the synthetic corpus (the lake
    stand-in for ``codec='real'`` in media_payloads)."""
    fn = SYNTH_BY_KIND.get(kind)
    if fn is None:
        raise NotImplementedError(f"no synthesizer for media kind {kind!r}")
    return fn(media_ref)


# ------------------------------------------------------- real feature vector

def real_feature_vector(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic content features from a decoded payload → unit-norm list of
    ``dim`` floats (the media_features(impl='real') kernel; single source shared
    by the Spark operator and the golden mirror). Per format: PNG → dims + channel
    means + a 2×4 luma-block grid; WAV → duration + RMS + 8 coarse envelope bins;
    CSV → shape + numeric cell mean. Unknown formats raise (the encoder seam)."""
    k = sniff_kind(payload)
    if k == "png":
        a = png_decode(payload).astype(np.float64)
        h, w, ch = a.shape
        rgb = a[:, :, :3] if ch >= 3 else np.repeat(a[:, :, :1], 3, axis=2)
        luma = rgb.mean(axis=2)
        blocks = [float(luma[(i * h) // 2:((i + 1) * h) // 2,
                             (j * w) // 4:((j + 1) * w) // 4].mean()) / 255.0
                  for i in range(2) for j in range(4)]
        vec = ([w / 64.0, h / 64.0]
               + [float(rgb[:, :, c].mean()) / 255.0 for c in range(3)] + blocks)
    elif k == "wav":
        samples, rate = wav_decode(payload)
        x = samples[:, 0].astype(np.float64)
        n = len(x)
        bins = [float(np.abs(x[(i * n) // 8:((i + 1) * n) // 8]).mean()) / 32768.0
                for i in range(8)]
        vec = [n / rate, float(np.sqrt((x * x).mean())) / 32768.0] + bins
    elif k == "csv":
        rows = csv_decode(payload)
        cells = [float(c) for r in rows[1:] for c in r]
        vec = [len(rows) / 10.0, (len(rows[0]) if rows else 0) / 10.0,
               (sum(cells) / len(cells) / 1000.0) if cells else 0.0]
    else:
        raise NotImplementedError(
            "feature extraction for this payload format needs a vision/audio "
            "encoder (production seam); supported here: PNG/WAV/CSV")
    vec = (vec + [0.0] * dim)[:dim]
    norm = float(np.sqrt(sum(v * v for v in vec))) or 1.0
    return [v / norm for v in vec]


# ----------------------------------------------------------- image resize

def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize [h,w,c] → [height,width,c] with floor index
    mapping (src_i = out_i * src_dim // out_dim) — integer-exact, the
    deterministic stand-in for PIL's resampling filters."""
    h, w = arr.shape[:2]
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return arr[ys][:, xs]
