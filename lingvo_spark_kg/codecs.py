"""Pure-stdlib media codecs: PNG (zlib + struct), baseline JPEG/JFIF
(DCT + Huffman, NumPy), WAVE/PCM16 (struct), CSV table.

The multimodal operators (operators/multimodal.py) treat media as opaque binary
columns; until this module existed their decode step was stubbed behind
``impl='fake'``. These codecs make ``impl='real'`` genuinely real for the
binary span kinds the interleaved corpus contains (image → PNG or JPEG,
audio → WAV, table → CSV) with zero external dependencies — PNG needs only
``zlib`` (the format IS zlib-compressed scanlines, per the W3C PNG spec /
RFC 2083), JPEG is implemented from ITU-T T.81 (baseline sequential: 8×8 DCT,
Annex-K quantization, canonical Huffman, 4:4:4 + 4:2:0, restart markers) and
WAVE is plain RIFF framing over little-endian PCM16. Progressive JPEG, video
containers (MP4) and compressed audio remain the declared production seam
(PIL / libjpeg-turbo / ffmpeg): the decoders sniff magic bytes and raise
``NotImplementedError`` for formats outside this set.

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


# ------------------------------------------------------------ JPEG (JFIF)
# Baseline sequential DCT JPEG (ITU-T T.81 / JFIF 1.02), pure stdlib+NumPy —
# the same round-6 move that closed the PNG/WAVE seam, applied to the last
# declared image-format gap. Encoder: level shift → 8×8 DCT → quality-scaled
# Annex-K quantization → zigzag → DC-diff / AC run-length → Huffman, with
# FIXED-LENGTH canonical Huffman tables embedded in DHT (every table a
# decoder needs travels in the file, so any spec decoder reads our output;
# fixed-length codes are valid but ~15% bigger than Annex-K — optimized
# tables are the production nicety, not a correctness seam). Color is
# YCbCr 4:4:4 (BT.601/JFIF matrix); grayscale is single-component. Decoder:
# marker parse (DQT 8/16-bit, DHT, DRI/RSTn, SOF0) → Huffman → dequant →
# IDCT, supports sampling factors up to 2×2 (4:2:0 / 4:2:2 real-world files,
# nearest-neighbor chroma upsample). Progressive (SOF2), arithmetic coding
# and 12-bit precision raise NotImplementedError — declared limits, like
# interlaced PNG.

JPEG_SOI = b"\xff\xd8"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 base quantization tables (row-major)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality → table scaling (the de-facto public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255)


def _dct_basis() -> np.ndarray:
    k = np.arange(8, dtype=np.float64)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c[0, :] = 1.0 / np.sqrt(2.0)
    return c * 0.5


_DCT_C = _dct_basis()


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ coef @ _DCT_C


# fixed-length canonical Huffman specs: (bits-per-length-1..16, symbol list).
# DC: the 12 size categories at 4 bits; AC: all 162 (run, size) symbols +
# EOB/ZRL at 9 bits. Kraft sums 12/16 and 162/512 < 1, and the all-ones code
# of each length stays unused (T.81's reserved code point).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
_DC_SPEC = ([0, 0, 0, 12] + [0] * 12, _DC_SYMBOLS)
_AC_SPEC = ([0] * 8 + [162] + [0] * 7, _AC_SYMBOLS)


def _canonical_codes(bits: list, symbols: list) -> dict:
    """DHT (bits, symbols) → {symbol: (code, length)} per T.81 C.2."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad(self) -> None:
        if self.n:
            p = 8 - self.n
            self.put((1 << p) - 1, p)      # pad with 1-bits per spec

    def restart(self, idx: int) -> None:
        self.pad()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(coefs: np.ndarray, prev_dc: int, dc_codes: dict,
                  ac_codes: dict, w: _BitWriter) -> int:
    dc = int(coefs[0])
    s, bits = _magnitude(dc - prev_dc)
    w.put(*dc_codes[s])
    if s:
        w.put(bits, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            w.put(*ac_codes[0x00])         # EOB
            break
        v = int(coefs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac_codes[0xF0])         # ZRL
            run -= 16
        s, bits = _magnitude(v)
        w.put(*ac_codes[(run << 4) | s])
        w.put(bits, s)
        run = 0
    return dc


def _component_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Pad a [h,w] plane to 8-multiples (edge replication), DCT+quantize every
    block → [n_blocks_y, n_blocks_x, 64] zigzagged int coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1:h, :]
    padded[:, w:] = padded[:, w - 1:w]
    qt8 = qt.reshape(8, 8).astype(np.float64)
    by, bx = ph // 8, pw // 8
    out = np.empty((by, bx, 64), dtype=np.int64)
    for i in range(by):
        for j in range(bx):
            blk = padded[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] - 128.0
            q = np.round(_dct2(blk) / qt8).astype(np.int64)
            out[i, j] = q.reshape(64)[_ZIGZAG]
    return out


def _box_halve(plane: np.ndarray) -> np.ndarray:
    """2×2 box-average downsample (odd dims edge-replicated first) — the
    chroma decimation of 4:2:0."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:, :]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return (plane[0::2, 0::2] + plane[1::2, 0::2]
            + plane[0::2, 1::2] + plane[1::2, 1::2]) / 4.0


def jpeg_encode(arr: np.ndarray, quality: int = 75,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """[h,w] / [h,w,1] grayscale or [h,w,3] RGB uint8 → baseline JFIF bytes.
    ``subsampling``: '444' (one block per component per MCU) or '420' (2×2
    luma blocks + box-decimated chroma — the dominant real-world layout).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (byte-aligned, DC predictors reset — the error-resilience feature long
    scans use). Deterministic for fixed input."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError(f"jpeg_encode expects 1 or 3 channels, got {ch}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and ch == 3
    a = arr.astype(np.float64)
    if ch == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
        if sub420:
            # pad luma to 16-multiples so the 2×2 block grid covers every MCU
            y = planes[0]
            ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
            ypad = np.empty((ph, pw))
            ypad[:h, :w] = y
            ypad[h:, :w] = y[h - 1:h, :]
            ypad[:, w:] = ypad[:, w - 1:w]
            planes = [ypad, _box_halve(planes[1]), _box_halve(planes[2])]
    else:
        planes = [a[:, :, 0]]
    qts = [_quality_scale(_QT_LUMA, quality),
           _quality_scale(_QT_CHROMA, quality)]
    dc_codes = _canonical_codes(*_DC_SPEC)
    ac_codes = _canonical_codes(*_AC_SPEC)

    def marker(code: int, payload: bytes) -> bytes:
        return bytes([0xFF, code]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(JPEG_SOI)
    out += marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, bytes([0x00]) + bytes(qts[0][_ZIGZAG].tolist()))
    if ch == 3:
        out += marker(0xDB, bytes([0x01]) + bytes(qts[1][_ZIGZAG].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ch])
    for c in range(ch):
        samp = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    out += marker(0xC0, sof)
    for tid in ([0x00, 0x10] if ch == 1 else [0x00, 0x10, 0x01, 0x11]):
        spec = _DC_SPEC if tid < 0x10 else _AC_SPEC
        out += marker(0xC4, bytes([tid]) + bytes(spec[0])
                      + bytes(int(s) for s in spec[1]))
    if restart_interval:
        out += marker(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytes([ch])
    for c in range(ch):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += marker(0xDA, sos + bytes([0, 63, 0]))

    wtr = _BitWriter()
    comp_blocks = [_component_blocks(p, qts[0 if i == 0 else 1])
                   for i, p in enumerate(planes)]
    if sub420:
        mcuy, mcux = -(-h // 16), -(-w // 16)
    else:
        mcuy, mcux = comp_blocks[0].shape[:2]
    prev = [0] * ch
    mcu_count = 0
    rst_idx = 0
    for i in range(mcuy):
        for j in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                wtr.restart(rst_idx)
                rst_idx += 1
                prev = [0] * ch
            mcu_count += 1
            if sub420:
                for by in range(2):        # 4 luma blocks, then Cb, Cr
                    for bx in range(2):
                        prev[0] = _encode_block(
                            comp_blocks[0][2 * i + by, 2 * j + bx], prev[0],
                            dc_codes, ac_codes, wtr)
                for c in (1, 2):
                    prev[c] = _encode_block(comp_blocks[c][i, j], prev[c],
                                            dc_codes, ac_codes, wtr)
            else:
                for c in range(ch):    # 4:4:4 → one block per comp per MCU
                    prev[c] = _encode_block(comp_blocks[c][i, j], prev[c],
                                            dc_codes, ac_codes, wtr)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("corrupt JPEG: truncated scan")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("corrupt JPEG: truncated scan")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2              # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # the MCU loop consumes RSTn proactively at every restart
                # boundary (sync_restart); hitting one mid-entropy-data means
                # the scan desynced — a corrupt file, not a control event
                raise ValueError(
                    "corrupt JPEG: restart marker inside entropy data")
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a restart boundary."""
        self.acc = 0
        self.n = 0
        end = len(self.data)
        while self.pos + 1 < end and (self.data[self.pos] != 0xFF
                                      or self.data[self.pos + 1] == 0x00):
            self.pos += 1
        if self.pos + 1 >= end:
            raise ValueError("corrupt JPEG: truncated scan")
        marker = self.data[self.pos + 1]
        if not 0xD0 <= marker <= 0xD7:
            raise ValueError(
                f"corrupt JPEG: expected RSTn at restart boundary, got "
                f"0xFF{marker:02X}")
        self.pos += 2


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | rd.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("invalid Huffman code in scan data")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header without decoding the scan."""
    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        m = data[pos + 1]
        if m in (0xC0, 0xC1, 0xC2):
            return (int.from_bytes(data[pos + 7:pos + 9], "big"),
                    int.from_bytes(data[pos + 5:pos + 7], "big"))
        if m == 0xD8 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        pos += 2 + int.from_bytes(data[pos + 2:pos + 4], "big")
    raise ValueError("corrupt JPEG: no SOF marker")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 [h, w, channels] (1 or 3, RGB for color).
    Supports SOF0, 8-bit, sampling factors ≤ 2×2 (4:4:4 / 4:2:2 / 4:2:0 with
    nearest-neighbor chroma upsample), DRI/RSTn restarts. Progressive /
    arithmetic / 12-bit raise NotImplementedError (the libjpeg seam)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: missing SOI")
    qts: dict = {}
    dc_tbl: dict = {}
    ac_tbl: dict = {}
    comps: list = []
    h = w = 0
    restart_interval = 0
    pos = 2
    while True:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: lost marker sync")
        m = data[pos + 1]
        if m == 0xD9:
            raise ValueError("corrupt JPEG: EOI before scan data")
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + seg_len]
        if m in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError(
                "progressive JPEG needs libjpeg (production seam); baseline "
                "SOF0 is decoded here")
        if m in (0xC9, 0xCB, 0xCD):
            raise NotImplementedError("arithmetic-coded JPEG (libjpeg seam)")
        if m == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                raw = seg[p:p + n]
                vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if pq else
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = vals
                qts[tq] = tbl.reshape(8, 8)
                p += n
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                symbols = list(seg[p + 17:p + 17 + nv])
                codes = _canonical_codes(bits, symbols)
                inv = {(ln, code): sym for sym, (code, ln) in codes.items()}
                (dc_tbl if tc == 0 else ac_tbl)[th] = inv
                p += 17 + nv
        elif m in (0xC0, 0xC1):
            if seg[0] != 8:
                raise NotImplementedError("12-bit JPEG (libjpeg seam)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif m == 0xDD:
            restart_interval = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:
            ns = seg[0]
            sel = {}
            for c in range(ns):
                sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4,
                                       seg[2 + 2 * c] & 0x0F)
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if not comps or h == 0 or w == 0:
        raise ValueError("corrupt JPEG: SOS before SOF")
    if len(sel) < len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved per-component) baseline JPEG "
            "(libjpeg seam); single interleaved scan is decoded here")
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is non-interleaved and its MCU is
        # ONE data unit — sampling factors only scale components relative to
        # EACH OTHER, so for one component they are effectively 1×1 (some
        # grayscale pipelines still write 0x22 in SOF)
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise NotImplementedError("sampling factors beyond 2×2 (libjpeg seam)")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    rd = _BitReader(data, pos)
    prev = [0] * len(comps)
    mcu_count = 0
    # loop-invariant per-component tables, hoisted out of the MCU loops
    ctabs = [(dc_tbl[sel[c["id"]][0]], ac_tbl[sel[c["id"]][1]],
              qts[c["tq"]].astype(np.float64)) for c in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rd.sync_restart()
                prev = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dtab, atab, qt = ctabs[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(rd, dtab)
                        diff = _extend(rd.bits(s), s) if s else 0
                        prev[ci] += diff
                        coefs[0] = prev[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(rd, atab)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if size == 0:
                                # only EOB (0x00) and ZRL (0xF0) may carry
                                # size 0 — any other (run, 0) symbol is a
                                # corrupt table/stream, not a -1 shift
                                raise ValueError(
                                    "corrupt JPEG: invalid AC symbol "
                                    f"0x{rs:02X}")
                            if k > 63:
                                raise ValueError("AC index overflow in scan")
                            coefs[k] = _extend(rd.bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = coefs
                        px = _idct2(blk.reshape(8, 8) * qt) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(data: bytes) -> np.ndarray:
    """PNG or JPEG bytes → uint8 [h,w,c] pixel array (magic-dispatch twin of
    sniff_kind for the image kinds)."""
    if data.startswith(PNG_SIGNATURE):
        return png_decode(data)
    if data[:2] == JPEG_SOI:
        return jpeg_decode(data)
    raise NotImplementedError("not a PNG/JPEG payload (PIL seam)")


def image_dimensions(data: bytes) -> tuple[int, int]:
    if data.startswith(PNG_SIGNATURE):
        return png_dimensions(data)
    if data[:2] == JPEG_SOI:
        return jpeg_dimensions(data)
    raise NotImplementedError("not a PNG/JPEG payload (PIL seam)")


# ------------------------------------------------------- payload sniffing

def sniff_kind(data: bytes) -> str:
    """'png' | 'jpeg' | 'wav' | 'csv' | 'unknown' from magic bytes
    (decode_media dispatches on content, not on the claimed span kind — lake
    payloads lie)."""
    if data.startswith(PNG_SIGNATURE):
        return "png"
    if data[:2] == JPEG_SOI:
        return "jpeg"
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


def synth_image_jpeg(media_ref: str) -> bytes:
    """The SAME deterministic pixel grid as synth_image, JFIF-encoded — with
    seed-varied layout so the corpus exercises every encoder/decoder path:
    4:4:4 vs 4:2:0 subsampling and plain vs restart-marker scans."""
    d = _seed_bytes(media_ref)
    w, h = 16 + d[0] % 48, 16 + d[1] % 32
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    k = np.array([d[2], d[3], d[4]], dtype=np.int64)[None, None, :]
    pix = ((x * (3 + c) + y * (5 + c) + k * (x * y % 7 + 1)) % 256).astype(np.uint8)
    return jpeg_encode(pix, quality=88,
                       subsampling="420" if d[5] % 2 else "444",
                       restart_interval=4 if d[6] % 3 == 0 else 0)


SYNTH_BY_KIND = {"image": synth_image, "audio": synth_audio, "table": synth_table}


def synth_payload(kind: str, media_ref: str,
                  image_format: str = "png") -> bytes:
    """Real-format payload for a media span of the synthetic corpus (the lake
    stand-in for ``codec='real'`` in media_payloads). ``image_format='jpeg'``
    swaps the image synthesizer to the JFIF encoder (same pixels)."""
    if kind == "image" and image_format == "jpeg":
        return synth_image_jpeg(media_ref)
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
    if k in ("png", "jpeg"):
        a = decode_image(payload).astype(np.float64)
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
            "encoder (production seam); supported here: PNG/JPEG/WAV/CSV")
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
