"""Real media codecs (lingvo_spark_kg/codecs.py): PNG / WAV / CSV round-trips,
every PNG filter path, known-answer byte layouts derived independently from the
public specs, and the Spark impl='real' operator paths over them."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from lingvo_spark_kg import codecs as C


# ------------------------------------------------------------------ PNG

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_filters_all_color_types(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    a = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    assert np.array_equal(C.png_decode(C.png_encode(a, filter_type=filter_type)), a)


def test_png_known_answer_1x1_gray():
    """Hand-assembled 1×1 8-bit grayscale PNG (pixel value 0x7F) built directly
    from the spec in this test — no shared code with the encoder — must decode;
    and the encoder must produce the identical chunk layout."""
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x7f", 6)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
           + chunk(b"IEND", b""))
    arr = C.png_decode(png)
    assert arr.shape == (1, 1, 1) and arr[0, 0, 0] == 0x7F
    assert C.png_encode(np.array([[0x7F]], dtype=np.uint8)) == png


def test_png_rejects_corruption_and_unsupported():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    good = C.png_encode(a)
    with pytest.raises(ValueError, match="CRC"):
        C.png_decode(good[:40] + bytes([good[40] ^ 0xFF]) + good[41:])
    with pytest.raises(ValueError, match="signature"):
        C.png_decode(b"JFIF" + good)
    # 16-bit depth is the declared PIL seam
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    png16 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad_ihdr)
    with pytest.raises(NotImplementedError):
        C.png_decode(png16)


def test_png_dimensions_header_only():
    a = np.zeros((7, 23, 3), dtype=np.uint8)
    assert C.png_dimensions(C.png_encode(a)) == (23, 7)


def test_png_multiple_idat_chunks():
    """Decoders must concatenate IDAT chunks (spec §5.6) — split the stream."""
    a = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    whole = C.png_encode(a)
    # re-split the single IDAT into two chunks
    sig, rest = whole[:8], whole[8:]
    (ihdr_len,) = struct.unpack_from(">I", rest, 0)
    ihdr = rest[:12 + ihdr_len]
    rest = rest[12 + ihdr_len:]
    (idat_len,) = struct.unpack_from(">I", rest, 0)
    idat_body = rest[8:8 + idat_len]
    iend = rest[12 + idat_len:]

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    split = (sig + ihdr + chunk(b"IDAT", idat_body[:5])
             + chunk(b"IDAT", idat_body[5:]) + iend)
    assert np.array_equal(C.png_decode(split), a)


# ------------------------------------------------------------------ WAV

def test_wav_round_trip_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 777, dtype=np.int16)
    got, rate = C.wav_decode(C.wav_encode(mono, 8000))
    assert rate == 8000 and np.array_equal(got[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (400, 2), dtype=np.int16)
    got2, rate2 = C.wav_decode(C.wav_encode(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(got2, stereo)


def test_wav_known_answer_header_layout():
    """RIFF/fmt/data layout per the WAVE spec, assembled independently here."""
    samples = np.array([0, 1000, -1000], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert C.wav_encode(samples, 8000) == wav
    got, rate = C.wav_decode(wav)
    assert rate == 8000 and np.array_equal(got[:, 0], samples)


def test_wav_duration_and_unsupported_format():
    wav = C.wav_encode(np.zeros(4000, dtype=np.int16), 8000)
    assert C.wav_duration_ms(wav) == 500
    mutated = wav.replace(b"fmt " + struct.pack("<I", 16)
                          + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
                          b"fmt " + struct.pack("<I", 16)
                          + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16))
    with pytest.raises(NotImplementedError):
        C.wav_decode(mutated)


# ------------------------------------------------------------- CSV + sniff

def test_csv_round_trip_and_sniff():
    rows = [["a", "b,c"], ["1", "2"]]
    assert C.csv_decode(C.csv_encode(rows)) == rows
    assert C.sniff_kind(C.csv_encode(rows)) == "csv"
    assert C.sniff_kind(C.png_encode(np.zeros((2, 2, 3), np.uint8))) == "png"
    assert C.sniff_kind(C.wav_encode(np.zeros(4, np.int16), 8000)) == "wav"
    # round 7: JPEG is a first-class sniffed format now (codecs.jpeg_decode)
    assert C.sniff_kind(b"\xff\xd8\xff\xe0 jpeg-ish") == "jpeg"
    assert C.sniff_kind(b"\x00\x01binary-noise") == "unknown"


# ------------------------------------------------ synthesis + resize

def test_synth_payloads_deterministic_and_decodable():
    for kind in ("image", "audio", "table"):
        p1, p2 = C.synth_payload(kind, "media://x"), C.synth_payload(kind, "media://x")
        assert p1 == p2
        assert p1 != C.synth_payload(kind, "media://y")
    img = C.png_decode(C.synth_image("media://x"))
    assert img.ndim == 3 and img.shape[2] == 3
    samples, rate = C.wav_decode(C.synth_audio("media://x"))
    assert rate == 8000 and 500 <= samples.shape[0] * 1000 // rate < 2000
    table = C.csv_decode(C.synth_table("media://x"))
    assert len(table) >= 4 and len(table[0]) >= 2


def test_resize_nearest_identity_and_downscale():
    a = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(C.resize_nearest(a, 8, 8), a)
    half = C.resize_nearest(a, 4, 4)
    assert half.shape == (4, 4, 3)
    assert np.array_equal(half, a[::2, ::2])  # floor mapping picks even indices


def test_real_feature_vector_unit_norm_all_kinds():
    for kind in ("image", "audio", "table"):
        v = C.real_feature_vector(C.synth_payload(kind, "media://z"), dim=16)
        assert len(v) == 16
        assert abs(sum(x * x for x in v) - 1.0) < 1e-12
    with pytest.raises(NotImplementedError):
        C.real_feature_vector(b"\x00\x01\x02unknown-format")


# ------------------------------------------------ Spark impl='real' paths

@pytest.fixture(scope="module")
def real_media(spark):
    rows = [("d1", 0, "image", "media://img1"), ("d1", 1, "audio", "media://aud1"),
            ("d2", 0, "table", "media://tab1"), ("d2", 1, "image", "media://img2")]
    from lingvo_spark_kg.operators.multimodal import media_payloads

    df = spark.createDataFrame(
        rows, "doc_id string, span_idx int, kind string, media_ref string")
    return media_payloads(df, codec="real").localCheckpoint()


def test_decode_media_real_matches_local_codecs(spark, real_media):
    from lingvo_spark_kg.operators.multimodal import decode_media

    got = {(r.doc_id, r.span_idx): r
           for r in decode_media(real_media, impl="real").collect()}
    img = C.synth_image("media://img1")
    w, h = C.png_dimensions(img)
    r = got[("d1", 0)]
    assert (r.width, r.height, r.duration_ms) == (w, h, 0)
    assert r.sha1 == hashlib.sha1(img).hexdigest() and r.n_bytes == len(img)
    aud = C.synth_audio("media://aud1")
    assert got[("d1", 1)].duration_ms == C.wav_duration_ms(aud)
    tab = C.csv_decode(C.synth_table("media://tab1"))
    assert (got[("d2", 0)].width, got[("d2", 0)].height) == (len(tab[0]), len(tab))


def test_resize_media_real_images_only(spark, real_media):
    from lingvo_spark_kg.operators.multimodal import resize_media

    rows = {(r.doc_id, r.span_idx): r
            for r in resize_media(real_media, 16, 16, impl="real").collect()}
    expect = C.png_encode(C.resize_nearest(
        C.png_decode(C.synth_image("media://img1")), 16, 16))
    r = rows[("d1", 0)]
    assert bytes(r.resized) == expect
    assert r.resized_sha1 == hashlib.sha1(expect).hexdigest()
    assert rows[("d1", 1)].resized is None  # audio passes through un-resized
    assert rows[("d2", 0)].resized_sha1 is None


def test_sample_frames_real_pcm_windows(spark, real_media):
    from lingvo_spark_kg.operators.multimodal import sample_frames

    frames = sample_frames(real_media, interval_ms=250, impl="real").collect()
    assert {f.doc_id for f in frames} == {"d1"}  # only the audio span fans out
    samples, rate = C.wav_decode(C.synth_audio("media://aud1"))
    dur = samples.shape[0] * 1000 // rate
    assert len(frames) == len(range(0, dur, 250))
    f0 = next(f for f in frames if f.t_ms == 0)
    assert f0.frame_sha1 == hashlib.sha1(
        samples[0:250 * rate // 1000].tobytes()).hexdigest()


def test_media_features_real_matches_local(spark, real_media):
    from lingvo_spark_kg.operators.multimodal import media_features

    got = {(r.doc_id, r.span_idx): list(r.embedding)
           for r in media_features(real_media, dim=16, impl="real").collect()}
    for key, ref in [(("d1", 0), "media://img1"), (("d1", 1), "media://aud1"),
                     (("d2", 0), "media://tab1")]:
        kind = {0: "image", 1: "audio"}.get(key[1]) if key[0] == "d1" else "table"
        expect = C.real_feature_vector(C.synth_payload(kind, ref), dim=16)
        assert got[key] == expect  # bit-identical: same pure function both sides


# ----------------------------------------------------------- JPEG (round 7)

def test_jpeg_round_trip_accuracy_and_determinism():
    """Smooth ramps survive encode→decode within tight bounds at q90 (mean
    error < 1 for 4:4:4) — the DCT/quant/Huffman chain is numerically right,
    not merely structurally parseable; bytes are deterministic."""
    import numpy as np

    from lingvo_spark_kg import codecs as C

    h, w = 33, 49
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([40 + x * 2, 60 + y * 3, 90 + (x + y)],
                   axis=2).clip(0, 255).astype(np.uint8)
    for sub, mean_bound, max_bound in (("444", 1.0, 4), ("420", 4.0, 30)):
        d = C.jpeg_encode(img, quality=90, subsampling=sub)
        assert d[:2] == C.JPEG_SOI and d[-2:] == b"\xff\xd9"
        r = C.jpeg_decode(d).astype(int)
        assert r.shape == img.shape
        e = np.abs(r - img.astype(int))
        assert e.mean() < mean_bound and e.max() < max_bound, (sub, e.mean())
        assert C.jpeg_encode(img, quality=90, subsampling=sub) == d
        assert C.jpeg_dimensions(d) == (w, h)


def test_jpeg_solid_color_dc_only_exact():
    """A solid block is DC-only: decode must land within rounding of the
    constant (any DC-prediction bug shows immediately)."""
    import numpy as np

    from lingvo_spark_kg import codecs as C

    solid = np.full((24, 40, 3), 130, dtype=np.uint8)
    dec = C.jpeg_decode(C.jpeg_encode(solid, quality=90)).astype(int)
    assert np.abs(dec - 130).max() <= 2


def test_jpeg_grayscale_and_odd_dims():
    import numpy as np

    from lingvo_spark_kg import codecs as C

    gray = (np.add.outer(np.arange(19) * 3, np.arange(37) * 5) % 200
            + 20).astype(np.uint8)
    d = C.jpeg_encode(gray, quality=85)
    r = C.jpeg_decode(d)
    assert r.shape == (19, 37, 1)
    assert abs(float(r[:, :, 0].mean()) - float(gray.mean())) < 2.0


def test_jpeg_restart_markers_round_trip():
    """DRI + RSTn layout: markers present, DC predictors reset, decode is
    bit-identical to the marker-free scan of the same image."""
    import numpy as np

    from lingvo_spark_kg import codecs as C

    y, x = np.mgrid[0:24, 0:40]
    img = np.stack([x * 4, y * 6, x + y], axis=2).clip(0, 255).astype(np.uint8)
    for sub in ("444", "420"):
        d = C.jpeg_encode(img, quality=80, subsampling=sub, restart_interval=2)
        assert b"\xff\xdd" in d and b"\xff\xd0" in d
        plain = C.jpeg_decode(C.jpeg_encode(img, quality=80, subsampling=sub))
        assert (C.jpeg_decode(d) == plain).all()


def test_jpeg_byte_stuffing_present_and_survives():
    """Scan data containing a raw 0xFF byte must be stuffed with 0x00 and
    decoded through it — hunt a seed whose scan produces stuffing."""
    import numpy as np

    from lingvo_spark_kg import codecs as C

    found = False
    for seed in range(40):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        d = C.jpeg_encode(img, quality=95)
        scan = d[d.find(b"\xff\xda"):]
        if b"\xff\x00" in scan:
            found = True
            assert C.jpeg_decode(d).shape == (16, 16, 3)
            break
    assert found, "no stuffed byte in 40 random scans — writer suspicious"


def test_jpeg_error_paths_and_dispatch():
    import numpy as np
    import pytest

    from lingvo_spark_kg import codecs as C

    with pytest.raises(NotImplementedError, match="progressive"):
        C.jpeg_decode(b"\xff\xd8\xff\xc2\x00\x0b" + bytes(9))
    with pytest.raises(ValueError, match="SOI"):
        C.jpeg_decode(b"nope")
    with pytest.raises(ValueError, match="1 or 3 channels"):
        C.jpeg_encode(np.zeros((8, 8, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        C.jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")
    img = np.full((9, 9, 3), 77, dtype=np.uint8)
    d = C.jpeg_encode(img)
    assert C.sniff_kind(d) == "jpeg"
    assert (C.decode_image(d) == C.jpeg_decode(d)).all()
    assert C.image_dimensions(d) == (9, 9)
    png = C.synth_image("media://x")
    assert (C.decode_image(png) == C.png_decode(png)).all()


def test_jpeg_synth_variants_cover_layouts():
    """synth_image_jpeg varies subsampling and restart layout by seed — both
    arms must occur across refs, every payload decodes, and the pixel grid
    matches the PNG synth's within JPEG loss."""
    import numpy as np

    from lingvo_spark_kg import codecs as C

    has_restart = set()
    samplings = set()
    for i in range(24):
        ref = f"media://jpegcase{i}"
        d = C.synth_payload("image", ref, image_format="jpeg")
        assert C.sniff_kind(d) == "jpeg"
        arr = C.jpeg_decode(d)
        png_arr = C.png_decode(C.synth_payload("image", ref))
        assert arr.shape == png_arr.shape
        err = np.abs(arr.astype(int) - png_arr.astype(int))
        # the synth texture is near-noise (hash-modulated), the worst case
        # for JPEG: bound well below the ~85 mean of two UNRELATED uint8
        # images, so "same picture, lossy" still has teeth
        assert err.mean() < 64, err.mean()
        has_restart.add(d.find(b"\xff\xdd") != -1)
        # SOF luma sampling byte: 0x22 = 4:2:0, 0x11 = 4:4:4
        sof = d.find(b"\xff\xc0")
        samplings.add(d[sof + 11])
    assert has_restart == {True, False}
    assert samplings == {0x11, 0x22}


def test_jpeg_review_fixes_gray_022_multiscan_and_corrupt_paths():
    """Review fixes: single-component scans ignore SOF sampling factors
    (T.81 A.2 — MCU is one data unit), declared errors for multi-scan files
    and corrupt streams (restart desync / invalid AC symbol) instead of
    internal exception types."""
    import numpy as np
    import pytest

    from lingvo_spark_kg import codecs as C

    gray = (np.add.outer(np.arange(19) * 3, np.arange(37) * 5) % 200
            + 20).astype(np.uint8)
    d = bytearray(C.jpeg_encode(gray, quality=85))
    sof = bytes(d).find(b"\xff\xc0")
    assert d[sof + 11] == 0x11
    d[sof + 11] = 0x22                  # claim 2x2 sampling on the only comp
    r = C.jpeg_decode(bytes(d))
    base = C.jpeg_decode(C.jpeg_encode(gray, quality=85))
    assert (r == base).all()            # decoded as if 1x1, per spec

    # SOS naming fewer components than SOF declares → declared seam error
    img = np.full((9, 9, 3), 80, dtype=np.uint8)
    d3 = bytearray(C.jpeg_encode(img))
    sos = bytes(d3).find(b"\xff\xda")
    # rewrite SOS: ns=1, keep comp 1 tables, spectral bytes; fix seg length
    new_seg = bytes([0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00])
    d3[sos + 2:sos + 2 + 2 + 12] = new_seg  # old seg was len 12 (ns=3)
    with pytest.raises(NotImplementedError, match="multi-scan"):
        C.jpeg_decode(bytes(d3))

    # truncated scan data → ValueError family, never a private exception type
    good = C.jpeg_encode(img)
    with pytest.raises((ValueError, IndexError)):
        C.jpeg_decode(good[:len(good) // 2] + b"\xff\xd9")
