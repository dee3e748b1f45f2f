"""Real media decode: byte-level PPM/WAV parsing + the Spark query path."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from journal_batch_processer_spark.operators.multimodal import (
    decode_ppm_bytes,
    decode_wav_bytes,
)


def _ppm(w, h, pixels, comment=False):
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return hdr + bytes(pixels)


def test_ppm_decode_solid():
    img = _ppm(2, 2, [10, 20, 30] * 4)
    f = decode_ppm_bytes(img)
    assert (f["width"], f["height"]) == (2, 2)
    assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (10.0, 20.0, 30.0)


def test_ppm_decode_mixed_pixels_and_comment():
    # two pixels: (0,0,0) and (255, 100, 50) → means (127.5, 50, 25)
    img = _ppm(2, 1, [0, 0, 0, 255, 100, 50], comment=True)
    f = decode_ppm_bytes(img)
    assert f["width"] == 2 and f["height"] == 1
    assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (127.5, 50.0, 25.0)


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n1 1\n255\n\x00",          # wrong magic (PGM)
        b"P6\n2 2\n255\n\x00\x01",      # truncated pixels
        b"P6\n1 1\n65535\n\x00\x00\x00",  # 16-bit maxval unsupported
        b"P6\n1",                        # truncated header
    ],
)
def test_ppm_decode_rejects_malformed(payload):
    with pytest.raises(ValueError):
        decode_ppm_bytes(payload)


def _wav(v, n_frames, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack("<h", v) * n_frames)
    return buf.getvalue()


def test_wav_decode_constant_signal():
    f = decode_wav_bytes(_wav(-700, 400))
    assert f["n_channels"] == 1
    assert f["sample_rate"] == 8000
    assert f["n_frames"] == 400
    assert f["duration_ms"] == 50
    assert f["rms"] == 700.0  # exact: sqrt of an exactly-representable square


def test_wav_decode_empty():
    f = decode_wav_bytes(_wav(0, 0))
    assert f["n_frames"] == 0 and f["rms"] == 0.0


def test_media_queries_match_arithmetic(spark):
    """The Spark decode path agrees with the doc_id arithmetic the
    DuckDB oracle uses (same contract the driver checks at sf0.01)."""
    from journal_batch_processer_spark.queries.media import (
        q_media_audio_decode,
        q_media_image_decode,
    )

    sf = "/root/testdata/sf0.001"
    imgs = {r.fname: r for r in q_media_image_decode(spark, sf).collect()}
    assert len(imgs) == 64
    r = imgs["img_00007.ppm"]
    assert (r.width, r.height) == (8 + 7 % 8, 6 + 7 % 5)
    assert (r.mean_r, r.mean_g, r.mean_b) == (49.0, 91.0, 203.0)

    snds = {r.fname: r for r in q_media_audio_decode(spark, sf).collect()}
    assert len(snds) == 64
    s = snds["snd_00009.wav"]
    assert s.n_frames == 8 * (50 + 9 % 25)
    assert s.duration_ms == s.n_frames // 8
    assert s.rms == float(abs((37 * 9) % 2000 - 1000))


# ---------------------------------------------------------------------------
# property-based: decoders over arbitrary well-formed payloads
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    pix=st.integers(0, 255),
    comment=st.booleans(),
)
def test_ppm_decode_roundtrip_property(w, h, pix, comment):
    """Any well-formed solid P6 image decodes to its exact parameters."""
    f = decode_ppm_bytes(_ppm(w, h, [pix] * (w * h * 3), comment=comment))
    assert (f["width"], f["height"]) == (w, h)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == float(pix)


@settings(max_examples=50, deadline=None)
@given(
    v=st.integers(-32768, 32767),
    n=st.integers(0, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_roundtrip_property(v, n, rate):
    """Any constant-amplitude PCM16 mono file decodes to exact facts;
    RMS of a constant signal is exactly |v|."""
    f = decode_wav_bytes(_wav(v, n, rate))
    assert f["n_channels"] == 1
    assert f["sample_rate"] == rate
    assert f["n_frames"] == n
    assert f["duration_ms"] == n * 1000 // rate
    assert f["rms"] == (float(abs(v)) if n else 0.0)


# ---------------------------------------------------------------------------
# PNG: real compressed-format decode (stdlib zlib + filter reversal)
# ---------------------------------------------------------------------------

import numpy as np

from journal_batch_processer_spark.operators.multimodal import (
    decode_image_bytes,
    decode_jpeg_bytes,
    decode_png_bytes,
    encode_png_bytes,
)


def _gradient_rows(w, h):
    """Non-trivial pixel data so filter reversal actually matters."""
    return [
        [((x * 7 + y * 31) % 256, (x * 13 + y) % 256, (x + y * 5) % 256)
         for x in range(w)]
        for y in range(h)
    ]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ftype):
    """A gradient encoded with each single PNG filter type decodes to
    the exact per-channel means numpy computes from the raw pixels."""
    w, h = 9, 7
    rows = _gradient_rows(w, h)
    png = encode_png_bytes(w, h, rows, filter_for_row=lambda y: ftype)
    f = decode_png_bytes(png)
    arr = np.array(rows, dtype=np.float64)
    assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
    assert f["mean_r"] == float(arr[:, :, 0].mean())
    assert f["mean_g"] == float(arr[:, :, 1].mean())
    assert f["mean_b"] == float(arr[:, :, 2].mean())


def test_png_roundtrip_mixed_filters():
    w, h = 6, 10
    rows = _gradient_rows(w, h)
    png = encode_png_bytes(w, h, rows, filter_for_row=lambda y: y % 5)
    f = decode_png_bytes(png)
    arr = np.array(rows, dtype=np.float64)
    assert f["mean_r"] == float(arr[:, :, 0].mean())
    assert f["mean_g"] == float(arr[:, :, 1].mean())
    assert f["mean_b"] == float(arr[:, :, 2].mean())


def test_png_rejects_malformed():
    w, h = 3, 3
    good = encode_png_bytes(w, h, _gradient_rows(w, h))
    # bad signature
    with pytest.raises(ValueError, match="signature"):
        decode_png_bytes(b"PNGX" + good[4:])
    # corrupt a byte inside the IDAT body -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png_bytes(bytes(bad))
    # truncation
    with pytest.raises(ValueError):
        decode_png_bytes(good[: len(good) // 2])


def test_image_magic_dispatch():
    png = encode_png_bytes(2, 2, [[(5, 6, 7)] * 2] * 2)
    assert decode_image_bytes(png)["mean_r"] == 5.0
    ppm = _ppm(2, 2, [10, 20, 30] * 4)
    f = decode_image_bytes(ppm)
    assert f["mean_g"] == 20.0 and f["channels"] == 3
    with pytest.raises(ValueError, match="magic"):
        decode_image_bytes(b"\x00\x01\x02\x03")


def test_jpeg_dispatch_decodes_for_real():
    """decode_jpeg_bytes now runs the stdlib baseline decoder (no PIL
    gate): a real payload decodes, garbage fails loud, and a
    magic-matching-but-malformed payload raises instead of fabricating
    features."""
    from journal_batch_processer_spark.operators.jpeg import (
        encode_jpeg_solid_gray,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"not a jpeg")
    f = decode_jpeg_bytes(encode_jpeg_solid_gray(16, 8, 42))
    assert (f["width"], f["height"], f["mean_r"]) == (16, 8, 42.0)
    with pytest.raises(ValueError):
        decode_jpeg_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, seed, data):
    """Any 8-bit RGB image round-trips through encode->decode with
    arbitrary per-row filter choices: means match numpy exactly."""
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rows = [[tuple(int(v) for v in pix[y, x]) for x in range(w)] for y in range(h)]
    filts = [data.draw(st.integers(0, 4)) for _ in range(h)]
    png = encode_png_bytes(w, h, rows, filter_for_row=lambda y: filts[y])
    f = decode_png_bytes(png)
    arr = pix.astype(np.float64)
    assert (f["width"], f["height"]) == (w, h)
    assert f["mean_r"] == float(arr[:, :, 0].mean())
    assert f["mean_g"] == float(arr[:, :, 1].mean())
    assert f["mean_b"] == float(arr[:, :, 2].mean())


def test_media_png_query_matches_arithmetic(spark):
    from journal_batch_processer_spark.queries.media import (
        q_media_image_decode_png,
    )

    sf = "/root/testdata/sf0.001"
    imgs = {r.fname: r for r in q_media_image_decode_png(spark, sf).collect()}
    assert len(imgs) == 64
    r = imgs["img_00013.png"]
    assert (r.width, r.height, r.channels) == (4 + 13 % 9, 3 + 13 % 7, 3)
    assert (r.mean_r, r.mean_g, r.mean_b) == (
        float((11 * 13) % 256),
        float((17 * 13) % 256),
        float((23 * 13) % 256),
    )


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_solid_roundtrip_exact():
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    for v, w, h in ((20, 8, 8), (128, 16, 8), (254, 24, 32), (0, 8, 16)):
        f = decode_jpeg_baseline(encode_jpeg_solid_gray(w, h, v))
        assert (f["width"], f["height"], f["channels"]) == (w, h, 3)
        assert f["mean_r"] == f["mean_g"] == f["mean_b"] == float(v)


def test_jpeg_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(0, 127).map(lambda x: 2 * x),
        st.integers(1, 4),
        st.integers(1, 4),
    )
    def run(v, bw, bh):
        f = decode_jpeg_baseline(encode_jpeg_solid_gray(8 * bw, 8 * bh, v))
        assert f["mean_r"] == float(v)
        assert (f["width"], f["height"]) == (8 * bw, 8 * bh)

    run()


def test_jpeg_ac_coefficient_matches_numpy_idct():
    """Decode a hand-built bitstream carrying ONE AC coefficient and
    compare the gray block against an INDEPENDENT numpy matrix-form
    IDCT of the same dequantized spectrum (validates the Huffman AC
    path, dezigzag, dequant, and the reference IDCT against a second
    implementation of the published formula)."""
    import numpy as np

    from journal_batch_processer_spark.operators.jpeg import (
        STD_LUMA_QT,
        ZIGZAG,
        _BitWriter,
        _category,
        _huff_codes,
        STD_DC_LUMA,
        STD_AC_LUMA,
        STD_DC_CHROMA,
        STD_AC_CHROMA,
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    # take a valid 8x8 solid file and REBUILD its entropy segment with
    # DC=4 (quantized) and AC zigzag-index 5 = 3 (quantized)
    base = encode_jpeg_solid_gray(8, 8, 128)
    sos = base.find(b"\xff\xda")
    seglen = int.from_bytes(base[sos + 2 : sos + 4], "big")
    head = base[: sos + 2 + seglen]

    dc_l = _huff_codes(*STD_DC_LUMA)
    ac_l = _huff_codes(*STD_AC_LUMA)
    dc_c = _huff_codes(*STD_DC_CHROMA)
    ac_c = _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()
    dcq, acq, ack = 4, 3, 5  # quantized DC, one AC at zigzag index 5
    cat = _category(dcq)
    c, ln = dc_l[cat]; bw.put(c, ln); bw.put(dcq, cat)
    # run 4 zeros then the coefficient at k=5: RS = (4 << 4) | size
    s = _category(acq)
    c, ln = ac_l[(4 << 4) | s]; bw.put(c, ln); bw.put(acq, s)
    c, ln = ac_l[0x00]; bw.put(c, ln)  # EOB
    for dct, act in ((dc_c, ac_c),) * 2:  # chroma: DC 0, EOB
        c, ln = dct[0]; bw.put(c, ln)
        c, ln = act[0x00]; bw.put(c, ln)
    bw.flush()
    data = head + bytes(bw.buf) + b"\xff\xd9"

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )

    w, h, planes = decode_jpeg_planes(data)
    assert (w, h) == (8, 8)

    # independent model: dequantized spectrum -> orthonormal 2-D IDCT.
    # NOTE: the quantizer index must be NATURAL order (qt[ZIGZAG[k]]) —
    # a review pass caught the decoder using qt[k]; a means-only
    # comparison could not see it (AC basis functions are zero-mean),
    # which is why this test compares EVERY PIXEL of the Y plane.
    spec = np.zeros((8, 8))
    spec[0, 0] = dcq * STD_LUMA_QT[0]
    nat = ZIGZAG[ack]
    spec[nat // 8, nat % 8] = acq * STD_LUMA_QT[nat]
    # T.81 A.3.3: f(x,y) = 1/4 sum C(u)C(v) F(u,v) cos… == C^T S C with
    # C the orthonormal DCT-II matrix
    C = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            C[u, x] = (
                np.sqrt(1 / 8 if u == 0 else 2 / 8)
                * np.cos((2 * x + 1) * u * np.pi / 16)
            )
    pix = np.clip(np.round(C.T @ spec @ C + 128), 0, 255)
    got = np.array([[planes[0][y][x] for x in range(8)] for y in range(8)])
    assert np.array_equal(got, pix), (got, pix)
    # and the feature path agrees with the per-pixel means
    f = decode_jpeg_baseline(data)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"]
    assert abs(f["mean_r"] - float(pix.mean())) < 1e-9


def test_jpeg_rejects_unsupported_features_loudly():
    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    base = bytearray(encode_jpeg_solid_gray(8, 8, 100))
    # flip SOF0 -> SOF5 (differential — gated; SOF0/1/2/3/9/10 are all
    # SUPPORTED as of r07, and a DCT stream merely relabeled SOF3
    # fails loud in the lossless parser instead: Ss=0 is an invalid
    # predictor)
    i = bytes(base).find(b"\xff\xc0")
    diff_sof = bytes(base[:i]) + b"\xff\xc5" + bytes(base[i + 2 :])
    with _pytest.raises(NotImplementedError, match="differential"):
        decode_jpeg_baseline(diff_sof)
    relabeled = bytes(base[:i]) + b"\xff\xc3" + bytes(base[i + 2 :])
    with _pytest.raises(ValueError, match="predictor"):
        decode_jpeg_baseline(relabeled)
    # a baseline stream merely RELABELED progressive is malformed (its
    # single interleaved scan claims Ss=0 Se=63 — an illegal DC band):
    # the progressive path rejects it rather than mis-decoding
    prog = bytes(base[:i]) + b"\xff\xc2" + bytes(base[i + 2 :])
    with _pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_baseline(prog)
    # fractional sampling DECODES since r08 (see
    # test_round8_fixes.test_fractional_sampling_decodes_exact...);
    # merely PATCHING the factors into a 444 stream leaves too few
    # entropy blocks per MCU — that must still fail loud, as a
    # truncation, not decode garbage
    j = i + 11  # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) cid(1) -> samp
    frac = bytearray(base)
    frac[j] = 0x31
    frac[j + 3] = 0x21
    with _pytest.raises(ValueError, match="truncated"):
        decode_jpeg_baseline(bytes(frac))
    # truncated entropy data
    with _pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(base[:-20]))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x01\x02")


def test_jpeg_420_subsampled_roundtrip_and_interleave():
    """4:2:0 decode (r06): the solid fixture round-trips bit-exactly
    through the 2×2-luma MCU interleave + chroma upsample, and a
    hand-built 4:2:0 bitstream with FOUR DISTINCT luma block values in
    one MCU proves the Y1 Y2 Y3 Y4 raster order inside the MCU (a
    decoder that swapped block order would place quadrants wrong while
    keeping the global mean identical)."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        STD_AC_CHROMA,
        STD_AC_LUMA,
        STD_DC_CHROMA,
        STD_DC_LUMA,
        STD_LUMA_QT,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_baseline,
        decode_jpeg_planes,
        encode_jpeg_solid_gray,
    )

    for wdt, hgt, v in ((16, 16, 54), (32, 16, 200), (48, 64, 2)):
        f = decode_jpeg_baseline(encode_jpeg_solid_gray(wdt, hgt, v, "420"))
        assert (f["width"], f["height"], f["channels"]) == (wdt, hgt, 3)
        assert f["mean_r"] == f["mean_g"] == f["mean_b"] == float(v)

    # one 16×16 MCU, four luma quadrants at distinct exact DC levels
    base = encode_jpeg_solid_gray(16, 16, 128, "420")
    sos = base.find(b"\xff\xda")
    seglen = int.from_bytes(base[sos + 2 : sos + 4], "big")
    head = base[: sos + 2 + seglen]
    dc_l, ac_l = _huff_codes(*STD_DC_LUMA), _huff_codes(*STD_AC_LUMA)
    dc_c, ac_c = _huff_codes(*STD_DC_CHROMA), _huff_codes(*STD_AC_CHROMA)
    # gray levels whose DC (8*(v-128)) divides Q00=16 exactly
    levels = [96, 128, 160, 192]
    bw = _BitWriter()
    prev = 0
    for v in levels:
        dcq = (8 * (v - 128)) // STD_LUMA_QT[0]
        diff = dcq - prev
        prev = dcq
        cat = _category(diff)
        c, ln = dc_l[cat]
        bw.put(c, ln)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        c, ln = ac_l[0x00]
        bw.put(c, ln)
    for tdc, tac in ((dc_c, ac_c),) * 2:
        c, ln = tdc[0]
        bw.put(c, ln)
        c, ln = tac[0x00]
        bw.put(c, ln)
    bw.flush()
    data = head + bytes(bw.buf) + b"\xff\xd9"
    w, h, planes = decode_jpeg_planes(data)
    assert (w, h) == (16, 16)
    y = planes[0]
    # raster block order within the MCU: (0,0)=96 (0,8)=128 (8,0)=160 (8,8)=192
    assert y[0][0] == 96 and y[0][8] == 128
    assert y[8][0] == 160 and y[8][8] == 192
    assert len(planes[1]) == 8 and len(planes[1][0]) == 8  # chroma 8×8
    f = decode_jpeg_baseline(data)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == sum(levels) / 4


def test_jpeg_scan_component_order_by_id():
    """A legal baseline file may list SOS components in any order; the
    decoder must pair them with frame components BY ID (ADVICE r05).
    Build a solid-color file whose scan runs Cr, Cb, Y — positional
    pairing would decode luma with the chroma quantizer/tables and shift
    every mean."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        STD_AC_CHROMA,
        STD_AC_LUMA,
        STD_DC_CHROMA,
        STD_DC_LUMA,
        STD_LUMA_QT,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    v = 76
    base = encode_jpeg_solid_gray(8, 8, v)
    sos = base.find(b"\xff\xda")
    seglen = int.from_bytes(base[sos + 2 : sos + 4], "big")
    # rewrite the SOS component list as 3,2,1 and re-emit the entropy
    # data in that scan order (Cr, Cb, Y per MCU)
    new_sos = b"\xff\xda" + _struct.pack(">HB", 12, 3) + bytes(
        [3, 0x11, 2, 0x11, 1, 0x00]
    ) + bytes([0, 63, 0])
    dc_l, ac_l = _huff_codes(*STD_DC_LUMA), _huff_codes(*STD_AC_LUMA)
    dc_c, ac_c = _huff_codes(*STD_DC_CHROMA), _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()
    for tdc, tac in ((dc_c, ac_c),) * 2:  # Cr then Cb: DC 0, EOB
        c, ln = tdc[0]
        bw.put(c, ln)
        c, ln = tac[0x00]
        bw.put(c, ln)
    dcq = (8 * (v - 128)) // STD_LUMA_QT[0]
    cat = _category(dcq)
    c, ln = dc_l[cat]
    bw.put(c, ln)
    if cat:
        amp = dcq if dcq >= 0 else dcq + (1 << cat) - 1
        bw.put(amp, cat)
    c, ln = ac_l[0x00]
    bw.put(c, ln)
    bw.flush()
    data = base[:sos] + new_sos + bytes(bw.buf) + b"\xff\xd9"
    f = decode_jpeg_baseline(data)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == float(v)


# ---------------------------------------------------------------------------
# GIF container decode (r06)
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrip_property():
    """Encoder/decoder lockstep across alphabet sizes, dictionary
    growth, width increases, the 4096-entry reset, and the cScSc case
    (runs of one index)."""
    import random

    from journal_batch_processer_spark.operators.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(42)
    for mcs in (2, 3, 4, 8):
        for n in (1, 2, 17, 300, 6000):
            px = [rng.randrange(1 << mcs) for _ in range(n)]
            assert _lzw_decode(mcs, _lzw_encode(mcs, px), n) == px
    run = [1] * 5000 + [0] * 7 + [1] * 5000
    assert _lzw_decode(2, _lzw_encode(2, run), len(run)) == run
    # 30k random bytes at mcs=8 drive next_code past 4095 seven times
    # (verified by an instrumented walk) — the clear/reset path is
    # genuinely exercised, not just present
    px = [rng.randrange(256) for _ in range(30000)]
    assert _lzw_decode(8, _lzw_encode(8, px), len(px)) == px


def test_gif_solid_frames_roundtrip():
    from journal_batch_processer_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_solid_frames,
    )

    pal = [(250, 0, 10), (1, 2, 3), (99, 98, 97), (128, 128, 128)]
    frames = [(0, 3), (3, 11), (1, 0), (2, 7)]
    g = decode_gif_frames(encode_gif_solid_frames(17, 11, pal, frames))
    assert (g["width"], g["height"], g["n_frames"]) == (17, 11, 4)
    for i, (pidx, delay) in enumerate(frames):
        fr = g["frames"][i]
        r, gg, b = pal[pidx]
        assert fr["frame_idx"] == i and fr["delay_cs"] == delay
        assert (fr["mean_r"], fr["mean_g"], fr["mean_b"]) == (
            float(r),
            float(gg),
            float(b),
        )


def test_gif_disposal_and_transparency():
    """Disposal 2 restores the frame rect to background; a transparent
    index leaves the prior canvas visible. Built by hand: a 4x4 GIF,
    frame 1 paints color 1 with disposal 2; frame 2 is ALL-transparent,
    so its composite equals the restored background."""
    import struct

    from journal_batch_processer_spark.operators.gif import (
        _lzw_encode,
        decode_gif_frames,
    )

    pal = [(8, 16, 32), (200, 100, 40)]  # index 0 = background
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0, 0, 0)  # GCT of 2
    for r, g, b in pal:
        out += bytes((r, g, b))

    def frame(pixels, gc_packed, delay):
        out.extend(b"\x21\xf9" + struct.pack("<BBHB", 4, gc_packed, delay, 0))
        out.append(0)
        out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0))
        out.append(2)  # min code size
        lzw = _lzw_encode(2, pixels)
        out.append(len(lzw))
        out.extend(lzw)
        out.append(0)

    frame([1] * 16, 0x08, 5)  # disposal 2 (bits 2-4 = 010)
    frame([0] * 16, 0x01, 6)  # transparent flag, transparent idx 0
    out.append(0x3B)
    g = decode_gif_frames(bytes(out))
    assert g["n_frames"] == 2
    assert g["frames"][0]["mean_r"] == 200.0
    # frame 2: all pixels transparent over the RESTORED background
    assert g["frames"][1]["mean_r"] == 8.0
    assert g["frames"][1]["delay_cs"] == 6


def test_gif_rejects_malformed_loudly():
    import pytest as _pytest

    from journal_batch_processer_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_solid_frames,
    )

    with _pytest.raises(ValueError, match="signature"):
        decode_gif_frames(b"NOTAGIF")
    base = bytearray(encode_gif_solid_frames(8, 8, [(1, 2, 3), (4, 5, 6)], [(0, 1)]))
    # an unknown top-level block type is rejected, not skipped silently
    idesc = bytes(base).find(b"\x2c")
    junk = bytearray(base)
    junk[idesc] = 0x7E
    with _pytest.raises(ValueError, match="unknown block"):
        decode_gif_frames(bytes(junk))
    # truncated LZW stream
    with _pytest.raises(ValueError):
        decode_gif_frames(bytes(base[:-6]))


def test_gif_lzw_against_independent_textbook_decoder():
    """A second LZW decoder written from the GIF89a spec with a
    DIFFERENT structure (bit-at-a-time reader, byte-string table,
    explicit next_slot counter) — catches a convention error the
    encoder and primary decoder could share (width-growth timing,
    reset boundary, first-code handling)."""
    import random

    from journal_batch_processer_spark.operators.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    def textbook_decode(mcs, data, expected):
        bits = []
        for byte in data:
            for i in range(8):
                bits.append((byte >> i) & 1)  # LSB first
        bp = 0

        def read(width):
            nonlocal bp
            v = 0
            for i in range(width):
                v |= bits[bp + i] << i
            bp += width
            return v

        clear, eoi = 1 << mcs, (1 << mcs) + 1
        out = []
        while True:
            # (re)initialize
            table = {i: bytes([i]) for i in range(clear)}
            next_slot = eoi + 1
            width = mcs + 1
            # skip any leading clear codes
            code = read(width)
            while code == clear:
                code = read(width)
            if code == eoi:
                return out
            out.extend(table[code])
            old = table[code]
            while True:
                if len(out) >= expected:
                    return out[:expected]
                code = read(width)
                if code == clear:
                    break  # back to reinitialize
                if code == eoi:
                    return out
                if code in table:
                    entry = table[code]
                elif code == next_slot:
                    entry = old + old[:1]
                else:
                    raise AssertionError("bad code")
                out.extend(entry)
                table[next_slot] = old + entry[:1]
                next_slot += 1
                if next_slot == (1 << width) and width < 12:
                    width += 1
                old = entry

    rng = random.Random(99)
    for mcs in (2, 4, 8):
        for n in (1, 7, 400, 9000, 30000):
            px = [rng.randrange(1 << mcs) for _ in range(n)]
            enc = _lzw_encode(mcs, px)
            assert textbook_decode(mcs, enc, n) == px, (mcs, n)
            assert _lzw_decode(mcs, enc, n) == px, (mcs, n)
    run = [2] * 6000
    enc = _lzw_encode(3, run)
    assert textbook_decode(3, enc, len(run)) == run


def test_jpeg_422_subsampled_decode():
    """4:2:2 (2×1 luma): hand-built single-MCU 16×8 file with two
    distinct luma blocks — proves the horizontal-only interleave and
    1×2 chroma upsample path the docstring claims."""
    import struct as _struct

    from journal_batch_processer_spark.operators.jpeg import (
        STD_AC_CHROMA,
        STD_AC_LUMA,
        STD_CHROMA_QT,
        STD_DC_CHROMA,
        STD_DC_LUMA,
        STD_LUMA_QT,
        ZIGZAG,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_baseline,
        decode_jpeg_planes,
    )

    out = bytearray()
    out += b"\xff\xd8"
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + _struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc0" + _struct.pack(">HBHHB", 17, 8, 8, 16, 3)
    out += bytes([1, 0x21, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
    ):
        out += b"\xff\xc4" + _struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
    out += b"\xff\xda" + _struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    dc_l, ac_l = _huff_codes(*STD_DC_LUMA), _huff_codes(*STD_AC_LUMA)
    dc_c, ac_c = _huff_codes(*STD_DC_CHROMA), _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()
    prev = 0
    for v in (64, 192):  # left block 64, right block 192
        dcq = (8 * (v - 128)) // STD_LUMA_QT[0]
        diff = dcq - prev
        prev = dcq
        cat = _category(diff)
        c, ln = dc_l[cat]
        bw.put(c, ln)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        c, ln = ac_l[0x00]
        bw.put(c, ln)
    for tdc, tac in ((dc_c, ac_c),) * 2:
        c, ln = tdc[0]
        bw.put(c, ln)
        c, ln = tac[0x00]
        bw.put(c, ln)
    bw.flush()
    data = bytes(out) + bytes(bw.buf) + b"\xff\xd9"

    w, h, planes = decode_jpeg_planes(data)
    assert (w, h) == (16, 8)
    assert planes[0][0][0] == 64 and planes[0][0][8] == 192
    assert len(planes[1][0]) == 8 and len(planes[1]) == 8  # chroma 8×8
    f = decode_jpeg_baseline(data)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == 128.0


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2) — r06
# ---------------------------------------------------------------------------


def test_jpeg_progressive_solid_equals_baseline():
    """The 5-scan progressive fixture (DC first at Al=1, DC refinement,
    per-component EOBn AC scans) decodes to EXACTLY the same planes as
    the sequential encoding of the same image."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        decode_jpeg_planes,
        encode_jpeg_solid_gray,
        encode_jpeg_solid_gray_progressive,
    )

    for dims, v in (((8, 8), 128), ((16, 24), 54), ((40, 8), 254)):
        prog = encode_jpeg_solid_gray_progressive(*dims, v)
        assert b"\xff\xc2" in prog  # really SOF2, five scans
        assert prog.count(b"\xff\xda") == 5
        f = decode_jpeg_baseline(prog)
        assert (f["width"], f["height"]) == dims
        assert f["mean_r"] == f["mean_g"] == f["mean_b"] == float(v)
        _, _, p_prog = decode_jpeg_planes(prog)
        _, _, p_base = decode_jpeg_planes(encode_jpeg_solid_gray(*dims, v))
        assert p_prog == p_base


def test_jpeg_progressive_ac_successive_approximation():
    """Hand-built grayscale SOF2 with an AC coefficient delivered over
    TWO passes (first pass at Al=1 carries 3>>1, the Ah=1/Al=0
    refinement carries the low correction bit) — the successive-
    approximation path real encoders (libjpeg default) emit — verified
    PER-PIXEL against an independent numpy IDCT."""
    import struct as _struct

    import numpy as np

    from journal_batch_processer_spark.operators.jpeg import (
        STD_AC_LUMA,
        STD_DC_LUMA,
        STD_LUMA_QT,
        ZIGZAG,
        _BitWriter,
        _category,
        _huff_codes,
        decode_jpeg_baseline,
        decode_jpeg_planes,
    )

    dcq, acq, ack = 4, 3, 5  # quantized DC, AC=3 at zigzag index 5

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">H", 67) + bytes([0])
    out += bytes(STD_LUMA_QT[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc2" + _struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
    ):
        out += b"\xff\xc4" + _struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)

    def sos(ss, se, ah, al):
        return b"\xff\xda" + _struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, ss, se, (ah << 4) | al]
        )

    dc_l = _huff_codes(*STD_DC_LUMA)
    ac_l = _huff_codes(*STD_AC_LUMA)

    # scan 1: DC first, no approximation
    out += sos(0, 0, 0, 0)
    bw = _BitWriter()
    cat = _category(dcq)
    c, ln = dc_l[cat]
    bw.put(c, ln)
    bw.put(dcq, cat)
    bw.flush()
    out += bytes(bw.buf)

    # scan 2: AC first at Al=1 — run of 4 zeros then (3 >> 1) = 1
    out += sos(1, 63, 0, 1)
    bw = _BitWriter()
    c, ln = ac_l[(4 << 4) | 1]
    bw.put(c, ln)
    bw.put(1, 1)  # amplitude 1
    c, ln = ac_l[0x00]  # EOB for the rest of the band
    bw.put(c, ln)
    bw.flush()
    out += bytes(bw.buf)

    # scan 3: AC refinement Ah=1, Al=0 — EOB then the correction bit
    # for the (now nonzero-history) coefficient: low bit of 3 is 1
    out += sos(1, 63, 1, 0)
    bw = _BitWriter()
    c, ln = ac_l[0x00]
    bw.put(c, ln)
    bw.put(1, 1)  # correction bit
    bw.flush()
    out += bytes(bw.buf)

    out += b"\xff\xd9"
    data = bytes(out)

    w, h, planes = decode_jpeg_planes(data)
    assert (w, h) == (8, 8)

    spec = np.zeros((8, 8))
    spec[0, 0] = dcq * STD_LUMA_QT[0]
    nat = ZIGZAG[ack]
    spec[nat // 8, nat % 8] = acq * STD_LUMA_QT[nat]
    C = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            C[u, x] = (
                np.sqrt(1 / 8 if u == 0 else 2 / 8)
                * np.cos((2 * x + 1) * u * np.pi / 16)
            )
    pix = np.clip(np.round(C.T @ spec @ C + 128), 0, 255)
    got = np.array([[planes[0][y][x] for x in range(8)] for y in range(8)])
    assert np.array_equal(got, pix), (got, pix)
    f = decode_jpeg_baseline(data)
    assert abs(f["mean_r"] - float(pix.mean())) < 1e-9


def test_gif_interlaced_row_order():
    """Interlaced frames store rows in the 4-pass order; a decoder that
    ignored the flag would place stored row 4 at display row 4, but the
    true mapping puts STORED ROW 1 there (8-row image: passes yield
    display order 0,4,2,6,1,3,5,7). Two overlay frames mask every
    display row except 4, so the final composite's mean isolates
    exactly which stored row landed there."""
    import struct

    from journal_batch_processer_spark.operators.gif import (
        _lzw_encode,
        decode_gif_frames,
    )

    w, h = 4, 8
    # palette: 8 distinct row colors + the overlay color X (index 8)
    pal = [(30 * i % 256, (17 * i + 5) % 256, (9 * i + 40) % 256)
           for i in range(8)] + [(200, 200, 200)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 3, 0, 0)  # GCT of 16
    for i in range(16):
        r, g, b = pal[i] if i < len(pal) else (0, 0, 0)
        out += bytes((r, g, b))

    def frame(left, top, fw, fh, pixels, interlaced=False):
        out.extend(b"\x21\xf9" + struct.pack("<BBHB", 4, 0, 2, 0) + b"\x00")
        out.extend(
            b"\x2c"
            + struct.pack("<HHHHB", left, top, fw, fh,
                          0x40 if interlaced else 0)
        )
        out.append(4)  # min code size for the 16-color table
        lzw = _lzw_encode(4, pixels)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)

    # frame 1: interlaced, stored row k is solid color k
    stored = []
    for k in range(8):
        stored.extend([k] * w)
    frame(0, 0, w, h, stored, interlaced=True)
    # frames 2+3: overlays covering display rows 0-3 and 5-7 with X
    frame(0, 0, w, 4, [8] * (w * 4))
    frame(0, 5, w, 3, [8] * (w * 3))

    out.append(0x3B)
    g = decode_gif_frames(bytes(out))
    assert g["n_frames"] == 3
    # display row 4 = STORED ROW 1 (ignoring interlace would give c4)
    c1, cx = pal[1], pal[8]
    final = g["frames"][2]
    assert final["mean_r"] == (7 * cx[0] + c1[0]) / 8
    assert final["mean_g"] == (7 * cx[1] + c1[1]) / 8
    assert final["mean_b"] == (7 * cx[2] + c1[2]) / 8
    # and the interlaced frame itself has the full-canvas mean of all rows
    f1 = g["frames"][0]
    assert f1["mean_r"] == sum(p[0] for p in pal[:8]) / 8


def test_jpeg_restart_markers():
    """DRI/RSTn decode (r06): restart markers byte-align the entropy
    stream every N MCUs and reset DC predictors — verified across
    interval sizes and subsampling modes against the marker-free
    encoding of the same image, plus a desync rejection (wrong DRI
    interval must fail loud, not mis-decode)."""
    import pytest as _pytest

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        decode_jpeg_planes,
        encode_jpeg_solid_gray,
    )

    for sub, dims in (("444", (24, 16)), ("420", (32, 32))):
        plain = decode_jpeg_planes(
            encode_jpeg_solid_gray(dims[0], dims[1], 118, sub)
        )[2]
        for ri in (1, 2, 3):
            data = encode_jpeg_solid_gray(
                dims[0], dims[1], 118, sub, restart_interval=ri
            )
            assert b"\xff\xdd" in data
            f = decode_jpeg_baseline(data)
            assert f["mean_r"] == f["mean_g"] == f["mean_b"] == 118.0
            assert decode_jpeg_planes(data)[2] == plain
    # corrupt the declared interval: markers arrive where the decoder
    # expects entropy data (or vice versa) -> loud failure
    data = bytearray(
        encode_jpeg_solid_gray(24, 16, 118, restart_interval=2)
    )
    i = bytes(data).find(b"\xff\xdd")
    data[i + 5] = 3  # DRI says 3, stream restarts every 2
    with _pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(data))


def test_gif_disposal_3_restore_previous():
    """Disposal 3: the frame's rect reverts to the PRE-frame canvas —
    a frame-2 overlay with disposal 3 is visible in its own composite
    but gone from frame 3's, where the frame-1 content shows through
    (disposal 2 would instead show the background)."""
    import struct

    from journal_batch_processer_spark.operators.gif import (
        _lzw_encode,
        decode_gif_frames,
    )

    pal = [(8, 16, 32), (200, 100, 40), (50, 60, 70)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # GCT of 4
    for i in range(4):
        r, g, b = pal[i] if i < len(pal) else (0, 0, 0)
        out += bytes((r, g, b))

    def frame(pixels, gc_packed):
        out.extend(b"\x21\xf9" + struct.pack("<BBHB", 4, gc_packed, 2, 0))
        out.append(0)
        out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0))
        out.append(2)
        lzw = _lzw_encode(2, pixels)
        out.append(len(lzw))
        out.extend(lzw)
        out.append(0)

    frame([1] * 16, 0x04)  # frame 1: color 1, disposal 1 (leave)
    frame([2] * 16, 0x0C)  # frame 2: color 2, disposal 3 (restore prev)
    frame([0] * 16, 0x05)  # frame 3: ALL-transparent (flag+idx 0? no —
    # transparent flag with index 0 set below)
    out.append(0x3B)
    # rewrite frame 3's GCE: transparent flag on, transparent idx 0
    # (third \x21\xf9 occurrence)
    b = bytes(out)
    i = -1
    for _ in range(3):
        i = b.find(b"\x21\xf9", i + 1)
    out[i + 3] = 0x05  # disposal 1 | transparent flag
    out[i + 6] = 0  # transparent index 0

    g = decode_gif_frames(bytes(out))
    assert g["n_frames"] == 3
    assert g["frames"][0]["mean_r"] == 200.0  # frame 1 visible
    assert g["frames"][1]["mean_r"] == 50.0   # frame 2 overlay visible
    # frame 3 is fully transparent: the disposal-3 restore means frame
    # 1's color shows through (disposal 2 would show background 8.0)
    assert g["frames"][2]["mean_r"] == 200.0


def test_dhash64_words_integer_contract():
    """dHash: exact-integer luma/box pipeline, floor box boundaries on
    non-divisible dims, gradient sanity (monotone-brighter-rightward
    image → all 64 bits set), and the too-small guard."""
    import numpy as np
    import pytest as _pytest

    from journal_batch_processer_spark.operators.multimodal import (
        dhash64_words,
    )

    # strictly increasing luma left->right: every right cell beats its
    # left neighbour -> all bits set in both words
    w, h = 18, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for x in range(w):
        img[:, x, :] = 10 + 13 * x
    w1, w0 = dhash64_words(img)
    assert w0 == 0xFFFFFFFF and w1 == 0xFFFFFFFF
    # constant image: no strict increase anywhere -> zero hash
    flat = np.full((h, w, 3), 77, dtype=np.uint8)
    assert dhash64_words(flat) == (0, 0)
    # non-divisible dims still hash (floor boundaries), deterministic
    odd = np.zeros((11, 13, 3), dtype=np.uint8)
    for x in range(13):
        odd[:, x, :] = 255 - 19 * x  # darker rightward -> zero hash
    assert dhash64_words(odd) == (0, 0)
    with _pytest.raises(ValueError, match="too small"):
        dhash64_words(np.zeros((4, 4, 3), dtype=np.uint8))
