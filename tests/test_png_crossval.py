"""Cross-validation of the pure-Python PNG decoder against the SYSTEM
libpng, plus toolchain-free unit tests for the r07 additions (palette,
sub-byte depths, Adam7 interlace).

The libpng tests compile tools/pngcheck.c on first use and skip
cleanly when gcc/libpng are absent. libpng picks ADAPTIVE per-row
filters and does its own Adam7 pass splitting, so these files exercise
combinations our fixture encoder never emits.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile
import zlib

import pytest

_BIN = None


def _harness():
    global _BIN
    if _BIN is not None:
        return _BIN or None
    _BIN = False
    gcc = shutil.which("gcc")
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "pngcheck.c",
    )
    if not gcc or not os.path.exists(src):
        return None
    out = os.path.join(tempfile.gettempdir(), "jbp_pngcheck")
    r = subprocess.run(
        [gcc, "-O2", "-o", out, src, "-lpng"], capture_output=True
    )
    if r.returncode != 0:
        return None
    _BIN = out
    return out


def _need():
    b = _harness()
    if not b:
        pytest.skip("gcc/libpng toolchain not available")
    return b


def _lib_decode(b, path, mode="decode"):
    import numpy as np

    out = subprocess.run([b, mode, path], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    hdr = list(map(int, lines[0].split()))
    w, h = hdr[0], hdr[1]
    rows = [list(map(int, ln.split())) for ln in lines[1:]]
    return w, h, np.array(rows, dtype=np.float64).reshape(h, w, 3)


@pytest.mark.parametrize(
    "typ",
    ["rgb", "rgba", "gray", "pal", "pal4", "gray16", "rgb16", "ga"],
)
@pytest.mark.parametrize("interlace", [0, 1])
def test_decoder_matches_libpng(tmp_path, typ, interlace):
    """libpng writes an LCG-pattern file (adaptive filters, optional
    Adam7, 8/16-bit, gray+alpha); our decoder's means must equal
    libpng's own RGB-expanded read of the same file exactly — 16-bit
    compared in the NATIVE range via the decode16 mode."""
    b = _need()
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    p = str(tmp_path / f"x_{typ}_{interlace}.png")
    subprocess.run(
        [b, "encode", "13", "9", "77", typ, str(interlace), p], check=True
    )
    mode = "decode16" if typ.endswith("16") else "decode"
    w, h, px = _lib_decode(b, p, mode)
    got = decode_png_bytes(open(p, "rb").read())
    assert (got["width"], got["height"]) == (w, h)
    want = [px[:, :, c].mean() for c in range(3)]
    assert [got["mean_r"], got["mean_g"], got["mean_b"]] == want


def test_libpng_reads_our_fixture_encoder(tmp_path):
    """The fixture encoder's filter-cycling output is readable by
    libpng with identical pixel content."""
    b = _need()
    from journal_batch_processer_spark.operators.multimodal import (
        encode_png_bytes,
    )

    rows = [[(10, 200, 30)] * 7 for _ in range(5)]
    p = str(tmp_path / "ours.png")
    with open(p, "wb") as f:
        f.write(encode_png_bytes(7, 5, rows, filter_for_row=lambda y: y % 5))
    w, h, px = _lib_decode(b, p)
    assert (w, h) == (7, 5)
    assert (px[:, :, 0] == 10).all()
    assert (px[:, :, 1] == 200).all()
    assert (px[:, :, 2] == 30).all()


# ---------------------- toolchain-free unit tests (hand-built PNGs)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _build_png(w, h, bit_depth, color_type, interlace, raster, plte=None):
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace),
    )
    if plte is not None:
        out += _chunk(b"PLTE", b"".join(bytes(c) for c in plte))
    out += _chunk(b"IDAT", zlib.compress(raster))
    out += _chunk(b"IEND", b"")
    return out


def test_palette_png_handbuilt():
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    # 4x2, 8-bit palette: indices 0 1 2 3 / 3 2 1 0, filter None rows
    plte = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    raster = bytes([0, 0, 1, 2, 3]) + bytes([0, 3, 2, 1, 0])
    got = decode_png_bytes(_build_png(4, 2, 8, 3, 0, raster, plte))
    assert (got["width"], got["height"], got["channels"]) == (4, 2, 3)
    assert got["mean_r"] == (255 + 0 + 0 + 10) * 2 / 8
    assert got["mean_g"] == (0 + 255 + 0 + 20) * 2 / 8
    assert got["mean_b"] == (0 + 0 + 255 + 30) * 2 / 8


def test_palette_png_4bit_packing():
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    # 3x1, 4-bit palette: pixels 1, 2, 3 pack as 0x12 0x30
    plte = [(0, 0, 0), (100, 0, 0), (0, 100, 0), (0, 0, 100)]
    raster = bytes([0, 0x12, 0x30])
    got = decode_png_bytes(_build_png(3, 1, 4, 3, 0, raster, plte))
    assert got["mean_r"] == 100 / 3
    assert got["mean_g"] == 100 / 3
    assert got["mean_b"] == 100 / 3


def test_adam7_gray_handbuilt():
    """2x2 8-bit gray, Adam7: passes 1 (1 px), 6 (1 px), 7 (1 row of
    2 px) — values placed at the right coordinates."""
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    # pass1: pixel (0,0)=10; pass6: pixel (1,0)=20; pass7: row y=1: 30 40
    raster = bytes([0, 10]) + bytes([0, 20]) + bytes([0, 30, 40])
    got = decode_png_bytes(_build_png(2, 2, 8, 0, 1, raster))
    assert got["mean_r"] == (10 + 20 + 30 + 40) / 4


def test_palette_index_out_of_range_fails_loud():
    import pytest as _pytest

    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    plte = [(1, 2, 3)]
    raster = bytes([0, 5])  # index 5, palette has 1 entry
    with _pytest.raises(ValueError, match="palette"):
        decode_png_bytes(_build_png(1, 1, 8, 3, 0, raster, plte))


def test_trns_accepted_and_validated():
    """tRNS is parsed and validated (r07) — it no longer rejects the
    file; transparency is ignored for the mean features exactly like
    the alpha CHANNEL on color types 4/6. Invalid tRNS (longer than
    the palette, or present alongside an alpha channel) still fails
    loud."""
    import pytest as _pytest

    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    plte = [(10, 20, 30)]
    png = _build_png(1, 1, 8, 3, 0, bytes([0, 0]), plte)
    idat_at = png.find(b"IDAT") - 4
    ok = png[:idat_at] + _chunk(b"tRNS", b"\x80") + png[idat_at:]
    got = decode_png_bytes(ok)
    assert (got["mean_r"], got["mean_g"], got["mean_b"]) == (10, 20, 30)
    # tRNS longer than the palette is malformed
    bad = png[:idat_at] + _chunk(b"tRNS", b"\x80\x80") + png[idat_at:]
    with _pytest.raises(ValueError, match="tRNS"):
        decode_png_bytes(bad)


def test_16bit_png_handbuilt():
    """2x1 16-bit grayscale: big-endian sample pairs, native-range
    means (0..65535)."""
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    # samples 0x1234 and 0x8000, filter None
    raster = bytes([0, 0x12, 0x34, 0x80, 0x00])
    got = decode_png_bytes(_build_png(2, 1, 16, 0, 0, raster))
    assert got["channels"] == 1
    assert got["mean_r"] == (0x1234 + 0x8000) / 2


def test_gray_alpha_png_handbuilt():
    """1x2 8-bit gray+alpha (color type 4): feature is the gray
    sample, alpha ignored."""
    from journal_batch_processer_spark.operators.multimodal import (
        decode_png_bytes,
    )

    raster = bytes([0, 100, 255]) + bytes([0, 200, 0])
    got = decode_png_bytes(_build_png(1, 2, 8, 4, 0, raster))
    assert got["channels"] == 1
    assert got["mean_r"] == 150.0
