"""Pure-stdlib baseline JPEG codec (no PIL, no numpy in the decode
path): a minimal encoder used to build test/oracle fixtures and a
general baseline (SOF0) sequential decoder.

Scope — honest and loud:
- decode: baseline DCT sequential (SOF0) AND progressive (SOF2 —
  spectral selection + successive approximation with DC and AC
  refinement per T.81 G.2, r06), 8-bit, 1 or 3 components,
  interleaved scans with integer sampling factors (4:4:4, 4:2:2,
  4:2:0 — the shapes virtually every camera/encoder emits; chroma is
  upsampled by sample replication per the T.81 interleave, r06), and
  restart markers (DRI/RSTn) in BOTH the baseline and progressive
  paths (per-scan RSTn cycling, predictor resets, EOB runs bounded by
  restart segments per G.1.2.2, r06/r07). Sequential decode also
  handles 12-BIT precision (SOF1 extended sequential: 16-bit Pq=1
  quantizers, 2048 level shift, 0..4095 clamp — the DICOM/film-scan
  shape, r07) and ARITHMETIC entropy coding (SOF9 extended
  sequential: the T.81 Annex D QM coder with the Table D.3 adaptive
  state machine and the F.2.4 DC/AC decision trees, r07) and
  PROGRESSIVE-arithmetic (SOF10: the G.2 arithmetic variants — DC
  first/refine, banded AC first, the AC refinement correction-bit
  algorithm — with restart support, r07). The QM layer is
  cross-validated coefficient-exact against the system libjpeg in
  both directions (operators/jpeg_arith.py,
  tests/test_jpeg_crossval.py). Every DCT-based T.81 coding mode is
  therefore covered: SOF0/1/2/9/10, 8- and 12-bit sequential, all
  with DRI/RSTn; 12-bit PROGRESSIVE (Pq=1 quantizers + SOF2/SOF10
  precision 12, r08) included. Sequential frames — Huffman OR
  arithmetic (r08) — may declare HEIGHT 0 and define it via a DNL
  segment after the first scan (B.2.5, r07). LOSSLESS —
  Huffman (SOF3, Annex H, r07) AND arithmetic (SOF11, H.1.2.2 + QM
  coder, r08) — decodes 1..4 components at ANY 1..4 sampling
  (r08 s4: interleaved scans code h×v-sample MCUs on the padded
  grid, per Annex A geometry) — 2..16-bit, all seven predictors,
  point transform, restarts, bit-exact roundtrips; multi-component
  lossless reports PER-COMPONENT means over each component's own
  grid (no color transform is defined for it)
  (operators/jpeg_lossless.py). FRACTIONAL sampling ratios decode in
  sequential frames (r08 — nearest-sample upsampling; libjpeg rejects
  such files) AND progressive frames (r08 s3 — interleaved scans on
  the padded MCU grid, per-component scans on the component's own
  grid, same shared color stage). HIERARCHICAL pyramids (Annex K,
  operators/jpeg_hier.py)
  decode with EVERY differential process (r08): sequential (SOF5/13),
  PROGRESSIVE (SOF6/14 — the jpeg.py scan decoders reused with
  PRED=0), and LOSSLESS (SOF7/15 — Ss=0 no-prediction corrections
  added modulo 2^16, so lossless pyramids reconstruct bit-exactly),
  Huffman or QM-arithmetic throughout; differential frames — DCT
  AND lossless (r08 s4) — accept ANY 1..4 sampling including
  fractional ratios (per-component reference planes, sampling pinned
  across pyramid frames). Lossless scans may be interleaved OR
  one-per-component (r08 s3 — the DICOM RGB multi-scan layout,
  per-scan predictor/Pt honored, both entropy coders). The
  non-hierarchical T.81 matrix carries NO remaining gates; the only
  named NotImplementedError sites left are hierarchical exotica —
  non-interleaved differential scans and multi-band (second
  non-differential frame) composition — plus the sampling-changed-
  across-pyramid-frames consistency check.
  A production path could still swap in PIL behind the same Decoder
  interface (operators/multimodal.get_decoder).
- encode: solid-gray images only (the fixture shape): for an
  even-valued gray level v, Y = v and Cb = Cr = 128 EXACTLY (BT.601
  with r=g=b), the DC coefficient 8·(v−128) divides the standard
  luminance quantizer Q00 = 16, so quantization is lossless and the
  decoded image equals the input bit-for-bit — which is what lets a
  DuckDB oracle state the decoded means in closed form while the
  payload is a genuinely entropy-coded JPEG bitstream. A solid image
  is also subsampling-invariant, so the same closed form covers the
  4:2:0 fixture (``subsampling="420"``) and exercises the 2×2-luma
  MCU interleave + chroma upsample end-to-end.

Tables are the public JPEG spec's (ITU T.81 Annex K): standard
luminance/chrominance quantization matrices and the typical Huffman
tables. Zigzag order per the spec.
"""

from __future__ import annotations

import math
import struct

# ITU T.81 Annex K.1 — standard quantization tables (zigzag order here
# is NOT used; these are in natural row-major order)
STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:  # pad with 1-bits per spec
            self.put(1, 1)


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def encode_jpeg_solid_gray(
    width: int,
    height: int,
    v: int,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF of a solid GRAY image (r=g=b=v), standard
    tables. ``v`` must be even and dimensions multiples of 8 (of 16
    for ``subsampling="420"``) so DC quantization is exact and the
    decode round-trips bit-for-bit (module docstring).

    ``subsampling``: "444" (all components 1×1) or "420" (luma 2×2,
    chroma 1×1 — per-MCU interleave Y Y Y Y Cb Cr).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many MCUs (byte-aligned, n cycling 0..7, DC predictors
    reset — the resync structure camera encoders emit, r06)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"fixture encoder: unknown subsampling {subsampling!r}")
    mcu = 8 if subsampling == "444" else 16
    if width % mcu or height % mcu:
        raise ValueError(f"fixture encoder requires multiple-of-{mcu} dims")
    if v % 2 or not 0 <= v <= 255:
        raise ValueError("fixture encoder requires an even gray 0..255")

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: table 0 (luma), table 1 (chroma), zigzag order
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    # SOF0: 3 components
    luma_samp = 0x11 if subsampling == "444" else 0x22
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, luma_samp, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    # DHT: 4 standard tables
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)
        ) + bytes([(cls << 4) | tid])
        out += bytes(bits[1:17]) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    # entropy-coded data: Y DC = 8*(v-128)/Q00 on the first block of
    # each restart segment then diff 0; chroma DC = 0; AC all zero (EOB)
    dc_y = (8 * (v - 128)) // STD_LUMA_QT[0]  # exact by construction
    dc_luma = _huff_codes(*STD_DC_LUMA)
    ac_luma = _huff_codes(*STD_AC_LUMA)
    dc_chroma = _huff_codes(*STD_DC_CHROMA)
    ac_chroma = _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()

    def put_block(table_dc, table_ac, diff: int) -> None:
        cat = _category(diff)
        code, length = table_dc[cat]
        bw.put(code, length)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        code, length = table_ac[0x00]  # EOB
        bw.put(code, length)

    luma_per_mcu = 1 if subsampling == "444" else 4
    n_mcus = (width // mcu) * (height // mcu)
    prev_dc = 0
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()  # byte-align, 1-padded per spec
            out += bw.buf
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            bw = _BitWriter()
            prev_dc = 0  # predictors reset at the restart
        for _ in range(luma_per_mcu):
            put_block(dc_luma, ac_luma, dc_y - prev_dc)
            prev_dc = dc_y
        put_block(dc_chroma, ac_chroma, 0)  # Cb
        put_block(dc_chroma, ac_chroma, 0)  # Cr
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_solid_gray_samp(
    width: int,
    height: int,
    v: int,
    samps: tuple = ((3, 1), (2, 1), (1, 1)),
    restart_interval: int = 0,
) -> bytes:
    """Sequential JFIF of a solid gray with ARBITRARY per-component
    sampling factors — including FRACTIONAL ratios (component factors
    that do not divide the frame maximum, e.g. 2 against 3), the T.81
    corner that libjpeg has never implemented ("Fractional sampling
    not implemented yet"). Solid content keeps every decoded mean
    exactly ``v`` whatever the upsampling mapping, so the fixture
    stays closed-form while the geometry is genuinely fractional."""
    hs = [h for h, _v in samps]
    vs = [vv for _h, vv in samps]
    if not all(1 <= x <= 4 for x in hs + vs):
        raise ValueError("sampling factors must be 1..4")
    hmax, vmax = max(hs), max(vs)
    if width % (8 * hmax) or height % (8 * vmax):
        raise ValueError("fixture encoder requires MCU-aligned dims")
    if v % 2 or not 0 <= v <= 255:
        raise ValueError("fixture encoder requires an even gray 0..255")
    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for ci, (h, vv) in enumerate(samps):
        out += bytes([ci + 1, (h << 4) | vv, 0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [(cls << 4) | tid]
        )
        out += bytes(bits[1:17]) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    dc_y = (8 * (v - 128)) // STD_LUMA_QT[0]
    dc_luma = _huff_codes(*STD_DC_LUMA)
    ac_luma = _huff_codes(*STD_AC_LUMA)
    dc_chroma = _huff_codes(*STD_DC_CHROMA)
    ac_chroma = _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()

    def put_block(table_dc, table_ac, diff: int) -> None:
        cat = _category(diff)
        code, length = table_dc[cat]
        bw.put(code, length)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        code, length = table_ac[0x00]  # EOB
        bw.put(code, length)

    n_mcus = (width // (8 * hmax)) * (height // (8 * vmax))
    prev_dc = 0
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.buf
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            bw = _BitWriter()
            prev_dc = 0
        for ci, (h, vv) in enumerate(samps):
            for _ in range(h * vv):
                if ci == 0:
                    put_block(dc_luma, ac_luma, dc_y - prev_dc)
                    prev_dc = dc_y
                else:
                    put_block(dc_chroma, ac_chroma, 0)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_solid_gray_arith(width: int, height: int, v: int) -> bytes:
    """Arithmetic-coded (SOF9) JFIF of a solid GRAY image: the same
    exactness contract as the baseline fixture encoder, with the
    entropy layer swapped for the QM coder (operators/jpeg_arith.py) —
    DAC conditioning at the T.81 defaults (DC L=0 U=1, AC Kx=5).
    Cross-validated: the system libjpeg decodes these files to the
    same solid value (tests/test_jpeg_crossval.py)."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        ArithEncoder,
        Stats,
        encode_ac_coefs,
        encode_dc_diff,
    )

    if width % 8 or height % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    if v % 2 or not 0 <= v <= 255:
        raise ValueError("fixture encoder requires an even gray 0..255")

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc9" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    # DAC: default conditioning for DC/AC tables 0 and 1
    out += b"\xff\xcc" + struct.pack(">H", 10)
    out += bytes([0x00, 0x10, 0x01, 0x10, 0x10, 5, 0x11, 5])
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    dc_y = (8 * (v - 128)) // STD_LUMA_QT[0]
    enc = ArithEncoder()
    dc_stats = {0: Stats(DC_STAT_SLOTS), 1: Stats(DC_STAT_SLOTS)}
    ac_stats = {0: Stats(AC_STAT_SLOTS), 1: Stats(AC_STAT_SLOTS)}
    dc_ctx = [0, 0, 0]
    last_dc = [0, 0, 0]
    zz_zero = [0] * 64
    for blk in range((width // 8) * (height // 8)):
        for ci, (dct, act) in enumerate(((0, 0), (1, 1), (1, 1))):
            target = dc_y if ci == 0 else 0
            diff = target - last_dc[ci]
            dc_ctx[ci] = encode_dc_diff(
                enc, dc_stats[dct], dc_ctx[ci], 0, 1, diff
            )
            last_dc[ci] = target
            encode_ac_coefs(enc, ac_stats[act], 5, zz_zero)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_solid_gray12(width: int, height: int, v: int) -> bytes:
    """Extended sequential (SOF1) 12-bit JFIF of a solid GRAY image
    (r=g=b=v in the 0..4095 sample range): the precision used by
    medical/scientific capture (DICOM) and film scans. Same exactness
    contract as the 8-bit encoder — even ``v`` makes the level-shifted
    DC 8·(v−2048) divide Q00 = 16 exactly, chroma sits at the 12-bit
    midpoint 2048 (DC 0), so the decode round-trips bit-for-bit and
    the mean features stay closed-form. Quantizers are emitted as
    16-bit DQT entries (Pq=1) — the table form 12-bit streams use.
    Standard DC tables cover the diff categories (|diff| ≤ 1023 →
    category ≤ 10 ≤ 11)."""
    if width % 8 or height % 8:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    if v % 2 or not 0 <= v <= 4095:
        raise ValueError("fixture encoder requires an even gray 0..4095")

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT with Pq=1 (16-bit entries), zigzag order
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([(1 << 4) | tid])
        for i in range(64):
            out += struct.pack(">H", qt[ZIGZAG[i]])
    # SOF1 (extended sequential, Huffman), precision 12
    out += b"\xff\xc1" + struct.pack(">HBHHB", 17, 12, height, width, 3)
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)
        ) + bytes([(cls << 4) | tid])
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    dc_y = (8 * (v - 2048)) // STD_LUMA_QT[0]  # exact by construction
    dc_luma = _huff_codes(*STD_DC_LUMA)
    ac_luma = _huff_codes(*STD_AC_LUMA)
    dc_chroma = _huff_codes(*STD_DC_CHROMA)
    ac_chroma = _huff_codes(*STD_AC_CHROMA)
    bw = _BitWriter()

    def put_block(table_dc, table_ac, diff: int) -> None:
        cat = _category(diff)
        code, length = table_dc[cat]
        bw.put(code, length)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        code, length = table_ac[0x00]  # EOB
        bw.put(code, length)

    prev_dc = 0
    for _ in range((width // 8) * (height // 8)):
        put_block(dc_luma, ac_luma, dc_y - prev_dc)
        prev_dc = dc_y
        put_block(dc_chroma, ac_chroma, 0)  # Cb
        put_block(dc_chroma, ac_chroma, 0)  # Cr
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("jpeg: dangling 0xFF in entropy data")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"jpeg: unexpected marker 0xFF{marker:02X} mid-scan "
                        "(restart marker outside a DRI boundary, or "
                        "truncated entropy data)"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self, m: int) -> None:
        """Byte-align (discarding pad bits) and consume RST``m``
        (T.81 F.2.2.5: restart markers sit on byte boundaries inside
        the entropy stream; DC predictors reset after each)."""
        self.n = 0  # drop partial-byte pad bits
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + m
        ):
            raise ValueError(f"jpeg: expected restart marker RST{m}")
        self.pos += 2


def _huff_decoder(bits: list[int], vals: list[int]):
    """Return dict (length, code) -> value for sequential decode."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("jpeg: invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_IDCT_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct_block(
    coef: list[int], half: int = 128, maxval: int = 255, lo: int = 0
) -> list[int]:
    """Reference 2-D IDCT (T.81 A.3.3), separable rows/cols, then
    level shift (2^(P-1)) + clamp to [lo, maxval]. DIFFERENTIAL frames
    (hierarchical mode) pass half=0, lo=-maxval: their spatial output
    is a SIGNED correction added to the reference frame, so clamping
    at zero would destroy negative corrections (K.4). O(8·8·8) per
    dimension — fine for fixtures; a production decoder uses AAN."""
    tmp = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _IDCT_C[u] * coef[y * 8 + u] * _IDCT_COS[x][u]
            tmp[y * 8 + x] = s / 2
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _IDCT_C[v] * tmp[v * 8 + x] * _IDCT_COS[y][v]
            val = int(round(s / 2)) + half
            out[y * 8 + x] = lo if val < lo else maxval if val > maxval else val
    return out


def decode_jpeg_baseline(data: bytes) -> dict:
    """Decode a baseline sequential JPEG (scope in the module
    docstring) and return features: width, height, channels, and
    per-channel means over the REAL image area (padding columns/rows
    from the 8-multiple block grid are excluded). Truncated or
    malformed payloads raise ValueError — never a silent partial
    decode."""
    try:
        return _decode_jpeg_baseline(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"jpeg: truncated or malformed payload ({e})") from e


def decode_jpeg_planes(data: bytes):
    """Decode to raw component planes (Y or Y/Cb/Cr, block-grid sized):
    (width, height, [plane[y][x]]). The per-pixel surface the tests
    verify against an independent IDCT — feature means alone cannot
    detect coefficient-scaling bugs (AC basis functions are
    zero-mean)."""
    try:
        w, h, _comps, planes, _prec = _decode_jpeg_planes(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"jpeg: truncated or malformed payload ({e})") from e
    return w, h, planes


def _frame_sof(data: bytes) -> int | None:
    """The stream's SOFn marker byte (first frame header), or None."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        pos += 2
        if m in (0xD9, 0xDA):
            return None
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        if pos + 2 > len(data):
            return None
        pos += struct.unpack(">H", data[pos : pos + 2])[0]
    return None


def _decode_jpeg_baseline(data: bytes) -> dict:
    w, h, comps, planes, prec = _decode_jpeg_planes(data)
    half, maxval = 1 << (prec - 1), (1 << prec) - 1
    n = w * h
    if len(comps) > 1 and _frame_sof(data) in (0xC3, 0xCB):
        # LOSSLESS multi-component carries NO defined color transform
        # (T.81 Annex H says nothing about YCbCr): report the first
        # three components' means directly, never BT.601 — each over
        # its OWN sample count (subsampled components return natural-
        # size planes, r08 s4)
        def _pmean(pl):
            return sum(sum(row) for row in pl) / (len(pl) * len(pl[0]))

        means = [_pmean(planes[min(c, len(planes) - 1)]) for c in range(3)]
        return {
            "width": w,
            "height": h,
            "channels": len(comps),
            "mean_r": means[0],
            "mean_g": means[1],
            "mean_b": means[2],
        }
    if len(comps) == 1:
        tot = sum(sum(planes[0][y][x] for x in range(w)) for y in range(h))
        mean = tot / n
        return {
            "width": w,
            "height": h,
            "channels": 1,
            "mean_r": mean,
            "mean_g": mean,
            "mean_b": mean,
        }
    # chroma upsample by sample replication: component i's plane is at
    # (hi/hmax, vi/vmax) resolution of the luma grid
    hmax = max(hi for _cid, _tq, hi, _vi in comps)
    vmax = max(vi for _cid, _tq, _hi, vi in comps)
    (_c0, _t0, h0, v0), (_c1, _t1, h1, v1), (_c2, _t2, h2, v2) = comps
    sr = sg = sb = 0
    for y in range(h):
        yrow = planes[0][y * v0 // vmax]
        cbrow = planes[1][y * v1 // vmax]
        crrow = planes[2][y * v2 // vmax]
        for x in range(w):
            yy = yrow[x * h0 // hmax]
            cb = cbrow[x * h1 // hmax] - half
            cr = crrow[x * h2 // hmax] - half
            r = int(round(yy + 1.402 * cr))
            g = int(round(yy - 0.344136 * cb - 0.714136 * cr))
            b = int(round(yy + 1.772 * cb))
            sr += 0 if r < 0 else maxval if r > maxval else r
            sg += 0 if g < 0 else maxval if g > maxval else g
            sb += 0 if b < 0 else maxval if b > maxval else b
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "mean_r": sr / n,
        "mean_g": sg / n,
        "mean_b": sb / n,
    }


def _decode_jpeg_planes(data: bytes):
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    scan_comps = None
    entropy_start = None
    restart_interval = 0
    arith = False
    # arithmetic conditioning (T.81 defaults when no DAC): DC (L,U),
    # AC Kx, per table id
    arith_dc_cond: dict[int, tuple[int, int]] = {}
    arith_ac_cond: dict[int, int] = {}
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them, never treat a fill 0xFF as a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (Pq=0: 8-bit entries; Pq=1: 16-bit)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                qt = [0] * 64
                if pq == 0:
                    zz = seg[p + 1 : p + 65]
                    for i in range(64):
                        qt[ZIGZAG[i]] = zz[i]
                    p += 65
                elif pq == 1:
                    zz = seg[p + 1 : p + 129]
                    for i in range(64):
                        qt[ZIGZAG[i]] = (zz[2 * i] << 8) | zz[2 * i + 1]
                    p += 129
                else:
                    raise ValueError(f"jpeg: bad DQT precision {pq}")
                qts[tq] = qt
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC9):
            # SOF0 baseline / SOF1 extended seq. / SOF9 arithmetic seq.
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if marker == 0xC0 and prec != 8:
                raise ValueError("jpeg: baseline SOF0 must be 8-bit")
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"jpeg: {prec}-bit precision unsupported"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"jpeg: invalid sampling factors {hi}x{vi}")
                comps.append((cid, tq, hi, vi))
            frame = (w, h, comps, prec)
            arith = marker == 0xC9
        elif marker in (0xC2, 0xCA):  # SOF2/SOF10 progressive
            return _decode_jpeg_progressive(data)
        elif marker == 0xC3:  # SOF3 lossless — separate decode path
            from journal_batch_processer_spark.operators.jpeg_lossless import (
                decode_jpeg_lossless,
            )

            return decode_jpeg_lossless(data)
        elif marker == 0xCB:  # SOF11 lossless arithmetic (r08)
            from journal_batch_processer_spark.operators.jpeg_lossless import (
                decode_jpeg_lossless_arith,
            )

            return decode_jpeg_lossless_arith(data)
        elif marker == 0xDE:  # DHP — hierarchical pyramid (r08).
            # Before this dispatch existed the decoder would sail past
            # DHP and return the FIRST frame only — a reduced-
            # resolution image presented silently as the answer.
            from journal_batch_processer_spark.operators.jpeg_hier import (
                decode_jpeg_hierarchical,
            )

            return decode_jpeg_hierarchical(data)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (differential) unsupported"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                if tc == 0:
                    arith_dc_cond[tb] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    arith_ac_cond[tb] = cs  # Kx
                p += 2
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tables >> 4, tables & 0xF))
            entropy_start = pos + seglen
            break
        elif marker == 0xDD:  # DRI — restart interval in MCUs (r06)
            restart_interval = struct.unpack(">H", seg[:2])[0]
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    w, h, comps, prec = frame
    if len(scan_comps) != len(comps):
        raise NotImplementedError("jpeg: multi-scan files unsupported")
    # scan components are matched to frame components BY ID (a legal
    # file may list them in any order; positional pairing would decode
    # with the wrong Huffman/quant tables — ADVICE r05)
    frame_by_id = {cid: i for i, (cid, _tq, _hi, _vi) in enumerate(comps)}
    for cid, _dct, _act in scan_comps:
        if cid not in frame_by_id:
            raise ValueError(f"jpeg: scan component id {cid} not in frame")

    # DNL (T.81 B.2.5): a frame may declare HEIGHT 0 and define the
    # real number of lines in a DNL segment after the first scan —
    # the streaming-encoder shape where the line count isn't known at
    # header time. Resolve it before geometry is computed.
    if h == 0:
        # works for arithmetic scans too: the QM coder byte-stuffs 0x00
        # after 0xFF exactly like the Huffman coder (T.81 B.1.1.5), so
        # the forward marker scan finds FF DC the same way
        dnl_at = _entropy_end(data, entropy_start, skip_restarts=True)
        if data[dnl_at : dnl_at + 2] != b"\xff\xdc":
            raise ValueError(
                "jpeg: frame height 0 but no DNL marker after the scan"
            )
        (nl,) = struct.unpack(">H", data[dnl_at + 4 : dnl_at + 6])
        if nl == 0:
            raise ValueError("jpeg: DNL declares zero lines")
        h = nl
    # sample range follows the frame precision: 8-bit → shift 128,
    # clamp 255; 12-bit (SOF1) → shift 2048, clamp 4095 (T.81 A.3.1)
    half, maxval = 1 << (prec - 1), (1 << prec) - 1
    # single-component scans are non-interleaved: the MCU is one data
    # unit, so sampling factors play no dimensional role
    if len(comps) == 1:
        comps = [(comps[0][0], comps[0][1], 1, 1)]
    # Sampling ratios need NOT divide the frame maximum: the
    # per-component planes live at their own (hi, vi) block grid and
    # the color stage maps luma-grid coordinates with x*hi//hmax —
    # nearest-sample replication that is exact for integer ratios and
    # a legitimate decoder-chosen upsampling for FRACTIONAL ones
    # (T.81 A.1.1 allows any 1..4 factors and leaves the upsampling
    # filter to the decoder; libjpeg rejects these files outright).
    hmax = max(hi for _cid, _tq, hi, _vi in comps)
    vmax = max(vi for _cid, _tq, _hi, vi in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component planes at the component's own resolution, padded
    # to the MCU block grid
    planes = [
        [[0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)]
        for _cid, _tq, hi, vi in comps
    ]
    if arith:
        _decode_arith_scan(
            data, entropy_start, comps, scan_comps, frame_by_id, qts,
            planes, mcux, mcuy, restart_interval,
            arith_dc_cond, arith_ac_cond, half, maxval,
        )
        return w, h, comps, planes, prec

    # Entropy data runs to the FIRST real marker after the scan (EOI in
    # a single-scan baseline file). Scanning forward — not
    # rfind(FFD9), which picks the LAST FFD9 and lets trailing garbage
    # that happens to contain FF D9 extend the slice past the real EOI
    # into a confusing mid-scan error (ADVICE r06).
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    br = _BitReader(data[entropy_start:end])
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for mcu_y in range(mcuy):
        for mcu_x in range(mcux):
            # DRI: every `restart_interval` MCUs the stream byte-aligns
            # on an RSTn marker (n cycles 0..7) and DC predictors reset
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.expect_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            mcu_count += 1
            # T.81 B.2.3: within an MCU, data units follow SCAN
            # component order; each component contributes Hi×Vi blocks
            # in raster order
            for cid, dct, act in scan_comps:
                ci = frame_by_id[cid]
                _cid, qtid, hi, vi = comps[ci]
                qt = qts[qtid]
                plane = planes[ci]
                for bv in range(vi):
                    for bh in range(hi):
                        cat = _read_huff(br, dc_tables[dct])
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        preds[ci] += diff
                        coef = [0] * 64
                        coef[0] = preds[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, ac_tables[act])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overrun")
                            # quantizer lookup in NATURAL order: qt was
                            # de-zigzagged at DQT parse, and k is a
                            # zigzag scan index — qt[k] would scale
                            # every AC coefficient by the wrong
                            # quantizer (caught by per-pixel review
                            # test; means alone cannot see it because
                            # AC basis functions are zero-mean)
                            coef[ZIGZAG[k]] = _extend(br.bits(s), s) * qt[ZIGZAG[k]]
                            k += 1
                        block = _idct_block(coef, half, maxval)
                        py = (mcu_y * vi + bv) * 8
                        px = (mcu_x * hi + bh) * 8
                        for yy in range(8):
                            row = plane[py + yy]
                            row[px : px + 8] = block[yy * 8 : yy * 8 + 8]

    return w, h, comps, planes, prec


def _decode_arith_scan(
    data, entropy_start, comps, scan_comps, frame_by_id, qts, planes,
    mcux, mcuy, restart_interval, dc_cond, ac_cond, half, maxval,
):
    """Arithmetic-coded sequential scan (SOF9): same MCU interleave as
    the Huffman path, entropy decisions via the QM coder with the
    F.2.4 DC/AC decision trees (operators/jpeg_arith.py). Restart
    markers re-initialize the coder AND all statistics (F.2.2.5)."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        FIXED_BIN,
        ArithDecoder,
        DC_STAT_SLOTS,
        AC_STAT_SLOTS,
        Stats,
        decode_ac_coefs,
        decode_dc_diff,
    )

    def fresh_state():
        dc_stats = {dct: Stats(DC_STAT_SLOTS) for _c, dct, _a in scan_comps}
        ac_stats = {act: Stats(AC_STAT_SLOTS) for _c, _d, act in scan_comps}
        return dc_stats, ac_stats

    fixed = Stats(1)
    fixed.idx[0] = FIXED_BIN
    dec = ArithDecoder(data, entropy_start)
    dc_stats, ac_stats = fresh_state()
    dc_ctx = [0] * len(comps)
    last_dc = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for mcu_y in range(mcuy):
        for mcu_x in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                # the coder must have stopped at the expected RSTn
                if dec.marker_pos is None:
                    # force it to notice the marker (well-formed
                    # streams already consumed all data for the
                    # segment; a desync shows up as a wrong marker)
                    pass
                mp = dec.marker_pos
                if mp is None or data[mp + 1] != 0xD0 + rst:
                    raise ValueError(
                        f"jpeg: expected restart marker RST{rst}"
                    )
                dec = ArithDecoder(data, mp + 2)
                dc_stats, ac_stats = fresh_state()
                dc_ctx = [0] * len(comps)
                last_dc = [0] * len(comps)
                rst = (rst + 1) & 7
            mcu_count += 1
            for cid, dct, act in scan_comps:
                ci = frame_by_id[cid]
                _cid, qtid, hi, vi = comps[ci]
                qt = qts[qtid]
                plane = planes[ci]
                ll, uu = dc_cond.get(dct, (0, 1))
                kx = ac_cond.get(act, 5)
                bw = mcux * hi
                for bv in range(vi):
                    for bh in range(hi):
                        diff, dc_ctx[ci] = decode_dc_diff(
                            dec, dc_stats[dct], dc_ctx[ci], ll, uu
                        )
                        last_dc[ci] += diff
                        coef = [0] * 64
                        coef[0] = last_dc[ci] * qt[0]
                        decode_ac_coefs(
                            dec, ac_stats[act], fixed, kx, coef, ZIGZAG, qt
                        )
                        block = _idct_block(coef, half, maxval)
                        py = (mcu_y * vi + bv) * 8
                        px = (mcu_x * hi + bh) * 8
                        for yy in range(8):
                            row = plane[py + yy]
                            row[px : px + 8] = block[yy * 8 : yy * 8 + 8]


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 G.2 / F.2.2 (r06)
# ---------------------------------------------------------------------------


def _entropy_end(data: bytes, start: int, skip_restarts: bool = False) -> int:
    """First real marker position at/after ``start`` (skips stuffed
    0xFF00 and 0xFF fill bytes). With ``skip_restarts`` RSTn markers
    are part of the entropy stream (baseline DRI path) and are skipped;
    without it they raise (progressive-with-restarts stays gated)."""
    i = start
    while i + 1 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        nxt = data[i + 1]
        if nxt == 0x00:
            i += 2
            continue
        if nxt == 0xFF:
            i += 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            if skip_restarts:
                i += 2
                continue
            raise NotImplementedError("jpeg: restart markers unsupported")
        return i
    raise ValueError("jpeg: entropy data ran past EOF")


def _decode_jpeg_progressive(data: bytes):
    """Progressive JPEG: quantized coefficients accumulate across scans
    (spectral selection Ss..Se + successive approximation Ah/Al, both
    DC and AC refinement implemented per the public T.81 spec, G.2);
    dequantization + IDCT run ONCE at EOI over the accumulated
    coefficient store. Returns the same (w, h, comps, planes) tuple as
    the baseline path, so every feature/means consumer is agnostic to
    the coding process."""
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    coefs = None  # per comp: list[blocks][64] QUANTIZED, natural order
    geom = None  # (hmax, vmax, mcux, mcuy, per-comp dims)
    restart_interval = 0  # DRI state; applies to subsequent scans
    arith = False  # SOF10: QM-coded scans (T.81 G.2 arithmetic)
    frame_prec = 8  # sample precision from SOF2/SOF10 (8 or 12)
    arith_dc_cond: dict[int, tuple[int, int]] = {}
    arith_ac_cond: dict[int, int] = {}

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"jpeg: bad DQT precision {pq}")
                # Pq=1: 16-bit entries — the table form 12-bit
                # progressive streams use (B.2.4.1)
                if pq:
                    zz = [
                        struct.unpack(
                            ">H", seg[p + 1 + 2 * i : p + 3 + 2 * i]
                        )[0]
                        for i in range(64)
                    ]
                else:
                    zz = seg[p + 1 : p + 65]
                qt = [0] * 64
                for i in range(64):
                    qt[ZIGZAG[i]] = zz[i]
                qts[tq] = qt
                p += 65 + 64 * pq
        elif marker == 0xC4:  # DHT — may be redefined between scans
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC2, 0xCA):  # SOF2 Huffman / SOF10 arithmetic
            arith = marker == 0xCA
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"jpeg: {prec}-bit precision unsupported"
                )
            frame_prec = prec
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"jpeg: invalid sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, hi, vi))
            if nc == 1:
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            # Sampling ratios need NOT divide the frame maximum here
            # either (r08 s3): the interleaved scans address the padded
            # MCU grid (mcux·hi blocks wide), non-interleaved scans the
            # component's own ceil-scaled grid, and the shared color
            # stage maps luma coordinates with x*hi//hmax — the same
            # nearest-sample generalization the sequential path ships.
            hmax = max(hi for _c, _t, hi, _v in comps)
            vmax = max(vi for _c, _t, _h, vi in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            dims = []
            for _c, _t, hi, vi in comps:
                bw, bh = mcux * hi, mcuy * vi  # padded storage grid
                cw = (-(-w * hi // hmax) + 7) // 8  # non-interleaved grid
                ch = (-(-h * vi // vmax) + 7) // 8
                dims.append((bw, bh, cw, ch))
            coefs = [
                [[0] * 64 for _ in range(bw * bh)] for bw, bh, _cw, _ch in dims
            ]
            frame = (w, h, comps)
            geom = (hmax, vmax, mcux, mcuy, dims)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9):
            raise ValueError("jpeg: mixed/unsupported SOF in progressive file")
        elif marker == 0xDD:  # DRI — applies to the scans that follow
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xCC:  # DAC — arithmetic conditioning per scan
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                if tc == 0:
                    arith_dc_cond[tb] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    arith_ac_cond[tb] = cs  # Kx
                p += 2
        elif marker == 0xDA:  # SOS — decode this scan now
            if frame is None:
                raise ValueError("jpeg: SOS before SOF2")
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            entropy_start = pos + seglen
            end = _entropy_end(
                data, entropy_start, skip_restarts=restart_interval > 0
            )
            if arith:
                _decode_progressive_scan_arith(
                    data, entropy_start, frame, geom, coefs,
                    scan_comps, ss, se, ah, al, restart_interval,
                    arith_dc_cond, arith_ac_cond,
                )
            else:
                br = _BitReader(data[entropy_start:end])
                _decode_progressive_scan(
                    br, frame, geom, coefs, dc_tables, ac_tables,
                    scan_comps, ss, se, ah, al, restart_interval,
                )
            pos = end
            continue
        pos += seglen

    if frame is None or coefs is None:
        raise ValueError("jpeg: missing SOF2/scan data")
    w, h, comps = frame
    hmax, vmax, mcux, mcuy, dims = geom
    # level shift / clamp follow the frame precision (T.81 A.3.1):
    # 8-bit → +128 clamp 255, 12-bit → +2048 clamp 4095
    half, maxval = 1 << (frame_prec - 1), (1 << frame_prec) - 1
    planes = []
    for ci, (_cid, qtid, hi, vi) in enumerate(comps):
        qt = qts[qtid]
        bw, bh, _cw, _ch = dims[ci]
        plane = [[0] * (bw * 8) for _ in range(bh * 8)]
        for bidx, cq in enumerate(coefs[ci]):
            block = _idct_block(
                [cq[i] * qt[i] for i in range(64)], half, maxval
            )
            by, bx = divmod(bidx, bw)
            py, px = by * 8, bx * 8
            for yy in range(8):
                row = plane[py + yy]
                row[px : px + 8] = block[yy * 8 : yy * 8 + 8]
        planes.append(plane)
    return w, h, comps, planes, frame_prec


def _decode_progressive_scan_arith(
    data, entropy_start, frame, geom, coefs, scan_comps, ss, se, ah, al,
    restart_interval, dc_cond, ac_cond, differential=False,
):
    """One SOF10 scan (T.81 G.2 arithmetic progressive): the same scan
    geometry as the Huffman progressive path with QM-coded decisions —
    DC first/refine, AC first with band bounds, the AC refinement
    correction-bit algorithm (operators/jpeg_arith.py). Statistics,
    predictors, and the coder reset at scan start and at every restart
    marker (F.2.2.5). ``differential`` (SOF14 frames inside a
    hierarchical stream): PRED=0 — each block's decoded DC value is
    its own correction, no predictor accumulation (the conditioning
    context still chains per F.1.4.4.1.1)."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        FIXED_BIN,
        ArithDecoder,
        Stats,
        decode_ac_first,
        decode_ac_refine,
        decode_dc_diff,
        decode_dc_refine,
    )

    w, h, comps = frame
    hmax, vmax, mcux, mcuy, dims = geom
    frame_by_id = {cid: i for i, (cid, _t, _h, _v) in enumerate(comps)}
    for cid, _d, _a in scan_comps:
        if cid not in frame_by_id:
            raise ValueError(f"jpeg: scan component id {cid} not in frame")
    if not (0 <= al <= 13 and (ah == 0 or ah == al + 1)):
        raise ValueError(f"jpeg: bad successive approximation Ah={ah} Al={al}")

    fixed = Stats(1)
    fixed.idx[0] = FIXED_BIN

    def fresh():
        dec = ArithDecoder(data, entropy_start if rst_state["n"] == 0 and
                           rst_state["pos"] is None else rst_state["pos"])
        dc_stats = {dct: Stats(DC_STAT_SLOTS) for _c, dct, _a in scan_comps}
        ac_stats = {act: Stats(AC_STAT_SLOTS) for _c, _d, act in scan_comps}
        return dec, dc_stats, ac_stats

    rst_state = {"n": 0, "pos": None}
    dec, dc_stats, ac_stats = fresh()
    dc_ctx = {cid: 0 for cid, _d, _a in scan_comps}
    last_dc = {cid: 0 for cid, _d, _a in scan_comps}

    def maybe_restart(unit_idx: int) -> None:
        nonlocal dec, dc_stats, ac_stats
        if not (restart_interval and unit_idx
                and unit_idx % restart_interval == 0):
            return
        mp = dec.marker_pos
        if mp is None or data[mp + 1] != 0xD0 + rst_state["n"]:
            raise ValueError(
                f"jpeg: expected restart marker RST{rst_state['n']}"
            )
        rst_state["pos"] = mp + 2
        rst_state["n"] = (rst_state["n"] + 1) & 7
        dec, dc_stats, ac_stats = fresh()
        for cid in dc_ctx:
            dc_ctx[cid] = 0
            last_dc[cid] = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")

        def dc_block(cid, dct, cq):
            if ah == 0:  # first pass
                ll, uu = dc_cond.get(dct, (0, 1))
                diff, dc_ctx[cid] = decode_dc_diff(
                    dec, dc_stats[dct], dc_ctx[cid], ll, uu
                )
                if not differential:
                    last_dc[cid] += diff
                    diff = last_dc[cid]
                cq[0] = diff << al
            else:  # refinement: one fixed-bin bit per block
                decode_dc_refine(dec, fixed, cq, al)

        if len(scan_comps) > 1:  # interleaved MCU order
            mcu_n = 0
            for mcu_y in range(mcuy):
                for mcu_x in range(mcux):
                    maybe_restart(mcu_n)
                    mcu_n += 1
                    for cid, dct, _act in scan_comps:
                        ci = frame_by_id[cid]
                        _c, _t, hi, vi = comps[ci]
                        bw = dims[ci][0]
                        for bv in range(vi):
                            for bh_ in range(hi):
                                bidx = (mcu_y * vi + bv) * bw + mcu_x * hi + bh_
                                dc_block(cid, dct, coefs[ci][bidx])
        else:
            cid, dct, _act = scan_comps[0]
            ci = frame_by_id[cid]
            bw, _bh, cw, ch = dims[ci]
            unit = 0
            for by in range(ch):
                for bx in range(cw):
                    maybe_restart(unit)
                    unit += 1
                    dc_block(cid, dct, coefs[ci][by * bw + bx])
        return

    # AC scan: single component, non-interleaved
    if len(scan_comps) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    if not 1 <= ss <= se <= 63:
        raise ValueError(f"jpeg: bad spectral range {ss}..{se}")
    cid, _dct, act = scan_comps[0]
    ci = frame_by_id[cid]
    bw, _bh, cw, ch = dims[ci]
    kx = ac_cond.get(act, 5)
    unit = 0
    for by in range(ch):
        for bx in range(cw):
            maybe_restart(unit)
            unit += 1
            cq = coefs[ci][by * bw + bx]
            if ah == 0:
                decode_ac_first(
                    dec, ac_stats[act], fixed, kx, cq, ZIGZAG, ss, se, al
                )
            else:
                decode_ac_refine(
                    dec, ac_stats[act], fixed, cq, ZIGZAG, ss, se, al
                )


def _decode_progressive_scan(
    br, frame, geom, coefs, dc_tables, ac_tables, scan_comps, ss, se, ah, al,
    restart_interval=0, differential=False,
):
    w, h, comps = frame
    hmax, vmax, mcux, mcuy, dims = geom
    frame_by_id = {cid: i for i, (cid, _t, _h, _v) in enumerate(comps)}
    for cid, _d, _a in scan_comps:
        if cid not in frame_by_id:
            raise ValueError(f"jpeg: scan component id {cid} not in frame")
    if not (0 <= al <= 13 and (ah == 0 or ah == al + 1)):
        raise ValueError(f"jpeg: bad successive approximation Ah={ah} Al={al}")

    # T.81 F.2.2.5 applies per scan: every `restart_interval` restart
    # units (MCUs when interleaved, data units when non-interleaved)
    # the stream byte-aligns on RSTn (n cycling 0..7, restarting at 0
    # each scan), DC predictors reset, and an EOB run MUST NOT cross
    # the boundary (G.1.2.2) — a run that does marks a malformed
    # stream and fails loud.
    rst_state = {"n": 0}

    def at_restart(unit_idx: int) -> bool:
        return (
            restart_interval > 0
            and unit_idx > 0
            and unit_idx % restart_interval == 0
        )

    def do_restart() -> None:
        br.expect_restart(rst_state["n"])
        rst_state["n"] = (rst_state["n"] + 1) & 7

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        preds = {cid: 0 for cid, _d, _a in scan_comps}

        def dc_block(ci, cid, dct, cq):
            if ah == 0:  # first pass: diffs of (DC >> Al)
                cat = _read_huff(br, dc_tables[dct])
                diff = _extend(br.bits(cat), cat) if cat else 0
                # differential (SOF6) frames: PRED=0, no accumulation
                if not differential:
                    preds[cid] += diff
                    diff = preds[cid]
                cq[0] = diff << al
            else:  # refinement: one bit per block
                if br.bit():
                    cq[0] |= 1 << al

        if len(scan_comps) > 1:  # interleaved MCU order
            mcu_n = 0
            for mcu_y in range(mcuy):
                for mcu_x in range(mcux):
                    if at_restart(mcu_n):
                        do_restart()
                        for c_ in preds:
                            preds[c_] = 0
                    mcu_n += 1
                    for cid, dct, _act in scan_comps:
                        ci = frame_by_id[cid]
                        _c, _t, hi, vi = comps[ci]
                        bw = dims[ci][0]
                        for bv in range(vi):
                            for bh_ in range(hi):
                                bidx = (mcu_y * vi + bv) * bw + mcu_x * hi + bh_
                                dc_block(ci, cid, dct, coefs[ci][bidx])
        else:  # single component: non-interleaved raster over cw×ch
            cid, dct, _act = scan_comps[0]
            ci = frame_by_id[cid]
            bw, _bh, cw, ch = dims[ci]
            unit = 0
            for by in range(ch):
                for bx in range(cw):
                    if at_restart(unit):
                        do_restart()
                        preds[cid] = 0
                    unit += 1
                    dc_block(ci, cid, dct, coefs[ci][by * bw + bx])
        return

    # AC scan: single component, non-interleaved (T.81 G.1.1.1.1)
    if len(scan_comps) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    if not 1 <= ss <= se <= 63:
        raise ValueError(f"jpeg: bad spectral range {ss}..{se}")
    cid, _dct, act = scan_comps[0]
    ci = frame_by_id[cid]
    bw, _bh, cw, ch = dims[ci]
    table = ac_tables[act]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    unit = 0
    for by in range(ch):
        for bx in range(cw):
            if at_restart(unit):
                if eobrun > 0:
                    raise ValueError(
                        "jpeg: EOB run crosses a restart boundary (G.1.2.2)"
                    )
                do_restart()
            unit += 1
            cq = coefs[ci][by * bw + bx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_huff(br, table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC index overrun")
                    cq[ZIGZAG[k]] = _extend(br.bits(s), s) << al
                    k += 1
            else:  # refinement pass (libjpeg decode_mcu_AC_refine shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_huff(br, table)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:  # EOBn
                                eobrun = (1 << r)
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        elif s == 1:
                            val = p1 if br.bit() else m1
                        else:
                            raise ValueError("jpeg: bad refinement size")
                        while k <= se:
                            c = cq[ZIGZAG[k]]
                            if c != 0:
                                if br.bit() and (c & p1) == 0:
                                    cq[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            cq[ZIGZAG[k]] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        c = cq[ZIGZAG[k]]
                        if c != 0 and br.bit() and (c & p1) == 0:
                            cq[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1


def encode_jpeg_solid_gray_progressive(
    width: int, height: int, v: int, restart_interval: int = 0,
    precision: int = 8,
    samps: tuple = ((1, 1), (1, 1), (1, 1)),
) -> bytes:
    """Progressive (SOF2) JFIF of a solid GRAY image: five REAL scans —
    interleaved DC first pass at Al=1, DC refinement delivering the
    low bit, then one AC first-pass scan per component whose all-zero
    band is coded as a single EOBn run covering every block (the
    progressive-specific entropy construct). Same exactness contract
    as the baseline fixture encoder: even gray v decodes bit-for-bit,
    so the closed-form oracle is coding-process-agnostic.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N restart units IN EVERY SCAN (MCUs in the interleaved DC scans,
    data units in the AC scans), with per-segment DC predictor resets
    and EOB runs that never cross a boundary (G.1.2.2).

    ``precision`` 12 emits the extended-precision progressive form
    (r08): 16-bit DQT entries (Pq=1), SOF2 precision byte 12, samples
    in 0..4095 with midpoint 2048 — the DC diff of the Al=1 first pass
    stays ≤ category 10, so the Annex K "typical" DC tables still
    cover it.

    ``samps`` (r08 s3) sets per-component sampling factors, including
    FRACTIONAL ratios (e.g. 3x1/2x1/1x1): the interleaved DC scans
    then carry Hi×Vi data units per component per MCU, and each
    per-component AC scan covers that component's own block grid —
    dims must be MCU-aligned (width % 8·hmax == height % 8·vmax == 0)
    so the non-interleaved grid equals the padded grid and the EOBn
    run count is exact."""
    hs = [hh for hh, _v in samps]
    vs_ = [vv for _h, vv in samps]
    if not all(1 <= x <= 4 for x in hs + vs_):
        raise ValueError("sampling factors must be 1..4")
    hmax, vmax = max(hs), max(vs_)
    if width % (8 * hmax) or height % (8 * vmax):
        raise ValueError("fixture encoder requires MCU-aligned dims")
    if precision not in (8, 12):
        raise ValueError("fixture encoder supports precision 8 or 12")
    mid, vmaxval = 1 << (precision - 1), (1 << precision) - 1
    if v % 2 or not 0 <= v <= vmaxval:
        raise ValueError(f"fixture encoder requires an even gray 0..{vmaxval}")

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if precision == 12:
        # Pq=1: 16-bit table entries, the canonical 12-bit stream form
        for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
            out += b"\xff\xdb" + struct.pack(">H", 131) + bytes(
                [(1 << 4) | tid]
            )
            for i in range(64):
                out += struct.pack(">H", qt[ZIGZAG[i]])
    else:
        for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            out += bytes(qt[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 17, precision, height, width, 3
    )
    for ci, (hh, vv) in enumerate(samps):
        out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # The Annex K "typical" AC tables are sequential-only: they contain
    # EOB (0x00) and ZRL (0xF0) but none of the EOBn run symbols
    # (0x10..0xE0) progressive AC scans use — define a custom AC table
    # (id 2) holding exactly the 15 EOBn symbols, all at code length 4
    # (canonical, all-ones code left unused per the spec's advice).
    eobn_bits = [0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    eobn_vals = [r << 4 for r in range(15)]
    for cls, tid, (bits, vals) in (
        (0, 0, STD_DC_LUMA),
        (1, 0, STD_AC_LUMA),
        (0, 1, STD_DC_CHROMA),
        (1, 1, STD_AC_CHROMA),
        (1, 2, (eobn_bits, eobn_vals)),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)
        ) + bytes([(cls << 4) | tid])
        out += bytes(bits[1:17]) + bytes(vals)

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        ns = len(comp_specs)
        body = bytes([ns])
        for cid, tables in comp_specs:
            body += bytes([cid, tables])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dc_q = (8 * (v - mid)) // STD_LUMA_QT[0]  # exact for even v
    dc_luma = _huff_codes(*STD_DC_LUMA)
    dc_chroma = _huff_codes(*STD_DC_CHROMA)
    mcux, mcuy = width // (8 * hmax), height // (8 * vmax)
    n_mcus = mcux * mcuy

    ri = restart_interval

    def seg_bounds(n: int):
        """Restart-segment lengths: [n] without DRI, else ri-sized."""
        if not ri:
            return [n]
        return [min(ri, n - s) for s in range(0, n, ri)]

    # scan 1: interleaved DC first pass, Al=1 — diffs of (DC >> 1);
    # T.81 G.1.2.1: the DC point transform is an ARITHMETIC shift.
    # Predictors reset at every restart, so each segment's first Y
    # data unit re-codes the full hi_dc diff; with Hi×Vi > 1 every
    # MCU carries that many Y units (restart units are MCUs).
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    hi_dc = dc_q >> 1
    rst = 0
    for si, seg_n in enumerate(seg_bounds(n_mcus)):
        if si:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        bw = _BitWriter()
        prev = 0
        for m in range(seg_n):
            for ci, (hh, vv) in enumerate(samps):
                for _u in range(hh * vv):
                    if ci == 0:
                        diff = hi_dc - prev
                        prev = hi_dc
                        cat = _category(diff)
                        c, ln = dc_luma[cat]
                        bw.put(c, ln)
                        if cat:
                            amp = diff if diff >= 0 else diff + (1 << cat) - 1
                            bw.put(amp, cat)
                    else:
                        c, ln = dc_chroma[0]
                        bw.put(c, ln)
        bw.flush()
        out += bw.buf

    # scan 2: interleaved DC refinement (Ah=1, Al=0) — raw low bits
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
    low = dc_q - (hi_dc << 1)  # the bit the refinement delivers
    rst = 0
    for si, seg_n in enumerate(seg_bounds(n_mcus)):
        if si:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
        bw = _BitWriter()
        for _m in range(seg_n):
            for ci, (hh, vv) in enumerate(samps):
                for _u in range(hh * vv):
                    bw.put(low & 1 if ci == 0 else 0, 1)
        bw.flush()
        out += bw.buf

    # scans 3-5: per-component AC first pass over that component's OWN
    # block grid (non-interleaved, so restart units are data units) —
    # one EOBn run per restart SEGMENT (an EOB run must not cross a
    # boundary, G.1.2.2); without DRI that is a single run covering
    # every unit (AC table 2: the EOBn-only table)
    eobn = _huff_codes(eobn_bits, eobn_vals)
    for ci, (cid, (hh, vv)) in enumerate(zip((1, 2, 3), samps)):
        out += sos([(cid, 0x02)], 1, 63, 0, 0)
        n_units = (mcux * hh) * (mcuy * vv)
        rst = 0
        for si, seg_n in enumerate(seg_bounds(n_units)):
            if si:
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            bw = _BitWriter()
            r = seg_n.bit_length() - 1  # EOBn: run = (1 << r) + extra
            extra = seg_n - (1 << r)
            c, ln = eobn[r << 4]
            bw.put(c, ln)
            if r:
                bw.put(extra, r)
            bw.flush()
            out += bw.buf

    out += b"\xff\xd9"
    return bytes(out)
