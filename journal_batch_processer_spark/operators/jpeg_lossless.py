"""T.81 LOSSLESS JPEG (SOF3) — Annex H, grayscale scope.

The last named JPEG family: Huffman-coded DPCM over raw samples (no
DCT, no quantization — decode reproduces the input EXACTLY), the
format DICOM archives and film scanners emit. Supported scope, honest
and loud: ONE component (the dominant medical shape), precision
2..16 bits, all seven predictors (H.1.2.1), point transform (Al),
restart markers; multi-component lossless raises NotImplementedError.

Because the codec is lossless, validation is stronger than for the
DCT modes even without a third-party reference (the system
libjpeg-turbo predates lossless support): property tests round-trip
RANDOM images bit-exactly through every predictor/precision/restart
combination, and the decoder is additionally checked against an
independent numpy model of the predictor recursion
(tests/test_round7_fixes.py).

Prediction (a = left, b = above, c = above-left):
  1:a  2:b  3:c  4:a+b-c  5:a+((b-c)>>1)  6:b+((a-c)>>1)  7:(a+b)>>1
First sample (and the sample following every restart) predicts
2^(P-1-Pt); other first-column samples predict b; the first line
chains on `a` after its initial sample. All arithmetic is modulo
2^16 (H.1.2.1). SSSS=16 encodes diff=32768 with no appended bits.
"""

from __future__ import annotations

import struct

from journal_batch_processer_spark.operators.jpeg import (
    _BitReader,
    _BitWriter,
    _entropy_end,
    _extend,
    _huff_codes,
    _huff_decoder,
    _read_huff,
)


def _predict(pred_sel, row, prev_row, x, y, default, fresh):
    """Prediction for sample (x, y) per H.1.2.1."""
    if fresh:  # scan start or just after a restart
        return default
    if y == 0:
        # first line: left neighbor (predictor forced to 1)
        return row[x - 1] if x > 0 else default
    if x == 0:
        return prev_row[0]  # first column: above
    a = row[x - 1]
    b = prev_row[x]
    c = prev_row[x - 1]
    if pred_sel == 1:
        return a
    if pred_sel == 2:
        return b
    if pred_sel == 3:
        return c
    if pred_sel == 4:
        return a + b - c
    if pred_sel == 5:
        return a + ((b - c) >> 1)
    if pred_sel == 6:
        return b + ((a - c) >> 1)
    if pred_sel == 7:
        return (a + b) >> 1
    raise ValueError(f"jpeg: bad lossless predictor {pred_sel}")


def decode_jpeg_lossless(data: bytes):
    """(w, h, comps, [plane], prec) — same tuple shape as the DCT
    paths so decode_jpeg_planes / the feature layer are agnostic."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    dc_tables: dict[int, object] = {}
    frame = None
    scan = None
    entropy_start = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if tc == 0:
                    dc_tables[th] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC3:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"jpeg: lossless precision {prec}")
            if nc != 1:
                raise NotImplementedError(
                    "jpeg: multi-component lossless unsupported"
                )
            cid, samp, _tq = seg[6:9]
            if samp != 0x11:
                raise NotImplementedError(
                    "jpeg: lossless sampling factors must be 1x1"
                )
            frame = (w, h, [(cid, 0, 1, 1)], prec)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            if ns != 1:
                raise NotImplementedError(
                    "jpeg: multi-component lossless scan unsupported"
                )
            _cid, tables = seg[1], seg[2]
            ss, _se, a = seg[3], seg[4], seg[5]
            scan = (tables >> 4, ss, a & 0xF)  # (dc table, predictor, Pt)
            entropy_start = pos + seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF3/SOS")
    w, h, comps, prec = frame
    dct, pred_sel, pt = scan
    if not 1 <= pred_sel <= 7:
        raise ValueError(f"jpeg: bad lossless predictor {pred_sel}")
    default = 1 << (prec - 1 - pt) if prec - 1 - pt >= 0 else 0
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    br = _BitReader(data[entropy_start:end])
    table = dc_tables[dct]

    plane = [[0] * w for _ in range(h)]
    prev_row = None
    count = 0
    rst = 0
    fresh = True
    for y in range(h):
        row = plane[y]
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                br.expect_restart(rst)
                rst = (rst + 1) & 7
                fresh = True
            count += 1
            s = _read_huff(br, table)
            if s == 16:  # no appended bits (H.1.2.2.1)
                diff = 32768
            elif s:
                diff = _extend(br.bits(s), s)
            else:
                diff = 0
            pred = _predict(pred_sel, row, prev_row, x, y, default, fresh)
            fresh = False
            row[x] = (pred + diff) & 0xFFFF
        prev_row = row
    return w, h, comps, [plane], prec


# standard-shaped DHT covering categories 0..16 (flat 5-bit canonical)
_LL_BITS = [0] * 17
_LL_BITS[5] = 17
_LL_VALS = list(range(17))


def encode_jpeg_lossless_gray(
    samples: list[list[int]],
    precision: int = 8,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """SOF3 encoder over an ARBITRARY grayscale sample grid (lossless
    means random-image fixtures round-trip bit-exactly — no solid-
    image restriction needed)."""
    h = len(samples)
    w = len(samples[0])
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad predictor {predictor}")
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(">HBHHB", 11, precision, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_LL_VALS)) + bytes([0x00])
    out += bytes(_LL_BITS[1:17]) + bytes(_LL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
        [1, 0x00, predictor, 0, pt]
    )
    codes = _huff_codes(_LL_BITS, _LL_VALS)
    default = 1 << (precision - 1 - pt) if precision - 1 - pt >= 0 else 0
    bw = _BitWriter()
    count = 0
    rst = 0
    fresh = True
    prev_row = None
    for y in range(h):
        row = samples[y]
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                fresh = True
            count += 1
            pred = _predict(predictor, row, prev_row, x, y, default, fresh)
            fresh = False
            dd = (row[x] - pred) & 0xFFFF
            if dd >= 32768 and dd != 32768:
                dd -= 65536  # represent mod-2^16 diff in [-32767, 32768]
            if dd == 32768:
                s = 16
            else:
                s = dd.bit_length() if dd >= 0 else (-dd).bit_length()
            c, ln = codes[s]
            bw.put(c, ln)
            if 0 < s < 16:
                amp = dd if dd >= 0 else dd + (1 << s) - 1
                bw.put(amp, s)
        prev_row = row
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
