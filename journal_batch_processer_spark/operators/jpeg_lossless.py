"""T.81 LOSSLESS JPEG (SOF3) — Annex H, grayscale scope.

The last named JPEG family: Huffman-coded DPCM over raw samples (no
DCT, no quantization — decode reproduces the input EXACTLY), the
format DICOM archives and film scanners emit. Supported scope, honest
and loud: 1..4 components at 1×1 sampling (interleaved MCU = one
sample per component, per-component predictor state and Huffman
table), precision 2..16 bits, all seven predictors (H.1.2.1), point
transform (Al), restart markers; non-1×1 sampling raises
NotImplementedError. Multi-component lossless carries NO defined
color transform — the feature layer reports per-component means
directly (operators/jpeg.py:_decode_jpeg_baseline).

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
            if not 1 <= nc <= 4:
                raise ValueError(f"jpeg: lossless component count {nc}")
            comps = []
            for ci in range(nc):
                cid, samp, _tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "jpeg: lossless sampling factors must be 1x1"
                    )
                comps.append((cid, 0, 1, 1))
            frame = (w, h, comps, prec)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4) for i in range(ns)
            ]  # (component id, dc table id)
            ss, _se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = (scan_comps, ss, a & 0xF)  # (comps, predictor, Pt)
            entropy_start = pos + seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF3/SOS")
    w, h, comps, prec = frame
    scan_comps, pred_sel, pt = scan
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "jpeg: lossless multi-scan (non-interleaved) unsupported"
        )
    frame_by_id = {cid: i for i, (cid, _t, _h, _v) in enumerate(comps)}
    order = []
    for cid, dct in scan_comps:
        if cid not in frame_by_id:
            raise ValueError(f"jpeg: scan component id {cid} not in frame")
        order.append((frame_by_id[cid], dc_tables[dct]))
    if not 1 <= pred_sel <= 7:
        raise ValueError(f"jpeg: bad lossless predictor {pred_sel}")
    default = 1 << (prec - 1 - pt) if prec - 1 - pt >= 0 else 0
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    br = _BitReader(data[entropy_start:end])

    planes = [[[0] * w for _ in range(h)] for _ in comps]
    count = 0
    rst = 0
    fresh = True
    for y in range(h):
        for x in range(w):
            # an MCU is one sample of EVERY component (1×1 factors);
            # restart units count MCUs and reset all predictor state
            if restart_interval and count and count % restart_interval == 0:
                br.expect_restart(rst)
                rst = (rst + 1) & 7
                fresh = True
            count += 1
            for ci, table in order:
                s = _read_huff(br, table)
                if s == 16:  # no appended bits (H.1.2.2.1)
                    diff = 32768
                elif s:
                    diff = _extend(br.bits(s), s)
                else:
                    diff = 0
                plane = planes[ci]
                row = plane[y]
                prev_row = plane[y - 1] if y > 0 else None
                pred = _predict(
                    pred_sel, row, prev_row, x, y, default, fresh
                )
                row[x] = (pred + diff) & 0xFFFF
            fresh = False
    return w, h, comps, planes, prec


# standard-shaped DHT covering categories 0..16 (flat 5-bit canonical)
_LL_BITS = [0] * 17
_LL_BITS[5] = 17
_LL_VALS = list(range(17))


def encode_jpeg_lossless(
    planes: "list[list[list[int]]]",
    precision: int = 8,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """SOF3 encoder over 1..4 ARBITRARY sample grids (lossless means
    random-image fixtures round-trip bit-exactly — no solid-image
    restriction needed). Interleaved scan, one sample per component
    per MCU, shared DC table."""
    nc = len(planes)
    if not 1 <= nc <= 4:
        raise ValueError(f"bad component count {nc}")
    h = len(planes[0])
    w = len(planes[0][0])
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad predictor {predictor}")
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_LL_VALS)) + bytes([0x00])
    out += bytes(_LL_BITS[1:17]) + bytes(_LL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += bytes([predictor, 0, pt])
    codes = _huff_codes(_LL_BITS, _LL_VALS)
    default = 1 << (precision - 1 - pt) if precision - 1 - pt >= 0 else 0
    bw = _BitWriter()
    count = 0
    rst = 0
    fresh = True
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                fresh = True
            count += 1
            for plane in planes:
                row = plane[y]
                prev_row = plane[y - 1] if y > 0 else None
                pred = _predict(
                    predictor, row, prev_row, x, y, default, fresh
                )
                dd = (row[x] - pred) & 0xFFFF
                if dd >= 32768 and dd != 32768:
                    dd -= 65536  # mod-2^16 diff in [-32767, 32768]
                if dd == 32768:
                    s = 16
                else:
                    s = dd.bit_length() if dd >= 0 else (-dd).bit_length()
                c, ln = codes[s]
                bw.put(c, ln)
                if 0 < s < 16:
                    amp = dd if dd >= 0 else dd + (1 << s) - 1
                    bw.put(amp, s)
            fresh = False
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_lossless_gray(
    samples: list[list[int]],
    precision: int = 8,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Single-component convenience wrapper."""
    return encode_jpeg_lossless(
        [samples], precision=precision, predictor=predictor, pt=pt,
        restart_interval=restart_interval,
    )
