"""T.81 LOSSLESS JPEG (SOF3) — Annex H, grayscale scope.

The last named JPEG family: Huffman-coded DPCM over raw samples (no
DCT, no quantization — decode reproduces the input EXACTLY), the
format DICOM archives and film scanners emit. Supported scope, honest
and loud: 1..4 components at ANY 1..4 sampling factors (r08 s4 — the
last T.81 gate: interleaved scans code h×v-sample MCUs on the padded
grid per Annex A geometry and crop to each component's natural dims;
DICOM itself mandates 1×1, so this closes the spec rather than a
real-world need), precision 2..16 bits, all seven predictors
(H.1.2.1), point transform (Al), restart markers, and BOTH scan
layouts (r08 s3): one interleaved scan OR one scan per component
(the multi-scan layout some DICOM RGB encoders emit; single-
component scans always code the component's own natural raster,
A.2.2), each scan honoring its own predictor/Pt with fresh
restart/statistics state; a component coded twice or never fails
loud. Multi-component lossless carries NO defined
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


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _comp_dims(w: int, h: int, comps: list) -> tuple:
    """(hmax, vmax, mcus_x, mcus_y, [(cw, ch, pw, ph)]) — each
    component's NATURAL dims (A.1.1: ceil(X*h_i/hmax) x
    ceil(Y*v_i/vmax)) and its PADDED dims on the MCU grid
    (mcus_x*h_i x mcus_y*v_i; identical to natural for 1x1).
    Interleaved lossless scans code the padded grid (edge MCUs carry
    pad samples, A.2.3); single-component scans code the natural
    raster (A.2.2). ceil(ceil(w*h_i/hmax)/h_i) == ceil(w/hmax), so
    every component agrees on the MCU count."""
    hmax = max(hh for _c, _t, hh, _v in comps)
    vmax = max(vv for _c, _t, _h, vv in comps)
    mcx, mcy = _ceil_div(w, hmax), _ceil_div(h, vmax)
    dims = []
    for _cid, _t, hh, vv in comps:
        cw, ch = _ceil_div(w * hh, hmax), _ceil_div(h * vv, vmax)
        dims.append((cw, ch, mcx * hh, mcy * vv))
    return hmax, vmax, mcx, mcy, dims


def _crop_planes(planes: list, dims: list) -> list:
    return [
        [row[:cw] for row in pl[:ch]]
        for pl, (cw, ch, _pw, _ph) in zip(planes, dims)
    ]


def decode_jpeg_lossless(data: bytes):
    """(w, h, comps, [plane], prec) — same tuple shape as the DCT
    paths so decode_jpeg_planes / the feature layer are agnostic;
    subsampled components return their NATURAL-size planes."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    dc_tables: dict[int, object] = {}
    frame = None
    planes = None
    frame_by_id: dict[int, int] = {}
    seen_cids: set[int] = set()
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
                sh, sv = samp >> 4, samp & 0xF
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"jpeg: bad lossless sampling factors {sh}x{sv}"
                    )
                comps.append((cid, 0, sh, sv))
            frame = (w, h, comps, prec)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            # A lossless frame may carry ONE interleaved scan (MCU =
            # h_i x v_i samples per component on the padded grid,
            # A.2.3 — r08 s4: ANY 1..4 sampling, the last JPEG gate)
            # or SEVERAL non-interleaved scans — one per component,
            # each that component's NATURAL raster (A.2.2), with its
            # OWN predictor/Pt and fresh restart/predictor state
            # (r08 s3: the DICOM RGB multi-scan layout).
            if frame is None:
                raise ValueError("jpeg: SOS before SOF3")
            w, h, comps, prec = frame
            _hmax, _vmax, mcx, mcy, dims = _comp_dims(w, h, comps)
            if planes is None:
                planes = [
                    [[0] * pw for _ in range(ph)]
                    for (_cw, _ch, pw, ph) in dims
                ]
                frame_by_id = {
                    cid: i for i, (cid, _t, _h, _v) in enumerate(comps)
                }
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4) for i in range(ns)
            ]  # (component id, dc table id)
            ss, _se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pred_sel, pt = ss, a & 0xF
            if ns not in (len(comps), 1):
                raise NotImplementedError(
                    "jpeg: lossless scans must be interleaved (all "
                    "components) or single-component"
                )
            order = []
            for cid, dct in scan_comps:
                if cid not in frame_by_id:
                    raise ValueError(
                        f"jpeg: scan component id {cid} not in frame"
                    )
                if cid in seen_cids:
                    raise ValueError(
                        f"jpeg: component {cid} coded by two scans"
                    )
                seen_cids.add(cid)
                order.append((frame_by_id[cid], dc_tables[dct]))
            if not 1 <= pred_sel <= 7:
                raise ValueError(f"jpeg: bad lossless predictor {pred_sel}")
            default = 1 << (prec - 1 - pt) if prec - 1 - pt >= 0 else 0
            entropy_start = pos + seglen
            end = _entropy_end(data, entropy_start, skip_restarts=True)
            br = _BitReader(data[entropy_start:end])

            def read_diff(br, table):
                s = _read_huff(br, table)
                if s == 16:  # no appended bits (H.1.2.2.1)
                    return 32768
                if s:
                    return _extend(br.bits(s), s)
                return 0

            count = 0
            rst = 0
            if ns > 1:
                # interleaved: MCU order over the padded grid; restart
                # units count MCUs; the first sample of each COMPONENT
                # after scan start / restart predicts the default
                fresh = {ci: True for ci, _t in order}
                for m in range(mcx * mcy):
                    if restart_interval and count and (
                        count % restart_interval == 0
                    ):
                        br.expect_restart(rst)
                        rst = (rst + 1) & 7
                        fresh = {ci: True for ci, _t in order}
                    count += 1
                    my0, mx0 = divmod(m, mcx)
                    for ci, table in order:
                        _cid, _t, sh, sv = comps[ci]
                        plane = planes[ci]
                        for b in range(sv):
                            y = my0 * sv + b
                            row = plane[y]
                            prev_row = plane[y - 1] if y > 0 else None
                            for a in range(sh):
                                x = mx0 * sh + a
                                diff = read_diff(br, table)
                                pred = _predict(
                                    pred_sel, row, prev_row, x, y,
                                    default, fresh[ci],
                                )
                                row[x] = (pred + diff) & 0xFFFF
                                fresh[ci] = False
            else:
                # single-component scan: the component's own natural
                # raster, no MCU padding; restart units count samples
                ci, table = order[0]
                cw, ch, _pw, _ph = dims[ci]
                plane = planes[ci]
                fresh1 = True
                for y in range(ch):
                    row = plane[y]
                    prev_row = plane[y - 1] if y > 0 else None
                    for x in range(cw):
                        if restart_interval and count and (
                            count % restart_interval == 0
                        ):
                            br.expect_restart(rst)
                            rst = (rst + 1) & 7
                            fresh1 = True
                        count += 1
                        diff = read_diff(br, table)
                        pred = _predict(
                            pred_sel, row, prev_row, x, y, default, fresh1
                        )
                        row[x] = (pred + diff) & 0xFFFF
                        fresh1 = False
            pos = end
            continue
        pos += seglen
    if frame is None or planes is None:
        raise ValueError("jpeg: missing SOF3/SOS")
    w, h, comps, prec = frame
    if len(seen_cids) != len(comps):
        missing = [c for c, *_r in comps if c not in seen_cids]
        raise ValueError(
            f"jpeg: lossless components never coded by any scan: {missing}"
        )
    _hm, _vm, _mx, _my, dims = _comp_dims(w, h, comps)
    return w, h, comps, _crop_planes(planes, dims), prec


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
    non_interleaved: bool = False,
    sampling: "list[tuple[int, int]] | None" = None,
    size: "tuple[int, int] | None" = None,
) -> bytes:
    """SOF3 encoder over 1..4 ARBITRARY sample grids (lossless means
    random-image fixtures round-trip bit-exactly — no solid-image
    restriction needed). Default: one interleaved scan, one sample per
    component per MCU, shared DC table. ``non_interleaved`` (r08 s3):
    one SCAN PER COMPONENT — the multi-scan layout some DICOM RGB
    encoders emit — with per-scan restart markers and predictor state,
    and (to prove per-scan parameter honoring) each scan's predictor
    cycling ``predictor, predictor+1, ...`` wrapped into 1..7.
    ``sampling`` (r08 s4, the last JPEG gate): per-component (h, v)
    factors with ``size`` = the full-image (X, Y); each plane must be
    its component's NATURAL dims (ceil(X*h_i/hmax) x ceil(Y*v_i/vmax))
    and interleaved scans code the padded MCU grid with edge-replicated
    pad samples."""
    nc = len(planes)
    if not 1 <= nc <= 4:
        raise ValueError(f"bad component count {nc}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad predictor {predictor}")
    if sampling is None:
        sampling = [(1, 1)] * nc
    if size is None:
        size = (len(planes[0][0]), len(planes[0]))
    w, h = size
    comps = [(ci + 1, 0, sh, sv) for ci, (sh, sv) in enumerate(sampling)]
    _hm, _vm, mcx, mcy, dims = _comp_dims(w, h, comps)
    for ci, ((cw, ch, _pw, _ph), pl) in enumerate(zip(dims, planes)):
        if len(pl) != ch or len(pl[0]) != cw:
            raise ValueError(
                f"component {ci}: plane {len(pl[0])}x{len(pl)} != "
                f"natural dims {cw}x{ch}"
            )
    # pad every plane to its MCU grid by edge replication (the pad
    # samples are coded but cropped away by the decoder)
    padded = []
    for (cw, ch, pw, ph), pl in zip(dims, planes):
        rows = [list(r) + [r[-1]] * (pw - cw) for r in pl]
        rows += [list(rows[-1]) for _ in range(ph - ch)]
        padded.append(rows)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for ci, (sh, sv) in enumerate(sampling):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(_LL_VALS)) + bytes([0x00])
    out += bytes(_LL_BITS[1:17]) + bytes(_LL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    codes = _huff_codes(_LL_BITS, _LL_VALS)
    default = 1 << (precision - 1 - pt) if precision - 1 - pt >= 0 else 0

    def put_diff(bw, sample, pred):
        dd = (sample - pred) & 0xFFFF
        if dd >= 32768 and dd != 32768:
            dd -= 65536  # mod-2^16 diff in [-32767, 32768]
        if dd == 32768:
            ssss = 16
        else:
            ssss = dd.bit_length() if dd >= 0 else (-dd).bit_length()
        c, ln = codes[ssss]
        bw.put(c, ln)
        if 0 < ssss < 16:
            amp = dd if dd >= 0 else dd + (1 << ssss) - 1
            bw.put(amp, ssss)

    def interleaved_body(pred_s: int) -> bytes:
        chunks: list[bytes] = []
        bw = _BitWriter()
        count = 0
        rst = 0
        fresh = [True] * nc
        for m in range(mcx * mcy):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                bw.flush()
                chunks.append(bytes(bw.buf))
                chunks.append(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                fresh = [True] * nc
            count += 1
            my0, mx0 = divmod(m, mcx)
            for ci in range(nc):
                sh, sv = sampling[ci]
                plane = padded[ci]
                for b in range(sv):
                    y = my0 * sv + b
                    row = plane[y]
                    prev_row = plane[y - 1] if y > 0 else None
                    for a in range(sh):
                        x = mx0 * sh + a
                        pred = _predict(
                            pred_s, row, prev_row, x, y, default, fresh[ci]
                        )
                        put_diff(bw, row[x], pred)
                        fresh[ci] = False
        bw.flush()
        chunks.append(bytes(bw.buf))
        return b"".join(chunks)

    def single_body(ci: int, pred_s: int) -> bytes:
        cw, ch, _pw, _ph = dims[ci]
        plane = planes[ci]
        chunks: list[bytes] = []
        bw = _BitWriter()
        count = 0
        rst = 0
        fresh = True
        for y in range(ch):
            row = plane[y]
            prev_row = plane[y - 1] if y > 0 else None
            for x in range(cw):
                if restart_interval and count and (
                    count % restart_interval == 0
                ):
                    bw.flush()
                    chunks.append(bytes(bw.buf))
                    chunks.append(bytes((0xFF, 0xD0 + rst)))
                    rst = (rst + 1) & 7
                    bw = _BitWriter()
                    fresh = True
                count += 1
                pred = _predict(pred_s, row, prev_row, x, y, default, fresh)
                put_diff(bw, row[x], pred)
                fresh = False
        bw.flush()
        chunks.append(bytes(bw.buf))
        return b"".join(chunks)

    if non_interleaved or nc == 1:
        for ci in range(nc):
            pred_s = (
                predictor if nc == 1 else (predictor - 1 + ci) % 7 + 1
            )
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, 0x00, pred_s, 0, pt])
            out += single_body(ci, pred_s)
    else:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for ci in range(nc):
            out += bytes([ci + 1, 0x00])
        out += bytes([predictor, 0, pt])
        out += interleaved_body(predictor)
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


# ---------------------------------------------------------------------------
# SOF11 — lossless ARITHMETIC (T.81 H.1.2.2 statistical model over the
# Annex-H DPCM predictors, QM coder from operators/jpeg_arith.py)
# ---------------------------------------------------------------------------
#
# Statistics layout (the spec's 158-bin lossless area, Figure H.2
# shape): 25 contexts — the 5x5 cross of the conditioning categories
# of Da (difference at the sample to the LEFT) and Db (difference at
# the sample ABOVE) — each holding 4 bins (S0, SS, SP, SN) at
# 4*(5*cA+cB)..+3, then TWO shared magnitude trees (X1..X15 + M bins,
# 29 slots each): bins 100..128 used when Db is not in a large
# category, 129..157 when it is. Categories come from the DAC (L,U)
# conditioning exactly as the sequential DC model applies them
# (|d| <= (1<<L)>>1 -> zero, |d| > (1<<U)>>1 -> large, else small,
# signed). Undefined neighbors (first row/column, after a restart)
# condition as zero — the same convention their prediction uses.
#
# No third-party decoder for this mode exists in the container
# (libjpeg has never shipped lossless arithmetic), so — as for SOF3
# multi-component — validation is bit-exact round-trips of RANDOM
# images across predictors/precisions/restarts, plus cross-checks
# that the DPCM residual layer is shared verbatim with the
# independently-validated Huffman path.

_LA_TREE_A = 100
_LA_TREE_B = 129
LA_STAT_SLOTS = 158


def _la_classify(diff: int, ll: int, uu: int) -> int:
    """0 zero, 1 small+, 2 small-, 3 large+, 4 large-."""
    mag = -diff if diff < 0 else diff
    if mag <= (1 << ll) >> 1:
        return 0
    if mag > (1 << uu) >> 1:
        return 3 if diff > 0 else 4
    return 1 if diff > 0 else 2


def _la_decode_diff(dec, stats, ctx: int, mag_base: int) -> int:
    """Decode one prediction difference (the F.2.4.1 tree re-rooted at
    a two-neighbor context and a selectable magnitude tree)."""
    if dec.decode(stats, ctx) == 0:
        return 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(stats, st)
    if m != 0:
        st = mag_base
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise NotImplementedError(
                    "jpeg: lossless-arithmetic |diff| >= 32768"
                )
            st += 1
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return -v if sign else v


def _la_encode_diff(enc, stats, ctx: int, mag_base: int, diff: int) -> None:
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    v = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    if v == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        m = 1
        st = mag_base
        while v >= (m << 1):
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
        enc.encode(stats, st, 0)
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(stats, st, 1 if v & mm else 0)


def decode_jpeg_lossless_arith(data: bytes):
    """SOF11: same (w, h, comps, planes, prec) tuple as every other
    decode path."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        ArithDecoder,
        Stats,
    )

    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    cond: dict[int, tuple[int, int]] = {}
    frame = None
    planes = None
    frame_by_id: dict[int, int] = {}
    seen_cids: set[int] = set()
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
        if marker == 0xCC:  # DAC: DC-class conditioning only
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                if tc == 0:
                    cs = seg[p + 1]
                    cond[tb] = (cs & 0xF, cs >> 4)
                p += 2
        elif marker == 0xCB:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"jpeg: lossless precision {prec}")
            if not 1 <= nc <= 4:
                raise ValueError(f"jpeg: lossless component count {nc}")
            comps = []
            for ci in range(nc):
                cid, samp, _tq = seg[6 + 3 * ci : 9 + 3 * ci]
                sh, sv = samp >> 4, samp & 0xF
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"jpeg: bad lossless sampling factors {sh}x{sv}"
                    )
                comps.append((cid, 0, sh, sv))
            frame = (w, h, comps, prec)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            # interleaved (all components) or single-component scans,
            # same contract as the Huffman path (r08 s3); each scan
            # carries its own predictor/Pt, QM statistics, and
            # Da/Db conditioning rows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF11")
            w, h, comps, prec = frame
            _hmax, _vmax, mcx, mcy, dims = _comp_dims(w, h, comps)
            if planes is None:
                planes = [
                    [[0] * pw for _ in range(ph)]
                    for (_cw, _ch, pw, ph) in dims
                ]
                frame_by_id = {
                    cid: i for i, (cid, _t, _h, _v) in enumerate(comps)
                }
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4) for i in range(ns)
            ]
            ss, _se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pred_sel, pt = ss, a & 0xF
            if ns not in (len(comps), 1):
                raise NotImplementedError(
                    "jpeg: lossless scans must be interleaved (all "
                    "components) or single-component"
                )
            order = []
            for cid, tb in scan_comps:
                if cid not in frame_by_id:
                    raise ValueError(
                        f"jpeg: scan component id {cid} not in frame"
                    )
                if cid in seen_cids:
                    raise ValueError(
                        f"jpeg: component {cid} coded by two scans"
                    )
                seen_cids.add(cid)
                order.append((frame_by_id[cid], tb))
            if not 1 <= pred_sel <= 7:
                raise ValueError(f"jpeg: bad lossless predictor {pred_sel}")
            default = 1 << (prec - 1 - pt) if prec - 1 - pt >= 0 else 0
            entropy_start = pos + seglen

            def fresh_stats():
                return {tb: Stats(LA_STAT_SLOTS) for _ci, tb in order}

            # Da/Db conditioning as full per-component diff PLANES
            # (r08 s4 — MCU decode order interleaves raster rows, so
            # rolling two-row state no longer suffices); a restart
            # clears them: pre-restart neighbors condition as zero,
            # the same convention their prediction uses
            def fresh_diffs():
                return {
                    ci: [[0] * dims[ci][2] for _ in range(dims[ci][3])]
                    for ci, _tb in order
                }

            def decode_one(dec, stats_by_tb, dplanes, ci, tb, x, y, fr):
                ll, uu = cond.get(tb, (0, 1))
                dp = dplanes[ci]
                da = dp[y][x - 1] if x > 0 else 0
                db = dp[y - 1][x] if y > 0 else 0
                ca = _la_classify(da, ll, uu)
                cb = _la_classify(db, ll, uu)
                mag_base = _LA_TREE_B if cb >= 3 else _LA_TREE_A
                diff = _la_decode_diff(
                    dec, stats_by_tb[tb], 4 * (5 * ca + cb), mag_base
                )
                plane = planes[ci]
                row = plane[y]
                prev_row = plane[y - 1] if y > 0 else None
                pred = _predict(pred_sel, row, prev_row, x, y, default, fr)
                row[x] = (pred + diff) & 0xFFFF
                dp[y][x] = diff

            def expect_rst(dec, rst):
                mp = dec.marker_pos
                if mp is None or data[mp + 1] != 0xD0 + rst:
                    raise ValueError(
                        f"jpeg: expected restart marker RST{rst}"
                    )
                return ArithDecoder(data, mp + 2)

            dec = ArithDecoder(data, entropy_start)
            stats_by_tb = fresh_stats()
            dplanes = fresh_diffs()
            count = 0
            rst = 0
            if ns > 1:
                fresh = {ci: True for ci, _tb in order}
                for m in range(mcx * mcy):
                    if restart_interval and count and (
                        count % restart_interval == 0
                    ):
                        dec = expect_rst(dec, rst)
                        stats_by_tb = fresh_stats()
                        dplanes = fresh_diffs()
                        rst = (rst + 1) & 7
                        fresh = {ci: True for ci, _tb in order}
                    count += 1
                    my0, mx0 = divmod(m, mcx)
                    for ci, tb in order:
                        _cid, _t, sh, sv = comps[ci]
                        for b in range(sv):
                            y = my0 * sv + b
                            for a in range(sh):
                                x = mx0 * sh + a
                                decode_one(
                                    dec, stats_by_tb, dplanes, ci, tb,
                                    x, y, fresh[ci],
                                )
                                fresh[ci] = False
            else:
                ci, tb = order[0]
                cw, ch, _pw, _ph = dims[ci]
                fresh1 = True
                for y in range(ch):
                    for x in range(cw):
                        if restart_interval and count and (
                            count % restart_interval == 0
                        ):
                            dec = expect_rst(dec, rst)
                            stats_by_tb = fresh_stats()
                            dplanes = fresh_diffs()
                            rst = (rst + 1) & 7
                            fresh1 = True
                        count += 1
                        decode_one(
                            dec, stats_by_tb, dplanes, ci, tb, x, y, fresh1
                        )
                        fresh1 = False
            pos = _entropy_end(data, entropy_start, skip_restarts=True)
            continue
        pos += seglen
    if frame is None or planes is None:
        raise ValueError("jpeg: missing SOF11/SOS")
    w, h, comps, prec = frame
    if len(seen_cids) != len(comps):
        missing = [c for c, *_r in comps if c not in seen_cids]
        raise ValueError(
            f"jpeg: lossless components never coded by any scan: {missing}"
        )
    _hm, _vm, _mx, _my, dims = _comp_dims(w, h, comps)
    return w, h, comps, _crop_planes(planes, dims), prec


def encode_jpeg_lossless_arith(
    planes: "list[list[list[int]]]",
    precision: int = 8,
    predictor: int = 1,
    pt: int = 0,
    restart_interval: int = 0,
    non_interleaved: bool = False,
    sampling: "list[tuple[int, int]] | None" = None,
    size: "tuple[int, int] | None" = None,
) -> bytes:
    """SOF11 encoder — the exact mirror of the decoder above (same
    conditioning, same statistics layout, QM encoder).
    ``non_interleaved`` (r08 s3): one scan per component with per-scan
    coder/statistics state and predictor cycling, mirroring the
    Huffman encoder's multi-scan layout. ``sampling``/``size``
    (r08 s4): per-component factors over the full-image dims, same
    natural-plane/padded-MCU contract as encode_jpeg_lossless."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        ArithEncoder,
        Stats,
    )

    nc = len(planes)
    if not 1 <= nc <= 4:
        raise ValueError(f"bad component count {nc}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad predictor {predictor}")
    if sampling is None:
        sampling = [(1, 1)] * nc
    if size is None:
        size = (len(planes[0][0]), len(planes[0]))
    w, h = size
    comps = [(ci + 1, 0, sh, sv) for ci, (sh, sv) in enumerate(sampling)]
    _hm, _vm, mcx, mcy, dims = _comp_dims(w, h, comps)
    for ci, ((cw, ch, _pw, _ph), pl) in enumerate(zip(dims, planes)):
        if len(pl) != ch or len(pl[0]) != cw:
            raise ValueError(
                f"component {ci}: plane {len(pl[0])}x{len(pl)} != "
                f"natural dims {cw}x{ch}"
            )
    padded = []
    for (cw, ch, pw, ph), pl in zip(dims, planes):
        rows = [list(r) + [r[-1]] * (pw - cw) for r in pl]
        rows += [list(rows[-1]) for _ in range(ph - ch)]
        padded.append(rows)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xcb" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for ci, (sh, sv) in enumerate(sampling):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xcc" + struct.pack(">H", 4) + bytes([0x00, 0x10])  # L=0,U=1
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    default = 1 << (precision - 1 - pt) if precision - 1 - pt >= 0 else 0
    ll, uu = 0, 1

    def encode_one(enc, stats, dp, plane, x, y, pred_s, fr):
        row = plane[y]
        prev_row = plane[y - 1] if y > 0 else None
        pred = _predict(pred_s, row, prev_row, x, y, default, fr)
        dd = (row[x] - pred) & 0xFFFF
        if dd >= 32768:
            dd -= 65536  # mod-2^16 diff in [-32768, 32767]
        if dd == -32768:
            raise NotImplementedError(
                "jpeg: lossless-arithmetic |diff| >= 32768"
            )
        da = dp[y][x - 1] if x > 0 else 0
        db = dp[y - 1][x] if y > 0 else 0
        ca = _la_classify(da, ll, uu)
        cb = _la_classify(db, ll, uu)
        mag_base = _LA_TREE_B if cb >= 3 else _LA_TREE_A
        _la_encode_diff(enc, stats, 4 * (5 * ca + cb), mag_base, dd)
        dp[y][x] = dd

    def interleaved_body(pred_s: int) -> bytes:
        chunks: list[bytes] = []
        enc = ArithEncoder()
        stats = Stats(LA_STAT_SLOTS)
        dplanes = [
            [[0] * pw for _ in range(ph)] for (_cw, _ch, pw, ph) in dims
        ]
        count = 0
        rst = 0
        fresh = [True] * nc
        for m in range(mcx * mcy):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                chunks.append(enc.flush())
                chunks.append(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) & 7
                enc = ArithEncoder()
                stats = Stats(LA_STAT_SLOTS)
                dplanes = [
                    [[0] * pw for _ in range(ph)]
                    for (_cw, _ch, pw, ph) in dims
                ]
                fresh = [True] * nc
            count += 1
            my0, mx0 = divmod(m, mcx)
            for ci in range(nc):
                sh, sv = sampling[ci]
                for b in range(sv):
                    y = my0 * sv + b
                    for a in range(sh):
                        x = mx0 * sh + a
                        encode_one(
                            enc, stats, dplanes[ci], padded[ci],
                            x, y, pred_s, fresh[ci],
                        )
                        fresh[ci] = False
        chunks.append(enc.flush())
        return b"".join(chunks)

    def single_body(ci: int, pred_s: int) -> bytes:
        cw, ch, _pw, _ph = dims[ci]
        chunks: list[bytes] = []
        enc = ArithEncoder()
        stats = Stats(LA_STAT_SLOTS)
        dp = [[0] * cw for _ in range(ch)]
        count = 0
        rst = 0
        fresh = True
        for y in range(ch):
            for x in range(cw):
                if restart_interval and count and (
                    count % restart_interval == 0
                ):
                    chunks.append(enc.flush())
                    chunks.append(bytes((0xFF, 0xD0 + rst)))
                    rst = (rst + 1) & 7
                    enc = ArithEncoder()
                    stats = Stats(LA_STAT_SLOTS)
                    dp = [[0] * cw for _ in range(ch)]
                    fresh = True
                count += 1
                encode_one(enc, stats, dp, planes[ci], x, y, pred_s, fresh)
                fresh = False
        chunks.append(enc.flush())
        return b"".join(chunks)

    if non_interleaved or nc == 1:
        for ci in range(nc):
            pred_s = (
                predictor if nc == 1 else (predictor - 1 + ci) % 7 + 1
            )
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, 0x00, pred_s, 0, pt])
            out += single_body(ci, pred_s)
    else:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for ci in range(nc):
            out += bytes([ci + 1, 0x00])  # all components share table 0
        out += bytes([predictor, 0, pt])
        out += interleaved_body(predictor)
    out += b"\xff\xd9"
    return bytes(out)
