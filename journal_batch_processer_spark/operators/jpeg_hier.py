"""T.81 HIERARCHICAL JPEG (Annex K): DHP-led multi-frame pyramids.

A hierarchical stream is a SEQUENCE of frames: the first is any
non-differential process at (usually) reduced resolution; each later
frame is a DIFFERENTIAL frame whose decoded spatial output is a SIGNED
correction ADDED to the reference (the reconstruction so far), with an
optional EXP segment first that upsamples the reference ×2
horizontally and/or vertically (the K.5 interpolation filter:
even samples copy, odd samples are the (a+b+1)>>1 midpoint with edge
replication). Before r08 the decoder silently decoded ONLY the first
frame of such a stream — a low-resolution image presented as the
answer; that is exactly the silent-partial-decode failure mode this
repo's media layer bans, fixed here by decoding the pyramid.

Supported scope, honest and loud:
- DHP (0xDE) + a first non-differential frame in ANY process the
  engine already decodes (it is re-dispatched through the main
  decoder on a synthesized sub-stream: SOI + accumulated tables +
  frame + EOI — table state accumulates across frames per B.2/K.2);
- EXP (0xDF) reference expansion, Eh/Ev ∈ {0,1};
- differential SEQUENTIAL frames — Huffman (SOF5) or QM-arithmetic
  (SOF13): DC coded with PRED=0
  (F.2.1.3.1 — no predictor carry-over in differential frames), no
  level shift, IDCT output in [-maxval, maxval] added to the
  reference and clamped to the sample range (K.4); DRI/RSTn honored.
- differential LOSSLESS frames — Huffman (SOF7) or QM-arithmetic
  (SOF15), r08: Ss=0 scans (Table H.1 predictor value 0 = no
  prediction — the coded diffs ARE the corrections), added to the
  reference MODULO 2^16 (K.4), so a pyramid whose stages are all
  lossless reconstructs the source bit-exactly; DRI/RSTn honored,
  2..16-bit, 1..4 components.
- differential PROGRESSIVE frames — Huffman (SOF6) or QM-arithmetic
  (SOF14), r08: the spectral-selection / successive-approximation
  scan decoders of operators/jpeg.py reused with ``differential=True``
  (PRED=0 in the DC first pass), coefficients accumulated across
  scans and IDCT'd once at frame end into clamped corrections.
- ANY 1..4 sampling in differential frames — DCT (r08 s3) AND
  LOSSLESS (r08 s4: correction scans code h×v-sample MCUs on the
  padded grid, cropped to natural dims, both entropy coders) —
  fractional ratios included: references are kept PER COMPONENT at the
  component's own resolution (cropped from the padded block grid so
  EXP midpoints never see padding), corrections decode on the same
  per-component grids, and each component's sampling is pinned across
  pyramid frames — a frame that re-declares a component at different
  factors fails by name. The Hi×Vi data-unit raster inside each MCU
  is the exact loop convention of the libjpeg-cross-validated
  sequential decoder.
- Gated by name: sampling changes across pyramid frames,
  non-interleaved differential scans, and multi-band composition (a
  second non-differential frame).

Validation: no system library decodes hierarchical JPEG (libjpeg has
never implemented it), so — as for lossless — the proof is bit-exact
self-consistency: the fixture encoder writes real multi-frame pyramids
(reduced first stage, EXP, constant-difference refinement) whose final
means are closed-form, plus structural tests (a truncated pyramid and
an unexpanded-reference dimension mismatch both fail loud).
"""

from __future__ import annotations

import struct

from journal_batch_processer_spark.operators.jpeg import (
    STD_DC_LUMA,
    STD_AC_LUMA,
    STD_DC_CHROMA,
    STD_AC_CHROMA,
    STD_LUMA_QT,
    STD_CHROMA_QT,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _category,
    _entropy_end,
    _extend,
    _huff_codes,
    _huff_decoder,
    _idct_block,
    _read_huff,
)

_TABLE_MARKERS = frozenset({0xDB, 0xC4, 0xCC, 0xDD, 0xFE})  # DQT DHT DAC DRI COM
_NONDIFF_SOFS = frozenset({0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB})
_DIFF_SOFS = frozenset({0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF})


def _expand_1d(row: list[int]) -> list[int]:
    """K.5 horizontal ×2: even outputs copy, odd outputs midpoint
    (a+b+1)>>1, right edge replicated."""
    n = len(row)
    out = [0] * (2 * n)
    for i, a in enumerate(row):
        b = row[i + 1] if i + 1 < n else a
        out[2 * i] = a
        out[2 * i + 1] = (a + b + 1) >> 1
    return out


def expand_plane(plane: list, eh: int, ev: int) -> list:
    """EXP reference upsampling: ×2 horizontally (eh) and/or
    vertically (ev) with the K.5 filter in each direction."""
    if eh:
        plane = [_expand_1d(r) for r in plane]
    if ev:
        out = []
        n = len(plane)
        for y, r in enumerate(plane):
            nxt = plane[y + 1] if y + 1 < n else r
            out.append(r)
            out.append([(a + b + 1) >> 1 for a, b in zip(r, nxt)])
        plane = out
    return plane


def _crop(plane: list, cw: int, ch: int) -> list:
    """Crop a padded block-grid plane to its true component dims."""
    return [row[:cw] for row in plane[:ch]]


def _diff_frame_comps(frame_seg: bytes, prec: int) -> tuple:
    """Parse a differential DCT frame header: (h, w, comps, geometry)
    with ARBITRARY 1..4 sampling factors (r08 s3 — the last sampling
    gate): comps are (cid, tq, hi, vi); geometry is (hmax, vmax,
    mcux, mcuy) over the padded MCU grid. A single-component frame is
    non-interleaved, so its factors play no dimensional role."""
    fprec, h, w, nc = struct.unpack(">BHHB", frame_seg[:6])
    if fprec != prec:
        raise ValueError(
            f"jpeg hier: differential frame precision {fprec} != {prec}"
        )
    comps = []
    for ci in range(nc):
        cid, samp, tq = frame_seg[6 + 3 * ci : 9 + 3 * ci]
        hi, vi = samp >> 4, samp & 0xF
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            raise ValueError(f"jpeg hier: invalid sampling factors {hi}x{vi}")
        comps.append((cid, tq, hi, vi))
    if nc == 1:
        comps = [(comps[0][0], comps[0][1], 1, 1)]
    hmax = max(hi for _c, _t, hi, _v in comps)
    vmax = max(vi for _c, _t, _h, vi in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return h, w, comps, (hmax, vmax, mcux, mcuy)


def _comp_dims(w: int, h: int, hi: int, vi: int, hmax: int, vmax: int):
    """True component sample dims per T.81 A.1.1 (ceil scaling)."""
    return -(-w * hi // hmax), -(-h * vi // vmax)


def _decode_diff_seq_frame(
    data: bytes,
    frame_seg: bytes,
    pos: int,
    tables: dict,
    prec: int,
) -> tuple:
    """Decode one SOF5 frame starting AFTER its frame segment at
    ``pos``; returns (w, h, [(cid, plane, (hi, vi))], new_pos) where
    each plane holds SIGNED corrections cropped to the component's
    true (possibly subsampled) dims."""
    h, w, comps, (hmax, vmax, mcux, mcuy) = _diff_frame_comps(
        frame_seg, prec
    )
    nc = len(comps)
    maxval = (1 << prec) - 1
    planes = {
        cid: [[0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)]
        for cid, _tq, hi, vi in comps
    }
    samp_by_cid = {cid: (hi, vi) for cid, _tq, hi, vi in comps}
    scan = None
    restart_interval = tables.get("dri", 0)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg hier: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                tables[("huff", tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                raw = seg[p + 1 : p + 65 + 64 * pq]
                if pq:
                    zz = [
                        struct.unpack(">H", raw[2 * i : 2 * i + 2])[0]
                        for i in range(64)
                    ]
                else:
                    zz = list(raw[:64])
                qt = [0] * 64
                for i in range(64):
                    qt[ZIGZAG[i]] = zz[i]
                tables[("qt", tq)] = qt
                p += 65 + 64 * pq
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
            tables["dri"] = restart_interval
        elif marker == 0xDA:
            ns = seg[0]
            scan = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            entropy_start = pos + seglen
            break
        else:
            raise ValueError(
                f"jpeg hier: unexpected marker 0x{marker:02x} inside a "
                "differential frame"
            )
        pos += seglen
    if scan is None:
        raise ValueError("jpeg hier: differential frame without SOS")
    if len(scan) != nc:
        raise NotImplementedError(
            "jpeg hier: non-interleaved differential scans unsupported"
        )
    qt_by_cid = {}
    for cid, tq, _hi, _vi in comps:
        qt = tables.get(("qt", tq))
        if qt is None:
            raise ValueError(f"jpeg hier: missing DQT {tq}")
        qt_by_cid[cid] = qt
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    br = _BitReader(data[entropy_start:end])
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                br.expect_restart(rst)
                rst = (rst + 1) & 7
            mcu_count += 1
            for cid, dct, act in scan:
                dc_tab = tables.get(("huff", 0, dct))
                ac_tab = tables.get(("huff", 1, act))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("jpeg hier: missing DHT for scan")
                qt = qt_by_cid[cid]
                hi, vi = samp_by_cid[cid]
                plane = planes[cid]
                # T.81 B.2.3: Hi×Vi data units per component per MCU
                for bv in range(vi):
                    for bhx in range(hi):
                        # DC: PRED = 0 in differential frames
                        # (F.2.1.3.1) — the decoded value IS the
                        # quantized DC, no carry
                        cat = _read_huff(br, dc_tab)
                        dc = _extend(br.bits(cat), cat) if cat else 0
                        coef = [0] * 64
                        coef[0] = dc * qt[0]
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "jpeg hier: AC index overflow"
                                )
                            coef[ZIGZAG[k]] = (
                                _extend(br.bits(s), s) * qt[ZIGZAG[k]]
                            )
                            k += 1
                        block = _idct_block(
                            coef, half=0, maxval=maxval, lo=-maxval
                        )
                        py = (my * vi + bv) * 8
                        px = (mx * hi + bhx) * 8
                        for yy in range(8):
                            row = plane[py + yy]
                            for xx in range(8):
                                row[px + xx] = block[yy * 8 + xx]
    out = []
    for cid, _tq, hi, vi in comps:
        cw, ch = _comp_dims(w, h, hi, vi, hmax, vmax)
        out.append((cid, _crop(planes[cid], cw, ch), (hi, vi)))
    return w, h, out, end


def _decode_diff_arith_frame(
    data: bytes,
    frame_seg: bytes,
    pos: int,
    tables: dict,
    prec: int,
) -> tuple:
    """SOF13 — differential sequential ARITHMETIC: the QM entropy
    layer under the same PRED=0 spatial-correction semantics as SOF5.
    Same return contract as :func:`_decode_diff_seq_frame`."""
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        FIXED_BIN,
        ArithDecoder,
        Stats,
        decode_ac_coefs,
        decode_dc_diff,
    )

    h, w, comps, (hmax, vmax, mcux, mcuy) = _diff_frame_comps(
        frame_seg, prec
    )
    nc = len(comps)
    maxval = (1 << prec) - 1
    planes = {
        cid: [[0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)]
        for cid, _tq, hi, vi in comps
    }
    samp_by_cid = {cid: (hi, vi) for cid, _tq, hi, vi in comps}
    scan = None
    restart_interval = tables.get("dri", 0)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg hier: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xCC:  # DAC
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                if tc == 0:
                    tables[("dac_dc", tb)] = (cs & 0xF, cs >> 4)
                else:
                    tables[("dac_ac", tb)] = cs
                p += 2
        elif marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                raw = seg[p + 1 : p + 65 + 64 * pq]
                if pq:
                    zz = [
                        struct.unpack(">H", raw[2 * i : 2 * i + 2])[0]
                        for i in range(64)
                    ]
                else:
                    zz = list(raw[:64])
                qt = [0] * 64
                for i in range(64):
                    qt[ZIGZAG[i]] = zz[i]
                tables[("qt", tq)] = qt
                p += 65 + 64 * pq
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
            tables["dri"] = restart_interval
        elif marker == 0xDA:
            ns = seg[0]
            scan = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            entropy_start = pos + seglen
            break
        else:
            raise ValueError(
                f"jpeg hier: unexpected marker 0x{marker:02x} inside a "
                "differential frame"
            )
        pos += seglen
    if scan is None:
        raise ValueError("jpeg hier: differential frame without SOS")
    if len(scan) != nc:
        raise NotImplementedError(
            "jpeg hier: non-interleaved differential scans unsupported"
        )
    qt_by_cid = {}
    for cid, tq, _hi, _vi in comps:
        qt = tables.get(("qt", tq))
        if qt is None:
            raise ValueError(f"jpeg hier: missing DQT {tq}")
        qt_by_cid[cid] = qt

    def fresh():
        dc = {dct: Stats(DC_STAT_SLOTS) for _c, dct, _a in scan}
        ac = {act: Stats(AC_STAT_SLOTS) for _c, _d, act in scan}
        return dc, ac

    fixed = Stats(1)
    fixed.idx[0] = FIXED_BIN
    dec = ArithDecoder(data, entropy_start)
    dc_stats, ac_stats = fresh()
    dc_ctx = {cid: 0 for cid, _tq, _hi, _vi in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                mp = dec.marker_pos
                if mp is None or data[mp + 1] != 0xD0 + rst:
                    raise ValueError(
                        f"jpeg hier: expected restart marker RST{rst}"
                    )
                dec = ArithDecoder(data, mp + 2)
                dc_stats, ac_stats = fresh()
                dc_ctx = {cid: 0 for cid, _tq, _hi, _vi in comps}
                rst = (rst + 1) & 7
            mcu_count += 1
            for cid, dct, act in scan:
                ll, uu = tables.get(("dac_dc", dct), (0, 1))
                kx = tables.get(("dac_ac", act), 5)
                qt = qt_by_cid[cid]
                hi, vi = samp_by_cid[cid]
                plane = planes[cid]
                for bv in range(vi):
                    for bhx in range(hi):
                        # PRED = 0: the decoded "difference" IS the
                        # DC value (conditioning context still chains
                        # per component, F.1.4.4.1.1)
                        dc, dc_ctx[cid] = decode_dc_diff(
                            dec, dc_stats[dct], dc_ctx[cid], ll, uu
                        )
                        coef = [0] * 64
                        coef[0] = dc * qt[0]
                        decode_ac_coefs(
                            dec, ac_stats[act], fixed, kx, coef, ZIGZAG, qt
                        )
                        block = _idct_block(
                            coef, half=0, maxval=maxval, lo=-maxval
                        )
                        py = (my * vi + bv) * 8
                        px = (mx * hi + bhx) * 8
                        for yy in range(8):
                            row = plane[py + yy]
                            for xx in range(8):
                                row[px + xx] = block[yy * 8 + xx]
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    out = []
    for cid, _tq, hi, vi in comps:
        cw, ch = _comp_dims(w, h, hi, vi, hmax, vmax)
        out.append((cid, _crop(planes[cid], cw, ch), (hi, vi)))
    return w, h, out, end


def _decode_diff_progressive_frame(
    data: bytes,
    frame_seg: bytes,
    pos: int,
    tables: dict,
    prec: int,
    arith: bool,
) -> tuple:
    """SOF6 (Huffman) / SOF14 (QM-arithmetic) — differential
    PROGRESSIVE: the correction image's quantized DCT coefficients
    accumulate across spectral-selection / successive-approximation
    scans exactly as in a non-differential progressive frame
    (operators/jpeg.py scan decoders, reused with ``differential=True``
    so the DC first pass applies PRED=0 — each block's decoded value
    IS its correction DC, F.2.1.3.1), then dequantize + IDCT once at
    frame end into signed corrections in [-maxval, maxval].  Same
    return contract as :func:`_decode_diff_seq_frame`; the frame ends
    at the first non-scan, non-table marker (next frame / EXP / EOI).
    """
    from journal_batch_processer_spark.operators.jpeg import (
        _decode_progressive_scan,
        _decode_progressive_scan_arith,
    )

    h, w, comps, (hmax, vmax, mcux, mcuy) = _diff_frame_comps(
        frame_seg, prec
    )
    maxval = (1 << prec) - 1
    frame = (w, h, comps)
    dims = []
    for _cid, _tq, hi, vi in comps:
        bwb, bhb = mcux * hi, mcuy * vi  # padded storage grid
        cwb = (-(-w * hi // hmax) + 7) // 8  # non-interleaved grid
        chb = (-(-h * vi // vmax) + 7) // 8
        dims.append((bwb, bhb, cwb, chb))
    geom = (hmax, vmax, mcux, mcuy, dims)
    coefs = [
        [[0] * 64 for _ in range(bwb * bhb)] for bwb, bhb, _cw, _ch in dims
    ]
    restart_interval = tables.get("dri", 0)
    saw_scan = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg hier: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker not in (0xC4, 0xCC, 0xDB, 0xDD, 0xDA):
            break  # frame over: next frame / EXP / DHP / EOI
        mstart = pos
        pos += 2
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                tables[("huff", tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xCC:
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                if tc == 0:
                    tables[("dac_dc", tb)] = (cs & 0xF, cs >> 4)
                else:
                    tables[("dac_ac", tb)] = cs
                p += 2
        elif marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                raw = seg[p + 1 : p + 65 + 64 * pq]
                if pq:
                    zz = [
                        struct.unpack(">H", raw[2 * i : 2 * i + 2])[0]
                        for i in range(64)
                    ]
                else:
                    zz = list(raw[:64])
                qt = [0] * 64
                for i in range(64):
                    qt[ZIGZAG[i]] = zz[i]
                tables[("qt", tq)] = qt
                p += 65 + 64 * pq
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
            tables["dri"] = restart_interval
        else:  # SOS — decode this scan now
            saw_scan = True
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
                dc_cond = {
                    tb: tables[("dac_dc", tb)]
                    for tb in range(16)
                    if ("dac_dc", tb) in tables
                }
                ac_cond = {
                    tb: tables[("dac_ac", tb)]
                    for tb in range(16)
                    if ("dac_ac", tb) in tables
                }
                _decode_progressive_scan_arith(
                    data, entropy_start, frame, geom, coefs,
                    scan_comps, ss, se, ah, al, restart_interval,
                    dc_cond, ac_cond, differential=True,
                )
            else:
                dc_tables = {
                    th: tables[("huff", 0, th)]
                    for th in range(16)
                    if ("huff", 0, th) in tables
                }
                ac_tables = {
                    th: tables[("huff", 1, th)]
                    for th in range(16)
                    if ("huff", 1, th) in tables
                }
                br = _BitReader(data[entropy_start:end])
                _decode_progressive_scan(
                    br, frame, geom, coefs, dc_tables, ac_tables,
                    scan_comps, ss, se, ah, al, restart_interval,
                    differential=True,
                )
            pos = end
            continue
        pos += seglen
    if not saw_scan:
        raise ValueError("jpeg hier: differential frame without SOS")
    out = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        qt = tables.get(("qt", tq))
        if qt is None:
            raise ValueError(f"jpeg hier: missing DQT {tq}")
        bwb, bhb, _cwb, _chb = dims[ci]
        plane = [[0] * (bwb * 8) for _ in range(bhb * 8)]
        for bidx, cq in enumerate(coefs[ci]):
            block = _idct_block(
                [cq[i] * qt[i] for i in range(64)],
                half=0, maxval=maxval, lo=-maxval,
            )
            by, bx = divmod(bidx, bwb)
            for yy in range(8):
                row = plane[by * 8 + yy]
                row[bx * 8 : bx * 8 + 8] = block[yy * 8 : yy * 8 + 8]
        cw, ch = _comp_dims(w, h, hi, vi, hmax, vmax)
        out.append((cid, _crop(plane, cw, ch), (hi, vi)))
    return w, h, out, pos


def _decode_diff_lossless_frame(
    data: bytes,
    frame_seg: bytes,
    pos: int,
    tables: dict,
    prec: int,
    arith: bool,
) -> tuple:
    """SOF7 (Huffman) / SOF15 (QM-arithmetic) — differential LOSSLESS:
    the correction samples are coded with the Annex-H entropy layer but
    WITHOUT prediction (T.81 Table H.1: predictor selection value 0 is
    reserved for exactly this — differential coding in hierarchical
    mode; the scan's Ss must be 0).  The decoded value (<< Pt) IS the
    correction; the caller adds it to the reference MODULO 2^16 (K.4 —
    lossless differential addition is modular, unlike the clamped DCT
    case, so the final stage reconstructs the source bit-exactly).
    Arithmetic conditioning (H.1.2.2) classifies Da/Db over the coded
    correction values themselves — in a non-differential lossless
    frame those conditioning values are the prediction differences,
    and in a differential frame the corrections play that role.
    Returns (w, h, [(cid, plane)], new_pos, pt) with planes at the
    exact sample grid (no 8x8 padding)."""
    fprec, h, w, nc = struct.unpack(">BHHB", frame_seg[:6])
    if fprec != prec:
        raise ValueError(
            f"jpeg hier: differential frame precision {fprec} != {prec}"
        )
    comps = []
    csamp = {}
    for ci in range(nc):
        cid, samp, _tq = frame_seg[6 + 3 * ci : 9 + 3 * ci]
        sh, sv = samp >> 4, samp & 0xF
        if not (1 <= sh <= 4 and 1 <= sv <= 4):
            raise ValueError(
                f"jpeg hier: bad sampling factors {sh}x{sv} in a "
                "differential lossless frame"
            )
        comps.append(cid)
        csamp[cid] = (sh, sv)
    scan = None
    restart_interval = tables.get("dri", 0)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg hier: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                tables[("huff", tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xCC:
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                if tc == 0:
                    tables[("dac_dc", tb)] = (cs & 0xF, cs >> 4)
                else:
                    tables[("dac_ac", tb)] = cs
                p += 2
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
            tables["dri"] = restart_interval
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4) for i in range(ns)
            ]
            ss, _se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = (scan_comps, ss, a & 0xF)
            entropy_start = pos + seglen
            break
        else:
            raise ValueError(
                f"jpeg hier: unexpected marker 0x{marker:02x} inside a "
                "differential frame"
            )
        pos += seglen
    if scan is None:
        raise ValueError("jpeg hier: differential frame without SOS")
    scan_comps, ss, pt = scan
    if ss != 0:
        raise ValueError(
            f"jpeg hier: differential lossless scan must have Ss=0 "
            f"(no prediction), got {ss}"
        )
    if len(scan_comps) != nc:
        raise NotImplementedError(
            "jpeg hier: non-interleaved differential scans unsupported"
        )
    order = []
    for cid, tb in scan_comps:
        if cid not in comps:
            raise ValueError(f"jpeg hier: scan component id {cid} not in frame")
        order.append((cid, tb))
    # per-component natural + padded dims (r08 s4 — any 1..4 sampling
    # in differential LOSSLESS frames, the last derivative gate): the
    # interleaved correction scan codes the padded MCU grid, the
    # result crops to the natural grid (same Annex-A geometry as the
    # non-differential lossless decoder)
    hmax = max(sh for sh, _sv in csamp.values())
    vmax = max(sv for _sh, sv in csamp.values())
    mcx, mcy = -(-w // hmax), -(-h // vmax)
    dims = {
        cid: (
            -(-w * sh // hmax),   # cw (natural)
            -(-h * sv // vmax),   # ch
            mcx * sh,             # pw (padded)
            mcy * sv,             # ph
        )
        for cid, (sh, sv) in csamp.items()
    }
    planes = {
        cid: [[0] * dims[cid][2] for _ in range(dims[cid][3])]
        for cid in comps
    }

    def cropped():
        return [
            (
                cid,
                [row[: dims[cid][0]] for row in planes[cid][: dims[cid][1]]],
                csamp[cid],
            )
            for cid in comps
        ]

    if not arith:
        end = _entropy_end(data, entropy_start, skip_restarts=True)
        br = _BitReader(data[entropy_start:end])
        count = 0
        rst = 0
        for m in range(mcx * mcy):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                br.expect_restart(rst)
                rst = (rst + 1) & 7
            count += 1
            my0, mx0 = divmod(m, mcx)
            for cid, tb in order:
                table = tables.get(("huff", 0, tb))
                if table is None:
                    raise ValueError("jpeg hier: missing DHT for scan")
                sh, sv = csamp[cid]
                plane = planes[cid]
                for b in range(sv):
                    row = plane[my0 * sv + b]
                    for a in range(sh):
                        s = _read_huff(br, table)
                        if s == 16:
                            diff = 32768
                        elif s:
                            diff = _extend(br.bits(s), s)
                        else:
                            diff = 0
                        row[mx0 * sh + a] = diff << pt
        return w, h, cropped(), end, pt

    from journal_batch_processer_spark.operators.jpeg_arith import (
        ArithDecoder,
        Stats,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        LA_STAT_SLOTS,
        _LA_TREE_A,
        _LA_TREE_B,
        _la_classify,
        _la_decode_diff,
    )

    def fresh_stats():
        return {tb: Stats(LA_STAT_SLOTS) for _cid, tb in order}

    def fresh_diffs():
        # Da/Db conditioning as full per-component diff planes (the
        # MCU order interleaves raster rows); restart clears them —
        # pre-restart neighbors condition as zero
        return {
            cid: [[0] * dims[cid][2] for _ in range(dims[cid][3])]
            for cid in comps
        }

    dec = ArithDecoder(data, entropy_start)
    stats_by_tb = fresh_stats()
    dplanes = fresh_diffs()
    count = 0
    rst = 0
    for m in range(mcx * mcy):
        if restart_interval and count and count % restart_interval == 0:
            mp = dec.marker_pos
            if mp is None or data[mp + 1] != 0xD0 + rst:
                raise ValueError(
                    f"jpeg hier: expected restart marker RST{rst}"
                )
            dec = ArithDecoder(data, mp + 2)
            stats_by_tb = fresh_stats()
            dplanes = fresh_diffs()
            rst = (rst + 1) & 7
        count += 1
        my0, mx0 = divmod(m, mcx)
        for cid, tb in order:
            ll, uu = tables.get(("dac_dc", tb), (0, 1))
            sh, sv = csamp[cid]
            dp = dplanes[cid]
            plane = planes[cid]
            for b in range(sv):
                y = my0 * sv + b
                for a in range(sh):
                    x = mx0 * sh + a
                    da = dp[y][x - 1] if x > 0 else 0
                    db = dp[y - 1][x] if y > 0 else 0
                    ca = _la_classify(da, ll, uu)
                    cb = _la_classify(db, ll, uu)
                    mag_base = _LA_TREE_B if cb >= 3 else _LA_TREE_A
                    diff = _la_decode_diff(
                        dec, stats_by_tb[tb], 4 * (5 * ca + cb), mag_base
                    )
                    plane[y][x] = diff << pt
                    dp[y][x] = diff
    end = _entropy_end(data, entropy_start, skip_restarts=True)
    return w, h, cropped(), end, pt


def decode_jpeg_hierarchical(data: bytes):
    """Decode a DHP-led hierarchical stream; returns the standard
    (w, h, comps, planes, prec) tuple for the FINAL reconstruction."""
    from journal_batch_processer_spark.operators.jpeg import (
        _decode_jpeg_planes,
    )

    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    prelude: list[bytes] = []  # raw table/misc segments, accumulated
    tables: dict = {}  # parsed state for differential frames
    dhp = None
    pending_exp = None
    ref: dict[int, list] | None = None  # cid -> plane (reconstruction)
    ref_dims: tuple[int, int] | None = None
    prec = None
    maxval = 255
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg hier: expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        mstart = pos
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDE:  # DHP — same payload layout as a SOF
            p, y, x, nc = struct.unpack(">BHHB", seg[:6])
            dhp = (p, x, y, [seg[6 + 3 * i] for i in range(nc)])
            prec = p
            maxval = (1 << p) - 1
            pos += seglen
        elif marker == 0xDF:  # EXP
            pending_exp = (seg[0] >> 4, seg[0] & 0xF)
            pos += seglen
        elif marker in _TABLE_MARKERS or 0xE0 <= marker <= 0xEF:
            prelude.append(data[mstart : pos + seglen])
            if marker == 0xDD:
                tables["dri"] = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xCC:
                p2 = 0
                while p2 + 1 < len(seg):
                    tc, tb = seg[p2] >> 4, seg[p2] & 0xF
                    cs = seg[p2 + 1]
                    if tc == 0:
                        tables[("dac_dc", tb)] = (cs & 0xF, cs >> 4)
                    else:
                        tables[("dac_ac", tb)] = cs
                    p2 += 2
            elif marker == 0xC4:
                p2 = 0
                while p2 < len(seg):
                    tc, th = seg[p2] >> 4, seg[p2] & 0xF
                    bits = [0] + list(seg[p2 + 1 : p2 + 17])
                    n = sum(bits)
                    vals = list(seg[p2 + 17 : p2 + 17 + n])
                    tables[("huff", tc, th)] = _huff_decoder(bits, vals)
                    p2 += 17 + n
            elif marker == 0xDB:
                p2 = 0
                while p2 < len(seg):
                    pq, tq = seg[p2] >> 4, seg[p2] & 0xF
                    raw = seg[p2 + 1 : p2 + 65 + 64 * pq]
                    if pq:
                        zz = [
                            struct.unpack(">H", raw[2 * i : 2 * i + 2])[0]
                            for i in range(64)
                        ]
                    else:
                        zz = list(raw[:64])
                    qt = [0] * 64
                    for i in range(64):
                        qt[ZIGZAG[i]] = zz[i]
                    tables[("qt", tq)] = qt
                    p2 += 65 + 64 * pq
            pos += seglen
        elif marker in _NONDIFF_SOFS:
            if dhp is None:
                raise ValueError("jpeg hier: frame before DHP")
            if ref is not None:
                raise NotImplementedError(
                    "jpeg hier: a SECOND non-differential frame "
                    "(multi-band composition) is unsupported"
                )
            # find the end of this frame: scans until a frame-level
            # marker, then synthesize a standalone stream for the
            # existing decoder
            fpos = pos + seglen
            while True:
                if data[fpos] != 0xFF:
                    raise ValueError("jpeg hier: lost marker sync in frame")
                m2 = data[fpos + 1]
                if m2 == 0xDA:
                    sl = struct.unpack(">H", data[fpos + 2 : fpos + 4])[0]
                    fpos = _entropy_end(
                        data, fpos + 2 + sl, skip_restarts=True
                    )
                elif (
                    m2 in _TABLE_MARKERS
                    or 0xE0 <= m2 <= 0xEF
                ):
                    sl = struct.unpack(">H", data[fpos + 2 : fpos + 4])[0]
                    fpos += 2 + sl
                else:  # SOF / EXP / DHP / EOI — frame is over
                    break
            sub = (
                b"\xff\xd8"
                + b"".join(prelude)
                + data[mstart:fpos]
                + b"\xff\xd9"
            )
            w0, h0, comps0, planes0, p0 = _decode_jpeg_planes(sub)
            if p0 != prec:
                raise ValueError("jpeg hier: frame precision != DHP")
            # per-component reference planes at the COMPONENT's own
            # resolution (r08 s3): cropped from the padded block grid
            # so EXP midpoints and differential additions never see
            # padding garbage; ref_samp pins the sampling every later
            # differential frame must repeat
            hm0 = max(hi for _c, _t, hi, _v in comps0)
            vm0 = max(vi for _c, _t, _h, vi in comps0)
            ref, ref_samp = {}, {}
            for i, (cid, _tq, hi, vi) in enumerate(comps0):
                cw, ch = _comp_dims(w0, h0, hi, vi, hm0, vm0)
                ref[cid] = _crop(planes0[i], cw, ch)
                ref_samp[cid] = (hi, vi)
            ref_dims = (w0, h0)
            pos = fpos
        elif marker in _DIFF_SOFS:
            if ref is None:
                raise ValueError(
                    "jpeg hier: differential frame without a reference"
                )
            if pending_exp:
                eh, ev = pending_exp
                ref = {c: expand_plane(pl, eh, ev) for c, pl in ref.items()}
                ref_dims = (
                    ref_dims[0] * (2 if eh else 1),
                    ref_dims[1] * (2 if ev else 1),
                )
                pending_exp = None
            lossless = marker in (0xC7, 0xCF)
            if lossless:
                fw, fh, diffs, pos, _pt = _decode_diff_lossless_frame(
                    data, seg, pos + seglen, tables, prec,
                    arith=(marker == 0xCF),
                )
            elif marker in (0xC6, 0xCE):
                fw, fh, diffs, pos = _decode_diff_progressive_frame(
                    data, seg, pos + seglen, tables, prec,
                    arith=(marker == 0xCE),
                )
            else:
                decode_frame = (
                    _decode_diff_seq_frame
                    if marker == 0xC5
                    else _decode_diff_arith_frame
                )
                fw, fh, diffs, pos = decode_frame(
                    data, seg, pos + seglen, tables, prec
                )
            if (fw, fh) != ref_dims:
                raise ValueError(
                    f"jpeg hier: differential frame {fw}x{fh} does not "
                    f"match the (expanded) reference {ref_dims[0]}x"
                    f"{ref_dims[1]} — missing EXP?"
                )
            for cid, dplane, dsamp in diffs:
                if cid not in ref:
                    raise ValueError(
                        f"jpeg hier: differential component {cid} not in "
                        "the reference frame"
                    )
                if dsamp != ref_samp[cid]:
                    raise NotImplementedError(
                        f"jpeg hier: component {cid} sampling changed "
                        f"across pyramid frames ({ref_samp[cid]} -> "
                        f"{dsamp})"
                    )
                rplane = ref[cid]
                ch, cw = len(dplane), len(dplane[0]) if dplane else 0
                if len(rplane) < ch or (rplane and len(rplane[0]) < cw):
                    raise ValueError(
                        f"jpeg hier: component {cid} reference "
                        f"{len(rplane[0]) if rplane else 0}x{len(rplane)}"
                        f" smaller than its correction {cw}x{ch}"
                    )
                for y in range(ch):
                    rrow, drow = rplane[y], dplane[y]
                    if lossless:
                        # K.4: lossless differential addition is MODULO
                        # 2^16 — exact reconstruction, never clamped
                        for x in range(cw):
                            rrow[x] = (rrow[x] + drow[x]) & 0xFFFF
                    else:
                        for x in range(cw):
                            v = rrow[x] + drow[x]
                            rrow[x] = (
                                0 if v < 0 else maxval if v > maxval else v
                            )
        else:
            raise ValueError(
                f"jpeg hier: unexpected top-level marker 0x{marker:02x}"
            )
    if dhp is None or ref is None or ref_dims is None:
        raise ValueError("jpeg hier: no decodable pyramid (DHP + frames)")
    x, y = dhp[1], dhp[2]
    if ref_dims != (x, y):
        raise ValueError(
            f"jpeg hier: final reconstruction {ref_dims[0]}x{ref_dims[1]} "
            f"!= DHP declared {x}x{y} — truncated pyramid"
        )
    cids = dhp[3]
    comps = [(cid, 0, *ref_samp[cid]) for cid in cids]
    planes = [ref[cid] for cid in cids]
    return x, y, comps, planes, prec


# ---------------------------------------------------------------------------
# fixture encoders
# ---------------------------------------------------------------------------


def encode_jpeg_hierarchical_lossless(
    planes: "list[list[list[int]]]",
    precision: int = 8,
    diff_arith: bool = False,
    restart_interval: int = 0,
    sampling: "list[tuple[int, int]] | None" = None,
) -> bytes:
    """Two-stage LOSSLESS pyramid over 1..4 ARBITRARY sample grids:
    stage 1 is an SOF3 frame of the 2×-decimated image, then EXP(1,1)
    and an SOF7 (or, with ``diff_arith``, SOF15) differential-lossless
    refinement carrying ``(target - expanded_ref) mod 2^16``.  Because
    every stage is lossless the full pyramid reconstructs the input
    BIT-EXACTLY — random images round-trip, the strongest validation
    available for a mode no system library implements.  Requires even
    dims (EXP doubles exactly).  ``sampling`` (r08 s4): per-component
    (h, v) factors — planes at NATURAL dims for the full (w, h) of a
    4*hmax/4*vmax-divisible image (so decimation and the MCU grid stay
    exact); the correction scan codes the padded MCU grid like any
    interleaved lossless scan."""
    nc = len(planes)
    if not 1 <= nc <= 4:
        raise ValueError(f"bad component count {nc}")
    if sampling is None:
        sampling = [(1, 1)] * nc
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        _LL_BITS,
        _LL_VALS,
        _comp_dims,
        encode_jpeg_lossless,
    )

    hmax = max(sh for sh, _sv in sampling)
    vmax = max(sv for _sh, sv in sampling)
    if hmax == vmax == 1:
        h = len(planes[0])
        w = len(planes[0][0])
        if w % 2 or h % 2:
            raise ValueError(
                "hierarchical lossless fixture requires even dims"
            )
    else:
        # derive full dims from the first (max-sampled or not) plane:
        # require divisibility so every grid in the pyramid is exact
        sh0, sv0 = sampling[0]
        w = len(planes[0][0]) * hmax // sh0
        h = len(planes[0]) * vmax // sv0
        if w % (4 * hmax) or h % (4 * vmax):
            raise ValueError(
                "subsampled hierarchical lossless fixture requires "
                "dims divisible by 4*hmax / 4*vmax"
            )
    comps_t = [(ci + 1, 0, sh, sv) for ci, (sh, sv) in enumerate(sampling)]
    _hm, _vm, mcx, mcy, dims = _comp_dims(w, h, comps_t)
    for ci, ((cw, ch, _pw, _ph), pl) in enumerate(zip(dims, planes)):
        if len(pl) != ch or len(pl[0]) != cw:
            raise ValueError(
                f"component {ci}: plane {len(pl[0])}x{len(pl)} != "
                f"natural dims {cw}x{ch}"
            )
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for ci, (sh, sv) in enumerate(sampling):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    # stage 1: SOF3 of the decimated image (strip the standalone
    # encoder's SOI/EOI; its DHT rides inside the frame region)
    stage1 = [
        [[pl[2 * y][2 * x] for x in range(len(pl[0]) // 2)]
         for y in range(len(pl) // 2)]
        for pl in planes
    ]
    out += encode_jpeg_lossless(
        stage1, precision=precision, sampling=sampling,
        size=(w // 2, h // 2),
    )[2:-2]
    # EXP ×2 both directions; the reference the decoder will hold is
    # exactly expand_plane(stage1) per component because stage 1 was
    # lossless
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    refs = [expand_plane(pl, 1, 1) for pl in stage1]

    def _diffs(ci):
        # corrections on the component's PADDED MCU grid (pad cells 0:
        # they are coded, then cropped away by the decoder)
        cw, ch, pw, ph = dims[ci]
        pl, rf = planes[ci], refs[ci]
        d = [[0] * pw for _ in range(ph)]
        for y in range(ch):
            drow, prow, rrow = d[y], pl[y], rf[y]
            for x in range(cw):
                drow[x] = (prow[x] - rrow[x]) & 0xFFFF
        return d

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    diffs = [_diffs(ci) for ci in range(nc)]
    if not diff_arith:
        out += b"\xff\xc7" + struct.pack(
            ">HBHHB", 8 + 3 * nc, precision, h, w, nc
        )
        for ci, (sh, sv) in enumerate(sampling):
            out += bytes([ci + 1, (sh << 4) | sv, 0])
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(_LL_VALS))
        out += bytes([0x00]) + bytes(_LL_BITS[1:17]) + bytes(_LL_VALS)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for ci in range(nc):
            out += bytes([ci + 1, 0x00])
        out += bytes([0, 0, 0])  # Ss=0: differential, no prediction
        codes = _huff_codes(_LL_BITS, _LL_VALS)
        bw = _BitWriter()
        count = 0
        rst = 0
        for m in range(mcx * mcy):
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                bw.flush()
                out += bw.buf
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                bw = _BitWriter()
            count += 1
            my0, mx0 = divmod(m, mcx)
            for ci in range(nc):
                sh, sv = sampling[ci]
                for b in range(sv):
                    drow = diffs[ci][my0 * sv + b]
                    for a in range(sh):
                        dd = drow[mx0 * sh + a]
                        if dd >= 32768 and dd != 32768:
                            dd -= 65536
                        if dd == 32768:
                            ssss = 16
                        else:
                            ssss = (
                                dd.bit_length()
                                if dd >= 0
                                else (-dd).bit_length()
                            )
                        c, ln = codes[ssss]
                        bw.put(c, ln)
                        if 0 < ssss < 16:
                            amp = dd if dd >= 0 else dd + (1 << ssss) - 1
                            bw.put(amp, ssss)
        bw.flush()
        out += bw.buf
        out += b"\xff\xd9"
        return bytes(out)

    from journal_batch_processer_spark.operators.jpeg_arith import (
        ArithEncoder,
        Stats,
    )
    from journal_batch_processer_spark.operators.jpeg_lossless import (
        LA_STAT_SLOTS,
        _LA_TREE_A,
        _LA_TREE_B,
        _la_classify,
        _la_encode_diff,
    )

    out += b"\xff\xcf" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for ci, (sh, sv) in enumerate(sampling):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xcc" + struct.pack(">H", 4) + bytes([0x00, 0x10])
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += bytes([0, 0, 0])
    ll, uu = 0, 1

    def fresh_dp():
        return [
            [[0] * pw for _ in range(ph)] for (_cw, _ch, pw, ph) in dims
        ]

    enc = ArithEncoder()
    stats = Stats(LA_STAT_SLOTS)
    dplanes = fresh_dp()
    count = 0
    rst = 0
    for m in range(mcx * mcy):
        if restart_interval and count and count % restart_interval == 0:
            out += enc.flush()
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            enc = ArithEncoder()
            stats = Stats(LA_STAT_SLOTS)
            dplanes = fresh_dp()
        count += 1
        my0, mx0 = divmod(m, mcx)
        for ci in range(nc):
            sh, sv = sampling[ci]
            dp = dplanes[ci]
            for b in range(sv):
                y = my0 * sv + b
                for a in range(sh):
                    x = mx0 * sh + a
                    dd = diffs[ci][y][x]
                    if dd >= 32768:
                        dd -= 65536
                    if dd == -32768:
                        raise NotImplementedError(
                            "jpeg hier: lossless-arithmetic |diff| >= 32768"
                        )
                    da = dp[y][x - 1] if x > 0 else 0
                    db = dp[y - 1][x] if y > 0 else 0
                    ca = _la_classify(da, ll, uu)
                    cb = _la_classify(db, ll, uu)
                    mag_base = _LA_TREE_B if cb >= 3 else _LA_TREE_A
                    _la_encode_diff(
                        enc, stats, 4 * (5 * ca + cb), mag_base, dd
                    )
                    dp[y][x] = dd
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_hierarchical_solid_gray(
    width: int,
    height: int,
    v: int,
    v_stage1: int | None = None,
    restart_interval: int = 0,
    diff_arith: bool = False,
    diff_progressive: bool = False,
) -> bytes:
    """Two-stage hierarchical pyramid of a solid gray: a half-
    resolution SOF0 first stage at ``v_stage1``, EXP(1,1), and a
    differential refinement carrying the constant correction
    ``v - v_stage1`` — Huffman (SOF5) or, with ``diff_arith``,
    QM-arithmetic (SOF13); with ``diff_progressive`` the refinement is
    a differential PROGRESSIVE frame (SOF6, or SOF14 when combined
    with ``diff_arith``) of three real scans: DC first pass at Al=1
    (PRED=0 per block), DC refinement delivering the low bit, and an
    AC first pass whose all-zero band is per-block EOB. Every decoded
    mean stays closed-form while the stream is a genuine Annex-K
    pyramid. Requires dims ≡ 0 (mod 16) and even grays with a
    difference divisible by 4 (so both stages' DC coefficients
    quantize exactly under Q00=16)."""
    if width % 16 or height % 16:
        raise ValueError("hierarchical fixture requires multiple-of-16 dims")
    if v_stage1 is None:
        v_stage1 = v - 40 if v >= 40 else v + 40
    d = v - v_stage1
    if v % 2 or v_stage1 % 2 or d % 4:
        raise ValueError(
            "hierarchical fixture requires even grays with a stage "
            "difference divisible by 4"
        )
    dc_codes = _huff_codes(*STD_DC_LUMA)
    ac_codes = _huff_codes(*STD_AC_LUMA)

    out = bytearray(b"\xff\xd8")
    # DHP: full-resolution target, one component
    out += b"\xff\xde" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    # shared tables
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += bytes(STD_LUMA_QT[ZIGZAG[i]] for i in range(64))
    bits, vals = STD_DC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([0x00])
    out += bytes(bits[1:17]) + bytes(vals)
    bits, vals = STD_AC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([0x10])
    out += bytes(bits[1:17]) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def put_blocks(n_blocks: int, first_dc: int, repeat_all: bool) -> bytes:
        """DC-only solid blocks. ``repeat_all=False``: sequential
        frame semantics (DC prediction carries — first block codes
        ``first_dc``, the rest diff 0, predictors reset per restart
        segment). ``repeat_all=True``: differential frame semantics
        (PRED=0 — every block codes ``first_dc``)."""
        chunks: list[bytes] = []
        bw = _BitWriter()
        rst = 0
        pending = first_dc
        for m in range(n_blocks):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                chunks.append(bytes(bw.buf))
                chunks.append(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pending = first_dc
            cat = _category(pending)
            code, ln = dc_codes[cat]
            bw.put(code, ln)
            if cat:
                amp = pending if pending >= 0 else pending + (1 << cat) - 1
                bw.put(amp, cat)
            code, ln = ac_codes[0x00]
            bw.put(code, ln)
            if not repeat_all:
                pending = 0
        bw.flush()
        chunks.append(bytes(bw.buf))
        return b"".join(chunks)

    # stage 1: SOF0 at half resolution
    hw, hh = width // 2, height // 2
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, hh, hw, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    dc1 = (8 * (v_stage1 - 128)) // STD_LUMA_QT[0]
    out += put_blocks((hw // 8) * (hh // 8), dc1, repeat_all=False)
    # EXP: expand reference x2 in both directions
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    dcd = (8 * d) // STD_LUMA_QT[0]
    n_blocks = (width // 8) * (height // 8)
    if diff_progressive:
        b1, lowbit = dcd >> 1, dcd & 1
        sof = 0xCE if diff_arith else 0xC6
        out += bytes((0xFF, sof)) + struct.pack(
            ">HBHHB", 11, 8, height, width, 1
        )
        out += bytes([1, 0x11, 0])

        def sos(ss, se, ah, al):
            return (
                b"\xff\xda"
                + struct.pack(">HB", 8, 1)
                + bytes([1, 0x00, ss, se, (ah << 4) | al])
            )

        if not diff_arith:
            # SOF6 — three Huffman scans (tables from the prelude)
            def huff_scan(put_block):
                nonlocal out
                chunks: list[bytes] = []
                bw = _BitWriter()
                rst = 0
                for m in range(n_blocks):
                    if restart_interval and m and (
                        m % restart_interval == 0
                    ):
                        bw.flush()
                        chunks.append(bytes(bw.buf))
                        chunks.append(bytes((0xFF, 0xD0 + rst)))
                        rst = (rst + 1) & 7
                        bw = _BitWriter()
                    put_block(bw)
                bw.flush()
                chunks.append(bytes(bw.buf))
                out += b"".join(chunks)

            def dc_first(bw):
                cat = _category(b1)
                code, ln = dc_codes[cat]
                bw.put(code, ln)
                if cat:
                    amp = b1 if b1 >= 0 else b1 + (1 << cat) - 1
                    bw.put(amp, cat)

            def eob_block(bw):
                code, ln = ac_codes[0x00]
                bw.put(code, ln)

            out += sos(0, 0, 0, 1)  # DC first, Al=1, PRED=0 per block
            huff_scan(dc_first)
            out += sos(0, 0, 1, 0)  # DC refinement: the low bit
            huff_scan(lambda bw: bw.put(lowbit, 1))
            out += sos(1, 63, 0, 0)  # AC first: all-zero band, EOBs
            huff_scan(eob_block)
            out += b"\xff\xd9"
            return bytes(out)
        # SOF14 — the same three scans, QM-coded
        from journal_batch_processer_spark.operators.jpeg_arith import (
            AC_STAT_SLOTS,
            DC_STAT_SLOTS,
            ArithEncoder,
            Stats,
            encode_dc_diff,
        )

        out += b"\xff\xcc" + struct.pack(">H", 6)
        out += bytes([0x00, 0x10, 0x10, 5])

        def arith_scan(fresh_state, put_block):
            nonlocal out
            enc = ArithEncoder()
            state = fresh_state()
            rst = 0
            for m in range(n_blocks):
                if restart_interval and m and m % restart_interval == 0:
                    out += enc.flush()
                    out += bytes((0xFF, 0xD0 + rst))
                    rst = (rst + 1) & 7
                    enc = ArithEncoder()
                    state = fresh_state()
                state = put_block(enc, state)
            out += enc.flush()

        out += sos(0, 0, 0, 1)
        arith_scan(
            lambda: (Stats(DC_STAT_SLOTS), 0),
            lambda enc, st: (
                st[0],
                encode_dc_diff(enc, st[0], st[1], 0, 1, b1),
            ),
        )
        out += sos(0, 0, 1, 0)
        arith_scan(
            lambda: None,
            lambda enc, st: (enc.encode_fixed(lowbit), None)[1],
        )
        out += sos(1, 63, 0, 0)
        arith_scan(
            lambda: Stats(AC_STAT_SLOTS),
            lambda enc, st: (enc.encode(st, 0, 1), st)[1],  # EOB at k=1
        )
        out += b"\xff\xd9"
        return bytes(out)
    if not diff_arith:
        # stage 2: SOF5 differential at full resolution
        out += b"\xff\xc5" + struct.pack(">HBHHB", 11, 8, height, width, 1)
        out += bytes([1, 0x11, 0])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += bytes([1, 0x00, 0, 63, 0])
        out += put_blocks(n_blocks, dcd, repeat_all=True)
        out += b"\xff\xd9"
        return bytes(out)
    # stage 2: SOF13 differential-arithmetic (QM coder, PRED=0)
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        ArithEncoder,
        Stats,
        encode_ac_coefs,
        encode_dc_diff,
    )

    out += b"\xff\xcd" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    enc = ArithEncoder()
    dc_stats = Stats(DC_STAT_SLOTS)
    ac_stats = Stats(AC_STAT_SLOTS)
    ctx = 0
    rst = 0
    zz_zero = [0] * 64
    for m in range(n_blocks):
        if restart_interval and m and m % restart_interval == 0:
            out += enc.flush()
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            enc = ArithEncoder()
            dc_stats = Stats(DC_STAT_SLOTS)
            ac_stats = Stats(AC_STAT_SLOTS)
            ctx = 0
        ctx = encode_dc_diff(enc, dc_stats, ctx, 0, 1, dcd)
        encode_ac_coefs(enc, ac_stats, 5, zz_zero)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_hierarchical_solid_gray_samp(
    width: int,
    height: int,
    v: int,
    v_stage1: int | None = None,
    samps: tuple = ((2, 2), (1, 1), (1, 1)),
    restart_interval: int = 0,
    diff_arith: bool = False,
    diff_progressive: bool = False,
) -> bytes:
    """Three-component hierarchical pyramid of a solid gray with
    ARBITRARY per-component sampling (r08 s3 — including fractional
    ratios): a half-resolution SOF0 first stage at ``v_stage1`` with
    the SAME sampling, EXP(1,1) per component, and a differential
    refinement under that sampling — SOF5 (Huffman), SOF13
    (``diff_arith``: QM-arithmetic), or SOF6 (``diff_progressive``:
    three progressive scans — interleaved DC first at Al=1 with PRED=0
    per data unit, DC refinement, and per-component AC passes over
    each component's own grid). Y carries the constant correction
    ``v - v_stage1``; chroma corrections are zero, so Cb = Cr = 128
    throughout and every decoded mean is exactly ``v``."""
    if diff_arith and diff_progressive:
        raise ValueError(
            "fixture: SOF14 with sampling not offered (the QM and "
            "progressive-geometry layers are each covered separately)"
        )
    hs = [hh for hh, _v in samps]
    vs_ = [vv for _h, vv in samps]
    if len(samps) != 3 or not all(1 <= x <= 4 for x in hs + vs_):
        raise ValueError("samps must be three (h, v) pairs in 1..4")
    hmax, vmax = max(hs), max(vs_)
    if width % (16 * hmax) or height % (16 * vmax):
        raise ValueError(
            "hierarchical samp fixture requires dims MCU-aligned at "
            "BOTH pyramid levels (multiples of 16*hmax / 16*vmax)"
        )
    if v_stage1 is None:
        v_stage1 = v - 40 if v >= 40 else v + 40
    d = v - v_stage1
    if v % 2 or v_stage1 % 2 or d % 4:
        raise ValueError(
            "hierarchical fixture requires even grays with a stage "
            "difference divisible by 4"
        )
    dc_y = _huff_codes(*STD_DC_LUMA)
    ac_y = _huff_codes(*STD_AC_LUMA)
    dc_c = _huff_codes(*STD_DC_CHROMA)
    ac_c = _huff_codes(*STD_AC_CHROMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for ci, (hh, vv) in enumerate(samps):
        out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
    for tid, qt in ((0, STD_LUMA_QT), (1, STD_CHROMA_QT)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(qt[ZIGZAG[i]] for i in range(64))
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
    ri = restart_interval

    def put_dc_eob(bw, table_dc, table_ac, diff):
        cat = _category(diff)
        c, ln = table_dc[cat]
        bw.put(c, ln)
        if cat:
            amp = diff if diff >= 0 else diff + (1 << cat) - 1
            bw.put(amp, cat)
        c, ln = table_ac[0x00]
        bw.put(c, ln)

    def seq_scan_body(n_mcus, y_dc, pred_carry):
        """Interleaved DCT scan over n_mcus: Y blocks carry ``y_dc``
        (with per-segment DC prediction when ``pred_carry`` —
        sequential frames; without — PRED=0 differential frames),
        chroma blocks zero."""
        chunks = []
        bw = _BitWriter()
        rst = 0
        prev = 0
        for m in range(n_mcus):
            if ri and m and m % ri == 0:
                bw.flush()
                chunks.append(bytes(bw.buf))
                chunks.append(bytes((0xFF, 0xD0 + rst)))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                prev = 0
            for ci, (hh, vv) in enumerate(samps):
                for _u in range(hh * vv):
                    if ci == 0:
                        diff = y_dc - prev if pred_carry else y_dc
                        if pred_carry:
                            prev = y_dc
                        put_dc_eob(bw, dc_y, ac_y, diff)
                    else:
                        put_dc_eob(bw, dc_c, ac_c, 0)
        bw.flush()
        chunks.append(bytes(bw.buf))
        return b"".join(chunks)

    def sos_interleaved():
        body = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # stage 1: SOF0 at half resolution, same sampling
    hw, hh_ = width // 2, height // 2
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, hh_, hw, 3)
    for ci, (hh, vv) in enumerate(samps):
        out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
    out += sos_interleaved()
    dc1 = (8 * (v_stage1 - 128)) // STD_LUMA_QT[0]
    n_mcus1 = (hw // (8 * hmax)) * (hh_ // (8 * vmax))
    out += seq_scan_body(n_mcus1, dc1, pred_carry=True)
    # EXP: expand every component x2 in both directions
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    dcd = (8 * d) // STD_LUMA_QT[0]
    mcux2, mcuy2 = width // (8 * hmax), height // (8 * vmax)
    n_mcus2 = mcux2 * mcuy2

    if diff_progressive:
        # SOF6: DC first (Al=1, PRED=0 per unit), DC refine, then one
        # AC pass per component over its OWN block grid
        b1, lowbit = (dcd >> 1), dcd & 1
        out += b"\xff\xc6" + struct.pack(">HBHHB", 17, 8, height, width, 3)
        for ci, (hh, vv) in enumerate(samps):
            out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])

        def sos(comp_specs, ss, se, ah, al):
            body = bytes([len(comp_specs)])
            for cid, tbl in comp_specs:
                body += bytes([cid, tbl])
            body += bytes([ss, se, (ah << 4) | al])
            return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

        def seg_bounds(n):
            if not ri:
                return [n]
            return [min(ri, n - s) for s in range(0, n, ri)]

        # scan 1: interleaved DC first pass — PRED=0, every Y unit b1
        out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
        rst = 0
        for si, seg_n in enumerate(seg_bounds(n_mcus2)):
            if si:
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            bw = _BitWriter()
            for _m in range(seg_n):
                for ci, (hh, vv) in enumerate(samps):
                    for _u in range(hh * vv):
                        diff = b1 if ci == 0 else 0
                        cat = _category(diff)
                        tb = dc_y if ci == 0 else dc_c
                        c, ln = tb[cat]
                        bw.put(c, ln)
                        if cat:
                            amp = diff if diff >= 0 else diff + (1 << cat) - 1
                            bw.put(amp, cat)
            bw.flush()
            out += bw.buf
        # scan 2: interleaved DC refinement — raw low bits
        out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
        rst = 0
        for si, seg_n in enumerate(seg_bounds(n_mcus2)):
            if si:
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
            bw = _BitWriter()
            for _m in range(seg_n):
                for ci, (hh, vv) in enumerate(samps):
                    for _u in range(hh * vv):
                        bw.put(lowbit if ci == 0 else 0, 1)
            bw.flush()
            out += bw.buf
        # scans 3-5: per-component AC first pass, per-block EOB
        for ci, cid in enumerate((1, 2, 3)):
            hh, vv = samps[ci]
            tbl = 0x00 if ci == 0 else 0x01  # Ta: AC table id
            out += sos([(cid, tbl)], 1, 63, 0, 0)
            n_units = (mcux2 * hh) * (mcuy2 * vv)
            ac_tab = ac_y if ci == 0 else ac_c
            rst = 0
            for si, seg_n in enumerate(seg_bounds(n_units)):
                if si:
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                bw = _BitWriter()
                for _u in range(seg_n):
                    c, ln = ac_tab[0x00]
                    bw.put(c, ln)
                bw.flush()
                out += bw.buf
        out += b"\xff\xd9"
        return bytes(out)

    if not diff_arith:
        # stage 2: SOF5 differential, same sampling
        out += b"\xff\xc5" + struct.pack(">HBHHB", 17, 8, height, width, 3)
        for ci, (hh, vv) in enumerate(samps):
            out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
        out += sos_interleaved()
        out += seq_scan_body(n_mcus2, dcd, pred_carry=False)
        out += b"\xff\xd9"
        return bytes(out)

    # stage 2: SOF13 differential-arithmetic, same sampling
    from journal_batch_processer_spark.operators.jpeg_arith import (
        AC_STAT_SLOTS,
        DC_STAT_SLOTS,
        ArithEncoder,
        Stats,
        encode_ac_coefs,
        encode_dc_diff,
    )

    out += b"\xff\xcd" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for ci, (hh, vv) in enumerate(samps):
        out += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
    out += b"\xff\xcc" + struct.pack(">H", 10)
    out += bytes([0x00, 0x10, 0x01, 0x10, 0x10, 5, 0x11, 5])
    out += sos_interleaved()
    zz_zero = [0] * 64

    def fresh():
        return (
            {0: Stats(DC_STAT_SLOTS), 1: Stats(DC_STAT_SLOTS)},
            {0: Stats(AC_STAT_SLOTS), 1: Stats(AC_STAT_SLOTS)},
            {1: 0, 2: 0, 3: 0},
        )

    enc = ArithEncoder()
    dc_stats, ac_stats, ctx = fresh()
    rst = 0
    for m in range(n_mcus2):
        if ri and m and m % ri == 0:
            out += enc.flush()
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            enc = ArithEncoder()
            dc_stats, ac_stats, ctx = fresh()
        for ci, (hh, vv) in enumerate(samps):
            cid = ci + 1
            tb = 0 if ci == 0 else 1
            val = dcd if ci == 0 else 0
            for _u in range(hh * vv):
                ctx[cid] = encode_dc_diff(
                    enc, dc_stats[tb], ctx[cid], 0, 1, val
                )
                encode_ac_coefs(enc, ac_stats[tb], 5, zz_zero)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
