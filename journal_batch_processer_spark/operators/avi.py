"""Minimal MJPEG-in-AVI container codec (pure stdlib).

The VIDEO leg of the multimodal surface: a real container format
(RIFF/AVI per the public Microsoft AVI RIFF spec) whose frames are
real entropy-coded JPEGs decoded by operators/jpeg.py — so
`media_video_decode` walks an actual video file end to end: RIFF
chunk traversal (word alignment, LIST nesting), stream headers
(avih/strh/strf), '00dc' frame chunks, per-frame JPEG decode.

Scope — honest and loud: single MJPG video stream, no audio, no
OpenDML extensions; anything else (unknown fourcc, compressed-stream
mismatch, truncated chunks) raises ValueError naming the problem.
The encoder exists for fixtures (same contract as the JPEG/GIF/PNG
fixture encoders): frames are our own solid-gray JPEGs, so every
decoded feature stays doc_id arithmetic for the DuckDB oracle while
the payload is a genuine AVI.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks word-align
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    width: int, height: int, frames: list[bytes], us_per_frame: int = 40000
) -> bytes:
    """Assemble an AVI around pre-encoded JPEG frame payloads."""
    n = len(frames)
    if n == 0:
        raise ValueError("avi: need at least one frame")
    avih = struct.pack(
        "<14I",
        us_per_frame,      # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        0,                 # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0,                 # dwFlags
        0, 0,              # wPriority, wLanguage
        0,                 # dwInitialFrames
        1,                 # dwScale
        1000000 // us_per_frame if us_per_frame else 25,  # dwRate
        0, n, 0,           # dwStart, dwLength, dwSuggestedBufferSize
        0xFFFFFFFF, 0,     # dwQuality, dwSampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to the movi list type)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) over a chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError(f"avi: chunk {fourcc!r} overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size % 2)  # word alignment


def decode_avi_mjpeg(data: bytes) -> dict:
    """Parse the container and decode EVERY frame's JPEG; returns
    header metadata + per-frame feature dicts."""
    from journal_batch_processer_spark.operators.jpeg import (
        decode_jpeg_baseline,
    )

    if data[:4] != b"RIFF":
        raise ValueError("avi: missing RIFF magic")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if data[8:12] != b"AVI ":
        raise ValueError("avi: not an AVI RIFF form")
    end = min(len(data), 8 + riff_size)

    avih = None
    strh_fcc = None
    frames = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[body : body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2 == b"avih":
                    avih = struct.unpack("<14I", data[b2 : b2 + 56])
                elif f2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for f3, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if f3 == b"strh":
                            typ = data[b3 : b3 + 4]
                            strh_fcc = data[b3 + 4 : b3 + 8]
                            if typ != b"vids":
                                raise ValueError(
                                    f"avi: unsupported stream type {typ!r}"
                                )
                            if strh_fcc != b"MJPG":
                                raise ValueError(
                                    f"avi: unsupported codec {strh_fcc!r}"
                                )
        elif list_type == b"movi":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2 == b"00dc":
                    frames.append(data[b2 : b2 + s2])
    if avih is None:
        raise ValueError("avi: missing avih header")
    if strh_fcc is None:
        raise ValueError("avi: missing video stream header")
    us_per_frame, n_declared, w, h = avih[0], avih[4], avih[8], avih[9]
    if len(frames) != n_declared:
        raise ValueError(
            f"avi: frame count mismatch: header {n_declared}, "
            f"movi {len(frames)}"
        )
    decoded = []
    for i, payload in enumerate(frames):
        feat = decode_jpeg_baseline(payload)
        if (feat["width"], feat["height"]) != (w, h):
            raise ValueError(
                f"avi: frame {i} dims {feat['width']}x{feat['height']} "
                f"!= container {w}x{h}"
            )
        feat["frame_idx"] = i
        decoded.append(feat)
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "us_per_frame": int(us_per_frame),
        "frames": decoded,
    }


def avi_frame_payloads(data: bytes):
    """Container-only parse: returns ``(us_per_frame, width, height,
    [jpeg_frame_bytes])`` without decoding the frames — for feature
    extractors that decode each frame themselves (per-frame
    perceptual hashing)."""
    if data[:4] != b"RIFF":
        raise ValueError("avi: missing RIFF magic")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if data[8:12] != b"AVI ":
        raise ValueError("avi: not an AVI RIFF form")
    end = min(len(data), 8 + riff_size)
    avih = None
    frames: list[bytes] = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[body : body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2 == b"avih":
                    avih = struct.unpack("<14I", data[b2 : b2 + 56])
        elif list_type == b"movi":
            for f2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if f2 == b"00dc":
                    frames.append(data[b2 : b2 + s2])
    if avih is None:
        raise ValueError("avi: missing avih header")
    if len(frames) != avih[4]:
        raise ValueError(
            f"avi: frame count mismatch: header {avih[4]}, found {len(frames)}"
        )
    return avih[0], avih[8], avih[9], frames
