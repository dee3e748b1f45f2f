"""Multimodal (binary) columns: opaque payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so the bytes never round-trip through Python
row objects. The decode itself is pluggable: the Spark plumbing
(schema, batching, partitioning, 1→many output shape) is identical
for every decoder, and the per-payload byte work is behind the
:class:`Decoder` interface — ``StubDecoder`` (deterministic fake, the
default in this environment, which has no imaging libs) or
``MediaDecoder`` (the PIL/libav integration point). Flipping
``DECODE_STUB`` swaps ONLY the decode body; nothing about the Spark
plan changes (contract-tested in tests/test_operators.py).

Ingest path for real media at scale: ``spark.read.format("binaryFile")``
over an object store, partitioned by content hash prefix.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_STUB = True  # flip when a real decoder (PIL/av) is installed


class Decoder:
    """Per-payload decode contract shared by every backend.

    Implementations must be import-safe on executors (no module-level
    heavy deps — import inside methods) and deterministic for a given
    payload, since Spark task retries re-run them.
    """

    def features(self, payload: bytes) -> dict:
        """payload → {"n_bytes": int, "width": int, "height": int,
        "mean_byte": float} (the decode_features row, minus the id)."""
        raise NotImplementedError

    def resize(self, payload: bytes, target_w: int, target_h: int) -> bytes:
        """payload → resized payload of exactly target_w*target_h bytes."""
        raise NotImplementedError

    def frames(
        self, payload: bytes, frame_bytes: int, every_n: int
    ) -> list[tuple[int, bytes]]:
        """payload → [(frame_idx, frame_bytes)] — every ``every_n``-th
        complete frame; trailing partial frames dropped."""
        raise NotImplementedError


class StubDecoder(Decoder):
    """Deterministic byte-buffer fake: exercises the real batch shape,
    schema, and partition behavior without an imaging library."""

    def features(self, payload: bytes) -> dict:
        n = len(payload)
        return {
            "n_bytes": n,
            "width": n % 640,
            "height": n % 480,
            "mean_byte": (sum(payload) / n) if n else 0.0,
        }

    def resize(self, payload: bytes, target_w: int, target_h: int) -> bytes:
        size = target_w * target_h
        if not payload:
            return bytes(size)
        reps = -(-size // len(payload))  # ceil: tile then crop
        return (bytes(payload) * reps)[:size]

    def frames(
        self, payload: bytes, frame_bytes: int, every_n: int
    ) -> list[tuple[int, bytes]]:
        b = bytes(payload)
        n_frames = len(b) // frame_bytes
        return [
            (i, b[i * frame_bytes:(i + 1) * frame_bytes])
            for i in range(0, n_frames, every_n)
        ]


def decode_ppm_bytes(data: bytes) -> dict:
    """REAL image decode: binary PPM (P6) — the netpbm format — parsed
    from raw bytes with no imaging library. Handles '#' comments and
    arbitrary whitespace in the header per the netpbm spec; 8-bit
    maxval only (the common case). Returns width/height and per-channel
    means computed from the actual pixel bytes.

    Raises ValueError on malformed input — a decode stage must fail
    loudly on corrupt payloads (route to an error side at scale),
    never emit fabricated features.
    """
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos:pos + 1]
        if c == b"#":  # comment runs to end of line
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    # exactly ONE whitespace byte separates maxval from the raster, per
    # spec; a CRLF-emitting writer would mis-offset the raster by one
    # byte and silently corrupt every channel mean — fail loud instead.
    # A lone '\r' separator with '\n' next is CRLF in practice (a
    # raster genuinely starting with byte 0x0A after a bare-CR header
    # is indistinguishable, so the spec-violating writer loses).
    if not data[pos:pos + 1].isspace():
        raise ValueError("PPM header not terminated by a whitespace byte")
    if data[pos:pos + 2] == b"\r\n":
        raise ValueError(
            "PPM header terminated by CRLF (spec requires a single "
            "whitespace byte); raster offset would be ambiguous"
        )
    pos += 1
    need = w * h * 3
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    if px.size < need:
        raise ValueError("truncated PPM pixel data")
    rgb = px.reshape(-1, 3).mean(axis=0) if need else (0.0, 0.0, 0.0)
    return {
        "width": w,
        "height": h,
        "mean_r": float(rgb[0]),
        "mean_g": float(rgb[1]),
        "mean_b": float(rgb[2]),
    }


def decode_wav_bytes(data: bytes) -> dict:
    """REAL audio decode: RIFF/WAV PCM via the stdlib ``wave`` module
    (no external audio library). Returns container facts plus the RMS
    amplitude of the actual 16-bit samples."""
    import io
    import math
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as wf:
        n_channels = wf.getnchannels()
        sample_rate = wf.getframerate()
        n_frames = wf.getnframes()
        width = wf.getsampwidth()
        raw = wf.readframes(n_frames)
    if width != 2:
        raise ValueError(f"only PCM16 supported, sampwidth={width}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    rms = math.sqrt(float((samples * samples).mean())) if samples.size else 0.0
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate if sample_rate else 0,
        "rms": rms,
    }


class MediaDecoder(Decoder):
    """Real-media integration point for formats that NEED external
    libs (JPEG/PNG via PIL, MP4 via av). Formats decodable with the
    stdlib are already real: see decode_ppm_bytes / decode_wav_bytes.

    Not wired in this environment (libs absent) — each method raises
    until the imports below are satisfied, so selecting it fails loudly
    at first use, never silently falls back to fake output.
    """

    def _require(self):  # pragma: no cover - env without media libs
        raise NotImplementedError(
            "real decoder not wired: install PIL (images) / av (video) "
            "and implement MediaDecoder bodies"
        )

    def features(self, payload: bytes) -> dict:  # pragma: no cover
        self._require()

    def resize(self, payload, target_w, target_h):  # pragma: no cover
        self._require()

    def frames(self, payload, frame_bytes, every_n):  # pragma: no cover
        self._require()


def get_decoder() -> Decoder:
    """Backend selector — the ONLY place DECODE_STUB is consulted."""
    return StubDecoder() if DECODE_STUB else MediaDecoder()


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Payload + metadata struct from a text column (stand-in for real
    media bytes; schema identical to the binaryFile ingest shape)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.md5(F.col(text_col)).alias("content_md5"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode stage: payload → fixed-width feature row.

    The per-payload work is ``get_decoder().features`` — PIL with a
    real backend, a deterministic fake with the stub; the mapInPandas
    batch shape and schema are backend-independent.
    """
    schema = f"{id_col} long, n_bytes int, width int, height int, mean_byte double"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = get_decoder()
        cols = ["n_bytes", "width", "height", "mean_byte"]
        for pdf in batches:
            feats = [dec.features(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, id_col, pdf[id_col].values)
            out["n_bytes"] = out["n_bytes"].astype("int32")
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return df.mapInPandas(decode, schema)


def resize_payload(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched resize stage: payload → payload of exactly
    ``target_w * target_h`` bytes plus refreshed metadata.

    Output schema matches the ingest shape so resize stages compose
    with decode/attach arbitrarily, whatever the backend.
    """
    schema = (
        f"{id_col} long, payload binary, "
        "meta struct<n_bytes:int, mime:string, content_md5:string>"
    )
    size = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        dec = get_decoder()
        for pdf in batches:
            out = pdf["payload"].map(
                lambda b: dec.resize(bytes(b), target_w, target_h)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": out,
                    "meta": [
                        {
                            "n_bytes": size,
                            "mime": "image/raw",
                            "content_md5": hashlib.md5(b).hexdigest(),
                        }
                        for b in out
                    ],
                }
            )

    return df.mapInPandas(resize, schema)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling: one input 'video' payload → N sampled frame
    rows. Exercises the 1→many mapInPandas shape a real frame sampler
    needs — output row count is payload-dependent, so the stage builds
    its own output batches rather than mirroring input length.
    """
    schema = f"{id_col} long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = get_decoder()
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                for f_idx, frame in dec.frames(bytes(b), frame_bytes, every_n):
                    ids.append(i)
                    idxs.append(f_idx)
                    frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema)
