"""Multimodal (binary) columns: opaque payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so the bytes never round-trip through Python
row objects. The decode itself is STUBBED here (no imaging libs in
this environment) with a deterministic fake behind the same signature
— the Spark-side plumbing (schema, batching, partitioning) is real
and tested.

Ingest path for real media at scale: ``spark.read.format("binaryFile")``
over an object store, partitioned by content hash prefix.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_STUB = True  # flip when a real decoder (PIL/av) is installed


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
    """Arrow-batched 'decode' stage: payload → fixed-width feature row.

    With a real decoder this is where PIL/libav runs per batch; the
    stub derives deterministic pseudo-features from the bytes so the
    batch shape, schema, and partition behavior are exercised for real.
    """
    schema = f"{id_col} long, n_bytes int, width int, height int, mean_byte double"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not DECODE_STUB:  # pragma: no cover
                raise NotImplementedError("real decoder not wired in this env")
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # deterministic fake: "dimensions" and mean byte value
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "width": (n_bytes % 640).astype("int32"),
                    "height": (n_bytes % 480).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ),
                }
            )

    return df.mapInPandas(decode, schema)


def resize_payload(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched 'resize' stage: payload → payload of exactly
    ``target_w * target_h`` bytes plus refreshed metadata.

    The stub resize is a deterministic crop-or-tile of the byte
    buffer (a real implementation swaps in PIL's ``resize`` on the
    decoded image and re-encodes); output schema matches the ingest
    shape so resize stages compose with decode/attach arbitrarily.
    """
    size = target_w * target_h
    schema = (
        f"{id_col} long, payload binary, "
        "meta struct<n_bytes:int, mime:string, content_md5:string>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not DECODE_STUB:  # pragma: no cover
                raise NotImplementedError("real decoder not wired in this env")

            def fit(b: bytes) -> bytes:
                if not b:
                    return bytes(size)
                reps = -(-size // len(b))  # ceil
                return (bytes(b) * reps)[:size]

            out = pdf["payload"].map(fit)
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
    rows (every ``every_n``-th fixed-width chunk). Exercises the
    1→many mapInPandas shape a real frame sampler needs — output row
    count is payload-dependent, so the stage must build its own
    output batches rather than mirroring input length. Trailing
    partial frames are dropped (decoder semantics: incomplete frame).
    """
    schema = f"{id_col} long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not DECODE_STUB:  # pragma: no cover
                raise NotImplementedError("real decoder not wired in this env")
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                b = bytes(b)
                n_frames = len(b) // frame_bytes
                for f_idx in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(f_idx)
                    frames.append(b[f_idx * frame_bytes:(f_idx + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema)
