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
