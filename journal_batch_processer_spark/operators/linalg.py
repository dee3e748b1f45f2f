"""Distributed linear algebra over embedding columns.

The gramian X^T X is the workhorse primitive behind PCA/whitening of
embedding spaces, OPQ rotation training for PQ codebooks, and linear-
probe covariance — at 100 TB it is THE canonical "big n, small d"
reduction: each partition reduces its rows to one d×d partial locally
(a numpy matmul over an Arrow batch), and the shuffle moves only
``num_partitions × d(d+1)/2`` cells, never a row of data. This is the
same shape Spark MLlib's ``RowMatrix.computeGramian`` uses, expressed
over the DataFrame/Arrow stack.

Exactness: the gramian is taken over the int8-QUANTIZED embeddings
(same ``floor(x/max|x|·127 + 0.5)`` map as the ``embed_quantize``
key — float32 widens to float64 exactly and the divide/multiply/floor
chain is the same IEEE sequence in numpy, Spark, and DuckDB), so every
product and sum is INTEGER arithmetic: order-independent, overflow-safe
(|q|≤127 → |q_i·q_j|≤16129; 2^63 accommodates ~5.7e14 rows), and
bit-identical to the SQL oracle no matter how partitions split. A
float64 gramian would be the same plan but its sum would be partition-
order-dependent — the int8 form is what the PQ/IVF codebook trainers
consume anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantized_gramian(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle (i, j, gram) of Q^T Q over the int8-quantized
    embedding matrix; 0-based dims, d(d+1)/2 output rows."""

    def part(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        G = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            maxabs = np.abs(vs).max(axis=1, keepdims=True)
            # same IEEE sequence as embed_quantize: /, *, +, floor
            q = np.floor(vs / maxabs * 127.0 + 0.5).astype(np.int64)
            g = q.T @ q
            G = g if G is None else G + g
        if G is None:
            return
        iu = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {
                "i": iu[0].astype("int32"),
                "j": iu[1].astype("int32"),
                "partial": G[iu],
            }
        )

    return (
        embs.select(vec_col)
        .mapInPandas(part, "i int, j int, partial long")
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )
