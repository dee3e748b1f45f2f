"""REST enrichment source (Alma item fetch) — two interchangeable paths.

The reference issues one synchronous HTTP GET per row to fetch the
authoritative item record by barcode (BatchUpdate.py:427-431,474-488)
— structurally network-bound at ~1/(2·RTT) items/sec.

Engine paths:
- **Lookup-join path (default / test):** the remote store is a table
  (``items_remote``, FIXTURES.md A3); enrichment is a plain left equi
  join on the stripped barcode. At scale this is a shuffle hash join
  (or broadcast if the remote slice is small) — millions of times the
  reference's throughput, and the shape you'd actually deploy when a
  bulk export of the remote system exists.
- **HTTP path (production, off by default):** ``mapInPandas`` with one
  pooled ``requests.Session`` per partition, batched fetches, retry
  with backoff. Partition count bounds concurrent connections.

Fetch misses overwrite Notes (``=``, not append — faithful to :482)
with ``Err: Problem fetching item information. Code N``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from journal_batch_processer_spark.functions.guards import strip_guard_quote

FETCH_ERR_PREFIX = "Err: Problem fetching item information. Code "


def enrich_fetch(
    df: DataFrame,
    items_remote: DataFrame,
    barcode_col: str = "Barcode",
    notes_col: str = "Notes",
    status_col: str = "http_status",
) -> DataFrame:
    """Left join on stripped barcode; non-200/missing → fetch-error note.

    The join key is computed once (``__bc``); unmatched rows get the
    reference's overwritten (not appended) error note with code 404,
    non-200 rows with their status.
    """
    left = df.withColumn("__bc", strip_guard_quote(F.col(barcode_col)))
    joined = left.join(items_remote, left["__bc"] == items_remote["barcode"], "left")
    # Drop the remote-side key: Spark's default case-insensitive
    # resolution would otherwise make `Barcode` ambiguous vs `barcode`.
    joined = joined.drop(items_remote["barcode"])
    status = F.coalesce(F.col(status_col), F.lit(404))
    new_notes = F.when(
        status != 200, F.concat(F.lit(FETCH_ERR_PREFIX), status.cast("string"))
    ).otherwise(F.coalesce(F.col(notes_col), F.lit("")))
    return joined.withColumn(notes_col, new_notes).drop("__bc")


def http_fetch_map_in_pandas(
    df: DataFrame,
    base_url: str,
    apikey: str,
    result_schema: str,
    barcode_col: str = "Barcode",
    max_retries: int = 3,
) -> DataFrame:
    """Production HTTP path: Arrow-batched per-partition fetching.

    Network access is intentionally NOT exercised in tests; the
    function exists so the deployment path is real code, not a TODO.
    """

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        try:
            import requests
        except ImportError as exc:  # pragma: no cover - env without requests
            raise NotImplementedError("requests not available in this env") from exc

        session = requests.Session()  # one pooled session per partition
        for pdf in batches:
            statuses, bodies = [], []
            for bc in pdf[barcode_col].astype(str).str.lstrip("'"):
                code, text = 0, ""
                for attempt in range(max_retries):
                    try:
                        r = session.get(
                            base_url,
                            params={"apikey": apikey, "item_barcode": bc},
                            timeout=30,
                        )
                        code, text = r.status_code, r.text
                        if code < 500:
                            break
                    except requests.RequestException:
                        code = 0
                    _time.sleep(min(2**attempt, 8))
                statuses.append(code)
                bodies.append(text)
            out = pdf.copy()
            out["http_status"] = statuses
            out["body"] = bodies
            yield out

    return df.mapInPandas(fetch_batches, result_schema)
