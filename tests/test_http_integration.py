"""Real-HTTP integration: the production REST paths against a local
stdlib http.server stub.

The reference's core loop is a REST round-trip per item — GET the item
record by barcode, PUT the merged XML back (BatchUpdate.py:425-568).
Round 1 exercised only the simulated lookup-join path; these tests
drive the actual network code (sources/rest.py mapInPandas GET,
sinks/rest_push.py foreachPartition PUT) end-to-end from Spark
executors, with injected 503s proving the retry/backoff path, and
assert the fetch outcome routes rows exactly like the simulated
`enrich_fetch` join the pipeline uses.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from journal_batch_processer_spark.sinks.rest_push import (
    http_push_foreach_partition,
)
from journal_batch_processer_spark.sources.rest import (
    FETCH_ERR_PREFIX,
    enrich_fetch,
    http_fetch_map_in_pandas,
)

ITEMS = {
    "B001": "<item><barcode>B001</barcode><loc>MAIN</loc></item>",
    "B002": "<item><barcode>B002</barcode><loc>ANNEX</loc></item>",
    "B503": "<item><barcode>B503</barcode><loc>FLAKY</loc></item>",
}


class _StubHandler(BaseHTTPRequestHandler):
    """GET /items?item_barcode=X → 200 XML | 404; PUT /items/X → 200.

    Barcodes/paths containing '503' fail with HTTP 503 on their FIRST
    attempt and succeed on retry (thread-safe once-only injection).
    """

    def _send(self, code: int, body: str) -> None:
        payload = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _inject_503(self, key: str) -> bool:
        srv = self.server
        with srv.lock:
            if "503" in key and key not in srv.tripped:
                srv.tripped.add(key)
                return True
        return False

    def do_GET(self) -> None:  # noqa: N802 - http.server API
        bc = parse_qs(urlparse(self.path).query).get("item_barcode", [""])[0]
        with self.server.lock:
            self.server.gets.append(bc)
        if self._inject_503("GET:" + bc):
            self._send(503, "<e>busy</e>")
        elif bc in ITEMS:
            self._send(200, ITEMS[bc])
        else:
            self._send(404, "<e>not found</e>")

    def do_PUT(self) -> None:  # noqa: N802 - http.server API
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        path = urlparse(self.path).path
        with self.server.lock:
            self.server.puts.append((path, body.decode()))
        if self._inject_503("PUT:" + path):
            self._send(503, "<e>busy</e>")
        else:
            self._send(200, "<ok/>")

    def log_message(self, *args) -> None:  # silence request logging
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    srv.lock = threading.Lock()
    srv.tripped, srv.gets, srv.puts = set(), [], []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetch_real_get_with_retry_and_routing(spark, stub_server):
    base = f"http://127.0.0.1:{stub_server.server_address[1]}/items"
    df = spark.createDataFrame(
        [("'B001", "n1"), ("B002", None), ("B503", "n3"), ("MISSING", "n4")],
        "Barcode string, Notes string",
    ).repartition(2)

    fetched = http_fetch_map_in_pandas(
        df, base, "test-key",
        "Barcode string, Notes string, http_status long, body string",
    )
    rows = {r["Barcode"].lstrip("'"): r for r in fetched.collect()}

    assert rows["B001"]["http_status"] == 200
    assert rows["B001"]["body"] == ITEMS["B001"]  # quote guard stripped
    assert rows["B002"]["http_status"] == 200
    assert rows["MISSING"]["http_status"] == 404
    # injected 503 retried to success — server saw ≥2 GETs for B503
    assert rows["B503"]["http_status"] == 200
    assert rows["B503"]["body"] == ITEMS["B503"]
    with stub_server.lock:
        assert stub_server.gets.count("B503") >= 2

    # Routing parity: the HTTP statuses, pushed through the same
    # note/route rule, must split rows exactly like the simulated
    # lookup-join path (enrich_fetch) fed an equivalent remote table.
    real_noted = fetched.withColumn(
        "Notes",
        F.when(
            F.col("http_status") != 200,
            F.concat(F.lit(FETCH_ERR_PREFIX), F.col("http_status").cast("string")),
        ).otherwise(F.coalesce(F.col("Notes"), F.lit(""))),
    )
    remote = spark.createDataFrame(
        [("B001", 200), ("B002", 200), ("B503", 200)],
        "barcode string, http_status long",
    )
    sim_noted = enrich_fetch(df, remote)
    real = {r["Barcode"]: r["Notes"] for r in real_noted.collect()}
    sim = {r["Barcode"]: r["Notes"] for r in sim_noted.collect()}
    assert real == sim
    assert real["MISSING"] == FETCH_ERR_PREFIX + "404"


def test_http_push_real_put_with_retry(spark, stub_server):
    base = f"http://127.0.0.1:{stub_server.server_address[1]}/items"
    body = {bc: f"<item><barcode>{bc}</barcode><updated/></item>"
            for bc in ["B001", "B002", "B503"]}
    df = spark.createDataFrame(
        [(f"{base}/{bc}", xml) for bc, xml in body.items()],
        "update_url string, body_xml string",
    ).repartition(2)

    http_push_foreach_partition(df, apikey="test-key")

    with stub_server.lock:
        puts = list(stub_server.puts)
    by_path: dict[str, list[str]] = {}
    for path, b in puts:
        by_path.setdefault(path.rsplit("/", 1)[-1], []).append(b)
    # every row PUT with its exact XML body; the 503 target retried
    for bc, xml in body.items():
        assert by_path[bc] and all(b == xml for b in by_path[bc])
    assert len(by_path["B503"]) >= 2
    assert len(by_path["B001"]) == 1 and len(by_path["B002"]) == 1
