"""S7 HTTP sink driven against a real local HTTP service (stdlib server).

The reference posts Gson chart-request documents to an external renderer
(``VisualizationService.java:38-43``); these tests stand up an in-process
``ThreadingHTTPServer`` and drive both the driver-side wrapper and the
executor-side ``mapInPandas`` sink end-to-end, including 5xx retry and
error-as-data capture."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from covid19_spark.serving.http_sink import post_chart_documents, post_document


class _ChartHandler(BaseHTTPRequestHandler):
    received: list = []
    fail_first_n = 0
    lock = threading.Lock()

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _ChartHandler.lock:
            if _ChartHandler.fail_first_n > 0:
                _ChartHandler.fail_first_n -= 1
                self.send_response(503)
                self.end_headers()
                return
            _ChartHandler.received.append(body)
        if self.path == "/reject":
            self.send_response(400)
            self.end_headers()
            return
        out = b"PNGBYTES:" + str(len(body)).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def chart_server():
    _ChartHandler.received = []
    _ChartHandler.fail_first_n = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ChartHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_post_document_roundtrip(chart_server):
    resp = post_document(b'{"chart": {}}', chart_server + "/chart")
    assert resp == b"PNGBYTES:13"
    assert _ChartHandler.received == [b'{"chart": {}}']


def test_post_document_retries_5xx(chart_server):
    _ChartHandler.fail_first_n = 2
    resp = post_document(b"x", chart_server + "/chart", backoff=0.01)
    assert resp == b"PNGBYTES:1"  # succeeded on the 3rd attempt


def test_post_document_no_retry_on_4xx(chart_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        post_document(b"bad", chart_server + "/reject", backoff=0.01)
    assert len(_ChartHandler.received) == 1  # exactly one attempt


def test_post_chart_documents_distributed(spark, chart_server):
    docs = [(f"c{i}", json.dumps({"chart": {"type": "line", "i": i}})) for i in range(8)]
    df = spark.createDataFrame(docs, "chart_id string, chart_request string").repartition(4)
    out = post_chart_documents(df, chart_server + "/chart").collect()
    assert sorted(r.id for r in out) == sorted(d[0] for d in docs)
    assert all(r.status == 200 and r.error is None for r in out)
    assert all(r.response_bytes > 0 for r in out)
    got = sorted(json.loads(b)["chart"]["i"] for b in _ChartHandler.received)
    assert got == list(range(8))


def test_post_chart_documents_errors_as_data(spark, chart_server):
    df = spark.createDataFrame(
        [("ok", "{}"), ("bad", "{}")], "chart_id string, chart_request string"
    )
    from pyspark.sql import functions as F

    # route the 'bad' row to the 400 endpoint by id via two posts
    ok = post_chart_documents(df.filter(F.col("chart_id") == "ok"), chart_server + "/chart")
    bad = post_chart_documents(df.filter(F.col("chart_id") == "bad"), chart_server + "/reject")
    rows = {r.id: r for r in ok.union(bad).collect()}
    assert rows["ok"].status == 200
    assert rows["bad"].status == 400 and rows["bad"].error is not None


def test_stream_chart_requests(spark, chart_server, tmp_path):
    from covid19_spark.serving.http_sink import stream_chart_requests

    src = str(tmp_path / "src")
    docs = [(f"s{i}", json.dumps({"chart": {"i": i}})) for i in range(3)]
    spark.createDataFrame(docs, "chart_id string, chart_request string").write.parquet(src)
    stream = spark.readStream.schema("chart_id string, chart_request string").parquet(src)
    q = stream_chart_requests(stream, chart_server + "/chart", str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(json.loads(b)["chart"]["i"] for b in _ChartHandler.received) == [0, 1, 2]
