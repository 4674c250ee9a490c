"""HttpJsonTransport against a real in-process HTTP server, including
the full Spark path: request plan → mapInPandas fetch → quarantine.

Covers the reference API's failure taxonomy
(load_sales_data.py:93-100): 200+ret_code=0000 (success), 200 with a
bad ret_code (semantic failure → quarantine, no retry), retryable 5xx
(backoff then succeed), non-retryable 4xx (fail fast → quarantine),
and timeout (retries exhausted → quarantine).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_job_spark.sinks import split_quarantine
from etl_job_spark.sources.http_transport import HttpJsonTransport
from etl_job_spark.sources.json_api import build_request_plan, fetch_json

HITS: dict[str, int] = {}
LOCK = threading.Lock()


class _PosApi(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n))
        sp = body["sp_code"]
        with LOCK:
            HITS[sp] = HITS.get(sp, 0) + 1
            hits = HITS[sp]
        if sp.startswith("S_FLAKY") and hits == 1:
            self.send_response(503)
            self.end_headers()
            return
        if sp == "S_404":
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"no such store")
            return
        if sp == "S_SLOW":
            time.sleep(1.0)
        doc = (
            {"ret_code": "9999", "message": "denied"}
            if sp == "S_RETCODE"
            else {"ret_code": "0000", "data": [{"sp": sp, "amt": 10}]}
        )
        payload = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def api_url():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _PosApi)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/api"
    server.shutdown()


def _transport(api_url, **kw):
    kw.setdefault("backoff_base", 0.02)
    kw.setdefault("backoff_cap", 0.1)
    return HttpJsonTransport(api_url, **kw)


def test_success_and_session_reuse(api_url):
    t = _transport(api_url)
    doc = json.loads(t("S_OK", "20240101"))
    assert doc["ret_code"] == "0000"
    doc2 = json.loads(t("S_OK", "20240102"))
    assert doc2["data"][0]["sp"] == "S_OK"
    assert t._session is not None  # pooled, not per-request


def test_retryable_status_backs_off_then_succeeds(api_url):
    t = _transport(api_url)
    doc = json.loads(t("S_FLAKY_A", "20240101"))
    assert doc["ret_code"] == "0000"
    assert HITS["S_FLAKY_A"] == 2  # one 503, one success


def test_non_retryable_fails_fast(api_url):
    t = _transport(api_url)
    with pytest.raises(RuntimeError, match="HTTP 404"):
        t("S_404", "20240101")
    assert HITS["S_404"] == 1  # no retry storm on a deterministic 4xx


def test_timeout_exhausts_attempts(api_url):
    t = _transport(api_url, timeout=0.2, max_attempts=2)
    with pytest.raises(RuntimeError, match="gave up after 2 attempts"):
        t("S_SLOW", "20240101")
    assert HITS["S_SLOW"] == 2


def test_pickle_drops_live_session(api_url):
    import pickle

    t = _transport(api_url)
    t("S_OK", "20240101")
    assert t._session is not None
    clone = pickle.loads(pickle.dumps(t))
    assert clone._session is None
    assert json.loads(clone("S_OK", "20240102"))["ret_code"] == "0000"


def test_end_to_end_fetch_quarantine(spark, api_url):
    """The reference's E1 loop as one Spark job against a live API:
    good stores land rows, bad stores land in the dead-letter table."""
    stores = spark.createDataFrame(
        [("S_OK",), ("S_RETCODE",), ("S_FLAKY_B",), ("S_404",)], ["sp_code"]
    )
    calendar = spark.createDataFrame([("20240101",)], ["sale_date"])
    plan = build_request_plan(stores, calendar)
    responses = fetch_json(plan, _transport(api_url), num_partitions=2).cache()
    good, bad = split_quarantine(responses)
    good_rows = {r.fetch_sp_code: r.payload for r in good.collect()}
    bad_rows = {r.fetch_sp_code: r.error for r in bad.collect()}
    assert set(good_rows) == {"S_OK", "S_FLAKY_B"}
    assert json.loads(good_rows["S_FLAKY_B"]) == [{"sp": "S_FLAKY_B", "amt": 10}]
    assert bad_rows["S_RETCODE"].startswith("ret_code=9999")
    assert "HTTP 404" in bad_rows["S_404"]
    responses.unpersist()
