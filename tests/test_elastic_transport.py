"""ES REST transport end-to-end against a canned in-process HTTP stub.

Exercises the last seam of the ES source that the DSL tests can't: the
actual request/response loop (``es_count``, ``es_aggregate`` with composite
pagination) over a real HTTP socket — no cluster, no client library. The
stub replays the public Elasticsearch response shapes for ``_count`` and
``_search`` (composite aggs paginated via ``after_key``), mirroring the
server-side aggregation path of the reference backend (reference
src/elastic_surv/dataset.py:228-271).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from elastic_surv_spark.sources.elastic import (
    EqualTo,
    es_aggregate,
    es_count,
    filters_to_es_query,
)

PAGE1 = {
    "aggregations": {
        "groups": {
            "after_key": {"lang": "en"},
            "buckets": [
                {
                    "key": {"lang": "de"},
                    "doc_count": 2,
                    "n": {"value": 2},
                    "avg_len": {"value": 120.5},
                },
                {
                    "key": {"lang": "en"},
                    "doc_count": 5,
                    "n": {"value": 5},
                    "avg_len": {"value": 80.0},
                },
            ],
        }
    }
}
PAGE2 = {
    "aggregations": {
        "groups": {
            "after_key": {"lang": "fr"},
            "buckets": [
                {
                    "key": {"lang": "fr"},
                    "doc_count": 1,
                    "n": {"value": 1},
                    "avg_len": {"value": 33.0},
                }
            ],
        }
    }
}
PAGE3 = {"aggregations": {"groups": {"buckets": []}}}
UNGROUPED = {"aggregations": {"n": {"value": 8}, "avg_len": {"value": 86.25}}}


class _Stub(BaseHTTPRequestHandler):
    requests: list[tuple[str, dict]] = []

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"] or 0)) or b"{}")
        _Stub.requests.append((self.path, body))
        if self.path.endswith("/_count"):
            resp = {"count": 42 if body.get("query") else 100}
        elif "composite" in json.dumps(body):
            after = body["aggs"]["groups"]["composite"].get("after")
            resp = PAGE1 if after is None else PAGE2 if after == {"lang": "en"} else PAGE3
        else:
            resp = UNGROUPED
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def es_url():
    _Stub.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


METRICS = {"n": ("count", "doc_id"), "avg_len": ("mean", "n_chars")}


def test_count_plain_and_filtered(es_url):
    assert es_count(es_url, "docs") == 100
    assert es_count(es_url, "docs", filters_to_es_query(EqualTo("lang", "en"))) == 42
    paths = [p for p, _ in _Stub.requests]
    assert paths == ["/docs/_count", "/docs/_count"]
    # the filtered call ships the translated term query in the body
    assert _Stub.requests[1][1] == {"query": {"term": {"lang": "en"}}}


def test_ungrouped_aggregate_single_request(es_url):
    rows = es_aggregate(es_url, "docs", METRICS)
    assert rows == [{"n": 8, "avg_len": 86.25}]
    assert len(_Stub.requests) == 1
    path, body = _Stub.requests[0]
    assert path == "/docs/_search"
    assert body["size"] == 0 and "composite" not in json.dumps(body)


def test_grouped_aggregate_paginates_composite(es_url):
    rows = es_aggregate(
        es_url,
        "docs",
        METRICS,
        group_by=["lang"],
        query=filters_to_es_query(EqualTo("lang", "en")),
        page_size=2,
    )
    assert rows == [
        {"lang": "de", "n": 2, "avg_len": 120.5},
        {"lang": "en", "n": 5, "avg_len": 80.0},
        {"lang": "fr", "n": 1, "avg_len": 33.0},
    ]
    # three requests: page1 (no after), page2 (after=en), page3 (empty stop)
    afters = [
        b["aggs"]["groups"]["composite"].get("after") for _, b in _Stub.requests
    ]
    assert afters == [None, {"lang": "en"}, {"lang": "fr"}]
    # every page re-ships the filter and stays size:0
    assert all(b["size"] == 0 and "query" in b for _, b in _Stub.requests)
