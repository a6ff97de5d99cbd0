"""ES REST transport end-to-end against a canned in-process HTTP stub.

Exercises the last seam of the ES source that the DSL tests can't: the
actual request/response loop (``es_count``, ``es_aggregate`` with composite
pagination, and the jar-free distributed document scan ``scan_es`` —
sliced scroll, one Spark partition per slice) over a real HTTP socket —
no cluster, no client library. The stub replays the public Elasticsearch
response shapes for ``_count``, ``_search`` (composite aggs paginated via
``after_key``) and ``_search?scroll`` (sliced scroll paginated via
``_scroll_id``, DELETE cleanup), mirroring the server-side aggregation
and document-pull paths of the reference backend (reference
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
    bulk_write_es,
    es_count,
    filters_to_es_query,
    scan_es,
    scan_slice_pages,
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


# Six-document corpus for the sliced-scroll scan tests. Slice i of max m
# owns docs where doc_id % m == i (the stub's deterministic stand-in for
# ES's server-side slice partitioning: disjoint and exhaustive). doc 5
# omits n_chars to exercise missing-field → NULL.
SCROLL_DOCS = [
    {"doc_id": 0, "lang": "en", "n_chars": 100, "event": 1},
    {"doc_id": 1, "lang": "de", "n_chars": 50, "event": 0},
    {"doc_id": 2, "lang": "en", "n_chars": 75, "event": 1},
    {"doc_id": 3, "lang": "fr", "n_chars": 20, "event": 1},
    {"doc_id": 4, "lang": "en", "n_chars": 60, "event": 0},
    {"doc_id": 5, "lang": "de", "event": 1},
]
_SCROLL_PAGE = 2  # docs per scroll page served by the stub


def _surv_docs() -> list[dict]:
    """A GBSG2-shaped corpus served as the ``surv`` index — the reference's
    headline scenario (train a survival model on rows living in ES)."""
    from tests.fixtures import gbsg2_like

    pdf = gbsg2_like(160, seed=7).reset_index(names="doc_id")
    return json.loads(pdf.to_json(orient="records"))  # plain-python types


# corpus key → (index name, documents, scroll page size). "f" is the
# flaky twin of "docs": same corpus, but every scroll OPEN serves one
# transient 503 and every CONTINUATION one 429 before succeeding — the
# exact retryable set for each request kind (a continuation 5xx may have
# advanced the server-side cursor, so only a 429 is safe to retry there).
# "g" is the poisoned twin: its continuation 503s, which must be FATAL.
_CORPORA = {
    "s": ("docs", SCROLL_DOCS, _SCROLL_PAGE),
    "t": ("surv", _surv_docs(), 50),
    "f": ("flaky", SCROLL_DOCS, _SCROLL_PAGE),
    "g": ("flaky5xx", SCROLL_DOCS, _SCROLL_PAGE),
    # "relocated": a shard relocation / context expiry invalidates the
    # scroll mid-scan — the first continuation 404s with
    # search_context_missing_exception (one-shot, so a fresh task attempt
    # succeeds). Must be FATAL to the attempt: the context is gone, pages
    # are unrecoverable in place, and only a task-level rerun (a fresh
    # scroll from offset 0) is exactly-once.
    "h": ("relocated", SCROLL_DOCS, _SCROLL_PAGE),
}


def _scroll_response(
    prefix: str, docs: list[dict], page_size: int,
    slice_id: int, max_slices: int, offset: int,
) -> dict:
    mine = [d for d in docs if d["doc_id"] % max_slices == slice_id]
    page = mine[offset : offset + page_size]
    return {
        "_scroll_id": f"{prefix}{slice_id}.{max_slices}.{offset + len(page)}",
        "hits": {"hits": [{"_id": str(d["doc_id"]), "_source": d} for d in page]},
    }


class _Stub(BaseHTTPRequestHandler):
    requests: list[tuple[str, dict]] = []
    deletes: list[dict] = []
    bulk_batches: list[list[dict]] = []
    #: index → {_id (or auto key): doc} — dict-by-id gives real upsert
    #: semantics, so idempotent double-writes can assert exactly-once docs
    indexed: dict[str, dict[str, dict]] = {}
    #: per-_id 429s already served for the "backpressure" index
    rejected_once: set = set()
    #: scroll keys / open keys whose one transient 503 was already served
    failed_once: set = set()
    #: count of transient 5xx replies served (assert retries happened)
    transient_served: int = 0
    #: explicitly-created indexes (PUT /{index}) → their mappings body
    created: dict[str, dict] = {}
    lock = threading.Lock()

    #: canned mapping for the "docs" corpus (GET /docs/_mapping)
    DOCS_MAPPING = {
        "properties": {
            "doc_id": {"type": "long"},
            "lang": {"type": "keyword"},
            "n_chars": {"type": "long"},
            "event": {"type": "long"},
        }
    }

    def do_GET(self):  # noqa: N802 — mapping fetch + index-exists probe
        if self.path.endswith("/_mapping"):
            index = self.path.split("/")[1]
            if index == "both":  # an alias resolving to two backing indices
                self._reply({
                    "docs-1": {"mappings": _Stub.DOCS_MAPPING},
                    "docs-2": {"mappings": _Stub.DOCS_MAPPING},
                })
            elif index == "bare":  # exists, but nothing mapped yet
                self._reply({index: {"mappings": {}}})
            elif index in _Stub.created:
                self._reply({index: {"mappings": _Stub.created[index]}})
            elif index == "docs":
                self._reply({index: {"mappings": _Stub.DOCS_MAPPING}})
            else:
                self._reply({"error": {"type": "index_not_found_exception"}}, 404)
            return
        index = self.path.strip("/")
        if index in _Stub.created or index in _Stub.indexed or index == "docs":
            self._reply({index: {}})
        else:
            self._reply({"error": {"type": "index_not_found_exception"}}, 404)

    def do_PUT(self):  # noqa: N802 — index creation with mappings
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"] or 0)) or b"{}")
        index = self.path.strip("/")
        with _Stub.lock:
            _Stub.created[index] = body.get("mappings", {})
        self._reply({"acknowledged": True, "index": index})

    def _stored(self, index: str) -> list[dict]:
        return list(_Stub.indexed[index].values())

    def _corpus(self, index: str) -> tuple[str, list[dict], int]:
        """(scroll-id prefix, docs, page size) for an index name."""
        if index in _Stub.indexed:  # a bulk-written index, scanned back
            return f"w:{index}:", self._stored(index), _SCROLL_PAGE
        key = {"surv": "t", "flaky": "f", "flaky5xx": "g", "relocated": "h"}.get(
            index, "s"
        )
        _, docs, psize = _CORPORA[key]
        return key, docs, psize

    def do_POST(self):  # noqa: N802
        raw = self.rfile.read(int(self.headers["Content-Length"] or 0))
        if self.path == "/_bulk":
            lines = [json.loads(ln) for ln in raw.decode().splitlines() if ln]
            items = []
            with _Stub.lock:
                _Stub.bulk_batches.append(lines)
                for a, doc in zip(lines[::2], lines[1::2]):
                    index = a["index"]["_index"]
                    _id = a["index"].get("_id")
                    if index == "reject":  # permanent mapping failure
                        items.append({"index": {
                            "status": 400, "_id": _id,
                            "error": {"type": "mapper_parsing_exception"},
                        }})
                        continue
                    # "backpressure": odd ids get ONE 429 each, then accept
                    if (
                        index == "backpressure"
                        and _id is not None
                        and int(_id) % 2 == 1
                        and _id not in _Stub.rejected_once
                    ):
                        _Stub.rejected_once.add(_id)
                        items.append({"index": {
                            "status": 429, "_id": _id,
                            "retry_after": 0.01,  # per-item recovery hint
                            "error": {"type": "es_rejected_execution_exception"},
                        }})
                        continue
                    store = _Stub.indexed.setdefault(index, {})
                    key = _id if _id is not None else f"_auto{len(store)}"
                    store[key] = doc
                    items.append({"index": {"status": 201, "_id": _id}})
            errors = any(it["index"]["status"] >= 300 for it in items)
            self._reply({"errors": errors, "items": items})
            return
        body = json.loads(raw or b"{}")
        _Stub.requests.append((self.path, body))
        if self.path.endswith("/_count"):
            resp = {"count": 42 if body.get("query") else 100}
        elif "/_pit?" in self.path:  # open a point-in-time on an index
            resp = {"id": f"p:{self.path.split('/')[1]}"}
        elif "_search?scroll=" in self.path:
            sl = body.get("slice", {"id": 0, "max": 1})
            index = self.path.split("/")[1]
            if index == "flaky" and self._fail_once(f"open:{sl['id']}"):
                return  # one transient 503 on the scroll OPEN request
            prefix, docs, psize = self._corpus(index)
            resp = _scroll_response(prefix, docs, psize, sl["id"], sl["max"], 0)
            if index == "nocursor":  # hits but no cursor: must raise
                resp.pop("_scroll_id")
        elif self.path == "/_search/scroll":
            sid = body["scroll_id"]
            if sid.startswith("w:"):
                _, index, rest = sid.split(":", 2)
                prefix, docs, psize = (
                    f"w:{index}:", self._stored(index), _SCROLL_PAGE,
                )
            else:
                prefix, rest = sid[0], sid[1:]
                _, docs, psize = _CORPORA[prefix]
            # "flaky" continuations each serve ONE 429 first (the only
            # status a scroll continuation may retry); "flaky5xx"
            # continuations 503 — which the client must treat as fatal
            if prefix == "f" and self._fail_once(sid, status=429):
                return
            if prefix == "g" and self._fail_once(sid, status=503):
                return
            # ONE relocation event for the whole index (not per-sid like the
            # flaky twins): the first continuation anywhere 404s; the task
            # rerun's fresh scroll then pages cleanly end to end
            if prefix == "h" and self._fail_once(
                "relocated-ctx", status=404,
                etype="search_context_missing_exception",
            ):
                return
            s, mx, off = rest.split(".")
            resp = _scroll_response(prefix, docs, psize, int(s), int(mx), int(off))
        elif self.path == "/_search" and "pit" in body:
            # "pitfail": the PIT's node fails over mid-pagination — the
            # first RESUMED page (search_after present) 404s with
            # search_context_missing_exception (one-shot, so a fresh task
            # attempt that opens a new PIT succeeds)
            if body["pit"]["id"].endswith(":pitfail") and "search_after" in body:
                if self._fail_once(
                    f"pit:{body['pit']['id']}",
                    status=404,
                    etype="search_context_missing_exception",
                ):
                    return
            resp = self._pit_page(body)
        elif "composite" in json.dumps(body):
            after = body["aggs"]["groups"]["composite"].get("after")
            resp = PAGE1 if after is None else PAGE2 if after == {"lang": "en"} else PAGE3
        else:
            resp = UNGROUPED
        self._reply(resp)

    def _fail_once(self, key: str, status: int = 503,
                   etype: str = "unavailable") -> bool:
        """Serve one ``status`` for ``key``; True if this request failed."""
        with _Stub.lock:
            if key in _Stub.failed_once:
                return False
            _Stub.failed_once.add(key)
            _Stub.transient_served += 1
        self._reply({"error": {"type": etype}}, status=status)
        return True

    def _pit_page(self, body: dict) -> dict:
        """PIT + search_after page: docs sorted by doc_id, sliced by
        ``doc_id % max``, resumed strictly after the ``search_after``
        sort value — the stateless stand-in for ES's PIT pagination."""
        pit_id = body["pit"]["id"]
        index = pit_id.split(":", 1)[1]
        if index in _Stub.indexed:
            docs = self._stored(index)
        else:
            _, docs, _ = _CORPORA["t" if index == "surv" else "s"]
        sl = body.get("slice", {"id": 0, "max": 1})
        mine = sorted(
            (d for d in docs if d["doc_id"] % sl["max"] == sl["id"]),
            key=lambda d: d["doc_id"],
        )
        after = body.get("search_after")
        if after is not None:
            mine = [d for d in mine if d["doc_id"] > after[0]]
        page = mine[: body["size"]]
        return {
            "pit_id": pit_id,
            "hits": {"hits": [
                {"_id": str(d["doc_id"]), "_source": d, "sort": [d["doc_id"]]}
                for d in page
            ]},
        }

    def do_DELETE(self):  # noqa: N802 — scroll/PIT cleanup + index drop
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"] or 0)) or b"{}")
        if self.path not in ("/_pit", "/_search/scroll"):  # DELETE /{index}
            index = self.path.strip("/")
            with _Stub.lock:
                _Stub.created.pop(index, None)
                _Stub.indexed.pop(index, None)
            self._reply({"acknowledged": True})
            return
        _Stub.deletes.append(body)
        self._reply({"succeeded": True})

    def _reply(self, resp: dict, status: int = 200) -> None:
        payload = json.dumps(resp).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def es_url():
    _Stub.requests = []
    _Stub.deletes = []
    _Stub.bulk_batches = []
    _Stub.indexed = {}
    _Stub.rejected_once = set()
    _Stub.failed_once = set()
    _Stub.transient_served = 0
    _Stub.created = {}
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


def test_scan_slice_pages_pulls_one_slice(es_url):
    """Executor-side loop alone: slice 1 of 2 pages through its documents
    (ids 1,3 then 5), ships the pushdowns on the open request, and deletes
    its scroll context when exhausted."""
    pages = list(
        scan_slice_pages(
            es_url,
            "docs",
            slice_id=1,
            max_slices=2,
            query=filters_to_es_query(EqualTo("lang", "en")),
            fields=["doc_id", "lang"],
            page_size=2,
        )
    )
    assert [[d["doc_id"] for d in p] for p in pages] == [[1, 3], [5]]
    open_body = _Stub.requests[0][1]
    assert _Stub.requests[0][0] == "/docs/_search?scroll=2m"
    assert open_body["slice"] == {"id": 1, "max": 2}
    assert open_body["query"] == {"term": {"lang": "en"}}  # server-side filter
    assert open_body["_source"] == ["doc_id", "lang"]  # server-side pruning
    assert open_body["sort"] == ["_doc"]  # no-scoring fast path
    assert _Stub.deletes == [{"scroll_id": "s1.2.3"}]


def test_scan_es_distributed_sliced_scroll(spark, es_url):
    """Full jar-free scan: 2 Spark partitions × sliced scroll reassemble the
    corpus exactly once, missing fields surface as NULL, and each slice
    opened its own disjoint scroll."""
    df = scan_es(
        spark,
        es_url,
        "docs",
        schema="doc_id long, lang string, n_chars long",
        slices=2,
        page_size=2,
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r["doc_id"]: r for r in df.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]  # disjoint + exhaustive
    assert rows[5]["n_chars"] is None and rows[5]["lang"] == "de"
    assert rows[0]["n_chars"] == 100
    opened = sorted(
        b["slice"]["id"] for p, b in _Stub.requests if "_search?scroll=" in p
    )
    assert opened == [0, 1]
    assert len(_Stub.deletes) == 2  # both scroll contexts cleaned up


def test_scan_es_more_slices_than_docs(spark, es_url):
    """Over-slicing (8 slices, 6 docs) leaves some slices empty — they must
    produce empty partitions, not errors, and the union stays exact."""
    df = scan_es(spark, es_url, "docs", schema="doc_id long", slices=8)
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2, 3, 4, 5]
    assert df.rdd.getNumPartitions() == 8


def test_scan_es_single_slice_omits_slice_clause(spark, es_url):
    df = scan_es(spark, es_url, "docs", schema="doc_id long, lang string", slices=1)
    assert df.count() == 6
    open_bodies = [b for p, b in _Stub.requests if "_search?scroll=" in p]
    assert len(open_bodies) == 1 and "slice" not in open_bodies[0]


def test_survframe_from_es(spark, es_url):
    """ESDataset parity: a survival frame whose rows live in an ES index,
    read through the jar-free sliced scan with role-column pruning pushed
    to the source, prefix-splittable via an explicit order column."""
    from elastic_surv_spark.frame import SurvFrame

    frame = SurvFrame.from_es(
        spark,
        es_url,
        "docs",
        schema="doc_id long, lang string, n_chars long, event long",
        time_column="n_chars",
        event_column="event",
        slices=2,
        order_column="doc_id",
        page_size=2,
    )
    assert frame.features == ["lang"]  # roles + order excluded, sorted
    rows = {r["doc_id"]: r for r in frame.df.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    assert rows[5]["n_chars"] is None  # missing field → NULL time
    # column pruning reached the source: every scroll open ships _source
    open_bodies = [b for p, b in _Stub.requests if "_search?scroll=" in p]
    assert all(
        sorted(b["_source"]) == ["doc_id", "event", "lang", "n_chars"]
        for b in open_bodies
    )
    train, test = frame.split()  # exact prefix semantics via doc_id order
    assert train.count() == 5 and test.count() == 1
    assert test.collect()[0]["doc_id"] == 5


def test_cox_trains_on_es_index(spark, es_url):
    """The reference's headline flow end-to-end without a cluster: an
    ESDataset-equivalent survival frame over a GBSG2-shaped ES index
    (sliced scroll, one-hot featurization of string columns downstream)
    feeding CoxPH train + score — ≡ reference README.md:65-96 (ESDataset +
    CoxPH over an uploaded index)."""
    import numpy as np

    from elastic_surv_spark.frame import SurvFrame
    from elastic_surv_spark.models.cox_ph import CoxPHModel
    from elastic_surv_spark.models.data import SurvDataset

    frame = SurvFrame.from_es(
        spark,
        es_url,
        "surv",
        schema=(
            "doc_id long, time long, cens long, age long, estrec long, "
            "horTh string, menostat string, pnodes long, progrec long, "
            "tgrade string, tsize long"
        ),
        time_column="time",
        event_column="cens",
        slices=2,
        order_column="doc_id",
        page_size=50,
    )
    ds = SurvDataset(frame)
    model = CoxPHModel(in_features=ds.in_features, epochs=5, patience=5, seed=42)
    model.train(ds)
    scores = model.score(ds)
    assert set(scores) == {"c_index", "brier_score"}
    assert np.isfinite(scores["c_index"]) and np.isfinite(scores["brier_score"])
    assert 0.0 <= scores["c_index"] <= 1.0


@pytest.mark.parametrize("family", ["deephit", "logistic_hazard"])
def test_discrete_time_models_train_on_es_index(spark, es_url, family):
    """The discrete-time families close the last reference-flow × ES-source
    combination: a GBSG2-shaped index → sliced-scroll SurvFrame →
    order-free hash_split (the 100 TB split path; the label transform's
    duration grid is fit on the train side inside train()) → DeepHit /
    LogisticHazard train + score — ≡ reference README.md:65-96 with the
    non-Cox model families."""
    import numpy as np

    from elastic_surv_spark.frame import SurvFrame
    from elastic_surv_spark.models import DeepHitModel, LogisticHazardModel
    from elastic_surv_spark.models.data import SurvDataset

    frame = SurvFrame.from_es(
        spark,
        es_url,
        "surv",
        schema=(
            "doc_id long, time long, cens long, age long, estrec long, "
            "horTh string, menostat string, pnodes long, progrec long, "
            "tgrade string, tsize long"
        ),
        time_column="time",
        event_column="cens",
        slices=2,
        page_size=50,
    )
    ds = SurvDataset(frame, use_hash_split=True)
    cls = DeepHitModel if family == "deephit" else LogisticHazardModel
    model = cls(in_features=ds.in_features, epochs=5, patience=5, seed=42)
    model.train(ds)
    assert model.cuts is not None and len(model.cuts) > 1  # labtrans fitted
    scores = model.score(ds)
    assert set(scores) == {"c_index", "brier_score"}
    assert np.isfinite(scores["c_index"]) and np.isfinite(scores["brier_score"])
    assert 0.0 <= scores["c_index"] <= 1.0


def test_model_serde_round_trips_through_es(spark, es_url):
    """Train once, serve from anywhere — demonstrated end to end: a trained
    model's JSON doc lands in the stub index via upload_frame, a fresh
    model object is rebuilt from the scanned-back document, and its
    predictions are BIT-identical to the in-memory model's (the serde.py
    docstring's claim, now exercised through the ES hop)."""
    import numpy as np

    from elastic_surv_spark.frame import SurvFrame
    from elastic_surv_spark.models import (
        CoxPHModel,
        model_from_json,
        model_to_json,
    )
    from elastic_surv_spark.models.data import SurvDataset
    from elastic_surv_spark.sources.elastic import upload_frame
    from tests.fixtures import gbsg2_like

    frame = SurvFrame.from_pandas(spark, gbsg2_like(120, seed=3), "time", "cens")
    ds = SurvDataset(frame)
    model = CoxPHModel(
        in_features=ds.in_features, epochs=3, patience=3, seed=7
    ).train(ds)
    payload = model_to_json(model)

    # the doc keys on doc_id so the stub's slice partitioning can serve it
    doc = spark.createDataFrame([(0, payload)], "doc_id long, payload string")
    assert upload_frame(doc, es_url, "models", id_col="doc_id") == 1

    back = scan_es(
        spark, es_url, "models",
        schema="doc_id long, payload string", slices=1,
    ).collect()
    loaded = model_from_json(back[0]["payload"])
    assert np.array_equal(loaded.net.get_state(), model.net.get_state())
    assert np.array_equal(loaded.baseline_cumhaz, model.baseline_cumhaz)

    pdf = ds.test_df.toPandas().reset_index(drop=True)
    pdf["rid"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf)

    def surv(m):
        rows = (
            m.predict(sdf, id_cols=["rid"], features=ds.features)
            .orderBy("rid").collect()
        )
        return np.array([r["surv"] for r in rows], dtype=float)

    assert np.array_equal(surv(model), surv(loaded))


def test_bulk_write_es_round_trip(spark, es_url):
    """Write twin of the scan: per-partition NDJSON bulk streams, id
    routing, NULL-field dropping, batch bounding, and an exact ack total."""
    src = spark.createDataFrame(
        [(i, f"d{i}", float(i) if i != 3 else None) for i in range(7)],
        "doc_id long, name string, score double",
    ).repartition(2)
    n = bulk_write_es(src, es_url, "docs_out", id_col="doc_id", batch_docs=2)
    assert n == 7
    flat = [ln for batch in _Stub.bulk_batches for ln in batch]
    actions, docs = flat[::2], flat[1::2]
    assert len(docs) == 7
    assert all(a["index"]["_index"] == "docs_out" for a in actions)
    assert sorted(a["index"]["_id"] for a in actions) == [str(i) for i in range(7)]
    by_id = {d["doc_id"]: d for d in docs}
    assert "score" not in by_id[3]  # NULL dropped from the document
    assert by_id[2]["score"] == 2.0 and by_id[2]["name"] == "d2"
    # batch_docs=2 bounds every request to ≤2 documents (≤4 NDJSON lines)
    assert all(len(b) <= 4 for b in _Stub.bulk_batches)
    # idempotent re-write: same ids, same count
    assert bulk_write_es(src, es_url, "docs_out", id_col="doc_id") == 7


def test_bulk_write_then_scan_round_trip(spark, es_url):
    """Write → read round-trip entirely through the jar-free paths: a frame
    bulk-written to the stub comes back row-identical (modulo NULL-field
    dropping) through a 2-slice distributed scan of the same index."""
    src = spark.createDataFrame(
        [(i, f"d{i}", float(i * 10)) for i in range(9)],
        "doc_id long, name string, score double",
    ).repartition(3)
    assert bulk_write_es(src, es_url, "rt_index", id_col="doc_id") == 9
    back = scan_es(
        spark,
        es_url,
        "rt_index",
        schema="doc_id long, name string, score double",
        slices=2,
        page_size=2,
    )
    assert sorted(back.collect(), key=lambda r: r["doc_id"]) == sorted(
        src.collect(), key=lambda r: r["doc_id"]
    )


def test_bulk_write_es_raises_on_rejected_documents(spark, es_url):
    """A non-retryable item error (400 mapping failure) must fail the write
    job immediately — silent partial ingestion is the one failure mode a
    writer can't have, and retrying a mapping error would never succeed."""
    src = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, name string")
    with pytest.raises(Exception, match="bulk indexing reported errors"):
        bulk_write_es(src, es_url, "reject", id_col="doc_id")
    assert "reject" not in _Stub.indexed  # nothing half-ingested


def test_bulk_write_retries_per_item_429(spark, es_url):
    """Per-item back-pressure: the stub 429-rejects every odd ``_id`` once.
    The writer must re-send ONLY the rejected documents (evens are not
    re-indexed), ack the exact total, and leave every doc stored exactly
    once — the routine partial-rejection storm of a busy real cluster."""
    src = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, name string"
    ).repartition(2)
    assert bulk_write_es(src, es_url, "backpressure", id_col="doc_id", batch_docs=4) == 8
    assert sorted(_Stub.indexed["backpressure"]) == [str(i) for i in range(8)]
    # every odd id was sent exactly twice (reject + retry), evens once
    sent = [a["index"]["_id"] for b in _Stub.bulk_batches for a in b[::2]]
    from collections import Counter

    counts = Counter(sent)
    assert all(counts[str(i)] == (2 if i % 2 else 1) for i in range(8))


def test_scan_retries_transient_scroll_failures(spark, es_url):
    """The "flaky" index 503s each scroll OPEN once (idempotent — a retry
    opens a fresh context) and 429s each CONTINUATION once (rejected
    before processing, cursor provably unmoved); the transport's backoff
    must absorb both and still yield the complete corpus exactly once."""
    df = scan_es(
        spark, es_url, "flaky",
        schema="doc_id long, lang string, n_chars long",
        slices=2, page_size=2,
    )
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2, 3, 4, 5]
    assert _Stub.transient_served >= 2  # retries actually exercised


def test_scroll_continuation_5xx_is_fatal(es_url):
    """A 5xx on a scroll CONTINUATION must raise, not retry: the server
    may have processed the request and advanced the cursor before the
    response was lost, so a retry would return the NEXT page and silently
    skip one page of documents (the reason official ES clients never
    retry scroll continuations). The "flaky5xx" stub 503s the first
    continuation — the first page must arrive, then the slice must die."""
    import urllib.error

    pages = scan_slice_pages(es_url, "flaky5xx", 0, 1, page_size=2)
    assert [d["doc_id"] for d in next(pages)] == [0, 1]  # open + page 1 fine
    with pytest.raises(urllib.error.HTTPError):
        next(pages)
    # exactly one 503 served and zero continuation retries burned on it
    assert _Stub.transient_served == 1


def test_scroll_context_missing_is_fatal_and_task_rerun_recovers(es_url):
    """Shard relocation / scroll-context expiry mid-scan (the live-cluster
    behavior the stub can simulate): a continuation 404s with
    search_context_missing_exception. The attempt must DIE — the context
    is gone, no in-place retry can recover the lost pages — and recovery
    is Spark's task retry: a fresh attempt opens a fresh scroll from
    offset 0 and yields the complete slice exactly once."""
    import urllib.error

    pages = scan_slice_pages(es_url, "relocated", 0, 1, page_size=2)
    assert [d["doc_id"] for d in next(pages)] == [0, 1]  # page 1 fine
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        next(pages)
    assert exc_info.value.code == 404

    # the task-level rerun (fresh attempt, fresh scroll) reads everything
    rerun = [
        d["doc_id"]
        for page in scan_slice_pages(es_url, "relocated", 0, 1, page_size=2)
        for d in page
    ]
    assert rerun == [0, 1, 2, 3, 4, 5]


def test_pit_context_missing_is_fatal_and_task_rerun_recovers(es_url):
    """Node failover invalidating the PIT mid-pagination: the resumed page
    404s with search_context_missing_exception. 404 is NOT in the PIT
    retry set (retrying a dead context can only 404 again), so the attempt
    dies; the task rerun opens a NEW PIT and re-reads the slice."""
    import urllib.error

    from elastic_surv_spark.sources.elastic import scan_slice_pages_pit

    pages = scan_slice_pages_pit(es_url, "pitfail", 0, 1, page_size=2)
    assert [d["doc_id"] for d in next(pages)] == [0, 1]  # page 1 fine
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        next(pages)
    assert exc_info.value.code == 404

    rerun = [
        d["doc_id"]
        for page in scan_slice_pages_pit(es_url, "pitfail", 0, 1, page_size=2)
        for d in page
    ]
    assert rerun == [0, 1, 2, 3, 4, 5]


def test_scroll_response_without_cursor_raises(es_url):
    """Hits but no ``_scroll_id`` (misbehaving proxy) must raise, not
    silently truncate the scan after one page."""
    with pytest.raises(RuntimeError, match="no _scroll_id"):
        list(scan_slice_pages(es_url, "nocursor", 0, 1, page_size=2))


def test_scan_es_pit_mode_matches_scroll(spark, es_url):
    """``mode="pit"`` (point-in-time + search_after, the ES 8 path) must
    round-trip the same corpus identically to the scroll path, open/close
    the PIT, and paginate via ``search_after`` on ``_shard_doc`` order."""
    kwargs = dict(
        schema="doc_id long, lang string, n_chars long", slices=2, page_size=2
    )
    via_scroll = scan_es(spark, es_url, "docs", **kwargs).collect()
    via_pit = scan_es(spark, es_url, "docs", mode="pit", **kwargs).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(via_pit, key=key) == sorted(via_scroll, key=key)
    pit_bodies = [b for p, b in _Stub.requests if p == "/_search" and "pit" in b]
    assert pit_bodies and all(
        b["sort"] == [{"_shard_doc": "asc"}] and b["pit"]["id"] == "p:docs"
        for b in pit_bodies
    )
    assert any("search_after" in b for b in pit_bodies)  # page ≥2 resumed
    assert {"id": "p:docs"} in _Stub.deletes  # PIT closed after the scan


def test_pit_scan_pushes_query_and_fields(es_url):
    """The PIT page loop ships the same server-side pushdowns as scroll:
    translated query, ``_source`` pruning, and the slice clause."""
    from elastic_surv_spark.sources.elastic import scan_slice_pages_pit

    pages = list(
        scan_slice_pages_pit(
            es_url, "docs", slice_id=1, max_slices=2,
            query=filters_to_es_query(EqualTo("lang", "en")),
            fields=["doc_id", "lang"], page_size=2,
        )
    )
    assert [[d["doc_id"] for d in p] for p in pages] == [[1, 3], [5]]
    bodies = [b for p, b in _Stub.requests if p == "/_search"]
    assert all(b["slice"] == {"id": 1, "max": 2} for b in bodies)
    assert all(b["query"] == {"term": {"lang": "en"}} for b in bodies)
    assert all(b["_source"] == ["doc_id", "lang"] for b in bodies)


def test_bulk_write_multi_partition_idempotent_round_trip(spark, es_url):
    """Write → write → scan at >1 partition with planted NULL/NaN/NaT:
    under ``_id`` routing the double write upserts (exactly-once docs),
    every pandas missing sentinel is dropped from its document, and both
    scan modes reassemble the surviving values identically."""
    import datetime

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "name": [None if i == 4 else f"d{i}" for i in range(10)],
            "score": [float("nan") if i % 3 == 0 else float(i) for i in range(10)],
            "ts": [
                pd.NaT if i % 4 == 0 else datetime.datetime(2024, 1, 1 + i)
                for i in range(10)
            ],
        }
    )
    src = spark.createDataFrame(pdf).repartition(3)
    assert bulk_write_es(src, es_url, "pp_idx", id_col="doc_id", batch_docs=3) == 10
    assert bulk_write_es(src, es_url, "pp_idx", id_col="doc_id", batch_docs=3) == 10
    stored = _Stub.indexed["pp_idx"]
    assert sorted(stored) == sorted(str(i) for i in range(10))  # exactly once
    # every missing sentinel dropped: None name, NaN score, NaT timestamp
    assert "name" not in stored["4"]
    assert all("score" not in stored[str(i)] for i in range(0, 10, 3))
    assert all("ts" not in stored[str(i)] for i in range(0, 10, 4))
    assert stored["1"]["ts"].startswith("2024-01-02")  # real values survive
    assert stored["2"]["score"] == 2.0
    back = scan_es(
        spark, es_url, "pp_idx",
        schema="doc_id long, name string, score double", slices=3, page_size=2,
    )
    rows = {r["doc_id"]: r for r in back.collect()}
    assert sorted(rows) == list(range(10))
    assert rows[4]["name"] is None and rows[0]["score"] is None
    assert rows[2]["score"] == 2.0 and rows[2]["name"] == "d2"


def test_from_es_hash_split_disjoint_and_exhaustive(spark, es_url):
    """The documented no-order ES path: ``SurvFrame.from_es`` without an
    ``order_column`` trains via ``hash_split`` (ES document order is not a
    stable total order). The split must be deterministic, disjoint, and
    exhaustive over the index — mirroring tests/test_frame.py:83-90."""
    from elastic_surv_spark.frame import SurvFrame
    from elastic_surv_spark.models.data import SurvDataset

    frame = SurvFrame.from_es(
        spark, es_url, "surv",
        schema="doc_id long, time long, cens long, age long, pnodes long",
        time_column="time", event_column="cens",
        slices=2, page_size=50,
    )
    train, test = frame.hash_split(key="doc_id")
    tr = {r["doc_id"] for r in train.select("doc_id").collect()}
    te = {r["doc_id"] for r in test.select("doc_id").collect()}
    n = es_count(es_url, "surv")  # noqa: F841 — stub count is canned
    all_ids = {d["doc_id"] for d in _CORPORA["t"][1]}
    assert tr.isdisjoint(te) and tr | te == all_ids
    assert len(tr) > len(te) > 0  # ~90/10 at n=160
    # deterministic: the same split on a re-scan
    tr2, _ = frame.hash_split(key="doc_id")
    assert {r["doc_id"] for r in tr2.select("doc_id").collect()} == tr
    ds = SurvDataset(frame, use_hash_split=True)
    assert ds.in_features > 0


def test_streaming_sink_to_es_idempotent_restart(spark, es_url, tmp_path):
    """Structured Streaming → ES through the jar-free bulk writer
    (streaming/windows.py:run_to_es): a bounded file stream lands its rows
    in the stub index exactly once under ``_id`` routing, and a RESTART
    over the same checkpoint + unchanged source commits nothing new (the
    offsets are already consumed) — the checkpointed at-least-once +
    idempotent-upsert delivery contract."""
    from elastic_surv_spark.streaming.windows import run_to_es

    src_dir, chk_dir = str(tmp_path / "src"), str(tmp_path / "chk")
    spark.createDataFrame(
        [(i, f"e{i}") for i in range(6)], "event_id long, name string"
    ).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("event_id long, name string").parquet(src_dir)
    run_to_es(stream, es_url, "stream_idx", chk_dir, id_col="event_id", batch_docs=3)
    assert sorted(_Stub.indexed["stream_idx"]) == [str(i) for i in range(6)]
    n_bulk = len(_Stub.bulk_batches)
    assert n_bulk >= 1
    # restart: same checkpoint, same source — nothing re-committed
    stream2 = spark.readStream.schema("event_id long, name string").parquet(src_dir)
    run_to_es(stream2, es_url, "stream_idx", chk_dir, id_col="event_id", batch_docs=3)
    assert len(_Stub.bulk_batches) == n_bulk
    assert sorted(_Stub.indexed["stream_idx"]) == [str(i) for i in range(6)]


def test_streaming_windowed_aggregate_upserts_to_es(spark, es_url, tmp_path):
    """Update-mode windowed counts land as upserts keyed on the window
    group: late re-emissions of the same group overwrite the stale count
    instead of duplicating it — the contract that makes update-mode
    streaming aggregates safe to serve straight out of ES."""
    from pyspark.sql import functions as F

    from elastic_surv_spark.streaming.windows import run_to_es

    src_dir, chk_dir = str(tmp_path / "src"), str(tmp_path / "chk")
    spark.createDataFrame(
        [("2024-01-01 00:05:00", "click"), ("2024-01-01 00:20:00", "click"),
         ("2024-01-01 01:10:00", "view")],
        "ts string, etype string",
    ).selectExpr("cast(ts as timestamp) ts", "etype").coalesce(1).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("ts timestamp, etype string").parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "etype")
        .agg(F.count("*").alias("n"))
        .select(
            F.concat_ws("|", F.col("w.start").cast("string"), "etype").alias("k"),
            F.col("w.start").cast("string").alias("window_start"),
            "etype", "n",
        )
    )
    run_to_es(stream, es_url, "agg_idx", chk_dir, id_col="k", output_mode="update")
    stored = _Stub.indexed["agg_idx"]
    by_key = {d["etype"]: d for d in stored.values()}
    assert by_key["click"]["n"] == 2 and by_key["view"]["n"] == 1
    assert len(stored) == 2  # one doc per (window, type) group — no dupes


def test_suggest_slices_sizes_from_count(es_url):
    """Slice count derives from the server-side (filtered) count: ceil
    division, floor 1, cap honored — the stub counts 100 plain / 42
    filtered."""
    from elastic_surv_spark.sources.elastic import suggest_slices

    assert suggest_slices(es_url, "docs", docs_per_slice=30) == 4  # ceil(100/30)
    assert suggest_slices(es_url, "docs", docs_per_slice=1000) == 1  # floor
    assert suggest_slices(es_url, "docs", docs_per_slice=10, max_slices=6) == 6
    assert (
        suggest_slices(
            es_url, "docs",
            query=filters_to_es_query(EqualTo("lang", "en")),
            docs_per_slice=10,
        )
        == 5  # ceil(42/10)
    )


def test_from_es_pit_mode(spark, es_url):
    """`SurvFrame.from_es(..., mode="pit")` rides the ES 8 scan path and
    produces the same frame as the scroll default."""
    from elastic_surv_spark.frame import SurvFrame

    kw = dict(
        schema="doc_id long, lang string, n_chars long, event long",
        time_column="n_chars", event_column="event",
        slices=2, order_column="doc_id", page_size=2,
    )
    a = SurvFrame.from_es(spark, es_url, "docs", **kw)
    b = SurvFrame.from_es(spark, es_url, "docs", mode="pit", **kw)
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(b.df.collect(), key=key) == sorted(a.df.collect(), key=key)
    assert any(p == "/_search" and "pit" in bd for p, bd in _Stub.requests)


def test_es_agg_df_bridges_server_side_aggs_to_spark(spark, es_url):
    """Grouped server-side aggregation lands as a broadcast-joinable
    DataFrame (composite pagination under the hood), and the group bound
    raises instead of letting a corpus-sized group-by collect driver-side."""
    from elastic_surv_spark.sources.elastic import es_agg_df

    df = es_agg_df(
        spark, es_url, "docs", METRICS, group_by=["lang"], page_size=2
    )
    rows = {r["lang"]: r for r in df.collect()}
    assert set(rows) == {"de", "en", "fr"}
    assert rows["en"]["n"] == 5 and rows["en"]["avg_len"] == 80.0
    # joinable against a Spark-side frame
    joined = (
        spark.createDataFrame([("en", 1), ("de", 2)], "lang string, x int")
        .join(df, "lang")
    )
    assert joined.count() == 2
    with pytest.raises(RuntimeError, match="max_groups"):
        es_agg_df(
            spark, es_url, "docs", METRICS, group_by=["lang"],
            page_size=2, max_groups=2,
        )


def test_schema_mapping_translation_round_trips(spark):
    """Spark schema → ES mapping → Spark schema: types survive the trip
    (strings via text+keyword multi-field, timestamps via date, structs via
    object recursion); arrays flatten to their element type by ES's
    no-array-type design — documented, not silent. (The spark fixture is
    for the DDL-string convenience input — fromDDL parses in the JVM;
    StructType inputs and mapping_to_schema need no session.)"""
    from pyspark.sql import types as T

    from elastic_surv_spark.sources.elastic import (
        mapping_to_schema,
        schema_to_mapping,
    )

    ddl = (
        "id long, n int, score double, name string, ok boolean, "
        "ts timestamp, blob binary, emb array<float>, "
        "meta struct<w:long, tag:string>"
    )
    mapping = schema_to_mapping(ddl)
    assert mapping["name"] == {
        "type": "text", "fields": {"keyword": {"type": "keyword"}}
    }
    assert mapping["ts"] == {"type": "date"}
    assert mapping["emb"] == {"type": "float"}  # element type: ES has no arrays
    assert mapping["meta"]["properties"]["tag"]["type"] == "text"
    back = mapping_to_schema(mapping)
    by_name = {f.name: f.dataType for f in back.fields}
    assert by_name["id"] == T.LongType() and by_name["n"] == T.IntegerType()
    assert by_name["name"] == T.StringType() and by_name["ts"] == T.TimestampType()
    assert by_name["emb"] == T.FloatType()  # the documented array flattening
    assert isinstance(by_name["meta"], T.StructType)
    assert dict((f.name, f.dataType) for f in by_name["meta"].fields) == {
        "w": T.LongType(), "tag": T.StringType()
    }


def test_mapping_to_schema_rejects_unknown_type():
    from elastic_surv_spark.sources.elastic import mapping_to_schema

    with pytest.raises(ValueError, match="unsupported ES field type"):
        mapping_to_schema({"loc": {"type": "geo_point"}})


def test_ensure_index_lifecycle(es_url):
    """eland's es_if_exists contract: create when missing, fail raises,
    append is a no-op on an existing index, replace drops and recreates."""
    from elastic_surv_spark.sources.elastic import ensure_index

    assert ensure_index(es_url, "new_idx", "id long, name string") is True
    assert _Stub.created["new_idx"]["properties"]["id"] == {"type": "long"}
    with pytest.raises(RuntimeError, match="already exists"):
        ensure_index(es_url, "new_idx", "id long")
    assert ensure_index(es_url, "new_idx", "id long", if_exists="append") is False
    assert "name" in _Stub.created["new_idx"]["properties"]  # untouched
    assert ensure_index(es_url, "new_idx", "id long", if_exists="replace") is True
    assert "name" not in _Stub.created["new_idx"]["properties"]  # recreated


def test_write_then_scan_self_typed_from_mapping(spark, es_url):
    """The full eland-parity loop with NO hand-written read schema:
    ensure_index infers mappings from the frame, the bulk writer lands the
    rows, and scan_es(schema=None) types itself from GET /{index}/_mapping."""
    from pyspark.sql import types as T

    from elastic_surv_spark.sources.elastic import ensure_index

    src = spark.createDataFrame(
        [(i, f"d{i}", float(i) / 2, i % 2 == 0) for i in range(5)],
        "doc_id long, name string, score double, flag boolean",
    ).repartition(2)
    ensure_index(es_url, "typed_idx", src.schema)
    assert bulk_write_es(src, es_url, "typed_idx", id_col="doc_id") == 5
    back = scan_es(spark, es_url, "typed_idx", slices=2, page_size=2)
    by_name = {f.name: f.dataType for f in back.schema.fields}
    assert by_name == {
        "doc_id": T.LongType(), "name": T.StringType(),
        "score": T.DoubleType(), "flag": T.BooleanType(),
    }
    rows = {r["doc_id"]: r for r in back.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[3]["score"] == 1.5 and rows[2]["flag"] is True


def test_scan_es_self_types_canned_index(spark, es_url):
    """schema=None on the canned corpus reads the stub's docs mapping."""
    df = scan_es(spark, es_url, "docs", slices=2, page_size=2)
    assert sorted(f.name for f in df.schema.fields) == [
        "doc_id", "event", "lang", "n_chars"
    ]
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 1, 2, 3, 4, 5]


def test_from_es_self_types_from_mapping(spark, es_url):
    """`SurvFrame.from_es` without a schema types the frame from the index
    mapping (ed.DataFrame behavior) — roles validated, features inferred,
    pruning still pushed to the source."""
    from elastic_surv_spark.frame import SurvFrame

    frame = SurvFrame.from_es(
        spark, es_url, "docs",
        time_column="n_chars", event_column="event",
        slices=2, order_column="doc_id", page_size=2,
    )
    assert frame.features == ["lang"]
    rows = {r["doc_id"]: r for r in frame.df.collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="requires time_column"):
        SurvFrame.from_es(spark, es_url, "docs")


def test_fetch_index_schema_refuses_ambiguous_or_empty(es_url):
    """An alias/wildcard `_mapping` response (several backing indices) or a
    mapping with zero properties must raise — not silently yield an empty
    StructType whose scan reads zero columns."""
    from elastic_surv_spark.sources.elastic import fetch_index_schema

    with pytest.raises(ValueError, match="resolved to"):
        fetch_index_schema(es_url, "both")
    with pytest.raises(ValueError, match="no mapped properties"):
        fetch_index_schema(es_url, "bare")


def test_backoff_sleep_jitter_and_retry_after(monkeypatch):
    """THE shared retry sleep: jittered within [base/2, base] (so N
    executors that saw the same failure instant de-synchronize instead of
    retry-storming in lockstep), with a server Retry-After overriding the
    schedule, capped at RETRY_AFTER_CAP_S."""
    from elastic_surv_spark.sources import elastic as es

    slept: list[float] = []
    monkeypatch.setattr("time.sleep", lambda s: slept.append(s))
    for _ in range(25):
        es._backoff_sleep(2, backoff=0.5)
    base = 0.5 * 2 ** 2
    assert all(base / 2 <= s <= base for s in slept)
    assert len(set(slept)) > 1  # actually jittered, not a constant
    slept.clear()
    es._backoff_sleep(0, retry_after=4.0)
    es._backoff_sleep(0, retry_after=1e9)  # misconfigured server: capped
    assert slept == [4.0, es.RETRY_AFTER_CAP_S]


def test_upload_frame_one_call_parity(spark, es_url):
    """upload_frame ≡ pandas_to_eland: mappings created from the frame,
    rows landed, and es_if_exists parity — the DEFAULT refuses to touch an
    existing index (destroying one is an explicit "replace" opt-in)."""
    from elastic_surv_spark.sources.elastic import upload_frame

    src = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], "doc_id long, name string, score double"
    )
    assert upload_frame(src, es_url, "up_idx", id_col="doc_id") == 2
    assert _Stub.created["up_idx"]["properties"]["score"] == {"type": "double"}
    assert sorted(_Stub.indexed["up_idx"]) == ["1", "2"]
    # default = "fail" (pandas_to_eland's es_if_exists contract): a caller
    # who omits the argument can never destroy an existing index
    with pytest.raises(RuntimeError, match="already exists"):
        upload_frame(src, es_url, "up_idx", id_col="doc_id")
    assert "score" in _Stub.created["up_idx"]["properties"]  # untouched
    # replace is the explicit opt-in: narrower frame recreates the mapping
    assert upload_frame(
        src.drop("score"), es_url, "up_idx", if_exists="replace", id_col="doc_id"
    ) == 2
    assert "score" not in _Stub.created["up_idx"]["properties"]
    assert sorted(_Stub.indexed["up_idx"]) == ["1", "2"]  # exactly once


def test_empty_inputs_through_the_es_surface(spark, es_url):
    """Degenerate shapes must stay well-formed: an empty frame bulk-writes
    zero docs (no requests fired), an index with no documents scans to an
    empty frame with the requested schema, and upload_frame of an empty
    frame still creates the index (mappings come from the schema, not the
    rows) — eland parity."""
    from elastic_surv_spark.sources.elastic import upload_frame

    empty = spark.createDataFrame([], "doc_id long, name string")
    assert bulk_write_es(empty, es_url, "empty_idx", id_col="doc_id") == 0
    assert "empty_idx" not in _Stub.indexed  # no doc ever sent
    assert upload_frame(empty, es_url, "empty_idx2") == 0
    assert _Stub.created["empty_idx2"]["properties"]["name"]["type"] == "text"
    # scanning a created-but-empty index yields an empty, correctly-typed df
    _Stub.indexed["empty_idx2"] = {}
    back = scan_es(spark, es_url, "empty_idx2", schema="doc_id long, name string", slices=2)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["doc_id", "name"]


def test_document_pipeline_stream_lands_in_es(spark, es_url, tmp_path):
    """The production landing path end-to-end: the streaming document
    pipeline's closed windows upsert into ES keyed on window|lang — a
    restart over the same checkpoint re-commits nothing."""
    from pyspark.sql import functions as F

    from elastic_surv_spark.streaming.windows import (
        document_pipeline_stream,
        run_to_es,
    )

    src_dir, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    rows = [
        ("2024-01-01 00:10:00", "en", "the quick brown fox jumps over the lazy dog again"),
        ("2024-01-01 00:40:00", "en", "the quick brown fox jumps over the lazy dog again"),
        ("2024-01-01 00:50:00", "de", "ein ganz anderes dokument mit eigenem inhalt und text"),
        ("2024-01-01 03:10:00", "en", "late window content that stays open past the watermark"),
    ]
    spark.createDataFrame(rows, "ts string, lang string, text string").selectExpr(
        "cast(ts as timestamp) ts", "lang", "text"
    ).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("ts timestamp, lang string, text string").parquet(src_dir)
    out = document_pipeline_stream(stream).withColumn(
        "k", F.concat_ws("|", F.col("window_start").cast("string"), "lang")
    )

    def _land(chk_dir):
        run_to_es(out, es_url, "pipe_idx", chk_dir, id_col="k", output_mode="append")

    _land(chk)
    stored = {d["lang"]: d for d in _Stub.indexed["pipe_idx"].values()}
    # window 00:00 closed by the 03:10 watermark: duplicate en text deduped
    assert stored["en"]["n_docs"] == 1 and stored["de"]["n_docs"] == 1
    assert len(_Stub.indexed["pipe_idx"]) == 2  # 03:00 window still open
    n_before = len(_Stub.bulk_batches)
    _land(chk)  # restart: same checkpoint + source → nothing new
    assert len(_Stub.bulk_batches) == n_before


def test_grouped_models_registry_in_es(spark, es_url):
    """The per-segment trainer's output frame IS a model registry: one
    upload_frame call lands every segment's serde JSON doc in the stub
    index keyed by the segment id, a later job scans them back and serves
    each segment with BIT-identical predictions — fit_per_group (r9)
    composed with the r8 train-once-serve-anywhere ES hop."""
    import numpy as np

    from elastic_surv_spark.models.grouped import fit_per_group
    from elastic_surv_spark.models.serde import model_from_json
    from elastic_surv_spark.sources.elastic import upload_frame

    rng = np.random.default_rng(11)
    rows = []
    for rid in range(360):
        g = rid % 3
        x0 = float(rng.normal())
        t = float(np.exp(1.0 - 0.7 * x0 + 0.2 * rng.normal()) * (1 + g))
        rows.append((rid, g, x0, t, int(rng.random() < 0.7)))
    df = spark.createDataFrame(rows, "rid long, seg int, x0 double, t double, e int")

    fitted = fit_per_group(
        df, "seg", "rid", "t", "e", ["x0"],
        model="logistic_hazard", epochs=6, patience=3, hidden_nodes=[8],
    )
    local = {r.seg: r.model_json for r in fitted.collect()}
    assert upload_frame(
        fitted.withColumnRenamed("seg", "doc_id"), es_url, "segment_models",
        id_col="doc_id",
    ) == 3

    back = scan_es(
        spark, es_url, "segment_models",
        schema="doc_id long, model_json string", slices=1,
    ).collect()
    assert len(back) == 3
    X = np.array([[-1.0], [0.0], [1.5]])
    for r in back:
        served = model_from_json(r["model_json"])
        original = model_from_json(local[r["doc_id"]])
        a = served._surv_from_output(served.net.forward(X, training=False))
        b = original._surv_from_output(original.net.forward(X, training=False))
        assert np.array_equal(a, b)


def test_per_segment_training_from_es_index(spark, es_url):
    """Segments scanned straight off the stub index train one model each in
    a single grouped-map job — the grouped trainer (r9) composed with the
    jar-free sliced-scroll source: ES index → scan_es → fit_per_group →
    per-segment serde docs, no intermediate landing."""
    import numpy as np

    from elastic_surv_spark.models.grouped import fit_per_group
    from elastic_surv_spark.models.serde import model_from_json

    # the GBSG2-shaped stub index: segment on tumor grade (a real categorical)
    df = scan_es(
        spark, es_url, "surv",
        schema=(
            "doc_id long, time long, cens long, age long, pnodes long, "
            "progrec long, tgrade string"
        ),
        slices=2,
        page_size=50,
    )
    res = fit_per_group(
        df, "tgrade", "doc_id", "time", "cens", ["age", "pnodes", "progrec"],
        model="logistic_hazard", epochs=5, patience=3, hidden_nodes=[8],
        min_rows=8,
    ).collect()
    assert len(res) == df.select("tgrade").distinct().count()
    trained = [r for r in res if r.model_json is not None]
    assert trained, [r.tgrade for r in res]
    for r in trained:
        m = model_from_json(r.model_json)
        X = np.zeros((1, 3))
        surv = m._surv_from_output(m.net.forward(X, training=False))
        assert surv.shape[1] == len(m.cuts) and np.isfinite(surv).all()
