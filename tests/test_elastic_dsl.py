"""ES Query-DSL translation — the cluster-free half of the ES source.

Shapes asserted against the public Elasticsearch Query DSL reference
(term / terms / range / exists / bool filter contexts)."""

from __future__ import annotations

import json

import pytest

from elastic_surv_spark.sources.elastic import (
    And,
    EqualTo,
    In,
    IsNull,
    Not,
    Or,
    Range,
    es_reader,
    filters_to_es_query,
)


def test_term_terms_range():
    assert filters_to_es_query(EqualTo("event_type", "purchase")) == {
        "query": {"term": {"event_type": "purchase"}}
    }
    assert filters_to_es_query(In("lang", ["en", "fr"])) == {
        "query": {"terms": {"lang": ["en", "fr"]}}
    }
    assert filters_to_es_query(Range("value", gte=1.5, lt=10)) == {
        "query": {"range": {"value": {"gte": 1.5, "lt": 10}}}
    }


def test_null_and_boolean_composition():
    q = filters_to_es_query(
        Or(EqualTo("a", 1), And(Range("t", gt=0), Not(IsNull("u"))))
    )
    assert q == {
        "query": {
            "bool": {
                "should": [
                    {"term": {"a": 1}},
                    {
                        "bool": {
                            "filter": [
                                {"range": {"t": {"gt": 0}}},
                                {
                                    "bool": {
                                        "must_not": [
                                            {
                                                "bool": {
                                                    "must_not": [
                                                        {"exists": {"field": "u"}}
                                                    ]
                                                }
                                            }
                                        ]
                                    }
                                },
                            ]
                        }
                    },
                ],
                "minimum_should_match": 1,
            }
        }
    }


def test_multiple_filters_and_combined_and_empty():
    q = filters_to_es_query(EqualTo("a", 1), Range("b", lte=2))
    assert q["query"]["bool"]["filter"] == [
        {"term": {"a": 1}},
        {"range": {"b": {"lte": 2}}},
    ]
    assert filters_to_es_query() == {"query": {"match_all": {}}}


def test_range_requires_bound():
    with pytest.raises(ValueError):
        filters_to_es_query(Range("x"))


def test_reader_option_map_carries_query(spark):
    from elastic_surv_spark.sources.elastic import es_options

    q = filters_to_es_query(EqualTo("event_type", "view"))
    opts = es_options("events-*", fields=["ts", "user_id"], query=q)
    assert json.loads(opts["es.query"]) == q
    assert opts["es.read.source.filter"] == "ts,user_id"
    assert opts["es.resource"] == "events-*"
    # the reader builds without a cluster (failure only occurs at .load())
    r = es_reader(spark, "events-*", fields=["ts", "user_id"], query=q)
    assert r is not None


def test_string_predicates_and_wildcard_escaping():
    from elastic_surv_spark.sources.elastic import (
        Contains,
        EndsWith,
        Match,
        StartsWith,
    )

    q = filters_to_es_query(StartsWith("sku", "AB"))
    assert q == {"query": {"prefix": {"sku": "AB"}}}
    q = filters_to_es_query(Contains("comment", "urgent"))
    assert q == {"query": {"wildcard": {"comment": "*urgent*"}}}
    q = filters_to_es_query(EndsWith("path", ".json"))
    assert q == {"query": {"wildcard": {"path": "*.json"}}}
    # literal */? in the needle must not act as wildcards
    q = filters_to_es_query(Contains("note", "a*b?c"))
    assert q == {"query": {"wildcard": {"note": "*a\\*b\\?c*"}}}
    q = filters_to_es_query(Match("title", "neural survival"))
    assert q == {"query": {"match": {"title": "neural survival"}}}


def test_nested_bool_composition_golden():
    from elastic_surv_spark.sources.elastic import Or, StartsWith

    q = filters_to_es_query(
        Or(And(EqualTo("lang", "en"), StartsWith("title", "intro")),
           Not(Range("len", lt=10)))
    )
    assert q == {
        "query": {
            "bool": {
                "should": [
                    {"bool": {"filter": [
                        {"term": {"lang": "en"}},
                        {"prefix": {"title": "intro"}},
                    ]}},
                    {"bool": {"must_not": [{"range": {"len": {"lt": 10}}}]}},
                ],
                "minimum_should_match": 1,
            }
        }
    }


# --- aggregation pushdown (eland parity: dataset.py:64/83, base.py:77) -------


def test_ungrouped_metric_aggs_golden():
    from elastic_surv_spark.sources.elastic import agg_request, parse_agg_response

    metrics = {
        "n": ("count", "doc_id"),
        "users": ("nunique", "user_id"),
        "t_min": ("min", "duration"),
        "t_max": ("max", "duration"),
    }
    body = agg_request(metrics, nunique={"precision_threshold": 40000})
    assert body == {
        "size": 0,
        "aggs": {
            "n": {"value_count": {"field": "doc_id"}},
            "users": {"cardinality": {"field": "user_id", "precision_threshold": 40000}},
            "t_min": {"min": {"field": "duration"}},
            "t_max": {"max": {"field": "duration"}},
        },
    }
    rows, after = parse_agg_response(
        {"aggregations": {
            "n": {"value": 60175},
            "users": {"value": 993},
            "t_min": {"value": 0.5},
            "t_max": {"value": 88.2},
        }},
        metrics,
    )
    assert after is None
    assert rows == [{"n": 60175, "users": 993, "t_min": 0.5, "t_max": 88.2}]


def test_grouped_composite_aggs_golden_and_pagination():
    from elastic_surv_spark.sources.elastic import (
        agg_request,
        filters_to_es_query,
        parse_agg_response,
        Range,
    )

    metrics = {"total": ("sum", "value")}
    body = agg_request(
        metrics,
        group_by=["event_type"],
        query=filters_to_es_query(Range("value", gte=10)),
        page_size=2,
    )
    assert body == {
        "size": 0,
        "query": {"range": {"value": {"gte": 10}}},
        "aggs": {
            "groups": {
                "composite": {
                    "size": 2,
                    "sources": [{"event_type": {"terms": {"field": "event_type"}}}],
                },
                "aggs": {"total": {"sum": {"field": "value"}}},
            }
        },
    }
    resp = {"aggregations": {"groups": {
        "after_key": {"event_type": "purchase"},
        "buckets": [
            {"key": {"event_type": "click"}, "total": {"value": 12.5}},
            {"key": {"event_type": "purchase"}, "total": {"value": 99.0}},
        ],
    }}}
    rows, after = parse_agg_response(resp, metrics, group_by=["event_type"])
    assert rows == [
        {"event_type": "click", "total": 12.5},
        {"event_type": "purchase", "total": 99.0},
    ]
    assert after == {"event_type": "purchase"}
    # next page resumes deterministically from after_key
    page2 = agg_request(metrics, group_by=["event_type"], after=after, page_size=2)
    assert page2["aggs"]["groups"]["composite"]["after"] == {"event_type": "purchase"}


def test_percentiles_and_unknown_kind():
    import pytest

    from elastic_surv_spark.sources.elastic import agg_request, parse_agg_response

    metrics = {"p": ("percentiles", "value")}
    body = agg_request(metrics, percentiles={"percents": [50, 95]})
    assert body["aggs"]["p"] == {"percentiles": {"field": "value", "percents": [50, 95]}}
    rows, _ = parse_agg_response(
        {"aggregations": {"p": {"values": {"50.0": 1.0, "95.0": 9.0}}}}, metrics
    )
    assert rows == [{"p": {"50.0": 1.0, "95.0": 9.0}}]
    with pytest.raises(ValueError):
        agg_request({"x": ("median", "value")})


# --- retry policy (pure; the stub-server tests cover the wired paths) ----


def _http_error(code: int):
    import urllib.error

    return urllib.error.HTTPError("http://x", code, "err", {}, None)


def test_with_retries_retries_transient_then_succeeds(monkeypatch):
    from elastic_surv_spark.sources import elastic as E

    sleeps: list[float] = []
    monkeypatch.setattr("time.sleep", sleeps.append)
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        if calls["n"] < 3:
            raise _http_error(503)
        return {"ok": True}

    assert E._with_retries(send, retries=4, backoff=0.5) == {"ok": True}
    assert calls["n"] == 3
    # jittered exponential: sleep_i in [base/2, base], base = 0.5 * 2^i
    assert len(sleeps) == 2
    assert 0.25 <= sleeps[0] <= 0.5 and 0.5 <= sleeps[1] <= 1.0


def test_with_retries_nonretryable_status_raises_immediately(monkeypatch):
    import urllib.error

    from elastic_surv_spark.sources import elastic as E

    monkeypatch.setattr("time.sleep", lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        raise _http_error(400)

    with pytest.raises(urllib.error.HTTPError):
        E._with_retries(send)
    assert calls["n"] == 1  # no retry, no sleep


def test_with_retries_exhaustion_reraises_last_error(monkeypatch):
    import urllib.error

    from elastic_surv_spark.sources import elastic as E

    sleeps: list[float] = []
    monkeypatch.setattr("time.sleep", sleeps.append)

    def send():
        raise _http_error(429)

    with pytest.raises(urllib.error.HTTPError):
        E._with_retries(send, retries=2, backoff=0.1)
    assert len(sleeps) == 2  # initial try + 2 retries, sleep between each


def test_with_retries_zero_retries_is_single_attempt(monkeypatch):
    from elastic_surv_spark.sources import elastic as E

    monkeypatch.setattr("time.sleep", lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        raise ConnectionError("refused")

    with pytest.raises(ConnectionError):
        E._with_retries(send, retries=0)
    assert calls["n"] == 1


def test_with_retries_connection_errors_retry(monkeypatch):
    from elastic_surv_spark.sources import elastic as E

    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        if calls["n"] == 1:
            raise TimeoutError("read timeout")
        return {"ok": 1}

    assert E._with_retries(send) == {"ok": 1}
    assert calls["n"] == 2


def test_with_retries_honors_numeric_retry_after(monkeypatch):
    import urllib.error

    from elastic_surv_spark.sources import elastic as E

    sleeps: list[float] = []
    monkeypatch.setattr("time.sleep", sleeps.append)
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.HTTPError(
                "http://x", 429, "busy", {"Retry-After": "2"}, None
            )
        return {"ok": 1}

    assert E._with_retries(send, retries=2, backoff=0.5) == {"ok": 1}
    assert sleeps == [2.0]  # server's horizon, not the computed backoff


def test_with_retries_caps_retry_after(monkeypatch):
    import urllib.error

    from elastic_surv_spark.sources import elastic as E

    sleeps: list[float] = []
    monkeypatch.setattr("time.sleep", sleeps.append)
    calls = {"n": 0}

    def send():
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.HTTPError(
                "http://x", 503, "down", {"Retry-After": "3600"}, None
            )
        return {"ok": 1}

    assert E._with_retries(send) == {"ok": 1}
    assert sleeps == [E.RETRY_AFTER_CAP_S]  # a misconfigured server can't park us
