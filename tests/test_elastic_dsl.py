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
