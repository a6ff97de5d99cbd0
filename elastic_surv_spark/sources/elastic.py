"""ElasticSearch source/sink — parity with the reference's primary backend.

The reference streams training data out of an ES index via eland
(``ESDataset``, reference src/elastic_surv/dataset.py:228-271, construction
at 260) and uploads demo frames with ``ed.pandas_to_eland`` (README.md:65-78).
Spark's equivalent is the elasticsearch-hadoop DataSource
(``org.elasticsearch.spark.sql``): the scan is lazy, and Catalyst pushes
column pruning and predicates down as ES queries — the same role eland's
query compiler plays.

The connector jar and a live cluster are not present in this harness, so
the jar-based helpers build fully-configured readers/writers (testable)
and fail with a clear message only at ``.load()``/``.save()`` time. The
pure-stdlib transport paths, by contrast, run end-to-end under pytest
against a canned stub server (tests/test_elastic_transport.py):

- counts (``es_count``) and server-side aggregations (``es_aggregate``
  with composite pagination; ``es_agg_df`` lands them as a bounded,
  broadcast-joinable DataFrame);
- the jar-free distributed document scan (``scan_es`` — one Spark
  partition per ES slice, sliced scroll or PIT + ``search_after``
  for ES 8, ``suggest_slices`` sizing, self-typing from the index
  mapping) and the ``_bulk`` writer (``bulk_write_es``, per-item 429
  re-sends; ``upload_frame`` ≡ ``pandas_to_eland`` with
  ``ensure_index``-inferred mappings);
- schema ↔ mapping translation both ways (``schema_to_mapping`` /
  ``mapping_to_schema``), the typing seam eland owns for the reference;
- resilience everywhere: jittered exponential backoff on transient
  HTTP/connection failures, numeric ``Retry-After`` honored (capped).

Swap in the parquet source (sources/parquet.py) everywhere else in the
repo.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

ES_FORMAT = "org.elasticsearch.spark.sql"


# --- predicate → ES Query DSL ------------------------------------------------
# The role eland's query compiler plays in the reference (server-side
# filtering before data leaves the cluster). The connector already pushes
# Catalyst filters on its own; this explicit translator covers the
# ``es.query`` escape hatch — pre-filtering an index the same way
# ``ESDataset`` users filter via eland — and is testable without a cluster.


@dataclass(frozen=True)
class EqualTo:
    col: str
    value: object


@dataclass(frozen=True)
class In:
    col: str
    values: tuple

    def __post_init__(self) -> None:  # tolerate lists
        object.__setattr__(self, "values", tuple(self.values))


@dataclass(frozen=True)
class Range:
    """gt/gte/lt/lte bounds; None bounds are omitted."""

    col: str
    gt: object = None
    gte: object = None
    lt: object = None
    lte: object = None


@dataclass(frozen=True)
class IsNull:
    col: str


@dataclass(frozen=True)
class StartsWith:
    """Keyword prefix — the DSL the connector emits for Catalyst's
    StringStartsWith pushdown."""

    col: str
    value: str


@dataclass(frozen=True)
class Contains:
    """Substring via wildcard (Catalyst StringContains pushdown). The value
    is escaped so literal ``*``/``?`` in it don't become wildcards."""

    col: str
    value: str


@dataclass(frozen=True)
class EndsWith:
    col: str
    value: str


@dataclass(frozen=True)
class Match:
    """Analyzed full-text match (eland's text-search passthrough) — unlike
    the term/wildcard clauses this scores and honors the field analyzer."""

    col: str
    value: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple

    def __init__(self, *children) -> None:
        object.__setattr__(self, "children", tuple(children))


@dataclass(frozen=True)
class Or:
    children: tuple

    def __init__(self, *children) -> None:
        object.__setattr__(self, "children", tuple(children))


def _escape_wildcard(value: str) -> str:
    return value.replace("\\", "\\\\").replace("*", "\\*").replace("?", "\\?")


def _clause(f) -> dict:
    if isinstance(f, EqualTo):
        return {"term": {f.col: f.value}}
    if isinstance(f, In):
        return {"terms": {f.col: list(f.values)}}
    if isinstance(f, Range):
        bounds = {
            k: getattr(f, k)
            for k in ("gt", "gte", "lt", "lte")
            if getattr(f, k) is not None
        }
        if not bounds:
            raise ValueError(f"Range({f.col}) needs at least one bound")
        return {"range": {f.col: bounds}}
    if isinstance(f, IsNull):
        return {"bool": {"must_not": [{"exists": {"field": f.col}}]}}
    if isinstance(f, StartsWith):
        return {"prefix": {f.col: f.value}}
    if isinstance(f, Contains):
        return {"wildcard": {f.col: f"*{_escape_wildcard(f.value)}*"}}
    if isinstance(f, EndsWith):
        return {"wildcard": {f.col: f"*{_escape_wildcard(f.value)}"}}
    if isinstance(f, Match):
        return {"match": {f.col: f.value}}
    if isinstance(f, Not):
        return {"bool": {"must_not": [_clause(f.child)]}}
    if isinstance(f, And):
        return {"bool": {"filter": [_clause(c) for c in f.children]}}
    if isinstance(f, Or):
        return {"bool": {"should": [_clause(c) for c in f.children],
                         "minimum_should_match": 1}}
    raise TypeError(f"unsupported filter: {type(f).__name__}")


def filters_to_es_query(*filters) -> dict:
    """AND-combined filters as a full ES request body (``{"query": ...}``).

    Filter context (no scoring) — exactly what a scan source wants; ES
    caches filter-context clauses across slices."""
    if not filters:
        return {"query": {"match_all": {}}}
    if len(filters) == 1:
        return {"query": _clause(filters[0])}
    return {"query": _clause(And(*filters))}


# --- aggregation → ES aggs body ---------------------------------------------
# Server-side aggregation pushdown, the eland machinery behind the
# reference's dataset statistics: ``len(df)`` → match-all value count
# (reference src/elastic_surv/dataset.py:64-65,158), ``df[col].nunique()`` →
# cardinality (dataset.py:83), duration ``min()/max()`` for the time grid →
# min/max aggs (models/base.py:77), and one-hot category discovery →
# terms buckets (dataset.py:85-96). Emitting the DSL (and parsing the
# response shape) is pure and unit-testable without a cluster; a live
# deployment feeds the body to ``es_client.search``.

#: metric kind → ES aggregation name
_METRIC_AGGS = {
    "count": "value_count",
    "nunique": "cardinality",
    "mean": "avg",
    "sum": "sum",
    "min": "min",
    "max": "max",
    "percentiles": "percentiles",
}


def metrics_to_es_aggs(metrics: dict[str, tuple[str, str]], **kind_opts) -> dict:
    """``{alias: (kind, field)}`` → the ``aggs`` section.

    kinds: count, nunique, mean, sum, min, max, percentiles. Extra options
    for a kind go in ``kind_opts`` keyed by kind (e.g.
    ``percentiles={"percents": [50, 95]}``,
    ``nunique={"precision_threshold": 40000}``).
    """
    aggs: dict = {}
    for alias, (kind, field) in metrics.items():
        if kind not in _METRIC_AGGS:
            raise ValueError(
                f"unsupported metric kind {kind!r}; choose from {sorted(_METRIC_AGGS)}"
            )
        body = {"field": field}
        body.update(kind_opts.get(kind, {}))
        aggs[alias] = {_METRIC_AGGS[kind]: body}
    return aggs


def agg_request(
    metrics: dict[str, tuple[str, str]],
    group_by: list[str] | None = None,
    query: dict | None = None,
    after: dict | None = None,
    page_size: int = 1000,
    **kind_opts,
) -> dict:
    """Full ``_search`` body for a (grouped) aggregation, ``size: 0``.

    Ungrouped → top-level metric aggs (one response row). Grouped → a
    ``composite`` aggregation over the keys with the metrics as sub-aggs;
    composite paginates deterministically via ``after`` (sorted key order),
    which is the scan-safe way to pull an unbounded number of groups out of
    ES — the terms agg's top-N would silently truncate.
    """
    body: dict = {"size": 0}
    if query is not None:
        body["query"] = query.get("query", query)
    aggs = metrics_to_es_aggs(metrics, **kind_opts)
    if not group_by:
        body["aggs"] = aggs
        return body
    composite: dict = {
        "size": page_size,
        "sources": [{k: {"terms": {"field": k}}} for k in group_by],
    }
    if after is not None:
        composite["after"] = after
    body["aggs"] = {"groups": {"composite": composite, "aggs": aggs}}
    return body


def parse_agg_response(
    resp: dict, metrics: dict[str, tuple[str, str]], group_by: list[str] | None = None
) -> tuple[list[dict], dict | None]:
    """ES response → (rows, after_key). ``after_key`` is None when the
    composite pagination is exhausted (or for ungrouped requests)."""

    def _value(agg: dict, kind: str):
        if kind == "percentiles":
            return agg["values"]
        return agg["value"]

    aggs = resp.get("aggregations", {})
    if not group_by:
        row = {a: _value(aggs[a], k) for a, (k, _) in metrics.items()}
        return [row], None
    groups = aggs["groups"]
    rows = []
    for bucket in groups.get("buckets", []):
        row = dict(bucket["key"])
        for a, (k, _) in metrics.items():
            row[a] = _value(bucket[a], k)
        rows.append(row)
    return rows, groups.get("after_key")


#: HTTP statuses worth retrying — 429 is routine back-pressure under the
#: N-concurrent-streams load the bulk writer creates; 502/503/504 are
#: transient gateway/cluster states. Everything else (400 mapping errors,
#: 404, auth) is a real failure and must surface immediately.
RETRYABLE_STATUSES = frozenset({429, 502, 503, 504})
#: retry attempts beyond the first try, and the first backoff sleep
#: (doubles per attempt: 0.5, 1, 2, 4 s — ~7.5 s of patience total).
#: The resilience eland's elasticsearch-py client gives the reference for
#: free (retry_on_timeout / bulk helpers); without it a single transient
#: 429/503 kills a whole 100 TB scan or write job.
DEFAULT_RETRIES = 4
DEFAULT_BACKOFF_S = 0.5
#: upper bound on honoring a server's Retry-After header
RETRY_AFTER_CAP_S = 30.0


def _backoff_sleep(attempt: int, backoff: float = DEFAULT_BACKOFF_S,
                   retry_after: float | None = None) -> None:
    """THE retry sleep — every retry path in this module routes through it.

    Jittered exponential (uniform in [base/2, base] with base doubling per
    attempt): when a node stalls, hundreds of executor-side readers/writers
    see the failure at the same instant, and un-jittered exponential
    backoff re-synchronizes them into repeating retry waves against the
    recovering node. A numeric ``retry_after`` (the server's own
    Retry-After) overrides the computed backoff, capped at
    ``RETRY_AFTER_CAP_S`` so a misconfigured server can't park an executor
    for an hour — the server knows its recovery horizon better than our
    schedule does."""
    import random as _random
    import time as _time

    if retry_after is not None:
        _time.sleep(min(max(retry_after, 0.0), RETRY_AFTER_CAP_S))
    else:
        base = backoff * (2 ** attempt)
        _time.sleep(base * (0.5 + 0.5 * _random.random()))


def _with_retries(send, retries: int = DEFAULT_RETRIES,
                  backoff: float = DEFAULT_BACKOFF_S,
                  retry_statuses: frozenset = RETRYABLE_STATUSES,
                  retry_connection_errors: bool = True):
    """Run ``send()`` retrying transient failures with jittered exponential
    backoff (:func:`_backoff_sleep`, honoring a numeric ``Retry-After``).

    By default retries HTTP {429, 502, 503, 504} and connection-level
    errors (refused/reset/timeout); re-raises everything else — and the
    last transient error once ``retries`` attempts are spent. That default
    is only safe for IDEMPOTENT requests: counts/aggs, PIT pages (keyed by
    ``search_after``, which advances only after a page is received), the
    initial ``_search?scroll`` open (a retry opens a fresh context; the
    orphan expires with its TTL), and ``_bulk`` re-sends under ``_id``
    routing (at-least-once without it — the official bulk helpers'
    contract).

    A scroll CONTINUATION is not idempotent: the server advances the
    cursor when IT processes the request, so a request that succeeded
    server-side but whose response was lost (connection reset, gateway
    502/504 after proxying) must NOT be retried — the retry would return
    the NEXT page and silently skip one page of documents. For that call,
    pass ``retry_statuses=frozenset({429})`` (a 429 is rejected before
    processing, so the cursor provably did not move) and
    ``retry_connection_errors=False`` — the same reason the official ES
    clients never retry scroll continuations."""
    import urllib.error

    attempt = 0
    while True:
        retry_after = None
        try:
            return send()
        except urllib.error.HTTPError as exc:  # subclasses URLError: first
            if exc.code not in retry_statuses or attempt >= retries:
                raise
            try:
                retry_after = float((exc.headers or {}).get("Retry-After"))
            except (TypeError, ValueError):  # absent or HTTP-date form
                retry_after = None
        except (urllib.error.URLError, ConnectionError, TimeoutError, OSError):
            if not retry_connection_errors or attempt >= retries:
                raise
        _backoff_sleep(attempt, backoff, retry_after)
        attempt += 1


def _es_request(
    url: str,
    body: dict,
    method: str = "POST",
    timeout: float = 30.0,
    retries: int = DEFAULT_RETRIES,
    backoff: float = DEFAULT_BACKOFF_S,
    retry_statuses: frozenset = RETRYABLE_STATUSES,
    retry_connection_errors: bool = True,
) -> dict:
    """One JSON request to an ES REST endpoint via stdlib urllib — the
    whole transport layer (no client library, no connector jar). Used
    driver-side for counts/aggregations (one request per composite page)
    and executor-side for the sliced-scroll/PIT scan (one request per
    ``page_size`` documents, never per row). Transient failures retry
    with exponential backoff (see :func:`_with_retries` — including when
    the default retry set is unsafe for a non-idempotent request); pass
    ``retries=0`` for best-effort calls like scroll-context cleanup."""
    import urllib.request

    def _send() -> dict:
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method=method,
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:  # noqa: S310
            return json.loads(r.read().decode())

    return _with_retries(_send, retries, backoff,
                         retry_statuses, retry_connection_errors)


def _es_post(url: str, body: dict, timeout: float = 30.0) -> dict:
    return _es_request(url, body, "POST", timeout)


def _es_bulk(url: str, lines: list[str], timeout: float = 30.0) -> dict:
    """POST an NDJSON payload to the ``_bulk`` endpoint (its content type is
    newline-delimited JSON, not a JSON document — hence not
    :func:`_es_request`). A whole-request 429/5xx retries with backoff;
    per-ITEM rejections come back inside a 200 response and are handled by
    the caller (:func:`bulk_write_es` re-sends only the rejected items)."""
    import urllib.request

    def _send() -> dict:
        req = urllib.request.Request(
            url,
            data=("\n".join(lines) + "\n").encode(),
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:  # noqa: S310
            return json.loads(r.read().decode())

    return _with_retries(_send)


def es_count(base_url: str, index: str, query: dict | None = None) -> int:
    """Server-side row count ≡ the reference's ``es_client.count``
    (reference src/elastic_surv/dataset.py:241-246), optionally filtered."""
    body = {} if query is None else {"query": query.get("query", query)}
    return int(_es_post(f"{base_url}/{index}/_count", body)["count"])


def es_aggregate(
    base_url: str,
    index: str,
    metrics: dict[str, tuple[str, str]],
    group_by: list[str] | None = None,
    query: dict | None = None,
    page_size: int = 1000,
    **kind_opts,
) -> list[dict]:
    """Run a (grouped) metric aggregation against a live ES ``_search``
    endpoint, paginating the composite aggregation via ``after_key`` until
    exhausted — the transport loop behind eland-style server-side aggs
    (reference src/elastic_surv/dataset.py:228-271). Returns plain row
    dicts; group count is unbounded (composite paginates, unlike terms'
    silent top-N truncation)."""
    rows: list[dict] = []
    after: dict | None = None
    while True:
        body = agg_request(metrics, group_by, query, after, page_size, **kind_opts)
        resp = _es_post(f"{base_url}/{index}/_search", body)
        page, after = parse_agg_response(resp, metrics, group_by)
        rows.extend(page)
        if not group_by or after is None:
            return rows


# --- Spark schema ↔ ES mapping ----------------------------------------------
# The typing seam eland owns for the reference: ``ed.DataFrame`` types its
# columns FROM the index mapping (field_mappings machinery), and
# ``ed.pandas_to_eland`` CREATES the destination index with mappings
# inferred from the frame's dtypes (reference README.md:65-78,
# ``es_if_exists="replace"``). Both directions are pure translations and
# unit-testable without a cluster; ``ensure_index``/``scan_es(schema=None)``
# wire them to the transport.

def _es_to_spark_types() -> dict:
    """ES field type → Spark type instance. half_float/scaled_float widen
    to the nearest Spark type; text and keyword are both strings. Built
    lazily (not at module import) and WITHOUT the DDL parser — pyspark 4's
    ``_parse_datatype_string`` round-trips through the JVM and needs an
    active SparkContext, which a pure translation must not require."""
    from pyspark.sql import types as T

    return {
        "long": T.LongType(), "integer": T.IntegerType(),
        "short": T.ShortType(), "byte": T.ByteType(),
        "unsigned_long": T.DecimalType(20, 0),
        "double": T.DoubleType(), "float": T.FloatType(),
        "half_float": T.FloatType(), "scaled_float": T.DoubleType(),
        "keyword": T.StringType(), "text": T.StringType(),
        "wildcard": T.StringType(), "constant_keyword": T.StringType(),
        "ip": T.StringType(),
        "boolean": T.BooleanType(),
        "date": T.TimestampType(), "date_nanos": T.TimestampType(),
        "binary": T.BinaryType(),
    }


def mapping_to_schema(properties: dict):
    """ES mapping ``properties`` → Spark ``StructType`` (sorted by field
    name — mapping key order is not meaningful). ``object`` fields recurse
    into nested structs. ES has no array type (any field may be
    multi-valued), so multi-valued fields surface as their element type —
    pass an explicit schema to ``scan_es`` when an array column is needed
    (the same caveat the jar connector's
    ``es.read.field.as.array.include`` option exists for)."""
    from pyspark.sql import types as T

    type_map = _es_to_spark_types()
    fields = []
    for name in sorted(properties):
        spec = properties[name]
        if "properties" in spec:  # object → nested struct
            fields.append(T.StructField(name, mapping_to_schema(spec["properties"])))
            continue
        es_type = spec.get("type", "object")
        spark_type = type_map.get(es_type)
        if spark_type is None:
            raise ValueError(
                f"unsupported ES field type {es_type!r} for field {name!r}; "
                "pass an explicit schema to scan_es"
            )
        fields.append(T.StructField(name, spark_type))
    return T.StructType(fields)


def fetch_index_schema(base_url: str, index: str):
    """``GET /{index}/_mapping`` → Spark StructType — lets ``scan_es`` and
    ``SurvFrame.from_es`` type themselves from the index the way eland
    does, instead of requiring a hand-written schema."""
    resp = _es_request(f"{base_url}/{index}/_mapping", {}, method="GET")
    # response is keyed by CONCRETE index name(s): an alias or wildcard
    # resolves to every backing index, and there is no sound way to merge
    # divergent mappings into one scan schema — refuse rather than return
    # an empty/arbitrary StructType that would silently scan zero columns
    if len(resp) != 1:
        raise ValueError(
            f"_mapping for {index!r} resolved to {sorted(resp)[:5]} "
            f"({len(resp)} indices); pass a concrete index name or an "
            "explicit schema"
        )
    (entry,) = resp.values()
    props = entry.get("mappings", {}).get("properties", {})
    if not props:
        raise ValueError(
            f"index {index!r} has no mapped properties; pass an explicit "
            "schema (a scan typed from this mapping would have no columns)"
        )
    return mapping_to_schema(props)


def schema_to_mapping(schema) -> dict:
    """Spark schema (StructType or DDL string) → ES mapping ``properties``.

    Strings map to ES's own dynamic-mapping convention (``text`` with a
    ``keyword`` sub-field) so filters/aggregations on the raw value keep
    working; arrays map to their element type (ES fields are inherently
    multi-valued); structs recurse as ``object`` fields."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    def _field(dt) -> dict:
        if isinstance(dt, T.StructType):
            return {"properties": {f.name: _field(f.dataType) for f in dt.fields}}
        if isinstance(dt, T.ArrayType):
            return _field(dt.elementType)
        if isinstance(dt, T.StringType):
            return {"type": "text", "fields": {"keyword": {"type": "keyword"}}}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return {"type": "date"}
        if isinstance(dt, T.DecimalType):
            return {"type": "double"}
        simple = {
            T.LongType: "long", T.IntegerType: "integer", T.ShortType: "short",
            T.ByteType: "byte", T.DoubleType: "double", T.FloatType: "float",
            T.BooleanType: "boolean", T.BinaryType: "binary",
        }.get(type(dt))
        if simple is None:
            raise ValueError(f"unsupported Spark type for ES mapping: {dt}")
        return {"type": simple}

    return {f.name: _field(f.dataType) for f in schema.fields}


def ensure_index(
    base_url: str,
    index: str,
    schema,
    if_exists: str = "fail",
) -> bool:
    """Create ``index`` with mappings inferred from a Spark schema —
    ≡ the index-creation half of ``ed.pandas_to_eland`` (reference
    README.md:65-78): ``if_exists`` mirrors its ``es_if_exists`` contract
    ("fail" raises when present, "replace" drops and recreates, "append"
    leaves an existing index untouched). Returns True when an index was
    created. Run once driver-side BEFORE ``bulk_write_es`` so N concurrent
    bulk streams index into explicit mappings instead of racing ES's
    dynamic guesses."""
    import urllib.error

    if if_exists not in ("fail", "replace", "append"):
        raise ValueError(f"if_exists must be fail|replace|append, got {if_exists!r}")
    exists = True
    try:
        _es_request(f"{base_url}/{index}", {}, method="GET", retries=0)
    except urllib.error.HTTPError as exc:
        if exc.code != 404:
            raise
        exists = False
    if exists:
        if if_exists == "fail":
            raise RuntimeError(f"ES index {index!r} already exists")
        if if_exists == "append":
            return False
        _es_request(f"{base_url}/{index}", {}, method="DELETE")
    _es_request(
        f"{base_url}/{index}",
        {"mappings": {"properties": schema_to_mapping(schema)}},
        method="PUT",
    )
    return True


def es_agg_df(
    spark: SparkSession,
    base_url: str,
    index: str,
    metrics: dict[str, tuple[str, str]],
    group_by: list[str] | None = None,
    query: dict | None = None,
    page_size: int = 1000,
    max_groups: int = 100_000,
    **kind_opts,
) -> DataFrame:
    """Server-side (grouped) aggregation as a Spark DataFrame — compute in
    the cluster that owns the data, join in Spark.

    The eland pattern behind the reference's dataset statistics
    (reference src/elastic_surv/dataset.py:64-96: counts, cardinality,
    min/max, category discovery) extended to grouped form: ES does the
    aggregation, and the result lands as a DataFrame ready to
    broadcast-join against Spark-side frames (it is dimension-sized by
    contract). The rows DO materialize driver-side — that is the point of
    a server-side aggregate — so ``max_groups`` hard-bounds the collect
    (same discipline as the ≤100k codebook fits in operators/pq.py):
    above it, the right tool is :func:`scan_es` + a distributed
    ``groupBy``, and this raises instead of degrading into a corpus-sized
    driver collect."""
    import pandas as pd

    rows = es_aggregate(
        base_url, index, metrics, group_by, query, page_size, **kind_opts
    )
    if len(rows) > max_groups:
        raise RuntimeError(
            f"es_agg_df returned {len(rows)} groups > max_groups="
            f"{max_groups}; use scan_es + a distributed groupBy for "
            "corpus-sized group-bys"
        )
    cols = list(group_by or []) + list(metrics)
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def scan_slice_pages(
    base_url: str,
    index: str,
    slice_id: int,
    max_slices: int,
    query: dict | None = None,
    fields: list[str] | None = None,
    page_size: int = 1000,
    scroll: str = "2m",
    timeout: float = 30.0,
):
    """Yield pages (lists of ``_source`` dicts) for ONE scroll slice.

    Executor-side loop of the jar-free distributed scan (:func:`scan_es`):
    opens a sliced scroll (``slice: {id, max}`` — ES partitions the index
    server-side so the N readers see disjoint, exhaustive document sets),
    sorts by ``_doc`` (the no-scoring fast path), and pages until the
    server returns an empty hit list. Memory is bounded by ``page_size``
    regardless of slice size.

    Retry semantics differ by request: the initial ``_search?scroll``
    open retries the full transient set (idempotent — a retry opens a
    fresh context, the orphan expires with its TTL), but the CONTINUATION
    retries ONLY HTTP 429 (rejected before processing, cursor provably
    unmoved). A continuation the server processed but whose response was
    lost has already advanced the server-side cursor — retrying it would
    return the NEXT page and silently skip documents, so connection/
    timeout/5xx failures there are fatal for the slice (restart the slice
    scan, or use ``mode='pit'`` where ``search_after`` pages are genuinely
    idempotent — the same reason the official ES clients never retry
    scroll continuations). The scroll context is best-effort deleted on
    exit so server state doesn't linger for the full TTL."""
    body: dict = {"size": page_size, "sort": ["_doc"]}
    if max_slices > 1:  # ES rejects slice.max == 1; a 1-slice scan is plain
        body["slice"] = {"id": slice_id, "max": max_slices}
    if query is not None:
        body["query"] = query.get("query", query)
    if fields:
        body["_source"] = fields
    resp = _es_request(f"{base_url}/{index}/_search?scroll={scroll}", body, timeout=timeout)
    scroll_id = resp.get("_scroll_id")
    try:
        while True:
            hits = resp.get("hits", {}).get("hits", [])
            if not hits:
                return
            if scroll_id is None:
                # a misbehaving proxy/ES response with hits but no cursor
                # would otherwise truncate the scan while looking complete
                raise RuntimeError(
                    f"ES scroll response for {index} slice {slice_id} has "
                    "hits but no _scroll_id; refusing a silently truncated scan"
                )
            yield [h.get("_source", {}) for h in hits]
            resp = _es_request(
                f"{base_url}/_search/scroll",
                {"scroll": scroll, "scroll_id": scroll_id},
                timeout=timeout,
                # non-idempotent: only a 429 leaves the cursor unmoved
                retry_statuses=frozenset({429}),
                retry_connection_errors=False,
            )
            scroll_id = resp.get("_scroll_id", scroll_id)
    finally:
        if scroll_id is not None:
            try:
                _es_request(
                    f"{base_url}/_search/scroll",
                    {"scroll_id": scroll_id},
                    method="DELETE",
                    timeout=timeout,
                    retries=0,  # cleanup must not stall a finishing task
                )
            except Exception:  # noqa: S110 — cleanup is best-effort
                pass


def scan_slice_pages_pit(
    base_url: str,
    index: str,
    slice_id: int,
    max_slices: int,
    query: dict | None = None,
    fields: list[str] | None = None,
    page_size: int = 1000,
    keep_alive: str = "2m",
    timeout: float = 30.0,
):
    """Yield pages for ONE slice via point-in-time + ``search_after`` —
    the ES 8 replacement for the deprecated scroll API (the reference pins
    eland 7.14.1b1 / ES 7.x, reference setup.cfg:30, so scroll is its
    parity path; this is the forward-compat variant).

    Same contract as :func:`scan_slice_pages`: disjoint + exhaustive
    slices, ``page_size``-bounded memory, server-side query/``_source``
    pushdown, transient-failure retries (safe — PIT pages are idempotent
    reads keyed by ``search_after``, which only advances after a page is
    received), best-effort PIT close on exit. Sorts by ``_shard_doc``,
    the PIT-scoped tie-breaker ES recommends for no-scoring pagination."""
    pit_id = _es_request(
        f"{base_url}/{index}/_pit?keep_alive={keep_alive}", {}, timeout=timeout
    )["id"]
    try:
        after: list | None = None
        while True:
            body: dict = {
                "size": page_size,
                "sort": [{"_shard_doc": "asc"}],
                "pit": {"id": pit_id, "keep_alive": keep_alive},
            }
            if max_slices > 1:
                body["slice"] = {"id": slice_id, "max": max_slices}
            if query is not None:
                body["query"] = query.get("query", query)
            if fields:
                body["_source"] = fields
            if after is not None:
                body["search_after"] = after
            resp = _es_request(f"{base_url}/_search", body, timeout=timeout)
            pit_id = resp.get("pit_id", pit_id)  # ES may refresh the id
            hits = resp.get("hits", {}).get("hits", [])
            if not hits:
                return
            last_sort = hits[-1].get("sort")
            if last_sort is None:
                raise RuntimeError(
                    f"ES PIT page for {index} slice {slice_id} has hits "
                    "without sort values; cannot paginate with search_after"
                )
            yield [h.get("_source", {}) for h in hits]
            after = last_sort
    finally:
        try:
            _es_request(
                f"{base_url}/_pit",
                {"id": pit_id},
                method="DELETE",
                timeout=timeout,
                retries=0,  # cleanup must not stall a finishing task
            )
        except Exception:  # noqa: S110 — cleanup is best-effort
            pass


def suggest_slices(
    base_url: str,
    index: str,
    query: dict | None = None,
    docs_per_slice: int = 500_000,
    max_slices: int = 256,
) -> int:
    """Pick a slice count for :func:`scan_es` from the (filtered) index
    size: ``ceil(count / docs_per_slice)`` clamped to [1, max_slices].

    A hardcoded slice count is wrong at both ends of the scale — 8 slices
    over a 4-billion-doc index makes half-billion-doc partitions (straggler
    tasks, no parallelism headroom), while 64 slices over 10k docs pays 64
    scroll-context opens for nothing. One ``_count`` round-trip (the same
    server-side count the reference's ``len(dataset)`` issues,
    reference src/elastic_surv/dataset.py:241-246) sizes the scan instead.
    ``max_slices`` bounds ES-side slice state; ES docs recommend keeping
    slices near the shard count — cap accordingly if the index layout is
    known."""
    import math

    n = es_count(base_url, index, query)
    return max(1, min(int(max_slices), math.ceil(n / max(1, int(docs_per_slice)))))


def scan_es(
    spark: SparkSession,
    base_url: str,
    index: str,
    schema=None,
    slices: int = 8,
    query: dict | None = None,
    fields: list[str] | None = None,
    page_size: int = 1000,
    scroll: str = "2m",
    mode: str = "scroll",
) -> DataFrame:
    """Distributed, jar-free document scan: one Spark partition per ES slice.

    The document-pull path of the reference's ``ESDataset`` (reference
    src/elastic_surv/dataset.py:228-271 — eland streams ``_source`` docs out
    of the index) re-expressed for Spark WITHOUT the elasticsearch-hadoop
    connector: ``spark.range(slices)`` plants exactly one slice id per
    partition (no shuffle), and ``mapInPandas`` streams that slice through
    the stdlib HTTP transport in ``page_size`` Arrow batches. Scales
    horizontally — N slices → N parallel executor-side readers, ES
    partitions the index disjointly server-side — with per-reader memory
    bounded by ``page_size``. ``query`` (from :func:`filters_to_es_query`)
    filters server-side; ``fields`` prunes ``_source`` server-side, the
    same pushdowns the jar connector derives from Catalyst.

    ``schema`` is a ``StructType`` or DDL string — or None to type the
    scan from the index's own mapping (``GET /{index}/_mapping`` →
    :func:`mapping_to_schema`, the eland self-typing behavior); documents
    missing a field surface it as NULL. ``mode`` picks the pagination API: ``"scroll"``
    (sliced scroll — parity with the reference's ES 7.x pin) or ``"pit"``
    (point-in-time + ``search_after``, the ES 8 path where scroll is
    deprecated); both yield the same document set. At 100 TB this is the
    scale story the config-only ``es_reader`` can't test-drive in this
    harness: the whole read path (slicing, paging, pushdown, retries,
    Arrow batching) runs under pytest against a canned stub server
    (tests/test_elastic_transport.py)."""
    from pyspark.sql import types as T

    if schema is None:
        schema = fetch_index_schema(base_url, index)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if mode not in ("scroll", "pit"):
        raise ValueError(f"scan_es mode must be 'scroll' or 'pit', got {mode!r}")
    names = [f.name for f in schema.fields]
    n_slices = int(slices)
    q, flds, psize, scr = query, list(fields) if fields else None, int(page_size), scroll

    def _pull(batches):
        import pandas as pd

        for pdf in batches:
            for sid in pdf["id"].tolist():
                if mode == "pit":
                    pages = scan_slice_pages_pit(
                        base_url, index, int(sid), n_slices, q, flds, psize, scr
                    )
                else:
                    pages = scan_slice_pages(
                        base_url, index, int(sid), n_slices, q, flds, psize, scr
                    )
                for page in pages:
                    # dict-of-object-lists: absent keys become None → NULL,
                    # Arrow infers per-column types from the schema cast
                    yield pd.DataFrame(
                        {n: pd.Series([d.get(n) for d in page], dtype=object) for n in names}
                    )

    slice_ids = spark.range(0, n_slices, 1, numPartitions=n_slices)
    return slice_ids.mapInPandas(_pull, schema=schema)


def bulk_write_es(
    df: DataFrame,
    base_url: str,
    index: str,
    id_col: str | None = None,
    batch_docs: int = 500,
) -> int:
    """Distributed, jar-free bulk upload — ≡ ``ed.pandas_to_eland`` (the
    reference's demo-data upload, README.md:65-78) re-expressed for Spark
    without the connector jar: every partition streams its rows to the ES
    ``_bulk`` NDJSON endpoint in ``batch_docs``-document requests through
    the stdlib transport. Returns the total number of documents indexed
    (the per-partition acks are summed JVM-side, so the driver never sees
    row data). ``id_col`` routes a column to ``_id`` for idempotent
    re-writes (re-running upserts instead of duplicating); NULL/NaN/NaT/NA
    values are dropped from each document the way JSON uploads drop
    missing fields. Per-item transient rejections (429 back-pressure —
    routine on a real cluster under exactly the N-concurrent-streams load
    this writer creates) re-send ONLY the rejected documents with
    exponential backoff; non-retryable item errors (400 mapping failures)
    and exhausted retries raise — silent partial ingestion is the one
    failure mode a writer can't have. Scales horizontally: N partitions →
    N concurrent bulk streams, each bounded by ``batch_docs``."""
    import pandas as pd

    cols = df.columns

    def _flush(lines: list[str], acked: int) -> int:
        """Send one bulk request, re-sending per-item-rejected documents.

        Safe under ``_id`` routing (a re-sent accepted document upserts,
        no duplicates) and at-least-once without it — the same contract
        the official elasticsearch-py bulk helpers document. The re-send
        sleep is the SAME jittered backoff as :func:`_with_retries`
        (:func:`_backoff_sleep`): per-item 429s are exactly the
        back-pressure signal every concurrent writer sees at once, and an
        un-jittered schedule would re-synchronize N bulk streams into
        repeating retry waves against the recovering node. A per-item
        ``retry_after`` (seconds), where the server supplies one, wins
        over the computed backoff."""
        if not lines:
            return acked
        pending = lines
        for attempt in range(DEFAULT_RETRIES + 1):
            resp = _es_bulk(f"{base_url}/_bulk", pending)
            if not resp.get("errors"):
                return acked + len(pending) // 2
            items = resp.get("items", [])
            if len(items) != len(pending) // 2:
                raise RuntimeError(
                    f"ES bulk indexing reported errors but returned "
                    f"{len(items)} item results for {len(pending) // 2} "
                    "documents; cannot attribute rejections"
                )
            retry_lines: list[str] = []
            fatal: list[dict] = []
            retry_after: float | None = None
            for i, item in enumerate(items):
                result = next(iter(item.values()))
                status = result.get("status", 200)
                if status < 300:
                    acked += 1
                elif status in RETRYABLE_STATUSES:
                    retry_lines.extend(pending[2 * i : 2 * i + 2])
                    try:  # honor the largest server-stated recovery horizon
                        ra = float(result["retry_after"])
                        retry_after = max(retry_after or 0.0, ra)
                    except (KeyError, TypeError, ValueError):
                        pass
                else:
                    fatal.append(item)
            if fatal:
                raise RuntimeError(
                    f"ES bulk indexing reported errors (non-retryable), "
                    f"e.g. {fatal[:3]}"
                )
            if not retry_lines:
                return acked
            pending = retry_lines
            if attempt < DEFAULT_RETRIES:
                _backoff_sleep(attempt, retry_after=retry_after)
        raise RuntimeError(
            f"ES bulk indexing reported errors after {DEFAULT_RETRIES} "
            f"retries: {len(pending) // 2} documents still rejected"
        )

    def _push(batches):
        acked = 0
        lines: list[str] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                doc = {}
                for k, v in rec.items():
                    if v is None:
                        continue
                    # every pandas missing sentinel (NaN, NaT, pd.NA) ≡
                    # absent field; sized values (strings, lists, arrays)
                    # can't be scalar-NA and would make pd.isna ambiguous
                    if not hasattr(v, "__len__") and pd.isna(v):
                        continue
                    if hasattr(v, "tolist"):  # numpy scalar/array → python
                        v = v.tolist()
                    doc[k] = v
                action: dict = {"index": {"_index": index}}
                if id_col is not None:
                    action["index"]["_id"] = str(rec[id_col])
                lines.append(json.dumps(action))
                lines.append(json.dumps(doc, default=str))
                if len(lines) >= 2 * batch_docs:
                    acked = _flush(lines, acked)
                    lines = []
        acked = _flush(lines, acked)
        yield pd.DataFrame({"indexed": [acked]})

    from pyspark.sql import functions as F

    acks = df.select(cols).mapInPandas(_push, schema="indexed long")
    total = acks.agg(F.sum("indexed").alias("n")).collect()[0]["n"]
    return int(total or 0)


def upload_frame(
    df: DataFrame,
    base_url: str,
    index: str,
    if_exists: str = "fail",
    id_col: str | None = None,
    batch_docs: int = 500,
) -> int:
    """One-call ``ed.pandas_to_eland`` twin (reference README.md:65-78):
    create the index with mappings inferred from the frame's schema
    (:func:`ensure_index`, ``if_exists`` ≡ ``es_if_exists`` — default
    ``"fail"``, matching ``pandas_to_eland``: destroying an existing index
    is an explicit ``"replace"`` opt-in, never a default), then stream the
    rows in via the distributed ``_bulk`` writer (:func:`bulk_write_es` —
    per-partition NDJSON streams, per-item 429 retries). Returns the
    indexed-document count."""
    ensure_index(base_url, index, df.schema, if_exists=if_exists)
    return bulk_write_es(df, base_url, index, id_col=id_col, batch_docs=batch_docs)


def es_reader(
    spark: SparkSession,
    index_pattern: str,
    nodes: str = "localhost",
    port: int = 9200,
    fields: list[str] | None = None,
    query: dict | None = None,
) -> DataFrameReader:
    """Configured ES reader ≡ ``ESDataset(es_index_pattern, es_client=...)``.

    ``fields`` maps to ES source filtering (the pushdown eland applies for
    column selection); equality/range filters on the resulting DataFrame
    push down as ES query DSL via the connector. ``query`` (a dict from
    :func:`filters_to_es_query`) pre-filters server-side via ``es.query``.
    """
    r = spark.read.format(ES_FORMAT)
    for k, v in es_options(index_pattern, nodes, port, fields, query).items():
        r = r.option(k, v)
    return r


def es_options(
    index_pattern: str,
    nodes: str = "localhost",
    port: int = 9200,
    fields: list[str] | None = None,
    query: dict | None = None,
) -> dict[str, str]:
    """The connector option map ``es_reader`` applies (pure, testable)."""
    opts = {
        "es.nodes": nodes,
        "es.port": str(port),
        "es.resource": index_pattern,
        "es.read.field.as.array.include": "",
    }
    if fields:
        opts["es.read.source.filter"] = ",".join(fields)
    if query is not None:
        opts["es.query"] = json.dumps(query)
    return opts


def read_es(
    spark: SparkSession,
    index_pattern: str,
    nodes: str = "localhost",
    port: int = 9200,
    fields: list[str] | None = None,
) -> DataFrame:
    """Lazy DataFrame over an ES index (requires the connector jar)."""
    return es_reader(spark, index_pattern, nodes, port, fields).load()


def write_es(
    df: DataFrame,
    index: str,
    nodes: str = "localhost",
    port: int = 9200,
    mode: str = "overwrite",
) -> None:
    """≡ ``ed.pandas_to_eland(df, es_client, es_dest_index,
    es_if_exists="replace")`` (reference README.md:65-78)."""
    (
        df.write.format(ES_FORMAT)
        .option("es.nodes", nodes)
        .option("es.port", str(port))
        .option("es.resource", index)
        .mode(mode)
        .save()
    )
