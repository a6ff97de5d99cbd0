"""ElasticSearch source/sink — parity with the reference's primary backend.

The reference streams training data out of an ES index via eland
(``ESDataset``, reference src/elastic_surv/dataset.py:228-271, construction
at 260) and uploads demo frames with ``ed.pandas_to_eland`` (README.md:65-78).
Spark's equivalent is the elasticsearch-hadoop DataSource
(``org.elasticsearch.spark.sql``): the scan is lazy, and Catalyst pushes
column pruning and predicates down as ES queries — the same role eland's
query compiler plays.

The connector jar and a live cluster are not present in this harness, so
these helpers build fully-configured readers/writers (testable) and fail
with a clear message only at ``.load()``/``.save()`` time. Swap in the
parquet source (sources/parquet.py) everywhere else in the repo.
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

    def __init__(self, col: str, values) -> None:  # tolerate lists
        object.__setattr__(self, "col", col)
        object.__setattr__(self, "values", tuple(values))


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
