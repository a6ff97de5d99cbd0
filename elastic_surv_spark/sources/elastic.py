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

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

ES_FORMAT = "org.elasticsearch.spark.sql"


def es_reader(
    spark: SparkSession,
    index_pattern: str,
    nodes: str = "localhost",
    port: int = 9200,
    fields: list[str] | None = None,
) -> DataFrameReader:
    """Configured ES reader ≡ ``ESDataset(es_index_pattern, es_client=...)``.

    ``fields`` maps to ES source filtering (the pushdown eland applies for
    column selection); equality/range filters on the resulting DataFrame
    push down as ES query DSL via the connector.
    """
    r = (
        spark.read.format(ES_FORMAT)
        .option("es.nodes", nodes)
        .option("es.port", str(port))
        .option("es.resource", index_pattern)
        .option("es.read.field.as.array.include", "")
    )
    if fields:
        r = r.option("es.read.source.filter", ",".join(fields))
    return r


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
