from elastic_surv_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
    table_path,
)

# jar-free ES transport surface (stub-server-tested; sources/elastic.py)
from elastic_surv_spark.sources.elastic import (  # noqa: F401
    bulk_write_es,
    ensure_index,
    es_agg_df,
    es_aggregate,
    es_count,
    fetch_index_schema,
    filters_to_es_query,
    scan_es,
    suggest_slices,
    upload_frame,
)
