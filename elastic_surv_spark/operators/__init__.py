from elastic_surv_spark.operators.asof import asof_join  # noqa: F401
from elastic_surv_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    fingerprint_dedup,
    incremental_dedup,
)
from elastic_surv_spark.operators.dedup_fuzzy import (  # noqa: F401
    band_index,
    incremental_near_dedup,
)
from elastic_surv_spark.operators.semdedup import semantic_dedup  # noqa: F401
from elastic_surv_spark.operators.sessionize import sessionize  # noqa: F401
from elastic_surv_spark.operators.similarity import cosine_topk  # noqa: F401
