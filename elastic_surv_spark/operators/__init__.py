from elastic_surv_spark.operators.asof import asof_join  # noqa: F401
from elastic_surv_spark.operators.dedup import exact_dedup  # noqa: F401
from elastic_surv_spark.operators.sessionize import sessionize  # noqa: F401
from elastic_surv_spark.operators.similarity import cosine_topk  # noqa: F401
