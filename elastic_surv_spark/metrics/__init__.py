from elastic_surv_spark.metrics.km import km_curve  # noqa: F401
from elastic_surv_spark.metrics.logrank import logrank_test  # noqa: F401
