from elastic_surv_spark.metrics.km import km_curve  # noqa: F401
