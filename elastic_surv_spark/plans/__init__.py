from elastic_surv_spark.plans.queries import REGISTRY, QuerySpec  # noqa: F401
