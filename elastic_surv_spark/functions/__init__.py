from elastic_surv_spark.functions.featurize import OneHotFeaturizer  # noqa: F401
