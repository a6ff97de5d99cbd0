from elastic_surv_spark.models.cox_ph import CoxPHModel  # noqa: F401
from elastic_surv_spark.models.deephit import DeepHitModel  # noqa: F401
from elastic_surv_spark.models.logistic_hazard import LogisticHazardModel  # noqa: F401
from elastic_surv_spark.models.aft import AFTBaselineModel  # noqa: F401
from elastic_surv_spark.models.serde import (  # noqa: F401
    load_model,
    model_from_dict,
    model_from_json,
    model_to_dict,
    model_to_json,
    save_model,
)
from elastic_surv_spark.models.grouped import fit_per_group  # noqa: F401
