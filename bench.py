"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}. Execution is measured with the noop sink
(full plan runs, no driver-side materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elastic_surv_spark.plans.queries import REGISTRY
from elastic_surv_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("elastic-surv-spark-bench")

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)  # build plan (lazy)
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
