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

    # Warmup: touch every table once (file listing, parquet footers, JIT of
    # the scan path) so per-query timings measure the plans, not first-use
    # JVM costs. Standard steady-state benchmarking; queries still run cold
    # w.r.t. their own codegen and shuffles.
    from elastic_surv_spark.sources.parquet import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        # Local mode runs driver+executor in ONE JVM: without a nudge the
        # 48g heap GCs rarely, ContextCleaner lags, and stale shuffle/
        # broadcast blocks from earlier queries degrade later ones by 2-5×.
        # Forced GC between measurements = standard benchmark hygiene.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
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
