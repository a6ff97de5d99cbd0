"""Dump .explain("formatted") for every registry query to a directory.

Usage: python scripts/dump_plans.py <out_dir> [suffix] [sf_dir] [query ...]

Writes <out_dir>/<name>_<suffix>.txt per query (suffix default "before") and
prints a JSON line {name: construction_seconds} so plan-construction cost can
be ranked (guide §1: measure first). EAGER_FN_ROWS are skipped for explain
(their fn() IS the product work — explain would train models just to print a
LocalRelation) unless explicitly named.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EAGER_FN_ROWS  # noqa: E402
from elastic_surv_spark.plans.queries import REGISTRY  # noqa: E402
from elastic_surv_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    times: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if not only and name in EAGER_FN_ROWS:
            continue
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"CONSTRUCT ERROR {name}: {exc}", file=sys.stderr)
            continue
        times[name] = round(time.perf_counter() - t0, 3)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
    print(json.dumps(times, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
