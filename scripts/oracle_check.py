"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
duckdb at the given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, floats kept at full precision — the queries themselves round).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from elastic_surv_spark.session import get_spark
from elastic_surv_spark.sources.parquet import TABLES, table_path


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canonical(spark_pdf), canonical(duck_pdf)
    # dtype-drift gate: the driver hashes raw values, so an int64 column on one
    # side vs float64 on the other (DuckDB sum(INTEGER)->HUGEINT->float64)
    # hash-fails even when values are equal. Catch it here, pre-driver.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ("f" in (ka, kb)) and ({ka, kb} & set("iu")):
            problems.append(
                f"col {c}: dtype drift — spark kind={ka!r} ({a[c].dtype}) vs "
                f"duck kind={kb!r} ({b[c].dtype}); driver hash would fail even "
                f"on equal values (CAST the oracle output)"
            )
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                av = av.astype(float)
                bv = bv.astype(float)
                neq = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
                if neq.any():
                    i = int(neq.argmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={av[i]!r} duck={bv[i]!r} (diff={av[i]-bv[i]!r})"
                    )
            else:
                neq = av != bv
                if hasattr(neq, "any") and neq.any():
                    i = int(neq.argmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={av[i]!r} duck={bv[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    spark = get_spark("oracle-check")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_pdf)})")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"  - {p}")
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows)")
    spark.stop()
    print("RESULT:", "FAIL" if failures else "PASS", f"({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
