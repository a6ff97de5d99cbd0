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

#: Rows whose PRODUCT work is driver-coordinated iteration inside fn()
#: (per-step integer-GD collects): the returned frame is a ~21-row local
#: table, so the standard clock (write only) would measure nothing — a
#: 4-5 s training row would read 0.2 s. For these rows the clock covers
#: fn() + write. This is NOT the codebook-fit/setup class the standard
#: methodology excludes (there the measured plan is the product; here the
#: fn-side loop IS the product). Applied from the row's FIRST board, so
#: no historical comparability breaks.
EAGER_FN_ROWS = {
    "certified_quality_training",
    "certified_quality_eval",
    "certified_quality_training_batched",
    "certified_fold_run",
}


def time_e2e_stages(spark, sf_dir: str) -> dict[str, float]:
    """Cumulative-prefix timing of llm_data_pipeline_e2e's stages
    (SPARK_GRAFT_E2E_STAGES=1): runs the pipeline cut off after each stage
    and reports per-stage deltas, so the bench shows WHERE the flagship
    query's time goes (scan+quality / exact dedup / minhash near-dup /
    chunk+agg) rather than one opaque number."""
    from pyspark.sql import functions as F

    from elastic_surv_spark.functions.text import quality_score, token_count
    from elastic_surv_spark.operators.dedup import fingerprint_dedup
    from elastic_surv_spark.operators.dedup_fuzzy import minhash_lsh_pairs
    from elastic_surv_spark.sources.parquet import load_table

    def quality(d):
        return d.filter(quality_score(F.col("text")) >= 0.5)

    def exact(d):
        kept = fingerprint_dedup(quality(d), "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        )
        return quality(d).join(kept, "doc_id", "left_semi")

    def near(d):
        s0 = exact(d)
        drop = (
            minhash_lsh_pairs(s0, "doc_id", "text", n=3, k=16, bands=8, threshold=0.5)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        return s0.join(drop, "doc_id", "left_anti")

    def full(d):
        return (
            near(d)
            .select(
                "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
            )
            .select(
                "doc_id", "lang", "n_tokens",
                (F.floor((F.greatest(F.col("n_tokens") - 5, F.lit(1)) - 1) / 15) + 1)
                .cast("int").alias("n_chunks"),
            )
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("n_tokens"),
                F.sum("n_chunks").cast("long").alias("n_chunks"),
            )
        )

    cuts = [("scan_quality", quality), ("exact_dedup", exact),
            ("near_dup", near), ("chunk_agg", full)]
    out: dict[str, float] = {}
    prev = 0.0
    for name, fn in cuts:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        d = load_table(spark, sf_dir, "documents")
        start = time.perf_counter()
        fn(d).write.format("noop").mode("overwrite").save()
        cum = time.perf_counter() - start
        out[name] = round(max(cum - prev, 0.0), 3)
        prev = cum
    out["total"] = round(prev, 3)
    return out


def solo_main(sf_dir: str, names: list[str]) -> None:
    """`bench.py --solo <sf_dir> <query...>`: cold/warm pairs in a FRESH
    process — the attribution ground truth for in-bench numbers, which
    swing ±3× on identical plans from shared-JVM pressure
    (SOLO_BENCH_r05/r06). Prints one JSON line {name: {solo_cold,
    solo_warm}}; cold = first execution after the table-touch warmup,
    warm = best of 2 repeats (the key is omitted when no warm repeat
    succeeded — a null would break consumers that expect a number).
    Session-shared subplan caches are released BETWEEN names so every
    cold number pays its family build cost, the way a fresh session
    would — without this, the first dedup-family member builds the shared
    shingle frame and later members read a cache hit masquerading as a
    cold measurement (the r7 `ngram_jaccard_dupes solo_cold 0.052 s`
    artifact). For shared-subplan family members the payload additionally
    carries the DECOMPOSITION: `family_stages` (per-stage wall seconds —
    e.g. tokenize / exact_pairs / signatures — re-measured from a second
    released-cache state after the timed runs) and their sum
    `family_build_s`, so a reader can split `solo_cold` into
    family-build cost vs the row's own plan (the r8 driver-box 38.8 s
    simhash cold was ~36 s of family build shared with 3 other rows)."""
    from elastic_surv_spark.plans.queries import (
        family_stages,
        release_shared_caches,
    )
    from elastic_surv_spark.sources.parquet import TABLES, load_table

    spark = get_spark("elastic-surv-spark-solo")
    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    res: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        release_shared_caches()  # each name starts family-cold
        runs: list[float] = []
        for _ in range(3):
            try:
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                if name in EAGER_FN_ROWS:
                    start = time.perf_counter()
                    df = spec.fn(spark, sf_dir)  # the work happens here
                else:
                    df = spec.fn(spark, sf_dir)
                    start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            except Exception as exc:  # pragma: no cover - defensive
                print(f"SOLO ERROR {name}: {exc}", file=sys.stderr)
                break  # keep whatever repeats already succeeded
        if not runs:
            continue
        res[name] = {
            # the cold number is the attribution ground truth — report it
            # even when a later warm repeat died
            "solo_cold": round(runs[0], 3),
        }
        if len(runs) > 1:
            res[name]["solo_warm"] = round(min(runs[1:]), 3)
        stages = family_stages(name)
        if stages:
            release_shared_caches()  # re-measure the build from cold
            decomp: dict[str, float] = {}
            try:
                for label, build in stages:
                    s0 = time.perf_counter()
                    build(spark, sf_dir)
                    decomp[label] = round(time.perf_counter() - s0, 3)
                res[name]["family_stages"] = decomp
                res[name]["family_build_s"] = round(sum(decomp.values()), 3)
            except Exception as exc:  # pragma: no cover - defensive
                print(f"SOLO FAMILY ERROR {name}: {exc}", file=sys.stderr)
    print(json.dumps(res, separators=(",", ":")))
    sys.stdout.flush()
    spark.stop()


def _solo_attribution(sf_dir: str, names: list[str]) -> dict[str, dict]:
    """Run solo mode ONE SUBPROCESS PER QUERY (fresh JVM each) and merge
    the JSON lines. One process per name is what makes the cold numbers
    honest: shared-subplan family members in a single process would read
    each other's persisted frames (the r7 measurement defect) — and a
    fresh JVM additionally resets codegen/broadcast state. Failures
    degrade to {} — attribution must never sink the bench, and a wall-
    clock budget (SPARK_GRAFT_SOLO_BUDGET_S, default 420) stops launching
    further subprocesses on a slow machine: partial attribution beats a
    bench run the driver gives up on."""
    import subprocess

    try:
        budget = float(os.environ.get("SPARK_GRAFT_SOLO_BUDGET_S", "420"))
    except ValueError:
        budget = 420.0
    t0 = time.perf_counter()
    merged: dict[str, dict] = {}
    for name in names:
        if time.perf_counter() - t0 > budget:
            print(
                f"SOLO BUDGET: skipped {name} and later names", file=sys.stderr
            )
            break
        cmd = [sys.executable, os.path.abspath(__file__), "--solo", sf_dir, name]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
            for line in reversed(out.stdout.strip().splitlines()):
                try:
                    parsed = json.loads(line)
                    if isinstance(parsed, dict):
                        merged.update(parsed)
                        break
                except ValueError:
                    continue
        except Exception as exc:  # pragma: no cover - defensive
            print(f"SOLO SUBPROCESS ERROR {name}: {exc}", file=sys.stderr)
    return merged


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
    # Absorb whole-stage-codegen JIT (janino compile + C2 warmup of the
    # agg/join/exchange pipelines) so the FIRST timed query isn't charged
    # ~2s of one-time JVM cost the rest never pay.
    try:
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.groupBy("l_returnflag")
            .count()
            .join(li.select("l_returnflag").distinct(), "l_returnflag")
            .write.format("noop").mode("overwrite").save()
        )
    except Exception:
        pass

    # SPARK_GRAFT_BENCH_FIRST=<query> times that query before the rest —
    # the attribution knob for in-bench-vs-solo gaps (a query that is slow
    # late in the board but fast when first is suffering shared-JVM
    # pressure from its predecessors, not a plan regression).
    order = list(REGISTRY.items())
    # Default: the flagship e2e pipeline runs FIRST. Measured r6: it prints
    # 10.8-12.1 s when late in a 119-query board vs 5.2 s first in the SAME
    # JVM on a byte-identical plan — pure predecessor GC debt/stragglers.
    # First-position gives the one headline query an uninflated number (and
    # the board ~10% total, 129.2 -> 116.6 s; SOLO_BENCH_r06.md).
    first = os.environ.get("SPARK_GRAFT_BENCH_FIRST", "llm_data_pipeline_e2e")
    if first and first in REGISTRY:
        order.sort(key=lambda kv: kv[0] != first)

    from elastic_surv_spark.plans.queries import (
        family_stages,
        release_shared_caches,
    )

    # Untimed throwaway of the first board query (r9 What's-wrong #3): the
    # table/codegen warmups above never exercise the Python-worker/Arrow
    # pipeline, so the first TIMED query used to absorb ~15 s of one-time
    # JVM+Python cost (llm_data_pipeline_e2e read 23.0 s in-bench vs its
    # own 5.6 s solo cold). Running that exact plan once before the clock
    # pays the process-level cost; the shared family caches it builds are
    # released so run 1 still pays the family build a fresh session would.
    if order:
        try:
            order[0][1].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        release_shared_caches()

    errors: dict[str, str] = {}
    # Plans are immutable DataFrames: constructing the ~150 lazy plans costs
    # ~100 s of driver-side wall PER RUN (Catalyst analysis + the few
    # construction-time probes — r14's measured decomposition), which is why
    # 3 board repeats stopped fitting the default budget. Repeat runs reuse
    # run 1's DataFrame objects (VERDICT r14 #4): the timed region — the
    # noop write, which re-optimizes, re-plans and re-executes the plan —
    # is UNCHANGED, so per-query values stay methodology-identical; only
    # the untimed per-run re-construction disappears. Two classes must
    # still rebuild every run: EAGER_FN_ROWS (their fn() IS the product)
    # and shared-subplan family rows (release_shared_caches() between runs
    # unpersists their backbone frames; re-running fn() is what re-registers
    # the persisted frames so the timed run pays the same family build a
    # fresh session would — reusing the old DataFrame would silently
    # recompute the whole family INSIDE the timed region instead).
    plan_cache: dict = {}
    # Untimed plan-construction seconds actually SAVED by plan_cache in
    # later runs (only fn() calls whose DataFrame got cached count — EAGER
    # rows and family rows rebuild every run, so their construction is
    # re-paid and must stay in the repeat-cost estimate). Used by the
    # budget planner below: run 1's wall uniquely carries this one-time
    # cost, so planning repeats off the raw run-1 wall under-planned a
    # slow box to a single cold run (the r15 driver board read 1/3 runs —
    # the worst possible sample; VERDICT r15 #2).
    cached_construction_s = 0.0

    def run_board() -> dict[str, float]:
        nonlocal cached_construction_s
        timings: dict[str, float] = {}
        for name, spec in order:
            # Local mode runs driver+executor in ONE JVM: without a nudge
            # the 48g heap GCs rarely, ContextCleaner lags, and stale
            # shuffle/broadcast blocks from earlier queries degrade later
            # ones by 2-5×. Forced GC between measurements = standard
            # benchmark hygiene.
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            # One broken query must not sink the whole bench (a round-3
            # schema drift in the testdata crashed the run before any JSON
            # printed). Timing starts AFTER plan construction — same
            # methodology as every prior round's baseline (fn-side driver
            # work like iterative clustering or codebook fits is setup,
            # not the measured plan) — EXCEPT the EAGER_FN_ROWS, whose
            # product work runs inside fn() (see the constant's note).
            try:
                if name in EAGER_FN_ROWS:
                    start = time.perf_counter()
                    df = spec.fn(spark, sf_dir)  # the work happens here
                else:
                    df = plan_cache.get(name)
                    if df is None:
                        c0 = time.perf_counter()
                        df = spec.fn(spark, sf_dir)  # build plan (lazy)
                        if not family_stages(name):
                            plan_cache[name] = df
                            cached_construction_s += time.perf_counter() - c0
                    start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - start, 3)
            except Exception as exc:  # pragma: no cover - defensive
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
        return timings

    # Median-of-N board: back-to-back totals on IDENTICAL code span ±8%+
    # (r7: 99.1–136.3 s), larger than most round-over-round deltas, so a
    # single-run headline is machine weather. Run the board N times
    # (SPARK_GRAFT_BOARD_RUNS, default 3), publish the MEDIAN total with
    # every individual total in the payload, and take per-query medians for
    # the breakdown. Session-shared subplan caches are released between
    # runs so each run pays the family build cost a fresh board would; the
    # JVM itself stays warm (that bias is shared by all repeats and is the
    # price of not paying 3× startup). A wall-clock budget
    # (SPARK_GRAFT_BOARD_BUDGET_S, default 900 — board repeats ONLY, solo
    # attribution has its own SPARK_GRAFT_SOLO_BUDGET_S) skips remaining
    # repeats when a run is slow enough that N repeats risk the driver's
    # patience. Budget prediction uses each run's measured WALL time (plan
    # construction + inter-query GC included), not the sum of per-query
    # timings — r8's sum-based estimate under-read run cost by ~50% and a
    # 600 s budget truncated a "median of 3" to 2 samples without saying
    # so; the payload now carries runs_planned/budget_exhausted so a
    # truncated median is visible from the JSON alone.
    from statistics import median

    try:
        board_runs = max(1, int(os.environ.get("SPARK_GRAFT_BOARD_RUNS", "3")))
    except ValueError:
        board_runs = 1
    try:
        board_budget = float(os.environ.get("SPARK_GRAFT_BOARD_BUDGET_S", "900"))
    except ValueError:
        board_budget = 900.0
    bench_start = time.perf_counter()
    runs: list[dict[str, float]] = []
    budget_exhausted = False
    last_wall = 0.0
    runs_planned = board_runs
    for i in range(board_runs):
        if i > 0:
            elapsed = time.perf_counter() - bench_start
            # Honest re-plan from the LAST run's MEASURED wall (r9 task #5,
            # revised r15/r16): run 1 uniquely pays the one-time plan
            # construction that later runs no longer do (the board reuses
            # constructed DataFrames), so a repeat run's expected wall is
            # run 1's wall MINUS the measured construction seconds the
            # plan cache absorbed (VERDICT r15 #2 — the raw run-1 wall
            # under-planned a slow box to one cold run). From run 2 on the
            # last wall IS a repeat wall and is used as-is. Re-estimate
            # after every run and announce each change, so the final plan
            # always equals what was delivered unless a mid-board slowdown
            # truncated it (that stays a visible budget_exhausted).
            repeat_est = last_wall - (cached_construction_s if i == 1 else 0.0)
            if repeat_est > 0:
                feasible = i + int(
                    max(board_budget - elapsed, 0.0) // (1.1 * repeat_est)
                )
                new_plan = max(1, min(board_runs, feasible))
                if new_plan != runs_planned:
                    print(
                        f"BOARD PLAN: {new_plan}/{board_runs} run(s) fit "
                        f"the {board_budget:.0f}s budget (run {i} wall "
                        f"{last_wall:.0f}s, repeat estimate "
                        f"{repeat_est:.0f}s)",
                        file=sys.stderr,
                    )
                    runs_planned = new_plan
            if i >= runs_planned:
                break
            if repeat_est > 0 and elapsed + 1.1 * repeat_est > board_budget:
                # a mid-board slowdown below even the announced plan IS a
                # truncation — keep it visible
                budget_exhausted = True
                print(
                    f"BOARD BUDGET: stopping after {i} run(s) "
                    f"({elapsed:.0f}s elapsed, last run {last_wall:.0f}s wall)",
                    file=sys.stderr,
                )
                break
            release_shared_caches()  # each repeat pays the family builds
        wall0 = time.perf_counter()
        runs.append(run_board())
        last_wall = time.perf_counter() - wall0
        # wall vs sum-of-timed decomposition per run (construction + GC +
        # teardown live in the gap) — stderr only, the JSON line is sacred
        print(
            f"BOARD RUN {i + 1}: wall {last_wall:.1f}s, "
            f"timed {sum(runs[-1].values()):.1f}s"
            + (
                f", cached construction {cached_construction_s:.1f}s"
                if i == 0
                else ""
            ),
            file=sys.stderr,
        )

    run_totals = [round(sum(t.values()), 3) for t in runs]
    total = round(median(run_totals), 3) if run_totals else 0.0
    timings = {
        name: round(median([t[name] for t in runs if name in t]), 3)
        for name in {n for t in runs for n in t}
    }
    e2e_stages = None
    if os.environ.get("SPARK_GRAFT_E2E_STAGES"):
        e2e_stages = time_e2e_stages(spark, sf_dir)
    # The board JVM (48g heap, 32 threads) must be GONE before the solo
    # subprocess measures: with it merely idle-resident, solo colds read
    # 3× high (16.1 s vs 4.8 s for the e2e pipeline on this box).
    spark.stop()
    # Mechanical attribution (r6 brief #4): re-run the top-N (default 5) slowest board
    # lines solo in a fresh process and publish {in_bench, solo_cold,
    # solo_warm} side by side — ends the recurring "regression or shared-JVM
    # noise?" question without a manual measurement round.
    # SPARK_GRAFT_SOLO_TOP=0 disables.
    solo: dict[str, dict] = {}
    try:
        solo_top = int(os.environ.get("SPARK_GRAFT_SOLO_TOP", "5").strip() or 0)
    except ValueError:
        # a typo'd knob must not sink the already-measured board; treat any
        # non-numeric value as "disabled" and say so
        print("SOLO disabled: non-numeric SPARK_GRAFT_SOLO_TOP", file=sys.stderr)
        solo_top = 0
    if solo_top > 0 and timings:
        top = [
            k for k, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:solo_top]
        ]
        measured = _solo_attribution(sf_dir, top)
        solo = {
            k: {"in_bench": timings[k], **measured[k]}
            for k in top
            if k in measured
        }
    payload = {
        "metric": "registry_queries_total_runtime",
        "value": total,
        "unit": "sec",
        # value = MEDIAN of these back-to-back board totals (shared-cache
        # releases between runs; warm JVM). queries = per-query medians, so
        # sum(queries) can differ slightly from value. runs_planned vs
        # len(runs) + budget_exhausted make a budget-truncated median
        # visible from the payload alone (the r8 "median of 2" ambiguity).
        "runs": run_totals,
        # runs_planned = the plan ANNOUNCED after run 1's measured wall
        # (== len(runs) unless a mid-board slowdown truncated it);
        # runs_requested = the configured N before budget fitting.
        "runs_planned": runs_planned,
        "runs_requested": board_runs,
        "budget_exhausted": budget_exhausted,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # effective measurement order (ADVICE r6 #4): per-query numbers are
        # position-sensitive, so cross-round comparisons need the order on
        # record. "<name>-first" or "registry" (definition order).
        "order": f"{first}-first" if first and first in REGISTRY else "registry",
    }
    if solo:
        payload["solo"] = solo
    if errors:
        payload["errors"] = errors
    if e2e_stages:
        payload["e2e_stages"] = e2e_stages
    line = json.dumps(payload, separators=(",", ":"))
    # Full detail always lands in a sibling file.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as f:
        f.write(line + "\n")
    # The driver keeps only the LAST ~2000 chars of output and parses the
    # JSON line from that window (r2's parse failed: 69 queries pushed the
    # line past the window and its head was cut). If the full line risks
    # truncation, print a window-safe variant: keep the slowest queries'
    # entries (the ones a reader acts on), drop the fastest, and say how
    # many were omitted; value/metric stay exact.
    LIMIT = 1900
    if len(line) > LIMIT:
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])
        kept: dict[str, float] = {}
        for k, v in slowest:
            trial = dict(payload, queries={**kept, k: v})
            trial["queries_omitted"] = len(timings) - len(kept) - 1
            if len(json.dumps(trial, separators=(",", ":"))) > LIMIT:
                break
            kept[k] = v
        payload["queries"] = dict(sorted(kept.items()))
        payload["queries_omitted"] = len(timings) - len(kept)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--solo":
        solo_main(sys.argv[2], sys.argv[3:])
    else:
        main()
