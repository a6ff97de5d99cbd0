"""D-calibration as a distributed aggregation.

Distribution calibration for survival predictions (Haider et al., JMLR
2020 — published definition, independent implementation): if a model is
calibrated, the predicted survival probabilities evaluated at the
subjects' own event times, p_i = S_i(T_i), are Uniform(0, 1). Bin [0, 1]
into ``n_bins`` equal bins and compare observed mass per bin against the
uniform expectation with a chi-square statistic. A censored subject at c
contributes fractional mass: given T > c, S(T) is uniform on [0, p_c], so
the subject spreads 1/p_c density over the bins below p_c (the paper's
censored handling; a subject with p_c = 0 contributes its whole mass to
bin 0).

The reference's scoring stops at discrimination (C-index) and accuracy
(Brier) — src/elastic_surv/models/base.py:75-82; calibration is the third
leg of survival-model evaluation and needs no new machinery: the same
bounded quantized-curve posture as the IPCW rows.

Scale: time domain quantizes once upfront (≤``max_curve_points`` bins),
the predictor curve collects bounded and broadcasts back as an equi-join,
the censored mass expansion is subjects × n_bins map-side rows, and the
result is one ≤n_bins-group aggregate with DECIMAL(38,18) exact mass sums
(order-free, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["d_calibration_km"]


def d_calibration_km(
    df: DataFrame,
    time_col: str,
    event_col: str,
    n_bins: int = 10,
    max_curve_points: int = 512,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-bin D-calibration of the population-KM predictor: ``(bin, mass,
    expected, chi2_term)`` — ``mass`` sums to n, ``expected`` = n/n_bins,
    chi-square terms derive from the ROUNDED masses (the registry float-
    parity recipe). The KM predictor is the empirical survival
    distribution, so its D-calibration is the well-calibrated baseline a
    model's own statistic compares against.
    """
    from pyspark.storagelevel import StorageLevel

    from elastic_surv_spark.metrics.km import km_curve, quantize_times

    spark = df.sparkSession
    base = df.select(
        F.col(time_col).cast("double").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    # persist covers ONLY the two eager prep jobs (count + curve collect)
    # and is released in the finally — a metric call must not leak cached
    # partitions into a long-lived session running the full registry
    # (ADVICE r9). The returned plan reads base exactly once (the single
    # explode pass below), so dropping the cache costs one recompute of
    # the caller's projection.
    base = quantize_times(base, "_t", max_curve_points).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        n = base.count()
        s_rows = km_curve(base, "_t", "_e", round_to=10).collect()
    finally:
        base.unpersist()
    smap = spark.createDataFrame(
        [(float(r["t"]), float(r["survival"])) for r in s_rows],
        "_t double, _p double",
    )
    # every subject time IS a curve point (upfront quantization): equi-join
    scored = base.join(F.broadcast(smap), "_t", "left").withColumn(
        "_p", F.coalesce("_p", F.lit(1.0))
    )
    # ONE map-side pass emits every subject's per-bin mass rows: an
    # uncensored subject is a single (bin, 1.0); a censored subject at p
    # spreads 1/p density over the bins below p (Haider's handling; p = 0
    # puts the whole mass in bin 0) — an n_bins-element transform+explode
    # instead of the earlier two filtered scans of base.
    def _censored_mass(bi):
        lo = bi.cast("double") / F.lit(float(n_bins))
        hi = (bi.cast("double") + 1) / F.lit(float(n_bins))
        return (
            F.when(
                F.col("_p") <= 0,
                F.when(bi == F.lit(0), F.lit(1.0)).otherwise(F.lit(0.0)),
            )
            .otherwise(
                F.greatest(F.lit(0.0), F.least(hi, F.col("_p")) - lo)
                / F.col("_p")
            )
        )

    per_bin = scored.select(
        F.explode(
            F.when(
                F.col("_e") == 1,
                F.array(
                    F.struct(
                        F.least(
                            F.lit(n_bins - 1), F.floor(F.col("_p") * F.lit(n_bins))
                        ).cast("int").alias("bin"),
                        F.lit(1.0).alias("_mass"),
                    )
                ),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_bins - 1)),
                    lambda bi: F.struct(
                        bi.cast("int").alias("bin"),
                        _censored_mass(bi).alias("_mass"),
                    ),
                )
            )
        ).alias("bm")
    ).select(F.col("bm.bin").alias("bin"), F.col("bm._mass").alias("_mass"))
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    masses = (
        per_bin
        .groupBy("bin")
        .agg(
            F.round(
                F.sum(F.col("_mass").cast("decimal(38,18)")).cast("double"),
                round_to if round_to is not None else 12,
            ).alias("mass")
        )
    )
    expected = float(n) / n_bins
    out = (
        bins.join(masses, "bin", "left")
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.coalesce("mass", F.lit(0.0)).alias("mass"),
            F.lit(expected).alias("expected"),
        )
        .withColumn(
            "chi2_term",
            (F.col("mass") - F.col("expected")) ** 2 / F.col("expected"),
        )
    )
    if round_to is not None:
        out = out.withColumn("chi2_term", F.round("chi2_term", round_to))
    return out
