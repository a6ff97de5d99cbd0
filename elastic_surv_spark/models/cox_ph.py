"""CoxPH (DeepSurv-style) — proportional hazards with an MLP risk score.

≡ reference ``CoxPHModel`` (src/elastic_surv/models/model_cox_ph.py:15-110):
MLP risk net with no output bias (50-57), Cox partial-likelihood fit (96-98),
Breslow baseline hazards computed after training (100-103), prediction
S(t|x) = exp(-H0(t))^exp(g(x)) (106-110).

Batch partial likelihood (Breslow ties), risk sets within the sorted batch —
the same batch-local semantics as pycox's CoxPH loss:

    L = -(1/D) Σ_{i: e_i=1} [ g_i - log Σ_{j: t_j >= t_i} exp(g_j) ]

Baseline hazards are computed DISTRIBUTED: one mapInPandas forward pass for
exp(g), groupBy duration + reverse-cumulative window for risk-set sums,
h0(t) = d_t / Σ_{T_j >= t} exp(g_j) — the window-aggregate plan SURVEY §2.9
M1 calls for. The collected curve is one row per distinct event time
(quantized to ≤ ``max_curve_points`` at scale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from elastic_surv_spark.metrics.km import quantize_times
from elastic_surv_spark.models.base import SurvModel
from elastic_surv_spark.models.data import SurvDataset
from elastic_surv_spark.models.params import Categorical, Integer, Params


class CoxPHModel(SurvModel):
    def __init__(self, in_features: int, max_curve_points: int = 100, **kw):
        super().__init__(in_features, **kw)
        self.max_curve_points = max_curve_points
        self.baseline_cumhaz: np.ndarray | None = None  # H0 at self.cuts

    @staticmethod
    def name() -> str:
        return "cox_ph"

    @staticmethod
    def hyperparameter_space() -> list[Params]:
        # ≡ reference model_cox_ph.py:67-77
        return [
            Categorical("batch_norm", [1, 0]),
            Categorical("dropout", [0, 0.1, 0.2]),
            Categorical("lr", [1e-2, 1e-3, 1e-4]),
            Integer("patience", 10, 50, 10),
        ]

    def _output_bias(self) -> bool:
        return False  # ≡ model_cox_ph.py:56 output_bias=False

    def _out_features(self, dataset: SurvDataset) -> int:
        return 1

    def _prepare_targets(self, t, e):
        return np.asarray(t, dtype=float), np.asarray(e, dtype=float)

    def _loss_grad(self, z, targets):
        t, e = targets
        g = z[:, 0]
        n = len(g)
        order = np.argsort(t, kind="stable")
        ts, gs, es = t[order], g[order], e[order]
        # risk-set denominators: reverse cumsum of exp(g) over ascending time,
        # shared within tie groups (Breslow)
        m = gs.max() if n else 0.0
        eg = np.exp(gs - m)
        rev = np.cumsum(eg[::-1])[::-1]  # rev[i] = sum_{j>=i} exp(g_j - m)
        # tie groups: first index of each distinct time
        uniq, first_idx = np.unique(ts, return_index=True)
        denom_at = rev[first_idx]  # denom for events at uniq[k]
        group_of = np.searchsorted(uniq, ts)
        denom = denom_at[group_of]
        d_events = es.sum()
        if d_events == 0:
            return 0.0, np.zeros_like(z)
        log_denom = np.log(denom) + m
        loss = -(es * (gs - log_denom)).sum() / d_events
        # gradient: dL/dg_j = -(1/D)[ e_j - exp(g_j) * W_j ],
        # W_j = Σ_{events i with t_i <= t_j} 1/denom_i  (tie-group granular)
        ev_per_group = np.zeros(len(uniq))
        np.add.at(ev_per_group, group_of, es)
        w_groups = np.cumsum(ev_per_group / denom_at)
        W = w_groups[group_of]
        dg_sorted = -(es - eg * W) / d_events
        dg = np.empty_like(dg_sorted)
        dg[order] = dg_sorted
        return float(loss), dg[:, None]

    def _post_fit(self, dataset: SurvDataset) -> None:
        """Breslow baseline hazards as a distributed window aggregate
        (≡ reference compute_baseline_hazards, model_cox_ph.py:100-103).

        Scale posture: the distinct-time domain is coarsened to
        ≤ ``max_curve_points`` bins DISTRIBUTEDLY (``quantize_times``, the
        same life-table discretization metrics/km.py uses — a no-op below
        the cap, so discrete-time curves stay bit-identical to the exact
        form) BEFORE the cum-sum windows and the collect. With continuous
        float times at any n, the grouped curve, both windows, and the
        driver collect are all O(max_curve_points) — no driver-side O(n)
        anywhere in the fit.
        """
        scored = self.predict_risk(dataset.train_df, dataset)
        t_col, e_col = dataset.time_column, dataset.event_column
        # stats_from: the two eager quantization stats jobs (distinct count,
        # min/max of the time column) run on the RAW train frame — running
        # them on `scored` would execute the mapInPandas forward pass two
        # extra times per fit (column pruning can't reach through Python).
        scored = quantize_times(
            scored.withColumn(t_col, F.col(t_col).cast("double")),
            t_col,
            self.max_curve_points,
            stats_from=dataset.train_df.select(F.col(t_col).cast("double").alias(t_col)),
        )
        grouped = scored.groupBy(F.col(t_col).alias("t")).agg(
            F.sum(F.col(e_col).cast("double")).alias("d"),
            F.sum("exp_g").alias("sum_eg"),
        )
        # constant-valued partition column (see metrics/km.py: a bare
        # literal is constant-folded out of the partition spec, degrading
        # to the warned unpartitioned form): the windows run over the
        # bounded aggregated curve — one deliberate task. The coalesce
        # matters: pmod(d, 1) alone goes NULL when a bin's events are all
        # NULL (sum of NULLs), silently splitting the window into two
        # partitions and corrupting the cumulative baseline-hazard sums.
        grouped = grouped.withColumn(
            "_p", F.pmod(F.coalesce(F.col("d").cast("long"), F.lit(0)), F.lit(1))
        )
        w_rev = (
            Window.partitionBy("_p")
            .orderBy(F.desc("t"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_fwd = (
            Window.partitionBy("_p")
            .orderBy(F.asc("t"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        curve = (
            grouped.withColumn("denom", F.sum("sum_eg").over(w_rev))
            .withColumn("h0", F.col("d") / F.col("denom"))
            .withColumn("H0", F.sum("h0").over(w_fwd))
            .select("t", "H0")
            .orderBy("t")
        ).collect()
        # bounded by construction: quantize_times caps the domain at
        # max_curve_points bins (+1 for the lower edge). A hard raise, not
        # an assert — the driver-side collect bound is load-bearing and
        # must hold under `python -O` too.
        if len(curve) > self.max_curve_points + 1:
            raise RuntimeError(
                f"baseline-hazard curve has {len(curve)} points, above the "
                f"max_curve_points={self.max_curve_points} collect bound"
            )
        self.cuts = np.array([float(r["t"]) for r in curve])
        self.baseline_cumhaz = np.array([float(r["H0"]) for r in curve])

    def predict_risk(self, df, dataset: SurvDataset):
        """Adds exp_g (partial hazard) via distributed forward pass."""
        import pandas as pd  # noqa: F401

        model = self
        # full state so eval-mode BN uses the trained running stats remotely
        weights = self.net.get_state()
        feats = dataset.features
        cfg = (self.hidden_nodes, self.batch_norm, self.dropout, self.seed)

        def infer(pdfs):
            from elastic_surv_spark.models.nn import MLP

            hidden, bn, do, seed = cfg
            net = MLP(len(feats), hidden, 1, batch_norm=bn, dropout=do,
                      output_bias=False, seed=seed)
            net.set_state(np.asarray(weights))
            for pdf in pdfs:
                if not len(pdf):
                    continue
                X = pdf[feats].to_numpy(dtype=float)
                g = net.forward(X, training=False)[:, 0]
                out = pdf.copy()
                out["exp_g"] = np.exp(g)
                yield out

        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields) + [T.StructField("exp_g", T.DoubleType())]
        )
        return df.mapInPandas(infer, schema=schema)

    def _surv_from_output(self, z):
        # S(t|x) = exp(-H0(t) * exp(g))  (≡ model_cox_ph.py:106-110)
        eg = np.exp(z[:, 0])
        return np.exp(-np.outer(eg, self.baseline_cumhaz))
