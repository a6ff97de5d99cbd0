"""Product quantization (PQ) for embedding compression + ANN search.

The third leg of the ANN stool (next to hyperplane LSH and IVF in
``operators/similarity.py``): each L2-normalized vector is split into ``m``
subvectors, each quantized to one of ``n_codes`` learned centroids — storage
drops from dim×4 bytes to m bytes (m=8: 32× for dim-64 float32), and
asymmetric distance computation (ADC) scores a query against the COMPRESSED
corpus with m table lookups per candidate instead of a dim-length dot
product. Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011); the FAISS IVF-PQ layout composes this with the IVF cells.

Plan shape (all Spark-side work is linear, no shuffle until top-k):
- codebook fit: Lloyd's k-means per subspace on a driver-side SAMPLE
  capped at ``fit_sample`` rows (PQ training needs a representative sample,
  not the corpus; same posture as ivf_topk's sampled quantizer fit);
- encode: one Arrow-batched mapInPandas pass, argmin over (B, k) distances
  per subspace — the corpus never leaves the executors;
- search: per-query distance TABLES (m × n_codes dot products) broadcast to
  an Arrow pass that gathers+sums per candidate — O(m) per candidate;
  per-batch partial top-``shortlist`` keeps the shuffle tiny;
- exact re-rank of the shortlist by true cosine restores ranking fidelity
  lost to quantization (standard PQ + re-rank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _safe_norm(X: np.ndarray) -> np.ndarray:
    """Row norms with zeros mapped to 1 — a zero vector stays zero instead
    of becoming NaN and poisoning every downstream dot product."""
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return np.where(norms == 0, 1.0, norms)


def _pairwise_d2(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared euclidean via the quadratic expansion — O(n·k) memory,
    not the O(n·k·dim) of broadcasting (X - C)²: at the 100k fit-sample cap
    with a few hundred centroids the broadcast intermediate would be GBs."""
    return (
        (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)
    )


def _lloyd(X: np.ndarray, k: int, rng: np.random.Generator, iters: int = 12) -> np.ndarray:
    """Tiny deterministic k-means (data fits the driver by construction —
    the fit sample is bounded)."""
    n = len(X)
    centroids = X[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(centroids) < k:  # degenerate tiny corpus: pad with jitter
        pad = centroids[rng.integers(0, len(centroids), k - len(centroids))]
        centroids = np.concatenate([centroids, pad + 1e-6])
    for _ in range(iters):
        assign = _pairwise_d2(X, centroids).argmin(1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                centroids[j] = members.mean(0)
    return centroids


def _bounded_sample_matrix(
    corpus, vec_col: str, fit_sample: int, seed: int, n: int | None, who: str
) -> np.ndarray:
    """THE quantizer sampling posture, defined once (review finding, r11):
    Bernoulli sample at fraction fit_sample/n (whole corpus when it already
    fits), collected and stacked float64. Raises explicitly on an empty
    corpus AND on an empty draw (Bernoulli can return zero rows at tiny
    fractions — np.stack([]) would raise an opaque ValueError)."""
    n = corpus.count() if n is None else n
    if n == 0:
        raise ValueError(f"{who}: empty corpus")
    sample = (
        corpus.sample(fraction=min(1.0, fit_sample / n), seed=seed)
        if n > fit_sample
        else corpus
    )
    rows = sample.select(vec_col).collect()
    if not rows:
        raise ValueError(
            f"{who}: the Bernoulli fit sample drew zero rows "
            f"(n={n}, fit_sample={fit_sample}) — raise fit_sample"
        )
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def fit_coarse_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int,
    fit_sample: int,
    seed: int,
    n: int | None = None,
) -> np.ndarray:
    """(n_cells, dim) coarse-quantizer centroids for IVF cell assignment,
    fit with the deterministic driver-side Lloyd on a bounded sample — the
    same posture as the PQ codebook fit (a quantizer needs a representative
    sample, never the corpus, so the collect is capped at ``fit_sample``
    regardless of corpus size). Replaces the earlier MLlib KMeans fit,
    whose 10 driver-scheduled iterations cost seconds of job overhead per
    query at any data size; assignment stays distributed (one Arrow argmin
    pass with the centroids broadcast as a numpy closure)."""
    X = _bounded_sample_matrix(
        corpus, vec_col, fit_sample, seed, n, "fit_coarse_centroids"
    )
    return _lloyd(X, n_cells, np.random.default_rng(seed))


def fit_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 32,
    fit_sample: int = 100_000,
    seed: int = 42,
    n: int | None = None,
) -> np.ndarray:
    """(m, n_codes, dim//m) codebooks fit on an L2-normalized bounded sample.
    Pass ``n`` (corpus row count) when the caller already knows it."""
    X = _bounded_sample_matrix(
        corpus, vec_col, fit_sample, seed, n, "fit_pq_codebooks"
    )
    X /= _safe_norm(X)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    return np.stack(
        [_lloyd(X[:, j * sub : (j + 1) * sub], n_codes, rng) for j in range(m)]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, codes array<int>[, carry…]) — one Arrow pass, argmin per
    subspace. ``carry_cols`` pass through unchanged (e.g. a precomputed
    cell id), so a caller never has to join the encoding back onto its own
    input (that join re-ran the whole assignment subplan — review r11)."""
    m, k, sub = codebooks.shape
    carry = list(carry_cols or [])

    def encode(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= _safe_norm(X)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                Xs = X[:, j * sub : (j + 1) * sub]
                codes[:, j] = _pairwise_d2(Xs, codebooks[j]).argmin(1)
            out = {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            for c in carry:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    carry_schema = "".join(
        f", {c} {corpus.schema[c].dataType.simpleString()}" for c in carry
    )
    # r16: spread removed — shuffling the vector payload before the pandas
    # UDF cost more in-board than the single-task scan it avoided at tiny
    # SFs (embedding_pq_topk 1.20 s without vs 2.42/1.76 s with in the
    # 3-board A/B); a no-op at real scale where the scan already splits.
    return corpus.mapInPandas(
        encode, schema="vec_id long, codes array<int>" + carry_schema
    )


def _query_tables(
    queries: DataFrame, id_col: str, vec_col: str, m: int, codebooks: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Collected query block → (q_ids, raw queries, normalized queries, ADC
    tables). The tables are per-query (m × n_codes) centroid dot products —
    the broadcast constant every ADC pass gathers from."""
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    Qn = Q / _safe_norm(Q)
    sub = Qn.shape[1] // m
    tables = np.einsum("qjs,jks->qjk", Qn.reshape(len(Qn), m, sub), codebooks)
    return q_ids, Q, Qn, tables


def _partial_shortlist(
    q_id: int, scores: np.ndarray, ids: np.ndarray, shortlist: int
) -> pd.DataFrame:
    """Top-``shortlist`` candidates of one query within one batch/cell."""
    mask = ids != q_id
    cand = np.flatnonzero(mask)
    if not len(cand):
        return pd.DataFrame({"q_id": [], "n_id": [], "adc": []})
    take = min(shortlist, len(cand))
    # deterministic AND bounded (ADVICE r11 #3): cut by the TOTAL order
    # (adc desc, id asc) — the same order the global shortlist window
    # uses — so the per-batch top-`take` provably contains every global
    # top-`shortlist` row at any partition layout, with no layout
    # dependence (ids are unique) and no unbounded keep-all-ties
    # expansion (coarse codebooks/duplicated vectors could tie far more
    # than `shortlist` rows at the boundary). Boundary ties beyond the
    # cap are dropped by id, exactly as the global window would drop them.
    s = scores[cand]
    part = np.argpartition(-s, take - 1)[:take]
    thresh = s[part].min()
    above = cand[s > thresh]
    tied = cand[s == thresh]
    tied = tied[np.argsort(ids[tied], kind="stable")][: take - len(above)]
    top = np.concatenate([above, tied])
    return pd.DataFrame(
        {"q_id": np.full(len(top), q_id, dtype=np.int64),
         "n_id": ids[top].astype(np.int64),
         "adc": scores[top].astype(np.float64)}
    )


def _shortlist_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    q_ids: np.ndarray,
    Qn: np.ndarray,
    k: int,
    shortlist: int,
    round_to: int,
) -> DataFrame:
    """Global ADC shortlist → exact-cosine re-rank → top-k. The shortlist
    joins back to the raw vectors once; query vectors ride along as a
    broadcast numpy constant inside one Arrow pass."""
    w_s = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("n_id"))
    short = (
        cand.withColumn("_r", F.row_number().over(w_s))
        .filter(F.col("_r") <= shortlist)
        .select("q_id", "n_id")
    )
    qvec = {int(i): Qn[j] for j, i in enumerate(q_ids)}

    def rerank(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= _safe_norm(X)
            qs = np.stack([qvec[int(q)] for q in pdf["q_id"]])
            cos = (qs * X).sum(1)
            yield pd.DataFrame(
                {"q_id": pdf["q_id"].to_numpy(),
                 "n_id": pdf["n_id"].to_numpy(),
                 "cosine": np.round(cos, round_to)}
            )

    joined = short.join(
        corpus.select(F.col(id_col).alias("n_id"), vec_col), "n_id"
    ).select("q_id", "n_id", vec_col)
    scored = joined.mapInPandas(rerank, schema="q_id long, n_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    shortlist: int = 50,
    fit_sample: int = 100_000,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact shortlist re-rank.

    Returns (q_id, n_id, cosine, rank ≤ k) like cosine_topk/lsh_topk/
    ivf_topk. ADC ranks by Σ_j table_j[code_j] ≈ ⟨q, x̂⟩ (normalized dot =
    cosine); the top-``shortlist`` per query then re-ranks by TRUE cosine, so
    ranking error only costs recall when a true neighbor falls outside the
    shortlist entirely.
    """
    codebooks = fit_pq_codebooks(corpus, vec_col, m, n_codes, fit_sample, seed)
    encoded = pq_encode(corpus, codebooks, id_col, vec_col)
    q_ids, _, Qn, tables = _query_tables(queries, id_col, vec_col, m, codebooks)

    def adc_partial(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())  # (B, m)
            ids = pdf["vec_id"].to_numpy()
            # scores[q, b] = Σ_j tables[q, j, codes[b, j]]
            scores = tables[:, np.arange(codes.shape[1]), codes].sum(-1)  # (|Q|, B)
            frames = [
                _partial_shortlist(q_ids[qi], scores[qi], ids, shortlist)
                for qi in range(len(q_ids))
            ]
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                {"q_id": [], "n_id": [], "adc": []}
            )

    cand = encoded.mapInPandas(adc_partial, schema="q_id long, n_id long, adc double")
    return _shortlist_rerank(
        cand, corpus, id_col, vec_col, q_ids, Qn, k, shortlist, round_to
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    n_cells: int | None = None,
    n_probe: int | None = 6,
    probe_frac: float = 0.25,
    shortlist: int = 120,
    fit_sample: int = 100_000,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ: coarse KMeans cells prune the search to n_probe cells per
    query, PQ-ADC scores the surviving cells' COMPRESSED codes, and an exact
    re-rank of the shortlist restores fidelity — the FAISS IVFPQ layout that
    serves billion-vector corpora: per-query work is n_probe·(n/n_cells)·m
    table lookups over byte codes, never a full-corpus float scan.

    ``n_probe=None`` probes ``ceil(probe_frac · n_cells)`` — a fixed count
    loses recall as n_cells grows with the corpus; a fixed fraction holds
    it constant across scale (see ivf_topk's probe-depth note).

    (Simplification vs FAISS: codes quantize the normalized vectors
    directly rather than cell residuals — with the exact re-rank the
    difference only moves the shortlist-miss rate, covered by the recall
    certification.)

    Plan: coarse centroids come from the bounded driver-side Lloyd fit
    (``fit_coarse_centroids``); cell assignment + PQ encode are two Arrow
    map passes; candidates move ONCE per probed cell via a cell-grouped
    applyInPandas (queries ride along as broadcast ADC tables, not rows);
    shortlist + re-rank as in pq_topk. Shuffle ∝ corpus + matches, no
    all-pairs anywhere.
    """
    n = corpus.count()
    n_cells = n_cells or max(2, int(n**0.5 / 2))
    if n_probe is None:
        n_probe = int(np.ceil(probe_frac * n_cells))
    n_probe = max(1, min(n_probe, n_cells))

    # r16: spread removed — see encode_pq above (embedding_ann_ivfpq
    # 1.67 s without vs 2.57/2.43 s with)
    base = corpus.select(F.col(id_col), F.col(vec_col))
    centroids = fit_coarse_centroids(base, vec_col, n_cells, fit_sample, seed, n=n)

    codebooks = fit_pq_codebooks(corpus, vec_col, m, n_codes, fit_sample, seed, n=n)

    @F.pandas_udf("int")
    def assign_cell(embs: pd.Series) -> pd.Series:
        X = np.stack(embs.to_numpy()).astype(np.float64)
        return pd.Series(_pairwise_d2(X, centroids).argmin(1).astype(np.int32))

    assigned = base.select(
        F.col(id_col), F.col(vec_col), assign_cell(F.col(vec_col)).alias("_cell")
    )
    # _cell rides THROUGH the encode pass: the earlier join-back re-ran the
    # whole scan + assignment kernel a second time and paid a corpus-wide
    # shuffle just to reattach one int column (review r11)
    encoded = pq_encode(assigned, codebooks, id_col, vec_col, carry_cols=["_cell"])

    q_ids, Q, Qn, tables = _query_tables(queries, id_col, vec_col, m, codebooks)
    # probe lists: n_probe nearest cells per query by squared euclidean on
    # the raw query (matching the KMeans assignment metric)
    d2 = _pairwise_d2(Q, centroids)
    order = np.argsort(d2, axis=1)[:, :n_probe]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(order):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)

    def cell_adc(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["_cell"].iloc[0])
        probing = cell_to_queries.get(cell, [])
        if not probing:
            return pd.DataFrame({"q_id": [], "n_id": [], "adc": []})
        codes = np.stack(pdf["codes"].to_numpy())
        ids = pdf["vec_id"].to_numpy()
        frames = [
            _partial_shortlist(
                q_ids[qi],
                tables[qi, np.arange(codes.shape[1]), codes].sum(-1),
                ids,
                shortlist,
            )
            for qi in probing
        ]
        return pd.concat(frames, ignore_index=True)

    cand = encoded.groupBy("_cell").applyInPandas(
        cell_adc, schema="q_id long, n_id long, adc double"
    )
    return _shortlist_rerank(
        cand, corpus, id_col, vec_col, q_ids, Qn, k, shortlist, round_to
    )
