"""Similarity search over embedding columns (north-star, SURVEY §2.12).

Brute-force cosine top-k is the exactness baseline (oracle-checkable against
duckdb's list functions); the LSH-bucketed variant is the scale path.

Oracle-checked paths (``cosine_topk``) use built-in higher-order functions
(``zip_with`` + ``aggregate``): elements are cast float→double *before*
multiply so Spark and the duckdb oracle do bit-identical IEEE arithmetic and
the fold is sequential in array order in both engines. The approximate path
(``lsh_topk``) instead uses Arrow-batched numpy kernels (matmul signatures,
einsum re-rank): higher-order expressions run interpreted (no codegen), so a
vectorized batch beats tables×planes array folds per row by an order of
magnitude at bulk volume.

Scale notes:
- brute force is O(|Q|·|C|) — correct tool when |Q| is small (broadcast the
  queries, stream the corpus: no shuffle at all, embarrassingly parallel).
- for |Q| ~ |C| use ``lsh_members``/``lsh_topk`` (multi-table
  random-hyperplane signatures, bucket-local re-rank) to cut candidates,
  then exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elastic_surv_spark.operators.pq import _pairwise_d2, _safe_norm


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (small side); ranking uses the *rounded* cosine with
    id tiebreak so results are deterministic across engines.
    Returns (q_id, n_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("_n_emb")
    )
    pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        F.round(cosine(F.col("_q_emb"), F.col("_n_emb")), round_to).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """All within-block pairs (id_a < id_b) with cosine ≥ threshold.

    The blocking column turns the all-pairs O(n²) into Σ per-block n_b² —
    the standard scale pattern when a cheap partitioner exists (language,
    shard, cluster id). Each block shuffles ONCE to its grouped-apply task,
    where a single numpy Gram matmul scores every pair — an Arrow-batched
    vectorized kernel, versus the join form whose per-pair ``zip_with`` +
    ``aggregate`` cosine runs in the expression interpreter (no codegen for
    higher-order functions) and moves both vectors once per PAIR through
    the shuffle. ~10× at bench volume; the gap widens with block size.
    The interpreted join form is kept as :func:`blocked_cosine_pairs_folded`
    — the bit-level oracle twin (equality on rounded outputs is asserted in
    tests; the kernel mirrors the fold's dot/(‖a‖·‖b‖) association).

    Blocks must fit a worker's memory (n_b × dim doubles + the n_b² score
    tile); for unbounded blocks switch to LSH/IVF candidates + re-rank
    (``lsh_topk``/``ivf_topk``). NULL block keys produce no pairs (SQL
    equality semantics); NULL vectors are dropped.
    """
    block_type = df.schema[block_col].dataType.simpleString()

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], block_col: [], "cosine": []}
        )
        if pdf[block_col].isna().any():
            return empty
        pdf = pdf[pdf[vec_col].notna()].sort_values(id_col)
        m = len(pdf)
        if m < 2:
            return empty
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        G = X @ X.T
        nrm = np.sqrt(np.diag(G))
        C = np.round(G / np.outer(nrm, nrm), round_to)
        ia, ib = np.triu_indices(m, 1)
        cos = C[ia, ib]
        keep = cos >= threshold
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                block_col: np.repeat(pdf[block_col].iloc[0], int(keep.sum())),
                "cosine": cos[keep],
            }
        )

    return df.groupBy(block_col).applyInPandas(
        block_pairs,
        schema=f"id_a long, id_b long, {block_col} {block_type}, cosine double",
    )


def blocked_cosine_pairs_folded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Interpreted-expression twin of :func:`blocked_cosine_pairs`: equi-join
    on the block key, per-pair ``zip_with``+``aggregate`` cosine. Sequential
    element order matches duckdb's ``list_dot_product`` exactly — kept as
    the certification oracle form; prefer the vectorized kernel at scale.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col),
        F.col(vec_col).alias("_emb_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col),
        F.col(vec_col).alias("_emb_b"),
    )
    return (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col(block_col),
            F.round(cosine(F.col("_emb_a"), F.col("_emb_b")), round_to).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_members(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """Salted LSH bucket membership: one row per (vector, table) with its
    (table, signature, _salt) group key — the exact grouping ``lsh_topk``
    re-ranks over, exposed so tests can assert the cap holds.

    All tables' signatures come from ONE Arrow-batched pass: a (batch × dim)
    @ (dim × tables·planes) matmul then sign-bit packing — one vectorized
    kernel per batch instead of tables×planes interpreted array folds per
    row (higher-order expressions don't codegen).

    ``bucket_cap`` bounds per-task work against pathological hot buckets
    (a bucket of size m costs one m² matmul): membership counts per
    (table, signature) join back (aggregate-sized side) and buckets above
    the cap are salted into ceil(m/cap) deterministic sub-buckets, so no
    task exceeds a ~cap² kernel. Pairs split across sub-buckets of ONE
    table can still meet in any other table — and a hot bucket means those
    planes barely discriminate there, so its pairs are weak candidates
    anyway; recall loss is marginal (asserted in tests on a skewed corpus).
    """
    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        raise ValueError("lsh_members: empty corpus")
    dim = int(dim_row["d"])
    all_planes = np.concatenate(
        [
            np.random.default_rng(seed + t).standard_normal((n_planes, dim))
            for t in range(n_tables)
        ]
    ).T  # (dim, n_tables*n_planes)

    @F.pandas_udf("array<long>")
    def table_sigs(embs: pd.Series) -> pd.Series:
        X = np.stack(embs.to_numpy()).astype(np.float64)  # (B, dim)
        bits = (X @ all_planes >= 0).astype(np.int64)  # (B, T*P)
        packed = bits.reshape(len(X), n_tables, n_planes)
        w = (2 ** np.arange(n_planes - 1, -1, -1)).astype(np.int64)
        sigs_m = (packed * w).sum(axis=2)  # (B, T)
        return pd.Series(list(sigs_m))

    # r16: no round-robin spread before the pandas UDF — shuffling the
    # vector payload cost more in-board than the single-task scan it
    # avoided at tiny SFs (3-board A/B medians: embedding_ann_lsh 1.85 s
    # without vs 3.07/3.54 s with), and at real scale the scan already
    # splits so the spread was a no-op there anyway.
    member = (
        corpus
        .select(
            F.col(id_col),
            F.col(vec_col),
            table_sigs(F.col(vec_col)).alias("_sigs"),
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode("_sigs").alias("table", "signature"),
        )
    )
    if bucket_cap is not None:
        # bucket size via a partitioned window count (one shuffle on the
        # bucket key; a groupBy+join-back would re-run the signature pass on
        # both join branches), then buckets above the cap split into
        # ceil(m/cap) deterministic sub-buckets
        wb = Window.partitionBy("table", "signature")
        member = (
            member.withColumn("_m", F.count("*").over(wb))
            .withColumn(
                "_salt",
                F.when(
                    F.col("_m") > bucket_cap,
                    F.pmod(F.xxhash64(F.col(id_col)), F.ceil(F.col("_m") / bucket_cap)),
                ).otherwise(F.lit(0)),
            )
            .drop("_m")
        )
    else:
        member = member.withColumn("_salt", F.lit(0))
    return member


def lsh_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    round_to: int = 6,
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """Approximate all-pairs top-k: union of candidates from ``n_tables``
    independent hyperplane tables, exact cosine re-rank per query.

    Scale: each table's self-join shuffles on an 8-byte bucket key; total
    candidate volume ≈ Σ_buckets n_b² per table — tuned by n_planes, with
    ``bucket_cap`` salting as the hot-bucket backstop (see lsh_members). No
    crossJoin anywhere. Returns (q_id, n_id, cosine, rank), rank ≤ k.

    Tuning note: on near-uniform vectors (this harness's synthetic
    embeddings — top-5 cosine ≈ 0.3) hyperplane LSH recall is inherently
    modest (~0.7 at 4 planes × 8 tables); on real clustered embedding
    distributions the same settings recall far higher. Raise n_tables (or
    lower n_planes) to trade candidates for recall.
    """
    member = lsh_members(
        corpus, id_col, vec_col, n_planes, n_tables, seed, bucket_cap
    )

    # Bucket-local re-rank (FAISS-cell style): shuffle each vector ONCE per
    # table to its (table, signature, salt) bucket, then a grouped-apply
    # computes the bucket's pairwise cosine matrix with one numpy matmul.
    # Each row emits only its bucket-local top-k (plus rounded-value ties):
    # a neighbor outranked by k better candidates IN ITS OWN BUCKET can
    # never reach the global top-k, so the partial cut is lossless — and it
    # shrinks the dedup/window shuffle from Σ n_b² candidate rows to
    # ~memberships × k (25× at bench volume, unbounded at scale). Ties on
    # the ROUNDED cosine at the cut are all kept so the downstream
    # deterministic (cosine desc, n_id asc) tiebreak sees the same
    # candidates as a full emission.
    def bucket_rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"q_id": [], "n_id": [], "cosine": []})
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xn = X / _safe_norm(X)  # zero vectors score 0, never NaN
        C = np.round(Xn @ Xn.T, round_to)
        np.fill_diagonal(C, -np.inf)
        kk = min(k, m - 1)
        thresh = -np.partition(-C, kk - 1, axis=1)[:, kk - 1]
        qi, ni = np.nonzero(np.isfinite(C) & (C >= thresh[:, None]))
        ids = pdf[id_col].to_numpy()
        return pd.DataFrame(
            {"q_id": ids[qi], "n_id": ids[ni], "cosine": C[qi, ni]}
        )

    scored = (
        member.groupBy("table", "signature", "_salt")
        .applyInPandas(bucket_rerank, schema="q_id long, n_id long, cosine double")
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int | None = 4,
    probe_frac: float = 0.25,
    seed: int = 42,
    round_to: int = 6,
    fit_sample: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate all-pairs top-k.

    The billion-scale ANN layout: a KMeans coarse quantizer partitions the
    corpus into ~√n cells; each vector is indexed under its nearest
    centroid; a query only compares against its nearest cells. Cost per
    query ≈ n_probe·n/n_cells exact comparisons instead of n.

    Probe depth: pass ``n_probe`` for a fixed count, or ``n_probe=None`` to
    probe ``ceil(probe_frac · n_cells)`` — a fixed COUNT silently loses
    recall as the corpus grows (n_cells ∝ √n, so 6 probes is 55 % of the
    cells at 500 rows but 27 % at 2 000: measured recall@5 fell 0.86 → 0.68
    on the near-uniform harness vectors); a fixed FRACTION holds the probed
    share of the corpus, and with it the worst-case recall, constant across
    scale. Clustered real embeddings reach high recall at far smaller
    fractions (tests assert ≥ 0.9 with 6 probes on the clustered fixture).

    Plan shape: the coarse quantizer is the deterministic driver-side Lloyd
    on a sample of at most ``fit_sample`` rows (see
    ``pq.fit_coarse_centroids`` — bounded at any scale, no per-iteration
    job scheduling); cell assignment is one Arrow argmin pass with the
    centroids as a broadcast numpy closure; the probe list is a small
    (batch × cells) matmul in a pandas UDF; candidates come from an
    equi-join on the cell id — shuffle ∝ corpus × n_probe, never all-pairs.
    Exact einsum re-rank + windowed top-k as in lsh_topk.
    """
    from elastic_surv_spark.operators.pq import fit_coarse_centroids

    n = corpus.count()
    n_cells = n_cells or max(2, int(n ** 0.5 / 2))
    if n_probe is None:
        n_probe = int(np.ceil(probe_frac * n_cells))
    n_probe = max(1, min(n_probe, n_cells))
    par = corpus.sparkSession.sparkContext.defaultParallelism

    # r16: spread removed — see lsh_topk (vector-payload shuffle beat by
    # the plain scan in the 3-board A/B; no-op at real scale regardless)
    base = corpus.select(F.col(id_col), F.col(vec_col))
    centroids = fit_coarse_centroids(
        base, vec_col, n_cells, fit_sample, seed, n=n
    )  # (C, dim)

    @F.pandas_udf("int")
    def assign_cell(embs: pd.Series) -> pd.Series:
        X = np.stack(embs.to_numpy()).astype(np.float64)  # (B, dim)
        return pd.Series(_pairwise_d2(X, centroids).argmin(1).astype(np.int32))

    assigned = (
        base.select(
            F.col(id_col),
            F.col(vec_col),
            assign_cell(F.col(vec_col)).alias("_cell"),
        )
        .repartition(par)
    )

    @F.pandas_udf("array<int>")
    def probe_cells(embs: pd.Series) -> pd.Series:
        X = np.stack(embs.to_numpy()).astype(np.float64)  # (B, dim)
        d2 = _pairwise_d2(X, centroids)  # sq. euclidean ≡ KMeans assignment
        order = np.argpartition(d2, min(n_probe, d2.shape[1] - 1), axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in order])

    # Cell-local re-rank (same shape as lsh_topk's bucket re-rank): union
    # the cell's MEMBERS (role 0, home cell) with the QUERIES probing it
    # (role 1, exploded to n_probe cells), group by cell, and one numpy
    # matmul per cell emits bare (q_id, n_id, cosine) rows — vectors move
    # once per probe, never once per candidate pair.
    members = assigned.select(
        F.col(id_col), F.col(vec_col), F.col("_cell"), F.lit(0).alias("_role")
    )
    probes = assigned.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
        F.lit(1).alias("_role"),
    )
    grouped = members.unionByName(probes)

    def cell_rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["_role"] == 1]
        mbr = pdf[pdf["_role"] == 0]
        if len(q) == 0 or len(mbr) == 0:
            return pd.DataFrame({"q_id": [], "n_id": [], "cosine": []})
        Q = np.stack(q[vec_col].to_numpy()).astype(np.float64)
        M = np.stack(mbr[vec_col].to_numpy()).astype(np.float64)
        Qn = Q / _safe_norm(Q)
        Mn = M / _safe_norm(M)
        # per-(query, cell) top-k + rounded-value ties: lossless for the
        # global top-k (a member outranked by k better ones in the same
        # probed cell can never win) and shrinks the dedup/window shuffle
        # from probes×|cell| rows per query to ~k (see bucket_rerank)
        C = np.round(Qn @ Mn.T, round_to)
        q_ids = q[id_col].to_numpy()
        m_ids = mbr[id_col].to_numpy()
        C[q_ids[:, None] == m_ids[None, :]] = -np.inf
        kk = min(k, C.shape[1])
        thresh = -np.partition(-C, kk - 1, axis=1)[:, kk - 1]
        # isfinite guard: a query whose only cell member is itself has an
        # all--inf row (thresh -inf), and -inf >= -inf would emit self-pairs
        qi, mi = np.nonzero(np.isfinite(C) & (C >= thresh[:, None]))
        return pd.DataFrame(
            {"q_id": q_ids[qi], "n_id": m_ids[mi], "cosine": C[qi, mi]}
        )

    # NO dropDuplicates here (unlike lsh_topk, where multiple tables emit
    # the same pair): each member has ONE home cell and a query probes any
    # cell at most once, so (q_id, n_id) can be emitted at most once — the
    # dedup was a full extra exchange for zero semantic effect
    scored = grouped.groupBy("_cell").applyInPandas(
        cell_rerank, schema="q_id long, n_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors via Arrow-batched numpy matmuls.

    Same results as ``cosine_topk`` (ids ranked by cosine, id tiebreak) but
    ~10× faster: the query block is collected (small side, like a broadcast)
    and each corpus batch contributes its per-query top-k candidates with one
    (B×dim)@(dim×|Q|) matmul; a final window over batches×|Q|×k candidate
    rows picks the global top-k. Use where engine-portable float arithmetic
    is not required (``cosine_topk``'s zip_with form stays the oracle-parity
    path). Zero shuffle on the corpus; candidate volume ∝ partitions·|Q|·k.
    """
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    Qn = (Q / _safe_norm(Q)).T  # (dim, |Q|)

    def partial_topk(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xn = X / _safe_norm(X)
            # round BEFORE the per-batch selection so the partial top-k uses
            # the exact ordering the global window ranks by — (rounded
            # cosine desc, id asc); raw-value selection could discard the
            # lower-id member of a rounded tie and diverge from cosine_topk
            C = np.round(Xn @ Qn, 6)  # (B, |Q|)
            ids = pdf[id_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j in range(C.shape[1]):
                col = C[:, j]
                mask = ids != q_ids[j]
                cand_idx = np.flatnonzero(mask)
                if not len(cand_idx):
                    continue
                take = min(k, len(cand_idx))
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:take]
                top = cand_idx[order]
                out_q.extend([q_ids[j]] * len(top))
                out_n.extend(ids[top])
                out_c.extend(col[top])
            yield pd.DataFrame(
                {"q_id": np.array(out_q, dtype=np.int64),
                 "n_id": np.array(out_n, dtype=np.int64),
                 "cosine": np.array(out_c, dtype=np.float64)}
            )

    # r16: spread removed — see lsh_topk (the A/B covers this path via the
    # shared _ANN_EXACT baseline and embedding_cosine_topk: 0.71 s without
    # vs 1.06/0.91 s with)
    cand = corpus.mapInPandas(
        partial_topk, schema="q_id long, n_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return cand.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def ann_recall_summary(
    corpus: DataFrame,
    ann: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 50,
    k: int = 5,
    floor: float = 0.85,
    exact: DataFrame | None = None,
) -> DataFrame:
    """One-row certification summary for an approximate top-k result.

    Compares ``ann`` (q_id, n_id, rank ≤ k) against the exact brute-force
    top-k for query ids < ``n_queries``, computed in-plan by ``cosine_topk``
    (queries broadcast, corpus streamed — cheap at any corpus size). Emits
    (n_queries, exact_pairs, recall_ok) where recall_ok ⇔ recall@k ≥ floor.
    The whole ANN plan still executes underneath; the summary row is
    deterministic (fixed seeds, fixed data) and engine-portable, so a SQL
    oracle can reproduce it from row counts + constants and the correctness
    driver certifies the ANN end-to-end instead of skipping it.

    ``exact`` lets a caller pass a precomputed (e.g. session-shared)
    brute-force frame; it must be exactly ``cosine_topk_fast(corpus,
    corpus.filter(id < n_queries), k=k)`` — same ids, same k — or the
    certification row is meaningless. Caching changes only WHEN that
    subplan runs, never what it returns.
    """
    if exact is None:
        exact = cosine_topk_fast(
            corpus, corpus.filter(F.col(id_col) < n_queries), id_col, vec_col, k=k
        )
    counts = exact.agg(
        F.countDistinct("q_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("exact_pairs"),
    )
    hits = (
        ann.filter(F.col("q_id") < n_queries)
        .join(exact.select("q_id", "n_id"), ["q_id", "n_id"])
        .agg(F.count("*").alias("_hits"))
    )
    return counts.crossJoin(hits).select(
        "n_queries",
        "exact_pairs",
        (
            F.col("_hits").cast("double") / F.col("exact_pairs").cast("double")
            >= F.lit(floor)
        ).alias("recall_ok"),
    )
