"""Near-duplicate detection: exact n-gram Jaccard, MinHash+LSH, SimHash.

North-star operators (SURVEY §2.12). Three tiers, same semantics target
("pairs of documents whose shingle-set Jaccard ≥ threshold"):

- ``shingle_jaccard_pairs`` — exact all-pairs; O(n²) per block. The oracle
  and the small-scale tool. Blocking (e.g. per-language) bounds the
  quadratic term.
- ``minhash_lsh_pairs`` — the 100 TB path: k minhashes per doc (JVM-side
  ``xxhash64`` over shingles — no Python), banded into b signatures; the
  self-join happens on 8-byte band keys only (shuffle ∝ corpus size, not
  pairs). Candidates are then verified with exact Jaccard, so output ⊆
  exact output, missing a true pair only when all bands miss
  (P ≈ (1-j^r)^b per pair; ~1e-5 at j=0.9 with b=8, r=2).
- ``simhash64`` — 64-bit SimHash signatures (Charikar); near-dups = small
  Hamming distance, found by 16-bit chunk banding (pigeonhole: distance ≤ 3
  ⇒ some chunk equal).

``incremental_near_dedup`` (r10) is the append-only-ingest shape: a new
batch joins the history's persisted :func:`band_index` table instead of
re-signing the corpus, and exact verification touches only candidate docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elastic_surv_spark.functions.text import shingles, words


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_cols: list[str] | None = None,
    round_to: int = 6,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Exact near-dup pairs: (id_a, id_b, jaccard) with id_a < id_b.

    Inverted-index plan: explode each doc's distinct shingles, self-equi-join
    postings on the shingle value (plus optional blocking keys), and count
    shared shingles per pair with a hash aggregate — |A∩B| without ever
    materializing shingle arrays in the shuffle. Set sizes join back in and
    jaccard = inter / (|A| + |B| − inter). Any pair with jaccard > 0 shares a
    shingle, so the candidate set is exact for every positive threshold.
    Shuffle is O(postings + co-occurring pairs), never O(n²); a naive
    all-pairs comparison runs as a single-task nested-loop join.

    ``tokenized`` optionally supplies a prebuilt (id, _sh) frame (the
    :func:`_tokenized` shape, e.g. a session-shared persisted one) so the
    whole dedup family tokenizes the corpus once; only valid without
    ``block_cols`` (the blocked base carries the block columns through).
    """
    blocks = list(block_cols or [])
    if tokenized is not None and blocks:
        raise ValueError("tokenized= cannot be combined with block_cols=")
    par = df.sparkSession.sparkContext.defaultParallelism
    # Trailing repartition = exchange barrier: the tokenizing projection runs
    # once and all four consumers below (sizes ×2, postings ×2) read the same
    # shuffle output via ReusedExchange instead of re-tokenizing — higher-
    # order expressions run interpreted (no codegen CSE), so re-evaluation
    # is the dominant cost otherwise.
    # r16: no round-robin spread before the tokenize — the extra raw-text
    # shuffle cost more in-board than the single-task tiny-SF scan it
    # avoided (the whole dedup family read 12.8 s without vs 21–27 s with
    # across 3-run board medians); the trailing barrier alone remains the
    # r14-proven shape.
    base = tokenized if tokenized is not None else (
        df
        .select(F.col(id_col), *blocks, shingles(F.col(text_col), n).alias("_sh"))
        .filter(F.size("_sh") > 0)
        .repartition(par)
    )
    sizes = base.select(F.col(id_col), F.size("_sh").alias("_n"))
    # Postings join on xxhash64 of the shingle: 8-byte keys instead of
    # ~20-byte strings through the shuffle. A 64-bit collision would need
    # two distinct shingles of the SAME doc pair to collide to change a
    # count — vanishing at any realistic corpus (and harmless below the
    # jaccard threshold).
    postings = base.select(
        F.col(id_col), *blocks, F.explode("_sh").alias("_s_str")
    ).select(F.col(id_col), *blocks, F.xxhash64("_s_str").alias("_s"))
    # r16 REJECTED experiment (VERDICT r15 #4): a frequency pre-cut of
    # singleton shingles (groupBy key count >= 2, semi-join back) before
    # this self-join measured the exact_pairs stage 1.40 -> 1.97 s median
    # (8 interleaved in-JVM reps, identical 256 pairs) — both join sides
    # read the PERSISTED shingle cache, so the pre-cut's extra aggregate
    # + semi-join pass costs more than the singleton rows it removes
    # (they self-match once and die on the id_a < id_b filter inside the
    # same stage). Revisit only on a corpus where postings >> memory.
    a = postings.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        "_s",
    )
    b = postings.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        "_s",
    )
    inter = (
        a.join(b, ["_s", *[f"_b_{c}" for c in blocks]])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
                round_to,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _tokenized(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, _sh) behind an exchange barrier so every consumer reads the
    stored array instead of re-running the (interpreted, non-CSE'd)
    shingle expression. No spread before the tokenize (r16): chaining a
    raw-text round-robin ahead of the barrier shuffles the corpus twice
    per build and measured strictly worse in-board (see
    shingle_jaccard_pairs)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("_sh"))
        .filter(F.size("_sh") > 0)
        .repartition(par)
    )


def _minhash_flat(tokenized: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, _m0.._m{k-1}) minhash columns via explode → k codegen'd
    xxhash64 projections → hash-aggregate min per doc.

    This shape beats the k× ``array_min(transform(_sh, ...))`` folds ~3×:
    higher-order array functions run interpreted (each of the k passes
    re-walks the array through the expression evaluator), while the
    exploded form is one whole-stage-codegen pipeline and the aggregate's
    map-side partials shrink the shuffle to |corpus| × k longs."""
    exploded = tokenized.select(F.col(id_col), F.explode("_sh").alias("_s"))
    hashed = exploded.select(
        F.col(id_col),
        *[F.xxhash64(F.lit(i), F.col("_s")).alias(f"_m{i}") for i in range(k)],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"_m{i}").alias(f"_m{i}") for i in range(k)]
    )


def _verified_jaccard_pairs(
    cand: DataFrame,
    tokenized: DataFrame,
    id_col: str,
    threshold: float,
    round_to: int,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs via a postings join.

    ``cand`` is (id_a, id_b) and MUST be pair-distinct (duplicate candidate
    rows would multiply-count intersections); ``tokenized`` is (id, _sh)
    with distinct shingles. |A∩B| comes from joining the candidates to each side's
    exploded ``xxhash64`` postings and hash-counting matches — whole-stage
    codegen end to end, versus the earlier per-pair
    ``array_intersect``/``array_union`` folds that ran interpreted over
    full shingle arrays (the dominant cost once banding yields many
    candidates). Work is O(candidates × avg shingles); zero-intersection
    pairs drop out of the inner join, which is exact for any positive
    threshold. Same 64-bit-collision caveat as
    :func:`shingle_jaccard_pairs`.
    """
    sizes = tokenized.select(F.col(id_col), F.size("_sh").alias("_n"))
    postings = tokenized.select(
        F.col(id_col), F.explode("_sh").alias("_s_str")
    ).select(F.col(id_col), F.xxhash64("_s_str").alias("_s"))
    inter = (
        cand.join(
            postings.select(F.col(id_col).alias("id_a"), "_s"), "id_a"
        )
        .join(postings.select(F.col(id_col).alias("id_b"), "_s"), ["id_b", "_s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
                round_to,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
) -> DataFrame:
    """k-permutation MinHash signature per doc: min over shingles of
    xxhash64(perm_index, shingle) — pure JVM expressions (codegen'd
    exploded hash-aggregate; see :func:`_minhash_flat`)."""
    tokenized = _tokenized(df, id_col, text_col, n)
    flat = _minhash_flat(tokenized, id_col, k)
    sig = flat.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("signature"),
    )
    return tokenized.join(sig, id_col).select(
        F.col(id_col), F.col("_sh"), F.col("signature")
    )


def band_index(
    df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """LSH band-index rows ``(id, band, key)`` — k minhashes banded into
    ``bands`` 8-byte keys (hash of r = k/bands minhashes each).

    This IS the table-resident near-dup state for incremental ingest: persist
    it keyed on (band, key) — bucketed at scale — and a new batch's banded
    signatures join it to propose candidates without touching the corpus
    text. Same banding as :func:`minhash_lsh_pairs` (which consumes this),
    so an index built once serves both the one-shot and incremental paths.
    """
    rows_per_band = k // bands
    if tokenized is None:
        tokenized = _tokenized(df, id_col, text_col, n)
    flat = _minhash_flat(tokenized, id_col, k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[
                        F.col(f"_m{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return flat.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        F.col(id_col), F.col("bk.band"), F.col("bk.key")
    )


def _band_candidates(
    a_bands: DataFrame,
    b_bands: DataFrame | None,
    id_col: str,
    ordered: bool = True,
) -> DataFrame:
    """THE candidate contract, defined once (review finding, r11): distinct
    (id_a, id_b) pairs sharing at least one LSH band key. ``b_bands=None``
    is the self-join (within one corpus, ``id_a < id_b`` dedupes the
    unordered pair); ``ordered=False`` keeps cross-corpus pairs as
    (a-side, b-side) without the id inequality."""
    left = (b_bands if b_bands is not None else a_bands).select(
        F.col(id_col).alias("id_b"), "band", "key"
    )
    cand = a_bands.select(F.col(id_col).alias("id_a"), "band", "key").join(
        left, ["band", "key"]
    )
    if ordered:
        cand = cand.filter(F.col("id_a") < F.col("id_b"))
    return cand.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    round_to: int = 6,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Verified near-dup pairs via banded MinHash candidates.

    Plan: signatures (map-only) → explode b band keys (hash of r minhashes)
    → self-join on (band, key) → distinct candidate pairs → exact-Jaccard
    verification join → filter ≥ threshold. Shuffle volume is O(corpus ×
    bands) band keys + O(candidates) verification rows — never O(n²).

    ``tokenized`` optionally supplies a prebuilt (id, _sh) frame (the
    :func:`_tokenized` shape) shared with the rest of the dedup family.
    """
    if tokenized is None:
        tokenized = _tokenized(df, id_col, text_col, n)
    # Band join carries only (id, band, key) — 24-byte rows; shingle arrays
    # re-join afterwards (from the tokenized barrier) for the (few)
    # surviving candidate pairs, so signature and array stay decoupled.
    exploded = band_index(None, id_col, text_col, n, k, bands, tokenized=tokenized)
    cand = _band_candidates(exploded, None, id_col)
    return _verified_jaccard_pairs(cand, tokenized, id_col, threshold, round_to)


#: Jaccard above which the 16-hash / 8-band (r=2) banding's per-pair miss
#: probability (1−j²)⁸ drops below 5e-6: solve (1−j²)⁸ ≤ 5e-6 → j ≥ 0.8846.
#: This is a DISCLOSURE threshold, not a guarantee — MinHash banding has no
#: pigeonhole radius (unlike SimHash): any j < 1 pair can in principle miss.
#: Certified rows therefore emit (a) the per-pair banding LAW (found ⟺ some
#: band key matched — deterministic on any corpus) and (b) this floor flag,
#: so a re-rolled corpus with a marginal pair flips the flag visibly instead
#: of the row failing (or passing while silently under-recalling).
LSH_RECALL_FLOOR_16_8 = 0.89


def minhash_lsh_certified_pairs(
    df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    floor: float = LSH_RECALL_FLOOR_16_8,
    round_to: int = 6,
    tokenized: DataFrame | None = None,
    exact: DataFrame | None = None,
    band_rows: DataFrame | None = None,
) -> DataFrame:
    """Corpus-independent certification of the banded MinHash plan: every
    EXACT near-dup pair (complete postings derivation) annotated with

    - ``lsh_law_ok`` — (the banded+verified path found the pair) ⟺ (at
      least one of the pair's ``bands`` LSH band keys matched). True BY
      CONSTRUCTION on any corpus: candidates are exactly the band-key
      matches and verification is the same exact Jaccard that defines the
      pair list — so a banding, verification, or dedup bug flips a row red,
      while an honest probabilistic banding miss keeps both sides false.
      (The SimHash rows' pigeonhole-law shape, r7, applied to MinHash —
      whose banding has no deterministic radius, so the naive
      "banded == exact" certification held only while every qualifying
      pair's jaccard cleared the recall floor: a per-corpus die roll.)
    - ``above_recall_floor`` — jaccard ≥ ``floor`` (SQL-computable
      disclosure: pairs above it miss with P ≤ ~5e-6 at the default k/b;
      a marginal pair on a re-rolled corpus flips THIS flag instead of the
      row).

    A banded-verified pair absent from the exact list (impossible unless
    verification is broken) surfaces as an extra row with NULL jaccard →
    row count + law diverge → red. Shuffle: the exact postings join (the
    truth set — share it at scale) + O(corpus × bands) keys + O(candidates)
    verification rows.
    """
    if tokenized is None:
        tokenized = _tokenized(df, id_col, text_col, n)
    if exact is None:
        exact = shingle_jaccard_pairs(
            df, id_col, text_col, n, threshold, round_to=round_to,
            tokenized=tokenized,
        )
    if band_rows is None:
        band_rows = band_index(None, id_col, text_col, n, k, bands, tokenized=tokenized)
    cand = _band_candidates(band_rows, None, id_col)
    found = _verified_jaccard_pairs(cand, tokenized, id_col, threshold, round_to).select(
        "id_a", "id_b", F.lit(1).alias("_f")
    )
    # per exact pair: did ANY of its band keys match? (both docs of an exact
    # pair have shingles, hence exactly `bands` band rows each — inner joins
    # lose nothing)
    ka = band_rows.select(F.col(id_col).alias("id_a"), "band", F.col("key").alias("_ka"))
    kb = band_rows.select(F.col(id_col).alias("id_b"), "band", F.col("key").alias("_kb"))
    match = (
        exact.select("id_a", "id_b")
        .join(ka, "id_a")
        .join(kb, ["id_b", "band"])
        .groupBy("id_a", "id_b")
        .agg(F.max((F.col("_ka") == F.col("_kb")).cast("int")).alias("_bm"))
    )
    annotated = exact.join(match, ["id_a", "id_b"], "left")
    return annotated.join(found, ["id_a", "id_b"], "full_outer").select(
        "id_a",
        "id_b",
        "jaccard",
        (
            F.coalesce(F.col("_f"), F.lit(0)) == F.coalesce(F.col("_bm"), F.lit(0))
        ).alias("lsh_law_ok"),
        (F.col("jaccard") >= floor).alias("above_recall_floor"),
    )


def incremental_near_dedup(
    batch: DataFrame,
    history: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    round_to: int = 6,
    history_bands: DataFrame | None = None,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Near-dup decision table for a NEW ingest batch against an ingested
    corpus: one row per batch doc — ``(id, dup_of_history, dup_in_batch,
    keep)`` with ``keep = NOT dup_of_history AND NOT dup_in_batch``.

    ``tokenized`` optionally supplies a prebuilt (id, _sh) frame covering
    BOTH sides (the :func:`_tokenized` shape, e.g. the session-shared
    corpus frame) — each side then reads its semi-joined slice instead of
    re-running the shingle expression.

    The production shape of MinHash-LSH dedup (the near-dup twin of
    ``operators/dedup.py:incremental_dedup``): the corpus is append-only, so
    each ingest proposes candidates by joining the batch's banded signatures
    against the HISTORY'S BAND INDEX (``history_bands``, the persisted
    :func:`band_index` table — pass it to skip re-signing the corpus), then
    verifies ONLY the surviving candidates with exact shingle Jaccard
    against the few matched history docs (semi-join prunes the history
    tokenize to candidate ids). Within-batch duplicates use the
    deterministic earlier-id rule: a batch doc is ``dup_in_batch`` iff SOME
    smaller-id batch doc is within the threshold (SQL-expressible EXISTS
    semantics, not a greedy chain).

    Shuffle: O(batch × bands) band keys against the (bucketed) index +
    O(candidates) verification postings — the history is never re-scanned
    beyond the candidate semi-join. Batch and history ids must be disjoint
    (append-only corpus ids are). Docs too short to shingle (< n words)
    carry no signature, match nothing, and survive.

    Recall matches :func:`minhash_lsh_pairs`: a true pair is missed only
    when all bands miss (P ≈ (1-j^r)^b), so against an exact-Jaccard oracle
    the decision table is exact whenever every qualifying pair's jaccard
    clears the banding's effective recall floor (this corpus: j ≥ 0.89).
    """
    def _tok_slice(side: DataFrame) -> DataFrame:
        if tokenized is not None:
            return tokenized.join(side.select(id_col), id_col, "left_semi")
        return _tokenized(side, id_col, text_col, n)

    # The derived frames below are each referenced several times downstream
    # (the verification join reads a tokenize slice THREE times: sizes +
    # both postings sides; the band frames feed cross AND within candidate
    # joins) and none of them is persisted — without a cut, Catalyst
    # re-runs the tokenize/signature subtree per reference (the executed
    # plan held >100 redundant scan branches; the board's heaviest row).
    # Lazy localCheckpoints materialize each ONCE inside the first action
    # and stay honest for measurement (nothing runs at plan-build time);
    # blocks release with the frames via the ContextCleaner, which keeps
    # the per-micro-batch streaming use (near_ingest_batch_incremental)
    # bounded.
    tok_b = _tok_slice(batch).localCheckpoint(eager=False)
    bands_b = band_index(
        None, id_col, text_col, n, k, bands, tokenized=tok_b
    ).localCheckpoint(eager=False)

    flags = []
    if history is not None or history_bands is not None:
        if history_bands is None:
            history_bands = band_index(
                None, id_col, text_col, n, k, bands, tokenized=_tok_slice(history)
            )
        cross_cand = _band_candidates(
            history_bands, bands_b, id_col, ordered=False
        )
        if history is not None:
            # verification tokenizes ONLY candidate history docs.
            # dropDuplicates(id): a compact_history promote-then-crash
            # legitimately leaves a doc in BOTH the -1 partition and its
            # source epoch until the next fold heals it — duplicated
            # postings would double the intersection counts
            # (j = 2i/(na+nb-2i)) and flip replay keep decisions,
            # breaking the byte-identical exactly-once contract
            cand_hist = history.join(
                cross_cand.select(F.col("id_a").alias(id_col)).distinct(),
                id_col,
                "left_semi",
            ).dropDuplicates([id_col])
            tok_h = _tok_slice(cand_hist).localCheckpoint(eager=False)
            cross = _verified_jaccard_pairs(
                cross_cand, tok_b.unionByName(tok_h), id_col, threshold, round_to
            )
        else:
            raise ValueError(
                "history_bands without history: candidate verification needs "
                "the history docs — pass the corpus frame too"
            )
        flags.append(
            cross.select(F.col("id_b").alias(id_col))
            .distinct()
            .withColumn("dup_of_history", F.lit(True))
        )
    within_cand = _band_candidates(bands_b, None, id_col)
    within = _verified_jaccard_pairs(within_cand, tok_b, id_col, threshold, round_to)
    flags.append(
        within.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("dup_in_batch", F.lit(True))
    )

    out = batch.select(id_col)
    for f in flags:
        out = out.join(f, id_col, "left")
    if history is None and history_bands is None:
        out = out.withColumn("dup_of_history", F.lit(False))
    return out.select(
        F.col(id_col),
        F.coalesce("dup_of_history", F.lit(False)).alias("dup_of_history"),
        F.coalesce("dup_in_batch", F.lit(False)).alias("dup_in_batch"),
    ).withColumn("keep", ~F.col("dup_of_history") & ~F.col("dup_in_batch"))


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word tokens (Charikar): bit b of the signature is
    the sign of Σ_tokens (±1 depending on bit b of xxhash64(token)), ties →
    0: bit b set ⟺ 2·count_ones_b > n_tokens.

    Plan: explode tokens → 64 codegen'd bit-extract projections →
    hash-aggregate (count + 64 sums) per doc → pack the sign bits in one
    projection. The same exploded-hash-aggregate shape as
    :func:`_minhash_flat`, and for the same reason: the earlier per-row
    ``aggregate``+``zip_with`` fold ran in the expression interpreter
    (higher-order functions don't codegen) — ~tokens×64 interpreted lambda
    evals; the exploded form is one whole-stage-codegen pipeline whose
    map-side partials shrink the shuffle to |docs| × 65 longs. Docs whose
    text is NULL (no token rows survive the explode) rejoin with signature
    0, matching the old fold's ``coalesce``.
    """
    # r16: spread removed — the raw-text round-robin ahead of this
    # codegen'd explode+aggregate measured worse in-board (simhash rows
    # 2.89/1.02 s without vs 5.13–10.01/1.38–2.78 s with)
    base = df.select(F.col(id_col), words(F.col(text_col)).alias("_w"))
    hashed = base.select(F.col(id_col), F.explode("_w").alias("_t")).select(
        F.col(id_col), F.xxhash64("_t").alias("_h")
    )
    agg = hashed.groupBy(id_col).agg(
        F.count("*").alias("_n"),
        *[
            F.sum(F.shiftrightunsigned("_h", b).bitwiseAND(F.lit(1))).alias(f"_c{b}")
            for b in range(64)
        ],
    )
    # 1<<63 wraps to long min — the sign bit's two's-complement value.
    sig = F.lit(0).cast("long")
    for b in range(64):
        pow_b = F.lit((1 << b) if b < 63 else -(2**63)).cast("long")
        sig = sig + F.when(F.col(f"_c{b}") * 2 > F.col("_n"), pow_b).otherwise(
            F.lit(0).cast("long")
        )
    sigs = agg.select(F.col(id_col), sig.alias("simhash"))
    # Zero-token docs (NULL/empty text) never survive the explode; re-attach
    # them with signature 0 via a cheap filtered scan + union rather than a
    # left join (the join shuffled every id a second time just to coalesce
    # a handful of nulls).
    empty = base.filter(
        F.col("_w").isNull() | (F.size("_w") <= 0)  # size(NULL) is NULL, not -1
    ).select(
        F.col(id_col), F.lit(0).cast("long").alias("simhash")
    )
    return sigs.unionByName(empty)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Banding by ``n_chunks`` equal bit chunks (pigeonhole: distance ≤
    n_chunks−1 ⇒ some chunk equal): candidate pairs share at least one
    chunk — shuffle on small chunk keys. More chunks raise the guaranteed
    recall radius but shrink the key space (64/n_chunks bits), so hot
    buckets grow; 4×16-bit is the web-scale default, 8×8-bit buys a
    distance-7 guarantee on corpora small enough to afford 8-bit keys.
    """
    # Barrier: the simhash pass (tokenize + hash + bit fold) runs once; both
    # join sides reuse the exchange.
    sigs = simhash64(df, id_col, text_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return simhash_near_pairs_from_sigs(sigs, id_col, max_hamming, n_chunks)


def simhash_near_pairs_from_sigs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Banded near-pair join over precomputed (id, simhash) signatures —
    split out so a caller that needs the signatures for other plan branches
    too (e.g. the radius-aware wide-band certification) can compute them
    once behind one exchange barrier instead of re-running the token fold
    per consumer."""
    bits = 64 // n_chunks
    mask = (1 << bits) - 1
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", bits * c).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select(F.col(id_col), F.col("simhash"), F.col("ck.chunk"), F.col("ck.key"))
    left = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_s_a"), "chunk", "key")
    right = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_s_b"), "chunk", "key")
    # hamming filter BEFORE the dedup: the signatures ride along with the
    # banding keys, so the (cheap, codegen'd) bit_count prunes the candidate
    # stream to actual near-pairs and the distinct only dedups survivors —
    # at banding fan-out the pre-filter is ~10× less dedup-shuffle volume
    return (
        left.join(right, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_s_a").bitwiseXOR(F.col("_s_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


#: Above this corpus size the 8-bit band keys (256 buckets/chunk) start
#: going quadratic — bucket occupancy grows ∝ n/256, candidate pairs ∝
#: n²/256 per chunk — so the auto gate drops to 4×16-bit keys (65 536
#: buckets/chunk, linear far longer) at the cost of a Hamming ≤ 3
#: completeness guarantee instead of ≤ 7. The bound keeps the expected
#: uniform-case candidate stream near 100k pairs: 8 chunks × 256 ×
#: C(n/256, 2) ≈ n²/64 ⇒ n ≈ 2.5k.
SIMHASH_SMALL_CORPUS = 2_500


def simhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_hamming: int | None = None,
    n_chunks: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """SimHash candidates verified with exact shingle Jaccard:
    (id_a, id_b, jaccard ≥ threshold) for pairs within Hamming ≤ max_hamming.

    With ``n_chunks = max_hamming + 1`` the banding is *complete* for the
    Hamming radius (pigeonhole), so the output is exactly {exact-Jaccard
    pairs whose 64-bit SimHash distance ≤ max_hamming} — deterministic and,
    on corpora where every true near-dup lands within the radius (similar
    word multisets ⇒ similar sign vectors), identical to the exact result:
    that makes the exact-Jaccard SQL the oracle for this plan too.
    Shuffle: O(corpus × n_chunks) banding keys + O(candidates) shingle rows.

    When ``n_chunks``/``max_hamming`` are left unset, the banding is
    size-gated: 8×8-bit (complete to distance 7) up to
    :data:`SIMHASH_SMALL_CORPUS` rows, 4×16-bit (complete to distance 3,
    linear-shuffle at web scale) above. The one extra ``count()`` is a
    column-less metadata-cheap scan — but note it runs eagerly at plan
    construction, and the gated wide path has REDUCED recall (pairs at
    signature Hamming 4-7 are dropped). Callers that certify against an
    exact oracle must pin both parameters explicitly (the registered
    ``simhash_near_dupes`` query pins 8/7).
    """
    if n_chunks is None and max_hamming is not None:
        raise ValueError(
            "max_hamming without n_chunks is unsound: the default banding "
            "cannot guarantee completeness to an arbitrary radius — pass "
            "n_chunks >= max_hamming + 1 explicitly"
        )
    if n_chunks is None:
        small = df.count() <= SIMHASH_SMALL_CORPUS
        n_chunks = 8 if small else 4
    if max_hamming is None:
        max_hamming = n_chunks - 1
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"banding with n_chunks={n_chunks} is only complete to Hamming "
            f"distance {n_chunks - 1}; got max_hamming={max_hamming} — "
            "raise n_chunks or lower max_hamming"
        )
    cand = simhash_near_pairs(
        df, id_col, text_col, max_hamming=max_hamming, n_chunks=n_chunks
    ).select("id_a", "id_b")
    return _verified_jaccard_pairs(
        cand, _tokenized(df, id_col, text_col, n), id_col, threshold, round_to
    )
