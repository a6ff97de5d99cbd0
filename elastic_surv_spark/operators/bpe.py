"""Distributed byte-pair-encoding tokenizer training.

The scale-correct layout (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units", the algorithm behind GPT/Llama
tokenizers): ONE corpus pass builds the distinct-word frequency table, and
every merge round after that runs on that table — vocabulary-sized (≈10⁶
rows at web scale), orders of magnitude smaller than the corpus. Per round:

- weighted adjacent-pair counts: one explode + map-side-combined hash
  aggregate onto at most |symbol-vocab|² keys;
- the argmax pair via a bounded ``takeOrdered(1)``-style head (count desc,
  pair asc tiebreak — deterministic across runs and cluster layouts);
- the merge applied to every word's symbol array by an Arrow-batched
  left-to-right scan (the only part built-in array functions can't express:
  merging is sequential within a word).

Lineage is truncated with ``localCheckpoint`` each round (the same pattern
as operators/cluster.py's iterative connected components) so k rounds stay
O(k) work instead of O(k²) plan re-execution; the previous round's blocks
are freed eagerly.

No driver-side data beyond one (pair, count) row per round and the merge
list itself — exactly what a tokenizer trainer must return.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(df: DataFrame, col: str) -> DataFrame:
    """(word, wc) over whitespace-split text — the single corpus pass."""
    return (
        df.select(F.explode(F.split(F.col(col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _merge_symbols(symbols: list, a: str, b: str) -> list:
    out = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    col: str,
    n_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from ``df[col]`` text.

    Returns [(left, right, weighted_count), ...] in merge order. Stops
    early when the best remaining pair's count drops below ``min_freq``.
    """
    words = word_freq_table(df, col).select(
        F.split(F.col("word"), "").alias("syms"), "wc"
    )
    cur = words.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            # sequence(1, n) runs DESCENDING when n < 1, so 1-symbol words
            # must be filtered out before the pair transform.
            pairs = (
                cur.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("a"),
                                F.element_at("syms", i + 1).alias("b"),
                            ),
                        )
                    ).alias("p"),
                    "wc",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("wc").alias("cnt"))
            )
            head = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).take(1)
            if not head or head[0]["cnt"] < min_freq:
                break
            a, b, cnt = head[0]["a"], head[0]["b"], int(head[0]["cnt"])
            merges.append((a, b, cnt))

            def apply_merge(
                batches: Iterator[pd.DataFrame], a: str = a, b: str = b
            ) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["syms"] = pdf["syms"].map(
                        lambda s: _merge_symbols(list(s), a, b)
                    )
                    yield pdf

            nxt = cur.mapInPandas(apply_merge, "syms array<string>, wc long").localCheckpoint()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def apply_bpe(df: DataFrame, col: str, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize ``df[col]`` with a learned merge list: adds a
    ``bpe_tokens array<string>`` column. Merges broadcast with the closure
    (they are the tokenizer model — a few thousand entries)."""
    merge_seq = [(a, b) for a, b, _ in merges]

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Word → tokens memo, kept across batches within the partition:
        # corpus word frequencies are Zipfian, so the merge loop runs once
        # per DISTINCT word, not once per occurrence. Bounded so a
        # pathological all-unique partition can't grow it without limit.
        memo: dict[str, list[str]] = {}
        MEMO_MAX = 1_000_000

        def word_tokens(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            for a, b in merge_seq:
                if len(syms) < 2:
                    break
                syms = _merge_symbols(syms, a, b)
            if len(memo) >= MEMO_MAX:
                memo.clear()
            memo[w] = syms
            return syms

        for pdf in batches:
            toks = []
            for text in pdf[col]:
                out: list[str] = []
                if pd.isna(text):
                    toks.append(out)  # null text → empty token list, not "None"
                    continue
                for w in str(text).split(" "):
                    if w:
                        out.extend(word_tokens(w))
                toks.append(out)
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks
            yield pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(tokenize, f"{out_schema}, bpe_tokens array<string>")
