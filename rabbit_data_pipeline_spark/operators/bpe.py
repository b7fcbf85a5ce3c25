"""Byte-pair-encoding tokenizer — distributed training + encoding.

SURVEY §2 L10 counts tokens with a BPE-ish regex; this module makes the
tokenizer itself first-class: the classic BPE algorithm (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") trained Spark-side and applied as a column expression. The
reference pipeline ships no tokenizer training — this is one of the
"beyond reference" LLM-corpus operators the brief asks for.

Scale shape (the point of doing this on Spark):
- The ONLY corpus-scale pass is the word-count aggregation — one
  shuffle keyed by word, map-side combined. Everything after operates
  on the DISTINCT-WORD histogram (Sennrich's own trick): at 100 TB the
  corpus may be 10^13 tokens but the histogram is ~10^7 rows.
- Each merge iteration is one small aggregation over the histogram
  (explode adjacent symbol pairs weighted by word count, argmax) plus
  one literal-folded merge application — no Python in either. The
  winning pair is a 1-row collect, the same justified offline-training
  driver round-trip as PQ codebook training (operators/similarity.py).
- The histogram is localCheckpoint'ed per iteration so the plan stays
  flat instead of nesting n_merges fold expressions (the same
  re-evaluation guard dedup_minhash documents).
- Encoding applies merges in rank order as chained fold expressions —
  fine for the tens of merges a test vocab needs; a 32k-merge
  production vocab would switch to one Arrow mapInPandas pass with the
  merge table broadcast (the justified-Python path, like MinHash
  signatures), which is semantically identical per greedy left-to-right
  application.

Determinism: pair selection orders by (count DESC, left ASC, right
ASC) — total order, no float anywhere — so training is bit-stable
across partitionings and engines; the oracle twin is an independent
pure-Python implementation of the same published algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with counts — the one corpus-scale shuffle."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol
    array: fold symbols, joining a symbol onto the accumulator's tail
    when (tail, symbol) == (left, right). 'aaa' + merge(a,a) → [aa, a]
    (the merged tail is 'aa', which no longer pairs with 'a')."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str]]:
    """Train BPE merges over a corpus; returns [(rank, left, right)].
    Stops early when no pair reaches ``min_pair_count``."""
    vocab = _word_histogram(df, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "cnt"
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("l"),
                                F.element_at(F.col("syms"), i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["c"] < min_pair_count:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((rank, left, right))
        vocab = vocab.select(
            _merge_expr(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint()
    return merges


def encode_expr(col: Column, merges: list[tuple[int, str, str]]) -> Column:
    """Column expr: one word → its BPE token array, merges applied in
    rank order (chained folds; see module docstring for the
    32k-merge Arrow alternative)."""
    syms = F.split(col, "")
    for _, left, right in sorted(merges):
        syms = _merge_expr(syms, left, right)
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents: per-word greedy merge application, tokens
    rejoined in document order with '·' marking in-word boundaries.
    Shuffle-free map pass. Returns (id, tokens, n_tokens)."""
    words = F.split(F.col(text_col), r"\s+")
    toks = F.flatten(
        F.transform(
            F.filter(words, lambda w: w != ""),
            lambda w: encode_expr(w, merges),
        )
    )
    per_word = F.transform(
        F.filter(words, lambda w: w != ""),
        lambda w: F.array_join(encode_expr(w, merges), "·"),
    )
    return df.select(
        F.col(id_col),
        F.array_join(per_word, " ").alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


# ---------------------------------------------------------------- oracle twin

def reference_bpe(
    texts: list[str], n_merges: int = 16, min_pair_count: int = 2
) -> list[tuple[int, str, str]]:
    """Independent pure-Python twin of train_bpe (the textbook
    algorithm, dict-based) — oracle builder for the seeded gate and
    the hand-checked unit tests."""
    hist: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            k = tuple(w)
            hist[k] = hist.get(k, 0) + 1
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in hist.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (left, right), _ = best
        merges.append((rank, left, right))
        new_hist: dict[tuple[str, ...], int] = {}
        for syms, c in hist.items():
            k = _apply(syms, left, right)
            new_hist[k] = new_hist.get(k, 0) + c  # collapsed spellings add up
        hist = new_hist
    return merges


def _apply(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def reference_encode(text: str, merges: list[tuple[int, str, str]]) -> list[str]:
    toks: list[str] = []
    for w in text.split():
        syms = tuple(w)
        for _, left, right in sorted(merges):
            syms = _apply(syms, left, right)
        toks.append("·".join(syms))
    return toks
