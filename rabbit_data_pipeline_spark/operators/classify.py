"""Exact multinomial Naive Bayes over word features — the corpus
quality/domain classifier tier (fastText-style supervised filtering à
la CCNet/RedPajama, with a model whose training AND inference are
bit-reproducible across engines).

Why NB and not logistic regression: the model is nothing but integer
count tables — per-class word counts, class totals, vocabulary size —
so distributed training is two keyed aggregations, merging two
training runs is integer addition (same contract as
operators/rollup.py), and every probability is a rational of exact
counts. Inference sums per-word log-likelihoods; each per-(doc, word,
class) term is floored to integer micro-units BEFORE the sum
(functions/exact.py rationale), so classification is
order-independent and hash-comparable to a DuckDB twin.

Scale shape: training = one (class, word) count shuffle + one tiny
class-prior agg, both map-side combined; the model is vocabulary-
sized (≪ corpus) and BROADCASTS to inference; inference = tokenize →
per-doc tf (one doc-keyed shuffle) → broadcast-join model → one
(doc, class) sum. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str, id_col: str, extra: list[str]) -> DataFrame:
    return df.select(
        id_col, *extra, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train: per-(class, word) occurrence counts. Returns
    (label, word, c) — with class totals/priors derivable by
    aggregation, this table IS the model (add-1 smoothing is applied
    at inference from exact counts)."""
    return (
        _tokens(df, text_col, id_col, [label_col])
        .groupBy(F.col(label_col).alias("label"), "word")
        .agg(F.count("*").alias("c"))
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classify each document: argmax over classes of
    ln prior + sum_w tf_w * ln((c_{l,w} + 1) / (tot_l + V)).

    `model` is nb_train output; `priors` has (label, n_docs).
    Per-term scores are micro-floored before the integer sum; argmax
    tie-breaks on (score desc, label asc) via min_by over a
    (-score, label) struct — total order, bit-stable. Returns
    (id, predicted, score) with score in units of 1e-6 nats."""
    tf = (
        _tokens(df, text_col, id_col, [])
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"))
    )
    totals = model.groupBy("label").agg(F.sum("c").alias("tot"))
    vocab = model.select("word").distinct().agg(F.count("*").alias("V"))
    n_all = priors.agg(F.sum("n_docs").alias("n_all"))
    classes = (
        priors.crossJoin(F.broadcast(n_all))
        .join(totals, "label")
        .crossJoin(F.broadcast(vocab))
    )
    # (doc, word, tf) × classes, left-joined to counts: a word unseen
    # in class l still contributes ln(1/(tot_l+V)) — the left join is
    # load-bearing, not a fallback.
    scored = (
        tf.crossJoin(F.broadcast(classes.select("label", "tot", "V")))
        .join(F.broadcast(model), ["label", "word"], "left")
        .withColumn(
            "term",
            F.floor(
                F.col("tf")
                * F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("tot") + F.col("V")))
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("term").alias("ll"))
    )
    prior_term = F.floor(
        F.log(F.col("n_docs").cast("double") / F.col("n_all")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    with_prior = scored.join(
        F.broadcast(classes.select("label", prior_term.alias("pt"))), "label"
    ).withColumn("score", F.col("ll") + F.col("pt"))
    best = with_prior.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("label").alias("predicted"), (F.col("score") / F.lit(1e6)).alias("score")),
            F.struct((-F.col("score")).alias("ns"), F.col("label").alias("l")),
        ).alias("b")
    )
    return best.select(id_col, "b.predicted", "b.score")
