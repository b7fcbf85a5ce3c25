"""Pipeline-plugin wrappers for the LLM data-prep operators, so YAML
tasks can declare training-data pipelines (dedup → score → filter →
tokenize) the same way the reference declares ETL tasks.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


@plugin("transform.dedup_exact")
def _dedup_exact(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.dedup import dedup_exact

    (df,) = inputs
    return dedup_exact(df, text_col=cfg.get("text_col", "text"), id_col=cfg.get("id_col", "doc_id"))


@plugin("transform.dedup_minhash")
def _dedup_minhash(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.dedup import (
        dedup_by_pairs,
        lsh_candidate_pairs,
        minhash_signature_arrow,
    )

    (df,) = inputs
    sigs = minhash_signature_arrow(
        df, text_col=cfg.get("text_col", "text"),
        num_hashes=int(cfg.get("num_hashes", 64)), k=int(cfg.get("shingle_k", 5)),
    )
    pairs = lsh_candidate_pairs(
        sigs, id_col=cfg.get("id_col", "doc_id"),
        bands=int(cfg.get("bands", 8)), sim_threshold=float(cfg.get("threshold", 0.7)),
    )
    return dedup_by_pairs(df, pairs, id_col=cfg.get("id_col", "doc_id"))


@plugin("transform.text_metrics")
def _text_metrics(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Annotate language guess, quality score, and token counts — all
    single-pass column expressions, no shuffle."""
    from rabbit_data_pipeline_spark.operators.text import (
        bpe_token_count,
        lang_id,
        quality_score,
        ws_token_count,
    )

    (df,) = inputs
    tc = F.col(cfg.get("text_col", "text"))
    return df.withColumns(
        {
            "lang_guess": lang_id(tc),
            "quality": quality_score(tc),
            "ws_tokens": ws_token_count(tc),
            "bpe_tokens": bpe_token_count(tc),
        }
    )


@plugin("transform.redact_pii")
def _redact_pii(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import redact_pii

    (df,) = inputs
    col = cfg.get("text_col", "text")
    return df.withColumn(cfg.get("out_col", col), redact_pii(F.col(col), kinds=cfg.get("kinds")))


@plugin("transform.chunk")
def _chunk(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import chunk_text

    (df,) = inputs
    return chunk_text(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        chunk_chars=int(cfg.get("chunk_chars", 512)),
        overlap=int(cfg.get("overlap", 64)),
    )


@plugin("transform.decontaminate")
def _decontaminate(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Two inputs: (corpus, benchmark) in upstream-declaration order.
    Keeps corpus rows NOT sharing >= min_shared word k-grams with the
    benchmark (mode=filter), or returns the flagged contamination
    report (mode=report). Positional roles are easy to silently swap
    in YAML, so `benchmark_input: 0` flips them explicitly when the
    benchmark node is declared first."""
    from rabbit_data_pipeline_spark.operators.text import decontaminate

    if len(inputs) != 2:
        raise ValueError(f"transform.decontaminate needs exactly 2 inputs (corpus, benchmark), got {len(inputs)}")
    bench_idx = int(cfg.get("benchmark_input", 1))
    if bench_idx not in (0, 1):
        raise ValueError("benchmark_input must be 0 or 1")
    benchmark = inputs[bench_idx]
    corpus = inputs[1 - bench_idx]
    id_col = cfg.get("id_col", "doc_id")
    flagged = decontaminate(
        corpus,
        benchmark,
        text_col=cfg.get("text_col", "text"),
        id_col=id_col,
        k=int(cfg.get("k", 8)),
        min_shared=int(cfg.get("min_shared", 1)),
    )
    if cfg.get("mode", "filter") == "report":
        return flagged
    return corpus.join(flagged.select(id_col), on=id_col, how="left_anti")


@plugin("transform.mix")
def _mix(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import stratified_mix

    (df,) = inputs
    return stratified_mix(
        df,
        group_col=cfg["group_col"],
        fractions={str(k): float(v) for k, v in cfg["fractions"].items()},
        id_col=cfg.get("id_col", "doc_id"),
    )


@plugin("transform.gopher_filter")
def _gopher_filter(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Drop documents failing the Gopher repetition thresholds (keeps
    the original columns; the stats join is keyed by the doc id)."""
    from rabbit_data_pipeline_spark.operators.text import gopher_repetition

    (df,) = inputs
    id_col = cfg.get("id_col", "doc_id")
    stats = gopher_repetition(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=id_col,
        max_dup_word_frac=float(cfg.get("max_dup_word_frac", 0.3)),
        max_top_bigram_frac=float(cfg.get("max_top_bigram_frac", 0.2)),
    )
    return df.join(stats.filter(F.col("keep")).select(id_col), on=id_col, how="inner")


@plugin("transform.tfidf")
def _tfidf(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import tfidf_terms

    (df,) = inputs
    return tfidf_terms(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        top_k=int(cfg.get("top_k", 3)),
        max_df=int(cfg["max_df"]) if "max_df" in cfg else None,
    )


@plugin("transform.pack")
def _pack(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import pack_sequences

    (df,) = inputs
    return pack_sequences(
        df,
        tokens_col=cfg["tokens_col"],
        id_col=cfg.get("id_col", "doc_id"),
        budget=int(cfg.get("budget", 2048)),
        n_buckets=int(cfg.get("n_buckets", 64)),
    )


@plugin("transform.score_model")
def _score_model(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Batched model scoring; optional min_score filter applies the
    classifier as a quality gate in the same pipeline step."""
    from rabbit_data_pipeline_spark.operators.model import score_documents

    (df,) = inputs
    out = score_documents(df, text_col=cfg.get("text_col", "text"), score_col=cfg.get("score_col", "model_score"))
    if "min_score" in cfg:
        out = out.filter(F.col(cfg.get("score_col", "model_score")) >= float(cfg["min_score"]))
    return out


@plugin("transform.embed")
def _embed(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.model import embed_documents

    (df,) = inputs
    return embed_documents(
        df,
        text_col=cfg.get("text_col", "text"),
        vec_col=cfg.get("vec_col", "embedding"),
        dim=int(cfg.get("dim", 16)),
    )


@plugin("transform.dedup_lines")
def _dedup_lines(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import dedup_lines

    (df,) = inputs
    return dedup_lines(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        min_docs=int(cfg.get("min_docs", 2)),
        broadcast_heavy=bool(cfg.get("broadcast_heavy", True)),
    )


@plugin("transform.url_dedup")
def _url_dedup(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Keep one row per canonical URL (the crawl-level first dedup):
    canonicalize, then keep the lowest id of each group."""
    from rabbit_data_pipeline_spark.operators.text import canonicalize_url
    from pyspark.sql.window import Window

    (df,) = inputs
    url_col, id_col = cfg.get("url_col", "url"), cfg.get("id_col", "doc_id")
    w = Window.partitionBy(canonicalize_url(F.col(url_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


@plugin("transform.sample_exact_k")
def _sample_exact_k(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    from rabbit_data_pipeline_spark.operators.text import sample_exact_k

    (df,) = inputs
    return sample_exact_k(
        df, group_col=cfg["group_col"], k=int(cfg["k"]), id_col=cfg.get("id_col", "doc_id")
    )


@plugin("transform.c4_clean")
def _c4_clean(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """C4 cleaning rules (line + page heuristics) as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import C4_BAD_WORDS, c4_clean

    (df,) = inputs
    return c4_clean(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        min_words=int(cfg.get("min_words", 5)),
        min_lines=int(cfg.get("min_lines", 3)),
        bad_words=tuple(cfg.get("bad_words", C4_BAD_WORDS)),
    )


@plugin("transform.split_assign")
def _split_assign(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Deterministic train/val/test assignment as a pipeline node.
    cfg.splits: {"train": 0.8, "val": 0.1, "test": 0.1} (ordered)."""
    from rabbit_data_pipeline_spark.operators.text import split_assign

    (df,) = inputs
    splits = list(cfg["splits"].items()) if "splits" in cfg else None
    return split_assign(df, id_col=cfg.get("id_col", "doc_id"), splits=splits)


@plugin("transform.domain_filter")
def _domain_filter(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Blocklist domain filtering as a pipeline node. The blocklist is
    either an upstream node (second input) or cfg.domains (inline)."""
    from rabbit_data_pipeline_spark.operators.text import domain_filter

    if len(inputs) == 2:
        df, bl = inputs
    else:
        (df,) = inputs
        bl = sch.spark.createDataFrame([(d,) for d in cfg["domains"]], "domain string")
    return domain_filter(df, bl, url_col=cfg.get("url_col", "url"), id_col=cfg.get("id_col", "doc_id"))


@plugin("transform.normalize")
def _normalize(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Aggressive text canonicalization as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import normalize_text

    (df,) = inputs
    col = cfg.get("text_col", "text")
    keep = bool(cfg.get("keep_newlines", True))  # pipelines default to
    # preserving lines so downstream line-based nodes keep working
    return df.withColumn(col, normalize_text(F.col(col), keep_newlines=keep))


@plugin("transform.dsir_weight")
def _dsir_weight(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """DSIR importance log-weights as a pipeline node. cfg carries the
    (tiny, hashed) model arrays: target_logprobs / source_logprobs."""
    from rabbit_data_pipeline_spark.operators.text import dsir_log_weights

    (df,) = inputs
    return dsir_log_weights(
        df,
        target_logprobs=[float(x) for x in cfg["target_logprobs"]],
        source_logprobs=[float(x) for x in cfg["source_logprobs"]],
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@plugin("transform.remove_passages")
def _remove_passages(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Cross-doc repeated-passage removal as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import remove_repeated_passages

    (df,) = inputs
    return remove_repeated_passages(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        k=int(cfg.get("k", 8)),
        min_docs=int(cfg.get("min_docs", 2)),
    )


@plugin("transform.dedup_lines_within")
def _dedup_lines_within(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Intra-document repeated-line removal as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import dedup_lines_within

    (df,) = inputs
    return dedup_lines_within(
        df, text_col=cfg.get("text_col", "text"), id_col=cfg.get("id_col", "doc_id")
    )


@plugin("transform.semantic_dedup")
def _semantic_dedup(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """SemDeDup as a pipeline node; centroids come from cfg (inline
    list of vectors) or an index dir saved by save_ivf_index."""
    from rabbit_data_pipeline_spark.operators.dedup import semantic_dedup

    (df,) = inputs
    if "index_path" in cfg:
        from rabbit_data_pipeline_spark.operators.similarity import load_ivf_index

        centroids, _ = load_ivf_index(sch.spark, cfg["index_path"])
    else:
        centroids = [(int(i), [float(x) for x in v]) for i, v in enumerate(cfg["centroids"])]
    return semantic_dedup(
        df,
        centroids,
        vec_col=cfg.get("vec_col", "embedding"),
        id_col=cfg.get("id_col", "vec_id"),
        threshold=float(cfg.get("threshold", 0.95)),
    )


@plugin("transform.corpus_diff")
def _corpus_diff(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Snapshot diff as a pipeline node: first input = old, second =
    new (reference fan-in order)."""
    from rabbit_data_pipeline_spark.operators.text import corpus_diff

    old, new = inputs
    return corpus_diff(
        old, new, id_col=cfg.get("id_col", "doc_id"), text_col=cfg.get("text_col", "text")
    )


@plugin("transform.sentiment")
def _sentiment(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Lexicon sentiment as a pipeline node; lexicons from cfg."""
    from rabbit_data_pipeline_spark.operators.text import (
        NEGATIVE_WORDS,
        POSITIVE_WORDS,
        sentiment_score,
    )

    (df,) = inputs
    col = cfg.get("text_col", "text")
    return df.withColumn(
        "sentiment",
        sentiment_score(
            F.col(col),
            positive=tuple(cfg.get("positive", POSITIVE_WORDS)),
            negative=tuple(cfg.get("negative", NEGATIVE_WORDS)),
        ),
    )


@plugin("transform.snippets")
def _snippets(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Keyword-in-context snippets as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import keyword_snippets

    (df,) = inputs
    return keyword_snippets(
        df,
        cfg["term"],
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        context=int(cfg.get("context", 30)),
    )


@plugin("transform.inverted_index")
def _inverted_index(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Sharded inverted-index build as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import inverted_index

    (df,) = inputs
    return inverted_index(
        df,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        shard_size=int(cfg.get("shard_size", 32)),
    )


@plugin("transform.bm25")
def _bm25(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """BM25 keyword ranking as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import bm25_scores

    (df,) = inputs
    return bm25_scores(
        df,
        list(cfg["query_terms"]),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        k1=float(cfg.get("k1", 1.2)),
        b=float(cfg.get("b", 0.75)),
        top_k=int(cfg.get("top_k", 20)),
    )


@plugin("transform.collocations")
def _collocations(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """PMI collocation mining as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.text import collocations

    (df,) = inputs
    return collocations(
        df,
        text_col=cfg.get("text_col", "text"),
        min_count=int(cfg.get("min_count", 5)),
        top_k=int(cfg.get("top_k", 20)),
    )


@plugin("transform.nb_train")
def _nb_train(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Naive Bayes model training as a pipeline node."""
    from rabbit_data_pipeline_spark.operators.classify import nb_train

    (df,) = inputs
    return nb_train(
        df,
        label_col=cfg.get("label_col", "lang"),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@plugin("transform.nb_classify")
def _nb_classify(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Naive Bayes inference as a pipeline node: inputs are
    (documents, model, priors)."""
    from rabbit_data_pipeline_spark.operators.classify import nb_classify

    df, model, priors = inputs
    return nb_classify(
        df,
        model,
        priors,
        label_col=cfg.get("label_col", "lang"),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
    )


@plugin("transform.rollup_merge")
def _rollup_merge(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Incremental rollup maintenance as a pipeline node: inputs are
    (stored_partials, new_batch); emits merged finalized rollup when
    cfg['finalize'] (default) else merged partials."""
    from rabbit_data_pipeline_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        rollup_partials,
    )

    stored, batch = inputs
    keys = list(cfg["keys"])
    merged = merge_rollups(stored, rollup_partials(batch, keys, cfg["value_col"]), keys)
    return finalize_rollup(merged, keys) if cfg.get("finalize", True) else merged


@plugin("transform.expectations")
def _expectations(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Data-quality expectation report as a pipeline node. Rules come
    as lists (YAML-friendly): [kind, ...args]; foreign_key refs the
    SECOND input."""
    from rabbit_data_pipeline_spark.operators.expect import expectation_report

    df, *refs = inputs
    rules = []
    for r in cfg["rules"]:
        kind = r[0]
        if kind == "foreign_key":
            rules.append((kind, list(r[1]), refs[0], list(r[2])))
        elif kind == "range":
            rules.append((kind, r[1], r[2], r[3]))
        elif kind == "unique":
            rules.append((kind, list(r[1])))
        else:
            rules.append((kind, r[1]))
    return expectation_report(df, rules)


@plugin("transform.quarantine")
def _quarantine(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Row quarantine as a pipeline node: emits the side selected by
    cfg['emit'] ('valid' default, or 'invalid' for the DLQ branch) —
    declare two nodes off one input to route both sides, errHandler
    style."""
    from rabbit_data_pipeline_spark.operators.expect import quarantine

    (df,) = inputs
    rules = []
    for r in cfg["rules"]:
        rules.append(tuple(r) if r[0] == "not_null" else (r[0], r[1], r[2], r[3]))
    valid, invalid = quarantine(df, rules)
    return invalid if cfg.get("emit") == "invalid" else valid
