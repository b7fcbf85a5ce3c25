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
# The CORRECTNESS_r{N} artifacts that existed when _DRIVER_PRIORITY
# was last authored — the driver appends r{basis+1} at round end, so
# tests/test_registry.py evaluates the stalest-cohort invariant
# against rounds <= basis and flags a basis lagging the artifacts by
# more than that one round (a never-re-authored list).
_ROTATION_BASIS_ROUND = 15

_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-16 front-load, slot budget 50 (50 used).
    # (a) keys whose code changed THIS round (optimization round 2):
    # the BFS/SSSP/connected-components size-gated broadcasts + long
    # node ids (q_shortest_path, q_weighted_paths, dedup_clusters,
    # q_entity_resolution), the q_pagerank/q_kcore budget-parse
    # refactor, the text_tokens Arrow gate, the dedup_ngram_jaccard
    # hint drop, the q_waiting_supplier comment/pin, and the AVI
    # palette-LUT cache (multimodal_video_neardup) —
    "text_tokens", "q_shortest_path", "q_weighted_paths", "dedup_clusters",
    "q_entity_resolution", "dedup_ngram_jaccard", "q_waiting_supplier",
    "multimodal_video_neardup", "q_pagerank", "q_kcore",
    # (b) VERDICT r15 ask #4: the r15-rewritten keys whose latest
    # driver verdict predates the rewrite —
    "q_ship_priority", "q_order_priority", "q_returned_items",
    "q_join_multiway", "q_big_orders", "dedup_minhash", "text_quality",
    "ann_bruteforce",
    # (c) backfill to 50 from the stalest cohorts (r12 first, then the
    # r13 head), tools/verdict_freshness.py's ordered paste minus the
    # keys already listed above —
    "layout_partitioned_read", "layout_bucketed_join", "layout_compacted_roundtrip",
    "layout_zorder_read", "ann_ivf", "text_dedup_lines", "text_url_dedup",
    "stream_windowed_agg", "stream_dedup", "stream_stream_join",
    "stream_sliding_window", "stream_static_join", "q_filter_project",
    "q_agg_pricing", "q_join_broadcast", "q_join_left", "q_join_semi",
    "q_window_rank", "q_subquery_avg", "q_percentile", "q_nation_volume",
    "q_count_distribution", "q_top_supplier", "q_or_predicates", "q_cube",
    "q_argminmax", "q_set_ops", "q_join_full", "q_sessionize",
    "q_sessionize_dg_key", "q_sessionize_dg_nev", "q_funnel",
)
# Next round (r17): the remaining r13-verdict keys (q_retention,
# q_anomaly, q_event_paths, q_ts_similarity, emb_*, text_split,
# text_data_card, corpus_diff, ... per tools/verdict_freshness.py),
# backfilled to 50 from the r14 cohort head; bump
# _ROTATION_BASIS_ROUND to 16 when re-authoring.


def registry() -> dict[str, Query]:
    # Import side-effect modules on first use.
    from rabbit_data_pipeline_spark.queries import events, llm, pipelines, seeded, streaming_q, tpch, tpch2, tpch3  # noqa: F401

    ordered = {k: _REGISTRY[k] for k in _DRIVER_PRIORITY if k in _REGISTRY}
    ordered.update((k, q) for k, q in _REGISTRY.items() if k not in ordered)
    return ordered
