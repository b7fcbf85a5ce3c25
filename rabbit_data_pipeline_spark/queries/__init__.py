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
_ROTATION_BASIS_ROUND = 14

_DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-15 front-load, slot budget 50 (50 used). VERDICT r14 ask
    # #1: rotate the FULL 37-key r11-verdict cohort (every key whose
    # latest verdict still sits on r11 code), backfilled to 50 with
    # the first 13 keys of the r12 cohort — after this round no key's
    # latest verdict is older than r12 code. No changed-code
    # front-load this round: the round-15 diffs live in tools/
    # (bench_diff recovery bound + corrupt-floor handling,
    # vet_idle_record waiver + probe-skip reasons) and bench.py's
    # probe schedule — none touch any query builder or operator, so
    # no registry key's semantics changed. List is
    # tools/verdict_freshness.py's paste, verbatim:
    # (a) the 37-key r11 cohort —
    "text_fingerprint", "dedup_exact", "dedup_ngram_jaccard", "pipeline_llm_prep",
    "ann_bruteforce", "text_pii_redact", "text_chunks", "text_word_freq",
    "text_decontaminate", "text_mix", "text_pack", "pipeline_e2e",
    "pipeline_fanout", "source_sql", "id_gen", "sync_insert_missing",
    "sink_upsert", "sync_chunked", "sync_flag_update", "delete_where",
    "sync_scd2", "dedup_minhash", "dedup_simhash", "dedup_embedding",
    "ann_lsh", "ann_ivfpq", "pipeline_web_prep", "dedup_semantic",
    "text_bpe_encode", "stream_session_window", "q_window_running", "q_case_agg",
    "q_market_share", "q_big_orders", "q_waiting_supplier", "q_array_agg",
    "q_triangles",
    # (b) backfill to 50 from the r12 cohort head —
    "dedup_clusters", "multimodal_ann", "text_repeated_ngrams",
    "text_gopher_quality", "text_tfidf", "ann_range", "ann_pq",
    "text_sample_exact_k", "find_files", "line_parser_csv", "xml_parse",
    "xml_format", "file_roundtrip",
)
# Next round (r16): the remaining 36 r12-verdict keys (the layout_*
# family, ann_ivf, text_dedup_lines, text_url_dedup, the stream_*
# r12 tier, q_filter_project onward through the graph queries),
# backfilled to 50 from the r13 cohort.
# tools/verdict_freshness.py prints the ordered list (stalest cohort
# first) ready to paste; bump _ROTATION_BASIS_ROUND to 15 when
# re-authoring.


def registry() -> dict[str, Query]:
    # Import side-effect modules on first use.
    from rabbit_data_pipeline_spark.queries import events, llm, pipelines, seeded, streaming_q, tpch, tpch2, tpch3  # noqa: F401

    ordered = {k: _REGISTRY[k] for k in _DRIVER_PRIORITY if k in _REGISTRY}
    ordered.update((k, q) for k, q in _REGISTRY.items() if k not in ordered)
    return ordered
