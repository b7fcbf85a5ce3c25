"""BPE trainer/encoder equivalence + scale-shape gates.

The three training engines (pure-Python twin, driver-incremental,
distributed-batched) and both encode engines (codegen folds, Arrow map
pass) must be bit-identical; the batched trainer's exactness rule
(operators/bpe.py module docstring) is exercised on adversarial
tiny-alphabet corpora where merged-token collisions and count ties are
the norm, plus the hand-derived cases. Scale gates assert the driver
path trains a 1000-merge vocab in a constant number of Spark jobs and
the batched path takes far fewer rounds than merges."""

from __future__ import annotations

import random
import time

import pytest

from rabbit_data_pipeline_spark.operators.bpe import (
    _train_incremental,
    bpe_encode,
    bpe_encode_arrow,
    reference_bpe,
    reference_encode,
    train_bpe,
)


def _random_corpus(seed: int, alphabet: str, n_words: int, max_len: int) -> list[str]:
    """A few documents over a tiny alphabet — small alphabets maximize
    merge interactions (token collisions, shared symbols, ties)."""
    rng = random.Random(seed)
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, max_len)))
        for _ in range(n_words)
    ]
    docs = []
    for _ in range(4):
        k = rng.randint(3, max(3, n_words))
        docs.append(" ".join(rng.choice(words) for _ in range(k)))
    return docs


def _hist(texts: list[str]) -> list[tuple[list[str], int]]:
    h: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            h[w] = h.get(w, 0) + 1
    return [(list(w), c) for w, c in h.items()]


# ------------------------------------------------------- engine equivalence


@pytest.mark.parametrize("seed", range(10))
def test_incremental_matches_reference_randomized(seed):
    """Driver-incremental (delta counts + lazy heap) == textbook
    recompute-everything twin, on adversarial tiny-alphabet corpora."""
    alphabet = ["ab", "abc"][seed % 2]
    texts = _random_corpus(seed, alphabet, n_words=25, max_len=8)
    for mpc in (1, 2):
        expected = reference_bpe(texts, n_merges=40, min_pair_count=mpc)
        got = _train_incremental(_hist(texts), n_merges=40, min_pair_count=mpc)
        assert got == expected, f"seed={seed} mpc={mpc}"


@pytest.mark.parametrize("seed", range(4))
def test_distributed_batched_matches_reference_randomized(spark, seed):
    """Batched distributed trainer == sequential textbook twin, both
    with a tiny top-K (forces truncated candidate lists, the
    conservative c_stop branch) and a full one."""
    texts = _random_corpus(seed, "ab", n_words=20, max_len=7)
    expected = reference_bpe(texts, n_merges=30, min_pair_count=1)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for top_k in (8, 4096):
        got = train_bpe(
            df, n_merges=30, min_pair_count=1, strategy="distributed", batch_top_k=top_k
        )
        assert got == expected, f"seed={seed} top_k={top_k}"


def test_auto_strategy_thresholds(spark):
    """auto == driver under the row budget, distributed above it —
    identical merges either way."""
    texts = _random_corpus(3, "abc", n_words=15, max_len=6)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    expected = reference_bpe(texts, n_merges=10)
    s1: dict = {}
    assert train_bpe(df, n_merges=10, stats=s1) == expected
    assert s1["strategy"] == "driver"
    s2: dict = {}
    assert train_bpe(df, n_merges=10, driver_max_words=2, stats=s2) == expected
    assert s2["strategy"] == "distributed"


def test_encode_engines_identical(spark):
    """fold / arrow / pure-Python encodes agree on a >_FOLD_LIMIT merge
    table (auto must dispatch to arrow), boundaries and counts included."""
    texts = _random_corpus(7, "abcd", n_words=30, max_len=8)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    merges = train_bpe(df, n_merges=40, min_pair_count=1)
    assert len(merges) > 24  # auto → arrow territory
    fold = {r["doc_id"]: r for r in bpe_encode(df, merges, engine="fold").collect()}
    arrow = {r["doc_id"]: r for r in bpe_encode(df, merges, engine="auto").collect()}
    assert set(fold) == set(arrow) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = reference_encode(t, merges)
        assert fold[i]["tokens"] == arrow[i]["tokens"] == " ".join(toks)
        n = sum(tok.count("·") + 1 for tok in toks)
        assert fold[i]["n_tokens"] == arrow[i]["n_tokens"] == n


def test_encode_arrow_preserves_id_type_and_whitespace(spark):
    """String ids survive; repeated/odd whitespace tokenizes like the
    twin (split keeps no empties on either engine)."""
    df = spark.createDataFrame(
        [("d1", "  aa   ab\tba  "), ("d2", "b")], ["doc_id", "text"]
    )
    merges = [(0, "a", "a"), (1, "a", "b")]
    rows = {r["doc_id"]: r for r in bpe_encode_arrow(df, merges).collect()}
    assert rows["d1"]["tokens"] == " ".join(reference_encode("  aa   ab\tba  ", merges))
    assert rows["d1"]["tokens"] == "aa ab b·a"
    assert rows["d2"]["n_tokens"] == 1


def test_unicode_codepoint_symbols_agree_across_engines(spark):
    """Spark's split(col, '') advances by CODEPOINT (astral-plane
    emoji stay whole, matching Python list()) — pin it, since a
    surrogate-half divergence would silently split every engine pair
    (driver vs distributed training, fold vs arrow encode) on real
    LLM corpora."""
    texts = ["😀😀 a😀b a😀b", "éñé éñé 日本 日本 日本"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    expected = reference_bpe(texts, n_merges=8, min_pair_count=1)
    assert any(any(len(c) > 0 for c in (l, r)) for _, l, r in expected)
    assert train_bpe(df, n_merges=8, min_pair_count=1) == expected
    assert (
        train_bpe(df, n_merges=8, min_pair_count=1, strategy="distributed")
        == expected
    )
    fold = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, expected, engine="fold").collect()}
    arrow = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, expected, engine="arrow").collect()}
    for i, t in enumerate(texts):
        want = " ".join(reference_encode(t, expected))
        assert fold[i] == arrow[i] == want


def test_unicode_whitespace_is_not_a_word_boundary(spark):
    """Spark/Java \\s is ASCII-only; NBSP / ideographic space
    (ubiquitous in web/CJK corpora) must stay INSIDE a word on every
    engine - fold, arrow, and the pure-Python twin all segment
    identically."""
    text = "ab\u00a0ab cd\u3000cd ab"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = [(0, "a", "b"), (1, "c", "d")]
    fold = bpe_encode(df, merges, engine="fold").collect()[0]
    arrow = bpe_encode(df, merges, engine="arrow").collect()[0]
    want = " ".join(reference_encode(text, merges))
    assert fold["tokens"] == arrow["tokens"] == want
    assert want == "ab\u00b7\u00a0\u00b7ab cd\u00b7\u3000\u00b7cd ab"
    assert fold["n_tokens"] == arrow["n_tokens"] == 7


def test_null_text_passes_through_both_encode_engines(spark):
    """Fold emits null tokens/count for null text; arrow must match
    instead of crashing the task."""
    df = spark.createDataFrame([(1, "aa"), (2, None)], ["doc_id", "text"])
    merges = [(0, "a", "a")]
    for engine in ("fold", "arrow"):
        rows = {r["doc_id"]: r for r in bpe_encode(df, merges, engine=engine).collect()}
        assert rows[1]["tokens"] == "aa" and rows[1]["n_tokens"] == 1
        assert rows[2]["tokens"] is None and rows[2]["n_tokens"] is None, engine


def test_unknown_strategy_raises(spark):
    df = spark.createDataFrame([(1, "aa")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unknown strategy"):
        train_bpe(df, n_merges=2, strategy="Driver")


def test_empty_merge_table_persists(spark, tmp_path):
    from rabbit_data_pipeline_spark.operators.bpe import load_merges, save_merges

    path = str(tmp_path / "empty_merges.parquet")
    save_merges(spark, [], path)
    assert load_merges(spark, path) == []


def test_empty_and_whitespace_corpora():
    """Degenerate inputs: no words → no merges, on the pure twin."""
    assert reference_bpe([], n_merges=4) == []
    assert reference_bpe(["   ", "\t\n"], n_merges=4) == []
    assert _train_incremental([], n_merges=4, min_pair_count=1) == []


def test_merge_table_roundtrips_through_parquet(spark, tmp_path):
    """Train → save → load → encode must equal encoding with the
    in-memory table (the tokenizer-as-artifact path, no pickle)."""
    from rabbit_data_pipeline_spark.operators.bpe import load_merges, save_merges

    texts = _random_corpus(11, "abc", n_words=20, max_len=6)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    merges = train_bpe(df, n_merges=20, min_pair_count=1)
    path = str(tmp_path / "bpe_merges.parquet")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges
    a = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    b = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, load_merges(spark, path)).collect()}
    assert a == b


def test_driver_topm_truncates_deterministically(spark):
    """driver_topm == exact BPE over the top-M (count DESC, word ASC)
    word types — the documented approximation for histograms too big
    to collect; with M ≥ vocab it equals full training."""
    texts = ["aa aa aa bb bb cc", "aa bb zz"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    full = train_bpe(df, n_merges=5, min_pair_count=1)
    assert train_bpe(df, n_merges=5, min_pair_count=1, strategy="driver_topm") == full
    # M=2 keeps {aa:4, bb:3} only -> merges trained on that histogram
    got = train_bpe(
        df, n_merges=5, min_pair_count=1, strategy="driver_topm", driver_max_words=2
    )
    assert got == reference_bpe(["aa aa aa aa bb bb bb"], n_merges=5, min_pair_count=1)


def test_driver_topm_identity_and_divergence_corpora(spark):
    """The VERDICT r7 ask-#4 pair. Identity: on the seeded gate corpus
    (disjoint-alphabet singleton tail, every tail bigram unique →
    sub-min_pair_count), truncation to the 9 head word types is
    merge-table-identical to FULL-histogram training. Divergence: when
    three singleton tail types share the bigram ('0','0'), full
    training merges it but driver_topm (which drops the tail) provably
    cannot — the documented approximation boundary, asserted in both
    directions."""
    from rabbit_data_pipeline_spark.queries.seeded import bpe_topm_corpus

    rows = bpe_topm_corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = reference_bpe([t for _, t in rows], n_merges=12)
    got = train_bpe(df, n_merges=12, strategy="driver_topm", driver_max_words=9)
    assert got == full

    # Divergence twin: same head, but the tail shares a frequent bigram.
    div_rows = [(i, t) for i, (_, t) in enumerate(rows[:3])] + [(3, "001 002 003")]
    ddf = spark.createDataFrame(div_rows, ["doc_id", "text"])
    dfull = reference_bpe([t for _, t in div_rows], n_merges=20, min_pair_count=2)
    assert ("0", "0") in {(l, r) for _, l, r in dfull}  # full training merges the tail bigram
    dtopm = train_bpe(
        ddf, n_merges=20, min_pair_count=2, strategy="driver_topm", driver_max_words=9
    )
    assert ("0", "0") not in {(l, r) for _, l, r in dtopm}
    assert dtopm != dfull
    # ...and the truncated result is exact BPE over the head alone.
    assert dtopm == reference_bpe([t for _, t in div_rows[:3]], n_merges=20, min_pair_count=2)


def test_encode_memo_is_lru_not_first_seen():
    """The eviction must drop the LEAST-RECENTLY-USED half, not the
    first-seen half: a Zipf-head word that re-hits constantly has to
    survive every eviction (first-seen order would evict exactly the
    head words, inverting the cache's purpose). Pure Python via the
    extracted encoder."""
    from rabbit_data_pipeline_spark.operators import bpe as bpe_mod

    enc = bpe_mod._make_word_encoder([("a", "a", "aa")], memo_cap=4)
    enc("head")  # the hot word, inserted FIRST
    for i in range(40):  # a stream of one-off tail words...
        enc(f"tail{i:02d}")
        enc("head")  # ...with the head re-hitting between each
        assert "head" in enc._memo  # survives every eviction
    assert len(enc._memo) <= 4


def test_encode_arrow_memo_cap_evicts_and_stays_correct(spark):
    """ADVICE r7: the per-partition word memo is capped; past the cap
    the oldest half is evicted and encoding stays token-identical to
    the fold engine (the memo is a cache, never semantics). The cap
    rides the mapInPandas CLOSURE by value (ADVICE r8): Spark's Python
    workers re-import operators/bpe.py, so a monkeypatched module
    global never reaches the executor and the old form of this test
    silently exercised the default 1M cap (no eviction at 31 words)."""
    texts = [(i, f"w{i:03d} aa w{i:03d}") for i in range(30)]  # 31 distinct words >> cap
    df = spark.createDataFrame(texts, ["doc_id", "text"]).coalesce(1)
    merges = [(0, "a", "a")]
    arrow = {r["doc_id"]: (r["tokens"], r["n_tokens"]) for r in bpe_encode(df, merges, engine="arrow", memo_cap=4).collect()}
    fold = {r["doc_id"]: (r["tokens"], r["n_tokens"]) for r in bpe_encode(df, merges, engine="fold").collect()}
    assert arrow == fold


# -------------------------------------------------------------- scale gates


def test_driver_path_trains_1k_merges_in_constant_jobs(spark):
    """The r6 scale-killer gate: a 1000-merge vocab must NOT cost one
    Spark job per merge. The driver engine runs the histogram shuffle
    plus a constant handful of jobs, then trains merge 0 and merge 999
    from the same collected histogram — asserted via the job group."""
    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 12)))
        for _ in range(1500)
    }
    rows = [(i, " ".join(sorted(words)[i::50])) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    sc = spark.sparkContext
    group = f"bpe-1k-{time.time_ns()}"
    sc.setJobGroup(group, "bpe driver-path job-count gate")
    try:
        stats: dict = {}
        merges = train_bpe(df, n_merges=1000, min_pair_count=1, stats=stats)
    finally:
        sc.setJobGroup("", "")
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert stats["strategy"] == "driver"
    assert len(merges) == 1000
    assert jobs <= 5, f"driver path ran {jobs} Spark jobs for 1000 merges"
    # exactness at this size too: the twin recomputes counts in full
    expected = reference_bpe([t for _, t in rows], n_merges=1000, min_pair_count=1)
    assert merges == expected
    # ...and the Arrow encoder handles the 1000-merge table (memo +
    # substring prefilter) identically to the twin.
    from rabbit_data_pipeline_spark.operators.bpe import bpe_encode

    sample = df.limit(3)
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(sample, merges).collect()}
    for doc_id, text in sample.collect():
        assert got[doc_id] == " ".join(reference_encode(text, merges))


def test_distributed_path_batches_merges(spark):
    """Disjoint-symbol pairs with distinct counts batch aggressively:
    rounds must be far below merges (here: every pair lands in round 1)."""
    alphabet = [chr(ord("α") + i) for i in range(80)]
    rows = [
        (i, " ".join([alphabet[2 * i] + alphabet[2 * i + 1]] * (100 - i)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stats: dict = {}
    merges = train_bpe(
        df, n_merges=40, min_pair_count=1, strategy="distributed", stats=stats
    )
    assert len(merges) == 40
    assert stats["rounds"] <= 3, f"{stats['rounds']} rounds for 40 merges"
    assert merges == reference_bpe([t for _, t in rows], n_merges=40, min_pair_count=1)


def test_encode_arrow_plan_is_single_map_pass(spark):
    """No shuffle in the Arrow encode: the plan holds exactly one
    Exchange-free mapInPandas over the scan."""
    df = spark.createDataFrame([(1, "aa ab")], ["doc_id", "text"])
    merges = [(0, "a", "a")]
    plan = bpe_encode_arrow(df, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
