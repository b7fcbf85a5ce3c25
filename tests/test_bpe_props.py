"""Property tests for the batched-BPE exactness rule (pure Python, no
Spark): on arbitrary histograms, the batch `_select_batch` returns must
be exactly the pairs sequential argmax training would pick next, in
order — the theorem operators/bpe.py's distributed trainer rests on —
and the single-pass batch application must equal applying each merge
greedily in rank order. Hypothesis hammers tiny alphabets where merge
interactions (token collisions, ties, overlap quirks) concentrate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rabbit_data_pipeline_spark.operators.bpe import (
    _apply,
    _apply_batch_list,
    _select_batch,
)

WORDS = st.lists(
    st.tuples(st.text(alphabet="abc", min_size=1, max_size=7), st.integers(1, 5)),
    min_size=1,
    max_size=12,
)


def _pair_counts(hist: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    out: dict[tuple[str, str], int] = {}
    for syms, c in hist.items():
        for p in zip(syms, syms[1:]):
            out[p] = out.get(p, 0) + c
    return out


def _sequential_next(hist, n, min_pair_count):
    """The next ≤n merges the textbook sequential algorithm picks."""
    picks = []
    for _ in range(n):
        pairs = _pair_counts(hist)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        picks.append(best[0])
        hist = _apply_hist(hist, *best[0])
    return picks


def _apply_hist(hist, left, right):
    out: dict[tuple[str, ...], int] = {}
    for syms, c in hist.items():
        k = _apply(syms, left, right)
        out[k] = out.get(k, 0) + c
    return out


@settings(max_examples=300, deadline=None)
@given(WORDS, st.integers(1, 2), st.integers(1, 6))
def test_selected_batch_is_the_sequential_prefix(words, min_pair_count, budget):
    """For any histogram: _select_batch's output == the next len(batch)
    pairs sequential training would choose, in order. This is the
    exactness theorem itself, so the distributed trainer cannot diverge
    from the textbook algorithm regardless of batch boundaries."""
    hist: dict[tuple[str, ...], int] = {}
    for w, c in words:
        hist[tuple(w)] = hist.get(tuple(w), 0) + c
    alphabet = {s for syms in hist for s in syms}
    pairs = _pair_counts(hist)
    if not pairs:
        return
    cands = sorted(((c, l, r) for (l, r), c in pairs.items()), key=lambda t: (-t[0], t[1], t[2]))
    if cands[0][0] < min_pair_count:
        return  # trainer would stop before calling _select_batch
    batch = _select_batch(cands, alphabet, budget=budget, min_pair_count=min_pair_count, complete=True)
    assert 1 <= len(batch) <= budget
    expected = _sequential_next(hist, len(batch), min_pair_count)
    assert batch == expected


@settings(max_examples=300, deadline=None)
@given(WORDS, st.integers(1, 2), st.integers(1, 6))
def test_batch_application_equals_sequential_application(words, min_pair_count, budget):
    """Single-pass dict application of a selected batch == applying its
    merges one at a time, greedy left-to-right, on every word."""
    hist: dict[tuple[str, ...], int] = {}
    for w, c in words:
        hist[tuple(w)] = hist.get(tuple(w), 0) + c
    alphabet = {s for syms in hist for s in syms}
    pairs = _pair_counts(hist)
    if not pairs:
        return
    cands = sorted(((c, l, r) for (l, r), c in pairs.items()), key=lambda t: (-t[0], t[1], t[2]))
    if cands[0][0] < min_pair_count:
        return
    batch = _select_batch(cands, alphabet, budget=budget, min_pair_count=min_pair_count, complete=True)
    merge_map = {(l, r): l + r for l, r in batch}
    for syms in hist:
        seq = tuple(syms)
        for left, right in batch:
            seq = _apply(seq, left, right)
        assert tuple(_apply_batch_list(list(syms), merge_map)) == seq


@settings(max_examples=200, deadline=None)
@given(WORDS, st.integers(1, 4))
def test_truncated_candidate_list_stays_exact(words, top_k):
    """With a top-K truncated candidate list (complete=False), the
    conservative c_stop must still keep the batch a sequential prefix."""
    hist: dict[tuple[str, ...], int] = {}
    for w, c in words:
        hist[tuple(w)] = hist.get(tuple(w), 0) + c
    alphabet = {s for syms in hist for s in syms}
    pairs = _pair_counts(hist)
    if not pairs:
        return
    cands = sorted(((c, l, r) for (l, r), c in pairs.items()), key=lambda t: (-t[0], t[1], t[2]))
    truncated = cands[:top_k]
    batch = _select_batch(
        truncated, alphabet, budget=10, min_pair_count=1, complete=len(cands) <= top_k
    )
    expected = _sequential_next(hist, len(batch), 1)
    assert batch == expected
