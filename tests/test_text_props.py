"""Property tests: the Gopher repetition stats and TF-IDF ranking vs
independent pure-Python references, over random word-soup corpora and
random partitionings — the distributed explode/agg/join pipelines must
reproduce the single-process definition exactly."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings, strategies as st

word = st.sampled_from(["aa", "bb", "cc", "dd", "spam", "x1"])
doc = st.lists(word, min_size=1, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def _norm_toks(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else [""]


def _py_gopher(text: str) -> dict:
    toks = _norm_toks(text)
    n = len(toks)
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    top = max(Counter(bigrams).values()) if bigrams else 0
    return {
        "n_words": n,
        "dup_word_frac": (n - len(set(toks))) / max(n, 1),
        "top_bigram_frac": top / max(n - 1, 1),
        "mean_word_len": sum(map(len, toks)) / max(n, 1),
    }


@given(docs=corpus, parts=st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_gopher_matches_python_reference(spark, docs, parts):
    from rabbit_data_pipeline_spark.operators.text import gopher_repetition

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"]).repartition(parts)
    got = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    assert len(got) == len(docs)
    for i, text in enumerate(docs):
        want = _py_gopher(text)
        for k, v in want.items():
            assert abs(got[i][k] - v) < 1e-12, (i, k, got[i][k], v, text)


def _py_tfidf(docs: list[str], top_k: int) -> set[tuple[int, str, int, int, int]]:
    tf = {(i, t): c for i, d in enumerate(docs) for t, c in Counter(_norm_toks(d)).items() if t}
    dfreq = Counter(t for (_, t) in tf)
    out = set()
    for i in range(len(docs)):
        terms = [(t, c) for (j, t), c in tf.items() if j == i]
        ranked = sorted(terms, key=lambda tc: (-tc[1] / dfreq[tc[0]], tc[0]))
        for rank, (t, c) in enumerate(ranked[:top_k], 1):
            out.add((i, t, c, dfreq[t], rank))
    return out


@given(docs=corpus, parts=st.integers(1, 4), top_k=st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_tfidf_matches_python_reference(spark, docs, parts, top_k):
    from rabbit_data_pipeline_spark.operators.text import tfidf_terms

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"]).repartition(parts)
    got = {
        (r["doc_id"], r["term"], r["tf"], r["df"], r["rank"])
        for r in tfidf_terms(df, top_k=top_k).collect()
    }
    assert got == _py_tfidf(docs, top_k)


def test_split_assign_stable_and_proportional(spark):
    """Hypothesis-free determinism probe: (1) a doc's split NEVER
    changes when the corpus doubles (assignment is id-only); (2) the
    md5-threshold fractions land near the requested 80/10/10 on 4k
    uniform ids; (3) re-running yields identical assignments."""
    from rabbit_data_pipeline_spark.operators.text import split_assign

    small = spark.range(2000).withColumnRenamed("id", "doc_id")
    big = spark.range(4000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in split_assign(small).collect()}
    s2 = {r["doc_id"]: r["split"] for r in split_assign(big).collect()}
    assert all(s2[i] == s1[i] for i in s1)
    from collections import Counter

    c = Counter(s2.values())
    assert abs(c["train"] / 4000 - 0.8) < 0.03
    assert abs(c["val"] / 4000 - 0.1) < 0.02
    assert abs(c["test"] / 4000 - 0.1) < 0.02
    s3 = {r["doc_id"]: r["split"] for r in split_assign(big).collect()}
    assert s3 == s2
