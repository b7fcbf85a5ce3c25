"""Model-inference plumbing: score or embed documents with a batched
model behind ``mapInPandas`` — the step where a real quality
classifier (fastText-style) or embedding model (sentence-transformer)
plugs into the pipeline.

The Spark side is real and tested: Arrow batch iteration, output
schemas, partition sizing guidance, model-handle lifecycle (one lazy
init per PYTHON WORKER, not per batch — loading a model per batch is
the classic 100×-slowdown mistake). No model library ships in this
container, so the default model_fns are deterministic stand-ins
(documented, seeded) and loading a named real model raises a
clearly-marked NotImplementedError — mirroring the multimodal codec
gates (operators/multimodal.py).

Scale notes: inference is compute-bound Python — size partitions so
each worker gets enough batches to amortize model init
(`spark.sql.execution.arrow.maxRecordsPerBatch` controls batch rows),
and repartition to a multiple of the worker count before the pass.
The output adds columns, never drops them: downstream filters stay
Catalyst-visible.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StructField, StructType

# model name -> loader; real entries would import fasttext/onnx/etc.
_REAL_MODELS: dict[str, Callable] = {}


def _load_sentence_transformer(name: str) -> Callable[[pd.Series], pd.Series]:
    """Optional-dependency embedder loader. The returned model_fn
    captures only the model NAME (strings pickle; a torch model would
    either fail to serialize or ship full weights in every task
    closure) and loads the model lazily ONCE per Python worker via a
    function-attribute memo — the per-worker init point
    score/embed_documents document. The import is probed eagerly so a
    missing dep fails at load_model() on the driver, not mid-job."""
    try:
        import sentence_transformers  # noqa: F401  (optional dep, probe only)
    except ImportError as e:
        raise NotImplementedError(
            f"model {name!r} needs sentence-transformers on the cluster "
            "(pip install sentence-transformers), or pass model_fn="
        ) from e

    def fn(texts: pd.Series) -> pd.Series:
        model = getattr(fn, "_model", None)
        if model is None:
            from sentence_transformers import SentenceTransformer

            model = fn._model = SentenceTransformer(name)
        vecs = model.encode(list(texts.fillna("")), show_progress_bar=False)
        return pd.Series([list(map(float, v)) for v in vecs], index=texts.index)

    return fn


def _load_fasttext(spec: str) -> Callable[[pd.Series], pd.Series]:
    """Optional-dependency classifier loader for
    ``fasttext:<path>[#<label>]``: scores every document with the
    probability of ONE FIXED label (the ``#label`` suffix, else the
    model's first label from get_labels()) — a top-1 probability would
    fold confident-bad and confident-good documents onto the same
    score and be useless as a filter threshold. The closure captures
    only the path/label strings (picklable); the pybind model handle
    is loaded lazily once per Python worker."""
    try:
        import fasttext  # noqa: F401  (optional dep, probe only)
    except ImportError as e:
        raise NotImplementedError(
            f"model {spec!r} needs fasttext on the cluster "
            "(pip install fasttext-wheel), or pass model_fn="
        ) from e
    rest = spec.split("fasttext:", 1)[1]
    path, _, label = rest.partition("#")

    def fn(texts: pd.Series) -> pd.Series:
        state = getattr(fn, "_state", None)
        if state is None:
            import fasttext as ft

            model = ft.load_model(path)
            # fasttext labels carry a '__label__' prefix; the natural
            # user spelling 'fasttext:/m.bin#positive' omits it, which
            # would silently score every document 0.0 (ADVICE r7) —
            # normalize, then fail loudly if the label still isn't in
            # the model rather than returning all-zero scores.
            target = label or model.get_labels()[0]
            if target not in model.get_labels() and not target.startswith("__label__"):
                target = f"__label__{target}"
            if target not in model.get_labels():
                raise ValueError(
                    f"label {label!r} not in model labels {model.get_labels()[:10]}..."
                )
            state = fn._state = (model, target)
        model, target = state
        cleaned = [str(t or "").replace("\n", " ") for t in texts]
        labels, probs = model.predict(cleaned, k=-1)
        out = []
        for ls, ps in zip(labels, probs):
            by_label = dict(zip(ls, ps))
            out.append(float(by_label.get(target, 0.0)))
        return pd.Series(out, index=texts.index)

    return fn


def load_model(name: str):
    """Load a named real model — the documented integration point,
    import-gated exactly like the multimodal codecs: a registered
    loader wins; `sentence-transformers/...` names load through the
    optional sentence-transformers dep; `fasttext:<path>` through the
    optional fasttext dep; anything else (or a missing dep) raises the
    clearly-marked gate. The deterministic stand-ins remain the
    no-dependency default (model_fn=None on score/embed)."""
    if name in _REAL_MODELS:
        return _REAL_MODELS[name]()
    if name.startswith("sentence-transformers/"):
        return _load_sentence_transformer(name)
    if name.startswith("fasttext:"):
        return _load_fasttext(name)
    raise NotImplementedError(
        f"model {name!r}: no model runtime ships in this container; "
        "pass model_fn= to score_documents/embed_documents instead"
    )


def fake_quality_model(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in classifier: a seeded hash of the
    normalized text mapped to [0, 1). Batched exactly like a real
    model forward pass."""
    def one(t: str) -> float:
        h = hashlib.md5((t or "").strip().lower().encode()).digest()
        return int.from_bytes(h[:8], "big") / 2**64

    return texts.map(one)


def fake_embedding_model(dim: int = 16) -> Callable[[pd.Series], pd.Series]:
    """Deterministic stand-in embedder: dim unit-normalized features
    from seeded md5 stripes of the text — stable across runs and
    partitionings, shaped exactly like a sentence-encoder output."""

    def embed(texts: pd.Series) -> pd.Series:
        def one(t: str) -> list[float]:
            raw = (t or "").strip().lower().encode()
            vals = []
            for i in range(dim):
                h = hashlib.md5(raw + bytes([i])).digest()
                vals.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
            n = math.sqrt(sum(v * v for v in vals)) or 1.0
            return [v / n for v in vals]

        return texts.map(one)

    return embed


def score_documents(
    df: DataFrame,
    model_fn: Callable[[pd.Series], pd.Series] | None = None,
    text_col: str = "text",
    score_col: str = "model_score",
) -> DataFrame:
    """Append a per-document model score. mapInPandas streams Arrow
    batches through `model_fn(Series[str]) -> Series[float]`; the
    model handle initializes lazily ONCE per worker process (the
    closure is deserialized once, batches iterate within it)."""
    fields = df.schema.fields + [StructField(score_col, DoubleType())]
    out_schema = StructType(fields)
    fn = model_fn or fake_quality_model

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = fn  # lazy per-worker init point: resolve/load here, not per batch
        for pdf in batches:
            pdf[score_col] = model(pdf[text_col]).astype("float64")
            yield pdf

    return df.mapInPandas(run, out_schema)


def embed_documents(
    df: DataFrame,
    model_fn: Callable[[pd.Series], pd.Series] | None = None,
    text_col: str = "text",
    vec_col: str = "embedding",
    dim: int = 16,
) -> DataFrame:
    """Append an embedding column (`array<float>`) — the text →
    vector step feeding the dedup/ANN operators. Same batched
    mapInPandas shape as score_documents; output plugs directly into
    ann_* / embedding_near_pairs (operators/similarity.py, dedup.py)."""
    fields = df.schema.fields + [StructField(vec_col, ArrayType(FloatType()))]
    out_schema = StructType(fields)
    fn = model_fn or fake_embedding_model(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = fn
        for pdf in batches:
            pdf[vec_col] = model(pdf[text_col])
            yield pdf

    return df.mapInPandas(run, out_schema)
