"""Similarity search over embedding columns.

- ``ann_bruteforce``: exact cosine top-k — broadcast the (small) query
  set against the full corpus: ONE pass over the embeddings, per-
  partition top-k via the rank window, no corpus shuffle beyond the
  window's query-key exchange. The correctness baseline.
- ``ann_lsh``: the scale path — random-hyperplane signatures bucket
  both sides; only same-bucket candidates get exact cosine, then
  rerank. Sub-linear candidate sets at the cost of bounded recall
  (multi-probe on neighboring buckets recovers most of it).
- ``ann_ivf``: IVF-style variant — corpus assigned to the nearest of
  C fixed centroids (one broadcast pass), queries probe the nearest
  `n_probe` centroids only.

All cosine math is functions/vector.py (bit-identical to DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rabbit_data_pipeline_spark.functions.vector import cosine, hyperplane_bits


def ann_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (q_id, n_id, cos_sim, rank)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket in ANY of n_tables
    independent hyperplane tables (OR-amplification — single-table
    recall for a neighbor at angle θ is (1-θ/π)^planes, which is poor
    for the mid-similarity neighbors that matter; T tables lift it to
    1-(1-p)^T). Bucketing is one pass computing all tables' bits; the
    per-table explode only replicates (id, bucket) keys, not vectors.

    Pass `dim` when known — otherwise one `first()` row is fetched to
    sniff the vector width before planning."""
    import numpy as np

    rng = np.random.RandomState(seed)
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    tables = [rng.standard_normal((n_planes, dim)).tolist() for _ in range(n_tables)]

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        buckets = F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{t}:"), hyperplane_bits(F.col(vec_col), planes))
                    for t, planes in enumerate(tables)
                ]
            )
        )
        return df.select(
            F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias), buckets.alias("bucket")
        )

    cb = bucketed(corpus, "n_id", "n_vec")
    qb = bucketed(queries, "q_id", "q_vec")
    candidates = (
        cb.join(F.broadcast(qb), on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "q_vec", "n_vec")
        .distinct()  # a pair may collide in several tables — score once
    )
    scored = candidates.select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF: partition the corpus by nearest centroid; queries scan only
    their n_probe nearest centroid partitions.

    `centroids` is the trained codebook — real IVF trains k-means
    offline and serves with fixed centroids, so injection is the
    production contract. When omitted, the n_centroids corpus rows
    with the lowest xxhash64(id, seed) become centroids: a
    layout-INDEPENDENT pseudo-random sample (same seed + same ids =
    same centroids, regardless of partitioning or input file order,
    unlike rdd.takeSample whose draw depends on the RDD layout). The
    plan is TakeOrderedAndProject — per-partition top-k merged on the
    driver, only n_centroids rows ever collected (random-sample
    centroids are the standard cheap substitute for k-means; the
    serving plan — the part that matters at scale — is identical
    either way)."""
    if centroids is None:
        sampled = (
            corpus.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(n_centroids)
            .collect()
        )
        centroids = [(int(i), [float(x) for x in r[vec_col]]) for i, r in enumerate(sampled)]

    def nearest_expr(vec, n: int):
        """array of (sim, centroid_id) sorted desc, top n centroid ids"""
        sims = F.array(
            *[F.struct(cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("s"), F.lit(cid).alias("cid")) for cid, cv in centroids]
        )
        top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
        return F.transform(top, lambda t: t["cid"])

    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        F.element_at(nearest_expr(F.col(vec_col), 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.explode(nearest_expr(F.col(vec_col), n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
