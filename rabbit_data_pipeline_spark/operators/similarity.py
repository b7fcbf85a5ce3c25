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

from rabbit_data_pipeline_spark.functions.vector import as_double, cosine, hyperplane_bits


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


def ann_range(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Range search: ALL corpus vectors with cosine ≥ threshold per
    query (the vector-DB `range` API, vs top-k's fixed count) —
    retrieval-augmentation filters and near-dup audits want "everything
    this similar", not "the 5 nearest". Broadcast the query set, one
    corpus pass, pure filter — no window, no shuffle at all (cheaper
    than top-k, which needs the per-query rank exchange)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def rp_project(
    corpus: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "rp",
) -> DataFrame:
    """Random-projection dimensionality reduction: out[j] = <vec,
    planes[j]> — the Johnson-Lindenstrauss step that turns 768-dim
    embeddings into the 8-32 dims the LSH/IVF index layers actually
    bucket on (hyperplane_bits is the 1-bit special case of this; here
    the full projections are kept so downstream cosine ordering is
    approximately preserved, not just the sign). The plane matrix
    ships as plan literals — one codegen'd map pass, no shuffle, no
    Python; at 100 TB this runs at scan speed in the same stage as the
    parquet read."""
    from rabbit_data_pipeline_spark.functions.vector import as_double, dot

    outs = F.array(
        *[dot(as_double(F.col(vec_col)), F.array(*[F.lit(float(p)) for p in plane])) for plane in planes]
    )
    return corpus.select(F.col(id_col), outs.alias(out_col))


def make_rp_planes(out_dim: int, in_dim: int, seed: int = 13) -> list[list[float]]:
    """Deterministic JL plane matrix (seeded gaussian, 6-dp literals so
    both engines parse identical doubles), scaled by 1/sqrt(out_dim)
    so expected squared norms are preserved."""
    import math
    import random as _random

    rng = _random.Random(seed)
    s = 1.0 / math.sqrt(out_dim)
    return [
        [round(rng.gauss(0.0, 1.0) * s, 6) for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


# --------------------------------------------------- product quantization


def _sub(vec, j: int, dsub: int):
    """Subvector j (0-based) of a vector column, as doubles."""
    return F.transform(F.slice(vec, j * dsub + 1, dsub), lambda x: x.cast("double"))


def _l2sq(sub, centroid: list[float]):
    """Σ (x-c)² as a left-assoc fold — bit-identical to a chained
    `+` in SQL, which is how the DuckDB oracle spells it."""
    lits = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(sub, lits, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def sample_pq_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    ks: int = 16,
    dim: int = 64,
    seed: int = 42,
) -> list[list[list[float]]]:
    """PQ codebook (m subspaces × ks centroids × dim/m floats) from a
    layout-independent pseudo-random corpus sample: the ks rows with
    the lowest xxhash64(id, seed) supply each subspace's centroids
    (same ids + seed ⇒ same codebook, any partitioning). Sampled
    centroids are the cheap stand-in for per-subspace k-means — the
    encode/serve plan is identical either way, and `train_ivf_centroids`
    shows the k-means upgrade shape. Only ks rows reach the driver."""
    dsub = dim // m
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(ks)
        .collect()
    )
    return [
        [[float(x) for x in r[vec_col][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def pq_quantization_error(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
):
    """Mean reconstruction error E[Σ_j min_c L2²(subvec_j, cb[j][c])]
    — the quality metric PQ training minimizes. One literal-folded map
    pass + a scalar agg."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    errs = []
    for j in range(m):
        sub = _sub(F.col(vec_col), j, dsub)
        cands = F.array(*[F.struct(_l2sq(sub, cv).alias("d"), F.lit(c).alias("cid")) for c, cv in enumerate(codebook[j])])
        errs.append(F.element_at(F.array_sort(cands), 1)["d"])
    total = errs[0]
    for e in errs[1:]:
        total = total + e
    return corpus.agg(F.avg(total).alias("err")).first()["err"]


def train_pq_codebook(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    ks: int = 16,
    dim: int = 64,
    n_iters: int = 5,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd k-means for the PQ codebook — the offline
    training step real PQ serving assumes (sample_pq_codebook is the
    cheap init). Each iteration is fully distributed and trains ALL m
    subspaces at once: one literal-folded map pass assigns every
    row's m codes, a posexplode keys components by (subspace, code,
    within-dim) and ONE shuffle of those triples computes the new
    means map-side-combined; only m×ks×dim/m averages reach the
    driver. Empty cells keep their previous centroid. At 100 TB train
    on a sample — codebook quality needs representative data, not all
    of it.

    Init is per-subspace farthest-point (k-means++-style), NOT a plain
    sample: with ks centroids over ~ks natural clusters a random draw
    almost surely doubles up on one cluster and leaves another empty
    (P(all distinct) = ks!/ks^ks), and Lloyd cannot escape that local
    optimum — measured 30× worse reconstruction error on planted
    subspace clusters. Cost: ks-1 tiny agg jobs — each round picks the
    farthest point for ALL m subspaces in ONE min_by aggregation
    (ordering struct = (-min_dist, id), i.e. max distance with
    lowest-id tie-break), not m sequential TakeOrdered jobs."""
    dsub = dim // m
    first = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(1)
        .collect()[0][vec_col]
    )
    cb = [[[float(x) for x in first[j * dsub : (j + 1) * dsub]]] for j in range(m)]
    for _ in range(ks - 1):
        aggs = []
        for j in range(m):
            sub = _sub(F.col(vec_col), j, dsub)
            min_d = F.least(*[_l2sq(sub, cv) for cv in cb[j]]) if len(cb[j]) > 1 else _l2sq(sub, cb[j][0])
            aggs.append(
                F.min_by(
                    F.col(vec_col),
                    F.struct((-min_d).alias("nmd"), F.col(id_col).alias("i")),
                ).alias(f"far{j}")
            )
        far_row = corpus.agg(*aggs).collect()[0]
        for j in range(m):
            far = far_row[f"far{j}"]
            cb[j].append([float(x) for x in far[j * dsub : (j + 1) * dsub]])
    for _ in range(max(0, n_iters)):
        enc = corpus.select(
            pq_codes_expr(cb, vec_col).alias("__codes"),
            F.col(vec_col).alias("__vec"),
        ).select("__codes", F.posexplode("__vec").alias("d", "val"))
        comp = enc.select(
            F.floor(F.col("d") / dsub).cast("int").alias("j"),
            F.element_at(F.col("__codes"), (F.floor(F.col("d") / dsub) + 1).cast("int")).alias("c"),
            F.pmod(F.col("d"), F.lit(dsub)).alias("i"),
            "val",
        )
        means = comp.groupBy("j", "c", "i").agg(F.avg("val").alias("mu")).collect()
        by_cell: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_cell.setdefault((r["j"], r["c"]), {})[r["i"]] = float(r["mu"])
        cb = [
            [
                [by_cell[(j, c)].get(i, cb[j][c][i]) for i in range(dsub)]
                if (j, c) in by_cell
                else cb[j][c]
                for c in range(ks)
            ]
            for j in range(m)
        ]
    return cb


def pq_codes_expr(codebook: list[list[list[float]]], vec_col: str = "embedding"):
    """Column expr: PQ codes array — code[j] = argmin_c L2²(subvec_j,
    codebook[j][c]); ties → lowest c (struct sort)."""
    m = len(codebook)
    dsub = len(codebook[0][0])
    codes = []
    for j in range(m):
        sub = _sub(F.col(vec_col), j, dsub)
        cands = F.array(
            *[
                F.struct(_l2sq(sub, cv).alias("d"), F.lit(c).alias("cid"))
                for c, cv in enumerate(codebook[j])
            ]
        )
        codes.append(F.element_at(F.array_sort(cands), 1)["cid"])
    return F.array(*codes)


def pq_encode(
    corpus: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors to PQ codes. Output (id, codes: array<int>) —
    m bytes-ish per vector instead of dim floats, the compression that
    makes 100 TB ANN serveable from RAM. The codebook folds into the
    plan as literals: encoding is one codegen'd map pass, no join, no
    shuffle, no Python."""
    return corpus.select(F.col(id_col), pq_codes_expr(codebook, vec_col).alias("codes"))


def _pq_lut(codebook: list[list[list[float]]], vec_col: str):
    """Per-query lookup table lut[j][c] = L2²(q_sub_j, codebook[j][c])."""
    dsub = len(codebook[0][0])
    return F.array(
        *[
            F.array(*[_l2sq(_sub(F.col(vec_col), j, dsub), cv) for cv in codebook[j]])
            for j in range(len(codebook))
        ]
    )


def _pq_adc(m: int):
    """ADC score from broadcast lut + codes: m lookups, left-assoc adds
    (matches the oracle's chained `+`)."""
    score = None
    for j in range(m):
        term = F.element_at(F.element_at(F.col("lut"), j + 1), F.element_at(F.col("codes"), j + 1) + 1)
        score = term if score is None else score + term
    return score


def ann_pq(
    codes: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance ANN over PQ codes: each query precomputes a
    lookup table lut[j][c] = L2²(q_sub_j, codebook[j][c]) (m×ks
    distances, computed ONCE per query), then every corpus row scores
    with m table lookups + m adds — never touching a full vector.
    That's the PQ serving trade: the corpus lives as m-byte codes, the
    per-pair cost is O(m) instead of O(dim).

    Scale shape: queries (with their luts) broadcast; the code table
    streams through one scored pass; per-query top-k via the rank
    window is the only exchange. Returns (q_id, n_id, adc, rank) —
    adc ascending (it is a distance, not a similarity)."""
    q = queries.select(F.col(id_col).alias("q_id"), _pq_lut(codebook, vec_col).alias("lut"))
    scored = (
        codes.withColumnRenamed(id_col, "n_id")
        .join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", _pq_adc(len(codebook)).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def nearest_cells_l2(vec, centroids: list[tuple[int, list[float]]], n: int):
    """Column expr: ids of the n nearest centroids by L2² (ties →
    lowest cid via the ascending struct sort). The L2 twin of
    `nearest_cells` — IVF-PQ's coarse quantizer must match the metric
    ADC ranks with."""
    cands = F.array(
        *[
            F.struct(_l2sq(as_double(vec), cv).alias("d"), F.lit(cid).alias("cid"))
            for cid, cv in centroids
        ]
    )
    return F.transform(F.slice(F.array_sort(cands), 1, n), lambda t: t["cid"])


def ann_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC architecture): the coarse quantizer
    partitions the corpus into centroid cells, each vector is stored
    only as its m PQ codes, and a query probes its n_probe nearest
    cells scoring candidates by asymmetric distance — the standard
    shape for trillion-vector serving (RAM holds m bytes/vector, the
    scan touches n_probe/C of the corpus).

    Plan: corpus → ONE map pass computing (cell, codes) — both the
    coarse argmin and the encode are literal-folded, no Python, no
    shuffle; queries (with their luts) broadcast, the cell equi-join
    prunes to probed cells, the per-query top-k rank window is the
    only exchange. Returns (q_id, n_id, adc, rank), adc ascending."""
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.element_at(nearest_cells_l2(F.col(vec_col), centroids, 1), 1).alias("cell"),
        pq_codes_expr(codebook, vec_col).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _pq_lut(codebook, vec_col).alias("lut"),
        F.explode(nearest_cells_l2(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", _pq_adc(len(codebook)).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def nearest_cells(vec, centroids: list[tuple[int, list[float]]], n: int):
    """Column expr: ids of the `n` nearest centroids (cosine, ties by
    centroid id via the struct sort). Broadcast-free — the codebook is
    folded into the plan as literals, so assignment is one codegen'd
    map pass, no join, no shuffle."""
    sims = F.array(
        *[
            F.struct(cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("s"), F.lit(cid).alias("cid"))
            for cid, cv in centroids
        ]
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
    return F.transform(top, lambda t: t["cid"])


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means for the IVF codebook, expressed as DataFrame
    ops — the offline training step real IVF serving assumes.

    init: deterministic farthest-point (k-means++-style) — the first
    centroid is the lowest-xxhash64(id, seed) row, each next one the
    corpus row LEAST similar to any chosen so far (ties by id). That
    guarantees well-separated clusters each get a seed, where a pure
    random draw can put two seeds in one cluster and Lloyd then sticks
    in the merged local optimum. Cost: n_centroids-1 TakeOrdered
    passes, offline. Each Lloyd iteration: assign every vector to its
    nearest centroid (literal-folded map pass, no shuffle), then
    recompute means via posexplode → groupBy(cell, dim) — ONE shuffle
    of (cell, dim, value) triples per iteration, reduced map-side;
    only C×D averages ever reach the driver. Empty cells keep their
    previous centroid. At 100 TB train on a sample
    (corpus.sample(0.001) is the standard k-means practice) — the
    codebook quality needs representative data, not all of it."""
    first = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(1)
        .collect()[0]
    )
    chosen: list[list[float]] = [[float(x) for x in first[vec_col]]]
    for _ in range(n_centroids - 1):
        max_sim = F.greatest(
            *[cosine(F.col(vec_col), F.array(*[F.lit(x) for x in cv])) for cv in chosen]
        ) if len(chosen) > 1 else cosine(F.col(vec_col), F.array(*[F.lit(x) for x in chosen[0]]))
        far = (
            corpus.select(id_col, vec_col)
            .orderBy(max_sim.asc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        chosen.append([float(x) for x in far[vec_col]])
    centroids = list(enumerate(chosen))
    for _ in range(max(0, n_iters)):
        # Two selects: putting the struct-sort HOF and a multi-alias
        # posexplode in ONE select trips a Spark analysis quirk that
        # strips the struct field aliases (FIELD_NOT_FOUND on `cid`).
        assigned = corpus.select(
            F.element_at(nearest_cells(F.col(vec_col), centroids, 1), 1).alias("cell"),
            F.col(vec_col).alias("__vec"),
        ).select("cell", F.posexplode("__vec").alias("dim", "val"))
        means = assigned.groupBy("cell", "dim").agg(F.avg("val").alias("m")).collect()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["m"])
        centroids = [
            (cid, [by_cell[cid][d] for d in range(len(old))] if cid in by_cell else old)
            for cid, old in centroids
        ]
    return centroids


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
    train_iters: int = 0,
) -> DataFrame:
    """IVF: partition the corpus by nearest centroid; queries scan only
    their n_probe nearest centroid partitions.

    `centroids` is the trained codebook — real IVF trains k-means
    offline and serves with fixed centroids, so injection is the
    production contract (`train_ivf_centroids` produces one). When
    omitted: `train_iters` > 0 runs that k-means here; otherwise the
    n_centroids corpus rows with the lowest xxhash64(id, seed) become
    centroids — a layout-INDEPENDENT pseudo-random sample (same seed +
    same ids = same centroids, regardless of partitioning or input
    file order, unlike rdd.takeSample whose draw depends on the RDD
    layout; plan is TakeOrderedAndProject, only n_centroids rows ever
    collected). Random-sample centroids are the standard cheap
    substitute for k-means; the serving plan — the part that matters
    at scale — is identical either way."""
    if centroids is None:
        if train_iters > 0:
            centroids = train_ivf_centroids(
                corpus, vec_col, id_col, n_centroids=n_centroids, n_iters=train_iters, seed=seed
            )
        else:
            sampled = (
                corpus.select(id_col, vec_col)
                .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
                .limit(n_centroids)
                .collect()
            )
            centroids = [(int(i), [float(x) for x in r[vec_col]]) for i, r in enumerate(sampled)]

    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        F.element_at(nearest_cells(F.col(vec_col), centroids, 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.explode(nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic
    counterpart of the n-gram overlap check (operators/text.py
    decontaminate): a training item whose embedding sits within
    `threshold` cosine of ANY benchmark item is a paraphrase-level
    leak that n-gram matching misses, and drops. Benchmark embeddings
    broadcast (eval sets are small by definition); the corpus is
    scanned once with a pure filter via an EXISTS-shaped aggregate
    over the broadcast set — no shuffle of the corpus at all. At very
    large benchmarks swap the broadcast for the LSH-bucketed
    embedding_near_pairs shape. Returns the clean corpus rows."""
    from rabbit_data_pipeline_spark.functions.vector import cosine

    b = benchmark.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    hits = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(b), cosine(F.col(vec_col), F.col("b_vec")) >= F.lit(threshold))
        .select(id_col)
        .distinct()
    )
    return corpus.join(hits, on=id_col, how="left_anti")


def embedding_outliers(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    low_q: float = 0.01,
    high_q: float = 0.99,
) -> DataFrame:
    """Norm-based embedding quality control: vectors whose L2 norm
    falls outside the corpus's [low_q, high_q] norm quantiles are
    flagged (collapsed/degenerate or exploding embeddings — the
    standard sanity filter before indexing). Two passes: a tiny
    percentile aggregate (map-side combining, 2 scalars to the
    driver-side literal), then a shuffle-free flagging scan. The cut
    points use Spark's INTERPOLATING percentile (the same type-7
    formula as DuckDB's quantile_cont); flags are only engine-stable
    when no norm sits within float noise of a cut point — true for
    real outlier detection, where the outlier/bulk gap is the whole
    point. Adds (l2_norm, is_outlier)."""
    from rabbit_data_pipeline_spark.functions.vector import norm as l2norm

    scored = corpus.withColumn("l2_norm", l2norm(F.col(vec_col)))
    lo, hi = scored.agg(
        F.percentile("l2_norm", F.lit(low_q)).alias("lo"),
        F.percentile("l2_norm", F.lit(high_q)).alias("hi"),
    ).first()
    return scored.withColumn(
        "is_outlier", (F.col("l2_norm") < F.lit(lo)) | (F.col("l2_norm") > F.lit(hi))
    )


# ----------------------------------------------- index persistence


def save_ivf_index(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    codebook: list[list[list[float]]] | None = None,
) -> None:
    """Persist an ANN index's model state (IVF centroids and, for
    IVF-PQ, the per-subspace codebook) as plain parquet — the index
    IS data: versioned, diffable, readable by any engine, no pickle.
    Layout: centroids(cid, vec), codebook(j, code, vec). The encoded
    corpus itself (cell + codes columns) lives wherever the corpus
    table lives — this saves only the small trained state."""
    spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cid int, vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    if codebook is not None:
        rows = [
            (j, c, [float(x) for x in cv])
            for j, sub in enumerate(codebook)
            for c, cv in enumerate(sub)
        ]
        spark.createDataFrame(rows, "j int, code int, vec array<double>").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/codebook")


def load_ivf_index(
    spark, path: str
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]] | None]:
    """Load index state saved by save_ivf_index. Returns (centroids,
    codebook-or-None) in the literal-foldable shapes ann_ivf /
    ann_ivfpq / pq_encode consume."""
    import os as _os

    crows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = sorted((r["cid"], [float(x) for x in r["vec"]]) for r in crows)
    codebook = None
    if _os.path.isdir(f"{path}/codebook"):
        rows = spark.read.parquet(f"{path}/codebook").collect()
        m = max(r["j"] for r in rows) + 1
        ks = max(r["code"] for r in rows) + 1
        codebook = [[None] * ks for _ in range(m)]
        for r in rows:
            codebook[r["j"]][r["code"]] = [float(x) for x in r["vec"]]
    return centroids, codebook
