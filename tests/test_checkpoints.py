"""Deterministic release of superseded localCheckpoints (round 10).

The iterative graph/BPE loops cut lineage with per-round
localCheckpoints; without an explicit unpersist the superseded
rounds' blocks sit in executor storage until the ContextCleaner
happens to run — up to max_iter node-vectors of waste (an OOM vector
at 100 TB, GC noise locally). These tests pin (a) the helper's
contract — releases exactly a checkpoint's blocks, refuses derived
plans, never breaks live data — and (b) the loops' storage bound:
finishing a multi-round iteration leaves only the blocks the result
still needs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbit_data_pipeline_spark.functions.checkpoints import release_local_checkpoint


def _persistent_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it, ids = m.iterator(), set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def test_release_frees_checkpoint_blocks(spark):
    before = _persistent_ids(spark)
    ckpt = spark.range(100).selectExpr("id", "id * 2 AS y").localCheckpoint(eager=True)
    created = _persistent_ids(spark) - before
    assert len(created) == 1  # the checkpoint persisted exactly one RDD
    assert release_local_checkpoint(ckpt) is True
    assert not (created & _persistent_ids(spark))  # blocks gone immediately


def test_release_refuses_derived_plans(spark):
    ckpt = spark.range(50).localCheckpoint(eager=True)
    derived = ckpt.filter(F.col("id") > 10)  # root is Filter, not LogicalRDD
    assert release_local_checkpoint(derived) is False
    assert derived.count() == 39  # the underlying checkpoint is untouched
    release_local_checkpoint(ckpt)


def test_release_refuses_unpersisted_logical_rdd(spark):
    """createDataFrame frames are LogicalRDD-rooted too but persist
    nothing — the helper must not claim it released blocks there."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    assert release_local_checkpoint(df) is False
    assert df.count() == 2


def test_connected_components_storage_stays_bounded(spark):
    """A 9-node chain forces ~4 pointer-jump rounds; without the
    per-round release the loop would leave edges + every round's
    labels persisted (6+ RDDs). With it (round 12: the edge list is
    released on the success path too): final labels only."""
    from rabbit_data_pipeline_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    before = _persistent_ids(spark)
    comp = connected_components(pairs)
    rows = {r["id"]: r["component"] for r in comp.collect()}
    assert set(rows.values()) == {0} and len(rows) == 10  # one chain, min label
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded rounds left persisted: {sorted(leaked)}"


def test_kcore_storage_stays_bounded(spark):
    """A triangle with a pendant chain peels over ≥2 rounds; the loop
    must leave only the final deg checkpoint persisted (round 12:
    edges and the survivor set release on the fixpoint path)."""
    from rabbit_data_pipeline_spark.operators.graph import kcore

    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    before = _persistent_ids(spark)
    result = {r["node"] for r in kcore(edges, k=2).collect()}
    assert result == {0, 1, 2}  # the triangle survives, the chain peels
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded rounds left persisted: {sorted(leaked)}"


def test_bfs_eager_rounds_release_and_agree(spark):
    """BFS rounds are eager + released on EVERY exit path (round 11:
    the last folded frontier too); distances are unchanged and a
    6-hop path leaves only the final dist checkpoint (round 12:
    the edge list releases on every exit path)."""
    from rabbit_data_pipeline_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(6)], ["src", "dst"]
    )
    before = _persistent_ids(spark)
    dist = {r["node"]: r["dist"] for r in bfs_distances(edges, ["0"]).collect()}
    assert dist == {str(i): i for i in range(7)}
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded rounds left persisted: {sorted(leaked)}"


def test_weighted_sssp_releases_and_agrees(spark):
    from rabbit_data_pipeline_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 1), ("a", "c", 9), ("c", "d", 2)],
        ["src", "dst", "w"],
    )
    before = _persistent_ids(spark)
    dist = {r["node"]: r["dist"] for r in weighted_sssp(edges, ["a"]).collect()}
    assert dist == {"a": 0, "b": 5, "c": 6, "d": 8}
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded rounds left persisted: {sorted(leaked)}"


def test_iterative_storage_is_round_independent(spark):
    """The 100 TB claim behind the release discipline, pinned: the
    persisted set a frontier loop leaves behind is its INVARIANT set
    (the final dist checkpoint), independent of how many rounds ran. A chain
    graph forces one round per node — 3× the rounds must leak exactly
    as much as 1×. (Without the per-round + exit-path releases, the
    leak grows linearly in rounds: one superseded node-vector each.)"""
    from rabbit_data_pipeline_spark.operators.graph import bfs_distances

    leaks = {}
    for n in (8, 24):
        edges = spark.createDataFrame(
            [(str(i), str(i + 1)) for i in range(n)], ["src", "dst"]
        )
        before = _persistent_ids(spark)
        dist = {r["node"]: r["dist"] for r in bfs_distances(edges, ["0"], max_hops=n + 2).collect()}
        assert dist == {str(i): i for i in range(n + 1)}
        leaks[n] = len(_persistent_ids(spark) - before)
    assert leaks[24] <= leaks[8] <= 1, f"leak grew with round count: {leaks}"


def test_pagerank_eager_releases_and_agrees(spark):
    """Round 12: pagerank was the one iterative loop still relying on
    the ContextCleaner — each call parked the edge-list checkpoint plus
    `iters` superseded score vectors in executor storage until GC
    happened to run (measured on the 10x bench copy: 1.3 GB/call,
    accumulating to 3.8 GB over three calls, localCheckpoint blocks
    spilling to disk, sf1 probe mins swinging 18 s -> 70-98 s). With
    eager=True (now the default) rounds release deterministically and
    a finished call leaves exactly ONE node-sized vector (the returned
    score); values are bit-identical to the lazy chain."""
    from rabbit_data_pipeline_spark.operators.graph import pagerank

    und = [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    ).distinct()

    before = _persistent_ids(spark)
    eager_rows = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded rounds left persisted: {sorted(leaked)}"

    lazy_rows = {r["node"]: r["rank"] for r in pagerank(edges, iters=4, eager=False).collect()}
    assert eager_rows == lazy_rows  # integer arithmetic: bit-identical


def test_pagerank_storage_is_round_independent(spark):
    """The leak bound must not grow with iteration count: 3x the
    rounds leaves the same single returned-score vector."""
    from rabbit_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], ["src", "dst"]
    )
    leaks = {}
    for iters in (3, 9):
        before = _persistent_ids(spark)
        assert pagerank(edges, iters=iters).count() == 5
        leaks[iters] = len(_persistent_ids(spark) - before)
    assert leaks[9] <= leaks[3] <= 1, f"leak grew with round count: {leaks}"


def test_pagerank_zero_iters_keeps_inputs_readable(spark):
    """iters=0 returns the uniform vector as a derived plan over the
    `nodes` checkpoint — the eager release path must NOT free it
    (released localCheckpoint blocks are unrecoverable, not
    recomputable), and the result must still collect."""
    from rabbit_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    rows = pagerank(edges, iters=0).collect()
    assert {r["node"] for r in rows} == {0, 1}
    assert all(abs(r["rank"] - 0.5) < 1e-9 for r in rows)


# ---------------------------------- r13: release on the raise paths
# ADVICE r12 #3: a caller that catches the non-convergence error and
# keeps the session alive must not inherit the call's edge-list/
# vector checkpoints as orphaned blocks — the raise paths must honor
# the same deterministic-release discipline as the success paths.


def test_connected_components_raise_path_releases(spark):
    import pytest

    from rabbit_data_pipeline_spark.operators.graph import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"])
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"


def test_connected_components_star_raise_path_releases(spark):
    import pytest

    from rabbit_data_pipeline_spark.operators.graph import connected_components_star

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"])
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(pairs, max_iter=1)
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"


def test_kcore_raise_path_releases(spark):
    import pytest

    from rabbit_data_pipeline_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(1, 6)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["src", "dst"]
    )
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, k=2, max_rounds=1)
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"


def test_weighted_sssp_raise_path_releases(spark):
    import pytest

    from rabbit_data_pipeline_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)], ["src", "dst", "w"]
    )
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        weighted_sssp(edges, sources=["a"], max_rounds=1)
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"


def test_train_bpe_releases_histogram_on_every_strategy(spark):
    """r13: train_bpe returns a plain Python merge list, so every
    internal checkpoint (the word histogram; the batched trainer's
    per-round vocab) is dead at return — no strategy may leave
    persisted RDDs behind. The driver_topm path is the sharp edge: it
    REBINDS hist to a derived plan, so only a kept handle can release
    the underlying checkpoint."""
    from rabbit_data_pipeline_spark.operators.bpe import train_bpe

    df = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widely") for i in range(20)],
        ["doc_id", "text"],
    )
    expected = None
    for strategy in ("driver", "driver_topm", "distributed"):
        before = _persistent_ids(spark)
        merges = train_bpe(df, n_merges=6, strategy=strategy)
        leaked = _persistent_ids(spark) - before
        assert not leaked, f"{strategy} left persisted RDDs: {sorted(leaked)}"
        # the release must not change the trained merges
        pairs = [(l, r) for _, l, r in merges]
        if expected is None:
            expected = pairs
        else:
            assert pairs == expected, f"{strategy} merges diverged after release"


# ------------------------------- r14: BPE release on the raise paths
# ADVICE r13 #2: the r13 terminal releases freed the histogram on the
# SUCCESS paths only — a strategy dispatch that raises mid-training
# (collect failing, a bad Arrow batch) parked the corpus histogram
# until the ContextCleaner ran. train_bpe and _train_distributed now
# carry the same try/finally backstop graph.py got in r13.


def test_train_bpe_raise_in_dispatch_releases_histogram(spark, monkeypatch):
    """A _train_distributed that dies mid-call must not leave the
    front door's hist_ckpt persisted."""
    import pytest

    from rabbit_data_pipeline_spark.operators import bpe

    df = spark.createDataFrame(
        [(i, "low lower lowest newer newest") for i in range(10)],
        ["doc_id", "text"],
    )

    def boom(*a, **k):
        raise RuntimeError("executor lost mid-train")

    monkeypatch.setattr(bpe, "_train_distributed", boom)
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="executor lost"):
        bpe.train_bpe(df, n_merges=4, strategy="distributed")
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"


def test_train_distributed_raise_mid_round_releases_vocab(spark, monkeypatch):
    """A batch-selection raise inside the merge loop must release BOTH
    the loop's live vocab checkpoint (inner finally) and the front
    door's histogram handle (outer finally)."""
    import pytest

    from rabbit_data_pipeline_spark.operators import bpe

    df = spark.createDataFrame(
        [(i, "low lower lowest newer newest") for i in range(10)],
        ["doc_id", "text"],
    )

    def boom(*a, **k):
        raise RuntimeError("bad batch")

    monkeypatch.setattr(bpe, "_select_batch", boom)
    before = _persistent_ids(spark)
    with pytest.raises(RuntimeError, match="bad batch"):
        bpe.train_bpe(df, n_merges=4, strategy="distributed")
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"raise path left persisted RDDs: {sorted(leaked)}"
