"""Unit tests for the pipeline framework (SURVEY §2 C1-C6) and
operator knobs without SQL oracles."""

from __future__ import annotations

import os
import time

import pytest

from rabbit_data_pipeline_spark.pipeline import PipelineSpec, Scheduler
from rabbit_data_pipeline_spark.pipeline.locks import TaskLocked, task_lock
from rabbit_data_pipeline_spark.pipeline.triggers import Trigger, cron_matches, parse_trigger, run_on_trigger


def test_spec_validation_rejects_unknown_output():
    with pytest.raises(ValueError, match="unknown node"):
        PipelineSpec.from_dict("t", {"a": {"type": "source.table", "start": True, "output": "missing"}})


def test_spec_requires_start_node():
    with pytest.raises(ValueError, match="no start node"):
        PipelineSpec.from_dict("t", {"a": {"type": "source.table", "output": []}})


def test_spec_detects_cycle():
    with pytest.raises(ValueError, match="cycle"):
        PipelineSpec.from_dict(
            "t",
            {
                "a": {"type": "x", "start": True, "output": "b"},
                "b": {"type": "x", "output": "a"},
            },
        )


def test_reference_output_dict_form():
    # reference: output can be {'node': true|false|int} (wait semantics)
    spec = PipelineSpec.from_dict(
        "t",
        {
            "a": {"type": "x", "start": True, "output": {"b": True}},
            "b": {"type": "x"},
        },
    )
    assert spec.nodes["a"].output == ["b"]
    assert spec.upstream_of("b") == ["a"]


def test_scheduler_on_error_skip(spark, sf_smoke):
    cfg = {
        "t": {
            "bad": {"type": "source.parquet", "start": True, "path": "/nonexistent", "on_error": "skip", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    assert sch.run("t") == {"out": None}


def test_scheduler_on_error_fail(spark):
    cfg = {
        "t": {
            "bad": {"type": "source.parquet", "start": True, "path": "/nonexistent", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    with pytest.raises(Exception):
        sch.run("t")


def test_scheduler_run_single_target(spark, sf_smoke):
    cfg = {
        "t": {
            "src": {"type": "source.table", "start": True, "name": "region", "sf_dir": sf_smoke, "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    df = sch.run("t", target="src")["src"]
    assert df.count() == 5  # region has 5 rows at every SF


def test_task_lock_single_flight(tmp_path):
    with task_lock("job", timeout=60, lock_dir=str(tmp_path)):
        with pytest.raises(TaskLocked):
            with task_lock("job", timeout=60, lock_dir=str(tmp_path)):
                pass
    # released → can re-acquire
    with task_lock("job", timeout=60, lock_dir=str(tmp_path)):
        pass


def test_task_lock_expiry_steal(tmp_path):
    path = tmp_path / "job.lock"
    path.write_text(str(time.time() - 999))
    os.utime(path, (time.time() - 999, time.time() - 999))
    with task_lock("job", timeout=1, lock_dir=str(tmp_path)):
        pass  # stale lock stolen


class _FakeRedis:
    """redis-py's set(nx=, ex=)/delete surface, in-memory with TTL —
    enough to exercise the reference rlock protocol (SET NX EX / DEL)
    without a server."""

    def __init__(self):
        self.store = {}

    def set(self, name, value, nx=False, ex=None):
        now = time.time()
        cur = self.store.get(name)
        if nx and cur is not None and cur[1] > now:
            return None
        self.store[name] = (value, now + (ex or 1e18))
        return True

    def delete(self, name):
        self.store.pop(name, None)


def test_task_lock_redis_backend():
    from rabbit_data_pipeline_spark.pipeline.locks import RedisLockBackend

    be = RedisLockBackend(_FakeRedis())
    with task_lock("job", timeout=60, backend=be):
        with pytest.raises(TaskLocked):
            with task_lock("job", timeout=60, backend=be):
                pass
    with task_lock("job", timeout=60, backend=be):  # released → re-acquire
        pass


def test_task_lock_redis_backend_ttl_expiry():
    from rabbit_data_pipeline_spark.pipeline.locks import RedisLockBackend

    fake = _FakeRedis()
    be = RedisLockBackend(fake)
    assert be.acquire("job", ttl=60)
    key = "rdps-lock:job"
    fake.store[key] = (fake.store[key][0], time.time() - 1)  # holder died, TTL passed
    with task_lock("job", timeout=60, backend=be):  # NX succeeds on expired key
        pass


def test_task_lock_default_backend_install():
    from rabbit_data_pipeline_spark.pipeline.locks import RedisLockBackend, set_lock_backend

    be = RedisLockBackend(_FakeRedis())
    set_lock_backend(be)
    try:
        with task_lock("job2", timeout=60):
            with pytest.raises(TaskLocked):
                with task_lock("job2", timeout=60):
                    pass
    finally:
        set_lock_backend(None)


def test_trigger_parsing():
    assert parse_trigger(None).kind == "once"
    assert parse_trigger(-1).kind == "once"  # reference: -1 = run once
    assert parse_trigger(30) == Trigger("interval", interval_sec=30)
    assert parse_trigger("30").interval_sec == 30
    assert parse_trigger("*/5 * * * *").kind == "cron"


def test_trigger_streaming_options():
    assert parse_trigger(10).streaming_options() == {"processingTime": "10 seconds"}
    assert parse_trigger(-1).streaming_options() == {"availableNow": True}


def test_cron_match():
    from datetime import datetime

    assert cron_matches("*/5 * * * *", datetime(2026, 1, 1, 10, 25))
    assert not cron_matches("*/5 * * * *", datetime(2026, 1, 1, 10, 26))
    assert cron_matches("0 9 * * 1-5", datetime(2026, 8, 13, 9, 0))  # a Thursday


def test_run_on_trigger_interval():
    calls = []
    n = run_on_trigger(Trigger("interval", interval_sec=1), lambda: calls.append(1), max_runs=3, sleep=lambda s: None)
    assert n == 3 and len(calls) == 3


def test_line_parser_range_path(spark, tmp_path):
    """dataLine/endLine knobs — the zipWithIndex branch."""
    p = tmp_path / "data.txt"
    p.write_text("junk preamble\ncol_a\tcol_b\n1\tx\n2\ty\n3\tz\n")
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    df = parse_lines(spark, str(p), file_type="txt", head_line=2, data_line=3, end_line=6)
    assert df.columns == ["col_a", "col_b"]
    assert [tuple(r) for r in df.orderBy("col_a").collect()] == [("1", "x"), ("2", "y"), ("3", "z")]


def test_line_parser_rejects_bad_type(spark):
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    with pytest.raises(ValueError, match="fileType only support"):
        parse_lines(spark, "/x", file_type="pdf")


def test_http_fetch_column_fake(spark):
    from rabbit_data_pipeline_spark.sources.http import fake_transport, http_fetch_column

    df = spark.createDataFrame([("u1", "http://a"), ("u2", "http://b")], "id string, url string")
    out = http_fetch_column(df, transport=fake_transport({"http://a": '{"ok": 1}'}))
    rows = {r["url"]: r["body"] for r in out.collect()}
    assert rows["http://a"] == '{"ok": 1}'
    assert "http://b" in rows["http://b"]  # deterministic fake echoes url


def test_xml_document_aggregation(spark):
    from rabbit_data_pipeline_spark.operators.xml import xml_document, xml_format

    df = spark.createDataFrame([(1, "a&b")], "id int, name string")
    doc = xml_document(xml_format(df, item_tag="row"), root_tag="rows")
    assert doc == '<?xml version="1.0" encoding="utf-8"?><rows><row><id>1</id><name>a&amp;b</name></row></rows>'


def test_bump_flag(spark):
    from rabbit_data_pipeline_spark.operators.sync import bump_flag

    df = spark.createDataFrame([(1, 0), (2, 1), (3, 2), (4, 0)], "pk int, flag int")
    batch = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    out = {r["pk"]: r["flag"] for r in bump_flag(df, batch, ["pk"]).collect()}
    # flags 0/1 bumped, flag 2 untouched, unmatched rows untouched
    assert out == {1: 1, 2: 2, 3: 2, 4: 0}


def test_upsert_sink_plugin(spark, tmp_path):
    from rabbit_data_pipeline_spark.pipeline.scheduler import plugins

    sink = plugins()["sink.upsert"]

    class FakeSch:
        pass

    fake = FakeSch()
    fake.spark = spark
    path = str(tmp_path / "state")
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    out1 = sink(fake, {"path": path, "keys": ["k"], "staging": path}, [first])
    assert out1.count() == 2
    second = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    out2 = sink(fake, {"path": path, "keys": ["k"], "staging": path + "2"}, [second])
    assert {(r["k"], r["v"]) for r in out2.collect()} == {(1, "a"), (2, "B"), (3, "c")}


def test_scd2_merge_idempotent_and_versions(spark):
    """Re-applying the same delta must be a no-op, changed keys get a
    closed old version + one open new version, new keys one open row."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.operators.sync import scd2_merge

    dim = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, val double",
    ).select(
        "k", "name", "val",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    upd = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
        "k int, name string, val double",
    ).withColumn("eff", F.lit("2021-06-01").cast("timestamp"))

    merged = scd2_merge(dim, upd, keys=["k"], compare_cols=["name", "val"], effective_col="eff")
    rows = {(r.k, r.is_current): r for r in merged.collect()}
    assert len(rows) == 5  # 1,3 untouched; 2 closed + 2 open; 4 open
    assert rows[(2, False)].valid_to is not None and rows[(2, False)].val == 20.0
    assert rows[(2, True)].val == 99.0 and rows[(2, True)].valid_to is None
    assert rows[(4, True)].val == 40.0
    assert rows[(1, True)].valid_from.year == 2020  # no-op update kept original

    again = scd2_merge(merged, upd, keys=["k"], compare_cols=["name", "val"], effective_col="eff")
    assert again.count() == merged.count()
    assert again.filter(F.col("is_current")).count() == 4


def test_yaml_asof_join_plugin(spark, tmp_path):
    """YAML-declared as-of enrichment: quotes stream + trades stream →
    each trade tagged with the prevailing quote."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.pipeline import PipelineSpec, Scheduler

    quotes = str(tmp_path / "quotes")
    trades = str(tmp_path / "trades")
    spark.createDataFrame(
        [("A", "2024-01-01 09:00:00", 10.0), ("A", "2024-01-01 10:00:00", 11.0)],
        "sym string, qts string, px double",
    ).withColumn("qts", F.to_timestamp("qts")).write.parquet(quotes)
    spark.createDataFrame(
        [("A", "2024-01-01 09:30:00", 5), ("A", "2024-01-01 10:30:00", 7)],
        "sym string, tts string, qty int",
    ).withColumn("tts", F.to_timestamp("tts")).write.parquet(trades)

    spec = PipelineSpec.from_dict(
        "asof_task",
        {
            "quotes": {"type": "source.parquet", "start": True, "path": quotes, "output": ["enriched"]},
            "trades": {"type": "source.parquet", "start": True, "path": trades, "output": ["enriched"]},
            "enriched": {
                "type": "transform.asof_join",
                "keys": ["sym"],
                "left_ts": "qts",
                "right_ts": "tts",
            },
        },
    )
    sch = Scheduler(spark, {"asof_task": spec})
    df = sch.build("asof_task", "enriched")
    out = {(r.tts.hour, r.px) for r in df.collect()}
    assert out == {(9, 10.0), (10, 11.0)}


def test_yaml_decontaminate_and_mix_plugins(spark, tmp_path):
    """YAML-declared training-data hygiene: corpus -> decontaminate
    (vs benchmark) -> stratified mix, the L19/L20 ops as pipeline
    nodes."""
    from rabbit_data_pipeline_spark.pipeline import PipelineSpec, Scheduler

    corpus_p, bench_p = str(tmp_path / "corpus"), str(tmp_path / "bench")
    rows = [(i, f"unique words number {i} padding text here okay fine", f"s{i % 2}") for i in range(100)]
    rows[7] = (7, "alpha beta gamma delta epsilon zeta eta theta iota", "s1")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(corpus_p)
    spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id long, text string"
    ).write.parquet(bench_p)

    spec = PipelineSpec.from_dict(
        "hygiene",
        {
            "corpus": {"type": "source.parquet", "start": True, "path": corpus_p, "output": ["clean"]},
            "bench": {"type": "source.parquet", "start": True, "path": bench_p, "output": ["clean"]},
            "clean": {"type": "transform.decontaminate", "k": 8, "output": ["mixed"]},
            "mixed": {"type": "transform.mix", "group_col": "source", "fractions": {"s0": 1.0, "s1": 0.5}},
        },
    )
    out = Scheduler(spark, {"hygiene": spec}).run("hygiene")["mixed"]
    got = {r.doc_id for r in out.collect()}
    assert 7 not in got  # contaminated doc dropped
    # s0 ids are even (kept fully); s1 ids odd, kept iff id % 1000 < 500
    expect = {i for i in range(100) if (i % 2 == 0 or i < 500 and i % 1000 < 500) and i != 7}
    assert got == expect


def test_corpus_prep_plugins_compose(spark):
    """The new corpus-management plugins (normalize → c4_clean →
    split_assign) compose through the Scheduler as one task."""
    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    rows = [
        (0, "Café line with five solid words here.\nshort.\nAnother clean líne of six words total."),
        (1, "one good line with enough words here.\nsecond good line with many words too.\nthird good line with plenty words also."),
        (2, "only two good lines in here now.\nnope"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.createOrReplaceTempView("raw_docs")
    spec = PipelineSpec.from_dict(
        "prep",
        {
            "src": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM raw_docs", "output": ["norm"]},
            "norm": {"type": "transform.normalize", "output": ["clean"]},
            "clean": {"type": "transform.c4_clean", "min_lines": 2, "output": ["split"]},
            "split": {"type": "transform.split_assign"},
        },
    )
    out = Scheduler(spark, {"prep": spec}).run("prep")["split"]
    got = {r["doc_id"]: (r["n_lines_kept"], r["split"]) for r in out.collect()}
    # doc 2 drops (only 1 surviving line < min_lines 2); 0 and 1 survive
    assert set(got) == {0, 1}
    assert got[0][0] == 2 and got[1][0] == 3
    assert all(s in ("train", "val", "test") for _, s in got.values())
    # normalization folded the accents before cleaning
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "café" not in texts[0] and "cafe" in texts[0]


def test_cache_ttl_serves_and_expires(spark):
    """Pdo `duration` parity: a node with cache_ttl materializes once
    and serves the cached parquet while fresh; after expiry the next
    run recomputes (observable through a changing upstream view)."""
    import os
    import shutil
    import tempfile
    import time

    import getpass

    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), f"rdps_node_cache_{getpass.getuser()}", "t"),
        ignore_errors=True,
    )

    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    spark.createDataFrame([(1,)], ["v"]).createOrReplaceTempView("ttl_src")
    spec = {
        "q": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM ttl_src", "cache_ttl": 2.0}
    }

    def run():
        sch = Scheduler(spark, {"t": PipelineSpec.from_dict("t", spec)})
        return sch.run("t")["q"].collect()[0]["v"]

    assert run() == 1
    spark.createDataFrame([(2,)], ["v"]).createOrReplaceTempView("ttl_src")
    assert run() == 1, "within ttl the cached result must serve"

    # editing the NODE CONFIG invalidates immediately (fingerprint key)
    spec2 = {
        "q": {"type": "transform.sql", "start": True, "sql": "SELECT v + 10 AS v FROM ttl_src", "cache_ttl": 2.0}
    }
    from rabbit_data_pipeline_spark.pipeline import Scheduler as _S
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec as _P

    got = _S(spark, {"t": _P.from_dict("t", spec2)}).run("t")["q"].collect()[0]["v"]
    assert got == 12, "a changed node config must not serve the old cache"

    time.sleep(2.2)
    assert run() == 2, "after ttl expiry the node must recompute"


def test_file_sink_filename_templating(spark, tmp_path):
    """Sinks/File.php fileName parity: `DateTime`/`Timestamp` template
    values produce run-stamped output names under path."""
    import os

    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    spark.createDataFrame([(1, "a")], ["k", "v"]).createOrReplaceTempView("fs_src")
    out = str(tmp_path / "out")
    spec = PipelineSpec.from_dict(
        "t",
        {
            "q": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM fs_src", "output": ["w"]},
            "w": {"type": "sink.file", "path": out, "fileName": "Timestamp", "ext": "csv"},
        },
    )
    Scheduler(spark, {"t": spec}).run("t")
    dirs = os.listdir(out)
    assert len(dirs) == 1 and dirs[0].endswith(".csv") and dirs[0][:-4].isdigit()


def test_file_sink_filename_expr(spark, tmp_path):
    """The declarative replacement for Sinks/File.php's CALLABLE
    fileName form: `fileNameExpr` is a Spark SQL scalar expression
    evaluated once driver-side — the same trust surface the spec's
    sql: nodes already grant, with no config-embedded host code. A
    malformed or path-escaping expression fails loudly."""
    import os

    import pytest as _pytest

    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec
    from rabbit_data_pipeline_spark.sinks.files import _eval_file_name_expr

    spark.createDataFrame([(1, "a")], ["k", "v"]).createOrReplaceTempView("fse_src")
    out = str(tmp_path / "out")
    spec = PipelineSpec.from_dict(
        "t",
        {
            "q": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM fse_src", "output": ["w"]},
            "w": {
                "type": "sink.file",
                "path": out,
                "fileNameExpr": "concat('batch_', date_format(current_timestamp(), 'yyyyMMdd'))",
                "ext": "csv",
            },
        },
    )
    Scheduler(spark, {"t": spec}).run("t")
    dirs = os.listdir(out)
    assert len(dirs) == 1 and dirs[0].startswith("batch_") and dirs[0].endswith(".csv")
    assert dirs[0][len("batch_"):-4].isdigit()

    # error contract: unparseable expression and path-separator output
    with _pytest.raises(ValueError, match="failed to evaluate"):
        _eval_file_name_expr(spark, "not_a_function(")
    with _pytest.raises(ValueError, match="path separators"):
        _eval_file_name_expr(spark, "'a/b'")
    with _pytest.raises(ValueError, match="non-empty"):
        _eval_file_name_expr(spark, "CAST(NULL AS STRING)")
    # ADVICE r10 #3: backslashes, newlines, tabs and other control
    # characters are rejected too (Windows-separator / log-garbling
    # names), while unicode and spaces stay legal.
    for bad in (r"'a\\b'", "'a\nb'", "'a\tb'", "concat('x', char(7))"):
        with _pytest.raises(ValueError, match="control characters|path separators"):
            _eval_file_name_expr(spark, bad)
    # ADVICE r11 #2: C1 controls (U+0080-U+009F, incl. NEL U+0085) and
    # the Unicode line/paragraph separators U+2028/U+2029 garble
    # logs/manifests exactly like their ASCII cousins — rejected too.
    for bad in ("'a\u0085b'", "'a\u009cb'", "'a\u2028b'", "'a\u2029b'"):
        with _pytest.raises(ValueError, match="control characters|path separators"):
            _eval_file_name_expr(spark, bad)
    assert _eval_file_name_expr(spark, "'datt 2024 ü'") == "datt 2024 ü"


def test_corpus_diff_plugin_two_inputs(spark):
    """transform.corpus_diff consumes two upstream nodes (old, new) in
    declaration order."""
    from rabbit_data_pipeline_spark.pipeline import Scheduler
    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"]).createOrReplaceTempView("cd_old")
    spark.createDataFrame([(1, "a"), (3, "c")], ["doc_id", "text"]).createOrReplaceTempView("cd_new")
    spec = PipelineSpec.from_dict(
        "d",
        {
            "old": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM cd_old", "output": ["diff"]},
            "new": {"type": "transform.sql", "start": True, "sql": "SELECT * FROM cd_new", "output": ["diff"]},
            "diff": {"type": "transform.corpus_diff"},
        },
    )
    out = Scheduler(spark, {"d": spec}).run("d")["diff"]
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {1: "unchanged", 2: "removed", 3: "added"}


def test_rollup_merge_order_independent(spark):
    """Partial-rollup merging is exact integer addition: merging four
    batches in two different orders (and any grouping) must equal the
    one-shot aggregation bit-for-bit — the invariant the
    rollup_incremental oracle gate relies on."""
    from rabbit_data_pipeline_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        rollup_partials,
    )

    rows = [(i % 5, float(i) + 0.17) for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "v"])
    from pyspark.sql import functions as F

    batches = [
        rollup_partials(df.filter(F.floor("v").cast("long") % 4 == i), ["k"], "v")
        for i in range(4)
    ]
    full = rollup_partials(df, ["k"], "v")

    def rowset(p):
        return {tuple(r) for r in finalize_rollup(p, ["k"]).collect()}

    fwd = merge_rollups(merge_rollups(merge_rollups(batches[0], batches[1], ["k"]), batches[2], ["k"]), batches[3], ["k"])
    rev = merge_rollups(batches[3], merge_rollups(batches[2], merge_rollups(batches[1], batches[0], ["k"]), ["k"]), ["k"])
    assert rowset(fwd) == rowset(rev) == rowset(full)


def test_nb_plugins_wire_through_scheduler(spark, sf_smoke):
    """transform.nb_train / transform.nb_classify as pipeline nodes:
    the classifier trains on the documents table and self-classifies
    through the DAG (multi-input node wiring pinned by explicit
    `inputs`)."""
    cfg = {
        "t": {
            "docs": {"type": "source.table", "start": True, "name": "documents",
                     "sf_dir": sf_smoke, "output": ["model", "priors", "cls"]},
            "model": {"type": "transform.nb_train", "output": "cls"},
            "priors": {"type": "transform.sql", "output": "cls",
                       "sql": "SELECT lang AS label, COUNT(*) AS n_docs FROM input GROUP BY lang"},
            "cls": {"type": "transform.nb_classify", "inputs": ["docs", "model", "priors"],
                    "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    out = sch.run("t")["out"]
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"doc_id", "predicted", "score"}


_PARTIALS_SQL = (
    "SELECT o_custkey, COUNT(o_totalprice) AS n, "
    "SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS sum_micro "
    "FROM input GROUP BY o_custkey"
)


def test_rollup_merge_plugin_matches_full_agg(spark, sf_smoke):
    """transform.rollup_merge as a pipeline node: stored partials +
    new batch must equal the one-shot rollup of the whole table."""
    import pyspark.sql.functions as F

    from rabbit_data_pipeline_spark.operators.rollup import finalize_rollup, rollup_partials
    from rabbit_data_pipeline_spark.session import load_tables

    cfg = {
        "t": {
            "src": {"type": "source.table", "start": True, "name": "orders",
                    "sf_dir": sf_smoke, "output": ["base_f", "batch_f"]},
            "base_f": {"type": "transform.filter", "condition": "o_orderkey % 2 = 0",
                       "output": "partials"},
            "partials": {"type": "transform.sql", "sql": _PARTIALS_SQL, "output": "merge"},
            "batch_f": {"type": "transform.filter", "condition": "o_orderkey % 2 = 1",
                        "output": "merge"},
            "merge": {"type": "transform.rollup_merge", "inputs": ["partials", "batch_f"],
                      "keys": ["o_custkey"], "value_col": "o_totalprice", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    got = {tuple(r) for r in sch.run("t")["out"].collect()}
    o = load_tables(spark, sf_smoke, ("orders",))["orders"]
    want = {
        tuple(r)
        for r in finalize_rollup(
            rollup_partials(o, ["o_custkey"], "o_totalprice"), ["o_custkey"]
        ).collect()
    }
    assert got == want


def test_quarantine_splits_rows_exactly(spark):
    """valid ∪ invalid must equal the input with no overlap; a row
    violating ANY scalar rule lands in quarantine."""
    from rabbit_data_pipeline_spark.operators.expect import quarantine

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0), (4, 10.0)], ["id", "v"]
    )
    valid, invalid = quarantine(df, [("not_null", "v"), ("range", "v", 0.0, 20.0)])
    assert {r["id"] for r in valid.collect()} == {1, 4}
    assert {r["id"] for r in invalid.collect()} == {2, 3}


def test_foreign_key_rule_same_named_columns(spark):
    """The most common FK shape shares the column name on both sides
    (user_id -> users.user_id); the rule must not raise
    AMBIGUOUS_REFERENCE and must count orphans correctly, including
    composite keys."""
    from rabbit_data_pipeline_spark.operators.expect import expectation_report

    fact = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (9, "z")], ["user_id", "region"]
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["user_id", "region"]
    )
    rows = expectation_report(
        fact,
        [
            ("foreign_key", ["user_id"], dim, ["user_id"]),
            ("foreign_key", ["user_id", "region"], dim, ["user_id", "region"]),
        ],
    ).collect()
    got = {r["rule"]: r["n_violations"] for r in rows}
    assert got == {
        "foreign_key:user_id": 1,
        "foreign_key:user_id,region": 1,
    }


def test_unique_rule_counts_null_keys(spark):
    """count_distinct(a, b) drops NULL-key rows (undercounting
    violations); the rule must use tuple semantics — two rows with the
    same NULL-containing key are one key, so one of them is a
    violation."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from rabbit_data_pipeline_spark.operators.expect import expectation_report

    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", IntegerType())]
    )
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (None, 2), (None, 2), (None, 3)], schema
    )
    rows = expectation_report(df, [("unique", ["a", "b"])]).collect()
    # 5 rows over 3 distinct keys {(1,1), (NULL,2), (NULL,3)} → 2 violations.
    assert rows[0]["n_violations"] == 2


def test_variables_substitute_and_backfill(spark, sf_smoke):
    """${name} placeholders resolve from scheduler defaults, per-run
    overrides win, and backfill runs the task once per binding with
    correctly isolated plans."""
    cfg = {
        "t": {
            "src": {"type": "source.table", "start": True, "name": "orders",
                    "sf_dir": sf_smoke, "output": "f"},
            "f": {"type": "transform.filter",
                  "condition": "o_orderdate >= TIMESTAMP '${cut}'", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(
        spark,
        {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()},
        variables={"cut": "1996-01-01"},
    )
    n_default = sch.run("t")["out"].count()
    n_late = sch.run("t", variables={"cut": "2000-01-01"})["out"].count()
    assert n_late < n_default  # override applied, memo not reused across bindings

    runs = sch.backfill("t", [{"cut": "1996-01-01"}, {"cut": "2000-01-01"}])
    assert runs[0]["out"].count() == n_default
    assert runs[1]["out"].count() == n_late

    # A per-run override must not leak into later builds: after the
    # override runs above, build() resolves ${cut} against the
    # scheduler DEFAULTS again (1996-01-01 → the larger row count).
    assert sch.build("t", "f").count() == n_default
    # Backfill evicts each binding's memo entries — the memo must not
    # retain one plan per (node × binding) forever.
    assert not any(k[2] and dict(k[2]).get("cut") == "2000-01-01" for k in sch._built)


def test_quarantine_plugin_routes_both_sides(spark, sf_smoke):
    """errHandler at row granularity: one source fans into a valid
    branch and a DLQ branch; the two sides partition the input."""
    cfg = {
        "t": {
            "src": {"type": "source.table", "start": True, "name": "lineitem",
                    "sf_dir": sf_smoke, "output": ["ok", "dlq"]},
            "ok": {"type": "transform.quarantine", "emit": "valid",
                   "rules": [["range", "l_discount", 0.0, 0.08]], "output": "out_ok"},
            "dlq": {"type": "transform.quarantine", "emit": "invalid",
                    "rules": [["range", "l_discount", 0.0, 0.08]], "output": "out_dlq"},
            "out_ok": {"type": "sink.memory"},
            "out_dlq": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    out = sch.run("t")
    from rabbit_data_pipeline_spark.session import load_tables

    total = load_tables(spark, sf_smoke, ("lineitem",))["lineitem"].count()
    n_ok, n_dlq = out["out_ok"].count(), out["out_dlq"].count()
    assert n_ok + n_dlq == total and n_dlq > 0


def test_can_empty_false_skips_downstream(spark, sf_smoke):
    """Reference canEmpty parity: a node declared can_empty: false
    whose output is empty must skip its downstream sink (the
    reference's 'data is empty so not sink next')."""
    cfg = {
        "t": {
            "src": {"type": "source.table", "start": True, "name": "region",
                    "sf_dir": sf_smoke, "output": "f"},
            "f": {"type": "transform.filter", "condition": "r_regionkey > 999",
                  "can_empty": False, "on_error": "skip", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    assert sch.run("t") == {"out": None}
    # and with data present the same task flows normally
    cfg["t"]["f"]["condition"] = "r_regionkey >= 0"
    sch2 = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    assert sch2.run("t")["out"].count() > 0


def test_alarm_appends_failure_record(spark, tmp_path):
    """Reference alarm parity: a failing node with `alarm` configured
    appends a JSON-line record before the error policy applies."""
    import json

    alarm = str(tmp_path / "alarms.jsonl")
    cfg = {
        "t": {
            "bad": {"type": "source.parquet", "start": True, "path": "/nonexistent",
                    "alarm": alarm, "on_error": "skip", "output": "out"},
            "out": {"type": "sink.memory"},
        }
    }
    sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
    assert sch.run("t") == {"out": None}
    rec = json.loads(open(alarm).read().strip())
    assert rec["task"] == "t" and rec["node"] == "bad" and "error" in rec


def test_console_sink_encodings(spark, sf_smoke, capsys):
    """doc/Console.md encoding parity: json emits one object per line,
    xml one <row> element per line, html a table."""
    cfg_base = {
        "src": {"type": "source.table", "start": True, "name": "region",
                "sf_dir": sf_smoke, "output": "out"},
    }
    for enc, probe in (("json", '{"r_regionkey"'), ("xml", "<row><r_regionkey>"), ("html", "<table><tr><th>r_regionkey")):
        cfg = {"t": {**cfg_base, "out": {"type": "sink.console", "encoding": enc, "rows": 2}}}
        sch = Scheduler(spark, {k: PipelineSpec.from_dict(k, v) for k, v in cfg.items()})
        sch.run("t")
        assert probe in capsys.readouterr().out


def test_sender_routing_rejected_with_clear_error(spark):
    """Reference Scheduler.php:171-177 'sender:address:target' routing
    is N/A under Spark; a ported config using it must fail with a
    message that says so, not a generic unknown-node error."""
    import pytest as _pytest

    cfg = {
        "src": {"type": "source.table", "start": True, "name": "region",
                "output": "http:127.0.0.1:9501/consume"},
    }
    with _pytest.raises(ValueError, match="Senders.*N/A under Spark"):
        PipelineSpec.from_dict("t", cfg)


def test_console_html_escapes_cells(spark, capsys):
    """Values containing <, >, & must be entity-escaped in the html
    encoding — raw interpolation emits malformed HTML."""
    from rabbit_data_pipeline_spark.pipeline.scheduler import plugins

    df = spark.createDataFrame([("<b>x & y</b>",)], ["payload"])
    plugins()["sink.console"](None, {"encoding": "html", "rows": 1, "_node": "c"}, [df])
    out = capsys.readouterr().out
    assert "<td>&lt;b&gt;x &amp; y&lt;/b&gt;</td>" in out
    assert "<td><b>" not in out
