"""Regression tests for the round-2 ADVICE findings — each exercises
the previously-untested path that the original code got wrong.

1. as-of join: NULL inside the matched left row's payload must stay
   NULL (per-column last() back-filled it from an older row).
2. stateful sessionizer: multiple Arrow batches per group arrive with
   duplicate index labels; totals must not misalign.
3. foreachBatch upsert sink: a crash between the two swap renames must
   not lose the table — the next batch recovers it.
4. cron trigger: two polls inside one matched minute fire once.
5. SCD2: a delta carrying two rows for one key yields ONE open version.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------- 1. as-of join
def test_asof_join_null_in_matched_row_stays_null(spark):
    from rabbit_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100, "old"), (1, 20, None, "new")],
        "k int, ts long, a int, b string",
    )
    right = spark.createDataFrame([(1, 30)], "k int, rts long")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").collect()
    assert len(out) == 1
    row = out[0]
    # Matched row is (ts=20, a=NULL, b='new'): a must be NULL, not the
    # a=100 from the older ts=10 row.
    assert row["__matched_ts"] == 20
    assert row["a"] is None
    assert row["b"] == "new"


def test_asof_join_left_unmatched_payload_null(spark):
    from rabbit_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 50, 7)], "k int, ts long, a int")
    right = spark.createDataFrame([(1, 30), (1, 60)], "k int, rts long")
    rows = {r["rts"]: r for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", how="left").collect()}
    assert rows[30]["a"] is None and rows[30]["__matched_ts"] is None
    assert rows[60]["a"] == 7 and rows[60]["__matched_ts"] == 50


# --------------------------------------------- 2. stateful sessionizer
class _FakeState:
    """Just enough GroupState surface for _session_fn."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def setTimeoutDuration(self, ms):
        pass


def test_sessionizer_multi_batch_groups_align():
    from rabbit_data_pipeline_spark.streaming.ops import _session_fn

    fn = _session_fn(gap_ms=60_000)
    # Two Arrow batches, each with its own 0..n-1 index (as Spark
    # delivers them), interleaved in time. Without ignore_index +
    # whole-frame sort, ts/value pairs cross between batches.
    b1 = pd.DataFrame({"ts": pd.to_datetime([0, 300_000], unit="ms"), "value": [1, 100]})
    b2 = pd.DataFrame({"ts": pd.to_datetime([5_000, 305_000], unit="ms"), "value": [2, 200]})
    state = _FakeState()
    out = list(fn(("u1",), iter([b1, b2]), state))
    # Session 1: events at 0s,5s → total 3. Session 2 (open, in state):
    # events at 300s,305s → total 300.
    assert len(out) == 1
    closed = out[0]
    assert closed["n_events"].tolist() == [2]
    assert closed["total_value"].tolist() == [3]
    start_ms, last_ms, n, tot = state.get
    assert (start_ms, last_ms, n, tot) == (300_000, 305_000, 2, 300)


# ------------------------------------------- 3. crash-safe table swap
def test_upsert_sink_recovers_from_crashed_swap(spark, tmp_path):
    import shutil

    from rabbit_data_pipeline_spark.sinks.stream import upsert_write_stream
    from rabbit_data_pipeline_spark.sources.stream import queue_dir_publish, queue_dir_stream
    from rabbit_data_pipeline_spark.streaming import parse_json_messages
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType([StructField("user_id", StringType()), StructField("amount", IntegerType())])
    qdir, table, ckpt = str(tmp_path / "q"), str(tmp_path / "t"), str(tmp_path / "c")

    def run():
        stream = parse_json_messages(queue_dir_stream(spark, qdir), schema)
        q = upsert_write_stream(stream.select("user_id", "amount", "ts"), table, keys=["user_id"], checkpoint=ckpt, order_col="ts")
        q.awaitTermination(120)

    queue_dir_publish(
        qdir,
        [
            {"key": "a", "value": {"user_id": "u1", "amount": 1}, "ts": "2024-01-01T12:00:00"},
            {"key": "b", "value": {"user_id": "u2", "amount": 2}, "ts": "2024-01-01T12:00:01"},
        ],
    )
    run()
    assert {(r.user_id, r.amount) for r in spark.read.parquet(table).collect()} == {("u1", 1), ("u2", 2)}

    # Simulate dying between the two renames: table moved aside, a
    # stale staging dir left behind.
    os.rename(table, table + "__old")
    shutil.copytree(table + "__old", table + "__staging")
    assert not os.path.exists(table)

    import time

    time.sleep(1.05)  # distinct mtime so FileStreamSource sees a new file
    queue_dir_publish(qdir, [{"key": "c", "value": {"user_id": "u3", "amount": 3}, "ts": "2024-01-01T12:00:02"}])
    run()
    # Recovery restored the old copy, then the batch merged on top:
    # nothing lost, no duplicate dirs left.
    assert {(r.user_id, r.amount) for r in spark.read.parquet(table).collect()} == {
        ("u1", 1), ("u2", 2), ("u3", 3),
    }
    assert not os.path.exists(table + "__old") and not os.path.exists(table + "__staging")


# ------------------------------------------------ 4. cron double-fire
def test_cron_fires_once_per_matched_minute():
    from datetime import datetime

    from rabbit_data_pipeline_spark.pipeline.triggers import Trigger, run_on_trigger

    # Three polls: two inside minute :05 (the 30 s cadence), one in :06.
    clock = iter(
        [
            datetime(2026, 1, 1, 12, 5, 0),
            datetime(2026, 1, 1, 12, 5, 30),
            datetime(2026, 1, 1, 12, 6, 0),
        ]
    )
    fired = []
    run_on_trigger(
        Trigger("cron", cron="* * * * *"),
        lambda: fired.append(1),
        max_runs=2,
        sleep=lambda s: None,
        now=lambda: next(clock),
    )
    # Old code fired twice inside 12:05; guarded code needs the 12:06
    # poll for its second run — consuming all three clock ticks.
    assert len(fired) == 2
    with pytest.raises(StopIteration):
        next(clock)


# ------------------------------------------------- 5. SCD2 dup-key delta
def test_scd2_dup_key_delta_single_open_version(spark):
    from rabbit_data_pipeline_spark.operators.sync import scd2_merge

    dim = spark.createDataFrame(
        [(1, "v0", 0, None, True)],
        "k int, val string, valid_from long, valid_to long, is_current boolean",
    )
    upd = spark.createDataFrame([(1, "v1", 10), (1, "v2", 20)], "k int, val string, eff long")
    merged = scd2_merge(dim, upd, keys=["k"], compare_cols=["val"], effective_col="eff")
    cur = merged.filter(F.col("is_current")).collect()
    # One open version only, carrying the newest delta row.
    assert len(cur) == 1
    assert cur[0]["val"] == "v2"
    closed = merged.filter(~F.col("is_current")).collect()
    assert len(closed) == 1 and closed[0]["val"] == "v0"


# --------------------------------------- 6. fasttext label normalization
def test_fasttext_label_without_prefix_normalizes(monkeypatch):
    """ADVICE r8: 'fasttext:/m.bin#positive' (the natural spelling,
    no '__label__' prefix) must score against '__label__positive',
    not silently return 0.0 for every document; an unknown label must
    raise at first batch instead of scoring zeros."""
    import sys
    import types

    import pandas as pd

    class _FakeModel:
        def get_labels(self):
            return ["__label__positive", "__label__negative"]

        def predict(self, texts, k=-1):
            return (
                [["__label__positive", "__label__negative"]] * len(texts),
                [[0.9, 0.1]] * len(texts),
            )

    ft = types.ModuleType("fasttext")
    ft.load_model = lambda path: _FakeModel()
    monkeypatch.setitem(sys.modules, "fasttext", ft)
    from rabbit_data_pipeline_spark.operators.model import _load_fasttext

    fn = _load_fasttext("fasttext:/m.bin#positive")
    assert fn(pd.Series(["good doc"])).tolist() == [0.9]

    with pytest.raises(ValueError, match="not in model labels"):
        _load_fasttext("fasttext:/m.bin#nosuch")(pd.Series(["x"]))


# ------------------------------------------------ 7. resize gate parity
def test_resize_real_unrecognized_payload_gates(monkeypatch):
    """ADVICE r8: with Pillow installed, a non-image payload routed to
    _resize_real surfaces the documented NotImplementedError gate, not
    a raw PIL.UnidentifiedImageError from inside the Spark task."""
    import sys
    import types

    img_mod = types.ModuleType("PIL.Image")

    def _open(fp):
        raise OSError("cannot identify image file")

    img_mod.open = _open
    mod = types.ModuleType("PIL")
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    from rabbit_data_pipeline_spark.operators.multimodal import _resize_real

    with pytest.raises(NotImplementedError, match="no image codec"):
        _resize_real(b"RIFF-wav-not-an-image", 8, 8)


# ------------------------------------------- r9: bench compact line


def test_bench_compact_line_sheds_to_the_floor():
    """ADVICE r8: the compact stdout line must stay ≤1900 chars even
    when the per-query dict alone exceeds the window — after the fixed
    shed keys it drops 'queries' itself (everything lives in the
    sidecar). metric/value/sf always survive."""
    import bench

    many = {f"q_generated_{i:03d}": 1.2345 for i in range(200)}
    result = {
        "metric": "headline_queries_total_wall",
        "value": 9.99,
        "unit": "sec",
        "sf": 0.1,
        "queries": many,
        "queries_stats": {k: {"min": 1, "med": 1, "max": 1, "spread_pct": 0} for k in many},
        "plan_hashes": {k: "abc123" for k in many},
        "sf1_queries": dict(many),
        "sf1_extended": {"q_pagerank": 20.0},
        "extended_queries": {"q_pagerank": 13.0},
        "extended_plan_hashes": {"q_pagerank": "def456"},
        "sf1_superlinear": {},
        "sf1_total": 23.0,
    }
    import json as _json

    line = bench._compact_line(result)
    assert len(line) <= 1900
    parsed = _json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 9.99 and parsed["sf1_total"] == 23.0
    # detail-only keys never appear regardless of size
    assert "queries_stats" not in parsed and "plan_hashes" not in parsed
    assert "extended_plan_hashes" not in parsed

    # a normal-size result sheds nothing
    small = {"metric": "m", "value": 1.0, "queries": {"q1": 0.5}, "plan_hashes": {"q1": "x"}}
    parsed_small = _json.loads(bench._compact_line(small))
    assert parsed_small["queries"] == {"q1": 0.5}


def test_codec_probe_materializes_all_three_tiers(spark):
    """The codec bench probe (VERDICT r8 ask #5) decodes its full fixed
    corpus through the real stdlib codecs: 240 PNGs, 48 AVIs, 160 WAVs
    — one aggregate row per tier, non-null checksums (a decode that
    silently dropped payloads would move n)."""
    from rabbit_data_pipeline_spark.queries.llm import multimodal_codec_scale

    rows = {r["tier"]: r for r in multimodal_codec_scale(spark, "unused").collect()}
    assert rows["png_features"]["n"] == 240
    assert rows["avi_fingerprint"]["n"] == 48
    assert rows["wav_features"]["n"] == 160
    assert all(r["chk"] is not None for r in rows.values())


def test_plan_normalization_rules_stay_on_their_line():
    """r9 self-review: the v2 RDD call-site rule used [^,]* — a negated
    class matches newlines, so a call-site line with no trailing comma
    swallowed the FOLLOWING plan operators out of the hash input, and
    two plans differing only there hashed identical ('same plan, host
    noise' for a real regression). Every normalization must stay on
    its own line; distinct downstream operators must stay distinct."""
    import bench

    text_a = (
        "Arguments: MapPartitionsRDD[778] at rddFoo at <unknown>:0\n"
        "(2) Filter\nCondition: (a# > 5)\n(3) Project [a#, b#]"
    )
    text_b = text_a.replace("(a# > 5)", "(a# > 7)")
    na, nb = bench._normalize_plan(text_a), bench._normalize_plan(text_b)
    assert na != nb  # the differing filter must survive normalization
    assert "Filter" in na and "(3) Project" in na
    # the session-dependent parts are still gone
    assert "778" not in na and "<unknown>" not in na
    # and the comma-terminated spelling normalizes to the same token
    with_comma = bench._normalize_plan(
        "Arguments: MapPartitionsRDD[9] at rddFoo at NativeMethodAccessorImpl.java:0, ExistingRDD"
    )
    assert "RDD[] at callsite" in with_comma and "RDD[] at callsite" in na


def test_encode_memo_cap_one_still_bounded():
    """r9 self-review: memo_cap=1 made cap//2 == 0, so eviction deleted
    nothing and the memo grew without bound through the public kwarg —
    exactly the unbounded-executor-memory hole the cap exists to
    close. Eviction must always remove at least one entry."""
    from rabbit_data_pipeline_spark.operators import bpe as bpe_mod

    enc = bpe_mod._make_word_encoder([("a", "a", "aa")], memo_cap=1)
    for i in range(100):
        enc(f"w{i:03d}")
        assert len(enc._memo) <= 1


def test_image_gray_corrupt_png_falls_through_like_resize(monkeypatch):
    """r9 self-review: the corrupt-PNG Pillow fall-through (ADVICE r8)
    was applied to _resize_png but not the shared _image_gray helper,
    so extract_features/perceptual_hash crashed on a payload
    resize_images recovered. Same payload, same contract: with Pillow
    installed the fallback tries; without it, ValueError (the data is
    corrupt — not a missing library)."""
    import struct
    import sys
    import types
    import zlib

    from rabbit_data_pipeline_spark.operators.multimodal import _image_gray

    def _chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body))

    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
    bad = b"\x89PNG\r\n\x1a\n" + ihdr + _chunk(b"IDAT", b"\xde\xad\xbe\xef") + _chunk(b"IEND", b"")

    class _FakeIm:
        width, height = 4, 3

        def convert(self, mode):
            return self

        def tobytes(self):
            return bytes(12)

    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda fp: _FakeIm()
    mod = types.ModuleType("PIL")
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
    assert _image_gray(bad) == (4, 3, bytes(12))  # Pillow fallback decodes it

    monkeypatch.delitem(sys.modules, "PIL")
    monkeypatch.delitem(sys.modules, "PIL.Image")
    try:
        import PIL  # noqa: F401

        pytest.skip("real Pillow present in this environment")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="corrupt IDAT"):
        _image_gray(bad)


def test_wav_format_tag_parses_off_the_bytes():
    """r9 self-review: the WAV gate-vs-corrupt split must not key off
    the stdlib's error message text. The fmt chunk's format tag is
    parsed from the RIFF bytes directly: PCM (1) → structural errors
    are corrupt data; anything else → the missing-codec gate; an
    unparseable chunk walk → None (corrupt)."""
    import struct

    from rabbit_data_pipeline_spark.operators.multimodal import _wav_format_tag

    def wav_with_tag(tag):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 16)
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    assert _wav_format_tag(wav_with_tag(1)) == 1
    assert _wav_format_tag(wav_with_tag(85)) == 85
    assert _wav_format_tag(wav_with_tag(0xFFFE)) == 0xFFFE
    assert _wav_format_tag(b"RIFF\x24\x00\x00\x00WAVEgarbage-here") is None


def test_pillow_open_vs_decode_split_is_the_error_contract(monkeypatch):
    """r9 self-review pass 2: Pillow's open() is lazy (header only), so
    a corrupt-but-recognized payload fails at pixel-decode time —
    previously that leaked a raw PIL OSError out of resize_images'
    Spark task, and _image_gray blamed a missing library with the
    library installed. open-fails → NotImplementedError (no codec
    recognizes the format); open-succeeds-decode-fails → ValueError
    (your data is corrupt)."""
    import sys
    import types

    from rabbit_data_pipeline_spark.operators.multimodal import _image_gray, _resize_real

    class _LazyBroken:
        """Header parses; pixel decode explodes, like corrupt IDAT."""

        width, height = 8, 6

        def convert(self, mode):
            raise OSError("broken data stream when reading image file")

        def resize(self, wh, resample=None):
            raise OSError("broken data stream when reading image file")

    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda fp: _LazyBroken()
    mod = types.ModuleType("PIL")
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)

    with pytest.raises(ValueError, match="not a valid image"):
        _resize_real(b"\xff\xd8\xff-corrupt-jpeg", 4, 4)
    with pytest.raises(ValueError, match="not a valid image"):
        _image_gray(b"\xff\xd8\xff-corrupt-jpeg")

    # unrecognized format keeps the gate
    def _open_fail(fp):
        raise OSError("cannot identify image file")

    img_mod.open = _open_fail
    with pytest.raises(NotImplementedError, match="no image codec recognizes"):
        _resize_real(b"WEIRD-format", 4, 4)
    with pytest.raises(NotImplementedError, match="no image codec recognizes"):
        _image_gray(b"WEIRD-format")


def test_wav_format_tag_agrees_with_stdlib_wave_property():
    """Property gate for the bytes-level fmt-tag walk: for arbitrary
    wave-module-written PCM files (any rate/channel/length, extra
    leading chunks), _wav_format_tag finds tag 1 exactly where the
    stdlib parser succeeds — the two walkers must agree on where the
    fmt chunk lives or the gate-vs-corrupt split drifts from what
    wave.open actually decodes."""
    import io
    import struct
    import wave

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rabbit_data_pipeline_spark.operators.multimodal import _wav_format_tag

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.integers(1, 192000),
        nch=st.integers(1, 4),
        n=st.integers(0, 64),
        pre_chunk=st.binary(min_size=0, max_size=9),
    )
    def check(rate, nch, n, pre_chunk):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * (n * nch))
        payload = buf.getvalue()
        assert _wav_format_tag(payload) == 1
        if pre_chunk:
            # splice an unknown (word-aligned) chunk before fmt — real
            # muxers emit LIST/INFO there; both walkers must skip it
            body = pre_chunk + b"\x00" * (len(pre_chunk) & 1)
            extra = b"JUNK" + struct.pack("<I", len(pre_chunk)) + body
            spliced = payload[:12] + extra + payload[12:]
            spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
            assert _wav_format_tag(spliced) == 1
            with wave.open(io.BytesIO(spliced)) as w2:  # stdlib agrees it's PCM
                assert w2.getnchannels() == nch

    check()


def test_bench_diff_sections_and_exit_codes(capsys, tmp_path):
    """tools/bench_diff.py is the round-over-round gate: MOVED hashes
    must set exit 1, NEW/GONE/never-hashed must not, extended probes
    get their own section, and a cross-rule-version comparison prints
    the replay pointer. Pinned on synthetic sidecars so a refactor
    can't silently stop flagging regressions."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    def run(old, new):
        po, pn = str(tmp_path / "bd_old.json"), str(tmp_path / "bd_new.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        code = bd.main(po, pn)
        return code, capsys.readouterr().out

    base_old = {
        "plan_hashes": {"q_a": "aaa", "q_b": "bbb"},
        "queries": {"q_a": 1.0, "q_b": 2.0},
        "queries_stats": {"q_a": {"spread_pct": 50.0}, "q_b": {"spread_pct": 10.0}},
        "extended_plan_hashes": {"q_ext": "eee"},
        "extended_queries": {"q_ext": 5.0},
        "extended_stats": {"q_ext": {"spread_pct": 20.0}},
        "value": 3.0,
        "plan_hash_rules": "v2",
    }
    # identical → exit 0, nothing moved
    code, out = run(base_old, base_old)
    assert code == 0 and "all plan hashes unchanged" in out

    # a moved HEADLINE hash → exit 1 and named
    new = json.loads(json.dumps(base_old))
    new["plan_hashes"]["q_a"] = "zzz"
    code, out = run(base_old, new)
    assert code == 1 and "MOVED (1): q_a" in out

    # a moved EXTENDED hash must also gate (that's the r9 point)
    new = json.loads(json.dumps(base_old))
    new["extended_plan_hashes"]["q_ext"] = "zzz"
    code, out = run(base_old, new)
    assert code == 1 and "q_ext" in out and "[extended sf0.1]" in out

    # NEW keys (a probe added this round) must NOT gate
    new = json.loads(json.dumps(base_old))
    new["extended_plan_hashes"]["q_new"] = "nnn"
    new["extended_queries"]["q_new"] = 1.0
    code, out = run(base_old, new)
    assert code == 0 and "NEW" in out

    # cross-rule-version comparison prints the replay pointer
    old_v1 = json.loads(json.dumps(base_old))
    old_v1["plan_hash_rules"] = "v1"
    code, out = run(old_v1, base_old)
    assert "hash rules differ" in out and "hash_rules_replay" in out


def test_wav_format_tag_degenerate_fmt_size_is_corrupt_not_gate():
    """r9 self-review pass 3: a fmt chunk DECLARING size<2 can't hold a
    format tag — the walker must return None (corrupt) instead of
    reading the following chunk's id bytes as a tag, which would
    misreport corrupt data as 'non-PCM encoding (format tag 24932);
    needs soundfile/ffmpeg'."""
    import struct

    from rabbit_data_pipeline_spark.operators.multimodal import _audio_pcm, _wav_format_tag

    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 0)  # declares ZERO fmt bytes
        + b"data" + struct.pack("<I", 4) + b"\0\0\0\0"
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _wav_format_tag(payload) == None  # noqa: E711 — explicit None, not falsy
    with pytest.raises(ValueError, match="not a valid WAV"):
        _audio_pcm(payload)


def test_verdict_freshness_invariants_hold(tmp_path):
    """tools/verdict_freshness.py institutionalizes the rotation
    bookkeeping: every registered key must have a driver verdict, and
    every key's LATEST verdict must pass. ADVICE r9 #4: the invariant
    runs against SYNTHETIC fixture artifacts, not the live committed
    CORRECTNESS_r*.json — a future round where the driver legitimately
    records a failing verdict is rotation state to fix, not a reason
    the whole unit suite goes red."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "verdict_freshness",
        os.path.join(os.path.dirname(__file__), "..", "tools", "verdict_freshness.py"),
    )
    vf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vf)

    # the driver's pass predicate, pinned on every verdict shape
    assert vf._passed({"rows_match": True, "schema_match": True, "hash_match": True, "err": None})
    assert vf._passed({"rows_match": True, "schema_match": True, "hash_match": None, "err": None})
    assert not vf._passed({"rows_match": True, "schema_match": True, "hash_match": False, "err": None})
    assert not vf._passed({"rows_match": False, "schema_match": True, "hash_match": True, "err": None})
    assert not vf._passed({"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"})

    from rabbit_data_pipeline_spark.queries import registry

    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    keys = list(registry())

    # every key verified + passing → exit 0
    green = tmp_path / "green"
    green.mkdir()
    (green / "CORRECTNESS_r01.json").write_text(json.dumps({k: ok for k in keys}))
    assert vf.main(str(green)) == 0

    # a key whose LATEST verdict fails → exit 1 (an older pass doesn't save it)
    red = tmp_path / "red"
    red.mkdir()
    (red / "CORRECTNESS_r01.json").write_text(json.dumps({k: ok for k in keys}))
    bad = dict(ok, hash_match=False)
    (red / "CORRECTNESS_r02.json").write_text(json.dumps({keys[0]: bad}))
    assert vf.main(str(red)) == 1

    # a registered key never verified → exit 1
    never = tmp_path / "never"
    never.mkdir()
    (never / "CORRECTNESS_r01.json").write_text(json.dumps({k: ok for k in keys[1:]}))
    assert vf.main(str(never)) == 1


# ------------------------------------------- round-10 ADVICE/VERDICT fixes


def test_compact_line_hard_backstop_enforces_the_window():
    """ADVICE r9 #1: after the named shed keys go, residual keys (long
    error strings, accumulated scalars) could still bust the ~2000-char
    capture window — the docstring claimed ≤1900 but nothing enforced
    it. The backstop drops remaining non-contract keys largest-first;
    metric/value/unit/sf always survive."""
    import json as _json

    import bench

    result = {
        "metric": "headline_queries_total_wall",
        "value": 9.99,
        "unit": "sec",
        "sf": 0.1,
        # all named-shed keys already absent — the loop alone can't help
        "extended_error": "E" * 1200,
        "sf1_error": "F" * 1200,
        "stream_error": "G" * 400,
    }
    line = bench._compact_line(result)
    assert len(line) <= 1900
    parsed = _json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == 9.99 and parsed["unit"] == "sec" and parsed["sf"] == 0.1
    # largest resident went first — and ONLY what was needed: dropping
    # the 1200-char extended_error brings the line under the window,
    # so the other errors survive (shed minimally, loudly documented
    # in the sidecar either way)
    assert "extended_error" not in parsed
    assert parsed["sf1_error"] == "F" * 1200
    assert parsed["stream_error"] == "G" * 400


def test_plan_hash_v3_keeps_quoted_literals_distinct():
    """ADVICE r9 #2: v2's bare @hex rule hashed a plan filtering on
    'user@deadbee' identical to one filtering on 'user@cafebabe' — a
    false-"same" that buries a real plan change as host noise. v3
    anchors to a Java-class-like token (kept) so identity hashes still
    normalize while quoted literals survive."""
    import bench

    assert bench.PLAN_HASH_RULES == "v3"

    lit_a = "Filter (email# = user@deadbee)"
    lit_b = "Filter (email# = user@cafebabe)"
    # v2 regression: both normalized to the same text
    assert bench._normalize_plan(lit_a, "v2") == bench._normalize_plan(lit_b, "v2")
    # v3: the literals survive and stay distinct
    na, nb = bench._normalize_plan(lit_a, "v3"), bench._normalize_plan(lit_b, "v3")
    assert na != nb and "user@deadbee" in na

    # identity hashes still normalize, and v3 output == v2 output on
    # them (the r9→r10 hash-continuity claim)
    ident = "Arguments: [UnsafeArrayData@e4ee577e], [B@1a2b3c4d5e"
    v2 = bench._normalize_plan(ident, "v2")
    v3 = bench._normalize_plan(ident, "v3")
    assert v2 == v3
    assert "e4ee577e" not in v3 and "1a2b3c4d5e" not in v3
    assert "UnsafeArrayData@" in v3  # class name kept


def test_wav_non_pcm_without_data_chunk_is_corrupt_not_gate():
    """ADVICE r9 #3: a wave.Error on a file whose fmt tag is non-PCM
    but which has NO data chunk was classified as the missing-codec
    gate — yet no codec anywhere could decode a WAV with no audio
    payload. The gate now additionally requires a data chunk; the
    doubly-broken file reports corrupt data."""
    import struct

    import pytest as _pytest

    from rabbit_data_pipeline_spark.operators.multimodal import (
        _audio_pcm,
        _wav_has_data_chunk,
    )

    def wav(body: bytes) -> bytes:
        return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body

    fmt_mp3 = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 85, 1, 16000, 4000, 1, 0)
    data = b"data" + struct.pack("<I", 4) + b"\0\0\0\0"

    # non-PCM tag + data chunk present → genuinely needs a codec → gate
    assert _wav_has_data_chunk(wav(fmt_mp3 + data))
    with _pytest.raises(NotImplementedError, match="format tag 85"):
        _audio_pcm(wav(fmt_mp3 + data))

    # non-PCM tag but NO data chunk → nothing to decode → corrupt
    assert not _wav_has_data_chunk(wav(fmt_mp3))
    with _pytest.raises(ValueError, match="not a valid WAV"):
        _audio_pcm(wav(fmt_mp3))


def test_replay_cheap_mode_hint_fires_only_on_v1_existing_rdd():
    """VERDICT r9 ask #4: a build-only replay mismatch on a v1-rules
    plan embedding an ExistingRDD is expected (v1 keeps session-
    monotonic RDD ids), so the tool must print a re-run-with---execute
    hint instead of letting the false MOVED stand. Executed replays,
    v2+ rules, and scan-lineage plans get no hint — their mismatches
    are real."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "hash_rules_replay",
        os.path.join(os.path.dirname(__file__), "..", "tools", "hash_rules_replay.py"),
    )
    hr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hr)

    rdd_plan = "Scan ExistingRDD[doc_id#, sig#]\n(2) Filter"
    scan_plan = "Scan parquet [doc_id#]\n(2) Filter"

    hint = hr._cheap_mode_hint("dedup_minhash", rdd_plan, "v1", execute=False)
    assert hint and "--execute" in hint and "dedup_minhash" in hint
    # executed replay: the mismatch stands
    assert hr._cheap_mode_hint("dedup_minhash", rdd_plan, "v1", execute=True) is None
    # v2+ rules strip RDD ids — no hint
    assert hr._cheap_mode_hint("dedup_minhash", rdd_plan, "v2", execute=False) is None
    # scan-lineage plan — no hint
    assert hr._cheap_mode_hint("q_topn", scan_plan, "v1", execute=False) is None


def test_time_runs_carries_run_list(spark):
    """VERDICT r9 ask #3: extended-probe stats must carry the real
    per-run distribution (execution order), not just the min/med/max
    envelope, so round-over-round comparison sees the spread shape."""
    import bench

    s = bench._time_runs(lambda sp, sf: sp.range(100), spark, "unused", runs=3)
    assert len(s["runs"]) == 3
    assert min(s["runs"]) == s["min"] and max(s["runs"]) == s["max"]
    assert all(t >= 0 for t in s["runs"])


def test_codec_probe_plan_scans_parquet(spark):
    """VERDICT r9 ask #5: the codec probe must time scan → decode →
    features, not driver createDataFrame serialization — its plan now
    reads the staged parquet corpus (ExistingRDD gone)."""
    from rabbit_data_pipeline_spark.queries.llm import multimodal_codec_scale

    df = multimodal_codec_scale(spark, "unused")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" in plan.lower()
    assert "ExistingRDD" not in plan


def test_bench_diff_uniform_shift_detector(capsys, tmp_path):
    """Round-10 throttled-host lesson, mechanized: when ~all same-plan
    queries move the same direction by a similar magnitude, bench_diff
    must print the UNIFORM SHIFT warning (host condition) — and must
    NOT print it for a single-query regression or a quiet round."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    # the detector itself (round 11: returns (warning, median) so the
    # per-row labeler can reuse the median)
    assert bd._uniform_shift([30.0] * 12)[0] is not None    # all up 30%
    assert bd._uniform_shift([30.0] * 5)[0] is None         # too few rows
    assert bd._uniform_shift([2.0] * 12)[0] is None         # below the floor
    assert bd._uniform_shift([30.0] * 6 + [-30.0] * 6)[0] is None  # mixed signs
    down, med = bd._uniform_shift([-25.0] * 12)
    assert down and "-25%" in down and med == -25.0

    # end-to-end: a uniformly +35% round trips the warning, exit stays 0
    def run(old, new):
        po, pn = str(tmp_path / "us_old.json"), str(tmp_path / "us_new.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        code = bd.main(po, pn)
        return code, capsys.readouterr().out

    names = [f"q_{i}" for i in range(12)]
    old = {
        "plan_hashes": {n: f"h{n}" for n in names},
        "queries": {n: 1.0 for n in names},
        "queries_stats": {n: {"spread_pct": 10.0} for n in names},
        "value": 12.0,
        "plan_hash_rules": "v3",
    }
    new = json.loads(json.dumps(old))
    new["queries"] = {n: 1.35 for n in names}
    new["value"] = 16.2
    code, out = run(old, new)
    assert code == 0 and "UNIFORM SHIFT" in out and "host-condition" in out
    assert "host(uniform)" in out  # r11: breakers riding the shift are host-labeled

    # one genuine regression among flat rows: no uniform-shift claim,
    # the row is labeled REAL, and (round 11) the exit code forces the
    # attribution step.
    new2 = json.loads(json.dumps(old))
    new2["queries"]["q_3"] = 3.0
    code, out = run(old, new2)
    assert code == 1 and "UNIFORM SHIFT" not in out
    assert "REAL breakers (1): q_3" in out


def test_wav_data_chunk_walker_agrees_with_stdlib_property():
    """Property gate for the other half of the gate-vs-corrupt split
    (ADVICE r9 #3): for arbitrary wave-module-written PCM files (any
    rate/channels/length, extra leading JUNK chunks), _wav_has_data_chunk
    is True exactly where the stdlib finds frames to read — and goes
    False when the data chunk is cut out of the same bytes."""
    import io
    import struct
    import wave

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rabbit_data_pipeline_spark.operators.multimodal import _wav_has_data_chunk

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.integers(1, 192000),
        nch=st.integers(1, 4),
        n=st.integers(0, 64),
        pre_chunk=st.binary(min_size=0, max_size=9),
    )
    def check(rate, nch, n, pre_chunk):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * (n * nch))
        payload = buf.getvalue()
        if pre_chunk:
            body = pre_chunk + b"\x00" * (len(pre_chunk) & 1)
            extra = b"JUNK" + struct.pack("<I", len(pre_chunk)) + body
            payload = payload[:12] + extra + payload[12:]
            payload = b"RIFF" + struct.pack("<I", len(payload) - 8) + payload[8:]
        assert _wav_has_data_chunk(payload)
        with wave.open(io.BytesIO(payload)) as w2:  # stdlib also reaches the frames
            assert len(w2.readframes(w2.getnframes())) == 2 * n * nch
        # excise the data chunk: walk to it, drop header+payload
        pos = 12
        while payload[pos : pos + 4] != b"data":
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            pos += 8 + size + (size & 1)
        dsize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        gutted = payload[:pos] + payload[pos + 8 + dsize + (dsize & 1):]
        gutted = b"RIFF" + struct.pack("<I", len(gutted) - 8) + gutted[8:]
        assert not _wav_has_data_chunk(gutted)

    check()


def test_host_calibration_probe_and_diff_line(capsys, tmp_path):
    """The host-calibration probe is fixed CPU work: positive, fast,
    and repeatable within a loose band on one host; bench_diff prints
    the rescaling line when both sidecars carry it."""
    import importlib.util
    import json
    import os

    import bench

    a, b = bench._host_calibration(runs=1), bench._host_calibration(runs=1)
    assert 0 < a < 30 and 0 < b < 30
    assert abs(a - b) / max(a, b) < 0.9  # same host, same order of magnitude

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    old = {"plan_hashes": {"q": "h"}, "queries": {"q": 1.0}, "queries_stats": {},
           "value": 1.0, "plan_hash_rules": "v3",
           "host_calib_sec": 0.5, "host_calib_par_sec": 1.0}
    new = dict(old, host_calib_sec=0.75, host_calib_par_sec=2.0)
    po, pn = str(tmp_path / "hc_old.json"), str(tmp_path / "hc_new.json")
    json.dump(old, open(po, "w")); json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "host calibration (1-core): 0.5 -> 0.75" in out and "+50.0%" in out
    assert "host calibration (16-way): 1.0 -> 2.0" in out and "+100.0%" in out


def test_host_steal_instrument(capsys, tmp_path):
    """_cpu_times returns (steal, total) jiffies on Linux with
    total > 0 monotone; bench_diff prints the steal line when both
    sidecars carry host_steal_pct."""
    import importlib.util
    import json
    import os

    import bench

    a, b = bench._cpu_times(), bench._cpu_times()
    assert a is not None and b is not None
    assert a[1] > 0 and b[1] >= a[1] and b[0] >= a[0]  # monotone counters

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    old = {"plan_hashes": {"q": "h"}, "queries": {"q": 1.0}, "queries_stats": {},
           "value": 1.0, "plan_hash_rules": "v3", "host_steal_pct": 0.4}
    new = dict(old, host_steal_pct=22.5)
    po, pn = str(tmp_path / "hs_old.json"), str(tmp_path / "hs_new.json")
    json.dump(old, open(po, "w")); json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "host steal: 0.4% -> 22.5%" in out


def _load_bench_diff():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    return bd


def test_bench_diff_breaker_labels_are_mechanical():
    """VERDICT r10 ask #2: every envelope-breaker gets a {plan, host,
    real} label from evidence, not prose. Each branch of label_row
    pinned: moved hash → plan; inside envelope → not a finding;
    calibration-bracketed → host(calib); uniform-shift-bracketed →
    host(uniform); the remainder → REAL."""
    bd = _load_bench_diff()
    lab = bd.label_row
    assert lab("MOVED", 40.0, 10.0, None, None) == "plan"
    assert lab("same", 8.0, 10.0, None, None) == "noise"        # inside envelope, visible
    assert lab("same", 2.0, 10.0, None, None) == "same"         # inside envelope, quiet
    # +30% with the calibration probes also +28%: the machine, not the plan
    assert lab("same", 30.0, 10.0, 28.0, None) == "host(calib)"
    # calibration moved the OTHER way: can't explain the slowdown
    assert lab("same", 30.0, 10.0, -28.0, None) == "REAL"
    # burst calibration flat, but the round shifted uniformly +35%:
    # the sustained-steal signature → host(uniform)
    assert lab("same", 30.0, 10.0, 0.5, 35.0) == "host(uniform)"
    # quiet host, quiet calibration, one query +200% → REAL
    assert lab("same", 200.0, 10.0, 0.5, None) == "REAL"
    # a breaker far past even the uniform median stays REAL
    assert lab("same", 200.0, 10.0, 0.5, 35.0) == "REAL"


def test_bench_diff_record_divergence_policy(capsys, tmp_path):
    """VERDICT r10 ask #3: the official driver record vs the committed
    idle-host sidecar. Within the calibration bound → no warning;
    beyond it → RECORD DIVERGENCE naming both totals. Wired end-to-end
    through main(--idle)."""
    import json

    bd = _load_bench_diff()
    idle = {
        "value": 10.0, "sf1_total": 20.0,
        "host_calib_sec": 0.10, "host_calib_par_sec": 0.08,
    }
    # official 12% slower, calibration 10% slower → inside 10%+floor
    official_ok = {
        "value": 11.2, "sf1_total": 22.4,
        "host_calib_sec": 0.11, "host_calib_par_sec": 0.088,
    }
    assert bd.record_divergence(official_ok, idle) is None
    # official 40% slower with flat calibration → the gap is unexplained
    official_bad = {
        "value": 14.0, "sf1_total": 28.0,
        "host_calib_sec": 0.10, "host_calib_par_sec": 0.08,
    }
    warn = bd.record_divergence(official_bad, idle)
    assert warn and "RECORD DIVERGENCE" in warn and "14.0" in warn and "idle sidecar" in warn

    # end-to-end through main(): --idle prints the warning
    base = {
        "plan_hashes": {"q": "h"}, "queries": {"q": 1.0},
        "queries_stats": {"q": {"spread_pct": 10.0}},
        "value": 14.0, "plan_hash_rules": "v3",
        "host_calib_sec": 0.10, "host_calib_par_sec": 0.08,
    }
    po, pn, pi = (str(tmp_path / f) for f in ("old.json", "new.json", "idle.json"))
    json.dump(base, open(po, "w"))
    json.dump(base, open(pn, "w"))
    json.dump(idle, open(pi, "w"))
    code = bd.main(po, pn, pi)
    out = capsys.readouterr().out
    assert code == 0 and "RECORD DIVERGENCE" in out
    json.dump(dict(idle, value=14.0, sf1_total=None), open(pi, "w"))
    bd.main(po, pn, pi)
    assert "agrees with the idle sidecar" in capsys.readouterr().out


def test_plan_hash_residual_guard(spark):
    """ADVICE r10 #2: v3's capital-anchored strip leaves lowercase
    Scala module/anon tokens and JVM array toString forms carrying
    per-process hex. The guard detects exactly those in NORMALIZED
    text (quoted literals excluded) and bench publishes them as
    plan_hash_warnings instead of silently flapping the hash."""
    import bench

    # synthetic: the two ADVICE-named shapes survive v3 and are caught
    raw = (
        "Project [functions$$anon$1@1a2b3c4d]\n"
        "Scan [Ljava.lang.Object;@deadbeef\n"
        "Scan UnsafeArrayData@e4ee577e\n"
        "Filter (col = 'user@deadbee')"
    )
    norm = bench._normalize_plan(raw)
    assert "UnsafeArrayData@e4ee577e" not in norm          # v3 strips class-anchored
    res = bench._residual_identity_hashes(norm)
    assert any("anon$1@1a2b3c4d" in r for r in res)
    assert any("Ljava.lang.Object;@deadbeef" in r for r in res)
    assert not any("user@deadbee" in r for r in res)       # quoted literal excluded

    # real plans produce no warnings, and _plan_hash_checked agrees
    # with _plan_hash bit-for-bit (same normalization, same digest)
    df = spark.range(10).selectExpr("id", "id * 2 AS y").filter("y > 3")
    warnings: dict = {}
    h = bench._plan_hash_checked(df, "probe", warnings)
    assert h == bench._plan_hash(df)
    assert warnings == {}


def test_codec_stage_dir_is_per_user_and_recovers_stale(tmp_path, monkeypatch):
    """ADVICE r10 #1: the codec-probe stage root is per-uid with 0o700
    (no fixed world-writable /tmp name to pre-create/poison), and a
    marker-less stale stage dir is removed and retried, not a
    permanent RuntimeError."""
    import os
    import stat
    import tempfile

    from rabbit_data_pipeline_spark.queries import llm

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    d = llm._codec_stage_dir()
    base = os.path.dirname(d)
    assert base == os.path.join(str(tmp_path), f"rdps-{os.getuid()}")
    assert stat.S_IMODE(os.stat(base).st_mode) == 0o700
    assert llm._CODEC_STAGE_VERSION in os.path.basename(d)

    # Symlink at the fixed root name (the /tmp pre-creation attack):
    # rejected via lstat, never chmod'd/written through.
    victim = tmp_path / "victim"
    victim.mkdir()
    link_tmp = tmp_path / "linked"
    link_tmp.mkdir()
    os.symlink(str(victim), os.path.join(str(link_tmp), f"rdps-{os.getuid()}"))
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(link_tmp))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not a plain directory"):
        llm._codec_stage_dir()

    # stale-dir recovery: a marker-less dir squatting on the stage path
    # (rename target exists → OSError) must be cleared and retried...
    os.makedirs(d)  # no _BUILT inside: the "pruned by tmpfiles" state
    build = f"{d}.build-a"
    os.makedirs(build)
    open(os.path.join(build, "_BUILT"), "w").write(llm._CODEC_STAGE_VERSION)
    marker = os.path.join(d, "_BUILT")
    llm._install_stage(build, d)
    assert os.path.exists(marker) and not os.path.exists(build)

    # ...but a VALID stage already installed must never be deleted:
    # the loser discards its own build and the marker survives intact.
    build2 = f"{d}.build-b"
    os.makedirs(build2)
    open(os.path.join(build2, "_BUILT"), "w").write("other-content")
    open(os.path.join(d, "payload"), "w").write("keep-me")
    llm._install_stage(build2, d)
    assert open(os.path.join(d, "payload")).read() == "keep-me"
    assert open(marker).read() == llm._CODEC_STAGE_VERSION  # winner's, not b's
    assert not os.path.exists(build2)
    import glob as _glob

    assert not _glob.glob(f"{d}.stale-*")  # no debris

    # ADVICE r11 #4 (pid reuse): a leftover pid-keyed aside dir from a
    # crashed recovery used to make os.rename(stage_dir, stale) fail
    # ENOTEMPTY — misread as 'another recoverer moved it aside', the
    # build discarded, the marker never installed. The aside name is
    # now unique per attempt, so recovery must succeed even with the
    # old-format leftover squatting right next to the stage path.
    import shutil as _shutil

    _shutil.rmtree(d)
    leftover = f"{d}.stale-{os.getpid()}"
    os.makedirs(leftover)
    open(os.path.join(leftover, "junk"), "w").write("crashed recovery debris")
    os.makedirs(d)  # marker-less squatter again
    build3 = f"{d}.build-c"
    os.makedirs(build3)
    open(os.path.join(build3, "_BUILT"), "w").write(llm._CODEC_STAGE_VERSION)
    llm._install_stage(build3, d)
    assert os.path.exists(marker) and not os.path.exists(build3)


def test_bench_diff_review_hardenings(capsys, tmp_path):
    """Round-11 review fixes on the attribution machinery, pinned:
    (1) a calibration shift OPPOSITE the record gap explains nothing —
    RECORD DIVERGENCE must still fire; (2) a row with no spread stats
    on either side gets no breaker label (pre-r11 behavior) instead of
    a phantom REAL; (3) a MOVED row with no timing delta still prints
    in the breaker summary instead of crashing the report; (4) --idle
    without a path (or missing positionals) exits 2 with usage, not a
    traceback."""
    import json
    import os
    import subprocess
    import sys

    bd = _load_bench_diff()

    # (1) sign-aware divergence: official calibrates 30% FASTER but
    # totals 40% SLOWER — a faster host cannot explain a slower total.
    idle = {"value": 10.0, "host_calib_sec": 0.10, "host_calib_par_sec": 0.08}
    official = {"value": 14.0, "host_calib_sec": 0.07, "host_calib_par_sec": 0.056}
    warn = bd.record_divergence(official, idle)
    assert warn and "RECORD DIVERGENCE" in warn
    # same-direction calibration still explains (official 25% slower
    # host, 30% slower total → inside 25%+10% floor)
    official2 = {"value": 13.0, "host_calib_sec": 0.125, "host_calib_par_sec": 0.10}
    assert bd.record_divergence(official2, idle) is None

    # (2) no envelope on either side → no label, no breaker
    assert bd.label_row("same", 42.0, None, None, None) == ""
    assert bd.label_row("MOVED", 42.0, None, None, None) == "plan"

    # (3) MOVED row whose min is missing on one side: report prints
    old = {
        "plan_hashes": {"q": "aaa"}, "queries": {}, "queries_stats": {},
        "value": 1.0, "plan_hash_rules": "v3",
    }
    new = {
        "plan_hashes": {"q": "bbb"}, "queries": {"q": 1.0},
        "queries_stats": {"q": {"spread_pct": 5.0}},
        "value": 1.0, "plan_hash_rules": "v3",
    }
    po, pn = str(tmp_path / "rh_old.json"), str(tmp_path / "rh_new.json")
    json.dump(old, open(po, "w")); json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 1
    out = capsys.readouterr().out
    assert "MOVED (1): q" in out and "-> plan" in out

    # (4) CLI arg validation: usage + exit 2, no traceback
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    for args in ([po, pn, "--idle"], [po]):
        r = subprocess.run([sys.executable, tool, *args], capture_output=True, text=True)
        assert r.returncode == 2 and "usage:" in r.stderr and "Traceback" not in r.stderr


def test_identity_hash_tokens_never_escape_silently():
    """Property (hypothesis): for ANY Java-identifier-like token
    followed by '@'+hex in unquoted explain text, v3 normalization
    either strips the hex (capital-initial class names) or the
    residual guard reports it (lowercase/anon/array forms) — there is
    no silent third state where a per-process hex survives into the
    hash input unreported."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import bench

    ident = st.from_regex(r"[A-Za-z_$][A-Za-z0-9_.$;]{0,20}", fullmatch=True)
    hexs = st.from_regex(r"[0-9a-f]{6,16}", fullmatch=True)

    @given(tok=ident, hx=hexs, arr=st.booleans())
    @settings(max_examples=200, deadline=None)
    def check(tok, hx, arr):
        token = ("[L" + tok + ";" if arr else tok) + "@" + hx
        line = f"Project [x#1L]\nScan {token}\nFilter (y# > 2)"
        norm = bench._normalize_plan(line)
        residual = bench._residual_identity_hashes(norm)
        hex_survives = ("@" + hx) in norm
        if hex_survives:
            assert any(hx in r for r in residual), (token, norm, residual)
        else:
            assert not any(hx in r for r in residual), (token, norm, residual)

    check()


def test_label_row_consults_both_calibration_probes():
    """Mixed host window (serial probe −9%, 16-way +11% — the real
    r10-official → r11 pair): an improvement the SERIAL probe tracks
    must label host(calib) even though the max-magnitude probe points
    the other way; a breaker neither probe explains stays REAL."""
    bd = _load_bench_diff()
    lab = bd.label_row
    shifts = [-9.4, +10.9]
    assert lab("same", -16.0, 4.0, shifts, None) == "host(calib)"   # serial explains
    assert lab("same", +18.0, 4.0, shifts, None) == "host(calib)"   # 16-way explains
    assert lab("same", -60.0, 4.0, shifts, None) == "REAL"          # neither brackets
    # scalar input still accepted (backwards compat)
    assert lab("same", 30.0, 10.0, 28.0, None) == "host(calib)"
    # record_divergence: either probe same-sign explains the gap
    idle = {"value": 10.0, "host_calib_sec": 0.10, "host_calib_par_sec": 0.08}
    official = {"value": 11.5, "host_calib_sec": 0.091, "host_calib_par_sec": 0.088}
    # gap +15%, serial −9% (wrong sign), 16-way +10% (explains w/ floor)
    assert bd.record_divergence(official, idle) is None


def test_label_row_floors_a_zero_envelope():
    """ADVICE r11 #1: spread_pct rounds to 0.1, so two tying runs
    publish a 0.0 envelope — which is a measurement floor, not a real
    noise bound. Without the 1% floor, ANY nonzero same-plan delta on
    a quiet host became a breaker labeled REAL, flipping the exit code
    on pure jitter."""
    bd = _load_bench_diff()
    lab = bd.label_row
    # 0.0 envelope + sub-percent jitter on a quiet host: same, not REAL
    assert lab("same", 0.4, 0.0, None, None) == "same"
    assert lab("same", -0.9, 0.0, 0.1, None) == "same"
    # the floor is a floor, not a blanket pardon: a real move past it
    # on a quiet host still surfaces
    assert lab("same", 8.0, 0.0, None, None) == "REAL"
    # and a genuine envelope wider than the floor is untouched
    assert lab("same", 8.0, 10.0, None, None) == "noise"


def test_residual_guard_survives_unbalanced_apostrophes():
    """ADVICE r11 #3: the old blanket quote-strip let an unbalanced or
    embedded apostrophe pair with a LATER literal's opening quote and
    swallow a genuine residual identity-hash token between them — a
    silent false negative inside the guard. Spans are now
    value-anchored, so the stray mid-word apostrophe can't open one."""
    import bench

    tok = "functions$$anon$1@1a2b3c4d"
    # embedded apostrophe in the first literal, real token after it,
    # second literal after that: the token must still be reported
    line = f"Filter (name# = 'O'Brien') AND x Scan {tok} Filter (y# IN ('a','b'))"
    residual = bench._residual_identity_hashes(line)
    assert any("1a2b3c4d" in r for r in residual), residual
    # quoted plan literals are still excluded — in every anchored
    # position explain text puts them (= , ( [ and whitespace)
    for quoted in (
        "Filter (email# = 'user@deadbee')",
        "Filter (email# IN ('user@deadbee', 'x'))",
        "Filter (email# LIKE 'user@deadbee')",
    ):
        assert bench._residual_identity_hashes(quoted) == [], quoted
    # and a token in plain unquoted text keeps being reported
    assert bench._residual_identity_hashes(f"Scan {tok}") == [tok]


def test_bench_sidecar_write_is_idle_gated(monkeypatch):
    """VERDICT r11 ask #2: the committed BENCH_DETAIL.json is the
    canonical IDLE-HOST record; a run that doesn't declare itself the
    idle measurement (the driver's per-round window, ad-hoc probes)
    must land in BENCH_DETAIL_LAST.json instead — a round's commit can
    then never silently adopt driver-window numbers as the idle trend
    record (which is exactly what the r11 round commit did)."""
    import os

    import bench

    monkeypatch.delenv("SPARK_GRAFT_IDLE_RECORD", raising=False)
    assert os.path.basename(bench._sidecar_path()) == "BENCH_DETAIL_LAST.json"
    monkeypatch.setenv("SPARK_GRAFT_IDLE_RECORD", "0")
    assert os.path.basename(bench._sidecar_path()) == "BENCH_DETAIL_LAST.json"
    monkeypatch.setenv("SPARK_GRAFT_IDLE_RECORD", "1")
    assert os.path.basename(bench._sidecar_path()) == "BENCH_DETAIL.json"
    # both live next to bench.py, where the diff/replay tools look
    assert os.path.dirname(bench._sidecar_path()) == os.path.dirname(
        os.path.abspath(bench.__file__)
    )


def test_bench_diff_scale_mismatch_refuses(capsys, tmp_path):
    """Round 12: bench.py writes BENCH_DETAIL_LAST.json for ANY
    non-idle run — including an sf0.01 contract probe — and
    round_check.sh prefers that file as the NEW side when present. A
    cross-scale comparison is garbage in every row (a 10x data delta
    labeled host/REAL), so the diff must refuse it loudly (exit 2)
    instead of labeling it; same-sf and missing-sf records still
    compare."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff_sf", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    def run(old, new):
        po, pn = str(tmp_path / "sf_old.json"), str(tmp_path / "sf_new.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        code = bd.main(po, pn)
        return code, capsys.readouterr().out

    rec = {
        "plan_hashes": {"q_a": "aaa"},
        "queries": {"q_a": 1.0},
        "queries_stats": {"q_a": {"spread_pct": 10.0}},
        "value": 1.0,
        "plan_hash_rules": "v3",
    }
    code, out = run({**rec, "sf": 0.1}, {**rec, "sf": 0.01})
    assert code == 2 and "SCALE MISMATCH" in out
    assert "q_a" not in out  # refused BEFORE emitting any comparison row

    code, out = run({**rec, "sf": 0.1}, {**rec, "sf": 0.1})
    assert code == 0 and "SCALE MISMATCH" not in out

    # pre-r11 records carry no sf field: compare (status quo), don't refuse
    code, out = run(rec, {**rec, "sf": 0.1})
    assert code == 0 and "SCALE MISMATCH" not in out


# --------------------------------------------- r12 advice: bench gc


def test_time_runs_gc_list_stays_aligned_with_runs(monkeypatch):
    """ADVICE r12 #1: a transient py4j failure on ONE gc read used to
    shorten gc_ms, silently attributing the wrong run's GC wall to a
    timing. A failed read must record None in that run's slot so
    positional correspondence with runs[] is guaranteed."""
    import bench

    class _Sink:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self, *_):
            return None

    class _Frame:
        write = _Sink()

    reads = iter([100, 110, None, 170, 200, 260])  # run2's first read fails
    monkeypatch.setattr(bench, "_jvm_gc_ms", lambda _spark: next(reads))
    out = bench._time_runs(lambda *_: _Frame(), spark=None, sf_dir="x", runs=3)
    assert len(out["runs"]) == 3
    assert out["gc_ms"] == [10, None, 60]

    # every read failing → no gc_ms key at all (nothing to attribute)
    monkeypatch.setattr(bench, "_jvm_gc_ms", lambda _spark: None)
    out = bench._time_runs(lambda *_: _Frame(), spark=None, sf_dir="x", runs=2)
    assert "gc_ms" not in out


# ------------------------------------- r12 advice: idle-record scale


def test_bench_diff_refuses_idle_record_at_other_sf(capsys, tmp_path):
    """ADVICE r12 #2: the cross-scale refusal guarded only old-vs-new;
    an idle sidecar recorded at a different sf could still feed the
    official-vs-idle divergence check (canonical for trend) with a 10x
    data difference. Same refusal, exit 2."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff_idle", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    rec = {
        "plan_hashes": {"q_a": "aaa"},
        "queries": {"q_a": 1.0},
        "queries_stats": {"q_a": {"spread_pct": 50.0}},
        "value": 3.0,
        "sf": 0.1,
        "plan_hash_rules": "v3",
    }
    po, pn, pi = (str(tmp_path / f"{n}.json") for n in ("old", "new", "idle"))
    json.dump(rec, open(po, "w"))
    json.dump(rec, open(pn, "w"))

    idle = json.loads(json.dumps(rec))
    idle["sf"] = 0.01
    json.dump(idle, open(pi, "w"))
    code = bd.main(po, pn, pi)
    out = capsys.readouterr().out
    assert code == 2 and "SCALE MISMATCH" in out and "idle" in out

    # matching sf → the divergence check runs as before (agreement here)
    json.dump(rec, open(pi, "w"))
    code = bd.main(po, pn, pi)
    out = capsys.readouterr().out
    assert code == 0 and "agrees with the idle sidecar" in out


def test_committed_idle_record_is_at_official_scale_and_complete():
    """r13 artifact hygiene: the canonical idle sidecar is the trend
    baseline, so a committed BENCH_DETAIL.json must be (a) at the
    official sf (an SPARK_GRAFT_SF_DIR-override idle run would poison
    every trend read — the bench_diff sf guard only catches it at
    compare time) and (b) carrying the keys the round gate consumes."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    if not os.path.exists(path):  # fresh clone without a record
        return
    rec = json.load(open(path))
    assert rec.get("sf") == 0.1, f"idle record at sf={rec.get('sf')}, not the official 0.1"
    # from r14 on the canonical record must also carry the per-segment
    # steal keys — a record without them predates the instrument and
    # can't be vetted by tools/vet_idle_record.py
    for key in ("value", "sf1_total", "host_calib_sec", "host_calib_par_sec",
                "host_steal_pct_sf01", "host_steal_pct_sf1",
                "plan_hashes", "queries_stats", "plan_hash_rules"):
        assert key in rec, f"idle record missing gate key {key}"


def test_bench_diff_quarantined_base_relabels_improvements_only(capsys, tmp_path):
    """r13: an improvement flagged REAL against a record that DECLARES
    itself trend-quarantined (the r12 stall-contaminated idle sidecar)
    is a recovery toward the true floor and must not gate — but ONLY
    improvements, ONLY under the marker; slowdown-side REALs still
    exit 1, and without the marker the old behavior stands."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff_quar", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    def run(old, new):
        po, pn = str(tmp_path / "q_old.json"), str(tmp_path / "q_new.json")
        json.dump(old, open(po, "w"))
        json.dump(new, open(pn, "w"))
        code = bd.main(po, pn)
        return code, capsys.readouterr().out

    old = {
        "plan_hashes": {"q_a": "aaa", "q_b": "bbb"},
        "queries": {"q_a": 1.0, "q_b": 2.0},
        "queries_stats": {"q_a": {"spread_pct": 5.0}, "q_b": {"spread_pct": 5.0}},
        "value": 3.0,
        "sf": 0.1,
        "plan_hash_rules": "v3",
    }
    faster = json.loads(json.dumps(old))
    faster["queries"]["q_a"] = 0.5  # -50%: breaker, no calib/uniform cover

    # without the marker: improvement REAL gates (status quo)
    code, out = run(old, faster)
    assert code == 1 and "REAL breakers (1): q_a" in out

    # with the marker: relabeled recovered, non-gating, note printed
    quar = json.loads(json.dumps(old))
    quar["trend_quarantine"] = "stall-contaminated windows"
    code, out = run(quar, faster)
    assert code == 0
    assert "recovered" in out and "trend-quarantined" in out

    # slowdown-side REAL still gates even under the marker
    slower = json.loads(json.dumps(old))
    slower["queries"]["q_a"] = 2.0  # +100%
    code, out = run(quar, slower)
    assert code == 1 and "REAL breakers (1): q_a" in out


def test_bench_diff_prints_segment_steal_split(capsys, tmp_path):
    """r13: a throttle confined to one bench segment (the discarded
    first r13 idle window: sf1-only, 2.5x on iterative probes) is
    diluted by the whole-run steal average — when the new record
    carries per-segment steal, the diff must print the split."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_diff_seg", os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)

    rec = {
        "plan_hashes": {"q_a": "aaa"},
        "queries": {"q_a": 1.0},
        "queries_stats": {"q_a": {"spread_pct": 5.0}},
        "value": 1.0,
        "sf": 0.1,
        "plan_hash_rules": "v3",
    }
    new = json.loads(json.dumps(rec))
    new["host_steal_pct_sf01"] = 0.1
    new["host_steal_pct_sf1"] = 6.2
    po, pn = str(tmp_path / "s_old.json"), str(tmp_path / "s_new.json")
    json.dump(rec, open(po, "w"))
    json.dump(new, open(pn, "w"))
    code = bd.main(po, pn)
    out = capsys.readouterr().out
    assert code == 0
    assert "steal by segment: sf0.1 0.1%, sf1 6.2%" in out

    # absent keys → no segment line (old records stay quiet)
    json.dump(rec, open(pn, "w"))
    bd.main(po, pn)
    assert "steal by segment" not in capsys.readouterr().out


# --------------------------- r13 advice: segment-steal partial keys


def test_bench_diff_segment_steal_handles_missing_segment(capsys, tmp_path):
    """ADVICE r13 #1: the per-segment steal line printed both keys
    unconditionally, so a record whose sf1 snapshot failed (transient
    _cpu_times() error) rendered 'sf1 None%'. Present segments print
    their value; absent segments print '-'; no segments → no line."""
    import json

    bd = _load_bench_diff()
    base = {"plan_hashes": {"q": "h"}, "queries": {"q": 1.0}, "queries_stats": {},
            "value": 1.0, "plan_hash_rules": "v3"}
    po = str(tmp_path / "ss_old.json")
    json.dump(base, open(po, "w"))

    # only sf0.1 present → sf1 prints '-', never 'None'
    new = dict(base, host_steal_pct_sf01=0.3)
    pn = str(tmp_path / "ss_new1.json")
    json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "steal by segment: sf0.1 0.3%, sf1 -" in out
    assert "None" not in out

    # only sf1 present → sf0.1 prints '-'
    new = dict(base, host_steal_pct_sf1=1.2)
    pn = str(tmp_path / "ss_new2.json")
    json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "steal by segment: sf0.1 -, sf1 1.2%" in out
    assert "None" not in out

    # both present → both values, unchanged format
    new = dict(base, host_steal_pct_sf01=0.3, host_steal_pct_sf1=1.2)
    pn = str(tmp_path / "ss_new3.json")
    json.dump(new, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "steal by segment: sf0.1 0.3%, sf1 1.2%" in out

    # neither present → the line is omitted entirely
    pn = str(tmp_path / "ss_new4.json")
    json.dump(base, open(pn, "w"))
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "steal by segment" not in out


# ----------------------- r14: starved stream probe / idle-record vet


def test_stream_probe_refuses_zero_batches(spark):
    """A throttled host can leave the stream probe with zero completed
    micro-batches; 0.0 rows/s must surface as stream_error, never as a
    throughput measurement in the trend record. A near-zero window
    forces the starved path deterministically."""
    import pytest

    import bench

    with pytest.raises(RuntimeError, match="refusing to record 0.0"):
        bench._stream_probe(spark, seconds=0.01)


def test_vet_idle_record_acceptance_rules(tmp_path, capsys):
    """tools/vet_idle_record.py is the mechanical quiet-window gate:
    segment steal >= 0.5% rejects, a non-first run >2x min without a
    covering GC spike rejects, a GC-covered outlier does not, a
    missing/zero stream probe rejects, and a clean record accepts."""
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "vet_idle_record",
        os.path.join(os.path.dirname(__file__), "..", "tools", "vet_idle_record.py"),
    )
    vet_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vet_mod)

    clean = {
        "value": 12.0, "sf1_total": 24.0,
        "host_steal_pct_sf01": 0.06, "host_steal_pct_sf1": 0.1,
        "stream_rows_per_sec": 900000.0,
        "queries_stats": {
            "q": {"min": 1.0, "runs": [2.9, 1.0, 1.1], "gc_ms": [0, 0, 0]},
        },
    }
    ok, reasons, _ = vet_mod.vet(clean)
    assert ok, reasons  # first-run warm-up echo (2.9x) is allowed

    hot = dict(clean, host_steal_pct_sf1=1.2)
    ok, reasons, _ = vet_mod.vet(hot)
    assert not ok and any("host_steal_pct_sf1" in r for r in reasons)

    stall = json.loads(json.dumps(clean))
    stall["queries_stats"]["q"]["runs"] = [1.0, 3.5, 1.1]
    ok, reasons, _ = vet_mod.vet(stall)
    assert not ok and any("stall event" in r for r in reasons)

    # the same outlier covered by a GC spike is heap, not host
    gc_covered = json.loads(json.dumps(stall))
    gc_covered["queries_stats"]["q"]["gc_ms"] = [0, 1500, 0]
    ok, reasons, _ = vet_mod.vet(gc_covered)
    assert ok, reasons

    starved = dict(clean, stream_rows_per_sec=0.0)
    ok, reasons, _ = vet_mod.vet(starved)
    assert not ok and any("stream probe" in r for r in reasons)

    missing_seg = {k: v for k, v in clean.items() if k != "host_steal_pct_sf01"}
    ok, reasons, _ = vet_mod.vet(missing_seg)
    assert not ok and any("missing" in r for r in reasons)

    # CLI: reject exits 1 with reasons printed, accept exits 0
    p = tmp_path / "cand.json"
    p.write_text(json.dumps(clean))
    assert vet_mod.main(str(p)) == 0
    p.write_text(json.dumps(hot))
    assert vet_mod.main(str(p)) == 1
    out = capsys.readouterr().out
    assert "REJECT: host_steal_pct_sf1" in out


# --------------------------- r14: quiet-floor recovery labels


def _floor_fixture(tmp_path, old_tt=1.29, new_tt=1.09, floor_tt=1.11, floor_ref=True):
    """old/new/floor records with one sf1 row (text_tokens) whose old
    min sits above the floor; enough same-plan rows that nothing else
    breaks."""
    import json

    def rec(tt, spread=8.0):
        qs = {f"q{i}": 1.0 for i in range(12)}
        st = {n: {"spread_pct": 30.0, "runs": [1.0]} for n in qs}
        return {
            "plan_hashes": {n: "h" for n in qs},
            "queries": qs, "queries_stats": st,
            "sf1_queries": {"text_tokens": tt},
            "sf1_stats": {"text_tokens": {"spread_pct": spread, "runs": [tt]}},
            "value": 12.0, "sf1_total": 25.0, "sf": 0.1,
            "plan_hash_rules": "v3",
        }

    po, pn, pf = (str(tmp_path / f"{n}.json") for n in ("old", "new", "floor"))
    old = rec(old_tt)
    if floor_ref:
        old["floor_ref"] = "floor.json"
    json.dump(old, open(po, "w"))
    json.dump(rec(new_tt), open(pn, "w"))
    json.dump(rec(floor_tt, spread=9.9), open(pf, "w"))
    return po, pn, pf


def test_floor_ref_downgrades_completed_recovery(capsys, tmp_path):
    """r14: an improvement-side REAL whose old min sat above its quiet
    floor (beyond the floor's envelope) and whose new min lands at the
    floor is a recovery — non-gating 'recovered', exit 0. The floor
    rides the OLD record's floor_ref, so the plain round_check
    invocation picks it up."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path)
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "quiet-floor reference floor.json active" in out
    assert "recovered toward quiet floors (1): text_tokens" in out
    assert "REAL breakers" not in out


def test_floor_ref_never_touches_slowdowns(capsys, tmp_path):
    """Slowdown-side REALs still gate with a floor active."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path, old_tt=1.29, new_tt=2.6)
    assert bd.main(po, pn) == 1
    out = capsys.readouterr().out
    assert "REAL" in out


def test_floor_ref_undershoot_stays_real(capsys, tmp_path):
    """An 'improvement' landing >20% BELOW the quiet floor suggests a
    semantic change (wrong data size), not a recovery — stays REAL."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path, new_tt=0.40)
    assert bd.main(po, pn) == 1
    out = capsys.readouterr().out
    assert "REAL breakers" in out


def test_floor_ref_requires_headroom(capsys, tmp_path):
    """An old min already AT its quiet floor has no documented
    headroom — a big improvement from there is REAL, not recovery."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path, old_tt=1.11, new_tt=0.93)
    assert bd.main(po, pn) == 1


def test_no_floor_ref_keeps_old_behavior(capsys, tmp_path):
    """Without floor_ref (and no --floor), the r13 behavior stands:
    improvement REALs gate."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path, floor_ref=False)
    assert bd.main(po, pn) == 1
    # explicit --floor overrides the absence
    assert bd.main(po, pn, None, pf) == 0


# --------------------------- r15: ADVICE r14 fixes


def _load_vet():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "vet_idle_record",
        os.path.join(os.path.dirname(__file__), "..", "tools", "vet_idle_record.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _near_miss_record(**over):
    """A record clean everywhere except a 0.55% sf1 steal near-miss."""
    rec = {
        "value": 11.3, "sf1_total": 26.4,
        "host_steal_pct_sf01": 0.02, "host_steal_pct_sf1": 0.55,
        "stream_rows_per_sec": 886524.8,
        "vet_waiver": {
            "segment": "sf1",
            "steal_pct": 0.55,
            "reason": "ambient floor",
            "cross_validated_by": [
                {"window": "w8", "steal_pct": 0.20, "total_sec": 27.77},
                {"window": "w4", "steal_pct": 0.54, "total_sec": 27.57},
            ],
        },
    }
    rec.update(over)
    return rec


def test_vet_waiver_accepts_validated_near_miss(capsys, tmp_path):
    """ADVICE r14 (medium): an explicit machine-readable waiver turns a
    steal near-miss into a printed WAIVED line — vet exits 0 — but only
    after mechanical validation (clean cross-window whose total the
    record does not exceed by >5%)."""
    import json

    vet_mod = _load_vet()
    ok, reasons, waived = vet_mod.vet(_near_miss_record())
    assert ok and not reasons
    assert len(waived) == 1 and "WAIVED" in waived[0] and "w8" in waived[0]

    p = tmp_path / "waived.json"
    p.write_text(json.dumps(_near_miss_record()))
    assert vet_mod.main(str(p)) == 0
    out = capsys.readouterr().out
    assert "WAIVED: host_steal_pct_sf1" in out and "VERDICT: ACCEPT" in out


def test_vet_waiver_rejects_without_cross_validation():
    """A waiver lacking cross_validated_by entries is itself a REJECT
    reason (the VERDICT r14 acceptance criterion)."""
    vet_mod = _load_vet()
    rec = _near_miss_record()
    rec["vet_waiver"]["cross_validated_by"] = []
    ok, reasons, waived = vet_mod.vet(rec)
    assert not ok and not waived
    assert any("lacks cross_validated_by" in r for r in reasons)

    rec = _near_miss_record()
    del rec["vet_waiver"]["cross_validated_by"]
    ok, reasons, _ = vet_mod.vet(rec)
    assert not ok and any("lacks cross_validated_by" in r for r in reasons)


def test_vet_waiver_never_covers_a_worse_record():
    """A waiver written for 0.55% does not blanket-cover a later record
    measuring more; nor does any waiver cover >= 1.0% (contamination,
    not a near-miss); nor one whose only cross-windows are dirty or
    slower-validating."""
    vet_mod = _load_vet()

    worse = _near_miss_record(host_steal_pct_sf1=0.8)
    ok, reasons, _ = vet_mod.vet(worse)
    assert not ok and any("never covers a worse record" in r for r in reasons)

    hot = _near_miss_record(host_steal_pct_sf1=1.3)
    hot["vet_waiver"]["steal_pct"] = 1.3
    ok, reasons, _ = vet_mod.vet(hot)
    assert not ok and any("cap" in r for r in reasons)

    # only dirty cross-windows → invalid
    dirty = _near_miss_record()
    dirty["vet_waiver"]["cross_validated_by"] = [
        {"window": "w4", "steal_pct": 0.54, "total_sec": 27.57},
    ]
    ok, reasons, _ = vet_mod.vet(dirty)
    assert not ok and any("no cross-validation entry" in r for r in reasons)

    # clean window but the record's floor is >5% faster than it could
    # validate — steal may have deflated/inflated something; reject
    inflated = _near_miss_record(sf1_total=29.5)
    ok, reasons, _ = vet_mod.vet(inflated)
    assert not ok and any("no cross-validation entry" in r for r in reasons)

    # entries must be independently checkable dicts
    vague = _near_miss_record()
    vague["vet_waiver"]["cross_validated_by"] = ["w8"]
    ok, reasons, _ = vet_mod.vet(vague)
    assert not ok and any("must be dicts" in r for r in reasons)


def test_vet_waiver_ignored_for_other_segment():
    """An sf1 waiver says nothing about an sf0.1 breach — the plain
    threshold reason stands."""
    vet_mod = _load_vet()
    rec = _near_miss_record(host_steal_pct_sf01=0.7)
    ok, reasons, waived = vet_mod.vet(rec)
    assert not ok
    assert any("host_steal_pct_sf01 = 0.7%" in r for r in reasons)
    assert len(waived) == 1  # the sf1 near-miss is still waived


def test_committed_record_passes_vet_or_carries_waiver():
    """The committed canonical record and its own acceptance tool must
    not disagree (ADVICE r14 medium): BENCH_DETAIL.json passes vet —
    outright or through a validated explicit waiver."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    vet_mod = _load_vet()
    ok, reasons, waived = vet_mod.vet(json.load(open(path)))
    assert ok, f"committed record REJECTs under its own vet tool: {reasons}"


def test_vet_distinguishes_skipped_probe_from_starved():
    """ADVICE r14 (low): a record where the stream probe never ran
    (both keys absent — SPARK_GRAFT_NO_SCALE=1 / non-default sf dir)
    rejects with a 'not run' reason; a starved/errored probe rejects
    with a 'starved' reason — the rejection trail says which."""
    vet_mod = _load_vet()

    skipped = _near_miss_record()
    del skipped["stream_rows_per_sec"]
    ok, reasons, _ = vet_mod.vet(skipped)
    assert not ok
    assert any("not run" in r and "SPARK_GRAFT_NO_SCALE" in r for r in reasons)
    assert not any("starved" in r for r in reasons)

    starved = _near_miss_record()
    del starved["stream_rows_per_sec"]
    starved["stream_error"] = "RuntimeError: refusing to record 0.0 rows/s"
    ok, reasons, _ = vet_mod.vet(starved)
    assert not ok
    assert any("starved/errored" in r for r in reasons)
    assert not any("not run" in r for r in reasons)

    zero = _near_miss_record(stream_rows_per_sec=0.0)
    ok, reasons, _ = vet_mod.vet(zero)
    assert not ok and any("starved/errored" in r for r in reasons)


def test_floor_ref_corrupt_json_takes_ignore_path(capsys, tmp_path):
    """ADVICE r14 (low): a floor_ref pointing at an existing-but-corrupt
    JSON file takes the documented 'unreadable — ignored' fallback
    instead of crashing bench_diff with JSONDecodeError."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path)
    with open(pf, "w") as f:
        f.write("{not json")
    # floor unusable → the improvement REAL is NOT downgraded: exit 1
    assert bd.main(po, pn) == 1
    out = capsys.readouterr().out
    assert "unreadable" in out and "ignored" in out


def test_floor_ref_undershoot_bound_is_the_floor_envelope(capsys, tmp_path):
    """ADVICE r14 (low): the recovery downgrade's sanity bound is the
    floor's OWN envelope, not a blanket 20% — a new min 14% below the
    best quiet floor (floor 1.11, envelope 9.9%) stays REAL even though
    the old 0.8*floor bound would have downgraded it."""
    bd = _load_bench_diff()
    po, pn, pf = _floor_fixture(tmp_path, new_tt=0.95)
    assert bd.main(po, pn) == 1
    out = capsys.readouterr().out
    assert "REAL breakers" in out

    # within the floor's envelope (1.11 * (1-0.099) = 1.0001) → recovered
    po, pn, pf = _floor_fixture(tmp_path, new_tt=1.01)
    assert bd.main(po, pn) == 0
    out = capsys.readouterr().out
    assert "recovered toward quiet floors (1): text_tokens" in out


def test_graph_probes_get_five_sf1_runs():
    """VERDICT r14 ask #5: q_kcore (±30-46% sf1 envelope, the noisiest
    trend cell) and q_pagerank run min-of-5 at sf1 so a single stall
    can't cover the sample; sf0.1 stays min-of-3 (stable floor)."""
    import bench

    assert bench._EXT_SF1_MIN5 == {"q_pagerank", "q_kcore"}

    def sched(name, sf1):
        if sf1:
            return (
                5
                if name in bench._EXT_MIN5 or name in bench._EXT_SF1_MIN5
                else 3
                if name in bench._EXT_MIN3
                else 2
            )
        return 5 if name in bench._EXT_MIN5 else 3 if name in bench._EXT_MIN3 else 2

    assert sched("q_kcore", sf1=True) == 5
    assert sched("q_pagerank", sf1=True) == 5
    assert sched("q_kcore", sf1=False) == 3
    assert sched("q_pagerank", sf1=False) == 3
    assert sched("bpe_train_scale", sf1=True) == 5
    assert sched("pipeline_web_prep", sf1=True) == 2


def _load_hunt_mod():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "hunt_idle_record",
        os.path.join(os.path.dirname(__file__), "..", "tools", "hunt_idle_record.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hunt_launches_only_after_two_consecutive_quiet_probes():
    """Round-15 window-2 lesson, part 1: the pre-launch gate. A noisy
    probe RESETS the quiet streak — quiet/noisy/quiet/quiet launches
    on probe 4, not probe 3."""
    hunt_mod = _load_hunt_mod()
    probes = iter([0.1, 0.9, 0.1, 0.1])
    probed, launched = [], []

    def probe():
        v = next(probes)
        probed.append(v)
        return v

    rc = hunt_mod.hunt(
        probe,
        launch=lambda w: launched.append(w) or 0,
        vet=lambda w: (0, "ACCEPT"),
        archive=lambda w, out: (_ for _ in ()).throw(AssertionError("no archive on accept")),
        restore=lambda: (_ for _ in ()).throw(AssertionError("no restore on accept")),
        clock=lambda: 0.0,
        budget_sec=3600,
        max_windows=3,
    )
    assert rc == 0
    assert probed == [0.1, 0.9, 0.1, 0.1]
    assert launched == [1]


def test_hunt_vets_after_the_run_and_retries_on_reject():
    """Round-15 window-2 lesson, part 2: a quiet pre-launch gate does
    NOT validate the record — the produced sidecar is vetted, a REJECT
    is archived, the committed record restored, and the hunt continues
    to the next window."""
    hunt_mod = _load_hunt_mod()
    events = []
    verdicts = iter([(1, "REJECT: steal"), (0, "ACCEPT")])

    rc = hunt_mod.hunt(
        probe=lambda: 0.0,
        launch=lambda w: events.append(("launch", w)) or 0,
        vet=lambda w: next(verdicts),
        archive=lambda w, out: events.append(("archive", w, out)),
        restore=lambda: events.append(("restore",)),
        clock=lambda: 0.0,
        budget_sec=3600,
        max_windows=5,
        start_window=3,
    )
    assert rc == 0
    assert events == [
        ("launch", 3),
        ("archive", 3, "REJECT: steal"),
        ("restore",),
        ("launch", 4),
    ]


def test_hunt_crashed_bench_never_accepts_even_if_vet_passes():
    """A crashed bench can leave the PREVIOUS (committed, vettable)
    sidecar in place — bench exit != 0 must reject regardless of the
    vet verdict, or a stale record gets re-committed as fresh."""
    hunt_mod = _load_hunt_mod()
    restored = []

    rc = hunt_mod.hunt(
        probe=lambda: 0.0,
        launch=lambda w: 1,
        vet=lambda w: (0, "ACCEPT"),
        archive=lambda w, out: None,
        restore=lambda: restored.append(w := True),
        clock=lambda: 0.0,
        budget_sec=3600,
        max_windows=2,
    )
    assert rc == 3
    assert len(restored) == 2


def test_hunt_budget_and_window_exhaustion_exit_codes():
    """Probing past the budget exits 2; burning every window without
    an ACCEPT exits 3 (the caller's trail knows which happened)."""
    hunt_mod = _load_hunt_mod()
    t = iter([0.0, 10.0, 7200.0])
    rc = hunt_mod.hunt(
        probe=lambda: 5.0,  # never quiet
        launch=lambda w: 0,
        vet=lambda w: (0, "ACCEPT"),
        archive=lambda w, out: None,
        restore=lambda: None,
        clock=lambda: next(t),
        budget_sec=3600,
        max_windows=2,
    )
    assert rc == 2

    rc = hunt_mod.hunt(
        probe=lambda: 0.0,
        launch=lambda w: 0,
        vet=lambda w: (1, "REJECT"),
        archive=lambda w, out: None,
        restore=lambda: None,
        clock=lambda: 0.0,
        budget_sec=3600,
        max_windows=2,
    )
    assert rc == 3


def test_waiting_supplier_no_null_shipdate_assumption(spark, sf_dir, sf_smoke):
    """r16 (VERDICT r15 #3): q_waiting_supplier's shared-base
    isnotnull(l_shipdate) filter (and the decorrelation's
    `other_max <= l_shipdate` probe) assume the driver schema's
    l_shipdate is never NULL — on null-bearing data the rewrite and
    the EXISTS oracle diverge (the filter shrinks n_supp for sibling
    suppliers; the probe drops rows the oracle counts). Keep the
    filter (dropping it costs the single ReusedExchange: lineitem
    would shuffle twice) and fail LOUDLY here if the testdata ever
    grows null shipdates or null fact keys."""
    from pyspark.sql import functions as F

    from rabbit_data_pipeline_spark.session import load_tables

    for d in (sf_smoke, sf_dir):
        li = load_tables(spark, d, ("lineitem",))["lineitem"]
        nulls = li.filter(
            F.col("l_shipdate").isNull()
            | F.col("l_orderkey").isNull()
            | F.col("l_suppkey").isNull()
        ).count()
        assert nulls == 0, (
            f"{d}: {nulls} lineitem rows with NULL shipdate/keys — "
            "q_waiting_supplier's decorrelation no longer matches its "
            "EXISTS oracle on this data; revisit tpch2.py before trusting it"
        )
