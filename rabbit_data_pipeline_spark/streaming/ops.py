"""Streaming operators over the canonical message stream.

The reference (src/AbstractPlugin.php run/sink loop) processes one
message per coroutine callback and keeps any cross-message state in
plugin instance fields — single-process, lost on restart. Structured
Streaming gives the same logical operations as incremental queries
over an unbounded table, with checkpointed fault-tolerant state:

- `windowed_agg`     — tumbling/sliding event-time windows + watermark
                       (late data beyond the watermark is dropped by
                       the engine, not by user code).
- `session_window_agg` — gap-based sessions via the built-in
                       `session_window` (JVM-side state store).
- `stream_dedup`     — exactly-once-per-key within the watermark via
                       `dropDuplicatesWithinWatermark` (bounded state).
- `sessionize_stateful` — the custom-stateful escape hatch:
                       `applyInPandasWithState` with explicit timeout
                       handling, for semantics the built-ins can't
                       express (per-session custom merge rules).

All ops take/return streaming DataFrames; callers pick the sink and
trigger (sinks/stream.py, pipeline/triggers.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def parse_json_messages(stream: DataFrame, value_schema, ts_col: str = "ts") -> DataFrame:
    """Explode the canonical (key,value,topic,ts) message stream's JSON
    `value` into typed columns (reference Transforms/LineParser.php is
    the batch analogue). Keeps event time as `ts`."""
    return stream.select(
        "key",
        "topic",
        F.col(ts_col).alias("ts"),
        F.from_json("value", value_schema).alias("v"),
    ).select("key", "topic", "ts", "v.*")


def windowed_agg(
    stream: DataFrame,
    group_cols: list[str],
    aggs: list,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling (or sliding, if `slide`) window aggregation.

    Late rows older than `watermark` behind the max seen event time are
    dropped by the engine and their windows finalized — bounded state
    regardless of stream length, which is what makes this run forever
    on a cluster."""
    wm = stream.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(F.col(ts_col), window_duration)
    return (
        wm.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            *[c for c in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: list) -> list[str]:
    # Column metadata isn't exposed pre-analysis; rely on the alias the
    # caller set (enforced: unaliased aggs raise at select time).
    names = []
    for c in aggs:
        s = c._jc.toString() if hasattr(c, "_jc") else str(c)
        names.append(s.split(" AS ")[-1].strip("`") if " AS " in s else s)
    return names


def session_window_agg(
    stream: DataFrame,
    key_cols: list[str],
    aggs: list,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization with the built-in `session_window` —
    sessions close when no event arrives for `gap`. State lives in the
    JVM state store; watermark bounds it."""
    wm = stream.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *[F.col(c) for c in key_cols])
        .agg(*aggs)
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            *key_cols,
            *[c for c in _agg_names(aggs)],
        )
    )


def stream_dedup(stream: DataFrame, key_cols: list[str], watermark: str = "10 minutes", ts_col: str = "ts") -> DataFrame:
    """Drop duplicate messages by key within the watermark horizon —
    the streaming twin of operators/dedup.dedup_exact. State is bounded
    by the watermark (keys older than it are evicted), so this holds on
    an unbounded stream; exact global dedup belongs to the batch op."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: pairs with ``left_ts <= right_ts <
    left_ts + upper`` per key — the streaming twin of
    operators/joins.interval_join.

    The range condition lives INSIDE the join condition (not a
    post-filter) — that is what lets Spark derive the state-eviction
    bound: left rows are dropped from the join state once the right
    watermark passes ``left_ts + upper``, so state stays
    O(rate × (watermark + upper)) on an unbounded stream. Both sides
    must carry a watermark; timestamps and non-key columns must be
    disjoint."""
    l, r = left.withWatermark(left_ts, watermark).alias("l"), right.withWatermark(right_ts, watermark).alias("r")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    keep = [F.col(f"l.{k}") for k in on]
    keep += [F.col(f"l.{c}") for c in left.columns if c not in on]
    keep += [F.col(f"r.{c}") for c in right.columns if c not in on]
    return l.join(r, cond, "inner").select(*keep)


# ------------------------------------------------- custom stateful op

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", LongType()),
    ]
)


def _session_fn(gap_ms: int, event_time: bool = False):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [tot],
                }
            )
            return

        # ignore_index: each Arrow batch arrives with its own 0..n index,
        # so a plain concat has duplicate labels and any later label-based
        # .loc silently misaligns ts/value pairs. Re-index, then sort the
        # WHOLE frame so ts and value stay paired positionally.
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort", ignore_index=True)
        ts_ms = rows["ts"].astype("int64") // 1_000_000
        vals = rows["value"].fillna(0).astype("int64")
        if state.exists:
            start_ms, last_ms, n, tot = state.get
        else:
            start_ms, last_ms, n, tot = int(ts_ms.iloc[0]), int(ts_ms.iloc[0]), 0, 0

        closed = []
        for t, v in zip(ts_ms, vals):
            t = int(t)
            if n > 0 and t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n, tot))
                start_ms, n, tot = t, 0, 0
            last_ms = max(last_ms, t)
            n += 1
            tot += int(v)
        state.update((start_ms, last_ms, n, tot))
        # close the open session if the stream goes quiet for gap_ms
        if event_time:
            # fire when the WATERMARK passes session end + gap: late
            # events inside the gap still extend the session, and the
            # flush point is data-time, not wall-time.
            state.setTimeoutTimestamp(last_ms + gap_ms)
        else:
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in closed],
                    "n_events": [n_ for _, _, n_, _ in closed],
                    "total_value": [tv for _, _, _, tv in closed],
                }
            )

    return fn


def sessionize_stateful(
    stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout: str = "processing",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom gap sessionizer via `applyInPandasWithState` — the
    arbitrary-stateful path (reference plugins keep such state in PHP
    instance fields; here it's checkpointed per-key state with a
    timeout that flushes idle sessions).

    `timeout="processing"` flushes after gap_minutes of WALL time with
    no input for the key — simple, but wrong when the stream lags.
    `timeout="event"` registers the flush at `session_end + gap` in
    EVENT time: the session closes exactly when the watermark proves
    no in-gap event can still arrive, so replaying a backlog at 100×
    speed yields the identical session set (the property that matters
    for reprocessing at scale). Event mode watermarks `ts_col` with
    `watermark` slack.

    Use `session_window_agg` when plain gap semantics suffice — it
    stays JVM-side. This exists for custom per-session logic and as
    the template for other stateful ops. Arrow-batched; state is one
    tuple per active user, so memory is O(active keys)."""
    if timeout not in ("processing", "event"):
        raise ValueError(f"timeout must be processing|event, got {timeout!r}")
    typed = stream.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("long").alias("value"),
    )
    event = timeout == "event"
    if event:
        typed = typed.withWatermark("ts", watermark)
    return typed.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1000, event_time=event),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout if event else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------- stateful last-touch attribution

ATTRIBUTION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_id", LongType()),
        StructField("channel", StringType()),
        StructField("value_micro", LongType()),
    ]
)

_ATTR_STATE_SCHEMA = StructType(
    [
        StructField("touch_type", StringType()),
        StructField("touch_us", LongType()),
    ]
)


def _attribution_fn(lookback_us: int, touch_types: tuple, conv_type: str):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # total order (ts, kind, event_id): a touch at the same
        # microsecond as a purchase counts for it — identical to the
        # batch oracle's window ORDER BY ts, kind, event_id with a
        # 1-PRECEDING frame.
        rows["kind"] = (~rows["event_type"].isin(touch_types)).astype("int64")
        rows = rows.sort_values(["ts_us", "kind", "event_id"], kind="mergesort", ignore_index=True)
        touch_type, touch_us = state.get if state.exists else (None, -1)
        out_uid, out_pid, out_ch, out_val = [], [], [], []
        for et, t_us, eid, vmicro in zip(
            rows["event_type"], rows["ts_us"], rows["event_id"], rows["value_micro"]
        ):
            t_us = int(t_us)
            if et in touch_types:
                touch_type, touch_us = et, t_us
            elif et == conv_type:
                attributed = touch_type is not None and touch_us >= t_us - lookback_us
                out_uid.append(int(user_id))
                out_pid.append(int(eid))
                out_ch.append(touch_type if attributed else "none")
                out_val.append(int(vmicro))
        state.update((touch_type, touch_us))
        if out_uid:
            yield pd.DataFrame(
                {
                    "user_id": out_uid,
                    "purchase_id": out_pid,
                    "channel": out_ch,
                    "value_micro": out_val,
                }
            )

    return fn


def attribute_stateful(
    stream: DataFrame,
    lookback_days: int = 3,
    touch_types: tuple = ("click", "view"),
    conv_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming last-touch attribution via `applyInPandasWithState`:
    per-user state is ONE (touch_type, touch_ts) tuple — the carried
    value of the batch query's last-non-null window (queries/events.py
    q_attribution) — so memory is O(active users) regardless of
    history length, and each conversion is attributed the moment it
    arrives instead of in a nightly batch job.

    All arithmetic is integer microseconds (timestamps transported as
    epoch-µs, values as micro-units), so the availableNow replay of a
    backlog hashes bit-identically against the batch/DuckDB oracle.
    Cross-batch ordering note: within one micro-batch rows are
    totally ordered by (ts, kind, id); across micro-batches ordering
    follows arrival, the same contract every at-least-once broker
    gives — replays/backfills should use availableNow (one batch),
    the live path assumes per-user in-order delivery (keyed topics)."""
    typed = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col("event_type"),
        F.floor(F.col(value_col) * 1_000_000 + F.lit(0.5)).cast("long").alias("value_micro"),
    ).filter(F.col("event_type").isin(*touch_types, conv_type))
    return typed.groupBy("user_id").applyInPandasWithState(
        _attribution_fn(lookback_days * 86_400_000_000, tuple(touch_types), conv_type),
        outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
