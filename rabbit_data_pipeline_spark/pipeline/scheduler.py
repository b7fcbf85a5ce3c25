"""Scheduler: compile a PipelineSpec into lazy DataFrame plans and run
them.

Reference parity (src/Scheduler.php):
- ``run(task)``        → build + execute every sink of one task      (:37)
- ``run(task, node)``  → execute a single node subtree ("proxy run") (:42)
- ``multi([tasks])``   → run several tasks                           (:63)
- cron/interval/once   → ``triggers.parse_trigger``                  (:72-112)
- single-flight lock   → ``locks.task_lock``                         (:101)
- per-plugin errHandler → NodeSpec.on_error ("fail"/"skip")          (AbstractPlugin.php:94)

The execution model is deliberately different from the reference: it
walks plugins per-Message at runtime; we resolve the DAG once into a
DataFrame expression tree, hand the WHOLE tree to Catalyst, and only
then execute. Fan-out (one node feeding N downstreams) costs nothing
at plan time; if a branch point is expensive and feeds 2+ sinks the
node can declare ``cache: true`` to persist the intermediate.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from rabbit_data_pipeline_spark.pipeline.locks import task_lock
from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

# Plugin signature: (scheduler, node_config, inputs) -> DataFrame | None.
# Sources take no inputs; transforms take 1+; sinks usually return None
# (side effect) or a DataFrame to expose as a task result.
Plugin = Callable[["Scheduler", dict[str, Any], list[DataFrame]], DataFrame | None]

_PLUGINS: dict[str, Plugin] = {}


def plugin(name: str):
    """Register a plugin type (reference: '插件开发' — subclass
    AbstractPlugin + implement run; here: a pure function)."""

    def deco(fn: Plugin) -> Plugin:
        _PLUGINS[name] = fn
        return fn

    return deco


def plugins() -> dict[str, Plugin]:
    # Importing registers the built-in plugin set.
    from rabbit_data_pipeline_spark import sinks, sources  # noqa: F401
    from rabbit_data_pipeline_spark.operators import line_parser, llm_plugins, xml  # noqa: F401
    from rabbit_data_pipeline_spark.pipeline import builtin_plugins  # noqa: F401
    from rabbit_data_pipeline_spark.streaming import plugins as _streaming_plugins  # noqa: F401

    return dict(_PLUGINS)


class SkippedNode(Exception):
    """Raised internally when an on_error=skip node failed."""


class Scheduler:
    def __init__(self, spark: SparkSession, specs: dict[str, PipelineSpec], variables: dict | None = None):
        self.spark = spark
        self.specs = specs
        self.variables = variables or {}
        self._registry = plugins()
        self._built: dict[tuple, DataFrame | None] = {}
        self._active_vars: dict = dict(self.variables)

    @classmethod
    def from_yaml(cls, spark: SparkSession, text_or_path: str, variables: dict | None = None) -> Scheduler:
        return cls(spark, PipelineSpec.from_yaml(text_or_path), variables)

    # -- reference Scheduler::run / multi ---------------------------------
    def run(
        self, task: str, target: str | None = None, variables: dict | None = None
    ) -> dict[str, DataFrame | None]:
        if task not in self.specs:
            raise KeyError(f"No such task {task}")
        spec = self.specs[task]
        # Per-run variables override the scheduler-level defaults; the
        # merged set substitutes ${name} placeholders in node configs.
        # Restored in the finally so a later build()/plugin-triggered
        # _build resolves ${name} against the scheduler DEFAULTS, not
        # whatever the last run happened to bind.
        self._active_vars = {**self.variables, **(variables or {})}
        try:
            with task_lock(task, timeout=spec.lock):
                names = [target] if target else spec.sinks()
                out: dict[str, DataFrame | None] = {}
                for name in names:
                    try:
                        out[name] = self._build(spec, name)
                    except SkippedNode:
                        out[name] = None
                return out
        finally:
            self._active_vars = dict(self.variables)

    def multi(self, tasks: list[str]) -> dict[str, dict[str, DataFrame | None]]:
        return {t: self.run(t) for t in tasks}

    def backfill(self, task: str, runs: list[dict]) -> list[dict[str, DataFrame | None]]:
        """Run `task` once per variable binding — the batch complement
        of cron triggers (re-process historical partitions by passing
        e.g. [{'date': d} for d in dates]). Each run re-resolves
        ${name} placeholders, and the plan memo is keyed by the
        binding, so runs don't serve each other stale plans. After
        each binding its memo entries are evicted and its `cache: true`
        plans unpersisted — a long backfill over many bindings must not
        grow driver memo + executor storage without bound (returned
        DataFrames stay valid: unpersist just means lazy recompute)."""
        out: list[dict[str, DataFrame | None]] = []
        for v in runs:
            out.append(self.run(task, variables=v))
            self._evict_binding({**self.variables, **(v or {})})
        return out

    def _evict_binding(self, binding: dict) -> None:
        """Drop memo entries for one variable binding and unpersist any
        cached plans built under it."""
        var_key = tuple(sorted(binding.items()))
        for key in [k for k in self._built if k[2] == var_key]:
            df = self._built.pop(key)
            if df is not None and df.is_cached:
                df.unpersist()

    def _subst(self, v):
        if isinstance(v, str):
            for k, val in self._active_vars.items():
                v = v.replace("${" + k + "}", str(val))
            return v
        if isinstance(v, list):
            return [self._subst(x) for x in v]
        if isinstance(v, dict):
            return {k: self._subst(x) for k, x in v.items()}
        return v

    def build(self, task: str, node: str) -> DataFrame:
        """Return the lazy plan at `node` without executing any sink."""
        df = self._build(self.specs[task], node)
        if df is None:
            raise ValueError(f"{task}.{node} produced no DataFrame")
        return df

    # -- DAG resolution -----------------------------------------------------
    def _build(self, spec: PipelineSpec, name: str) -> DataFrame | None:
        # Memo key includes the variable binding: two backfill runs of
        # the same node with different ${date}s are different plans.
        var_key = tuple(sorted(getattr(self, "_active_vars", {}).items()))
        key = (spec.name, name, var_key)
        if key in self._built:
            return self._built[key]
        node = spec.nodes[name]
        fn = self._registry.get(node.type)
        if fn is None:
            raise KeyError(f"unknown plugin type '{node.type}' in {spec.name}.{name}")
        inputs: list[DataFrame] = []
        for parent in spec.upstream_of(name):
            parent_df = self._build(spec, parent)
            if parent_df is not None:
                inputs.append(parent_df)
        resolved = self._subst(dict(node.config)) if getattr(self, "_active_vars", None) else dict(node.config)
        cfg = {**resolved, "_task": spec.name, "_node": name}
        try:
            df = fn(self, cfg, inputs)
        except SkippedNode:
            raise
        except Exception as exc:
            if resolved.get("alarm"):
                self._alarm(resolved["alarm"], spec.name, name, exc)
            if node.on_error == "skip":
                raise SkippedNode(name) from None
            raise
        # Reference canEmpty parity (AbstractPlugin.php:43-50: empty
        # data + canEmpty=false -> don't sink downstream). Spark's
        # empty DataFrames flow through composed lazy plans at zero
        # cost, so this is OPT-IN here: setting `can_empty: false`
        # probes the node's output (one limit-1 job — a deliberate
        # materialization barrier) and skips everything downstream
        # when it's empty — for sinks with side effects that must not
        # fire on no data.
        if df is not None and resolved.get("can_empty") is False and df.isEmpty():
            raise SkippedNode(name)
        if df is not None and resolved.get("cache"):
            # Branch point feeding multiple sinks: persist once.
            df = df.cache()
        if df is not None and resolved.get("cache_ttl"):
            # Fingerprint the RESOLVED config so different bindings
            # don't serve each other's materializations.
            df = self._ttl_cache(df, spec.name, name, resolved, float(resolved["cache_ttl"]))
        self._built[key] = df
        return df

    @staticmethod
    def _alarm(path: str, task: str, node: str, exc: Exception) -> None:
        """Reference alarm parity (AbstractPlugin::$alarm): append a
        JSON-line failure record to the alarm log — the hook a
        deployment points at its paging/webhook relay."""
        import json
        import time

        with open(path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "task": task,
                        "node": node,
                        "error": f"{type(exc).__name__}: {exc}"[:500],
                        "ts": time.time(),
                    }
                )
                + "\n"
            )

    def _ttl_cache(self, df: DataFrame, task: str, node: str, config: dict, ttl: float) -> DataFrame:
        """Reference parity: Sources/Pdo.php caches query results for
        `duration` seconds (Pdo.php:100 ``->cache($this->duration,…)``).
        Spark twin: materialize the node's output as parquet under a
        staging dir keyed by (task, node, CONFIG FINGERPRINT) and serve
        it from there while the materialization is younger than `ttl`
        seconds — repeated Scheduler runs (the cron/interval loop) skip
        recomputation AND downstream reads get parquet scan speed +
        pushdown instead of re-running the subplan. The fingerprint
        covers the node's own config (sql/path/options…), so editing
        the node invalidates instead of serving stale rows; upstream
        DATA changes within the ttl are served stale by design — that
        is what a ttl means (reference semantics). The swap writes to a
        unique tmp dir and os.replace's into place, so a reader never
        opens a half-written cache; a reader that grabbed the previous
        materialization may see its files vanish mid-job (bounded by
        the swap window — same exposure as the reference's cache
        replacement). The key includes the user so shared /tmp hosts
        don't collide."""
        import getpass
        import hashlib
        import os
        import shutil
        import tempfile
        import time
        import uuid

        fp = hashlib.md5(
            repr(sorted((k, repr(v)) for k, v in config.items() if not k.startswith("_"))).encode()
        ).hexdigest()[:16]
        root = os.path.join(tempfile.gettempdir(), f"rdps_node_cache_{getpass.getuser()}")
        base = os.path.join(root, task, f"{node}.{fp}")
        marker = os.path.join(base, "_CACHED_AT")
        if os.path.exists(marker):
            age = time.time() - float(open(marker).read())
            if age < ttl:
                return self.spark.read.parquet(os.path.join(base, "data"))
        run_id = uuid.uuid4().hex
        tmp = f"{base}.tmp.{run_id}"
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        with open(os.path.join(tmp, "_CACHED_AT"), "w") as f:
            f.write(str(time.time()))
        old = f"{base}.old.{run_id}"  # unique per run — a crashed run's leftover can't collide
        if os.path.exists(base):
            os.replace(base, old)
        os.replace(tmp, base)
        shutil.rmtree(old, ignore_errors=True)
        return self.spark.read.parquet(os.path.join(base, "data"))
