"""Pipeline specification: YAML/JSON/dict task config → node DAG.

Mirrors the reference's task-config surface (reference README.md
"任务配置"/"通用配置", src/Scheduler.php:114-152 getTarget): each node
has ``type`` (plugin), ``start`` (source flag), ``output`` (downstream
node names, fan-out), plus plugin-specific config. Extensions over the
reference: ``inputs`` (multi-input nodes → joins/unions, which the
reference cannot express) and ``on_error`` (its per-plugin errHandler,
reduced to declarative policies).

Unlike the reference — which pushes each Message through plugins one
coroutine hop at a time — a parsed spec compiles into ONE lazy
DataFrame plan per sink (scheduler.py), so Catalyst optimizes across
plugin boundaries: a filter declared in a late node still pushes down
into the source scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml

VALID_ON_ERROR = ("fail", "skip")


@dataclass
class NodeSpec:
    name: str
    type: str
    config: dict[str, Any] = field(default_factory=dict)
    output: list[str] = field(default_factory=list)
    inputs: list[str] = field(default_factory=list)
    start: bool = False
    on_error: str = "fail"
    # reference: 'cron' (crontab | int seconds | -1 once) at task level;
    # kept per-task in PipelineSpec.

    def __post_init__(self) -> None:
        if self.on_error not in VALID_ON_ERROR:
            raise ValueError(f"node {self.name}: on_error must be one of {VALID_ON_ERROR}")


@dataclass
class PipelineSpec:
    name: str
    nodes: dict[str, NodeSpec]
    cron: str | int | None = None  # reference Scheduler cron semantics
    lock: float | None = None  # reference single-flight lock (seconds)

    @classmethod
    def from_dict(cls, name: str, cfg: dict[str, Any]) -> PipelineSpec:
        cron = cfg.get("cron")
        lock = cfg.get("lock")
        nodes: dict[str, NodeSpec] = {}
        for key, raw in cfg.items():
            if key in ("cron", "lock", "singleton"):
                continue
            if not isinstance(raw, dict) or "type" not in raw:
                raise ValueError(f"task {name}: node {key} needs a 'type'")
            raw = dict(raw)
            ntype = raw.pop("type")
            output = raw.pop("output", [])
            if isinstance(output, str):
                output = [output]
            elif isinstance(output, dict):  # reference {'node': wait} form
                output = list(output.keys())
            inputs = raw.pop("inputs", [])
            if isinstance(inputs, str):
                inputs = [inputs]
            start = bool(raw.pop("start", False))
            on_error = raw.pop("on_error", raw.pop("errHandler", "fail"))
            if not isinstance(on_error, str):
                on_error = "fail"
            nodes[key] = NodeSpec(
                name=key, type=ntype, config=raw, output=output, inputs=inputs, start=start, on_error=on_error
            )
        spec = cls(name=name, nodes=nodes, cron=cron, lock=lock)
        spec.validate()
        return spec

    @classmethod
    def from_yaml(cls, text_or_path: str) -> dict[str, PipelineSpec]:
        """Parse a config of one or more tasks (reference YamlParser.php)."""
        import os

        if os.path.exists(text_or_path):
            with open(text_or_path) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(text_or_path)
        return {name: cls.from_dict(name, cfg) for name, cfg in data.items()}

    def validate(self) -> None:
        for node in self.nodes.values():
            for out in node.output:
                if out.count(":") == 2:
                    # Reference sender routing (Scheduler.php:171-177
                    # `next()` splits output on ':' into
                    # [sender, address, target] and dispatches the
                    # Message to another process/host via Senders/
                    # HttpSender|ProcessSender|WorkerSender). N/A here
                    # by design — Spark executors ARE the remote
                    # dispatch — so reject the syntax loudly instead of
                    # failing with a generic unknown-node error when a
                    # reference config is ported verbatim.
                    sender = out.split(":", 1)[0]
                    raise ValueError(
                        f"task {self.name}: node {node.name} routes output through "
                        f"sender '{sender}' ({out!r}); Senders (http/process/worker "
                        "remote dispatch) are N/A under Spark — executors are the "
                        "distribution. Point 'output' at a node name in this task."
                    )
                if out not in self.nodes:
                    raise ValueError(f"task {self.name}: node {node.name} outputs to unknown node {out}")
            for inp in node.inputs:
                if inp not in self.nodes:
                    raise ValueError(f"task {self.name}: node {node.name} reads unknown input {inp}")
        if not any(n.start for n in self.nodes.values()):
            raise ValueError(f"task {self.name}: no start node (reference requires start: true)")
        self._check_acyclic()

    def upstream_of(self, name: str) -> list[str]:
        """Parents of a node: explicit `inputs` + any node whose `output` lists it."""
        parents = list(self.nodes[name].inputs)
        for other in self.nodes.values():
            if name in other.output and other.name not in parents:
                parents.append(other.name)
        return parents

    def sinks(self) -> list[str]:
        """Terminal nodes (no declared output)."""
        return [n.name for n in self.nodes.values() if not n.output]

    def _check_acyclic(self) -> None:
        seen: dict[str, int] = {}

        def visit(n: str, stack: tuple[str, ...]) -> None:
            if n in stack:
                raise ValueError(f"task {self.name}: cycle at {n}")
            if seen.get(n):
                return
            seen[n] = 1
            for p in self.upstream_of(n):
                visit(p, stack + (n,))

        for n in self.nodes:
            visit(n, ())
