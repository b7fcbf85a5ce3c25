"""Console entry point — parity with the reference's command-line task
runner (its Scheduler is invoked from console commands with a task
name and optional target plugin):

    python -m rabbit_data_pipeline_spark run pipeline.yaml            # all tasks
    python -m rabbit_data_pipeline_spark run pipeline.yaml -t mytask  # one task
    python -m rabbit_data_pipeline_spark run pipeline.yaml -t mytask -n somenode
    python -m rabbit_data_pipeline_spark list pipeline.yaml           # show DAGs
    python -m rabbit_data_pipeline_spark plugins                      # available node types

Batch sinks execute eagerly; streaming sinks start queries and the
runner awaits them (Ctrl-C stops gracefully).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rabbit_data_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run task(s) from a YAML spec")
    run_p.add_argument("spec")
    run_p.add_argument("-t", "--task", default=None)
    run_p.add_argument("-n", "--node", default=None, help="run a single node subtree (proxy run)")
    run_p.add_argument("--show", type=int, default=20, help="rows to display per result (0: silent)")
    run_p.add_argument(
        "--var",
        action="append",
        default=[],
        metavar="NAME=VALUE",
        help="bind a ${NAME} placeholder in node configs (repeatable)",
    )

    list_p = sub.add_parser("list", help="print task DAGs from a YAML spec")
    list_p.add_argument("spec")

    sub.add_parser("plugins", help="print registered plugin types")

    audit_p = sub.add_parser("audit", help="plan-quality pre-flight for a task's sinks")
    audit_p.add_argument("spec")
    audit_p.add_argument("-t", "--task", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "plugins":
        from rabbit_data_pipeline_spark.pipeline.scheduler import plugins

        for name in sorted(plugins()):
            print(name)
        return 0

    from rabbit_data_pipeline_spark.pipeline.spec import PipelineSpec

    specs = PipelineSpec.from_yaml(args.spec)

    if args.cmd == "list":
        for task, spec in specs.items():
            print(f"{task}:")
            for node in spec.nodes.values():
                outs = f" -> {', '.join(node.output)}" if node.output else ""
                print(f"  {node.name} [{node.type}]{outs}")
        return 0

    from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler
    from rabbit_data_pipeline_spark.session import get_spark

    spark = get_spark("rdps-cli")
    variables = dict(v.split("=", 1) for v in getattr(args, "var", []))
    sch = Scheduler(spark, specs, variables=variables)
    tasks = [args.task] if args.task else list(specs)

    if args.cmd == "audit":
        from dataclasses import asdict

        from rabbit_data_pipeline_spark.functions.planaudit import audit

        for task in tasks:
            for sink in specs[task].sinks():
                a = audit(sch.build(task, sink))
                print(f"== {task}.{sink}")
                for k, v in asdict(a).items():
                    if k != "warnings" and v:
                        print(f"  {k}: {v}")
                for w in a.warnings:
                    print(f"  WARNING: {w}")
        return 0
    for task in tasks:
        results = sch.run(task, target=args.node)
        for node, df in results.items():
            if df is not None and args.show:
                print(f"== {task}.{node}")
                df.show(args.show, truncate=False)
    for q in getattr(sch, "streaming_queries", []):
        try:
            q.awaitTermination()
        except KeyboardInterrupt:
            q.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
