"""Console sink (reference src/Sinks/Console.php: VarDumper to stdout;
doc/Console.md `encoding: json|xml|html|text`)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from rabbit_data_pipeline_spark.pipeline.scheduler import Scheduler, plugin


@plugin("sink.console")
def _console(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """`encoding` parity with doc/Console.md: text (default tabular
    show), json (one JSON object per line), xml (one <row> element per
    line via operators/xml.xml_format), html (a minimal table, cells
    entity-escaped so values containing <, >, & stay well-formed).
    Only the first `rows` rows ever reach the driver. `truncate`
    applies to the text encoding only (json/xml/html are structured
    interchange — truncating them would corrupt the payload)."""
    import html as _html

    (df,) = inputs
    n = int(cfg.get("rows", 20))
    enc = cfg.get("encoding", "text")
    if enc == "json":
        for line in df.toJSON().take(n):
            print(line)
    elif enc == "xml":
        from rabbit_data_pipeline_spark.operators.xml import xml_format

        for r in xml_format(df, item_tag=cfg.get("row_tag", "row")).select("xml").take(n):
            print(r["xml"])
    elif enc == "html":
        rows = df.take(n)
        head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in df.columns)
        print(f"<table><tr>{head}</tr>")
        for r in rows:
            print(
                "<tr>"
                + "".join(f"<td>{_html.escape(str(r[c]))}</td>" for c in df.columns)
                + "</tr>"
            )
        print("</table>")
    else:
        df.show(n=n, truncate=bool(cfg.get("truncate", True)))
    return df


@plugin("sink.memory")
def _memory(sch: Scheduler, cfg: dict[str, Any], inputs: list[DataFrame]) -> DataFrame:
    """Expose the result as a temp view + task result (test/inspection
    sink; also how one pipeline hands a table to another)."""
    (df,) = inputs
    view = cfg.get("view", cfg["_node"])
    df.createOrReplaceTempView(view)
    return df
