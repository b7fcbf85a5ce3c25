"""Declarative data-quality expectations — the relational
generalization of the reference's per-plugin errHandler
(reference src/AbstractPlugin.php:94-132 routes a FAILING MESSAGE;
at 100 TB you validate declaratively and route failing ROWS, keeping
both paths as columnar plans).

Rule kinds:
- ``("not_null", col)``
- ``("range", col, lo, hi)``            — violations fall outside [lo, hi]
- ``("unique", [cols...])``             — violations = rows in excess of 1/key
  (tuple semantics: NULL-containing keys ARE keys, as COUNT(DISTINCT (a,b)))
- ``("foreign_key", [cols...], ref_df, [ref_cols...])``

Scale shape: ALL scalar rules (not_null/range) evaluate in ONE pass —
a single aggregate of conditional sums, no per-rule scan; each unique
rule adds one keyed distinct-count agg; each foreign-key rule one
anti-join against the (broadcastable) dimension. The report is a
handful of rows. ``quarantine`` splits rows by the scalar rules with
one shared filter expression — valid and invalid sides are two
filters over the same scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scalar_violation(rule: tuple) -> tuple[str, "F.Column"]:
    kind = rule[0]
    if kind == "not_null":
        return f"not_null:{rule[1]}", F.col(rule[1]).isNull()
    if kind == "range":
        _, col, lo, hi = rule
        return (
            f"range:{col}",
            F.col(col).isNull() | (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)),
        )
    raise ValueError(f"not a scalar rule: {rule!r}")


def expectation_report(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate rules; returns (rule, n_violations), one row per rule."""
    scalar = [r for r in rules if r[0] in ("not_null", "range")]
    parts: list[DataFrame] = []
    if scalar:
        named = [_scalar_violation(r) for r in scalar]
        agg = df.agg(
            *[F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"v{i}") for i, (_, cond) in enumerate(named)]
        )
        pairs = F.array(
            *[
                F.struct(F.lit(name).alias("rule"), F.col(f"v{i}").alias("n_violations"))
                for i, (name, _) in enumerate(named)
            ]
        )
        parts.append(agg.select(F.explode(pairs).alias("p")).select("p.rule", "p.n_violations"))
    for r in rules:
        if r[0] == "unique":
            cols = list(r[1])
            # Tuple semantics: count_distinct over a struct counts
            # NULL-containing keys as distinct values — matching SQL
            # COUNT(DISTINCT (a, b)) — whereas count_distinct(a, b)
            # silently DROPS any row with a NULL key column, undercounting
            # violations on nullable keys (DuckDB-verified divergence).
            parts.append(
                df.agg(
                    (F.count("*") - F.count_distinct(F.struct(*[F.col(c) for c in cols])))
                    .cast("long")
                    .alias("n_violations")
                ).select(F.lit("unique:" + ",".join(cols)).alias("rule"), "n_violations")
            )
        elif r[0] == "foreign_key":
            _, cols, ref_df, ref_cols = r
            # Alias the reference side before joining: the common FK shape
            # has IDENTICAL names on both sides (user_id -> users.user_id),
            # and unqualified F.col(a) == F.col(b) would then raise
            # AMBIGUOUS_REFERENCE. The __fk_ref_ prefix cannot collide with
            # fact columns read from a warehouse table.
            aliased = [f"__fk_ref_{i}" for i in range(len(ref_cols))]
            ref = ref_df.select(
                *[F.col(rc).alias(a) for rc, a in zip(ref_cols, aliased)]
            ).distinct()
            cond = [F.col(a) == F.col(b) for a, b in zip(cols, aliased)]
            joined = cond[0]
            for c in cond[1:]:
                joined = joined & c
            orphans = df.join(F.broadcast(ref), joined, "left_anti")
            parts.append(
                orphans.agg(F.count("*").cast("long").alias("n_violations")).select(
                    F.lit("foreign_key:" + ",".join(cols)).alias("rule"), "n_violations"
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def quarantine(df: DataFrame, rules: list[tuple]) -> tuple[DataFrame, DataFrame]:
    """Split rows by the SCALAR rules: (valid, invalid). Both sides
    are filters over the same scan — route invalid to a DLQ sink, the
    reference's errHandler semantics at row granularity."""
    conds = [_scalar_violation(r)[1] for r in rules if r[0] in ("not_null", "range")]
    if not conds:
        raise ValueError("quarantine needs at least one scalar rule")
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return df.filter(~bad), df.filter(bad)
