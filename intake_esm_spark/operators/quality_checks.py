"""Declarative data-quality constraint checking (Deequ-style).

Extension (SURVEY §2.9): the validation stage a production pipeline runs
before trusting a new data drop — completeness, uniqueness, value
bounds, accepted domains — declared as rules and verified in ONE
aggregate pass over the table (the AWS Deequ model, re-expressed as a
plain Spark aggregation).

Rules (each produces one report row ``(rule, column, metric, passed)``):

* ``("not_null", col, min_fraction)`` — fraction of non-null values
  must be >= the threshold.
* ``("unique", col, None)`` — no value may occur twice (null excluded;
  metric = distinct/non-null fraction).
* ``("min", col, bound)`` / ``("max", col, bound)`` — column extreme
  must satisfy the bound (metric = the observed extreme).
* ``("in_set", col, [v1, v2, ...])`` — every non-null value in the
  accepted set (metric = fraction of rows conforming).

100 TB shape: every metric is an aggregate expression, so the whole
rule list compiles into ONE groupBy-less aggregation — a single scan
with map-side partials, no shuffle beyond the 1-row final combine
(``count_distinct`` adds its exchange only when a ``unique`` rule is
present). The report is rule-cardinality rows built from the 1-row
metrics frame — metadata-scale.

Determinism: fractions are exact integer-count ratios rounded to 6
decimals; extremes are the column values themselves.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULE_KINDS = ("not_null", "unique", "min", "max", "in_set")


def check_constraints(
    df: DataFrame, rules: Sequence[tuple[str, str, Any]]
) -> DataFrame:
    """One report row per rule: ``(rule, column, metric, passed)``.
    ``passed`` is INT (1/0) for engine-portable hashing."""
    if not rules:
        raise ValueError("rules must be non-empty")
    cols = set(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, (kind, col, arg) in enumerate(rules):
        if kind not in _RULE_KINDS:
            raise ValueError(f"unknown rule kind {kind!r} (rule {i})")
        if col not in cols:
            raise ValueError(f"rule {i} references unknown column {col!r}")
        c = F.col(col)
        if kind == "not_null":
            aggs.append(F.count(c).alias(f"__m{i}"))
        elif kind == "unique":
            aggs.append(F.count_distinct(c).alias(f"__m{i}"))
            aggs.append(F.count(c).alias(f"__m{i}_nn"))
        elif kind == "min":
            aggs.append(F.min(c).cast("double").alias(f"__m{i}"))
        elif kind == "max":
            aggs.append(F.max(c).cast("double").alias(f"__m{i}"))
        elif kind == "in_set":
            aggs.append(
                F.sum(c.isin(list(arg)).cast("bigint")).alias(f"__m{i}")
            )
            aggs.append(F.count(c).alias(f"__m{i}_nn"))
    # the 1-row metrics frame is referenced once PER RULE below —
    # unpinned, each report row would re-run the full table aggregation
    metrics = df.agg(*aggs).localCheckpoint(eager=False)

    reports = []
    for i, (kind, col, arg) in enumerate(rules):
        m = F.col(f"__m{i}")
        n = F.col("__n").cast("double")
        if kind == "not_null":
            metric = F.round(
                F.when(F.col("__n") > 0, m.cast("double") / n).otherwise(1.0), 6
            )
            passed = metric >= float(arg)
        elif kind == "unique":
            nn = F.col(f"__m{i}_nn")
            metric = F.round(
                F.when(nn > 0, m.cast("double") / nn.cast("double")).otherwise(
                    1.0
                ),
                6,
            )
            passed = m == nn
        elif kind in ("min", "max"):
            metric = F.round(m, 6)
            passed = (
                (m >= float(arg)) if kind == "min" else (m <= float(arg))
            )
            # an all-null column has no extreme: the bound is vacuous
            passed = F.coalesce(passed, F.lit(True))
        else:  # in_set
            nn = F.col(f"__m{i}_nn")
            metric = F.round(
                F.when(
                    nn > 0,
                    F.coalesce(m, F.lit(0)).cast("double") / nn.cast("double"),
                ).otherwise(1.0),
                6,
            )
            passed = F.coalesce(m, F.lit(0)) == nn
        reports.append(
            metrics.select(
                F.lit(i).alias("rule_idx"),
                F.lit(kind).alias("rule"),
                F.lit(col).alias("column"),
                metric.cast("double").alias("metric"),
                passed.cast("int").alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
