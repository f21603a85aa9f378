"""Experiment (A/B test) analysis: conversion rates + two-proportion
z-tests against a control.

Extension (SURVEY §2.9): the readout every product experiment ends with
— per-variant conversion, lift vs control, and whether the difference
clears significance. Deliberately the *frequentist two-proportion z*
formulation: it is closed-form arithmetic over four exact integers per
comparison, so the whole report is engine-portable (a bootstrap or a
Bayesian posterior would not be).

Scale: one partial-aggregated groupBy over unit-grain rows (the variant
report is variant-cardinality-sized), then the control row broadcasts
back in-plan — no driver collect, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_test_report(
    units: DataFrame,
    variant_col: str,
    converted_col: str,
    control: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Per variant: unit count, conversions, conversion rate, and the
    two-proportion z-statistic vs ``control`` (pooled standard error):
    ``z = (p_v − p_c) / √(p̂(1−p̂)(1/n_v + 1/n_c))`` with ``p̂`` the
    pooled rate. ``units`` must be ONE ROW PER UNIT (deduplicate
    upstream — a unit counted twice silently narrows the standard
    error); ``converted_col`` is 0/1 (any numeric where >0 means
    converted; NULL counts as not-converted — made explicit with a
    coalesce so the unit stays in ``n_units`` without inflating the
    rate). The control row itself carries a null z. ``significant``
    is 1 iff ``|z| >= z_threshold`` (default = two-sided 5%). If
    ``control`` matches no variant, every row survives with a null z
    (control stats LEFT-join in) instead of the report silently
    collapsing to zero rows.

    Determinism: counts are exact integers; every rate and the z are
    fixed IEEE expressions over them, 6dp-rounded."""
    per_variant = (
        units.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(
                F.coalesce((F.col(converted_col) > 0).cast("bigint"), F.lit(0))
            ).alias("n_converted"),
        )
    )
    ctrl = per_variant.filter(F.col("variant") == control).select(
        F.lit(1).alias("__ck"),
        F.col("n_units").alias("__nc"),
        F.col("n_converted").alias("__xc"),
    )
    j = per_variant.withColumn("__ck", F.lit(1)).join(
        F.broadcast(ctrl), "__ck", "left"
    )
    nv = F.col("n_units").cast("double")
    xv = F.col("n_converted").cast("double")
    nc = F.col("__nc").cast("double")
    xc = F.col("__xc").cast("double")
    rate = xv / nv
    pool = (xv + xc) / (nv + nc)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / nv + F.lit(1.0) / nc))
    z = F.when(
        (F.col("variant") != control) & (se > 0), (xv / nv - xc / nc) / se
    )
    return j.select(
        "variant",
        "n_units",
        "n_converted",
        F.round(rate, 6).alias("rate"),
        F.round(z, 6).alias("z_vs_control"),
        F.coalesce(
            (F.abs(F.round(z, 6)) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )
