"""Privacy auditing operators: k-anonymity over quasi-identifiers.

Extension (SURVEY §2.9): before a corpus (or its metadata) leaves a
pipeline, the release gate is usually stated as k-anonymity — every
combination of quasi-identifying columns must describe at least ``k``
rows, otherwise the combination singles people out (Sweeney's classic
re-identification model). Two operators: the audit (per-combination
counts + safety flag) and the enforcement (suppress quasi values in
unsafe groups).

Scale: the audit is one partial-aggregated groupBy on the quasi columns
— output bounded by the number of DISTINCT combinations, not rows. The
suppressor uses a count window partitioned by the same columns (one
exchange over the data); a pathologically hot combination is one hot
partition, acceptable because the window only counts (no payload sort)
and that combination is by definition the safest one in the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per quasi-identifier combination: row count and whether it meets
    the ``k`` threshold (``anonymous = 1`` iff at least ``k`` rows share
    the combination). Null is a value here — rows with a null quasi
    column form their own combination, matching SQL GROUP BY on both
    engines."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) >= k).cast("int").alias("anonymous"),
    )


def suppress_quasi(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Enforce k-anonymity by suppression: rows whose quasi-identifier
    combination has fewer than ``k`` members get every quasi column
    nulled (the combination vanishes from the release); all other
    columns pass through untouched, safe rows unchanged."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    safe = n >= k
    return df.select(
        *[
            F.when(safe, F.col(c)).alias(c) if c in quasi_cols else F.col(c)
            for c in df.columns
        ]
    )
