"""Change-data-capture between dimension snapshots.

Extension (SURVEY §2.9): the snapshot-diff step of every incremental
warehouse load — yesterday's dimension vs today's extract, classified
into inserts / updates / deletes so downstream SCD merges (see
``operators.eventlog.scd2_from_log`` for the log-driven sibling) touch
only changed keys instead of rewriting the dimension.

Scale: one co-keyed full-outer shuffle join — both sides exchange on the
key once, compare columns evaluate in-row, and with
``include_unchanged=False`` (the default) the output is bounded by the
CHANGE volume, not the dimension size. No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots: ``insert`` (new only),
    ``delete`` (old only), ``update`` (present in both with any compare
    column differing, null-safe — ``IS DISTINCT FROM`` semantics), else
    ``unchanged`` (dropped unless ``include_unchanged``).

    Output: the key columns, ``change_type``, and ``old_<c>`` /
    ``new_<c>`` for every compare column.

    **Precondition: ``key_cols`` are unique and non-null in each
    snapshot** — a full-outer equi-join on a duplicated key fans out
    row-pairs and a null key never matches itself (it would always
    classify as one insert plus one delete). Enforcing uniqueness would
    cost an extra exchange per side; callers loading from a keyed
    dimension already have it."""
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in key_cols
        ],
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
