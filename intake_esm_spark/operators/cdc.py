"""Change-data-capture between dimension snapshots, and the SCD2 merge
that applies it.

Extension (SURVEY §2.9): the diff-then-merge flow of every incremental
warehouse load — yesterday's dimension vs today's extract classified
into inserts / updates / deletes (``snapshot_diff``), then merged into
the type-2 dimension touching only changed keys (``scd2_apply``; see
``operators.eventlog.scd2_from_log`` for the log-driven sibling).

Scale: one co-keyed full-outer shuffle join — both sides exchange on the
key once, compare columns evaluate in-row, and with
``include_unchanged=False`` (the default) the output is bounded by the
CHANGE volume, not the dimension size. No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_ts: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a :func:`snapshot_diff` to a type-2 dimension — the full
    warehouse merge flow (diff the snapshots, then merge only the
    changes): every changed/deleted key's CURRENT version closes at
    ``effective_ts``; inserts and updates open a new current version
    (``version`` = the key's closed version + 1, or 1 for a brand-new
    key); everything else passes through untouched.

    ``changes`` is ``snapshot_diff`` output — ``key_cols``,
    ``change_type``, and ``new_<attr>`` columns for every ``attr_cols``
    entry (``unchanged`` rows, if present, are ignored).

    Scale: two co-keyed joins, both bounded by CHANGE volume on one side
    (the close-off join ships the keys+types of changed rows against the
    dimension; the version-seed join runs change-rows against a
    per-key max-version aggregate of the dimension — the full history,
    not just the current slice, so a key re-inserted after a delete
    resumes numbering instead of colliding at version 1) — the dimension
    is never windowed or re-versioned wholesale, which is the point of
    merging a diff instead of rebuilding from snapshots. Same key-uniqueness precondition as
    ``snapshot_diff``, plus freshness: the diff's OLD side must be the
    dimension's current snapshot — a stale diff can classify an
    already-current key as ``insert``, which opens a second current row
    instead of closing the first (diff against
    ``dim.filter(current).select(keys + attrs)`` to be safe)."""
    ts = F.lit(effective_ts).cast("timestamp")
    ch = changes.filter(F.col("change_type") != "unchanged").select(
        *key_cols,
        "change_type",
        *[F.col(f"new_{c}") for c in attr_cols],
    )
    closing = ch.select(*key_cols, "change_type")
    closed = dim.join(closing, key_cols, "left")
    closes_now = (F.col(current_col) == 1) & F.col("change_type").isin(
        "update", "delete"
    )
    closed = closed.select(
        *key_cols,
        *attr_cols,
        F.col(from_col),
        F.when(closes_now, ts).otherwise(F.col(to_col)).alias(to_col),
        F.col(version_col),
        F.when(closes_now, F.lit(0))
        .otherwise(F.col(current_col))
        .alias(current_col),
    )
    # Seed from max(version) over ALL of the key's rows, not the
    # is_current slice: a key whose versions were all closed by a delete
    # has no current row, and re-seeding it at 1 would duplicate the
    # (key, version) pair its history already holds. The aggregate is
    # one key-partitioned exchange over the dimension — same key as the
    # close-off join, so AQE/exchange reuse can co-locate them.
    current_versions = dim.groupBy(*key_cols).agg(
        F.max(version_col).alias("__prev_v")
    )
    opened = (
        ch.filter(F.col("change_type").isin("insert", "update"))
        .join(current_versions, key_cols, "left")
        .select(
            *key_cols,
            *[F.col(f"new_{c}").alias(c) for c in attr_cols],
            ts.alias(from_col),
            F.lit(None).cast("timestamp").alias(to_col),
            (F.coalesce(F.col("__prev_v"), F.lit(0)) + F.lit(1)).alias(
                version_col
            ),
            F.lit(1).alias(current_col),
        )
    )
    return closed.unionByName(opened)


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
