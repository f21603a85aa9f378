"""Cohort retention analysis over event streams.

Extension per SURVEY §2.9 (the reference is a catalog engine with no
event analytics): the second classic product-analytics chart next to the
funnel (operators/funnel.py) — group users into cohorts by their first
active day, then for each cohort and each later period count how many
came back.

Semantics
---------
* A user's *cohort date* is their earliest active calendar date
  (``CAST(ts AS DATE)`` of their first event, any type).
* ``offset_periods`` = ``floor(datediff(active_day, cohort_date) /
  grain_days)`` — offset 0 is the cohort period itself, so
  ``retention`` at offset 0 is 1.0 by construction.
* ``retention`` = distinct users of the cohort active in that offset
  period / cohort size, rounded to 6 decimals.
* Null users are excluded (they have no identity to retain).

100 TB shape
------------
Three keyed exchanges, none corpus-skewed: (1) distinct
``(user, date)`` — a map-side-partial dedup that collapses the raw
event volume to at most ``users x days`` rows before anything else
touches it; (2) per-user min over that frame for the cohort date;
(3) the ``(cohort, offset)`` count-distinct. The user->cohort join is
user-dimension-sized (AQE broadcasts it when it fits), and the
cohort-size table joined at the end is metadata-scale (one row per
cohort date), broadcast explicitly. No windows, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain_days: int = 1,
) -> DataFrame:
    """Per ``(cohort_date, offset_periods)``: distinct active users,
    cohort size, and the retention fraction. ``grain_days`` buckets the
    offset axis (1 = daily retention, 7 = weekly)."""
    if grain_days < 1:
        raise ValueError(f"grain_days must be >= 1, got {grain_days}")
    days = (
        events.filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), F.to_date(ts_col).alias("__d"))
        .distinct()
    )
    first = days.groupBy(user_col).agg(F.min("__d").alias("cohort_date"))
    active = (
        days.join(first, user_col)
        .select(
            user_col,
            "cohort_date",
            F.floor(F.datediff("__d", "cohort_date") / grain_days)
            .cast("int")
            .alias("offset_periods"),
        )
        .groupBy("cohort_date", "offset_periods")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    # DATE comes out as an ISO string: hash-stable across engines
    # (python date repr vs DuckDB varchar differ), still sortable.
    return active.join(F.broadcast(sizes), "cohort_date").select(
        F.col("cohort_date").cast("string").alias("cohort_date"),
        "offset_periods",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )
