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
ONE scan of the raw events: the distinct ``(user, date)`` collapse — a
map-side-partial dedup that shrinks the corpus to at most
``users x days`` rows — is lazily ``localCheckpoint``ed because both
the cohort-date aggregate and the offset join need it (Spark re-plans a
twice-referenced frame twice; without the pin the events table is
scanned once per reference — measured 3 scans in the naive plan). After
the pin everything is user-dimension-scale: per-user min, the
user->cohort join (AQE broadcasts the cohort side when it fits), and
the ``(cohort, offset)`` count-distinct. ``cohort_size`` is NOT a
separate aggregation: every user is active on their own cohort date, so
``n_active`` at offset 0 IS the cohort size — recovered with a window
over the final cohorts x offsets aggregate (metadata-scale, the benign
window class). No corpus-scale window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
        .localCheckpoint(eager=False)  # referenced twice; pin = 1 events scan
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
    # n_active at offset 0 IS the cohort size (everyone is active on
    # their first day); the window runs over cohorts x offsets rows
    w = Window.partitionBy("cohort_date")
    sized = active.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("offset_periods") == 0, F.col("n_active"))
        ).over(w),
    )
    # DATE comes out as an ISO string: hash-stable across engines
    # (python date repr vs DuckDB varchar differ), still sortable.
    return sized.select(
        F.col("cohort_date").cast("string").alias("cohort_date"),
        "offset_periods",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


def cohort_ltv(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grain_days: int = 7,
) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by their FIRST
    monetized day, then per ``(cohort_date, offset_periods)`` the
    per-user cumulative revenue — the chart that tells you when (if
    ever) a cohort pays back acquisition. ``ltv`` at offset *n* =
    cumulative revenue of the cohort through period *n* / cohort size.

    Same one-scan discipline as :func:`retention_matrix`: the
    ``(user, day, revenue)`` collapse is pinned (three references:
    cohort-date aggregate, the offset join, nothing else touches the
    corpus); revenue accumulates as DECIMAL through BOTH the period
    aggregate and the cumulative window (order-independent), divides
    once in double at the end. The cumulative window is per-cohort over
    offsets — cohort×offset-cardinality, the benign class."""
    if grain_days < 1:
        raise ValueError(f"grain_days must be >= 1, got {grain_days}")
    ud = (
        events.filter(
            F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("__u"),
            F.to_date(ts_col).alias("__d"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
        .groupBy("__u", "__d")
        .agg(F.sum("__v").cast("decimal(18,6)").alias("__rv"))
        .localCheckpoint(eager=False)
    )
    cohorts = ud.groupBy("__u").agg(F.min("__d").alias("__cd"))
    sizes = cohorts.groupBy("__cd").agg(
        F.countDistinct("__u").alias("cohort_users")
    )
    j = ud.join(cohorts, "__u").select(
        "__cd",
        (F.datediff("__d", "__cd") / F.lit(grain_days))
        .cast("int")
        .alias("offset_periods"),
        "__rv",
    )
    per_period = j.groupBy("__cd", "offset_periods").agg(
        F.sum("__rv").cast("decimal(18,6)").alias("__pr")
    )
    wc = (
        Window.partitionBy("__cd")
        .orderBy("offset_periods")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("__pr").over(wc).cast("double")
    out = per_period.join(F.broadcast(sizes), "__cd")
    return out.select(
        F.col("__cd").cast("string").alias("cohort_date"),
        "offset_periods",
        "cohort_users",
        F.round(F.col("__pr").cast("double"), 6).alias("period_revenue"),
        F.round(cum / F.col("cohort_users").cast("double"), 6).alias(
            "ltv_per_user"
        ),
    )
