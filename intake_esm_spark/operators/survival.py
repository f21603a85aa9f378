"""Kaplan-Meier survival estimation over right-censored durations.

Extension (SURVEY §2.9): time-to-event analysis — "how long until a
user churns / a job fails / an order returns", with subjects still
alive at the observation cutoff entering as CENSORED rather than being
dropped (dropping them biases survival down; the KM estimator is the
standard correction).

Scale shape: one subject-frame aggregate to the event-time grain
(distinct durations — calendar-bounded, thousands at most), then the
at-risk/cumulative arithmetic runs as windows over that tiny frame.
The unpartitioned window is over the event-TIME grain, never the
subject grain — the same post-aggregation exception documented in
timeseries.py. One keyed exchange over the subjects, total.

Determinism: n_at_risk / n_events / n_censored are exact integers;
``hazard = d/n`` is one double division (exact inputs, correctly
rounded result — bitwise equal across engines). The survival curve
``S(t) = Π (1 - d_i/n_i)`` has no distributed product primitive, so it
is computed as ``exp(Σ ln(1 - d/n))`` — ln/exp are not IEEE-mandated
to be correctly rounded, so survival is the one column here that is
6dp-rounded on top of a possibly last-ulp-divergent base. The oracle
sweep empirically confirms hash equality at the tested SFs; if a
platform ever flips a boundary, pin survival to the counts columns
(always exact) and recompute client-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def km_survival(
    subjects: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier estimate from one row per subject: ``duration_col``
    (numeric time-to-event-or-censoring, >= 0) and ``event_col`` (1 =
    event observed, 0 = right-censored). Returns one row per distinct
    duration, ordered ascending: ``(t, n_at_risk, n_events, n_censored,
    hazard, survival)`` — survival steps down only at event times
    (censoring reduces the risk set without a step, the KM property).
    Null durations/events are excluded. ``S(t)`` uses the convention
    that events at ``t`` have already happened (left-continuous curve
    evaluated just after ``t``)."""
    from pyspark.sql import Window

    obs = subjects.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        F.col(duration_col).alias("t"),
        F.col(event_col).cast("int").alias("__e"),
    )
    per_t = obs.groupBy("t").agg(
        F.sum("__e").alias("n_events"),
        F.sum(F.lit(1) - F.col("__e")).alias("n_censored"),
        F.count(F.lit(1)).alias("__n_at_t"),
    )
    # event-time-grain frame from here on (bounded cardinality — the
    # documented unpartitioned-window exception)
    asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    h = F.col("n_events").cast("double") / F.col("n_at_risk").cast("double")
    # hazard = 1 (everyone at risk dies) can only occur at the maximal
    # t, but Spark's log(0) is NULL (a null-skipping window sum would
    # silently keep survival positive) — clamp via an explicit flag
    curve = (
        per_t.withColumn(
            "n_at_risk",
            F.sum("__n_at_t").over(
                Window.orderBy("t").rowsBetween(
                    0, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("hazard", h)
        .withColumn(
            "survival",
            F.when(
                F.max((h >= 1.0).cast("int")).over(asc) == 1, F.lit(0.0)
            ).otherwise(
                F.exp(
                    F.coalesce(
                        F.sum(
                            F.when(h < 1.0, F.log(F.lit(1.0) - h))
                        ).over(asc),
                        F.lit(0.0),
                    )
                )
            ),
        )
    )
    return curve.select(
        "t",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round("hazard", 6).alias("hazard"),
        F.round("survival", 6).alias("survival"),
    )
