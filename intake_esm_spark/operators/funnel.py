"""Ordered-funnel analysis over event streams.

Extension per SURVEY §2.9 (the reference is a catalog engine with no
event analytics): the classic product-analytics question — of the users
who did step 1, how many went on to do step 2 *after* it (and within a
conversion window), then step 3 after that — which no plain groupBy can
answer because each step's eligible events depend on the PREVIOUS
step's per-user timestamp.

Semantics
---------
* ``t_1`` = a user's earliest ``steps[0]`` event; the funnel cohort is
  every user with a ``t_1`` (one output row per cohort user).
* ``t_i`` = the earliest ``steps[i-1]`` event STRICTLY after ``t_{i-1}``
  and, when ``within`` is given, no later than ``t_{i-1} + within`` —
  the per-step conversion window (each step's clock restarts at the
  previous step's completion, the standard funnel-window rule).
  Strict ``>`` means a simultaneous-timestamp event does not satisfy
  the next step.
* Repeated step types are allowed (``view -> view`` needs two distinct
  qualifying events because of the strict inequality).

100 TB shape
------------
One aggregation + one join per step, ALL keyed by the user column: the
step-1 min is a map-side-partial groupBy; every later step filters the
events table to that step's type (predicate pushed to the scan — each
step reads only its slice), joins the previous frontier (cohort-sized,
usually broadcastable — AQE decides) and takes the per-user min. No
window functions, no per-user event collections, no driver collect;
state never exceeds one (user, timestamp) row per step. Funnels are
short (k <= ~6), so the chain is k tiny user-keyed stages over
pushed-down scans.

Each frontier is referenced TWICE (by the next step's join and by the
final assembly), and Spark re-plans a DataFrame per reference — without
materialization a k-step funnel re-scans step i's event slice k-i+1
times (measured: the 3-step plan showed the signup aggregate subtree
3x). ``checkpoint=True`` (default) lazily ``localCheckpoint``s each
frontier — they are (user, timestamp) frames, user-dimension-scale —
so every event slice is scanned exactly once.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Per-user funnel progression: one row per user who completed step
    1, with ``t1..tk`` completion timestamps (null once the funnel is
    abandoned) and ``steps_completed``. ``within`` is a SQL interval
    string (e.g. ``"12 hours"``) bounding each step relative to the
    previous one; ``None`` means unbounded. ``checkpoint`` materializes
    each (user, ts) frontier so its event slice is scanned once (see
    module docstring); disable only for plan-inspection tests."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if within is not None:
        # validated here so a typo fails at plan-build, not mid-job
        iv = F.expr(f"INTERVAL '{within}'")

    def _pin(df: DataFrame) -> DataFrame:
        # lazy: materializes at the first action, reused by the second
        # reference — never an extra job of its own
        return df.localCheckpoint(eager=False) if checkpoint else df

    frontier = _pin(
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = frontier
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        cand = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(prev)
        if within is not None:
            cond = cond & (F.col("__ts") <= F.col(prev) + iv)
        nxt = _pin(
            cand.join(out.select(user_col, prev), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    completed: Column = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.col(f"t{i}").isNotNull().cast("int")
    return out.select(
        F.col(user_col),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
        completed.alias("steps_completed"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """The funnel REPORT: one row per step — ``(step_idx, step, n_users,
    frac_of_cohort)`` — the conversion chart. Derived from
    :func:`funnel` with one metadata-scale aggregation."""
    per_user = funnel(events, steps, user_col, ts_col, type_col, within)
    # coalesce: over an EMPTY cohort F.sum returns null while F.count
    # returns 0 — the report must say 0 users at every step, not null
    agg = per_user.agg(
        F.count(F.lit(1)).alias("__n1"),
        *[
            F.coalesce(
                F.sum(F.col(f"t{i}").isNotNull().cast("bigint")), F.lit(0)
            ).alias(f"__n{i}")
            for i in range(2, len(steps) + 1)
        ],
    )
    # the 1-row stats frame is referenced once per step below, and a
    # DataFrame referenced k times is computed k times (the whole funnel
    # chain per branch) — materialize the single row
    agg = agg.localCheckpoint(eager=False)
    rows = None
    for i, step in enumerate(steps, start=1):
        r = agg.select(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"__n{i}").alias("n_users"),
            # empty cohort: the fraction is undefined (null), never NaN
            F.when(
                F.col("__n1") > 0,
                F.round(
                    F.col(f"__n{i}").cast("double")
                    / F.col("__n1").cast("double"),
                    6,
                ),
            ).alias("frac_of_cohort"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def funnel_lag_stats(
    funnel_df: DataFrame, steps: list[str]
) -> DataFrame:
    """Time-to-convert distribution per funnel step transition: over the
    users who completed step i+1, the count, mean and p50/p90 of the
    ``t_{i+1} − t_i`` lag in minutes — the "WHERE do users stall"
    readout next to the conversion counts. Input is :func:`funnel`
    output (``t1..tk`` columns).

    One aggregation over the user-count-sized funnel frame; every
    statistic per transition comes out of the same pass (exact type-7
    ``percentile`` — swap ``approx_percentile`` at extreme user counts;
    the funnel frame is users-who-started-sized, usually fine). Lag
    micros accumulate as exact longs for the mean; percentiles run on
    the per-user minute doubles (identical IEEE inputs on both engines
    — the `quantile_cont` parity rule). Non-converting users are
    skipped per-transition by null-skipping aggregates."""
    if len(steps) < 2:
        raise ValueError("need at least 2 steps for lag stats")
    aggs = []
    for i in range(1, len(steps)):
        us = F.unix_micros(F.col(f"t{i + 1}")) - F.unix_micros(F.col(f"t{i}"))
        aggs += [
            F.count(F.col(f"t{i + 1}")).alias(f"__n{i}"),
            F.round(
                F.sum(us).cast("double")
                / F.count(F.col(f"t{i + 1}")).cast("double")
                / F.lit(60_000_000.0),
                6,
            ).alias(f"__mean{i}"),
            F.round(F.expr(f"percentile({_min_expr(i)}, 0.5)"), 6).alias(
                f"__p50{i}"
            ),
            F.round(F.expr(f"percentile({_min_expr(i)}, 0.9)"), 6).alias(
                f"__p90{i}"
            ),
        ]
    stats = funnel_df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(steps[i - 1]).alias("step_from"),
            F.lit(steps[i]).alias("step_to"),
            F.col(f"__n{i}").alias("n_converted"),
            F.col(f"__mean{i}").alias("mean_minutes"),
            F.col(f"__p50{i}").alias("p50_minutes"),
            F.col(f"__p90{i}").alias("p90_minutes"),
        )
        for i in range(1, len(steps))
    ]
    return stats.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def _min_expr(i: int) -> str:
    """SQL text of the per-user lag-minutes expression for step i→i+1 —
    ONE definition shared by the percentile aggregates (F.expr needs
    text) and quoted by the oracle, so the interpolation inputs are
    bit-identical across engines."""
    return f"(unix_micros(t{i + 1}) - unix_micros(t{i})) / 60000000.0D"


def funnel_unordered(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """ANY-ORDER funnel: a user completes when every step has occurred,
    in whatever order — the "did they eventually do all of X, Y, Z"
    companion to the strictly-sequenced :func:`funnel` (product
    analytics ships both; onboarding checklists are unordered).
    ``within`` bounds the whole set: every step must land within the
    interval of the user's FIRST occurrence of any step (the anchored
    formulation — deterministic, no pair scan).

    One pass: filter to the step types (pushed to the scan), per-user
    conditional min per step in a single map-side-combined aggregation,
    then in-row completion logic. Returns one row per user who did at
    least one step: ``(user_col, steps_done, completed, t_first,
    t_complete)`` — ``t_complete`` (max of the per-step firsts) is null
    unless completed. Unlike the ordered funnel there are no joins at
    all: the plan is ONE aggregation whatever the step count."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct for the unordered form")
    ev = events.filter(
        F.col(type_col).isin(steps) & F.col(user_col).isNotNull()
    )
    aggs = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = ev.groupBy(user_col).agg(*aggs)
    firsts = [F.col(f"__t{i}") for i in range(len(steps))]
    t_first = F.least(*firsts) if len(firsts) > 1 else firsts[0]
    t_all = F.greatest(*firsts) if len(firsts) > 1 else firsts[0]
    have_all = reduce(
        lambda a, b: a & b, [c.isNotNull() for c in firsts]
    )
    if within is not None:
        iv = F.expr(f"INTERVAL '{within}'")
        have_all = have_all & (t_all <= t_first + iv)
    steps_done = reduce(
        lambda a, b: a + b,
        [c.isNotNull().cast("int") for c in firsts],
    )
    return per_user.select(
        user_col,
        steps_done.alias("steps_done"),
        have_all.alias("completed"),
        t_first.alias("t_first"),
        F.when(have_all, t_all).alias("t_complete"),
    )
