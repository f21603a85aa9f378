"""As-of and range joins — analytic extensions absent from the reference
(SURVEY.md §2.3 J6) but table stakes for an events table.

* **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` (optionally within a tolerance), per key.
  Implemented shuffle-once: union both sides tagged, one window
  ``last(ignorenulls)`` over (key, ts) ordering — the union shuffles each
  row exactly once on the key, versus a naive range join's quadratic
  explosion.
* **range join**: inner join on ``left.ts BETWEEN right.start AND
  right.end`` with an equi-key prefix so Catalyst plans a hash join +
  range filter rather than a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    tolerance: str | None = None,
    direction: str = "backward",
    right_order_col: str | None = None,
) -> DataFrame:
    """pd.merge_asof semantics, distributed.

    Columns of ``right`` (except key/ts) are appended to ``left`` rows,
    taken from the nearest earlier (backward) or later (forward) right
    ROW per key — the whole matched row, as one unit: the window picks a
    single right-row struct, so nulls inside right value columns can
    never mix values from different right rows (per-column
    ``last(ignorenulls)`` would synthesize rows that never existed).
    ``tolerance`` is an INTERVAL string (e.g. '10 minutes') for timestamp
    ``ts_col``, or a number for numeric ``ts_col`` (pd.merge_asof
    supports both).

    ``right_order_col``: a unique right-side column (e.g. an event id)
    appended to the window ordering so that multiple right rows sharing
    ``(on, ts_col)`` resolve deterministically — the row with the
    GREATEST ``right_order_col`` wins the tie (both directions; the
    within-tie order is independent of the ts direction). Without it,
    equal-timestamp right rows resolve by partition order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # value columns sharing a name with left columns get a pandas-style
    # suffix (pd.merge_asof suffixes=..., default behavior here: _right)
    collisions = (set(right.columns) - {on, ts_col}) & set(left.columns)
    for c in collisions:
        right = right.withColumnRenamed(c, f"{c}_right")
    if right_order_col is not None and right_order_col in collisions:
        right_order_col = f"{right_order_col}_right"
    if right_order_col is not None and right_order_col not in right.columns:
        raise ValueError(
            f"right_order_col {right_order_col!r} is not a right column"
        )
    value_cols = [c for c in right.columns if c not in (on, ts_col)]
    left_only = [c for c in left.columns if c not in (on, ts_col)]
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)

    # common layout: (key, ts, left-only cols, right value cols, __side)
    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(r_types[c]).alias(c) for c in value_cols],
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_only],
        *[F.col(c) for c in value_cols],
        F.lit(0).alias("__side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Tiebreak LAST in the ordering: within an equal-(ts, side) group of
    # right rows, last() picks the final row in sort order, so ascending
    # order makes the greatest right_order_col the deterministic winner —
    # in both directions (the within-tie order is direction-independent).
    # Left rows carry a null there (nulls first, so they can never
    # displace a right row inside a tie group).
    tiebreak = (
        [F.col(right_order_col).asc_nulls_first()]
        if right_order_col is not None
        else []
    )
    if direction == "backward":
        w = Window.partitionBy(on).orderBy(
            F.col(ts_col).asc(), F.col("__side").asc(), *tiebreak
        ).rowsBetween(Window.unboundedPreceding, 0)
    else:
        w = Window.partitionBy(on).orderBy(
            F.col(ts_col).desc(), F.col("__side").asc(), *tiebreak
        ).rowsBetween(Window.unboundedPreceding, 0)

    # ONE struct per right row: the fill picks whole rows, never mixes
    right_row = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col(ts_col).alias("__rts"), *[F.col(c) for c in value_cols]
        ),
    )
    filled = unioned.withColumn(
        "__asof", F.last(right_row, ignorenulls=True).over(w)
    )

    out = filled.filter(F.col("__side") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__asof.{c}"))
    out = out.withColumn("__matched_ts", F.col("__asof.__rts"))
    if tolerance is not None:
        delta = (
            F.lit(tolerance)
            if isinstance(tolerance, (int, float))
            else F.expr(f"INTERVAL {tolerance}")
        )
        bound = (
            F.col(ts_col) - delta
            if direction == "backward"
            else F.col(ts_col) + delta
        )
        in_tol = (
            (F.col("__matched_ts") >= bound)
            if direction == "backward"
            else (F.col("__matched_ts") <= bound)
        )
        for c in value_cols:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    return out.drop("__side", "__matched_ts", "__asof").select(
        *left.columns, *value_cols
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Inner join where ``left.ts`` falls in ``[right.start, right.end]``,
    equi-keyed on ``on`` so the planner hash-partitions by key first.
    Right columns colliding with left names get the pandas-style _right
    suffix (same rule as asof_join) so the result is unambiguous."""
    collisions = (set(right.columns) - {on, start_col, end_col}) & set(left.columns)
    for c in collisions:
        right = right.withColumnRenamed(c, f"{c}_right")
    return left.join(
        right,
        (left[on] == right[on])
        & (left[ts_col] >= right[start_col])
        & (left[ts_col] <= right[end_col]),
    ).drop(right[on])
