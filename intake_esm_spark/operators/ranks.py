"""Distributed exact global ordering: bucketed prefix sums and ranks.

The single shared implementation of the two-phase bucketed prefix-sum
construction that round 9 introduced for Mann-Whitney/KS
(``experiment._cum_by_value``, now a thin delegate) and that round 10
extends to every operator that previously ranked over an unpartitioned
total-order window (``profiling.lift_table``, ``profiling.
gini_coefficient``, ``segmentation.rfm_segments``, ``segmentation.
abc_classification``).  A global ``Window.orderBy(...)`` plans ONE task
holding the whole frame — for entity- or row-cardinality frames that is
a corpus-scale single-partition sort at 100 TB.  Here instead:

1. every row gets an order-preserving *range bucket*
   ``floor((v − min) / (max − min) · B)`` over the numeric sort value —
   monotone in ``v`` (IEEE subtraction/multiplication by a positive
   constant preserve weak monotonicity), so (bucket, value, tiebreaks)
   sorts identically to (value, tiebreaks); min/max come from a 1-row
   aggregate broadcast back in-plan;
2. running sums WITHIN each bucket (window PARTITIONED by bucket —
   parallel, each ≲ 1/B of the frame, ordered by the full sort key so
   tiebreaks stay exact);
3. per-bucket totals (≤ B rows) get an EXCLUSIVE running sum over that
   bounded aggregate (its single-partition exchange holds B rows, never
   data) and broadcast-join back as offsets.

Bucket placement only shapes the EXECUTION — any order-preserving
assignment yields the same exact prefix sums (associativity of the
sum), so results are engine-exact and the DuckDB oracles replay a plain
SQL window, never the buckets.  Ties on the sort value always share a
bucket (the bucket is a function of the value alone), so tiebreak
columns order rows exactly within one partition-local window.

``ntile_from_rank`` converts the exact global rank into the standard
SQL ``ntile(n)`` bucket id (first ``N mod n`` tiles take the remainder
row — the semantics Spark and DuckDB share), letting callers replace an
unpartitioned ``ntile`` window with rank arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_RANK_BUCKETS = 64
"""Value-range fan-out for the bucketed prefix sums.  64 buckets keep
the offset table trivially small while bounding any single ordered
window to ~1/64 of the frame (raise for extreme skew-free frames; the
value is execution-only, never visible in results)."""


def bucketed_cumsum(
    df: DataFrame,
    sum_cols: list[str],
    val_col: str = "__val",
    tiebreaks: list[str] | None = None,
    descending: bool = False,
    n_buckets: int = N_RANK_BUCKETS,
    bounds: tuple[str, str] | None = None,
) -> DataFrame:
    """INCLUSIVE prefix sums of ``sum_cols`` over ``df`` globally
    ordered by (``val_col`` asc/desc, ``tiebreaks`` asc) — exact, with
    no single-task data-sized stage (construction above).  Adds
    ``__cum_<c>`` for each ``c`` in ``sum_cols``; all internal columns
    (``__bkt``, span bounds) are dropped.

    ``val_col`` must be numeric (it is range-bucketed through a double
    cast; the within-bucket ORDER uses the original column, so decimal
    sort exactness is preserved).  NULL sort values get their own
    dedicated bucket at the position Spark's window order gives them —
    FIRST under ascending, LAST under descending (the default
    NULLS FIRST/NULLS LAST placement of the unpartitioned windows this
    replaces); engines whose default null order differs (DuckDB sorts
    nulls last under ASC) need a null filter upstream for oracle
    parity.  A constant frame (min = max) — or a frame polluted by NaN,
    which poisons the span comparison — degrades to one bucket: results
    stay exact, parallelism does not (callers feeding scores should
    filter non-finite values).  ``tiebreaks`` make the order total;
    without them, rows tied on ``val_col`` get physical-order cumsums —
    fine when only value-grain aggregates of the cumsum are consumed
    (the Mann-Whitney case: one row per distinct value), required
    otherwise.

    ``bounds`` (optional): names of two columns ALREADY ON ``df``
    holding a conservative span for ``val_col`` — ``lo ≤`` every value
    ``≤ hi`` (over-wide is fine: bucketing only needs a monotone
    assignment, and the top bucket clamps).  Skips the span aggregate +
    broadcast entirely; callers ranking several metrics over one pinned
    frame (RFM) fold all spans into the aggregate they already run
    instead of paying one full-frame pass per metric."""
    ties = list(tiebreaks or [])
    if bounds is None:
        span = df.agg(
            F.min(F.col(val_col).cast("double")).alias("__lo"),
            F.max(F.col(val_col).cast("double")).alias("__hi"),
        )
        df = df.crossJoin(F.broadcast(span))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
        span_drop = ["__lo", "__hi"]
    else:
        lo_c = F.col(bounds[0]).cast("double")
        hi_c = F.col(bounds[1]).cast("double")
        span_drop = []
    vd = F.col(val_col).cast("double")
    up = F.floor(
        (vd - lo_c) / (hi_c - lo_c) * F.lit(float(n_buckets))
    ).cast("int")
    asc_bkt = F.least(F.lit(n_buckets - 1), up)
    # nulls: a plain F.least would SKIP the null bucket expression and
    # drop null-valued rows into the last bucket (an arbitrary
    # mid-order rank) — give them the dedicated first/last bucket the
    # window null order they replace would
    null_bkt = F.lit(n_buckets) if descending else F.lit(-1)
    bkt = (
        F.when(F.col(val_col).isNull(), null_bkt)
        .when(
            hi_c > lo_c,
            F.lit(n_buckets - 1) - asc_bkt if descending else asc_bkt,
        )
        .otherwise(F.lit(0))
    )
    b = df.withColumn("__bkt", bkt).drop(*span_drop)
    order = [
        F.col(val_col).desc() if descending else F.col(val_col).asc(),
        *[F.col(t).asc() for t in ties],
    ]
    w_local = Window.partitionBy("__bkt").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    for c in sum_cols:
        b = b.withColumn(f"__loc_{c}", F.sum(c).over(w_local))
    totals = b.groupBy("__bkt").agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in sum_cols]
    )
    # bucket ids already follow the requested direction (descending
    # flips the id), so the offset scan is always bucket-ascending —
    # a single-partition exchange over ≤ n_buckets aggregate rows
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(w_off), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in sum_cols
        ],
    )
    out = b.join(F.broadcast(offs), "__bkt")
    for c in sum_cols:
        out = out.withColumn(
            f"__cum_{c}", F.col(f"__loc_{c}") + F.col(f"__off_{c}")
        ).drop(f"__loc_{c}", f"__off_{c}")
    return out.drop("__bkt")


def global_rank(
    df: DataFrame,
    val_col: str,
    tiebreaks: list[str],
    descending: bool = False,
    out_col: str = "__rank",
    bounds: tuple[str, str] | None = None,
    n_buckets: int = N_RANK_BUCKETS,
) -> DataFrame:
    """Exact 1-based ``row_number`` over the global total order
    (``val_col`` asc/desc, ``tiebreaks`` asc) via the bucketed cumsum of
    a unit count — the drop-in replacement for an unpartitioned
    ``row_number()/ntile()`` window.  ``tiebreaks`` must make the order
    total (typically the entity id) or ranks among ties follow physical
    order.  ``bounds`` as in :func:`bucketed_cumsum`."""
    marked = df.withColumn("__one", F.lit(1))
    ranked = bucketed_cumsum(
        marked, ["__one"], val_col=val_col, tiebreaks=tiebreaks,
        descending=descending, bounds=bounds, n_buckets=n_buckets,
    )
    return ranked.withColumnRenamed("__cum___one", out_col).drop("__one")


def ntile_from_rank(rank: Column, n_rows: Column, n_tiles: int) -> Column:
    """The SQL ``ntile(n_tiles)`` bucket id from an exact 1-based rank
    and the frame size: with ``q = N div n`` and ``rem = N mod n``, the
    first ``rem`` tiles hold ``q+1`` rows and the rest ``q`` — the
    remainder rule Spark and DuckDB (and the standard) share, so
    replacing the window keeps every boundary row in the same tile.
    Pure in-row integer codegen; when ``N < n_tiles`` (q = 0) every row
    is alone in tile = rank, which the first branch already yields."""
    q = (n_rows / F.lit(n_tiles)).cast("bigint")
    rem = n_rows - q * F.lit(n_tiles)
    head = rem * (q + F.lit(1))
    return F.when(
        rank <= head, F.ceil(rank / (q + F.lit(1)))
    ).otherwise(rem + F.ceil((rank - head) / q)).cast("int")
