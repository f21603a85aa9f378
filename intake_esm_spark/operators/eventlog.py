"""Event-log shaping operators: transition matrices, path mining, SCD2
dimension building + point-in-time enrichment, calendar gap-filling,
and trailing-window features.

Extensions (SURVEY §2.9): the classic "give the warehouse team an event
stream" requests. The shared scale property: every window and
aggregation is keyed by the entity column (or the metadata-scale result
of an entity-keyed collapse), and consecutive windows over the same key
reuse one exchange — Spark recognizes the child's hash distribution
through intervening filters/projects (pinned by the plan-shape tests;
each operator's docstring states its exact exchange budget).

Determinism contract (the repo-wide rules): orderings always carry a
unique tiebreak column (``order_col``) so window ranks never fall back
to partition order; value sums accumulate as DECIMAL(18,6); fractions
are divisions of exact integers cast to double, identical IEEE ops in
Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _entity_daily(
    events: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """(entity, day)-grain decimal rollup shared by the gap-fill and
    trailing-feature operators: ``(key, day, n_events, __dv
    decimal(18,6))`` — ONE definition so the two operators (and their
    oracles) cannot de-sync (the ``timeseries._daily_frame`` rule).
    Null entity keys excluded."""
    return (
        events.filter(F.col(key_col).isNotNull())
        .select(
            F.col(key_col),
            F.to_date(ts_col).alias("day"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
        .groupBy(key_col, "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__v").cast("decimal(18,6)").alias("__dv"),
        )
    )


def transition_matrix(
    events: DataFrame,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    terminal: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event paths:
    for every ordered pair of consecutive events of one entity, count
    ``from_type -> to_type`` and the conditional probability of leaving
    ``from_type`` to ``to_type``.

    Each entity's final event has no successor; with ``terminal`` set it
    transitions to that absorbing label (making rows a proper stochastic
    matrix — outgoing probabilities sum to 1), otherwise it is dropped.
    Null entity keys and null types are excluded (a null key groups
    unrelated events; a null type is not a state).

    Scale: one exchange on ``key_col`` for the successor window; the
    grouped matrix is at most ``|types|^2`` rows, so the per-from-state
    normalization window runs over a metadata-scale frame (the benign
    class — mixing.py's rate frame)."""
    base = events.filter(
        F.col(key_col).isNotNull() & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    nxt = F.lead(type_col).over(w)
    paired = base.select(
        F.col(type_col).alias("from_type"),
        (F.coalesce(nxt, F.lit(terminal)) if terminal is not None else nxt).alias(
            "to_type"
        ),
    ).filter(F.col("to_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    prob = F.col("n_transitions").cast("double") / F.sum("n_transitions").over(
        wf
    ).cast("double")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(prob, 6).alias("prob"),
    )


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 20,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Most frequent ``length``-step event paths across all entities:
    every window of ``length`` consecutive events of one entity becomes
    a ``a>b>c`` path, counted corpus-wide, top-``k`` by count — the
    "what do users actually do" sibling of :func:`transition_matrix`
    (which sees only single steps). Paths are OVERLAPPING windows
    (an entity with events a,b,c,d contributes a>b>c AND b>c>d), only
    COMPLETE windows count, and null entity keys / null types are
    excluded like the sibling.

    Scale: one exchange on ``key_col`` for the lead chain (all
    ``length-1`` leads share one window — one sort, not one per step),
    one path-keyed count with map-side partials, then a partial top-k
    (``TakeOrderedAndProject`` — never a global sort of the path
    vocabulary). Ranking by (count desc, path asc) is a total order, so
    the cutoff is engine-portable."""
    if length < 2:
        raise ValueError(f"length must be >= 2, got {length}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = events.filter(
        F.col(key_col).isNotNull() & F.col(type_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    paths = base.select(
        F.concat_ws(">", *steps).alias("path"),
        steps[-1].isNotNull().alias("__complete"),
    ).filter(F.col("__complete"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(k)
    )


def scd2_from_log(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an attribute change
    log: collapse each entity's consecutive repeats of ``attr_col`` into
    versioned ``[effective_from, effective_to)`` intervals, open-ended on
    the current value — the gaps-and-islands shape every warehouse
    dimension load runs (Kimball SCD type 2).

    A row opens a new version iff it is the entity's first event or its
    attribute differs from the previous event's (null-safe: null is a
    legitimate attribute value and ``IS DISTINCT FROM`` semantics apply
    on both engines). ``effective_to`` is the next version's start (null
    ⇒ current); ``version`` numbers intervals from 1 in time order.
    Entities with a null key are excluded.

    Scale: both windows (change detection over all events, interval
    close-off over the surviving change points) partition by ``key_col``
    — one exchange total, the successor window reuses the first's
    partitioning. Output is bounded by the number of VALUE CHANGES, not
    events, so the dimension stays small even against a 100 TB log."""
    base = events.filter(F.col(key_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev = F.lag(attr_col).over(w)
    rn = F.row_number().over(w)
    changed = base.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        F.col(order_col),
        ((rn == 1) | ~F.col(attr_col).eqNullSafe(prev)).alias("__chg"),
    ).filter(F.col("__chg"))
    wv = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    eff_to = F.lead(ts_col).over(wv)
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        eff_to.alias("effective_to"),
        F.row_number().over(wv).alias("version"),
        eff_to.isNull().cast("int").alias("is_current"),
    )


def dau_mau(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    mau_days: int = 28,
) -> DataFrame:
    """Daily active users, trailing ``mau_days``-day active users, and
    the DAU/MAU stickiness ratio per calendar day — the engagement
    metric every analytics suite ships. Days within the first
    ``mau_days − 1`` of the data have a partial-window MAU (the
    standard convention).

    A COUNT DISTINCT over a RANGE window is unsupported (and would be a
    giant state anyway), so MAU uses the contribution trick: each
    distinct (user, day) activity row CONTRIBUTES that user to the MAU
    of days ``day .. day+mau_days−1`` via an in-row ``sequence()``
    explode — ×``mau_days`` row amplification of the user-day frame
    (already collapsed from raw events), then one countDistinct per
    day. Scale: the user-day collapse is the only corpus exchange;
    the explode is a projection; both daily aggregates are partial and
    day-keyed; the DAU⋈MAU join is calendar-sized. Days with zero
    active users are omitted (inner join on active days — compose with
    a calendar frame upstream for dense dashboards)."""
    if mau_days < 1:
        raise ValueError(f"mau_days must be >= 1, got {mau_days}")
    # Pinned: bounds, dau, and contrib all reference the corpus-scale
    # user-day distinct — without the checkpoint Spark re-plans (and
    # re-scans) it once per reference, tripling the only corpus
    # exchange (the repo's standing multi-reference rule, as applied in
    # funnel/retention/kmv_pairwise_overlap).
    ud = (
        events.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__u"), F.to_date(ts_col).alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bounds = ud.agg(F.max("day").alias("__dmax"))
    dau = ud.groupBy("day").agg(F.countDistinct("__u").alias("dau"))
    contrib = ud.select(
        "__u",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), mau_days - 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    mau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("__dmax"))
        .groupBy("day")
        .agg(F.countDistinct("__u").alias("mau"))
    )
    out = dau.join(mau, "day")
    ratio = F.col("dau").cast("double") / F.col("mau").cast("double")
    return out.select(
        F.col("day").cast("string").alias("day"),
        "dau",
        "mau",
        F.round(ratio, 6).alias("stickiness"),
    )


def rolling_user_features(
    events: DataFrame,
    windows: list[int] = [7, 30],
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity trailing-window features at daily grain — the
    feature-store snapshot a model consumes: for each (entity, active
    day), the event count, exact value total and active-day count over
    each trailing ``w``-day calendar window. Rows exist only for days
    the entity was ACTIVE (compose with :func:`gapfill_daily` upstream
    for a dense calendar).

    Scale: two keyed exchanges — the MAP-SIDE-COMBINED day rollup on
    (key, day), then the windows re-key the day-grain frame by entity.
    That second exchange ships only entity×day rows (tiny), which is
    deliberately cheaper than the one-exchange alternative
    (pre-repartitioning raw events by entity satisfies both clusterings
    but forfeits the pre-shuffle combine — at 100 TB the raw event
    volume dwarfs a day-grain re-shuffle). All RANGE windows share one
    partitioning and ONE sort; frames are calendar-bounded per entity.
    Value totals accumulate as DECIMAL(18,6) (the repo-wide
    order-independence rule).

    Output columns per window w: ``n_events_{w}d``, ``value_{w}d``
    (6dp-rounded), ``days_active_{w}d``."""
    if not windows or any(w < 1 for w in windows):
        raise ValueError(f"windows must be positive day counts, got {windows}")
    daily = _entity_daily(events, key_col, ts_col, value_col).withColumn(
        "__dn", F.datediff("day", F.lit("1970-01-01"))
    )
    cols = [F.col(key_col), F.col("day").cast("string").alias("day")]
    for w in windows:
        win = (
            Window.partitionBy(key_col)
            .orderBy("__dn")
            .rangeBetween(-(w - 1), 0)
        )
        cols.append(F.sum("n_events").over(win).alias(f"n_events_{w}d"))
        cols.append(
            F.round(F.sum("__dv").over(win).cast("double"), 6).alias(
                f"value_{w}d"
            )
        )
        cols.append(F.count(F.lit(1)).over(win).alias(f"days_active_{w}d"))
    return daily.select(*cols)


def enrich_with_scd2(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    order_col: str | None = None,
) -> DataFrame:
    """Point-in-time dimension enrichment: append to each fact row the
    SCD2 version whose ``[from_col, to_col)`` interval contains the fact
    timestamp — "which plan was this user on when they purchased", THE
    query a type-2 dimension exists to answer. Composes directly with
    :func:`scd2_from_log` output, or any effective-dated dimension.

    Implemented on the shuffle-once as-of join (operators/asof.py): the
    latest version with ``from_col <= ts`` per key, then an in-row
    validity mask that nulls the dimension columns when the fact falls
    PAST that version's ``to_col`` (a gapped dimension — deletes — has
    intervals that don't touch; a contiguous :func:`scd2_from_log`
    output makes the mask vacuous). Facts with no version at-or-before
    them keep null dimension columns, like a LEFT join.

    **Precondition: ``from_col`` is unique per key** (distinct change
    instants — :func:`scd2_from_log` guarantees it unless two change
    events share one timestamp exactly, which also yields a zero-length
    version no fact can land in). Pass ``order_col`` (e.g. the version
    column) to make even THAT degenerate case deterministic — the
    greatest value wins equal-``from_col`` ties via the as-of join's
    ``right_order_col``. Dimension columns colliding with fact
    column names get the as-of join's ``_right`` suffix."""
    right = dim.withColumn(ts_col, F.col(from_col)).drop(from_col)
    from intake_esm_spark.operators.asof import asof_join

    out = asof_join(
        facts, right, on=key_col, ts_col=ts_col, right_order_col=order_col
    )
    dim_cols = [c for c in out.columns if c not in facts.columns]
    to_out = to_col if to_col in dim_cols else f"{to_col}_right"
    valid = F.col(to_out).isNull() | (F.col(ts_col) < F.col(to_out))
    return out.select(
        *facts.columns,
        *[F.when(valid, F.col(c)).alias(c) for c in dim_cols],
    )


def gapfill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity daily series with calendar gaps materialized: one row
    for EVERY day between an entity's first and last activity, zero
    counts on silent days and the last active day's value carried
    forward — the resample-and-ffill step feature pipelines need before
    any fixed-stride model sees the data (a raw event rollup silently
    skips gap days; downstream lag features then span variable time).

    Output per (entity, day): ``n_events`` (0 on gaps), ``is_gap``,
    ``day_value`` (exact decimal day total, null on gaps) and
    ``carried_value`` (last non-null ``day_value`` at or before the day
    — forward fill).

    Scale: the calendar frame is entities × their own day span — bounded
    by the calendar, not the event count. Three keyed exchanges: the
    day-grain rollup on (key, day); the calendar↔activity join on the
    same compound key; the forward-fill window on ``key_col``. The
    per-entity ``sequence()`` explode is in-row (zero shuffle). Entities
    with a null key are excluded."""
    daily = _entity_daily(events, key_col, ts_col, value_col)
    # min/max reuse the rollup's (key, day) partitioning map-side; the
    # explode of sequence() is a pure projection
    calendar = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            F.col(key_col),
            F.explode(
                F.sequence("__d0", "__d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = calendar.join(daily, [key_col, "day"], "left")
    wff = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dv = F.col("__dv").cast("double")
    return joined.select(
        F.col(key_col),
        F.col("day").cast("string").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
        F.round(dv, 6).alias("day_value"),
        F.round(F.last(dv, ignorenulls=True).over(wff), 6).alias(
            "carried_value"
        ),
    )


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_type: str,
    lookback: str = "24 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    position_weights: tuple[float, float] | None = None,
) -> DataFrame:
    """Multi-touch attribution: every touch inside the conversion's
    lookback window shares the credit — ``linear`` (1/n each) by
    default, or position-based when ``position_weights=(first, last)``
    is given (first/last touches take those shares, the middle splits
    the remainder evenly; single-touch takes 1.0). The complement of
    the as-of join's last-touch model, for the marketing question
    "which campaigns PARTICIPATED in conversions".

    Output: one row per (conversion, touch) with ``credit`` in [0, 1]
    summing to 1 per attributed conversion and ``credited_value`` =
    credit × conversion value. Unattributed conversions are absent
    (count them upstream by anti-join if needed).

    Scale: the touch expansion is an equi-keyed range join (key first,
    so Catalyst hash-partitions both sides on the user before the
    interval filter) — output bounded by touches-per-lookback, the
    quantity marketing controls; the per-conversion ordering windows
    run over that bounded frame, never the corpus. Credit shares are
    exact integer-ratio doubles (n from a count window), 6dp-rounded."""
    from pyspark.sql import Window

    conv = events.filter(
        (F.col("event_type") == conversion_type)
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__cts"),
        F.col(id_col).alias("conversion_id"),
        F.col(value_col).alias("conversion_value"),
    )
    touch = events.filter(
        (F.col("event_type") == touch_type) & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k2"),
        F.col(ts_col).alias("touch_ts"),
        F.col(id_col).alias("touch_event_id"),
    )
    delta = F.expr(f"INTERVAL {lookback}")
    j = conv.join(
        touch,
        (F.col("__k") == F.col("__k2"))
        & (F.col("touch_ts") <= F.col("__cts"))
        & (F.col("touch_ts") >= F.col("__cts") - delta),
    )
    wsz = Window.partitionBy("conversion_id")
    word = Window.partitionBy("conversion_id").orderBy(
        F.col("touch_ts").asc(), F.col("touch_event_id").asc()
    )
    n = F.count(F.lit(1)).over(wsz)
    pos = F.row_number().over(word)
    if position_weights is None:
        credit = F.lit(1.0) / n.cast("double")
    else:
        w_first, w_last = float(position_weights[0]), float(position_weights[1])
        if w_first < 0 or w_last < 0 or w_first + w_last > 1.0:
            raise ValueError(
                f"position_weights must be >= 0 and sum <= 1, got {position_weights}"
            )
        mid = F.lit(1.0 - w_first - w_last) / (n - 2).cast("double")
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when((n == 2) & (pos == 1), F.lit(w_first + (1.0 - w_first - w_last) / 2.0))
            .when((n == 2) & (pos == 2), F.lit(w_last + (1.0 - w_first - w_last) / 2.0))
            .when(pos == 1, F.lit(w_first))
            .when(pos == n, F.lit(w_last))
            .otherwise(mid)
        )
    return j.select(
        "conversion_id",
        F.col("__k").alias(key_col),
        "touch_event_id",
        "touch_ts",
        "conversion_value",
        F.round(credit, 6).alias("credit"),
        F.round(credit * F.col("conversion_value"), 6).alias(
            "credited_value"
        ),
    )


def debounce_events(
    events: DataFrame,
    gap: str = "5 seconds",
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Burst deduplication (debounce): within each key, events closer
    than ``gap`` to their predecessor form a BURST (gaps-and-islands —
    the same construction as sessionization and SCD2); only the first
    event of each burst survives. The telemetry-cleaning step for
    double-clicks, retry storms, and sensor chatter.

    Exact island semantics, not the lag-only approximation: "drop if
    within gap of the PREVIOUS ROW" re-admits the third event of a
    chained burst (a, a+3s, a+6s with a 5s gap keeps event 3), while
    the island form anchors on the first KEPT event... which for
    consecutive-gap bursts is precisely the island head. Output keeps
    the full row of each survivor plus ``burst_size``.

    Scale: one key-partitioned exchange; both windows (gap detection,
    burst membership) share its sort; output bounded by burst count."""
    key_cols = key_cols or ["user_id", "event_type"]
    from pyspark.sql import Window

    base = events
    for c in key_cols:
        base = base.filter(F.col(c).isNotNull())
    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_delta = F.expr(f"INTERVAL {gap}")
    new_burst = (
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_delta)
    ).cast("int")
    marked = base.withColumn("__nb", new_burst).withColumn(
        "__burst",
        F.sum("__nb").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    wb = Window.partitionBy(*key_cols, "__burst")
    first_in_burst = F.row_number().over(
        wb.orderBy(ts_col, order_col)
    )
    out = (
        marked.withColumn("__rn", first_in_burst)
        .withColumn("burst_size", F.count(F.lit(1)).over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__nb", "__burst", "__rn")
    )
    return out


def interarrival_burstiness(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Interarrival-time burstiness per event type — the
    stream-mining "is this traffic Poisson, periodic, or bursty"
    diagnostic (Goh & Barabási 2008): per (user, type) the gaps
    between consecutive events in integer seconds, per type the gap
    moments, ``cv = σ/μ`` and ``B = (cv − 1)/(cv + 1)`` (Poisson → 0,
    periodic → −1, heavy-tailed bursts → +1).

    Scale: the consecutive pairing is a lag window PARTITIONED by
    (user, type) — entity-grain, shuffle-bounded by the user key,
    never an unpartitioned sort; the moment collapse is one
    type-keyed partial-aggregated exchange.  Determinism: timestamps
    truncate to integer epoch seconds (``unix_timestamp`` — the
    engine-portable form); gaps and their squares sum as exact
    DECIMAL(38,0) integers; cv/B are fixed IEEE expressions, 6dp.
    Ordering within a user is made total by ``tiebreak_col``;
    same-second events produce zero gaps (counted — they ARE bursts).
    Returns one row per type ``(event_type, n_gaps, mean_gap_s,
    sd_gap_s, cv, burstiness)``; cv/B null when n_gaps < 2 or μ = 0
    (every gap zero — pure same-second duplicates); a zero σ is the
    well-defined periodic case, cv = 0 and B = −1, not null."""
    from pyspark.sql import Window

    base = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(type_col).alias("__t"),
        F.col(user_col).alias("__u"),
        F.unix_timestamp(F.col(ts_col)).alias("__s"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy("__u", "__t").orderBy("__s", "__tb")
    gapped = base.select(
        "__t", (F.col("__s") - F.lag("__s").over(w)).alias("__g")
    ).filter(F.col("__g").isNotNull())
    d38 = "decimal(38,0)"
    m = gapped.groupBy("__t").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("__g").cast(d38)).alias("__sg"),
        F.sum((F.col("__g") * F.col("__g")).cast(d38)).alias("__sg2"),
    )
    n = F.col("n_gaps").cast("double")
    sg = F.col("__sg").cast("double")
    sg2 = F.col("__sg2").cast("double")
    mean = sg / n
    var = (sg2 - n * mean * mean) / (n - F.lit(1.0))
    # a perfectly periodic stream has var = 0 — that is cv = 0 and
    # B = -1 (well-defined, the periodic signature), NOT null; the
    # greatest() clamp also absorbs tiny negative float cancellation
    sd = F.when(
        F.col("n_gaps") >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))
    )
    cv = F.when(
        (F.col("n_gaps") >= 2) & (mean > 0), sd / mean
    )
    burst = F.when(cv.isNotNull(), (cv - 1.0) / (cv + 1.0))
    return m.select(
        F.col("__t").alias("event_type"),
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd, 6).alias("sd_gap_s"),
        F.round(cv, 6).alias("cv"),
        F.round(burst, 6).alias("burstiness"),
    )
