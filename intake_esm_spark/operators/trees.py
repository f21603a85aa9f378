"""Histogram-based decision-tree split finding — the distributed-GBDT
primitive (LightGBM/XGBoost-hist): bin every feature into a bounded
equal-width histogram in ONE partial-aggregated pass, then scan the
B-bin sidecar for the best impurity split on the driver.

This is the piece of tree learning that actually has a 100 TB story:
the corpus crosses the wire once as ``|features| × n_bins`` count rows
(map-side combined — the exchange carries a few hundred rows per
partition regardless of data size), and every candidate threshold is
evaluated from the cumulative histogram, never by re-scanning.  A
depth-d tree is d more of the same pass filtered to each node's region
— :func:`histogram_tree_report` demonstrates depth 2.

No reference counterpart (`/root/reference/intake_esm/` has no ML
surface); extension family, statsmodels/sklearn-adjacent semantics
(sklearn ``DecisionTreeClassifier(max_depth=1)`` on pre-binned
features picks the same split when bins align).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_FEATURES = 12
MAX_BINS = 256


def _q6(col: str):
    return F.round(F.col(col).cast("double"), 6)


def feature_ranges(
    df: DataFrame, x_cols: list[str]
) -> dict[str, tuple[float, float]]:
    """ONE 1-row aggregate: the 6dp min/max of every feature — the bin
    boundaries every later pass (and the oracle) derives from."""
    aggs = []
    for i, c in enumerate(x_cols):
        aggs.append(F.min(_q6(c)).alias(f"mn_{i}"))
        aggs.append(F.max(_q6(c)).alias(f"mx_{i}"))
    row = df.agg(*aggs).collect()[0]
    return {
        c: (row[f"mn_{i}"], row[f"mx_{i}"])
        for i, c in enumerate(x_cols)
    }


def _bin_expr(col: str, mn: float, w: float, n_bins: int):
    """The shared bin id: ``min(B-1, floor((x₆ − mn)/w))`` over LITERAL
    boundaries — identical IEEE arithmetic in Spark and the oracle."""
    raw = F.floor((_q6(col) - F.lit(mn)) / F.lit(w))
    return F.least(
        F.lit(n_bins - 1), F.greatest(F.lit(0), raw)
    ).cast("int")


def binned_histogram_frame(
    df: DataFrame,
    label_col: str,
    x_cols: list[str],
    ranges: dict[str, tuple[float, float]],
    n_bins: int,
) -> DataFrame | None:
    """The per-(feature, bin) ``(cnt, pos)`` pass AS A PLAN: the
    feature fan-out is an in-row explode(array(struct...)) —
    |features| rows per input row, map-side combined down to the
    bounded ``|features| × n_bins`` grid before the exchange.  Batch
    callers collect it (:func:`binned_histogram`); the streaming twin
    (#28, ``streaming.stateful.stream_binned_histogram``) runs the
    IDENTICAL plan as a streaming aggregation over FIXED caller-
    supplied boundaries — counts are additive integers, so snapshots
    equal the batch grid exactly.  Constant features (mn == mx) are
    skipped here and reported as no-split rows by the finish; returns
    None when no feature is binnable."""
    lab = F.col(label_col).cast("int")
    structs = []
    for c in x_cols:
        mn, mx = ranges[c]
        if mn is None or mx is None or mx <= mn:
            continue
        w = (float(mx) - float(mn)) / n_bins
        structs.append(
            F.struct(
                F.lit(c).alias("feature"),
                _bin_expr(c, float(mn), w, n_bins).alias("bin"),
            )
        )
    if not structs:
        return None
    pairs = df.filter(
        lab.isNotNull() & F.col(label_col).cast("int").isin(0, 1)
    ).select(
        lab.alias("__y"), F.explode(F.array(*structs)).alias("__fb")
    )
    return pairs.groupBy(
        F.col("__fb.feature").alias("feature"),
        F.col("__fb.bin").alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("__y").alias("pos"),
    )


def binned_histogram(
    df: DataFrame,
    label_col: str,
    x_cols: list[str],
    ranges: dict[str, tuple[float, float]],
    n_bins: int,
) -> list:
    """ONE partial-aggregated pass: the collected form of
    :func:`binned_histogram_frame`."""
    frame = binned_histogram_frame(df, label_col, x_cols, ranges, n_bins)
    return [] if frame is None else frame.collect()


def _gini(n: int, p: int) -> float:
    if n <= 0:
        return 0.0
    q = p / n
    return 1.0 - q * q - (1.0 - q) * (1.0 - q)


def best_splits_from_hist(
    hist: dict[str, dict[int, tuple[int, int]]],
    ranges: dict[str, tuple[float, float]],
    x_cols: list[str],
    n_bins: int,
) -> list[tuple]:
    """Driver-side split scan over the bounded histogram — ONE shared
    implementation for the Spark operator and the DuckDB oracle
    builder.  For each feature: cumulative ``(n, pos)`` over bins,
    gain = parent gini − weighted child gini at every boundary, best
    boundary wins (first on ties — the deterministic left-most rule).
    Returns one tuple per feature ``(feature, threshold, gain,
    n_left, n_right, pos_left, pos_right)`` — all-null split fields
    for constant or splitless features."""
    out = []
    for c in x_cols:
        mn, mx = ranges.get(c, (None, None))
        bins = hist.get(c, {})
        total_n = sum(v[0] for v in bins.values())
        total_p = sum(v[1] for v in bins.values())
        if (
            mn is None
            or mx is None
            or mx <= mn
            or total_n == 0
        ):
            out.append((c, None, None, None, None, None, None))
            continue
        w = (float(mx) - float(mn)) / n_bins
        parent = _gini(total_n, total_p)
        best = None  # (gain, b, nl, pl)
        nl = pl = 0
        for b in range(n_bins - 1):
            cb = bins.get(b, (0, 0))
            nl += cb[0]
            pl += cb[1]
            nr = total_n - nl
            pr = total_p - pl
            if nl == 0 or nr == 0:
                continue
            gain = parent - (
                nl / total_n * _gini(nl, pl)
                + nr / total_n * _gini(nr, pr)
            )
            if best is None or gain > best[0]:
                best = (gain, b, nl, pl)
        if best is None:
            out.append((c, None, None, None, None, None, None))
            continue
        gain, b, nl, pl = best
        thr = round(float(mn) + w * (b + 1), 6)
        out.append(
            (
                c,
                thr,
                round(gain, 6),
                nl,
                total_n - nl,
                pl,
                total_p - pl,
            )
        )
    return out


_SPLIT_SCHEMA = (
    "feature string, threshold double, gain double, n_left bigint,"
    " n_right bigint, pos_left bigint, pos_right bigint"
)


def _check_args(x_cols: list[str], n_bins: int) -> None:
    if not x_cols:
        raise ValueError("split: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"split: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    if not 2 <= n_bins <= MAX_BINS:
        raise ValueError(
            f"split: n_bins must be in [2, {MAX_BINS}], got {n_bins}"
        )


def _hist_rows_to_dict(rows: list) -> dict:
    hist: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        hist.setdefault(r["feature"], {})[int(r["bin"])] = (
            int(r["cnt"]),
            int(r["pos"]),
        )
    return hist


def histogram_split_report(
    df: DataFrame,
    label_col: str,
    x_cols: list[str],
    n_bins: int = 16,
) -> DataFrame:
    """Best equal-width-histogram split of a 0/1 label per feature —
    the decision-stump / GBDT-node primitive.  TWO distributed passes
    regardless of data size: the 1-row range aggregate and the
    ``|features| × n_bins`` histogram (partial-aggregated in-row
    explode — at width the corpus never shuffles; a single-file source
    pays one narrow row-level spread, see below); the candidate scan is driver
    arithmetic over the bounded sidecar through the SAME shared
    :func:`best_splits_from_hist` the oracle replays.  Returns one row
    per feature (stable ``x_cols`` order preserved in values, not row
    order) ``(feature, threshold, gain, n_left, n_right, pos_left,
    pos_right)``; null split fields for constant features."""
    _check_args(x_cols, n_bins)
    # r14: narrow projection + pin, NO spread — the stump is only two
    # cheap passes (1-row range + histogram), so the row-level exchange
    # costs more than the parallelism buys (paired r14 measurement:
    # spread 1.8-2.9 s vs unspread 1.3-1.8 s at bench scale). The
    # depth-2 tree keeps its spread: six region passes amortize it.
    base = (
        df.filter(F.col(label_col).cast("int").isin(0, 1)).select(
            *dict.fromkeys([label_col, *x_cols])
        )
    ).localCheckpoint(eager=False)  # pinned: range + histogram passes
    ranges = feature_ranges(base, x_cols)
    hist = _hist_rows_to_dict(
        binned_histogram(base, label_col, x_cols, ranges, n_bins)
    )
    rows = best_splits_from_hist(hist, ranges, x_cols, n_bins)
    return df.sparkSession.createDataFrame(rows, _SPLIT_SCHEMA)


def histogram_tree_report(
    df: DataFrame,
    label_col: str,
    x_cols: list[str],
    n_bins: int = 16,
) -> DataFrame:
    """Depth-2 histogram tree: the root split, then the SAME pass
    re-run on each child region (filtered by the root threshold —
    Catalyst pushes the region predicate into the scan, so each level
    is one more corpus pass, the distributed-GBDT recurrence).
    Returns up to three rows ``(node 'root'|'L'|'R', feature,
    threshold, gain, n_left, n_right, pos_left, pos_right)`` — a
    child that cannot split (degenerate region) reports null split
    fields; if the ROOT cannot split the result is the root row
    alone."""
    _check_args(x_cols, n_bins)
    from intake_esm_spark.operators._util import _spread

    # r14: narrow projection + spread before the pin — the six region
    # passes (3 ranges + 3 histograms) otherwise all inherit the
    # source's single partition (see histogram_split_report)
    base = _spread(
        df.filter(F.col(label_col).cast("int").isin(0, 1)).select(
            *dict.fromkeys([label_col, *x_cols])
        )
    ).localCheckpoint(eager=False)  # pinned: feeds all three passes
    ranges = feature_ranges(base, x_cols)
    hist = _hist_rows_to_dict(
        binned_histogram(base, label_col, x_cols, ranges, n_bins)
    )
    roots = best_splits_from_hist(hist, ranges, x_cols, n_bins)
    valid = [r for r in roots if r[2] is not None]
    spark = df.sparkSession
    if not valid:
        rows = [("root", None, None, None, None, None, None, None)]
        return spark.createDataFrame(rows, "node string, " + _SPLIT_SCHEMA)
    root = max(valid, key=lambda r: r[2])
    rows = [("root", *root)]
    for node, keep in (
        ("L", _q6(root[0]) < F.lit(root[1])),
        ("R", _q6(root[0]) >= F.lit(root[1])),
    ):
        side = base.filter(keep)
        rng = feature_ranges(side, x_cols)
        h = _hist_rows_to_dict(
            binned_histogram(side, label_col, x_cols, rng, n_bins)
        )
        cand = [
            r
            for r in best_splits_from_hist(h, rng, x_cols, n_bins)
            if r[2] is not None
        ]
        if cand:
            rows.append((node, *max(cand, key=lambda r: r[2])))
        else:
            rows.append(
                (node, None, None, None, None, None, None, None)
            )
    return spark.createDataFrame(rows, "node string, " + _SPLIT_SCHEMA)
