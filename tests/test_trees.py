"""Histogram split finding (operators/trees.py): first-principles numpy
references for the stump, depth-2 tree structure recovery on a known
interaction, constant-feature/degenerate guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


def _ref_best_split(x, y, n_bins):
    """Brute-force the same equal-width-histogram split."""
    xq = np.round(x, 6)
    mn, mx = round(float(xq.min()), 6), round(float(xq.max()), 6)
    if mx <= mn:
        return None
    w = (mx - mn) / n_bins
    b = np.minimum(
        n_bins - 1,
        np.maximum(0, np.floor((xq - mn) / w)),
    ).astype(int)
    n, p = len(y), int(y.sum())

    def gini(nn, pp):
        if nn <= 0:
            return 0.0
        q = pp / nn
        return 1.0 - q * q - (1 - q) * (1 - q)

    parent = gini(n, p)
    best = None
    for cut in range(n_bins - 1):
        left = b <= cut
        nl, pl = int(left.sum()), int(y[left].sum())
        if nl == 0 or nl == n:
            continue
        g = parent - (
            nl / n * gini(nl, pl)
            + (n - nl) / n * gini(n - nl, p - pl)
        )
        if best is None or g > best[0]:
            best = (g, cut, nl, pl)
    if best is None:
        return None
    g, cut, nl, pl = best
    return {
        "threshold": round(mn + w * (cut + 1), 6),
        "gain": round(g, 6),
        "n_left": nl,
        "pos_left": pl,
    }


@pytest.fixture(scope="module")
def stump_frame(spark):
    rng = np.random.RandomState(150)
    n = 800
    x1 = np.round(rng.uniform(0, 10, n), 4)
    x2 = np.round(rng.normal(5, 2, n), 4)
    x3 = np.round(rng.uniform(-1, 1, n), 4)  # pure noise
    y = ((x1 > 6.3) | (rng.uniform(size=n) < 0.1)).astype(int)
    df = spark.createDataFrame(
        list(
            zip(
                map(int, y),
                map(float, x1),
                map(float, x2),
                map(float, x3),
            )
        ),
        "y int, x1 double, x2 double, x3 double",
    )
    return df, y, {"x1": x1, "x2": x2, "x3": x3}


def test_stump_matches_first_principles(spark, stump_frame):
    from intake_esm_spark.operators.trees import histogram_split_report

    df, y, xs = stump_frame
    rows = {
        r["feature"]: r
        for r in histogram_split_report(
            df, "y", ["x1", "x2", "x3"], n_bins=16
        ).collect()
    }
    for c in ("x1", "x2", "x3"):
        ref = _ref_best_split(xs[c], y, 16)
        assert rows[c]["threshold"] == pytest.approx(
            ref["threshold"], abs=1e-6
        ), c
        assert rows[c]["gain"] == pytest.approx(ref["gain"], abs=1e-6), c
        assert rows[c]["n_left"] == ref["n_left"], c
        assert rows[c]["pos_left"] == ref["pos_left"], c
        assert (
            rows[c]["n_left"] + rows[c]["n_right"] == len(y)
        ), c
    # the informative feature wins by a wide margin
    assert rows["x1"]["gain"] > 5 * max(
        rows["x2"]["gain"], rows["x3"]["gain"]
    )
    # and its threshold lands near the true boundary 6.3
    assert abs(rows["x1"]["threshold"] - 6.3) < 0.7


def test_stump_constant_feature_null_row(spark):
    from intake_esm_spark.operators.trees import histogram_split_report

    df = spark.createDataFrame(
        [(i % 2, 1.5, float(i)) for i in range(40)],
        "y int, xc double, xv double",
    )
    rows = {
        r["feature"]: r
        for r in histogram_split_report(
            df, "y", ["xc", "xv"], n_bins=8
        ).collect()
    }
    assert rows["xc"]["threshold"] is None
    assert rows["xc"]["gain"] is None
    assert rows["xv"]["threshold"] is not None


def test_stump_guards(spark, stump_frame):
    from intake_esm_spark.operators.trees import histogram_split_report

    df, *_ = stump_frame
    with pytest.raises(ValueError, match="at least one feature"):
        histogram_split_report(df, "y", [])
    with pytest.raises(ValueError, match="n_bins"):
        histogram_split_report(df, "y", ["x1"], n_bins=1)
    with pytest.raises(ValueError, match="MAX_FEATURES"):
        histogram_split_report(df, "y", [f"c{i}" for i in range(13)])


def test_tree_recovers_interaction(spark):
    """y = (x1 > 6) AND (x2 > 4): the stump sees only x1 (the larger
    marginal gain); depth 2 must then find the x2 boundary inside the
    right region while the pure left region declines to split."""
    from intake_esm_spark.operators.trees import histogram_tree_report

    rng = np.random.RandomState(151)
    n = 2000
    x1 = np.round(rng.uniform(0, 10, n), 4)
    x2 = np.round(rng.uniform(0, 10, n), 4)
    y = ((x1 > 6) & (x2 > 4)).astype(int)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x1), map(float, x2))),
        "y int, x1 double, x2 double",
    )
    rows = {
        r["node"]: r
        for r in histogram_tree_report(
            df, "y", ["x1", "x2"], n_bins=32
        ).collect()
    }
    assert set(rows) == {"root", "L", "R"}
    assert rows["root"]["feature"] == "x1"
    assert abs(rows["root"]["threshold"] - 6.0) < 0.5
    # left region (x1 below the cut) is all-zero -> no positive gain
    g = rows["L"]["gain"]
    assert g is None or g == pytest.approx(0.0, abs=1e-9)
    # right region recovers the x2 > 4 boundary exactly
    assert rows["R"]["feature"] == "x2"
    assert abs(rows["R"]["threshold"] - 4.0) < 0.5
    # the right-region split separates the classes to within one bin
    # of histogram resolution (boundary points land left of the cut)
    total_pos = rows["R"]["pos_left"] + rows["R"]["pos_right"]
    assert rows["R"]["pos_left"] <= 0.05 * total_pos
    assert rows["R"]["pos_right"] >= 0.95 * total_pos
    # child region sizes partition the corpus
    assert (
        rows["L"]["n_left"] + rows["L"]["n_right"]
        + rows["R"]["n_left"] + rows["R"]["n_right"]
        == n
    ) or (
        rows["L"]["n_left"] is None
        and rows["R"]["n_left"] + rows["R"]["n_right"]
        == rows["root"]["n_right"]
    )


def test_tree_pure_child_reports_null(spark):
    """A child region that is label-pure has zero gain everywhere —
    the node row must carry null split fields, not a fabricated cut."""
    from intake_esm_spark.operators.trees import histogram_tree_report

    rng = np.random.RandomState(152)
    n = 400
    x1 = np.round(rng.uniform(0, 10, n), 4)
    x2 = np.round(rng.uniform(0, 10, n), 4)
    y = (x1 > 5).astype(int)  # perfectly separable on x1
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x1), map(float, x2))),
        "y int, x1 double, x2 double",
    )
    rows = {
        r["node"]: r
        for r in histogram_tree_report(
            df, "y", ["x1", "x2"], n_bins=16
        ).collect()
    }
    assert rows["root"]["feature"] == "x1"
    # both children are pure -> no further split has positive gain;
    # gain 0.0 splits are allowed only if they beat nothing — the
    # scan keeps the first candidate, so assert gain is null-or-zero
    for node in ("L", "R"):
        g = rows[node]["gain"]
        assert g is None or g == pytest.approx(0.0, abs=1e-9)


def test_stream_binned_histogram_matches_batch(spark, tmp_path):
    """Two micro-batches: the LAST update snapshot of the streaming
    (feature, bin) histogram, tailed into the SAME
    best_splits_from_hist, equals the whole-corpus batch split over
    the same fixed boundaries — exactly (integer counts)."""
    import glob
    import shutil

    from intake_esm_spark.operators.trees import (
        _hist_rows_to_dict,
        best_splits_from_hist,
        binned_histogram,
    )
    from intake_esm_spark.streaming.stateful import (
        stream_binned_histogram,
    )

    rng = np.random.RandomState(153)
    n = 500
    x1 = np.round(rng.uniform(0, 10, n), 4)
    x2 = np.round(rng.normal(5, 2, n), 4)
    y = ((x1 > 4.2) | (rng.uniform(size=n) < 0.15)).astype(int)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x1), map(float, x2))),
        "y int, x1 double, x2 double",
    )
    ranges = {"x1": (0.0, 10.0), "x2": (-3.0, 13.0)}
    batch = best_splits_from_hist(
        _hist_rows_to_dict(
            binned_histogram(df, "y", ["x1", "x2"], ranges, 16)
        ),
        ranges,
        ["x1", "x2"],
        16,
    )

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.col("y") == 1).repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.filter(F.col("y") == 0).repartition(1).write.parquet(
        str(tmp_path / "b")
    )
    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_binned_histogram(stream, "y", ["x1", "x2"], ranges, 16)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hist_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM hist_stream").collect()
    finally:
        q.stop()
    stream_split = best_splits_from_hist(
        _hist_rows_to_dict(emitted), ranges, ["x1", "x2"], 16
    )
    assert stream_split == batch
    # and the fixed-range guard
    import pytest as _pt

    with _pt.raises(ValueError, match="no binnable"):
        stream_binned_histogram(
            stream, "y", ["x1"], {"x1": (5.0, 5.0)}, 16
        )
