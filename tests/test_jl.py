"""Johnson-Lindenstrauss distortion audit (operators/matrix.py
jl_distortion_report): numpy replay of the deterministic projection,
the JL concentration property across k, and guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def emb_frame(spark):
    rng = np.random.RandomState(180)
    n, d = 120, 32
    X = np.round(rng.normal(0, 1, (n, d)), 4)
    labels = np.arange(n) % 4
    rows = [
        (int(i), [float(v) for v in X[i]], int(labels[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    return df, X, labels


def test_jl_matches_numpy_replay(spark, emb_frame):
    from intake_esm_spark.operators.matrix import (
        jl_distortion_report,
        jl_sign_matrix,
    )

    df, X, labels = emb_frame
    k = 12
    row = jl_distortion_report(df, k=k).collect()[0]
    S = np.array(jl_sign_matrix(X.shape[1], k))
    Y = (X @ S.T) / np.sqrt(k)
    ratios = []
    n_pairs = 0
    for blk in np.unique(labels):
        idx = np.where(labels == blk)[0]
        for ii in range(len(idx)):
            for jj in range(ii + 1, len(idx)):
                a, b = idx[ii], idx[jj]
                n_pairs += 1
                dx = float(((X[a] - X[b]) ** 2).sum())
                dy = float(((Y[a] - Y[b]) ** 2).sum())
                if dx > 0:
                    ratios.append(dy / dx)
    ratios = np.array(ratios)
    assert row["n_pairs"] == n_pairs
    assert row["k"] == k
    assert row["mean_ratio"] == pytest.approx(ratios.mean(), abs=1e-4)
    assert row["min_ratio"] == pytest.approx(ratios.min(), abs=1e-4)
    assert row["max_ratio"] == pytest.approx(ratios.max(), abs=1e-4)
    assert row["frac_within_20pct"] == pytest.approx(
        ((ratios >= 0.8) & (ratios <= 1.2)).mean(), abs=1e-3
    )


def test_jl_concentration_improves_with_k(spark, emb_frame):
    """The JL guarantee: mean ratio ~ 1 at every k; the spread
    tightens monotonically as k grows; k = d reproduces distances
    almost exactly in distribution width."""
    from intake_esm_spark.operators.matrix import jl_distortion_report

    df, X, _ = emb_frame
    fracs = {}
    for k in (4, 16, 32):
        r = jl_distortion_report(df, k=k).collect()[0]
        assert abs(r["mean_ratio"] - 1.0) < 0.2, k
        fracs[k] = r["frac_within_20pct"]
    assert fracs[4] < fracs[16] < fracs[32]


def test_jl_sign_matrix_deterministic_and_balanced():
    from intake_esm_spark.operators.matrix import jl_sign_matrix

    a = jl_sign_matrix(64, 16)
    b = jl_sign_matrix(64, 16)
    assert a == b
    c = jl_sign_matrix(64, 16, seed="other")
    assert a != c
    flat = [v for row in a for v in row]
    assert set(flat) == {1.0, -1.0}
    # md5 parity is ~balanced
    assert 0.4 < (np.array(flat) == 1.0).mean() < 0.6


def test_jl_guards_and_degenerate_pairs(spark):
    from intake_esm_spark.operators.matrix import jl_distortion_report

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0], 0),
            (1, [1.0, 2.0], 0),  # identical -> degenerate pair
            (2, [3.0, 4.0], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    row = jl_distortion_report(df, k=2).collect()[0]
    assert row["n_pairs"] == 3  # degenerate pair still counted
    with pytest.raises(ValueError, match="k must be"):
        jl_distortion_report(df, k=0)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="no embeddings"):
        jl_distortion_report(empty, k=2)
