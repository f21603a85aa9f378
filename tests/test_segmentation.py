"""RFM quintiles + ABC classification (operators/segmentation.py)."""

import pytest

from intake_esm_spark.operators.segmentation import (
    abc_classification,
    rfm_segments,
)


def test_rfm_scores_and_segment(spark):
    """5 users, n_tiles=5: each lands alone in a tile per metric; the
    best-on-everything user scores 555."""
    rows = []
    for u in range(1, 6):
        # user u: last active day u (u=5 most recent), u events, value u*10
        for i in range(u):
            rows.append((u, f"2024-01-0{u} 10:00:00", 10.0 * u))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r["user_id"]: r.asDict() for r in rfm_segments(df).collect()}
    assert out[5]["recency_days"] == 0 and out[1]["recency_days"] == 4
    assert out[5]["segment"] == "555"
    assert out[1]["segment"] == "111"
    assert out[3]["r_score"] == 3 and out[3]["f_score"] == 3
    assert out[2]["monetary"] == 40.0  # 2 events x 20


def test_rfm_validation(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with pytest.raises(ValueError):
        rfm_segments(df, n_tiles=1)


def test_abc_classes_hand_example(spark):
    """Values 80, 15, 5 over keys 1,2,3: cum shares .8, .95, 1.0 ->
    classes A, B, C (boundaries inclusive)."""
    df = spark.createDataFrame(
        [(1, 80.0), (2, 15.0), (3, 5.0)], "k long, v double"
    )
    out = {r["k"]: r.asDict() for r in abc_classification(df, "k", "v").collect()}
    assert out[1]["abc_class"] == "A" and out[1]["cum_share"] == 0.8
    assert out[2]["abc_class"] == "B" and out[2]["cum_share"] == 0.95
    assert out[3]["abc_class"] == "C" and out[3]["cum_share"] == 1.0


def test_abc_tie_resolution_by_key(spark):
    df = spark.createDataFrame(
        [(2, 50.0), (1, 50.0)], "k long, v double"
    )
    out = {r["k"]: r["cum_share"] for r in abc_classification(df, "k", "v").collect()}
    assert out[1] == 0.5 and out[2] == 1.0  # key asc breaks the tie


def test_abc_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError):
        abc_classification(df, "k", "v", a_cut=0.9, b_cut=0.8)
