"""Model evaluation operators (operators/evaluation.py)."""

import pytest

from intake_esm_spark.operators.evaluation import (
    confusion_report,
    regression_metrics,
)


def test_confusion_hand_example(spark):
    """3 classes: 'a' perfect, 'b' half-recalled, 'c' never predicted,
    'x' hallucinated-only."""
    rows = [
        ("a", "a"), ("a", "a"),
        ("b", "b"), ("b", "x"),
        ("c", "a"),
    ]
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = {r["label"]: r for r in confusion_report(df, "actual", "pred").collect()}
    assert set(out) == {"a", "b", "c", "x"}
    a = out["a"]
    assert (a["n_actual"], a["n_predicted"], a["n_correct"]) == (2, 3, 2)
    assert a["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["recall"] == 1.0
    b = out["b"]
    assert b["recall"] == 0.5 and b["precision"] == 1.0
    assert b["f1"] == pytest.approx(2 * 0.5 / 1.5, abs=1e-6)
    c = out["c"]  # never predicted: recall 0, precision undefined
    assert c["recall"] == 0.0 and c["precision"] is None and c["f1"] is None
    x = out["x"]  # hallucinated: precision 0, recall undefined
    assert x["n_actual"] == 0 and x["precision"] == 0.0 and x["recall"] is None


def test_confusion_nulls_excluded(spark):
    rows = [("a", "a"), (None, "a"), ("a", None)]
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = confusion_report(df, "actual", "pred").collect()
    assert len(out) == 1 and out[0]["n_actual"] == 1


def test_regression_metrics_hand_example(spark):
    """y = [1,2,3,4], pred = [1,2,3,8]: one +4 error."""
    rows = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 8.0)]
    df = spark.createDataFrame(rows, "y double, p double")
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["n"] == 4
    assert r["mae"] == 1.0  # (0+0+0+4)/4
    assert r["rmse"] == 2.0  # sqrt(16/4)
    assert r["bias"] == 1.0  # mean error +1
    # tss = sum((y-2.5)^2) = 5; r2 = 1 - 16/5 = -2.2 (worse than mean)
    assert r["r2"] == pytest.approx(-2.2, abs=1e-6)


def test_regression_perfect_and_constant_actuals(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0)], "y double, p double"
    )
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["r2"] == 1.0
    const = spark.createDataFrame(
        [(5.0, 5.0), (5.0, 6.0)], "y double, p double"
    )
    r2 = regression_metrics(const, "y", "p").collect()[0]
    assert r2["r2"] is None  # zero total variance


# --- auc_report -------------------------------------------------------------


def test_auc_perfect_separation(spark):
    from intake_esm_spark.operators.evaluation import auc_report

    rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, "label int, score double")
    r = auc_report(df, "label", "score").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc"] == 1.0 and r["gini"] == 1.0


def test_auc_random_and_inverted(spark):
    from intake_esm_spark.operators.evaluation import auc_report

    # inverted ranking: every positive scores below every negative
    rows = [(1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)]
    df = spark.createDataFrame(rows, "label int, score double")
    r = auc_report(df, "label", "score").collect()[0]
    assert r["auc"] == 0.0 and r["gini"] == -1.0


def test_auc_ties_contribute_half(spark):
    from intake_esm_spark.operators.evaluation import auc_report

    # one pos and one neg tied, one clean pair: AUC = (1 + 0.5)/2... hand:
    # pairs: (p=.5, n=.5) -> 0.5; (p=.5, n=.1) -> 1; (p=.9,...) both 1
    rows = [(1, 0.5), (0, 0.5), (1, 0.9), (0, 0.1)]
    df = spark.createDataFrame(rows, "label int, score double")
    r = auc_report(df, "label", "score").collect()[0]
    # 4 pairs: (.5,.5)=.5 (.5,.1)=1 (.9,.5)=1 (.9,.1)=1 -> 3.5/4
    assert r["auc"] == pytest.approx(0.875, abs=1e-6)


def test_auc_single_class_null(spark):
    from intake_esm_spark.operators.evaluation import auc_report

    df = spark.createDataFrame([(1, 0.5), (1, 0.7)], "label int, score double")
    r = auc_report(df, "label", "score").collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None and r["gini"] is None


# --- calibration_report -----------------------------------------------------


def test_calibration_bins_and_gap(spark):
    from intake_esm_spark.operators.evaluation import calibration_report

    rows = [
        (1, 0.95), (1, 0.92), (0, 0.91),   # bin 9: rate 2/3, avg .926667
        (0, 0.05), (0, 0.08),              # bin 0: rate 0, avg .065
        (1, 1.0),                          # score 1.0 clamps into bin 9
        (0, -0.2), (1, 1.7),               # out-of-range saturate 0 / 9
    ]
    df = spark.createDataFrame(rows, "label int, score double")
    out = {r["bin"]: r for r in calibration_report(df, "label", "score").collect()}
    assert set(out) == {0, 9}
    assert out[0]["n_units"] == 3  # .05, .08 and the -0.2 saturate
    assert out[9]["n_units"] == 5
    assert out[9]["pos_rate"] == pytest.approx(0.8, abs=1e-6)
    assert out[0]["pos_rate"] == 0.0
    for r in out.values():
        assert r["abs_gap"] == pytest.approx(
            abs(r["pos_rate"] - r["avg_score"]), abs=2e-6
        )


def test_calibration_validation(spark):
    from intake_esm_spark.operators.evaluation import calibration_report

    df = spark.createDataFrame([(1, 0.5)], "label int, score double")
    with pytest.raises(ValueError):
        calibration_report(df, "label", "score", n_bins=1)


def test_calibration_excludes_non_finite_scores(spark):
    from intake_esm_spark.operators.evaluation import calibration_report

    # NaN/Inf scores are excluded like nulls: in non-ANSI Spark a NaN
    # would land in bin 0 and deflate avg_score while DuckDB errors on
    # the cast — the finite filter keeps both engines aligned
    rows = [
        (1, 0.05), (0, 0.05),
        (1, float("nan")), (0, float("inf")), (1, float("-inf")),
    ]
    df = spark.createDataFrame(rows, "label int, score double")
    out = calibration_report(df, "label", "score").collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 0 and r["n_units"] == 2
    assert r["avg_score"] == 0.05 and r["pos_rate"] == 0.5


# --- cohens_kappa -----------------------------------------------------------


def test_kappa_perfect_agreement(spark):
    from intake_esm_spark.operators.evaluation import cohens_kappa

    rows = [("x", "x"), ("y", "y"), ("x", "x")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["observed_agreement"] == 1.0 and r["kappa"] == 1.0


def test_kappa_hand_example(spark):
    from intake_esm_spark.operators.evaluation import cohens_kappa

    # classic 2x2: diag 20+15, margins a:(25,25), b:(30,20), N=50
    rows = (
        [("yes", "yes")] * 20 + [("yes", "no")] * 5
        + [("no", "yes")] * 10 + [("no", "no")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 2500
    assert r["observed_agreement"] == pytest.approx(po, abs=1e-6)
    assert r["expected_agreement"] == pytest.approx(pe, abs=1e-6)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


def test_kappa_constant_raters_null(spark):
    from intake_esm_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame([("x", "x"), ("x", "x")], "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # p_e = 1: chance agreement is total, kappa undefined (not perfect)
    assert r["expected_agreement"] == 1.0 and r["kappa"] is None


def test_stream_calibration_matches_batch(spark, tmp_path):
    """Two micro-batches of scored units: the LAST update per bin equals
    the whole-corpus batch calibration report exactly (integer counts +
    decimal score sums — no float accumulation drift)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.evaluation import calibration_report
    from intake_esm_spark.streaming.stateful import stream_calibration

    rows = [
        (1, 0.95), (0, 0.91), (1, 0.85), (0, 0.15),
        (1, 0.05), (0, 0.45), (1, 0.55), (0, 0.52),
    ] * 5
    df = spark.createDataFrame(rows, "label int, score double")
    batch = {
        r["bin"]: r
        for r in calibration_report(df, "label", "score").collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("score").cast("string")) % 2 == 0).coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    df.filter(F.crc32(F.col("score").cast("string")) % 2 == 1).coalesce(
        1
    ).write.parquet(str(tmp_path / "b"))
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
    out = stream_calibration(stream, "label", "score")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cal_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT * FROM cal_stream ORDER BY n_units ASC"
        ).collect()
    finally:
        q.stop()
    # the LAST emitted update per bin (max n_units — counters only grow)
    final = {}
    for r in emitted:
        final[r["bin"]] = r
    assert set(final) == set(batch)
    for b, r in final.items():
        for c in ("n_units", "avg_score", "pos_rate", "abs_gap"):
            assert r[c] == batch[b][c], (b, c, r[c], batch[b][c])


# --- pr_auc_report -----------------------------------------------------------


def test_pr_auc_hand_case_and_degenerate(spark):
    import pytest as _pt

    from intake_esm_spark.operators.evaluation import pr_auc_report

    # scores desc: 0.9(+) 0.8(-) 0.7(+) 0.6(-): AP = 1/2*1 + 1/2*(2/3)
    rows = [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.6)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = pr_auc_report(df, "label", "score").collect()[0]
    assert (out["n_pos"], out["n_neg"]) == (2, 2)
    assert out["baseline"] == 0.5
    assert out["pr_auc"] == _pt.approx(0.833333, abs=1e-6)

    # all scores tied: one step, AP = precision = base rate
    df2 = spark.createDataFrame(
        [(1, 0.5), (0, 0.5), (0, 0.5), (0, 0.5)], "label int, score double"
    )
    out2 = pr_auc_report(df2, "label", "score").collect()[0]
    assert out2["pr_auc"] == 0.25

    # single-class frame: no ranking to score
    df3 = spark.createDataFrame([(1, 0.5), (1, 0.9)], "label int, score double")
    out3 = pr_auc_report(df3, "label", "score").collect()[0]
    assert out3["pr_auc"] is None and out3["n_neg"] == 0


def test_pr_auc_perfect_ranking_is_one(spark):
    from intake_esm_spark.operators.evaluation import pr_auc_report

    rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, "label int, score double")
    assert pr_auc_report(df, "label", "score").collect()[0]["pr_auc"] == 1.0


# --- ece_report --------------------------------------------------------------


def test_ece_hand_case(spark):
    import pytest as _pt

    from intake_esm_spark.operators.evaluation import ece_report

    # bin0: labels (1,0) scores 0.05 -> gap mass |1 - 0.1| = 0.9
    # bin9: label 1 score 0.95 -> gap mass |1 - 0.95| = 0.05
    rows = [(1, 0.05), (0, 0.05), (1, 0.95)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = ece_report(df, "label", "score").collect()[0]
    assert out["n_units"] == 3 and out["n_bins_used"] == 2
    assert out["ece"] == _pt.approx((0.9 + 0.05) / 3, abs=1e-6)
    assert out["mce"] == _pt.approx(0.45, abs=1e-6)  # worst bin is bin0


def test_ece_perfectly_calibrated_is_zero(spark):
    from intake_esm_spark.operators.evaluation import ece_report

    # each bin's pos_rate equals its avg score exactly
    rows = [(1, 0.5), (0, 0.5), (1, 0.75), (1, 0.75), (1, 0.75), (0, 0.75)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = ece_report(df, "label", "score", n_bins=4).collect()[0]
    assert out["ece"] == 0.0 and out["mce"] == 0.0


# --- scoring_rules_report ----------------------------------------------------


def test_scoring_rules_hand_values(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.evaluation import scoring_rules_report

    rows = [(1, 1.0), (0, 0.0)]
    df = spark.createDataFrame(rows, "label int, score double")
    out = scoring_rules_report(df, "label", "score").collect()[0]
    assert out["brier"] == 0.0 and out["log_loss"] == 0.0  # eps-clamped

    df2 = spark.createDataFrame([(1, 0.5), (0, 0.5)], "label int, score double")
    out2 = scoring_rules_report(df2, "label", "score").collect()[0]
    assert out2["brier"] == 0.25
    assert out2["log_loss"] == _pt.approx(math.log(2.0), abs=1e-6)

    # NaN score excluded; bad eps rejected
    df3 = spark.createDataFrame(
        [(1, 0.5), (0, float("nan"))], "label int, score double"
    )
    assert scoring_rules_report(df3, "label", "score").collect()[0]["n_units"] == 1
    with _pt.raises(ValueError):
        scoring_rules_report(df2, "label", "score", eps=0.7)


# --- mcc_report --------------------------------------------------------------


def test_mcc_perfect_inverted_and_constant(spark):
    from intake_esm_spark.operators.evaluation import mcc_report

    rows = [(1, 1), (1, 1), (0, 0), (0, 0)]
    df = spark.createDataFrame(rows, "a int, p int")
    out = mcc_report(df, "a", "p").collect()[0]
    assert out["mcc"] == 1.0 and out["accuracy"] == 1.0
    assert (out["tp"], out["fp"], out["tn"], out["fn"]) == (2, 0, 2, 0)

    inv = spark.createDataFrame([(1, 0), (1, 0), (0, 1), (0, 1)], "a int, p int")
    assert mcc_report(inv, "a", "p").collect()[0]["mcc"] == -1.0

    # constant predictor: a margin is zero -> mcc undefined, not 0
    const = spark.createDataFrame([(1, 1), (0, 1)], "a int, p int")
    r = mcc_report(const, "a", "p").collect()[0]
    assert r["mcc"] is None and r["accuracy"] == 0.5


# --- psi_report --------------------------------------------------------------


def test_psi_identical_and_onesided(spark):
    import pytest as _pt

    from intake_esm_spark.operators.evaluation import psi_report

    # identical bin distributions -> PSI 0
    rows = [("base", 0.1), ("cur", 0.1), ("base", 0.9), ("cur", 0.9)]
    df = spark.createDataFrame(rows, "slice string, score double")
    out = psi_report(df, "slice", "base", "cur", "score").collect()[0]
    assert out["psi"] == 0.0 and out["n_onesided_bins"] == 0
    assert (out["n_baseline"], out["n_current"]) == (2, 2)

    # a bin populated on one side only is excluded and surfaced
    rows2 = rows + [("base", 0.5)]
    df2 = spark.createDataFrame(rows2, "slice string, score double")
    out2 = psi_report(df2, "slice", "base", "cur", "score").collect()[0]
    assert out2["n_onesided_bins"] == 1
    # shared bins now carry 1/3 vs 1/2 mass each
    import math

    term = (1 / 3 - 0.5) * math.log((1 / 3) / 0.5)
    assert out2["psi"] == _pt.approx(2 * term, abs=1e-6)

    with _pt.raises(ValueError):
        psi_report(df, "slice", "base", "base", "score")
    with _pt.raises(ValueError):
        psi_report(df, "slice", "base", "cur", "score", n_bins=1)


# --- ranking_metrics ---------------------------------------------------------


def test_ranking_metrics_hand_case(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.evaluation import ranking_metrics

    # query 1: items a(rel1,s3) b(rel0,s2) c(rel1,s1)
    #   DCG@5 = 1/log2(2) + 1/log2(4) = 1.5
    #   IDCG  = 1/log2(2) + 1/log2(3)
    # query 2: all-zero relevance -> excluded from the means
    rows = [
        (1, "a", 1, 3.0), (1, "b", 0, 2.0), (1, "c", 1, 1.0),
        (2, "d", 0, 9.0),
    ]
    df = spark.createDataFrame(rows, "q int, item string, rel int, s double")
    out = ranking_metrics(df, "q", "item", "rel", "s", k=5).collect()[0]
    assert out["n_queries_total"] == 2 and out["n_queries"] == 1
    idcg = 1.0 + 1.0 / math.log2(3.0)
    assert out["ndcg_at_k"] == _pt.approx(1.5 / idcg, abs=1e-6)
    assert out["mrr_at_k"] == 1.0

    # k truncation: with k=1 only the top item counts
    out1 = ranking_metrics(df, "q", "item", "rel", "s", k=1).collect()[0]
    assert out1["ndcg_at_k"] == 1.0  # top item is relevant, ideal@1 = 1
    with _pt.raises(ValueError):
        ranking_metrics(df, "q", "item", "rel", "s", k=0)


def test_stream_psi_matches_batch(spark, tmp_path):
    """Two micro-batches of scored slices: the LAST update per bin,
    snapshotted through psi_from_bins, equals the whole-corpus batch
    psi_report exactly (integer bin counters — the SRM-twin parity
    argument verbatim)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.evaluation import (
        psi_from_bins,
        psi_report,
    )
    from intake_esm_spark.streaming.stateful import stream_psi

    rows = (
        [("base", 0.05), ("cur", 0.07), ("base", 0.15), ("cur", 0.17)] * 4
        + [("base", 0.95)] * 3  # one-sided bin
        + [("cur", 0.55), ("base", 0.52)] * 2
    )
    df = spark.createDataFrame(rows, "slice string, score double")
    batch = psi_report(df, "slice", "base", "cur", "score").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.withColumn("__h", F.crc32(F.col("score").cast("string"))).filter(
        F.col("__h") % 2 == 0
    ).drop("__h").repartition(1).write.parquet(str(tmp_path / "a"))
    df.withColumn("__h", F.crc32(F.col("score").cast("string"))).filter(
        F.col("__h") % 2 == 1
    ).drop("__h").repartition(1).write.parquet(str(tmp_path / "b"))
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
    out = stream_psi(stream, "slice", "base", "cur", "score")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("psi_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM psi_stream").collect()
    finally:
        q.stop()
    last = {}
    for r in emitted:  # memory sink appends updates in batch order
        last[r["bin"]] = (r["__nb"], r["__nc"])
    bins = spark.createDataFrame(
        [(k, nb, nc) for k, (nb, nc) in last.items()],
        "bin int, __nb long, __nc long",
    )
    streamed = psi_from_bins(bins).collect()[0]
    for c in (
        "n_baseline",
        "n_current",
        "n_bins_used",
        "n_onesided_bins",
        "psi",
    ):
        assert streamed[c] == batch[c], c
    assert batch["n_onesided_bins"] == 1  # the 0.95 bin is base-only


def test_stream_scoring_rules_matches_batch(spark, tmp_path):
    """Two micro-batches of scored units: the LAST update equals the
    whole-corpus batch Brier/log-loss exactly (decimal term sums — the
    calibration-twin parity argument verbatim)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.evaluation import scoring_rules_report
    from intake_esm_spark.streaming.stateful import stream_scoring_rules

    rows = [
        (1, 0.95), (0, 0.91), (1, 0.85), (0, 0.15),
        (1, 0.05), (0, 0.45), (1, 0.55), (0, 0.52),
    ] * 3
    df = spark.createDataFrame(rows, "label int, score double")
    batch = scoring_rules_report(df, "label", "score").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("score").cast("string")) % 2 == 0).coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    df.filter(F.crc32(F.col("score").cast("string")) % 2 == 1).coalesce(
        1
    ).write.parquet(str(tmp_path / "b"))
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
    out = stream_scoring_rules(stream, "label", "score")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sr_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM sr_stream").collect()
    finally:
        q.stop()
    last = emitted[-1]  # memory sink appends updates in batch order
    assert last["n_units"] == batch["n_units"] == len(rows)
    assert last["brier"] == batch["brier"]
    assert last["log_loss"] == batch["log_loss"]
