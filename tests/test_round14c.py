"""Round-14 batch 3: BPE pair counts, Holt linear-trend forecast, and
isotonic (PAV) calibration — first-principles references + guards."""

import datetime as dt
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---- BPE pair counts ------------------------------------------------------


def test_bpe_pairs_match_hand_count(spark):
    from intake_esm_spark.operators.corpus import bpe_pair_topk

    texts = [
        "low lower lowest",
        "new newer newest",
        "low low new",
        "a ab",  # 'a' is too short; 'ab' contributes one pair
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    ref = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.lower().strip().split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    ref[w[i : i + 2]] += 1
    got = bpe_pair_topk(df, top_k=100).collect()
    assert {(r["pair"], r["cnt"]) for r in got} == set(ref.items())
    # ordering: count desc, pair asc
    keys = [(-r["cnt"], r["pair"]) for r in got]
    assert keys == sorted(keys)
    # the BPE trainer's first merge on this corpus is 'lo' or 'ow'
    assert got[0]["pair"] in ("lo", "ow")


def test_bpe_pairs_topk_and_guard(spark):
    from intake_esm_spark.operators.corpus import bpe_pair_topk

    df = spark.createDataFrame(
        [("aaa bbb aaa",)], "text string"
    )
    got = bpe_pair_topk(df, top_k=1).collect()
    assert len(got) == 1 and got[0]["pair"] == "aa" and got[0]["cnt"] == 4
    with pytest.raises(ValueError, match="top_k"):
        bpe_pair_topk(df, top_k=0)


# ---- Holt linear trend ----------------------------------------------------


def _mk_events(spark, series, start="2024-03-01"):
    d0 = dt.date.fromisoformat(start)
    rows = [
        (dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(9)),
         float(v))
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_holt_matches_first_principles(spark):
    from intake_esm_spark.operators.timeseries import (
        holt_forecast_report,
    )

    rng = np.random.RandomState(170)
    n = 60
    series = np.round(50 + 2.0 * np.arange(n) + rng.normal(0, 3, n), 4)
    df = _mk_events(spark, series)
    rows = {
        r["h"]: r["forecast"]
        for r in holt_forecast_report(
            df, alpha=0.4, beta=0.2, horizon=5
        ).collect()
    }
    level = float(series[0])
    trend = float(series[1] - series[0])
    for y in series[1:]:
        prev = level
        level = 0.4 * float(y) + 0.6 * (level + trend)
        trend = 0.2 * (level - prev) + 0.8 * trend
    for h in range(1, 6):
        assert rows[h] == pytest.approx(level + h * trend, abs=1e-6), h
    # a clean slope-2 series forecasts upward ~2/day
    assert rows[5] - rows[1] == pytest.approx(4 * trend, abs=1e-6)
    assert 1.0 < trend < 3.0


def test_holt_constant_series_flat_forecast(spark):
    from intake_esm_spark.operators.timeseries import (
        holt_forecast_report,
    )

    df = _mk_events(spark, [10.0] * 30)
    rows = holt_forecast_report(df, horizon=3).collect()
    for r in rows:
        assert r["forecast"] == pytest.approx(10.0, abs=1e-9)


def test_holt_guards(spark):
    from intake_esm_spark.operators.timeseries import (
        holt_forecast_report,
        holt_linear,
    )

    df = _mk_events(spark, [1.0])
    with pytest.raises(ValueError, match="at least 2"):
        holt_forecast_report(df)
    with pytest.raises(ValueError, match="alpha"):
        holt_forecast_report(_mk_events(spark, [1.0, 2.0]), alpha=0.0)
    with pytest.raises(ValueError, match="horizon"):
        holt_forecast_report(_mk_events(spark, [1.0, 2.0]), horizon=0)
    with pytest.raises(ValueError, match="at least 2"):
        holt_linear([5.0], 0.3, 0.1)


# ---- Isotonic calibration -------------------------------------------------


def test_pav_known_example():
    """Textbook PAV: rates [.2, .6, .4, .8] with equal weights pools
    the middle violators to .5."""
    from intake_esm_spark.operators.evaluation import pav_fit

    bins = [(0, 10, 2), (1, 10, 6), (2, 10, 4), (3, 10, 8)]
    assert pav_fit(bins) == [0.2, 0.5, 0.5, 0.8]


def test_pav_weighted_and_cascade():
    """A violation that cascades back through multiple blocks, with
    unequal weights: rates [.9, .1] over n=[1, 9] pool to .2."""
    from intake_esm_spark.operators.evaluation import pav_fit

    assert pav_fit([(0, 1, 1), (1, 9, 1)]) == [0.2, 0.2]
    # already monotone input is untouched
    assert pav_fit([(0, 5, 1), (1, 5, 2), (2, 5, 4)]) == [
        0.2,
        0.4,
        0.8,
    ]


def test_isotonic_report_matches_pav_and_is_monotone(spark):
    from intake_esm_spark.operators.evaluation import (
        isotonic_calibration_report,
        pav_fit,
    )

    rng = np.random.RandomState(171)
    n = 3000
    score = np.round(rng.uniform(0, 1, n), 4)
    # true prob roughly increasing but noisy per-bin
    y = (rng.uniform(size=n) < np.clip(score + rng.normal(0, 0.2, n), 0, 1)).astype(int)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, score))),
        "label int, score double",
    )
    rows = sorted(
        isotonic_calibration_report(df, "label", "score").collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone by construction
    # replay PAV from the raw bin counts
    bins = []
    for r in rows:
        b = r["bin"]
        mask = np.minimum(9, np.maximum(0, np.floor(score * 10))) == b
        bins.append((b, int(mask.sum()), int(y[mask].sum())))
        assert r["n_units"] == int(mask.sum())
        assert r["pos_rate"] == pytest.approx(
            y[mask].sum() / mask.sum(), abs=1e-6
        )
    ref = pav_fit(bins)
    for r, v in zip(rows, ref):
        assert r["iso_rate"] == pytest.approx(v, abs=1e-6)
