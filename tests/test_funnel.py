"""Ordered-funnel analysis (operators/funnel.py).

Pins the step semantics the oracle SQL encodes: cohort = step-1 users,
each later step strictly after the previous step's per-user timestamp
and (with ``within``) inside the per-step conversion window, repeated
step types needing distinct events, and the counts report fractions.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators.funnel import funnel, funnel_counts


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: full funnel inside windows
        ("u1", "signup", _ts(0)),
        ("u1", "view", _ts(1)),
        ("u1", "purchase", _ts(2)),
        # u2: view happens BEFORE signup -> only step 1 counts
        ("u2", "view", _ts(0)),
        ("u2", "signup", _ts(1)),
        # u3: view simultaneous with signup -> strict > excludes it
        ("u3", "signup", _ts(3)),
        ("u3", "view", _ts(3)),
        # u4: view outside the 2h window, purchase irrelevant
        ("u4", "signup", _ts(0)),
        ("u4", "view", _ts(5)),
        ("u4", "purchase", _ts(6)),
        # u5: no signup -> not in cohort at all
        ("u5", "view", _ts(0)),
        ("u5", "purchase", _ts(1)),
        # u6: earliest signup is the anchor; a later signup is ignored
        ("u6", "signup", _ts(0)),
        ("u6", "signup", _ts(9)),
        ("u6", "view", _ts(1, 30)),
        # purchase within 2h of the VIEW (not the signup)
        ("u6", "purchase", _ts(3)),
    ]
    return spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")


def _by_user(df):
    return {r["user_id"]: r.asDict() for r in df.collect()}


def test_funnel_semantics(events):
    out = _by_user(funnel(events, ["signup", "view", "purchase"], within="2 hours"))
    assert set(out) == {"u1", "u2", "u3", "u4", "u6"}  # u5 has no signup
    assert out["u1"]["steps_completed"] == 3
    assert out["u1"]["t3"] == _ts(2)
    # pre-signup view doesn't count
    assert out["u2"]["steps_completed"] == 1 and out["u2"]["t2"] is None
    # simultaneous timestamp excluded by strict >
    assert out["u3"]["steps_completed"] == 1
    # outside the window
    assert out["u4"]["steps_completed"] == 1
    # window restarts at the previous step's completion
    assert out["u6"]["steps_completed"] == 3
    assert out["u6"]["t1"] == _ts(0) and out["u6"]["t2"] == _ts(1, 30)


def test_funnel_unbounded_window(events):
    out = _by_user(funnel(events, ["signup", "view", "purchase"]))
    # u4's 5h-later view now qualifies, and the 6h purchase after it
    assert out["u4"]["steps_completed"] == 3


def test_funnel_repeated_step_needs_distinct_events(spark):
    rows = [
        ("a", "view", _ts(0)),  # one view only -> can't satisfy view->view
        ("b", "view", _ts(0)),
        ("b", "view", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = _by_user(funnel(df, ["view", "view"]))
    assert out["a"]["steps_completed"] == 1
    assert out["b"]["steps_completed"] == 2 and out["b"]["t2"] == _ts(1)


def test_funnel_counts_fractions(events):
    rows = {
        r["step"]: r.asDict()
        for r in funnel_counts(
            events, ["signup", "view", "purchase"], within="2 hours"
        ).collect()
    }
    assert rows["signup"]["n_users"] == 5
    assert rows["signup"]["frac_of_cohort"] == 1.0
    assert rows["view"]["n_users"] == 2  # u1, u6
    assert rows["view"]["frac_of_cohort"] == 0.4
    assert rows["purchase"]["n_users"] == 2
    assert rows["purchase"]["step_idx"] == 3


def test_funnel_empty_steps_raises(events):
    with pytest.raises(ValueError):
        funnel(events, [])


def test_funnel_bad_interval_fails_at_plan_build(events):
    with pytest.raises(Exception):
        funnel(events, ["signup", "view"], within="12 bogons")


def test_stream_funnel_matches_batch(spark, tmp_path):
    """Events streamed in two time-ordered micro-batches must yield the
    batch funnel rows exactly (cohort set, timestamps, step counts)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.streaming.stateful import stream_funnel

    rows = [
        ("u1", "signup", _ts(0)), ("u1", "view", _ts(1)), ("u1", "purchase", _ts(2)),
        ("u2", "view", _ts(0)), ("u2", "signup", _ts(1)),
        ("u3", "signup", _ts(3)), ("u3", "view", _ts(3)),
        ("u4", "signup", _ts(0)), ("u4", "view", _ts(5)), ("u4", "purchase", _ts(6)),
        ("u5", "view", _ts(0)), ("u5", "purchase", _ts(1)),
        ("u6", "signup", _ts(0)), ("u6", "signup", _ts(9)),
        ("u6", "view", _ts(1, 30)), ("u6", "purchase", _ts(3)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    steps = ["signup", "view", "purchase"]
    batch = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"], r["steps_completed"])
        for r in stream_funnel(df, steps, within="2 hours").collect()
    }

    # split by TIME so cross-batch arrival respects per-user event order
    flat = tmp_path / "flat"
    flat.mkdir()
    early = df.filter(F.col("ts") < _ts(2))
    late = df.filter(F.col("ts") >= _ts(2))
    early.repartition(1).write.parquet(str(tmp_path / "a"))
    late.repartition(1).write.parquet(str(tmp_path / "b"))
    import glob
    import shutil

    for i, (part, name) in enumerate(
        [(tmp_path / "a", "0early"), (tmp_path / "b", "1late")]
    ):
        for f in glob.glob(str(part / "*.parquet")):
            dest = flat / f"{name}.parquet"
            shutil.copy(f, dest)
            # the file source orders micro-batches by mtime (ms grain);
            # two copies in the same ms would make batch order random
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = stream_funnel(stream, steps, within="2 hours")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM funnel_stream").collect()
    finally:
        q.stop()
    final = {}
    for r in emitted:  # later updates have >= steps_completed
        cur = final.get(r["user_id"])
        if cur is None or r["steps_completed"] >= cur["steps_completed"]:
            final[r["user_id"]] = r
    streamed = {
        u: (r["t1"], r["t2"], r["t3"], r["steps_completed"])
        for u, r in final.items()
    }
    assert streamed == batch


def test_stream_funnel_bad_interval(spark):
    from intake_esm_spark.streaming.stateful import _interval_us

    import pytest as _pytest

    with _pytest.raises(ValueError):
        _interval_us("12 bogons")
    assert _interval_us("2 hours") == 7_200_000_000


def test_funnel_counts_empty_cohort(spark):
    """No step-1 events: every step reports 0 users and a null (not
    NaN) fraction."""
    rows = [("u1", "view", _ts(1)), ("u1", "purchase", _ts(2))]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = funnel_counts(df, ["signup", "view", "purchase"]).collect()
    assert [r["n_users"] for r in sorted(out, key=lambda r: r["step_idx"])] == [0, 0, 0]
    assert all(r["frac_of_cohort"] is None for r in out)


def test_funnel_lag_stats(spark):
    """Hand-checkable lags: three users convert signup->view in 10, 20,
    60 minutes; only one reaches purchase."""
    from intake_esm_spark.operators.funnel import funnel, funnel_lag_stats

    rows = [
        ("u1", "signup", _ts(0)), ("u1", "view", _ts(0, 10)),
        ("u2", "signup", _ts(0)), ("u2", "view", _ts(0, 20)),
        ("u3", "signup", _ts(0)), ("u3", "view", _ts(1, 0)),
        ("u3", "purchase", _ts(1, 30)),
        ("u4", "signup", _ts(0)),  # never converts
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    steps = ["signup", "view", "purchase"]
    out = {
        (r["step_from"], r["step_to"]): r.asDict()
        for r in funnel_lag_stats(funnel(df, steps), steps).collect()
    }
    sv = out[("signup", "view")]
    assert sv["n_converted"] == 3
    assert sv["mean_minutes"] == 30.0
    assert sv["p50_minutes"] == 20.0       # exact middle value
    assert sv["p90_minutes"] == 52.0       # type-7: 20 + 0.8*(60-20)
    vp = out[("view", "purchase")]
    assert vp["n_converted"] == 1 and vp["p50_minutes"] == 30.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_lag_stats(funnel(df, steps), ["one"])


# --- funnel_unordered -------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")


def test_unordered_completes_in_any_order(spark):
    from intake_esm_spark.operators.funnel import funnel_unordered

    rows = [
        # user 1: reverse order — still completes
        (1, "purchase", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-02 10:00:00"),
        (1, "signup", "2024-01-03 10:00:00"),
        # user 2: only two of three
        (2, "signup", "2024-01-01 10:00:00"),
        (2, "view", "2024-01-01 11:00:00"),
        # user 3: irrelevant event only
        (3, "click", "2024-01-01 10:00:00"),
    ]
    out = {
        r["user_id"]: r
        for r in funnel_unordered(
            _ev(spark, rows), ["signup", "view", "purchase"]
        ).collect()
    }
    assert set(out) == {1, 2}  # user 3 did no step at all
    assert out[1]["completed"] is True and out[1]["steps_done"] == 3
    assert str(out[1]["t_first"]).startswith("2024-01-01")
    assert str(out[1]["t_complete"]).startswith("2024-01-03")
    assert out[2]["completed"] is False and out[2]["steps_done"] == 2
    assert out[2]["t_complete"] is None


def test_unordered_within_window_anchored_at_first(spark):
    from intake_esm_spark.operators.funnel import funnel_unordered

    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-02 00:00:00"),
        (1, "purchase", "2024-01-10 00:00:00"),  # 9 days after first
    ]
    df = _ev(spark, rows)
    ok = funnel_unordered(
        df, ["signup", "view", "purchase"], within="14 days"
    ).collect()[0]
    assert ok["completed"] is True
    tight = funnel_unordered(
        df, ["signup", "view", "purchase"], within="5 days"
    ).collect()[0]
    assert tight["completed"] is False and tight["steps_done"] == 3


def test_unordered_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.funnel import funnel_unordered

    df = _ev(spark, [(1, "a", "2024-01-01 00:00:00")])
    with _pt.raises(ValueError):
        funnel_unordered(df, [])
    with _pt.raises(ValueError):
        funnel_unordered(df, ["a", "a"])
