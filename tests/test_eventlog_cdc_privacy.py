"""Event-log shaping (transitions/SCD2/gap-fill), snapshot CDC,
k-anonymity, and deterministic splits."""

import datetime as dt
import hashlib

import pytest

from intake_esm_spark.operators.cdc import snapshot_diff
from intake_esm_spark.operators.eventlog import (
    gapfill_daily,
    scd2_from_log,
    transition_matrix,
)
from intake_esm_spark.operators.privacy import (
    k_anonymity_report,
    suppress_quasi,
)
from intake_esm_spark.operators.sampling import (
    HASH_BUCKETS,
    deterministic_split,
)


def _t(day, h=0, m=0):
    return dt.datetime(2024, 3, day, h, m)


EV_SCHEMA = "user_id long, event_type string, ts timestamp, event_id long, value double"


# ---------------------------------------------------------------------------
# transition_matrix


@pytest.fixture(scope="module")
def path_events(spark):
    rows = [
        (1, "A", _t(1, 0), 1, 1.0),
        (1, "B", _t(1, 1), 2, 1.0),
        (1, "B", _t(1, 2), 3, 1.0),
        (1, "A", _t(1, 3), 4, 1.0),
        (2, "B", _t(1, 0), 5, 1.0),
        (2, "A", _t(1, 1), 6, 1.0),
        (None, "X", _t(1, 0), 7, 1.0),  # null user excluded
        (3, None, _t(1, 0), 8, 1.0),  # null type is not a state
        (3, "A", _t(1, 1), 9, 1.0),
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_transitions_with_terminal(path_events):
    out = {
        (r["from_type"], r["to_type"]): r.asDict()
        for r in transition_matrix(path_events, terminal="end").collect()
    }
    assert out[("A", "B")]["n_transitions"] == 1
    assert out[("B", "B")]["n_transitions"] == 1
    assert out[("B", "A")]["n_transitions"] == 2
    # u1's final A, u2's final A, u3's only (non-null) event
    assert out[("A", "end")]["n_transitions"] == 3
    # from-state A: 1 to B + 3 to end
    assert out[("A", "B")]["prob"] == 0.25
    assert out[("A", "end")]["prob"] == 0.75
    # each from-state's probabilities sum to 1 with a terminal
    a_total = sum(v["prob"] for k, v in out.items() if k[0] == "A")
    assert abs(a_total - 1.0) < 1e-9


def test_transitions_without_terminal_drops_final(path_events):
    out = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in transition_matrix(path_events).collect()
    }
    assert ("A", None) not in out and ("A", "end") not in out
    assert out == {("A", "B"): 1, ("B", "B"): 1, ("B", "A"): 2}


def test_top_paths_overlapping_complete_windows(spark):
    from intake_esm_spark.operators.eventlog import top_paths

    rows = [
        (1, "a", _t(1, 0), 1, 0.0),
        (1, "b", _t(1, 1), 2, 0.0),
        (1, "c", _t(1, 2), 3, 0.0),
        (1, "d", _t(1, 3), 4, 0.0),
        (2, "a", _t(1, 0), 5, 0.0),
        (2, "b", _t(1, 1), 6, 0.0),
        (2, "c", _t(1, 2), 7, 0.0),
        (3, "a", _t(1, 0), 8, 0.0),  # too short: no complete window
        (3, "b", _t(1, 1), 9, 0.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["path"]: r["n_paths"] for r in top_paths(df, length=3).collect()}
    assert out == {"a>b>c": 2, "b>c>d": 1}  # overlapping windows, u3 absent
    with pytest.raises(ValueError):
        top_paths(df, length=1)


# ---------------------------------------------------------------------------
# scd2_from_log


def test_scd2_gaps_and_islands(spark):
    rows = [
        (1, "A", _t(1), 1, 0.0),
        (1, "A", _t(2), 2, 0.0),  # repeat: collapses
        (1, "B", _t(3), 3, 0.0),
        (1, "A", _t(4), 4, 0.0),  # back to A: NEW version, not merged
        (None, "Z", _t(1), 5, 0.0),  # null key excluded
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = sorted(
        scd2_from_log(df, "user_id", "event_type").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["event_type"], r["version"]) for r in out] == [
        ("A", 1),
        ("B", 2),
        ("A", 3),
    ]
    assert out[0]["effective_from"] == _t(1)
    assert out[0]["effective_to"] == _t(3)  # closed by B, not by the repeat
    assert out[2]["effective_to"] is None
    assert [r["is_current"] for r in out] == [0, 0, 1]


def test_scd2_null_attribute_is_a_value(spark):
    rows = [
        (2, None, _t(1), 1, 0.0),
        (2, None, _t(2), 2, 0.0),  # null==null: same island (null-safe)
        (2, "A", _t(3), 3, 0.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = sorted(
        scd2_from_log(df, "user_id", "event_type").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["event_type"], r["version"]) for r in out] == [(None, 1), ("A", 2)]
    assert out[0]["effective_to"] == _t(3)


def test_scd2_same_ts_ordered_by_event_id(spark):
    rows = [(3, "B", _t(1), 20, 0.0), (3, "A", _t(1), 10, 0.0)]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = sorted(
        scd2_from_log(df, "user_id", "event_type").collect(),
        key=lambda r: r["version"],
    )
    assert [r["event_type"] for r in out] == ["A", "B"]


# ---------------------------------------------------------------------------
# gapfill_daily


def test_gapfill_zero_days_and_forward_fill(spark):
    rows = [
        (1, "p", _t(1), 1, 10.0),
        (1, "p", _t(1, 5), 2, 5.0),
        # day 2 silent
        (1, "p", _t(3), 3, None),  # active day with NULL value total
        (1, "p", _t(4), 4, 2.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["day"]: r.asDict() for r in gapfill_daily(df).collect()}
    assert len(out) == 4  # full calendar span
    assert out["2024-03-01"]["n_events"] == 2
    assert out["2024-03-01"]["day_value"] == 15.0
    assert out["2024-03-02"]["n_events"] == 0
    assert out["2024-03-02"]["is_gap"] == 1
    assert out["2024-03-02"]["day_value"] is None
    assert out["2024-03-02"]["carried_value"] == 15.0  # forward fill
    # day 3 is ACTIVE (not a gap) but its value total is null — the
    # fill must carry day 1's total through it
    assert out["2024-03-03"]["is_gap"] == 0
    assert out["2024-03-03"]["day_value"] is None
    assert out["2024-03-03"]["carried_value"] == 15.0
    assert out["2024-03-04"]["carried_value"] == 2.0


def test_gapfill_spans_are_per_user(spark):
    rows = [
        (1, "p", _t(1), 1, 1.0),
        (1, "p", _t(5), 2, 1.0),
        (2, "p", _t(10), 3, 1.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = gapfill_daily(df).collect()
    days = {r["user_id"]: set() for r in out}
    for r in out:
        days[r["user_id"]].add(r["day"])
    assert len(days[1]) == 5  # 1..5 inclusive
    assert days[2] == {"2024-03-10"}  # no bleed into user 1's span


def test_stream_transition_pairs_matches_batch(spark, tmp_path):
    """Two time-ordered micro-batches: total emitted pairs (including
    the cross-batch boundary pair per user) grouped and counted must
    equal the batch transition matrix (terminal=None form)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.eventlog import transition_matrix
    from intake_esm_spark.streaming.stateful import stream_transition_pairs

    rows = [
        (1, "a", _t(1, 0), 1, 0.0),
        (1, "b", _t(1, 1), 2, 0.0),
        (1, "c", _t(2, 1), 3, 0.0),  # in batch 2: boundary pair b->c
        (2, "a", _t(1, 0), 4, 0.0),
        (2, "a", _t(2, 2), 5, 0.0),  # boundary pair a->a
        (None, "x", _t(1, 0), 6, 0.0),
        (3, None, _t(1, 0), 7, 0.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    batch = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in transition_matrix(df).collect()
    }
    flat = tmp_path / "flat"
    flat.mkdir()
    df.filter(F.col("ts") < _t(2)).repartition(1).write.parquet(str(tmp_path / "a"))
    df.filter(F.col("ts") >= _t(2)).repartition(1).write.parquet(str(tmp_path / "b"))
    for i, (part, name) in enumerate(
        [(tmp_path / "a", "0early"), (tmp_path / "b", "1late")]
    ):
        for f in glob.glob(str(part / "*.parquet")):
            dest = flat / f"{name}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = stream_transition_pairs(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("pairs_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT from_type, to_type, count(*) AS n FROM pairs_stream GROUP BY 1, 2"
        ).collect()
    finally:
        q.stop()
    streamed = {(r["from_type"], r["to_type"]): r["n"] for r in emitted}
    assert streamed == batch
    assert streamed[("b", "c")] == 1  # the cross-batch boundary pair
    assert streamed[("a", "a")] == 1


# ---------------------------------------------------------------------------
# enrich_with_scd2


def test_enrich_with_scd2_point_in_time(spark):
    from intake_esm_spark.operators.eventlog import (
        enrich_with_scd2,
        scd2_from_log,
    )

    log = spark.createDataFrame(
        [
            (1, "bronze", _t(1), 1, 0.0),
            (1, "gold", _t(5), 2, 0.0),
        ],
        EV_SCHEMA,
    )
    dim = scd2_from_log(log, "user_id", "event_type").select(
        "user_id", "event_type", "effective_from", "effective_to", "version"
    )
    facts = spark.createDataFrame(
        [
            (101, 1, _t(2)),   # inside bronze
            (102, 1, _t(5)),   # exactly at the gold boundary -> gold
            (103, 1, _t(9)),   # open-ended current version
            (104, 2, _t(2)),   # no dimension rows for this key
        ],
        "fact_id long, user_id long, ts timestamp",
    )
    out = {
        r["fact_id"]: (r["event_type"], r["version"])
        for r in enrich_with_scd2(facts, dim, "user_id").collect()
    }
    assert out[101] == ("bronze", 1)
    assert out[102] == ("gold", 2)
    assert out[103] == ("gold", 2)
    assert out[104] == (None, None)


def test_enrich_with_scd2_gapped_dim_nulls_out(spark):
    """A gapped dimension (deletes): a fact AFTER a closed interval but
    BEFORE the next one starts must get nulls, not the stale version."""
    from intake_esm_spark.operators.eventlog import enrich_with_scd2

    dim = spark.createDataFrame(
        [
            (1, "a", _t(1), _t(2), 1),
            (1, "b", _t(5), None, 2),
        ],
        "user_id long, attr string, effective_from timestamp, "
        "effective_to timestamp, version int",
    )
    facts = spark.createDataFrame(
        [(201, 1, _t(3))], "fact_id long, user_id long, ts timestamp"
    )
    out = enrich_with_scd2(facts, dim, "user_id").collect()[0]
    assert out["attr"] is None and out["version"] is None


# ---------------------------------------------------------------------------
# stream_scd2


def test_stream_scd2_matches_batch(spark, tmp_path):
    """Events streamed in two time-ordered micro-batches: last-write-wins
    per (key, version) over the update-mode emissions must equal the
    batch SCD2 rows exactly (values, intervals, version numbers,
    is_current flags) — including a null-attribute island."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.streaming.stateful import stream_scd2

    rows = [
        (1, "X", _t(1), 1, 0.0),
        (1, "X", _t(2), 2, 0.0),   # repeat: no new version
        (1, "Y", _t(3), 3, 0.0),
        (1, "X", _t(4), 4, 0.0),   # back to X: version 3
        (2, None, _t(1), 5, 0.0),  # null attribute opens an island
        (2, None, _t(2), 6, 0.0),
        (2, "Z", _t(4), 7, 0.0),
        (None, "W", _t(1), 8, 0.0),  # null key excluded
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    batch = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["effective_from"],
            r["effective_to"],
            r["is_current"],
        )
        for r in stream_scd2(df, "user_id", "event_type").collect()
    }

    flat = tmp_path / "flat"
    flat.mkdir()
    early = df.filter(F.col("ts") < _t(3))
    late = df.filter(F.col("ts") >= _t(3))
    early.repartition(1).write.parquet(str(tmp_path / "a"))
    late.repartition(1).write.parquet(str(tmp_path / "b"))
    for i, (part, name) in enumerate(
        [(tmp_path / "a", "0early"), (tmp_path / "b", "1late")]
    ):
        for f in glob.glob(str(part / "*.parquet")):
            dest = flat / f"{name}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = stream_scd2(stream, "user_id", "event_type")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("scd2_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM scd2_stream").collect()
    finally:
        q.stop()
    final = {}
    for r in emitted:  # memory sink appends in emission order
        final[(r["user_id"], r["version"])] = (
            r["event_type"],
            r["effective_from"],
            r["effective_to"],
            r["is_current"],
        )
    assert final == batch
    # sanity on the shape itself: user 1 has three versions X/Y/X
    assert [final[(1, v)][0] for v in (1, 2, 3)] == ["X", "Y", "X"]
    assert final[(2, 1)][0] is None and final[(2, 1)][3] == 0


def test_stream_scd2_batch_fallback_is_the_operator(spark):
    from intake_esm_spark.streaming.stateful import stream_scd2

    df = spark.createDataFrame([(1, "A", _t(1), 1, 0.0)], EV_SCHEMA)
    out = stream_scd2(df, "user_id", "event_type").collect()
    assert len(out) == 1 and out[0]["is_current"] == 1


def test_stream_scd2_rejects_non_string_attr_on_streams(spark, tmp_path):
    from intake_esm_spark.streaming.stateful import stream_scd2

    df = spark.createDataFrame([(1, "A", _t(1), 1, 0.0)], EV_SCHEMA)
    df.write.parquet(str(tmp_path / "p"))
    stream = (
        spark.readStream.schema(df.schema).format("parquet").load(str(tmp_path / "p"))
    )
    with pytest.raises(ValueError):
        stream_scd2(stream, "user_id", "event_id")  # long-typed attribute


# ---------------------------------------------------------------------------
# snapshot_diff


CUST_SCHEMA = "k long, bal double, seg string"


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (5, None, "E")],
        CUST_SCHEMA,
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (4, 40.0, "D"), (5, None, "E")],
        CUST_SCHEMA,
    )
    out = {
        r["k"]: r.asDict()
        for r in snapshot_diff(old, new, ["k"], ["bal", "seg"]).collect()
    }
    # unchanged keys (1: equal, 5: null==null null-safe) are dropped
    assert set(out) == {2, 3, 4}
    assert out[2]["change_type"] == "update"
    assert out[2]["old_bal"] == 20.0 and out[2]["new_bal"] == 25.0
    assert out[3]["change_type"] == "delete"
    assert out[3]["new_bal"] is None and out[3]["old_bal"] == 30.0
    assert out[4]["change_type"] == "insert"
    assert out[4]["old_bal"] is None and out[4]["new_bal"] == 40.0


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([(6, None, "F")], CUST_SCHEMA)
    new = spark.createDataFrame([(6, 1.0, "F")], CUST_SCHEMA)
    out = snapshot_diff(old, new, ["k"], ["bal"]).collect()
    assert len(out) == 1 and out[0]["change_type"] == "update"


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, 1.0, "A")], CUST_SCHEMA)
    new = spark.createDataFrame([(1, 1.0, "A")], CUST_SCHEMA)
    assert snapshot_diff(old, new, ["k"], ["bal"]).count() == 0
    full = snapshot_diff(old, new, ["k"], ["bal"], include_unchanged=True)
    assert [r["change_type"] for r in full.collect()] == ["unchanged"]


def test_snapshot_diff_validation(spark):
    df = spark.createDataFrame([(1, 1.0, "A")], CUST_SCHEMA)
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [], ["bal"])
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["k"], [])


# ---------------------------------------------------------------------------
# scd2_apply


def test_scd2_apply_merge_flow(spark):
    """diff two snapshots, merge into a seeded dimension: update closes
    v1 and opens v2, delete closes without opening, insert opens v1,
    untouched keys pass through."""
    from intake_esm_spark.operators.cdc import scd2_apply, snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")], CUST_SCHEMA
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "B"), (4, 40.0, "D")], CUST_SCHEMA
    )
    from pyspark.sql import functions as F

    dim0 = old.select(
        "k", "bal", "seg",
        F.lit("2024-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(1).alias("version"),
        F.lit(1).alias("is_current"),
    )
    changes = snapshot_diff(old, new, ["k"], ["bal", "seg"])
    out = scd2_apply(
        dim0, changes, ["k"], ["bal", "seg"], "2024-06-01"
    ).collect()
    rows = {(r["k"], r["version"]): r.asDict() for r in out}
    assert len(rows) == 5  # 3 originals + v2 for key 2 + v1 for key 4
    assert rows[(1, 1)]["is_current"] == 1  # unchanged: untouched
    assert rows[(1, 1)]["effective_to"] is None
    assert rows[(2, 1)]["is_current"] == 0  # update: closed...
    assert rows[(2, 1)]["effective_to"] is not None
    assert rows[(2, 2)]["is_current"] == 1  # ...and reopened at v2
    assert rows[(2, 2)]["bal"] == 25.0
    assert rows[(3, 1)]["is_current"] == 0  # delete: closed, not reopened
    assert (3, 2) not in rows
    assert rows[(4, 1)]["is_current"] == 1  # insert: fresh v1
    assert rows[(4, 1)]["bal"] == 40.0


def test_scd2_apply_second_merge_increments_version(spark):
    """Apply twice: the second update opens v3 on top of v2."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.cdc import scd2_apply, snapshot_diff

    s0 = spark.createDataFrame([(1, 1.0, "A")], CUST_SCHEMA)
    s1 = spark.createDataFrame([(1, 2.0, "A")], CUST_SCHEMA)
    s2 = spark.createDataFrame([(1, 3.0, "A")], CUST_SCHEMA)
    dim = s0.select(
        "k", "bal", "seg",
        F.lit("2024-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(1).alias("version"),
        F.lit(1).alias("is_current"),
    )
    dim = scd2_apply(
        dim, snapshot_diff(s0, s1, ["k"], ["bal", "seg"]), ["k"], ["bal", "seg"], "2024-02-01"
    )
    dim = scd2_apply(
        dim, snapshot_diff(s1, s2, ["k"], ["bal", "seg"]), ["k"], ["bal", "seg"], "2024-03-01"
    )
    rows = {r["version"]: r.asDict() for r in dim.collect()}
    assert [rows[v]["is_current"] for v in (1, 2, 3)] == [0, 0, 1]
    assert rows[3]["bal"] == 3.0
    assert rows[2]["effective_to"] is not None


# ---------------------------------------------------------------------------
# k-anonymity


@pytest.fixture(scope="module")
def quasi_df(spark):
    rows = [(i, "en", "s1") for i in range(5)] + [
        (10, "de", "s2"),
        (11, "de", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


def test_k_anonymity_report(quasi_df):
    out = {
        (r["lang"], r["source"]): r.asDict()
        for r in k_anonymity_report(quasi_df, ["lang", "source"], k=3).collect()
    }
    assert out[("en", "s1")]["group_size"] == 5
    assert out[("en", "s1")]["anonymous"] == 1
    assert out[("de", "s2")]["group_size"] == 2
    assert out[("de", "s2")]["anonymous"] == 0


def test_suppress_quasi_nulls_unsafe_groups_only(quasi_df):
    out = {r["doc_id"]: r.asDict() for r in suppress_quasi(quasi_df, ["lang", "source"], k=3).collect()}
    assert len(out) == 7  # every row survives; only values are suppressed
    assert out[0]["lang"] == "en" and out[0]["source"] == "s1"
    assert out[10]["lang"] is None and out[10]["source"] is None
    assert out[10]["doc_id"] == 10  # non-quasi columns untouched


def test_privacy_validation(quasi_df):
    with pytest.raises(ValueError):
        k_anonymity_report(quasi_df, [], k=3)
    with pytest.raises(ValueError):
        suppress_quasi(quasi_df, ["lang"], k=0)


# ---------------------------------------------------------------------------
# deterministic_split


def _py_bucket(key, salt):
    """Pure-python replay of sampling.hash_bucket (md5-60 of 'salt|key')."""
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
    return int(h[:15], 16) % HASH_BUCKETS


@pytest.fixture(scope="module")
def keyed_df(spark):
    return spark.createDataFrame(
        [(i,) for i in range(1000)], "doc_id long"
    )


def test_split_matches_pure_python_replay(keyed_df):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(keyed_df, splits, "doc_id", salt="v1").collect()
    }
    assert len(out) == 1000  # total: every row assigned
    for k in (0, 1, 42, 999):
        b = _py_bucket(k, "v1")
        expect = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
        assert out[k] == expect
    # fractions land near the targets on 1000 uniform hashes
    n_train = sum(1 for v in out.values() if v == "train")
    assert 700 < n_train < 900


def test_split_is_partition_independent(keyed_df):
    splits = {"train": 0.5, "test": 0.5}
    a = deterministic_split(keyed_df, splits, "doc_id", salt="v1")
    b = deterministic_split(keyed_df.repartition(13), splits, "doc_id", salt="v1")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_salt_redraws(keyed_df):
    splits = {"train": 0.5, "test": 0.5}
    a = dict(map(tuple, deterministic_split(keyed_df, splits, "doc_id", salt="v1").collect()))
    b = dict(map(tuple, deterministic_split(keyed_df, splits, "doc_id", salt="v2").collect()))
    assert any(a[k] != b[k] for k in a)


def test_split_validation(keyed_df):
    with pytest.raises(ValueError):
        deterministic_split(keyed_df, {"train": 1.0}, "doc_id")
    with pytest.raises(ValueError):
        deterministic_split(keyed_df, {"a": 0.5, "b": 0.4}, "doc_id")
    with pytest.raises(ValueError):
        deterministic_split(keyed_df, {"a": 0.5, "b": -0.5}, "doc_id")


# ---------------------------------------------------------------------------
# DAU / MAU


def test_dau_mau_contribution_window(spark):
    from intake_esm_spark.operators.eventlog import dau_mau

    rows = [
        (1, "a", _t(1), 1, 0.0),
        (2, "a", _t(1), 2, 0.0),
        (1, "a", _t(1, 5), 3, 0.0),  # same user+day: counts once
        (1, "a", _t(3), 4, 0.0),
        (None, "a", _t(1), 5, 0.0),  # null user excluded
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["day"]: r.asDict() for r in dau_mau(df, mau_days=7).collect()}
    # only ACTIVE days appear (day 2 has no DAU)
    assert set(out) == {"2024-03-01", "2024-03-03"}
    assert out["2024-03-01"]["dau"] == 2
    assert out["2024-03-01"]["mau"] == 2      # both users active on day 1
    assert out["2024-03-03"]["dau"] == 1
    assert out["2024-03-03"]["mau"] == 2      # day-1 activity still in window
    assert out["2024-03-03"]["stickiness"] == 0.5
    with pytest.raises(ValueError):
        dau_mau(df, mau_days=0)


def test_dau_mau_window_ages_out(spark):
    from intake_esm_spark.operators.eventlog import dau_mau

    rows = [(1, "a", _t(1), 1, 0.0), (2, "a", _t(20), 2, 0.0)]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["day"]: r.asDict() for r in dau_mau(df, mau_days=7).collect()}
    # user 1's day-1 activity is NOT in day 20's trailing 7-day window
    assert out["2024-03-20"]["mau"] == 1


def test_scd2_apply_reinsert_after_delete_resumes_versions(spark):
    """ADVICE r7: a key deleted (all versions closed) then re-inserted
    must RESUME version numbering from its history's max, not restart at
    1 — restarting duplicates the (key, version) pair and breaks the
    SCD2 uniqueness enrich_with_scd2 depends on."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.cdc import scd2_apply, snapshot_diff

    s0 = spark.createDataFrame([(1, 1.0, "A")], CUST_SCHEMA)
    s1 = spark.createDataFrame([], CUST_SCHEMA)          # key 1 deleted
    s2 = spark.createDataFrame([(1, 9.0, "A")], CUST_SCHEMA)  # re-inserted
    dim = s0.select(
        "k", "bal", "seg",
        F.lit("2024-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(1).alias("version"),
        F.lit(1).alias("is_current"),
    )
    dim = scd2_apply(
        dim, snapshot_diff(s0, s1, ["k"], ["bal", "seg"]),
        ["k"], ["bal", "seg"], "2024-02-01",
    )
    dim = scd2_apply(
        dim, snapshot_diff(s1, s2, ["k"], ["bal", "seg"]),
        ["k"], ["bal", "seg"], "2024-03-01",
    )
    rows = {(r["k"], r["version"]): r.asDict() for r in dim.collect()}
    assert set(rows) == {(1, 1), (1, 2)}  # NOT a duplicated (1, 1)
    assert rows[(1, 1)]["is_current"] == 0
    assert rows[(1, 2)]["is_current"] == 1
    assert rows[(1, 2)]["bal"] == 9.0


def test_dau_mau_input_pinned_once(spark):
    """The user-day distinct is referenced three times (bounds, dau,
    contrib); it must be checkpointed so the corpus exchange happens
    once — the plan references the pinned RDD, not three re-derivations."""
    import io
    from contextlib import redirect_stdout

    from intake_esm_spark.operators.eventlog import dau_mau

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00")],
        "user_id long, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = dau_mau(df, mau_days=7)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "ExistingRDD" in buf.getvalue()
    got = {r["day"]: r.asDict() for r in out.collect()}
    assert got["2024-01-01"]["dau"] == 1 and got["2024-01-01"]["mau"] == 1
    assert got["2024-01-02"]["mau"] == 2  # day-1 user still in window


def test_multi_touch_linear_and_position(spark):
    """3 touches in window, 1 outside: linear = 1/3 each; position
    (0.4,0.4) = first 0.4, middle 0.2, last 0.4; credits sum to 1."""
    from intake_esm_spark.operators.eventlog import multi_touch_attribution

    rows = [
        (1, "2024-01-02 12:00:00", "purchase", 100, 30.0),
        (1, "2024-01-02 10:00:00", "click", 1, None),
        (1, "2024-01-02 11:00:00", "click", 2, None),
        (1, "2024-01-02 11:30:00", "click", 3, None),
        (1, "2024-01-01 11:00:00", "click", 4, None),  # outside 24h
        (2, "2024-01-02 12:00:00", "purchase", 200, 50.0),
        (2, "2024-01-02 11:00:00", "click", 5, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, event_id long, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "event_id", "value")
    lin = {
        (r["conversion_id"], r["touch_event_id"]): r.asDict()
        for r in multi_touch_attribution(df, "purchase", "click").collect()
    }
    assert set(lin) == {(100, 1), (100, 2), (100, 3), (200, 5)}
    assert lin[(100, 1)]["credit"] == pytest.approx(1 / 3, abs=1e-6)
    assert lin[(200, 5)]["credit"] == 1.0
    assert sum(lin[(100, t)]["credit"] for t in (1, 2, 3)) == pytest.approx(1.0, abs=1e-5)
    assert lin[(100, 2)]["credited_value"] == pytest.approx(10.0, abs=1e-4)

    pos = {
        (r["conversion_id"], r["touch_event_id"]): r["credit"]
        for r in multi_touch_attribution(
            df, "purchase", "click", position_weights=(0.4, 0.4)
        ).collect()
    }
    assert pos[(100, 1)] == 0.4   # earliest
    assert pos[(100, 2)] == pytest.approx(0.2, abs=1e-6)
    assert pos[(100, 3)] == 0.4   # latest
    assert pos[(200, 5)] == 1.0   # single touch


def test_multi_touch_position_weight_validation(spark):
    from intake_esm_spark.operators.eventlog import multi_touch_attribution

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "purchase", 1, 1.0)],
        "user_id long, ts string, event_type string, event_id long, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "event_id", "value")
    with pytest.raises(ValueError):
        multi_touch_attribution(
            df, "purchase", "click", position_weights=(0.7, 0.7)
        )


def test_profile_drift_report(spark):
    from intake_esm_spark.operators.profiling import profile_drift

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b")], "k long, v double, s string"
    )
    new = spark.createDataFrame(
        [(1, 20.0, 1), (2, 30.0, 2), (3, None, 3)], "k long, v double, s int"
    )
    out = {r["column"]: r.asDict() for r in profile_drift(old, new).collect()}
    assert out["k"]["status"] == "common"
    assert out["s"]["status"] == "retyped"
    v = out["v"]
    assert v["null_rate_old"] == 0.5 and v["null_rate_new"] == pytest.approx(1 / 3, abs=1e-6)
    assert v["null_rate_delta"] == pytest.approx(1 / 3 - 0.5, abs=1e-6)
    assert v["mean_old"] == 10.0 and v["mean_new"] == 25.0
    # added/removed columns
    old2 = old.withColumnRenamed("s", "gone")
    out2 = {r["column"]: r["status"] for r in profile_drift(old2, new).collect()}
    assert out2["gone"] == "removed" and out2["s"] == "added"


def test_debounce_chained_burst_collapses(spark):
    """a, a+3s, a+6s with a 5s gap: consecutive-gap island -> ONE burst
    (head survives, size 3); an event 10s later starts a new burst."""
    from intake_esm_spark.operators.eventlog import debounce_events

    rows = [
        (1, "click", "2024-01-01 00:00:00", 1, 0.0),
        (1, "click", "2024-01-01 00:00:03", 2, 0.0),
        (1, "click", "2024-01-01 00:00:06", 3, 0.0),
        (1, "click", "2024-01-01 00:00:16", 4, 0.0),
        (1, "view", "2024-01-01 00:00:01", 5, 0.0),   # other type: own burst
        (2, "click", "2024-01-01 00:00:02", 6, 0.0),  # other user
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long, value double"
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts", "event_id", "value")
    out = {r["event_id"]: r["burst_size"] for r in debounce_events(df, gap="5 seconds").collect()}
    assert out == {1: 3, 4: 1, 5: 1, 6: 1}
