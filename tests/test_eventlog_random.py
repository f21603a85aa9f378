"""Randomized reference parity for the eventlog / CDC / graph family.

Seeded random inputs against independent pure-Python implementations —
the fixture-independent evidence the plans implement the contracts
(the test_analytics_random.py pattern)."""

import datetime as dt
import random

import pytest


def _random_log(seed, n_users=25, n_events=300):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                rng.randrange(n_users),
                rng.choice(["a", "b", "c", "d"]),
                base + dt.timedelta(minutes=rng.randrange(60 * 24 * 30)),
                i,  # unique monotone order key
                round(rng.uniform(0, 100), 2),
            )
        )
    return rows


SCHEMA = "user_id long, event_type string, ts timestamp, event_id long, value double"


@pytest.mark.parametrize("seed", [11, 42, 99])
def test_scd2_from_log_matches_python(spark, seed):
    from intake_esm_spark.operators.eventlog import scd2_from_log

    rows = _random_log(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["effective_from"],
            r["effective_to"],
            r["is_current"],
        )
        for r in scd2_from_log(df, "user_id", "event_type").collect()
    }
    by_user = {}
    for u, t, ts, eid, _ in sorted(rows, key=lambda r: (r[2], r[3])):
        by_user.setdefault(u, []).append((t, ts))
    expect = {}
    for u, evs in by_user.items():
        islands = []
        for t, ts in evs:
            if not islands or islands[-1][0] != t:
                islands.append([t, ts])
        for v, (t, ts) in enumerate(islands, 1):
            nxt = islands[v][1] if v < len(islands) else None
            expect[(u, v)] = (t, ts, nxt, 1 if nxt is None else 0)
    assert got == expect


@pytest.mark.parametrize("seed", [7, 21])
def test_transition_matrix_matches_python(spark, seed):
    from intake_esm_spark.operators.eventlog import transition_matrix

    rows = _random_log(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in transition_matrix(df, terminal="end").collect()
    }
    by_user = {}
    for u, t, ts, eid, _ in sorted(rows, key=lambda r: (r[2], r[3])):
        by_user.setdefault(u, []).append(t)
    counts = {}
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:] + ["end"]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    from_totals = {}
    for (a, _), n in counts.items():
        from_totals[a] = from_totals.get(a, 0) + n
    for k, n in counts.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(n / from_totals[k[0]], abs=1e-6)
    assert set(got) == set(counts)
    # stochastic matrix: probabilities sum to 1 per from-state
    for a in from_totals:
        s = sum(p for (x, _), (_, p) in got.items() if x == a)
        assert s == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("seed", [3, 17])
def test_cdc_roundtrip_apply_diff_restores_target(spark, seed):
    """THE merge invariant: apply(dim_from(A), diff(A, B)) must have
    current rows exactly equal to snapshot B — for random snapshot
    pairs with random overlaps, updates, inserts and deletes."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.cdc import scd2_apply, snapshot_diff

    rng = random.Random(seed)
    keys_a = rng.sample(range(100), 40)
    keys_b = rng.sample(range(100), 40)
    a_rows = [(k, round(rng.uniform(0, 50), 2), rng.choice("xyz")) for k in keys_a]
    b_rows = []
    a_map = {k: (b, s) for k, b, s in a_rows}
    for k in keys_b:
        if k in a_map and rng.random() < 0.5:
            b_rows.append((k, *a_map[k]))  # unchanged
        else:
            b_rows.append((k, round(rng.uniform(0, 50), 2), rng.choice("xyz")))
    A = spark.createDataFrame(a_rows, "k long, bal double, seg string")
    B = spark.createDataFrame(b_rows, "k long, bal double, seg string")
    dim0 = A.select(
        "k", "bal", "seg",
        F.lit("2024-01-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(1).alias("version"),
        F.lit(1).alias("is_current"),
    )
    merged = scd2_apply(
        dim0,
        snapshot_diff(A, B, ["k"], ["bal", "seg"]),
        ["k"],
        ["bal", "seg"],
        "2024-06-01",
    )
    current = {
        (r["k"], r["bal"], r["seg"])
        for r in merged.filter(F.col("is_current") == 1).collect()
    }
    assert current == set(map(tuple, b_rows))
    # and every closed row's interval is properly ordered
    for r in merged.filter(F.col("is_current") == 0).collect():
        assert r["effective_to"] is not None
        assert r["effective_from"] < r["effective_to"]


@pytest.mark.parametrize("seed", [5, 23])
def test_pagerank_mass_and_python_parity(spark, seed):
    from intake_esm_spark.operators.graph import pagerank
    from tests.test_graph import _ref_pagerank

    rng = random.Random(seed)
    edges = list(
        {
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(80)
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=2).collect()}
    assert got == _ref_pagerank(sorted(edges))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
