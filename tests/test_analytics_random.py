"""Randomized reference parity for the events-analytics family.

Seeded random event sets compared against independent pure-Python
implementations of the funnel / retention / KMV semantics — the
fixture-independent evidence that the Spark plans implement the stated
contracts, not just the shapes the hand-written fixtures exercise.
"""

import datetime as dt
import hashlib
import random

import pytest
from hypothesis import given, settings, strategies as st

STEPS = ["signup", "view", "purchase"]
TYPES = STEPS + ["click", "error"]


def _random_events(seed, n_users=40, n_events=400):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                f"u{rng.randrange(n_users)}",
                rng.choice(TYPES),
                base + dt.timedelta(minutes=rng.randrange(60 * 24 * 20)),
            )
        )
    return rows


def _py_funnel(rows, steps, within: dt.timedelta | None):
    """Reference: t1 = min step-1 ts; t_i = min step-i ts strictly after
    t_{i-1} (and within tolerance)."""
    by_user = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    out = {}
    for u, evs in by_user.items():
        done = []
        s1 = [ts for t, ts in evs if t == steps[0]]
        if not s1:
            continue
        done.append(min(s1))
        for step in steps[1:]:
            prev = done[-1]
            cand = [
                ts
                for t, ts in evs
                if t == step
                and ts > prev
                and (within is None or ts <= prev + within)
            ]
            if not cand:
                break
            done.append(min(cand))
        out[u] = (done + [None] * len(steps))[: len(steps)] + [len(done)]
    return out


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_funnel_matches_python_reference(spark, seed):
    from intake_esm_spark.operators.funnel import funnel

    rows = _random_events(seed)
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"], r["steps_completed"]]
        for r in funnel(df, STEPS, within="12 hours").collect()
    }
    want = _py_funnel(rows, STEPS, dt.timedelta(hours=12))
    assert got == {u: list(v) for u, v in want.items()}


@pytest.mark.parametrize("seed", [5, 41])
def test_retention_matches_python_reference(spark, seed):
    from intake_esm_spark.operators.retention import retention_matrix

    rows = _random_events(seed)
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    grain = 3
    got = {
        (r["cohort_date"], r["offset_periods"]): (r["n_active"], r["cohort_size"])
        for r in retention_matrix(df, grain_days=grain).collect()
    }
    days = {(u, ts.date()) for u, _, ts in rows}
    first = {}
    for u, d in days:
        if u not in first or d < first[u]:
            first[u] = d
    want = {}
    for u, d in days:
        key = (str(first[u]), (d - first[u]).days // grain)
        want.setdefault(key, set()).add(u)
    sizes = {}
    for u, d0 in first.items():
        sizes[str(d0)] = sizes.get(str(d0), 0) + 1
    want = {k: (len(v), sizes[k[0]]) for k, v in want.items()}
    assert got == want


@pytest.mark.parametrize("seed", [3, 17])
def test_kmv_hashes_match_python_reference(spark, seed):
    """The kept hashes ARE the md5-60 bottom-k of the distinct keys."""
    from intake_esm_spark.operators.sketch import kmv_distinct

    rng = random.Random(seed)
    rows = [("g", f"k{rng.randrange(500)}") for _ in range(1500)]
    df = spark.createDataFrame(rows, "g string, key string")
    k = 48
    got = kmv_distinct(df, "key", ["g"], k=k).collect()[0]
    keys = {key for _, key in rows}
    hashes = sorted(
        int(hashlib.md5(("|" + key).encode()).hexdigest()[:15], 16)
        for key in keys
    )[:k]
    assert list(got["kmv_hashes"]) == hashes
    assert got["n_kept"] == len(hashes)


@pytest.mark.parametrize("seed", [11])
def test_chunking_matches_python_reference(spark, seed):
    from intake_esm_spark.operators.chunking import chunk_documents

    rng = random.Random(seed)
    docs = [
        (f"d{i}", "".join(rng.choice("abcdef ") for _ in range(rng.randrange(0, 1300))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    size, ov = 300, 60
    step = size - ov
    got = {
        (r["doc_id"], r["char_start"]): r["chunk_text"]
        for r in chunk_documents(df, chunk_size=size, overlap=ov).collect()
    }
    want = {}
    for doc_id, text in docs:
        s = 0
        while len(text) > 0 and (s == 0 or s + ov < len(text)):
            want[(doc_id, s)] = text[s : s + size]
            s += step
            if s + ov >= len(text):
                break
    assert got == want


# ---------------------------------------------------------------------------
# round-8 statistical operators: randomized invariants


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=2,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_gini_bounds_and_scale_invariance(spark, kv):
    from intake_esm_spark.operators.profiling import gini_coefficient

    rows = [(str(k), float(v)) for k, v in kv]
    if sum(v for _, v in rows) == 0:
        return
    df = spark.createDataFrame(rows, "k string, v double")
    g1 = gini_coefficient(df, "k", "v").collect()[0]["gini"]
    assert 0.0 <= g1 < 1.0
    # scaling every value by a constant cannot change concentration
    df2 = spark.createDataFrame([(k, v * 3.0) for k, v in rows], "k string, v double")
    g2 = gini_coefficient(df2, "k", "v").collect()[0]["gini"]
    assert abs(g1 - g2) <= 1e-6


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), st.sampled_from(["a", "b"])),
        min_size=4,
        max_size=40,
    )
)
def test_chi2_nonnegative_and_proportional_rows_are_independent(spark, rows):
    from intake_esm_spark.operators.experiment import chi_square_report

    groups = {g for g, _ in rows}
    outcomes = {o for _, o in rows}
    if len(groups) < 2 or len(outcomes) < 2:
        return
    df = spark.createDataFrame(rows, "g string, o string")
    r = chi_square_report(df, "g", "o").collect()[0]
    assert r["chi2"] >= 0.0
    assert r["dof"] == (len(groups) - 1) * (len(outcomes) - 1)
    # duplicating every unit leaves independence structure intact: chi2 doubles
    df2 = spark.createDataFrame(rows + rows, "g string, o string")
    r2 = chi_square_report(df2, "g", "o").collect()[0]
    assert abs(r2["chi2"] - 2 * r["chi2"]) <= 1e-5


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=12),
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=12),
)
def test_mannwhitney_label_swap_symmetry(spark, tv, cv):
    """U1 + U2 = n1*n2: swapping the labels must give the complement."""
    from intake_esm_spark.operators.experiment import mannwhitney_report

    rows = [("t", float(v)) for v in tv] + [("c", float(v)) for v in cv]
    df = spark.createDataFrame(rows, "g string, v double")
    r1 = mannwhitney_report(df, "g", "v", "t", "c").collect()[0]
    r2 = mannwhitney_report(df, "g", "v", "c", "t").collect()[0]
    assert r1["u_stat"] + r2["u_stat"] == len(tv) * len(cv)
    if r1["z"] is not None:
        assert abs(r1["z"] + r2["z"]) <= 2e-6


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=15,
    ),
    st.randoms(use_true_random=False),
)
def test_label_prop_edge_order_invariant(spark, pairs, rnd):
    from intake_esm_spark.operators.graph import label_propagation

    edges = [
        (f"n{a}", f"n{b}") for a, b in pairs if a != b
    ]
    if not edges:
        return
    df1 = spark.createDataFrame(edges, "src string, dst string")
    shuffled = edges[:]
    rnd.shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "src string, dst string")
    got1 = sorted(map(tuple, label_propagation(df1, iters=3).collect()))
    got2 = sorted(map(tuple, label_propagation(df2, iters=3).collect()))
    assert got1 == got2


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=20)),
        min_size=2,
        max_size=20,
    ),
)
def test_auc_monotone_transform_invariance_and_reference(spark, pairs):
    """ROC-AUC depends only on the score ORDER: a strictly monotone
    transform (x -> 3x + 7) leaves it unchanged, and both match the
    O(n²) pairwise reference (ties count half)."""
    from intake_esm_spark.operators.evaluation import auc_report

    rows = [(int(lab), float(s)) for lab, s in pairs]
    pos = [s for l, s in rows if l]
    neg = [s for l, s in rows if not l]
    df = spark.createDataFrame(rows, "label int, score double")
    r1 = auc_report(df, "label", "score").collect()[0]
    df2 = spark.createDataFrame(
        [(l, 3.0 * s + 7.0) for l, s in rows], "label int, score double"
    )
    r2 = auc_report(df2, "label", "score").collect()[0]
    if not pos or not neg:
        assert r1["auc"] is None and r2["auc"] is None
        return
    ref = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert r1["auc"] == pytest.approx(ref, abs=2e-6)
    assert r2["auc"] == pytest.approx(ref, abs=2e-6)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_kappa_symmetry_and_reference(spark, pairs):
    """Cohen's kappa is symmetric in the raters and matches the direct
    po/pe formula computed in Python."""
    from intake_esm_spark.operators.evaluation import cohens_kappa

    rows = [(f"l{a}", f"l{b}") for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")
    r_ab = cohens_kappa(df, "a", "b").collect()[0]
    r_ba = cohens_kappa(df, "b", "a").collect()[0]
    n = len(rows)
    po = sum(1 for a, b in rows if a == b) / n
    from collections import Counter

    ca, cb = Counter(a for a, _ in rows), Counter(b for _, b in rows)
    pe = sum(ca[l] * cb.get(l, 0) for l in ca) / (n * n)
    assert r_ab["observed_agreement"] == pytest.approx(po, abs=1e-6)
    assert r_ab["expected_agreement"] == pytest.approx(pe, abs=1e-6)
    if pe < 1.0:
        ref = (po - pe) / (1 - pe)
        assert r_ab["kappa"] == pytest.approx(ref, abs=2e-6)
        assert r_ba["kappa"] == pytest.approx(ref, abs=2e-6)
    else:
        assert r_ab["kappa"] is None and r_ba["kappa"] is None


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.floats(min_value=0.0, max_value=1.0,
                                           allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
)
def test_calibration_mass_conservation(spark, pairs):
    """Bin populations partition the units; the n-weighted pos_rate over
    bins reconstructs the global positive rate."""
    from intake_esm_spark.operators.evaluation import calibration_report

    rows = [(int(l), float(s)) for l, s in pairs]
    df = spark.createDataFrame(rows, "label int, score double")
    out = calibration_report(df, "label", "score").collect()
    assert sum(r["n_units"] for r in out) == len(rows)
    wpos = sum(r["n_units"] * r["pos_rate"] for r in out)
    assert wpos == pytest.approx(sum(l for l, _ in rows), abs=1e-3)
