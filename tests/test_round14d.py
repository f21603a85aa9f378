"""Round-14 batch 4: t-closeness (ordered-EMD), interarrival
burstiness, and Heaps'-law fit — first-principles references and
guards."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---- t-closeness ----------------------------------------------------------


def _emd_ref(vals_g, vals_all, mn, mx, n_bins):
    w = (mx - mn) / n_bins

    def hist(v):
        b = np.minimum(
            n_bins - 1,
            np.maximum(0, np.floor((np.round(v, 6) - mn) / w)),
        ).astype(int)
        h = np.bincount(b, minlength=n_bins).astype(float)
        return np.cumsum(h) / h.sum()

    cg, ca = hist(vals_g), hist(vals_all)
    return float(np.abs(cg[:-1] - ca[:-1]).sum() / (n_bins - 1))


def test_tcloseness_matches_first_principles(spark):
    from intake_esm_spark.operators.privacy import t_closeness_report

    rng = np.random.RandomState(190)
    n = 2000
    grp = np.where(rng.uniform(size=n) < 0.3, "a", "b")
    # group 'a' shifted upward: a real disclosure
    val = np.round(
        rng.normal(50, 10, n) + np.where(grp == "a", 15, 0), 4
    )
    df = spark.createDataFrame(
        list(zip(grp, map(float, val))), "g string, v double"
    )
    rows = {
        r["g"]: r
        for r in t_closeness_report(
            df, ["g"], "v", n_bins=10, t_threshold=0.05
        ).collect()
    }
    mn = round(float(np.round(val, 6).min()), 6)
    mx = round(float(np.round(val, 6).max()), 6)
    for g in ("a", "b"):
        ref = _emd_ref(val[grp == g], val, mn, mx, 10)
        assert rows[g]["emd"] == pytest.approx(ref, abs=1e-5), g
        assert rows[g]["n_rows"] == int((grp == g).sum())
    # the shifted group leaks; the majority group is close
    assert rows["a"]["is_close"] == 0
    assert rows["a"]["emd"] > rows["b"]["emd"]


def test_tcloseness_identical_groups_zero(spark):
    from intake_esm_spark.operators.privacy import t_closeness_report

    rows = [(("g%d" % (i % 2)), float(i % 10)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = t_closeness_report(df, ["g"], "v", n_bins=5).collect()
    for r in out:
        assert r["emd"] == pytest.approx(0.0, abs=1e-9)
        assert r["is_close"] == 1


def test_tcloseness_guards_and_constant(spark):
    from intake_esm_spark.operators.privacy import t_closeness_report

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0)], "g string, v double"
    )
    out = t_closeness_report(df, ["g"], "v").collect()
    assert all(r["emd"] == 0.0 and r["is_close"] == 1 for r in out)
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_report(df, [], "v")
    with pytest.raises(ValueError, match="n_bins"):
        t_closeness_report(df, ["g"], "v", n_bins=1)
    with pytest.raises(ValueError, match="t_threshold"):
        t_closeness_report(df, ["g"], "v", t_threshold=0.0)
    empty = df.filter(F.col("v") < 0)
    with pytest.raises(ValueError, match="no non-null"):
        t_closeness_report(empty, ["g"], "v")


# ---- interarrival burstiness ----------------------------------------------


def test_burstiness_matches_first_principles(spark):
    from intake_esm_spark.operators.eventlog import (
        interarrival_burstiness,
    )

    rng = np.random.RandomState(191)
    rows = []
    eid = 0
    gaps_ref = {"t": []}
    for u in range(20):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=u)
        offs = np.cumsum(rng.randint(1, 1000, 15))
        prev = None
        for o in offs:
            ts = t0 + dt.timedelta(seconds=int(o))
            rows.append((eid, ts, u, "t"))
            if prev is not None:
                gaps_ref["t"].append(int(o) - prev)
            prev = int(o)
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string"
    )
    row = interarrival_burstiness(df).collect()[0]
    g = np.array(gaps_ref["t"], dtype=float)
    mean, sd = g.mean(), g.std(ddof=1)
    cv = sd / mean
    assert row["n_gaps"] == len(g)
    assert row["mean_gap_s"] == pytest.approx(mean, abs=1e-4)
    assert row["sd_gap_s"] == pytest.approx(sd, abs=1e-4)
    assert row["cv"] == pytest.approx(cv, abs=1e-5)
    assert row["burstiness"] == pytest.approx(
        (cv - 1) / (cv + 1), abs=1e-5
    )


def test_burstiness_signatures(spark):
    """Periodic traffic -> B near -1; heavy-tailed -> B > 0."""
    from intake_esm_spark.operators.eventlog import (
        interarrival_burstiness,
    )

    rng = np.random.RandomState(192)
    rows = []
    eid = 0
    # periodic: exactly 60s apart
    for u in range(5):
        for i in range(50):
            rows.append(
                (eid, dt.datetime(2024, 1, 1)
                 + dt.timedelta(seconds=u * 7 + i * 60),
                 u, "tick")
            )
            eid += 1
    # bursty: pareto-ish gaps
    for u in range(5):
        t = 0.0
        for _i in range(50):
            t += float((rng.pareto(1.2) + 0.1) * 30)
            rows.append(
                (eid, dt.datetime(2024, 1, 1)
                 + dt.timedelta(seconds=t), u + 100, "burst")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string"
    )
    out = {r["event_type"]: r for r in interarrival_burstiness(df).collect()}
    assert out["tick"]["burstiness"] == pytest.approx(-1.0, abs=1e-6)
    assert out["burst"]["burstiness"] > 0.2


def test_burstiness_degenerate_null(spark):
    from intake_esm_spark.operators.eventlog import (
        interarrival_burstiness,
    )

    # a single gap per user -> n_gaps 1 for the type -> null stats
    df = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "x"),
         (1, dt.datetime(2024, 1, 1, 0, 1), 1, "x")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    row = interarrival_burstiness(df).collect()[0]
    assert row["n_gaps"] == 1
    assert row["cv"] is None and row["burstiness"] is None


# ---- Heaps' law -----------------------------------------------------------


def test_heaps_fit_known_line():
    """Exact power-law points recover beta and K exactly."""
    from intake_esm_spark.operators.corpus import heaps_fit

    beta, k = 0.5, 10.0
    pts = [
        (t, int(round(k * t**beta)))
        for t in (100, 400, 1600, 6400, 25600)
    ]
    sol = heaps_fit(pts)
    assert sol["beta"] == pytest.approx(beta, abs=0.01)
    assert 10 ** sol["log10_k"] == pytest.approx(k, rel=0.05)
    assert sol["r2"] > 0.999
    assert sol["n_groups"] == 5


def test_heaps_report_matches_shared_fit(spark):
    from intake_esm_spark.operators.corpus import (
        heaps_fit,
        heaps_law_report,
    )

    rng = np.random.RandomState(193)
    rows = []
    for g, size in (("s1", 50), ("s2", 200), ("s3", 800)):
        # zipf-ish vocabulary growth
        for i in range(size):
            w = [
                f"w{int(rng.zipf(1.5))}" for _ in range(20)
            ]
            rows.append((g, " ".join(w)))
    df = spark.createDataFrame(rows, "source string, text string")
    row = heaps_law_report(df).collect()[0]
    # replay points by hand
    pts = []
    from collections import defaultdict

    toks = defaultdict(list)
    for g, t in rows:
        toks[g].extend(t.split())
    for g in toks:
        pts.append((len(toks[g]), len(set(toks[g]))))
    sol = heaps_fit(sorted(pts))
    assert row["beta"] == sol["beta"]
    assert row["log10_k"] == sol["log10_k"]
    assert row["r2"] == sol["r2"]
    # vocabulary grows sublinearly -> 0 < beta < 1
    assert 0.0 < row["beta"] < 1.0


def test_heaps_guards(spark):
    from intake_esm_spark.operators.corpus import (
        heaps_fit,
        heaps_law_report,
    )

    with pytest.raises(ValueError, match=">= 2 positive"):
        heaps_fit([(100, 10)])
    with pytest.raises(ValueError, match="unidentifiable"):
        heaps_fit([(100, 10), (100, 20)])
    df = spark.createDataFrame(
        [(f"g{i}", "a b c") for i in range(70)],
        "source string, text string",
    )
    with pytest.raises(ValueError, match="MAX_HEAPS_GROUPS"):
        heaps_law_report(df)


# ---- McNemar --------------------------------------------------------------


def test_mcnemar_matches_hand_count(spark):
    from intake_esm_spark.operators.experiment import mcnemar_report

    rows = [(1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (1, 1),
            (0, 1), (1, 0), (None, 1), (1, None)]
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_report(df, "a", "b").collect()[0]
    # clean pairs: 8; n01 = a=0,b=1 -> rows (0,1),(0,1) = 2;
    # n10 = (1,0) x3 = 3
    assert r["n_pairs"] == 8 and r["n01"] == 2 and r["n10"] == 3
    assert r["chi2"] == pytest.approx((2 - 3) ** 2 / 5, abs=1e-9)


def test_mcnemar_no_discordance_null(spark):
    from intake_esm_spark.operators.experiment import mcnemar_report

    df = spark.createDataFrame(
        [(1, 1), (0, 0), (1, 1)], "a int, b int"
    )
    r = mcnemar_report(df, "a", "b").collect()[0]
    assert r["chi2"] is None and r["n01"] == 0 and r["n10"] == 0


# ---- permutation test -----------------------------------------------------


def test_permutation_detects_real_effect(spark):
    from intake_esm_spark.operators.experiment import (
        permutation_test_report,
    )

    rng = np.random.RandomState(195)
    rows = [
        (i, "a" if i < 300 else "b",
         float(np.round(rng.normal(10 if i < 300 else 14, 2), 4)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "uid long, g string, v double")
    r = permutation_test_report(
        df, "uid", "g", "v", n_perm=40
    ).collect()[0]
    assert r["n_units"] == 600
    assert r["obs_diff"] == pytest.approx(4.0, abs=0.6)
    # a 2-sigma-per-group effect at n=600 never loses to a relabeling
    assert r["n_extreme"] == 0
    assert r["p_value"] == pytest.approx(1 / 41, abs=1e-6)


def test_permutation_null_effect_large_p(spark):
    from intake_esm_spark.operators.experiment import (
        permutation_test_report,
    )

    rng = np.random.RandomState(196)
    rows = [
        (i, "a" if i % 2 == 0 else "b",
         float(np.round(rng.normal(10, 2), 4)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "uid long, g string, v double")
    r = permutation_test_report(
        df, "uid", "g", "v", n_perm=40
    ).collect()[0]
    assert r["p_value"] > 0.1


def test_permutation_deterministic_and_guards(spark):
    from intake_esm_spark.operators.experiment import (
        permutation_test_report,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 7))
            for i in range(100)]
    df = spark.createDataFrame(rows, "uid long, g string, v double")
    r1 = permutation_test_report(df, "uid", "g", "v", n_perm=16).collect()
    r2 = permutation_test_report(df, "uid", "g", "v", n_perm=16).collect()
    assert r1 == r2  # fully deterministic
    with pytest.raises(ValueError, match="n_perm"):
        permutation_test_report(df, "uid", "g", "v", n_perm=0)
    df3 = df.withColumn(
        "g3", F.concat(F.lit("g"), (F.col("uid") % 3).cast("string"))
    )
    with pytest.raises(ValueError, match="exactly TWO"):
        permutation_test_report(df3, "uid", "g3", "v")


# ---- Mantel-Haenszel ------------------------------------------------------


def test_mh_matches_first_principles(spark):
    from intake_esm_spark.operators.experiment import (
        mantel_haenszel_report,
    )

    rng = np.random.RandomState(197)
    rows = []
    strata = {}
    for s, (pe, p0, orr) in {
        "s1": (0.5, 0.2, 3.0),
        "s2": (0.4, 0.4, 3.0),
        "s3": (0.6, 0.1, 3.0),
    }.items():
        odds0 = p0 / (1 - p0)
        p1 = orr * odds0 / (1 + orr * odds0)
        cells = [0, 0, 0, 0]  # a b c d
        for _i in range(800):
            e = int(rng.uniform() < pe)
            y = int(rng.uniform() < (p1 if e else p0))
            rows.append((s, e, y))
            if e and y:
                cells[0] += 1
            elif e:
                cells[1] += 1
            elif y:
                cells[2] += 1
            else:
                cells[3] += 1
        strata[s] = cells
    df = spark.createDataFrame(rows, "s string, e int, y int")
    r = mantel_haenszel_report(df, "s", "e", "y").collect()[0]
    sr = sum(a * d / sum(c4) for (a, b, c, d), c4 in
             ((tuple(v), v) for v in strata.values()))
    ss = sum(b * c / sum(c4) for (a, b, c, d), c4 in
             ((tuple(v), v) for v in strata.values()))
    assert r["n_units"] == 2400 and r["n_strata"] == 3
    assert r["or_mh"] == pytest.approx(sr / ss, abs=1e-4)
    # the common OR=3 is recovered and the CI excludes 1
    assert 2.0 < r["or_mh"] < 4.5
    assert r["ci_lo"] > 1.0
    # RBG variance replay
    num1 = num2 = num3 = 0.0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        p, q = (a + d) / n, (b + c) / n
        rr, s2 = a * d / n, b * c / n
        num1 += p * rr
        num2 += p * s2 + q * rr
        num3 += q * s2
    var = (
        num1 / (2 * sr * sr) + num2 / (2 * sr * ss)
        + num3 / (2 * ss * ss)
    )
    assert r["log_or_se"] == pytest.approx(math.sqrt(var), abs=1e-5)


def test_mh_null_exposure_or_near_one(spark):
    from intake_esm_spark.operators.experiment import (
        mantel_haenszel_report,
    )

    rng = np.random.RandomState(198)
    rows = [
        ("s%d" % (i % 4), int(rng.uniform() < 0.5),
         int(rng.uniform() < 0.3))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "s string, e int, y int")
    r = mantel_haenszel_report(df, "s", "e", "y").collect()[0]
    assert r["ci_lo"] < 1.0 < r["ci_hi"]


def test_mh_degenerate_null(spark):
    from intake_esm_spark.operators.experiment import (
        mantel_haenszel_report,
    )

    # outcome never occurs in the unexposed arm -> S = 0 -> null OR
    df = spark.createDataFrame(
        [("s", 1, 1)] * 5 + [("s", 1, 0)] * 5 + [("s", 0, 0)] * 10,
        "s string, e int, y int",
    )
    r = mantel_haenszel_report(df, "s", "e", "y").collect()[0]
    assert r["or_mh"] is None


# ---- SMD balance ----------------------------------------------------------


def test_smd_matches_first_principles(spark):
    from intake_esm_spark.operators.experiment import smd_balance_report

    rng = np.random.RandomState(199)
    n = 1500
    t = (rng.uniform(size=n) < 0.4).astype(int)
    x1 = np.round(rng.normal(10, 2, n) + 1.0 * t, 4)  # imbalanced
    x2 = np.round(rng.normal(5, 1, n), 4)  # balanced
    df = spark.createDataFrame(
        list(zip(map(int, t), map(float, x1), map(float, x2))),
        "treat int, x1 double, x2 double",
    )
    rows = {
        r["covariate"]: r
        for r in smd_balance_report(df, "treat", ["x1", "x2"]).collect()
    }
    for cc, x in (("x1", x1), ("x2", x2)):
        mt, mc = x[t == 1].mean(), x[t == 0].mean()
        vt, vc = x[t == 1].var(ddof=1), x[t == 0].var(ddof=1)
        ref = (mt - mc) / math.sqrt((vt + vc) / 2)
        assert rows[cc]["smd"] == pytest.approx(ref, abs=1e-4), cc
        assert rows[cc]["n_treat"] == int(t.sum()), cc
    assert rows["x1"]["balanced"] == 0  # half-sigma shift leaks
    assert rows["x2"]["balanced"] == 1


def test_smd_guards_and_tiny_arm(spark):
    from intake_esm_spark.operators.experiment import smd_balance_report

    df = spark.createDataFrame(
        [(1, 1.0), (0, 2.0), (0, 3.0)], "treat int, x double"
    )
    r = smd_balance_report(df, "treat", ["x"]).collect()[0]
    assert r["smd"] is None  # n_treat < 2
    with pytest.raises(ValueError, match="at least one covariate"):
        smd_balance_report(df, "treat", [])


# ---- Cochran's Q ----------------------------------------------------------


def test_cochran_q_matches_first_principles(spark):
    from intake_esm_spark.operators.experiment import cochran_q_report

    rng = np.random.RandomState(200)
    n, k = 500, 3
    # treatment 2 genuinely better
    p = [0.3, 0.3, 0.5]
    flags = np.column_stack(
        [(rng.uniform(size=n) < p[j]).astype(int) for j in range(k)]
    )
    rows = [(i, *map(int, flags[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "uid long, f1 int, f2 int, f3 int")
    r = cochran_q_report(df, "uid", ["f1", "f2", "f3"]).collect()[0]
    G = flags.sum(axis=0).astype(float)
    L = flags.sum(axis=1).astype(float)
    q_ref = (k - 1) * (k * (G**2).sum() - G.sum() ** 2) / (
        k * L.sum() - (L**2).sum()
    )
    assert r["n_units"] == n and r["k"] == k and r["dof"] == 2
    assert r["q_stat"] == pytest.approx(q_ref, abs=1e-5)
    assert r["q_stat"] > 9.21  # chi2(2) 1% critical — real effect


def test_cochran_q_degenerate_and_guard(spark):
    from intake_esm_spark.operators.experiment import cochran_q_report

    df = spark.createDataFrame(
        [(1, 1, 1), (2, 0, 0), (3, 1, 1)], "uid long, a int, b int"
    )
    r = cochran_q_report(df, "uid", ["a", "b"]).collect()[0]
    assert r["q_stat"] is None  # all rows concordant
    with pytest.raises(ValueError, match=">= 2 flag"):
        cochran_q_report(df, "uid", ["a"])


# ---- Friedman -------------------------------------------------------------


def test_friedman_matches_scipy_formula(spark):
    from intake_esm_spark.operators.experiment import friedman_report

    rng = np.random.RandomState(201)
    n, k = 300, 3
    base = rng.normal(10, 3, n)
    X = np.round(
        np.column_stack(
            [base + rng.normal(0, 1, n),
             base + rng.normal(0.8, 1, n),
             base + rng.normal(0, 1, n)]
        ),
        4,
    )
    rows = [(i, *map(float, X[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "uid long, v1 double, v2 double, v3 double"
    )
    r = friedman_report(df, "uid", ["v1", "v2", "v3"]).collect()[0]
    # first-principles: within-row average ranks
    Xq = np.round(X, 6)
    ranks = np.zeros_like(Xq)
    for i in range(n):
        order = Xq[i]
        for j in range(k):
            less = (order < order[j]).sum()
            eq = (order == order[j]).sum() - 1
            ranks[i, j] = 1 + less + 0.5 * eq
    R = ranks.sum(axis=0)
    chi_ref = 12.0 / (n * k * (k + 1)) * (R**2).sum() - 3 * n * (k + 1)
    assert r["n_units"] == n and r["k"] == k and r["dof"] == 2
    assert r["chi2_f"] == pytest.approx(chi_ref, abs=1e-5)
    assert r["chi2_f"] > 9.21  # the shifted arm is loudly detected


def test_friedman_ties_and_guards(spark):
    from intake_esm_spark.operators.experiment import friedman_report

    # all-tied rows: every rank = 2 -> chi2 = 0 exactly
    df = spark.createDataFrame(
        [(i, 1.0, 1.0, 1.0) for i in range(50)],
        "uid long, a double, b double, c double",
    )
    r = friedman_report(df, "uid", ["a", "b", "c"]).collect()[0]
    assert r["chi2_f"] == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError, match=">= 2 value"):
        friedman_report(df, "uid", ["a"])
    # complete-case: a null drops the unit
    df2 = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, None, 3.0), (3, 2.0, 1.0)],
        "uid long, a double, b double",
    )
    r2 = friedman_report(df2, "uid", ["a", "b"]).collect()[0]
    assert r2["n_units"] == 2
