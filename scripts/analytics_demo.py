"""End-to-end event-analytics smoke: the product-analytics surface
driven through the public operator modules on real testdata.

    python scripts/analytics_demo.py [sf_dir]  # default /root/testdata/sf0.001

Stages (each an operator this engine ships):

  1. funnel + conversion counts     (signup -> view -> purchase)
  2. cohort retention matrix        (weekly grain)
  3. last-touch attribution         (as-of join, 24h lookback)
  4. KMV distinct sketch            (users per event type)
  5. Markov transitions + top paths (per-user event sequences)
  6. SCD2 dimension from the log    + point-in-time purchase enrichment
  7. daily rollup + anomaly flags   (decimal moments)
  8. PageRank                       (customer-supplier co-purchase graph)

Prints one JSON line with a scalar summary per stage, then exits 0 —
the smoke check is that every stage runs against the same SparkSession
and the invariants hold (funnel monotone, retention offsets bounded,
enrichment covers every purchase with a prior version).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from intake_esm_spark.operators import eventlog, funnel, retention, sketch
from intake_esm_spark.operators.asof import asof_join
from intake_esm_spark.operators.graph import pagerank
from intake_esm_spark.operators.timeseries import detect_anomalies
from intake_esm_spark.session import get_spark
from intake_esm_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="analytics_demo")
    events = load_table(spark, sf_dir, "events")
    out: dict = {"analytics_demo": "OK"}

    steps = ["signup", "view", "purchase"]
    conv = {
        r["step"]: r["n_users"]
        for r in funnel.funnel_counts(events, steps, within="24 hours").collect()
    }
    assert all(
        conv.get(a, 0) >= conv.get(b, 0) for a, b in zip(steps, steps[1:])
    ), f"funnel not monotone: {conv}"
    out["funnel"] = conv

    ret = retention.retention_matrix(events, grain_days=7)
    out["retention_cells"] = ret.count()

    purchases = events.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "ts", "event_id")
    touches = events.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select("user_id", "ts", F.col("event_id").alias("touch_id"))
    attributed = asof_join(purchases, touches, on="user_id", tolerance="24 hours")
    out["attributed"] = attributed.filter(F.col("touch_id").isNotNull()).count()

    sk = sketch.kmv_distinct(events, "user_id", ["event_type"], k=32)
    out["kmv_groups"] = sk.count()

    out["transition_pairs"] = eventlog.transition_matrix(
        events, terminal="end"
    ).count()
    out["top_path_rows"] = eventlog.top_paths(events, length=3, k=10).count()

    dim = eventlog.scd2_from_log(events, "user_id", "event_type").select(
        "user_id",
        F.col("event_type").alias("segment"),
        "effective_from",
        "effective_to",
        "version",
    )
    enriched = eventlog.enrich_with_scd2(
        purchases, dim, "user_id"
    )
    n_purch = purchases.count()
    n_enriched = enriched.filter(F.col("segment").isNotNull()).count()
    # every purchase follows at least its own first event, so every row
    # must land in SOME version of a contiguous log-derived dimension
    assert n_enriched == n_purch, f"enrichment gap: {n_enriched}/{n_purch}"
    out["enriched_purchases"] = n_enriched

    anomalies = detect_anomalies(
        events.filter(F.col("event_type") == "purchase"), window_days=7
    )
    out["anomaly_days"] = anomalies.filter(F.col("is_anomaly")).count()

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iters=2)
    total_rank = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total_rank - 1.0) < 1e-3, f"rank mass {total_rank}"
    out["pagerank_nodes"] = ranks.count()

    from intake_esm_spark.operators.basket import association_rules
    from intake_esm_spark.operators.eventlog import dau_mau
    from intake_esm_spark.operators.profiling import trend_lines

    out["basket_rules"] = association_rules(
        li, "l_orderkey", "l_partkey", min_support=0.0002
    ).count()

    stick = dau_mau(events, mau_days=28)
    bad = stick.filter(
        (F.col("stickiness") > 1.0) | (F.col("dau") > F.col("mau"))
    ).count()
    assert bad == 0, "DAU exceeded MAU somewhere"
    out["dau_mau_days"] = stick.count()

    trend = trend_lines(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    ).collect()
    # quantity varies in every group: a slope and an r2 in [0, 1] exist
    assert all(
        r["slope"] is not None and 0.0 <= r["r2"] <= 1.0 for r in trend
    ), trend
    out["trend_groups"] = len(trend)

    # --- round-8 additions: segmentation, experiment, forecast, graph
    from intake_esm_spark.operators.eventlog import (
        debounce_events,
        multi_touch_attribution,
    )
    from intake_esm_spark.operators.experiment import did_report
    from intake_esm_spark.operators.segmentation import (
        abc_classification,
        rfm_segments,
    )
    from intake_esm_spark.operators.timeseries import seasonal_naive_backtest

    rfm = rfm_segments(events)
    best = rfm.filter(F.col("segment") == "555").count()
    out["rfm_users"] = rfm.count()
    assert out["rfm_users"] > 0 and best >= 0

    abc = abc_classification(
        li.select("l_partkey", F.expr("l_extendedprice * (1 - l_discount)").alias("rev")),
        "l_partkey",
        "rev",
    )
    shares = {r["abc_class"] for r in abc.select("abc_class").distinct().collect()}
    assert shares <= {"A", "B", "C"} and "A" in shares
    out["abc_parts"] = abc.count()

    mt = multi_touch_attribution(events, "purchase", "click")
    # credits sum to ~1 per attributed conversion
    credit_check = (
        mt.groupBy("conversion_id")
        .agg(F.round(F.sum("credit"), 3).alias("s"))
        .filter(F.abs(F.col("s") - 1.0) > 0.01)
        .count()
    )
    assert credit_check == 0, "multi-touch credits must sum to 1"
    out["multi_touch_pairs"] = mt.count()

    units = (
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .groupBy(
            "user_id",
            F.when(F.col("ts") < F.lit("2024-01-16"), "pre")
            .otherwise("post")
            .alias("period"),
        )
        .agg(F.sum("value").alias("obs"))
        .select(
            F.when(F.col("user_id") % 2 == 0, "treatment")
            .otherwise("control")
            .alias("grp"),
            "period",
            "obs",
        )
    )
    did = did_report(units, "grp", "period", "obs").collect()[0]
    assert did["did_se"] is not None
    out["did_estimate"] = did["did_estimate"]

    fc = seasonal_naive_backtest(
        events.filter(F.col("event_type") == "purchase"), season=7
    ).collect()[0]
    assert fc["mae"] is not None and fc["rmse"] >= fc["mae"]
    out["forecast_scored_days"] = fc["n_scored_days"]

    deb = debounce_events(events, gap="60 seconds")
    n_deb = deb.count()
    assert n_deb <= events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).count()
    out["debounced_survivors"] = n_deb

    # --- late round-8 additions: communities, recs, survival, stats
    from intake_esm_spark.operators.experiment import (
        chi_square_report,
        mannwhitney_report,
    )
    from intake_esm_spark.operators.graph import label_propagation
    from intake_esm_spark.operators.profiling import gini_coefficient
    from intake_esm_spark.operators.recs import also_bought
    from intake_esm_spark.operators.survival import km_survival
    from intake_esm_spark.operators.timeseries import theil_sen_trend

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    communities = label_propagation(edges, iters=4)
    n_comm = communities.select("community").distinct().count()
    assert 0 < n_comm <= communities.count()
    out["lpa_communities"] = n_comm

    recs = also_bought(li, "l_orderkey", "l_partkey", top_k=3)
    assert recs.filter(F.col("rank") > 3).count() == 0
    out["also_bought_rows"] = recs.count()

    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.min("ts").alias("f"), F.max("ts").alias("l"))
    )
    mxl = per_user.agg(F.max("l").alias("m"))
    subj = per_user.crossJoin(F.broadcast(mxl)).select(
        F.datediff("l", "f").alias("dur"),
        (F.col("l") < F.col("m") - F.expr("INTERVAL 14 DAYS"))
        .cast("int")
        .alias("ev"),
    )
    km = km_survival(subj, "dur", "ev").orderBy("t").collect()
    surv = [r["survival"] for r in km]
    assert all(a >= b for a, b in zip(surv, surv[1:])), "KM must not rise"
    out["km_curve_points"] = len(km)

    gini = gini_coefficient(orders, "o_custkey", "o_totalprice").collect()[0]
    assert 0.0 <= gini["gini"] < 1.0
    out["customer_gini"] = gini["gini"]

    chi = chi_square_report(
        events.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        ).select(
            (F.col("user_id") % 3).cast("string").alias("g"), "event_type"
        ),
        "g",
        "event_type",
    ).collect()[0]
    assert chi["chi2"] >= 0.0 and chi["dof"] >= 1
    out["chi2"] = chi["chi2"]

    mw = mannwhitney_report(
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        ).select(
            F.when(F.col("user_id") % 2 == 0, "t").otherwise("c").alias("g"),
            "value",
        ),
        "g",
        "value",
        "t",
        "c",
    ).collect()[0]
    assert mw["u_stat"] is not None
    out["mannwhitney_z"] = mw["z"]

    trend = theil_sen_trend(
        events.filter(F.col("event_type") == "purchase")
    ).collect()[0]
    assert trend["n_pairs"] > 0 and trend["slope"] is not None
    out["theil_sen_slope"] = trend["slope"]

    # KS two-sample + Poisson-bootstrap CI over the same unit frame
    from intake_esm_spark.operators.experiment import (
        bootstrap_mean_ci,
        ks_test_report,
    )

    units = (
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.sum("value").alias("rev"))
        .select(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, "t").otherwise("c").alias("g"),
            "rev",
        )
    )
    ks = ks_test_report(units, "g", "rev", "t", "c").collect()[0]
    assert ks["d_stat"] is not None and 0.0 <= ks["d_stat"] <= 1.0
    out["ks_d"] = ks["d_stat"]
    bs = bootstrap_mean_ci(units, "rev", "user_id", n_boot=100).collect()[0]
    assert bs["ci_lo"] <= bs["mean"] <= bs["ci_hi"]
    out["bootstrap_ci"] = [bs["ci_lo"], bs["ci_hi"]]

    # MAD robust outliers + per-type diversity of user activity
    from intake_esm_spark.operators.profiling import entropy_report, mad_outliers

    mad = (
        mad_outliers(
            events.select("event_id", "event_type", "value"),
            "value",
            ["event_type"],
        )
        .filter(F.col("is_outlier"))
        .count()
    )
    assert mad > 0
    out["mad_outliers"] = mad
    ent = entropy_report(
        events.filter(F.col("user_id").isNotNull()).select(
            (F.col("user_id") % 5).cast("string").alias("cohort"), "event_type"
        ),
        ["cohort"],
        "event_type",
    ).collect()
    assert len(ent) == 5 and all(
        r["norm_entropy"] is None or 0.0 <= r["norm_entropy"] <= 1.0
        for r in ent
    )
    out["entropy_cohorts"] = len(ent)

    # link prediction over the co-purchase graph + a CM frequency probe
    from intake_esm_spark.operators.graph import link_prediction_jaccard
    from intake_esm_spark.operators.sketch import cm_estimate, cm_sketch

    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.countDistinct("ok").alias("n"))
        .filter(F.col("n") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    lp = link_prediction_jaccard(edges, k=10).collect()
    assert all(0.0 < r["jaccard"] <= 1.0 for r in lp)
    out["link_pred_rows"] = len(lp)

    sk = cm_sketch(events.select("event_type"), "event_type", depth=4, width=64)
    probes = events.select("event_type").distinct()
    est = {
        r["event_type"]: r["cm_est"]
        for r in cm_estimate(sk, probes, "event_type", depth=4, width=64).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert all(est[t] >= n for t, n in exact.items())
    out["cm_probed_types"] = len(est)

    # --- round-11 additions: always-valid p, FDR, robust means,
    # exact quantiles, Benford, Nelson-Aalen
    from intake_esm_spark.operators.experiment import (
        bh_adjust,
        msprt_report,
        trimmed_means_report,
    )
    from intake_esm_spark.operators.profiling import (
        benford_report,
        exact_quantiles,
    )

    units = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int")).alias(
                "np"
            )
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias(
                "arm"
            ),
            (F.col("np") >= 15).cast("int").alias("conv"),
        )
    )
    av = msprt_report(units, "arm", "conv", "B", "A").collect()[0]
    assert av["always_valid_p"] is None or 0.0 <= av["always_valid_p"] <= 1.0
    out["msprt_p"] = av["always_valid_p"]

    pvals = spark.createDataFrame(
        [(f"m{i}", (i + 1) / 40.0) for i in range(20)],
        "metric string, pv double",
    )
    fdr = bh_adjust(pvals, "pv", "metric").collect()
    qs_sorted = sorted(r["q"] for r in fdr)
    assert all(0.0 <= q <= 1.0 for q in qs_sorted)
    out["fdr_rejected"] = sum(r["rejected"] for r in fdr)

    tm = trimmed_means_report(
        orders.select(
            F.when(F.col("o_custkey") % 2 == 0, "t").otherwise("c").alias(
                "arm"
            ),
            F.col("o_totalprice").alias("val"),
        ),
        "arm", "val", "t", "c", trim=0.05,
    ).collect()[0]
    assert tm["n_kept_treatment"] <= tm["n_treatment"]
    out["trimmed_diff"] = tm["trimmed_mean_diff"]

    eq = {
        r["prob"]: r["quantile"]
        for r in exact_quantiles(
            li, "l_extendedprice", probs=[0.25, 0.5, 0.75]
        ).collect()
    }
    assert eq[0.25] <= eq[0.5] <= eq[0.75]
    out["exact_p50"] = eq[0.5]

    bf = benford_report(orders, "o_totalprice").collect()
    assert len(bf) == 9
    out["benford_mad"] = bf[0]["mad"]

    nah = [r["cum_hazard"] for r in km]
    assert all(a <= b for a, b in zip(nah, nah[1:])), "NA hazard rises"
    out["na_final_cum_hazard"] = nah[-1] if nah else None

    # round-11 second session: k-sample stats, change point, causal,
    # matrix analytics — driven end-to-end on the same frames
    from intake_esm_spark.operators.groupstats import (
        anova_report,
        kruskal_wallis_report,
    )
    from intake_esm_spark.operators.timeseries import (
        mann_kendall_test,
        pettitt_test,
    )
    from intake_esm_spark.operators.matrix import cluster_quality
    from intake_esm_spark.operators.experiment import (
        ratio_ab_test,
        stratified_ate,
    )

    cohorts = (
        events.filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CAST(value AS DECIMAL(18,6))"))
            .cast("double")
            .alias("rev")
        )
        .select(
            "user_id",
            (F.col("user_id") % 3).cast("string").alias("grp"),
            "rev",
        )
    )
    kw = kruskal_wallis_report(cohorts, "grp", "rev").collect()[0]
    an = anova_report(cohorts, "grp", "rev").collect()[0]
    assert kw["n_units"] == an["n_units"] > 0
    out["kruskal_h"] = kw["h_stat"]
    out["anova_f"] = an["f_stat"]

    purch = events.filter(F.col("event_type") == "purchase")
    cp = pettitt_test(purch).collect()
    mk = mann_kendall_test(purch).collect()[0]
    assert mk["n_days"] >= 2
    out["pettitt_p"] = cp[0]["p_value"] if cp else None
    out["mann_kendall_z"] = mk["z"]

    per_user = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.expr("CAST(value AS DECIMAL(18,6))"),
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            )
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("ne"),
        )
        .select(
            "user_id",
            (F.col("user_id") % 2).alias("treat"),
            F.when(F.col("user_id") % 2 == 0, "t")
            .otherwise("c")
            .alias("arm"),
            "rev",
            "ne",
        )
    )
    rab = ratio_ab_test(per_user, "arm", "rev", "ne", "t", "c").collect()[0]
    assert rab["n_treat"] > 0 and rab["n_control"] > 0
    out["ratio_ab_z"] = rab["z"]
    ate = stratified_ate(
        per_user, "treat", "rev", "ne", "user_id", n_strata=5
    ).collect()[0]
    assert ate["n_strata_used"] + ate["n_strata_dropped"] == 5
    out["stratified_ate"] = ate["ate"]

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cq = cluster_quality(emb).collect()[0]
    assert cq["n_clusters"] >= 2
    out["cluster_ch"] = cq["calinski_harabasz"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
