"""Regression tests for review findings: empty value lists, named
backreferences, sep threading, mixed str/Pattern variables, asof column
collisions, unique() with inner nulls, compression validation."""

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intake_esm_spark.operators import asof, grouping
from intake_esm_spark.plans import predicates
from intake_esm_spark.plans.query import Query
from intake_esm_spark.plans.predicates import to_java_regex
from intake_esm_spark.sources.catalog_io import save_catalog
from intake_esm_spark.sources.descriptor import Assets, ESMCatalogDescriptor


def test_empty_value_list_matches_nothing(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["c"])
    q = Query.normalize({"c": []}, ["c"])
    assert predicates.search(df, q).count() == 0


def test_named_backreference_translation():
    assert to_java_regex(r"(?P<a>\w+)-(?P=a)") == r"(?<a>\w+)-\k<a>"


def test_named_backreference_matches(spark):
    df = spark.createDataFrame([("ab-ab",), ("ab-cd",)], ["c"])
    q = Query.normalize({"c": re.compile(r"^(?P<x>\w+)-(?P=x)$")}, ["c"])
    out = [r["c"] for r in predicates.search(df, q).collect()]
    assert out == ["ab-ab"]


def test_asof_join_colliding_value_column(spark):
    left = spark.createDataFrame([(1, 10, 5.0)], ["k", "ts", "value"])
    right = spark.createDataFrame([(1, 8, 99.0)], ["k", "ts", "value"])
    out = asof.asof_join(left, right, on="k", ts_col="ts").collect()[0]
    assert out["value"] == 5.0
    assert out["value_right"] == 99.0


def test_unique_with_inner_null_elements(spark):
    schema = T.StructType(
        [T.StructField("v", T.ArrayType(T.StringType()))]
    )
    df = spark.createDataFrame([(["a", None],), (["b"],)], schema)
    assert grouping.unique(df, ["v"]) == {"v": ["a", "b"]}


def test_unsupported_compression_rejected(spark, tmp_path):
    df = spark.createDataFrame([("p1", 1)], ["path", "x"])
    desc = ESMCatalogDescriptor(assets=Assets(column_name="path", format="parquet"))
    with pytest.raises(ValueError, match="compression"):
        save_catalog(df, desc, "x", str(tmp_path), compression="xz")


def test_dataset_dict_sep_parameter(spark, tmp_path):
    import json

    import pandas as pd

    from intake_esm_spark.datastore import open_esm_datastore

    p = str(tmp_path / "a.parquet")
    pd.DataFrame({"variable": ["SHF"], "time": [1], "value": [1.0]}).to_parquet(p)
    pd.DataFrame(
        [{"comp": "ocn", "exp": "E1", "variable": "('SHF',)", "path": p}]
    ).to_csv(tmp_path / "c.csv", index=False)
    desc = {
        "assets": {"column_name": "path", "format": "parquet"},
        "aggregation_control": {
            "variable_column_name": "variable",
            "groupby_attrs": ["comp", "exp"],
            "aggregations": [],
        },
        "catalog_file": str(tmp_path / "c.csv"),
    }
    (tmp_path / "c.json").write_text(json.dumps(desc))
    cat = open_esm_datastore(str(tmp_path / "c.json"), spark=spark)
    assert list(cat.to_dataset_dict(sep="~")) == ["ocn~E1"]


def test_search_pattern_variable_with_multi_variable_assets(spark, tmp_path):
    """Compiled-pattern variable query on an iterable-variable catalog must
    not crash on requested-variables bookkeeping."""
    import json

    import pandas as pd

    from intake_esm_spark.datastore import open_esm_datastore

    p = str(tmp_path / "a.parquet")
    pd.DataFrame({"variable": ["SHF"], "time": [1], "value": [1.0]}).to_parquet(p)
    pd.DataFrame(
        [{"exp": "E1", "variable": "('SHF', 'SST')", "path": p}]
    ).to_csv(tmp_path / "c.csv", index=False)
    desc = {
        "assets": {"column_name": "path", "format": "parquet"},
        "aggregation_control": {
            "variable_column_name": "variable",
            "groupby_attrs": ["exp"],
            "aggregations": [],
        },
        "catalog_file": str(tmp_path / "c.csv"),
    }
    (tmp_path / "c.json").write_text(json.dumps(desc))
    cat = open_esm_datastore(str(tmp_path / "c.json"), spark=spark)
    sub = cat.search(exp="E1", variable=[re.compile("SH.*"), "SST"])
    assert sub.df.count() == 1
    # pattern object carried without TypeError; literal name projects
    dsets = sub.to_dataset_dict()
    assert list(dsets) == ["E1"]


# ---- round-11 second-session review findings ------------------------------


def test_embedding_covariance_tolerates_empty_arrays(spark):
    """An empty embedding (failed upstream embed) must be excluded like
    a null, not crash the job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    from intake_esm_spark.operators.matrix import (
        embedding_covariance,
        pca_project,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, []), (2, [3.0, 5.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    rows = embedding_covariance(df).collect()
    assert all(r["n_vecs"] == 2 for r in rows)  # only the two real vecs
    proj = pca_project(df, k=1).collect()
    assert sorted(r["vec_id"] for r in proj) == [0, 2]


def test_group_moments_exclude_nonfinite_not_count_them(spark):
    """A NaN outcome passed isNotNull, was COUNTED by n, yet vanished
    from the decimal sums — biasing every ANOVA/BF mean silently."""
    from intake_esm_spark.operators.groupstats import anova_report

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", float("nan")),
        ("b", 1.0), ("b", 3.0), ("b", float("inf")),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    row = anova_report(df, "g", "x").collect()[0]
    assert row["n_units"] == 4  # the NaN and inf rows are gone
    clean = spark.createDataFrame(
        [r for r in rows if r[1] == r[1] and abs(r[1]) != float("inf")],
        "g string, x double",
    )
    ref = anova_report(clean, "g", "x").collect()[0]
    assert row == ref


def test_kruskal_excludes_nonfinite(spark):
    from intake_esm_spark.operators.groupstats import (
        kruskal_wallis_report,
    )

    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    dirty = rows + [("a", float("nan")), ("b", float("-inf"))]
    clean_r = kruskal_wallis_report(
        spark.createDataFrame(rows, "g string, x double"), "g", "x"
    ).collect()[0]
    dirty_r = kruskal_wallis_report(
        spark.createDataFrame(dirty, "g string, x double"), "g", "x"
    ).collect()[0]
    assert dirty_r == clean_r


def test_ratio_family_excludes_nonfinite(spark):
    from intake_esm_spark.operators.experiment import (
        jackknife_ratio_ci,
        ratio_ab_test,
        stratified_ate,
    )

    base = [
        ("t", 10.0, 2.0, 0), ("t", 12.0, 3.0, 1),
        ("c", 9.0, 2.0, 2), ("c", 8.0, 3.0, 3),
    ]
    dirty = base + [
        ("t", float("nan"), 2.0, 4),
        ("c", 5.0, float("inf"), 5),
    ]
    cdf = spark.createDataFrame(base, "g string, x double, y double, uid long")
    ddf = spark.createDataFrame(dirty, "g string, x double, y double, uid long")
    assert (
        ratio_ab_test(ddf, "g", "x", "y", "t", "c").collect()
        == ratio_ab_test(cdf, "g", "x", "y", "t", "c").collect()
    )
    assert (
        jackknife_ratio_ci(ddf, "x", "y", "uid", n_buckets=2).collect()
        == jackknife_ratio_ci(cdf, "x", "y", "uid", n_buckets=2).collect()
    )
    # stratified_ate: non-finite OUTCOME rows excluded (score already
    # was) — numeric treatment flag derived from the arm label
    cdf2 = cdf.withColumn("t2", (F.col("g") == "t").cast("int"))
    ddf2 = ddf.withColumn("t2", (F.col("g") == "t").cast("int"))
    assert (
        stratified_ate(ddf2, "t2", "x", "y", "uid", n_strata=2).collect()
        == stratified_ate(cdf2, "t2", "x", "y", "uid", n_strata=2).collect()
    )


def test_cluster_quality_db_null_on_coincident_centroids(spark):
    """Two clusters with identical centroids but a third far away:
    max() would skip the null R and report a finite DB where the index
    is undefined."""
    from intake_esm_spark.operators.matrix import cluster_quality

    rows = (
        [(0, [0.0, float(i)]) for i in (-1, 0, 1)]
        + [(1, [0.0, float(i) / 2]) for i in (-1, 0, 1)]  # same centroid
        + [(2, [50.0, float(i)]) for i in (-1, 0, 1)]
    )
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    row = cluster_quality(df).collect()[0]
    assert row["davies_bouldin"] is None  # A-B pair is undefined
    assert row["calinski_harabasz"] is not None  # CH unaffected


def test_acf_emits_every_requested_lag(spark):
    """A series shorter than max_lag must report n_pairs = 0 rows, not
    silently omit the lags."""
    import pandas as pd

    from intake_esm_spark.operators.timeseries import acf_report

    days = pd.date_range("2024-05-01", periods=5, freq="D")
    df = spark.createDataFrame(
        [
            (pd.Timestamp(d).to_pydatetime(), float(i))
            for i, d in enumerate(days)
        ],
        "ts timestamp, value double",
    )
    got = {r["lag"]: r for r in acf_report(df, max_lag=10).collect()}
    assert sorted(got) == list(range(1, 11))
    assert got[4]["n_pairs"] == 1 and got[4]["acf"] is None
    assert all(got[k]["n_pairs"] == 0 for k in range(5, 11))


def test_weighted_quantiles_filters_on_rounded_weight(spark):
    """A 1e-7 weight rounds to zero mass: it must be EXCLUDED by the
    filter, not pass it and then vanish from the cumulative spans
    (which made its value unpickable and could zero the whole frame)."""
    from intake_esm_spark.operators.profiling import weighted_quantiles

    df = spark.createDataFrame(
        [(1.0, 1e-7), (2.0, 1.0), (3.0, 1.0)], "v double, w double"
    )
    rows = weighted_quantiles(df, "v", "w", [0.5, 1.0]).collect()
    assert all(r["n_rows"] == 2 for r in rows)  # the 1e-7 row is out
    got = {r["prob"]: r["quantile"] for r in rows}
    assert got[0.5] == 2.0 and got[1.0] == 3.0
    # all-tiny-weight frame: zero rows (documented empty shape), not
    # a divide-by-zero or a phantom pick
    tiny = spark.createDataFrame(
        [(1.0, 1e-7), (2.0, 2e-7)], "v double, w double"
    )
    assert weighted_quantiles(tiny, "v", "w", [0.5]).count() == 0
