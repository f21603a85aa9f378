"""Regression tests for review findings: empty value lists, named
backreferences, sep threading, mixed str/Pattern variables, asof column
collisions, unique() with inner nulls, compression validation."""

import re

import pytest
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
