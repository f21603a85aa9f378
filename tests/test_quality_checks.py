"""Declarative constraint checking (operators/quality_checks.py)."""

import pytest

from intake_esm_spark.operators.quality_checks import check_constraints


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a", 10.0, "web"),
        (2, "b", 20.0, "web"),
        (3, None, 30.0, "code"),
        (3, "d", -5.0, "forum"),  # duplicate id, out-of-bound value
        (5, "e", 40.0, None),
    ]
    return spark.createDataFrame(rows, "id long, txt string, v double, src string")


def _report(df, rules):
    return {r["rule_idx"]: r.asDict() for r in check_constraints(df, rules).collect()}


def test_rule_semantics(table):
    rep = _report(
        table,
        [
            ("not_null", "txt", 0.9),     # 4/5 = 0.8 -> fail
            ("not_null", "txt", 0.8),     # 0.8 >= 0.8 -> pass
            ("unique", "id", None),       # id 3 twice -> fail
            ("unique", "txt", None),      # nulls excluded -> pass
            ("min", "v", 0.0),            # -5 -> fail
            ("max", "v", 100.0),          # 40 -> pass
            ("in_set", "src", ["web", "code", "forum"]),  # nulls don't count -> pass
            ("in_set", "src", ["web"]),   # code/forum violate -> fail
        ],
    )
    assert [rep[i]["passed"] for i in range(8)] == [0, 1, 0, 1, 0, 1, 1, 0]
    assert rep[0]["metric"] == 0.8
    assert rep[2]["metric"] == 0.8  # 4 distinct / 5 non-null
    assert rep[4]["metric"] == -5.0
    assert rep[6]["metric"] == 1.0
    assert rep[7]["metric"] == 0.5  # 2 of 4 non-null in {web}


def test_empty_table_vacuous(spark):
    df = spark.createDataFrame([], "id long, v double")
    rep = _report(
        df,
        [("not_null", "id", 1.0), ("unique", "id", None), ("min", "v", 0.0)],
    )
    assert all(r["passed"] == 1 for r in rep.values())


def test_validation_errors(table):
    with pytest.raises(ValueError):
        check_constraints(table, [])
    with pytest.raises(ValueError):
        check_constraints(table, [("bogus", "id", 1)])
    with pytest.raises(ValueError):
        check_constraints(table, [("min", "nope", 0)])
