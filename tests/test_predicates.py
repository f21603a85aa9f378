"""Table-driven search-operator tests.

The parameter tables replicate the reference's golden corpus
(/root/reference/tests/test_search.py) so the Spark engine's semantics are
bit-for-bit compatible: OR-within-column, AND-across-columns, empty query ->
empty result, regex substring search with case preserved, compiled-pattern
flags, NaN/None null matching, iterable membership, and require_all_on
division (including the iterable-superset rule).
"""

import re

import pytest
from pyspark.sql import types as T

from intake_esm_spark.operators.division import apply_require_all_on
from intake_esm_spark.plans.predicates import is_pattern, search, to_java_regex
from intake_esm_spark.plans.query import Query, QueryError


@pytest.mark.parametrize(
    "value, expected",
    [
        (2, False),
        ("foo", False),
        ("foo\\**bar", True),
        ("foo\\?*bar", True),
        ("foo\\?\\*bar", False),
        ("foo\\*bar", False),
        (r"foo\*bar*", True),
        ("^foo", True),
        ("^foo.*bar$", True),
        (re.compile("hist.*", flags=re.IGNORECASE), True),
    ],
)
def test_is_pattern(value, expected):
    assert is_pattern(value) == expected


SCHEMA = T.StructType(
    [
        T.StructField("A", T.StringType()),
        T.StructField("B", T.StringType()),
        T.StructField("C", T.StringType()),
        T.StructField("D", T.StringType()),
    ]
)

ROWS = [
    ("NCAR", "CESM", "hist", "O2"),
    ("IPSL", "FOO", "control", "O2"),
    ("IPSL", "FOO", "hist", "O2"),
    ("CSIRO", "BAR", "control", "O2"),
    ("IPSL", "FOO", "hist", "NO2"),
    ("NCAR", "CESM", "control", "O2"),
    ("NOAA", "GCM", "hist", "O2"),
    ("NCAR", "WACM", "hist", "TA"),
    ("NASA", "foo", "HiSt", "tAs"),
    (None, None, "exp", "UA"),
]

SCALAR_PARAMS = [
    ({}, None, []),
    (
        {"C": ["control", "hist"]},
        ["B", "D"],
        [
            {"A": "NCAR", "B": "CESM", "C": "hist", "D": "O2"},
            {"A": "NCAR", "B": "CESM", "C": "control", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "control", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "O2"},
        ],
    ),
    ({"C": ["control", "hist"], "D": ["NO2"]}, "B", []),
    (
        {"C": ["control", "hist"], "D": ["O2"]},
        "B",
        [
            {"A": "NCAR", "B": "CESM", "C": "hist", "D": "O2"},
            {"A": "NCAR", "B": "CESM", "C": "control", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "control", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "O2"},
        ],
    ),
    (
        {"C": ["hist"], "D": ["NO2", "O2"]},
        "B",
        [
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "NO2"},
        ],
    ),
    (
        {"C": "hist", "D": ["NO2", "O2"]},
        "B",
        [
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "NO2"},
        ],
    ),
    (
        {"C": "hist", "D": ["NO2", "O2"], "B": "FOO"},
        ["B"],
        [
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "O2"},
            {"A": "IPSL", "B": "FOO", "C": "hist", "D": "NO2"},
        ],
    ),
    (
        {"C": ["control"]},
        None,
        [
            {"A": "IPSL", "B": "FOO", "C": "control", "D": "O2"},
            {"A": "CSIRO", "B": "BAR", "C": "control", "D": "O2"},
            {"A": "NCAR", "B": "CESM", "C": "control", "D": "O2"},
        ],
    ),
    (
        {"D": [re.compile(r"^O2$"), "NO2"], "B": ["CESM", "BAR"]},
        None,
        [
            {"A": "NCAR", "B": "CESM", "C": "hist", "D": "O2"},
            {"A": "CSIRO", "B": "BAR", "C": "control", "D": "O2"},
            {"A": "NCAR", "B": "CESM", "C": "control", "D": "O2"},
        ],
    ),
    (
        {"C": ["^co.*ol$"]},
        None,
        [
            {"A": "IPSL", "B": "FOO", "C": "control", "D": "O2"},
            {"A": "CSIRO", "B": "BAR", "C": "control", "D": "O2"},
            {"A": "NCAR", "B": "CESM", "C": "control", "D": "O2"},
        ],
    ),
    (
        {"C": ["hist"], "D": ["TA"]},
        None,
        [{"A": "NCAR", "B": "WACM", "C": "hist", "D": "TA"}],
    ),
    (
        {
            "C": [re.compile("hist.*", flags=re.IGNORECASE)],
            "D": [re.compile("TA.*", flags=re.IGNORECASE)],
        },
        None,
        [
            {"A": "NCAR", "B": "WACM", "C": "hist", "D": "TA"},
            {"A": "NASA", "B": "foo", "C": "HiSt", "D": "tAs"},
        ],
    ),
    ({"A": None}, None, [{"A": None, "B": None, "C": "exp", "D": "UA"}]),
    ({"A": float("nan")}, None, [{"A": None, "B": None, "C": "exp", "D": "UA"}]),
    # pd.NA and numpy NaN normalize to IS NULL exactly like None/NaN
    # (reference QueryModel, cat.py:483-488)
    ({"A": __import__("pandas").NA}, None, [{"A": None, "B": None, "C": "exp", "D": "UA"}]),
    (
        {"A": __import__("numpy").float64("nan")},
        None,
        [{"A": None, "B": None, "C": "exp", "D": "UA"}],
    ),
]


def _records(df):
    return [r.asDict() for r in df.collect()]


def _sorted(records):
    return sorted(records, key=lambda r: sorted((k, str(v)) for k, v in r.items()))


@pytest.mark.parametrize("query, require_all_on, expected", SCALAR_PARAMS)
def test_search_scalar(spark, query, require_all_on, expected):
    df = spark.createDataFrame(ROWS, SCHEMA)
    q = Query.normalize(query, df.columns, require_all_on)
    results = search(df, q)
    if require_all_on:
        results = apply_require_all_on(results, q)
    assert _sorted(_records(results)) == _sorted(expected)


ITER_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("variable", T.ArrayType(T.StringType())),
        T.StructField("attr", T.LongType()),
        T.StructField("random", T.ArrayType(T.StringType())),
    ]
)

ITER_ROWS = [
    ("file1", ["A", "B"], 1, ["bx", "by"]),
    ("file2", ["A", "B", "C"], 2, ["bx", "bz"]),
    ("file3", ["C", "D", "A"], 3, ["bx", "by"]),
]


@pytest.mark.parametrize(
    "query, expected_paths",
    [
        ({"variable": ["A", "C"], "random": "bz"}, ["file2"]),
        ({"variable": ["A", "C"], "attr": [1, 2]}, ["file1", "file2"]),
    ],
)
def test_search_iterables(spark, query, expected_paths):
    df = spark.createDataFrame(ITER_ROWS, ITER_SCHEMA)
    q = Query.normalize(query, df.columns)
    results = search(df, q)
    assert sorted(r["path"] for r in results.collect()) == expected_paths


def test_search_require_all_on_iterables(spark):
    rows = [
        ("file1", ["A", "B"], 1, ["bx", "by"]),
        ("file2", ["C", "D"], 1, ["bx", "by"]),
        ("file3", ["A"], 2, ["bx", "bz"]),
        ("file4", ["B", "C"], 2, ["bx", "bz"]),
        ("file5", ["C", "D", "A"], 3, ["bx", "by"]),
    ]
    df = spark.createDataFrame(rows, ITER_SCHEMA)
    q = Query.normalize(
        {"variable": ["A", "B"], "random": "bx"}, df.columns, ["attr"]
    )
    results = search(df, q)
    results = apply_require_all_on(results, q, {"variable", "random"})
    assert sorted(r["path"] for r in results.collect()) == ["file1", "file3", "file4"]


def test_require_all_on_duplicate_values_dedup(spark):
    """Duplicate query values must not inflate the required combo count
    (reference dedups with set(), _search.py:90) — before the fix every
    group was silently dropped because countDistinct could never reach
    the duplicated length."""
    rows = [
        ("f1", ["A"], 1, ["bx"]),
        ("f2", ["A"], 1, ["bx"]),
    ]
    df = spark.createDataFrame(rows, ITER_SCHEMA)
    q = Query.normalize({"variable": ["A", "A"]}, df.columns, ["attr"])
    results = apply_require_all_on(search(df, q), q, {"variable"})
    assert sorted(r["path"] for r in results.collect()) == ["f1", "f2"]


def test_require_all_on_compiled_pattern_returns_empty(spark):
    """A compiled-pattern value can never equal a concrete cell value in
    the subset test, so the reference returns an empty frame — this must
    not crash at plan-build time."""
    import re

    df = spark.createDataFrame(ITER_ROWS, ITER_SCHEMA)
    q = Query.normalize(
        {"variable": [re.compile("A.*")]}, df.columns, ["attr"]
    )
    results = apply_require_all_on(search(df, q), q, {"variable"})
    assert results.count() == 0


def test_null_value_on_iterable_column_matches_nothing(spark):
    """Reference branch order (_search.py:46-52): the iterable branch
    runs before the NA branch, and str.contains(None) collapses to an
    all-False mask — a null query value on an iterable column matches
    neither NULL cells nor anything else."""
    rows = [("f1", None, 1, None), ("f2", ["A"], 2, ["bx"])]
    df = spark.createDataFrame(rows, ITER_SCHEMA)
    q = Query.normalize({"variable": [None]}, df.columns)
    assert search(df, q).count() == 0
    # on a NON-iterable column, None still means isNull
    rows2 = [("f1", "x"), ("f2", None)]
    df2 = spark.createDataFrame(rows2, "path string, attr string")
    q2 = Query.normalize({"attr": [None]}, df2.columns)
    assert [r["path"] for r in search(df2, q2).collect()] == ["f2"]


def test_unknown_column_errors(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(QueryError):
        Query.normalize({"Z": "x"}, df.columns)
    with pytest.raises(QueryError):
        Query.normalize({"A": "x"}, df.columns, require_all_on=["Z"])


def test_to_java_regex_named_groups():
    assert to_java_regex("(?P<x>ab)c") == "(?<x>ab)c"
    assert to_java_regex(re.compile("a.c", re.IGNORECASE)) == "(?i)a.c"
