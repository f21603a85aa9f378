"""Blocked entity resolution (operators/linkage.py)."""

import pytest

from intake_esm_spark.operators.linkage import candidate_matches


def test_candidate_matches_blocking_and_distance(spark):
    rows = [
        (1, "alice", "US"),
        (2, "alicia", "US"),   # lev(alice, alicia) = 2
        (3, "alice", "DE"),    # same name, different block -> no pair
        (4, "bob", "US"),
        (5, "alise", "US"),    # lev(alice, alise) = 1
    ]
    df = spark.createDataFrame(rows, "id long, name string, country string")
    out = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in candidate_matches(
            df, "id", "name", ["country"], max_distance=2
        ).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 2
    assert (1, 5) in out and out[(1, 5)] == 1
    assert (2, 5) not in out  # lev(alicia, alise) = 3 > max_distance
    assert all(a < b for a, b in out)
    assert not any(3 in p for p in out)  # cross-block never compared
    assert (1, 4) not in out             # bob too far


def test_candidate_matches_mega_block_guard(spark):
    rows = [(i, f"n{i}", "X") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, name string, country string")
    out = candidate_matches(
        df, "id", "name", ["country"], max_distance=99, max_block_rows=5
    ).collect()
    assert out == []  # the one block exceeds the guard -> dropped


def test_candidate_matches_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", "X"), (2, None, "X"), (None, "b", "X"), (3, "a", None)],
        "id long, name string, country string",
    )
    assert candidate_matches(df, "id", "name", ["country"], 0).count() == 0
    with pytest.raises(ValueError):
        candidate_matches(df, "id", "name", ["country"], -1)
    with pytest.raises(ValueError):
        candidate_matches(df, "id", "name", ["country"], 1, max_block_rows=1)


def test_deletion_index_equals_block_join(spark):
    """FastSS candidate generation is lossless for lev<=1: identical
    pair sets (incl. distances) on names with substitutions, an
    insertion/deletion pair, and exact duplicates."""
    rows = [
        (1, "alice", "X"),
        (2, "alise", "X"),    # substitution, lev 1
        (3, "alice", "X"),    # exact dup, lev 0
        (4, "alicee", "X"),   # insertion, lev 1
        (5, "alic", "X"),     # deletion, lev 1
        (6, "bob", "X"),
        (7, "alice", "Y"),    # other block
    ]
    df = spark.createDataFrame(rows, "id long, name string, country string")
    get = lambda m: {
        (r["id_a"], r["id_b"], r["distance"])
        for r in candidate_matches(
            df, "id", "name", ["country"], 1, method=m
        ).collect()
    }
    bj, di = get("block_join"), get("deletion_index")
    assert bj == di
    assert (1, 3, 0) in di and (1, 2, 1) in di
    assert (1, 4, 1) in di and (1, 5, 1) in di
    assert not any(6 in p[:2] or 7 in p[:2] for p in di)


def test_deletion_index_rejects_large_distance(spark):
    df = spark.createDataFrame([(1, "a", "X")], "id long, name string, country string")
    with pytest.raises(ValueError):
        candidate_matches(df, "id", "name", ["country"], 2, method="deletion_index")
    with pytest.raises(ValueError):
        candidate_matches(df, "id", "name", ["country"], 1, method="nope")
