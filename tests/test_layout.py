"""Z-order layout keys (operators/layout.py)."""

import pytest

from intake_esm_spark.operators.layout import zorder_key


def _df(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def test_morton_known_values(spark):
    """Values 0..3 with bits=2 bucket to themselves (range 4, scale 4):
    the keys are the textbook Morton codes."""
    rows = [(a, b) for a in range(4) for b in range(4)]
    out = {
        (r["a"], r["b"]): r["zkey"]
        for r in zorder_key(_df(spark, rows), ["a", "b"], bits=2).collect()
    }
    # bit i of a at position 2i, of b at 2i+1
    def morton(a, b):
        z = 0
        for i in range(2):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert out == {(a, b): morton(a, b) for a in range(4) for b in range(4)}
    # bijective on the grid
    assert len(set(out.values())) == 16


def test_zorder_locality_beats_lexicographic(spark):
    """The curve's point of existence: consecutive keys stay close in
    BOTH dimensions. Over a 16x16 grid, the max |Δb| between z-adjacent
    rows is far below the lexicographic sort's full-range jump."""
    n = 16
    rows = [(a, b) for a in range(n) for b in range(n)]
    out = sorted(
        (r["zkey"], r["a"], r["b"])
        for r in zorder_key(_df(spark, rows), ["a", "b"], bits=4).collect()
    )
    # what file skipping actually sees: split the write order into 16
    # "files" of 16 rows and look at each file's min/max BOUNDING BOX.
    # Lexicographic order gives 1x16 boxes — perfect pruning on `a`,
    # ZERO pruning on `b` (every file spans b's full range). Z-order
    # gives 4x4 boxes — BOTH dimensions prune to a quarter.
    def ranges(order, chunk=16):
        worst_a = worst_b = 0
        for i in range(0, len(order), chunk):
            ch = order[i : i + chunk]
            aa = [t[-2] for t in ch]
            bb = [t[-1] for t in ch]
            worst_a = max(worst_a, max(aa) - min(aa))
            worst_b = max(worst_b, max(bb) - min(bb))
        return worst_a, worst_b

    za, zb = ranges(out)
    lex = sorted((a, b) for a, b in rows)
    la, lb = ranges(lex)
    assert (la, lb) == (0, n - 1)  # lex: one dim perfect, one dim useless
    assert (za, zb) == (3, 3)  # z: every file is a tight 4x4 tile


def test_zorder_nulls_and_constant_columns(spark):
    rows = [(None, 5), (1, 5), (2, 5)]
    out = {
        r["a"]: r["zkey"]
        for r in zorder_key(_df(spark, rows), ["a", "b"], bits=4).collect()
    }
    # constant b buckets to 0 everywhere; null a buckets to 0
    assert out[None] == 0
    assert len(out) == 3


def test_zorder_validation(spark):
    df = _df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)
