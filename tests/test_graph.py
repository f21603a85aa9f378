"""Fixed-iteration PageRank (operators/graph.py)."""

from decimal import Decimal, ROUND_HALF_UP

import pytest

from intake_esm_spark.operators.graph import pagerank


def _ref_pagerank(edges, iters=2, d=0.85, undirected=True):
    """Pure-python replay incl. the 12dp decimal contribution rule."""
    e = list(edges)
    if undirected:
        e = e + [(b, a) for a, b in e]
    nodes = sorted({x for p in e for x in p})
    n = len(nodes)
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    q12 = Decimal("0.000000000001")
    for _ in range(iters):
        s = {v: Decimal(0) for v in nodes}
        for a, b in e:
            c = Decimal(repr(round(r[a] / deg[a], 12))).quantize(
                q12, rounding=ROUND_HALF_UP
            )
            s[b] += c
        r = {v: (1.0 - d) / n + d * float(s[v]) for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_matches_python_reference(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=2).collect()}
    assert got == _ref_pagerank(edges)
    # a has degree 3 (hub): must outrank the leaf d
    assert got["a"] > got["d"]


def test_ranks_sum_to_one_undirected(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, iters=3).collect()
    assert sum(r["rank"] for r in out) == pytest.approx(1.0, abs=1e-5)


def test_directed_dangling_leaks_mass(spark):
    edges = [("a", "b")]  # b has no out-edges when directed
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=1, undirected=False).collect()
    }
    # b receives a's full rank; a only teleport mass
    assert out["b"] > out["a"]
    assert sum(out.values()) < 1.0  # b's mass left the system


def test_partition_independent(spark):
    edges = [(f"n{i}", f"n{(i * 7) % 40}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, pagerank(df, iters=2).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(13), iters=2).collect()))
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_triangle_count_hand_example(spark):
    """K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    Nodes 1,2 sit in both; 3,4 in one each. Dup/reversed/self edges
    normalize away."""
    from intake_esm_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4),
        (1, 1),          # self loop dropped
        (4, 2),          # duplicate reversed
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_count_no_triangles(spark):
    from intake_esm_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert triangle_count(df).count() == 0


# ---------------------------------------------------------------------------
# label propagation


def test_label_prop_path_converges_to_min_label(spark):
    from intake_esm_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=2).collect()
    }
    # hand replay: r1 -> {a:a, b:a, c:b}; r2 -> all 'a'
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_label_prop_components_stay_separate(spark):
    from intake_esm_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert got["x"] == got["y"] == "x"
    assert got["a"] == got["b"] == got["c"] == "a"


def test_label_prop_validation(spark):
    from intake_esm_spark.operators.graph import label_propagation

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        label_propagation(df, iters=0)


# --- link_prediction_jaccard ------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_link_pred_path_graph(spark):
    """1-2-3: the only candidate is (1,3) with Jaccard 1/1."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    out = link_prediction_jaccard(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src"], r["dst"]) == (1, 3)
    assert r["common_neighbors"] == 1
    assert (r["degree_src"], r["degree_dst"]) == (1, 1)
    assert r["jaccard"] == 1.0


def test_link_pred_square_graph(spark):
    """Cycle 1-2-3-4-1: candidates are the two diagonals, each with two
    shared neighbors and Jaccard 2/(2+2-2) = 1.0; existing edges are
    never suggested."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    out = link_prediction_jaccard(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()
    got = {(r["src"], r["dst"]): r for r in out}
    assert set(got) == {(1, 3), (2, 4)}
    for r in got.values():
        assert r["common_neighbors"] == 2 and r["jaccard"] == 1.0


def test_link_pred_min_common_and_k(spark):
    """Star 0-{1,2,3}: all leaf pairs share exactly the hub; min_common=2
    filters everything, k=1 keeps only the (1,2) tiebreak winner."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    assert link_prediction_jaccard(e, min_common=2).count() == 0
    top = link_prediction_jaccard(e, k=1).collect()
    assert [(r["src"], r["dst"]) for r in top] == [(1, 2)]


def test_link_pred_undirected_normalization(spark):
    """Reversed/duplicate/self-loop edges collapse before scoring."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    out = link_prediction_jaccard(
        _edges(spark, [(2, 1), (1, 2), (2, 3), (3, 3)])
    ).collect()
    assert len(out) == 1 and (out[0]["src"], out[0]["dst"]) == (1, 3)


def test_link_pred_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.graph import link_prediction_jaccard

    e = _edges(spark, [(1, 2)])
    with _pt.raises(ValueError):
        link_prediction_jaccard(e, k=0)
    with _pt.raises(ValueError):
        link_prediction_jaccard(e, max_neighbor_degree=0)
    with _pt.raises(ValueError):
        link_prediction_jaccard(e, min_common=0)


def test_link_pred_hub_guard_drops_mediation_only(spark):
    """A shared neighbor above max_neighbor_degree stops MEDIATING wedge
    pairs (the Σd(n)² guard) but keeps its edges, its true degree in the
    union denominator, and its own endpoint candidacy.

    Graph: hub 0 connected to leaves 1..12 (degree 12), plus the path
    1-100-2. Unguarded, the hub mediates all C(12,2)=66 leaf pairs and
    nodes 1/2 mediate (0,100) — 67 candidates. With
    max_neighbor_degree=5 the hub stops mediating: only (1,2) (via
    node 100) and (0,100) (via nodes 1 and 2) survive — and the degree
    columns still report TRUE degrees (hub 0: 12; leaf 1: 2)."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    edges = [(0, i) for i in range(1, 13)] + [(1, 100), (100, 2)]
    e = _edges(spark, edges)
    unguarded = link_prediction_jaccard(e, k=100).collect()
    assert len(unguarded) == 67
    guarded = link_prediction_jaccard(
        e, k=100, max_neighbor_degree=5
    ).collect()
    got = {(r["src"], r["dst"]): r for r in guarded}
    assert set(got) == {(1, 2), (0, 100)}
    r12 = got[(1, 2)]
    assert r12["common_neighbors"] == 1  # hub mediation gone, 100 stays
    assert (r12["degree_src"], r12["degree_dst"]) == (2, 2)  # true degs
    r0h = got[(0, 100)]
    assert r0h["common_neighbors"] == 2  # mediated by small nodes 1, 2
    assert (r0h["degree_src"], r0h["degree_dst"]) == (12, 2)  # hub kept


def test_link_pred_guard_inactive_matches_unguarded(spark):
    """With the default cap the guard is a no-op on a small graph: same
    rows, same scores as an explicit huge cap."""
    from intake_esm_spark.operators.graph import link_prediction_jaccard

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 3)])
    a = sorted(
        (r["src"], r["dst"], r["jaccard"])
        for r in link_prediction_jaccard(e, k=100).collect()
    )
    b = sorted(
        (r["src"], r["dst"], r["jaccard"])
        for r in link_prediction_jaccard(
            e, k=100, max_neighbor_degree=10**9
        ).collect()
    )
    assert a == b and len(a) > 0


# --- k_core -----------------------------------------------------------------


def test_kcore_peels_hub_of_leaves(spark):
    """Triangle {1,2,3} + hub 1 with leaves 10..13: raw degree of node 1
    is 6, but the 2-core is just the triangle — leaves die in round 1
    and take the hub's degree with them."""
    from intake_esm_spark.operators.graph import k_core

    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (1, 10), (1, 11), (1, 12), (1, 13)],
    )
    out = {r["node"]: r["core_degree"] for r in k_core(e, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    """Path 1-2-3-4 attached to a square 4-5-6-7-4: the path peels node
    by node (3 cascading rounds), the square survives as the 2-core."""
    from intake_esm_spark.operators.graph import k_core

    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 4)],
    )
    out = {r["node"]: r["core_degree"] for r in k_core(e, k=2).collect()}
    assert out == {4: 2, 5: 2, 6: 2, 7: 2}


def test_kcore_empty_when_k_too_large(spark):
    from intake_esm_spark.operators.graph import k_core

    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert k_core(e, k=3).count() == 0  # a triangle has no 3-core
    assert k_core(e, k=2).count() == 3


def test_kcore_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.graph import k_core

    e = _edges(spark, [(1, 2)])
    with _pt.raises(ValueError):
        k_core(e, k=0)
    with _pt.raises(ValueError):
        k_core(e, max_rounds=0)


# --- personalized_pagerank --------------------------------------------------


def test_ppr_mass_localizes_at_seeds(spark):
    """Star 0-{1..4}, seed {1}: after 2 rounds only the seed, the hub,
    and (via the hub) the other leaves carry mass — and the seed
    outranks non-seed leaves."""
    from intake_esm_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["rank"] for r in personalized_pagerank(e, seeds).collect()}
    assert out[1] > out[2] == out[3] == out[4]
    assert out[0] > 0  # one hop from the seed
    # global mass stays ~1 (undirected graph, no dangling leak)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_ppr_outside_neighborhood_is_zero(spark):
    """Two disconnected edges; seeding one component leaves the other
    at exactly 0."""
    from intake_esm_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2), (10, 11)])
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["rank"] for r in personalized_pagerank(e, seeds).collect()}
    assert out[10] == 0.0 and out[11] == 0.0
    assert out[1] > 0 and out[2] > 0


def test_ppr_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2)])
    empty = spark.createDataFrame([], "node long")
    with _pt.raises(ValueError):
        personalized_pagerank(e, empty)
    seeds = spark.createDataFrame([(1,)], "node long")
    with _pt.raises(ValueError):
        personalized_pagerank(e, seeds, iters=0)


def test_ppr_isolated_seed_keeps_restart_mass(spark):
    """A seed with no edges still appears with its restart mass and
    does not silently dilute the other seeds' teleport."""
    from intake_esm_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    out = {r["node"]: r["rank"] for r in personalized_pagerank(e, seeds).collect()}
    assert 99 in out
    # the isolated seed holds exactly its per-round restart share
    assert out[99] == round((1 - 0.85) / 2, 6)
    assert out[1] > 0 and out[2] > 0
