"""Distributed PageRank — fixed-iteration message passing over an edge
list.

Extension (SURVEY §2.9): the third iterative-algorithm shape in the repo
(connected components = min-label propagation, k-means = centroid
refinement, PageRank = weighted message passing). Useful on any derived
graph this engine builds: near-duplicate candidate pairs, cross-source
overlap, entity co-occurrence — "which document/supplier/node is
structurally central".

Per iteration the plan is exactly two keyed exchanges: the rank frame
joins the edge list on the source key (node-sized ⋈ edge-sized,
co-keyed) and contributions aggregate by destination (map-side
partials). The rank frame is node-sized throughout and is
``localCheckpoint``ed each round — without it iteration N's plan embeds
rounds 1..N-1 (the connected-components lesson). A hub node is one hot
aggregation key; AQE's skew handling applies to the join, and the
aggregate only sums.

Determinism (the oracle contract): a double sum over a node's in-edges
is partition-order-dependent, so each contribution is quantized to 12dp
and accumulated as DECIMAL(28,12) — exact, order-independent — with the
damping arithmetic done in fixed IEEE double form on the exact sum.
Quantization perturbs ranks by < n·5e-13 per node per iteration, far
below any ranking use, and makes Spark and a SQL replay agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """Ranks after ``iters`` rounds of ``r' = (1-d)/N + d·Σ r_u/deg_u``
    over the in-neighbors, from a uniform ``1/N`` start. With
    ``undirected=True`` every edge is traversed both ways (the
    co-occurrence-graph setting); dangling nodes (no out-edges, only
    possible when directed) leak their mass — the standard simplified
    formulation, mirrored exactly by the oracle. Self-loops count like
    any edge; parallel edges should be de-duplicated upstream if
    unwanted. Returns ``(node, rank)`` with the rank 6dp-rounded."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # pin the (possibly expensive) upstream edge plan once: it is
    # re-joined every iteration
    e = e.localCheckpoint(eager=False)
    # nodes is referenced every iteration (the teleport re-join) AND for
    # N — without the pin each reference re-runs the corpus-scale
    # distinct (the multi-reference re-planning pitfall)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # degree rides ON the edge rows (loop-invariant — joining it inside
    # the loop would pay an extra exchange per iteration); checkpointed
    # so every round reuses the materialized (src, dst, deg) frame.
    # r15 probe, CLOSED after measurement: an AQE-off EAGER checkpoint
    # here preserves hashpartitioning(src)+ordering (what r14's lazy
    # probe could not get — the lazy pin materializes as
    # UnknownPartitioning) and drops the per-iteration plan from 3
    # Exchanges to 1 (plans/r15/graph_pagerank_iteration_*.txt), but
    # five paired min-basis A/B legs put it 4.39 → 4.48-4.82 s and ppr
    # 4.91 → 5.24-5.30 s: at bench scale AQE already broadcasts the
    # node-sized rank frame (no edge exchange either way), so the
    # pre-partitioned SMJ path only adds sort + AQE-less
    # materialization cost.  Revisit only on a cluster where the rank
    # frame exceeds the broadcast threshold.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = 1.0 / n_nodes
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(base).alias("__r"))
    for _ in range(iters):
        contrib = ranks.join(
            e_deg, ranks["node"] == e_deg["src"], "inner"
        ).select(
            F.col("dst"),
            F.round(F.col("__r") / F.col("__deg"), 12)
            .cast("decimal(28,12)")
            .alias("__c"),
        )
        summed = contrib.groupBy("dst").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
                ).alias("__r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("__r", 6).alias("rank"))


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal behind community/spam detection. Input edges are
    treated as undirected (both orientations and self-loops are
    normalized away; duplicates collapse).

    The compact-forward algorithm: orient every edge low-id → high-id,
    join oriented edges on their source to enumerate each WEDGE
    (a→b, a→c with b < c) exactly once, then semi-join the closing edge
    (b→c) — every triangle {a,b,c} is found exactly once, at its
    lowest-id corner, so per-node counts sum each triangle three times
    total with no double counting. At scale the wedge join's output is
    Σ_v d⁺(v)² over ORIENTED degrees — a guard bound, since orientation
    caps hub fan-out at the id-split (the classic improvement orders by
    degree; id order keeps the whole computation engine-replayable).
    Three exchanges: edge normalize (distinct), the wedge self-join, the
    closing semi-join + the final per-node unions."""
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds the wedge join twice + close
    )
    w1 = e.select(F.col("a"), F.col("b").alias("x"))
    w2 = e.select(F.col("a"), F.col("b").alias("y"))
    wedges = w1.join(w2, "a").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    ).select(F.col("a"), F.col("x"), F.col("y"))
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("x").alias("node")))
        .unionAll(tri.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation over an
    undirected graph: every node starts labeled with its own id and
    each round adopts the label most frequent among its neighbors PLUS
    one self-vote (the self-vote damps the label oscillation that pure
    synchronous LPA exhibits on bipartite graphs and keeps isolated
    nodes labeled). Ties break to the SMALLEST label, so the algorithm
    is fully deterministic and an unrolled SQL replay agrees exactly —
    no float arithmetic anywhere.

    Scale shape: per round, the vote join is node-frame ⋈ edge-frame on
    the dst key, the vote count is a (node, label)-keyed partial
    aggregate bounded by the edge count, and the winner pick is a
    row_number window partitioned by node — three keyed exchanges per
    round, never node×label dense. The label frame is node-sized
    throughout and localCheckpointed each round (iteration N's plan
    would otherwise embed rounds 1..N-1). Returns ``(node, community)``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from pyspark.sql import Window

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r15 probe, REJECTED on measurement: the eager keyed pin
    # (_pin_partitioned on "dst") regressed this entry 5.2 → 7.2 s in
    # paired min-basis A/B legs — pre-partitioning forces the vote join
    # down the sort-merge path, while the lazy pin lets AQE broadcast
    # the node-sized label frame (no edge exchange either way at bench
    # scale); the same probe closed pagerank/ppr — see pagerank's
    # e_deg note for the full numbers.
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("__l"))
    pick = Window.partitionBy("__n").orderBy(
        F.col("__cnt").desc(), F.col("__l").asc()
    )
    for _ in range(iters):
        nbr = e.join(labels, e["dst"] == labels["node"]).select(
            F.col("src").alias("__n"), F.col("__l")
        )
        votes = nbr.unionAll(
            labels.select(F.col("node").alias("__n"), F.col("__l"))
        )
        counts = votes.groupBy("__n", "__l").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        labels = (
            counts.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select(F.col("__n").alias("node"), "__l")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("__l").alias("community"))


def link_prediction_jaccard(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 50,
    min_common: int = 1,
    max_neighbor_degree: int = 10000,
) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    2003): for every NON-edge pair (u, w) sharing at least
    ``min_common`` neighbors, score ``|Γ(u)∩Γ(w)| / |Γ(u)∪Γ(w)|`` and
    return the top-``k`` — the "who should be connected next"
    primitive behind friend/product suggestions, here in its
    engine-exact form (integer intersection counts + one final divide;
    Adamic-Adar's ``1/ln d`` weighting would work identically but adds
    a per-neighbor log to the determinism contract for no test value).

    Plan: normalize undirected edges once (pinned — feeds the wedge
    join, the known-edge anti-join, and degrees); enumerate co-neighbor
    pairs via the adjacency self-join on the shared neighbor (output
    Σd(n)² over neighbor degrees); count-distinct shared neighbors per
    pair; anti-join existing edges; AQE-decided degree joins (node-grain
    frames); top-k = ``TakeOrderedAndProject`` with the pair as tiebreak.

    **Hub guard**: the wedge join fans out Σd(n)² rows over SHARED-
    neighbor degrees (unlike :func:`triangle_count`, whose low-id→high-id
    orientation bounds fan-out by oriented degree) — one 10⁶-degree hub
    would emit 10¹² pairs. ``max_neighbor_degree`` drops over-degree
    nodes from the SHARED-NEIGHBOR role before the self-join (the
    basket.py mega-basket pattern: a count window on the same key the
    join shuffles on, so the guard rides the exchange the join needs
    anyway). Semantics: a hub stops MEDIATING pairs ("everyone shares
    the mega-hub" carries no signal — the Jaccard score of such pairs is
    ~0 anyway) but keeps its own edges, its true degree in the union
    denominator, and its own candidacy as an endpoint."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_neighbor_degree < 1:
        raise ValueError(
            f"max_neighbor_degree must be >= 1, got {max_neighbor_degree}"
        )
    from pyspark.sql import Window

    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = e.select(F.col("a").alias("n"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("n"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    wn = Window.partitionBy("n")
    capped = (
        adj.withColumn("__dn", F.count(F.lit(1)).over(wn))
        .filter(F.col("__dn") <= max_neighbor_degree)
        .drop("__dn")
        # pin: both self-join sides reference this frame (the basket.py
        # multi-reference rule).  r15 probe, REJECTED on measurement:
        # the eager keyed pin on "n" (which makes the wedge self-join
        # exchange-free on both sides) regressed 2.8 → 3.2 s in paired
        # min-basis A/B legs — the extra eager repartition pass costs
        # more than the self-join exchanges it removes at this shape.
        .localCheckpoint(eager=False)
    )
    pairs = (
        capped.select(F.col("n"), F.col("v").alias("u"))
        .join(capped.select(F.col("n"), F.col("v").alias("w")), "n")
        .filter(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= min_common)
    )
    cand = pairs.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("v").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("v").alias("w"), F.col("deg").alias("dw")), "w")
        .select(
            F.col("u").alias("src"),
            F.col("w").alias("dst"),
            F.col("cn").alias("common_neighbors"),
            F.col("du").alias("degree_src"),
            F.col("dw").alias("degree_dst"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("du") + F.col("dw") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(k)


def k_core(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 32,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983 /
    Batagelj-Zaveršnik): repeatedly delete nodes with degree < ``k``
    until the survivors all have degree ≥ k WITHIN the survivors — the
    maximal subgraph where everyone keeps k neighbors. The standard
    "dense nucleus" extractor behind spam-ring and community-core
    analysis; a node's raw degree overstates its embeddedness (a hub of
    leaves dies in round 2), which is exactly what peeling corrects.

    Returns ``(node, core_degree)`` — the surviving nodes with their
    degree inside the k-core. Peeling is IDEMPOTENT once stable, so an
    oracle may replay more rounds than needed; the Spark loop stops at
    the fixpoint (one count probe per round, the connected-components
    pattern) or ``max_rounds``, whichever first.

    Scale: per round, one degree aggregation + one broadcast-friendly
    semi-join of edges against surviving nodes — the live edge set only
    shrinks; it is localCheckpoint'ed per round so round N's plan never
    embeds rounds 1..N-1 (the CC lineage lesson). Rounds are bounded by
    the degeneracy ordering's depth, O(peel waves), not node count."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    live = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        adj = live.select(F.col("a").alias("v")).unionAll(
            live.select(F.col("b").alias("v"))
        )
        deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(
            eager=False
        )  # referenced by the probe AND the strong filter
        strong = deg.filter(F.col("d") >= k).select("v")
        # ONE action per round for the convergence probe (separate
        # counts would re-run the degree aggregation lineage twice)
        n_nodes, n_strong = deg.agg(
            F.count(F.lit(1)), F.sum((F.col("d") >= k).cast("long"))
        ).collect()[0]
        n_strong = n_strong or 0
        if n_strong == n_nodes:
            break
        live = (
            live.join(
                strong.select(F.col("v").alias("a")), "a", "left_semi"
            )
            .join(strong.select(F.col("v").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
        if n_strong == 0:
            break
    adj = live.select(F.col("a").alias("node")).unionAll(
        live.select(F.col("b").alias("node"))
    )
    return (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    undirected: bool = True,
) -> DataFrame:
    """Personalized PageRank: teleport returns to the SEED set instead
    of everywhere — "importance relative to these nodes", the random-
    walk-with-restart scorer behind who-to-follow / related-items
    (Gupta et al. 2013 WTF). Start mass ``1/|S|`` on the seeds, zero
    elsewhere; per round ``r' = d·Σ r_u/deg_u + (1−d)·1_{v∈S}/|S|``.
    Nodes outside the seeds' ``iters``-hop neighborhood keep rank 0 —
    locality is the point.

    Same plan discipline as :func:`pagerank` (this is its seeded
    sibling): degree denormalized onto edges outside the loop, node and
    rank frames checkpointed per round, 12dp-decimal contributions for
    order-independent sums; the seed flag joins once onto the node
    frame (seed sets are small — broadcast)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.localCheckpoint(eager=False)
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("seeds must be non-empty")
    # node frame = edge endpoints UNION the seeds: a seed with no edges
    # still holds its restart mass ((1-d)/|S| every round) and appears
    # in the output — dropping it would silently dilute every other
    # seed's teleport (n_seeds counts it) and lose rank mass
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(s.select("node"))
        .distinct()
        .join(F.broadcast(s.withColumn("__is_seed", F.lit(True))), "node", "left")
        .select("node", F.coalesce("__is_seed", F.lit(False)).alias("__is_seed"))
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # r15: keyed eager pin probed and CLOSED — see pagerank's e_deg note
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    restart = F.when(
        F.col("__is_seed"), F.lit((1.0 - damping) / n_seeds)
    ).otherwise(F.lit(0.0))
    ranks = nodes.select(
        "node",
        "__is_seed",
        F.when(F.col("__is_seed"), F.lit(1.0 / n_seeds))
        .otherwise(F.lit(0.0))
        .alias("__r"),
    )
    for _ in range(iters):
        contrib = ranks.join(
            e_deg, ranks["node"] == e_deg["src"], "inner"
        ).select(
            F.col("dst"),
            F.round(F.col("__r") / F.col("__deg"), 12)
            .cast("decimal(28,12)")
            .alias("__c"),
        )
        summed = contrib.groupBy("dst").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                "__is_seed",
                (
                    restart
                    + F.lit(damping)
                    * F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
                ).alias("__r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("__r", 6).alias("rank"))
