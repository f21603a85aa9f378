"""Distributed spherical k-means refinement for the IVF centroid set.

Extension per SURVEY §2.9 (no reference analogue — the reference has no
embedding operators at all).

``simsearch._kmeans_centroids`` picks centroids from a bounded driver-side
SAMPLE — the right cost model for index bootstrap, but sample-blind to
tail clusters on skewed corpora. This module refines any centroid set
with Lloyd iterations over the FULL corpus, Spark-first:

* **assignment** is the IVF family's rule — argmax of the 6dp-ROUNDED
  cosine with ties to the higher centroid index — as a codegen expression
  against literal centroid arrays (one in-row pass, no shuffle);
* **update** is the classic mean-per-cluster, computed WITHOUT exploding
  the corpus through the shuffle: ``posexplode`` flattens (bucket, dim,
  value) rows *inside each task* and the ``groupBy(bucket, dim)`` sum's
  map-side partial aggregation collapses every task's contribution to at
  most k x d rows before the exchange — the DataFrame-native equivalent
  of MLlib's ``treeAggregate`` (shuffle volume = partitions x k x d,
  independent of corpus size);
* **spherical step**: each new centroid is the assigned-vector mean,
  L2-normalized (keeps centroids unit-norm, so downstream dot == cosine
  — the invariant ``write_ivf_index`` relies on) and 6dp-rounded. The
  rounding is done IN the plan (``F.round``), not driver-side, so every
  iteration's output is an engine-portable set of doubles a SQL oracle
  reproduces exactly; an empty cluster keeps its previous centroid
  (6dp-rounded, un-renormalized).

Per iteration: ONE job, one k·d-row collect (centroids are
metadata-scale by definition). The python loop over iterations is
driver-side control flow, not driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.operators.simsearch import dot, l2_norm


def _round6_half_up(x: float) -> float:
    """Driver-side replay of Spark ``F.round(x, 6)`` / DuckDB ``round``:
    HALF_UP (away from zero on ties) over the double's shortest
    round-trip decimal — Spark's Round(double) rounds
    ``BigDecimal.valueOf(d)``, whose digits are what python ``repr``
    also produces. Same construction as
    ``simsearch.ivf_topk_indexed``'s probe rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _assign_rounded(vec, centroids: list[list[float]]):
    """Bucket = argmax of 6dp-rounded cosine(vec, centroid), ties to the
    HIGHER centroid index — the engine-portable IVF assignment rule."""
    cent_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    sims = F.transform(
        cent_arr, lambda c: F.round(dot(vec, c) / (l2_norm(vec) * l2_norm(c)), 6)
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.zip_with(sims, idx, lambda s, i: F.struct(s.alias("sim"), i.alias("idx")))
    return F.reverse(F.array_sort(pairs))[0]["idx"]


def kmeans_refine(
    df: DataFrame,
    centroids: list[list[float]],
    iters: int = 1,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Refine ``centroids`` with ``iters`` spherical-Lloyd iterations over
    the full corpus (see module docstring). Returns the refined centroids
    (each unit-norm to 6dp rounding). Deterministic: a pure function of
    (corpus multiset, initial centroids, iters) up to the 6dp rounding —
    the per-iteration ``F.round`` absorbs summation-order ulp differences
    (double sums are order-dependent; the relative error of a mean over
    millions of terms is ~1e-13, seven orders under the rounding
    quantum), which is the same agree-to-6dp-not-to-the-ulp contract the
    cosine entries use. The whole refinement replays in SQL.

    Each iteration is one action over ``df`` — at real scale ``persist()``
    the input before calling with ``iters > 1`` (as MLlib's k-means does)
    so the corpus is scanned from cache instead of storage per iteration;
    the operator does not persist for the caller because owning the
    unpersist lifecycle across a library boundary leaks executor memory."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not centroids:
        raise ValueError("centroids must be non-empty")
    from intake_esm_spark.operators._util import _spread

    import math

    from intake_esm_spark.operators.simsearch import with_norm

    k = len(centroids)
    current = [[float(v) for v in c] for c in centroids]
    spread = _spread(df)
    for _ in range(iters):
        # hot-path assignment hoists the row norm into its own column —
        # the naive `_assign_rounded` recomputes the O(dim) norm fold
        # once per centroid per row (no CSE inside lambdas: 2k folds/row
        # instead of k+1). Centroid norms are driver-side literals
        # (python double arithmetic == IEEE == the engine's, so the
        # product round(dot/(vnorm*cnorm), 6) is the identical value the
        # oracle computes via cosine).
        cnorms = [math.sqrt(sum(v * v for v in c)) for c in current]
        cent_arr = F.array(
            *[F.array(*[F.lit(v) for v in c]) for c in current]
        )
        base = with_norm(
            spread.select(F.col(vec_col).alias("__v")), "__v", "__vn"
        )
        sims = F.zip_with(
            cent_arr,
            F.array(*[F.lit(n) for n in cnorms]),
            lambda c, cn: F.round(dot(F.col("__v"), c) / (F.col("__vn") * cn), 6),
        )
        idx = F.sequence(F.lit(0), F.lit(k - 1))
        prs = F.zip_with(
            sims, idx, lambda s, i: F.struct(s.alias("sim"), i.alias("idx"))
        )
        assigned = base.select(
            F.reverse(F.array_sort(prs))[0]["idx"].alias("__bucket"),
            F.col("__v"),
        )
        sums = (
            assigned.select(
                "__bucket", F.posexplode(F.col("__v")).alias("__pos", "__x")
            )
            .groupBy("__bucket", "__pos")
            .agg(
                F.sum(F.col("__x").cast("double")).alias("__s"),
                F.count(F.lit(1)).alias("__c"),
            )
        )
        means = sums.groupBy("__bucket").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), (F.col("__s") / F.col("__c")).alias("__m")))
            ).alias("__pm")
        )
        # normalize + round IN the plan: materialize the mean vector in
        # its own projection, then its norm, so neither is recomputed
        # inside the rounding lambda (no CSE inside lambdas)
        mv = means.select(
            "__bucket",
            F.transform(F.col("__pm"), lambda s: s["__m"]).alias("__mv"),
        )
        mv = mv.withColumn("__norm", l2_norm(F.col("__mv")))
        out = mv.select(
            "__bucket",
            F.transform(
                F.col("__mv"), lambda v: F.round(v / F.col("__norm"), 6)
            ).alias("__cvec"),
        ).collect()
        by_bucket = {r["__bucket"]: list(r["__cvec"]) for r in out}
        nxt = []
        for cid in range(k):
            if cid in by_bucket:
                nxt.append(by_bucket[cid])
            else:
                # empty cluster: keep the previous centroid, rounded the
                # same way the survivors were. Driver-side replay of
                # F.round (Decimal HALF_UP on the shortest round-trip
                # decimal — exactly what Spark's Round(double) computes
                # via BigDecimal.valueOf) instead of a 1-row Spark job:
                # this host has measured multi-second latencies for 1-row
                # jobs, and after iteration 1 the values are ALREADY on
                # the 6dp grid (round of a rounded value is the identity
                # in both modes), so only unrounded caller-provided
                # initial centroids ever exercise the rounding rule.
                nxt.append([_round6_half_up(v) for v in current[cid]])
        current = nxt
    return current
