"""Distributed spherical k-means refinement (operators/clustering.py)."""

import math

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import clustering


@pytest.fixture()
def two_blobs(spark):
    # tight cluster near +x and another near +y (2-D, easy geometry)
    rows = [(i, [1.0, 0.01 * i]) for i in range(10)] + [
        (100 + i, [0.01 * i, 1.0]) for i in range(10)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_refine_moves_centroids_to_blob_means(spark, two_blobs):
    refined = clustering.kmeans_refine(
        two_blobs, [[1.0, 0.0], [0.0, 1.0]], iters=2
    )
    assert len(refined) == 2 and all(len(c) == 2 for c in refined)
    # each refined centroid is unit-norm (to the 6dp rounding)
    for c in refined:
        assert math.sqrt(sum(v * v for v in c)) == pytest.approx(1.0, abs=1e-5)
    # centroid 0 stays x-dominant, centroid 1 y-dominant, and both moved
    # off the initial axes toward the blob means
    assert refined[0][0] > 0.9 and 0.0 < refined[0][1] < 0.1
    assert refined[1][1] > 0.9 and 0.0 < refined[1][0] < 0.1


def test_refine_empty_cluster_keeps_previous(spark, two_blobs):
    # third centroid far from every vector (negative orthant): no
    # assignments -> survives as its (rounded) previous self
    far = [-1.0, -1.0]
    refined = clustering.kmeans_refine(
        two_blobs, [[1.0, 0.0], [0.0, 1.0], far], iters=1
    )
    assert refined[2] == [-1.0, -1.0]


def test_refine_is_repartition_invariant(spark, two_blobs):
    a = clustering.kmeans_refine(two_blobs, [[1.0, 0.0], [0.0, 1.0]], iters=2)
    b = clustering.kmeans_refine(
        two_blobs.repartition(7), [[1.0, 0.0], [0.0, 1.0]], iters=2
    )
    assert a == b


def test_refine_improves_assignment_quality(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]

    def mean_sim(cs):
        b = clustering._assign_rounded(F.col("embedding"), cs)
        from intake_esm_spark.operators.simsearch import dot, l2_norm

        cent_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cs])
        best = F.element_at(cent_arr, b.cast("int") + 1)
        sim = dot(F.col("embedding"), best) / (
            l2_norm(F.col("embedding")) * l2_norm(best)
        )
        return emb.select(F.avg(sim).alias("m")).collect()[0]["m"]

    before = mean_sim(cents)
    after = mean_sim(clustering.kmeans_refine(emb, cents, iters=2))
    assert after >= before - 1e-9  # Lloyd never degrades the objective


def test_refine_validates(spark, two_blobs):
    with pytest.raises(ValueError, match="iters"):
        clustering.kmeans_refine(two_blobs, [[1.0, 0.0]], iters=0)
    with pytest.raises(ValueError, match="centroids"):
        clustering.kmeans_refine(two_blobs, [], iters=1)


def test_write_ivf_index_with_refinement(spark, tmp_path):
    """refine_iters composes the sampled bootstrap with full-corpus
    refinement; the written sidecar carries the REFINED (unit-norm)
    centroids and the probe path works unchanged."""
    import json

    from intake_esm_spark.operators import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_refined")
    cents = simsearch.write_ivf_index(
        emb, path, n_centroids=4, sample_fraction=0.5, refine_iters=1
    )
    sidecar = json.loads(
        spark.read.text(f"{path}/_ivf_centroids").collect()[0][0]
    )
    assert sidecar["centroids"] == cents
    for c in cents:
        assert math.sqrt(sum(v * v for v in c)) == pytest.approx(1.0, abs=1e-5)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = simsearch.ivf_topk_indexed(spark, path, queries, k=5, nprobe=2)
    assert out.count() > 0
