"""Product quantization (operators/pq.py)."""

import math

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import pq

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from intake_esm_spark.sources.tables import load_table

    return load_table(spark, SF, "embeddings")


def _books(spark):
    emb = _emb(spark)
    sample = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    return pq.codebooks_from_rows(sample, m=8)


def _coded(spark, books):
    vecs = _emb(spark).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    return vecs, vecs.select(
        "vec_id", pq.pq_encode(F.col("__v"), books).alias("pq_codes")
    )


def test_codebook_source_vectors_encode_to_themselves(spark):
    """Centroid (j, i) IS sample vector i's subvector, so sample i's
    distance to code i is exactly 0 per subspace — it must pick code i
    (a different pick would mean a duplicate subvector, which this
    fixture does not have)."""
    books = _books(spark)
    _, coded = _coded(spark, books)
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in coded.filter(F.col("vec_id") < 16).collect()
    }
    for i in range(16):
        assert got[i] == [i] * 8, (i, got[i])


def test_decode_of_encode_is_subspace_nearest(spark):
    """Reconstruction distance must be <= the distance to any OTHER
    code's reconstruction, subspace by subspace (the argmin property),
    and the mean error must beat the all-zeros strawman (|v| = 1)."""
    books = _books(spark)
    vecs, coded = _coded(spark, books)
    rec = coded.select(
        "vec_id", pq.pq_decode(F.col("pq_codes"), books).alias("__r")
    ).join(vecs, "vec_id")
    err = rec.select(
        F.sqrt(
            F.aggregate(
                F.zip_with("__r", "__v", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("e")
    )
    mean_err = err.agg(F.avg("e")).collect()[0][0]
    # unit-norm inputs: predicting 0 scores 1.0; the quantizer must beat it
    assert mean_err < 1.0
    # and the decode really concatenates the chosen centroids
    one = coded.filter(F.col("vec_id") == 3).collect()[0]
    recon = (
        coded.filter(F.col("vec_id") == 3)
        .select(pq.pq_decode(F.col("pq_codes"), books).alias("r"))
        .collect()[0]["r"]
    )
    manual = [v for j, c in enumerate(one["pq_codes"]) for v in books[j][c]]
    assert recon == pytest.approx(manual)


def test_pq_topk_recall_vs_exact(spark):
    """64x compression with untrained 16-sample codebooks: recall@10 vs
    the exact cosine top-k measured 0.40/0.42 at sf0.001/0.01 — pin a
    0.25 floor (chance is ~10/500 = 0.02). Trained per-subspace k-means
    codebooks (clustering.kmeans_refine) raise this; the floor guards
    the plumbing, not the training."""
    import __spark_entry__ as entry

    books = _books(spark)
    _, coded = _coded(spark, books)
    qdf = _emb(spark).filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = {
        (r["query_id"], r["vec_id"])
        for r in pq.pq_topk(coded, qdf, books, k=10).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in entry.q_simsearch_topk(spark, SF).collect()
    }
    assert len(approx) == len(exact) == 50
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.25, f"pq recall@10 collapsed to {recall}"


def test_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        pq.validate_codebooks([])
    with pytest.raises(ValueError, match="ragged"):
        pq.validate_codebooks([[[1.0, 2.0]], [[1.0]]])
    with pytest.raises(ValueError, match="divisible"):
        pq.codebooks_from_rows([[1.0, 2.0, 3.0]], m=2)
    with pytest.raises(ValueError, match="at least one"):
        pq.codebooks_from_rows([], m=2)


def test_train_codebooks_improves_quantizer(spark):
    """One-pass-per-iteration Lloyd training: the mean reconstruction
    error must drop vs the untrained seeds, and recall@10 must not get
    worse. (The training is what production runs; the seeds are just
    deterministic initialization.)"""
    books0 = _books(spark)
    emb = _emb(spark).persist()
    try:
        books2 = pq.train_codebooks(emb, books0, iters=2)

        def mse(books):
            vecs, coded = _coded(spark, books)
            rec = coded.select(
                "vec_id", pq.pq_decode(F.col("pq_codes"), books).alias("__r")
            ).join(vecs, "vec_id")
            return rec.select(
                F.aggregate(
                    F.zip_with("__r", "__v", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("e")
            ).agg(F.avg("e")).collect()[0][0]

        e0, e2 = mse(books0), mse(books2)
        assert e2 < e0, f"training did not reduce error: {e0} -> {e2}"

        # determinism: same inputs -> identical codebooks
        again = pq.train_codebooks(emb, books0, iters=2)
        assert again == books2
    finally:
        emb.unpersist()


def test_train_codebooks_keeps_empty_codes(spark):
    # 2 distinct vectors, 3 codes: one code never wins and must survive
    # rounded-in-place (the kmeans_refine empty-cluster rule)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    seeds = [[[1.0, 0.0], [0.0, 1.0], [5.0, 5.0]]]
    got = pq.train_codebooks(df, seeds, iters=1)
    assert got[0][0] == [1.0, 0.0]
    assert got[0][1] == [0.0, 1.0]
    assert got[0][2] == [5.0, 5.0]
    with pytest.raises(ValueError, match="iters"):
        pq.train_codebooks(df, seeds, iters=0)


def test_pq_encode_dimension_mismatch_raises(spark):
    """A vector whose length != m*dsub must fail loudly, not encode as
    all-zero codes."""
    from py4j.protocol import Py4JJavaError

    from intake_esm_spark.operators import pq

    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]  # m=2, dsub=2
    df = spark.createDataFrame([(1, [0.1, 0.2, 0.3])], "id long, v array<double>")
    out = df.select(pq.pq_encode(F.col("v"), books).alias("codes"))
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "pq_encode" in str(exc.value)
