"""KMV distinct-count sketch (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators.sketch import kmv_distinct, kmv_union


@pytest.fixture(scope="module")
def keyed(spark):
    # 400 distinct keys in group 'big', 5 in 'small', nulls ignored
    rows = [("big", f"k{i % 400}") for i in range(1200)]
    rows += [("small", f"s{i}") for i in range(5)]
    rows += [("small", None)]
    return spark.createDataFrame(rows, "g string, key string")


def test_small_group_is_exact(keyed):
    r = {x["g"]: x.asDict() for x in kmv_distinct(keyed, "key", ["g"], k=32).collect()}
    assert r["small"]["n_kept"] == 5
    assert r["small"]["distinct_est"] == 5.0  # saw everything -> exact
    assert r["small"]["kmv_hashes"] == sorted(r["small"]["kmv_hashes"])


def test_estimator_accuracy_and_shape(keyed):
    r = {x["g"]: x.asDict() for x in kmv_distinct(keyed, "key", ["g"], k=64).collect()}
    big = r["big"]
    assert big["n_kept"] == 64
    assert len(big["kmv_hashes"]) == 64
    # KMV with k=64 has ~1/sqrt(62) ≈ 12.7% relative std error; 3 sigma
    assert 250 <= big["distinct_est"] <= 600


def test_duplicates_do_not_move_estimate(spark, keyed):
    # repeating rows changes nothing: the sketch is over DISTINCT hashes
    doubled = keyed.unionByName(keyed)
    a = kmv_distinct(keyed, "key", ["g"], k=16).drop("kmv_hashes").collect()
    b = kmv_distinct(doubled, "key", ["g"], k=16).drop("kmv_hashes").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_union_merges_to_whole_corpus_sketch(spark, keyed):
    part_a = keyed.filter(F.crc32("key") % 2 == 0)
    part_b = keyed.filter((F.crc32("key") % 2 == 1) | F.col("key").isNull())
    k = 24
    merged = kmv_union(
        kmv_distinct(part_a, "key", ["g"], k=k),
        kmv_distinct(part_b, "key", ["g"], k=k),
        ["g"],
        k=k,
    )
    whole = kmv_distinct(keyed, "key", ["g"], k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_union_passes_through_one_sided_groups(spark):
    a = spark.createDataFrame([("x", f"a{i}") for i in range(3)], "g string, key string")
    b = spark.createDataFrame([("y", f"b{i}") for i in range(4)], "g string, key string")
    m = {
        r["g"]: r.asDict()
        for r in kmv_union(
            kmv_distinct(a, "key", ["g"], k=8),
            kmv_distinct(b, "key", ["g"], k=8),
            ["g"],
            k=8,
        ).collect()
    }
    assert m["x"]["n_kept"] == 3 and m["y"]["n_kept"] == 4


def test_k_validation(keyed):
    with pytest.raises(ValueError):
        kmv_distinct(keyed, "key", ["g"], k=1)


def test_stream_kmv_matches_batch(spark, tmp_path):
    """Streaming KMV across micro-batches must converge to the batch
    sketch exactly — hashes, n_kept, and the rounded estimate."""
    from intake_esm_spark.streaming.stateful import stream_distinct_kmv

    rows = [("big", f"k{i}") for i in range(300)] + [
        ("small", f"s{i}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    batch = {
        r["g"]: (tuple(r["kmv_hashes"]), r["n_kept"], r["distinct_est"])
        for r in stream_distinct_kmv(df, "key", "g", k=32).collect()
    }

    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    src = tmp_path / "src"
    df.filter(F.crc32("key") % 2 == 0).repartition(1).write.parquet(str(src / "a"))
    df.filter(F.crc32("key") % 2 == 1).repartition(1).write.parquet(str(src / "b"))
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(src / "*" / "*.parquet")))):
        shutil.copy(f, flat / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = stream_distinct_kmv(stream, "key", "g", k=32)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM kmv_stream").collect()
    finally:
        q.stop()
    assert len(emitted) > len(batch), "expected updates from multiple batches"
    final = {}
    for r in emitted:
        cur = final.get(r["g"])
        cand = (r["n_kept"], [-h for h in r["kmv_hashes"]])
        # later updates dominate: more kept hashes, then smaller hashes
        if cur is None or cand > cur[0]:
            final[r["g"]] = (cand, r)
    streamed = {
        g: (tuple(r["kmv_hashes"]), r["n_kept"], r["distinct_est"])
        for g, (_, r) in final.items()
    }
    assert streamed == batch


def test_pairwise_overlap_exact_when_sketches_complete(spark):
    """Small groups (sketch saw everything) -> union/intersect/jaccard
    are exact set arithmetic."""
    from intake_esm_spark.operators.sketch import kmv_distinct, kmv_pairwise_overlap

    rows = (
        [("x", f"u{i}") for i in range(10)]
        + [("y", f"u{i}") for i in range(5, 20)]  # |x∩y|=5 |x∪y|=20
        + [("z", "only")]
    )
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv_distinct(df, "key", ["g"], k=64)
    out = {
        (r["group_a"], r["group_b"]): r.asDict()
        for r in kmv_pairwise_overlap(sk, "g", k=64).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    xy = out[("x", "y")]
    assert xy["union_est"] == 20.0
    assert xy["intersect_est"] == 5.0
    assert xy["jaccard_est"] == 0.25
    assert out[("x", "z")]["intersect_est"] == 0.0


def test_pairwise_overlap_estimates_at_scale(spark):
    """Big overlapping groups: estimates within the sketch's error bars."""
    from intake_esm_spark.operators.sketch import kmv_distinct, kmv_pairwise_overlap

    rows = [("a", f"u{i}") for i in range(600)] + [
        ("b", f"u{i}") for i in range(300, 900)
    ]  # union 900, intersection 300, jaccard 1/3
    df = spark.createDataFrame(rows, "g string, key string")
    sk = kmv_distinct(df, "key", ["g"], k=128)
    r = kmv_pairwise_overlap(sk, "g", k=128).collect()[0]
    assert 650 <= r["union_est"] <= 1200
    assert 180 <= r["intersect_est"] <= 450
    assert 0.2 <= r["jaccard_est"] <= 0.5


def test_stream_kmv_long_key_with_nulls_matches_batch(spark, tmp_path):
    """A LongType key column containing nulls arrives in pandas as
    float64; the JVM-side string cast must keep hashes equal to the
    batch operator's CAST(key AS STRING) — and an all-null group must
    produce NO row, like the batch isNotNull filter."""
    from intake_esm_spark.streaming.stateful import stream_distinct_kmv

    rows = [("g", i) for i in range(50)] + [("g", None), ("empty", None)]
    df = spark.createDataFrame(rows, "g string, key long")
    batch = {
        r["g"]: (tuple(r["kmv_hashes"]), r["n_kept"], r["distinct_est"])
        for r in stream_distinct_kmv(df, "key", "g", k=16).collect()
    }
    assert set(batch) == {"g"}  # no row for the all-null group

    src = tmp_path / "src"
    src.mkdir()
    df.repartition(1).write.parquet(str(src / "a"))
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(src / "a" / "*.parquet")))):
        shutil.copy(f, flat / f"p{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema).format("parquet").load(str(flat))
    )
    out = stream_distinct_kmv(stream, "key", "g", k=16)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_nulls")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM kmv_nulls").collect()
    finally:
        q.stop()
    streamed = {
        r["g"]: (tuple(r["kmv_hashes"]), r["n_kept"], r["distinct_est"])
        for r in emitted
    }
    assert streamed == batch


# --- Count-Min sketch -------------------------------------------------------


def _items(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "it string")


def test_cm_estimate_never_underestimates(spark):
    from intake_esm_spark.operators.sketch import cm_estimate, cm_sketch

    stream = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]
    df = _items(spark, stream)
    sk = cm_sketch(df, "it", depth=4, width=64)
    probes = _items(spark, ["a", "b", "c", "d"])
    est = {
        r["it"]: r["cm_est"]
        for r in cm_estimate(sk, probes, "it", depth=4, width=64).collect()
    }
    exact = {"a": 50, "b": 20, "c": 5, "d": 1}
    for k, v in exact.items():
        assert est[k] >= v  # the CM one-sided guarantee
    # total mass bound: no estimate exceeds the stream length
    assert all(v <= len(stream) for v in est.values())


def test_cm_wide_sketch_is_exact_on_small_domains(spark):
    """With width >> distinct items, collisions are (almost surely)
    absent and every estimate is exact."""
    from intake_esm_spark.operators.sketch import cm_estimate, cm_sketch

    stream = ["x"] * 7 + ["y"] * 3
    df = _items(spark, stream)
    sk = cm_sketch(df, "it", depth=4, width=4096)
    est = {
        r["it"]: r["cm_est"]
        for r in cm_estimate(
            sk, _items(spark, ["x", "y", "zz"]), "it", depth=4, width=4096
        ).collect()
    }
    assert est == {"x": 7, "y": 3, "zz": 0}  # missing item floors at 0


def test_cm_union_equals_whole_stream_sketch(spark):
    from intake_esm_spark.operators.sketch import cm_sketch, cm_union

    a = ["a"] * 5 + ["b"] * 2
    b = ["a"] * 3 + ["c"] * 4
    sk_a = cm_sketch(_items(spark, a), "it", depth=3, width=32)
    sk_b = cm_sketch(_items(spark, b), "it", depth=3, width=32)
    merged = {
        (r["row"], r["col"]): r["n"]
        for r in cm_union(sk_a, sk_b).collect()
    }
    whole = {
        (r["row"], r["col"]): r["n"]
        for r in cm_sketch(_items(spark, a + b), "it", depth=3, width=32).collect()
    }
    assert merged == whole  # element-wise addition == one-pass sketch


def test_cm_sketch_bounded_and_validated(spark):
    import pytest as _pt

    from intake_esm_spark.operators.sketch import cm_sketch

    df = _items(spark, [f"i{i}" for i in range(500)])
    sk = cm_sketch(df, "it", depth=2, width=16)
    assert sk.count() <= 2 * 16  # counter array, whatever the stream
    with _pt.raises(ValueError):
        cm_sketch(df, "it", depth=0)
    with _pt.raises(ValueError):
        cm_sketch(df, "it", width=1)


def test_stream_cm_sketch_matches_batch(spark, tmp_path):
    """Two micro-batches of items: the final update per (row, col) cell
    equals the whole-corpus batch sketch exactly (integer counters)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.sketch import cm_sketch
    from intake_esm_spark.streaming.stateful import stream_cm_sketch

    rows = [("a",)] * 30 + [("b",)] * 10 + [(f"i{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "it string")
    batch = {
        (r["row"], r["col"]): r["n"]
        for r in cm_sketch(df, "it", depth=3, width=64).collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32("it") % 2 == 0).repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.filter(F.crc32("it") % 2 == 1).repartition(1).write.parquet(
        str(tmp_path / "b")
    )
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_cm_sketch(stream, "it", depth=3, width=64)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cm_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM cm_stream").collect()
    finally:
        q.stop()
    assert len(emitted) > len(batch), "expected updates from both batches"
    final = {}
    for r in emitted:  # counters only grow: the max IS the latest update
        cell = (r["row"], r["col"])
        final[cell] = max(final.get(cell, 0), r["n"])
    assert final == batch


# --- Bloom filter -----------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from intake_esm_spark.operators.sketch import bloom_build, bloom_probe

    members = [f"m{i}" for i in range(200)]
    others = [f"x{i}" for i in range(200)]
    bloom = bloom_build(_items(spark, members), "it", n_hashes=7, n_bits=8192)
    got = {
        r["it"]: r["might_contain"]
        for r in bloom_probe(
            bloom,
            _items(spark, members + others),
            "it",
            n_hashes=7,
            n_bits=8192,
        ).collect()
    }
    # EVERY member probes true — the structural no-false-negative law
    assert all(got[m] for m in members)
    # false positives exist in principle but are rare at these params
    fp = sum(got[o] for o in others)
    assert fp <= 10  # expected ~0.04% at k=7, m=8192, n=200


def test_bloom_merge_equals_whole_build(spark):
    from intake_esm_spark.operators.sketch import bloom_build, bloom_merge

    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    merged = {
        r["pos"]
        for r in bloom_merge(
            bloom_build(_items(spark, a), "it", n_hashes=3, n_bits=512),
            bloom_build(_items(spark, b), "it", n_hashes=3, n_bits=512),
        ).collect()
    }
    whole = {
        r["pos"]
        for r in bloom_build(
            _items(spark, a + b), "it", n_hashes=3, n_bits=512
        ).collect()
    }
    assert merged == whole


def test_bloom_bounded_and_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.sketch import bloom_build

    df = _items(spark, [f"i{i}" for i in range(1000)])
    assert bloom_build(df, "it", n_hashes=4, n_bits=64).count() <= 64
    with _pt.raises(ValueError):
        bloom_build(df, "it", n_hashes=0)
    with _pt.raises(ValueError):
        bloom_build(df, "it", n_bits=1)


def test_stream_bloom_build_matches_batch(spark, tmp_path):
    """Two micro-batches: the union of appended bit positions equals the
    whole-corpus batch filter, each bit emitted exactly once."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.sketch import bloom_build
    from intake_esm_spark.streaming.stateful import stream_bloom_build

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(120)], "it string"
    )
    batch = {
        r["pos"]
        for r in bloom_build(df, "it", n_hashes=5, n_bits=1024).collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32("it") % 2 == 0).repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.filter(F.crc32("it") % 2 == 1).repartition(1).write.parquet(
        str(tmp_path / "b")
    )
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_bloom_build(stream, "it", n_hashes=5, n_bits=1024)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = [r["pos"] for r in spark.sql("SELECT * FROM bloom_stream").collect()]
    finally:
        q.stop()
    assert len(emitted) == len(set(emitted))  # each bit lit exactly once
    assert set(emitted) == batch


# --- quantile sketch --------------------------------------------------------


def test_quantile_sketch_exact_when_k_covers_group(spark):
    """k >= group size: the sample IS the distribution and rank-select
    quantiles are exact type-1."""
    from intake_esm_spark.operators.sketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    rows = [(i, float(i)) for i in range(1, 101)]  # values 1..100
    df = spark.createDataFrame(rows, "k long, v double")
    sk = quantile_sketch(df, "v", "k", [], k=256)
    q = sketch_quantiles(sk, [0.5, 0.95, 1.0], [], ["p50", "p95", "p100"])
    r = q.collect()[0]
    assert r["n_kept"] == 100
    assert r["p50"] == 50.0 and r["p95"] == 95.0 and r["p100"] == 100.0


def test_quantile_sketch_merge_equals_one_pass(spark):
    from intake_esm_spark.operators.sketch import (
        quantile_sketch,
        quantile_sketch_merge,
    )

    rows = [(i, float(i % 17)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v double")
    half_a = df.filter("k % 2 = 0")
    half_b = df.filter("k % 2 = 1")
    k = 32
    whole = quantile_sketch(df, "v", "k", [], k=k).collect()[0]
    merged = quantile_sketch_merge(
        quantile_sketch(half_a, "v", "k", [], k=k),
        quantile_sketch(half_b, "v", "k", [], k=k),
        [],
        k,
    ).collect()[0]
    assert merged["qs_hashes"] == whole["qs_hashes"]
    assert merged["qs_values"] == whole["qs_values"]
    assert merged["n_kept"] == whole["n_kept"] == k


def test_quantile_sketch_estimates_within_sampling_noise(spark):
    """Uniform 0..999 values, k=256: the p50 estimate must land within
    ~3/sqrt(k) of the truth (deterministic — fixed hashes, no flake)."""
    from intake_esm_spark.operators.sketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    rows = [(i, float(i % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, v double")
    sk = quantile_sketch(df, "v", "k", [], k=256)
    r = sketch_quantiles(sk, [0.5], [], ["p50"]).collect()[0]
    assert abs(r["p50"] - 500.0) < 1000 * 3 / (256 ** 0.5)


def test_quantile_sketch_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.sketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with _pt.raises(ValueError):
        quantile_sketch(df, "v", "k", [], k=1)
    sk = quantile_sketch(df, "v", "k", [], k=4)
    with _pt.raises(ValueError):
        sketch_quantiles(sk, [], [])


def test_stream_quantile_sketch_matches_batch(spark, tmp_path):
    """Two micro-batches: the final update per group equals the batch
    sketch bit-for-bit (hashes, values, n_kept)."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.sketch import quantile_sketch
    from intake_esm_spark.streaming.stateful import stream_quantile_sketch

    rows = [("g1", f"k{i}", float(i % 50)) for i in range(300)] + [
        ("g2", f"s{i}", float(i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, key string, v double")
    batch = {
        r["g"]: (tuple(r["qs_hashes"]), tuple(r["qs_values"]), r["n_kept"])
        for r in stream_quantile_sketch(df, "v", "key", "g", k=32).collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32("key") % 2 == 0).repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.filter(F.crc32("key") % 2 == 1).repartition(1).write.parquet(
        str(tmp_path / "b")
    )
    import glob
    import shutil

    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_quantile_sketch(stream, "v", "key", "g", k=32)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("qs_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM qs_stream").collect()
    finally:
        q.stop()
    assert len(emitted) > len(batch)
    final = {}
    for r in emitted:
        cur = final.get(r["g"])
        # later updates dominate: more kept pairs, then smaller hashes
        cand = (r["n_kept"], [-h for h in r["qs_hashes"]])
        if cur is None or cand > cur[0]:
            final[r["g"]] = (cand, r)
    streamed = {
        g: (tuple(r["qs_hashes"]), tuple(r["qs_values"]), r["n_kept"])
        for g, (_, r) in final.items()
    }
    assert streamed == batch
