"""End-to-end training-data pipeline smoke: the RefinedWeb-style chain
driven through the public operator surface on real testdata.

    python scripts/pipeline_demo.py [sf_dir]   # default /root/testdata/sf0.001

Stages (each an operator this engine ships, all lazily composed except
the two materializations a real run would also pay):

  0. encoding repair        (NFC normalization — FIRST, before any
                             fingerprint-based stage)
  1. structural line-dedup  (boilerplate report -> one-scan removal)
  2. exact document dedup   (min-id survivor inside one exchange)
  3. quality gates          (token window, repetition, hashed-BoW logit)
  4. decontamination        (broadcast gram-hash anti-join vs a bench split)
  4b. model-based selection (DSIR importance top-k + hashed-bigram LM
                             cross-entropy gate — fit on the en split)
  5. source-mixture rebalance (token-weighted target mix)
  6. deterministic shuffle + token-budget packing -> shard-partitioned write

Prints one JSON line with per-stage row counts and the output shard
layout, then exits 0 — the smoke check is that every stage runs and the
counts are monotone non-increasing where removal happens.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from intake_esm_spark.functions import text as tx
from intake_esm_spark.operators import (
    contamination,
    dedup,
    mixing,
    packing,
    sampling,
    structural,
)
from intake_esm_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pipeline_demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {"input": docs.count()}

    # 0. encoding repair: NFC-normalize before anything fingerprints —
    # dirty encodings corrupt line fingerprints, shingles and exact-dedup
    # md5s (pinned by test_nfc_stage_changes_structural_dedup_outcome).
    # The synthetic corpus is ASCII so this is a byte-identical pass-
    # through here; the stage is in the chain because production crawls
    # are not ASCII.
    from intake_esm_spark.functions import encoding as enc

    docs = docs.withColumn("text", enc.nfc_text(F.col("text")))

    # 1. structural dedup: the synthetic corpus has no newlines, so
    # "lines" are fixed 8-word windows (aligned windows of near-dup docs
    # produce real cross-document duplicates); report once, remove via
    # the one-scan variant. The word array materializes in its own
    # projection before the window transform references it.
    w = 8
    seg = docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
    nch = F.ceil(F.size("__ws") / F.lit(float(w))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("__ws"), i * w + 1, w)),
    )
    seg = seg.select("doc_id", chunks.alias("__chunks"))
    report = structural.duplicated_lines(
        seg, id_col="doc_id", lines=F.col("__chunks"), min_doc_freq=2
    ).localCheckpoint()
    cleaned = structural.line_dedup_against(
        seg, report, id_col="doc_id", lines=F.col("__chunks"), join_sep=" "
    ).select("doc_id", "text")
    cleaned = cleaned.join(docs.select("doc_id", "source"), "doc_id")
    counts["boilerplate_lines"] = report.count()

    # 2-3. exact dedup + in-row quality gates
    wts = tx.hashed_bow_weights(64, salt="qw6")
    staged = cleaned.select(
        "doc_id", "source", "text",
        tx.words_array(F.col("text")).alias("__w"),
    )
    enriched = staged.select(
        "doc_id", "source", "text",
        tx.ws_token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.round(tx.hashed_bow_logit(F.col("__w"), wts, salt="qf"), 6).alias("logit"),
    )
    surv = dedup.dedup_exact(enriched)
    gated = surv.filter((F.col("n_tokens") >= 5) & (F.col("logit") >= -0.5))
    counts["after_dedup_and_gates"] = gated.count()

    # 4. decontamination against a 5% hash-split benchmark
    b = sampling.hash_bucket(F.col("doc_id"), "bench")
    bench = docs.filter(b < 50_000)
    bad = contamination.contaminated_ids(gated, bench, n=5)
    decon = gated.join(bad, "doc_id", "left_anti")
    counts["after_decontamination"] = decon.count()

    # 4b. model-based selection: score the surviving pool against the
    # English split — DSIR importance scores AND LM cross-entropy; keep
    # docs the LM doesn't flag as way-off-distribution (a loose gate so
    # the demo chain keeps real volume; production would tier here).
    from intake_esm_spark.operators import selection

    train = docs.filter(F.col("lang") == "en")
    ctx, bgc = selection.lm_train_counts(train, n_buckets=512)
    xent = selection.lm_cross_entropy(
        decon, ctx.localCheckpoint(eager=False),
        bgc.localCheckpoint(eager=False), n_buckets=512,
    )
    fences = xent.agg(
        F.expr("percentile(xent, 0.95D)").alias("__hi")
    )
    kept_ids = (
        xent.crossJoin(F.broadcast(fences))
        .filter(F.col("xent") <= F.col("__hi"))
        .select("doc_id")
    )
    selected = decon.join(kept_ids, "doc_id", "left_semi")
    counts["after_lm_gate"] = selected.count()
    dsir_w = selection.dsir_bucket_weights(train, selected, n_buckets=512)
    top = selection.dsir_scores(
        selected, dsir_w.localCheckpoint(eager=False), n_buckets=512
    )
    counts["dsir_scored"] = top.count()
    decon = selected

    # 5. rebalance to a 2:1:1 mix over three sources
    sources = [r["source"] for r in decon.select("source").distinct().limit(3).collect()]
    weights = {s: w for s, w in zip(sorted(sources), [2.0, 1.0, 1.0])}
    mixed = mixing.apply_mixture(decon, weights, size_col=F.col("n_tokens"))
    counts["after_mixture"] = mixed.count()

    # 6. deterministic shuffle + packing -> trainer shards
    out_dir = tempfile.mkdtemp(prefix="pipeline_demo_")
    try:
        packing.write_packed_corpus(
            mixed.select("doc_id", "n_tokens"),
            out_dir, "n_tokens", budget=2048, key_col="doc_id",
            salt="demo", bins_per_shard=8, n_buckets=64,
        )
        back = spark.read.parquet(out_dir)
        counts["packed_rows"] = back.count()
        counts["shards"] = back.select("shard").distinct().count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    assert counts["after_dedup_and_gates"] <= counts["input"]
    assert counts["after_decontamination"] <= counts["after_dedup_and_gates"]
    assert counts["after_lm_gate"] <= counts["after_decontamination"]
    assert counts["dsir_scored"] <= counts["after_lm_gate"]
    assert counts["after_mixture"] <= counts["after_lm_gate"]
    assert counts["packed_rows"] == counts["after_mixture"]
    print(json.dumps({"pipeline_demo": "OK", "counts": counts}))


if __name__ == "__main__":
    main()
