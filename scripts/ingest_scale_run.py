"""Ingest pipeline at 10x bench scale (VERDICT r8 #7): the full
RefinedWeb-style composition — encoding -> structural line-dedup ->
span-dedup -> exact dedup -> MinHash-LSH near-dup -> quality gates ->
mixture -> deterministic shuffle + token packing -> shard write — run
end-to-end on an sf1.0-EQUIVALENT documents corpus (sf0.1 amplified
x10: 5k -> 50k docs, the documents-table row count a TPC-H sf1.0
generator would emit), with per-stage wall-clock and the Spark UI's
per-stage shuffle totals recorded.

    python scripts/ingest_scale_run.py [multiplier] [sf_dir]

Amplification is a deterministic union of K perturbed copies: copy 0 is
the original; for copy i > 0 a doc keeps its EXACT text when
(doc_id + i) % 3 == 0 (~1/3 cross-copy exact duplicates — exercising
exact dedup) and otherwise gets a per-copy marker token appended
(near-identical text — exercising the LSH near-dup and span stages).
Ids are offset per copy so every row is a distinct document.

Prints one JSON line: per-stage rows + seconds, total wall, and
shuffle-write totals/max from the UI REST API.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from intake_esm_spark.functions import encoding as enc
from intake_esm_spark.functions import text as tx
from intake_esm_spark.operators import (
    dedup,
    mixing,
    packing,
    spans,
    structural,
)
from intake_esm_spark.session import get_spark


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ingest_scale_run",
        extra_conf={"spark.ui.enabled": "true"},  # shuffle metrics source
    )
    t_all = time.perf_counter()
    stages: dict[str, dict] = {}

    def timed(name: str, df, materialize=True):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True) if materialize else df
        n = out.count()
        stages[name] = {"rows": n, "sec": round(time.perf_counter() - t0, 2)}
        return out

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. amplify to sf1.0-equivalent volume
    copies = []
    for i in range(mult):
        c = base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.when(
                (F.lit(i) == 0)
                | (F.pmod(F.col("doc_id") + F.lit(i), F.lit(3)) == 0),
                F.col("text"),
            )
            .otherwise(F.concat(F.col("text"), F.lit(f" copymark{i}")))
            .alias("text"),
            "lang",
            "source",
        )
        copies.append(c)
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionAll(c)
    docs = timed("amplified_input", docs)

    # 1. encoding repair FIRST (fingerprint hygiene)
    docs = timed("nfc", docs.withColumn("text", enc.nfc_text(F.col("text"))))

    # 2. structural line-dedup (8-word windows as lines)
    w = 8
    seg = docs.select("doc_id", F.split(F.col("text"), " ").alias("__ws"))
    nch = F.ceil(F.size("__ws") / F.lit(float(w))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("__ws"), i * w + 1, w)),
    )
    seg = seg.select("doc_id", chunks.alias("__chunks"))
    # line threshold scales with the amplifier for the same reason as the
    # span stage below: at freq >= 2 every window of a x10-amplified dup
    # FAMILY counts as "boilerplate" and the line stage silently does the
    # document-dedup stages' whole job (discovered in the first measured
    # run — all exact/near removals showed up as emptied-line docs);
    # production line-dedup aims at nav-bar/footer text shared across
    # UNRELATED pages, which here means frequencies above the copy count
    report = structural.duplicated_lines(
        seg,
        id_col="doc_id",
        lines=F.col("__chunks"),
        min_doc_freq=max(2, 2 * mult),
    ).localCheckpoint()
    stages["line_report"] = {"rows": report.count(), "sec": None}
    cleaned = structural.line_dedup_against(
        seg, report, id_col="doc_id", lines=F.col("__chunks"), join_sep=" "
    ).select("doc_id", "text")
    cleaned = cleaned.join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    cleaned = timed("line_dedup", cleaned)

    # 3. span-dedup (substring-run grain, both copies cut)
    # min_doc_freq scales with the amplification factor: a span shared by
    # every perturbed copy of one base doc is the amplifier's artifact,
    # not corpus boilerplate — requiring > mult holders keeps the span
    # stage aimed at CROSS-document duplication
    sp = spans.span_dedup(
        cleaned, n=5, min_doc_freq=max(4, mult + 2), min_run=3
    )
    sp = sp.join(cleaned.select("doc_id", "lang", "source"), "doc_id")
    sp = timed("span_dedup", sp.filter(F.col("text") != ""))

    # 4. exact dedup (min-id survivor)
    exact = timed("exact_dedup", dedup.dedup_exact(sp))

    # 5. MinHash-LSH near-dup: drop the lexicographically-later member
    # of every confirmed pair (one keyed anti-join)
    pairs = dedup.near_duplicates(
        exact, num_hashes=32, bands=8, shingle_n=5, threshold=0.8
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    near = timed("near_dedup", exact.join(losers, "doc_id", "left_anti"))

    # 6. quality gates (token window + hashed-BoW logit)
    wts = tx.hashed_bow_weights(64, salt="qw6")
    staged = near.select(
        "doc_id", "lang", "source", "text",
        tx.words_array(F.col("text")).alias("__w"),
    )
    enriched = staged.select(
        "doc_id", "lang", "source", "text",
        tx.ws_token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.round(
            tx.hashed_bow_logit(F.col("__w"), wts, salt="qf"), 6
        ).alias("logit"),
    )
    gated = timed(
        "quality_gates",
        enriched.filter((F.col("n_tokens") >= 5) & (F.col("logit") >= -0.5)),
    )

    # 7. source-mixture rebalance (2:1:1 over the three heaviest
    # sources — ordered by size so the pick is run-to-run deterministic,
    # unlike a bare distinct().limit(3))
    sources = sorted(
        r["source"]
        for r in gated.groupBy("source")
        .count()
        .orderBy(F.desc("count"), F.asc("source"))
        .limit(3)
        .collect()
    )
    weights = {s: w for s, w in zip(sources, [2.0, 1.0, 1.0])}
    mixed = timed(
        "mixture",
        mixing.apply_mixture(gated, weights, size_col=F.col("n_tokens")),
    )

    # 8. deterministic shuffle + packing -> trainer shards
    out_dir = tempfile.mkdtemp(prefix="ingest_scale_")
    try:
        t0 = time.perf_counter()
        packing.write_packed_corpus(
            mixed.select("doc_id", "n_tokens"),
            out_dir, "n_tokens", budget=2048, key_col="doc_id",
            salt="scale", bins_per_shard=8, n_buckets=64,
        )
        back = spark.read.parquet(out_dir)
        stages["pack_write"] = {
            "rows": back.count(),
            "sec": round(time.perf_counter() - t0, 2),
            "shards": back.select("shard").distinct().count(),
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    total = round(time.perf_counter() - t_all, 2)

    # shuffle totals from the UI REST API (best-effort)
    shuffle = {}
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            st = json.load(r)
        sw = [s.get("shuffleWriteBytes", 0) for s in st]
        shuffle = {
            "n_stages": len(st),
            "shuffle_write_total_mb": round(sum(sw) / 1e6, 1),
            "shuffle_write_max_stage_mb": round(max(sw) / 1e6, 1) if sw else 0,
        }
    except Exception as e:  # UI disabled or API shape drift
        shuffle = {"error": str(e)[:120]}

    print(
        json.dumps(
            {
                "ingest_scale_run": "OK",
                "multiplier": mult,
                "sf_dir": sf_dir,
                "stages": stages,
                "total_sec": total,
                "shuffle": shuffle,
            }
        )
    )


if __name__ == "__main__":
    main()
