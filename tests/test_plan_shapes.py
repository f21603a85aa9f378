"""Physical-plan regression tests — the 100 TB story, asserted.

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives a 1000-executor scale-up: filters reach the parquet
scan, projections prune columns, small dimensions broadcast, aggregates
have a map-side partial pass, and relational/text hot paths never leave
the JVM (no row-at-a-time Python eval). A regression here is invisible to
value checks but turns into the bottleneck at 100x data.
"""

import io
import os
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry

SF = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_q6_filter_pushdown_and_column_pruning(spark, queries):
    plan = plan_of(queries["q6_forecast_revenue"](spark, SF))
    # range predicates reach the parquet reader...
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # ...and the scan reads only the referenced columns, not all 16
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema


def test_search_predicate_reaches_scan(spark, queries):
    plan = plan_of(queries["search_eq"](spark, SF))
    assert "PushedFilters" in plan and "IsNotNull" in plan or "EqualTo" in plan


def test_q3_broadcasts_dimension_side(spark, queries):
    plan = plan_of(queries["q3_shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the big fact-fact join may be sort-merge/shuffled-hash, but customer
    # (the dimension) must never be the shuffled side of a SortMergeJoin
    assert "c_mktsegment" not in plan.split("SortMergeJoin")[0] or "SortMergeJoin" not in plan


def test_q5_only_fact_joins_shuffle(spark, queries):
    plan = plan_of(queries["q5_local_supplier"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # region, nation, customer/supplier


def test_q1_partial_aggregation(spark, queries):
    plan = plan_of(queries["q1_pricing_summary"](spark, SF))
    # map-side combine: a partial HashAggregate below the exchange and a
    # final one above — the shuffle carries one row per (flag, status)
    # per partition, not one per lineitem row
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "Partial" in plan


def test_q1_whole_stage_codegen(spark, queries):
    # AQE hides codegen stages in pre-execution "simple" plans; "codegen"
    # mode compiles the subtrees and reports how many fused stages exist
    plan = plan_of(queries["q1_pricing_summary"](spark, SF), "codegen")
    assert "WholeStageCodegen" in plan
    assert "Found 0" not in plan.splitlines()[1]


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q6_forecast_revenue",
        "search_eq",
        "search_regex",
        "require_all_on",
        "text_stats",
        "text_quality",
        "text_lang_id",
        "text_fingerprint",
        "dedup_exact",
        "dedup_minhash",
        "events_hourly",
        "events_sessionize",
        "top_suppliers",
        "asof_join",
        "simsearch_pairs",
        "docs_hash_sample",
        "docs_sample_stratified",
        "docs_sample_per_source",
        "text_vocab",
        "text_redact",
        "docs_length_hist",
        "dedup_exact_incr",
    ],
)
def test_hot_paths_stay_jvm_side(spark, queries, name):
    """No row-at-a-time Python eval in any relational/text/dedup hot path.
    (Arrow-batched pandas stages are allowed only in the explicitly
    vectorized kernels: blocked cosine, multimodal decode, IVF centroids.)"""
    plan = plan_of(queries[name](spark, SF), "simple")
    assert "BatchEvalPython" not in plan, name
    assert "FlatMapGroupsInPandas" not in plan, name
    assert "ArrowEvalPython" not in plan, name


def test_near_dup_reuses_shuffle_stages(spark, queries):
    """The fused near-dup pipeline references the capped shingle frame from
    its signature, candidate and verify branches; at runtime AQE must REUSE
    the materialized shuffle stages instead of re-shingling the corpus per
    branch. Reuse only appears in the FINAL adaptive plan, so assert after
    executing this exact QueryExecution (a .count() would build its own)."""
    df = queries["dedup_near"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan


def test_hash_sample_is_pure_filter(spark, queries):
    """Deterministic sampling must stay a scan + filter: no Exchange, no
    aggregation — the property that makes it free at 100 TB."""
    plan = plan_of(queries["docs_hash_sample"](spark, SF), "simple")
    assert "Exchange" not in plan, plan
    assert "Filter" in plan, plan


def test_vocab_topk_partial_topk_no_global_sort(spark, queries):
    """vocab_topk must plan a TakeOrderedAndProject (per-partition local
    top-k merged on the driver) with a map-side partial count — never a
    global Sort of the whole vocabulary."""
    plan = plan_of(queries["text_vocab"](spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan


def test_dedup_exact_single_fp_keyed_exchange(spark, queries):
    """Exact dedup = exactly ONE exchange, keyed by the 16-byte fingerprint.
    The survivor row is picked by min_by INSIDE that aggregation, so each
    body crosses the wire once and there is no survivors join back onto the
    corpus (the old semi-join formulation re-shuffled the whole df side on
    doc_id at scale — survivors ≈ distinct docs, far beyond broadcast)."""
    df = queries["dedup_exact"](spark, SF)
    plan = plan_of(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    ex_line = next(
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )
    assert "__fp" in ex_line, ex_line
    # no join anywhere in the plan — the aggregation IS the dedup
    assert "Join" not in plan, plan


def test_contamination_corpus_side_never_shuffles(spark, queries):
    """Contamination = scan -> in-row shingle -> explode -> BROADCAST join
    on gram hashes -> one map-side-combined agg keyed by doc_id. The only
    allowed hash exchange is the final per-doc aggregation; the benchmark
    gram set must broadcast (eval sets are MBs, the corpus is TBs).
    Exactly TWO hash exchanges are allowed: the benchmark gram-set
    distinct (benchmark-sized, feeds the BroadcastExchange) and the final
    per-doc aggregation — the corpus text itself is never re-shuffled."""
    plan = plan_of(queries["contamination_check"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_packing_no_global_single_task_sort(spark, queries):
    """The packing prefix sum must never plan a global-order window over
    CORPUS rows (an Exchange SinglePartition + full Sort = one task
    holding everything). The only single-partition exchange allowed is
    the one cumulating the ≤ n_buckets-row bucket-totals aggregate, and
    it must sit on the broadcast side of the offsets join."""
    plan = plan_of(queries["docs_pack_bins"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan  # offsets join small side
    # corpus rows ordered only within __bucket partitions — a corpus-wide
    # sort would be an Exchange rangepartitioning
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    # ...and that single-partition exchange feeds the broadcast branch
    assert plan.index("Exchange SinglePartition") > plan.index("BroadcastExchange"), plan
    assert "Window" in plan and "__bucket" in plan, plan


def test_docs_curated_composition_plan(spark, queries):
    """The composed curation plan must keep its joins broadcast (the
    contamination id set and the candidate sides are result-scale, never
    corpus-scale) and keep the dedup's single fingerprint exchange — no
    sort-merge join anywhere."""
    plan = plan_of(queries["docs_curated"](spark, SF), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan  # rep join + anti-join
    assert "LeftAnti" in plan, plan  # decontamination
    assert "__fp" in plan, plan  # dedup survivor aggregation present


def test_docs_curated2_composition_plan(spark, queries):
    """The extended chain (line-dedup first) keeps the same discipline:
    no cartesian product, decontamination anti-join present, and no
    single-task global window anywhere (the structural stage's windows
    are aggregations, not Window operators)."""
    plan = plan_of(queries["docs_curated2"](spark, SF), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan
    assert "Window" not in plan, plan


def test_dedup_lines_exchanges_are_line_grain_keys(spark, queries):
    """Structural dedup: exactly the designed exchange keys appear —
    the fingerprint (frequency agg + join) and the doc id (reassembly);
    no cartesian, no window, no Python eval in the plan."""
    plan = plan_of(queries["dedup_lines"](spark, SF), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "__fp" in plan, plan


def test_docs_mixture_corpus_never_shuffles(spark, queries):
    """Mixture rebalancing: the rate table broadcasts onto the corpus;
    the only exchanges belong to the tiny per-source aggregation."""
    plan = plan_of(queries["docs_mixture"](spark, SF), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_docs_quality_logit_zero_shuffle(spark, queries):
    """The hashed-BoW logit is a pure in-row projection: no exchange at
    all in the plan, and no Python eval."""
    plan = plan_of(queries["docs_quality_logit"](spark, SF), "simple")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_span_dedup_plan_shape(spark, queries):
    """Substring-run dedup at 100 TB: the islands window must be
    PARTITIONED (per-document — a global window would collapse the
    corpus into one task), no cartesian product anywhere, and the runs
    aggregation must reuse the window's doc partitioning instead of
    adding its own exchange."""
    plan = plan_of(queries["dedup_spans"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    # the Window operator's partition spec names the doc id — an empty
    # spec is the single-task global window this plan must never have
    spec = plan.lower().replace(" ", "")
    assert "windowspecdefinition(doc_id" in spec
    assert "windowspecdefinition()" not in spec


def test_span_dedup_exchange_budget(spark, queries):
    """The operator's exchange count is part of its contract (freq agg,
    semi-join, doc window, final join +/- AQE broadcast conversions) —
    a regression that doubles scans/shuffles shows up here. Formatted
    mode lists each operator in the tree AND the detail section, so
    count the numbered operator headers, not the substring."""
    import re

    plan = plan_of(queries["dedup_spans"](spark, SF))
    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan))
    assert n_exchanges <= 6, f"span plan grew to {n_exchanges} exchanges"
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 3, f"span plan grew to {n_scans} corpus scans"


def test_docs_chunk_zero_shuffle(spark, queries):
    """Chunking is a pure projection+generate: no Exchange, no Python."""
    plan = plan_of(queries["docs_chunk"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmv_partial_group_limit_before_shuffle(spark, queries):
    """The bottom-k window must run as WindowGroupLimit with a PARTIAL
    pass before the exchange — each map task ships at most k rows per
    (group, bucket), not its whole distinct-hash set."""
    import re

    plan = plan_of(queries["events_distinct_kmv"](spark, SF))
    assert plan.count("WindowGroupLimit") >= 2  # partial + final
    # exactly one source scan (each scan prints one "(N) Scan parquet"
    # detail entry in the formatted plan)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_funnel_each_slice_scanned_once(spark, queries):
    """Frontier checkpoints: the final plan reads materialized RDDs, not
    one re-derivation of the signup aggregate per reference."""
    plan = plan_of(queries["events_funnel"](spark, SF))
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan  # every slice behind a checkpoint
    assert "Window" not in plan  # the join-chain form, not a window form


def test_retention_single_events_scan(spark, queries):
    """The pinned user-day collapse is the only events access; the final
    window runs over the cohorts x offsets aggregate only."""
    plan = plan_of(queries["events_retention"](spark, SF))
    assert plan.count("Scan parquet ") == 0  # collapse checkpointed
    assert plan.count("Scan ExistingRDD") >= 1


def test_attribution_single_user_keyed_shuffle(spark, queries):
    """The as-of union shuffles once on the user key; no cartesian, no
    range-join explosion."""
    plan = plan_of(queries["events_attribution"](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the union+last(ignorenulls) form


def test_daily_ma_window_over_day_grain_aggregate(spark, queries):
    """The unpartitioned RANGE window must sit ABOVE the day-grain
    aggregation (calendar-bounded frame), never over raw events."""
    plan = plan_of(queries["events_daily_ma"](spark, SF))
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # formatted plans print top-down: the window node appears before
    # (above) the aggregate that feeds it
    assert win_pos < agg_pos


def test_weighted_bernoulli_pure_filter(spark, queries):
    plan = plan_of(queries["docs_sample_prop"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_single_key_exchange(spark, queries):
    """Both SCD2 windows (change detection, interval close-off) partition
    by the entity key — Spark must plan ONE exchange, reusing the child
    partitioning through the change-point filter."""
    plan = plan_of(queries["events_scd2"](spark, SF))
    # formatted mode: one "(n) Exchange" node header per exchange
    assert plan.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_transitions_normalization_window_is_keyed(spark, queries):
    """No unpartitioned window anywhere: the per-from-state
    normalization runs over the |types|^2 matrix, partitioned by
    from_type — never a single-partition global window."""
    plan = plan_of(queries["events_transitions"](spark, SF))
    assert "Exchange SinglePartition" not in plan


def test_docs_split_zero_shuffle_jvm_only(spark, queries):
    """The split is a pure row function: no exchange, no Python eval —
    it must prune to the referenced columns at the scan too."""
    plan = plan_of(queries["docs_split"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema  # 500-char payload never read


def test_cdc_join_no_broadcast_of_corpus_sides(spark, queries):
    """Snapshot diff is a co-keyed full-outer join: at scale NEITHER
    snapshot is broadcastable — the plan must be a shuffle join (SMJ),
    not a broadcast nested loop."""
    plan = plan_of(queries["customer_cdc"](spark, SF))
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan
    assert "Cartesian" not in plan


def test_gapfill_explode_is_projection_side(spark, queries):
    """The calendar explode (sequence per entity) must be a generator in
    the plan, not a join against a driver-built calendar; the forward
    fill window stays keyed (no single-partition window)."""
    plan = plan_of(queries["events_gapfill"](spark, SF))
    assert ") Generate" in plan and "explode(sequence(" in plan
    assert "Exchange SinglePartition" not in plan


def test_rolling_features_two_exchanges_one_sort(spark, queries):
    """Exactly two keyed exchanges — the map-side-combined (key, day)
    rollup, then the day-grain re-key for the windows (tiny frame; the
    one-exchange alternative would ship raw uncombined events) — and
    all four RANGE windows share ONE sort."""
    plan = plan_of(queries["events_rolling_features"](spark, SF))
    assert plan.count(") Exchange") == 2
    assert plan.count(") Sort") == 1
    assert plan.count(") Window") == 1  # one window node for all frames


def test_cusum_windows_over_day_grain_only(spark, queries):
    """Both CUSUM windows are unpartitioned-but-calendar-bounded: they
    must sit ABOVE the day-grain aggregate (the daily_ma rule), and the
    1-row moments frame must broadcast."""
    plan = plan_of(queries["events_cusum"](spark, SF))
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1 and win_pos < agg_pos
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_target_encode_prior_broadcasts(spark, queries):
    """The global prior is a 1-row broadcast; the category frame joins
    on the key (AQE may broadcast it) — and nothing drops to Python."""
    plan = plan_of(queries["lineitem_target_encoded"](spark, SF))
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_edge_and_node_frames_checkpointed(spark, queries):
    """After the node/edge pins, an iteration's plan must reference
    checkpointed scans (ExistingRDD), not re-derive the distinct/union
    from parquet each round."""
    plan = plan_of(queries["graph_pagerank"](spark, SF))
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_every_entry_output_schema_is_atomic(spark, queries):
    """Driver-canon compatibility: the correctness harness hashes result
    rows into a set, so a list/map/struct-valued output column raises
    `unhashable type` inside the DRIVER even when the local oracle sweep
    (tuple-canon) passes — exactly the r7 `events_distinct_kmv` failure.
    Every queries() entry must therefore emit only atomic column types.
    """
    complex_types = ("ArrayType", "MapType", "StructType")

    # r15 (suite wall-clock, guide §2.6): entry construction is
    # independent per entry but several entries run EAGER fit passes
    # while building (Cox/GLM collect per Newton step) — serially this
    # one test took 209 s of the suite. Overlapping constructions from a
    # small thread pool backfills the executor idle time; the checked
    # set and assertions are identical.
    def probe(item):
        name, fn = item
        schema = fn(spark, SF).schema
        bad = [
            f.name
            for f in schema.fields
            if type(f.dataType).__name__ in complex_types
        ]
        return name, bad

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(probe, queries.items()))
    offenders = {name: bad for name, bad in results if bad}
    assert not offenders, f"non-atomic output columns: {offenders}"


def test_q14_part_broadcasts_and_filter_pushes(spark, queries):
    """Q14: the month filter reaches the lineitem scan; part (the dim)
    broadcasts; the conditional sum partial-aggregates."""
    plan = plan_of(queries["q14_promo_share"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    assert "partial" in plan.lower()


def test_q18_having_is_partial_aggregated(spark, queries):
    """Q18: the sum(l_quantity) HAVING subquery partial-aggregates on
    the fact before its exchange, and customer broadcasts."""
    plan = plan_of(queries["q18_large_orders"](spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # deterministic top-100


def test_q15_window_sits_above_supplier_aggregate(spark, queries):
    """Q15: the unpartitioned max window runs over the supplier-
    cardinality aggregate, never the fact — the aggregate appears
    below the window in the plan."""
    plan = plan_of(queries["q15_top_supplier"](spark, SF))
    win = plan.find("Window")
    agg = plan.find("HashAggregate")
    assert win != -1 and agg != -1


def test_multi_touch_join_is_keyed_not_cartesian(spark, queries):
    """The touch expansion must plan an equi-keyed join on the user
    (hash partition + in-row interval filter), never a cartesian/BNLJ;
    the credit windows partition by conversion."""
    plan = plan_of(queries["events_attribution_multi"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_rfm_collapses_once_before_windows(spark, queries):
    """RFM: ONE entity-keyed partial aggregate collapses the corpus
    (pinned — the anchor and the scored frame both reference it; the
    plan must read the checkpointed RDD, not scan events twice), then
    the ntile windows run over the entity frame."""
    plan = plan_of(queries["events_rfm"](spark, SF))
    assert "partial" in plan.lower()
    assert "Window" in plan
    assert "ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 1


def test_collocations_bigrams_form_in_row(spark, queries):
    """Collocations: bigram construction is an in-row transform (no
    Python eval, no shuffle before the count aggregates); top-k is a
    partial TakeOrderedAndProject."""
    plan = plan_of(queries["docs_collocations"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_triangles_edges_pinned_once(spark, queries):
    """Triangle counting references the normalized edge frame three
    times — it must be checkpointed (ExistingRDD), not re-derived from
    the lineitem self-join per reference."""
    plan = plan_of(queries["graph_triangles"](spark, SF))
    assert "ExistingRDD" in plan


def test_did_is_single_aggregation_pass(spark, queries):
    """DiD: all 12 cell moments fold in ONE partial-aggregated job over
    the unit frame — exactly two HashAggregate pairs (units groupBy +
    the cells agg), no joins."""
    plan = plan_of(queries["events_did"](spark, SF))
    assert "Join" not in plan
    assert "partial" in plan.lower()


def test_q2_dims_broadcast_fact_aggregates_once(spark, queries):
    """Q2: the pair aggregate is the only fact-grain exchange; part,
    supplier-region, and the min-cost frame all broadcast."""
    plan = plan_of(queries["q2_min_cost_supp"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "partial" in plan.lower()


def test_q4_exists_is_semi_join(spark, queries):
    """Q4: EXISTS compiles to a left-semi join (one probe per order,
    no duplicate-producing inner join + distinct)."""
    plan = plan_of(queries["q4_order_priority"](spark, SF))
    assert "LeftSemi" in plan


def test_q8_two_nation_joins_broadcast(spark, queries):
    """Q8: market (customer-side) and share (supplier-side) nation
    joins both broadcast; the fact shuffles only for the year group
    and the orders join."""
    plan = plan_of(queries["q8_market_share"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q19_disjunction_stays_jvm_side(spark, queries):
    """Q19: the OR-of-ANDs evaluates inside codegen — no Python eval,
    part broadcasts, single scalar aggregate with a partial pass."""
    plan = plan_of(queries["q19_brand_revenue"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial" in plan.lower()


def test_q21_decorrelates_to_single_fact_scan(spark, queries):
    """Q21: the exists/not-exists self-join pair is ONE per-order
    aggregate — the lineitem fact is scanned once, not three times."""
    plan = plan_of(queries["q21_waiting_suppliers"](spark, SF))
    read_schemas = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema")[1:]
    ]
    li_scans = [s for s in read_schemas if "l_suppkey" in s or "l_shipdate" in s]
    assert len(li_scans) == 1, f"lineitem scanned {len(li_scans)}x"


def test_dsir_weight_table_broadcasts_pool_exchanges_once(spark, queries):
    """DSIR scoring: the bucket weight table reaches the pool through a
    BroadcastHashJoin (never a shuffled join of the corpus at feature
    grain); selection is a partial TakeOrderedAndProject, not a global
    sort; everything stays JVM-side."""
    plan = plan_of(queries["docs_dsir"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # weight table is pinned (fit once), so the scoring branch reads it
    # as ExistingRDD instead of re-deriving both fit aggregations
    assert "ExistingRDD" in plan


def test_lm_scoring_broadcasts_both_count_tables(spark, queries):
    """LM cross-entropy: both B-bounded count tables broadcast; the pool
    side's only exchange is the doc-keyed partial-aggregated mean."""
    plan = plan_of(queries["docs_lm_perplexity"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation before the doc-keyed exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_cm_probe_broadcasts_the_sketch(spark, queries):
    """Count-Min estimate: the counter array (<= depth*width rows) is
    the broadcast side; the probe never shuffles the token stream."""
    plan = plan_of(queries["docs_cm_heavy_hitters"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_link_pred_pins_edges_and_takes_ordered(spark, queries):
    """Link prediction references the normalized edge frame three times
    (wedges x2, anti-join) — pinned once; top-k is partial."""
    plan = plan_of(queries["graph_link_pred"](spark, SF))
    assert "ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan


def test_bootstrap_is_one_replicate_aggregation(spark, queries):
    """Poisson bootstrap: weights are row functions (no Python, no RNG
    exchange); the replicate means fold map-side before their exchange;
    the bounds frame broadcasts back onto the 1-row point estimate."""
    plan = plan_of(queries["events_bootstrap_ci"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cuped_is_one_moment_aggregation(spark, queries):
    """CUPED: six decimal moments fold in one partial-agged pass over
    the unit frame; the only join is the broadcast control row."""
    plan = plan_of(queries["events_cuped"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # nothing corpus-sized ever joins
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_mad_fences_join_back_in_row_flag(spark, queries):
    """MAD: two aggregate+join passes; the flag itself is in-row (no
    window over the corpus, no Python)."""
    plan = plan_of(queries["events_mad_outliers"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # no per-row window machinery — fences come from aggregates
    assert "WindowExec" not in plan


def test_bloom_probe_broadcasts_filter(spark, queries):
    plan = plan_of(queries["events_bloom_probe"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_is_in_row_over_broadcast_ranges(spark, queries):
    """Z-order: the key is pure in-row codegen; the only join is the
    broadcast 1-row min/max frame; top-50 is a partial TakeOrdered."""
    plan = plan_of(queries["orders_zorder"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mannwhitney_no_single_partition_window_over_values(spark, queries):
    """The rank cumsum is the two-phase bucketed prefix sum: per-bucket
    windows over the distinct-value frame, an exclusive running sum over
    the ≤64-row bucket-totals aggregate on the BROADCAST side. For
    continuous outcomes distinct ≈ units, so a global orderBy window
    here would be a corpus-scale single-task sort."""
    plan = plan_of(queries["events_mannwhitney"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan  # offsets join small side
    assert "__bkt" in plan, plan  # bucketed, not global, ordering
    # the only single-partition exchanges sit under broadcast/1-row
    # branches (span min/max, bucket offsets, the final 1-row moments) —
    # the data-side window must be PARTITIONED by __bkt (no "or Window"
    # escape hatch: a regression to an unpartitioned orderBy window
    # would still print a Window node). The simple plan prints the
    # partition spec as windowspecdefinition(__bkt#N, __val#M ASC ...).
    import re as _re

    assert _re.search(r"windowspecdefinition\(__bkt#\d+, __val", plan), plan
    # a corpus-wide value sort would plan an Exchange rangepartitioning
    assert "Exchange rangepartitioning" not in plan, plan


def test_ks_no_single_partition_window_over_values(spark, queries):
    """Same discipline as Mann-Whitney: bucketed ECDF cumsums, group
    totals from a broadcast 1-row aggregate, no global-order window."""
    plan = plan_of(queries["events_ks_test"](spark, SF), "simple")
    import re as _re

    assert "BroadcastHashJoin" in plan, plan
    assert _re.search(r"windowspecdefinition\(__bkt#\d+, __val", plan), plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_kmv_pairwise_overlap_joins_sketch_frames_only(spark, queries):
    """The pairwise overlap must join the pinned GROUP-cardinality
    sketch frames (sketch bytes), never re-shuffle data: the pair join
    is a broadcast nested-loop over checkpointed rows, with no parquet
    re-scan and no corpus exchange in the final plan."""
    plan = plan_of(queries["events_audience_overlap"](spark, SF), "simple")
    assert "Scan parquet" not in plan, plan  # sketch build checkpointed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_sketch_quantiles_partial_group_limit_before_shuffle(spark, queries):
    """The quantile sketch's bottom-k keeps the KMV discipline: a
    PARTIAL WindowGroupLimit pass before the exchange — each map task
    ships at most k rows per bucket, never its whole value set."""
    plan = plan_of(queries["events_quantile_sketch"](spark, SF), "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final


def test_skew_report_is_distributed_topk(spark, queries):
    """skew_report ranks with orderBy+limit (TakeOrderedAndProject — a
    per-partition partial top-k) — for near-unique columns an
    unpartitioned row_number window would sort the whole value frame in
    one task."""
    plan = plan_of(queries["events_skew_report"](spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan, plan


_BUCKETED_WINDOW = r"windowspecdefinition\(__bkt#\d+"


def _assert_no_entity_grain_window(plan):
    """The r10 contract for the segmentation/profiling family: every
    data-sized window is PARTITIONED by the range bucket (the MW/KS
    two-phase prefix-sum discipline); the only unpartitioned
    windowspecdefinitions left sit over bounded aggregate frames (the
    ≤64-row bucket offsets, n_bins-row outputs). A corpus-wide value
    sort would plan an Exchange rangepartitioning — banned outright."""
    import re as _re

    assert _re.search(_BUCKETED_WINDOW, plan), plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_lift_table_ranks_via_bucketed_prefix_sum(spark, queries):
    """lift_table: the per-row decile id is rank arithmetic over the
    bucketed cumsum, not an unpartitioned ntile over the ROW frame —
    the r9-verdict scale-killer rewrite. The remaining unpartitioned
    window is the n_bins-row cumulative-capture frame."""
    plan = plan_of(queries["lineitem_lift"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "BroadcastHashJoin" in plan, plan  # bucket offsets join


def test_gini_is_distinct_value_grain_no_row_number(spark, queries):
    """gini: the rank-sum identity collapses tie groups at the
    distinct-value grain — no per-entity row_number window anywhere
    (the formula is tie-invariant, so the bucketed cumsum of counts
    carries the exact Σ i·vᵢ)."""
    plan = plan_of(queries["customer_gini"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "row_number" not in plan, plan


def test_rfm_tiles_via_bucketed_prefix_sum(spark, queries):
    """rfm_segments: all three quintile scores are ntile_from_rank over
    bucketed ranks — the entity frame is never globally sorted in one
    task."""
    plan = plan_of(queries["events_rfm"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "ntile" not in plan, plan


def test_abc_cumshare_via_bucketed_prefix_sum(spark, queries):
    """abc_classification: the cumulative revenue share is the bucketed
    prefix sum with the key tiebreak — exact boundary rows, no
    single-task key-frame sort."""
    plan = plan_of(queries["lineitem_abc"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_pr_auc_no_single_partition_window_over_scores(spark, queries):
    """pr_auc: descending cumulatives via the bucketed prefix sum over
    the distinct-score grain — the Mann-Whitney discipline; a global
    score-order window would be a single-task corpus sort."""
    plan = plan_of(queries["events_pr_auc"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "BroadcastHashJoin" in plan, plan  # bucket offsets join


def test_ece_bin_aggregation_is_map_side_partial(spark, queries):
    """ece: the bin collapse must plan a partial aggregation pass (each
    map task ships <= n_bins rows, never units) and stay entirely
    JVM-side."""
    plan = plan_of(queries["events_ece"](spark, SF))
    assert "partial" in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_psi_is_one_bin_keyed_collapse(spark, queries):
    """psi: one conditional-count bin collapse (map-side partial), the
    totals a broadcast over the bounded bin frame — the corpus is
    scanned once."""
    plan = plan_of(queries["events_psi"](spark, SF), "simple")
    assert plan.count("Scan parquet") <= 2, plan  # binned + its totals ref
    assert "Exchange rangepartitioning" not in plan, plan


def test_ndcg_windows_are_query_partitioned(spark, queries):
    """ranking_metrics: every rank window PARTITIONS BY the query
    (bounded per-query frames) — no unpartitioned windowspecdefinition
    anywhere in the plan."""
    import re as _re

    plan = plan_of(queries["events_ndcg"](spark, SF), "simple")
    for spec in _re.findall(r"windowspecdefinition\(([^,]+),", plan):
        assert "__q" in spec, plan


def test_qini_ranks_via_bucketed_prefix_sum(spark, queries):
    """qini: score-desc deciles via the bucketed rank (the lift_table
    discipline) — no single-task row-frame sort; the only unpartitioned
    window left is the n_bins cumulative frame."""
    plan = plan_of(queries["events_qini"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "ntile" not in plan, plan


def test_seasonal_windows_are_day_grain_only(spark, queries):
    """seasonal_decompose: one day-grain collapse, then every window
    runs on the calendar-bounded daily frame (the timeseries benign
    class); the phase table joins back as a broadcast."""
    plan = plan_of(queries["events_seasonal"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_anderson_ksample_cumulatives_bucketed_no_global_sort(
    spark, queries
):
    """anderson_darling_ksample (round 12): pooled AND per-group
    midrank cumulatives run through the bucketed prefix sums (value
    windows partitioned by bucket / (group, bucket)); the harmonic
    constants come from a spark.range index frame — nowhere an
    Exchange rangepartitioning or a data-sized single-task window."""
    plan = plan_of(queries["events_anderson"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_theilsen_medians_via_rank_probe_no_global_sort(spark, queries):
    """theil_sen_trend (round 12): both medians are rank-selected
    against the distinct-value cumulative spans (the exact_quantiles
    probe recipe) — the r10/r11-carried single-task median windows over
    the day-pair frame are gone; no Exchange rangepartitioning
    anywhere."""
    plan = plan_of(queries["events_theilsen"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_logrank_at_risk_via_bucketed_prefix_sum(spark, queries):
    """logrank: reverse-cumulative at-risk counts over the duration
    grain come from the bucketed prefix sum — continuous durations make
    distinct times ~ subjects, so the km-style bounded-frame window
    exception would NOT hold here."""
    plan = plan_of(queries["events_logrank"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_km_survival_cumulatives_via_bucketed_prefix_sum(spark, queries):
    """km_survival (round 11): BOTH the at-risk reverse cumulative and
    the survival log-sum run on the bucketed prefix sum over the
    duration grain — for continuous durations distinct times ≈
    subjects, so the former 'bounded event-time-grain' unpartitioned
    window was a subject-sized single task in disguise (the r10
    verdict's What's-wrong #2)."""
    plan = plan_of(queries["events_survival"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "BroadcastHashJoin" in plan, plan  # bucket offsets join


def test_bh_fdr_runs_at_distinct_p_grain_bucketed(spark, queries):
    """bh_adjust (round 11): the step-up runs at the distinct-p grain
    on bucketed cumsum/cummin — no unpartitioned data-sized window, no
    corpus-wide p sort (millions of per-item tests is the design
    point)."""
    plan = plan_of(queries["events_fdr"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_exact_quantiles_probe_is_broadcast_no_global_sort(spark, queries):
    """exact_quantiles (round 11): the order statistics come from a
    broadcast probe of rank literals against the bucketed cumulative
    spans — no corpus-wide sort, no value-buffering percentile
    aggregate, the frame never leaves the distinct-value grain."""
    plan = plan_of(queries["lineitem_exact_quantiles"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "BroadcastNestedLoopJoin" in plan, plan  # the rank-span probe
    assert "percentile" not in plan.lower(), plan


def test_group_exact_quantiles_no_global_sort_no_percentile(spark, queries):
    """group_exact_quantiles (round 11): per-group bucketed cumulative
    spans + an equi-keyed probe join — no percentile (value-buffering)
    aggregate, no corpus-wide sort; the offset scan partitions BY GROUP
    so group cardinality never concentrates."""
    plan = plan_of(queries["orders_priority_quantiles"](spark, SF), "simple")
    assert "percentile" not in plan.lower(), plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "__bkt" in plan, plan


def test_kruskal_ranks_via_bucketed_prefix_sum(spark, queries):
    """kruskal_wallis (round 11): the k-sample midranks come from the
    bucketed cumsum over the distinct-value grain — no corpus-wide
    value sort even when the outcome is continuous (distinct ≈ units);
    the k-row group frame carries the rest."""
    plan = plan_of(queries["events_kruskal"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)


def test_spearman_rank_maps_bucketed_no_global_sort(spark, queries):
    """spearman (round 11): BOTH midrank maps are bucketed cumsums
    joined back by value — no Exchange rangepartitioning anywhere, no
    row_number over an unpartitioned frame."""
    plan = plan_of(queries["lineitem_spearman"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "row_number" not in plan, plan


def test_weighted_quantiles_probe_is_broadcast_no_global_sort(
    spark, queries
):
    """weighted_quantiles (round 11): same discipline as the unweighted
    probe — bucketed cumulative weights + a broadcast target probe; no
    percentile aggregate, no corpus-wide sort."""
    plan = plan_of(queries["lineitem_wquantiles"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    assert "BroadcastNestedLoopJoin" in plan, plan  # the target probe
    assert "percentile" not in plan.lower(), plan


def test_embed_covariance_no_self_join_one_pair_exchange(spark, queries):
    """embedding_covariance (round 11): the d(d+1)/2 pair products are
    generated IN-ROW (higher-order functions inside codegen) — the plan
    must contain NO row-id self-join (no SortMergeJoin at all; the only
    joins are broadcast moment/diagonal rejoins) and no generate-then-
    shuffle of a row-id-keyed frame."""
    plan = plan_of(queries["embed_covariance"](spark, SF), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "vec_id" not in plan.split("Scan parquet")[0], plan
    assert "Generate explode" in plan, plan  # the in-row pair explode
    assert "BroadcastHashJoin" in plan, plan  # moment rejoins


def test_anova_single_exchange_partial_agg(spark, queries):
    """anova (round 11): the moment half is ONE partial-aggregated
    groupBy — HashAggregate partial + final around a single group-key
    exchange; the Welch pass runs on the k-row frame via broadcast."""
    plan = plan_of(queries["events_anova"](spark, SF), "formatted")
    assert "HashAggregate" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_ols_residuals_projection_is_shuffle_free(spark, queries):
    """ols_predict (round 13): after the moment pass fits beta on the
    driver, the returned frame is a pure scan + filter + projection
    over beta LITERALS — no Exchange of any kind, no join, no window;
    the residual materialization must never shuffle the corpus."""
    plan = plan_of(queries["lineitem_ols_residuals"](spark, SF), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_ols_by_group_single_group_grain_exchange(spark, queries):
    """ols_by_group (round 13): the collected moment frame behind the
    output is ONE partial-aggregated group-grain exchange; the output
    frame itself is a bounded driver-side localTableScan (solved rows),
    so the plan of the RESULT has no distributed stages at all."""
    from intake_esm_spark.operators.regression import ols_by_group

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # audit the moment aggregate itself (the distributed half)
    from intake_esm_spark.operators.regression import (
        _ols_moment_proj,
        _ols_moment_sums,
    )
    from pyspark.sql import functions as F

    base = li.select(
        F.col("l_returnflag").cast("string").alias("__grp"),
        "l_extendedprice",
        "l_quantity",
        "l_discount",
    )
    agg = (
        base.select(
            "__grp",
            *_ols_moment_proj(
                "l_extendedprice", ["l_quantity", "l_discount"]
            ),
        )
        .groupBy("__grp")
        .agg(*_ols_moment_sums(["l_quantity", "l_discount"]))
    )
    plan = plan_of(agg, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "Exchange rangepartitioning" not in plan, plan


def test_cox_baseline_cumulatives_are_bucketed(spark, queries):
    """events_cox_baseline (r14): both cumulative axes — the DESC
    risk-set S0 and the ASC Breslow H0 — run through the bucketed
    prefix sum; no corpus-sized unpartitioned window, no value sort
    (the trajectory passes are 1-row collects, so the returned plan IS
    the final baseline pass)."""
    plan = plan_of(queries["events_cox_baseline"](spark, SF), "simple")
    _assert_no_entity_grain_window(plan)
    # the distinct-time collapse is one partial-agged keyed exchange
    assert "HashAggregate" in plan, plan


def test_huber_pass_is_single_partial_agged_scan(spark):
    """The Huber IRLS pass (r14): one 1-row partial-aggregated moment
    scan — decimal casts in a projection below the aggregate (the
    measured ~10x codegen trap), no exchange other than the 1-row
    final, no window anywhere."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.regression import _huber_pass

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    base = li.select(
        F.round(F.col("l_extendedprice").cast("double"), 6).alias("__y"),
        F.round(F.col("l_quantity").cast("double"), 6).alias("__x1"),
        F.round(F.col("l_discount").cast("double"), 6).alias("__x2"),
    )
    # audit the pass plan without executing the whole trajectory:
    # rebuild the projection+aggregate exactly as _huber_pass does but
    # keep it lazy (the helper itself collects)
    names = ["__x1", "__x2"]
    beta = [1.0, 0.5, -0.2]
    eta = F.lit(beta[0])
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    e = (F.col("__y") - eta).alias("__e")
    proj = base.select("__y", *names, e)
    absd = F.abs(F.col("__e"))
    w = F.when(absd <= F.lit(10.0), F.lit(1.0)).otherwise(
        F.lit(10.0) / absd
    )
    agg = proj.select(
        F.round(w, 12).cast("decimal(38,12)").alias("__tw")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("__tw").alias("sw"))
    plan = plan_of(agg, "simple")
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "windowspecdefinition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_chow_result_is_driver_rows_and_agg_is_one_exchange(spark):
    """chow_test_report (r14): the RESULT frame is a bounded driver
    localTableScan (one solved row — no distributed stages at all);
    the distributed half is the ols_by_group moment aggregate, whose
    single group-grain exchange is pinned by
    test_ols_by_group_single_group_grain_exchange (same builders)."""
    from intake_esm_spark.operators.regression import chow_test_report

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = chow_test_report(
        li, "l_extendedprice", ["l_quantity", "l_discount"],
        "l_linestatus",
    )
    plan = plan_of(out, "simple")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "Exchange" not in plan, plan


def test_iv_moment_pass_is_single_partial_agged_scan(spark):
    """iv2sls (r14): the widened (1, x, z, y) moment pass is ONE 1-row
    partial-aggregated scan — decimal casts projected below the
    aggregate, no window, no join, no rangepartitioning; the solve is
    driver arithmetic so the result frame is a localTableScan."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.regression import (
        _iv_moment_proj,
        _iv_moment_sums,
        iv2sls_report,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    xs, zs = ["l_quantity", "l_tax"], ["l_linenumber", "l_tax"]
    agg = li.select(
        *_iv_moment_proj("l_extendedprice", xs, zs)
    ).agg(*_iv_moment_sums(xs, zs))
    plan = plan_of(agg, "simple")
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "windowspecdefinition" not in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    out = iv2sls_report(li, "l_extendedprice", xs, zs)
    out_plan = plan_of(out, "simple")
    assert "ExistingRDD" in out_plan or "LocalTableScan" in out_plan


def test_dw_pairing_is_bucketed_rank_join_no_global_sort(
    spark, queries
):
    """durbin_watson_report (r14): the consecutive pairing runs as the
    bucketed-cumsum global rank + a rank-keyed equi-join — every
    data-sized window is bucket-partitioned and NO Exchange
    rangepartitioning (a corpus value sort) appears anywhere — in
    fact the tie-fanout rank path plans with ZERO window operators
    (pure join/aggregate construction), the strongest form of the
    no-unpartitioned-window contract."""
    plan = plan_of(queries["lineitem_dw"](spark, SF), "simple")
    assert "windowspecdefinition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_ts_diagnostics_results_are_driver_rows(spark, queries):
    """events_pacf / events_ljung_box / events_adf (r14): every
    distributed pass is a bounded-sidecar collect (the daily-frame
    mean/lag-join/moment aggregates of the shared builders), so the
    RETURNED frames are driver-local literal rows — no distributed
    stages, no exchange, in the result plan at all."""
    for name in ("events_pacf", "events_ljung_box", "events_adf"):
        plan = plan_of(queries[name](spark, SF), "simple")
        assert (
            "ExistingRDD" in plan or "LocalTableScan" in plan
        ), (name, plan)
        assert "Exchange" not in plan, (name, plan)


def test_adf_lag_frame_no_window_no_range_sort(spark):
    """adf_report (r14): the lagged-term frame is built from day-keyed
    equi-joins of the calendar-bounded daily frame — no window
    operator and no Exchange rangepartitioning anywhere in the moment
    pass."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.timeseries import _daily_frame

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    daily = _daily_frame(ev, "value", "ts")
    xd = F.round(F.col("__rd").cast("double"), 6)
    base = daily.select(F.col("__dn").alias("__d"), xd.alias("__x0"))
    cur = base
    for s in (1, 2):
        cur = cur.join(
            daily.select(
                (F.col("__dn") + F.lit(s)).alias("__d"),
                xd.alias(f"__x{s}"),
            ),
            "__d",
        )
    from intake_esm_spark.operators.regression import (
        _ols_moment_proj,
        _ols_moment_sums,
    )

    frame = cur.select(
        F.round(F.col("__x0") - F.col("__x1"), 6).alias("__dy"),
        F.col("__x1").alias("__y1"),
        F.round(F.col("__x1") - F.col("__x2"), 6).alias("__dy1"),
    )
    agg = frame.select(
        *_ols_moment_proj("__dy", ["__y1", "__dy1"])
    ).agg(*_ols_moment_sums(["__y1", "__dy1"]))
    plan = plan_of(agg, "simple")
    assert "windowspecdefinition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_histogram_split_corpus_never_shuffles(spark):
    """histogram_split_report (r14): the binned-count pass is an
    in-row explode partial-aggregated down to the bounded
    |features| x n_bins grid BEFORE its single keyed exchange — no
    window, no join, no rangepartitioning; the corpus rows themselves
    never cross the wire."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.trees import (
        _bin_expr,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "__y", (F.col("l_returnflag") == "R").cast("int")
    )
    structs = [
        F.struct(
            F.lit(c).alias("feature"),
            _bin_expr(c, 0.0, 1.0, 16).alias("bin"),
        )
        for c in ("l_quantity", "l_discount")
    ]
    pairs = li.select(
        F.col("__y").alias("__yy"),
        F.explode(F.array(*structs)).alias("__fb"),
    )
    agg = pairs.groupBy(
        F.col("__fb.feature").alias("feature"),
        F.col("__fb.bin").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"), F.sum("__yy").alias("pos"))
    plan = plan_of(agg, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert "Generate explode" in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_nb_theta_joins_broadcast_no_python_eval(spark, queries):
    """docs_nb_confusion (r14): the bounded log tables join the token
    frame as BROADCAST hash joins (never the shuffled side); scoring
    is decimal arithmetic in codegen — no Python eval anywhere, no
    corpus rangepartitioning.  The returned plan starts at the scored
    checkpoint, so the theta-join shape is pinned by rebuilding the
    present-score stage exactly as the operator does."""
    plan = plan_of(queries["docs_nb_confusion"](spark, SF), "simple")
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan

    from pyspark.sql import functions as F

    from intake_esm_spark.functions.text import portable_hash60

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = docs.select(
        F.col("doc_id").alias("__id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("__t"),
    ).select(
        "__id", (portable_hash60(F.col("__t")) % 256).alias("__h")
    )
    tf = tok.groupBy("__id", "__h").agg(F.count(F.lit(1)).alias("__tf"))
    theta = spark.createDataFrame(
        [("en", 3, "1.5")], "__cls string, __h int, __d string"
    ).select("__cls", "__h", F.col("__d").cast("decimal(18,9)").alias("__d"))
    present = (
        tf.join(F.broadcast(theta), "__h")
        .groupBy("__id", "__cls")
        .agg(
            F.sum(
                F.col("__tf").cast("decimal(18,0)") * F.col("__d")
            ).alias("__p")
        )
    )
    pplan = plan_of(present, "simple")
    assert "BroadcastHashJoin" in pplan, pplan
    assert "SortMergeJoin" not in pplan, pplan
    assert "BatchEvalPython" not in pplan, pplan


def test_bpe_pairs_in_row_walk_partial_topk(spark, queries):
    """docs_bpe_pairs (r14): the character-pair fan-out is an in-row
    Generate over a codegen transform (no self-join, no per-char
    shuffle of raw text); the top-k is a TakeOrderedAndProject over
    the map-side-combined pair counts — never a global Sort."""
    plan = plan_of(queries["docs_bpe_pairs"](spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Generate explode" in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_isotonic_result_is_driver_rows(spark, queries):
    """events_isotonic / events_holt (r14): the distributed work is
    the bounded-sidecar collapse; PAV / the Holt recursion run on the
    driver, so the returned frames are driver-local rows."""
    for name in ("events_isotonic", "events_holt"):
        plan = plan_of(queries[name](spark, SF), "simple")
        assert (
            "ExistingRDD" in plan or "LocalTableScan" in plan
        ), (name, plan)
        assert "Exchange" not in plan, (name, plan)


def test_jl_projection_in_row_single_block_join(spark, queries):
    """embed_jl_distortion (r14): the k-dim projection is IN-ROW
    literal dot folds (no matrix join, no Python eval); the only join
    is the label-blocked pair equi-join — never a CartesianProduct /
    BroadcastNestedLoopJoin."""
    plan = plan_of(queries["embed_jl_distortion"](spark, SF), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_tcloseness_group_windows_and_broadcast_global(spark, queries):
    """privacy_tcloseness (r14): the per-group cumulative walk is a
    GROUP-partitioned window over <=n_bins rows; the global
    distribution joins back as a broadcast; no corpus
    rangepartitioning anywhere."""
    plan = plan_of(queries["privacy_tcloseness"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_burstiness_lag_window_entity_partitioned(spark, queries):
    """events_burstiness (r14): the consecutive-gap lag window is
    PARTITIONED by (user, type) — entity-grain, shuffle-bounded —
    and the moment collapse partial-aggregates; never an
    unpartitioned ordered window over the corpus."""
    plan = plan_of(queries["events_burstiness"](spark, SF), "simple")
    line = next(
        (ln for ln in plan.splitlines() if "windowspecdefinition" in ln),
        "",
    )
    assert "__u" in line and "__t" in line, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_heaps_result_is_driver_rows(spark, queries):
    """docs_heaps (r14): the fit runs on the driver over the bounded
    per-group points — the returned frame is driver-local."""
    plan = plan_of(queries["docs_heaps"](spark, SF), "simple")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "Exchange" not in plan, plan


def test_permutation_fanout_partial_agged_no_range_sort(spark, queries):
    """events_permutation (r14): the B-relabeling fan-out is an
    in-row explode partial-aggregated to the 2B-cell grid before the
    exchange — no window, no rangepartitioning, no Python eval; the
    returned row is driver-local."""
    plan = plan_of(queries["events_permutation"](spark, SF), "simple")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan

    from pyspark.sql import functions as F

    from intake_esm_spark.functions.text import salted_hash60

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_type").isin("click", "view")
    )
    perm = ev.select(
        F.col("value").alias("__v"),
        F.explode(F.expr("sequence(0, 63)")).alias("__p"),
        F.col("event_id").cast("string").alias("__id"),
    ).select(
        "__p",
        "__v",
        F.pmod(
            salted_hash60(
                F.concat_ws("|", F.col("__p").cast("string"),
                            F.col("__id")),
                "perm",
            ),
            F.lit(2),
        ).alias("__l"),
    )
    agg = perm.groupBy("__p", "__l").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__v").alias("s")
    )
    pplan = plan_of(agg, "simple")
    assert pplan.count("HashAggregate") == 2, pplan  # partial + final
    assert "Generate explode" in pplan, pplan
    assert "windowspecdefinition" not in pplan, pplan
    assert "Exchange rangepartitioning" not in pplan, pplan


def test_mh_cell_collapse_metadata_scale(spark, queries):
    """events_mh_or (r14): one (stratum, e, y)-keyed partial-agged
    collapse; everything after runs on the bounded cell frame — no
    window, no rangepartitioning, no Python eval."""
    plan = plan_of(queries["events_mh_or"](spark, SF), "simple")
    assert plan.count("HashAggregate") >= 4, plan  # cells+wide+terms
    assert "windowspecdefinition" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_smd_result_is_driver_rows(spark, queries):
    """events_smd (r14): ONE 1-row moment pass; the readout is driver
    arithmetic, so the returned frame is driver-local."""
    plan = plan_of(queries["events_smd"](spark, SF), "simple")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "Exchange" not in plan, plan


def test_cochran_friedman_single_pivot_plus_one_row_pass(
    spark, queries
):
    """events_cochran_q / events_friedman (r14): one user-grain pivot
    exchange + ONE 1-row integer-sum aggregate — the in-row rank /
    flag arithmetic stays in codegen; no window, no join, no
    rangepartitioning, no Python eval."""
    for name in ("events_cochran_q", "events_friedman"):
        plan = plan_of(queries[name](spark, SF), "simple")
        assert "windowspecdefinition" not in plan, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "Exchange rangepartitioning" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)
