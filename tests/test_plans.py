"""Physical-plan assertions — the 100 TB guardrails.

These tests pin the *plan shape*, not the results: filter pushdown reaches
the parquet scan, column pruning trims ReadSchema, small dimensions
broadcast, aggregates partial-agg before the shuffle, and partitioned
layouts prune. A regression here is a 100× slowdown at scale that no
correctness test would catch."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ups_crossref_etl_spark.plans.registry import load_all
from ups_crossref_etl_spark.sources import sinks
from ups_crossref_etl_spark.sources.lake import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushdown_and_partial_agg(spark, sf_dir):
    q = load_all()["q1_pricing_summary"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "LessThanOrEqual(l_shipdate" in plan.split("PushedFilters:")[1]
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2
    # codegen spans appear once AQE finalizes: execute, then check the
    # final plan — "*(n)" prefixes mark WholeStageCodegen stages
    q.collect()
    assert "*(" in _plan(q)


def test_q1_column_pruning(spark, sf_dir):
    q = load_all()["q1_pricing_summary"].fn(spark, sf_dir)
    plan = _plan(q)
    # scan must not read unused columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_q5_broadcasts_dimensions(spark, sf_dir):
    q = load_all()["q5_local_supplier_volume"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    # region filter applied before join (pushed through)
    assert "EqualTo(r_name,ASIA)" in plan  # pushed into the region scan


def test_semi_anti_joins_planned(spark, sf_dir):
    qs = load_all()
    assert "LeftSemi" in _optimized(qs["q_semi_join_urgent_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in _optimized(
        qs["q_anti_join_customers_without_orders"].fn(spark, sf_dir)
    )


def test_exact_dedup_single_shuffle(spark, sf_dir):
    from ups_crossref_etl_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(dedup.exact_dup_groups(d, "text", "doc_id"))
    # one exchange for the hash groupBy; no join, no second shuffle
    assert plan.count("Exchange") == 1


def test_partition_pruning_on_year_layout(spark, sf_dir):
    """obras-by-Anio layout: a year filter must prune partitions at scan."""
    o = read_table(spark, sf_dir, "orders").withColumn(
        "Anio", F.year("o_orderdate")
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "obras")
        sinks.write_table(o, path, partition_by=["Anio"])
        back = spark.read.parquet(path).filter(F.col("Anio") == 1995)
        plan = _plan(back)
        assert "PartitionFilters: [isnotnull(Anio" in plan
        years = {
            r["Anio"]
            for r in back.select("Anio").distinct().collect()
        }
        assert years == {1995}


def test_broadcast_pattern_join_in_ingest(spark):
    """J4 country tagging must broadcast the 16-row pattern table."""
    from ups_crossref_etl_spark.plans.ingest import country_pattern_df, tag_countries

    aff = spark.createDataFrame(
        [("universidad de granada, spain",), ("mit, usa",)], schema="aff_norm string"
    )
    out = tag_countries(aff, country_pattern_df(spark))
    assert "BroadcastNestedLoopJoin" in _plan(out) or "BroadcastHashJoin" in _plan(out)


def test_minhash_no_cartesian(spark, sf_dir):
    """LSH candidate generation must be an equi-join on (band, bhash),
    never a cartesian product."""
    from ups_crossref_etl_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(dedup.minhash_lsh_candidates(d, "text", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_bruteforce_topk_no_shuffle_before_limit(spark, sf_dir):
    """Top-k against a literal query vector: scan → project → TakeOrdered.
    No Exchange should precede the ordering (global top-k is collected via
    TakeOrderedAndProject, not a full sort shuffle)."""
    from ups_crossref_etl_spark.operators import similarity as sim

    emb = read_table(spark, sf_dir, "embeddings")
    q = [0.1] * 64
    plan = _plan(sim.brute_force_topk(emb, q, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """sinks.write_bucketed co-location claim: joining two tables bucketed
    on the same key must not exchange either side."""
    from ups_crossref_etl_spark.sources.sinks import write_bucketed

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    write_bucketed(c, "b_customer", ["c_custkey"], num_buckets=8)
    write_bucketed(o, "b_orders", ["c_custkey"], num_buckets=8)
    try:
        # disable broadcast so the planner must pick a shuffle-family join
        # (at real scale neither side broadcasts) — bucketing then removes
        # the shuffle exchanges entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_customer").join(spark.table("b_orders"), "c_custkey")
        j.collect()
        plan = _plan(j)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_country_tagging_pinned_reference_parity(spark):
    """Pins (cc, country) for known affiliations against hardcoded expected
    values — independent of the COUNTRY_PATTERNS constant, so a drift in
    membership/order/names of the dict (reference :167-185) fails here even
    though the bibliometric oracle imports the same constant."""
    from ups_crossref_etl_spark import functions as fx
    from ups_crossref_etl_spark.plans.ingest import country_pattern_df, tag_countries

    cases = [
        ("Universidad Politécnica Salesiana, Quito, Ecuador", "EC", "Ecuador"),
        ("Universidad de Granada, España", "ES", "Spain"),
        ("Universidad Nacional Mayor de San Marcos, Lima, Perú", "PE", "Peru"),
        # reference dict order puts peru BEFORE colombia — first match wins
        ("Oficina regional para Colombia y Peru", "PE", "Peru"),
        ("MIT, Cambridge, USA", "US", "United States"),
        ("University of Tokyo, Japan", "JP", "Japan"),
        ("Harvard University, Estados Unidos", "US", "United States"),
        ("King's College, Londres, Inglaterra", "GB", "United Kingdom"),
        # NOT in the reference dict: no 'england' pattern, no Portugal entry
        ("University of Oxford, England", None, None),
        ("Instituto Superior Técnico, Lisboa, Portugal", None, None),
        ("Université de Montréal, Canada", "CA", "Canada"),
    ]
    aff = spark.createDataFrame([(c[0],) for c in cases], schema="raw string")
    aff = aff.select(fx.norm_text_nfkd_lower(F.col("raw")).alias("aff_norm"), "raw")
    got = {
        r["raw"]: (r["cc_match"], r["country_match"])
        for r in tag_countries(aff, country_pattern_df(spark)).collect()
    }
    for raw, cc, name in cases:
        assert got[raw] == (cc, name), f"{raw}: {got[raw]} != {(cc, name)}"


def test_sampling_assignment_plans_are_narrow(spark, sf_dir):
    """The sampling ops' core scale claim: split assignment and stratified
    filtering are pure projections/filters — ZERO exchanges before any
    caller-added aggregation, so sampling 100 TB never shuffles the
    unsampled bytes. Chunking adds only a Generate (explode), still no
    exchange."""
    from ups_crossref_etl_spark.operators import sampling

    d = read_table(spark, sf_dir, "documents")
    p1 = _plan(sampling.split_assign(d, "doc_id"))
    assert "Exchange" not in p1
    p2 = _plan(
        sampling.stratified_sample(d, "source", "doc_id", rates={"src0": 0.1})
    )
    assert "Exchange" not in p2
    p3 = _plan(
        sampling.chunk_spans(
            d.select("doc_id", F.size(F.split("text", r"\s+")).alias("n_tok")),
            F.col("n_tok"),
        )
    )
    assert "Exchange" not in p3 and "Generate" in p3


def test_pack_sequences_single_partition_exchange(spark, sf_dir):
    """Packing shuffles exactly once — the window partition on the domain
    column; no global sort (Sort is within partitions after the hash
    exchange)."""
    from ups_crossref_etl_spark.operators import sampling

    d = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", r"\s+")).alias("n_tok")
    )
    plan = _plan(sampling.pack_sequences(d, "n_tok", "doc_id", 2048, "source"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_domain_mix_broadcasts_rates(spark, sf_dir):
    """The per-domain rate table joins back as a broadcast — the fact side
    is never shuffled for the join."""
    from ups_crossref_etl_spark.operators import sampling

    d = read_table(spark, sf_dir, "documents")
    mixed = sampling.domain_mix(
        d, "source", "doc_id", {"src0": 0.5, "src1": 0.5}, total_budget=50
    )
    plan = _plan(mixed)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_frame_window_single_exchange(spark, sf_dir):
    """RANGE-interval frame (7-day trailing sum): ONE partition exchange +
    ONE sort feeding ONE Window operator — a second sort/exchange would
    mean the frame is re-shuffling per function at 100 TB."""
    q = load_all()["q_window_range_frame_7d"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1
    assert plan.count("Sort") == 1


def test_grouping_sets_single_expand(spark, sf_dir):
    """GROUPING SETS ((type),(hour),()) must compile to ONE Expand + ONE
    aggregate exchange (with map-side partial agg) — not one scan per set."""
    q = load_all()["q_events_grouping_sets"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_cube_single_expand(spark, sf_dir):
    """CUBE(type, hour): same single-Expand shape (4 grouping combos in
    one pass)."""
    q = load_all()["q_events_cube_type_hour"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1


def test_sliding_window_single_expand(spark, sf_dir):
    """Sliding window (10m window / 5m slide): each event expands to
    exactly its 2 window instances via ONE Expand + one agg exchange.
    Pinned on the batch twin of streaming/events.sliding_avg (identical
    DataFrame code path; the streaming variant only adds the watermark)."""
    from ups_crossref_etl_spark.streaming import events as se

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    plan = _plan(se.sliding_avg(ev))
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """Decontamination at 100 TB only works if the benchmark n-gram set is
    broadcast — the corpus side must never shuffle for the probe join."""
    from ups_crossref_etl_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    cor = d.filter(F.col("doc_id") % 5 != 0)
    plan = _plan(dedup.ngram_contamination(cor, bench, "text", "doc_id", n=5))
    assert "BroadcastHashJoin" in plan


def test_scd2_intervals_single_key_exchange(spark, sf_dir):
    """SCD2 rebuild: run-id window, run groupBy, and lead window all
    cluster by user_id — hashpartitioning(user_id) satisfies the
    groupBy(user_id, run) distribution (grouping keys ⊇ partitioning
    keys), so the whole plan runs on ONE hash exchange."""
    q = load_all()["q_events_scd2_intervals"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_bm25_topk_take_ordered_and_broadcast_stats(spark, sf_dir):
    """BM25 top-k: the cut is TakeOrderedAndProject (per-partition heap,
    no global sort shuffle) and both the corpus stats row and the
    per-term document frequencies join in as broadcasts."""
    q = load_all()["q_docs_bm25_topk"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_self_repetition_map_only(spark, sf_dir):
    """Within-doc repetition signals are row-local: no Exchange anywhere
    — the operator fuses into the scan at any scale."""
    from ups_crossref_etl_spark.operators import text_analysis as ta

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(ta.self_repetition(d, "text", "doc_id"))
    assert "Exchange" not in plan


def test_funnel_single_user_exchange(spark, sf_dir):
    """The funnel chain clusters every step aggregate and join on the
    user key: one hash exchange (plus the final counts' single-partition
    reduce), no sort shuffle, step joins broadcast at this scale."""
    q = load_all()["q_events_funnel"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_never_all_pairs(spark, sf_dir):
    """Blocked linkage must never degrade to a cross product: every join
    is keyed (token / pair id), verify runs on candidates only."""
    q = load_all()["q_part_fuzzy_pairs"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_broadcasts_candidates(spark, sf_dir):
    """The exact pass semi-joins the corpus against BROADCAST candidates
    — a full-column groupBy shuffle would defeat the sketch."""
    q = load_all()["q_events_heavy_hitters"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cdc_apply_anti_join_no_snapshot_window(spark, sf_dir):
    """The last-writer window runs over the change batch only; the
    snapshot contributes one LeftAnti join and a union — it is never
    sorted or window-scanned."""
    q = load_all()["q_customer_cdc_apply"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "LeftAnti" in plan
    assert "Exchange rangepartitioning" not in plan
    # row_number()==1 must compile to the rank-limit pushdown: a Partial
    # WindowGroupLimit prunes each map task to 1 row per key BEFORE the
    # exchange, so the batch shuffle carries winners, not history
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # and every window clusters on the CDC key, never the snapshot rows
    assert "windowspecdefinition(c_custkey" in plan


def test_resample_grid_generated_executor_side(spark, sf_dir):
    """The grid comes from sequence+explode (Generate) on the executors,
    not a driver loop; the fill window sorts locally after a hash
    exchange — no range shuffle."""
    q = load_all()["q_events_resample_1h"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "Generate explode" in plan
    assert "Exchange rangepartitioning" not in plan


def test_percentile_trim_single_scan_broadcast_cutoffs(spark, sf_dir):
    """Cutoffs reduce to a broadcast single row (the 1-row nested-loop
    broadcast is the intended shape); the trim filter itself adds no
    exchange beyond the final report's groupBy."""
    q = load_all()["q_docs_percentile_trim"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_pagerank_lineage_truncation_cadence(spark):
    """Lineage contract after the round-5 cadence change: shallow runs
    (n_iter <= checkpoint_every) compile into ONE unrolled job with NO
    per-iteration materialization (measured ~2.5x faster); deep runs
    truncate every checkpoint_every iterations so the final plan replays
    only the tail since the last checkpoint, not the whole DAG (which
    would OOM the driver at real iteration counts)."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40) for i in range(40)], ["src", "dst"]
    )
    shallow = _plan(pagerank(edges, n_iter=3, checkpoint_every=5))
    # inputs (edges/nodes/ed) are checkpointed RDDs, but the rank
    # recursion itself must not be: 3 iterations = 3 contribution aggs
    # (partial+final pairs) visible in one plan
    assert shallow.count("HashAggregate(keys=[node") >= 6

    deep = _plan(pagerank(edges, n_iter=6, checkpoint_every=5))
    # after the iteration-5 checkpoint only iteration 6 replays: exactly
    # one contribution agg (partial+final) on top of a Scan ExistingRDD
    assert "Scan ExistingRDD" in deep
    assert deep.count("HashAggregate(keys=[node") == 2


def test_token_divergence_one_explode_one_token_exchange(spark, sf_dir):
    """Conditional aggregation aligns both groups' counts in ONE
    groupBy(token) — no self-join, the corpus is exploded exactly once
    (the vocab-sized intermediate is checkpointed for the two readers)."""
    q = load_all()["q_docs_token_divergence"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "SortMergeJoin" not in plan
    assert plan.count("Generate explode") == 0  # reads the checkpoint
    assert "Scan ExistingRDD" in plan


def test_key_skew_stats_two_stage_agg(spark, sf_dir):
    """Skew diagnostics: one key-hash exchange for the per-key counts
    (map-side partial), one single-partition reduce for the 1-row
    summary — never a sort or a join."""
    q = load_all()["q_events_key_skew"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert "Join" not in plan
    assert "partial_count" in plan


def test_temperature_mix_broadcast_rates(spark, sf_dir):
    """The per-lang rate table must come back as a broadcast: the corpus
    is scanned once with a map-side hash filter — no shuffle of the
    fact rows before the final per-lang count."""
    q = load_all()["q_docs_temperature_mix"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zscore_single_window_operator(spark, sf_dir):
    """count/sum(c)/sum(c*c) share one frame -> exactly ONE Window
    operator and one user_id exchange; the naive self-join formulation
    would show a Join here."""
    q = load_all()["q_events_zscore_outliers"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_zorder_tiles_codegen_no_udf(spark, sf_dir):
    """The Morton key is pure JVM bit arithmetic: no Python evaluation
    in the plan, one tile-hash exchange with map-side partial agg."""
    q = load_all()["q_events_zorder_tiles"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_remove_common_spans_no_cartesian_hash_keyed(spark, sf_dir):
    """Span removal must stay equi-join-shaped end to end: grams/covered
    positions join on hash/position keys, never a cartesian; and the
    shuffled gram relation carries the md5 hash, not raw n-gram text.
    r14: base and grams are lazily checkpointed (they each feed multiple
    consumers), so the md5 evaluation lives inside the materialized gram
    relation — the consumer plan must show the narrow (_id, pos, gh)
    checkpoint scans, which is the same guarantee (fixed-width hash
    rows, never token text, cross the shuffle)."""
    from ups_crossref_etl_spark.operators.spans import remove_common_spans

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(remove_common_spans(d, "text", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "gh#" in plan and "Scan ExistingRDD" in plan


def test_bigram_nll_broadcasts_scalar_no_window(spark, sf_dir):
    """Bigram generation is row-local codegen (no corpus-wide window
    function shuffling every token) and the vocabulary scalar V arrives
    via broadcast."""
    from ups_crossref_etl_spark.operators.text_analysis import bigram_nll

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(bigram_nll(d, "text", "doc_id"))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_global_topk_not_full_sort(spark, sf_dir):
    """The k-smallest-clocks cut must be TakeOrderedAndProject (filtering
    the corpus), never a full global sort of all rows."""
    from ups_crossref_etl_spark.operators.sampling import weighted_sample_k

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(weighted_sample_k(d, "doc_id", "n_chars", k=20))
    assert "TakeOrderedAndProject" in plan


def test_context_assembly_single_user_exchange(spark, sf_dir):
    """Truncating window and assembling groupBy share the user_id
    partitioning: exactly one shuffle for the whole operator."""
    from ups_crossref_etl_spark.plans.round5_queries import (
        q_events_context_assembly,
    )

    plan = _plan(q_events_context_assembly(spark, sf_dir))
    assert plan.count("Exchange") == 1


def test_profile_columns_single_scan(spark, sf_dir):
    """The profiler's contract is ONE pass however many columns are
    profiled: a single parquet scan feeding one aggregate, never a scan
    or job per column."""
    from ups_crossref_etl_spark.operators.profile import profile_columns

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(profile_columns(d, ["doc_id", "lang", "source", "n_chars"]))
    assert plan.count("Scan parquet") == 1


def test_q20_nested_in_becomes_semi_joins(spark, sf_dir):
    """TPC-H Q20's nested-IN chain must plan as LEFT SEMI joins executed
    once as hash-join builds — never per-row subquery re-execution, and
    never a cross product. Both INs (part-name filter into ps, qualifying
    suppliers into supplier) are written as left_semi; Catalyst must keep
    them that way."""
    q = load_all()["q20_potential_promotion"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan


def test_q2_correlated_min_single_ps_derivation(spark, sf_dir):
    """Q2's correlated-min decorrelates into a per-part min aggregate
    joined back on (partkey, cost). The derived-ps aggregation and the
    min re-join are both partkey-keyed; dimensions broadcast; no cross
    product."""
    q = load_all()["q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation/region, part


def test_bpe_encode_map_only_no_exchange(spark, sf_dir):
    """Corpus BPE encode must be ONE Arrow map pass: no KEYED exchange
    anywhere in the plan (merges travel in the task closure, the word
    memo is per-partition). r13 allows at most one round-robin spread
    exchange (guide §2.5: single-row-group inputs otherwise run the
    whole encode on one core; absent on inputs that already split —
    the 100 TB case)."""
    from ups_crossref_etl_spark.operators.bpe import bpe_encode

    d = read_table(spark, sf_dir, "documents")
    enc = bpe_encode(d, "text", "doc_id", [("t", "h"), ("th", "e")])
    plan = _plan(enc)
    n_exchange = plan.count("Exchange")
    n_spread = plan.count("RoundRobinPartitioning")
    assert n_exchange == n_spread and n_spread <= 1
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_semantic_edges_cluster_equijoin_no_cartesian(spark, sf_dir):
    """SemDeDup pair generation must join ON the cluster id (hash join),
    never a cross product over the vectors."""
    import numpy as np

    from ups_crossref_etl_spark.operators.semdedup import semantic_edges

    emb = read_table(spark, sf_dir, "embeddings")
    cent = np.zeros((4, 64)) + np.eye(4, 64)
    plan = _plan(semantic_edges(emb, cent, 0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_late_arrival_audit_distributed_prefix_max(spark, sf_dir):
    """The audit's running max must be the bucketed prefix-max shape:
    bucket-partitioned window + broadcast of the tiny bucket-summary
    prefix — not one global-order window over the fact rows."""
    from ups_crossref_etl_spark.operators.timeseries import late_arrival_audit

    ev = read_table(spark, sf_dir, "events")
    q = late_arrival_audit(ev, "event_id", "ts", "event_type", 600, bucket_size=10_000)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan  # prefix table joins back broadcast
    # the fact-row window partitions by bucket, so its exchange is
    # hashpartitioning on _b — a single-partition global exchange over the
    # fact rows would show SinglePartition feeding the big window
    assert "hashpartitioning(_b" in plan


def test_image_neardup_banded_equi_join_no_cartesian(spark, sf_dir):
    """Image near-dup candidates must come from the dHash pigeonhole
    block equi-join — never an all-pairs comparison (that is the
    ORACLE's job on the bounded sample) — and the decode stage is one
    map-only mapInPandas pass: zero exchanges before the hash table."""
    from ups_crossref_etl_spark.plans.registry import load_all

    q = load_all()["q_media_image_neardup"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    feats = load_all()["q_media_bmp_features"].fn(spark, sf_dir)
    fplan = _plan(feats)
    assert "Exchange" not in fplan  # decode + features: map-only
    assert "MapInPandas" in fplan


def test_nb_classify_model_joins_grid_bounded(spark, sf_dir):
    """NB scoring: the corpus-side joins are equi-joins (term freqs x
    vocabulary-sized model); the only nested-loop join is the bounded
    doc x label grid whose build side is the broadcast label-stats row
    set; the argmax window partitions per document (n_labels rows each),
    never a global order."""
    from ups_crossref_etl_spark.plans.registry import load_all

    q = load_all()["q_docs_nb_langid"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    # every nested-loop join is a broadcast-build Cross of scalar/label
    # stats (consts x consts, cls x consts, doc x grid) — never a
    # shuffled corpus side on both inputs
    n_nlj = plan.count("BroadcastNestedLoopJoin")
    assert 1 <= n_nlj <= 3
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Cross") == n_nlj
    # the model join is a hash equi-join on the token key
    assert "row_number" in plan
    # Spark collapses rn=1 into a group-limit before the full window
    assert "WindowGroupLimit" in plan


def test_incremental_mv_apply_never_rescans_base(spark, sf_dir, tmp_path):
    """The refresh stage must touch only the persisted MV and the delta:
    with the MV materialized to parquet, the apply plan scans the events
    relation exactly once (the delta) and merges via one full-outer
    equi-join on the view key with a map-side partial aggregate on the
    delta — the base aggregate never reruns."""
    from ups_crossref_etl_spark.operators.incremental_mv import (
        build_mv,
        incremental_mv_apply,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .select("event_id", "event_type", "hour", "value")
    )
    mv_path = str(tmp_path / "mv")
    build_mv(ev.filter(F.col("event_id") % 10 < 8), ["event_type", "hour"],
             ["value"]).write.parquet(mv_path)
    mv = spark.read.parquet(mv_path)
    delta = ev.filter(F.col("event_id") % 10 >= 8).withColumn("op", F.lit("I"))
    plan = _plan(incremental_mv_apply(mv, delta, ["event_type", "hour"], ["value"]))
    assert plan.count("events.parquet") == 1  # delta scan only
    assert "FullOuter" in plan
    assert "partial_sum" in plan  # delta agg combines map-side
    assert "CartesianProduct" not in plan


def test_hybrid_skew_join_two_branch_plan(spark, sf_dir):
    """Under a disabled auto-broadcast threshold the hybrid must still
    show BOTH strategies: the hot branch's explicit broadcast hash join
    (hot rows never shuffle) and a shuffle-family join for the cold
    remainder, glued by a Union — and never a cartesian."""
    from ups_crossref_etl_spark.operators.skew import hybrid_skew_join

    o = read_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        "o_totalprice",
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(hybrid_skew_join(o, c, "c_custkey", min_hot_count=400))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Union" in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_tfidf_knn_token_equijoin_no_cartesian(spark, sf_dir):
    """Pair dot-products must be a token-keyed equi-join over posting
    lists, never a doc-by-doc product; the df-capped vocab broadcast
    joins against tf; the posting relation is persisted so the corpus
    tf pipeline is computed once, not once per consumer."""
    from ups_crossref_etl_spark.operators.retrieval import tfidf_knn_graph

    d = read_table(spark, sf_dir, "documents")
    out = tfidf_knn_graph(d, "text", "doc_id", k=5, max_df_frac=0.06, ngram=3)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan  # persisted posting relation reused


def test_bloom_probe_broadcasts_bitmap_no_corpus_shuffle_join(spark, sf_dir):
    """The probe side must join the bitmap via BroadcastHashJoin (the
    bitmap is <= num_words rows by construction) — an exchange-keyed
    join here would shuffle the corpus on word_idx and defeat the
    operator's purpose."""
    from ups_crossref_etl_spark.operators.membership import (
        bloom_build,
        bloom_probe,
    )

    d = read_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 17 == 0).select(
        F.lower(F.col("text")).alias("v")
    )
    bloom = bloom_build(ev, "v")
    out = bloom_probe(
        d.select("doc_id", F.lower(F.col("text")).alias("v")),
        "v",
        "doc_id",
        bloom,
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rp_project_map_only_no_exchange(spark, sf_dir):
    """The JL projection must fuse into the scan: literal sign arrays
    folded row-locally, posexplode after reduction — zero exchanges."""
    from ups_crossref_etl_spark.operators.similarity import rp_project

    emb = read_table(spark, sf_dir, "embeddings")
    plan = _plan(rp_project(emb, "embedding", "vec_id", out_dim=16))
    assert "Exchange" not in plan


def test_standardize_stats_partial_agg_and_broadcast(spark, sf_dir):
    """The dim-stat aggregate must partial-agg before its exchange (the
    64x posexplode collapses map-side) and the stat table must broadcast
    into the normalization join."""
    from ups_crossref_etl_spark.operators.similarity import (
        standardize_embeddings,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    plan = _plan(standardize_embeddings(emb, "embedding", "vec_id"))
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert "BroadcastHashJoin" in plan


def test_single_key_exchange_window_family(spark, sf_dir):
    """The round-6 window operators claim ONE key-clustered exchange
    each (EWMA, interval union, mean shift) and two for nucleus
    (totals agg + window) — pin the counts so a refactor that loses
    exchange reuse is caught."""
    from ups_crossref_etl_spark.functions.dates import epoch_seconds
    from ups_crossref_etl_spark.operators.sampling import nucleus_select
    from ups_crossref_etl_spark.operators.timeseries import (
        interval_union_length,
        mean_shift_scores,
        windowed_ewma,
    )

    ev = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def n_ex(df):
        p = _plan(df)
        assert "CartesianProduct" not in p
        assert "Exchange SinglePartition" not in p
        return p.count("Exchange hashpartitioning")

    assert n_ex(
        windowed_ewma(
            ev.filter(F.col("value").isNotNull()),
            "user_id", ["ts", "event_id"], "value", alpha=0.5,
        )
    ) == 1
    iv = ev.select(
        "user_id",
        epoch_seconds("ts").alias("s"),
        (epoch_seconds("ts") + 300).alias("e"),
    )
    assert n_ex(interval_union_length(iv, "user_id", "s", "e")) == 1
    assert n_ex(
        mean_shift_scores(ev, "user_id", ["ts", "event_id"], "value", w=10)
    ) == 1
    assert n_ex(
        nucleus_select(docs, "source", "n_chars", "doc_id", p=0.8)
    ) == 2


def test_approx_bin_assign_zero_shuffle(spark, sf_dir):
    """The percentile-cutoff binning claim: assignment is a codegen
    comparison chain that fuses into the scan — no Exchange at all."""
    from ups_crossref_etl_spark.operators.evaluation import (
        approx_bin_assign,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    plan = _plan(approx_bin_assign(docs, "n_chars", n_bins=10))
    assert "Exchange" not in plan


def test_cms_estimate_broadcasts_sketch(spark, sf_dir):
    """CMS probes must take a broadcast join against the fixed-size
    counter table — a shuffled join would move the probe relation on
    (d, slot) for a table that is depth x width rows by construction."""
    from ups_crossref_etl_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = read_table(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id", width=1024, depth=3)
    probe = ev.filter(F.col("user_id") < 40).select("user_id").distinct()
    plan = _plan(cms_estimate(probe, "user_id", cms, width=1024, depth=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_rollup_partial_aggregates(spark, sf_dir):
    """Sketch build and union must both partial-agg map-side — the
    shuffle carries per-group KB binaries, never event rows twice."""
    from ups_crossref_etl_spark.operators.sketches import (
        hll_rollup,
        hll_sketch_table,
    )

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch_table(ev, "user_id", ["event_type", "day"])
    plan = _plan(hll_rollup(daily, ["event_type"]))
    assert plan.count("HashAggregate") >= 4  # partial+final at both grains
    assert "partial" in plan.lower()


def test_dsir_select_broadcast_model_and_topk(spark, sf_dir):
    """DSIR: the 256-row bucket model must come back as a broadcast join
    (never a corpus-sized shuffle join) and the final selection must be
    TakeOrderedAndProject, not a global sort."""
    q = load_all()["q_docs_dsir_select"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pmi_broadcast_vocab_and_topk(spark, sf_dir):
    """PMI: the vocabulary-sized unigram table joins the bigram table
    BROADCAST (twice); top-k is TakeOrderedAndProject; the only
    cross join is the 1-row T/P scalar row."""
    q = load_all()["q_docs_pmi_collocations"].fn(spark, sf_dir)
    plan = _plan(q)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_top_keywords_broadcast_dfreq_partial_agg(spark, sf_dir):
    """Keyword extraction: document frequencies join back BROADCAST (the
    vocab-sized table never shuffle-joins the tf relation) and every
    token-keyed aggregate partial-aggregates before its exchange — the
    skew-safe formulation (a token-partitioned window would funnel every
    stopword row into one partition). The dfreq branch deliberately
    re-aggregates from the scan (4 exchanges total): at 100 TB you
    persist the tf relation instead — documented in the operator."""
    q = load_all()["q_docs_top_keywords"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") <= 4


def test_hard_negatives_ivf_no_cartesian(spark, sf_dir):
    """IVF hard negatives: candidate generation must stay inside the
    cluster-blocked applyInPandas kernel — no pairwise join of the
    embedding relation in the plan."""
    import numpy as np

    from ups_crossref_etl_spark.operators.mining import hard_negatives_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    cents = np.eye(4, 64)
    plan = _plan(hard_negatives_ivf(emb, cents, k=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_kcore_round_is_node_keyed_no_cartesian(spark, sf_dir):
    """One k-core peel round plans as a node-keyed degree aggregate plus
    two (broadcast- or shuffle-) semi-joins — nothing pairwise beyond
    the co-order edge derivation's orderkey equi-join."""
    li = read_table(spark, sf_dir, "lineitem")
    pe = li.select("l_orderkey", "l_partkey").distinct()
    edges = (
        pe.alias("a")
        .join(pe.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    keep = deg.filter(F.col("_deg") >= 80).select("src")
    pruned = sym.join(keep, "src", "left_semi").join(
        keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
    )
    plan = _plan(pruned)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    # map-side combine on the degree aggregate
    assert "partial_count" in plan


def test_snapshot_diff_single_join_no_cartesian(spark, sf_dir):
    """snapshot_diff: ONE full-outer SortMergeJoin/ShuffledHashJoin on the
    key — never a cartesian, never per-column joins; the changed-column
    array is row-local projection."""
    q = load_all()["q_docs_snapshot_diff"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert plan.count("FullOuter") == 1
    # no second join of any kind (classification is projection-side)
    import re

    joins = re.findall(
        r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoop",
        plan,
    )
    assert len(joins) == 1, joins


def test_unigram_word_count_partial_agg_and_map_only_segment(spark, sf_dir):
    """unigram segmentation: the corpus word count partial-aggregates
    before its exchange, and — because it is checkpointed once for its
    three consumers — the final query plan is ONLY mapInPandas over the
    materialized word table (no re-run of the corpus shuffle, no
    exchange between the vocab-sized word table and the segmenter)."""
    from ups_crossref_etl_spark.operators.unigram import word_counts

    docs = read_table(spark, sf_dir, "documents")
    wc_plan = _plan(word_counts(docs))
    assert "partial_count" in wc_plan or "partial_sum" in wc_plan
    q = load_all()["q_docs_unigram_segment"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "MapInPandas" in plan
    assert "ExistingRDD" in plan  # the checkpointed word table
    assert "Exchange" not in plan  # map-only over it
    assert "CartesianProduct" not in plan


def test_corr_matrix_single_aggregate_exchange(spark, sf_dir):
    """corr_matrix: ALL pairwise moments in ONE map-side-combinable
    aggregate — a single one-row aggregate exchange; no per-pair
    rescans, no join. r13 adds a CONDITIONAL round-robin spread of the
    scan (guide §2.5 input skew: single-row-group testdata parquet runs
    the DECIMAL(38,12) moment arithmetic on one core otherwise), so the
    plan carries at most one extra RoundRobinPartitioning exchange —
    and none at all on inputs that already split (the 100 TB case)."""
    q = load_all()["q_lineitem_corr_matrix"].fn(spark, sf_dir)
    plan = _plan(q)
    n_exchange = plan.count("Exchange")
    n_spread = plan.count("RoundRobinPartitioning")
    assert n_exchange - n_spread == 1 and n_spread <= 1
    assert "partial_sum" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_label_propagation_round_no_window_no_cartesian(spark, sf_dir):
    """LPA rounds are joins + aggregates clustering on node keys — never
    a window over the edge set, never a cartesian."""
    q = load_all()["q_graph_label_propagation"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_runtime_bloom_filter_join_reduction(spark, sf_dir):
    """Spark's runtime bloom-filter injection: a selective filter on the
    orders side materializes a bloom_filter_agg whose might_contain
    probe prunes lineitem rows BEFORE the join shuffle — the in-engine
    semi-join reduction that, at 100 TB, avoids shuffling the ~97% of
    probe rows a 1-URGENT filter discards. The application-side scan
    threshold (default 10GB) triggers naturally at scale; locally it is
    zeroed to demonstrate the plan."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, sf_dir, "lineitem")
        o = read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_containment_join_no_cartesian_prefix_equijoin(spark, sf_dir):
    """containment_join: candidates come from the prefix-token equi-join
    — never a cartesian/nested-loop over document pairs."""
    q = load_all()["q_docs_containment_join"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_seasonal_backtest_broadcast_model_no_window(spark, sf_dir):
    """seasonal_baseline_backtest: the |keys|x168 model joins broadcast;
    no window function anywhere."""
    q = load_all()["q_events_seasonal_backtest"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_join_preflight_histograms_partial_agg(spark, sf_dir):
    """join_cardinality_preflight: both key histograms partial-aggregate
    map-side; top-k is TakeOrdered, not a global sort."""
    q = load_all()["q_lineitem_join_preflight"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pattern_no_error_no_cartesian(spark, sf_dir):
    """CEP pattern with negation: the time-banded match and the veto are
    user-keyed joins with interval filters — no cartesian products."""
    q = load_all()["q_events_pattern_no_error"].fn(spark, sf_dir)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan  # the negation is a real anti-join


def test_filterspec_predicates_push_to_scan(spark, sf_dir):
    """Config-compiled filters must reach the parquet scan exactly like
    hand-written predicates — the point of compiling to Catalyst columns
    instead of a Python row predicate."""
    q = load_all()["q_orders_filterspec"].fn(spark, sf_dir)
    plan = _plan(q)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "o_totalprice" in pushed and "IsNotNull" in pushed


def test_ngram_novelty_equijoin_no_text_shuffle(spark, sf_dir):
    """Novelty candidate membership must be a hash-keyed equi-join
    (never cartesian), and the exchanges must carry gram HASHES, not
    the text column."""
    from ups_crossref_etl_spark.operators.text_analysis import ngram_novelty

    d = read_table(spark, sf_dir, "documents").withColumn(
        "is_ref", F.col("doc_id") % 5 == 0
    )
    plan = _plan(ngram_novelty(d, "text", "doc_id", "is_ref", k=3))
    assert "CartesianProduct" not in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
        assert "text" not in m.group(1)


def test_kendall_tau_key_equijoin(spark, sf_dir):
    """The tau-b pairwise stage must join on the KEY (equi-join with the
    rn inequality as a post-filter), never a cartesian product."""
    from ups_crossref_etl_spark.operators.stats import kendall_tau

    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    plan = _plan(kendall_tau(e, "user_id", "ts", "value"))
    assert "CartesianProduct" not in plan


def test_cosine_histogram_stride_equijoin(spark, sf_dir):
    """Stride pairing must be an id equi-join per offset — an all-pairs
    product would be quadratic in the corpus."""
    from ups_crossref_etl_spark.operators.similarity import cosine_pair_histogram

    emb = read_table(spark, sf_dir, "embeddings")
    plan = _plan(cosine_pair_histogram(emb, "vec_id", "embedding"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_item_cosine_user_equijoin_no_cartesian(spark, sf_dir):
    """Item-item CF candidates come from a USER-keyed equi-join of the
    interaction table with itself — never an all-pairs product — and
    the item-degree joins attach by item key."""
    from ups_crossref_etl_spark.operators.recsys import item_cosine_similarity

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("u"), F.col("l_partkey").alias("i")
    )
    plan = _plan(item_cosine_similarity(li, "u", "i", top_n=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_adamic_adar_wedge_equijoin_no_cartesian(spark, sf_dir):
    """Link-prediction candidates come from the center-node wedge
    equi-join; the real-edge exclusion is an anti-join on the pair key."""
    from ups_crossref_etl_spark.operators.graph import adamic_adar

    li = read_table(spark, sf_dir, "lineitem")
    pe = li.select("l_orderkey", "l_partkey").distinct()
    edges = (
        pe.alias("a")
        .join(pe.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    plan = _plan(adamic_adar(edges, top_n=10))
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan  # top-n never a global sort


def test_diversity_shuffle_carries_counts_not_text(spark, sf_dir):
    """Token-diversity aggregates shuffle (group, token) count rows;
    the text column must not survive past the explode projection."""
    from ups_crossref_etl_spark.operators.text_analysis import (
        diversity_indices,
    )

    d = read_table(spark, sf_dir, "documents")
    df = diversity_indices(d, "source", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the exchange inputs carry grp/_t/_c projections only
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line
    assert "CartesianProduct" not in plan


def test_source_overlap_token_equijoin(spark, sf_dir):
    """Source-overlap pairs come from a token-keyed equi-join of the
    distinct (group, token) table with itself."""
    from ups_crossref_etl_spark.operators.text_analysis import (
        source_token_overlap,
    )

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(source_token_overlap(d, "source", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hashed_features_no_text_in_shuffle(spark, sf_dir):
    """The hashing-trick featurizer shuffles (id, bucket) pairs; text
    must be consumed map-side by the explode."""
    from ups_crossref_etl_spark.operators.features import hashed_features

    d = read_table(spark, sf_dir, "documents")
    df = hashed_features(d, "doc_id", "text", dim=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_script_profile_map_only(spark, sf_dir):
    """Script profiling is pure row-local regexp_count: no Exchange in
    the plan at all."""
    from ups_crossref_etl_spark.operators.text_analysis import script_profile

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(script_profile(d, "doc_id", "text"))
    assert "Exchange" not in plan


def test_flesch_readability_map_only(spark, sf_dir):
    from ups_crossref_etl_spark.operators.text_analysis import (
        flesch_readability,
    )

    d = read_table(spark, sf_dir, "documents")
    plan = _plan(flesch_readability(d, "doc_id", "text"))
    assert "Exchange" not in plan


def test_jarque_bera_no_window_two_keyed_aggregates(spark, sf_dir):
    """The JB screen must stay two map-side-combinable grouped
    aggregates joined by group — no Window, no cartesian."""
    from ups_crossref_etl_spark.operators.stats import jarque_bera

    e = read_table(spark, sf_dir, "events")
    plan = _plan(jarque_bera(e, "event_type", "value"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 2  # mean pass + moment pass


def test_silhouette_bounded_filter_reaches_both_scans(spark, sf_dir):
    """The bounded-slice contract is real only if the vec_id bound is
    PUSHED to both sides of the all-pairs join — otherwise the BNLJ
    build side would be the full corpus."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.similarity import (
        silhouette_bounded,
    )

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") <= 240
    )
    plan = _plan(silhouette_bounded(emb, "embedding", "label", "vec_id"))
    # every scan of the embeddings table carries the pushed bound
    assert plan.count("LessThanOrEqual(vec_id,240)") >= 2
    assert "CartesianProduct" not in plan


def test_durbin_watson_window_is_key_partitioned(spark, sf_dir):
    """DW's lag window must be partitioned by the key — a global
    per-row window here would be the r8 sorted-neighborhood mistake."""
    from ups_crossref_etl_spark.operators.timeseries import durbin_watson

    e = read_table(spark, sf_dir, "events")
    plan = _plan(durbin_watson(e, "user_id", "ts", "value"))
    assert "Window" in plan
    import re as _re

    # every Window node's partition spec is non-empty
    for frag in _re.findall(r"Arguments: \[lag[^\]]*\], \[([^\]]*)\]", plan):
        assert frag.strip(), "unpartitioned lag window in durbin_watson"


def test_gtest_margins_broadcast_not_shuffled(spark, sf_dir):
    """G-test margins are level-count-sized and must broadcast back to
    the cell table, never shuffle the cells again."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.operators.stats import g_test

    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", F.hour("ts").cast("string").alias("h"))
    )
    plan = _plan(g_test(e, "event_type", "h"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def _spy_checkpoint_plans(monkeypatch):
    """Capture the executed plan of every DataFrame at the moment it is
    localCheckpointed — the only way to pin shapes that live ABOVE a
    checkpoint truncation (the ranged-cumsum running-sum frame). Patches
    the CONCRETE classic DataFrame class: pyspark.sql.DataFrame is the
    abstract base in Spark 4 and instance methods resolve on the
    subclass, so patching the base intercepts nothing."""
    from pyspark.sql.classic.dataframe import DataFrame

    captured: list[str] = []
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **k):
        captured.append(
            self._jdf.queryExecution().executedPlan().toString()
        )
        return orig(self, *a, **k)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    return captured


def test_wilcoxon_midranks_no_single_partition_window(
    spark, sf_dir, monkeypatch
):
    """r10 verdict #2: wilcoxon's distinct-|d| midrank cumsum must run
    on the RANGE-partitioned primitive — on continuous paired metrics
    the micro-quantized differences are near-unique, so the old
    unpartitioned Window.orderBy degenerated to one partition exactly
    at corpus scale. Pin: the checkpointed running-sum frame windows
    over a rangepartitioning exchange, never a SinglePartition one."""
    from ups_crossref_etl_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    captured = _spy_checkpoint_plans(monkeypatch)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.select(
        F.col("value").alias("x"),
        (F.col("value") * 1.1 + (F.col("event_id") % 97) / 97.0).alias(
            "y"
        ),
    )
    wilcoxon_signed_rank(d, "x", "y").collect()
    win_plans = [p for p in captured if "Window" in p]
    assert win_plans, "expected the ranged-cumsum running-sum frame"
    for p in win_plans:
        assert "Exchange SinglePartition" not in p
        assert "Exchange rangepartitioning" in p


def test_mann_whitney_midranks_no_single_partition_window(
    spark, sf_dir, monkeypatch
):
    """Same pin as wilcoxon for the unpaired test's midrank pass."""
    from ups_crossref_etl_spark.operators.stats import mann_whitney

    captured = _spy_checkpoint_plans(monkeypatch)
    e = read_table(spark, sf_dir, "events")
    mann_whitney(e, "event_type", "value", "click", "view").collect()
    win_plans = [p for p in captured if "Window" in p]
    assert win_plans, "expected the ranged-cumsum running-sum frame"
    for p in win_plans:
        assert "Exchange SinglePartition" not in p
        assert "Exchange rangepartitioning" in p


def test_cox_stats_pass_driver_fast_path(spark, sf_dir, monkeypatch):
    """Round 12: with a BOUNDED distinct-time table (bucketed
    durations — the t %% 50 grid here) each Newton stats pass is ONE
    collect of the tiny per-time integer table (driver reduction), no
    ranged cumsum, no per-pass checkpoint: exactly one localCheckpoint
    (the prepare), >= 3 single-job collects (counts + one per pass),
    zero rangepartitioning or Window in any collect plan."""
    from pyspark.sql.classic.dataframe import DataFrame

    from ups_crossref_etl_spark.operators.survival import cox_ph

    ckpt_plans = _spy_checkpoint_plans(monkeypatch)
    collect_plans: list[str] = []
    orig_collect = DataFrame.collect

    def collect_spy(self, *a, **k):
        collect_plans.append(
            self._jdf.queryExecution().executedPlan().toString()
        )
        return orig_collect(self, *a, **k)

    monkeypatch.setattr(DataFrame, "collect", collect_spy)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("event_id") % 50).cast("double").alias("t"),
        (F.col("event_id") % 3 == 0).cast("int").alias("ev"),
        (F.col("value") / 100.0).alias("x"),
    )
    fit = cox_ph(d, "t", "ev", "x", iterations=2, tol=0.0)
    assert fit["n"] > 0
    assert len(ckpt_plans) == 1
    assert "Exchange rangepartitioning" in ckpt_plans[0]
    assert len(collect_plans) >= 3  # counts + 1 per stats pass
    for p in collect_plans:
        assert "Exchange rangepartitioning" not in p
        assert "Window" not in p, (
            "bounded-time stats pass should not need a window"
        )


def test_cox_stats_pass_prepartitioned(spark, sf_dir, monkeypatch):
    """r10 verdict #3/#7: a Cox Newton-step stats pass on a
    DATA-SIZED time table (the distributed path, forced here by
    zeroing the driver-path threshold) must not re-derive range
    boundaries or re-checkpoint — the subject table is
    range-partitioned ONCE per fit (the prelude's single
    localCheckpoint), and each pass is the prepartitioned cumsum
    (totals fold + reduction). Pin via spies: across a 3-pass fit there
    is EXACTLY ONE localCheckpoint (carrying the one range exchange),
    and no collect-time plan ever contains a rangepartitioning exchange
    or an unpartitioned window."""
    from pyspark.sql.classic.dataframe import DataFrame

    from ups_crossref_etl_spark.operators import survival
    from ups_crossref_etl_spark.operators.survival import cox_ph

    monkeypatch.setattr(survival, "_DRIVER_TIME_TABLE_MAX", 0)
    ckpt_plans = _spy_checkpoint_plans(monkeypatch)
    collect_plans: list[str] = []
    orig_collect = DataFrame.collect

    def collect_spy(self, *a, **k):
        collect_plans.append(
            self._jdf.queryExecution().executedPlan().toString()
        )
        return orig_collect(self, *a, **k)

    monkeypatch.setattr(DataFrame, "collect", collect_spy)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.select(
        (F.col("event_id") % 50).cast("double").alias("t"),
        (F.col("event_id") % 3 == 0).cast("int").alias("ev"),
        (F.col("value") / 100.0).alias("x"),
    )
    fit = cox_ph(d, "t", "ev", "x", iterations=2, tol=0.0)
    assert fit["n"] > 0
    assert len(ckpt_plans) == 1, (
        f"{len(ckpt_plans)} checkpoints in a cox fit — the per-pass "
        "checkpoint is back (boundaries must be frozen once in the "
        "prelude)"
    )
    assert "Exchange rangepartitioning" in ckpt_plans[0]
    assert len(collect_plans) >= 5  # counts + >=2 passes x (totals+reduce)
    for p in collect_plans:
        assert "Exchange rangepartitioning" not in p, (
            "a stats pass re-derived range boundaries"
        )
        # the running-sum Window must be fed by a keyed exchange, never
        # SinglePartition (the trailing 1-row reduce legitimately IS
        # single-partition, so scope the check to the Window's input)
        lines = p.splitlines()
        for i, ln in enumerate(lines):
            if "Window" in ln:
                nxt = next(
                    (x for x in lines[i + 1:] if "Exchange" in x), ""
                )
                assert "SinglePartition" not in nxt, (
                    "unpartitioned window in a cox stats pass"
                )


def test_brunner_munzel_midranks_no_single_partition_window(
    spark, sf_dir, monkeypatch
):
    """Round 12: Brunner-Munzel's combined+within-group midranks run
    on the same ranged-cumsum primitive as mann_whitney — the
    near-unique continuous metric regime must never window over a
    SinglePartition exchange."""
    from ups_crossref_etl_spark.operators.stats import brunner_munzel

    captured = _spy_checkpoint_plans(monkeypatch)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("g"),
        (
            F.col("value") + (F.col("event_id") % 9973) / 9973.0
        ).alias("v"),
    )
    brunner_munzel(d, "g", "v", "a", "b").collect()
    win_plans = [p for p in captured if "Window" in p]
    assert win_plans, "expected the ranged-cumsum running-sum frame"
    for p in win_plans:
        assert "Exchange SinglePartition" not in p
        assert "Exchange rangepartitioning" in p


def test_quade_block_range_ranks_no_single_partition_window(
    spark, sf_dir, monkeypatch
):
    """Round 12: Quade's across-blocks range midranks — blocks are
    corpus-sized and cell-mean ranges near-unique, so the rank pass
    must be the ranged primitive; the only legitimate non-ranged
    windows are the k-row within-block midrank frames (partitioned
    by block)."""
    from ups_crossref_etl_spark.operators.stats import quade_test

    captured = _spy_checkpoint_plans(monkeypatch)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d = e.select(
        F.col("user_id").cast("string").alias("bk"),
        F.when(F.hour("ts") < 8, F.lit("night"))
        .when(F.hour("ts") < 16, F.lit("day"))
        .otherwise(F.lit("evening"))
        .alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    quade_test(d, "bk", "t", "v", ["night", "day", "evening"]).collect()
    win_plans = [p for p in captured if "Window" in p]
    assert win_plans, "expected the ranged-cumsum running-sum frame"
    for p in win_plans:
        assert "Exchange SinglePartition" not in p


def test_schoenfeld_no_single_partition_window(
    spark, sf_dir, monkeypatch
):
    """Round 12: Schoenfeld's risk-set suffix sums ride the ranged
    prefix primitive (near-unique event times at corpus scale)."""
    from ups_crossref_etl_spark.operators.survival import (
        schoenfeld_residuals,
    )

    captured = _spy_checkpoint_plans(monkeypatch)
    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.select(
        (
            F.col("event_id").cast("double")
            + (F.col("event_id") % 97) / 97.0
        ).alias("t"),
        (F.col("event_id") % 3 == 0).cast("int").alias("ev"),
        (F.col("value") / 100.0).alias("x"),
    )
    schoenfeld_residuals(d, "t", "ev", "x", beta=0.1).collect()
    win_plans = [p for p in captured if "Window" in p]
    assert win_plans, "expected the ranged-cumsum running-sum frame"
    for p in win_plans:
        assert "Exchange SinglePartition" not in p
        assert "Exchange rangepartitioning" in p
