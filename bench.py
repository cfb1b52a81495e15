"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Timing = full plan execution to a count/collect action, per query, after a
JVM+session warmup query. Each query is executed twice and the MINIMUM wall
time is reported: still a genuine end-to-end wall number (no caching of
results between runs), but robust to a noisy neighbor stealing the box for
one of the runs — r3's driver artifact recorded 36.8s for a workload that
reruns at 16.8s quiet, purely from contention during the single timing.

Tier policy (round 7): the battery is split into a CORE tier — the round-5
30-query subset plus the bucketed-join demo pair, FROZEN for longitudinal
comparison across rounds — and an EXTENDED tier covering every later
headline addition. Both tiers run every invocation; the tiers differ only
in how the results are REPORTED, sized to the driver's 2000-char stdout
tail capture (BENCH_r06.json parsed as null because one ~5KB JSON line
outgrew that window):

1. first, one large JSON line with EVERY per-query timing (for logs), also
   written to ``BENCH_LOCAL.json`` in the repo root so the full detail is
   committable per round (as ``BENCH_LOCAL_r{N}.json``);
2. last, one COMPACT (<1500 byte) JSON line — the one the driver's tail
   capture is guaranteed to retain whole — with the totals
   (``value`` = all-query total, ``core_total`` = frozen-tier total) and
   the per-query map restricted to the core tier.

Both lines carry ``sentinel_pre``/``sentinel_post`` (round 8): a fixed
CPU-bound probe timed before and after the battery, so a run captured
under neighbor contention (BENCH_r07's core tier read ~2x its quiet
re-run) is self-evident from the artifact — quiet baseline ~1.2 s; a
sentinel at 2-3x that means the per-query numbers are inflated by load.

Round 13: both lines also carry ``shuffle_sentinel_pre/post`` — a fixed
SHUFFLE-bound probe (hash repartition of 20M ids) that sees the I/O
contention mode the CPU sentinel is blind to: the r13 capture ran with a
FASTER CPU sentinel than r12's quiet baseline while shuffle-heavy queries
inflated ~1.15×, i.e. the box's virtualized disk was the contended
resource. Quiet baseline ~1-2 s.

Round 10 (r9 verdict #3/#4): both lines also carry ``core_runs`` (three
single-execution pass totals of the frozen tier), ``core_total_median``
(their median — the longitudinal anchor, immune to one noisy pass) and
``effective_cores`` (measured 32-task speedup of a fixed CPU kernel, so
box-state drift is quantified IN the artifact); the full line adds
``stream_metrics`` (micro-batch count / input rows / final state rows /
per-batch ms for every ``q_stream_*`` query, captured synchronously from
the last run's ``recentProgress``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ups_crossref_etl_spark.plans.registry import load_all
from ups_crossref_etl_spark.session import get_spark

# CORE tier: the round-5 headline set, frozen — do not append here (new
# queries go to EXTENDED) so core_total stays comparable across rounds.
CORE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_orders_per_segment",
    "q_sorted_set_agg_priorities",
    "q_count_distinct_parts_per_supplier",
    "q_events_tumbling_5min",
    "q_events_sessionize_30min",
    "q_docs_exact_dup_groups",
    "q_docs_token_counts",
    "q_docs_minhash_near_dups",
    "q_docs_cleaning_pipeline",
    "q_emb_bruteforce_topk",
    "q_events_asof_join",
    # training-data pipeline ops (round 3): hash-assigned split/pack/chunk
    "q_docs_split_assign",
    "q_docs_pack_sequences",
    "q_docs_chunk_spans",
    # round 4: corpus vocabulary (wordcount-at-scale shape, full table) and
    # the repeated-passage audit (full-table 10-gram groupBy); the
    # decontamination probe is covered by tools/scale_probe.py instead
    # (its gate query is sample-bounded for oracle tractability)
    "q_docs_vocab_top200",
    "q_docs_repeated_ngrams",
    # round 4 (late): lexical retrieval, LM-based quality scoring, and the
    # SCD2 history rebuild — the three new ops with a wide edge to watch
    "q_docs_bm25_topk",
    "q_docs_unigram_nll",
    "q_events_scd2_intervals",
    # round 4 (batches 2-3): the new ops with a wide edge — blocked
    # linkage (token self-join), iterative PageRank (per-iter shuffles),
    # funnel (chained key joins), CDC merge (batch window + anti-join),
    # and grid resample (explode + fill window)
    "q_part_fuzzy_pairs",
    "q_graph_pagerank",
    "q_events_funnel",
    "q_customer_cdc_apply",
    "q_events_resample_1h",
    # round 4 (batch 5): the single-window anomaly scan — the shape where
    # a naive self-join formulation would explode at scale
    "q_events_zscore_outliers",
    # round 5: the two new corpus-sized ops — span removal (gram-hash
    # shuffle + position anti-join rebuild) and bigram-LM scoring
    "q_docs_remove_common_spans",
    "q_docs_bigram_nll",
]

# EXTENDED tier: every post-r5 addition — timed every run, reported in the
# full line + BENCH_LOCAL.json, excluded from the compact driver line.
EXTENDED = [
    # round 5 ops previously correctness-only — give them timing history
    "q_docs_profile_columns",
    "q_events_value_histogram",
    "q_events_cohort_retention",
    "q_graph_bounded_walks",
    "q_stream_interval_join",
    "q_emb_mmr_diverse_topk",
    "q_docs_quality_keeper",
    # round 6: corpus BPE encode (train + map-only apply), SemDeDup
    # (k-means + cluster-blocked pairs + CC), the TPC-H completions with
    # a wide edge (q9 composite-key join chain, q20 semi-join chain),
    # and the distributed prefix-max late-arrival audit
    "q_docs_bpe_encode",
    "q_emb_semantic_dedup",
    "q9_product_type_profit",
    "q20_potential_promotion",
    "q_events_late_arrivals",
    # round 6 (batch 2): the new ops with a wide edge — NB classifier
    # (train + score joins over the token relation), real-BMP decode +
    # banded dHash near-dup, incremental MV refresh (delta agg + full
    # outer merge), and the hot/cold hybrid skew join
    "q_docs_nb_langid",
    "q_media_image_neardup",
    "q_events_mv_merge",
    "q_orders_hybrid_skew_join",
    "q_docs_tfidf_knn",
    # round 6 (batch 3): sketch family + JL projection
    "q_docs_bloom_decontam",
    "q_events_cms_user_freq",
    "q_events_hll_rollup_bound",
    "q_emb_rp_project",
    # round 6 (batch 4): smoothing, whitening, hybrid retrieval, curation,
    # coverage, sequence stats, evaluation
    "q_events_ewma",
    "q_emb_standardize",
    "q_docs_rrf_hybrid",
    "q_docs_nucleus_select",
    "q_events_interval_union",
    "q_events_transition_matrix",
    "q_docs_auc_lang_by_length",
    "q_orders_table_digest",
    "q_events_mean_shift",
    "q_emb_rp_recall_bound",
    "q_events_ab_readout",
    "q_docs_calibration_bins",
    "q_docs_quantile_normalize",
    "q_docs_quantile_normalize_approx_bound",
    "q_media_wav_spectrum",
    "q_stream_trending_topk",
    # round 6 (batch 5): data selection, phrase mining, keyword tagging,
    # contrastive hard negatives (IVF operational path), k-core peel
    "q_docs_dsir_select",
    "q_docs_pmi_collocations",
    "q_docs_top_keywords",
    "q_emb_hard_negatives_ivf",
    "q_graph_kcore",
    # round 6 (batch 6): table versioning, leakage-safe splitting,
    # unigram-LM tokenizer inference
    "q_docs_snapshot_diff",
    "q_docs_leakage_safe_split",
    "q_docs_unigram_segment",
    "q_stream_cdc_apply",
    "q_lineitem_corr_matrix",
    "q_events_mad_outliers",
    "q_customer_loo_encode",
    "q_graph_label_propagation",
    "q_docs_split_leakage_audit",
    "q_events_seasonal_backtest",
    "q_lineitem_join_preflight",
    "q_events_psi_drift",
    "q_docs_containment_join",
    "q_docs_unigram_token_counts",
    "q_docs_shard_manifest",
    "q_emb_ranking_metrics",
    "q_events_type_hourly_corr",
    "q_part_skyline",
    "q_graph_personalized_pagerank",
    "q_events_scd2_lookup",
    "q_docs_max_coverage_select",
    "q_events_pattern_no_error",
    "q_orders_quarantine",
    "q_events_markov_backtest",
    "q_customer_k_anonymity",
    "q_events_theil_sen",
    "q_media_audio_match",
    "q_orders_filterspec",
    # round 7: the Theil-Sen heavy-key cap (stride subsample before the
    # per-key quadratic) and the shard-export → compact → manifest
    # round-trip (the sink path, timed end to end including the writes)
    "q_events_theil_sen_capped",
    "q_docs_shards_compaction_identity",
    # round 7 (wave 2): tokenizer #3 (WordPiece corpus accounting), the
    # KLL sketch + Poisson bootstrap one-pass statistics, FastSS edit
    # join, GSP 3-sequences (chained range windows), winnowing overlap,
    # Apriori triples, Kneser-Ney scoring, TextRank (graph compose),
    # session-path mining, PCA moments pass, attribution windows,
    # deterministic negative sampling
    "q_docs_wordpiece_token_counts",
    "q_events_kll_quantiles_bound",
    "q_words_edit_distance_join",
    "q_events_poisson_bootstrap_ci",
    "q_events_seq3_support",
    "q_docs_winnow_overlap_pairs",
    "q_basket_frequent_triples",
    "q_docs_kneser_ney_nll",
    "q_docs_textrank_keywords",
    "q_events_top_session_paths",
    "q_emb_pca_bound",
    "q_events_attribution",
    "q_emb_negative_sampling",
    # round 7 (wave 3): rank statistics (tau-b pairwise self-join, RBO),
    # concentration/uncertainty (Gini window pass, jackknife, md5
    # permutation replicates), scorer lift deciles, n-gram novelty
    # (lead-window gram scan + hash-keyed anti-membership), cosine
    # stride-pair histogram, seasonal decomposition
    "q_events_kendall_tau",
    "q_orders_gini_by_nation",
    "q_docs_rbo_rankings",
    "q_lineitem_jackknife_ratio",
    "q_events_permutation_test",
    "q_emb_lift_deciles",
    "q_docs_ngram_novelty",
    "q_emb_cosine_histogram",
    "q_events_seasonal_decompose",
    # round 7 (wave 4): stateless decayed scoring, contingency
    # association (MI/NMI/chi2/V), volume-weighted median
    "q_events_decayed_user_score",
    "q_events_type_hour_association",
    "q_lineitem_weighted_median_price",
    # round 7 (wave 5): PAVA-as-minimax isotonic calibration, exact AP,
    # Fisher separability audit, Nelson-Aalen hazard
    "q_emb_isotonic_calibration",
    "q_emb_average_precision",
    "q_emb_separability",
    "q_events_nelson_aalen",
    # round 7 (wave 6): vocab richness spectrum, QQ decile table,
    # inter-event burstiness fingerprint
    "q_docs_vocab_richness",
    "q_events_qq_click_view",
    "q_events_user_burstiness",
    # round 7 (wave 7): sorted-neighborhood ER blocking, seeded-Laplace
    # DP release simulation, Procrustes embedding alignment
    "q_part_sorted_neighborhood",
    "q_events_dp_noisy_counts",
    "q_emb_procrustes_bound",
    # round 7 (wave 8): DiD readout, Mann-Whitney U, conformal intervals
    "q_events_did_readout",
    "q_events_mann_whitney",
    "q_events_conformal_interval",
    # round 7 (wave 9): interleaved epoch order, JSONL export round-trip
    "q_docs_training_order",
    "q_docs_jsonl_roundtrip",
    # round 7 (wave 10): HITS nano-quantized power iteration, global
    # clustering coefficient
    "q_graph_hits",
    "q_graph_clustering_coefficient",
    # round 7 (wave 11): generic grouped OLS (elasticity), zlib
    # compressibility contrast
    "q_part_price_elasticity",
    "q_docs_compression_contrast",
    # round 7 (wave 12): trimmed mean, per-key KS screen + BH FDR
    "q_events_trimmed_mean",
    "q_events_user_drift_fdr",
    # round 7 (waves 13-18): link prediction wedge join, rater kappa,
    # modularity, langid report, readability, ECE, WOE/IV, blocking
    # audit, ANOVA, diversity, RMST, funnel latency, item-item cosine,
    # source overlap, grouped mode, TWAP, script profile,
    # Davies-Bouldin, winsorized mean, rate ratio, sequence gaps
    "q_graph_adamic_adar",
    "q_docs_rater_kappa",
    "q_graph_modularity",
    "q_docs_lang_report",
    "q_docs_readability",
    "q_docs_ece",
    "q_orders_woe_iv",
    "q_part_blocking_quality",
    "q_events_anova_value_by_type",
    "q_docs_diversity",
    "q_events_rmst",
    "q_events_funnel_latency",
    "q_part_item_cosine",
    "q_docs_source_overlap",
    "q_orders_mode_priority",
    "q_events_twap",
    "q_docs_script_profile",
    "q_emb_davies_bouldin",
    "q_lineitem_winsorized_price",
    "q_events_error_rate_ratio",
    "q_orders_sequence_gaps",
    # round 7 (waves 19-21): Welch t, McNemar, hashed features, ORC
    # round-trip (timed end to end including the write), recursive
    # graph primitives (bounded-subgraph contract: cost is
    # sf-independent by construction), label spreading
    "q_events_welch_value",
    "q_docs_rater_mcnemar",
    "q_docs_hashed_features",
    "q_docs_orc_roundtrip",
    "q_graph_transitive_closure",
    "q_graph_scc",
    "q_graph_spread_labels",
    # round 8: the Adamic-Adar degree-cap contract pair (bounded-subgraph
    # exact twin + top-50 cap-agreement bound) — q_graph_adamic_adar
    # itself is now the CAPPED operational path
    "q_graph_adamic_adar_exact",
    "q_graph_adamic_adar_cap_agreement",
    # round 9: sequential stats (per-key windows), the wedge-family
    # rectangle census (capped path), distance-centrality gates, the
    # Jaro-Winkler pandas_udf over banded sorted-neighborhood pairs,
    # and the two iterative-training bound gates (ALS, IRLS logistic)
    "q_events_ljung_box",
    "q_events_page_hinkley",
    "q_events_best_sse_split",
    "q_events_sprt",
    "q_part_jw_topk",
    "q_part_als_bound",
    "q_docs_quality_classifier_bound",
    "q_graph_rectangles",
    "q_graph_eccentricity",
    "q_graph_tree_betweenness",
    # round 10: capped-center transitivity (the scale fix for the
    # uncapped clustering_coefficient wedge path) + its exact twin,
    # the W1/KS/CvM drift pass, and the outer watermarked stream join
    "q_graph_transitivity",
    "q_graph_transitivity_exact",
    "q_events_wasserstein_drift",
    "q_stream_interval_join_outer",
    "q_events_logrank",
    "q_graph_assortativity",
    "q_graph_rich_club",
    "q_orders_eb_shrunk_means",
    # round 10 second wave: classical inference (Jarque-Bera,
    # Brown-Forsythe, Fisher exact on a bounded 2x2, CMH, SRM),
    # cluster validity (Calinski-Harabasz; the bounded-exact
    # silhouette), the Misra-Gries one-pass bound contract, and PACF
    # via Durbin-Levinson on the ACF machinery
    "q_events_jarque_bera",
    "q_events_brown_forsythe",
    "q_events_fisher_exact",
    "q_events_cmh",
    "q_events_srm",
    "q_emb_calinski_harabasz",
    "q_emb_silhouette_bounded",
    "q_events_misra_gries_bound",
    "q_events_pacf",
    "q_events_wilcoxon",
    "q_events_runs_test",
    "q_events_durbin_watson",
    "q_events_friedman",
    "q_events_gtest",
    "q_emb_knn_loo",
    "q_events_cox_bound",
    # round 11
    "q_docs_tfidf_knn_exact",
    "q_docs_tfidf_knn_cap_agreement",
    "q_events_cox_multi_bound",
    "q_lineitem_cronbach_alpha",
    "q_lineitem_partial_corr",
    "q_events_grubbs",
    "q_events_cochran_q",
    "q_events_page_trend",
    "q_events_bh_adjust",
    "q_events_greenwood",
    "q_events_cox_baseline",
    "q_docs_zipf_fit",
    "q_docs_token_dispersion",
    "q_events_cohens_d",
    "q_events_concordance",
    "q_docs_keyness",
    "q_lineitem_benford",
    "q_events_jonckheere",
    # round 12
    "q_events_schoenfeld",
    "q_events_competing_risks",
    "q_docs_heaps_fit",
    "q_docs_log_odds_keyness",
    "q_events_brunner_munzel",
    "q_events_quade",
    "q_docs_yule_k",
    "q_docs_burrows_delta",
    "q_events_hurst",
    "q_events_ansari",
    "q_events_mood",
    "q_lineitem_bartlett",
    "q_docs_fleiss_kappa",
    "q_docs_krippendorff",
    "q_events_gumbel",
    # round 13
    "q_docs_long_repeated_spans",
]


def _bucketed_join_demo(spark, sf_dir: str, times: dict[str, float]) -> None:
    """The join-without-exchange number the 100 TB story rests on: the same
    customer⋈orders agg measured (a) unbucketed — SortMergeJoin with both
    sides exchanged — and (b) from bucketed tables — SortMergeJoin with ZERO
    exchanges (plan asserted in tests/test_plans.py::
    test_bucketed_join_skips_shuffle). Broadcast is disabled for the pair:
    at cluster scale neither fact side fits in a broadcast. The bucketed
    write itself is untimed setup — at scale it is paid once at ingest and
    amortized over every downstream join."""
    from pyspark.sql import functions as F

    from ups_crossref_etl_spark.plans.money import DEC
    from ups_crossref_etl_spark.sources.lake import read_table
    from ups_crossref_etl_spark.sources.sinks import write_bucketed

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")

    def agg(cust, orders):
        return (
            cust.join(orders, "c_custkey")
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2).alias("total"),
            )
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        times["q_join_unbucketed_smj"] = _best_of(lambda: agg(c, o).collect())
        write_bucketed(c, "bench_b_customer", ["c_custkey"], num_buckets=16)
        write_bucketed(o, "bench_b_orders", ["c_custkey"], num_buckets=16)
        times["q_join_bucketed_noshuffle"] = _best_of(
            lambda: agg(
                spark.table("bench_b_customer"), spark.table("bench_b_orders")
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bench_b_customer")
        spark.sql("DROP TABLE IF EXISTS bench_b_orders")


def _best_of(run, n: int = 2) -> float:
    """Min wall time over ``n`` full executions (plan + execute each time)."""
    best = None
    for _ in range(n):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def _effective_cores(spark, cpus: int = 32) -> float:
    """Measured parallel speedup of a fixed CPU-bound kernel: time one
    task doing W work, then ``cpus`` tasks doing W EACH; effective cores
    = cpus * t1 / tN. Recorded in the artifact (r9 verdict #4) so the
    longitudinal core-tier comparison can normalize for box state — the
    r9 number (26.9 of 32) was measured ad hoc and lived only in
    SCALE.md prose."""
    work = 150_000_000

    def run(ntasks: int) -> float:
        # id % work keeps the product under 2^63 for any ntasks (ANSI
        # mode: a bigint overflow is an ERROR, not a wrap)
        t0 = time.time()
        spark.range(0, work * ntasks, 1, ntasks).selectExpr(
            f"sum(id % {work} * 2654435761 % 1000000007) AS s"
        ).collect()
        return time.time() - t0

    t1 = min(run(1) for _ in range(2))
    tn = min(run(cpus) for _ in range(2))
    return round(cpus * t1 / tn, 1) if tn > 0 else float(cpus)


def _sentinel(spark) -> float:
    """Contention sentinel: a fixed CPU-bound probe (sum of a constant
    arithmetic map over 400M ids across 32 tasks) whose quiet-box time
    is stable (~1.2 s here). Timed before AND after the battery and
    recorded in the JSON so a contention-inflated run is self-evident:
    BENCH_r07's committed core tier read ~2x its quiet re-run (q1 10.2 s
    vs 2.9 s) with no way to tell from the artifact alone. If
    sentinel_pre/post markedly exceed the committed quiet baseline, the
    per-query numbers are inflated by neighbors, not regressions."""
    return _best_of(
        lambda: spark.range(0, 400_000_000, 1, 32)
        .selectExpr("sum(id * 2654435761 % 1000000007) AS s")
        .collect(),
        n=1,
    )


def _shuffle_sentinel(spark) -> float:
    """I/O contention sentinel (round 13): a fixed SHUFFLE-bound probe —
    20M ids hash-repartitioned across 32 partitions then reduced —
    timed like ``_sentinel``. The r13 capture showed the failure mode
    the CPU sentinel cannot see: CPU sentinel FASTER than the prior
    quiet capture while shuffle-heavy queries ran ~1.15× slower
    (virtualized-disk contention inflates shuffle-file writes, not
    arithmetic). Quiet-box reading here: ~1-2 s; a capture whose
    shuffle sentinel is 2×+ its committed baseline has I/O-inflated
    per-query numbers even if the CPU sentinel is quiet."""
    from pyspark.sql import functions as F

    return _best_of(
        lambda: spark.range(0, 20_000_000, 1, 32)
        .repartition(32, (F.col("id") % 997).cast("int"))
        .selectExpr("sum(id) AS s")
        .collect(),
        n=1,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench")
    specs = load_all()

    # warmup: JVM/codegen/parquet-footer caches
    specs["q1_pricing_summary"].fn(spark, sf_dir).count()
    sentinel_pre = _sentinel(spark)
    shuffle_sentinel_pre = _shuffle_sentinel(spark)

    # One broken query must never zero the whole artifact (BENCH_r04 was
    # rc=1/no-data because a single NTZ cast threw): record the error per
    # query, keep timing the rest, and still print the JSON line.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    stream_metrics: dict[str, dict] = {}
    from ups_crossref_etl_spark.plans import streaming_queries as _sq

    for name in CORE + EXTENDED:
        try:
            if name.startswith("q_stream_"):
                _sq.reset_last_progress()
            times[name] = _best_of(lambda: specs[name].fn(spark, sf_dir).collect())
            if name.startswith("q_stream_"):
                # micro-batch/state ledger of the last run (r9 verdict #3:
                # q_stream_interval_join moved 8->19 s with untouched code
                # and the artifact couldn't say whether batching changed)
                m = _sq.summarize_last_progress()
                if m:
                    stream_metrics[name] = m
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex).split("\n")[0][:200]

    # Core-tier stability passes (r9 verdict #4): the frozen tier moved
    # 35.4 -> 71.3 -> 35.1 -> 41.1 s across rounds mostly on box state.
    # Run the frozen tier three MORE times (single execution per query,
    # not best-of-2, so the three pass totals are like-for-like) and
    # report the MEDIAN pass total — one noisy pass can't move the
    # longitudinal anchor, and the spread across the three is itself
    # evidence of box state in the artifact.
    core_runs: list[float] = []
    for _ in range(3):
        t0 = time.time()
        for name in CORE:
            if name in errors:
                continue
            try:
                specs[name].fn(spark, sf_dir).collect()
            except Exception:  # noqa: BLE001
                pass
        core_runs.append(round(time.time() - t0, 3))
    core_total_median = sorted(core_runs)[1]

    try:
        _bucketed_join_demo(spark, sf_dir, times)
    except Exception as ex:  # noqa: BLE001
        errors["q_join_bucketed_demo"] = str(ex).split("\n")[0][:200]

    sentinel_post = _sentinel(spark)
    shuffle_sentinel_post = _shuffle_sentinel(spark)
    effective_cores = _effective_cores(spark)

    core_names = set(CORE) | {"q_join_unbucketed_smj", "q_join_bucketed_noshuffle"}
    core_times = {n: times[n] for n in times if n in core_names}
    full = {
        "metric": "headline_queries_full",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "core_runs": core_runs,
        "core_total_median": core_total_median,
        "effective_cores": effective_cores,
        "sentinel_pre": sentinel_pre,
        "sentinel_post": sentinel_post,
        "shuffle_sentinel_pre": shuffle_sentinel_pre,
        "shuffle_sentinel_post": shuffle_sentinel_post,
        "sf": sf,
        "cpus": cpus,
    }
    if stream_metrics:
        full["stream_metrics"] = stream_metrics
    if errors:
        full["errors"] = errors
    # full detail: one (large) log line + a committable file — NOT the
    # last line, since the driver's tail capture only keeps ~2000 chars.
    # r14 (r13 verdict #2): a non-default core count writes its OWN file
    # (BENCH_LOCAL_c{N}.json) so the driver's 8-core scaling pass no
    # longer clobbers the 32-core full per-query detail, and both JSON
    # lines carry ``cpus`` so any captured artifact states its core count.
    print(json.dumps(full))
    local_name = "BENCH_LOCAL.json" if cpus == 32 else f"BENCH_LOCAL_c{cpus}.json"
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               local_name), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass

    compact = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in core_times.items()},
        "core_total": round(sum(core_times.values()), 3),
        "core_runs": core_runs,
        "core_total_median": core_total_median,
        "effective_cores": effective_cores,
        "n_queries": len(times),
        "n_errors": len(errors),
        "sentinel_pre": sentinel_pre,
        "sentinel_post": sentinel_post,
        "shuffle_sentinel_pre": shuffle_sentinel_pre,
        "shuffle_sentinel_post": shuffle_sentinel_post,
        "sf": sf,
        "cpus": cpus,
    }
    line = json.dumps(compact)
    assert len(line) < 1500, f"compact bench line too long ({len(line)}B)"
    print(line)


if __name__ == "__main__":
    main()
