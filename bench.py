"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line (last on stdout, so head OR tail captures
both end on it):
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}
and also writes the full result (plus per-query spreads) to
bench_out.json so a truncated stdout capture can never lose the numbers.
The same per-query map is additionally re-emitted as short
``headline_queries_chunk`` lines (50 queries each) before the final
headline line so a bounded tail capture still recovers per-query numbers
whole-line by whole-line (r15; measurement-output fix, not a timing
change).

Queries execute fully (noop sink — no driver collect) after one warm-up
job that absorbs JVM/executor startup.

Methodology: N_RUNS (≥4) INTERLEAVED rounds — round 1 runs every query
once, then round 2, … — and the reported per-query number is the MEDIAN
across rounds.  Interleaving spreads slow environment drift (page cache,
JIT, GC ramp) evenly across queries instead of attributing it to whoever
ran last; the median discards the one cold first-round outlier
(plan/codegen) without needing a separate warm-up pass.  Round-over-round
best-of-two proved unjudgeable: identical code drifted 1.7-2.4× on
seconds-scale queries between rounds 2 and 3.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_filter",
    "q03_customer_revenue",
    "q04_region_stats",
    "q07_topk_per_group",
    "q11_distinct_agg",
    "q16_json_extract",
    "q19_rolling_avg",
    "q22_resample_count",
    "q23_resample_time",
    "q24_asof_join",
    "q25_correlation",
    "q30_minhash_near_dedup",
    "q31_simsearch_bruteforce",
    "q37_simhash",
    "q38_ngram_jaccard",
    "q39_embedding_neardup",
    "q40_simsearch_ivf",
    "q43_tfidf_top_terms",
    "q45_session_windows",
    "q48_grouping_sets",
    "q51_crossover_backtest",
    "q59_pivot",
    "q60_range_join",
    "q61_embedding_centroids",
    "q62_dedup_clusters",
    "q63_stratified_sample",
    "q64_rolling_median",
    "q66_corpus_pipeline",
    "q67_unpivot",
    "q68_gap_fill",
    "q70_drawdown",
    "q71_atr",
    "q73_batch_sessionize",
    "q76_kmeans",
    "q77_calendar_densify",
    "q78_anomaly_zscore",
    "q79_rolling_beta",
    "q80_repetition_ratio",
    "q81_twap",
    "q82_profile",
    "q83_star_join",
    "q84_time_range_frame",
    "q94_interval_union",
    "q100_dashboard",
    "q109_segment_dedup",
    "q111_decontaminate",
    "q124_fuzzy_join",
    "q125_ngram_jaccard_capped",
    "q126_cosine_pairs_blas",
    "q130_pattern_match",
    "q131_pii_redact",
    "q132_semdedup",
    "q133_lm_quality",
    "q134_cms_heavy_hitters",
    "q136_zorder_layout",
    "q137_data_quality",
    "q138_random_projection",
    "q139_chunk_documents",
    "q140_cohort_retention",
    "q141_funnel",
    "q142_simsearch_multiprobe",
    "q127_mix_plan",
    "q128_shard_export",
    "q129_pack_sequences",
    "q143_bm25_topk",
    "q144_pmi_collocations",
    "q145_vocab_drift",
    "q146_pagerank",
    "q147_scd2",
    "q148_pagerank_weighted",
    "q149_m4_downsample",
    "q150_pit_join",
    "q151_hll_distinct",
    "q152_cdc_merge",
    "q153_triangle_count",
    "q154_hll_grouped",
    "q155_winnow_fingerprints",
    "q156_winnow_match_pairs",
    "q157_quantile_binning",
    "q158_snapshot_diff",
    "q159_unicode_normalize",
    "q160_length_bucketed_shards",
    "q161_bpe_train",
    "q162_bpe_token_counts",
    "q163_bloom_prejoin",
    "q164_incremental_rollup",
    "q165_leakage_safe_split",
    "q167_entity_resolution",
    "q168_interval_coverage",
    "q169_zone_pruning",
    "q170_compaction_plan",
    "q171_skyline",
    "q172_temperature_mix",
    "q173_hll_intersection",
    "q174_incremental_dedup",
    "q175_attribution",
    "q176_target_encoding",
    "q177_session_paths",
    "q178_grid_clusters",
    "q179_streaming_hll",
    "q180_cusum",
    "q181_macd",
    "q182_theil_sen",
    "q183_psi",
    "q184_ks_drift",
    "q185_acf",
    "q186_seasonal_decompose",
    "q187_rfm",
    "q188_sax",
    "q189_keyness",
    "q190_kcore",
    "q191_feature_hash",
    "q192_robust_scale",
    "q193_rrf_fusion",
    "q194_mad_outliers",
    "q195_association_rules",
    "q196_woe_iv",
    "q197_ddsketch",
    "q198_cramers_v",
    "q199_weighted_median",
    "q200_pq_codes",
    "q201_bootstrap_ci",
    "q202_trimmed_mean",
    "q203_benford",
    "q204_decayed_topk",
    "q205_assortativity",
    "q206_kaplan_meier",
    "q207_readability",
    "q208_abc_analysis",
    "q209_diff_in_diff",
    "q210_mase",
    "q211_negative_sampling",
    "q212_kanon_rollup",
    "q213_calibration",
    "q214_gains_curve",
    "q215_quantile_normalize",
    "q216_cross_correlation",
    "q217_geo_radius_join",
    "q218_ips_off_policy",
    "q219_nearest_facility",
    "q220_interpolate_gaps",
    "q221_weighted_p90",
    "q222_spearman",
    "q223_ols_closed_form",
    "q224_segment_overlap",
    "q225_geo_equirectangular",
    "q226_geo_expanding_rings",
    "q227_ols_three_regressors",
    "q228_group_ranks",
    "q229_mann_whitney",
    "q230_kruskal_wallis",
    "q231_brown_forsythe",
    "q232_welch_t",
    # r10 (VERDICT r9 ask #4): the last >1s batch queries previously
    # unbenched — every multi-second batch query now has a recorded
    # median (remaining unbenched = sub-second primitives + streaming)
    "q114_keyed_resample",
    "q119_dedup_clusters_star",
    "q121_hierarchical_rollup",
    "q233_image_dhash_neardup",
    "q234_compare_groups",
    "q235_cuped",
    "q236_audio_fingerprint_neardup",
    "q237_srm_check",
    "q238_ratio_metric_delta",
    "q239_image_dedup_clusters",
    "q240_containment_pairs",
    "q241_cohens_kappa",
    "q242_bradley_terry",
    "q243_fleiss_kappa",
    "q244_retrieval_metrics",
    "q245_roc_auc",
    "q246_js_divergence",
    "q247_chi_square",
    "q248_krippendorff_alpha",
    "q249_mutual_information",
    "q250_fdr_bh",
    "q251_mantel_haenszel",
    "q252_nelson_aalen",
    "q253_kendall_tau",
    "q254_isotonic_calibration",
    "q255_wasserstein",
    "q256_zipf_fit",
    "q257_markov_stationary",
    "q258_label_propagation",
    "q259_brier_decomposition",
    "q260_conformal_quantile",
    "q261_poisson_rate_ratio",
    "q262_mcnemar",
    "q263_ngram_diversity",
    "q264_cochran_q",
    "q265_good_turing",
    "q266_permutation_test",
    "q267_friedman",
    "q268_mann_kendall",
    "q269_changepoint",
    "q270_dunn_posthoc",
    "q271_log_rank",
    "q272_link_prediction",
    "q273_cvm",
    "q274_drift_report",
    "q275_link_prediction_fenced",
    "q276_ngram_diversity_hll",
    "q277_bfs_distances",
    "q278_anderson_darling",
    "q279_jarque_bera",
    "q280_bartlett_levene",
    "q281_cliffs_delta",
    "q282_wilson_proportions",
    "q283_hill_tail",
    "q284_stochastic_oscillator",
    "q285_msprt",
    "q286_energy_distance",
    "q287_yuen_t",
    "q288_knn_outlier",
    "q289_km_greenwood",
    "q290_page_hinkley",
    "q291_seasonal_strength",
    "q292_knn_outlier_fenced",
    "q295_durbin_watson",
    "q296_cooks_distance",
    "q297_ljung_box",
    "q298_breusch_pagan",
    "q299_pacf",
    "q300_kpss",
    "q301_semdedup_fenced",
    "q304_arch_lm",
    "q305_granger",
    "q306_hurst",
    "q307_variance_ratio",
    "q308_bar_volatility",
    "q309_amihud",
    "q310_engle_granger",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry
    from btc_usdt_etl_pipeline_spark.session import build_session

    spark = build_session("bench", extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # Warm-up: touch every input table once (JVM, codegen, FS caches).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        elapsed = time.time() - t0
        # Outside the timed region: drop any cached blocks a query may have
        # left behind so later queries start from a clean cache.
        spark.catalog.clearCache()
        return elapsed

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    names = [n for n in HEADLINE if n in qs]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_runs):
        for name in names:
            samples[name].append(run_once(name))

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {
        n: round(max(s) - min(s), 3) for n, s in samples.items()
    }
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
        "aggregation": "median",
    }
    # Truncation-proofing: the round-4 driver capture clipped the single
    # giant stdout line mid-JSON; the round-5/6 captures kept only a
    # 2,000-char TAIL of stdout, clipping the front-loaded "value" key off
    # the ~2.2k-char payload line.  Defenses:
    #   1. the full result (payload + spread) is written to bench_out.json
    #      next to this script, so the numbers survive any stdout mangling;
    #   2. the full payload line prints FIRST, then one final TINY line
    #      (~70 chars, no queries map) that any tail capture keeps whole
    #      and that parses as a complete headline record on its own;
    #   3. the spread map stays off stdout entirely (bench_out.json only).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
        "w",
    ) as f:
        json.dump({**payload, "spread": spread}, f, indent=1)
    print(json.dumps(payload), flush=True)
    # r15 (VERDICT r14 ask #6): the single payload line above outgrew the
    # driver's tail capture (~231 queries ≈ 6 KB), so PERF_r14 parsed no
    # per-query map (per_query: {}, geomean null).  Measurement-output fix
    # only — no timing methodology change: re-emit the same per-query map
    # as SHORT self-contained chunk lines (50 queries each, 2-decimal
    # values, each line ~1.4 KB so a bounded tail keeps whole lines), then
    # a compact per_query_total marker, keeping the tiny headline line
    # LAST (the contract line any tail capture ends on).
    chunk_size = 50
    for ci in range(0, len(names), chunk_size):
        chunk = {n: round(timings[n], 2) for n in names[ci : ci + chunk_size]}
        print(
            json.dumps(
                {
                    "metric": "headline_queries_chunk",
                    "chunk": ci // chunk_size,
                    "n_chunks": (len(names) + chunk_size - 1) // chunk_size,
                    "queries": chunk,
                },
                separators=(",", ":"),
            ),
            flush=True,
        )
    print(
        json.dumps({"metric": "per_query_total", "n": len(names)}),
        flush=True,
    )
    print(
        json.dumps(
            {"metric": "headline_total", "value": total, "unit": "sec", "sf": sf}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
