"""Partition-count invariance: results must be BIT-IDENTICAL regardless of
how the data is partitioned — the property that makes a query's answer
stable between local[32] and a 1000-executor cluster. Float sums reassociate
under different partitionings; the engine's decimal money sums and rounding
discipline exist precisely so this test holds."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

CASES = [
    "pricing_summary",      # fixedpoint exact long sums over the fact table
    "revenue_by_region",    # two-level exact long roll-up + joins
    "rollup_fees_report",   # rollup grouping sets
    "latest_deposit_per_user",  # window argmax
    "percentiles_by_flag",  # sort-based exact percentiles
    "stream_hourly_rollup", # time bucketing + aggregation
    "minhash_near_dup",     # portable universal-hash minhash + banded LSH
    "simhash_fingerprints",  # portable md5-chunk sign votes
    "cosine_topk_batch",    # Arrow GEMM scoring + WindowGroupLimit
    "pack_sequences",       # bucket-local window cumsum (r2)
    "chunk_documents",      # map-only generator (r2)
    "vocab_top_terms",      # global top-k with tie-broken cut (r2)
    "bitwise_flag_rollup",  # associative bitwise aggregates (r2)
    "min_cost_supplier_q2", # window-min decorrelated lateral (r2)
    "exact_substring_dups_thinned",  # winnowing kernel + bucket pairing (r4)
    "bigram_surprisal_scores",       # rounded-score ranking over float sums (r4)
    "prototype_pruning",             # rounded centroid/cosine thresholds (r4)
    "pagerank_sources",              # per-iteration rounded rank sums (r4)
    "segment_dedup_corpus",          # packed-key min + per-doc reconstruction (r4)
    "dsir_importance_resample",      # hashed-bucket stats + rounded ranking (r4)
    "kmeans_cluster_stats",          # rounded-centroid Lloyd rounds (r4)
    "logreg_quality_gate",           # rounded gradient-descent weight path (r4)
    "pmi_collocations",              # rounded log-ratio ranking (r4)
    "bpe_merge_training",            # integer pair-count argmax per round (r4)
    "markov_transitions",            # unique (ts, event_id) sequence tie-break (r4)
    "funnel_progression",            # ordered-stage min-ts joins (r4)
    "ewma_last_value",               # per-user bounded-window fold, rounded (r4)
    "ab_test_zscore",                # conditional aggs + rounded statistics (r4)
    "multimodal_real_codecs",        # real PPM/WAV decode, int-exact features (r4)
    "bpe_encode_corpus",             # trained map join-back, integer counts (r4)
    "ohlc_hourly_bars",              # first/last by unique (ts, event_id) (r4s3)
    "vwap_hourly",                   # integer-exact cents/micro division (r4s3)
    "max_drawdown_users",            # stacked running windows, rounded max (r4s3)
    "cusum_changepoints",            # grid-value prefix sums + argmax day (r4s3)
    "triangle_count_copurchase",     # degree-oriented integer counts (r4s3)
    "pq_adc_topk",                   # rounded codebooks + ADC ranking (r4s3)
    "attribution_last_touch",        # ignore-nulls carry + cents sums (r4s3)
    "target_encoding_loo",           # broadcast agg + integer micro division (r4s3)
    "clamped_running_balance",       # non-associative ordered integer fold (r4s3)
    "benford_digit_test",            # integer digit counts + rounded chi2 (r4s3)
    "chi2_independence",             # contingency algebra over 20 cells (r4s3)
    "ks_two_sample",                 # distributed prefix-sum ECDF (r4s4)
    "acf_daily_revenue",             # calendar-join lag products, rounded (r4s4)
    "naive_bayes_lang_confusion",    # rounded-score argmax, broadcast model (r4s4)
    "gopher_quality_rules",          # map-only integer rule counts (r4s4)
    "bfs_hop_distance",              # frontier iteration, integer-exact (r4s4)
    "item_item_cosine_topk",         # integer co-counts, rounded cosine rank (r4s4)
    "poisson_bootstrap_ci",          # hash weights, rounded replicate means (r4s4)
    "pareto_frontier_parts",         # integer skyline via prefix scan (r4s4)
    "label_propagation_communities", # deterministic-LPA integer rounds (r4s4)
    "event_path_trigrams",           # unique-tie-break window trigrams (r4s4)
    "multi_touch_attribution",       # integer-cents U-shaped credits (r4s4)
    "weighted_quantiles_price",      # integer weighted-quantile cuts (r4s4)
    "gdpr_erase_audit",              # broadcast subject-cohort counts (r4s4)
    "cumulative_unique_users_daily", # first-seen prefix-sum growth curve (r4s4)
    "share_of_parent_revenue",       # two-level integer-cents shares (r4s4)
    "embedding_pca_project",         # SIGNED 4dp projections: sign-canonical basis (r6)
    "epoch_shuffle_order",           # md5 shard/rank permutation, hash-exact (r6)
    "rolling_median_revenue_7d",     # integer-cents order statistic, RANGE window (r6)
    "distinct_ngram_diversity",      # integer distinct/total counts per source (r6)
    "sparse_shingle_cosine_pairs",   # df-capped candidates + rounded cosine (r6)
    "token_budget_selection",        # integer-keyed prefix scan + integer budget (r6)
    "contrastive_negative_samples",  # md5-derived negatives, anti-join, j-rank (r6)
    "kcore_peeling",                 # integer degree-peel rounds (r6)
    "interarrival_burstiness",       # integer gaps + rounded moments (r6)
    "zipf_slope_by_source",          # vocab-bounded rank + rounded OLS (r6)
]


def _rows(spark, name, sf_dir, shuffle_parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        df = QUERIES[name](spark, sf_dir)
        return sorted(tuple(str(v) for v in r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", CASES)
def test_partitioning_does_not_change_results(spark, sf_dir, name):
    a = _rows(spark, name, sf_dir, 3)
    b = _rows(spark, name, sf_dir, 32)
    assert a == b, f"{name}: result depends on shuffle partitioning"
