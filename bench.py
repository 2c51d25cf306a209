"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": <urls/sec>, "unit": "urls/sec",
   "queries": {name: sec, ...}, "query_attempts": {name: [sec, ...]},
   "sf": ..., "scaling": {...}}

"queries" carries best-of-N per query (two interleaved sweeps + a third
attempt when the pair disagrees >2x — noise armor against host
contention); "query_attempts" carries every raw attempt for audit.

- value = the BASELINE.json primary metric: frontier URLs scheduled+fetched
  per second, measured over the flagship crawl-round query (rank-window
  schedule + fetch join) at the bench SF (warm run).
- "scaling" embeds the latest N-vs-4N evidence produced by
  tools/bench_scaling.py (two parallelism levels over identical input),
  if BENCH.md has been generated; see BENCH.md for the full table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "crawl_round_schedule",
    "frontier_topk_global",
    "politeness_budget",
    "pricing_summary",
    "fetch_join_revenue",
    "seen_antijoin",
    "sessionize_events",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash64",
    "dedup_embedding_cosine",
    "ann_brute_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_token_stats",
    "multimodal_decode",
    "video_frame_sample",
    "image_phash_near_dup",
    "image_dup_clusters",
    "dataset_split",
    "dedup_components",
    "pagerank_hosts",
    "bm25_search",
    "kmeans_centroids",
    "kmv_distinct",
    "cms_heavy_hitters",
    "embedding_quantize_int8",
    "weighted_sample",
    "audio_features",
    "pii_scrub",
    "quality_repetition",
    "contamination_overlap",
    "dedup_keep_best",
    "recrawl_schedule",
    "html_text_extract",
    "dedup_incremental",
    "image_real_png_decode",
    "image_real_jpeg_decode",
    "jpeg_quality_sweep",
    "mixed_format_decode",
    "audio_real_wav_decode",
    "video_real_mjpeg_decode",
    "image_real_webp_decode",
    "lossless_codec_compare",
    "clip_pair_filter",
    "pair_dedup_union",
    "aesthetic_score_filter",
    "pair_filter_funnel",
    "webdataset_shard_manifest",
    "phash_hamming_histogram",
    "recrawl_due_set",
    "recrawl_policy_compare",
    "semdedup_pairs",
    "c4_line_filter",
    "paragraph_dedup",
    "gopher_quality_filter",
    "token_shard_pack",
    "url_blocklist_filter",
    "image_exact_dedup",
    "ccnet_perplexity_bucket",
    "stratified_sample",
    "crawl_delay_budget",
    "sitemap_extract",
    "quality_linear_score",
    "doc_chunk",
    "aspect_bucket_pack",
    "redirect_resolve",
    "tfidf_keywords",
    "image_header_meta",
    "substring_dedup",
    "anchor_text_agg",
    "inverted_index",
    "hits_hosts",
    "dsir_importance",
    "frontier_age_priority",
    "warc_cdx_index",
    "budget_apportion",
    "url_surt_key",
    "minhash_calibration",
    "robots_block_rate",
    "snapshot_diff",
    "event_funnel",
    "degree_histogram",
    "trustrank_hosts",
    "image_channel_histogram",
    "host_skew_report",
    "ann_recall_report",
    "lpa_communities",
    "image_resize_check",
    "audio_near_dup",
    "shard_balance_report",
    "crawl_depth_profile",
    "robots_sitemap_discovery",
    "pagerank_priority_blend",
    "host_bucket_balance",
    "event_rate_anomaly",
    "caption_dup_images",
    "hll_distinct",
    "url_template_mining",
    "host_cocitation",
    "crawl_makespan",
    "graph_triangles",
    "graph_seed_distance",
    "approx_quantile_hist",
    "dust_rule_mining",
    "image_letterbox",
    "zipf_term_fit",
    "robots_rfc9309",
    "politeness_audit",
    "robots_generation_diff",
    "image_color_profile",
    "sitemap_coverage_gap",
    "graph_kcore",
    "host_mirror_detect",
    "event_pmi",
    "dedup_recall_planted",
    "host_ucb_priority",
    "ann_nprobe_sweep",
    "dedup_method_recall",
    "image_phash_recall",
    "budget_sensitivity",
    "bloom_shard_health",
    "corr_length_tokens",
    "image_transcode_savings",
    "dedup_savings_report",
    "tokenizer_oov_rate",
    "recrawl_lambda",
    "embedding_norm_hist",
    "corpus_temperature_mix",
    "graph_mixing_stats",
    "frontier_gini",
    "event_burstiness",
    "grouped_quantile_hist",
    "frontier_lorenz",
]


def _read_scaling_from_bench_md(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    txt = open(path).read()
    m = re.search(r"<!--SCALING_JSON:(.*?)-->", txt, re.S)
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            return None
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from distributed_webcrawler_spark import get_spark

    import __spark_entry__ as E

    spark = get_spark(cpus=cpus, app_name="dws-bench")
    qs = E.queries()

    def run_once(name: str) -> float:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    # Noise armor (round-3 verdict #1): the sandbox host's minute-scale
    # contention can inflate a single pass 9x (dedup_simhash64 measured
    # 56s in BENCH_r03.json vs 6.2s idle), so every query gets TWO
    # INTERLEAVED passes — a contention window hits one full sweep, not
    # both attempts of one query — plus a tie-breaking third attempt when
    # the pair still disagrees >2x. Reported time = min (host drift only
    # ever SLOWS a run); the raw attempts ship in "query_attempts" so a
    # reader can audit any residual outlier.
    # Flagship metric attempts are INTERLEAVED with the suite sweeps
    # (r4 verdict #1: three back-to-back attempts share one contention
    # window — BENCH_r04.json's flagship landed 35% under the same-code
    # pinned run exactly that way). One attempt before sweep 1, one
    # between the sweeps, one after — minutes apart, so a degraded
    # window can inflate at most one of them; min is the estimate and
    # the raw attempts ship in "flagship_attempts" for audit.
    flagship = qs["crawl_round_schedule"]
    n_urls = flagship(spark, sf_dir).count()   # also warms the tables

    def flagship_once() -> float:
        t0 = time.monotonic()
        flagship(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    flagship_walls = [flagship_once()]
    attempts: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _sweep in range(2):
        for name in HEADLINE:
            attempts[name].append(run_once(name))
        flagship_walls.append(flagship_once())
    for name in HEADLINE:
        a = attempts[name]
        if max(a) > 2.0 * max(min(a), 0.05):
            attempts[name].append(run_once(name))
    timings = {name: min(a) for name, a in attempts.items()}
    if max(flagship_walls) > 1.5 * min(flagship_walls):
        flagship_walls.append(flagship_once())   # tie-break attempt
    flagship_sec = min(flagship_walls)
    urls_per_sec = round(n_urls / flagship_sec, 1)

    scaling = _read_scaling_from_bench_md(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"))

    out = {
        "metric": "frontier URLs scheduled+fetched/sec (flagship crawl-round query, warm)",
        "value": urls_per_sec,
        "unit": "urls/sec",
        "queries": timings,
        "query_attempts": attempts,
        "sf": sf_dir,
        "cpus": cpus,
        "flagship_urls": n_urls,
        "flagship_sec": round(flagship_sec, 3),
        "flagship_attempts": flagship_walls,
        "total_sec": round(sum(timings.values()), 3),
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
