"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is end-to-end per query (plan + execute + collect-to-count) after a
one-time warmup query to amortize JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbase_packet_inspector_spark import plans
from hbase_packet_inspector_spark.session import get_spark

# Headline set: one per operator family (agg, percentile, topk, window,
# as-of correlation, star join, rollup, setop, anti join, dedup/similarity
# once they land).
HEADLINE = [
    "traffic_per_method",
    "latency_percentiles",
    "top_hot_users",
    "events_per_minute",
    "sessionize",
    "asof_correlate",
    "scanner_enrich",
    "rolling_avg_per_user",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "customer_geo_rollup",
    "priority_top_orders",
    "parts_never_returned",
    "brand_supplier_volume",
    "order_lineitem_counts",
    "rpc_correlate",
    "rpc_scanner_state",
    "rpc_finalize",
    "skew_salted_join",
    "hbase_pcap_decode",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    "lang_id",
    "token_count",
    "cosine_topk",
    "ivf_topk_by_label",
    "embedding_norms",
    "dedup_embedding",
    "quantity_outliers",
    "user_event_pivot",
    "approx_distinct_users",
    "multimodal_byte_features",
    "rolling_fingerprint",
    "dedup_word_ngram",
    "asof_last_click",
    "conversion_funnel",
    "ivf_quantized_topk",
    "ivf_kmeans_topk",
    "repetition_ratio",
    "term_zipf",
    "tfidf_top_terms",
    "dedup_containment",
    "stratified_sample",
    "source_token_mix",
    "ann_recall",
    "ivf_kmeans2_topk",
    "curation_funnel",
    "range_join_counts",
    "pii_scrub",
    "pack_sequences",
    "decontaminate",
    "logreg2",
    "pq_adc_topk",
    "ivfpq_topk",
    "pq_recall",
    "top_event_paths",
    "doc_chunks",
    "chunk_dedup",
    "cohort_retention",
    "winnow_fingerprints",
    "winnow_pairs",
    "error_analysis",
    "hbase_pcap_tables",
    "dedup_keep_best",
    "cdc_chunks",
    "cdc_dedup",
    "bm25_topk",
    "unigram_surprise",
    "dedup_keep_best_lsh",
    "corpus_topics",
    "curation_by_source",
    "top_bigrams",
    "semdedup",
    "dedup_cluster_sizes",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "scalar_functions",
    "embedding_pca",
    "embedding_pca_wide",
    "data_profile",
    "source_mixture_weights",
    "global_shuffle",
    "lsh_recall",
    "embedding_decontaminate",
    "curation_pipeline",
    "key_skew_report",
    "bigram_surprise",
    "dup_span_fraction",
    "dsir_weights",
    "logreg_score",
    "source_overlap",
    "pq_rerank_topk",
    "dedup_span_clean",
    "bpe_merges",
    "bpe_token_count",
    "span_dsir_pipeline",
    "source_length_quartiles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hpi-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM, whole-stage codegen compilation, parquet footer caches.
    # Each query runs once at the smallest sf first — generated code is
    # cached per expression tree, so the timed sf runs measure execution,
    # not janino compilation (which dominates cold runs of the wide
    # hash-expression pipelines by several seconds).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        q = plans.QUERIES.get(name)
        if q is None:
            continue
        try:
            q.fn(spark, warm_dir).count()
        except Exception:
            pass
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = plans.QUERIES.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        # drop persisted frames (e.g. LSH signature caches) between queries
        # so earlier queries' executor memory doesn't tax later ones
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
