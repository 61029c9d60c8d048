"""Query library. Importing this package populates the registry."""

from .registry import QUERIES, Query, register  # noqa: F401
from . import events_queries  # noqa: F401
from . import tpch_queries  # noqa: F401

try:  # data-prep ops land incrementally; keep the registry importable
    from . import dataprep_queries  # noqa: F401
except ImportError:
    pass
try:
    from . import pipeline_queries  # noqa: F401
except ImportError:
    pass


# Queries the driver's rotating 50-slot correctness check has never
# hash-verified (absent from CORRECTNESS_r01 and _r02), plus the queries
# new this round: listed FIRST so a prefix-biased rotation reaches them
# before re-checking long-green ones. Refresh after each round's
# CORRECTNESS file lands.
_UNVERIFIED_FIRST = (
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "scalar_functions",
    "embedding_pca",
    "corpus_topics",
    "semdedup",
    "ivf_kmeans2_topk",
    "repetition_ratio",
    "term_zipf",
    "tfidf_top_terms",
    "dedup_containment",
    "curation_funnel",
    "top_bigrams",
    "curation_by_source",
    "stratified_sample",
    "source_token_mix",
    "ann_recall",
    "dedup_cluster_sizes",
    "dedup_keep_best",
    "dedup_keep_best_lsh",
    "pii_scrub",
    "pack_sequences",
    "decontaminate",
    "dedup_clusters_converged",
    "logreg2",
    "pq_adc_topk",
    "ivfpq_topk",
    "pq_recall",
    "doc_chunks",
    "chunk_dedup",
    "cdc_chunks",
    "cdc_dedup",
    "bm25_topk",
    "unigram_surprise",
    "winnow_fingerprints",
    "winnow_pairs",
    "rpc_correlate",
    "error_analysis",
    "rpc_scanner_state",
    "rpc_finalize",
    "skew_salted_join",
    "hbase_pcap_decode",
    "hbase_pcap_tables",
)


def _ordered():
    first = [n for n in _UNVERIFIED_FIRST if n in QUERIES]
    seen = set(first)
    return first + [n for n in QUERIES if n not in seen]


def queries():
    return {n: QUERIES[n].fn for n in _ordered()}


def oracles():
    return {n: QUERIES[n].oracle for n in _ordered() if QUERIES[n].oracle is not None}
