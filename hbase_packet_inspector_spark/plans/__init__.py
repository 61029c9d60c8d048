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
    "hbase_pcap_decode",
    "hbase_pcap_tables",
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
)


def _ordered():
    first = [n for n in _UNVERIFIED_FIRST if n in QUERIES]
    seen = set(first)
    return first + [n for n in QUERIES if n not in seen]


def queries():
    return {n: QUERIES[n].fn for n in _ordered()}


def oracles():
    return {n: QUERIES[n].oracle for n in _ordered() if QUERIES[n].oracle is not None}
