"""Physical-plan audit over the query library.

For each registered query (at a small sf dir so planning is instant),
renders the formatted physical plan and flags anti-patterns that would
hurt at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- Window operators with an empty partition spec (single-partition sort)
- row-at-a-time BatchEvalPython (non-Arrow Python UDFs) in the plan
- parquet scans with no pushed filters *when the query filters the scan*

Usage: python tools/explain_audit.py [sf_dir] [query ...] [--full]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: F401  (path bootstrap)
from hbase_packet_inspector_spark import plans
from hbase_packet_inspector_spark.session import get_spark


FLAGS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "nested-loop": re.compile(r"BroadcastNestedLoopJoin"),
    "global-window": re.compile(r"Window .*windowspecdefinition\(((?!PARTITION).)*?ORDER", re.S),
    "python-udf": re.compile(r"BatchEvalPython"),
}


def audit(df):
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    found = []
    if "CartesianProduct" in plan:
        found.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        found.append("NESTED-LOOP-JOIN")
    # Window with empty partition spec: 'windowspecdefinition(' directly
    # followed by the order column (no partition columns before the sort
    # spec marker 'ASC NULLS'/'DESC NULLS' count heuristic)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        if "ASC" in args.split(",")[0] or "DESC" in args.split(",")[0]:
            found.append("GLOBAL-WINDOW")
            break
    if "BatchEvalPython" in plan:
        found.append("ROW-PYTHON-UDF")
    # a scan with data filters that pushed NONE of them into parquet:
    # formatted explain prints both lists per scan node
    for m in re.finditer(r"DataFilters: \[([^\]]*)\][^\n]*?PushedFilters: \[\]", plan):
        if m.group(1).strip():
            found.append("UNPUSHED-FILTERS")
            break
    return plan, found


# Accepted-by-design plan shapes (each documented in the query's docstring):
# - acctbal_deciles: global ntile over the customer dimension — bounded by
#   customer cardinality, not fact volume; at 100 TB the same shape runs on
#   pre-aggregated keys.
# - cosine_topk: brute-force exact-ANN baseline IS a broadcast nested-loop
#   (every query vector scores every base vector); the scale path is the
#   IVF-pruned variant, which plans as an equi join.
# - ivf_quantized_topk: quantizer assignment is definitionally
#   vectors × centroids with the tiny centroid table broadcast.
# - term_zipf: the rank window runs AFTER TakeOrderedAndProject(50) — it
#   numbers 50 rows, never the vocabulary; the top-k itself is distributed.
# - ivf_kmeans2_topk: same quantizer-assignment NLJ as ivf_kmeans_topk,
#   twice (one per Lloyd round).
# - source_token_mix: the corpus total re-enters as a broadcast ONE-ROW
#   aggregate — a 1-row nested loop by construction.
# - ann_recall: contains the brute-force exact baseline (cosine_topk's
#   rationale); the pruned side plans as an equi join.
# - tfidf_top_terms: N(docs) joins in as a broadcast ONE-ROW aggregate (the
#   lazy alternative to an eager docs.count()) — a 1-row nested loop.
ALLOWED = {
    "tfidf_top_terms": {"NESTED-LOOP-JOIN"},
    # r11 additions — all three are the 1-row-aggregate broadcast cross
    # (the source_token_mix rationale): the global total/average is a
    # single-row aggregate broadcast against the keyed frame, never a
    # data-sized fan-out
    "basket_affinity": {"NESTED-LOOP-JOIN"},      # n_orders 1-row cross
    "q22_idle_customers": {"NESTED-LOOP-JOIN"},   # (sum, count) 1-row cross
    "degree_distribution": {"NESTED-LOOP-JOIN"},  # host total 1-row cross
    "acctbal_deciles": {"GLOBAL-WINDOW"},
    # three global ntiles over the CUSTOMER-aggregate frame (acctbal_
    # deciles' rationale: dimension-bounded, never fact rows; docstring
    # notes the approx_percentile-cutoff scale alternative)
    "rfm_segments": {"GLOBAL-WINDOW"},
    # the cumulative vocab/token sums window over the BUCKET frame
    # (docs/50 rows — bucketing happens before the only global window;
    # widen the bucket at scale, per the docstring)
    "vocab_growth": {"GLOBAL-WINDOW"},
    # the scale twin's window frame is CONSTANT 100 percentile buckets
    # at ANY corpus size (bucket = doc_id*100 div N) — this is the
    # conversion of vocab_growth's growing frame, not another instance
    "vocab_growth_binned": {"GLOBAL-WINDOW"},
    # binned Lorenz: the NLJ is the 1-row min/max/span broadcast cross
    # (fully distributed — nothing collected) and the windows run over
    # the CONSTANT 256-row bin frame at any customer count
    "spend_lorenz_binned": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # the class x sensitive-value grid is a BROADCAST cross of the
    # equivalence-class frame with the (bucketed) value-domain histogram
    # — value-domain-bounded fan-out by construction, and the global
    # total is a 1-row broadcast (source_token_mix's rationale)
    "t_closeness": {"NESTED-LOOP-JOIN"},
    "term_zipf": {"GLOBAL-WINDOW"},
    "ivf_kmeans2_topk": {"NESTED-LOOP-JOIN"},
    "source_token_mix": {"NESTED-LOOP-JOIN"},
    "ann_recall": {"NESTED-LOOP-JOIN"},
    "cosine_topk": {"NESTED-LOOP-JOIN"},
    "ivf_quantized_topk": {"NESTED-LOOP-JOIN"},
    "ivf_kmeans_topk": {"NESTED-LOOP-JOIN"},
    # assign_cells' broadcast quantizer pass (#vectors x #cells), same as
    # the other IVF variants; the ADC search itself is an equi join
    "ivfpq_topk": {"NESTED-LOOP-JOIN"},
    # the exact-L2 baseline half (ann_recall's rationale); the ADC half
    # plans as an equi join over codes
    "pq_recall": {"NESTED-LOOP-JOIN"},
    # the exact brute-force half of the SRP recall audit is cosine_topk's
    # broadcast-queries pass (ann_recall's rationale); the SRP half is an
    # equi join on the band key
    "srp_recall": {"NESTED-LOOP-JOIN"},
    # SQ8 search IS cosine_topk's broadcast-queries pass over the
    # reconstructed corpus (asymmetric SQ deployment); the recall audit
    # adds the exact baseline half (ann_recall's rationale)
    "sq8_topk": {"NESTED-LOOP-JOIN"},
    "sq8_recall": {"NESTED-LOOP-JOIN"},
    # corpus stats (N, avgdl, per-term df) re-enter as a broadcast ONE-ROW
    # aggregate — a 1-row nested loop by construction (source_token_mix's
    # rationale)
    "bm25_topk": {"NESTED-LOOP-JOIN"},
    # the LM total re-enters as a broadcast ONE-ROW aggregate
    "unigram_surprise": {"NESTED-LOOP-JOIN"},
    # skyline with the binned-envelope prefilter: the NLJ is the 1-row
    # min/max broadcast cross (spend_lorenz_binned's rationale); the
    # global windows are (a) the running bin max over the CONSTANT
    # 256-row bin frame (vocab_growth_binned's rationale) and (b) the
    # exact dominance pass over the CANDIDATE frame only —
    # output-bounded by the bin-envelope pruning, never the fact table
    # (worst case is inherent to the skyline operator, docstring)
    "pareto_frontier": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # quantile normalization transfer map (r12): the NLJs are (1) the
    # 1-row min/max broadcast cross that prices the bin edges
    # (spend_lorenz_binned's rationale) and (2) the ECDF alignment
    # join — (sources x 100 bins) x (100 pooled bins) with an integer
    # cross-multiplied cumulative-share predicate, CONSTANT-bounded by
    # the 100-bin histograms at any corpus size; the global window is
    # the pooled cumulative sum over the constant 100-row bin frame
    # (vocab_growth_binned's rationale)
    "quantile_normalize_binned": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # RBO's two ranker inputs are the standing exact-cosine baseline
    # (cosine_topk's allowlisted broadcast-queries NLJ) and the
    # inverted-index lexical ranker; the metric itself is an equi join
    # of two queries-x-5 frames (hybrid_rrf's rationale)
    "retrieval_rbo": {"NESTED-LOOP-JOIN"},
    # PAV minimax over the CONSTANT 10-bin reliability histogram: the
    # NLJs are the <=100-row inequality joins of the bin grid with
    # itself (dimension-bounded by construction), the global window is
    # the prefix sum over the same constant 10-row frame
    # (vocab_growth_binned's rationale) — corpus size only enters the
    # first (bin, label) aggregate
    "isotonic_calibration_binned": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # CUPED's NLJs are three ONE-ROW broadcast crosses: the epoch
    # midpoint (min/max), and the global five-moment aggregate joined
    # onto the 2-row variant frame (source_token_mix's rationale) —
    # nothing user- or event-sized ever fans out
    "cuped_adjusted_lift": {"NESTED-LOOP-JOIN"},
    # r12 statistics family — every NLJ below is a 1-row or
    # dimension-bounded broadcast cross (source_token_mix's
    # rationale), never a data-sized fan-out:
    # Theil: the 1-row corpus (N, S) total onto the nation frame
    "theil_decomposition": {"NESTED-LOOP-JOIN"},
    # Benford: the 1-row observed-total onto the constant 9-digit grid
    "benford_digit_audit": {"NESTED-LOOP-JOIN"},
    # median-of-means: the window ranks the CONSTANT 32-bucket frame;
    # the NLJ crosses the 1-row raw aggregate with the 1-row median
    "median_of_means": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # chi-square: the R x C marginal grid is a broadcast cross of two
    # dimension frames (t_closeness's value-domain rationale) plus the
    # 1-row total
    "chisq_independence": {"NESTED-LOOP-JOIN"},
    # Kaplan-Meier: the NLJ is the 1-row corpus-end broadcast; the
    # global windows (at-risk countdown, running log-sum, zero-factor
    # flag) all run over the CONSTANT <=104-row week frame — the
    # per-customer lead window partitions by custkey and is not
    # flagged
    "km_repurchase_survival": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # Mann-Whitney's cumulative B-count window is ordered over the
    # VALUE-DOMAIN frame (distinct token counts — bounded by max doc
    # length, t_closeness's domain-bounded rationale), never corpus
    # rows
    "rank_sum_test": {"GLOBAL-WINDOW"},
    # PSI's NLJs are the 1-row min/max bin-edge broadcast and the
    # 1-row cohort-total broadcast (spend_lorenz_binned's rationale);
    # every other frame is the constant 10-bin grid
    "psi_drift_binned": {"NESTED-LOOP-JOIN"},
    # three bounded NLJs, none corpus x corpus: (1) the pool scan is
    # cosine_topk's broadcast-ANCHOR pass (that rationale), (2) the
    # pool-pair sims cross the 20-row pool with itself, (3) the two
    # ONE-ROW array aggregates (pool + pair sims, pool-bounded
    # sufficient statistics) cross before the HOF greedy rounds — the
    # r12 lazy rewrite; the OLD form ran the same joins but collected
    # them at plan-BUILD time, which merely hid them from this audit
    "mmr_select": {"NESTED-LOOP-JOIN"},
    # gate_cutoffs runs unigram_surprise's scoring pass (same ONE-ROW
    # total broadcast) before the single-buffer percentile collapse;
    # the binned variant runs the same pass before the histogram
    "gate_cutoffs": {"NESTED-LOOP-JOIN"},
    "gate_cutoffs_binned": {"NESTED-LOOP-JOIN"},
    "bigram_surprise": {"NESTED-LOOP-JOIN"},
    # this query EXISTS to oracle-check the library's only two sanctioned
    # Python UDFs (toStringBinary, region-name decode) on a 64-row
    # synthesized frame — the flag is the point, not a regression
    "scalar_functions": {"ROW-PYTHON-UDF"},
    # assign_cells' broadcast quantizer pass (same rationale as the IVF
    # family) feeding the cell->documents describe join
    "corpus_topics": {"NESTED-LOOP-JOIN"},
    # semdedup runs the same quantizer pass before the within-cell prune
    "semdedup": {"NESTED-LOOP-JOIN"},
    # the l1 < l2 pair join runs over the #labels-row CENTROID frame —
    # model-bounded (not data-scaled) by construction, broadcast by
    # design; the corpus is touched once by the centroid aggregate
    "label_centroid_sim": {"NESTED-LOOP-JOIN"},
    # the eval-suite side is broadcast BY DESIGN (bounded at thousands of
    # vectors however big the train corpus — bm25's stats-frame rationale);
    # the per-train max then collapses map-side
    "embedding_decontaminate": {"NESTED-LOOP-JOIN"},
    # the totals re-enter as a broadcast ONE-ROW aggregate over the
    # per-key counts (source_token_mix's rationale)
    "key_skew_report": {"NESTED-LOOP-JOIN"},
    # the 64-row bucket-stats frame crossJoins the ONE-ROW totals
    # aggregate — both sides fixed-size by construction (bm25's
    # stats-frame rationale); the score join on the bucket key is an
    # equi broadcast join
    "dsir_weights": {"NESTED-LOOP-JOIN"},
    # same DSIR stats x one-row-totals cross join inside the composed
    # pipeline (dsir_weights' rationale)
    "span_dsir_pipeline": {"NESTED-LOOP-JOIN"},
    # the resample reuses the DSIR weight chain verbatim (dsir_weights'
    # stats x totals rationale); the sample cut itself is TakeOrdered
    "dsir_resample": {"NESTED-LOOP-JOIN"},
    # reuses the DSIR weight chain (dsir_weights' stats x totals
    # rationale); the budget cut itself is filters + a window over the
    # boundary bin only — no global sort
    "token_budget_select": {"NESTED-LOOP-JOIN"},
    # the (min,max) bin-edge frame re-enters as a broadcast ONE-ROW
    # aggregate (source_token_mix's rationale); binning itself is a
    # narrow expression and pos is a (bin, shard)-local window
    "curriculum_order": {"NESTED-LOOP-JOIN"},
    # the reverse running sums range over the n_bins-row threshold grid
    # (20 rows by construction), never the corpus — acctbal_deciles'
    # bounded-global-window rationale
    "classifier_pr_curve": {"GLOBAL-WINDOW"},
    # the anchor set is bounded (a training batch / audit sample) and
    # broadcasts; the cross-label predicate is non-equi BY DESIGN (the
    # negatives are everything with a DIFFERENT label), so the pass is
    # definitionally a broadcast nested loop — cosine_topk's rationale
    # with a label-prune that runs before the O(dim) dot product
    "hard_negatives": {"NESTED-LOOP-JOIN"},
    # mine_triplets runs the same bounded-anchor pass for both the
    # positive and negative sides (hard_negatives' rationale)
    "contrastive_triplets": {"NESTED-LOOP-JOIN"},
    # the ranking-quality audit contains the exact brute-force baseline
    # (cosine_topk's rationale); the pruned side plans as an equi join
    "ann_ndcg": {"NESTED-LOOP-JOIN"},
    # both halves are cosine_topk's broadcast-bounded-queries pass
    # (ann_recall's rationale); the prefix half reads 16/D of each vector
    "matryoshka_recall": {"NESTED-LOOP-JOIN"},
    # both rankers are broadcast-bounded-query corpus passes (cosine_topk
    # resp. lexical word-set jaccard — ann_recall's rationale); the RRF
    # fusion itself is a union + groupBy over queries x k rows
    "hybrid_rrf": {"NESTED-LOOP-JOIN"},
    # evaluates the same three rankers (hybrid_rrf's rationale) plus the
    # 1-row in-engine IDCG broadcast (ann_ndcg's rationale)
    "retrieval_ndcg": {"NESTED-LOOP-JOIN"},
    # the reciprocal-rank audit runs over the exact-cosine ranker, so it
    # contains cosine_topk's broadcast-bounded-queries NLJ baseline
    "retrieval_mrr": {"NESTED-LOOP-JOIN"},
    # the decile ntile is a deliberate global window over the scored
    # frame (the exactness pin; at scale: approx-quantile cutpoints +
    # narrow assignment, gate_cutoffs' pattern), and the N/P totals
    # re-enter as a broadcast ONE-ROW cross join
    "score_lift": {"NESTED-LOOP-JOIN", "GLOBAL-WINDOW"},
    # the prune-rate audit totals re-enter as a broadcast ONE-ROW
    # cross join (the sanctioned 1-row shape); the bloom filter and
    # the dimension side are broadcast HASH joins
    "bloom_pruned_join": {"NESTED-LOOP-JOIN"},
    # Q11's defining shape: the global revenue total re-enters as a
    # broadcast ONE-ROW cross join the HAVING predicate reads
    "important_stock": {"NESTED-LOOP-JOIN"},
    # the rarest-first frequency rank is a VOCABULARY-bounded global
    # window (term_zipf's rationale) — never corpus-sized
    "jaccard_prefix_pairs": {"GLOBAL-WINDOW"},
    # the MoM lag runs over the POST-AGG month frame — calendar-bounded
    # (~tens of rows by construction), never order-sized
    "monthly_growth": {"GLOBAL-WINDOW"},
    # running sum over the CALENDAR-BOUNDED month frame (monthly_growth's
    # rationale): the +1/-1 sweep aggregates to ~tens of month rows
    # BEFORE the only global window
    "open_orders_timeline": {"GLOBAL-WINDOW"},
    # same audit over the scale path: the ANN half is a cell-pruned
    # equi-join, so the only NLJ left is the sanctioned 1-row in-engine
    # IDCG broadcast (ann_ndcg's rationale) plus the bounded lexical
    # postings join of hybrid_rrf_pruned
    "retrieval_ndcg_pruned": {"NESTED-LOOP-JOIN"},
    # the total micro-priority re-enters as a broadcast ONE-ROW
    # aggregate over the host-cardinality frontier (key_skew_report's
    # one-row-totals rationale); the allocation itself is integer
    # column math
    "crawl_budget": {"NESTED-LOOP-JOIN"},
    # the composed loop embeds frontier_budget, whose total
    # micro-priority is the same broadcast ONE-ROW aggregate
    # (crawl_budget's rationale); every other stage is a host equi-join
    "crawl_plan": {"NESTED-LOOP-JOIN"},
    # the bin-count total re-enters as a broadcast ONE-ROW aggregate
    # over the n_bins-row histogram (key_skew_report's rationale);
    # the histogram is one mergeable (bin, label) aggregate
    "score_calibration": {"NESTED-LOOP-JOIN"},
    # the corpus-total doc count re-enters as a broadcast ONE-ROW
    # aggregate over the license-cardinality rollup (key_skew_report's
    # one-row-totals rationale)
    "license_mix": {"NESTED-LOOP-JOIN"},
    # embeds frontier_budget over the freshness-adjusted priorities,
    # whose total micro-priority is the same broadcast ONE-ROW
    # aggregate (crawl_budget's rationale); the sitemap rollup and the
    # frontier blend are host equi-joins
    "recrawl_schedule": {"NESTED-LOOP-JOIN"},
}


def main():
    argv = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    any_flag = False
    for name, q in plans.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan, found = audit(df)
        except Exception as e:
            print(f"ERROR {name}: {e}")
            any_flag = True
            continue
        unexpected = [f for f in found if f not in ALLOWED.get(name, ())]
        marker = " ".join(
            f + ("(allowed)" if f not in unexpected else "") for f in found
        ) or "ok"
        print(f"{name:32s} {marker}")
        if unexpected or full:
            any_flag = any_flag or bool(unexpected)
            print("    " + "\n    ".join(plan.splitlines()[:40]))
    sys.exit(1 if any_flag else 0)


if __name__ == "__main__":
    main()
