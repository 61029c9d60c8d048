"""Scale probes for the two flagship compositions (VERDICT_r6 item 4):
``dedup_keep_best_lsh`` (MinHash -> LSH -> cluster -> argmax) and
``host_pagerank`` (power iteration), measured at 1x / 10x / 100x with
per-stage wall clock AND per-stage shuffle bytes (read via the Spark UI
REST API, enabled for this session only).

    python tools/probe_scale.py dedup   [dirs...]  # default 1x/10x/100x
    python tools/probe_scale.py pagerank [host counts...]

The dedup probe replays the registered query body with EAGER lineage cuts
at the stage boundaries (pairs / clusters / argmax) so stage walls are
additive and each stage's shuffle delta is attributable; it also runs the
registered query once end-to-end for the composed wall. The pagerank probe
generates a deterministic host graph (8 out-links per host, hash-spread
targets => mild natural skew) at increasing host counts.

Results go to stdout; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_probe_spark() -> SparkSession:
    """session.get_spark's config, plus the UI (for /api/v1 stage metrics)
    and probe-sized driver memory (local mode: driver == all executors)."""
    from hbase_packet_inspector_spark.session import _ship_package

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    _ship_package(spark)
    return spark


def _shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_write_bytes, shuffle_read_bytes) over every
    stage the app has run — deltas around a stage attribute its shuffles."""
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ))
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


class StageMeter:
    def __init__(self, spark):
        self.spark = spark
        self.rows: list[tuple[str, float, float, float, int]] = []

    def run(self, label: str, fn):
        w0, r0 = _shuffle_totals(self.spark)
        t0 = time.perf_counter()
        n = fn()
        wall = time.perf_counter() - t0
        w1, r1 = _shuffle_totals(self.spark)
        self.rows.append(
            (label, wall, (w1 - w0) / 1e6, (r1 - r0) / 1e6, n)
        )
        print(f"    {label:<28} {wall:7.1f}s  shuffleW {(w1-w0)/1e6:9.1f} MB"
              f"  shuffleR {(r1-r0)/1e6:9.1f} MB  rows {n}")
        return n


def probe_dedup(spark, dirs: list[str]) -> None:
    from hbase_packet_inspector_spark.operators import dedup as D

    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n_docs = docs.count()
        print(f"\n== dedup_keep_best_lsh @ {d} ({n_docs} docs)")
        m = StageMeter(spark)

        pairs = clusters = None
        def stage_pairs():
            nonlocal pairs
            pairs = (
                D.minhash_lsh_dedup(docs, min_est=0.5, min_jaccard=0.45)
                .select("d1", "d2").localCheckpoint()
            )
            return pairs.count()

        def stage_clusters():
            nonlocal clusters
            clusters = D.dedup_clusters(pairs, iterations=4).localCheckpoint()
            return clusters.count()

        def stage_argmax():
            scored = docs.select(
                "doc_id",
                F.size(F.split(F.col("text"), " ")).cast("int")
                .alias("n_tokens"),
            )
            return D.keep_best(scored, clusters, quality_col="n_tokens").count()

        m.run("pairs (minhash+LSH+verify)", stage_pairs)
        m.run("clusters (4-round minlabel)", stage_clusters)
        m.run("keep_best (struct argmax)", stage_argmax)
        spark.catalog.clearCache()

        # composed registered body, end-to-end (lazy checkpoints, as shipped)
        def composed():
            p = (
                D.minhash_lsh_dedup(docs, min_est=0.5, min_jaccard=0.45)
                .select("d1", "d2").localCheckpoint(eager=False)
            )
            c = D.dedup_clusters(p, iterations=4).localCheckpoint(eager=False)
            scored = docs.select(
                "doc_id",
                F.size(F.split(F.col("text"), " ")).cast("int")
                .alias("n_tokens"),
            )
            return D.keep_best(scored, c, quality_col="n_tokens").count()

        m.run("COMPOSED (registered body)", composed)
        spark.catalog.clearCache()


def probe_index(spark, dirs: list[str]) -> None:
    """The continuous-ingest claim at scale: build the persisted LSH
    index once per corpus size, then probe a FIXED 100-doc batch —
    per-batch cost must stay ~flat as the standing corpus grows 100×
    (the bucket-pruned reads touch collision buckets, not the corpus)."""
    import tempfile

    from hbase_packet_inspector_spark.operators import dedup as D

    batch = None
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()
        if batch is None:
            # fixed probe batch: 100 docs of the 1x corpus, ids offset so
            # they never collide with index doc_ids
            from pyspark.sql import functions as F
            batch = (
                docs.where(F.col("doc_id") < 100)
                .withColumn("doc_id", F.col("doc_id") + 10_000_000)
                .localCheckpoint()
            )
        tag = f"probe_idx_{n}"
        root = tempfile.mkdtemp(prefix=tag)
        m = StageMeter(spark)
        m.run(f"build index ({n} docs)",
              lambda: (D.save_lsh_index(docs, root, table=tag, buckets=8),
                       n)[1])
        bands, sets = D.load_lsh_index(spark, tag)

        def probe():
            pairs = D.probe_lsh_index(bands, sets, batch,
                                      min_est=0.5, min_jaccard=0.45)
            return pairs.count()

        probe()  # warm
        m.run("probe fixed 100-doc batch", probe)
        m.run("probe again (min-of-2 check)", probe)
        spark.catalog.clearCache()


def probe_retrieval_pruned(spark, dirs: list[str]) -> None:
    """hybrid_rrf_pruned's scale story at a FIXED 80-query anchor set
    (the 1x corpus's doc_id % 25 == 0 slice bounded by the 1x
    EMBEDDINGS table size, 2000 vectors, so the same anchors carry
    both text and a vector at every scale — copy 0 of the Nx corpora
    is the identity mapping): per-half wall + shuffle as the corpus
    grows. The lexical
    half (inverted-index postings join) should stay FLAT — permuted
    copies share almost no words, so matching postings don't grow. The
    ANN half (label-cell-pruned cosine) is EXPECTED to grow with cell
    size: the synthetic corpus keeps 10 labels at every scale, so cells
    grow linearly — the honest claim is 'cost = anchors x own-cell
    size', i.e. 1/|cells| of brute force, with finer partitioning
    (ivf_kmeans cells ~ sqrt(N)) as the documented deeper-prune path."""
    from hbase_packet_inspector_spark.operators import similarity as S
    from hbase_packet_inspector_spark.operators import text as X
    from hbase_packet_inspector_spark.plans.dataprep_queries import (
        _docs,
        _emb,
    )

    for d in dirs:
        docs = _docs(spark, d).localCheckpoint()
        emb = _emb(spark, d).localCheckpoint()
        n = docs.count()
        print(f"\n== hybrid_rrf_pruned (fixed anchors) @ {d} ({n} docs)")
        q_ids = docs.where(
            (F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 2000)
        ).select("doc_id").localCheckpoint()
        q_emb = emb.join(
            q_ids.withColumnRenamed("doc_id", "vec_id"), "vec_id"
        ).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("label").alias("q_label"),
        ).localCheckpoint()
        q_txt = docs.join(q_ids, "doc_id").select(
            F.col("doc_id").alias("q_id"), F.col("text").alias("q_text")
        ).localCheckpoint()
        m = StageMeter(spark)

        emb_rank = lex_rank = None

        def ann_half():
            nonlocal emb_rank
            emb_rank = S.cosine_topk(
                emb, q_emb, k=5, same_cell_col="label"
            ).select("q_id", "neighbor_id", "rnk").localCheckpoint()
            return emb_rank.count()

        def lex_half():
            nonlocal lex_rank
            lex_rank = X.lexical_topk(docs, q_txt, k=5).select(
                "q_id", "neighbor_id", "rnk"
            ).localCheckpoint()
            return lex_rank.count()

        def fuse():
            return S.rrf_fuse([emb_rank, lex_rank], k=5).count()

        for fn in (ann_half, lex_half, fuse):
            fn()  # warm (codegen; checkpoints overwritten by timed run)
        m.run("ann half (label-cell cosine_topk)", ann_half)
        m.run("lexical half (postings join)", lex_half)
        m.run("rrf fusion (rank-only)", fuse)
        spark.catalog.clearCache()


def probe_crawl(spark, dirs: list[str]) -> None:
    """crawl_cycle / crawl_schedule at growing corpus: the synthetic
    crawl keeps 25 hosts at every scale while URLs grow with docs, so
    this probes the claim that every stage is host- or URL-equi-join
    shaped — wall and shuffle should track URL volume (the groupBy url
    verdict folds and the frontier's per-URL joins), with the
    host-cardinality frames (pagerank, stats, robots rules, delays)
    constant. Runs the REGISTERED bodies end-to-end plus the frontier
    and gate stages separately for attribution."""
    from hbase_packet_inspector_spark import plans

    for d in dirs:
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"\n== crawl family @ {d} ({n} docs)")
        m = StageMeter(spark)
        for name in ("crawl_frontier", "robots_gate", "crawl_cycle",
                     "crawl_schedule", "crawl_budget", "crawl_plan"):
            fn = plans.QUERIES[name].fn
            fn(spark, d).count()  # warm
            m.run(name, lambda fn=fn: fn(spark, d).count())
            spark.catalog.clearCache()


def probe_crawl9(spark, dirs: list[str]) -> None:
    """Round-9 crawl additions at growing corpus, same posture as
    probe_crawl (25-host universe, URLs/entries grow with docs):
    ``robots_gate_wildcards`` — the per-row regexp gate must stay
    URL-proportional in shuffle like robots_gate_rfc (the regex
    translation is in-row; the compile cost prices into the same
    bounded rules-per-host fan-out) — and ``recrawl_schedule`` — the
    sitemap rollup and freshness blend are host equi-joins, so the
    composed plan should track the frontier ladder's input-
    proportional shuffle with a constant host-sized output."""
    from hbase_packet_inspector_spark import plans

    for d in dirs:
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"\n== crawl r9 additions @ {d} ({n} docs)")
        m = StageMeter(spark)
        for name in ("robots_gate_wildcards", "recrawl_schedule"):
            fn = plans.QUERIES[name].fn
            fn(spark, d).count()  # warm
            m.run(name, lambda fn=fn: fn(spark, d).count())
            spark.catalog.clearCache()


def probe_gate_skew(spark, n_urls: int = 500_000) -> None:
    """Hot-host skew probe for the robots gates: the gate docstrings
    claim the per-URL verdict fold absorbs a hot HOST map-side
    (partial+final aggregate, rules-per-host bounded), so a frontier
    with 90% of its URLs on ONE host should cost ~the uniform
    frontier, not serialize on the hot key. Uniform = n_urls spread
    over 25 hosts; skewed = 90% on site0.com, the rest spread. Same
    25-host rule table (3 rules/host incl. a wildcard + an allow) for
    both gates."""
    from hbase_packet_inspector_spark.operators.web import (
        parse_robots_patterns,
        parse_robots_rules,
        robots_gate_rfc,
        robots_gate_wildcards,
    )

    hosts = spark.range(25).select(
        F.concat(F.lit("site"), F.col("id").cast("string"),
                 F.lit(".com")).alias("host"),
        F.lit("User-agent: *\nDisallow: /d\nAllow: /d/keep*\n"
              "Disallow: /*.tmp$\n").alias("robots_txt"),
    )
    rules = parse_robots_rules(hosts).localCheckpoint()
    pats = parse_robots_patterns(hosts).localCheckpoint()

    def frontier(skewed: bool):
        rid = F.col("id")
        h = (
            F.when(rid % 10 < 9, F.lit(0)).otherwise(rid % 25)
            if skewed else rid % 25
        )
        path = (
            F.when(rid % 3 == 0, F.lit("/d/"))
            .when(rid % 3 == 1, F.lit("/d/keep"))
            .otherwise(F.lit("/ok/"))
        )
        return spark.range(n_urls).select(
            F.concat(F.lit("http://site"), h.cast("string"),
                     F.lit(".com"), path, rid.cast("string"),
                     F.when(rid % 7 == 0, F.lit(".tmp"))
                     .otherwise(F.lit(""))).alias("url")
        ).localCheckpoint()

    uni, skw = frontier(False), frontier(True)
    m = StageMeter(spark)
    for label, fr in (("uniform", uni), ("skewed-90pct-one-host", skw)):
        for name, gate, rl in (("robots_gate_rfc", robots_gate_rfc, rules),
                               ("robots_gate_wildcards",
                                robots_gate_wildcards, pats)):
            gate(fr, rl).count()  # warm: codegen compile off the clock
            m.run(f"{name} {label}",
                  lambda gate=gate, fr=fr, rl=rl: gate(fr, rl).count())


def probe_quality(spark, dirs: list[str]) -> None:
    """gopher_quality / c4_quality at growing corpus: both are single
    narrow in-row passes (split/filter/aggregate HOFs over words and
    lines, no shuffle), so wall must track corpus size ~linearly with
    ZERO shuffle at every scale — the claim their docstrings make."""
    from hbase_packet_inspector_spark import plans

    for d in dirs:
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"\n== quality gates @ {d} ({n} docs)")
        m = StageMeter(spark)
        for name in ("gopher_quality", "c4_quality"):
            fn = plans.QUERIES[name].fn

            # fold the keep column: a bare count() lets Catalyst prune
            # every expression and read parquet row-count metadata,
            # timing nothing
            def run(fn=fn):
                return fn(spark, d).agg(
                    F.sum(F.col("keep").cast("long"))).collect()[0][0]

            run()  # warm
            m.run(name, run)
            spark.catalog.clearCache()


def _host_edges(spark, n_hosts: int):
    """Deterministic host link graph: 8 out-links per host; targets spread
    by a hash mix, so in-degree is uneven (natural mild skew) but bounded."""
    return spark.range(8 * n_hosts).select(
        F.concat(F.lit("h"), (F.col("id") % n_hosts).cast("string"))
        .alias("src_host"),
        F.concat(
            F.lit("h"),
            F.pmod(F.xxhash64(F.col("id") * 2654435761), F.lit(n_hosts))
            .cast("string"),
        ).alias("dst_host"),
    )


def probe_pagerank(spark, host_counts: list[int]) -> None:
    from hbase_packet_inspector_spark.operators.web import host_pagerank

    for h in host_counts:
        edges = _host_edges(spark, h).localCheckpoint()
        n_e = edges.count()
        print(f"\n== host_pagerank @ {h} hosts ({n_e} edges, iters=5)")
        m = StageMeter(spark)
        m.run("pagerank 5 rounds",
              lambda: host_pagerank(edges, iters=5).count())
        spark.catalog.clearCache()


def probe_graph9(spark, host_counts: list[int]) -> None:
    """Round-9 graph ops at growing host counts on the same synthetic
    link graph as probe_pagerank: HITS (2 joins + 2 one-row L1 norms
    per round), triangle_count (wedge join bounded by sum(deg^2) of the
    canonical orientation), host_components (hash-min propagation)."""
    from hbase_packet_inspector_spark.operators.web import (
        hits_scores, host_components, triangle_count)

    for h in host_counts:
        edges = _host_edges(spark, h).localCheckpoint()
        n_e = edges.count()
        print(f"\n== graph9 @ {h} hosts ({n_e} edges)")
        m = StageMeter(spark)
        m.run("hits 5 rounds",
              lambda: hits_scores(edges, iters=5).count())
        m.run("triangles",
              lambda: triangle_count(edges).count())
        m.run("components 4 rounds",
              lambda: host_components(edges, iters=4).count())
        spark.catalog.clearCache()


def probe_graph10(spark, host_counts: list[int]) -> None:
    """Round-10 graph op at growing host counts on probe_pagerank's
    synthetic link graph: k_core's per-round cost is two survivor
    semi-joins + a degree count, so shuffle should track edges x rounds
    and wall should stay sublinear in hosts (the same discipline as
    components); peeling depth is fixed at 4."""
    from hbase_packet_inspector_spark.operators.web import k_core

    for h in host_counts:
        edges = _host_edges(spark, h).localCheckpoint()
        n_e = edges.count()
        print(f"\n== graph10 @ {h} hosts ({n_e} edges)")
        m = StageMeter(spark)
        for k in (4, 8):
            m.run(f"k_core k={k}, 4 rounds",
                  lambda k=k: k_core(edges, k=k, iters=4).count())
        spark.catalog.clearCache()


def probe_sketch9(spark, row_counts: list[int]) -> None:
    """Round-9 sketches at growing event counts: the Count-Min build's
    shuffle must stay ~flat (map-side combine caps it at
    partitions*depth*width) while the exact-top-k audit side grows;
    the Bloom filter frame stays <= bits rows regardless of build
    cardinality. Zipf-ish keys via xxhash64 mixing of a squared id."""
    from hbase_packet_inspector_spark.operators.sketch import (
        bloom_join_prune, heavy_hitters_cms)

    for n in row_counts:
        ev = spark.range(n).select(
            F.pmod(F.xxhash64(F.col("id") * F.col("id")), F.lit(n // 100 + 1))
            .alias("user_id")).localCheckpoint()
        print(f"\n== sketch9 @ {n} rows (~{n // 100 + 1} keys)")
        m = StageMeter(spark)
        m.run("cms heavy hitters (w=1024,d=3)",
              lambda: heavy_hitters_cms(
                  ev, "user_id", width=1024, depth=3, k=25).count())
        build = ev.filter(F.col("user_id") % 7 == 0)
        m.run("bloom prune (4096 bits)",
              lambda: bloom_join_prune(
                  ev, "user_id", build, "user_id",
                  bits=4096, hashes=3).count())
        spark.catalog.clearCache()


def probe_basket(spark, order_counts: list[int]) -> None:
    """basket_affinity pairs stage at growing order counts plus one
    mega-basket skew case (SCALE.md r11 entry): within-order pair
    generation is basket-bounded, pair cells catalog-bounded; the skew
    guard at scale is a per-order item cap before the self-join."""
    import time

    from pyspark.sql import functions as F

    def li(n_orders, mega=0):
        o = spark.range(n_orders).select(F.col("id").alias("l_orderkey"))
        items = o.select(
            "l_orderkey",
            F.explode(F.sequence(F.lit(0),
                                 (F.col("l_orderkey") % 5) + 3)).alias("i"),
        ).select(
            "l_orderkey",
            ((F.col("l_orderkey") * 7 + F.col("i") * 131) % 2000)
            .alias("l_partkey"),
        )
        if mega:
            big = spark.range(mega).select(
                F.lit(n_orders + 1).alias("l_orderkey"),
                (F.col("id") % 2000).alias("l_partkey"))
            items = items.union(big)
        return items

    def pairs_stage(items):
        liq = items.distinct()
        a = liq.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("pa"))
        b = liq.select(F.col("l_orderkey").alias("ok"),
                       F.col("l_partkey").alias("pb"))
        return (a.join(b, "ok").filter(F.col("pa") < F.col("pb"))
                .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n_ab")))

    for n in order_counts:
        t0 = time.monotonic()
        rows = pairs_stage(li(n)).count()
        print(f"orders={n}: pair_cells={rows} "
              f"wall={time.monotonic() - t0:.1f}s", flush=True)
    t0 = time.monotonic()
    rows = pairs_stage(li(order_counts[0], mega=5_000)).count()
    print(f"orders={order_counts[0]} + one 2000-item mega-basket: "
          f"pair_cells={rows} wall={time.monotonic() - t0:.1f}s",
          flush=True)


def probe_crawlplan(spark, dirs: list[str]) -> None:
    """Per-stage 1x/10x/100x attribution for the crawl_plan capstone
    (VERDICT_r11 item 2): anchor-signal (URL-link-proportional),
    frontier (pagerank rounds — edge-proportional, host-sized output),
    robots gate (per-URL in-row rules), scheduler (host-partitioned
    URL window) and budget+final joins (host-sized), each cut with an
    EAGER localCheckpoint so stage walls are additive and shuffle
    deltas attributable; then the registered body composed end-to-end
    (lazy cuts, as shipped). Claim probed: every stage's shuffle is
    URL- or edge-linear with host-cardinality frames constant."""
    from hbase_packet_inspector_spark import plans
    from hbase_packet_inspector_spark.operators import web as WB
    from hbase_packet_inspector_spark.plans import dataprep_queries as dq

    for d in dirs:
        base = dq._docs(spark, d)
        n = base.count()
        print(f"\n== crawl_plan @ {d} ({n} docs)")
        m = StageMeter(spark)
        dd = base.select(F.col("doc_id").cast("long").alias("doc_id"))
        sig = fr = gated = sched = None

        def stage_sig():
            nonlocal sig
            sig = WB.anchor_signal(
                WB.extract_anchor_texts(dq._spam_anchor_pages(dd))
            ).localCheckpoint()
            return sig.count()

        def stage_frontier():
            nonlocal fr
            ranks, stats = dq._frontier_inputs(base)
            fr = WB.crawl_frontier(ranks, stats, sig).localCheckpoint()
            return fr.count()

        def stage_gate():
            nonlocal gated
            frontier, robots = dq._robots_inputs(dd)
            gated = WB.robots_gate_rfc(
                frontier, WB.parse_robots_rules(robots)).localCheckpoint()
            return gated.count()

        def stage_sched():
            nonlocal sched
            _, robots = dq._robots_inputs(dd)
            fetches = (
                gated.join(fr.select("host", "status", "priority"), "host")
                .where(~F.col("blocked") & (F.col("status") != "blocked")
                       & (F.col("priority") > 0))
                .select("url", "host")
            )
            sched = WB.schedule_fetches(
                fetches, WB.parse_crawl_delays(robots), default_delay=0.5
            ).localCheckpoint()
            return sched.count()

        def stage_budget():
            alloc = WB.frontier_budget(
                fr, budget=2000, per_host_cap=150).select("host", "alloc")
            return (
                sched.join(fr.select("host", "priority"), "host")
                .join(alloc, "host")
                .select("url", "host", "priority", "alloc", "slot",
                        "crawl_delay", "fetch_at_s",
                        (F.col("slot") < F.col("alloc")).alias("fetch"))
                .count()
            )

        m.run("anchor_signal (URL links)", stage_sig)
        m.run("frontier (pagerank rounds)", stage_frontier)
        m.run("robots_gate_rfc (per-URL)", stage_gate)
        m.run("schedule (host URL window)", stage_sched)
        m.run("budget + final joins", stage_budget)
        spark.catalog.clearCache()

        fn = plans.QUERIES["crawl_plan"].fn
        m.run("COMPOSED (registered body)", lambda: fn(spark, d).count())
        spark.catalog.clearCache()
        # drop the probe's checkpoint blocks before the next scale point
        jm = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = jm.valuesIterator()
        while it.hasNext():
            it.next().unpersist(False)


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    spark = get_probe_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if what == "dedup":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_dedup(spark, dirs)
    elif what == "index":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_index(spark, dirs)
    elif what == "pagerank":
        counts = [int(x) for x in sys.argv[2:]] or [10_000, 100_000, 1_000_000]
        probe_pagerank(spark, counts)
    elif what == "retrieval_pruned":
        dirs = sys.argv[2:] or ["/root/testdata/sf0.1", "/tmp/sfbig10"]
        probe_retrieval_pruned(spark, dirs)
    elif what == "crawl":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_crawl(spark, dirs)
    elif what == "crawlplan":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_crawlplan(spark, dirs)
    elif what == "crawl9":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_crawl9(spark, dirs)
    elif what == "graph9":
        counts = [int(x) for x in sys.argv[2:]] or [10_000, 100_000, 1_000_000]
        probe_graph9(spark, counts)
    elif what == "sketch9":
        counts = [int(x) for x in sys.argv[2:]] or [1_000_000, 10_000_000, 50_000_000]
        probe_sketch9(spark, counts)
    elif what == "graph10":
        counts = [int(x) for x in sys.argv[2:]] or [10_000, 100_000, 1_000_000]
        probe_graph10(spark, counts)
    elif what == "basket":
        counts = [int(x) for x in sys.argv[2:]] or [150_000, 1_500_000, 15_000_000]
        probe_basket(spark, counts)
    elif what == "gate_skew":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
        probe_gate_skew(spark, n)
    elif what == "quality":
        dirs = sys.argv[2:] or [
            "/root/testdata/sf0.1", "/tmp/sfbig10", "/tmp/sfbig100",
        ]
        probe_quality(spark, dirs)
    else:
        raise SystemExit(f"unknown probe {what}")
    spark.stop()


if __name__ == "__main__":
    main()
