"""Relational SQL surface: the query features HPI delegates wholesale to H2
(SURVEY.md §2F — filters, equi/theta joins, hash aggregation, grouping sets,
window functions, top-k, set ops, scalar functions), demonstrated on the
driver's TPC-H-ish tables.

Spark-first notes baked into each query:
- dimension tables (region/nation/supplier/part/customer at these scales)
  are explicitly broadcast — no shuffle on the big fact side;
- aggregations are partial+final hash aggs (map-side combine) for free;
- top-k is orderBy+limit => TakeOrderedAndProject, never a full sort;
- filters sit directly on the scan so Catalyst pushes them into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune_session
from ..sources.tables import load_table
from .num import cents as _cents
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tune_session(spark)
    return [load_table(spark, sf_dir, n) for n in names]


def _revenue_expr():
    """sum(extendedprice * (1-discount)) in exact integer cents*bp, one final
    double division (see plans.num)."""
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    return F.sum(price_c * (100 - disc_c)).cast("double") / 10000


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
             AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000
             AS sum_charge,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_price,
           CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan-filter + hash agg with compound "
    "expressions. Filter sits on the scan (parquet pushdown). All measures "
    "are exact integer-cents sums with one final double division.",
    tags=("tpch", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    price_c = _cents(F.col("l_extendedprice"))
    disc_c = _cents(F.col("l_discount"))
    tax_c = _cents(F.col("l_tax"))
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double") / 1000000).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / (n * 100)).alias("avg_qty"),
            (F.sum(price_c).cast("double") / (n * 100)).alias("avg_price"),
            (F.sum(disc_c).cast("double") / (n * 100)).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "top_revenue_orders",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
             AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: selective dim filter -> broadcast "
    "join into the fact chain -> agg -> top-k. Customer side broadcast; "
    "TakeOrderedAndProject for the limit.",
    tags=("tpch", "join", "topk"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust = cust.where(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(_revenue_expr().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "nation_revenue",
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
             AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style local-supplier volume: 6-table star join. All "
    "dimensions broadcast; the only shuffle is the final small agg.",
    tags=("tpch", "join", "star"),
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    region = region.where(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _revenue_expr().alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "customer_geo_rollup",
    """
    SELECT r_name, n_name,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="Grouping sets: ROLLUP over the geo hierarchy (HPI §2F grouping-sets "
    "row). NULL super-aggregate markers match across engines.",
    tags=("tpch", "rollup"),
)
def customer_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "priority_top_orders",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 5
    """,
    doc="Ranking window: top 5 orders per priority class via rank() — the "
    "partitioned top-k pattern (no global sort).",
    tags=("tpch", "window", "rank"),
)
def priority_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(F.round(F.col("o_totalprice"), 2)), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rnk",
        )
    )


@register(
    "parts_never_returned",
    """
    SELECT l_partkey, l_suppkey FROM lineitem
    EXCEPT
    SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Set operation (EXCEPT DISTINCT): (part, supplier) pairs that were "
    "shipped but never returned (HPI §2F set-ops row).",
    tags=("tpch", "setop"),
)
def parts_never_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # DataFrame.subtract == SQL EXCEPT (distinct semantics)
    return li.select("l_partkey", "l_suppkey").subtract(
        li.where(F.col("l_returnflag") == "R").select("l_partkey", "l_suppkey")
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Anti join: customers with no URGENT order. Spark LEFT ANTI "
    "(broadcast); oracle NOT EXISTS.",
    tags=("tpch", "antijoin"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return cust.join(
        urgent, cust.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "brand_supplier_volume",
    """
    SELECT p_brand, s_name,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000
             AS revenue
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand, s_name
    """,
    doc="TPC-H Q9-style product/supplier profit rollup: two broadcast joins "
    "into the fact table, single agg shuffle.",
    tags=("tpch", "join", "agg"),
)
def brand_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            (F.sum(_cents(F.col("l_quantity"))).cast("double") / 100).alias("sum_qty"),
            _revenue_expr().alias("revenue"),
        )
    )


@register(
    "orders_by_month",
    """
    SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS o_year,
           CAST(date_part('month', o_orderdate) AS INTEGER) AS o_month,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS total,
           CAST(sum(length(o_orderpriority)) AS DOUBLE) / count(*) AS avg_prio_len,
           upper(min(o_orderpriority)) AS min_prio_upper
    FROM orders GROUP BY 1, 2
    """,
    doc="Scalar-function surface (HPI §2F scalar row): date part extraction, "
    "string length/upper, aggregation over expressions.",
    tags=("tpch", "scalar"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100).alias("total"),
            (F.sum(F.length("o_orderpriority")).cast("double") / F.count("*")).alias("avg_prio_len"),
            F.upper(F.min("o_orderpriority")).alias("min_prio_upper"),
        )
    )


@register(
    "acctbal_deciles",
    """
    WITH d AS (
      SELECT c_acctbal, ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT decile, count(*) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_bal
    FROM d GROUP BY decile
    """,
    doc="Distribution analysis: ntile decile bucketing + per-bucket stats. "
    "Global ntile is bounded by customer cardinality; for 100 TB facts the "
    "same shape runs on pre-aggregated keys.",
    tags=("tpch", "window", "ntile"),
)
def acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            (F.sum(_cents(F.col("c_acctbal"))).cast("double") / (F.count("*") * 100)).alias("avg_bal"),
        )
    )


@register(
    "acctbal_deciles_binned",
    """
    WITH c AS (SELECT c_acctbal,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
               FROM customer),
    rng AS (SELECT min(bal_c) AS lo, max(bal_c) AS hi,
                   CASE WHEN max(bal_c) = min(bal_c) THEN 1.0
                        ELSE CAST(max(bal_c) - min(bal_c) AS DOUBLE) END
                       AS span
            FROM c),
    bs AS (SELECT c_acctbal, bal_c,
                  least(CAST(floor((bal_c - lo) / span * 256) AS INTEGER),
                        255) AS bin
           FROM c CROSS JOIN rng),
    h AS (SELECT bin, count(*) AS cnt FROM bs GROUP BY 1),
    cm AS (SELECT bin,
                  CAST(sum(cnt) OVER (ORDER BY bin) AS DOUBLE)
                  / sum(cnt) OVER () AS frac
           FROM h),
    q AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5,
                         0.6, 0.7, 0.8, 0.9]) AS p),
    sel AS (SELECT p, min(bin) AS bin
            FROM q JOIN cm ON frac >= p GROUP BY 1),
    cuts AS (SELECT lo + (bin + 1) / 256.0 * span AS edge
             FROM sel CROSS JOIN rng),
    asn AS (SELECT c_acctbal, bal_c,
                   1 + (SELECT count(*) FROM cuts
                        WHERE bs.bal_c > cuts.edge) AS decile
            FROM bs)
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
           CAST(sum(bal_c) AS DOUBLE) / (count(*) * 100) AS avg_bal
    FROM asn GROUP BY 1
    """,
    doc="The SCALE path for distribution-decile analysis — "
    "acctbal_deciles' docstring prose ('for 100 TB facts the same "
    "shape runs on pre-aggregated keys') upgraded to a registered "
    "histogram-cutpoint query that needs NO global sort even on raw "
    "rows: decile boundaries from a 256-bin fixed-width histogram "
    "over exact integer cents (min/max pass + mergeable bin counts; "
    "only the histogram rides the driver), assignment a narrow scan "
    "against 9 broadcast cutpoint literals, then the same per-decile "
    "stats (count, min/max balance, avg via exact cents). Deciles are "
    "uneven by up to one bin's occupancy — n_customers surfaces the "
    "calibration error; the gate_cutoffs_binned / rfm_segments_binned "
    "discipline.",
    tags=("tpch", "warehouse", "calibration", "sketch", "scale-twin"),
)
def acctbal_deciles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    c = cust.select(
        "c_acctbal", _cents(F.col("c_acctbal")).alias("bal_c")).persist()
    lo, hi = c.agg(F.min("bal_c"), F.max("bal_c")).first()
    span = float(hi - lo) or 1.0
    b = F.least(
        F.floor((F.col("bal_c") - F.lit(lo)) / F.lit(span) * 256)
        .cast("int"),
        F.lit(255),
    )
    hist = {
        r.bin: r.cnt
        for r in c.groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(hist.values())
    cuts = []
    for j in range(1, 10):
        p, cum = j / 10, 0
        for bin_ in sorted(hist):
            cum += hist[bin_]
            if cum / total >= p:
                cuts.append(lo + (bin_ + 1) / 256 * span)
                break
    carr = F.array(*[F.lit(float(x)) for x in cuts])
    out = (
        c.select(
            "c_acctbal", "bal_c",
            (F.lit(1) + F.size(
                F.filter(carr,
                         lambda e: F.col("bal_c").cast("double") > e)))
            .alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            (F.sum("bal_c").cast("double")
             / (F.count(F.lit(1)) * 100)).alias("avg_bal"),
        )
    )
    c.unpersist()
    return out


@register(
    "min_cost_supplier",
    """
    WITH cost AS (SELECT l_partkey, l_suppkey,
                         min(CAST(round(l_extendedprice * 100) AS BIGINT))
                             AS cost_cents
                  FROM lineitem GROUP BY 1, 2),
    best AS (SELECT l_partkey, min(cost_cents) AS min_cost
             FROM cost GROUP BY 1),
    pick AS (SELECT c.l_partkey, min(c.l_suppkey) AS l_suppkey,
                    b.min_cost
             FROM cost c JOIN best b
               ON b.l_partkey = c.l_partkey AND c.cost_cents = b.min_cost
             GROUP BY 1, 3)
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
           pick.min_cost AS min_cost_cents
    FROM pick
    JOIN part p ON p.p_partkey = pick.l_partkey
    JOIN supplier s ON s.s_suppkey = pick.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type IN ('ECONOMY', 'PROMO')
    """,
    doc="Minimum-cost supplier per part — the TPC-H Q2 correlated-"
    "subquery shape (argmin per group + dimension enrichment), priced "
    "from lineitem since the driver's tables carry no partsupp: per "
    "(part, supplier) the cheapest observed extended price in exact "
    "integer cents, the per-part minimum re-joined to select the "
    "winning supplier with min(s_suppkey) as the deterministic "
    "tie-break, then supplier/nation broadcast in for names; the "
    "part-type filter pushed to the part scan. Plan: two partial+final aggs "
    "riding one (part, supplier) shuffle, an equi self-join on "
    "(part, cost) instead of a window (no per-part sort), and "
    "broadcast dimension joins — the fact side shuffles once.",
    tags=("tpch", "join", "argmin"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nat = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation")
    # One explicit hash exchange on l_partkey carries the whole argmin
    # chain (r13): partitioning on the part key satisfies the
    # (part, supplier) aggregate (subset rule), the per-part minimum,
    # AND the cost=min equi self-join — no further exchange — while
    # keeping the chain's parallelism pinned (AQE's byte-based
    # coalescing would fold the small post-shuffle frames to one task
    # per stage; explicit counts are exempt).
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cost = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .repartition(nparts, "l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_cents(F.col("l_extendedprice"))).alias("cost_cents"))
    )
    best = cost.groupBy("l_partkey").agg(
        F.min("cost_cents").alias("min_cost")).withColumnRenamed(
        "l_partkey", "_bpk")
    pick = (
        cost.join(best,
                  (F.col("l_partkey") == F.col("_bpk"))
                  & (F.col("cost_cents") == F.col("min_cost")))
        .groupBy("l_partkey", "min_cost")
        .agg(F.min("l_suppkey").alias("l_suppkey"))
    )
    return (
        pick.join(F.broadcast(part.where(F.col("p_type").isin("ECONOMY", "PROMO"))),
                  pick.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), pick.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name",
                F.col("min_cost").alias("min_cost_cents"))
    )


@register(
    "rfm_segments",
    """
    WITH c AS (SELECT o_custkey,
                      max(o_orderdate) AS last_order,
                      count(*) AS n_orders,
                      sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS cents
               FROM orders GROUP BY 1),
    s AS (SELECT o_custkey, cents,
                 ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
                 ntile(5) OVER (ORDER BY n_orders, o_custkey) AS f_score,
                 ntile(5) OVER (ORDER BY cents, o_custkey) AS m_score
          FROM c)
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
    FROM s GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation (Hughes 1994) — the classic warehouse "
    "customer-value cube: per buying customer recency (last order "
    "date), frequency (order count), monetary (lifetime spend in "
    "exact integer cents), each quintiled 1-5 (5 = most recent / "
    "frequent / valuable), rolled up to segment cells with exact "
    "counts and ONE double division for avg spend. Determinism: "
    "every ntile orders by (metric, o_custkey) — a total order, so "
    "quintile boundaries are engine-exact; spend stays integer cents "
    "until the final division (num.py). Plan: one orders groupBy to "
    "the customer frame, then three global ntiles — bounded by "
    "CUSTOMER cardinality, never fact rows (acctbal_deciles' "
    "rationale; at 100 TB swap to approx_percentile cutoffs joined "
    "broadcast, trading exact boundaries for no global sort), then "
    "one partial+final rollup over at most 125 cells.",
    tags=("tpch", "window", "ntile", "warehouse"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("cents"),
    )
    s = c.select(
        "cents",
        F.ntile(5).over(
            Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(5).over(
            Window.orderBy("n_orders", "o_custkey")).alias("f_score"),
        F.ntile(5).over(
            Window.orderBy("cents", "o_custkey")).alias("m_score"),
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)))
        .alias("avg_cents"),
    )


def _rfm_binned_metric_sql(col: str, tag: str) -> str:
    """One metric's histogram -> quintile-cutpoint CTE chain for the
    rfm_segments_binned oracle: 256-bin fixed-width histogram over the
    customer frame, cutpoint(p) = upper edge of the first bin whose
    ascending cumulative fraction reaches p (the gate_cutoffs_binned
    arithmetic, so every double op matches the Spark driver's Python
    float computation bit-for-bit)."""
    return f"""
    {tag}rng AS (SELECT min({col}) AS lo, max({col}) AS hi,
                 CASE WHEN max({col}) = min({col}) THEN 1.0
                      ELSE CAST(max({col}) - min({col}) AS DOUBLE) END
                     AS span
          FROM c),
    {tag}b AS (SELECT least(CAST(floor(({col} - lo) / span * 256)
                                 AS INTEGER), 255) AS bin
        FROM c CROSS JOIN {tag}rng),
    {tag}h AS (SELECT bin, count(*) AS cnt FROM {tag}b GROUP BY 1),
    {tag}cm AS (SELECT bin,
                  CAST(sum(cnt) OVER (ORDER BY bin) AS DOUBLE)
                  / sum(cnt) OVER () AS frac
         FROM {tag}h),
    {tag}sel AS (SELECT p, min(bin) AS bin
          FROM q JOIN {tag}cm ON frac >= p GROUP BY 1),
    {tag}cut AS (SELECT lo + (bin + 1) / 256.0 * span AS edge
          FROM {tag}sel CROSS JOIN {tag}rng)"""


@register(
    "rfm_segments_binned",
    f"""
    WITH c AS (SELECT o_custkey,
                      datediff('day', DATE '1970-01-01',
                               max(o_orderdate)) AS r_days,
                      count(*) AS n_orders,
                      sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS cents
               FROM orders GROUP BY 1),
    q AS (SELECT unnest([0.2, 0.4, 0.6, 0.8]) AS p),
    {_rfm_binned_metric_sql('r_days', 'r')},
    {_rfm_binned_metric_sql('n_orders', 'f')},
    {_rfm_binned_metric_sql('cents', 'm')},
    asn AS (SELECT c.cents,
                   1 + (SELECT count(*) FROM rcut
                        WHERE c.r_days > rcut.edge) AS r_score,
                   1 + (SELECT count(*) FROM fcut
                        WHERE c.n_orders > fcut.edge) AS f_score,
                   1 + (SELECT count(*) FROM mcut
                        WHERE c.cents > mcut.edge) AS m_score
            FROM c)
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
    FROM asn GROUP BY 1, 2, 3
    """,
    doc="The SCALE path for RFM segmentation — rfm_segments' docstring "
    "prose ('at 100 TB swap to approx cutoffs joined broadcast') as a "
    "registered, hash-verified query: each metric's quintile "
    "boundaries come from a 256-bin fixed-width histogram (min/max "
    "pass + mergeable bin-count aggregate; only 3x256 histogram rows "
    "ride the driver — the gate_cutoffs_binned discipline), recency "
    "as integer epoch days, and scoring is a NARROW scan comparing "
    "each customer against 4 broadcast cutpoint literals per metric "
    "(score = 1 + #cutpoints exceeded) — NO global window anywhere "
    "in the plan, so the shape survives 10^9 customers. Boundaries "
    "are conservative by at most one bin width (quintiles slightly "
    "uneven under ties — n_customers per cell makes the calibration "
    "error visible); spend stays exact integer cents until the one "
    "double division.",
    tags=("tpch", "warehouse", "calibration", "sketch", "scale-twin"),
)
def rfm_segments_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01"))
        .alias("r_days"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("cents"),
    ).persist()

    # TWO driver-synchronous jobs instead of six (r12): all three
    # metrics' min/max in ONE aggregate, then all three 256-bin
    # histograms in ONE (metric, bin) aggregate over a 3x-exploded
    # projection of the persisted customer frame — the per-metric
    # values, bins and counts are identical to the former per-metric
    # jobs; only the job count changes (each extra job was a full
    # scheduler round-trip on a host-sized cached frame)
    metrics = ("r_days", "n_orders", "cents")
    ext = c.agg(*[f(m) for m in metrics for f in (F.min, F.max)]).first()
    rng = {m: (ext[2 * i], ext[2 * i + 1]) for i, m in enumerate(metrics)}

    def _bin(col: str) -> Column:
        lo, hi = rng[col]
        span = float(hi - lo) or 1.0
        return F.least(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(span) * 256)
            .cast("int"),
            F.lit(255),
        )

    hists: dict[str, dict] = {m: {} for m in metrics}
    for r in (
        c.select(F.explode(F.array(*[
            F.struct(F.lit(m).alias("metric"), _bin(m).alias("bin"))
            for m in metrics
        ])).alias("mb"))
        .groupBy(F.col("mb.metric").alias("metric"),
                 F.col("mb.bin").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    ):
        hists[r.metric][r.bin] = r.cnt

    def _cutpoints(col: str) -> list[float]:
        lo, _hi = rng[col]
        span = float(_hi - lo) or 1.0
        hist = hists[col]
        total = sum(hist.values())
        cuts = []
        for j in (1, 2, 3, 4):
            p, cum = j / 5, 0
            for bin_ in sorted(hist):
                cum += hist[bin_]
                if cum / total >= p:
                    cuts.append(lo + (bin_ + 1) / 256 * span)
                    break
        return cuts

    def _score(col: str, cuts: list[float]):
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        return F.lit(1) + F.size(
            F.filter(arr, lambda e: F.col(col).cast("double") > e))

    rc, fc, mc = (_cutpoints(m) for m in ("r_days", "n_orders", "cents"))
    s = c.select(
        "cents",
        _score("r_days", rc).alias("r_score"),
        _score("n_orders", fc).alias("f_score"),
        _score("cents", mc).alias("m_score"),
    )
    out = s.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)))
        .alias("avg_cents"),
    )
    c.unpersist()
    return out


@register(
    "q22_idle_customers",
    """
    WITH cut AS (SELECT max(o_orderdate) - INTERVAL 365 DAY AS c
                 FROM orders),
    pos AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                   c_custkey, c_nationkey
            FROM customer
            WHERE c_acctbal > 0.0),
    a AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM pos),
    idle AS (SELECT p.c_custkey, p.c_nationkey, p.bal_c
             FROM pos p CROSS JOIN a CROSS JOIN cut
             WHERE p.bal_c * a.n > a.s
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = p.c_custkey
                                 AND o.o_orderdate >= cut.c))
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(bal_c) AS DOUBLE) / 100 AS total_acctbal
    FROM idle JOIN nation n ON n.n_nationkey = idle.c_nationkey
    GROUP BY 1
    """,
    doc="Lapsed high-value customers — the TPC-H Q22 shape (scalar "
    "above-average filter + NOT EXISTS anti-join) pointed at the "
    "win-back report a warehouse actually runs: customers with "
    "above-average positive account balance and NO order in the final "
    "365 days of the data, rolled up per nation. The above-average "
    "comparison is EXACT integer arithmetic (bal*n > sum over cents — "
    "no float average, so boundary customers agree across engines); "
    "the recency cutoff is one 1-row max aggregate (collected as a "
    "scalar, the sufficient-statistic discipline) pushed as a "
    "PARTITION-PRUNABLE literal filter into the orders scan before "
    "the LEFT ANTI on customer key; the 25-nation dimension "
    "broadcasts. One double division at the end.",
    tags=("tpch", "antijoin", "subquery", "warehouse"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    cust, orders, nation = _t(spark, sf_dir, "customer", "orders", "nation")
    max_date = orders.agg(F.max("o_orderdate")).first()[0]
    if max_date is None:  # empty orders: empty report, not a TypeError
        return spark.createDataFrame(
            [], "n_name string, n_customers bigint, total_acctbal double")
    cut = max_date - _dt.timedelta(days=365)
    pos = cust.where(F.col("c_acctbal") > 0.0).select(
        "c_custkey", "c_nationkey",
        _cents(F.col("c_acctbal")).alias("bal_c"),
    )
    a = pos.agg(F.sum("bal_c").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"))
    recent_buyers = (
        orders.where(F.col("o_orderdate") >= F.lit(cut))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    idle = (
        pos.crossJoin(F.broadcast(a))
        .where(F.col("bal_c") * F.col("n") > F.col("s"))
        .join(recent_buyers, "c_custkey", "left_anti")
    )
    return (
        idle.join(F.broadcast(nation),
                  idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum("bal_c").cast("double") / 100).alias("total_acctbal"),
        )
    )


@register(
    "basket_affinity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM li),
    pc AS (SELECT l_partkey, count(*) AS n_p FROM li GROUP BY 1),
    pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  count(*) AS n_ab
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2),
    f AS (SELECT part_a, part_b, n_ab FROM pr WHERE n_ab >= 2)
    SELECT f.part_a, f.part_b, CAST(f.n_ab AS BIGINT) AS n_ab,
           CAST(pa.n_p AS BIGINT) AS n_a, CAST(pb.n_p AS BIGINT) AS n_b,
           n.n_orders,
           CAST(f.n_ab * n.n_orders AS DOUBLE) / (pa.n_p * pb.n_p)
               AS lift,
           CAST(f.n_ab AS DOUBLE) / pa.n_p AS conf_a_to_b
    FROM f JOIN pc pa ON pa.l_partkey = f.part_a
           JOIN pc pb ON pb.l_partkey = f.part_b
           CROSS JOIN n
    """,
    doc="Market-basket association rules (Agrawal 1993's support/"
    "confidence/lift over order baskets) — the co-purchase affinity "
    "report a warehouse ships beside RFM: for every part pair that "
    "co-occurs in >= 2 orders, the co-count, each part's basket "
    "count, lift = (n_ab*N)/(n_a*n_b) vs independence and the "
    "a->b confidence. Plan: ONE distinct projection of lineitem, a "
    "self-join on the ORDER key (pairs per order = C(items,2) — "
    "basket-bounded, never parts^2; a mega-basket is the skew case "
    "and gets the salting treatment at scale), a pair groupBy whose "
    "support filter prunes the long tail before the two part-count "
    "joins (AQE broadcasts the part side), and the order total as a "
    "1-row broadcast. All counts exact integers; lift/confidence are "
    "single double divisions (num.py).",
    tags=("tpch", "warehouse", "similarity", "report"),
)
def basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # Explicit hash repartition on the ORDER key before the distinct
    # (r13): the basket frame is byte-small but the self-join below is
    # CPU-dense (C(items,2) pairs per order), so AQE's byte-based
    # coalescing would serialize it; the explicit count is exempt. It
    # also REMOVES two exchanges outright: partitioning by l_orderkey
    # satisfies the (l_orderkey, l_partkey) distinct (subset rule,
    # partial+final agg in place) and co-partitions BOTH sides of the
    # basket self-join, so only the pair aggregate re-shuffles.
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    li = (
        lineitem.select("l_orderkey", "l_partkey")
        .repartition(nparts, "l_orderkey")
        .distinct()
    )
    n = li.agg(F.countDistinct("l_orderkey").cast("bigint")
               .alias("n_orders"))
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("part_b"))
    pr = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"),
                   F.col("n_p").alias("_na"))
    pb = pc.select(F.col("l_partkey").alias("part_b"),
                   F.col("n_p").alias("_nb"))
    return (
        pr.join(pa, "part_a").join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("_na").cast("bigint").alias("n_a"),
            F.col("_nb").cast("bigint").alias("n_b"),
            "n_orders",
            ((F.col("n_ab") * F.col("n_orders")).cast("double")
             / (F.col("_na") * F.col("_nb"))).alias("lift"),
            (F.col("n_ab").cast("double") / F.col("_na"))
            .alias("conf_a_to_b"),
        )
    )


@register(
    "order_lineitem_counts",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(n_items) AS BIGINT) AS total_items,
           CAST(sum(n_items) AS DOUBLE) / count(*) AS avg_items
    FROM (
      SELECT o.o_orderkey, o.o_orderstatus, count(l.l_orderkey) AS n_items
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderstatus
    ) GROUP BY o_orderstatus
    """,
    doc="Left outer join + two-level aggregation (order fan-out stats); "
    "exercises join null-handling and re-aggregation.",
    tags=("tpch", "outerjoin", "agg"),
)
def order_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy(orders.o_orderkey, "o_orderstatus")
        .agg(F.count(li.l_orderkey).alias("n_items"))
    )
    return (
        per_order.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("n_items").cast("long").alias("total_items"),
            (F.sum("n_items").cast("double") / F.count("*")).alias("avg_items"),
        )
    )


@register(
    "parts_both_flags_intersect",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    doc="INTERSECT set op (HPI §2F set-ops row): parts that appear both "
    "returned and accepted. Complements the EXCEPT in parts_never_returned; "
    "Spark plans it as a left-semi hash join over distinct keys.",
    tags=("tpch", "setop", "intersect"),
)
def parts_both_flags_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


@register(
    "lineitem_status_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets: all 2^2 aggregation granularities in one pass "
    "(partial aggregation expands grouping sets map-side; one shuffle). "
    "NULL marks the rolled-up dimensions, as in ANSI CUBE.",
    tags=("tpch", "rollup", "cube"),
)
def lineitem_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        (F.sum(_cents(F.col("l_quantity"))).cast("double") / 100).alias("sum_qty"),
    )


@register(
    "customer_order_gaps",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
             lag(CAST(epoch(o_orderdate) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_epoch,
             lead(o_orderkey)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS next_orderkey
      FROM orders)
    SELECT o_custkey, o_orderkey, order_epoch, prev_epoch, next_orderkey,
           CAST((order_epoch - prev_epoch) // 86400 AS BIGINT) AS gap_days
    FROM seq WHERE prev_epoch IS NOT NULL AND o_custkey % 50 = 0
    """,
    doc="lead/lag analytic windows (HPI §2F window row): per-customer order "
    "sequence with inter-order gap in whole days. One shuffle on the window "
    "partition key; epochs as bigint so output is timezone-independent.",
    tags=("tpch", "window", "lag"),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    epoch = F.unix_timestamp("o_orderdate")
    out = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            epoch.alias("order_epoch"),
            F.lag(epoch).over(w).alias("prev_epoch"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
    )
    return (
        out.where(F.col("prev_epoch").isNotNull() & (F.col("o_custkey") % 50 == 0))
        .withColumn(
            "gap_days",
            ((F.col("order_epoch") - F.col("prev_epoch")) / 86400).cast("long"),
        )
    )


@register(
    "quantity_outliers",
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity
    FROM lineitem l
    WHERE 10 * CAST(round(l.l_quantity * 100) AS BIGINT)
          * (SELECT count(*) FROM lineitem i WHERE i.l_partkey = l.l_partkey)
        > 18 * (SELECT sum(CAST(round(i.l_quantity * 100) AS BIGINT))
                FROM lineitem i WHERE i.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape — correlated scalar subquery against a per-part "
    "average. Spark side is written DECORRELATED by hand (per-part agg + "
    "broadcast-eligible equi join), which is also what Catalyst rewrites "
    "correlated subqueries into; the oracle keeps the correlated form to "
    "prove equivalence. The comparison (qty > 1.8 * avg) runs in exact "
    "cross-multiplied integer math, so no engine disagrees on ties.",
    tags=("tpch", "subquery", "join"),
)
def quantity_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    per_part = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.count("*").alias("n_items"), F.sum(qty_c).alias("sum_qty_c")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.p_key)
        .where(10 * qty_c * F.col("n_items") > 18 * F.col("sum_qty_c"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "big_ticket_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="EXISTS semi-join (complement of the anti-join in "
    "customers_without_orders): customers with at least one 400k+ order. "
    "Spark: filter pushed to the orders scan, then LeftSemi hash join — "
    "probe side never duplicates customer rows.",
    tags=("tpch", "semijoin", "subquery"),
)
def big_ticket_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "important_stock",
    """
    WITH pv AS (SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS cents
                FROM lineitem GROUP BY 1),
    t AS (SELECT sum(cents) AS total, count(*) AS np FROM pv)
    SELECT pv.l_partkey,
           CAST(pv.cents AS DOUBLE) / 100 AS revenue,
           CAST(pv.cents * 100000 AS DOUBLE) / t.total AS share_bp10
    FROM pv CROSS JOIN t
    WHERE pv.cents * t.np * 10 > t.total * 12
    """,
    doc="TPC-H Q11 shape: per-part revenue filtered by a GLOBAL scalar "
    "threshold (> 1.2x the average part share — scale-free, so the "
    "predicate selects at every SF) — the plan where a 1-row aggregate "
    "re-enters as a broadcast against the grouped frame and the "
    "HAVING predicate runs against it (the sanctioned 1-row cross "
    "join; Catalyst plans the scalar side once, not per row). Exact "
    "integer cents throughout: the threshold compare is integer "
    "(cents*np*10 > total*12), the emitted share is one exact-integer "
    "division in tenth-basis-points, unrounded.",
    tags=("tpch", "agg", "scalar-subquery"),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .alias("cents"))
    t = pv.agg(F.sum("cents").alias("total"),
               F.count(F.lit(1)).alias("np"))
    return (
        pv.crossJoin(F.broadcast(t))
        .filter(F.col("cents") * F.col("np") * 10 > F.col("total") * 12)
        .select(
            "l_partkey",
            (F.col("cents").cast("double") / 100).alias("revenue"),
            ((F.col("cents") * 100000).cast("double") / F.col("total"))
            .alias("share_bp10"),
        )
    )


@register(
    "revenue_rollup",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2
                + grouping(o_orderpriority) AS INTEGER) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical ROLLUP with grouping_id (the Expand plan shape "
    "lineitem_status_cube's CUBE also exercises, here with the "
    "subtotal LEVELS pinned explicitly): per (status, priority), per "
    "status, and grand total in one pass — each input row expands to "
    "3 grouping sets, partial+final agg on the expanded keys. "
    "grouping() flags are CAST into a stable gid so NULL-vs-'ALL' "
    "ambiguity (a real NULL key would alias a subtotal row) is "
    "resolved the way the SQL standard intends. Exact integer cents.",
    tags=("tpch", "agg", "rollup"),
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100)
            .alias("total_price"),
            (F.grouping("o_orderstatus") * 2
             + F.grouping("o_orderpriority")).cast("int").alias("gid"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL"))
            .alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL"))
            .alias("priority"),
            "gid", "n_orders", "total_price",
        )
    )


@register(
    "monthly_growth",
    """
    WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                          AS month_start,
                      sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS cents,
                      count(*) AS n_orders
               FROM orders GROUP BY 1)
    SELECT CAST(strftime(month_start, '%Y-%m') AS VARCHAR) AS month,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(cents - lag(cents) OVER (ORDER BY month_start)
                AS DOUBLE)
               / lag(cents) OVER (ORDER BY month_start) AS mom_growth
    FROM m
    """,
    doc="Month-over-month revenue growth: the BI staple that chains a "
    "calendar rollup into a lag ratio — monthly exact-cent totals, "
    "then (this - prev)/prev over the month sequence (NULL on the "
    "first month; one exact-integer-difference division, unrounded). "
    "The lag window runs over the POST-AGG month frame — "
    "calendar-bounded, never order-sized (the rate_zscore shape), so "
    "the 'global' window is ~tens of rows by construction; month "
    "labels emitted as strings to be timezone/date-type-proof across "
    "engines.",
    tags=("tpch", "timeseries", "window", "agg"),
)
def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date")
            .alias("month_start"))
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).alias("cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month_start")
    prev = F.lag("cents").over(w)
    return m.select(
        F.date_format("month_start", "yyyy-MM").alias("month"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
        (F.col("cents").cast("double") / 100).alias("revenue"),
        ((F.col("cents") - prev).cast("double") / prev)
        .alias("mom_growth"),
    )


@register(
    "open_orders_timeline",
    """
    WITH mx AS (SELECT l_orderkey, max(l_shipdate) AS e
                FROM lineitem GROUP BY 1),
    iv AS (SELECT CAST(date_part('year', o.o_orderdate) * 12
                       + date_part('month', o.o_orderdate) - 1 AS BIGINT)
               AS m0,
                  CAST(date_part('year', mx.e) * 12
                       + date_part('month', mx.e) - 1 AS BIGINT) AS m1
           FROM orders o JOIN mx ON mx.l_orderkey = o.o_orderkey),
    ev AS (SELECT m0 AS mi, 1 AS delta FROM iv
           UNION ALL SELECT m1 + 1, -1 FROM iv),
    g AS (SELECT mi, sum(delta) AS d FROM ev GROUP BY 1),
    c AS (SELECT mi, sum(d) OVER (ORDER BY mi) AS n_open FROM g)
    SELECT printf('%04d-%02d', mi // 12, mi % 12 + 1) AS month,
           CAST(n_open AS BIGINT) AS n_open
    FROM c
    """,
    doc="Open-orders-over-time — interval counting restated as a "
    "+1/-1 EVENT SWEEP: each order is open from its order month "
    "through its last ship month (max l_shipdate); instead of a "
    "month x order interval-stabbing range join (months x orders "
    "pairs), emit +1 at the start month and -1 after the end month, "
    "aggregate deltas per month, and one running sum over the "
    "CALENDAR-BOUNDED month frame yields concurrent-open counts — "
    "the standard trick that turns quadratic interval overlap into "
    "one groupBy + one tiny window at any scale. Month arithmetic is "
    "pure integers (year*12 + month - 1); labels printf'd to be "
    "date-type-proof; counts exact.",
    tags=("tpch", "timeseries", "window", "interval"),
)
def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    mx = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("e"))
    mi0 = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
           ).cast("long")
    mi1 = (F.year("e") * 12 + F.month("e") - 1).cast("long")
    iv = orders.join(mx, orders.o_orderkey == mx.l_orderkey).select(
        mi0.alias("m0"), mi1.alias("m1"))
    ev = iv.select(F.col("m0").alias("mi"), F.lit(1).alias("delta")).union(
        iv.select((F.col("m1") + 1).alias("mi"), F.lit(-1).alias("delta")))
    g = ev.groupBy("mi").agg(F.sum("delta").alias("d"))
    c = g.select(
        "mi", F.sum("d").over(Window.orderBy("mi")).alias("n_open"))
    return c.select(
        F.format_string("%04d-%02d", (F.col("mi") / 12).cast("long"),
                        F.pmod(F.col("mi"), F.lit(12)) + 1).alias("month"),
        F.col("n_open").cast("bigint").alias("n_open"),
    )


@register(
    "ship_delay_profile",
    """
    WITH j AS (SELECT datediff('day', o.o_orderdate, l.l_shipdate)
                   AS delay_days,
                  CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
               FROM lineitem l JOIN orders o
                 ON o.o_orderkey = l.l_orderkey),
    b AS (SELECT CASE WHEN delay_days < 0 THEN -1
                      ELSE delay_days // 7 END AS delay_weeks,
                 price_c
          FROM j)
    SELECT delay_weeks,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(price_c) AS DOUBLE) / (count(*) * 100) AS avg_price
    FROM b GROUP BY 1
    """,
    doc="Order-to-ship latency profile — the fulfillment SLA histogram "
    "a warehouse tracks weekly: every lineitem joined to its order, "
    "delay = shipdate - orderdate in integer days, bucketed by week "
    "(negative delays — data-quality escapes — get their own -1 "
    "bucket instead of polluting week 0), with item counts and the "
    "average item price per bucket (late-shipping bias toward "
    "cheap/expensive items shows here). Plan: the canonical "
    "fact-to-fact equi-join on the order key (co-partitioned at "
    "scale via bucketing on o_orderkey/l_orderkey — the engine's DDL "
    "analog proves the Exchange-free version), a narrow derived "
    "dimension, one partial+final rollup onto week-bounded cells; "
    "integer datediff both engines, cents exact until ONE double "
    "division.",
    tags=("tpch", "join", "warehouse", "report"),
)
def ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    j = lineitem.join(orders,
                      lineitem.l_orderkey == orders.o_orderkey).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .alias("delay_days"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    b = j.select(
        F.when(F.col("delay_days") < 0, F.lit(-1))
        .otherwise(F.floor(F.col("delay_days") / 7)).alias("delay_weeks"),
        "price_c",
    )
    return b.groupBy("delay_weeks").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        (F.sum("price_c").cast("double") / (F.count(F.lit(1)) * 100))
        .alias("avg_price"),
    )


@register(
    "hhi_market_share",
    """
    WITH sr AS (SELECT s.s_nationkey, l.l_suppkey,
                       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                           AS rev_c
                FROM lineitem l JOIN supplier s
                  ON s.s_suppkey = l.l_suppkey
                GROUP BY 1, 2),
    agg AS (SELECT s_nationkey,
                   CAST(count(*) AS BIGINT) AS n_suppliers,
                   sum(rev_c) AS tot,
                   sum(CAST(rev_c AS HUGEINT) * rev_c) AS sumsq
            FROM sr GROUP BY 1)
    SELECT n.n_name,
           agg.n_suppliers,
           CAST(agg.tot AS DOUBLE) / 100 AS total_revenue,
           CAST(agg.sumsq AS DOUBLE)
               / (CAST(agg.tot AS DOUBLE) * CAST(agg.tot AS DOUBLE))
               AS hhi
    FROM agg JOIN nation n ON n.n_nationkey = agg.s_nationkey
    """,
    doc="Herfindahl-Hirschman market concentration per nation — the "
    "antitrust-grade concentration index (sum of squared supplier "
    "revenue shares, 1/n..1) that tells a sourcing analyst which "
    "national supply markets are monopolized vs fragmented. Stated "
    "share-free for exactness: HHI = sum(rev^2) / tot^2 over exact "
    "integer cents, so no per-supplier float shares accumulate — "
    "DuckDB's BIGINT sums promote to HUGEINT and Spark's sum of "
    "bigint*bigint products stays exact at these magnitudes (rev_c^2 "
    "~1e18 per supplier at sf0.1; widen the product to decimal(38,0) "
    "beyond ~1e9 cents/supplier, the value_corr lesson), and the "
    "division happens once on the final doubles. Plan: fact scan -> "
    "broadcast supplier join -> (nation, supplier) partial+final agg "
    "-> 25-row nation rollup -> broadcast dim join.",
    tags=("tpch", "warehouse", "stats", "report"),
)
def hhi_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "nation")
    sr = (
        lineitem.join(F.broadcast(supplier),
                      lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("rev_c"))
    )
    d = F.col("rev_c").cast("decimal(38,0)")
    agg = sr.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev_c").alias("tot"),
        F.sum(d * d).alias("sumsq"),
    )
    return (
        agg.join(F.broadcast(nation),
                 agg.s_nationkey == nation.n_nationkey)
        .select(
            "n_name", "n_suppliers",
            (F.col("tot").cast("double") / 100).alias("total_revenue"),
            (F.col("sumsq").cast("double")
             / (F.col("tot").cast("double") * F.col("tot").cast("double")))
            .alias("hhi"),
        )
    )


@register(
    "spend_lorenz_binned",
    """
    WITH c AS (SELECT o_custkey,
                      sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS cents
               FROM orders GROUP BY 1),
    rng AS (SELECT min(cents) AS lo, max(cents) AS hi,
                   CASE WHEN max(cents) = min(cents) THEN 1.0
                        ELSE CAST(max(cents) - min(cents) AS DOUBLE) END
                       AS span
            FROM c),
    b AS (SELECT least(CAST(floor((cents - lo) / span * 256) AS INTEGER),
                       255) AS bin,
                 cents
          FROM c CROSS JOIN rng),
    g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(cents) AS BIGINT) AS bin_cents
          FROM b GROUP BY 1),
    cum AS (SELECT bin, n_customers, bin_cents,
                   CAST(sum(n_customers) OVER (ORDER BY bin) AS BIGINT)
                       AS cum_n,
                   CAST(sum(bin_cents) OVER (ORDER BY bin) AS BIGINT)
                       AS cum_cents,
                   CAST(sum(n_customers) OVER () AS BIGINT) AS tot_n,
                   CAST(sum(bin_cents) OVER () AS BIGINT) AS tot_cents
            FROM g)
    SELECT bin, n_customers, bin_cents,
           CAST(cum_n AS DOUBLE) / tot_n AS cum_pop_share,
           CAST(cum_cents AS DOUBLE) / tot_cents AS cum_spend_share
    FROM cum
    """,
    doc="Binned Lorenz curve of customer lifetime spend — the revenue-"
    "concentration report ('the top x% of customers carry y% of "
    "revenue') that sets every account-tiering and retention budget; "
    "the exact curve needs a GLOBAL RANK of customers by spend, which "
    "is precisely the shape that dies at 10^9 customers, so this is "
    "the histogram restatement: customers land in 256 fixed-width "
    "spend bins (lo/max/span from a 1-row aggregate joined broadcast "
    "— fully distributed, nothing collected), per-bin counts and "
    "exact-cents sums, then cumulative population/spend shares via "
    "windows over the CONSTANT 256-row bin frame. All cumulative "
    "sums are exact integers; the two shares are single double "
    "divisions (num.py). Curve granularity is one bin of spend "
    "width — n_customers per bin makes the resolution visible.",
    tags=("tpch", "warehouse", "calibration", "sketch", "scale-twin"),
)
def spend_lorenz_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    rng = c.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi"),
        F.when(F.max("cents") == F.min("cents"), F.lit(1.0))
        .otherwise((F.max("cents") - F.min("cents")).cast("double"))
        .alias("span"),
    )
    b = c.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor((F.col("cents") - F.col("lo"))
                    / F.col("span") * 256).cast("int"),
            F.lit(255),
        ).alias("bin"),
        "cents",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("bin_cents"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return g.select(
        "bin", "n_customers", "bin_cents",
        (F.sum("n_customers").over(w).cast("double")
         / F.sum("n_customers").over(w_all)).alias("cum_pop_share"),
        (F.sum("bin_cents").over(w).cast("double")
         / F.sum("bin_cents").over(w_all)).alias("cum_spend_share"),
    )


@register(
    "pareto_frontier",
    """
    WITH p AS (SELECT o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                      CAST(floor(epoch(o_orderdate)) AS BIGINT) AS d
               FROM orders),
    mm AS (SELECT min(pc) AS lo, max(pc) AS hi FROM p),
    b AS (SELECT p.*,
                 CAST(least((pc - lo) * 256 // (hi - lo + 1), 255)
                      AS INTEGER) AS bin
          FROM p, mm),
    bd AS (SELECT bin, max(d) AS md FROM b GROUP BY 1),
    m AS (SELECT bin,
                 max(md) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING) AS mprev
          FROM bd),
    cand AS (SELECT b.o_orderkey, b.pc, b.d
             FROM b JOIN m USING (bin)
             WHERE m.mprev IS NULL OR b.d > m.mprev),
    e AS (SELECT *,
            max(d) OVER (ORDER BY pc RANGE BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS mc,
            max(d) OVER (PARTITION BY pc) AS ms
          FROM cand)
    SELECT o_orderkey, CAST(pc AS DOUBLE) / 100 AS price,
           CAST(d AS BIGINT) AS order_epoch
    FROM e WHERE (mc IS NULL OR mc < d) AND ms <= d
    """,
    doc="Pareto frontier (skyline, Borzsony 2001) of orders on "
    "(cheaper price, more recent date): an order is on the frontier "
    "iff no other order has price <= AND date >= with at least one "
    "strict — the best-value curve a buyer-side report draws. "
    "Duplicate (price, date) points all stay (neither strictly "
    "dominates), stated. Plan: the BNL/window skyline is restated "
    "with the binned-envelope prefilter — 256 price bins from a "
    "1-row min/max broadcast (integer bin edges, spend_lorenz's "
    "rule), per-bin max date (256-row frame), running max over the "
    "CONSTANT bin frame, broadcast back: an order survives only if "
    "its date beats every strictly-cheaper BIN's best date. "
    "Dominators of survivors provably survive too (a pruned "
    "dominator's bin evidence also prunes the dominated row), so the "
    "exact pass — two windows over the CANDIDATE frame only: "
    "max(date) RANGE-to-price-minus-1 for strictly-cheaper, "
    "per-price-partition max for same-price — never misses. "
    "Candidates are the bin-frontier envelope (output-bounded, not "
    "corpus-bounded, on any non-adversarial distribution; the "
    "inherent skyline worst case IS the full table when price and "
    "date are perfectly anti-correlated). All comparisons on integer "
    "cents / floored epoch seconds.",
    tags=("tpch", "skyline", "window", "report"),
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, = _t(spark, sf_dir, "orders")
    p = orders.select(
        "o_orderkey",
        _cents(F.col("o_totalprice")).alias("pc"),
        F.col("o_orderdate").cast("long").alias("d"),
    )
    mm = p.agg(F.min("pc").alias("lo"), F.max("pc").alias("hi"))
    b = p.crossJoin(F.broadcast(mm)).select(
        "o_orderkey", "pc", "d",
        F.least(F.expr("(pc - lo) * 256 DIV (hi - lo + 1)"), F.lit(255))
        .cast("int").alias("bin"),
    )
    bd = b.groupBy("bin").agg(F.max("d").alias("md"))
    wprev = (Window.orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, -1))
    m = bd.select("bin", F.max("md").over(wprev).alias("mprev"))
    cand = (
        b.join(F.broadcast(m), "bin")
        .where(F.col("mprev").isNull() | (F.col("d") > F.col("mprev")))
        .select("o_orderkey", "pc", "d")
    )
    wc = (Window.orderBy("pc")
          .rangeBetween(Window.unboundedPreceding, -1))
    ws = Window.partitionBy("pc")
    e = cand.select(
        "o_orderkey", "pc", "d",
        F.max("d").over(wc).alias("mc"),
        F.max("d").over(ws).alias("ms"),
    )
    return (
        e.where((F.col("mc").isNull() | (F.col("mc") < F.col("d")))
                & (F.col("ms") <= F.col("d")))
        .select(
            "o_orderkey",
            (F.col("pc").cast("double") / 100).alias("price"),
            F.col("d").cast("bigint").alias("order_epoch"),
        )
    )


@register(
    "supplier_ship_intervals",
    """
    WITH w AS (SELECT l_suppkey, o_orderdate AS a, l_shipdate AS b
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE o_orderdate <= l_shipdate),
    o AS (SELECT *,
                 max(b) OVER (PARTITION BY l_suppkey ORDER BY a, b
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pmax
          FROM w),
    i AS (SELECT *, CASE WHEN pmax IS NULL OR a > pmax THEN 1 ELSE 0 END
                      AS brk
          FROM o),
    g AS (SELECT *,
                 sum(brk) OVER (PARTITION BY l_suppkey ORDER BY a, b
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS isl
          FROM i),
    isl AS (SELECT l_suppkey, isl, min(a) AS st, max(b) AS en,
                   count(*) AS n
            FROM g GROUP BY 1, 2)
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(date_diff('day', st, en) + 1) AS BIGINT)
             AS covered_days,
           CAST(max(date_diff('day', st, en) + 1) AS BIGINT)
             AS max_island_days,
           CAST(sum(n) AS BIGINT) AS n_shipments
    FROM isl GROUP BY 1
    """,
    doc="Per-supplier shipping-activity intervals via gaps-and-islands "
    "interval COALESCING — the one classic interval shape the library "
    "lacked (open_orders_timeline STABS intervals at grid points, "
    "session_concurrency grids them; this MERGES overlapping/touching "
    "[shipdate, receiptdate] intervals into maximal busy islands and "
    "reports islands, covered days, and the longest streak — the "
    "utilization/coverage report shape). The interval is order-placed "
    "to shipped ([o_orderdate, l_shipdate], one fact-fact equi join "
    "on orderkey; rows with shipdate before orderdate are excluded "
    "defensively). Plan: one window sort per "
    "supplier partition computes the running max end over strictly "
    "preceding rows; a new island starts where the current start "
    "exceeds it; the island id is the running sum of those breaks — "
    "both windows share one (suppkey)-partitioned sort, so the whole "
    "query is ONE shuffle on suppkey + two tiny groupBys. Partitions "
    "are supplier-sized (fact/suppliers rows), never global: at 100 TB "
    "the sort parallelism grows with the supplier dimension. "
    "Determinism: identical (ship, receipt) tie rows are "
    "interchangeable under running-max, so cross-engine sort-tie order "
    "cannot change islands; day math is exact integer datediff.",
    tags=("tpch", "window", "interval", "islands"),
)
def supplier_ship_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    w = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .where(F.col("o_orderdate") <= F.col("l_shipdate"))
        .select(
            "l_suppkey",
            F.col("o_orderdate").alias("a"),
            F.col("l_shipdate").alias("b"),
        )
    )
    ws = Window.partitionBy("l_suppkey").orderBy("a", "b")
    o = w.withColumn(
        "pmax", F.max("b").over(ws.rowsBetween(Window.unboundedPreceding, -1))
    )
    i = o.withColumn(
        "brk",
        F.when(F.col("pmax").isNull() | (F.col("a") > F.col("pmax")), 1)
        .otherwise(0),
    )
    g = i.withColumn(
        "isl",
        F.sum("brk").over(ws.rowsBetween(Window.unboundedPreceding, 0)),
    )
    isl = g.groupBy("l_suppkey", "isl").agg(
        F.min("a").alias("st"), F.max("b").alias("en"),
        F.count(F.lit(1)).alias("n"),
    )
    days = F.datediff(F.col("en"), F.col("st")) + 1
    return isl.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(days).cast("bigint").alias("covered_days"),
        F.max(days).cast("bigint").alias("max_island_days"),
        F.sum("n").cast("bigint").alias("n_shipments"),
    )


# Deterministic Poisson(1) draw from a 12-bit md5 slice: integer
# thresholds floor(CDF * 2^12) so both engines compare the same ints.
# 12 bits keeps the ladder within 1/4096 of the true CDF (bootstrap
# weights don't need more) and lets ONE md5 feed ten draws (32 hex
# chars -> 10 x 3-char slices), so 64 replicates cost 7 md5s per row
# instead of 64 — the hash was >80% of the exploded stage's CPU.
_POIS_T = (1506, 3013, 3767, 4018, 4081)


def _pois_case_sql(c: str) -> str:
    return (
        f"CASE WHEN {c} < {_POIS_T[0]} THEN 0 "
        f"WHEN {c} < {_POIS_T[1]} THEN 1 "
        f"WHEN {c} < {_POIS_T[2]} THEN 2 "
        f"WHEN {c} < {_POIS_T[3]} THEN 3 "
        f"WHEN {c} < {_POIS_T[4]} THEN 4 ELSE 5 END"
    )


def _hex3_int_sql(expr: str) -> str:
    """DuckDB: a 3-hex-char slice -> 12-bit int (instr('123..f', ch)
    decodes one hex digit; '0' returns 0)."""
    return (
        "("
        + " + ".join(
            f"instr('123456789abcdef', substr({expr}, {i + 1}, 1))"
            f" * {16 ** (2 - i)}"
            for i in range(3)
        )
        + ")"
    )


@register(
    "bootstrap_price_ci",
    f"""
    WITH b AS (SELECT unnest(range(0, 64)) AS idx),
    h AS (SELECT o_orderpriority,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                 [{", ".join(
                     f"md5('boot{j}:' || CAST(o_orderkey AS VARCHAR))"
                     for j in range(7))}] AS hs
          FROM orders),
    d AS (SELECT o_orderpriority, idx + 1 AS rep, pc,
                 {_pois_case_sql(_hex3_int_sql(
                     "substr(hs[idx // 10 + 1], "
                     "(idx % 10) * 3 + 1, 3)"))} AS w
          FROM h CROSS JOIN b),
    m AS (SELECT o_orderpriority, rep,
                 CAST(sum(w * pc) AS DOUBLE)
                   / (CAST(sum(w) AS DOUBLE) * 100) AS mean_price
          FROM d WHERE w > 0 GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY mean_price, rep) AS rk
          FROM m),
    s AS (SELECT o_orderpriority,
                 min(CASE WHEN rk = 2 THEN mean_price END) AS lo,
                 min(CASE WHEN rk = 32 THEN mean_price END) AS m32,
                 min(CASE WHEN rk = 33 THEN mean_price END) AS m33,
                 min(CASE WHEN rk = 63 THEN mean_price END) AS hi
          FROM r GROUP BY 1),
    pt AS (SELECT o_orderpriority,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS DOUBLE) / (count(*) * 100) AS full_mean
           FROM orders GROUP BY 1)
    SELECT s.o_orderpriority,
           round(pt.full_mean, 6) AS mean_price,
           round(s.lo, 6) AS boot_lo,
           round((s.m32 + s.m33) / 2, 6) AS boot_median,
           round(s.hi, 6) AS boot_hi
    FROM s JOIN pt USING (o_orderpriority)
    """,
    doc="Percentile-bootstrap confidence interval for mean order price "
    "per priority via the POISSON BOOTSTRAP (Chamandy et al. 2012; "
    "Efron 1979 resampling restated for one-pass distributed data): "
    "instead of resampling n rows WITH replacement (which needs global "
    "coordination), each row enters replicate b with multiplicity ~ "
    "Poisson(1) — drawn DETERMINISTICALLY from integer thresholds "
    "floor(CDF*2^12) over salted md5 bits of (rep, orderkey), the "
    "engine-portable no-RNG discipline; SEVEN md5s per row each feed "
    "ten 12-bit slices (the r12 rewrite — per-(row,rep) md5 was >80% "
    "of the exploded stage's CPU at 9.6M draws; 1/4096 CDF "
    "granularity is far inside bootstrap noise). B=64 replicates "
    "explode map-side and collapse in the SAME stage's partial "
    "aggregate "
    "(weighted sums in exact integer cents), so the shuffle carries "
    "only priorities x 64 partial rows — replication is never "
    "materialized across the wire. CI bounds are ORDER STATISTICS of "
    "the 64 replicate means (ranks 2 / 32+33 / 63 ~ 2.5th/50th/97.5th "
    "pct): exact value picks, immune to cross-engine summation-order "
    "drift (each replicate mean is one int/int IEEE division, "
    "identical on any engine — plans/num.py discipline). The window "
    "ranks 64 rows per priority partition, never data. Truncating the "
    "Poisson at 5 (CDF 0.9996) is shared by construction between "
    "engines.",
    tags=("tpch", "bootstrap", "statistics", "sampling"),
)
def bootstrap_price_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, = _t(spark, sf_dir, "orders")
    # r12 shape (measured 23.1 s -> ~1 s at sf0.1, two compounding
    # fixes):
    #
    # 1. PARALLELISM. The sf0.1 orders scan is one small parquet file =
    #    ONE scan task, and the whole 64x exploded weight pipeline ran
    #    on a single core while 31 idled. Repartition by o_orderkey
    #    right after the read (guide-§2.5 input-skew fix; the shuffle
    #    moves ~5 MB of raw rows, orders of magnitude cheaper than the
    #    hashing it parallelizes — the shingle _spread discipline).
    # 2. CODEGEN. The weights were built pre-explode through nested
    #    higher-order transform() lambdas, which evaluate INTERPRETED
    #    (outside whole-stage codegen) and were additionally duplicated
    #    wholesale below the Generate by InferFiltersFromGenerate as a
    #    `size(ws) > 0` filter — every row paid the md5+slice pipeline
    #    twice, interpreted, on one core. Now: a LITERAL sequence(0,63)
    #    explodes (size(sequence) constant-folds, nothing for the
    #    filter-inference rule to duplicate), the child projection
    #    below the Generate converts each md5 ONCE per row into two
    #    60-bit bigints (14 convs/row; CollapseProject cannot merge a
    #    projection through a Generate), and each draw's 12-bit slice
    #    is a shiftright+mask on the exploded rows — every expression
    #    plain codegen'd primitive work.
    #
    # Value-identical to the substr/conv-per-draw form: slice k of an
    # md5's first 30 hex chars is bits (k%5*12)..(k%5*12+11) of the
    # 15-hex-char half cast to a 60-bit integer (verified 320/320
    # replicate means equal; the DuckDB oracle keeps the per-draw
    # substr form).
    convs = ",".join(
        f"cast(conv(substr(md5(concat('boot{j}:', "
        f"cast(o_orderkey as string))), {off}, 15), 16, 10) as bigint)"
        for j in range(7) for off in (1, 16)
    )
    c = ("cast(shiftright(element_at(hv, cast(idx div 10 as int) * 2"
         " + cast((idx % 10) div 5 as int) + 1),"
         " (4 - cast(idx % 10 as int) % 5) * 12) & 4095 as int)")
    ladder = "+".join(f"cast(c_>={t} as int)" for t in _POIS_T)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        orders.repartition(nparts, "o_orderkey")
        .select(
            "o_orderpriority",
            _cents(F.col("o_totalprice")).alias("pc"),
            F.expr(f"array({convs})").alias("hv"),
        )
        .select(
            "o_orderpriority", "pc", "hv",
            F.posexplode(F.expr("sequence(0, 63)")).alias("idx", "_z"),
        )
        .select(
            "o_orderpriority", "pc", "idx", F.expr(c).alias("c_"),
        )
        .select(
            "o_orderpriority", "pc",
            (F.col("idx") + 1).alias("rep"),
            F.expr(ladder).alias("w"),
        )
        .where(F.col("w") > 0)
    )
    m = d.groupBy("o_orderpriority", "rep").agg(
        (F.sum(F.col("w") * F.col("pc")).cast("double")
         / (F.sum("w").cast("double") * 100)).alias("mean_price")
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("mean_price", "rep")
    r = m.withColumn("rk", F.row_number().over(wr))
    s = r.groupBy("o_orderpriority").agg(
        F.min(F.when(F.col("rk") == 2, F.col("mean_price"))).alias("lo"),
        F.min(F.when(F.col("rk") == 32, F.col("mean_price"))).alias("m32"),
        F.min(F.when(F.col("rk") == 33, F.col("mean_price"))).alias("m33"),
        F.min(F.when(F.col("rk") == 63, F.col("mean_price"))).alias("hi"),
    )
    pt = orders.groupBy("o_orderpriority").agg(
        (F.sum(_cents(F.col("o_totalprice"))).cast("double")
         / (F.count(F.lit(1)) * 100)).alias("full_mean")
    )
    return s.join(pt, "o_orderpriority").select(
        "o_orderpriority",
        F.round("full_mean", 6).alias("mean_price"),
        F.round("lo", 6).alias("boot_lo"),
        F.round((F.col("m32") + F.col("m33")) / 2, 6).alias("boot_median"),
        F.round("hi", 6).alias("boot_hi"),
    )


@register(
    "km_repurchase_survival",
    """
    WITH o AS (SELECT o_custkey, o_orderdate,
                      lead(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate,
                                              o_orderkey) AS nxt
               FROM orders),
    mx AS (SELECT max(o_orderdate) AS mend FROM orders),
    obs AS (SELECT CASE WHEN nxt IS NOT NULL
                        THEN least(date_diff('day', o_orderdate, nxt)
                                   // 7, 103)
                        ELSE least(date_diff('day', o_orderdate, mend)
                                   // 7, 103) END AS wk,
                   CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM o, mx),
    agg AS (SELECT CAST(wk AS INTEGER) AS wk,
                   CAST(sum(ev) AS BIGINT) AS d,
                   CAST(sum(1 - ev) AS BIGINT) AS c
            FROM obs GROUP BY 1),
    tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM agg),
    risk AS (SELECT agg.wk, agg.d, agg.c,
                    tot.n - CAST(coalesce(
                        sum(agg.d + agg.c) OVER (ORDER BY agg.wk
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
             FROM agg, tot),
    f AS (SELECT *,
                 CASE WHEN d < n_risk
                      THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                      END AS lnf,
                 CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS hit0
          FROM risk),
    s AS (SELECT wk, n_risk, d, c,
                 CASE WHEN max(hit0) OVER (ORDER BY wk
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) = 1 THEN 0.0
                      ELSE exp(sum(lnf) OVER (ORDER BY wk
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)) END AS surv
          FROM f)
    SELECT wk, CAST(n_risk AS BIGINT) AS n_risk, d AS d_repurchase,
           c AS c_censored, round(surv, 6) AS km_survival
    FROM s
    """,
    doc="Kaplan-Meier repurchase-survival curve (Kaplan & Meier 1958) "
    "— the churn/retention estimator done RIGHT-CENSORED: each "
    "customer's gap to their next order is an observed repurchase "
    "event; the open gap from their last order to the corpus end is a "
    "CENSORED observation (the naive 'average gap' metric silently "
    "drops these and biases retention optimistic — censoring is the "
    "entire point of KM). Time is bucketed to weeks capped at 103 "
    "(the constant-domain discipline), S(t) = prod_(s<=t) "
    "(1 - d_s/n_s) evaluated as exp of the running sum of "
    "ln(1 - d/n) with an explicit zero-factor guard (d = n_risk "
    "collapses survival to exactly 0 thereafter, where ln is "
    "undefined). d/n is an exact int/int division; ln/exp are rounded "
    "6 at the boundary (the 1-ulp rule). Plan: the per-customer lead "
    "window partitions by custkey (customer-parallel), the corpus end "
    "is a 1-row broadcast, and every KM window runs over the CONSTANT "
    "<=104-row week frame — survival analysis at 100 TB costs one "
    "customer-keyed sort plus dimension-sized arithmetic.",
    tags=("tpch", "survival", "window", "statistics", "binned"),
)
def km_repurchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, = _t(spark, sf_dir, "orders")
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                 "o_orderkey")
    o = orders.select(
        "o_custkey", "o_orderdate",
        F.lead("o_orderdate").over(wl).alias("nxt"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("mend"))
    obs = o.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("nxt").isNotNull(),
            F.least(F.floor(F.datediff("nxt", "o_orderdate") / 7),
                    F.lit(103)),
        ).otherwise(
            F.least(F.floor(F.datediff("mend", "o_orderdate") / 7),
                    F.lit(103)),
        ).cast("int").alias("wk"),
        F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    agg = obs.groupBy("wk").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = agg.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n"))
    wprev = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, -1)
    wcur = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    risk = agg.crossJoin(F.broadcast(tot)).select(
        "wk", "d", "c",
        (F.col("n") - F.coalesce(
            F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0)
        ).cast("bigint")).alias("n_risk"),
    )
    f = risk.select(
        "wk", "d", "c", "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
        ).alias("lnf"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("hit0"),
    )
    s = f.select(
        "wk", "n_risk", "d", "c",
        F.when(F.max("hit0").over(wcur) == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum("lnf").over(wcur))).alias("surv"),
    )
    return s.select(
        "wk",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("d_repurchase"),
        F.col("c").alias("c_censored"),
        F.round("surv", 6).alias("km_survival"),
    )


@register(
    "theil_decomposition",
    """
    WITH cs AS (SELECT c.c_custkey, n.n_name,
                       CAST(sum(CAST(round(o.o_totalprice * 100)
                                     AS BIGINT)) AS BIGINT) AS xc
                FROM customer c
                JOIN nation n ON n.n_nationkey = c.c_nationkey
                JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2),
    g AS (SELECT n_name, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(xc) AS BIGINT) AS sg
          FROM cs GROUP BY 1),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                   CAST(sum(sg) AS BIGINT) AS s
            FROM g),
    tw AS (SELECT cs.n_name,
                  sum((CAST(cs.xc AS DOUBLE) / g.sg)
                      * ln(CAST(cs.xc AS DOUBLE) * g.ng / g.sg))
                    AS twsum
           FROM cs JOIN g USING (n_name)
           WHERE cs.xc > 0
           GROUP BY 1)
    SELECT g.n_name, g.ng AS n_customers,
           round(CAST(g.sg AS DOUBLE) / (g.ng * 100), 6) AS mean_spend,
           round(CAST(g.sg AS DOUBLE) / tot.s, 6) AS spend_share,
           round((CAST(g.sg AS DOUBLE) / tot.s) * tw.twsum, 6)
             AS theil_within,
           round((CAST(g.sg AS DOUBLE) / tot.s)
                 * ln((CAST(g.sg AS DOUBLE) / g.ng)
                      / (CAST(tot.s AS DOUBLE) / tot.n)), 6)
             AS between_term
    FROM g JOIN tw USING (n_name) CROSS JOIN tot
    """,
    doc="Theil-T inequality decomposition (Theil 1967) of customer "
    "spend across nations — the inequality index the Lorenz/HHI "
    "family lacks: Theil is exactly ADDITIVELY DECOMPOSABLE, "
    "T = sum_g share_g * T_g + sum_g share_g * ln(mu_g/mu), so each "
    "nation reports its spend-share-weighted WITHIN-group inequality "
    "and its BETWEEN-group term, and the two columns sum to the "
    "corpus Theil (the identity a test pins) — 'is spend inequality "
    "driven inside markets or between them', the question "
    "spend_lorenz_binned's single curve can't answer. Per-group "
    "sums-of-x-ln-x are the one float accumulation in the registry's "
    "statistics family: ln values are irrational (never on a "
    "round-6 boundary), terms are O(1), and groups are "
    "customer-sized, so partition-order drift is ~1e-13 against a "
    "5e-7 rounding quantum — documented, not accidental. Everything "
    "else is exact integer cents. Plan: one fact shuffle to customer "
    "spend, one to nation aggregates; nation frames join the 1-row "
    "corpus total broadcast (source_token_mix's rationale).",
    tags=("tpch", "statistics", "inequality"),
)
def theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, orders = _t(spark, sf_dir, "customer", "nation",
                                  "orders")
    cs = (
        customer.join(F.broadcast(nation),
                      customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "n_name")
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("bigint").alias("xc"))
    )
    g = cs.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("xc").cast("bigint").alias("sg"),
    )
    tot = g.agg(F.sum("ng").cast("bigint").alias("n"),
                F.sum("sg").cast("bigint").alias("s"))
    tw = (
        cs.join(g.select("n_name", "ng", "sg"), "n_name")
        .where(F.col("xc") > 0)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("xc").cast("double") / F.col("sg"))
                * F.log(F.col("xc").cast("double") * F.col("ng")
                        / F.col("sg"))
            ).alias("twsum")
        )
    )
    return (
        g.join(tw, "n_name")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            F.col("ng").alias("n_customers"),
            F.round(F.col("sg").cast("double") / (F.col("ng") * 100), 6)
            .alias("mean_spend"),
            F.round(F.col("sg").cast("double") / F.col("s"), 6)
            .alias("spend_share"),
            F.round(
                (F.col("sg").cast("double") / F.col("s")) * F.col("twsum"),
                6,
            ).alias("theil_within"),
            F.round(
                (F.col("sg").cast("double") / F.col("s"))
                * F.log(
                    (F.col("sg").cast("double") / F.col("ng"))
                    / (F.col("s").cast("double") / F.col("n"))
                ), 6
            ).alias("between_term"),
        )
    )


@register(
    "benford_digit_audit",
    """
    WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                           AS INTEGER) AS digit
               FROM orders
               WHERE o_totalprice > 0),
    o AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed
          FROM d GROUP BY 1),
    dig AS (SELECT unnest(range(1, 10)) AS digit),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM o),
    j AS (SELECT dig.digit,
                 CAST(coalesce(o.observed, 0) AS BIGINT) AS observed,
                 tot.n,
                 log10(1.0 + 1.0 / dig.digit) AS p
          FROM dig LEFT JOIN o USING (digit) CROSS JOIN tot)
    SELECT digit, observed,
           round(n * p, 6) AS expected,
           round(CAST(observed AS DOUBLE) / n, 6) AS obs_share,
           round(p, 6) AS benford_share,
           round((observed - n * p) * (observed - n * p) / (n * p), 6)
             AS chi2_contrib
    FROM j
    """,
    doc="Benford first-digit audit (Newcomb 1881 / Benford 1938; the "
    "standard forensic-accounting screen): leading digits of "
    "naturally-grown monetary amounts follow log10(1+1/d), and a "
    "fabricated or truncated feed shows up as per-digit chi-square "
    "excess — run on order totals as the data-QUALITY gate a pipeline "
    "applies to financial fact feeds (complements psi_drift_binned's "
    "two-sample drift: this tests against a fixed REFERENCE law, no "
    "second cohort needed). The digit grid is materialized (all nine "
    "digits report even at zero observations); the leading digit "
    "comes from the exact integer-cents string, never float "
    "formatting; expected shares are one log10 per digit (1-ulp "
    "rule -> round 6). Sum of chi2_contrib vs the chi-square(8) "
    "critical value is the consumer's one fold. Plan: one partial+ "
    "final digit histogram + a 1-row total broadcast onto the "
    "constant 9-row frame.",
    tags=("tpch", "statistics", "audit"),
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, = _t(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(_cents(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").alias("digit")
    )
    o = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint")
                               .alias("observed"))
    dig = (
        orders.sparkSession.range(1, 10)
        .select(F.col("id").cast("int").alias("digit"))
    )
    tot = o.agg(F.sum("observed").cast("bigint").alias("n"))
    j = (
        dig.join(F.broadcast(o), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("bigint")
            .alias("observed"),
            "n",
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")).alias("p"),
        )
    )
    dev = F.col("observed") - F.col("n") * F.col("p")
    return j.select(
        "digit", "observed",
        F.round(F.col("n") * F.col("p"), 6).alias("expected"),
        F.round(F.col("observed").cast("double") / F.col("n"), 6)
        .alias("obs_share"),
        F.round("p", 6).alias("benford_share"),
        F.round(dev * dev / (F.col("n") * F.col("p")), 6)
        .alias("chi2_contrib"),
    )
