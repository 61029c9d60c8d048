"""Event-stream analytics: the HPI canonical workload (SURVEY.md §2F) over
the driver's ``events`` table (event_id, ts, user_id, event_type, value, props).

The mapping (FIXTURES.md §4): event_type ≅ rpc method, user_id ≅ client,
value ≅ size/elapsed. Each query here is the Spark-first expression of a
query HPI users run against the H2 tables (traffic per method, latency
percentiles, top-N hot keys, per-second series, request↔response as-of
correlation, scanner-state enrichment, distinct clients).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune_session
from ..sources.tables import load_table
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "events")


from .num import cents as _cents  # noqa: E402


@register(
    "traffic_per_method",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_value
    FROM events GROUP BY event_type
    """,
    doc="QPS/traffic per method: groupBy + count/sum (HPI §2F row 1).",
    tags=("events", "agg"),
)
def traffic_per_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    sc = F.sum(_cents(F.col("value")))
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (sc.cast("double") / 100).alias("total_value"),
            (sc.cast("double") / (F.count("*") * 100)).alias("avg_value"),
        )
    )


@register(
    "latency_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Latency percentiles per method (HPI §2F row 2). Exact interpolated "
    "percentile on both engines (linear interpolation semantics match).",
    tags=("events", "agg", "percentile"),
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
    )


@register(
    "top_hot_users",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT 25
    """,
    doc="Top-N hot clients (HPI §2F row 3): agg + TakeOrderedAndProject. "
    "Deterministic tie-break on user_id.",
    tags=("events", "topk"),
)
def top_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents(F.col("value"))).cast("double") / 100).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(25)
    )


@register(
    "events_per_minute",
    f"""
    SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS minute_epoch,
           event_type,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    doc="Per-minute time series per method (HPI §2F tumbling window row). "
    "Bucket emitted as epoch seconds — timezone-proof across engines.",
    tags=("events", "window-agg", "timeseries"),
)
def events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    minute = (F.floor(F.col("ts").cast("long") / 60) * 60).cast("long")
    return (
        ev.groupBy(minute.alias("minute_epoch"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "event_type_share",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
    FROM events GROUP BY event_type
    """,
    doc="Traffic share per method: window-over-aggregate. The global window "
    "runs over #distinct-methods rows (post-agg), so it is scale-safe.",
    tags=("events", "agg", "window"),
)
def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    total = F.sum("n_events").over(Window.partitionBy())
    return agg.withColumn(
        "share", F.col("n_events").cast("double") / total.cast("double")
    )


@register(
    "distinct_users_by_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Client activity distinct counts (HPI §2F approx-distinct row; exact "
    "variant for oracle parity — approx_count_distinct offered in bench).",
    tags=("events", "distinct"),
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "sessionize",
    """
    WITH g AS (
      SELECT user_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT user_id,
           CAST(sum(brk) + 1 AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
    doc="Sessionization: 30-min-gap session breaks per client via lag + "
    "running count (HPI 'slow-scan sessions' analog). One shuffle on user_id.",
    tags=("events", "window", "sessionize"),
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    epoch = F.col("ts").cast("long")
    brk = F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(0)
    return (
        ev.withColumn("brk", brk)
        .groupBy("user_id")
        .agg(
            (F.sum("brk") + F.lit(1)).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "asof_correlate",
    """
    WITH t AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             max(CASE WHEN event_type = 'click'
                      THEN CAST(floor(epoch(ts)) AS BIGINT) END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ep
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN click_ep IS NOT NULL AND ep - click_ep <= 3600
                THEN ep - click_ep END AS elapsed_s,
           CASE WHEN click_ep IS NOT NULL AND ep - click_ep <= 3600
                THEN 'correlated' ELSE 'unknown' END AS status
    FROM t WHERE event_type = 'purchase'
    """,
    doc="Request↔response AS-OF correlation (SURVEY.md §2 B6/B7/B9/B10): each "
    "'purchase' matches the nearest PRIOR 'click' of the same user within a "
    "3600s TTL, else method='unknown' — the exact semantics HPI applies to "
    "RPC call_id reuse + state expiry. Implemented without a join: running "
    "max of the tagged timestamp over an event-ordered window (the timestamp "
    "is monotone in the window order, so max == last). Single shuffle on the "
    "correlation key; no join explosion at scale.",
    tags=("events", "asof", "correlation"),
)
def asof_correlate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ep = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ep = F.max(F.when(F.col("event_type") == "click", ep)).over(w)
    # NB: the final select must reference the materialized columns (F.col),
    # not the window expression objects — re-using the expressions after the
    # filter would re-evaluate the window over purchase-only rows.
    matched = F.col("click_ep").isNotNull() & (
        (F.col("ep") - F.col("click_ep")) <= 3600
    )
    return (
        ev.withColumn("ep", ep)
        .withColumn("click_ep", click_ep)
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.when(matched, F.col("ep") - F.col("click_ep")).alias("elapsed_s"),
            F.when(matched, F.lit("correlated")).otherwise("unknown").alias("status"),
        )
    )


@register(
    "scanner_enrich",
    """
    WITH t AS (
      SELECT event_id, user_id, event_type,
             max(CASE WHEN event_type = 'signup'
                      THEN event_id * 1000 + CAST(json_extract_string(props, '$.k') AS BIGINT) END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS packed
      FROM events
    )
    SELECT event_id, user_id,
           packed % 1000 AS session_key,
           CAST(floor(packed / 1000) AS BIGINT) AS from_event
    FROM t WHERE event_type = 'purchase'
    """,
    doc="Scanner-session enrichment (SURVEY.md §2 B8 batch analog): later "
    "events inherit attributes of the session-opening event — here each "
    "'purchase' inherits k from the user's last prior 'signup'. Arg-max via "
    "a packed (event_id*1000+k) running max: the portable, single-window "
    "form of last(col, ignorenulls) when the order key is monotone.",
    tags=("events", "state-machine", "window"),
)
def scanner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = F.max(
        F.when(F.col("event_type") == "signup", F.col("event_id") * 1000 + k)
    ).over(w)
    return (
        ev.withColumn("packed", packed)
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (F.col("packed") % 1000).alias("session_key"),
            F.floor(F.col("packed") / 1000).cast("long").alias("from_event"),
        )
    )


@register(
    "json_props_bucket",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100) AS avg_value
    FROM events GROUP BY 1
    """,
    doc="Semi-structured extraction (HPI Kafka-JSON sink analog, §2 D9/E6): "
    "parse the JSON props payload JVM-side and aggregate.",
    tags=("events", "json"),
)
def json_props_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(_cents(F.col("value"))).cast("double") / (F.count("*") * 100)).alias("avg_value"),
        )
    )


@register(
    "value_histogram",
    """
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
           count(*) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1
    """,
    doc="Fixed-width histogram of message sizes (HPI traffic distribution).",
    tags=("events", "agg"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "rolling_avg_per_user",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / (count(*) OVER w * 100) AS rolling_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    doc="Per-client rolling mean over the last 10 events (frame-spec window; "
    "HPI 'slow-scan sessions' row of §2F). Exact integer-cents sum over the "
    "frame, one final division — engine-independent doubles.",
    tags=("events", "window", "frame"),
)
def rolling_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-9, 0)
    s = F.sum(_cents(F.col("value"))).over(w)
    n = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (s.cast("double") / (n * 100)).alias("rolling_avg"),
    )


_ETYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "user_event_pivot",
    f"""
    SELECT user_id % 100 AS cohort,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _ETYPES)}
    FROM events GROUP BY 1
    """,
    doc="Pivot / crosstab: per-cohort event-type counts as columns "
    "(Spark groupBy().pivot() with an explicit value list — one shuffle, "
    "no second pass to discover distinct keys; ANSI equivalent is "
    "count(*) FILTER per column).",
    tags=("events", "pivot", "agg"),
)
def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy((F.col("user_id") % 100).alias("cohort"))
        .pivot("event_type", list(_ETYPES))
        .count()
        .na.fill(0, list(_ETYPES))
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HLL++) vs exact distinct (HPI §2F "
    "client-activity row). Sketch values are engine-specific, so the "
    "oracle-checked output is the exact count plus the assertion that "
    "Spark's HLL estimate (rsd=0.02) lands within 5% of it — the sketch is "
    "deterministic for fixed data, so this is a stable contract. At 100 TB "
    "the approx path is the one that avoids the distinct shuffle blowup.",
    tags=("events", "distinct", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "asof_last_click",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts,
                 CAST(max(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS click_value
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           c.click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="Generic backward as-of join (operators.asof.asof_join, the "
    "reusable form of the B6 correlation primitive): each purchase joined "
    "to the user's most recent prior-or-equal click. Spark plans the "
    "union-and-window shape — ONE shuffle, no join node, no pair blowup on "
    "duplicate timestamps; DuckDB validates with its native ASOF JOIN. "
    "Clicks are pre-deduped per (user, ts) so the tie pick is "
    "deterministic in both engines.",
    tags=("events", "asof", "join"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg((F.max(_cents(F.col("value"))).cast("double") / 100).alias("click_value"))
    )
    out = asof_join(purchases, clicks, on="ts", by=["user_id"],
                    value_cols=["click_value"], suffix="_click")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("purchase_epoch"),
        F.col("ts_click").cast("long").alias("click_epoch"),
        F.col("click_value_click").alias("click_value"),
    )


@register(
    "conversion_funnel",
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id)
    SELECT count(v.user_id) AS n_viewed,
           count(c.user_id) AS n_clicked_after_view,
           count(p.user_id) AS n_purchased_after_click,
           CAST(count(p.user_id) AS DOUBLE) / count(v.user_id) AS conversion
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON c.user_id = p.user_id
    """,
    doc="Ordered conversion funnel (view -> click -> purchase): each stage's "
    "earliest qualifying event must follow the previous stage's. Stage "
    "frames are per-user aggregates joined on user_id — partial+final aggs, "
    "joins on the same key reuse the partitioning; the final rollup is one "
    "row. The order-sensitive analytics shape a log-analytics engine exists "
    "for.",
    tags=("events", "funnel", "join", "agg"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)

    def stage(etype, prev, prev_ts):
        e = ev.where(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") >= F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t_{etype}"))
        )

    v = stage("view", None, None)
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_viewed"),
            F.count("t_click").alias("n_clicked_after_view"),
            F.count("t_purchase").alias("n_purchased_after_click"),
            (F.count("t_purchase").cast("double") / F.count("t_view")).alias("conversion"),
        )
    )


@register(
    "range_join_counts",
    """
    WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, count(c.ts) AS n_nearby_clicks
    FROM p LEFT JOIN c ON abs(epoch_ms(c.ts) - epoch_ms(p.ts)) <= 600000
    GROUP BY p.event_id
    """,
    doc="Time-range join with NO equality key: clicks within +-10 min of "
    "each purchase, by any user. The oracle states it as the O(|L|x|R|) "
    "inequality join; the Spark plan is the bucket-and-filter scale path "
    "(operators/ranged.py): bucket both sides by the window width, explode "
    "the smaller side to its 3 candidate buckets, one shuffled EQUI-join, "
    "exact |dt| filter — never a BroadcastNestedLoopJoin.",
    tags=("events", "range-join", "join"),
)
def range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranged import range_join

    ev = _events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "ts")
    c = ev.where(F.col("event_type") == "click").select(
        "ts", F.col("event_id").alias("click_id")
    )
    j = range_join(p, c, on="ts", window_s=600, value_cols=["click_id"])
    agg = j.groupBy("event_id").agg(F.count("*").alias("n_nearby_clicks"))
    return p.join(agg, "event_id", "left").select(
        "event_id",
        F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks"),
    )


@register(
    "top_event_paths",
    """
    WITH r AS (SELECT user_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    p AS (SELECT user_id,
                 string_agg(event_type, '->' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY user_id),
    c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path)
    SELECT path, n_users FROM c
    ORDER BY n_users DESC, path LIMIT 10
    """,
    doc="Behavioral path mining: each user's first-3-event journey "
    "(ts + event_id tie-break makes the sequence deterministic) as a "
    "'view->click->purchase' path string, then the 10 most common paths. "
    "Ordered sequence assembly is sort_array(collect_list(struct)) — "
    "collect_list alone has NO order guarantee across partitions; the "
    "struct sort pins it. One shuffle on user_id, one on path (both "
    "partial+final), top-k as TakeOrdered — no global sort.",
    tags=("events", "sequence", "path", "agg"),
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "->",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        first3.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(10)
    )


@register(
    "cohort_retention",
    """
    WITH f AS (SELECT user_id,
                      min(date_trunc('week', ts)) AS cohort
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT CAST(floor(epoch(f.cohort)) AS BIGINT) AS cohort_week,
           CAST((floor(epoch(a.wk)) - floor(epoch(f.cohort))) / 604800
                AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-seen ISO week, "
    "counted in every later week they return — the week_offset derives "
    "from epoch arithmetic (exact integer division by 604800) so both "
    "engines agree without calendar-API drift. Two shuffles (first-seen "
    "agg, matrix agg), both partial+final; distinct-count per cell rides "
    "the same exchange.",
    tags=("events", "cohort", "retention", "agg"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.unix_timestamp("cohort").alias("cohort_week"),
            ((F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "key_skew_report",
    """
    WITH g AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    t AS (SELECT count(*) AS total_keys, CAST(sum(n) AS BIGINT) AS total_rows
          FROM g)
    SELECT user_id, n,
           round(CAST(n AS DOUBLE) / total_rows, 6) AS share,
           round(CAST(n * total_keys AS DOUBLE) / total_rows, 6) AS x_avg
    FROM g CROSS JOIN t
    ORDER BY n DESC, user_id LIMIT 10
    """,
    doc="Key-distribution diagnostic (operators/skew.py::key_skew_report): "
    "the top-10 heaviest join keys with corpus share and x_avg (multiples "
    "of the mean key's volume) — the measurement that decides whether a "
    "join needs salting (and how many buckets) BEFORE the shuffle melts "
    "down. One partial+final count aggregate, a single-row totals "
    "broadcast (1-row nested loop by construction), and a TakeOrdered "
    "top-N — nothing driver-side, no global sort.",
    tags=("events", "skew", "diagnostic"),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_report as _report

    return _report(_events(spark, sf_dir), ["user_id"], top=10)


@register(
    "approx_quantile_audit",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS exact_p50,
           TRUE AS rank_within_bound
    FROM events GROUP BY event_type
    """,
    doc="approx_percentile (positive-indexed quantile sketch, accuracy "
    "1000) audited against the exact median — the quantile analog of "
    "approx_distinct_users: sketch internals are engine- and merge-"
    "order-specific, so the pinned contract is the exact median plus "
    "the assertion that the approx value's RANK INTERVAL "
    "[count(<ap)+1, count(<=ap)] intersects the guarantee band "
    "n/2 +- (n/accuracy + 1) — SOME rank of the returned element is "
    "within slack, which is what GK promises under duplication and "
    "holds for ANY partition merge order — the property that "
    "makes the audit stable under the driver's different session). At "
    "100 TB the sketch path replaces the full sort exact percentile "
    "needs; one agg + a broadcast join back + one partial+final "
    "rank count.",
    tags=("events", "percentile", "approx"),
)
def approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ap = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("_ap"),
        F.count(F.lit(1)).alias("_n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("exact_p50"),
    )
    ranked = (
        ev.join(F.broadcast(ap), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("exact_p50").alias("exact_p50"),
            F.first("_n").alias("_n"),
            F.sum(F.when(F.col("value") < F.col("_ap"), 1)
                  .otherwise(0)).alias("_lt"),
            F.sum(F.when(F.col("value") <= F.col("_ap"), 1)
                  .otherwise(0)).alias("_le"),
        )
    )
    # The GK sketch guarantees only that SOME rank of the returned
    # element lies within n/accuracy of n/2; under heavy duplication of
    # that element its MAX rank can exceed the slack while the
    # guarantee still holds.  So test whether the element's rank
    # interval [count(<ap)+1, count(<=ap)] intersects the target band
    # [n/2 - n/1000 - 1, n/2 + n/1000 + 1] instead of the max rank.
    lo = F.col("_lt") + 1
    hi = F.col("_le")
    band_lo = F.col("_n") / 2 - F.col("_n") / 1000 - 1
    band_hi = F.col("_n") / 2 + F.col("_n") / 1000 + 1
    return ranked.select(
        "event_type",
        "exact_p50",
        ((lo <= band_hi) & (hi >= band_lo)).alias("rank_within_bound"),
    )


_EWMA_H = 12  # lag horizon; weights 2^-(j+1) are exact dyadic doubles


@register(
    "ewma_smooth",
    f"""
    WITH m AS (SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT)
                          AS minute_epoch,
                      event_type, count(*) AS n
               FROM events GROUP BY 1, 2),
    s AS (SELECT minute_epoch, event_type, n,
                 {" + ".join(
                     f"coalesce(lag(n, {j}) OVER w * {2.0 ** -(j + 1)!r}, 0)"
                     for j in range(_EWMA_H))} AS num,
                 {" + ".join(
                     "CASE WHEN lag(n, %d) OVER w IS NULL THEN 0 "
                     "ELSE %r END" % (j, 2.0 ** -(j + 1))
                     for j in range(_EWMA_H))} AS den
          FROM m WINDOW w AS (PARTITION BY event_type
                              ORDER BY minute_epoch)),
    o AS (SELECT minute_epoch, event_type, CAST(n AS BIGINT) AS n_events,
                 num / den AS ewma
          FROM s)
    SELECT * FROM o
    """,
    doc="Exponentially-weighted moving average of per-minute traffic "
    "per method (half-life one bucket: weight 2^-(j+1) on the j-th "
    "previous bucket over a 12-row horizon, renormalized over the "
    "lags that exist near series start). The smoothing counterpart "
    "to rate_zscore's anomaly score. Determinism: every weight is a "
    "POWER OF TWO, so each term n*2^-(j+1) and both running sums are "
    "EXACT dyadic doubles (counts < 2^40 keep the sum inside the "
    "53-bit significand) — the numerator/denominator division is the "
    "only inexact op, identical on both engines, emitted unrounded "
    "(num.py discipline; an alpha like 0.3 would be order-dependent "
    "float summation). Row-ordered lags over the post-agg minute "
    "series: gaps smooth over the last OBSERVED buckets, documented. "
    "One agg + one window on the time-bounded frame.",
    tags=("events", "timeseries", "window"),
)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    minute = (F.floor(F.col("ts").cast("long") / 60) * 60).cast("long")
    m = (
        ev.groupBy(minute.alias("minute_epoch"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("minute_epoch")
    num = None
    den = None
    for j in range(_EWMA_H):
        lj = F.lag("n", j).over(w)
        t = F.coalesce(lj.cast("double") * F.lit(2.0 ** -(j + 1)),
                       F.lit(0.0))
        d = F.when(lj.isNull(), F.lit(0.0)).otherwise(
            F.lit(2.0 ** -(j + 1)))
        num = t if num is None else num + t
        den = d if den is None else den + d
    return m.select(
        "minute_epoch", "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        (num / den).alias("ewma"),
    )


@register(
    "mad_outliers",
    """
    WITH c AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
    med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
            FROM c GROUP BY 1),
    dev AS (SELECT c.event_type, c.cents,
                   abs(c.cents - med.med_cents) AS d
            FROM c JOIN med USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(d, 0.5) AS mad_cents
            FROM dev GROUP BY 1)
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(med.med_cents) AS med_cents,
           min(mad.mad_cents) AS mad_cents,
           CAST(sum(CASE WHEN dev.d > 3 * mad.mad_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY 1
    """,
    doc="Median-absolute-deviation robust outlier count per method — "
    "the quartile-free sibling of quantity_outliers' IQR fences (MAD "
    "tolerates 50% contamination; stddev fences break at one wild "
    "point). Exactness: values enter as exact integer CENTS, so the "
    "interpolated medians land on exact dyadic halves, deviations on "
    "halves, the MAD on quarters — every comparison (d > 3*MAD) is "
    "between exact dyadic doubles, no rounding, no engine drift. "
    "Two percentile aggs + one flag agg, all partial+final.",
    tags=("events", "robust", "percentile", "anomaly"),
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents"))
    dev = c.join(med, "event_type").withColumn(
        "d", F.abs(F.col("cents") - F.col("med_cents")))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad_cents"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad_cents"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


_FUNNEL_W_S = 1800


@register(
    "window_funnel",
    f"""
    WITH e AS (SELECT user_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ts_e
               FROM events),
    u AS (SELECT DISTINCT user_id FROM e),
    s1 AS (SELECT user_id, min(ts_e) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts_e) AS t2
           FROM e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click'
             AND e.ts_e >= s1.t1 AND e.ts_e <= s1.t1 + {_FUNNEL_W_S}
           GROUP BY 1),
    s3 AS (SELECT e.user_id, min(e.ts_e) AS t3
           FROM e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase'
             AND e.ts_e >= s2.t2 AND e.ts_e <= s2.t2 + {_FUNNEL_W_S}
           GROUP BY 1)
    SELECT u.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s1.t1 IS NULL THEN 0
                WHEN s2.t2 IS NULL THEN 1
                WHEN s3.t3 IS NULL THEN 2 ELSE 3 END AS INTEGER) AS depth
    FROM u LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
           LEFT JOIN s3 USING (user_id)
    """,
    doc="Per-user windowed funnel (the ClickHouse windowFunnel shape, "
    "MIN-ANCHORED variant — semantics stated exactly: t1 = first "
    "view; t2 = first click within 30 min OF t1; t3 = first purchase "
    "within 30 min of t2; depth = steps reached). Min-anchoring makes "
    "the answer deterministic and oracle-expressible where "
    "any-chain funnel matching is search; the cost is that a later "
    "view with a faster chain does not rescue a user whose FIRST "
    "view stalled — documented, and the right semantics for "
    "first-touch latency questions. Per-user rows pin every stage "
    "timestamp, unlike conversion_funnel's corpus totals. Three "
    "user-keyed min-aggs + left joins, all partial+final; exact "
    "integer epochs.",
    tags=("events", "funnel", "sessionize"),
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_e"))
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts_e").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click").alias("e")
        .join(s1.alias("s1"), "user_id")
        .filter((F.col("e.ts_e") >= F.col("t1"))
                & (F.col("e.ts_e") <= F.col("t1") + _FUNNEL_W_S))
        .groupBy("user_id").agg(F.min("ts_e").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase").alias("e")
        .join(s2.alias("s2"), "user_id")
        .filter((F.col("e.ts_e") >= F.col("t2"))
                & (F.col("e.ts_e") <= F.col("t2") + _FUNNEL_W_S))
        .groupBy("user_id").agg(F.min("ts_e").alias("t3"))
    )
    return (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id", "t1", "t2", "t3",
            F.when(F.col("t1").isNull(), 0)
            .when(F.col("t2").isNull(), 1)
            .when(F.col("t3").isNull(), 2)
            .otherwise(3).cast("int").alias("depth"),
        )
    )


@register(
    "value_corr",
    """
    WITH b AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS x,
                      CAST(floor(epoch(ts)) % 86400 AS BIGINT) AS y
               FROM events),
    s AS (SELECT event_type,
                 count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM b GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END
               AS pearson_r
    FROM s
    """,
    doc="Pearson correlation between event value and time-of-day per "
    "method — stated in the EXACT-INTEGER form "
    "(N*Sxy - Sx*Sy) / (sqrt(N*Sxx - Sx^2) * sqrt(N*Syy - Sy^2)) "
    "over integer cents and epoch-seconds-of-day, the rate_zscore "
    "discipline extended to a second moment: the built-in corr() "
    "aggregate sums FLOATS in partition order and is not "
    "engine-reproducible, while integer sums are exact, both sqrts "
    "are correctly rounded IEEE, and the one division is bit-exact — "
    "emitted unrounded. Degenerate (zero-variance) groups emit 0.0. "
    "One partial+final agg; five integer sums ride the same shuffle.",
    tags=("events", "stats", "agg"),
)
def value_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    x = F.round(F.col("value") * 100).cast("long")
    y = (F.col("ts").cast("long") % 86400).cast("long")
    s = (
        ev.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    # The moment products overflow int64 just above sf0.1 (n * Syy is
    # already ~1e18 per group there, and Spark long arithmetic wraps
    # silently with ANSI off while DuckDB promotes sum(BIGINT) to
    # HUGEINT).  Widen the five sums to decimal(38,0) BEFORE forming
    # the variance/covariance terms: at n~1e10 rows/group the largest
    # product is ~7e29, comfortably inside decimal(38,0), and the
    # arithmetic stays exact until the single double division.
    def _d(c: str):
        return F.col(c).cast("decimal(38,0)")

    vx = _d("n") * _d("sxx") - _d("sx") * _d("sx")
    vy = _d("n") * _d("syy") - _d("sy") * _d("sy")
    num = _d("n") * _d("sxy") - _d("sx") * _d("sy")
    return s.select(
        "event_type", F.col("n").cast("bigint").alias("n"),
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        ).alias("pearson_r"),
    )


@register(
    "event_unpivot",
    """
    WITH c AS (SELECT DISTINCT user_id % 100 AS cohort FROM events),
    t AS (SELECT unnest(['click', 'error', 'purchase', 'signup',
                         'view']) AS event_type),
    n AS (SELECT user_id % 100 AS cohort, event_type, count(*) AS cnt
          FROM events GROUP BY 1, 2)
    SELECT c.cohort, t.event_type,
           CAST(coalesce(n.cnt, 0) AS BIGINT) AS n_events
    FROM c CROSS JOIN t
    LEFT JOIN n ON n.cohort = c.cohort AND n.event_type = t.event_type
    """,
    doc="Wide-to-long reshape (Spark's unpivot/melt operator): the "
    "user_event_pivot wide frame melted back to (cohort, event_type, "
    "n_events) — the round-trip that pins BOTH reshape directions, "
    "INCLUDING the zero-filled cells pivot materialized (a bare "
    "groupBy would drop absent combinations; the oracle builds the "
    "dense grid explicitly with a cohorts x types cross join over "
    "two tiny dimension frames). Unpivot is a narrow 1-to-N row "
    "expansion — no shuffle beyond the pivot's own agg.",
    tags=("events", "reshape", "pivot"),
)
def event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _events(spark, sf_dir)
        .groupBy((F.col("user_id") % 100).alias("cohort"))
        .pivot("event_type", list(_ETYPES))
        .count()
        .na.fill(0, list(_ETYPES))
    )
    return (
        wide.unpivot(
            ["cohort"], list(_ETYPES), "event_type", "n_events")
        .select("cohort", "event_type",
                F.col("n_events").cast("bigint").alias("n_events"))
    )


@register(
    "interarrival_stats",
    """
    WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_e,
                      event_id
               FROM events),
    d AS (SELECT user_id,
                 ts_e - lag(ts_e) OVER
                     (PARTITION BY user_id ORDER BY ts_e, event_id)
                     AS gap
          FROM e)
    SELECT user_id,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           min(gap) AS min_gap_s,
           quantile_cont(gap, 0.5) AS median_gap_s,
           quantile_cont(gap, 0.9) AS p90_gap_s,
           max(gap) AS max_gap_s
    FROM d WHERE gap IS NOT NULL GROUP BY 1
    """,
    doc="Per-user inter-arrival gap distribution: lag diffs over the "
    "(user, ts, event_id) order, then min/median/p90/max per user — "
    "the arrival-process profile behind sessionize's gap threshold "
    "(pick the session gap where the distribution's knee sits, "
    "instead of guessing 30 minutes). Gaps are exact integer-second "
    "diffs, so the interpolated quantiles land on dyadic halves — "
    "engine-exact with no rounding (the mad_outliers discipline). "
    "The lag window and the agg share the user partitioning: one "
    "shuffle.",
    tags=("events", "timeseries", "window", "percentile"),
)
def interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("ts_e"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_e", "event_id")
    d = ev.withColumn(
        "gap", F.col("ts_e") - F.lag("ts_e").over(w)
    ).filter(F.col("gap").isNotNull())
    return d.groupBy("user_id").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.min("gap").alias("min_gap_s"),
        F.expr("percentile(gap, 0.5)").alias("median_gap_s"),
        F.expr("percentile(gap, 0.9)").alias("p90_gap_s"),
        F.max("gap").alias("max_gap_s"),
    )


@register(
    "time_to_convert",
    """
    WITH e AS (SELECT user_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ts_e
               FROM events),
    fv AS (SELECT user_id, min(ts_e) AS v0 FROM e
           WHERE event_type = 'view' GROUP BY 1),
    fp AS (SELECT e.user_id, min(e.ts_e) AS p0
           FROM e JOIN fv ON fv.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts_e >= fv.v0
           GROUP BY 1),
    d AS (SELECT fv.user_id, fp.p0 - fv.v0 AS delta
          FROM fv JOIN fp USING (user_id))
    SELECT user_id % 100 AS cohort,
           CAST(count(*) AS BIGINT) AS n_converters,
           CAST(sum(delta) AS DOUBLE) / count(*) AS avg_seconds,
           CAST(min(delta) AS BIGINT) AS min_seconds,
           CAST(max(delta) AS BIGINT) AS max_seconds
    FROM d GROUP BY 1
    """,
    doc="Conversion latency — the time dimension conversion_funnel "
    "drops: per user the FIRST view and the first purchase AT OR "
    "AFTER it, per cohort (user_id %% 100) the converter count and "
    "the exact integer-second delta stats (avg as ONE double "
    "division of an exact sum — num.py; min/max exact). Funnel "
    "completion rates say WHETHER users convert; this says HOW LONG "
    "the corpus says it takes — the leading indicator for journey "
    "regressions. Plan: two user-keyed aggs + two user-keyed joins "
    "riding the same shuffle key, then one cohort rollup; everything "
    "is user-cardinality after the first agg.",
    tags=("events", "funnel", "agg"),
)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts").cast("long").alias("ts_e"))
    fv = (e.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts_e").alias("v0")))
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts_e") >= F.col("v0"))
        .groupBy("user_id").agg(F.min("ts_e").alias("p0"))
    )
    d = fv.join(fp, "user_id").select(
        "user_id", (F.col("p0") - F.col("v0")).alias("delta"))
    return d.groupBy((F.col("user_id") % 100).alias("cohort")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        (F.sum("delta").cast("double") / F.count(F.lit(1)))
        .alias("avg_seconds"),
        F.min("delta").cast("bigint").alias("min_seconds"),
        F.max("delta").cast("bigint").alias("max_seconds"),
    )


@register(
    "seasonal_residuals",
    """
    WITH m AS (SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT)
                          AS minute_epoch,
                      event_type,
                      CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS x
               FROM events GROUP BY 1, 2),
    s AS (SELECT *,
                 CAST((minute_epoch % 86400) / 60 AS BIGINT) AS mod_min,
                 sum(x) OVER (PARTITION BY event_type,
                              CAST((minute_epoch % 86400) / 60 AS BIGINT))
                     AS sx,
                 count(*) OVER (PARTITION BY event_type,
                              CAST((minute_epoch % 86400) / 60 AS BIGINT))
                     AS nn
          FROM m)
    SELECT minute_epoch, event_type, CAST(x AS BIGINT) AS cents,
           CAST(x * nn - sx AS DOUBLE) / CAST(nn AS DOUBLE) AS residual
    FROM s
    """,
    doc="Seasonal residuals — the time-of-day decomposition rate_zscore "
    "and cusum_alerts both skip: each (method, minute) bucket scored "
    "against its own MINUTE-OF-DAY baseline across days, so a daily "
    "traffic rhythm stops reading as anomaly and real deviations "
    "stand out. Determinism (num.py): residual x - mean restated "
    "scaled-by-N as the exact integer x*N - S over the seasonal "
    "group's window sums, ONE double division. Plan: one agg to the "
    "minutes-x-types frame, one PARTITIONED window on (event_type, "
    "minute-of-day) — 1440 x methods groups, post-agg time-bounded, "
    "never event-sized.",
    tags=("events", "timeseries", "window", "anomaly"),
)
def seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    minute = (F.floor(F.col("ts").cast("long") / 60) * 60).cast("long")
    m = (
        ev.groupBy(minute.alias("minute_epoch"), "event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
             .cast("long").alias("x"))
    )
    mod_min = ((F.col("minute_epoch") % 86400) / 60).cast("long")
    s = m.withColumn("mod_min", mod_min)
    w = Window.partitionBy("event_type", "mod_min")
    sx = F.sum("x").over(w)
    nn = F.count(F.lit(1)).over(w)
    return s.select(
        "minute_epoch", "event_type",
        F.col("x").cast("bigint").alias("cents"),
        ((F.col("x") * nn - sx).cast("double") / nn.cast("double"))
        .alias("residual"),
    )


@register(
    "markov_transitions",
    """
    WITH r AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    t AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
          FROM r WHERE nxt IS NOT NULL GROUP BY 1, 2),
    o AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out
          FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n, o.n_out,
           CAST(t.n AS DOUBLE) / o.n_out AS prob
    FROM t JOIN o USING (from_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences — the behavioral model beside top_event_paths' literal "
    "path mining: P(next event type | current) estimated from every "
    "consecutive pair, the input to next-action prediction, funnel "
    "leak diagnosis ('view->error at 12% says the page is broken') "
    "and sequence-perplexity scoring of bot traffic. Ordering is "
    "(ts, event_id) within user — the deterministic total order every "
    "sequence query here uses. Plan: ONE shuffle on user_id for the "
    "lead window (partitioned, never global), then two partial+final "
    "aggregates onto the #types^2-bounded transition cells and a "
    "broadcast-sized join; counts exact integers, probability is ONE "
    "double division (num.py).",
    tags=("events", "sequence", "window", "report"),
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    t = r.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    o = t.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("n_out"))
    return (
        t.join(o, "from_type")
        .select(
            "from_type", "to_type",
            F.col("n").cast("bigint").alias("n"),
            "n_out",
            (F.col("n").cast("double") / F.col("n_out")).alias("prob"),
        )
    )


@register(
    "minute_autocorr",
    """
    WITH m AS (SELECT event_type,
                      CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
                      count(*) AS x
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type, a.x AS x, b.x AS y
          FROM m a JOIN m b ON b.event_type = a.event_type
                           AND b.minute = a.minute + 1),
    s AS (SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM p GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END
               AS lag1_autocorr
    FROM s
    """,
    doc="Lag-1 autocorrelation of the per-minute traffic series per "
    "method — the burstiness diagnostic beside seasonal_residuals' "
    "rhythm removal and cusum_alerts' level shifts: near 0 means "
    "Poisson-like arrivals, near 1 means long bursts (capacity "
    "planning reads THIS number before trusting a mean QPS). Pairs "
    "are strictly ADJACENT minutes (a gap breaks the pair, stated as "
    "a minute+1 self-join in the oracle and an equivalent "
    "lead-with-gap-check window here), then Pearson in the "
    "value_corr exact-integer five-sum form: counts are exact "
    "BIGINTs, moment terms widen to decimal(38,0) before the "
    "variance products (value_corr's overflow lesson), both sqrts "
    "correctly-rounded IEEE, ONE unrounded division; zero-variance "
    "groups emit 0.0. Plan: one partial+final agg to the "
    "minutes x methods frame, one PARTITIONED window over it "
    "(post-agg time-bounded, never event-sized), one 5-sum agg.",
    tags=("events", "timeseries", "stats", "window"),
)
def minute_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    m = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("long") / 60).cast("long")
            .alias("minute"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("minute")
    p = (
        m.select(
            "event_type", "x",
            F.lead("x").over(w).alias("y"),
            (F.lead("minute").over(w) - F.col("minute")).alias("gap"),
        )
        .where(F.col("gap") == 1)
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )

    def _d(c: str):
        return F.col(c).cast("decimal(38,0)")

    vx = _d("n") * _d("sxx") - _d("sx") * _d("sx")
    vy = _d("n") * _d("syy") - _d("sy") * _d("sy")
    num = _d("n") * _d("sxy") - _d("sx") * _d("sy")
    return s.select(
        "event_type", F.col("n").cast("bigint").alias("n_pairs"),
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        ).alias("lag1_autocorr"),
    )


@register(
    "dau_wau_stickiness",
    """
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      user_id
               FROM events GROUP BY 1, 2),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
            FROM d GROUP BY 1),
    wk AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week_start,
                  user_id
           FROM d GROUP BY 1, 2),
    wau AS (SELECT week_start, CAST(count(*) AS BIGINT) AS wau
            FROM wk GROUP BY 1),
    wd AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week_start,
                  CAST(sum(dau) AS BIGINT) AS sum_dau,
                  CAST(count(*) AS BIGINT) AS n_days
           FROM dau GROUP BY 1)
    SELECT wd.week_start, wd.n_days, wd.sum_dau, wau.wau,
           CAST(wd.sum_dau AS DOUBLE) / (wd.n_days * wau.wau)
               AS stickiness
    FROM wd JOIN wau USING (week_start)
    """,
    doc="DAU/WAU stickiness per ISO week — the engagement ratio "
    "(avg daily actives / weekly actives, 1/7..1) every growth "
    "dashboard tracks: near 1 means the same users return daily, "
    "near 1/7 means each user shows up once. Exact distincts via "
    "(day, user) / (week, user) de-dup groupBys (two partial+final "
    "shuffles; at 10^12 events swap the exact pair de-dup for "
    "approx_count_distinct per window, the approx_distinct_users "
    "path), integer sums, ONE double division; weeks truncate to "
    "ISO Monday in both engines and emit as DATE.",
    tags=("events", "timeseries", "agg", "report"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    ).distinct()
    dau = d.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau"))
    wk = d.select(
        F.date_trunc("week", F.col("day")).cast("date")
        .alias("week_start"),
        "user_id",
    ).distinct()
    wau = wk.groupBy("week_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau"))
    wd = dau.groupBy(
        F.date_trunc("week", F.col("day")).cast("date")
        .alias("week_start")
    ).agg(
        F.sum("dau").cast("bigint").alias("sum_dau"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    return (
        wd.join(wau, "week_start")
        .select(
            "week_start", "n_days", "sum_dau", "wau",
            (F.col("sum_dau").cast("double")
             / (F.col("n_days") * F.col("wau"))).alias("stickiness"),
        )
    )


@register(
    "session_concurrency",
    """
    WITH e AS (SELECT user_id, event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ep
               FROM events),
    g AS (SELECT user_id, ep,
                 CASE WHEN ep - lag(ep) OVER w > 1800 THEN 1 ELSE 0 END
                   AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
    sx AS (SELECT user_id, ep,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ep, brk
                                 ROWS UNBOUNDED PRECEDING) AS sess
           FROM g),
    s AS (SELECT user_id, sess, min(ep) // 60 AS m0, max(ep) // 60 AS m1
          FROM sx GROUP BY 1, 2),
    mins AS (SELECT unnest(generate_series(m0, m1)) AS minute FROM s),
    conc AS (SELECT minute, count(*) AS concurrent FROM mins GROUP BY 1),
    h AS (SELECT minute // 60 AS epoch_hour, max(concurrent) AS peak
          FROM conc GROUP BY 1)
    SELECT CAST(h.epoch_hour AS BIGINT) AS epoch_hour,
           CAST(h.peak AS BIGINT) AS peak_concurrent,
           CAST(min(c.minute) AS BIGINT) AS peak_minute
    FROM h JOIN conc c ON c.minute // 60 = h.epoch_hour
                      AND c.concurrent = h.peak
    GROUP BY 1, 2
    """,
    doc="Peak concurrent sessions per hour — the capacity-planning "
    "report behind connection-pool sizing (HPI's scanner-session "
    "analog at the fleet level): sessions are the 30-min-gap spans "
    "sessionize derives, and concurrency is computed by TEMPORAL "
    "GRIDDING, a sweep-line restated distributably — each session "
    "explodes to the minute buckets it overlaps (sequence(m0, m1); "
    "cost = session-minutes, bounded by gap x events, NEVER a global "
    "time-ordered window over the fact table), per-minute counts "
    "collapse map-side, and the hourly peak is a 60-row-bounded "
    "argmax via struct-max (ties -> earliest minute, stated). All "
    "arithmetic on floored epoch seconds (the asof_correlate rule) "
    "so bucket edges agree across engines. At 100 TB the minute grid "
    "shuffles on the minute key (uniform by construction) and every "
    "other stage is keyed by user or hour; no stage sees "
    "order-dependent state.",
    tags=("events", "sessions", "interval", "gridding"),
)
def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    ep = F.col("ts").cast("long")
    g = ev.select(
        "user_id", "event_id", ep.alias("ep"),
        F.when(ep - F.lag(ep).over(w) > 1800, 1).otherwise(0).alias("brk"),
    )
    ws = (Window.partitionBy("user_id").orderBy("ep", "brk")
          .rowsBetween(Window.unboundedPreceding, 0))
    sx = g.select("user_id", "ep", F.sum("brk").over(ws).alias("sess"))
    s = sx.groupBy("user_id", "sess").agg(
        F.expr("min(ep) DIV 60").alias("m0"),
        F.expr("max(ep) DIV 60").alias("m1"),
    )
    conc = (
        s.select(F.explode(F.sequence("m0", "m1")).alias("minute"))
        .groupBy("minute")
        .agg(F.count(F.lit(1)).alias("concurrent"))
    )
    best = (
        conc.groupBy(F.expr("minute DIV 60").alias("epoch_hour"))
        .agg(F.max(F.struct(
            F.col("concurrent"),
            (-F.col("minute")).alias("negm"))).alias("b"))
    )
    return best.select(
        F.col("epoch_hour").cast("bigint").alias("epoch_hour"),
        F.col("b.concurrent").cast("bigint").alias("peak_concurrent"),
        (-F.col("b.negm")).cast("bigint").alias("peak_minute"),
    )


@register(
    "cuped_adjusted_lift",
    """
    WITH e AS (SELECT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events),
    mm AS (SELECT min(ep) AS lo, max(ep) AS hi FROM e),
    u AS (SELECT user_id,
                 CAST(user_id % 2 AS INTEGER) AS variant,
                 CAST(sum(CASE WHEN ep < lo + (hi - lo) // 2
                          THEN vc ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN ep >= lo + (hi - lo) // 2
                          THEN vc ELSE 0 END) AS BIGINT) AS y
          FROM e, mm GROUP BY 1, 2),
    g AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(y AS HUGEINT) * y) AS syy
          FROM u),
    t AS (SELECT nn, sx, sy,
                 CAST(nn * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                   AS covn,
                 CAST(nn * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                   AS varxn,
                 CAST(nn * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                   AS varyn
          FROM g),
    v AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS vx,
                 CAST(sum(y) AS BIGINT) AS vy
          FROM u GROUP BY 1)
    SELECT v.variant, v.n_users,
           round(CAST(v.vy AS DOUBLE) / (v.n_users * 100), 6)
             AS raw_mean,
           round((CAST(v.vy AS DOUBLE) / v.n_users
                  - (t.covn / t.varxn)
                    * (CAST(v.vx AS DOUBLE) / v.n_users
                       - CAST(t.sx AS DOUBLE) / t.nn)) / 100, 6)
             AS cuped_mean,
           round(t.covn / t.varxn, 6) AS theta,
           round((t.covn * t.covn) / (t.varxn * t.varyn), 6)
             AS var_reduction
    FROM v, t
    """,
    doc="CUPED-adjusted experiment readout (Deng, Xu, Kohavi & Walker, "
    "WSDM 2013 — 'Improving the Sensitivity of Online Controlled "
    "Experiments by Utilizing Pre-Experiment Data'): users split into "
    "deterministic variants (user_id parity), the observation window "
    "split at its epoch midpoint into pre/post periods, per-user "
    "pre-period spend serving as the covariate; the post-period mean "
    "per variant is adjusted by theta * (covariate mean - global "
    "covariate mean) with theta = cov(x,y)/var(x), cutting metric "
    "variance by the squared pre/post correlation (reported as "
    "var_reduction = rho^2) — the standard fix for 'the A/B readout "
    "is noise because heavy users landed unevenly'. Determinism "
    "(plans/num.py): all five moments are EXACT integer sums of "
    "cents (HUGEINT/decimal squares — the sf10 overflow lesson), "
    "cast to double only for the final scalar arithmetic, which is "
    "then identical IEEE ops on identical inputs in any engine. "
    "Scale shape: one groupBy(user) over the fact scan (partial+ "
    "final), then a 2-row variant frame and a ONE-ROW moment "
    "aggregate broadcast cross (source_token_mix's rationale) — "
    "nothing user-cardinality-sized crosses the wire twice; the "
    "epoch-midpoint 1-row min/max broadcast prices the period split "
    "exactly like spend_lorenz_binned's bin edges.",
    tags=("events", "experiment", "statistics"),
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d38 = "decimal(38,0)"
    e = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("long").alias("ep"),
        _cents(F.col("value")).alias("vc"),
    )
    mm = e.agg(F.min("ep").alias("lo"), F.max("ep").alias("hi"))
    mid = F.col("lo") + F.expr("(hi - lo) DIV 2")
    u = (
        e.crossJoin(F.broadcast(mm))
        .withColumn("_mid", mid)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ep") < F.col("_mid"), F.col("vc"))
                  .otherwise(F.lit(0))).alias("x"),
            F.sum(F.when(F.col("ep") >= F.col("_mid"), F.col("vc"))
                  .otherwise(F.lit(0))).alias("y"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "x", "y",
        )
    )
    xd = F.col("x").cast(d38)
    yd = F.col("y").cast(d38)
    g = u.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(yd * yd).alias("syy"),
    )
    t = g.select(
        "nn", "sx", "sy",
        (F.col("nn").cast(d38) * F.col("sxy")
         - F.col("sx").cast(d38) * F.col("sy")).cast("double").alias("covn"),
        (F.col("nn").cast(d38) * F.col("sxx")
         - F.col("sx").cast(d38) * F.col("sx")).cast("double").alias("varxn"),
        (F.col("nn").cast(d38) * F.col("syy")
         - F.col("sy").cast(d38) * F.col("sy")).cast("double").alias("varyn"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("vx"),
        F.sum("y").alias("vy"),
    )
    theta = F.col("covn") / F.col("varxn")
    return v.crossJoin(F.broadcast(t)).select(
        "variant", "n_users",
        F.round(F.col("vy").cast("double") / (F.col("n_users") * 100), 6)
        .alias("raw_mean"),
        F.round(
            (F.col("vy").cast("double") / F.col("n_users")
             - theta * (F.col("vx").cast("double") / F.col("n_users")
                        - F.col("sx").cast("double") / F.col("nn"))) / 100,
            6,
        ).alias("cuped_mean"),
        F.round(theta, 6).alias("theta"),
        F.round(
            (F.col("covn") * F.col("covn"))
            / (F.col("varxn") * F.col("varyn")), 6
        ).alias("var_reduction"),
    )


def _hex6_ev(expr: str) -> str:
    """DuckDB twin of F.conv(substring(md5(x), 1, 6), 16, 10)."""
    return (
        "("
        + " + ".join(
            f"instr('123456789abcdef', substr({expr}, {i + 1}, 1))"
            f" * {16 ** (5 - i)}"
            for i in range(6)
        )
        + ")"
    )


@register(
    "median_of_means",
    f"""
    WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS vc,
                      {_hex6_ev("md5('mom:' || CAST(event_id AS VARCHAR))")}
                        % 32 AS bkt
               FROM events),
    b AS (SELECT bkt, CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(vc) AS BIGINT) AS sb,
                 CAST(sum(vc) AS DOUBLE) / count(*) AS m
          FROM e GROUP BY 1),
    r AS (SELECT *, row_number() OVER (ORDER BY m, bkt) AS rk,
                 count(*) OVER () AS nbkt
          FROM b),
    mom AS (SELECT avg(m) AS mom_c
            FROM r WHERE rk IN ((nbkt + 1) // 2, (nbkt + 2) // 2)),
    raw AS (SELECT CAST(sum(vc) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM e)
    SELECT raw.n AS n_events,
           CAST(32 AS INTEGER) AS n_buckets,
           round(CAST(raw.s AS DOUBLE) / (raw.n * 100), 6) AS raw_mean,
           round(mom.mom_c / 100, 6) AS mom_mean
    FROM raw, mom
    """,
    doc="Median-of-means robust mean estimator (Nemirovsky & Yudin "
    "1983; the sub-Gaussian mean estimator under heavy tails): events "
    "land in 32 DETERMINISTIC salted-md5 buckets (the no-RNG "
    "discipline — membership recomputable from the row), each "
    "bucket's mean is an exact integer-cents sum over one division, "
    "and the released estimate is the MEDIAN of the 32 bucket means — "
    "a handful of corrupted or heavy-tailed readings can drag the "
    "raw mean arbitrarily but shift at most a few bucket means, "
    "leaving the median bounded. Complements bootstrap_price_ci "
    "(same sufficient-statistic shape; CI vs robust point estimate). "
    "The median is an ORDER STATISTIC of 32 identical-on-any-engine "
    "doubles (rank via row_number over the constant 32-row frame, "
    "even-count midpoint averaged) — no float accumulation crosses "
    "engines. Plan: one partial+final groupBy on the hash bucket "
    "(shuffle carries 32 partial rows per task), one 32-row window.",
    tags=("events", "statistics", "robust"),
)
def median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        _cents(F.col("value")).alias("vc"),
        (F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mom:"),
                               F.col("event_id").cast("string"))), 1, 6),
            16, 10,
        ).cast("long") % 32).alias("bkt"),
    )
    b = e.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("vc").cast("bigint").alias("sb"),
        (F.sum("vc").cast("double") / F.count(F.lit(1))).alias("m"),
    )
    w = Window.orderBy("m", "bkt")
    r = b.select(
        "m",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nbkt"),
    )
    mom = r.where(
        (F.col("rk") == F.expr("(nbkt + 1) DIV 2"))
        | (F.col("rk") == F.expr("(nbkt + 2) DIV 2"))
    ).agg(F.avg("m").alias("mom_c"))
    raw = e.agg(F.sum("vc").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"))
    return raw.crossJoin(F.broadcast(mom)).select(
        F.col("n").alias("n_events"),
        F.lit(32).cast("int").alias("n_buckets"),
        F.round(F.col("s").cast("double") / (F.col("n") * 100), 6)
        .alias("raw_mean"),
        F.round(F.col("mom_c") / 100, 6).alias("mom_mean"),
    )
