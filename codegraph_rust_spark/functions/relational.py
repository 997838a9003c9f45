"""Relational operators — projections, aggregations, windows, set ops.

Each function mirrors a reference construct (SurrealQL stored function
or Rust search-pipeline stage, cited per function) re-expressed as a
declarative DataFrame plan; Catalyst supplies pushdown/pruning/join
selection.  Float outputs are rounded so the DuckDB oracle hashes
match bit-for-bit despite summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import t


# --------------------------------------------------------------- aggregation

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style hash aggregation (reference analog: per-project
    stats rollups, fn::count_nodes_for_project — schema/codegraph.surql:1069-1076)."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------- projection

def node_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename, analog of fn::node_info's 7-column project
    with ``node_type AS kind`` (schema/codegraph.surql:277-281)."""
    return (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("name"),
            F.col("p_type").alias("kind"),
            F.col("p_brand").alias("brand"),
            F.col("p_size").alias("size"),
            F.round(F.col("p_retailprice"), 2).alias("price"),
        )
        .orderBy("id")
        .limit(100)
    )


NODE_INFO_SQL = """
SELECT p_partkey AS id, p_name AS name, p_type AS kind, p_brand AS brand,
       p_size AS size, round(p_retailprice, 2) AS price
FROM part ORDER BY id LIMIT 100
"""


# ------------------------------------------------------------------ windows

def per_group_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group LIMIT 5, analog of the per-result edge-LIMIT subselect
    (schema/codegraph.surql:514-535) as row_number ≤ 5."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank",
        )
    )


PER_GROUP_TOP5_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 5
"""


def min_max_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max score normalization over a result group, analog of
    normalize_scores (crates/codegraph-vector/src/search.rs:574-592)."""
    w = Window.partitionBy("event_type")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.min("value").over(w))
            / F.nullif(
                F.max("value").over(w) - F.min("value").over(w), F.lit(0.0)
            ),
            6,
        ).alias("norm_score"),
    )


MIN_MAX_NORMALIZE_SQL = """
SELECT event_id, event_type,
       round((value - min(value) OVER w)
             / nullif(max(value) OVER w - min(value) OVER w, 0.0), 6)
       AS norm_score
FROM events
WINDOW w AS (PARTITION BY event_type)
"""


# ------------------------------------------------------------------ set ops

def multi_vector_or_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-union with max-score merge over two result sets, analog of
    multi-vector OR mode (crates/codegraph-vector/src/search.rs:347-372)."""
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.max("value").alias("score")
    )
    b = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.max("value").alias("score")
    )
    return (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(F.round(F.max("score"), 2).alias("score"))
    )


MULTI_VECTOR_OR_MAX_SQL = """
WITH a AS (SELECT user_id, max(value) AS score FROM events
           WHERE event_type = 'click' GROUP BY user_id),
     b AS (SELECT user_id, max(value) AS score FROM events
           WHERE event_type = 'view' GROUP BY user_id)
SELECT user_id, round(max(score), 2) AS score
FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
GROUP BY user_id
"""


def multi_vector_and_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-intersection with average-score merge (require membership in
    all sets), analog of search.rs:374-418 (count == n_queries gate)."""
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.max("value").alias("score")
    )
    b = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.max("value").alias("score")
    )
    u = a.unionByName(b)
    return (
        u.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("score"), 6).alias("score"))
        .filter(F.col("n") == 2)
        .select("user_id", "score")
    )


MULTI_VECTOR_AND_AVG_SQL = """
WITH a AS (SELECT user_id, max(value) AS score FROM events
           WHERE event_type = 'click' GROUP BY user_id),
     b AS (SELECT user_id, max(value) AS score FROM events
           WHERE event_type = 'view' GROUP BY user_id),
     u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT user_id, round(avg(score), 6) AS score
FROM u GROUP BY user_id HAVING count(*) = 2
"""


# ------------------------------------------------------- time / json scalars

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the event stream — the behavioral
    grouping a training-data / analytics pipeline derives from raw
    events (the batch twin of Structured Streaming's session_window):
    per user, a new session starts after > 30 min of inactivity;
    output one row per session with its span, size and value.

    Exactness discipline: gaps and durations are computed in INTEGER
    microseconds (unix_micros / epoch_us), and the value sum is
    cents-quantized before aggregation — no float accumulation order
    anywhere, so the SQL oracle matches bit-for-bit.  Plan shape: one
    user-partitioned window pass (lag + running sum — sessions never
    cross the user key, so no skew beyond a user's own event count)
    and one hash aggregation."""
    e = t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives as TIMESTAMP_NTZ: wall-clock micros against a fixed
    # base, NO timezone math — immune to the harness session timezone
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts)")
    gap = us - F.lag(us).over(wo)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_sess).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
        us.alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max("us") - F.min("us")).alias("duration_us"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
    )


SESSIONIZE_EVENTS_SQL = f"""
WITH based AS (
  SELECT user_id, ts, event_id, value,
         datediff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts) AS us
  FROM events
),
marked AS (
  SELECT user_id, ts, event_id, us,
         cast(round(value * 100) AS bigint) AS cents,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM based
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, us, cents,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, cast(session_id AS bigint) AS session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       max(us) - min(us) AS duration_us,
       cast(sum(cents) AS bigint) / 100.0 AS total_value
FROM sess GROUP BY user_id, session_id
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity
    week (the cohort), counted in each subsequent week they were
    active — the (cohort_week, week_offset) → active_users matrix an
    analytics pipeline derives from raw events.  Two hash
    aggregations and one user-key join; week arithmetic in whole
    integer days against a fixed Monday epoch, identical in both
    engines."""
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    # ISO-stable week index: whole weeks since 2024-01-01 (a Monday)
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("int")
    weekly = e.select("user_id", week.alias("week")).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


RETENTION_COHORTS_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         cast(floor(datediff('day', DATE '2024-01-01', cast(ts AS date)) / 7) AS int) AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id)
SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
       count(*) AS active_users
FROM weekly w JOIN cohort c ON c.user_id = w.user_id
GROUP BY c.cohort_week, w.week - c.cohort_week
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis view → click → purchase, per user: each
    stage must happen AT OR AFTER the previous stage's first completion
    (the sequence constraint that separates a funnel from three
    independent counts).  Three conditional min-aggregations with the
    user's prior-stage timestamp joined back in — every join is on the
    user key, every aggregation map-side combinable; no window over
    the full event stream is needed."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    users = e.select("user_id").distinct()
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_stage"),
        )
    )


FUNNEL_CONVERSION_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
),
users AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.t_purchase IS NOT NULL THEN 3
            WHEN c.t_click IS NOT NULL THEN 2
            WHEN v.t_view IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage
FROM users u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (1h) counts — batch form of the streaming rollup
    (reference has CDC-style incrementality, indexer.rs:3186-3251; event
    windows are our training-pipeline extension)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the FLEXIBLE-metadata analog
    (reference metadata object columns, schema/codegraph.surql:838,924)."""
    e = t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return (
        e.groupBy(F.pmod(F.col("k"), F.lit(10)).cast("int").alias("kbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


EVENTS_JSON_EXTRACT_SQL = """
SELECT cast(cast(json_extract_string(props, '$.k') AS int) % 10 AS int) AS kbucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1
"""


# ------------------------------------------------------------------ metrics

def coupling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Afferent/efferent coupling + instability ratio, analog of
    fn::calculate_coupling_metrics (schema/codegraph.surql:24-102) with
    nations as modules, customers as efferent and suppliers as afferent
    edges; instability = Ce / (Ca + Ce) with the reference's rounding."""
    n = t(spark, sf_dir, "nation")
    ce = t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("efferent")
    )
    ca = t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("afferent")
    )
    return (
        n.join(ce, n.n_nationkey == ce.c_nationkey, "left")
        .join(ca, n.n_nationkey == ca.s_nationkey, "left")
        .select(
            F.col("n_nationkey").alias("nation_key"),
            F.col("n_name").alias("nation"),
            F.coalesce("efferent", F.lit(0)).alias("efferent"),
            F.coalesce("afferent", F.lit(0)).alias("afferent"),
            F.round(
                F.coalesce("efferent", F.lit(0))
                / F.nullif(
                    (F.coalesce("afferent", F.lit(0)) + F.coalesce("efferent", F.lit(0))).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("instability"),
        )
    )


COUPLING_METRICS_SQL = """
WITH ce AS (SELECT c_nationkey, count(*) AS efferent FROM customer GROUP BY 1),
     ca AS (SELECT s_nationkey, count(*) AS afferent FROM supplier GROUP BY 1)
SELECT n.n_nationkey AS nation_key, n.n_name AS nation,
       coalesce(ce.efferent, 0) AS efferent,
       coalesce(ca.afferent, 0) AS afferent,
       round(coalesce(ce.efferent, 0)
             / nullif(cast(coalesce(ca.afferent, 0) + coalesce(ce.efferent, 0) AS double), 0.0),
             6) AS instability
FROM nation n
LEFT JOIN ce ON n.n_nationkey = ce.c_nationkey
LEFT JOIN ca ON n.n_nationkey = ca.s_nationkey
"""
