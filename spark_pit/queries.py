"""Query registry: the driver-contract surface (__spark_entry__ delegates here).

Each entry couples a PySpark plan (built from the operator library) with an
ANSI-SQL DuckDB oracle over the same parquet tables. Conventions that make
the order-insensitive value-hash comparison deterministic:

- every computed column is aliased identically on both sides
- timestamps leave as epoch micros (unix_micros ↔ epoch_us) — never raw
- (user_id, ts) windows always tiebreak on event_id
- money-like sums go through DECIMAL so both engines are bit-exact;
  statistical outputs are rounded to 6 decimals on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_pit.operators import autocorr, pairs, windows
from spark_pit.operators.asof import asof_join_window
from spark_pit.util import ts_us

EVENT_VOCAB = ["click", "error", "purchase", "signup", "view"]


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _snaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived snapshot stream: purchases act as per-user feature snapshots."""
    return _ev(spark, sf_dir).where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("snapshot_ts"),
        F.col("event_id").alias("snapshot_id"),
        F.col("value").alias("snap_value"),
    )


_SNAPS_SQL = (
    "SELECT user_id, ts AS snapshot_ts, event_id AS snapshot_id, value AS snap_value "
    "FROM events WHERE event_type = 'purchase'"
)


# --------------------------------------------------------------------- PIT core
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_id", "user_id", "ts")
    out = asof_join_window(
        ev, _snaps(spark, sf_dir), ["user_id"], "ts", "snapshot_ts",
        ["snapshot_id", "snap_value"], strict=True, right_order="snapshot_id",
    )
    return out.select(
        "event_id",
        "user_id",
        ts_us("ts").alias("ts_us"),
        F.col("asof_snapshot_id").alias("asof_snapshot_id"),
        F.round("asof_snap_value", 6).alias("asof_snap_value"),
        ts_us("asof_ts").alias("asof_ts_us"),
    )


Q_ASOF_SQL = f"""
WITH snaps AS ({_SNAPS_SQL}),
ranked AS (
  SELECT e.event_id, e.user_id, e.ts,
         s.snapshot_id, s.snap_value, s.snapshot_ts,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY s.snapshot_ts DESC, s.snapshot_id DESC) AS rn
  FROM events e
  LEFT JOIN snaps s ON e.user_id = s.user_id AND s.snapshot_ts < e.ts
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       snapshot_id AS asof_snapshot_id,
       round(snap_value, 6) AS asof_snap_value,
       epoch_us(snapshot_ts) AS asof_ts_us
FROM ranked WHERE rn = 1
"""


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = windows.with_lag_lead(ev, "user_id", "ts", ["value"], [1, 2], tiebreak="event_id")
    return out.select(
        "event_id", "user_id",
        F.round("lag1_value", 6).alias("lag1_value"),
        F.round("lead1_value", 6).alias("lead1_value"),
        F.round("lag2_value", 6).alias("lag2_value"),
        F.round("lead2_value", 6).alias("lead2_value"),
    )


Q_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       round(lag(value, 1)  OVER w, 6) AS lag1_value,
       round(lead(value, 1) OVER w, 6) AS lead1_value,
       round(lag(value, 2)  OVER w, 6) AS lag2_value,
       round(lead(value, 2) OVER w, 6) AS lead2_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = windows.with_session_id(ev, "user_id", "ts", 1800, tiebreak="event_id")
    return out.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us("ts")).alias("session_start_us"),
        F.max(ts_us("ts")).alias("session_end_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


Q_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(epoch_us(ts)) AS session_start_us,
       max(epoch_us(ts)) AS session_end_us,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_id
"""


def q_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # error events carry no usable value → null, then backfill last non-null
    ev = _ev(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    out = windows.with_backfill(ev, "user_id", "ts", ["v"], tiebreak="event_id")
    return out.select("event_id", "user_id", F.round("v_bf", 6).alias("value_bf"))


Q_BACKFILL_SQL = """
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), 6) AS value_bf
FROM events
"""


def q_window_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAAC analogue: trailing-5 event_type composition (two tracked tokens)."""
    ev = _ev(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    out = windows.with_window_composition(
        ev, "user_id", "ts", "event_type", ["click", "view"], width=5, tiebreak="event_id"
    )
    return out.select(
        "event_id", "user_id",
        F.round("wc_click", 6).alias("wc_click"),
        F.round("wc_view", 6).alias("wc_view"),
    )


Q_WINDOW_COMPOSITION_SQL = """
SELECT event_id, user_id,
       round(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w AS DOUBLE)
             / count(*) OVER w, 6) AS wc_click,
       round(CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w AS DOUBLE)
             / count(*) OVER w, 6) AS wc_view
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    w = windows.entity_window("user_id", "ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "event_id", "user_id",
        (F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("roll_mean"),
        F.round(F.min("value").over(w), 6).alias("roll_min"),
        F.round(F.max("value").over(w), 6).alias("roll_max"),
    )


Q_ROLLING_STATS_SQL = """
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS roll_mean,
       round(min(value) OVER w, 6) AS roll_min,
       round(max(value) OVER w, 6) AS roll_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------- composition / pair families
def q_token_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.token_composition(ev, "user_id", "event_type", out="freq")
    return out.select("user_id", F.col("event_type"), F.round("freq", 6).alias("freq"))


Q_TOKEN_COMPOSITION_SQL = """
SELECT user_id, event_type,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY user_id), 6) AS freq
FROM events GROUP BY user_id, event_type
"""


def q_lagk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.lagk_pair_freq(ev, "user_id", "ts", "event_type", gaps=[0, 1, 2], tiebreak="event_id")
    return out.select(
        "user_id", "gap", "tok_a", "tok_b", "pair_n",
        F.round("pair_freq", 6).alias("pair_freq"),
    )


Q_LAGK_PAIRS_SQL = """
WITH leads AS (
  SELECT user_id, g.gap AS gap, event_type AS tok_a,
         CASE g.gap
           WHEN 0 THEN lead(event_type, 1) OVER w
           WHEN 1 THEN lead(event_type, 2) OVER w
           ELSE        lead(event_type, 3) OVER w
         END AS tok_b
  FROM events CROSS JOIN (VALUES (0), (1), (2)) AS g(gap)
  WINDOW w AS (PARTITION BY user_id, g.gap ORDER BY ts, event_id)
),
cnt AS (
  SELECT user_id, gap, tok_a, tok_b, count(*) AS pair_n
  FROM leads WHERE tok_b IS NOT NULL
  GROUP BY user_id, gap, tok_a, tok_b
)
SELECT user_id, gap, tok_a, tok_b, pair_n,
       round(CAST(pair_n AS DOUBLE)
             / sum(pair_n) OVER (PARTITION BY user_id, gap), 6) AS pair_freq
FROM cnt
"""


def q_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.trigram_freq(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return out.select(
        "user_id", "tok_a", "tok_b", "tok_c", "tri_n",
        F.round("tri_freq", 6).alias("tri_freq"),
    )


Q_TRIGRAMS_SQL = """
WITH tri AS (
  SELECT user_id, event_type AS tok_a,
         lead(event_type, 1) OVER w AS tok_b,
         lead(event_type, 2) OVER w AS tok_c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cnt AS (
  SELECT user_id, tok_a, tok_b, tok_c, count(*) AS tri_n
  FROM tri WHERE tok_b IS NOT NULL AND tok_c IS NOT NULL
  GROUP BY user_id, tok_a, tok_b, tok_c
)
SELECT user_id, tok_a, tok_b, tok_c, tri_n,
       round(CAST(tri_n AS DOUBLE) / sum(tri_n) OVER (PARTITION BY user_id), 6) AS tri_freq
FROM cnt
"""


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.transition_freq(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return out.select(
        "user_id", "grp_lo", "grp_hi", F.round("trans_freq", 6).alias("trans_freq")
    )


Q_TRANSITIONS_SQL = """
WITH adj AS (
  SELECT user_id, event_type AS g1, lead(event_type, 1) OVER w AS g2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tot AS (
  SELECT user_id, count(*) AS n_adj FROM adj WHERE g2 IS NOT NULL GROUP BY user_id
)
SELECT a.user_id, least(g1, g2) AS grp_lo, greatest(g1, g2) AS grp_hi,
       round(CAST(count(*) AS DOUBLE) / any_value(t.n_adj), 6) AS trans_freq
FROM adj a JOIN tot t ON a.user_id = t.user_id
WHERE g2 IS NOT NULL AND g1 <> g2
GROUP BY a.user_id, least(g1, g2), greatest(g1, g2)
"""


def q_asdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.all_pair_counts_kernel(ev, "user_id", "ts", "event_type", EVENT_VOCAB)
    return out.select("user_id", "tok_a", "tok_b", F.round("asdc_freq", 6).alias("asdc_freq"))


Q_ASDC_SQL = """
WITH pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM events
),
prs AS (
  SELECT a.user_id, a.event_type AS tok_a, b.event_type AS tok_b, count(*) AS n
  FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.p > a.p
  GROUP BY a.user_id, a.event_type, b.event_type
)
SELECT user_id, tok_a, tok_b,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY user_id), 6) AS asdc_freq
FROM prs
"""


def q_dde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = pairs.dde(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return out.select("user_id", "tok_a", "tok_b", F.round("dde", 4).alias("dde"))


Q_DDE_SQL = """
WITH comp AS (
  SELECT user_id, event_type,
         CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY user_id) AS freq
  FROM events GROUP BY user_id, event_type
),
bg AS (
  SELECT user_id, event_type AS tok_a, lead(event_type, 1) OVER w AS tok_b
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cnt AS (
  SELECT user_id, tok_a, tok_b, count(*) AS pair_n
  FROM bg WHERE tok_b IS NOT NULL GROUP BY user_id, tok_a, tok_b
),
freq AS (
  SELECT user_id, tok_a, tok_b, pair_n,
         CAST(pair_n AS DOUBLE) / sum(pair_n) OVER (PARTITION BY user_id) AS pair_freq,
         sum(pair_n) OVER (PARTITION BY user_id) AS n_pairs
  FROM cnt
)
SELECT f.user_id, f.tok_a, f.tok_b,
       round((f.pair_freq - fa.freq * fb.freq)
             / sqrt(fa.freq * fb.freq * (1 - fa.freq * fb.freq) / f.n_pairs), 4) AS dde
FROM freq f
JOIN comp fa ON f.user_id = fa.user_id AND fa.event_type = f.tok_a
JOIN comp fb ON f.user_id = fb.user_id AND fb.event_type = f.tok_b
"""


# -------------------------------------------------------------- autocorrelation
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = autocorr.autocorr_long(ev, "user_id", "ts", "value", nlags=3, tiebreak="event_id")
    return out.select(
        "user_id", "lag",
        F.round("nmbroto", 4).alias("nmbroto"),
        F.round("ac", 4).alias("ac"),
        F.round("moran", 4).alias("moran"),
        F.round("geary", 4).alias("geary"),
        F.round("soc", 4).alias("soc"),
    )


Q_AUTOCORR_SQL = """
WITH mstats AS (
  SELECT user_id, avg(value) AS m, count(*) AS L FROM events GROUP BY user_id
),
sstats AS (
  SELECT e.user_id, sum((e.value - t.m) * (e.value - t.m)) AS ss
  FROM events e JOIN mstats t ON e.user_id = t.user_id
  GROUP BY e.user_id
),
led AS (
  SELECT e.user_id, e.value, t.m, t.L, s.ss, n.lag AS lag,
         CASE n.lag
           WHEN 1 THEN lead(e.value, 1) OVER w
           WHEN 2 THEN lead(e.value, 2) OVER w
           ELSE        lead(e.value, 3) OVER w
         END AS y
  FROM events e
  JOIN mstats t ON e.user_id = t.user_id
  JOIN sstats s ON e.user_id = s.user_id
  CROSS JOIN (VALUES (1), (2), (3)) AS n(lag)
  WINDOW w AS (PARTITION BY e.user_id, n.lag ORDER BY e.ts, e.event_id)
)
SELECT user_id, lag,
       round(sum(CASE WHEN y IS NOT NULL THEN value * y END)
             / sum(CASE WHEN y IS NOT NULL THEN 1 END), 4) AS nmbroto,
       round(sum(CASE WHEN y IS NOT NULL THEN (value - m) * (y - m) END)
             / sum(CASE WHEN y IS NOT NULL THEN 1 END), 4) AS ac,
       round(CASE WHEN any_value(ss) > 0 THEN
         (sum(CASE WHEN y IS NOT NULL THEN (value - m) * (y - m) END)
          / sum(CASE WHEN y IS NOT NULL THEN 1 END))
         / (any_value(ss) / any_value(L)) END, 4) AS moran,
       round(CASE WHEN any_value(ss) > 0 THEN
         (any_value(L) - 1) / (2.0 * sum(CASE WHEN y IS NOT NULL THEN 1 END))
         * sum(CASE WHEN y IS NOT NULL THEN (value - y) * (value - y) END)
         / any_value(ss) END, 4) AS geary,
       round(sum(CASE WHEN y IS NOT NULL THEN (value - y) * (value - y) END)
             / sum(CASE WHEN y IS NOT NULL THEN 1 END), 4) AS soc
FROM led
GROUP BY user_id, lag
HAVING sum(CASE WHEN y IS NOT NULL THEN 1 END) > 0
"""


def q_cross_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn("chan2", F.length("props").cast("double"))
    out = autocorr.cross_cov_long(ev, "user_id", "ts", "value", "chan2", nlags=3, tiebreak="event_id")
    return out.select("user_id", "lag", F.round("cc", 4).alias("cc"))


Q_CROSS_COV_SQL = """
WITH base AS (
  SELECT user_id, ts, event_id, value AS x1,
         CAST(length(props) AS DOUBLE) AS x2,
         avg(value) OVER (PARTITION BY user_id) AS m1,
         avg(CAST(length(props) AS DOUBLE)) OVER (PARTITION BY user_id) AS m2
  FROM events
),
led AS (
  SELECT user_id, x1, m1, m2, n.lag AS lag,
         CASE n.lag
           WHEN 1 THEN lead(x2, 1) OVER w
           WHEN 2 THEN lead(x2, 2) OVER w
           ELSE        lead(x2, 3) OVER w
         END AS y
  FROM base CROSS JOIN (VALUES (1), (2), (3)) AS n(lag)
  WINDOW w AS (PARTITION BY user_id, n.lag ORDER BY ts, event_id)
)
SELECT user_id, lag,
       round(sum(CASE WHEN y IS NOT NULL THEN (x1 - m1) * (y - m2) END)
             / sum(CASE WHEN y IS NOT NULL THEN 1 END), 4) AS cc
FROM led GROUP BY user_id, lag
HAVING sum(CASE WHEN y IS NOT NULL THEN 1 END) > 0
"""


def q_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = windows.distribution_positions(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return out.select(
        "user_id", "event_type",
        F.round("p_first", 6).alias("p_first"),
        F.round("p25", 6).alias("p25"),
        F.round("p50", 6).alias("p50"),
        F.round("p75", 6).alias("p75"),
        F.round("p100", 6).alias("p100"),
    )


Q_DISTRIBUTION_SQL = """
WITH pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p,
         count(*) OVER (PARTITION BY user_id) AS L,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS c,
         count(*) OVER (PARTITION BY user_id, event_type) AS tot
  FROM events
)
SELECT user_id, event_type,
       round(min(CASE WHEN c = 1 THEN p * 100.0 / L END), 6) AS p_first,
       round(min(CASE WHEN c = ceil(0.25 * tot) THEN p * 100.0 / L END), 6) AS p25,
       round(min(CASE WHEN c = ceil(0.50 * tot) THEN p * 100.0 / L END), 6) AS p50,
       round(min(CASE WHEN c = ceil(0.75 * tot) THEN p * 100.0 / L END), 6) AS p75,
       round(min(CASE WHEN c = tot THEN p * 100.0 / L END), 6) AS p100
FROM pos GROUP BY user_id, event_type
"""


# ------------------------------------------------------------------- relational
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary; DECIMAL sums for bit-exact parity."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × broadcast dims (customer→nation). Catalyst broadcasts
    the dimension side automatically below the threshold; F.broadcast makes
    the intent explicit for the 100 TB plan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q_REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice — the rank-filter shape that
    replaces the reference KNN's per-sample neighbor sort (feature.py:3853)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk", F.round("o_totalprice", 2).alias("totalprice"))
    )


Q_TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, rk, round(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
"""


# ------------------------------------------------------------------- registry
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join": q_asof_join,
    "lag_lead": q_lag_lead,
    "sessionize": q_sessionize,
    "backfill": q_backfill,
    "window_composition": q_window_composition,
    "rolling_stats": q_rolling_stats,
    "token_composition": q_token_composition,
    "lagk_pairs": q_lagk_pairs,
    "trigrams": q_trigrams,
    "transitions": q_transitions,
    "asdc": q_asdc,
    "dde": q_dde,
    "autocorr": q_autocorr,
    "cross_cov": q_cross_cov,
    "distribution": q_distribution,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "topk_orders": q_topk_orders,
}

ORACLES: dict[str, str] = {
    "asof_join": Q_ASOF_SQL,
    "lag_lead": Q_LAG_LEAD_SQL,
    "sessionize": Q_SESSIONIZE_SQL,
    "backfill": Q_BACKFILL_SQL,
    "window_composition": Q_WINDOW_COMPOSITION_SQL,
    "rolling_stats": Q_ROLLING_STATS_SQL,
    "token_composition": Q_TOKEN_COMPOSITION_SQL,
    "lagk_pairs": Q_LAGK_PAIRS_SQL,
    "trigrams": Q_TRIGRAMS_SQL,
    "transitions": Q_TRANSITIONS_SQL,
    "asdc": Q_ASDC_SQL,
    "dde": Q_DDE_SQL,
    "autocorr": Q_AUTOCORR_SQL,
    "cross_cov": Q_CROSS_COV_SQL,
    "distribution": Q_DISTRIBUTION_SQL,
    "pricing_summary": Q_PRICING_SUMMARY_SQL,
    "revenue_by_nation": Q_REVENUE_BY_NATION_SQL,
    "topk_orders": Q_TOPK_ORDERS_SQL,
}
