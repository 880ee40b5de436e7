"""Event-stream queries: time windows, sessionization, as-of join,
JSON extraction, stream dedup (SURVEY.md §2.3/§2.4 streaming rows).

These run in batch mode here (the driver oracle is batch SQL) but are
written so the identical expressions drop into Structured Streaming —
``F.window``/``session_window`` accept streaming DataFrames unchanged;
see ``flink_orc_sink_spark/streaming`` for the streaming harness with
watermarks and the exactly-once ORC sink.

Timestamp determinism: the gap/window math uses integer microseconds
(``unix_micros`` ↔ DuckDB ``epoch_us``) — exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_orc_sink_spark.operators.relational import asof_join, sessionize
from flink_orc_sink_spark.sources.catalog import table


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (epoch-aligned, same as the streaming
    ``window()`` operator): count + value stats per window/type."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events GROUP BY window_start, event_type
"""


def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — each event
    lands in exactly two windows. Spark's window() expands in place;
    the oracle unnests the two window starts explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # avg from an exact decimal sum, rounded via an explicit
            # floor(x*1e4+0.5)/1e4 — pure IEEE-double ops that every
            # engine evaluates bit-identically. Engine-native ROUND
            # differs exactly at half-way doubles (Spark goes through
            # BigDecimal.valueOf's decimal string, DuckDB stays in
            # floats — observed 73.9138 vs 73.9137 at sf0.01).
            (
                F.floor(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            )
            .cast("double")
            .alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


SLIDING_SQL = """
SELECT window_start, COUNT(*) AS n_events,
  CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000 AS DOUBLE) AS avg_value
FROM (
  SELECT UNNEST([
           TIME_BUCKET(INTERVAL '30 minutes', ts),
           TIME_BUCKET(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
         ]) AS window_start,
         value
  FROM events
)
GROUP BY window_start
"""


def events_sessionize_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 10-minute inactivity gap — the
    gaps-and-islands sessionize operator. Session boundaries use
    integer-microsecond arithmetic so every engine agrees on >= gap."""
    e = table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", gap_minutes=10)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("session_value"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 600000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_seq
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column + aggregation over
    the extracted value (SURVEY.md §2.4 scalar/json row)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k_val", F.get_json_object("props", "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("k_val").cast("bigint")).alias("sum_k"),
            F.round(F.avg("k_val"), 4).cast("double").alias("avg_k"),
            F.min("k_val").alias("min_k"),
            F.max("k_val").alias("max_k"),
        )
    )


JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  CAST(ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS DOUBLE) AS avg_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: latest event per (user, type) — the batch
    analogue of ``dropDuplicatesWithinWatermark`` with an explicit
    keep-latest policy (plain dropDuplicates keeps an arbitrary row;
    an engine should not ship nondeterminism)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


DEDUP_LATEST_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's most recent order state
    at event time. Right side pre-aggregated to one row per
    (customer, date) so '<=' ties are unambiguous; then the
    union+window as-of (one shuffle, no theta join)."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.round(F.max(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("last_order_price")
        )
    )
    joined = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["last_order_price"],
    )
    return joined.select("event_id", "user_id", "last_order_price")


ASOF_SQL = """
SELECT e.event_id, e.user_id, o.last_order_price
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey, o_orderdate,
    CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS last_order_price
  FROM orders GROUP BY o_custkey, o_orderdate
) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


QUERIES = {
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_1h_30m": events_sliding_1h_30m,
    "events_sessionize_10m": events_sessionize_10m,
    "events_json_extract": events_json_extract,
    "events_dedup_latest": events_dedup_latest,
    "events_asof_orders": events_asof_orders,
}

ORACLES = {
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_sliding_1h_30m": SLIDING_SQL,
    "events_sessionize_10m": SESSIONIZE_SQL,
    "events_json_extract": JSON_SQL,
    "events_dedup_latest": DEDUP_LATEST_SQL,
    "events_asof_orders": ASOF_SQL,
}
