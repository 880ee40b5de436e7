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
from flink_orc_sink_spark.session import local_df
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


def events_sessionize_dynamic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC-GAP sessionization: each event keeps the session
    alive for a gap set by ITS type — interactive events
    (click/view) for 5 minutes, everything else 30 — with
    ``session_window``'s exact merge semantics: the session stays
    open while the running MAX of ``t_i + gap_i`` reaches the next
    event (a long-gap event keeps it alive through later short-gap
    ones). Kept as plain-SQL gaps-and-islands so the oracle
    replicates it, and so the streaming form
    ``stream_sessionize_dynamic`` agrees event-for-event — the
    value gate caught that the naive previous-event-gap rule
    under-merges by exactly the long-reach cases. Same single
    user-keyed window exchange as the fixed 10-minute sessionize."""
    from flink_orc_sink_spark.operators.relational import (
        sessionize_dynamic,
    )

    e = table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("click", "view"), F.lit(5)
    ).otherwise(F.lit(30))
    s = sessionize_dynamic(e, "user_id", "ts", gap)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SESSIONIZE_DYNAMIC_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN MAX(EPOCH_US(ts)
                  + (CASE WHEN event_type IN ('click', 'view')
                          THEN 5 ELSE 30 END) * 60000000)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             IS NULL
              OR EPOCH_US(ts) >= MAX(EPOCH_US(ts)
                  + (CASE WHEN event_type IN ('click', 'view')
                          THEN 5 ELSE 30 END) * 60000000)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end
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


def events_json_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST ROBUSTNESS: a 100 TB feed always contains malformed
    payloads; the engine must CLASSIFY them, not crash or silently
    drop. Plants two corruption classes keyed by event_id (truncated
    JSON, empty string — the oracle plants identical bytes), parses
    with ``from_json`` (PERMISSIVE: corrupt → NULL struct), and
    reports per-type totals, bad-record counts, and the sum over
    surviving payloads. Map-only scan + one tiny rollup — the
    dead-letter accounting pass of any ingest job."""
    e = table(spark, sf_dir, "events")
    did = F.col("event_id")
    p2 = (
        F.when(did % 11 == 0, F.lit('{"k": oops'))
        .when(did % 13 == 0, F.lit(""))
        .otherwise(F.col("props"))
    )
    # PERMISSIVE from_json returns a PARTIAL struct for truncated
    # JSON (not NULL), so "bad" needs the explicit corrupt-record
    # column: malformed input lands in _corrupt_record, while the
    # empty string nulls the whole struct.
    parsed = F.from_json(
        p2,
        "k INT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    bad = parsed.isNull() | parsed["_corrupt_record"].isNotNull()
    return (
        e.select(
            "event_type",
            bad.cast("long").alias("is_bad"),
            F.when(~bad, parsed["k"]).alias("k_val"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("is_bad").alias("n_bad"),
            F.sum(F.col("k_val").cast("bigint")).alias("sum_k"),
        )
    )


JSON_BADRECORDS_SQL = """
WITH planted AS (
  SELECT event_type,
    CASE WHEN event_id % 11 = 0 THEN '{"k": oops'
         WHEN event_id % 13 = 0 THEN ''
         ELSE props END AS p2
  FROM events
)
SELECT event_type, COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN NOT json_valid(p2) THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
  CAST(SUM(CASE WHEN json_valid(p2)
                THEN CAST(json_extract_string(p2, '$.k') AS INTEGER)
                END) AS BIGINT) AS sum_k
FROM planted GROUP BY event_type
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


def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase): per stage,
    how many users completed it IN ORDER (each stage's first event
    strictly after the previous stage's). The per-stage min-aggregate
    + user-keyed join shape keeps every step a keyed shuffle on
    user_id — no window over the whole event stream, so 100 TB of
    events funnel at hash-agg cost."""
    e = table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None, col: str) -> DataFrame:
        s = e.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            pcol = prev.columns[-1]
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(pcol))
        return s.groupBy("user_id").agg(F.min("ts").alias(col))

    v = first_after("view", None, "t_view")
    c = first_after("click", v, "t_click")
    p = first_after("purchase", c, "t_purchase")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_view_click"),
            F.count("t_purchase").alias("n_view_click_purchase"),
        )
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT COUNT(v.t_view) AS n_view,
  COUNT(c.t_click) AS n_view_click,
  COUNT(p.t_purchase) AS n_view_click_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-active date, counted
    per day-offset of later activity. Two keyed aggregations plus one
    join on user_id. The cohort table is O(distinct users) — small
    next to events but UNBOUNDED at scale (10⁸-10⁹ users), so no
    forced broadcast (round-10 verdict #3): AQE converts the join to
    broadcast at runtime when the measured size allows and keeps a
    shuffle join when it doesn't — both sides are already hashed on
    user_id, so the fallback is one co-partitioned shuffle."""
    e = table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            # TIMESTAMP on both sides — the repo's date-output
            # convention (DATE arrives as datetime64 from DuckDB).
            F.col("cohort_date").cast("timestamp").alias("cohort_ts"),
            F.datediff("d", "cohort_date").cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT CAST(cohort_date AS TIMESTAMP) AS cohort_ts,
  CAST(DATE_DIFF('day', cohort_date, d) AS INTEGER) AS day_offset,
  COUNT(*) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY cohort_ts, day_offset
"""


def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution with a horizon: each click joined to the user's
    most recent view within the preceding 10 minutes — the as-of join
    (one shuffle + in-partition sort, no theta cross-product) with a
    lateness filter in exact integer microseconds."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    j = asof_join(
        clicks,
        views,
        left_on="user_id",
        right_on="user_id",
        left_time="ts",
        right_time="view_ts",
        right_value_cols=["view_ts"],
    )
    gap_us = F.unix_micros("ts") - F.unix_micros("view_ts")
    return (
        j.filter(F.col("view_ts").isNotNull() & (gap_us <= 600_000_000))
        .select("event_id", "user_id", gap_us.alias("gap_us"))
    )


ATTRIBUTION_SQL = """
SELECT c.event_id, c.user_id,
  epoch_us(c.ts) - epoch_us(v.view_ts) AS gap_us
FROM (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
) c
ASOF JOIN (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
) v ON c.user_id = v.user_id AND c.ts >= v.view_ts
WHERE epoch_us(c.ts) - epoch_us(v.view_ts) <= 600000000
"""


def events_rolling_7d_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. The scale-safe
    formulation: dedup to (user, day) first, then expand each row to
    the ≤7 window-days it contributes to (bounded 7× blow-up) and
    count-distinct per day — never a sliding distinct over raw events
    (unbounded state) nor a day×day range self-join."""
    e = table(spark, sf_dir, "events")
    daily = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = daily.select("d").distinct()
    expanded = daily.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("wd"),
    )
    return (
        expanded.join(days.withColumnRenamed("d", "wd"), "wd", "left_semi")
        .groupBy(F.col("wd").cast("timestamp").alias("window_day"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


ROLLING_ACTIVE_SQL = """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
expanded AS (
  SELECT user_id, d + CAST(t.i AS INTEGER) AS wd FROM daily, range(0, 7) t(i)
)
SELECT CAST(wd AS TIMESTAMP) AS window_day,
  COUNT(DISTINCT user_id) AS active_users
FROM expanded
WHERE wd IN (SELECT d FROM daily)
GROUP BY wd
"""


def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-rate anomaly detection: hours where a user's
    event count is ≥2 sample standard deviations from that user's
    mean hourly rate. Two cheap shuffles (hour×user count, then
    per-user moments); the per-user stats table joins back onto the
    hourly counts with NO forced broadcast (round-10 verdict #3 —
    O(distinct users) is unbounded at 100×): both sides arrive
    already hash-partitioned on user_id from their own aggregations,
    so the join reuses that partitioning, and AQE still picks
    broadcast at runtime when stats measures small.

    Determinism contract: mean/variance are derived from exact
    integer sums (n, Σn, Σn²) with the identical double-op order on
    both engines, and the z-score is rounded via floor(x·1e4+0.5)/1e4
    — no engine-native stddev/ROUND in the compare path."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("user_id").agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    j = hourly.join(stats, "user_id")
    mean = F.col("s").cast("double") / F.col("cnt")
    var = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        j.filter((F.col("cnt") >= 2) & (var > 0) & (F.abs(z) >= 2))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("n").alias("n_events"),
            (F.floor(z * 10000 + 0.5) / 10000).cast("double").alias("zscore"),
        )
    )


ANOMALY_SQL = """
WITH hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS window_start, COUNT(*) AS n
  FROM events GROUP BY user_id, window_start
),
stats AS (
  SELECT user_id, COUNT(*) AS cnt,
         CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n*n) AS BIGINT) AS ss
  FROM hourly GROUP BY user_id
)
SELECT user_id, window_start, n AS n_events,
  CAST(FLOOR((n - CAST(s AS DOUBLE)/cnt)
       / sqrt((ss - CAST(s AS DOUBLE)*s/cnt)/(cnt-1)) * 10000 + 0.5)/10000
       AS DOUBLE) AS zscore
FROM hourly JOIN stats USING (user_id)
WHERE cnt >= 2
  AND (ss - CAST(s AS DOUBLE)*s/cnt)/(cnt-1) > 0
  AND ABS((n - CAST(s AS DOUBLE)/cnt)
          / sqrt((ss - CAST(s AS DOUBLE)*s/cnt)/(cnt-1))) >= 2
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov bigram counts):
    for each user's time-ordered stream, count (prev_type → next_type)
    pairs — the building block of next-event prediction features and
    session-path mining.

    One shuffle (window partition on user_id; the groupBy reuses
    nothing but is O(|types|²) ≤ 25 groups, map-side combined). The
    window never sees an unpartitioned sort, so the plan holds when
    one user has millions of events only if user streams fit a
    partition — for whale users, pre-split by (user_id, day) first.
    Pure integer counts, ordered by ts with event_id tie-break —
    deterministic on both engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


MARKOV_SQL = """
WITH seq AS (
  SELECT event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion histogram: for each user whose first
    'purchase' follows their first 'view', bucket the delay into
    whole hours and count users per bucket. All math in integer
    microseconds (``unix_micros`` ↔ ``epoch_us``) with integer
    division — bit-exact on both engines.

    Scale shape: one shuffle to per-user min timestamps (map-side
    combined conditional MINs, no self-join), then an O(buckets)
    aggregate."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("first_view_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase_us"),
    )
    return (
        per_user.filter(
            F.col("first_purchase_us") > F.col("first_view_us")
        )
        .withColumn(
            "lag_hours",
            F.expr(
                "(first_purchase_us - first_view_us) div 3600000000"
            ),
        )
        .groupBy("lag_hours")
        .agg(F.count("*").alias("n_users"))
    )


CONVERSION_LAG_SQL = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
  FROM events GROUP BY user_id
)
SELECT CAST((first_purchase_us - first_view_us) // 3600000000 AS BIGINT)
         AS lag_hours,
       COUNT(*) AS n_users
FROM per_user
WHERE first_purchase_us > first_view_us
GROUP BY lag_hours
"""


def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop reachability (distributed BFS) from the 'view'
    node over the event-type transition graph — the iterative
    frontier-expansion family (k-hop neighbourhoods, blast-radius
    queries) as an ORACLE-CHECKED operator: hop counts are exact
    integers, so the Spark iteration hashes identically to a
    depth-bounded ``WITH RECURSIVE`` oracle.

    Node set is small here (event types) but every step is the 100 TB
    shape: per hop one src-keyed equi-join + distinct + anti-join,
    fixed iteration count, no driver-side data path (see
    ``operators/graph.py::bfs_hops``)."""
    from flink_orc_sink_spark.operators.graph import bfs_hops

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .distinct()
    )
    seeds = local_df(spark, [("view",)], "node string")
    out = bfs_hops(edges, seeds, max_hops=3)
    return out.select("node", F.col("hops").cast("long").alias("hops"))


BFS_REACHABILITY_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
edges AS (
  SELECT DISTINCT prev_type AS src, event_type AS dst
  FROM seq WHERE prev_type IS NOT NULL
),
walk(node, hops) AS (
  SELECT 'view' AS node, 0 AS hops
  UNION ALL
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hops < 3
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step event-type paths (clickstream
    path mining): per-user time-ordered trigram sequences, counted
    globally. Deterministic: the trigram window orders by
    (ts, event_id) and the top-10 tie-breaks on the path string.

    Scale shape: one shuffle (window partition on user_id), then a
    map-side-combined count over ≤ |types|³ groups and a
    ``TakeOrderedAndProject`` for the limit — no global sort."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.lag("event_type", 2).over(w).alias("e1"),
            F.lag("event_type", 1).over(w).alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .filter(F.col("e1").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(10)
    )


TOP_PATHS_SQL = """
WITH seq AS (
  SELECT
    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
    event_type AS e3
  FROM events
)
SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n_paths
FROM seq WHERE e1 IS NOT NULL
GROUP BY path
ORDER BY n_paths DESC, path
LIMIT 10
"""


def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles):
    per user, days since last event (integer days vs the corpus max
    timestamp), event count, and exact purchase spend in int64
    micro-units; each scored 1–5 with ``ntile`` over a fully
    deterministic ordering (metric, then user_id), then users counted
    per 3-digit segment.

    The quintile scoring is a GLOBAL ntile — a single-partition sort
    over the per-user table (1 row per user, ~10⁴× smaller than the
    event log). At 100 TB use the scale-safe twin
    ``events_rfm_segments_approx`` (registered, value-oracled): the
    bounded-bucket-histogram threshold form — no O(entities) sort on
    one task. Spend math is integer micro-units, bit-exact on
    both engines."""
    e = table(spark, sf_dir, "events")
    max_ts = e.agg(F.max(F.unix_micros("ts")).alias("corpus_max_us"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 1e6 + 0.5).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("spend_micros"),
        )
        .crossJoin(F.broadcast(max_ts))
        .withColumn(
            "recency_days",
            F.expr("(corpus_max_us - last_us) div 86400000000"),
        )
    )
    scored = per_user.select(
        F.ntile(5)
        .over(Window.orderBy("recency_days", "user_id"))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("freq"), "user_id"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("spend_micros"), "user_id"))
        .alias("m_score"),
        "spend_micros",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            (F.sum("spend_micros").cast("double") / F.lit(1_000_000.0)).alias(
                "segment_spend"
            ),
        )
        .withColumn(
            "segment",
            F.concat_ws("", "r_score", "f_score", "m_score"),
        )
        .select("segment", "n_users", "segment_spend")
    )


RFM_SEGMENTS_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(epoch_us(ts)) AS last_us,
    COUNT(*) AS freq,
    SUM(CASE WHEN event_type = 'purchase'
        THEN CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
      AS spend_micros
  FROM events GROUP BY user_id
),
with_recency AS (
  SELECT *,
    (SELECT MAX(epoch_us(ts)) FROM events) AS corpus_max_us,
    ((SELECT MAX(epoch_us(ts)) FROM events) - last_us) // 86400000000
      AS recency_days
  FROM per_user
),
scored AS (
  SELECT
    NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_score,
    NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_score,
    NTILE(5) OVER (ORDER BY spend_micros DESC, user_id) AS m_score,
    spend_micros
  FROM with_recency
)
SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment,
       COUNT(*) AS n_users,
       CAST(SUM(spend_micros) AS DOUBLE) / 1000000.0 AS segment_spend
FROM scored
GROUP BY r_score, f_score, m_score
"""


def _digit_bucket(col: str):
    """Deterministic integer bucket for a non-negative long metric:
    ``digits*100 + first-two-digits`` (string-derived, so bit-exact on
    any engine — no float log/pow near a bucket boundary). Monotonic
    in the metric, domain ≤ ~1,900 buckets for int64 — the histogram
    is BOUNDED regardless of entity count."""
    s = F.col(col).cast("string")
    return (
        F.when(F.col(col) <= 0, F.lit(0))
        .otherwise(
            F.length(s).cast("long") * 100
            + F.substring(s, 1, 2).cast("long")
        )
    )


def events_rfm_segments_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCALE-SAFE TWIN of ``events_rfm_segments`` (round-11 verdict
    #3): the exact form's quintile scoring is a global ``ntile`` —
    a single-partition sort over the PER-USER table, O(entities) rows
    on one task at 100×. This twin replaces it with the
    threshold-histogram form its docstring prescribes, as running,
    value-oracled code:

    1. the same per-user aggregate (map-side combined);
    2. each metric mapped to a DETERMINISTIC bounded-domain bucket —
       recency in whole days, frequency and spend through
       ``_digit_bucket`` (≤ ~1,900 buckets for int64);
    3. per-bucket histogram (distributed agg, bounded output), running
       count over the BUCKET domain only (the allowlisted
       distinct-value-domain window shape, never O(entities) rows);
    4. score = ``((cum - 1) * 5) div n + 1`` — the position quantile
       of the bucket's LAST member — joined back map-side.

    Approximation: users sharing a bucket share a score (ties at
    two-leading-digit granularity), and the remainder rows land by
    position formula rather than ntile's front-loading — both
    deterministic, so DuckDB value-checks the twin exactly. All math
    integer; spend in int64 micro-units."""
    e = table(spark, sf_dir, "events")
    n_agg = None
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 1e6 + 0.5).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("spend_micros"),
        )
        .crossJoin(
            F.broadcast(
                e.agg(F.max(F.unix_micros("ts")).alias("corpus_max_us"))
            )
        )
        .withColumn(
            "recency_days",
            F.expr("(corpus_max_us - last_us) div 86400000000"),
        )
    )
    bucketed = per_user.select(
        "user_id",
        "spend_micros",
        F.col("recency_days").alias("rb"),
        _digit_bucket("freq").alias("fb"),
        _digit_bucket("spend_micros").alias("mb"),
    )
    n_agg = bucketed.agg(F.count("*").alias("n_users"))

    def bucket_scores(bcol: str, ascending: bool, alias: str) -> DataFrame:
        hist = bucketed.groupBy(bcol).agg(F.count("*").alias("c"))
        order = F.col(bcol).asc() if ascending else F.col(bcol).desc()
        w = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            hist.withColumn("cum", F.sum("c").over(w))
            # bounded-broadcast: n_agg is a GLOBAL count aggregate
            # (exactly one row; assigned in the enclosing scope, so
            # the lint's local-assignment resolver can't see it)
            .crossJoin(F.broadcast(n_agg))
            .select(
                bcol,
                F.expr("((cum - 1) * 5) div n_users + 1").alias(alias),
            )
        )

    r_sc = bucket_scores("rb", True, "r_score")
    f_sc = bucket_scores("fb", False, "f_score")
    m_sc = bucket_scores("mb", False, "m_score")
    scored = (
        bucketed
        # bounded-broadcast: per-metric bucket→score tables — recency
        # is whole days of the corpus span; freq/spend ride
        # _digit_bucket (≤ ~1,900 buckets for int64). Domains bounded
        # by construction, independent of user count.
        .join(F.broadcast(r_sc), "rb")
        # bounded-broadcast: _digit_bucket domain (see above)
        .join(F.broadcast(f_sc), "fb")
        # bounded-broadcast: _digit_bucket domain (see above)
        .join(F.broadcast(m_sc), "mb")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            (
                F.sum("spend_micros").cast("double") / F.lit(1_000_000.0)
            ).alias("segment_spend"),
        )
        .withColumn(
            "segment",
            F.concat_ws("", "r_score", "f_score", "m_score"),
        )
        .select("segment", "n_users", "segment_spend")
    )


RFM_APPROX_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(epoch_us(ts)) AS last_us,
    COUNT(*) AS freq,
    SUM(CASE WHEN event_type = 'purchase'
        THEN CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
      AS spend_micros
  FROM events GROUP BY user_id
),
b AS (
  SELECT user_id, spend_micros,
    ((SELECT MAX(epoch_us(ts)) FROM events) - last_us) // 86400000000
      AS rb,
    CASE WHEN freq <= 0 THEN 0
         ELSE LENGTH(CAST(freq AS VARCHAR)) * 100
              + CAST(SUBSTR(CAST(freq AS VARCHAR), 1, 2) AS BIGINT)
    END AS fb,
    CASE WHEN spend_micros <= 0 THEN 0
         ELSE LENGTH(CAST(spend_micros AS VARCHAR)) * 100
              + CAST(SUBSTR(CAST(spend_micros AS VARCHAR), 1, 2) AS BIGINT)
    END AS mb
  FROM per_user
),
n AS (SELECT COUNT(*) AS n_users FROM b),
rsc AS (
  SELECT rb, ((SUM(c) OVER (ORDER BY rb ASC) - 1) * 5) // n_users + 1
           AS r_score
  FROM (SELECT rb, COUNT(*) AS c FROM b GROUP BY rb) CROSS JOIN n
),
fsc AS (
  SELECT fb, ((SUM(c) OVER (ORDER BY fb DESC) - 1) * 5) // n_users + 1
           AS f_score
  FROM (SELECT fb, COUNT(*) AS c FROM b GROUP BY fb) CROSS JOIN n
),
msc AS (
  SELECT mb, ((SUM(c) OVER (ORDER BY mb DESC) - 1) * 5) // n_users + 1
           AS m_score
  FROM (SELECT mb, COUNT(*) AS c FROM b GROUP BY mb) CROSS JOIN n
)
SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment,
       COUNT(*) AS n_users,
       CAST(SUM(b.spend_micros) AS DOUBLE) / 1000000.0 AS segment_spend
FROM b JOIN rsc USING (rb) JOIN fsc USING (fb) JOIN msc USING (mb)
GROUP BY r_score, f_score, m_score
"""


def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT ORDERED WINDOWED FUNNEL (ClickHouse ``windowFunnel``
    semantics): per user, level 1 = has a view; level 2 = earliest
    click AFTER the first view and within 1 hour of it; level 3 =
    earliest purchase after that click, still within the view's
    1-hour window. Users counted per deepest level reached.

    ONE user-keyed exchange for all three stages: each stage's
    timestamp is an unbounded conditional-MIN window over the SAME
    ``user_id`` partitioning, and window operators referencing a
    previous stage's column stack on the same sort — no self-join,
    no per-stage re-shuffle (plan-budget-pinned at 2 exchanges total,
    the second being the tiny per-level count). All math in integer
    microseconds — bit-exact on both engines."""
    wu = Window.partitionBy("user_id")
    hour_us = 3_600_000_000
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    staged = (
        e.withColumn(
            "view_us",
            F.min(
                F.when(F.col("event_type") == "view", F.col("us"))
            ).over(wu),
        )
        .withColumn(
            "click_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("view_us"))
                    & (F.col("us") <= F.col("view_us") + hour_us),
                    F.col("us"),
                )
            ).over(wu),
        )
        .withColumn(
            "purchase_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("click_us"))
                    & (F.col("us") <= F.col("view_us") + hour_us),
                    F.col("us"),
                )
            ).over(wu),
        )
    )
    per_user = (
        staged.groupBy("user_id")
        .agg(
            F.min("view_us").alias("view_us"),
            F.min("click_us").alias("click_us"),
            F.min("purchase_us").alias("purchase_us"),
        )
        .filter(F.col("view_us").isNotNull())
    )
    return (
        per_user.select(
            (
                F.lit(1)
                + F.col("click_us").isNotNull().cast("int")
                + (
                    F.col("click_us").isNotNull()
                    & F.col("purchase_us").isNotNull()
                ).cast("int")
            ).alias("funnel_level")
        )
        .groupBy("funnel_level")
        .agg(F.count("*").alias("n_users"))
    )


WINDOWED_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
mv AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN us END) AS view_us
  FROM e GROUP BY user_id
),
mc AS (
  SELECT e.user_id, MIN(mv.view_us) AS view_us,
    MIN(CASE WHEN e.event_type = 'click' AND e.us > mv.view_us
             AND e.us <= mv.view_us + 3600000000 THEN e.us END) AS click_us
  FROM e JOIN mv ON e.user_id = mv.user_id
  GROUP BY e.user_id
),
mp AS (
  SELECT e.user_id,
    MIN(CASE WHEN e.event_type = 'purchase' AND e.us > mc.click_us
             AND e.us <= mc.view_us + 3600000000 THEN e.us END)
      AS purchase_us
  FROM e JOIN mc ON e.user_id = mc.user_id
  GROUP BY e.user_id
)
SELECT CAST(1
    + CASE WHEN mc.click_us IS NOT NULL THEN 1 ELSE 0 END
    + CASE WHEN mc.click_us IS NOT NULL AND mp.purchase_us IS NOT NULL
           THEN 1 ELSE 0 END AS INTEGER) AS funnel_level,
  COUNT(*) AS n_users
FROM mc JOIN mp ON mc.user_id = mp.user_id
WHERE mc.view_us IS NOT NULL
GROUP BY funnel_level
"""


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST anomaly detection: hours whose event count deviates
    from the per-type MEDIAN by more than 3× the MEDIAN ABSOLUTE
    DEVIATION — the outlier rule that, unlike the z-score variant
    (``events_hourly_anomaly``), is itself immune to the outliers it
    hunts. Exact interpolated medians (``percentile`` ==
    ``quantile_cont``) over integer counts: every intermediate is an
    exact half-integer double, so the comparison — and the hash —
    is bit-stable across engines.

    Scale shape: hourly counts are one map-side-combined shuffle;
    medians are per-type aggregates over hours (tiny); both medians
    broadcast back. The percentile agg holds one group's hours in
    memory — hours per type is bounded (8 760/year), not data-sized."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    med = hourly.groupBy("event_type").agg(
        F.percentile("cnt", F.lit(0.5)).alias("med")
    )
    # bounded-broadcast: per-event-type medians: the event-type enum is a fixed product domain (a handful of rows)
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    return (
        # bounded-broadcast: per-event-type MADs: same fixed enum domain
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(
                (
                    F.col("absdev") > F.lit(3.0) * F.col("mad")
                ).cast("long")
            ).alias("anomalous_hours"),
        )
    )


ANOMALY_MAD_SQL = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS cnt
  FROM events GROUP BY hour, event_type
),
med AS (
  SELECT event_type, QUANTILE_CONT(cnt, 0.5) AS med
  FROM hourly GROUP BY event_type
),
dev AS (
  SELECT h.event_type, ABS(h.cnt - m.med) AS absdev
  FROM hourly h JOIN med m ON h.event_type = m.event_type
),
mad AS (
  SELECT event_type, QUANTILE_CONT(absdev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, COUNT(*) AS n_hours,
  CAST(SUM(CASE WHEN d.absdev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS anomalous_hours
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
"""


def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral FEATURE VECTOR — the feature-engineering
    pass a churn/propensity model trains on: per-type event counts
    (conditional map-side-combined sums, no pivot shuffle), activity
    span and distinct active days, and exact total spend (int64
    micro-units). ONE shuffle on user_id at any scale; every feature
    is integer or integer-derived, so the row hashes bit-identically
    on both engines."""
    e = table(spark, sf_dir, "events")
    n_of = lambda t: F.sum(  # noqa: E731 — tiny local closure
        (F.col("event_type") == t).cast("long")
    ).alias(f"n_{t}")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        n_of("view"),
        n_of("click"),
        n_of("purchase"),
        n_of("signup"),
        n_of("error"),
        F.count_distinct(F.to_date("ts")).alias("active_days"),
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / F.lit(86_400_000_000.0)
        ).alias("span_days"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 1e6 + 0.5).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.lit(1_000_000.0)
        ).alias("purchase_value"),
    )


USER_FEATURES_SQL = """
SELECT user_id, COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
  (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 86400000000.0 AS span_days,
  CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
                ELSE 0 END) AS DOUBLE) / 1000000.0 AS purchase_value
FROM events GROUP BY user_id
"""


def events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (the MERGE a warehouse runs on a change feed): treat
    each event as a change record on entity ``user_id`` — ``error``
    events are deletes, everything else an upsert carrying ``value``.
    The applied state is the LATEST change per key (ts, event_id
    tie-break), with deleted keys absent, plus the change count per
    key for audit.

    Scale shape: ONE shuffle on the key (the window partition); the
    change-count rides the same partition, no second exchange. This
    is the batch form of the streaming apply in
    ``streaming/orc_sink.py::foreach_batch_orc`` (idempotent
    partition overwrite); value is carried in exact int64
    micro-units so the row hashes bit-identically on both engines."""
    e = table(spark, sf_dir, "events")
    from flink_orc_sink_spark.operators.relational import cdc_latest_state

    ch = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value_micro"),
    )
    return cdc_latest_state(
        ch, ["user_id"], ["ts_us", "event_id"]
    ).select(
        "user_id",
        F.col("ts_us").alias("last_ts_us"),
        F.col("value_micro").alias("last_value_micro"),
        "n_changes",
    )


CDC_APPLY_SQL = """
WITH ch AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
    CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_micro
  FROM events
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts_us DESC, event_id DESC) AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM ch
)
SELECT user_id, ts_us AS last_ts_us, value_micro AS last_value_micro,
       n_changes
FROM r WHERE rn = 1 AND op = 'U'
"""


def events_scd2_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: track each user's event_type as a
    slowly-changing "status" attribute — collapse consecutive repeats,
    then emit one history row per status interval with
    ``effective_from/effective_to`` validity bounds, a version number,
    and the ``is_current`` flag (open interval). This is the standard
    dimension-maintenance pattern a warehouse runs on entity snapshots.

    Scale shape: both windows partition on ``user_id`` — one shuffle,
    the second window reuses the first's partitioning (no second
    exchange in the plan). Intervals are exact integer microseconds."""
    from flink_orc_sink_spark.operators.relational import scd2_history

    e = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    return scd2_history(
        e, ["user_id"], "event_type", "ts_us", order_cols=["ts_us", "event_id"]
    ).select(
        "user_id",
        F.col("event_type").alias("status"),
        "version",
        F.col("effective_from").alias("effective_from_us"),
        F.col("effective_to").alias("effective_to_us"),
        "is_current",
    )


SCD2_SQL = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
chg AS (
  SELECT user_id, event_type AS status, ts, event_id FROM seq
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, status,
  CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
  epoch_us(ts) AS effective_from_us,
  LEAD(epoch_us(ts)) OVER w AS effective_to_us,
  (LEAD(epoch_us(ts)) OVER w IS NULL) AS is_current
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per day computed the REAGGREGATABLE
    way: per-hour user bitmaps (``bitmap_construct_agg``), OR-merged
    up to days (``bitmap_or_agg``), then counted — the pattern that
    lets a 100 TB pipeline keep hourly materializations and roll them
    to day/week/month without ever re-touching raw events (unlike
    COUNT(DISTINCT), which cannot be re-aggregated). The oracle checks
    the merged counts against a direct COUNT(DISTINCT) — the bitmap
    algebra is exact, not approximate.

    Scale shape: the hourly bitmap agg is map-side combinable (bitmap
    bytes merge associatively); the day rollup exchanges only
    (day, bucket, 4 KiB bitmap) rows — corpus-size-independent."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("day", "ts").alias("day_start"),
            F.date_trunc("hour", "ts").alias("hour_start"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day_start", "hour_start", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        hourly.groupBy("day_start", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("day_start")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_users"))
    )


BITMAP_ROLLUP_SQL = """
SELECT DATE_TRUNC('day', ts) AS day_start,
       COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY day_start
"""


def events_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE mergeable distinct rollup: per-hour DataSketches
    HLL sketches (``hll_sketch_agg``) union-merged to days
    (``hll_union_agg``) — the companion to
    ``events_bitmap_distinct_rollup``: bitmaps are exact but grow with
    the key range; HLL sketches are a FIXED few KB at any cardinality,
    which is what a 100 TB pipeline keeps per (dimension-combination,
    hour) cell when the dimensions multiply. The raw estimate is
    engine-specific, so (like ``agg_approx_distinct_sketch``) the
    oracle-checked surface is the sketch CONTRACT: exact distinct per
    day plus a boolean "merged estimate within 5%" that DuckDB expects
    TRUE — a drifting merge flips the hash."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("day", "ts").alias("day_start"),
            F.date_trunc("hour", "ts").alias("hour_start"),
            "user_id",
        )
        .groupBy("day_start", "hour_start")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    merged = hourly.groupBy("day_start").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = e.groupBy(F.date_trunc("day", "ts").alias("day_start")).agg(
        F.count_distinct("user_id").alias("n_distinct_users")
    )
    return exact.join(merged, "day_start").select(
        "day_start",
        "n_distinct_users",
        (
            F.abs(F.col("est") - F.col("n_distinct_users"))
            <= 0.05 * F.col("n_distinct_users")
        ).alias("union_within_bound"),
    )


HLL_ROLLUP_SQL = """
SELECT DATE_TRUNC('day', ts) AS day_start,
       COUNT(DISTINCT user_id) AS n_distinct_users,
       TRUE AS union_within_bound
FROM events GROUP BY day_start
"""


def events_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP via theta-sketch SET ALGEBRA: distinct viewers
    ∩ buyers and viewers ∖ buyers estimated from two mergeable theta
    sketches — the segment-overlap computation ad/analytics stacks run
    across hundreds of segment pairs, where exact distinct-intersections
    (a shuffle per pair) are unaffordable but sketches compose in
    O(sketch bytes). Oracle-checked via the sketch CONTRACT (exact
    counts + "estimate within 5% or ±3" booleans DuckDB expects TRUE);
    the exact side is one per-user flag aggregation — a single shuffle.
    """
    e = table(spark, sf_dir, "events")
    sketches = e.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'view'"
            " THEN user_id END)"
        ).alias("vsk"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase'"
            " THEN user_id END)"
        ).alias("bsk"),
    ).select(
        F.expr(
            "theta_sketch_estimate(theta_intersection(vsk, bsk))"
        ).alias("both_est"),
        F.expr(
            "theta_sketch_estimate(theta_difference(vsk, bsk))"
        ).alias("view_only_est"),
    )
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("long")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias("b"),
    )
    exact = per_user.agg(
        F.sum("v").alias("n_viewers"),
        F.sum("b").alias("n_buyers"),
        F.sum(F.col("v") * F.col("b")).alias("n_both"),
        F.sum(F.col("v") * (1 - F.col("b"))).alias("n_view_only"),
    )
    ok = lambda est, n: (  # noqa: E731 — within 5% or ±3 absolute
        F.abs(F.col(est) - F.col(n))
        <= F.greatest(0.05 * F.col(n), F.lit(3.0))
    )
    return exact.crossJoin(F.broadcast(sketches)).select(
        "n_viewers",
        "n_buyers",
        "n_both",
        "n_view_only",
        ok("both_est", "n_both").alias("intersect_within_bound"),
        ok("view_only_est", "n_view_only").alias("difference_within_bound"),
    )


THETA_OVERLAP_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(v) AS BIGINT) AS n_viewers,
       CAST(SUM(b) AS BIGINT) AS n_buyers,
       CAST(SUM(v * b) AS BIGINT) AS n_both,
       CAST(SUM(v * (1 - b)) AS BIGINT) AS n_view_only,
       TRUE AS intersect_within_bound,
       TRUE AS difference_within_bound
FROM per_user
"""


def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-SERIES GAP FILL: daily totals joined onto a generated
    date SPINE (``sequence(min_day, max_day)``) so days with no
    events appear as explicit zeros — the densification step every
    downstream forecasting/charting consumer needs (a missing row and
    a zero row mean different things). The spine generates from one
    broadcast 2-value aggregate; the join is spine-sized (days), not
    data-sized — at 100 TB the fill costs nothing next to the scan."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("sumv"),
    )
    return spine.join(daily, "day", "left").select(
        F.col("day").cast("timestamp").alias("day_start"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sumv"), F.lit(0.0)).alias("sum_value"),
    )


DAILY_GAPFILL_SQL = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events
),
spine AS (
  SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM bounds
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sumv
  FROM events GROUP BY day
)
SELECT CAST(s.day AS TIMESTAMP) AS day_start,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(d.sumv, 0.0) AS DOUBLE) AS sum_value
FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day
"""


DECAY_WMA_LAGS = 7
DECAY_WMA_ALPHA = 0.5


def events_decay_wma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY-DECAYED moving average of daily totals per event
    type (7 observed-day window, decay 0.5^k) — the trend-smoothing
    primitive behind alerting baselines and forecast features.

    The recursion-free formulation: a fixed LAG-term sum over the
    per-type daily series, normalized by the weights actually present
    (series edges keep exact semantics instead of a warm-up hack).
    The daily rollup is a map-side-combined aggregate to O(types ×
    days) rows; the window runs on that tiny frame — at 100 TB the
    cost is the fact scan, not the smoothing. Weights are exact binary
    (0.5^k) and term order is identical in the oracle, so doubles
    match bit-for-bit before the 6dp round."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.col("x") * F.lit(1.0)
    den = F.lit(1.0)
    for k in range(1, DECAY_WMA_LAGS):
        lagk = F.lag("x", k).over(w)
        wk = F.lit(DECAY_WMA_ALPHA**k)
        num = num + F.coalesce(lagk, F.lit(0.0)) * wk
        den = den + F.when(lagk.isNull(), F.lit(0.0)).otherwise(wk)
    return daily.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day_start"),
        F.round("x", 4).cast("double").alias("sum_value"),
        F.round(num / den, 6).cast("double").alias("decay_wma"),
    )


def _decay_wma_sql() -> str:
    num = ["x * 1.0"]
    den = ["1.0"]
    for k in range(1, DECAY_WMA_LAGS):
        wk = repr(DECAY_WMA_ALPHA**k)
        num.append(f"COALESCE(LAG(x, {k}) OVER w, 0.0) * {wk}")
        den.append(f"CASE WHEN LAG(x, {k}) OVER w IS NULL THEN 0.0 ELSE {wk} END")
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day_start,
  CAST(ROUND(x, 4) AS DOUBLE) AS sum_value,
  CAST(ROUND(({' + '.join(num)}) / ({' + '.join(den)}), 6) AS DOUBLE) AS decay_wma
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


def graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (3 fixed
    iterations, damping 0.85) — the iterative-graph-algorithm family
    (link analysis, influence scoring) as a first-class, ORACLE-
    CHECKED operator. Ranks are fixed-point int64 (parts per 1e12)
    with truncated integer division, so the distributed iteration
    hashes bit-identically to the oracle's unrolled SQL — float
    PageRank can never be value-checked this way.

    The node set here is small (event types) but every step is the
    100 TB shape: per iteration one src-keyed equi-join + one
    map-side-combined groupBy on dst; no driver-side data path (see
    ``operators/graph.py::pagerank_fixed``)."""
    from flink_orc_sink_spark.operators.graph import pagerank_fixed

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .distinct()
    )
    return pagerank_fixed(edges, iterations=3)


def _pagerank_sql(iterations: int = 3, scale: int = 10**12) -> str:
    base = f"""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
edges AS (
  SELECT DISTINCT prev_type AS src, event_type AS dst
  FROM seq WHERE prev_type IS NOT NULL
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
  SELECT node, {scale} // n_nodes AS rank_ppt FROM nodes CROSS JOIN n
)"""
    prev = "r0"
    iters = []
    for i in range(1, iterations + 1):
        iters.append(f""",
it{i} AS (
  SELECT nodes.node,
    ({scale} * 15) // (100 * n.n_nodes)
      + (85 * COALESCE(s.in_sum, 0)) // 100 AS rank_ppt
  FROM nodes CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.rank_ppt // o.outdeg) AS BIGINT) AS in_sum
    FROM {prev} r
    JOIN edges e ON r.node = e.src
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON nodes.node = s.dst
)""")
        prev = f"it{i}"
    return base + "".join(iters) + f"\nSELECT node, rank_ppt FROM {prev}"


PAGERANK_SQL = _pagerank_sql(3)


# Newest entries first: the driver's correctness gate caps at the
# first 50 registry entries (see queries/__init__.py), and this module
# sits last inside the cap — entries past it fall to the committed
# CHECKLOG.md run.
def events_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort revenue matrix: users are cohorted by the month of their
    FIRST purchase; revenue and active-purchaser counts roll up per
    (cohort_month, months-since-cohort) cell — the classic retention/
    LTV triangle every growth dashboard is built on.

    Scale shape: the first-purchase frame is a map-side-combined
    groupBy(user_id); joining it back to purchases is a co-keyed
    shuffle join on user_id (both sides pre-filtered to purchases —
    at 100 TB the filter prunes first, and AQE handles user skew).
    Revenue rides int64 cents (``floor(v·100+0.5)``), so sums are
    order-independent and hash-exact; month arithmetic is pure
    integer year/month math on both engines."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    first = e.groupBy("user_id").agg(
        F.min(F.date_trunc("month", "ts")).alias("cohort_month")
    )
    j = e.join(first, "user_id")
    month_offset = (
        (F.year("ts") - F.year("cohort_month")) * 12
        + (F.month("ts") - F.month("cohort_month"))
    ).cast("int")
    return (
        j.withColumn("month_offset", month_offset)
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_purchases"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


COHORT_REVENUE_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
first AS (
  SELECT user_id, CAST(MIN(date_trunc('month', ts)) AS TIMESTAMP) AS cohort_month
  FROM p GROUP BY user_id
)
SELECT cohort_month,
  CAST((year(ts) - year(cohort_month)) * 12
     + (month(ts) - month(cohort_month)) AS INTEGER) AS month_offset,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_purchases,
  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM p JOIN first USING (user_id)
GROUP BY cohort_month, month_offset
"""


def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak CONCURRENT SESSIONS per day by interval SWEEP-LINE —
    the capacity-planning primitive (max simultaneous users, license
    peaks, connection-pool sizing). Sessions are the 10-minute-gap
    sessionization; each becomes a +1 at its start and a −1 at its
    end, and the running sum over the globally time-ordered deltas is
    the live concurrency. Ends sort before starts at the same instant
    (half-open intervals) and (ts, delta, user_id) is a total order,
    so the prefix sums — and the daily max — are exact integers,
    identical in both engines.

    Shape at 100 TB: sessionization is the usual one user-keyed
    window exchange; the sweep is the TWO-PHASE distributed prefix
    scan — per-day running sums (windows partitioned by day, the
    range-partitioned phase), plus day offsets computed by a window
    over the PER-DAY PARTIAL SUMS (one row per day — metadata-sized,
    the only global step). Associativity makes the split exact:
    offset(day) + within-day prefix == the oracle's single global
    prefix sum. No full-stream single-partition sort anywhere.
    """
    e = table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", gap_minutes=10)
    iv = s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )
    deltas = (
        iv.select(
            F.col("start_ts").alias("t"), F.lit(1).alias("delta"), "user_id"
        )
        .unionAll(
            iv.select(
                F.col("end_ts").alias("t"),
                F.lit(-1).alias("delta"),
                "user_id",
            )
        )
        .withColumn("day", F.date_trunc("day", "t"))
    )
    wday = Window.partitionBy("day").orderBy(
        "t", "delta", "user_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # one row PER DAY — the global window runs on this tiny aggregate
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("day_delta"))
    woff = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_day.select(
        "day",
        F.coalesce(F.sum("day_delta").over(woff), F.lit(0)).alias("offset"),
    )
    swept = deltas.withColumn("within", F.sum("delta").over(wday)).join(
        # bounded-broadcast: per-day carry offsets: calendar-day domain (a few k rows per decade)
        F.broadcast(offsets), "day"
    )
    return swept.groupBy("day").agg(
        F.max(F.col("offset") + F.col("within")).alias("peak_concurrency")
    )


MAX_CONCURRENCY_SQL = """
WITH sess AS (
  SELECT user_id, ts,
    SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 600000000
        THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM (
    SELECT user_id, ts,
      LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
    FROM events)
),
iv AS (
  SELECT user_id, session_seq, MIN(ts) AS start_ts, MAX(ts) AS end_ts
  FROM sess GROUP BY user_id, session_seq
),
deltas AS (
  SELECT start_ts AS t, 1 AS delta, user_id FROM iv
  UNION ALL
  SELECT end_ts AS t, -1 AS delta, user_id FROM iv
),
swept AS (
  SELECT t, SUM(delta) OVER (ORDER BY t, delta, user_id
                             ROWS UNBOUNDED PRECEDING) AS live
  FROM deltas
)
SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
  CAST(MAX(live) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY day
"""


def events_experiment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B EXPERIMENT readout with a two-proportion z-score — the
    online-experimentation primitive. Assignment is the deterministic
    hash-mod bucket (``user_id % 2`` here; a salted hash in
    production — same shape as ``docs_negative_samples``'s sampler);
    a user converts on a high-value purchase (``value >= 95`` —
    plain purchases are near-universal here). Counts are
    exact integers; the rates / lift / z run the identical IEEE
    double formula on those integers in both engines, rounded 6 dp.

    Shape at 100 TB: one distinct-user aggregate with a boolean
    MAX (map-side combined), then a two-row reduce to one. No joins,
    no driver math.
    """
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 95)
            ).cast("int")
        ).alias("converted")
    )
    per_variant = (
        per_user.withColumn("variant", F.pmod("user_id", F.lit(2)))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias(
                "users_a"
            ),
            F.sum(
                F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)
            ).alias("conv_a"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias(
                "users_b"
            ),
            F.sum(
                F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)
            ).alias("conv_b"),
        )
    )
    na = F.col("users_a").cast("double")
    nb = F.col("users_b").cast("double")
    ca = F.col("conv_a").cast("double")
    cb = F.col("conv_b").cast("double")
    pa = ca / na
    pb = cb / nb
    pool = (ca + cb) / (na + nb)
    z = (pb - pa) / F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    return per_variant.select(
        F.col("users_a").cast("long").alias("users_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("users_b").cast("long").alias("users_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pb - pa, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
    )


EXPERIMENT_LIFT_SQL = """
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'purchase' AND value >= 95
        THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS users_a,
    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS users_b,
    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM per_user
)
SELECT users_a, conv_a, users_b, conv_b,
  ROUND(CAST(conv_a AS DOUBLE) / users_a, 6) AS rate_a,
  ROUND(CAST(conv_b AS DOUBLE) / users_b, 6) AS rate_b,
  ROUND(CAST(conv_b AS DOUBLE) / users_b
      - CAST(conv_a AS DOUBLE) / users_a, 6) AS lift,
  ROUND((CAST(conv_b AS DOUBLE) / users_b
       - CAST(conv_a AS DOUBLE) / users_a)
    / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
         * (1 - CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
         * (1.0 / users_a + 1.0 / users_b)), 6) AS z_score
FROM agg
"""


def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE value per day (TWAP — the irregular-
    sample averaging primitive: sensor readings, prices, metrics
    emitted on change rather than on a clock). Each event's value
    holds until the user's next event that day; the last event of a
    user-day carries no interval and drops out. Weights are exact
    int64 microseconds, values exact int64 cents, and the weighted
    sums ride DECIMAL(38,0) — bit-exact in both engines; only the
    final division runs in double, rounded 6 dp.

    Shape at 100 TB: one user-keyed window for the LEAD (the same
    exchange every sequence query shares) and one map-side-combined
    daily aggregate. No global sort.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    nxt = F.lead(t_us).over(w)
    nxt_day = F.lead(F.date_trunc("day", "ts")).over(w)
    rows = (
        e.withColumn("w_us", nxt - t_us)
        .withColumn("same_day", nxt_day == F.date_trunc("day", "ts"))
        .filter(F.col("same_day"))
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("w_us"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    num = F.sum(
        (F.col("w_us").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)"))
    ).cast("decimal(38,0)")
    den = F.sum(F.col("w_us").cast("decimal(38,0)")).cast("decimal(38,0)")
    return rows.groupBy("day").agg(
        F.count("*").alias("n_intervals"),
        F.round(
            num.cast("double") / den.cast("double") / 100.0, 6
        ).alias("twap_value"),
    )


TWAP_SQL = """
WITH seq AS (
  SELECT date_trunc('day', ts) AS day,
    LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS w_us,
    LEAD(date_trunc('day', ts)) OVER w AS nxt_day,
    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
rows_ AS (
  SELECT day, w_us, cents FROM seq WHERE nxt_day = day
)
SELECT CAST(day AS TIMESTAMP) AS day,
  COUNT(*) AS n_intervals,
  ROUND(CAST(CAST(SUM(CAST(w_us AS DECIMAL(19,0))
                    * CAST(cents AS DECIMAL(19,0))) AS DECIMAL(38,0))
             AS DOUBLE)
      / CAST(CAST(SUM(CAST(w_us AS DECIMAL(38,0))) AS DECIMAL(38,0))
             AS DOUBLE) / 100.0, 6) AS twap_value
FROM rows_ GROUP BY day
"""


def events_cumulative_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RUNNING DISTINCT COUNT per user — how many distinct event
    types each user has touched as of each event (the
    breadth-of-engagement feature every behavioural model wants;
    naive running COUNT(DISTINCT) isn't a window function anywhere).
    Formulation: flag each (user, type)'s FIRST occurrence with one
    partitioned row_number, cumulative-sum the flags with one
    user-partitioned window — exact integers, two key-local windows,
    no set-valued state.

    Output is each user's trajectory sampled at every 50th event
    (keyed rows stay value-checkable without emitting the full
    event-grain result)."""
    e = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_user = Window.partitionBy("user_id").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "is_first",
        (F.row_number().over(w_first) == 1).cast("int"),
    )
    out = flagged.select(
        "user_id",
        "event_id",
        F.row_number().over(w_seq).alias("event_seq"),
        F.sum("is_first").over(w_user).alias("distinct_types_so_far"),
    )
    return out.filter(F.col("event_seq") % 50 == 0)


CUMULATIVE_DISTINCT_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      THEN 1 ELSE 0 END AS is_first
  FROM events
)
SELECT user_id, event_id,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS event_seq,
  CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS distinct_types_so_far
FROM flagged
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY event_seq % 50 = 0
"""


def events_user_similarity_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-SERIES SIMILARITY SEARCH over user activity profiles
    (EDBT'19/'20 streaming-similarity family): each user's behaviour
    is their daily event-count vector; find the top-3 most similar
    OTHER users (cosine) for each query user (user_id < 5). Computed
    the SPARSE way — never materializing dense vectors: the dot
    product is a day-key equi-join of per-(user, day) counts
    (query side broadcast), norms are per-user aggregates, and the
    per-query top-k is a partitioned window. Exact integer dots and
    norms; one double division, rounded 6 dp.

    At 100 TB this is the inverted-index similarity join: cost scales
    with nonzero (user, day) cells, not users × dims — the dense
    formulation would be a users × days matrix nobody can build.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    norms = daily.groupBy("user_id").agg(
        F.sum(F.col("n") * F.col("n")).alias("nn")
    )
    # ONE definition of the probe cohort — the q rows and the
    # broadcast norm filter below must never diverge (a widened q
    # with an unwidened norm filter would silently drop the new
    # query users via the qnn inner join)
    in_cohort = F.col("user_id") < 5
    q = daily.filter(in_cohort).select(
        F.col("user_id").alias("qid"),
        "day",
        F.col("n").alias("qn"),
    )
    dots = (
        # bounded-broadcast: query cohort: the fixed user_id<5 probe set x calendar days
        daily.join(F.broadcast(q), "day")
        .filter(F.col("user_id") != F.col("qid"))
        .groupBy("qid", F.col("user_id").alias("cid"))
        .agg(F.sum(F.col("n") * F.col("qn")).alias("dot"))
    )
    scored = (
        dots.join(
            # bounded-broadcast: query-cohort norms — FILTERED to the
            # fixed user_id<5 probe set before the hint, so the
            # broadcast ships O(|cohort|) rows, never O(users) (the
            # join on qid made the unfiltered version value-equal but
            # shipped every user's norm at 100x scale)
            F.broadcast(
                norms.filter(in_cohort)
                .select(F.col("user_id").alias("qid"),
                        F.col("nn").alias("qnn"))
            ),
            "qid",
        )
        .join(
            norms.select(F.col("user_id").alias("cid"),
                         F.col("nn").alias("cnn")),
            "cid",
        )
        .select(
            "qid",
            "cid",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("qnn").cast("double"))
                   * F.sqrt(F.col("cnn").cast("double"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "cid", "cos_sim", "rank")
    )


USER_SIMILARITY_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY user_id, day
),
norms AS (
  SELECT user_id, SUM(n * n) AS nn FROM daily GROUP BY user_id
),
q AS (SELECT user_id AS qid, day, n AS qn FROM daily WHERE user_id < 5),
dots AS (
  SELECT q.qid, d.user_id AS cid, SUM(d.n * q.qn) AS dot
  FROM daily d JOIN q USING (day)
  WHERE d.user_id <> q.qid
  GROUP BY q.qid, d.user_id
),
scored AS (
  SELECT qid, cid,
    ROUND(CAST(dot AS DOUBLE)
        / (SQRT(CAST(nq.nn AS DOUBLE)) * SQRT(CAST(nc.nn AS DOUBLE))),
      6) AS cos_sim
  FROM dots
  JOIN norms nq ON nq.user_id = qid
  JOIN norms nc ON nc.user_id = cid
),
ranked AS (
  SELECT qid, cid, cos_sim,
    ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY cos_sim DESC, cid ASC) AS rank
  FROM scored
)
SELECT qid, cid, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 3
"""


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSEQUENCE SEARCH on the global hourly activity series (the
    matrix-profile / "find a past period like this one" primitive):
    the query pattern is the series' LAST 24 hours; score every
    earlier 24-hour window by exact squared Euclidean distance and
    return the 5 closest. Distance decomposes as ``Σx² + Σq² −
    2Σxq``: the cross term is a 24-row broadcast join on aligned
    hour offsets, the window energy another — no per-window
    recomputation, no dense matrix, exact integers end to end.

    At 100 TB (billions of series points) the same decomposition
    holds per series key; the spine stays integer-indexed so window
    alignment is an equi-join, never a range scan.
    """
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
        .cast("long")
        .alias("h")
    ).agg(F.count("*").alias("x"))
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    # dense integer spine (missing hours = 0) so offsets align
    spine = (
        bounds.select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
        )
        .join(hourly, "h", "left")
        .select("h", F.coalesce("x", F.lit(0)).alias("x"))
    )
    q = (
        spine.crossJoin(F.broadcast(bounds))
        .filter(F.col("h") > F.col("h1") - 24)
        .select((F.col("h") - (F.col("h1") - 23)).alias("i"),
                F.col("x").alias("qx"))
    )
    sq = q.agg(F.sum(F.col("qx") * F.col("qx")).alias("qq"))
    # windows start at w, cover w..w+23; exclude overlap with query
    terms = (
        spine.crossJoin(F.broadcast(q))
        .select((F.col("h") - F.col("i")).alias("w"), "x", "qx",
                (F.col("x") * F.col("qx")).alias("xq"),
                (F.col("x") * F.col("x")).alias("xx"))
    )
    per_w = (
        terms.groupBy("w")
        .agg(
            F.count("*").alias("n_aligned"),
            F.sum("xq").alias("sxq"),
            F.sum("xx").alias("sxx"),
        )
        .crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(sq))
        .filter(
            # a full window aligns exactly one spine row per query
            # offset: 24 pairs — fewer means the window hangs off the
            # series edge
            (F.col("n_aligned") == 24)
            & (F.col("w") >= F.col("h0"))
            & (F.col("w") <= F.col("h1") - 47)  # no query overlap
        )
    )
    dist2 = F.col("sxx") + F.col("qq") - 2 * F.col("sxq")
    return (
        per_w.select(
            F.col("w").alias("window_start_hour"),
            dist2.alias("dist2"),
        )
        .orderBy("dist2", "window_start_hour")
        .limit(5)
    )


PATTERN_MATCH_SQL = """
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         COUNT(*) AS x
  FROM events GROUP BY h
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
spine AS (
  SELECT gs.h, COALESCE(hourly.x, 0) AS x
  FROM (SELECT unnest(range((SELECT h0 FROM bounds),
                            (SELECT h1 FROM bounds) + 1)) AS h) gs
  LEFT JOIN hourly USING (h)
),
q AS (
  SELECT h - ((SELECT h1 FROM bounds) - 23) AS i, x AS qx
  FROM spine WHERE h > (SELECT h1 FROM bounds) - 24
),
sq AS (SELECT SUM(qx * qx) AS qq FROM q),
terms AS (
  SELECT s.h - q.i AS w, s.x, q.qx, s.x * q.qx AS xq, s.x * s.x AS xx
  FROM spine s CROSS JOIN q
),
per_w AS (
  SELECT w, COUNT(*) AS n_aligned, SUM(xq) AS sxq, SUM(xx) AS sxx
  FROM terms GROUP BY w
)
SELECT w AS window_start_hour,
  CAST(sxx + (SELECT qq FROM sq) - 2 * sxq AS BIGINT) AS dist2
FROM per_w
WHERE n_aligned = 24
  AND w >= (SELECT h0 FROM bounds)
  AND w <= (SELECT h1 FROM bounds) - 47
ORDER BY dist2, window_start_hour
LIMIT 5
"""


def events_scd2_pointlookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POINT-IN-TIME dimension lookup against SCD Type-2 history —
    the temporal star join every warehouse runs (fact row → the
    dimension version valid AT the fact's event time, never the
    current one): purchases joined to the user's browsing-status
    history (SCD2 over non-purchase events) on
    ``effective_from ≤ ts < effective_to``.

    Shape at 100 TB: the join is EQUI on the entity key (one keyed
    shuffle — the validity-interval predicate is a post-join filter
    within the key's handful of versions, never a cross product);
    history build reuses the same key partitioning. Purchases before
    any status interval survive with NULL status (left join) — the
    early-fact edge every temporal join must define."""
    from flink_orc_sink_spark.operators.relational import scd2_history

    e = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    dim = scd2_history(
        e.filter(F.col("event_type") != "purchase"),
        ["user_id"],
        "event_type",
        "ts_us",
        order_cols=["ts_us", "event_id"],
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("status"),
        "version",
        "effective_from",
        "effective_to",
        "is_current",
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts_us") >= F.col("effective_from"))
        & (F.col("is_current") | (F.col("ts_us") < F.col("effective_to"))),
        "left",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("status").alias("status_at_purchase"),
        F.col("version").alias("status_version"),
    )


SCD2_LOOKUP_SQL = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events WHERE event_type <> 'purchase'
),
chg AS (
  SELECT user_id, event_type AS status, ts_us, event_id FROM seq
  WHERE prev_type IS NULL OR prev_type <> event_type
),
hist AS (
  SELECT user_id, status,
    CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
    ts_us AS effective_from,
    LEAD(ts_us) OVER w AS effective_to,
    LEAD(ts_us) OVER w IS NULL AS is_current
  FROM chg
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT f.event_id, f.user_id,
  h.status AS status_at_purchase,
  h.version AS status_version
FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase') f
LEFT JOIN hist h
  ON h.user_id = f.user_id
 AND f.ts_us >= h.effective_from
 AND (h.is_current OR f.ts_us < h.effective_to)
"""


def events_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED SPLIT FINDING — the decision-tree / GBDT training
    inner loop (XGBoost's histogram pass) as a value-checked
    operator: the threshold on ``value`` that minimizes weighted
    Gini impurity for predicting ``event_type = 'purchase'``.
    Candidate thresholds are the DISTINCT quantized cents values;
    left/right class counts fall out of one cumulative sum over that
    value-domain table (the same distinct-value trick as the
    Spearman ranks — the window runs over |V| rows, never the event
    stream); the Gini expression is identical IEEE double on exact
    integer counts in both engines, rounded, with threshold
    tie-break. One scan, one combined aggregate, one tiny window.
    """
    e = table(spark, sf_dir, "events")
    rows = e.select(
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    per_val = rows.groupBy("cents").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    tot = per_val.agg(
        F.sum("n").alias("nt"), F.sum("p").alias("pt")
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_val.select(
        "cents",
        F.sum("n").over(w).alias("nl"),
        F.sum("p").over(w).alias("pl"),
    ).crossJoin(F.broadcast(tot))
    nl = F.col("nl").cast("double")
    pl = F.col("pl").cast("double")
    nr = (F.col("nt") - F.col("nl")).cast("double")
    pr = (F.col("pt") - F.col("pl")).cast("double")
    nt = F.col("nt").cast("double")
    gini_l = 1 - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    gini_r = 1 - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    weighted = (nl / nt) * gini_l + (nr / nt) * gini_r
    scored = cum.filter(F.col("nl") < F.col("nt")).select(
        "cents",
        "nl",
        "pl",
        F.round(weighted, 9).alias("gini"),
    )
    return (
        scored.orderBy("gini", "cents")
        .limit(1)
        .select(
            F.col("cents").alias("best_threshold_cents"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("pl").cast("long").alias("pos_left"),
            F.col("gini").alias("weighted_gini"),
        )
    )


BEST_SPLIT_SQL = """
WITH rows_ AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
),
per_val AS (
  SELECT cents, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS p
  FROM rows_ GROUP BY cents
),
tot AS (SELECT SUM(n) AS nt, SUM(p) AS pt FROM per_val),
cum AS (
  SELECT cents,
    CAST(SUM(n) OVER w AS BIGINT) AS nl,
    CAST(SUM(p) OVER w AS BIGINT) AS pl
  FROM per_val
  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
),
scored AS (
  SELECT cents, nl, pl,
    ROUND(
      (CAST(nl AS DOUBLE) / nt)
        * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
             - (CAST(nl - pl AS DOUBLE) / nl)
               * (CAST(nl - pl AS DOUBLE) / nl))
      + (CAST(nt - nl AS DOUBLE) / nt)
        * (1 - (CAST(pt - pl AS DOUBLE) / (nt - nl))
               * (CAST(pt - pl AS DOUBLE) / (nt - nl))
             - (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl))
               * (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl))),
      9) AS gini
  FROM cum CROSS JOIN tot
  WHERE nl < nt
)
SELECT cents AS best_threshold_cents, nl AS n_left, pl AS pos_left,
  gini AS weighted_gini
FROM scored ORDER BY gini, cents LIMIT 1
"""


QUERIES = {
    "events_best_split": events_best_split,
    "events_scd2_pointlookup": events_scd2_pointlookup,
    "events_user_similarity_topk": events_user_similarity_topk,
    "events_pattern_match": events_pattern_match,
    "events_cumulative_distinct": events_cumulative_distinct,
    "events_sessionize_dynamic": events_sessionize_dynamic,
    "events_twap_daily": events_twap_daily,
    "events_max_concurrency": events_max_concurrency,
    "events_experiment_lift": events_experiment_lift,
    "events_cohort_revenue": events_cohort_revenue,
    "graph_pagerank_events": graph_pagerank_events,
    "events_hll_union_rollup": events_hll_union_rollup,
    "events_theta_audience_overlap": events_theta_audience_overlap,
    "events_daily_gapfill": events_daily_gapfill,
    "events_decay_wma_daily": events_decay_wma_daily,
    "events_cdc_apply": events_cdc_apply,
    "events_scd2_status": events_scd2_status,
    "events_bitmap_distinct_rollup": events_bitmap_distinct_rollup,
    "events_markov_transitions": events_markov_transitions,
    "events_conversion_lag": events_conversion_lag,
    "graph_bfs_reachability": graph_bfs_reachability,
    "events_top_paths": events_top_paths,
    "events_rfm_segments": events_rfm_segments,
    "events_rfm_segments_approx": events_rfm_segments_approx,
    "events_windowed_funnel": events_windowed_funnel,
    "events_anomaly_mad": events_anomaly_mad,
    "events_user_features": events_user_features,
    "events_json_badrecords": events_json_badrecords,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_hourly_anomaly": events_hourly_anomaly,
    "events_sliding_1h_30m": events_sliding_1h_30m,
    "events_sessionize_10m": events_sessionize_10m,
    "events_json_extract": events_json_extract,
    "events_dedup_latest": events_dedup_latest,
    "events_asof_orders": events_asof_orders,
    "events_funnel_3step": events_funnel_3step,
    "events_daily_retention": events_daily_retention,
    "events_click_attribution": events_click_attribution,
    "events_rolling_7d_active": events_rolling_7d_active,
}

ORACLES = {
    "events_best_split": BEST_SPLIT_SQL,
    "events_scd2_pointlookup": SCD2_LOOKUP_SQL,
    "events_user_similarity_topk": USER_SIMILARITY_SQL,
    "events_pattern_match": PATTERN_MATCH_SQL,
    "events_cumulative_distinct": CUMULATIVE_DISTINCT_SQL,
    "events_sessionize_dynamic": SESSIONIZE_DYNAMIC_SQL,
    "events_twap_daily": TWAP_SQL,
    "events_max_concurrency": MAX_CONCURRENCY_SQL,
    "events_experiment_lift": EXPERIMENT_LIFT_SQL,
    "events_cohort_revenue": COHORT_REVENUE_SQL,
    "graph_pagerank_events": PAGERANK_SQL,
    "events_hll_union_rollup": HLL_ROLLUP_SQL,
    "events_theta_audience_overlap": THETA_OVERLAP_SQL,
    "events_daily_gapfill": DAILY_GAPFILL_SQL,
    "events_decay_wma_daily": _decay_wma_sql(),
    "events_cdc_apply": CDC_APPLY_SQL,
    "events_scd2_status": SCD2_SQL,
    "events_bitmap_distinct_rollup": BITMAP_ROLLUP_SQL,
    "events_tumbling_hourly": TUMBLING_SQL,
    "events_hourly_anomaly": ANOMALY_SQL,
    "events_sliding_1h_30m": SLIDING_SQL,
    "events_sessionize_10m": SESSIONIZE_SQL,
    "events_json_extract": JSON_SQL,
    "events_dedup_latest": DEDUP_LATEST_SQL,
    "events_asof_orders": ASOF_SQL,
    "events_funnel_3step": FUNNEL_SQL,
    "events_daily_retention": RETENTION_SQL,
    "events_click_attribution": ATTRIBUTION_SQL,
    "events_rolling_7d_active": ROLLING_ACTIVE_SQL,
    "events_markov_transitions": MARKOV_SQL,
    "events_conversion_lag": CONVERSION_LAG_SQL,
    "graph_bfs_reachability": BFS_REACHABILITY_SQL,
    "events_top_paths": TOP_PATHS_SQL,
    "events_rfm_segments": RFM_SEGMENTS_SQL,
    "events_rfm_segments_approx": RFM_APPROX_SQL,
    "events_windowed_funnel": WINDOWED_FUNNEL_SQL,
    "events_anomaly_mad": ANOMALY_MAD_SQL,
    "events_user_features": USER_FEATURES_SQL,
    "events_json_badrecords": JSON_BADRECORDS_SQL,
}
