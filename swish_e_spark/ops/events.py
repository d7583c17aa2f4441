"""Event-stream operators over the events table: inactivity-gap
sessionization and tumbling-window rollups — the batch-shaped
analogues of the Structured Streaming session/window aggregations a
training-data telemetry pipeline runs (the streaming forms live in
swish_e_spark/streaming/; these batch forms have exact DuckDB oracles
so the driver gate value-compares them).

Timestamps: the parquet column is TIMESTAMP_NTZ, so epoch millis are
computed as an integer diff from the NTZ epoch literal — timezone- and
session-config-independent, and bit-identical to DuckDB's epoch_ms().
All arithmetic below stays in integer milliseconds; only value sums
are floats (rounded to 4 dp like every other op oracle).

Scale shape (10^12 events):
- sessionize shuffles ONCE on user_id; both window functions AND the
  (user_id, session_n) groupBy reuse that partitioning — the captured
  plan (BENCH/PLANS.md "sessionize") shows the HashAggregates sitting
  directly on the Window with no second data Exchange (the only other
  exchange is the presentation orderBy, which a production writer
  drops). Per-user event counts bound the window state; a pathological
  power-user key is AQE's skew case.
- event_rollup is a single partial-aggregated groupBy on
  (hour-bucket, event_type) — low-cardinality, map-side combined.
"""

from __future__ import annotations

from .corpus import events

SESSION_GAP_MS = 30 * 60 * 1000   # 30 min inactivity ends a session
WINDOW_MS = 60 * 60 * 1000        # tumbling rollup window: 1 hour

# TIMESTAMP_NTZ -> epoch ms, timezone-independent (see module docstring)
_EPOCH_MS = ("timestampdiff(MILLISECOND, "
             "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")


def _events_ms(spark, sf_dir):
    from pyspark.sql import functions as F

    return (events(spark, sf_dir)
            .select("event_id", "user_id", "event_type", "value",
                    F.expr(_EPOCH_MS).alias("tms")))


def sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts when a user is
    idle longer than SESSION_GAP_MS (the classic lag + running-sum
    session id — the batch analogue of applyInPandasWithState /
    session_window in the streaming path). Returns one row per
    (user_id, session_n) with event count, start, duration, type
    spread, and summed value."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    e = _events_ms(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    prev = F.lag("tms").over(w)
    ns = F.when(
        prev.isNull() | (F.col("tms") - prev > SESSION_GAP_MS),
        1).otherwise(0)
    c = (e.withColumn("ns", ns)
         .withColumn("session_n", F.sum("ns").over(
             w.rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))))
    return (c.groupBy("user_id", "session_n")
            .agg(F.count("*").alias("n_events"),
                 F.min("tms").alias("start_ms"),
                 (F.max("tms") - F.min("tms")).alias("duration_ms"),
                 F.countDistinct("event_type").alias("n_event_types"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy("user_id", "session_n"))


def event_rollup(spark, sf_dir):
    """Tumbling 1-hour window rollup per event type (the batch form of
    a watermarked windowed aggregation): event and distinct-user
    counts plus value sum/mean per (window, type). Window start stays
    in integer ms (div/multiply), and the mean is derived from the
    ROUNDED total (not a second float aggregation) so Spark and the
    oracle round the identical double — a raw avg() can straddle a
    4-dp boundary on summation order alone."""
    from pyspark.sql import functions as F

    e = _events_ms(spark, sf_dir)
    return (e.withColumn(
                "window_start_ms",
                F.expr(f"(tms div {WINDOW_MS}) * {WINDOW_MS}"))
            .groupBy("window_start_ms", "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .withColumn("avg_value",
                        F.round(F.col("total_value")
                                / F.col("n_events"), 4))
            .orderBy("window_start_ms", "event_type"))


def sessionize_sql() -> str:
    return f"""
with e as (select event_id, user_id, event_type, value,
                  epoch_ms(ts) as tms from events),
l as (select *, lag(tms) over (partition by user_id
          order by tms, event_id) as pt from e),
s as (select *, case when pt is null or tms - pt > {SESSION_GAP_MS}
                     then 1 else 0 end as ns from l),
c as (select *, sum(ns) over (partition by user_id
          order by tms, event_id
          rows between unbounded preceding and current row)
        as session_n from s)
select user_id, cast(session_n as bigint) as session_n,
  count(*) as n_events, cast(min(tms) as bigint) as start_ms,
  cast(max(tms) - min(tms) as bigint) as duration_ms,
  count(distinct event_type) as n_event_types,
  cast(round(sum(value), 4) as double) as total_value
from c group by user_id, session_n
order by user_id, session_n"""


def event_rollup_sql() -> str:
    return f"""
with e as (select user_id, event_type, value, epoch_ms(ts) as tms
           from events)
select cast((tms // {WINDOW_MS}) * {WINDOW_MS} as bigint)
         as window_start_ms,
  event_type, count(*) as n_events,
  count(distinct user_id) as n_users,
  cast(round(sum(value), 4) as double) as total_value,
  cast(round(cast(round(sum(value), 4) as double) / count(*), 4)
       as double) as avg_value
from e group by 1, 2 order by 1, 2"""
