#!/usr/bin/env python
"""Throughput evidence for the streaming sessionizer
(streaming/sessions.stream_sessionize): a deterministic synthetic
event stream (spark.range arithmetic, no external data) is delivered
as time-ordered parquet drops; the stateful query drains them with
availableNow and we report end-to-end events/s, live-state size, and
the batch sessionize wall over the same rows for comparison.

The state path is the point: n_users live GroupState entries cross
micro-batch boundaries, sessions close by event-time timeout, and the
emitted rows must equal the batch op's (asserted here too — this is
the scale-sized rerun of tests/test_streaming_sessions.py).

Usage: python BENCH/streaming_bench.py [n_events] [n_users] [n_drops]
Writes BENCH/STREAMING_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEP_MS = 5 * 60 * 1000          # per-user inter-event step: 5 min
SESSION_LEN = 7                  # events per session block
BLOCK_GAP_MS = 45 * 60 * 1000    # inter-block gap (> the 30-min limit)
BASE_MS = 1_700_000_000_000


def events_df(spark, n_events: int, n_users: int):
    """Deterministic synthetic events: each user emits one event per
    round; every SESSION_LEN rounds the user goes quiet past the
    session gap, so sessions genuinely close by event-time timeout
    MID-stream (not only at the final flush). Pure column arithmetic —
    reproducible, no data files."""
    from pyspark.sql import functions as F

    df = spark.range(n_events)
    uid = (F.col("id") % n_users).alias("user_id")
    rnd = (F.col("id") * F.lit(2654435761)) % 1000
    tms = (F.lit(BASE_MS)
           + F.expr(f"(id div {n_users}) div {SESSION_LEN}")
           * (SESSION_LEN * STEP_MS + BLOCK_GAP_MS)
           + F.expr(f"(id div {n_users}) % {SESSION_LEN}") * STEP_MS
           + rnd)  # sub-second spread so ordering is non-trivial
    return df.select(
        F.col("id").alias("event_id"), uid,
        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
        .alias("_epoch"),
        tms.alias("_tms"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ("view", "click", "scroll", "purchase")]),
            (F.col("id") % 4 + 1).cast("int")).alias("event_type"),
        (rnd / 7.0).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    ).select(
        "event_id",
        F.expr("_epoch + make_dt_interval(0, 0, 0, _tms / 1000.0)")
        .alias("ts"),
        "user_id", "event_type", "value", "props")


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_drops = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("swish-streaming-bench")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "16g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from swish_e_spark.streaming.sessions import (
        events_file_stream, stream_sessionize)

    tmp = tempfile.mkdtemp(prefix="swish_sbench_")
    src = os.path.join(tmp, "drops")
    os.makedirs(src)
    ev = events_df(spark, n_events, n_users).persist()

    def _drop(df, name, mtime):
        stage = os.path.join(tmp, "stage_" + name)
        df.write.mode("overwrite").parquet(stage)
        parts = sorted(f for f in os.listdir(stage)
                       if f.endswith(".parquet"))
        for i, f in enumerate(parts):
            dst = os.path.join(src, f"{name}_{i}.parquet")
            shutil.move(os.path.join(stage, f), dst)
            os.utime(dst, (mtime, mtime))
        shutil.rmtree(stage, ignore_errors=True)

    per = n_events // n_drops
    for d in range(n_drops):
        lo, hi = d * per, (d + 1) * per if d < n_drops - 1 else n_events
        _drop(ev.filter((F.col("event_id") >= lo)
                        & (F.col("event_id") < hi)),
              f"d{d}", 1000.0 + d)
    # two flush drops: far-future sentinel advances the watermark so
    # every real session closes (watermark N comes from batch N-1)
    max_step = (n_events - 1) // n_users
    hi_ms = (BASE_MS
             + (max_step // SESSION_LEN + 1)
             * (SESSION_LEN * STEP_MS + BLOCK_GAP_MS)
             + 1000)
    for i in range(2):
        _drop(spark.createDataFrame(
            [(10**12 + i, -1, "flush", 0.0, "{}")],
            "event_id bigint, user_id bigint, event_type string, "
            "value double, props string")
            .select("event_id",
                    F.expr(f"TIMESTAMP_NTZ '1970-01-01 00:00:00' + "
                           f"make_dt_interval(0, 0, 0, "
                           f"{(hi_ms + (i + 1) * 30 * 86400000)}"
                           f" / 1000.0)").alias("ts"),
                    "user_id", "event_type", "value", "props")
            .coalesce(1), f"f{i}", 2000.0 + i)

    sink = os.path.join(tmp, "out")
    t0 = time.time()
    q = (stream_sessionize(
            events_file_stream(spark, src,
                               max_files_per_trigger=64))
         .writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", os.path.join(tmp, "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(3600)
    stream_wall = time.time() - t0

    out = spark.read.parquet(sink).filter("user_id >= 0").persist()
    n_sessions = out.count()

    # rollup twin over the identical drops (watermarked chained aggs)
    from swish_e_spark.streaming.sessions import stream_event_rollup
    rsink = os.path.join(tmp, "rout")
    t0 = time.time()
    rq = (stream_event_rollup(
            events_file_stream(spark, src,
                               max_files_per_trigger=64))
          .writeStream.format("parquet")
          .option("path", rsink)
          .option("checkpointLocation", os.path.join(tmp, "rck"))
          .outputMode("append").trigger(availableNow=True).start())
    rq.awaitTermination(3600)
    rollup_wall = time.time() - t0
    rout = (spark.read.parquet(rsink)
            .filter("event_type <> 'flush'").persist())
    n_windows = rout.count()

    # batch comparison over the identical rows (parity + wall)
    from swish_e_spark.ops.events import SESSION_GAP_MS, sessionize
    sf_dir = os.path.join(tmp, "sf")
    os.makedirs(sf_dir)
    ev.write.mode("overwrite") \
        .parquet(os.path.join(sf_dir, "events.parquet"))
    t0 = time.time()
    batch = sessionize(spark, sf_dir).persist()
    n_batch = batch.count()
    batch_wall = time.time() - t0
    mismatch = (out.unionAll(batch)
                .groupBy(*out.columns).count()
                .filter("count <> 2").count())

    from swish_e_spark.ops.events import event_rollup
    t0 = time.time()
    rbatch = event_rollup(spark, sf_dir).persist()
    n_rbatch = rbatch.count()
    rollup_batch_wall = time.time() - t0
    rmismatch = (rout.unionAll(rbatch)
                 .groupBy(*rout.columns).count()
                 .filter("count <> 2").count())

    report = {
        "metric": "streaming_sessionize",
        "n_events": n_events, "n_users": n_users,
        "n_drops": n_drops, "cpus": int(cpus),
        "session_gap_ms": SESSION_GAP_MS,
        "stream_wall_s": round(stream_wall, 2),
        "stream_events_per_sec": round(n_events / stream_wall, 1),
        "sessions_emitted": n_sessions,
        "batch_sessions": n_batch,
        "batch_wall_s": round(batch_wall, 2),
        "rows_disagreeing_with_batch": mismatch,
        "rollup_stream_wall_s": round(rollup_wall, 2),
        "rollup_stream_events_per_sec": round(n_events / rollup_wall,
                                              1),
        "rollup_windows_emitted": n_windows,
        "rollup_batch_windows": n_rbatch,
        "rollup_batch_wall_s": round(rollup_batch_wall, 2),
        "rollup_rows_disagreeing_with_batch": rmismatch,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "STREAMING_r5.json"),
              "w") as f:
        json.dump(report, f, indent=1)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
