"""Streaming twins of the event-stream batch ops: gap sessionization
(applyInPandasWithState, EventTimeTimeout) and the tumbling rollup
(chained watermarked window aggregations) must be ROW-IDENTICAL to
ops/events.py on the same data. The batch forms are value-compared
against DuckDB by the driver gate, so streaming == batch transitively
pins streaming == oracle.

The source is two time-ordered file drops (so per-user session state
must survive across micro-batches) plus two far-future flush drops
that advance the watermark enough to close every real session/window
(watermark N is computed from batch N-1's data, hence TWO flushes).
"""

import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"


def _events_source(spark, tmp_path):
    """Build (source_dir, sf_dir) — sf_dir holds the real events for
    the batch ops, source_dir the same rows as two time-split drops
    plus two watermark-flush drops, mtime-ordered for the file
    stream."""
    from pyspark.sql import functions as F

    sf_dir = str(tmp_path / "sf")
    src = str(tmp_path / "drops")
    os.makedirs(src)
    os.makedirs(sf_dir)
    shutil.copy(os.path.join(SF, "events.parquet"),
                os.path.join(sf_dir, "events.parquet"))
    from swish_e_spark.ops.events import _EPOCH_MS

    ev = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
          .withColumn("_tms", F.expr(_EPOCH_MS)))
    mid, hi = ev.selectExpr(
        "percentile(_tms, 0.5)", "max(ts)").collect()[0]

    def _drop(df, name, mtime):
        d = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        dst = os.path.join(src, name + ".parquet")
        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (mtime, mtime))

    _drop(ev.filter(F.col("_tms") <= mid).drop("_tms"), "d1", 1000)
    _drop(ev.filter(F.col("_tms") > mid).drop("_tms"), "d2", 2000)
    for i, days in enumerate((10, 20)):
        _drop(spark.createDataFrame(
            [(10**9 + i, -1, "flush", 0.0, "{}")],
            "event_id bigint, user_id bigint, event_type string, "
            "value double, props string")
            .select("event_id",
                    F.expr(f"TIMESTAMP_NTZ '{hi}' + INTERVAL "
                           f"{days} DAYS").alias("ts"),
                    "user_id", "event_type", "value", "props"),
            f"f{i}", 3000 + i * 1000)
    return src, sf_dir


@pytest.fixture(scope="module")
def source(spark, tmp_path_factory):
    return _events_source(spark, tmp_path_factory.mktemp("ssess"))


def _run(spark, stream_df, name, ckpt):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert not q.isActive
    return spark.table(name)


class TestStreamingSessions:
    def test_sessionize_matches_batch(self, spark, source, tmp_path):
        from swish_e_spark.ops import events as bev
        from swish_e_spark.streaming.sessions import (
            events_file_stream, stream_sessionize)

        src, sf_dir = source
        got = _run(spark,
                   stream_sessionize(
                       events_file_stream(
                           spark, src, max_files_per_trigger=1)),
                   "t_sess", str(tmp_path / "ck")) \
            .filter("user_id >= 0") \
            .orderBy("user_id", "session_n").toPandas()
        want = bev.sessionize(spark, sf_dir).toPandas()
        assert len(got) == len(want) and len(got) > 50
        assert got.reset_index(drop=True).equals(
            want.reset_index(drop=True))
        # numbering is continuous per user across micro-batches
        per_user = got.groupby("user_id")["session_n"]
        assert (per_user.min() == 1).all()
        assert (per_user.max() == per_user.count()).all()

    def test_rollup_matches_batch(self, spark, source, tmp_path):
        from swish_e_spark.ops import events as bev
        from swish_e_spark.streaming.sessions import (
            events_file_stream, stream_event_rollup)

        src, sf_dir = source
        got = _run(spark,
                   stream_event_rollup(
                       events_file_stream(
                           spark, src, max_files_per_trigger=1)),
                   "t_roll", str(tmp_path / "ck")) \
            .filter("event_type <> 'flush'") \
            .orderBy("window_start_ms", "event_type").toPandas()
        want = bev.event_rollup(spark, sf_dir).toPandas()
        assert len(got) == len(want) and len(got) > 50
        assert got.reset_index(drop=True).equals(
            want.reset_index(drop=True))
