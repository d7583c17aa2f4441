"""Structured Streaming twins of the batch event-stream operators
(ops/events.py): gap sessionization as a custom stateful operator
(``applyInPandasWithState``) and the tumbling rollup as chained
watermarked window aggregations.

Contract: row-identical output to the batch forms. The batch ops are
value-compared against DuckDB by the driver gate, so pinning
streaming == batch (tests/test_streaming_sessions.py) transitively
pins streaming == oracle — the strongest check available for an op
the gate can't run (a streaming query needs a sink + trigger, not a
(spark, sf_dir) -> DataFrame call).

Semantics mirrored from the batch forms exactly:
- a session ends after SESSION_GAP_MS of inactivity; events order by
  (tms, event_id); session numbering is 1-based per user over the
  user's whole history; total_value is the 4-dp rounded sum.
- the rollup keys on (1-hour tumbling window, event_type) with an
  EXACT distinct-user count.

Scale shape (10^12 events/day, 10^8 users):
- sessionize state is one tiny fixed-width row per LIVE user (six
  scalars + the distinct-type list, bounded by the event-type
  vocabulary) — closed sessions leave only the counter behind; state
  is keyed/partitioned by user_id, so executors hold disjoint user
  ranges and the watermark evicts by timeout, never by scan.
- the rollup's exact n_users costs a second stateful stage (the
  (window, type, user) pre-aggregation) instead of a per-window user
  SET in state: state rows are fixed-width and the heavy distinct is
  the same two-shuffle shape the batch plan uses. approx_distinct
  would halve the state but break batch parity; at 100 TB pick per
  pipeline.
- append output mode: rows emit exactly once, when the watermark
  closes the session/window — downstream sinks (parquet drops, the
  index ingest of streaming/ingest.py) see finalized rows only.
"""

from __future__ import annotations

from ..ops.events import SESSION_GAP_MS, WINDOW_MS, _EPOCH_MS

EVENTS_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                 "event_type string, value double, props string")

_OUT_SCHEMA = ("user_id bigint, session_n bigint, n_events bigint, "
               "start_ms bigint, duration_ms bigint, "
               "n_event_types bigint, total_value double")
# closed = sessions already emitted for this user; n_events > 0 means
# a session is open (start/last/types/raw describe it)
_STATE_SCHEMA = ("closed bigint, start_ms bigint, last_ms bigint, "
                 "n_events bigint, event_types array<string>, "
                 "raw_value double")


def events_file_stream(spark, source_dir: str,
                       max_files_per_trigger: int | None = None):
    """A streaming events source over a directory of parquet drops
    (same file-drop shape as streaming/ingest.pages_file_stream)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(source_dir)


def _close(user_id, closed, start_ms, last_ms, n_events, types, raw):
    return (user_id, closed + 1, n_events, start_ms,
            last_ms - start_ms, len(types), raw)


def _sessionize_fn(gap_ms):
    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            closed, start_ms, last_ms, n_events, types, raw = \
                state.get
            types = set(types or ())
        else:
            closed, start_ms, last_ms, n_events, types, raw = \
                0, 0, 0, 0, set(), 0.0
        out = []

        if not state.hasTimedOut:
            chunks = [p for p in pdf_iter if len(p)]
            if chunks:
                rows = pd.concat(chunks, ignore_index=True) \
                    if len(chunks) > 1 else chunks[0]
                rows = rows.sort_values(["tms", "event_id"],
                                        kind="mergesort")
                for tms, etype, value in zip(
                        rows["tms"], rows["event_type"],
                        rows["value"]):
                    tms = int(tms)
                    if n_events and tms - last_ms > gap_ms:
                        out.append(_close(user_id, closed, start_ms,
                                          last_ms, n_events, types,
                                          raw))
                        closed += 1
                        start_ms, n_events, types, raw = \
                            tms, 0, set(), 0.0
                    elif not n_events:
                        start_ms = tms
                    last_ms = tms
                    n_events += 1
                    types.add(etype)
                    raw += float(value)
        else:
            pass  # timeout fired: no new data, close below

        wm = state.getCurrentWatermarkMs()
        if n_events and (state.hasTimedOut or wm > last_ms + gap_ms):
            out.append(_close(user_id, closed, start_ms, last_ms,
                              n_events, types, raw))
            closed += 1
            start_ms, last_ms, n_events, types, raw = \
                0, 0, 0, set(), 0.0
        state.update((closed, start_ms, last_ms, n_events,
                      sorted(types), raw))
        if n_events:
            # watermark <= last+gap here, so this is strictly above it
            state.setTimeoutTimestamp(last_ms + gap_ms + 1)
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "session_n", "n_events", "start_ms",
                "duration_ms", "n_event_types", "total_value"])

    return fn


def stream_sessionize(events_stream, gap_ms: int = SESSION_GAP_MS,
                      watermark_delay: str = "1 hour"):
    """Continuous gap sessionization over a streaming events source.

    Emits one append-mode row per FINALIZED session — a session closes
    when the event-time watermark passes its last event + gap (via
    EventTimeTimeout, so closure needs no further events from that
    user). Output rows are identical to ops.events.sessionize on the
    same data, including per-user session numbering across the whole
    stream (the per-user closed-session counter survives in state).

    ``watermark_delay`` bounds how out-of-order events may arrive;
    rows later than the watermark are dropped by Spark before reaching
    the state function (standard late-data semantics). Out-of-order
    rows WITHIN a micro-batch are re-sorted before folding, so the
    result is exactly batch-equal when each micro-batch is delivered
    time-contiguously (the file-drop shape); an event that arrives in
    a later micro-batch but timestamps BEFORE that user's last folded
    event joins the open session without re-sorting history — the
    inherent incremental-sessionization approximation, bounded by the
    watermark delay.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    # the parquet ts is TIMESTAMP_NTZ (watermarks need an instant):
    # go through the tz-independent integer ms and back, so event
    # time is the same instant whatever the session timezone
    e = (events_stream
         .select("event_id", "user_id", "event_type", "value",
                 F.expr(_EPOCH_MS).alias("tms"))
         .withColumn("etime", F.timestamp_millis(F.col("tms")))
         .withWatermark("etime", watermark_delay))
    out = e.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_ms), _OUT_SCHEMA, _STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout)
    # round exactly where the batch form does (F.round semantics)
    return out.withColumn("total_value", F.round("total_value", 4))


def stream_event_rollup(events_stream, watermark_delay: str = "1 hour"):
    """Watermarked tumbling 1-hour rollup per event type with an EXACT
    distinct-user count, as two chained streaming aggregations: the
    first de-dups (window, event_type, user_id) with per-user partial
    sums, the second folds users into the final (window, event_type)
    row — the streaming form of a count-distinct expansion, emitted in
    append mode once the watermark closes the window. Row-identical to
    ops.events.event_rollup (same ms window keys, same
    round-then-derive mean)."""
    from pyspark.sql import functions as F

    win = F.window("etime", f"{WINDOW_MS // 1000} seconds")
    per_user = (events_stream
                .select("user_id", "event_type", "value",
                        F.timestamp_millis(F.expr(_EPOCH_MS))
                        .alias("etime"))
                .withWatermark("etime", watermark_delay)
                .groupBy(win.alias("w"), "event_type", "user_id")
                .agg(F.count("*").alias("n"),
                     F.sum("value").alias("sv")))
    roll = (per_user
            .groupBy("w", "event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.count("*").alias("n_users"),
                 F.round(F.sum("sv"), 4).alias("total_value")))
    return (roll
            .select(F.unix_millis(F.col("w.start"))
                    .alias("window_start_ms"),
                    "event_type", "n_events", "n_users",
                    "total_value",
                    F.round(F.col("total_value")
                            / F.col("n_events"), 4)
                    .alias("avg_value")))
