"""Structured Streaming ingest: incremental indexing from a streaming
pages source.

The reference re-runs swish-e with ``-u`` to fold new crawls into an
index (/root/reference/src/index.c:824-922 replace semantics); the
Spark-native continuous form is a streaming query whose every
micro-batch runs the SAME incremental-update path
(maintenance.update_documents): the batch indexes as a new shard with
newest-wins tombstones for replaced urls, committed atomically through
the manifest.

Delivery semantics: foreachBatch may redeliver a micro-batch after a
failure (at-least-once). Replays are ABSORBED, not duplicated: each
shard commit is atomic (temp dir + rename + manifest swap), and
re-indexing the same urls tombstones the previous copies, so a
replayed batch converges to the same visible index state — query
results are effectively exactly-once. A crash INSIDE an update leaves
the manifest incomplete; every batch therefore first runs
maintenance.repair_incomplete_update, which rolls the interrupted
update forward (shard fully committed: finalize) or back (partial:
drop the artifacts) before applying its own data. Within-batch url
duplicates dedupe deterministically (newest warc_ts, content hash as
the tiebreaker), so a replay indexes the same rows the original
attempt did. A later compact_index folds the
accumulated shards/tombstones down (the maintenance story is shared
with batch mode).

At scale: each micro-batch is one bounded build_shard job over only
the new data (cost ∝ batch size, never corpus size); watermarking /
dedup of the SOURCE (e.g. dropDuplicates on url within the batch) is
the caller's choice, since replace semantics make later batches win
anyway.
"""

from __future__ import annotations

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_index(pages_stream_df, index_dir: str, checkpoint_dir: str,
                 trigger: dict | None = None,
                 compact_every: int | None = None,
                 retain_snapshots: int | None = None):
    """Start a streaming query that incrementally indexes
    ``pages_stream_df`` (a streaming DataFrame with the pages-table
    schema) into the EXISTING index at ``index_dir``.

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — defaults to
    ``{"availableNow": True}`` (drain whatever the source has, then
    stop), the right mode for catch-up indexing; pass e.g.
    ``{"processingTime": "30 seconds"}`` for continuous tailing.

    ``compact_every``: auto-compact once the index accumulates this
    many shards. Unbounded continuous ingest otherwise grows one shard
    (and one snapshot) per non-empty micro-batch, and query cost grows
    with live shard count; compaction folds shards + tombstones back
    to one generation, committed as a new snapshot while older
    snapshots keep reading the retired generation (time travel).

    ``retain_snapshots``: after each commit, expire all but the newest
    N snapshots and garbage-collect the data files only they
    reference (maintenance.expire_snapshots). Without it a tailing
    stream's snapshot chain — and every generation ever retired by
    auto-compaction — accumulates forever. Pick N to cover the longest
    window any as-of reader pins.

    Returns the ``StreamingQuery``.
    """
    from .. import index  # noqa: F401  (package import side locality)
    from ..index.maintenance import (
        _load_meta, compact_index, expire_snapshots,
        repair_incomplete_update, update_documents,
    )

    def _batch(df, batch_id: int):
        spark = df.sparkSession
        # a crash mid-update (at-least-once delivery means this batch
        # may BE the redelivery of the one that crashed) leaves the
        # manifest incomplete — repair first (roll the interrupted
        # update forward or back), then apply this batch normally
        repair_incomplete_update(spark, index_dir)
        batch = df.persist()  # read once: probe + replace-join + build
        try:
            # an empty micro-batch (trigger fired, nothing new): no-op
            if not batch.take(1):
                return
            # within-batch duplicates would race in one shard: keep
            # the newest row per url, content hash as a DETERMINISTIC
            # tiebreaker on equal timestamps so a replayed batch
            # indexes the same row the original attempt did
            from pyspark.sql import Window, functions as F

            w = Window.partitionBy("url").orderBy(
                F.desc("warc_ts"), F.desc(F.xxhash64("html")))
            deduped = (batch.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))
            update_documents(spark, deduped, index_dir)
            if compact_every is not None and \
                    _load_meta(index_dir)["n_shards"] >= compact_every:
                compact_index(spark, index_dir)
            if retain_snapshots is not None:
                expire_snapshots(index_dir, keep_last=retain_snapshots)
        finally:
            batch.unpersist()

    writer = (pages_stream_df.writeStream
              .foreachBatch(_batch)
              .option("checkpointLocation", checkpoint_dir))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def pages_file_stream(spark, source_dir: str, max_files_per_trigger:
                      int | None = None):
    """A streaming pages source over a directory of parquet drops (the
    common crawl-delivery shape: each new crawl lands as files; the
    stream picks up only new ones, tracked by the checkpoint)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(source_dir)
