"""Structured Streaming incremental ingest: file-drop batches stream
into an existing index; final state matches an oracle built on the
union, with replace semantics for re-crawled urls."""

import pytest
import os

import pandas as pd

from swish_e_spark.index.builder import (
    IndexConfig, IndexHandle, build_index,
)
from swish_e_spark.oracle.engine import OracleIndex
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.streaming.ingest import pages_file_stream, stream_index
from swish_e_spark.textproc.tokenizer import TokenizerConfig


def _pages_df(spark, rows, ts):
    from pyspark.sql import functions as F

    return (spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"]))
        .select("url",
                F.lit(ts).cast("timestamp").alias("warc_ts"),
                F.encode("text", "utf-8").alias("html"),
                "text", F.lit("en").alias("lang")))


BASE = [("s0.txt", "alpha bravo charlie delta"),
        ("s1.txt", "echo foxtrot golf hotel"),
        ("s2.txt", "india juliet kilo lima")]
DROP1 = [("s3.txt", "mike november oscar papa"),
         ("s4.txt", "quebec romeo sierra tango")]
DROP2 = [("s1.txt", "echo UPDATED victor whiskey"),   # re-crawl of s1
         ("s5.txt", "xray yankee zulu alpha")]


class TestStreamingIngest:
    def test_file_drop_stream_matches_oracle(self, spark, tmp_path):
        idx = str(tmp_path / "sidx")
        src = str(tmp_path / "drops")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        build_index(spark, _pages_df(spark, BASE, "2024-01-01"), idx,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)

        # two file drops land before the stream starts; availableNow
        # drains both as micro-batches
        _pages_df(spark, DROP1, "2024-01-02").write.mode("append") \
            .parquet(src)
        _pages_df(spark, DROP2, "2024-01-03").write.mode("append") \
            .parquet(src)
        q = stream_index(
            pages_file_stream(spark, src, max_files_per_trigger=1),
            idx, ckpt)
        q.awaitTermination(120)
        assert not q.isActive

        handle = IndexHandle(spark, idx)
        eng = SparkQueryEngine(spark, handle)
        # oracle over the FINAL corpus state (s1 replaced)
        final = {u: t for u, t in BASE + DROP1 + DROP2}
        oracle = OracleIndex(TokenizerConfig(stopwords=frozenset()))
        for url in sorted(final):
            oracle.add(url, final[url].encode(), doctype="txt")
        oracle.build()
        assert handle.stats["n_docs"] == oracle.n_docs == 6
        for query in ("alpha", "echo", "updated", "tango or zulu",
                      "victor and whiskey"):
            got = eng.search(query, k=10)
            want = oracle.query(query, k=10)
            gu = sorted(self._urls(handle, got))
            wu = sorted(oracle.docs[d]["url"] for d, _ in want)
            assert gu == wu, query
            assert sorted(round(s, 9) for _, s in got) == \
                sorted(round(s, 9) for _, s in want), query
        # the replaced crawl of s1 is gone
        assert eng.search("foxtrot", k=10) == []

    def test_replayed_batch_converges(self, spark, tmp_path):
        """foreachBatch redelivery (at-least-once) must not corrupt
        visible state: applying the same drop twice gives the same
        query results (replace semantics absorb the replay)."""
        from swish_e_spark.index.maintenance import update_documents

        idx = str(tmp_path / "ridx")
        build_index(spark, _pages_df(spark, BASE, "2024-01-01"), idx,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        drop = _pages_df(spark, DROP2, "2024-01-03")
        update_documents(spark, drop, idx)
        first = SparkQueryEngine(
            spark, IndexHandle(spark, idx)).search("alpha", k=10)
        update_documents(spark, drop, idx)  # replay
        handle = IndexHandle(spark, idx)
        eng = SparkQueryEngine(spark, handle)
        assert handle.stats["n_docs"] == 4  # not 6: replay absorbed
        replay = eng.search("alpha", k=10)
        assert [round(s, 9) for _, s in replay] == \
            [round(s, 9) for _, s in first]
        assert eng.search("foxtrot", k=10) == []

    def test_crashed_update_repairs_and_replays(self, spark, tmp_path,
                                                monkeypatch):
        """A crash mid-update leaves the manifest incomplete; the
        repair path must roll it BACK (partial shard: artifacts
        dropped) or FORWARD (shard fully committed: finalized), after
        which the replayed batch converges to the same final state."""
        import swish_e_spark.index.maintenance as M
        from swish_e_spark.index.maintenance import (
            repair_incomplete_update, update_documents,
        )

        # --- rollback: crash INSIDE the shard build
        idx = str(tmp_path / "cidx")
        build_index(spark, _pages_df(spark, BASE, "2024-01-01"), idx,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        want = SparkQueryEngine(
            spark, IndexHandle(spark, idx)).search("alpha", k=10)
        drop = _pages_df(spark, DROP2, "2024-01-03")
        real_build = M._build_shard
        monkeypatch.setattr(M, "_build_shard",
                            lambda *a, **k: (_ for _ in ()).throw(
                                RuntimeError("crash in build")))
        with pytest.raises(RuntimeError, match="crash in build"):
            update_documents(spark, drop, idx)
        with pytest.raises(ValueError, match="incomplete"):
            IndexHandle(spark, idx)
        assert repair_incomplete_update(spark, idx) == "rollback"
        eng = SparkQueryEngine(spark, IndexHandle(spark, idx))
        assert [round(s, 9) for _, s in eng.search("alpha", k=10)] == \
            [round(s, 9) for _, s in want]
        monkeypatch.setattr(M, "_build_shard", real_build)

        # --- roll forward: crash AFTER the shard committed, before
        # the manifest finalize
        real_finish = M._finish_update
        monkeypatch.setattr(M, "_finish_update",
                            lambda *a, **k: (_ for _ in ()).throw(
                                RuntimeError("crash at finalize")))
        with pytest.raises(RuntimeError, match="crash at finalize"):
            update_documents(spark, drop, idx)
        monkeypatch.setattr(M, "_finish_update", real_finish)
        assert repair_incomplete_update(spark, idx) == "forward"
        handle = IndexHandle(spark, idx)
        eng = SparkQueryEngine(spark, handle)
        # the forward-rolled state equals a clean update's state
        ref = str(tmp_path / "refidx")
        build_index(spark, _pages_df(spark, BASE, "2024-01-01"), ref,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        update_documents(spark, drop, ref)
        ref_eng = SparkQueryEngine(spark, IndexHandle(spark, ref))
        assert handle.stats["n_docs"] == \
            ref_eng.handle.stats["n_docs"]
        for q in ("alpha", "delta"):
            assert [round(s, 9) for _, s in eng.search(q, k=10)] == \
                [round(s, 9) for _, s in ref_eng.search(q, k=10)], q
        # nothing left to repair
        assert repair_incomplete_update(spark, idx) is None

    def test_auto_compact_and_retention(self, spark, tmp_path):
        """Continuous ingest with compact_every + retain_snapshots:
        shard count stays bounded, the snapshot chain is pruned to the
        retention window, retired generations are GC'd, and the final
        results still match the oracle over the union."""
        from swish_e_spark.index.builder import list_snapshots

        idx = str(tmp_path / "acidx")
        src = str(tmp_path / "acdrops")
        ckpt = str(tmp_path / "acckpt")
        os.makedirs(src)
        build_index(spark, _pages_df(spark, BASE, "2024-01-01"), idx,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        _pages_df(spark, DROP1, "2024-01-02").write.mode("append") \
            .parquet(src)
        _pages_df(spark, DROP2, "2024-01-03").write.mode("append") \
            .parquet(src)
        q = stream_index(
            pages_file_stream(spark, src, max_files_per_trigger=1),
            idx, ckpt, compact_every=2, retain_snapshots=1)
        q.awaitTermination(120)
        assert not q.isActive

        handle = IndexHandle(spark, idx)
        # compaction ran: one live generation, bounded shard count
        assert handle.meta["n_shards"] == 1
        assert list_snapshots(idx) == [handle.meta["snapshot"]]
        # retired generations physically gone (retention GC)
        for sub in ("docs", "segments", "terms"):
            live = set(handle.meta["files"][sub])
            on_disk = {f"{sub}/{n}"
                       for n in os.listdir(os.path.join(idx, sub))
                       if n.startswith("shard=")}
            assert on_disk == live, sub
        assert handle.removed() is None

        eng = SparkQueryEngine(spark, handle)
        final = {u: t for u, t in BASE + DROP1 + DROP2}
        oracle = OracleIndex(TokenizerConfig(stopwords=frozenset()))
        for url in sorted(final):
            oracle.add(url, final[url].encode(), doctype="txt")
        oracle.build()
        assert handle.stats["n_docs"] == oracle.n_docs == 6
        for query in ("alpha", "updated", "tango or zulu"):
            got = eng.search(query, k=10)
            want = oracle.query(query, k=10)
            assert sorted(self._urls(handle, got)) == \
                sorted(oracle.docs[d]["url"] for d, _ in want), query
            assert sorted(round(s, 9) for _, s in got) == \
                sorted(round(s, 9) for _, s in want), query
        assert eng.search("foxtrot", k=10) == []

    @staticmethod
    def _urls(handle, results):
        docs = {r["doc_id"]: r["url"] for r in
                handle.live_docs().select("doc_id", "url").collect()}
        return [docs[d] for d, _ in results]
