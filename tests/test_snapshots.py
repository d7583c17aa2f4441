"""Snapshot time travel over the index manifest chain.

Every mutation (build / update / remove / compact / IgnoreLimit)
commits a versioned manifest ``swish_meta/snapshots/v{N}.json`` whose
``files`` section pins the exact data dirs/files of that version —
the Iceberg snapshot model (metadata lists data, readers never glob).
``IndexHandle(spark, dir, snapshot=N)`` opens the index AS OF that
commit; ``expire_snapshots`` garbage-collects unreferenced files.

The reference has no analogue (its -u/-r rewrite the single index
file in place, /root/reference/src/index.c:824-922); this is the
capability-gap side of SURVEY §2.9 (lakehouse storage semantics).
"""

import os

import pytest

from swish_e_spark.datagen.pages import doctype_of_url
from swish_e_spark.index.builder import (
    IndexConfig,
    IndexHandle,
    build_index,
    generate_pages_df,
    list_snapshots,
)
from swish_e_spark.index.maintenance import (
    compact_index,
    expire_snapshots,
    remove_documents,
    update_documents,
)
from swish_e_spark.oracle.engine import OracleIndex
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.textproc.tokenizer import TokenizerConfig

CFG = dict(n_buckets=8, buzzwords=("c++",), chunk_docs=64,
           salt_threshold=32, flush_docs=50)
QUERIES = ["pigs", "pigs AND wolf", '"three little pigs"',
           "pigs OR sugar"]


def _oracle_over(corpus):
    idx = OracleIndex(TokenizerConfig(buzzwords=frozenset({"c++"})))
    for r in corpus:
        idx.add(r["url"], r["html"], doctype=doctype_of_url(r["url"]),
                lang=r["lang"], warc_ts=r["warc_ts"])
    return idx.build()


def _result_set(engine, q, k=1000):
    """Full result set as (url, rounded score) — id spaces differ
    between a rebased/updated index and a from-scratch oracle."""
    ddf = engine.handle.docs()
    url_of = {r["doc_id"]: r["url"]
              for r in ddf.select("doc_id", "url").collect()}
    return {(url_of[d], round(s, 6)) for d, s in engine.search(q, k=k)}


def _oracle_set(oracle, q, k=1000):
    return {(oracle.docs[d]["url"], round(s, 6))
            for d, s in oracle.query(q, k=k)}


class TestTimeTravel:
    @pytest.fixture(scope="class")
    def chain(self, spark, tmp_path_factory, corpus300):
        """Build -> update -> remove -> compact, recording the snapshot
        id and the expected logical corpus after each commit."""
        from pyspark.sql import functions as F

        out = str(tmp_path_factory.mktemp("ttl") / "idx")
        pages = generate_pages_df(spark, 300, partitions=6)
        urls = sorted(r["url"] for r in corpus300)
        cut = urls[200]
        corpus_a = [r for r in corpus300 if r["url"] < cut]

        build_index(spark, pages.filter(F.col("url") < cut), out,
                    IndexConfig(**CFG), n_shards=2)
        s1 = IndexHandle(spark, out).meta["snapshot"]

        batch_urls = set(urls[200:250])
        corpus_b = [r for r in corpus300 if r["url"] in batch_urls]
        update_documents(
            spark, pages.filter(F.col("url").isin(list(batch_urls))),
            out)
        s2 = IndexHandle(spark, out).meta["snapshot"]

        victims = urls[:10]
        n = remove_documents(spark, out, victims)
        assert n == 10
        s3 = IndexHandle(spark, out).meta["snapshot"]
        corpus_c = [r for r in corpus_a + corpus_b
                    if r["url"] not in set(victims)]

        compact_index(spark, out)
        s4 = IndexHandle(spark, out).meta["snapshot"]

        return {
            "dir": out,
            "snaps": [s1, s2, s3, s4],
            "corpora": {s1: corpus_a, s2: corpus_a + corpus_b,
                        s3: corpus_c, s4: corpus_c},
        }

    def test_snapshot_chain_monotonic(self, spark, chain):
        s1, s2, s3, s4 = chain["snaps"]
        assert s1 < s2 < s3 < s4
        assert list_snapshots(chain["dir"]) == [s1, s2, s3, s4]
        meta = IndexHandle(spark, chain["dir"]).meta
        assert meta["snapshot"] == s4
        assert set(meta["files"]) >= {"docs", "segments", "terms",
                                      "removed"}

    @pytest.mark.parametrize("stage", [0, 1, 2, 3])
    def test_as_of_results_match_stage_oracle(self, spark, chain,
                                              stage):
        sid = chain["snaps"][stage]
        engine = SparkQueryEngine(
            spark, IndexHandle(spark, chain["dir"], snapshot=sid))
        oracle = _oracle_over(chain["corpora"][sid])
        for q in QUERIES:
            assert _result_set(engine, q) == _oracle_set(oracle, q), \
                (stage, q)

    def test_snapshot_doc_counts(self, spark, chain):
        # robots-noindex pages are never indexed, so the expectation
        # is the ORACLE's doc count over the stage corpus
        for sid, corpus in chain["corpora"].items():
            h = IndexHandle(spark, chain["dir"], snapshot=sid)
            assert h.live_docs().count() == \
                len(_oracle_over(corpus).docs), sid

    def test_current_handle_sees_compacted_only(self, spark, chain):
        """The current read must NOT double-read old generations left
        on disk for time travel (manifest-driven file listing)."""
        h = IndexHandle(spark, chain["dir"])
        assert h.removed() is None
        assert h.docs().count() == len(
            _oracle_over(chain["corpora"][chain["snaps"][3]]).docs)

    def test_unknown_snapshot_raises(self, spark, chain):
        with pytest.raises(ValueError, match="snapshot"):
            IndexHandle(spark, chain["dir"], snapshot=999)

    def test_snapshot_diff_cdc(self, spark, chain):
        """snapshot_diff (Iceberg incremental read): added between
        build and update, removed between update and remove, EMPTY
        across a compaction (ids preserved, nothing logically
        changed), and the composite across the whole chain."""
        from swish_e_spark.index.maintenance import snapshot_diff

        s1, s2, s3, s4 = chain["snaps"]
        d = chain["dir"]
        # live (indexed) urls per stage — noindex pages never appear
        stage_urls = {
            s: {o["url"] for o in
                _oracle_over(chain["corpora"][s]).docs.values()}
            for s in (s1, s2, s3)}

        def diff(a, b):
            return {(r["url"], r["change"]) for r in
                    snapshot_diff(spark, d, a, b).collect()}

        assert diff(s1, s2) == {(u, "added")
                                for u in stage_urls[s2] - stage_urls[s1]}
        assert diff(s2, s3) == {(u, "removed")
                                for u in stage_urls[s2] - stage_urls[s3]}
        assert diff(s3, s4) == set()
        assert diff(s1, s4) == (
            {(u, "added") for u in stage_urls[s3] - stage_urls[s1]}
            | {(u, "removed") for u in stage_urls[s1] - stage_urls[s3]})

    def test_update_after_compact_ignores_old_generations(
            self, spark, chain, corpus300):
        """update_documents' replace-detection must consult the
        manifest file list: the superseded-url scan over a glob of
        docs/ would see retired generations and tombstone doc_ids that
        are live in the CURRENT generation."""
        from pyspark.sql import functions as F

        urls = sorted(r["url"] for r in corpus300)
        pages = generate_pages_df(spark, 300, partitions=6)
        batch = pages.filter((F.col("url") >= urls[20])
                             & (F.col("url") < urls[25]))
        res = update_documents(spark, batch, chain["dir"])
        assert res["replaced"] >= 1
        h = IndexHandle(spark, chain["dir"])
        live = h.live_docs()
        assert live.count() == len(
            _oracle_over(chain["corpora"][chain["snaps"][3]]).docs)
        assert live.count() == live.select("url").distinct().count()


class TestSnapshotIsolation:
    def test_snapshot_handle_survives_mutation(self, spark, tmp_path,
                                               corpus300):
        """A CURRENT handle goes stale on mutation (hard error, r3
        contract); a SNAPSHOT handle is immutable and keeps serving
        its pinned version."""
        out = str(tmp_path / "iso")
        pages = generate_pages_df(spark, 120, partitions=4)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        s1 = IndexHandle(spark, out).meta["snapshot"]

        current = SparkQueryEngine(spark, IndexHandle(spark, out))
        pinned = SparkQueryEngine(
            spark, IndexHandle(spark, out, snapshot=s1))
        before = {q: _result_set(pinned, q) for q in QUERIES}

        n_before = IndexHandle(spark, out).live_docs().count()
        victims = sorted(r["url"] for r in corpus300)[:5]
        n = remove_documents(spark, out, victims)
        assert n >= 1  # noindex pages among the victims were never live

        with pytest.raises(RuntimeError, match="changed since"):
            current.search("pigs", k=5)
        for q in QUERIES:
            assert _result_set(pinned, q) == before[q], q
        # and the removal IS visible through a fresh current handle
        fresh = IndexHandle(spark, out)
        assert fresh.live_docs().count() == n_before - n


class TestTombstoneAdoption:
    def test_post_compact_manifests_exclude_retired_tombstones(
            self, spark, tmp_path, corpus300):
        """A compact retires the current tombstones (kept on disk only
        for older snapshots). Later remove/update commits must adopt
        ONLY their own new tombstone files — re-adopting the retired
        ones would grow every query's removed() scan with compaction
        history."""
        from pyspark.sql import functions as F

        out = str(tmp_path / "tsa")
        pages = generate_pages_df(spark, 150, partitions=4)
        # generation-order prefix: generate_pages_df(150) IS the first
        # 150 rows of the 300-row corpus fixture
        indexed = corpus300[:150]
        urls = sorted(r["url"] for r in indexed)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        remove_documents(spark, out, urls[:5])
        retired = set(IndexHandle(spark, out).meta["files"]["removed"])
        assert retired
        compact_index(spark, out)
        assert IndexHandle(spark, out).meta["files"]["removed"] == []

        remove_documents(spark, out, urls[5:10])
        after_rm = IndexHandle(spark, out).meta["files"]["removed"]
        assert after_rm and not (set(after_rm) & retired)

        batch = pages.filter(F.col("url").isin(urls[10:13]))
        update_documents(spark, batch, out)
        after_up = IndexHandle(spark, out).meta["files"]["removed"]
        assert set(after_up) >= set(after_rm)
        assert not (set(after_up) & retired)

        # and the engine over the current manifest matches the oracle
        # over the surviving corpus
        survivors = [r for r in indexed
                     if r["url"] not in set(urls[:10])]
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        oracle = _oracle_over(survivors)
        for q in QUERIES:
            assert _result_set(eng, q) == _oracle_set(oracle, q), q


class TestCommitOrdering:
    def test_snapshot_written_before_pointer(self, tmp_path,
                                             monkeypatch):
        """commit_manifest writes the immutable snapshots/v{N}.json
        BEFORE the mutable index.json pointer: a crash between the two
        must never yield a committed current version whose snapshot
        manifest is missing (as-of reads of it would fail forever).
        The reverse orphan is benign — re-commit overwrites it."""
        from swish_e_spark.index import builder

        d = str(tmp_path / "ord")
        os.makedirs(builder._manifest_dir(d))
        real = builder._atomic_write_json
        order = []

        def spy(path, obj):
            order.append(os.path.basename(path))
            real(path, obj)

        monkeypatch.setattr(builder, "_atomic_write_json", spy)
        builder.commit_manifest(d, {"complete": True})
        assert order == ["v1.json", "index.json"]

        # crash window: v2.json lands, index.json write dies → pointer
        # still v1; a retried commit (fresh meta load) re-bumps to v2
        # and atomically replaces the orphan
        def boom(path, obj):
            if path.endswith("index.json"):
                raise RuntimeError("injected crash")
            real(path, obj)

        monkeypatch.setattr(builder, "_atomic_write_json", boom)
        import json as _json
        meta = _json.load(open(os.path.join(builder._manifest_dir(d),
                                            "index.json")))
        with pytest.raises(RuntimeError, match="injected"):
            builder.commit_manifest(d, dict(meta))
        monkeypatch.setattr(builder, "_atomic_write_json", real)
        meta = _json.load(open(os.path.join(builder._manifest_dir(d),
                                            "index.json")))
        assert meta["snapshot"] == 1
        done = builder.commit_manifest(d, dict(meta))
        assert done["snapshot"] == 2
        assert builder.list_snapshots(d) == [1, 2]


class TestConcurrentWriters:
    def test_stale_commit_raises(self, spark, tmp_path, corpus300):
        """Lost-update guard: a mutation based on a manifest another
        writer has since moved past must fail loudly at commit, never
        silently discard the interleaved snapshot."""
        from swish_e_spark.index.builder import (
            ConcurrentMutation, commit_manifest,
        )

        out = str(tmp_path / "occ")
        pages = generate_pages_df(spark, 60, partitions=2)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)

        stale = dict(IndexHandle(spark, out).meta)  # writer A's view
        victims = sorted(r["url"] for r in corpus300)[:3]
        remove_documents(spark, out, victims)       # writer B commits

        with pytest.raises(ConcurrentMutation, match="snapshot"):
            commit_manifest(out, stale)
        # the interleaved commit survived untouched
        assert IndexHandle(spark, out).meta["snapshot"] == \
            stale["snapshot"] + 1

    def test_update_window_open_detects_race(self, spark, tmp_path,
                                             corpus300, monkeypatch):
        """update_documents' lost-update point is the window-open
        overwrite: interleave writer B's remove between writer A's
        manifest load and window-open via the shard-planning hook."""
        import swish_e_spark.index.maintenance as M
        from pyspark.sql import functions as F
        from swish_e_spark.index.builder import ConcurrentMutation

        out = str(tmp_path / "occw")
        pages = generate_pages_df(spark, 60, partitions=2)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        victims = sorted(r["url"] for r in corpus300)[:3]

        # _list_removed_files runs in the gap between writer A's
        # manifest load and its window-open write — the exact window
        # the check guards
        real_list = M._list_removed_files

        def list_and_race(d):
            monkeypatch.setattr(M, "_list_removed_files", real_list)
            remove_documents(spark, out, victims)  # writer B sneaks in
            return real_list(d)

        monkeypatch.setattr(M, "_list_removed_files", list_and_race)
        urls = sorted(r["url"] for r in corpus300)[5:8]
        with pytest.raises(ConcurrentMutation, match="snapshot"):
            update_documents(
                spark, pages.filter(F.col("url").isin(urls)), out)
        # writer B's commit intact, index still opens and serves
        h = IndexHandle(spark, out)
        assert SparkQueryEngine(spark, h).search("pigs", k=3)


class TestExpire:
    def test_expire_gc(self, spark, tmp_path, corpus300):
        from pyspark.sql import functions as F

        out = str(tmp_path / "exp")
        pages = generate_pages_df(spark, 150, partitions=4)
        urls = sorted(r["url"] for r in corpus300)[:150]
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        s1 = IndexHandle(spark, out).meta["snapshot"]
        update_documents(
            spark, pages.filter(F.col("url") < urls[10]), out)
        compact_index(spark, out)
        snaps = list_snapshots(out)
        assert len(snaps) == 3

        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        before = {q: _result_set(eng, q) for q in QUERIES}

        stats = expire_snapshots(out, keep_last=1)
        assert stats["snapshots_deleted"] == 2
        assert stats["dirs_deleted"] >= 2  # pre-compact docs/segments
        assert list_snapshots(out) == [snaps[-1]]

        # expired snapshot: opening raises; a pre-opened handle fails
        # loudly on next use instead of reading deleted files
        with pytest.raises(ValueError, match="snapshot"):
            IndexHandle(spark, out, snapshot=s1)

        # current results are untouched by the GC
        eng2 = SparkQueryEngine(spark, IndexHandle(spark, out))
        for q in QUERIES:
            assert _result_set(eng2, q) == before[q], q

        # the retired generation dirs are physically gone
        meta = IndexHandle(spark, out).meta
        live = {os.path.join(out, f) for fl in meta["files"].values()
                for f in fl}
        for sub in ("docs", "segments", "terms"):
            root = os.path.join(out, sub)
            for name in os.listdir(root):
                assert os.path.join(root, name) in live, (sub, name)

    def test_expire_keeps_current_even_with_keep_last_1(
            self, spark, tmp_path):
        out = str(tmp_path / "exp1")
        pages = generate_pages_df(spark, 80, partitions=2)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        stats = expire_snapshots(out, keep_last=1)
        assert stats["snapshots_deleted"] == 0
        assert SparkQueryEngine(
            spark, IndexHandle(spark, out)).search("pigs", k=3)
