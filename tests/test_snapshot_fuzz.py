"""Snapshot-chain fuzz: a seeded random walk of index mutations
(update / remove / compact / expire), model-checked.

The model is a plain dict url→row of the logical corpus recorded at
every commit. At the end of the walk, every snapshot still retained on
disk must answer queries rank-identically to a from-scratch oracle
over its recorded corpus — across arbitrary interleavings of
compactions (generation retirement) and expiry (physical GC), not
just the straight-line chains test_snapshots.py pins.
"""

import random

import pytest  # noqa: F401  (pytest.raises)

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
QUERIES = ["pigs", "pigs AND wolf", '"three little pigs"']


def _oracle_over(corpus_rows):
    idx = OracleIndex(TokenizerConfig(buzzwords=frozenset({"c++"})))
    for r in sorted(corpus_rows, key=lambda r: r["url"]):
        idx.add(r["url"], r["html"], doctype=doctype_of_url(r["url"]),
                lang=r["lang"], warc_ts=r["warc_ts"])
    return idx.build()


def _result_set(engine, q, k=1000):
    url_of = {r["doc_id"]: r["url"] for r in
              engine.handle.docs().select("doc_id", "url").collect()}
    return {(url_of[d], round(s, 6)) for d, s in engine.search(q, k=k)}


def _oracle_set(oracle, q, k=1000):
    return {(oracle.docs[d]["url"], round(s, 6))
            for d, s in oracle.query(q, k=k)}


def test_snapshot_mutation_walk(spark, tmp_path, corpus300):
    from pyspark.sql import functions as F

    rng = random.Random(7)
    pool = {r["url"]: r for r in corpus300}
    pages = generate_pages_df(spark, 300, partitions=6)

    out = str(tmp_path / "walk")
    start = corpus300[:100]
    start_urls = {r["url"] for r in start}
    build_index(spark,
                pages.filter(F.col("url").isin(list(start_urls))),
                out, IndexConfig(**CFG), n_shards=2)

    corpus = {r["url"]: r for r in start}   # logical current state
    history = {}                            # snapshot id -> frozen state

    def record():
        sid = IndexHandle(spark, out).meta["snapshot"]
        history[sid] = dict(corpus)
        return sid

    record()
    unused = sorted(set(pool) - start_urls)
    ops_run = []
    for step in range(8):
        op = rng.choice(["update", "remove", "compact", "expire"])
        if op == "update":
            # replace some existing + add some never-indexed urls
            batch = (rng.sample(sorted(corpus), rng.randint(1, 4))
                     + [unused.pop(rng.randrange(len(unused)))
                        for _ in range(rng.randint(0, 3)) if unused])
            update_documents(
                spark, pages.filter(F.col("url").isin(batch)), out)
            for u in batch:
                corpus[u] = pool[u]
            record()
        elif op == "remove":
            live = {r["url"] for r in IndexHandle(spark, out)
                    .live_docs().select("url").collect()}
            victims = rng.sample(sorted(live), min(3, len(live)))
            n = remove_documents(spark, out, victims)
            assert n == len(victims)
            for u in victims:
                # noindex urls are never live, so every victim was a
                # real indexed doc of the logical corpus
                del corpus[u]
            record()
        elif op == "compact":
            compact_index(spark, out)
            record()
        else:
            keep = rng.randint(1, 3)
            expire_snapshots(out, keep_last=keep)
            for sid in list(history):
                if sid not in set(list_snapshots(out)):
                    del history[sid]
        ops_run.append(op)

    snaps = list_snapshots(out)
    assert set(snaps) == set(history), (ops_run, snaps,
                                        sorted(history))
    # every retained snapshot answers as-of its recorded corpus
    for sid in snaps:
        eng = SparkQueryEngine(
            spark, IndexHandle(spark, out, snapshot=sid))
        oracle = _oracle_over(history[sid].values())
        for q in QUERIES:
            assert _result_set(eng, q) == _oracle_set(oracle, q), \
                (ops_run, sid, q)
    # and the expired ones are really gone
    for sid in range(1, max(snaps)):
        if sid not in history:
            with pytest.raises(ValueError, match="snapshot"):
                IndexHandle(spark, out, snapshot=sid)
