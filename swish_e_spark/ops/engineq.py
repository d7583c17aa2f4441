"""Segment-engine-backed driver queries: build the REAL inverted index
(index/builder.py) over the `documents` table, query it through the
distributed executor (query/executor.py), and express the same result in
plain SQL for the DuckDB oracle.

To make the engine output SQL-checkable, the index is built with a
neutralized tokenizer (no stopwords, no stemming) whose token stream is
then exactly `lower(text)` split on non-alphanumerics — identical to the
oracle's CTE. Urls are zero-padded doc_ids so the engine's dense
url-ordered doc_id assignment reproduces the table's own ids.
"""

from __future__ import annotations

import os
import tempfile

_CACHE: dict = {}


def _index_for(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from ..index.builder import (
        IndexConfig, IndexHandle, build_index,
    )

    key = os.path.abspath(sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"))
    out = tempfile.mkdtemp(prefix="swish_entry_idx_")
    cfg = IndexConfig(n_buckets=8, stopwords=())
    build_index(spark, pages, out, cfg, n_shards=1)
    handle = IndexHandle(spark, out)
    _CACHE[key] = handle
    return handle


def _engine(spark, sf_dir):
    from ..query.executor import SparkQueryEngine

    return SparkQueryEngine(spark, _index_for(spark, sf_dir))


def engine_bm25_topk(spark, sf_dir, q="hash join", k=10):
    """Implicit-AND two-term BM25 via the segment engine; scores rounded
    for cross-engine comparison. doc_id == documents.doc_id."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.search_df(q, k=k)
    return df.select("doc_id", F.round("score", 4).alias("score")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))


def engine_or_topk(spark, sf_dir, q="vector or stream", k=10):
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.search_df(q, k=k)
    return df.select("doc_id", F.round("score", 4).alias("score")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))


def engine_phrase_match(spark, sf_dir, q='"hash join"'):
    """Phrase match via segment positions; returns matching doc ids."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_near_match(spark, sf_dir, q="merge near4 batch"):
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_wildcard_match(spark, sf_dir, q="sc*"):
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")
