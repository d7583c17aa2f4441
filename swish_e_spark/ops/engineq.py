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


def engine_near_chain(spark, sf_dir, q="merge near4 batch near4 data"):
    """Chained NEAR with the reference's area semantics (KeepPos,
    /root/reference/src/search.c:1915-1975): the third term must be
    within the window of a KEPT position of BOTH prior series — the
    DuckDB oracle transcribes the valid/kept/exists algebra exactly."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_phrase3_match(spark, sf_dir, q='"stream table hash"'):
    """Three-term phrase: exercises the multi-term batch_phrase kernel
    (offset-shifted searchsorted over all three position arrays)."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_not_complement(spark, sf_dir, q="not hash"):
    """Unary NOT: complement of the match set with rank 1000
    (notresultlist, /root/reference/src/search.c:2514-2553)."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return (df.select("doc_id", F.round("score", 4).alias("score"))
            .orderBy("doc_id"))


def engine_wildcard_match(spark, sf_dir, q="sc*"):
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_wand_topk(spark, sf_dir, q="hash join", k=10):
    """Same query as engine_bm25_topk but FORCING the block-max WAND
    pruned path (executor._search_wand) — the DuckDB oracle checking
    both proves the pruning is lossless."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    df = eng.search_df(q, k=k, wand="force")
    return df.select("doc_id", F.round("score", 4).alias("score")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))


def engine_rare_and(spark, sf_dir, q="dup AND hash"):
    """Conjunction whose rarest leaf ('dup', df 25 « 'hash', df 394)
    drives the exhaustive-path doc allowlist
    (executor._required_allow_docs): the head leaf's postings are
    dropped by the decode kernel before materialization, DAAT-style.
    The ≥100k-doc production gate is lowered so the path executes at
    driver scale; the DuckDB oracle proves the filter is lossless."""
    eng = _engine(spark, sf_dir)
    eng.exh_prune_min_docs = 0
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_wand_warm_topk(spark, sf_dir, q="hash join", k=10):
    """engine_wand_topk queried twice on one engine: the second run
    plans from the threshold cache (θ = the first run's true k-th
    score, ulp-backed) and the resident term dictionary — zero extra
    planning jobs. Oracle identity proves the warm pruning path is
    lossless, not just the cold one."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    eng.search_df(q, k=k, wand="force").collect()
    df = eng.search_df(q, k=k, wand="force")
    return df.select("doc_id", F.round("score", 4).alias("score")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))


# one structural spec drives BOTH the engine battery and the DuckDB
# oracle SQL (__spark_entry__._batch_sql): (qid, query string, kind,
# terms..., [distance]) — kinds term/and/or/andnot/phrase/near, every
# scored query ≤2 leaves so the oracle's float sum is commutative
BATCH_BATTERY = [
    ("q00", "hash", "term", ("hash",)),
    ("q01", "join", "term", ("join",)),
    ("q02", "vector", "term", ("vector",)),
    ("q03", "dup", "term", ("dup",)),
    ("q04", "scan", "term", ("scan",)),
    ("q05", "window", "term", ("window",)),
    ("q06", "spark", "term", ("spark",)),
    ("q07", "filter", "term", ("filter",)),
    ("q08", "hash AND join", "and", ("hash", "join")),
    ("q09", "merge AND batch", "and", ("merge", "batch")),
    ("q10", "dup AND hash", "and", ("dup", "hash")),
    ("q11", "sort AND window", "and", ("sort", "window")),
    ("q12", "group AND query", "and", ("group", "query")),
    ("q13", "big AND slow", "and", ("big", "slow")),
    ("q14", "vector OR stream", "or", ("vector", "stream")),
    ("q15", "dup OR key", "or", ("dup", "key")),
    ("q16", "fast OR line", "or", ("fast", "line")),
    ("q17", "column OR value", "or", ("column", "value")),
    ("q18", "hash NOT join", "andnot", ("hash", "join")),
    ("q19", "scan NOT dup", "andnot", ("scan", "dup")),
    ("q20", '"hash join"', "phrase", ("hash", "join")),
    ("q21", '"stream table"', "phrase", ("stream", "table")),
    ("q22", "merge NEAR4 batch", "near", ("merge", "batch"), 4),
    ("q23", "data NEAR6 row", "near", ("data", "row"), 6),
]


def engine_batch_topk(spark, sf_dir, k=10):
    """24-query battery scored in ONE shared pipeline
    (query/batch.py): one pruned segment scan + one decode + one
    doc_id shuffle for the whole battery, vs 24 separate jobs
    sequentially. Results are rank-identical to per-query search_df;
    the DuckDB oracle re-derives every query independently."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    queries = {qid: q for qid, q, *_ in BATCH_BATTERY}
    df = eng.search_batch(queries, k=k)
    return (df.select("query_id", "doc_id",
                      F.round("score", 4).alias("score"))
            .orderBy("query_id", F.desc("score"), F.asc("doc_id")))


def engine_swishrank0_topk(spark, sf_dir, q="hash join", k=10):
    """Swish-e scheme-0 (structure-weighted TF) ranked top-k — engine
    path; rows-only driver check (the integer rank formula over per-
    posting structure bytes is not expressible in the SQL token CTE).
    Verified rank-identical to the pure-Python oracle in
    tests/test_lifecycle.py."""
    from ..query.swishrank import spark_swish_search

    eng = _engine(spark, sf_dir)
    rows = spark_swish_search(eng, q, k=k, scheme=0)
    return spark.createDataFrame(
        [(int(d), int(r)) for d, r in rows] or [(None, None)],
        "doc_id long, rank long").where("doc_id is not null")


def engine_swishrank1_topk(spark, sf_dir, q="hash join", k=10):
    """Swish-e scheme-1 (IDF/density) ranked top-k — rows-only."""
    from ..query.swishrank import spark_swish_search

    eng = _engine(spark, sf_dir)
    # scheme 1 requires stored word counts (the reference refuses -R 1
    # with IgnoreTotalWordCountWhenRanking 1); this index stores them
    rows = spark_swish_search(eng, q, k=k, scheme=1,
                              ignore_total_word_count=False)
    return spark.createDataFrame(
        [(int(d), int(r)) for d, r in rows] or [(None, None)],
        "doc_id long, rank long").where("doc_id is not null")


def engine_keyword_dump(spark, sf_dir, prefix="sc"):
    """-k keyword dump over the terms summary table; SQL-checkable
    (term, df, cf)."""
    from ..query.output import keywords

    handle = _index_for(spark, sf_dir)
    rows = keywords(handle, startswith=prefix, limit=10000)
    return spark.createDataFrame(
        [(t, int(df), int(cf)) for t, df, cf in rows]
        or [(None, None, None)],
        "term string, df long, cf long").where("term is not null") \
        .orderBy("term")
