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
    path. The DuckDB oracle transcribes the integer rank arithmetic
    (ln-scaled tf, factor-of-100 scaling, mean-combine) over the token
    CTE — a full value-hash gate, not rows-only (this corpus is
    structure-flat, so the structure multiplier is 1 everywhere and
    the formula is SQL-expressible)."""
    from ..query.swishrank import spark_swish_search

    eng = _engine(spark, sf_dir)
    rows = spark_swish_search(eng, q, k=k, scheme=0)
    return spark.createDataFrame(
        [(int(d), int(r)) for d, r in rows] or [(None, None)],
        "doc_id long, rank long").where("doc_id is not null")


def engine_swishrank1_topk(spark, sf_dir, q="hash join", k=10):
    """Swish-e scheme-1 (IDF/density) ranked top-k; the DuckDB oracle
    transcribes the scheme-1 integer density/IDF arithmetic exactly
    (full value-hash gate)."""
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


# ---------------------------------------------------------------------
# round 4: driver-gate entries for operators previously pinned only in
# pytest — structure mask (-t), metaname scope, property sort (-s),
# query stopwords, the incremental remove/update lifecycle (-r/-u),
# whole-index merge (-M), and multi-index tape merge (-f a -f b).


def _rich_index_for(spark, sf_dir):
    """Index over an HTML-wrapped corpus: ``<title>`` = the first three
    text tokens, ``<meta name="doclang">`` = the lang column, body =
    the raw text; stopwords ('a','an','the') active at index AND query
    time. Every structural feature is a deterministic function of the
    documents table, so structure bits (IN_TITLE), metaname fields, the
    stored title property, and stopword removal are all SQL-derivable
    for the DuckDB oracle."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexConfig, IndexHandle, build_index
    from .corpus import TOKEN_SPLIT

    key = ("rich", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.array_join(
        F.slice(F.filter(F.split(F.lower("text"), TOKEN_SPLIT),
                         lambda x: x != ""), 1, 3), " ")
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit('</title><meta name="doclang" content="'), F.col("lang"),
        F.lit('"></head><body>'), F.col("text"),
        F.lit("</body></html>"))
    pages = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"))
    out = tempfile.mkdtemp(prefix="swish_entry_rich_")
    cfg = IndexConfig(n_buckets=8, stopwords=("a", "an", "the"))
    build_index(spark, pages, out, cfg, n_shards=1)
    handle = IndexHandle(spark, out)
    _CACHE[key] = handle
    return handle


def _rich_engine(spark, sf_dir):
    from ..query.executor import SparkQueryEngine

    return SparkQueryEngine(spark, _rich_index_for(spark, sf_dir))


def engine_struct_title(spark, sf_dir, q="hash"):
    """Structure mask (-t t, IN_TITLE): docs whose <title> contains the
    term (struct-bit posting filter, /root/reference/src/swish.c:1092
    and search.c structure tests). Title = the first three text tokens,
    so the oracle is the token CTE restricted to token rank <= 3."""
    from ..textproc.extractor import IN_TITLE

    eng = _rich_engine(spark, sf_dir)
    df = eng.match_df(q, structure_mask=IN_TITLE)
    return df.select("doc_id").orderBy("doc_id")


def engine_meta_scope(spark, sf_dir, q="doclang=en AND hash"):
    """Metaname-scoped query (meta=value AND default-field term): the
    doclang meta carries the documents.lang column, so the oracle is a
    plain relational filter on lang."""
    eng = _rich_engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def engine_sort_title(spark, sf_dir, q="hash", k=20):
    """-s property sort: matching docs ordered by the STORED swishtitle
    property (ranked_results multi-key sort path, query/output.py) —
    title asc, doc_id asc, first k."""
    from ..query.output import ranked_results

    eng = _rich_engine(spark, sf_dir)
    rows = ranked_results(eng, q, k=k, props=["title"],
                          sort=[("swishtitle", "asc")])
    return spark.createDataFrame(
        [(int(r["doc_id"]), r["title"]) for r in rows]
        or [(None, None)],
        "doc_id long, title string").where("doc_id is not null")


def engine_stopword_query(spark, sf_dir, q="a hash"):
    """Query-side stopword removal (WORDS_TOO_COMMON discard,
    /root/reference/src/search.c:1444-1522): 'a' is a configured
    stopword of the rich index, so the parse reduces to the bare term —
    the oracle ignores it entirely."""
    eng = _rich_engine(spark, sf_dir)
    df = eng.match_df(q)
    return df.select("doc_id").orderBy("doc_id")


def _mut_index_for(spark, sf_dir):
    """Dedicated mutated index: full build, then -r remove of every
    7th doc, then -u update replacing every 11th doc's body with
    'updatedmarker' repeated (doc_id % 5 + 1) times. Every mutation is
    a pure function of doc_id, so the post-mutation corpus is exactly
    SQL-derivable. Kept separate from the shared handle: mutations bump
    the manifest snapshot, which (correctly) invalidates open engines."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexConfig, IndexHandle, build_index
    from ..index.maintenance import remove_documents, update_documents

    key = ("mut", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"))
    out = tempfile.mkdtemp(prefix="swish_entry_mut_")
    build_index(spark, pages, out, IndexConfig(n_buckets=8,
                                               stopwords=()),
                n_shards=1)
    n_docs = docs.count()
    remove_documents(spark, out,
                     [f"{d:012d}" for d in range(0, n_docs, 7)])
    new_text = F.array_join(
        F.array_repeat(F.lit("updatedmarker"),
                       (F.col("doc_id") % 5 + 1).cast("int")), " ")
    upd = (docs.filter(F.col("doc_id") % 11 == 0)
           .select(F.format_string("%012d", F.col("doc_id")).alias("url"),
                   F.lit("2024-02-01 00:00:00").cast("timestamp")
                   .alias("warc_ts"),
                   F.encode(new_text, "utf-8").alias("html"),
                   new_text.alias("text"),
                   F.col("lang")))
    update_documents(spark, upd, out)
    handle = IndexHandle(spark, out)
    _CACHE[key] = handle
    return handle


def engine_lifecycle_match(spark, sf_dir, q="hash OR updatedmarker"):
    """Incremental lifecycle (-r/-u, tombstones + replace shard): after
    removing every 7th doc and replacing every 11th doc's body, the
    match set of 'hash OR updatedmarker' is exactly (docs that still
    contain 'hash' and survived both mutations) ∪ (the updated docs).
    Updated docs get NEW dense ids in the update shard, so results map
    back to documents.doc_id through the stored url property."""
    from pyspark.sql import functions as F

    from ..query.executor import SparkQueryEngine

    eng = SparkQueryEngine(spark, _mut_index_for(spark, sf_dir))
    df = eng.match_df(q)
    docs = eng.handle.live_docs().select("doc_id", "url")
    return (df.join(docs, "doc_id")
            .select(F.col("url").cast("long").alias("doc_id"))
            .orderBy("doc_id"))


def engine_snapshot_asof(spark, sf_dir, q="hash"):
    """Snapshot time travel (Iceberg commit model, SURVEY §2.9 — no
    reference analogue: -u/-r rewrite the single index file in place,
    /root/reference/src/index.c:824-922): the lifecycle index above
    committed snapshot v1 at build, then v2 (-r) and v3 (-u). Opening
    the index AS OF v1 through the immutable snapshots/v1.json manifest
    must see the ORIGINAL corpus — both mutations invisible — so the
    oracle is the plain full-corpus match set, with doc ids mapped back
    through the url property stored in the pinned docs generation."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexHandle, list_snapshots
    from ..query.executor import SparkQueryEngine

    out_dir = _mut_index_for(spark, sf_dir).out_dir
    v1 = list_snapshots(out_dir)[0]
    pinned = IndexHandle(spark, out_dir, snapshot=v1)
    eng = SparkQueryEngine(spark, pinned)
    df = eng.match_df(q)
    docs = pinned.docs().select("doc_id", "url")
    return (df.join(docs, "doc_id")
            .select(F.col("url").cast("long").alias("doc_id"))
            .orderBy("doc_id"))


def engine_snapshot_diff(spark, sf_dir):
    """Change-data-capture between the lifecycle index's build
    snapshot and its current version (maintenance.snapshot_diff —
    Iceberg incremental read; no reference analogue). The mutations
    are pure functions of doc_id, so the change set is exactly
    SQL-derivable: every 7th doc was removed (-r) unless every-11th
    replacement (-u) re-added its url under a new id — urls live in
    both versions under different ids report 'replaced'."""
    from pyspark.sql import functions as F

    from ..index.builder import list_snapshots
    from ..index.maintenance import snapshot_diff

    out_dir = _mut_index_for(spark, sf_dir).out_dir
    v1 = list_snapshots(out_dir)[0]
    df = snapshot_diff(spark, out_dir, v1)
    return (df.select(F.col("url").cast("long").alias("doc_id"),
                      "change")
            .orderBy("doc_id"))


def _halves_for(spark, sf_dir):
    """Two independent complete indexes over the even / odd halves of
    the corpus (same semantic config, as merge_indexes requires)."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexConfig, build_index

    key = ("halves", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dirs = []
    for r in (0, 1):
        pages = (docs.filter(F.col("doc_id") % 2 == r)
                 .select(F.format_string("%012d", F.col("doc_id"))
                         .alias("url"),
                         F.lit("2024-01-01 00:00:00").cast("timestamp")
                         .alias("warc_ts"),
                         F.encode(F.col("text"), "utf-8").alias("html"),
                         F.col("text"),
                         F.col("lang")))
        out = tempfile.mkdtemp(prefix=f"swish_entry_half{r}_")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=8, stopwords=()), n_shards=1)
        dirs.append(out)
    _CACHE[key] = tuple(dirs)
    return _CACHE[key]


def engine_merged_bm25(spark, sf_dir, q="hash join", k=10):
    """Whole-index merge (-M, /root/reference/src/merge.c:77-400):
    even-half + odd-half indexes merged (posting binaries copied, doc
    ids rebased via per-shard doc_base), then BM25 top-k on the merged
    index. Merged global stats equal a from-scratch full build's, so
    the oracle is the SAME SQL as engine_bm25_topk — proving the merge
    is lossless, not just runnable. Result ids map back through url."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexHandle
    from ..index.maintenance import merge_indexes
    from ..query.executor import SparkQueryEngine

    key = ("merged", os.path.abspath(sf_dir))
    if key not in _CACHE:
        a, b = _halves_for(spark, sf_dir)
        out = tempfile.mkdtemp(prefix="swish_entry_merged_")
        os.rmdir(out)  # merge_indexes insists on creating the target
        merge_indexes(spark, [a, b], out)
        _CACHE[key] = IndexHandle(spark, out)
    eng = SparkQueryEngine(spark, _CACHE[key])
    df = eng.search_df(q, k=k)
    docs = eng.handle.docs().select("doc_id", "url")
    return (df.join(docs, "doc_id")
            .select(F.col("url").cast("long").alias("doc_id"),
                    F.round("score", 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")))


def engine_multi_index(spark, sf_dir, q="dup"):
    """Multi-index tape merge (-f a -f b, SwishNextResult
    /root/reference/src/search.c:1098-1186): the same query runs on
    both half-indexes with PER-INDEX statistics (each half's own
    df/N/avgdl, exactly as the reference ranks before merging) and the
    streams merge by sort key. All matches returned (no top-k cut), so
    the gate is a pure value compare of per-half BM25."""
    from ..index.builder import IndexHandle
    from ..query.executor import SparkQueryEngine
    from ..query.multi import search_multi

    from functools import reduce

    from pyspark.sql import functions as F

    dirs = _halves_for(spark, sf_dir)
    key = ("half_handles", os.path.abspath(sf_dir))
    if key not in _CACHE:
        _CACHE[key] = [IndexHandle(spark, d) for d in dirs]
    engines = [SparkQueryEngine(spark, h) for h in _CACHE[key]]
    rows = search_multi(engines, q, k=1 << 20)
    # url mapping is a docs-table JOIN (hits are merge-bounded and
    # broadcast), never a full-docs collect to the driver
    hits = spark.createDataFrame(
        [(i, int(d), round(float(s), 4)) for i, d, s in rows],
        "engine_idx int, doc_id long, score double")
    docs = reduce(lambda a, b: a.unionByName(b), (
        eng.handle.docs().select(
            F.lit(i).cast("int").alias("engine_idx"), "doc_id",
            F.col("url").cast("long").alias("url_id"))
        for i, eng in enumerate(engines)))
    return (docs.join(F.broadcast(hits), ["engine_idx", "doc_id"])
            .select("engine_idx", F.col("url_id").alias("doc_id"),
                    "score")
            .orderBy("doc_id"))


# round 4 (late): user document properties (PropertyNames family —
# typed docs-table columns captured from meta tags, parse_conffile.c
# PropertyNames*/PropertyNameAlias, value pipeline docprop.c).


def _prop_index_for(spark, sf_dir):
    """Small index (doc_id < 2000) whose HTML wrapper derives three
    user properties deterministically from the documents table:
    ``cat`` (string) = lang||'-'||source, ``nchars`` (numeric) =
    n_chars, ``stamp`` (date epoch) = 1000000000 + doc_id — so the
    DuckDB oracle can re-derive every stored value relationally."""
    from pyspark.sql import functions as F

    from ..index.builder import IndexConfig, IndexHandle, build_index
    from ..textproc.docprops import PropSpec

    key = ("props", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 2000))
    html = F.concat(
        F.lit('<html><head><meta name="cat" content="'),
        F.col("lang"), F.lit("-"), F.col("source"),
        F.lit('"><meta name="nchars" content="'), F.col("n_chars"),
        F.lit('"><meta name="stamp" content="'),
        (F.lit(1000000000) + F.col("doc_id")).cast("string"),
        F.lit('"></head><body>'), F.col("text"),
        F.lit("</body></html>"))
    pages = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"), F.col("lang"))
    out = tempfile.mkdtemp(prefix="swish_entry_props_")
    cfg = IndexConfig(
        n_buckets=8, stopwords=(),
        properties=(PropSpec("cat").to_tuple(),
                    PropSpec("nchars", kind="int").to_tuple(),
                    PropSpec("stamp", kind="date").to_tuple()))
    build_index(spark, pages, out, cfg, n_shards=1)
    handle = IndexHandle(spark, out)
    _CACHE[key] = handle
    return handle


def engine_user_props(spark, sf_dir, lo=200, hi=400):
    """User-property storage + -L range semantics: docs passing BOTH a
    numeric range (nchars between lo..hi — parquet min/max prunable
    typed column) and a case-folded string range (cat between 'a'..'m'
    — META_IGNORE_CASE strncasecmp, docprop.c:1168-1177), returning
    the stored typed values for a full value-hash compare."""
    from pyspark.sql import functions as F

    from ..query.proplimit import limits_cond

    handle = _prop_index_for(spark, sf_dir)
    docs = handle.docs()
    cond = limits_cond({"prop_nchars": (lo, hi),
                        "prop_cat": ("a", "m")}, handle.cfg)
    return (docs.filter(cond)
            .select(F.col("url").cast("long").alias("doc_id"),
                    "prop_cat", "prop_nchars", "prop_stamp")
            .orderBy("doc_id"))


def engine_prop_sort_user(spark, sf_dir, q="hash", k=25):
    """-s on a user STRING property with IgnoreCase semantics (default
    PropertyNames flag): ranked matches ordered by ASCII-case-folded
    cat, doc_id tiebreak — binary-pinned fold (apple < Mango < ZEBRA).
    Returns (doc_id, cat) pairs for a value compare."""
    from pyspark.sql import functions as F

    from ..query.executor import SparkQueryEngine
    from ..query.output import ranked_results

    handle = _prop_index_for(spark, sf_dir)
    eng = SparkQueryEngine(spark, handle)
    rows = ranked_results(eng, q, k=k, props=["url", "cat"],
                          sort=[("cat", "asc")])
    data = [(int(r["url"]), r["cat"]) for r in rows]
    return spark.createDataFrame(
        data or [(None, None)], "doc_id long, cat string") \
        .where("doc_id is not null")
