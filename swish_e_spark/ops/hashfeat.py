"""Model-free document feature vectors: hashing-trick TF-IDF
embeddings (Weinberger et al., "Feature Hashing for Large Scale
Multitask Learning", ICML 2009) and cosine search over them — the
no-model path to the same dedup/ANN/similarity stack the embeddings
table feeds, generated from text alone.

Every token maps to one of DIM buckets by the md5-low-64 hash family
(``dedup._md5_lower64`` == DuckDB ``md5_number_lower``; DIM is a power
of two so signed-vs-unsigned modulo agree), weights are
tf * smoothed-idf, and vectors are L2-normalized. Output is long-form
(doc_id, bucket, w) — nonzero buckets only — which is also the layout
a 10^12-doc pipeline stores (sparse rows, not dense arrays).

Scale shape:
- hashed_tfidf: one (doc_id, t) pre-agg (map-side combine), one
  vocab-sized df aggregation off the SAME frame, a broadcast-scale
  join for idf, then groupBy(doc_id, bucket); the L2 norm is a window
  over doc_id (co-partitioned with the preceding groupBy — no extra
  exchange).
- tfidf_cosine_topk: the query doc's <= DIM (bucket, w) rows join the
  corpus ON BUCKET — candidate work is corpus rows sharing a bucket
  with the query, never an all-pairs product; with normalized vectors
  the grouped dot product IS the cosine.
"""

from __future__ import annotations

from .corpus import documents, tokens

DIM = 64          # power of two: signed pmod == unsigned % (mod 2^k)


def hashed_tfidf(spark, sf_dir, dim: int = DIM):
    """(doc_id, bucket, w): L2-normalized hashed TF-IDF vectors in
    long form, w rounded to 4 dp for display (the norm and the cosine
    search use the raw weights — see _normed)."""
    from pyspark.sql import functions as F

    return (_normed(spark, sf_dir, dim)
            .select("doc_id", "bucket",
                    F.round("nw", 4).alias("w"))
            .orderBy("doc_id", "bucket"))


def _normed(spark, sf_dir, dim):
    """(doc_id, bucket, nw) with RAW normalized weights (no display
    rounding) — shared by the cosine search so engine and oracle rank
    on identical values."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .dedup import _md5_lower64

    # ONE persisted (doc_id, t) pre-agg feeds both the df aggregation
    # and the weighting join — without it each side re-runs the full
    # corpus scan + combine; with it the join probe reads the cache.
    # The df table itself is vocabulary-sized, so it broadcasts and
    # the tf stream never shuffles on the token key.
    tf = (tokens(spark, sf_dir).groupBy("doc_id", "t")
          .agg(F.count("*").alias("tf")).persist())
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    nd = documents(spark, sf_dir).count()
    idf = F.log((F.lit(float(nd)) + 1.0)
                / (F.col("df") + 1.0)) + 1.0
    b = (tf.join(F.broadcast(df), "t")
         .withColumn("bucket", F.pmod(_md5_lower64(F.col("t")),
                                      F.lit(dim)).cast("int"))
         .groupBy("doc_id", "bucket")
         .agg(F.sum(F.col("tf") * idf).alias("raw")))
    w = Window.partitionBy("doc_id")
    norm = F.sqrt(F.sum(F.col("raw") * F.col("raw")).over(w))
    return b.select("doc_id", "bucket",
                    (F.col("raw") / norm).alias("nw"))


def tfidf_cosine_topk(spark, sf_dir, query_doc_id: int = 0,
                      k: int = 10, dim: int = DIM):
    """(doc_id, cos): top-k documents by hashed-TF-IDF cosine to the
    query doc — text-only similarity search (no embedding model). The
    join keys on bucket, so work is bucket-sharing rows only."""
    from pyspark.sql import functions as F

    v = _normed(spark, sf_dir, dim)
    q = (v.filter(F.col("doc_id") == query_doc_id)
         .select(F.col("bucket").alias("qb"),
                 F.col("nw").alias("qw")))
    return (v.filter(F.col("doc_id") != query_doc_id)
            .join(F.broadcast(q), F.col("bucket") == F.col("qb"))
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.col("nw") * F.col("qw")), 4)
                 .alias("cos"))
            .orderBy(F.desc("cos"), F.asc("doc_id")).limit(k))


# ---------------------------------------------------------------- SQL

_TFIDF_CTES = """
toks as (
  select doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) as t
  from documents),
tf as (select doc_id, t, count(*) as tf from toks where t <> ''
       group by doc_id, t),
dfx as (select t, count(*) as df from tf group by t),
nd as (select count(*) as n from documents),
b as (select doc_id,
             cast(md5_number_lower(t) % {dim} as int) as bucket,
             sum(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)) as raw
      from tf join dfx using (t) cross join nd
      group by doc_id, cast(md5_number_lower(t) % {dim} as int)),
nv as (select doc_id, bucket,
              raw / sqrt(sum(raw * raw) over (partition by doc_id))
                as nw
       from b)"""


def hashed_tfidf_sql(dim: int = DIM) -> str:
    return f"""
with {_TFIDF_CTES.format(dim=dim)}
select doc_id, bucket, cast(round(nw, 4) as double) as w
from nv order by doc_id, bucket"""


def tfidf_cosine_topk_sql(query_doc_id: int = 0, k: int = 10,
                          dim: int = DIM) -> str:
    return f"""
with {_TFIDF_CTES.format(dim=dim)}
select v.doc_id,
       cast(round(sum(v.nw * q.nw), 4) as double) as cos
from nv v join nv q on q.doc_id = {query_doc_id}
                   and v.bucket = q.bucket
where v.doc_id <> {query_doc_id}
group by v.doc_id
order by cos desc, v.doc_id asc limit {k}"""
