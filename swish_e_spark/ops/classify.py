"""Weak-supervision quality classification and leakage-safe split
assignment — the two curation steps between "signals computed" and
"training shards written" in a pretraining data pipeline.

``quality_nb_*`` is the SQL-expressible analogue of the fastText/
logistic quality classifiers used by CCNet/DCLM-style pipelines
(Wenzek et al. 1911.00359 bootstrap a classifier from a trusted
reference corpus vs. raw crawl): seed bands of the corpus provide weak
labels, a multinomial Naive Bayes model is trained as pure token-count
aggregation, and every document is scored by its mean per-token
log-likelihood ratio. Everything is groupBy/join/ln arithmetic —
JVM-side, exactly reproducible in DuckDB, so the driver gate verifies
the trained model and the scores value-for-value (the production
upgrade to hashed-ngram logistic regression changes the weight
estimator, not this data flow).

``leakage_safe_splits`` assigns train/val/test such that every member
of a duplicate cluster lands in the SAME split — the standard guard
against eval leakage through near-duplicates (Lee et al. 2107.06499
§5 report inflated eval scores when dups straddle splits). Cluster
identity here is the exact-content catalog (same planted-boilerplate
corpus as ops/pipeline.incremental_dedup, so clusters provably exist
at gate scale); swapping in lsh_dedup_clusters' canonical_id gives the
near-dup variant with the identical join shape. The split decision
hashes the cluster CANONICAL id (never the member id), so the split is
stable under re-crawls that add members to a cluster.

Scale notes (100 TB):
- NB training: two groupBys over the seed bands only (a few % of the
  corpus); the model is a ~vocabulary-sized table, broadcast for
  scoring. Scoring is one scan + one broadcast join + one groupBy
  (doc_id) — no full-corpus shuffle on a token key.
- splits: one groupBy on the 32-hex content key + one window min —
  both high-cardinality, skew-free; the hex-prefix band compare is a
  scan-side projection.
"""

from __future__ import annotations

from .corpus import TOKEN_SPLIT, documents
from .pipeline import DUP_PLANT_K, DUP_PLANT_MOD

CLS_MOD = 13                 # seed-band modulus
POS_RES = (0, 1, 2, 3)       # doc_id % CLS_MOD in -> "clean" seed band
NEG_RES = (7, 8)             # doc_id % CLS_MOD in -> spam-planted band
SPAM_TEXT = ("click here to buy now free offer win a prize claim "
             "your bonus now limited deal")
# md5-hex-prefix split bands: 256 buckets; < 'e6' = 230/256 ~ 89.8%
# train, < 'f3' = 243/256 ~ 94.9% cumulative -> val, rest test
SPLIT_TRAIN_HI = "e6"
SPLIT_VAL_HI = "f3"


def _spam_planted_text(F):
    """pyspark Column: the corpus text with the deterministic spam
    suffix appended to NEG_RES-band docs (the planted low-quality
    class; the DuckDB oracle synthesizes the identical corpus)."""
    neg = F.col("doc_id") % CLS_MOD
    return F.when(neg.isin(*NEG_RES),
                  F.concat(F.col("text"), F.lit(" " + SPAM_TEXT))
                  ).otherwise(F.col("text"))


def _planted_tokens(spark, sf_dir):
    """(doc_id, t) occurrences over the spam-planted corpus."""
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir)
            .select("doc_id",
                    F.explode(F.split(F.lower(_spam_planted_text(F)),
                                      TOKEN_SPLIT)).alias("t"))
            .filter(F.col("t") != ""))


def _nb_tf(spark, sf_dir):
    """(doc_id, t, tf) pre-agg over the planted corpus — ONE corpus
    explode feeds both model training and scoring (the training
    counts are sums of tf over the seed bands, identical integers to
    counting raw occurrences)."""
    from pyspark.sql import functions as F

    return (_planted_tokens(spark, sf_dir)
            .groupBy("doc_id", "t").agg(F.count("*").alias("tf")))


def _nb_model_from_tf(tf):
    """(t, c_pos, c_neg) token counts over the two seed bands, plus the
    scalar (n_pos, n_neg, vocab) row. Laplace-smoothed multinomial NB:
    llr(t) = ln((c_pos+1)/(n_pos+V)) - ln((c_neg+1)/(n_neg+V))."""
    from pyspark.sql import functions as F

    band = F.col("doc_id") % CLS_MOD
    seed = tf.filter(band.isin(*(POS_RES + NEG_RES)))
    counts = (seed.groupBy("t").agg(
        F.sum(F.when(band.isin(*POS_RES), F.col("tf")).otherwise(0))
        .alias("c_pos"),
        F.sum(F.when(band.isin(*NEG_RES), F.col("tf")).otherwise(0))
        .alias("c_neg")))
    tot = counts.agg(F.sum("c_pos").alias("n_pos"),
                     F.sum("c_neg").alias("n_neg"),
                     F.count("*").alias("vocab"))
    return counts, tot


def _nb_model(spark, sf_dir):
    return _nb_model_from_tf(_nb_tf(spark, sf_dir))


def quality_nb_model(spark, sf_dir, top: int = 30):
    """The trained model's most spam-indicative tokens: (term, c_pos,
    c_neg, llr), llr ascending (most negative = spammiest). What you
    inspect before trusting a weakly-supervised quality filter."""
    from pyspark.sql import functions as F

    counts, tot = _nb_model(spark, sf_dir)
    llr = (F.log((F.col("c_pos") + 1)
                 / (F.col("n_pos") + F.col("vocab")))
           - F.log((F.col("c_neg") + 1)
                   / (F.col("n_neg") + F.col("vocab"))))
    return (counts.crossJoin(F.broadcast(tot))
            .select(F.col("t").alias("term"),
                    F.col("c_pos").cast("long").alias("c_pos"),
                    F.col("c_neg").cast("long").alias("c_neg"),
                    F.round(llr, 4).alias("llr"))
            .orderBy(F.asc("llr"), F.asc("term")).limit(top))


def quality_nb_scores(spark, sf_dir):
    """Per-doc NB quality score over the WHOLE corpus: mean per-token
    llr (positive = resembles the clean band, negative = resembles the
    planted spam band) and the hard prediction. Tokens outside the
    training vocabulary contribute the smoothed zero-count llr via the
    left-join coalesce."""
    from pyspark.sql import functions as F

    tf = _nb_tf(spark, sf_dir).persist()
    counts, tot = _nb_model_from_tf(tf)
    j = (tf.join(F.broadcast(counts), "t", "left")
         .crossJoin(F.broadcast(tot))
         .withColumn("cp", F.coalesce("c_pos", F.lit(0)))
         .withColumn("cn", F.coalesce("c_neg", F.lit(0))))
    llr = (F.log((F.col("cp") + 1)
                 / (F.col("n_pos") + F.col("vocab")))
           - F.log((F.col("cn") + 1)
                   / (F.col("n_neg") + F.col("vocab"))))
    per = (j.groupBy("doc_id")
           .agg(F.sum("tf").alias("n_tokens"),
                F.sum(F.col("tf") * llr).alias("s_llr")))
    score = F.col("s_llr") / F.col("n_tokens")
    return (per.select("doc_id",
                       F.col("n_tokens").cast("long").alias("n_tokens"),
                       F.round(score, 4).alias("nb_score"),
                       F.when(score < 0, 1).otherwise(0)
                       .cast("int").alias("pred_spam"))
            .orderBy("doc_id"))


def leakage_safe_splits(spark, sf_dir):
    """(doc_id, canonical_id, split): train/val/test assignment where
    the hash is taken over the duplicate-cluster canonical id, so all
    copies of the same content share a split (exact-dup clusters from
    the planted-boilerplate content catalog; the near-dup variant
    substitutes lsh_dedup_clusters' canonical_id — same shape)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    body = F.when(
        F.col("doc_id") % DUP_PLANT_MOD == 0,
        F.concat(F.lit("boilerplate page "),
                 (F.col("doc_id") % DUP_PLANT_K).cast("string"))
    ).otherwise(F.col("text"))
    d = (documents(spark, sf_dir)
         .select("doc_id", F.md5(body).alias("content_md5")))
    w = Window.partitionBy("content_md5")
    canon = d.withColumn("canonical_id", F.min("doc_id").over(w))
    hx = F.substring(F.md5(F.col("canonical_id").cast("string")), 1, 2)
    split = (F.when(hx < SPLIT_TRAIN_HI, "train")
             .when(hx < SPLIT_VAL_HI, "val")
             .otherwise("test"))
    return (canon.select("doc_id",
                         F.col("canonical_id").cast("long")
                         .alias("canonical_id"),
                         split.alias("split"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------- SQL

def _duck_planted_toks() -> str:
    """DuckDB CTE (doc_id, t) over the spam-planted corpus — mirrors
    _planted_tokens exactly."""
    neg = " or ".join(f"doc_id % {CLS_MOD} = {r}" for r in NEG_RES)
    return f"""
pt as (select doc_id,
              case when {neg} then text || ' {SPAM_TEXT}'
                   else text end as text
       from documents),
toks as (select doc_id,
                unnest(regexp_split_to_array(lower(text),
                       '[^a-z0-9]+')) as t
         from pt),
tk as (select doc_id, t from toks where t <> '')"""


def _duck_model() -> str:
    pos = ", ".join(str(r) for r in POS_RES)
    both = ", ".join(str(r) for r in POS_RES + NEG_RES)
    return f"""
counts as (select t,
        sum(case when doc_id % {CLS_MOD} in ({pos}) then 1 else 0 end)
          as c_pos,
        sum(case when doc_id % {CLS_MOD} in ({pos}) then 0 else 1 end)
          as c_neg
       from tk where doc_id % {CLS_MOD} in ({both})
       group by t),
tot as (select sum(c_pos) as n_pos, sum(c_neg) as n_neg,
               count(*) as vocab from counts)"""


def quality_nb_model_sql(top: int = 30) -> str:
    return f"""
with {_duck_planted_toks()},
{_duck_model()}
select t as term, cast(c_pos as bigint) as c_pos,
       cast(c_neg as bigint) as c_neg,
       cast(round(ln((c_pos + 1) * 1.0 / (n_pos + vocab))
                  - ln((c_neg + 1) * 1.0 / (n_neg + vocab)), 4)
            as double) as llr
from counts cross join tot
order by round(ln((c_pos + 1) * 1.0 / (n_pos + vocab))
               - ln((c_neg + 1) * 1.0 / (n_neg + vocab)), 4) asc,
         term asc
limit {top}"""


def quality_nb_scores_sql() -> str:
    return f"""
with {_duck_planted_toks()},
{_duck_model()},
tf as (select doc_id, t, count(*) as tf from tk group by 1, 2),
sc as (select doc_id, tf,
              ln((coalesce(c_pos, 0) + 1) * 1.0 / (n_pos + vocab))
              - ln((coalesce(c_neg, 0) + 1) * 1.0 / (n_neg + vocab))
                as llr
       from tf left join counts using (t) cross join tot),
per as (select doc_id, sum(tf) as n_tokens, sum(tf * llr) as s_llr
        from sc group by doc_id)
select doc_id, cast(n_tokens as bigint) as n_tokens,
       cast(round(s_llr / n_tokens, 4) as double) as nb_score,
       cast(case when s_llr / n_tokens < 0 then 1 else 0 end as int)
         as pred_spam
from per order by doc_id"""


def leakage_safe_splits_sql() -> str:
    return f"""
with d as (select doc_id,
             md5(case when doc_id % {DUP_PLANT_MOD} = 0
                   then 'boilerplate page ' ||
                        cast(doc_id % {DUP_PLANT_K} as varchar)
                   else text end) as content_md5
           from documents),
canon as (select doc_id, min(doc_id) over (partition by content_md5)
                   as canonical_id
          from d)
select doc_id, cast(canonical_id as bigint) as canonical_id,
       case when substr(md5(cast(canonical_id as varchar)), 1, 2)
              < '{SPLIT_TRAIN_HI}' then 'train'
            when substr(md5(cast(canonical_id as varchar)), 1, 2)
              < '{SPLIT_VAL_HI}' then 'val'
            else 'test' end as split
from canon order by doc_id"""
