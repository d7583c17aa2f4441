"""Driver-facing fulltext operators over the `documents` table —
each function is a `queries()` entry (spark, sf_dir) -> DataFrame with a
matching DuckDB oracle in __spark_entry__.py.

These re-express SURVEY.md §2.6's query operators as on-the-fly
DataFrame plans over the raw corpus (index-free form used for the
DuckDB-checkable gate; the segment-backed engine is query/executor.py).
"""

from __future__ import annotations

from .corpus import documents, events, tokens

K1 = 1.2
B = 0.75


def term_stats(spark, sf_dir):
    """df/cf per term, top-100 by cf (word dump analogue,
    /root/reference/src/keychar_out.c:63)."""
    from pyspark.sql import functions as F

    return (tokens(spark, sf_dir).groupBy("t")
            .agg(F.countDistinct("doc_id").alias("df"),
                 F.count("*").alias("cf"))
            .orderBy(F.desc("cf"), F.asc("t")).limit(100)
            .select(F.col("t").alias("term"), "df", "cf"))


def postings_tf(spark, sf_dir, term="join"):
    from pyspark.sql import functions as F

    return (tokens(spark, sf_dir).filter(F.col("t") == term)
            .groupBy("doc_id").agg(F.count("*").alias("tf"))
            .orderBy("doc_id"))


def bool_and(spark, sf_dir, t1="hash", t2="join"):
    """AND = sorted merge intersection (andresultlists,
    /root/reference/src/search.c:2249-2321) → inner join on doc_id."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    a = tk.filter(F.col("t") == t1).select("doc_id").distinct()
    b = tk.filter(F.col("t") == t2).select("doc_id").distinct()
    return a.join(b, "doc_id").orderBy("doc_id")


def bool_or(spark, sf_dir, t1="vector", t2="stream"):
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    return (tk.filter(F.col("t").isin([t1, t2]))
            .select("doc_id").distinct().orderBy("doc_id"))


def bool_andnot(spark, sf_dir, t1="hash", t2="join"):
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    a = tk.filter(F.col("t") == t1).select("doc_id").distinct()
    b = tk.filter(F.col("t") == t2).select("doc_id").distinct()
    return a.join(b, "doc_id", "left_anti").orderBy("doc_id")


def phrase_adjacent(spark, sf_dir, t1="hash", t2="join"):
    """PHRASE: pos+1 adjacency (phraseresultlists,
    /root/reference/src/search.c:2561-2637)."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    a = tk.filter(F.col("t") == t1).alias("a")
    b = tk.filter(F.col("t") == t2).alias("b")
    return (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.p") == F.col("a.p") + 1))
            .select(F.col("a.doc_id").alias("doc_id")).distinct()
            .orderBy("doc_id"))


def near_window(spark, sf_dir, t1="merge", t2="batch", d=4):
    """NEAR<d> proximity (nearresultlists,
    /root/reference/src/search.c:1979-2240)."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    a = tk.filter(F.col("t") == t1).alias("a")
    b = tk.filter(F.col("t") == t2).alias("b")
    return (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.abs(F.col("a.p") - F.col("b.p")) <= d))
            .select(F.col("a.doc_id").alias("doc_id")).distinct()
            .orderBy("doc_id"))


def prefix_tf(spark, sf_dir, prefix="sc"):
    """Trailing-wildcard prefix scan, OR-merged tf per doc
    (/root/reference/src/search.c:1631-1843)."""
    from pyspark.sql import functions as F

    return (tokens(spark, sf_dir)
            .filter(F.col("t").startswith(prefix))
            .groupBy("doc_id").agg(F.count("*").alias("tf_sum"))
            .orderBy("doc_id"))


def bm25_topk(spark, sf_dir, t1="hash", t2="join", k=10):
    """BM25 top-k for a two-term OR (the north-rule scorer; commutative
    two-term sum keeps float results engine-independent)."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir)
    tk = tokens(spark, sf_dir)
    n_docs = docs.count()
    dl = tk.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    tf = (tk.filter(F.col("t").isin([t1, t2]))
          .groupBy("doc_id", "t").agg(F.count("*").alias("tf")))
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    scored = (tf.join(df, "t").join(dl, "doc_id")
              .withColumn("idf", F.log(
                  (F.lit(float(n_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0))
              .withColumn("contrib",
                          F.col("idf") * F.col("tf") * (K1 + 1.0)
                          / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl")
                                                 / float(avgdl)))))
    return (scored.groupBy("doc_id")
            .agg(F.sum("contrib").alias("s"))
            .orderBy(F.desc("s"), F.asc("doc_id")).limit(k)
            .select("doc_id", F.round("s", 4).alias("score")))


def limit_by_property(spark, sf_dir, term="join"):
    """-L prop low high range limit (LimitByProperty,
    /root/reference/src/proplimit.c:881) + metaname-style lang filter."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir)
    hits = (tokens(spark, sf_dir).filter(F.col("t") == term)
            .select("doc_id").distinct())
    return (docs.join(hits, "doc_id")
            .filter((F.col("lang") == "en")
                    & F.col("n_chars").between(200, 400))
            .select("doc_id", "lang", "n_chars").orderBy("doc_id"))


def property_sort_rank(spark, sf_dir):
    """Presorted-property table analogue: dense_rank over n_chars
    (sortFileProperties, /root/reference/src/pre_sort.c:415).

    dense_rank over a single global window would funnel the whole docs
    table through ONE partition — the classic 100 TB scale-killer.
    Instead the rank is a pure function of the DISTINCT value set,
    which is bounded by the value domain (doc sizes), not the row
    count: distinct the values (a normal shuffle), rank them on the
    driver, broadcast-join the (value, rank) map back. No global
    Exchange(singlePartition) anywhere in the plan."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir)
    vals = sorted(r[0] for r in
                  docs.select("n_chars").distinct().collect())
    rank_map = spark.createDataFrame(
        [(v, len(vals) - i) for i, v in enumerate(vals)],
        "n_chars long, size_rank long")
    return (docs.select("doc_id", "n_chars")
            .join(F.broadcast(rank_map), "n_chars")
            .select("doc_id", "n_chars", "size_rank")
            .orderBy("doc_id"))


def prop_limit_date(spark, sf_dir):
    """Date-property range limit over the events table (PROP_DATE,
    /root/reference/src/docprop.c:739-853)."""
    from pyspark.sql import functions as F

    ev = events(spark, sf_dir)
    return (ev.filter((F.col("event_type") == "click")
                      & (F.col("ts") >= "2024-01-10")
                      & (F.col("ts") < "2024-01-20"))
            .groupBy("user_id").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("user_id")).limit(20))
