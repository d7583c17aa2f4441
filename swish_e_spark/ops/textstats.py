"""Text-analysis operators for training-data pipelines: language-ID
(stopword-overlap heuristic), quality scoring, token counting, document
fingerprinting. All SQL-expressible so the DuckDB oracle verifies them
exactly; all computed with built-in functions (JVM-side, no Python)."""

from __future__ import annotations

from .corpus import documents, tokens

LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
}

STOPSET = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "on")


def langid_heuristic(spark, sf_dir):
    """Predicted language = argmax over marker-token hits (n-gram/
    stopword heuristic; deterministic tiebreak lang asc)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tk = tokens(spark, sf_dir)
    scores = None
    for lang, markers in LANG_MARKERS.items():
        s = (tk.filter(F.col("t").isin(list(markers)))
             .groupBy("doc_id").agg(F.count("*").alias("hits"))
             .withColumn("cand", F.lit(lang)))
        scores = s if scores is None else scores.unionByName(s)
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand"))
    best = (scores.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("cand").alias("pred_lang"), "hits"))
    # docs with zero marker hits: pred 'und'
    docs = documents(spark, sf_dir).select("doc_id")
    return (docs.join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("pred_lang", F.lit("und"))
                    .alias("pred_lang"),
                    F.coalesce("hits", F.lit(0)).alias("hits"))
            .orderBy("doc_id"))


def quality_score(spark, sf_dir):
    """Per-doc quality features: token count, type-token ratio, stopword
    ratio, mean token length, composite score (rounded)."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    feats = (tk.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
        F.sum(F.when(F.col("t").isin(list(STOPSET)), 1).otherwise(0))
        .alias("n_stop"),
        F.sum(F.length("t")).alias("chars")))
    return (feats.select(
        "doc_id", "n_tokens",
        F.round(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 4)
        .alias("stop_ratio"),
        F.round(F.col("chars") / F.col("n_tokens"), 4)
        .alias("mean_tok_len"))
        .orderBy("doc_id"))


def token_count(spark, sf_dir):
    """Whitespace vs word-regex token counts per doc (BPE-ish regex
    proxy) + char count."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                         lambda x: x != ""))
    rx = F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                         lambda x: x != ""))
    return (docs.select("doc_id", ws.cast("long").alias("n_ws_tokens"),
                        rx.cast("long").alias("n_re_tokens"),
                        F.length("text").cast("long")
                        .alias("n_chars_exact"))
            .orderBy("doc_id"))


def fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (rolling-hash stand-in; stable across engines)."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return (docs.select("doc_id", F.md5(norm).alias("fp"))
            .orderBy("doc_id"))


def docstats(spark, sf_dir):
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir).groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 F.sum("n_chars").alias("total_chars"))
            .orderBy("lang"))
