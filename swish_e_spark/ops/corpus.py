"""Shared helpers for the driver-facing query battery over the
/root/testdata tables (documents, embeddings, events).

The tokenizer here is deliberately the *SQL-expressible* one —
``lower`` + split on ``[^a-z0-9]+`` — so every Spark query has an
exactly equivalent DuckDB oracle (the driver's correctness gate).
The engine's full tokenizer (buzzwords/stopwords/stemming, SURVEY.md
§2.3) is exercised against the pure-Python oracle in pytest instead.
"""

from __future__ import annotations

TOKEN_SPLIT = "[^a-z0-9]+"

# DuckDB CTE fragment producing (doc_id, t, p) — 1-based positions over
# the split array (empties retained in numbering, filtered after), which
# matches Spark's posexplode numbering exactly.
DUCK_TOKS = """
toks as (
  select doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) as t,
         unnest(range(1, len(regexp_split_to_array(lower(text),
                '[^a-z0-9]+')) + 1)) as p
  from documents
)"""


def documents(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def events(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def tokens(spark, sf_dir: str):
    """(doc_id, t, p) token table; p is the 1-based split-array position."""
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir)
            .select("doc_id",
                    F.posexplode(F.split(F.lower("text"), TOKEN_SPLIT))
                    .alias("p0", "t"))
            .withColumn("p", F.col("p0") + 1)
            .drop("p0")
            .filter(F.col("t") != ""))
