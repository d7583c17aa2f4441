#!/usr/bin/env python
"""Production corpus-curation job: the training-data ops composed into
one spark-submit pipeline over a documents table.

Usage:
    python -m swish_e_spark.shipping  # writes swish_e_spark.zip
    spark-submit --py-files swish_e_spark.zip scripts/curation_job.py \
        --input /root/testdata/sf0.1 --output /tmp/curated \
        [--nb-min -0.5] [--shard-budget 4096]

Steps (each individually value-gated against DuckDB by the driver
contract; this job is the composition a real pipeline runs):
  1. curation_decisions  — exact-dup / eval-split / too-short /
     repetitive / contaminated keep-drop with fixed reason priority
  2. quality_nb_scores   — weak-supervision NB quality score; docs
     below --nb-min are dropped as 'low_quality'
  3. pii_scrub           — the same regex redaction the gated op pins
     by md5, applied here to produce the output text
  4. leakage_safe_splits — train/val/test keyed on the dup-cluster
     canonical id
  5. pack_shards-style budget assignment over the kept docs
Writes: <output>/docs (parquet, partitioned by split) and
<output>/stats.json (per-reason and per-split counts).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="dir containing documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--nb-min", type=float, default=-0.5,
                   help="drop docs with nb_score below this")
    p.add_argument("--shard-budget", type=int, default=None,
                   help="chars per output shard "
                        "(default: weburl.SHARD_BUDGET)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("swish-e-spark-curation")
               .config("spark.sql.adaptive.enabled", "true"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from swish_e_spark.ops import classify, weburl
    from swish_e_spark.ops.corpus import documents

    sf_dir = args.input
    budget = args.shard_budget or weburl.SHARD_BUDGET

    # 1-2: keep/drop reasons + NB quality; 4: leakage-safe splits —
    # all joins keyed on doc_id (one co-partitioned exchange chain)
    dec = weburl.curation_decisions(spark, sf_dir)
    nb = classify.quality_nb_scores(spark, sf_dir) \
        .select("doc_id", "nb_score")
    spl = classify.leakage_safe_splits(spark, sf_dir) \
        .select("doc_id", "split")
    reason = (F.when(F.col("reason") != "keep", F.col("reason"))
              .when(F.col("nb_score") < args.nb_min,
                    F.lit("low_quality"))
              .otherwise(F.lit("keep")))
    merged = (dec.join(nb, "doc_id").join(spl, "doc_id")
              .select("doc_id", "nb_score", "split",
                      reason.alias("reason"))
              .withColumn("keep", F.col("reason") == "keep"))

    # 3: PII redaction of the output text (the gated op pins these
    # exact bytes by md5; here they become the curated corpus)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), weburl.EMAIL_RE,
                             "<EMAIL>"),
            weburl.IPV4_RE, "<IP>"),
        weburl.PHONE_RE, "<PHONE>")
    docs = documents(spark, sf_dir).select(
        "doc_id", "lang", "source", scrubbed.alias("text"))

    kept = (docs.join(merged.filter("keep"), "doc_id")
            .withColumn("n_chars", F.length("text")))
    # 5: budgeted shard assignment (normative window form; the
    # two-phase range-partitioned prefix sum reproduces it at scale)
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    kept = kept.withColumn("shard_id",
                           F.floor(start / budget).cast("long"))

    out_docs = os.path.join(args.output, "docs")
    (kept.select("doc_id", "lang", "source", "split", "shard_id",
                 "nb_score", "text")
     .write.mode("overwrite").partitionBy("split").parquet(out_docs))

    by_reason = {r["reason"]: r["n"] for r in
                 merged.groupBy("reason")
                 .agg(F.count("*").alias("n")).collect()}
    by_split = {r["split"]: r["n"] for r in
                kept.groupBy("split")
                .agg(F.count("*").alias("n")).collect()}
    stats = {
        "input_docs": docs.count(),
        "kept_docs": sum(by_split.values()),
        "by_reason": by_reason,
        "by_split": by_split,
        "n_shards": kept.agg(
            F.countDistinct("shard_id")).collect()[0][0],
        "shard_budget": budget,
        "nb_min": args.nb_min,
    }
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    print(json.dumps(stats, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
