"""Work-bound scale evidence for the round-5-continuation op families
at ~1M docs: NB quality scoring, line-hash boilerplate strip,
leakage-safe splits, hashed TF-IDF vector build, and planted-graph
PageRank.

Corpus: the sf0.1 documents table tiled K times with doc_id offsets
(deterministic; text repeats across tiles, which only AMPLIFIES the
work the dedup-flavored ops do — boilerplate df counts and split
cluster sizes grow with K — so the walls are an upper bound, not a
best case). Written once to a local parquet and read back like any
other sf dir, so every op runs through its normal entry path.

Usage: python BENCH/ops_scale.py [tiles] [cpus]
Writes one JSON line; artifact BENCH/OPS_SCALE_r5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/ops_scale_sf"


def main():
    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.read.parquet(f"{SRC}/documents.parquet")
    n_src = src.count()
    tiled = None
    for k in range(tiles):
        t = src.withColumn("doc_id",
                           (F.col("doc_id") + F.lit(k * n_src))
                           .cast("long"))
        tiled = t if tiled is None else tiled.unionAll(t)
    os.makedirs(OUT_DIR, exist_ok=True)
    (tiled.repartition(32)
     .write.mode("overwrite").parquet(f"{OUT_DIR}/documents.parquet"))
    n = spark.read.parquet(f"{OUT_DIR}/documents.parquet").count()

    from swish_e_spark.ops.classify import (
        leakage_safe_splits, quality_nb_scores,
    )
    from swish_e_spark.ops.graph import link_pagerank
    from swish_e_spark.ops.hashfeat import hashed_tfidf
    from swish_e_spark.ops.weburl import boilerplate_strip

    out = {"metric": "ops_scale", "n_docs": n, "tiles": tiles,
           "cpus": cpus}
    for name, fn in [("nb_scores", quality_nb_scores),
                     ("boilerplate_strip", boilerplate_strip),
                     ("splits", leakage_safe_splits),
                     ("hashed_tfidf", hashed_tfidf),
                     ("pagerank8", link_pagerank)]:
        t0 = time.time()
        rows = fn(spark, OUT_DIR).count()
        wall = time.time() - t0
        out[name + "_rows"] = rows
        out[name + "_s"] = round(wall, 2)
        out[name + "_docs_per_s"] = round(n / wall)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
