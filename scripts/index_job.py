#!/usr/bin/env python
"""Production index-build job (north rule: spark-submit --py-files).

Usage:
    python -m swish_e_spark.shipping  # writes swish_e_spark.zip
    spark-submit --py-files swish_e_spark.zip scripts/index_job.py \
        --input /path/to/pages_parquet --output /path/to/index \
        [--shards 8] [--buckets 64] [--stem] [--resume]

The input is a parquet (or any Spark-readable) pages table with columns
(url string, warc_ts timestamp, html binary, text string, lang string).
Each shard commits atomically with lineage counters; --resume skips
shards already committed (kill-safe).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--shards", type=int, default=1)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--stem", action="store_true")
    p.add_argument("--fuzzy", default="",
                   help="FuzzyIndexingMode: none/porter/soundex/"
                        "metaphone/doublemetaphone/snowball_XX "
                        "(validated by TokenizerConfig.fuzzy_fn)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--translate-from", default="",
                   help="TranslateCharacters source chars")
    p.add_argument("--translate-to", default="",
                   help="TranslateCharacters target chars (parallel)")
    p.add_argument("--min-word-len", type=int, default=None)
    p.add_argument("--max-word-len", type=int, default=None)
    p.add_argument("--rank-bias", action="append", default=[],
                   metavar="META=BIAS",
                   help="MetaNamesRank bias in [-10,10], repeatable")
    args = p.parse_args(argv)
    rank_biases = []
    for rb in args.rank_bias:
        meta_name, _, bias = rb.partition("=")
        rank_biases.append((meta_name, int(bias)))

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("swish-e-spark-index")
               .config("spark.sql.adaptive.enabled", "true"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    from swish_e_spark.index.builder import IndexConfig, build_index

    pages = spark.read.parquet(args.input)
    meta = build_index(
        spark, pages, args.output,
        IndexConfig(n_buckets=args.buckets, stem=args.stem,
                    fuzzy=args.fuzzy,
                    translate_from=args.translate_from,
                    translate_to=args.translate_to,
                    min_word_len=args.min_word_len,
                    max_word_len=args.max_word_len,
                    rank_biases=tuple(rank_biases)),
        n_shards=args.shards, resume=args.resume)
    print(json.dumps({k: meta[k] for k in
                      ("complete", "doc_count", "token_count",
                       "posting_count", "n_shards")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
