#!/usr/bin/env python
"""Block-max WAND evidence run: exhaustive vs pruned top-k on the same
index, with pruning counters and a work model, at a chosen parallelism.

Why a separate script from bench.py: on this shared 32-SMT-core box a
single top-k query at local[32] is ~1.2 s of fixed Spark machinery
(job scheduling, mapInPandas worker startup, collect) regardless of
how many postings are decoded, so wall-clock differences between a
pruned and an unpruned plan drown in the floor. At local[4] — the
cluster-faithful regime, where each core is saturated with real work
like a busy executor — decode/eval work dominates the wall and the
pruning shows directly. Both views are reported.

Usage:
    python BENCH/wand_evidence.py [n_docs] [query_cpus] [repeats]

Builds (or reuses) an index over the cached corpus at
.cache/bench_pages_v{CORPUS_VERSION}_{n_docs} under
.cache/wand_idx_v{CORPUS_VERSION}_{n_docs}, then runs each query
exhaustively (wand="off") and pruned (wand="force"), best-of-N each,
in a fresh JVM pinned to query_cpus cores. Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    # rare-but-df>=k term sets θ at the rare-term score level: the
    # class block-max WAND exists for (97% of head blocks prune via
    # exact-doc rare planning)
    "mid": "common0 OR midterm3",
    # df~3 tail: θ falls back to the head term's own 10th-best score,
    # pruning limited to the head term's score spread
    "skew": "common0 OR tailterm3",
    # two head terms: the worst case — bounds near θ everywhere
    "flat": "common0 OR wolf",
}

RUN = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName("wand-evidence")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.driver.memory", "16g")
         .config("spark.driver.extraJavaOptions",
                 f"-XX:ActiveProcessorCount={{cpus}}")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from swish_e_spark.index.builder import IndexHandle
from swish_e_spark.query.executor import SparkQueryEngine
eng = SparkQueryEngine(spark, IndexHandle(spark, {idx!r}))
_ = eng.handle.stats
out = {{}}
for name, q in {queries!r}.items():
    # identical-result check rides along with the timing
    exact = [(r["doc_id"], round(r["score"], 9))
             for r in eng.search_df(q, 10, wand="off").collect()]
    wand = [(r["doc_id"], round(r["score"], 9))
            for r in eng.search_df(q, 10, wand="force").collect()]
    assert wand == exact, f"LOSSY: {{name}}"
    te = tw = None
    for _ in range({repeats}):
        t0 = time.time(); eng.search_df(q, 10, wand="off").collect()
        dt = time.time() - t0; te = dt if te is None or dt < te else te
        t0 = time.time(); eng.search_df(q, 10, wand="force").collect()
        dt = time.time() - t0; tw = dt if tw is None or dt < tw else tw
    st = eng.last_wand_stats
    kept_blocks = st["blocks_total"] - st["blocks_pruned"]
    out[name] = {{
        "query": q, "exhaustive_s": round(te, 3),
        "wand_s": round(tw, 3), "speedup": round(te / tw, 2),
        "chunks_pruned": st["chunks_pruned"],
        "chunks_total": st["chunks_total"],
        "blocks_pruned": st["blocks_pruned"],
        "blocks_total": st["blocks_total"],
        "blocks_pruned_frac": round(
            st["blocks_pruned"] / max(st["blocks_total"], 1), 4),
        # work model: exhaustive scores every posting of every leaf
        # (the reference's behavior, src/search.c:1766-1813); the
        # pruned plan scores at most kept_blocks * 128
        "rows_scored_max_wand": kept_blocks * 128,
        "exact_leaves": st.get("exact_leaves", 0),
    }}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from swish_e_spark.datagen.pages import CORPUS_VERSION

    pages = os.path.join(REPO, ".cache",
                         f"bench_pages_v{CORPUS_VERSION}_{n_docs}")
    idx = os.path.join(REPO, ".cache",
                       f"wand_idx_v{CORPUS_VERSION}_{n_docs}")
    if not os.path.exists(idx):
        code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from swish_e_spark.index.builder import IndexConfig, build_index, generate_pages_df
import os
if os.path.exists({pages!r}):
    pages = spark.read.parquet({pages!r})
else:
    pages = generate_pages_df(spark, {n_docs}, partitions=64)
    pages.write.mode("overwrite").parquet({pages!r})
    pages = spark.read.parquet({pages!r})
build_index(spark, pages, {idx!r},
            IndexConfig(n_buckets=32, buzzwords=("c++",)),
            n_shards=1, resume=False)
spark.stop()
"""
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=3600)
    code = RUN.format(repo=REPO, cpus=cpus, idx=idx, queries=QUERIES,
                      repeats=repeats)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            print(json.dumps({"n_docs": n_docs, "query_cpus": cpus,
                              "repeats": repeats, "queries": res}))
            return
    raise RuntimeError(f"evidence run failed:\n{proc.stdout[-2000:]}\n"
                       f"{proc.stderr[-3000:]}")


if __name__ == "__main__":
    main()
