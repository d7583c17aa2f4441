"""PQ ANN scale evidence: encode N synthetic 64-dim vectors once,
then contrast per-query wall of (a) brute-force exact cosine top-k
over the float vectors vs (b) the PQ-ADC probe (codes-only scan +
exact rerank of C candidates), plus the index-size ratio.

Vectors are deterministic per vec_id (counter-seeded numpy Philox —
batch-boundary independent), so runs are reproducible and no external
data is involved.

Usage: python BENCH/pq_scale.py [N] [n_queries] [cpus] [m] [ksub] [C]
Writes one JSON line; artifact BENCH/PQ_SCALE_r5.json.

The driver-gate entries run m=8 subspaces x ksub=16 centroids (4-bit
codes) because the exact DuckDB oracle inlines per-code CASE chains —
fine for a value-identity gate, far too coarse for real recall. This
bench defaults to the production configuration (m=16, ksub=256 ->
8-bit codes = FAISS PQ16x8, rerank C=1000), which the same code paths
support unchanged; random Gaussian vectors are ANN's worst case (no
cluster structure), so the recall here is a floor, not a ceiling.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DIM = 64


def synth(spark, n):
    """(vec_id, embedding float[64]) — vec_id-counter Philox, so the
    value of row i never depends on partitioning."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for r, vid in enumerate(ids):
                rng = np.random.Generator(
                    np.random.Philox(key=7, counter=int(vid)))
                out[r] = rng.standard_normal(DIM, dtype=np.float32)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [row for row in out]})

    return (spark.range(n).repartition(32)
            .mapInPandas(gen, schema="vec_id long, "
                                     "embedding array<float>"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    ksub = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    rerank_c = int(sys.argv[6]) if len(sys.argv) > 6 else 1000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from swish_e_spark.ops import pq
    from swish_e_spark.ops.similarity import _cosine_expr

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth(spark, n).persist()
    emb.count()

    # --- train + encode once (the index build) -------------------
    t0 = time.time()
    sample = np.array(
        [r["embedding"] for r in
         emb.orderBy("vec_id").limit(pq.PQ_SAMPLE_CAP).collect()],
        dtype=np.float64)
    books = pq.train_codebooks(sample, m=m, ksub=ksub)
    sub = DIM // m
    bc = spark.sparkContext.broadcast(books)

    import pandas as pd

    def encode(batches):
        bks = bc.value
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64)
            out = {"vec_id": pdf["vec_id"]}
            for j, cents in enumerate(bks):
                xs = mat[:, j * sub:(j + 1) * sub]
                scores = (xs @ cents.T
                          - 0.5 * (cents * cents).sum(axis=1))
                out[f"c{j}"] = np.argmax(scores, axis=1).astype(
                    np.int32)
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"c{j} int" for j in range(m))
    codes = emb.mapInPandas(encode, schema=schema).persist()
    codes.count()
    t_build = time.time() - t0

    # spread probe ids across the id space, clamped to the actual N
    qids = sorted({(n * k) // 7 % n for k in range(1, n_q + 1)})
    qvecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
             for r in emb.filter(F.col("vec_id").isin(qids)).collect()}

    # --- brute-force exact cosine ---------------------------------
    t0 = time.time()
    brute = {}
    for vid in qids:
        q = qvecs[vid]
        vec_lit = F.array(*[F.lit(float(v)) for v in q])
        rows = (emb.filter(F.col("vec_id") != vid)
                .withColumn("embedding",
                            F.col("embedding").cast("array<double>"))
                .select("vec_id", _cosine_expr(vec_lit).alias("cos"))
                .orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)
                .collect())
        brute[vid] = [r.vec_id for r in rows]
    t_brute = (time.time() - t0) / len(qids)

    # --- PQ-ADC probe over the persisted codes --------------------
    t0 = time.time()
    approx = {}
    for vid in qids:
        q = qvecs[vid]
        lut = pq._lut(q, books, sub)
        cand = (codes.filter(F.col("vec_id") != vid)
                .select("vec_id", pq._adc_col(lut).alias("adc"))
                .orderBy(F.desc("adc"), F.asc("vec_id"))
                .limit(rerank_c))
        vec_lit = F.array(*[F.lit(float(v)) for v in q])
        rows = (emb.join(cand, "vec_id")
                .withColumn("embedding",
                            F.col("embedding").cast("array<double>"))
                .select("vec_id", _cosine_expr(vec_lit).alias("cos"))
                .orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)
                .collect())
        approx[vid] = [r.vec_id for r in rows]
    t_pq = (time.time() - t0) / len(qids)

    rec = [len(set(brute[v]) & set(approx[v])) / 10.0 for v in qids]
    out = {
        "metric": "pq_scale",
        "n_vectors": n,
        "encode_build_s": round(t_build, 3),
        "brute_per_query_s": round(t_brute, 3),
        "pq_per_query_s": round(t_pq, 3),
        "speedup": round(t_brute / t_pq, 2),
        "recall_at_10": round(sum(rec) / len(rec), 3),
        "recall_per_query": rec,
        "m": m,
        "ksub": ksub,
        "rerank_c": rerank_c,
        "index_bytes_per_vec": m * (1 if ksub <= 256 else 2),
        "float_bytes_per_vec": DIM * 4,
        "compression_x": DIM * 4 / (m * (1 if ksub <= 256 else 2)),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
