"""Similarity search over the embeddings table (training-data ops):
brute-force cosine top-k baseline + random-hyperplane LSH bucketed ANN
as the scale path.

Scale notes: brute force is a broadcast of the query vector + one full
scan (fine for one query; for batch queries use the LSH path). The LSH
variant buckets vectors by sign-pattern against fixed hyperplanes —
candidate generation becomes a bucket groupBy join instead of a cross
join; recall is tunable via n_planes/n_tables.
"""

from __future__ import annotations

import numpy as np

N_PLANES = 8


def _cosine_expr(vec_lit):
    """Cosine similarity between the embedding column and a literal
    query vector, computed JVM-side (zip_with + aggregate — no Python)."""
    from pyspark.sql import functions as F

    dot = F.aggregate(
        F.zip_with("embedding", vec_lit, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(
        F.transform(vec_lit, lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_topk(spark, sf_dir, query_vec_id=0, k=10):
    """Brute-force cosine top-k neighbours of one vector (baseline)."""
    from pyspark.sql import functions as F

    from .corpus import embeddings

    emb = embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").collect()[0][0]
    vec_lit = F.array(*[F.lit(float(v)) for v in q])
    emb_d = emb.withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    return (emb_d.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id",
                    F.round(_cosine_expr(vec_lit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def lsh_buckets(spark, sf_dir, n_planes=N_PLANES, seed=7):
    """Sign-pattern LSH bucket id per vector: bit j = sign(v · h_j).
    Hyperplanes are a fixed seeded Gaussian matrix (no external data)."""
    from pyspark.sql import functions as F

    from .corpus import embeddings

    emb = embeddings(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for j in range(n_planes):
        plane_lit = F.array(*[F.lit(float(v)) for v in planes[j]])
        dot = F.aggregate(F.zip_with("embedding", plane_lit,
                                     lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(0)
    return emb.select("vec_id", "label", bucket.alias("bucket"))


def ann_lsh_topk(spark, sf_dir, query_vec_id=0, k=10,
                 n_planes=N_PLANES, seed=7):
    """ANN: restrict the cosine scan to the query's LSH bucket (plus
    Hamming-1 neighbour buckets for recall), then exact rerank."""
    from pyspark.sql import functions as F

    from .corpus import embeddings

    buckets = lsh_buckets(spark, sf_dir, n_planes, seed)
    qb = buckets.filter(F.col("vec_id") == query_vec_id) \
        .select("bucket").collect()[0][0]
    probe = [qb] + [qb ^ (1 << j) for j in range(n_planes)]
    cand = buckets.filter(F.col("bucket").isin(probe)) \
        .select("vec_id")
    emb = embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").collect()[0][0]
    vec_lit = F.array(*[F.lit(float(v)) for v in q])
    emb_d = emb.join(cand, "vec_id") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    return (emb_d.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id",
                    F.round(_cosine_expr(vec_lit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))
