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


N_CENTROIDS = 16
KMEANS_ITERS = 8


def _train_centroids(vectors: np.ndarray, n_centroids: int,
                     iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (at 100 TB:
    a seeded sample of ~100k vectors is plenty for coarse IVF cells;
    training is O(sample · k · iters) on the driver, assignment is the
    distributed part)."""
    rng = np.random.default_rng(seed)
    n = len(vectors)
    cents = vectors[rng.choice(n, size=min(n_centroids, n),
                               replace=False)].astype(np.float64)
    # cosine assignment ≈ dot on normalized vectors; the sample matrix
    # never changes, so normalize it once outside the Lloyd loop
    vn = vectors / np.maximum(
        np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(vn @ cn.T, axis=1)
        for c in range(len(cents)):
            members = vectors[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(spark, sf_dir, n_centroids=N_CENTROIDS,
               iters=KMEANS_ITERS, seed=7, sample_cap=20_000):
    """IVF coarse quantizer: (vec_id, cell) assignment table.

    Centroids train on a seeded driver-side sample; assignment runs as
    one Arrow-batched matmul per partition (numpy, no per-row Python).
    Returns (assign_df, centroids).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from .corpus import embeddings

    emb = embeddings(spark, sf_dir)
    # deterministic sample: ordered by vec_id so the trained centroids
    # are a pure function of the table (the DuckDB oracle re-derives
    # them bit-identically); the sort costs nothing — the sample is
    # capped, and at 100 TB it's a capped sorted-limit pushdown
    sample = np.array(
        [r["embedding"] for r in
         emb.select("vec_id", "embedding").orderBy("vec_id")
         .limit(sample_cap).collect()],
        dtype=np.float64)
    cents = _train_centroids(sample, n_centroids, iters, seed)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast(cn)

    def assign_kernel(batches):
        cmat = bc.value
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64)
            # argmax over normalized centroids; normalizing the row too
            # is argmax-invariant (positive row scale), so skip it —
            # the SQL oracle evaluates the same 16 raw dot products
            cell = np.argmax(mat @ cmat.T, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "cell": cell.astype(np.int32)})

    assign = emb.select("vec_id", "embedding").mapInPandas(
        assign_kernel, schema="vec_id long, cell int")
    return assign, cents


def ann_ivf_topk(spark, sf_dir, query_vec_id=0, k=10, nprobe=4,
                 n_centroids=N_CENTROIDS, seed=7):
    """IVF ANN: probe the nprobe nearest coarse cells, exact-rerank the
    candidates (the scale path: each query touches nprobe/n_centroids
    of the corpus; cells are a groupBy key, so at 100 TB the assignment
    table is bucketed by cell and a probe is a partition-pruned scan)."""
    from pyspark.sql import functions as F

    from .corpus import embeddings

    assign, cents = ivf_assign(spark, sf_dir, n_centroids, seed=seed)
    emb = embeddings(spark, sf_dir)
    q = np.array(emb.filter(F.col("vec_id") == query_vec_id)
                 .select("embedding").collect()[0][0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(cn @ qn))[:nprobe].tolist()
    cand = assign.filter(F.col("cell").isin([int(c) for c in probe])) \
        .select("vec_id")
    vec_lit = F.array(*[F.lit(float(v)) for v in q])
    emb_d = emb.join(cand, "vec_id") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    return (emb_d.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id",
                    F.round(_cosine_expr(vec_lit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


N_TABLES = 8


def _fold_dot(vec, plane) -> float:
    """Strict left-to-right float64 fold — bit-identical to the JVM's
    ``F.aggregate(zip_with(x*y), 0.0, acc+v)`` (and to DuckDB's
    list_dot_product on the same data), so a bucket sign computed on
    the driver equals the one the executors compute."""
    acc = 0.0
    for x, y in zip(vec, plane):
        acc += float(x) * float(y)
    return acc


class LshAnnIndex:
    """Build-once multi-table LSH ANN index over the embeddings table.

    An ANN index is built once and probed many times; at 100 TB the
    bucket table IS the index. Build = ONE scan computing every
    table's sign-pattern bucket column (vec_id, embedding,
    bucket_0..bucket_{T-1}), persisted (production: written out
    bucketed/partitioned by bucket for partition-pruned probes).
    Probe = the query's bucket per table computed DRIVER-SIDE in
    numpy (the hyperplanes already live on the driver — zero Spark
    jobs), then one filter over the cached index: ≤2 jobs per query
    (one bounded query-vector fetch + one candidate scan)."""

    def __init__(self, spark, sf_dir, n_planes=N_PLANES, seed=7,
                 n_tables=N_TABLES):
        from pyspark.sql import functions as F

        from .corpus import embeddings

        self.n_planes = n_planes
        emb = embeddings(spark, sf_dir)
        dim = len(emb.select("embedding").first()[0])
        self.planes = [
            np.random.default_rng(seed + 101 * t)
            .standard_normal((n_planes, dim))
            for t in range(n_tables)]
        cols = []
        for t, planes in enumerate(self.planes):
            bucket = F.lit(0)
            for j in range(n_planes):
                plane_lit = F.array(*[F.lit(float(v))
                                      for v in planes[j]])
                dot = F.aggregate(
                    F.zip_with("embedding", plane_lit,
                               lambda x, y: x * y),
                    F.lit(0.0), lambda acc, v: acc + v)
                bucket = bucket + F.when(dot > 0,
                                         F.lit(1 << j)).otherwise(0)
            cols.append(bucket.alias(f"bucket_{t}"))
        self.table = emb.select("vec_id", "embedding", *cols).persist()

    def probe_sets(self, qvec):
        """Per-table probe bucket list (own bucket + Hamming-1) for a
        query vector — pure driver-side numpy, no Spark jobs."""
        out = []
        for planes in self.planes:
            qb = sum(1 << j for j in range(self.n_planes)
                     if _fold_dot(qvec, planes[j]) > 0)
            out.append([qb] + [qb ^ (1 << j)
                               for j in range(self.n_planes)])
        return out

    def topk(self, query_vec_id, k=10):
        """Exact cosine rerank over the multi-table candidate union.
        A vector is a candidate if ANY table buckets it near the
        query; with per-table bucket columns that union is a single
        OR filter over the cached index — one job."""
        from functools import reduce

        from pyspark.sql import functions as F

        q = (self.table.filter(F.col("vec_id") == query_vec_id)
             .select("embedding").collect()[0][0])
        probes = self.probe_sets(q)
        cond = reduce(lambda a, b: a | b,
                      (F.col(f"bucket_{t}").isin(p)
                       for t, p in enumerate(probes)))
        vec_lit = F.array(*[F.lit(float(v)) for v in q])
        cand = (self.table
                .filter(cond & (F.col("vec_id") != query_vec_id))
                .withColumn("embedding",
                            F.col("embedding").cast("array<double>")))
        return (cand.select(
                    "vec_id",
                    F.round(_cosine_expr(vec_lit), 4).alias("cos"))
                .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))

    def unpersist(self):
        self.table.unpersist()


_LSH_INDEX_CACHE: dict = {}


def lsh_ann_index(spark, sf_dir, n_planes=N_PLANES, seed=7,
                  n_tables=N_TABLES) -> LshAnnIndex:
    """Memoized index per (sf_dir, params) — queries reuse the one
    persisted bucket table instead of rebuilding it per call."""
    key = (sf_dir, n_planes, seed, n_tables)
    idx = _LSH_INDEX_CACHE.get(key)
    if idx is None:
        idx = LshAnnIndex(spark, sf_dir, n_planes, seed, n_tables)
        _LSH_INDEX_CACHE[key] = idx
    return idx


def ann_lsh_topk(spark, sf_dir, query_vec_id=0, k=10,
                 n_planes=N_PLANES, seed=7, n_tables=N_TABLES):
    """ANN: restrict the cosine scan to the query's LSH bucket (plus
    Hamming-1 neighbour buckets) in each of ``n_tables`` independent
    hash tables, then exact rerank over the candidate union — the
    standard multi-table recall lever. Index-shaped: the bucket
    tables are built once and reused across queries (LshAnnIndex);
    a probe costs ≤2 jobs."""
    return lsh_ann_index(spark, sf_dir, n_planes, seed,
                         n_tables).topk(query_vec_id, k)


SEM_TAU = 0.99  # within-cell semantic-duplicate cosine threshold


def semantic_duplicates(spark, sf_dir, tau=SEM_TAU,
                        n_centroids=N_CENTROIDS, iters=KMEANS_ITERS,
                        seed=7, sample_cap=20_000):
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the same seeded k-means
    the IVF index uses, then compare pairs only WITHIN a cell — the
    exact-cosine verify costs sum(|cell|²), never N², and cross-cell
    near-dups are forfeited by design (the paper's own approximation).
    At 10^12 docs the cell is the shuffle key and the unit of
    parallelism; skewed mega-cells are AQE's skew-join case, or split
    hierarchically (k-means within the cell) exactly as SemDeDup does.

    The synthetic embeddings table has no natural near-dups (max
    background cosine ~0.51), so this reuses the deterministic planted
    augmentation shared with embedding_near_duplicates (vector + one
    perturbed copy, cos≈0.9968 per pair); the DuckDB oracle
    (ann_oracle.semantic_duplicates_sql) replays the augmentation,
    the centroid training, the first-max cell assignment, and the
    verify, so the gate is an exact row compare.

    Returns (vec_id_a, vec_id_b, cell, cos) sorted by the pair."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .dedup import EMB_AUG_OFFSET, _augmented_embeddings

    aug = _augmented_embeddings(spark, sf_dir)
    # centroids train on the RAW half only (vec_id-ordered, capped) so
    # they are a pure function of the table — the oracle re-derives
    # them bit-identically from the parquet
    sample = np.array(
        [r["v"] for r in aug.filter(F.col("vec_id") < EMB_AUG_OFFSET)
         .orderBy("vec_id").limit(sample_cap).collect()],
        dtype=np.float64)
    cents = _train_centroids(sample, n_centroids, iters, seed)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast(cn)

    def assign_kernel(batches):
        cmat = bc.value
        for pdf in batches:
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            cell = np.argmax(mat @ cmat.T, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "cell": cell.astype(np.int32)})

    assign = aug.select("vec_id", "v").mapInPandas(
        assign_kernel, schema="vec_id long, cell int")
    e = aug.join(assign, "vec_id")
    a = e.select(F.col("vec_id").alias("vec_id_a"),
                 F.col("v").alias("va"), "cell")
    b = e.select(F.col("vec_id").alias("vec_id_b"),
                 F.col("v").alias("vb"), F.col("cell").alias("cellb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("va", lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return (a.join(b, [F.col("cell") == F.col("cellb"),
                       F.col("vec_id_a") < F.col("vec_id_b")])
            .withColumn("cos_raw", dot / (na * nb))
            .where(F.col("cos_raw") >= tau)  # raw, like the oracle
            .select("vec_id_a", "vec_id_b", "cell",
                    F.round("cos_raw", 4).alias("cos"))
            .orderBy("vec_id_a", "vec_id_b"))


def semantic_dedup(spark, sf_dir, tau=SEM_TAU,
                   n_centroids=N_CENTROIDS, iters=KMEANS_ITERS,
                   seed=7, sample_cap=20_000):
    """Survivor selection over semantic_duplicates: connected
    components by min-id label propagation (shared with the LSH dedup
    path), one canonical representative per semantic cluster. Returns
    (vec_id, canonical_id) for every clustered vector; rows with
    vec_id == canonical_id are the keep set."""
    from pyspark.sql import functions as F

    from .dedup import connected_components

    pairs = semantic_duplicates(spark, sf_dir, tau, n_centroids,
                                iters, seed, sample_cap) \
        .select("vec_id_a", "vec_id_b")
    cc = connected_components(pairs, "vec_id_a", "vec_id_b")
    return (cc.select(F.col("doc_id").alias("vec_id"), "canonical_id")
            .orderBy("vec_id"))
