"""DuckDB oracle SQL builders for the ANN driver entries.

Both ANN paths are deterministic given the table and the seeded
constants, so an exact SQL oracle exists:

- ``ann_lsh_topk``: the hyperplanes are a pure function of the seed
  (``np.random.default_rng(seed + 101*t).standard_normal``), so the
  oracle inlines them as double literals and re-derives every vector's
  sign-pattern bucket, the query's Hamming-1 probe set, the candidate
  union over all tables, and the exact cosine rerank — line-for-line
  the computation ``similarity.ann_lsh_topk`` runs on Spark.

- ``ann_ivf_topk``: the coarse centroids are a pure function of the
  (vec_id-ordered, capped) sample and the seeded Lloyd iterations, so
  the oracle re-runs the identical numpy training on the same parquet
  at SQL-build time and inlines the resulting centroids; cell
  assignment is the same argmax over 16 dot products (first-max
  tie-break, matching ``np.argmax``), then probe-cells + exact rerank.

Float-literal round-trip: ``repr(float)`` is the shortest round-trip
decimal, which both Spark's ``F.lit`` and DuckDB's parser map back to
the identical double.
"""

from __future__ import annotations

import numpy as np

from .similarity import (
    KMEANS_ITERS, N_CENTROIDS, N_PLANES, N_TABLES, _train_centroids,
)

# the driver's correctness gate always runs oracle SQL at sf0.01
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _lit_list(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _embedding_dim(sf_dir: str = ORACLE_SF_DIR) -> int:
    """Embedding dimensionality read from the gate's own table — the
    Spark side (similarity.lsh_buckets) derives dim from the data, so
    a hardcoded dim here would silently diverge the hyperplane draw if
    the table ever changes shape."""
    try:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
        return len(t.column("embedding")[0])
    except Exception:
        return 64


def ann_lsh_topk_sql(query_vec_id: int = 0, k: int = 10,
                     n_planes: int = N_PLANES, seed: int = 7,
                     n_tables: int = N_TABLES) -> str:
    """SQL reproducing similarity.ann_lsh_topk exactly."""
    bucket_ctes = []
    cand_ctes = []
    dim = _embedding_dim()
    for t in range(n_tables):
        rng = np.random.default_rng(seed + 101 * t)
        planes = rng.standard_normal((n_planes, dim))
        bits = " + ".join(
            f"(case when list_dot_product(v, {_lit_list(planes[j])}) > 0"
            f" then {1 << j} else 0 end)"
            for j in range(n_planes))
        bucket_ctes.append(
            f"b{t} as (select vec_id, {bits} as bucket from e)")
        probes = " or ".join(
            ["b.bucket = q.qb"]
            + [f"b.bucket = xor(q.qb, {1 << j})"
               for j in range(n_planes)])
        cand_ctes.append(
            f"c{t} as (select b.vec_id from b{t} b, "
            f"(select bucket as qb from b{t} "
            f"where vec_id = {query_vec_id}) q where {probes})")
    union = " union all ".join(f"select vec_id from c{t}"
                               for t in range(n_tables))
    buckets_sql = ",\n".join(bucket_ctes)
    cands_sql = ",\n".join(cand_ctes)
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
{buckets_sql},
{cands_sql},
cand as (select distinct vec_id from ({union})),
q as (select v from e where vec_id = {query_vec_id})
select e.vec_id,
       cast(round(list_cosine_similarity(e.v, q.v), 4) as double) as cos
from e join cand using (vec_id), q
where e.vec_id <> {query_vec_id}
order by cos desc, e.vec_id asc limit {k}"""


def ann_ivf_topk_sql(query_vec_id: int = 0, k: int = 10,
                     nprobe: int = 4, n_centroids: int = N_CENTROIDS,
                     seed: int = 7, sample_cap: int = 20_000) -> str:
    """SQL reproducing similarity.ann_ivf_topk exactly. Centroids are
    re-derived here by the same seeded numpy k-means over the same
    (vec_id-ordered, capped) sample the Spark query trains on."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{ORACLE_SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl["vec_id"]), kind="stable")
    vecs = np.stack(
        tbl["embedding"].to_pylist())[order][:sample_cap].astype(
        np.float64)
    cents = _train_centroids(vecs, n_centroids, KMEANS_ITERS, seed)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    qpos = int(np.flatnonzero(
        np.asarray(tbl["vec_id"])[order] == query_vec_id)[0])
    q = np.stack(tbl["embedding"].to_pylist())[order][qpos].astype(
        np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(cn @ qn))[:nprobe].tolist()

    dots = ",\n       ".join(
        f"list_dot_product(v, {_lit_list(cn[j])}) as d{j}"
        for j in range(n_centroids))
    # first-max tie-break == np.argmax: take j iff d_j >= every later d
    cases = []
    for j in range(n_centroids - 1):
        conds = " and ".join(f"d{j} >= d{m}"
                             for m in range(j + 1, n_centroids))
        cases.append(f"when {conds} then {j}")
    argmax = ("case " + " ".join(cases)
              + f" else {n_centroids - 1} end")
    probes = ", ".join(str(int(c)) for c in probe)
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
d as (select vec_id,
       {dots}
      from e),
a as (select vec_id, {argmax} as cell from d),
cand as (select vec_id from a where cell in ({probes})),
q as (select v from e where vec_id = {query_vec_id})
select e.vec_id,
       cast(round(list_cosine_similarity(e.v, q.v), 4) as double) as cos
from e join cand using (vec_id), q
where e.vec_id <> {query_vec_id}
order by cos desc, e.vec_id asc limit {k}"""


def embedding_near_dup_sql(tau: float = None, n_planes: int = None,
                           n_tables: int = None,
                           seed: int = None) -> str:
    """SQL reproducing dedup.embedding_near_duplicates exactly: the
    deterministic augmentation (each vector + a perturbed copy),
    the same seeded hyperplane tables, within-(table, bucket) candidate
    pairs, and the exact-cosine verify. DuckDB's 1-based lambda index
    maps to Spark's 0-based transform index via (i - 1)."""
    from .dedup import (
        EMB_AUG_OFFSET, EMB_EPS, EMB_N_PLANES, EMB_N_TABLES, EMB_SEED,
        EMB_TAU,
    )

    tau = EMB_TAU if tau is None else tau
    n_planes = EMB_N_PLANES if n_planes is None else n_planes
    n_tables = EMB_N_TABLES if n_tables is None else n_tables
    seed = EMB_SEED if seed is None else seed
    dim = _embedding_dim()
    bucket_ctes = []
    for t in range(n_tables):
        planes = np.random.default_rng(seed + 101 * t) \
            .standard_normal((n_planes, dim))
        bits = " + ".join(
            f"(case when list_dot_product(v, {_lit_list(planes[j])}) > 0"
            f" then {1 << j} else 0 end)"
            for j in range(n_planes))
        bucket_ctes.append(
            f"select vec_id, {t} as t, {bits} as bkt from aug")
    buckets = " union all ".join(bucket_ctes)
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
p as (select e.vec_id + {EMB_AUG_OFFSET} as vec_id,
             list_transform(v, (x, i) -> x + case
               when (e.vec_id * 31 + (i - 1)) % 2 = 1
               then cast({EMB_EPS} as double)
               else cast(-{EMB_EPS} as double) end) as v
      from e),
aug as (select * from e union all select * from p),
m as ({buckets}),
cand as (select distinct a.vec_id as vec_a, b.vec_id as vec_b
         from m a join m b on a.t = b.t and a.bkt = b.bkt
                          and a.vec_id < b.vec_id),
v as (select c.vec_a, c.vec_b,
             list_cosine_similarity(x.v, y.v) as cos_raw
      from cand c
      join aug x on x.vec_id = c.vec_a
      join aug y on y.vec_id = c.vec_b)
select vec_a, vec_b, cast(round(cos_raw, 4) as double) as cos
from v where cos_raw >= {tau}
order by vec_a, vec_b"""


def _semantic_centroids(n_centroids: int, seed: int,
                        sample_cap: int) -> np.ndarray:
    """Normalized centroids re-derived exactly as
    similarity.semantic_duplicates trains them: the RAW embeddings
    (vec_id-ordered, capped) through the same seeded numpy k-means."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{ORACLE_SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl["vec_id"]), kind="stable")
    vecs = np.stack(
        tbl["embedding"].to_pylist())[order][:sample_cap].astype(
        np.float64)
    cents = _train_centroids(vecs, n_centroids, KMEANS_ITERS, seed)
    return cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def _semantic_pairs_sql(tau: float, n_centroids: int, seed: int,
                        sample_cap: int) -> str:
    from .dedup import EMB_AUG_OFFSET, EMB_EPS

    cn = _semantic_centroids(n_centroids, seed, sample_cap)
    dots = ",\n       ".join(
        f"list_dot_product(v, {_lit_list(cn[j])}) as d{j}"
        for j in range(n_centroids))
    # first-max tie-break == np.argmax (same device as ann_ivf_topk)
    cases = []
    for j in range(n_centroids - 1):
        conds = " and ".join(f"d{j} >= d{m}"
                             for m in range(j + 1, n_centroids))
        cases.append(f"when {conds} then {j}")
    argmax = ("case " + " ".join(cases)
              + f" else {n_centroids - 1} end")
    return f"""
with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
p as (select e.vec_id + {EMB_AUG_OFFSET} as vec_id,
             list_transform(v, (x, i) -> x + case
               when (e.vec_id * 31 + (i - 1)) % 2 = 1
               then cast({EMB_EPS} as double)
               else cast(-{EMB_EPS} as double) end) as v
      from e),
aug as (select * from e union all select * from p),
d as (select vec_id, v,
       {dots}
      from aug),
a as (select vec_id, {argmax} as cell from d),
ec as (select aug.vec_id, aug.v, a.cell
       from aug join a using (vec_id))
select x.vec_id as vec_id_a, y.vec_id as vec_id_b, x.cell,
       cast(round(list_cosine_similarity(x.v, y.v), 4) as double)
         as cos
from ec x join ec y on x.cell = y.cell and x.vec_id < y.vec_id
where list_cosine_similarity(x.v, y.v) >= {tau}
order by vec_id_a, vec_id_b"""


def semantic_duplicates_sql(tau: float = None, n_centroids: int = None,
                            seed: int = 7,
                            sample_cap: int = 20_000) -> str:
    """SQL reproducing similarity.semantic_duplicates exactly: the
    shared planted augmentation, the re-derived k-means cells with
    first-max assignment, within-cell pairs, and the raw-cosine
    threshold with rounded display value."""
    from .similarity import SEM_TAU

    tau = SEM_TAU if tau is None else tau
    n_centroids = N_CENTROIDS if n_centroids is None else n_centroids
    return _semantic_pairs_sql(tau, n_centroids, seed, sample_cap)


def semantic_dedup_sql(tau: float = None, n_centroids: int = None,
                       seed: int = 7,
                       sample_cap: int = 20_000) -> str:
    """SQL reproducing similarity.semantic_dedup: transitive closure
    of the semantic pairs by recursive CTE, min label per component
    (same pattern as the lsh_dedup_clusters oracle)."""
    from .similarity import SEM_TAU

    tau = SEM_TAU if tau is None else tau
    n_centroids = N_CENTROIDS if n_centroids is None else n_centroids
    pairs = _semantic_pairs_sql(tau, n_centroids, seed, sample_cap)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
nodes AS (SELECT vec_id_a AS vec_id FROM pairs
          UNION SELECT vec_id_b FROM pairs),
edges AS (SELECT vec_id_a AS s, vec_id_b AS d FROM pairs
          UNION SELECT vec_id_b AS s, vec_id_a AS d FROM pairs),
reach(vec_id, lbl) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.vec_id)
SELECT vec_id, MIN(lbl) AS canonical_id
FROM reach GROUP BY vec_id ORDER BY vec_id"""
