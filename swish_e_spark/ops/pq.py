"""Product-quantization (PQ) ANN over the embeddings table — the
memory-bound scale path for vector search (Jegou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

The 100 TB story: an IVF or LSH index still stores the full float
vectors for the rerank scan; at 10^11 vectors the vectors themselves
ARE the cost (64-dim float32 = 256 B/vec -> 25 TB resident). PQ stores
8 one-byte codes per vector (32x smaller) and ranks candidates by
asymmetric distance computation (ADC): the query is NOT quantized; a
per-subspace lookup table of query-to-centroid dot products is computed
once on the driver (m * ksub = 128 doubles) and the per-vector score is
m table lookups + m adds — no float vector is touched until the final
exact rerank over the short candidate list.

Plan shape (audited in BENCH/PLANS.md):
- training: driver-side numpy over a capped, vec_id-ordered sample
  (same device as the IVF coarse quantizer — deterministic, so the
  DuckDB oracle re-derives the codebooks bit-identically);
- encoding: ONE Arrow-batched mapInPandas scan — per subspace an
  (batch x ksub) matmul + argmax, no per-row Python;
- probe: the ADC score is a JVM-side expression over the CODES table
  (element_at into a literal lookup array per subspace, summed
  left-to-right) -> orderBy desc limit C; only the C survivors join
  back to the float vectors for the exact-cosine rerank. Two shuffles
  total (top-C, top-k), both k-bounded.

Exactness contract for the driver gate: the codebooks, the lookup
tables, and the left-fold ADC sum are bit-identical between engine and
oracle (shared training/_lut code; identical literals summed in the
same order). The per-vector code ASSIGNMENT is argmax over scores the
engine computes with a numpy matmul and the oracle with sequential
list_dot_product — different summation orders, so a code could differ
if a vector's top-two subspace scores tied within ~1 ulp. Real
embedding data has assignment margins many orders above that (the same
margin assumption the IVF/SemDeDup oracles already rely on); the gate
would surface a flip as a value mismatch rather than hide it.
"""

from __future__ import annotations

import numpy as np

PQ_M = 8          # subspaces (dim 64 -> 8-dim subvectors)
PQ_KSUB = 16      # centroids per subspace (1 code = 4 bits here;
                  # production uses 256 -> 1 byte)
PQ_ITERS = 8
PQ_SEED = 7
PQ_SAMPLE_CAP = 20_000
PQ_RERANK_C = 50  # ADC candidates kept for the exact rerank

# the driver's correctness gate always runs oracle SQL at sf0.01
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _subspace_scores(xs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Assignment scores for one subspace: argmax_c (x . c - |c|^2/2)
    == argmin_c |x - c|^2 (the |x|^2 term is constant per row). The
    score form keeps the oracle's CASE-chain expression small: one
    list_dot_product plus a precomputed centroid-norm literal."""
    return xs @ cents.T - 0.5 * (cents * cents).sum(axis=1)


def train_codebooks(sample: np.ndarray, m: int = PQ_M,
                    ksub: int = PQ_KSUB, iters: int = PQ_ITERS,
                    seed: int = PQ_SEED) -> list[np.ndarray]:
    """Deterministic per-subspace Lloyd k-means (L2) on a driver-side
    sample. Shared verbatim by the Spark path and the SQL-oracle
    builder so both sides hold bit-identical codebooks."""
    dim = sample.shape[1]
    sub = dim // m
    books = []
    for j in range(m):
        xs = sample[:, j * sub:(j + 1) * sub].astype(np.float64)
        rng = np.random.default_rng(seed + 13 * j)
        cents = xs[rng.choice(len(xs), size=min(ksub, len(xs)),
                              replace=False)].copy()
        for _ in range(iters):
            assign = np.argmax(_subspace_scores(xs, cents), axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return books


def _sample_vectors(spark, sf_dir, sample_cap):
    """vec_id-ordered capped sample — a pure function of the table, so
    the oracle re-derives the identical matrix from the parquet."""
    from .corpus import embeddings

    emb = embeddings(spark, sf_dir)
    return np.array(
        [r["embedding"] for r in
         emb.select("vec_id", "embedding").orderBy("vec_id")
         .limit(sample_cap).collect()],
        dtype=np.float64)


def pq_codes(spark, sf_dir, m: int = PQ_M, ksub: int = PQ_KSUB,
             iters: int = PQ_ITERS, seed: int = PQ_SEED,
             sample_cap: int = PQ_SAMPLE_CAP, books=None):
    """The PQ code table: (vec_id, c0..c{m-1}) — the persisted index.

    Encoding is one Arrow-batched scan; per subspace the kernel does a
    (batch x ksub) matmul + argmax. At 10^11 vectors this table is
    what lives in memory/SSD (m bytes/vector); the float vectors stay
    cold in parquet until a rerank touches C of them. Pass ``books``
    to reuse already-trained codebooks (the probe paths train once
    and share them)."""
    import pandas as pd

    if books is None:
        sample = _sample_vectors(spark, sf_dir, sample_cap)
        books = train_codebooks(sample, m, ksub, iters, seed)
    sub = books[0].shape[1]
    bc = spark.sparkContext.broadcast(books)

    def encode(batches):
        # self-contained closure (no module references): ships to
        # executors via cloudpickle regardless of worker sys.path
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

    from .corpus import embeddings

    schema = "vec_id long, " + ", ".join(f"c{j} int" for j in range(m))
    return (embeddings(spark, sf_dir).select("vec_id", "embedding")
            .mapInPandas(encode, schema=schema)
            .orderBy("vec_id"))


def ann_pq_topk(spark, sf_dir, query_vec_id: int = 0, k: int = 10,
                m: int = PQ_M, ksub: int = PQ_KSUB,
                iters: int = PQ_ITERS, seed: int = PQ_SEED,
                sample_cap: int = PQ_SAMPLE_CAP,
                rerank_c: int = PQ_RERANK_C):
    """PQ-ADC top-k: rank every vector by the asymmetric approximate
    dot product computed from its codes alone, keep the top
    ``rerank_c``, exact-cosine rerank those against the query, return
    the top ``k`` as (vec_id, adc, cos).

    The ADC expression is JVM-side: per subspace,
    ``element_at(<literal lut_j>, c_j + 1)`` and a left-fold ``+``
    chain — the oracle sums the same literal doubles in the same
    order, so the compare is bit-exact."""
    from pyspark.sql import functions as F

    from .corpus import embeddings
    from .similarity import _cosine_expr

    sample = _sample_vectors(spark, sf_dir, sample_cap)
    books = train_codebooks(sample, m, ksub, iters, seed)
    sub = sample.shape[1] // m

    emb = embeddings(spark, sf_dir)
    q = np.array(emb.filter(F.col("vec_id") == query_vec_id)
                 .select("embedding").collect()[0][0], dtype=np.float64)
    # lut[j][c] = q_j . cent_{j,c} — m*ksub doubles on the driver; the
    # strict per-element fold matches what the oracle builder computes
    # (same _lut helper), keeping the literals bit-identical
    lut = _lut(q, books, sub)

    codes = pq_codes(spark, sf_dir, m, ksub, iters, seed, sample_cap,
                     books=books)
    cand = (codes.filter(F.col("vec_id") != query_vec_id)
            .select("vec_id", _adc_col(lut).alias("adc_raw"))
            .orderBy(F.desc("adc_raw"), F.asc("vec_id"))
            .limit(rerank_c))
    vec_lit = F.array(*[F.lit(float(v)) for v in q])
    emb_d = (emb.join(cand, "vec_id")
             .withColumn("embedding",
                         F.col("embedding").cast("array<double>")))
    return (emb_d.select(
                "vec_id",
                F.round(F.col("adc_raw"), 4).alias("adc"),
                F.round(_cosine_expr(vec_lit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def _lut(q: np.ndarray, books: list[np.ndarray], sub: int):
    """Query-to-centroid dot tables, one strict left-to-right fold per
    entry (bit-identical on driver and in the SQL literal)."""
    out = []
    for j, cents in enumerate(books):
        qj = q[j * sub:(j + 1) * sub]
        row = []
        for c in cents:
            acc = 0.0
            for x, y in zip(qj, c):
                acc += float(x) * float(y)
            row.append(acc)
        out.append(row)
    return out


def _adc_col(lut):
    """The JVM-side ADC score over code columns c0..c{m-1}: a literal
    lookup-array per subspace indexed by the code, summed as a left
    fold — the ONE definition shared by both probe paths (the SQL twin
    is _adc_sql; both must keep this fold order)."""
    from pyspark.sql import functions as F

    adc = None
    for j, row in enumerate(lut):
        arr = F.array(*[F.lit(float(v)) for v in row])
        term = F.element_at(arr, F.col(f"c{j}") + 1)
        adc = term if adc is None else adc + term
    return adc


def _adc_sql(lut) -> str:
    """SQL twin of _adc_col: per-subspace CASE lookups over the SAME
    literal doubles, '+'-chained in the same order."""
    terms = []
    for j, row in enumerate(lut):
        whens = " ".join(f"when {c} then {v!r}"
                         for c, v in enumerate(row))
        terms.append(f"(case c{j} {whens} end)")
    return " + ".join(terms)


def ann_ivfpq_topk(spark, sf_dir, query_vec_id: int = 0, k: int = 10,
                   nprobe: int = 4, m: int = PQ_M, ksub: int = PQ_KSUB,
                   iters: int = PQ_ITERS, seed: int = PQ_SEED,
                   sample_cap: int = PQ_SAMPLE_CAP,
                   rerank_c: int = PQ_RERANK_C):
    """IVF-PQ composed probe — the production ANN layout (FAISS
    IVFADC, Jegou et al. 2011 §IV): the coarse IVF cell prunes WHICH
    codes are scanned, the PQ codes decide the ADC ranking within the
    probed cells, and only the top-C survivors touch float vectors.

    At 10^11 vectors the index table (vec_id, cell, c0..c{m-1}) is
    written partitioned by cell, so a probe is a partition-pruned scan
    of nprobe/n_cells of the code bytes — both pruning levers compose
    multiplicatively. This variant quantizes raw vectors (not
    residuals); classic IVFADC encodes x - centroid(cell) for ~1 bit
    of extra precision per dim — same plan, different codebook
    training — noted rather than implemented so the DuckDB oracle
    stays one codes derivation shared with pq_codes.

    Cells reuse similarity.ivf_assign's seeded trainer, so the coarse
    layer is bit-identical to ann_ivf_topk's."""
    from pyspark.sql import functions as F

    from .corpus import embeddings
    from .similarity import _cosine_expr, ivf_assign

    assign, cents = ivf_assign(spark, sf_dir, seed=seed,
                               sample_cap=sample_cap)
    sample = _sample_vectors(spark, sf_dir, sample_cap)
    books = train_codebooks(sample, m, ksub, iters, seed)
    sub = sample.shape[1] // m

    emb = embeddings(spark, sf_dir)
    q = np.array(emb.filter(F.col("vec_id") == query_vec_id)
                 .select("embedding").collect()[0][0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probe = [int(c) for c in np.argsort(-(cn @ qn))[:nprobe]]

    codes = pq_codes(spark, sf_dir, m, ksub, iters, seed, sample_cap,
                     books=books)
    # production: ONE stored table partitioned by cell; here the join
    # stands in for the co-located layout
    idx = codes.join(assign, "vec_id")
    lut = _lut(q, books, sub)
    cand = (idx.filter(F.col("cell").isin(probe)
                       & (F.col("vec_id") != query_vec_id))
            .select("vec_id", _adc_col(lut).alias("adc_raw"))
            .orderBy(F.desc("adc_raw"), F.asc("vec_id"))
            .limit(rerank_c))
    vec_lit = F.array(*[F.lit(float(v)) for v in q])
    emb_d = (emb.join(cand, "vec_id")
             .withColumn("embedding",
                         F.col("embedding").cast("array<double>")))
    return (emb_d.select(
                "vec_id",
                F.round(F.col("adc_raw"), 4).alias("adc"),
                F.round(_cosine_expr(vec_lit), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


# ---------------------------------------------------------------- SQL

def _lit_list(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _oracle_books(m, ksub, iters, seed, sample_cap):
    """Re-derive the codebooks from the gate parquet exactly as the
    Spark path trains them (same ordered/capped sample, same numpy)."""
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(f"{ORACLE_SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl["vec_id"]), kind="stable")
    vecs = np.stack(
        tbl["embedding"].to_pylist())[order][:sample_cap].astype(
        np.float64)
    return train_codebooks(vecs, m, ksub, iters, seed), vecs, order, tbl


def _codes_ctes(books, sub) -> str:
    """CTE chain producing (vec_id, c0..c{m-1}) — per subspace the
    ksub assignment scores as list_dot_product minus the norm literal,
    then a first-max CASE chain (== np.argmax)."""
    m = len(books)
    ksub = len(books[0])
    score_cols = []
    for j, cents in enumerate(books):
        lo, hi = j * sub + 1, (j + 1) * sub
        for c in range(ksub):
            norm_half = 0.5 * float((cents[c] * cents[c]).sum())
            score_cols.append(
                f"list_dot_product(v[{lo}:{hi}], "
                f"{_lit_list(cents[c])}) - {norm_half!r} as s{j}_{c}")
    argmaxes = []
    for j in range(m):
        cases = []
        for c in range(ksub - 1):
            conds = " and ".join(f"s{j}_{c} >= s{j}_{e}"
                                 for e in range(c + 1, ksub))
            cases.append(f"when {conds} then {c}")
        argmaxes.append("case " + " ".join(cases)
                        + f" else {ksub - 1} end as c{j}")
    scores_sql = ",\n       ".join(score_cols)
    arg_sql = ",\n       ".join(argmaxes)
    return f"""
e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
sc as (select vec_id,
       {scores_sql}
      from e),
codes as (select vec_id,
       {arg_sql}
      from sc)"""


def pq_codes_sql(m: int = PQ_M, ksub: int = PQ_KSUB,
                 iters: int = PQ_ITERS, seed: int = PQ_SEED,
                 sample_cap: int = PQ_SAMPLE_CAP) -> str:
    """SQL reproducing pq_codes exactly (full code-table compare)."""
    books, vecs, _, _ = _oracle_books(m, ksub, iters, seed, sample_cap)
    sub = vecs.shape[1] // m
    cols = ", ".join(f"cast(c{j} as int) as c{j}" for j in range(m))
    return f"""
with {_codes_ctes(books, sub)}
select vec_id, {cols} from codes order by vec_id"""


def ann_pq_topk_sql(query_vec_id: int = 0, k: int = 10, m: int = PQ_M,
                    ksub: int = PQ_KSUB, iters: int = PQ_ITERS,
                    seed: int = PQ_SEED,
                    sample_cap: int = PQ_SAMPLE_CAP,
                    rerank_c: int = PQ_RERANK_C) -> str:
    """SQL reproducing ann_pq_topk exactly: same codebooks, same codes,
    same literal lookup tables summed in the same order, same top-C
    cut, same exact-cosine rerank."""
    books, vecs, order, tbl = _oracle_books(m, ksub, iters, seed,
                                            sample_cap)
    sub = vecs.shape[1] // m
    qpos = int(np.flatnonzero(
        np.asarray(tbl["vec_id"])[order] == query_vec_id)[0])
    q = np.stack(tbl["embedding"].to_pylist())[order][qpos].astype(
        np.float64)
    adc = _adc_sql(_lut(q, books, sub))
    return f"""
with {_codes_ctes(books, sub)},
adc as (select vec_id, {adc} as adc_raw from codes
        where vec_id <> {query_vec_id}
        order by adc_raw desc, vec_id asc limit {rerank_c}),
q as (select v from e where vec_id = {query_vec_id})
select e.vec_id,
       cast(round(adc.adc_raw, 4) as double) as adc,
       cast(round(list_cosine_similarity(e.v, q.v), 4) as double) as cos
from e join adc using (vec_id), q
order by cos desc, e.vec_id asc limit {k}"""


def ann_ivfpq_topk_sql(query_vec_id: int = 0, k: int = 10,
                       nprobe: int = 4, m: int = PQ_M,
                       ksub: int = PQ_KSUB, iters: int = PQ_ITERS,
                       seed: int = PQ_SEED,
                       sample_cap: int = PQ_SAMPLE_CAP,
                       rerank_c: int = PQ_RERANK_C) -> str:
    """SQL reproducing ann_ivfpq_topk exactly: the IVF cell layer is
    the same re-derived-centroid argmax chain ann_ivf_topk_sql uses
    (similarity.ivf_assign's trainer), composed with pq_codes' code
    derivation and the literal-lut ADC fold."""
    from .similarity import KMEANS_ITERS, N_CENTROIDS, _train_centroids

    books, vecs, order, tbl = _oracle_books(m, ksub, iters, seed,
                                            sample_cap)
    sub = vecs.shape[1] // m
    cents = _train_centroids(vecs[:sample_cap], N_CENTROIDS,
                             KMEANS_ITERS, seed)
    cn = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    qpos = int(np.flatnonzero(
        np.asarray(tbl["vec_id"])[order] == query_vec_id)[0])
    q = np.stack(tbl["embedding"].to_pylist())[order][qpos].astype(
        np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = ", ".join(str(int(c))
                      for c in np.argsort(-(cn @ qn))[:nprobe])

    dots = ",\n       ".join(
        f"list_dot_product(v, {_lit_list(cn[j])}) as d{j}"
        for j in range(N_CENTROIDS))
    cases = []
    for j in range(N_CENTROIDS - 1):
        conds = " and ".join(f"d{j} >= d{e}"
                             for e in range(j + 1, N_CENTROIDS))
        cases.append(f"when {conds} then {j}")
    cell_argmax = ("case " + " ".join(cases)
                   + f" else {N_CENTROIDS - 1} end")

    adc = _adc_sql(_lut(q, books, sub))
    return f"""
with {_codes_ctes(books, sub)},
cd as (select vec_id,
       {dots}
      from e),
a as (select vec_id, {cell_argmax} as cell from cd),
adc as (select codes.vec_id, {adc} as adc_raw
        from codes join a using (vec_id)
        where a.cell in ({probe})
          and codes.vec_id <> {query_vec_id}
        order by adc_raw desc, vec_id asc limit {rerank_c}),
q as (select v from e where vec_id = {query_vec_id})
select e.vec_id,
       cast(round(adc.adc_raw, 4) as double) as adc,
       cast(round(list_cosine_similarity(e.v, q.v), 4) as double) as cos
from e join adc using (vec_id), q
order by cos desc, e.vec_id asc limit {k}"""
