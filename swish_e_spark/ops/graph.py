"""Link-graph operators over the documents table: PageRank on a
planted deterministic web graph — the crawl-frontier / document-prior
signal every web-scale pipeline computes (Page et al. 1999; Common
Crawl publishes harmonic-centrality/PR rankings for exactly this use).

The testdata corpus has no link column, so — like the planted messy
URLs in ops/weburl.py — the graph is synthesized deterministically
from doc_id: every doc links to (doc_id * m + c) % N for the three
LINK_RULES, giving a 3-regular out-degree multigraph whose in-degrees
vary with gcd structure. Both the Spark query and the DuckDB oracle
derive the identical edge set, so the gate value-compares the actual
power iteration, not just the synthesis.

Scale notes (10^12 pages):
- Each iteration is ONE join (edges x ranks on src, co-partitioned
  after the first exchange) + one groupBy(dst) — the canonical
  Pregel-style shape. Ranks and edges are persisted per round to cut
  executed lineage (same device as dedup.connected_components).
- The real-web refinement set — dangling-mass redistribution, teleport
  personalization, convergence stopping — drops into the same loop
  without changing the join shape; fixed ITERS keeps the oracle a
  finite generated-CTE chain.
- Float determinism: per-dst contribution sums are unordered float
  adds (~1e-16 association noise per round); the displayed rank
  rounds at 6 dp, eight orders above the noise floor — the same
  accepted tolerance class as the unigram-LM log sums.
"""

from __future__ import annotations

from .corpus import documents

PR_D = 0.85          # damping
PR_ITERS = 8
_PERSISTED: dict = {}   # final-ranks cache registry (one generation)
LINK_RULES = ((7, 1), (13, 3))   # affine: dst = (src*m + c) % N
PR_HUBS = 10                     # hub rule: dst = (src % PR_HUBS)*37 % N


def _edges(spark, sf_dir, n: int):
    """(src, dst) planted edge list — scan-side projection, no
    shuffle; three edges per doc: two affine bijections plus a hub
    rule concentrating every doc's third link onto PR_HUBS targets
    (the power-law in-degree skew of a real webgraph — hub nodes
    receive ~N/PR_HUBS in-links, so the rank genuinely spreads and
    the per-dst contribution sum sees realistic fan-in)."""
    from functools import reduce

    from pyspark.sql import functions as F

    d = documents(spark, sf_dir).select(
        F.col("doc_id").alias("src"))
    parts = [d.select("src",
                      ((F.col("src") * m + c) % n).alias("dst"))
             for m, c in LINK_RULES]
    parts.append(d.select(
        "src", ((F.col("src") % PR_HUBS) * 37 % n).alias("dst")))
    return reduce(lambda a, b: a.unionAll(b), parts)


def link_pagerank(spark, sf_dir, iters: int = PR_ITERS,
                  d: float = PR_D):
    """(doc_id, in_deg, pr): PageRank after ``iters`` synchronous
    power-iteration rounds from the uniform start, out-degree fixed
    at 3 (two affine rules + the hub rule). pr is rounded to 6 dp for
    display; in_deg is the exact planted in-degree."""
    from pyspark.sql import functions as F

    docs = documents(spark, sf_dir).select("doc_id")
    n = docs.count()
    edges = _edges(spark, sf_dir, n).persist()
    deg = len(LINK_RULES) + 1
    base = (1.0 - d) / n

    ranks = docs.select("doc_id",
                        F.lit(1.0 / n).alias("r")).persist()
    try:
        for _ in range(iters):
            contrib = (edges
                       .join(ranks.withColumnRenamed("doc_id", "src"),
                             "src")
                       .groupBy("dst")
                       .agg(F.sum(F.col("r") / float(deg))
                            .alias("x"))
                       .withColumnRenamed("dst", "doc_id"))
            nxt = (docs.join(contrib, "doc_id", "left")
                   .select("doc_id",
                           (F.lit(base)
                            + F.lit(d) * F.coalesce("x", F.lit(0.0)))
                           .alias("r")).persist())
            nxt.count()          # materialize, then drop the parent
            ranks.unpersist()
            ranks = nxt
        indeg = (edges.groupBy("dst")
                 .agg(F.count("*").alias("in_deg"))
                 .withColumnRenamed("dst", "doc_id"))
        # the returned plan reads the persisted final ranks; register
        # it so the NEXT invocation releases this generation (same
        # lifecycle rule as dedup.connected_components — the result is
        # lazy, so freeing it now would drop the cache before the
        # caller ever reads it)
        old = _PERSISTED.get("pr_ranks")
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
        _PERSISTED["pr_ranks"] = ranks
        return (docs.join(indeg, "doc_id", "left")
                .join(ranks, "doc_id")
                .select("doc_id",
                        F.coalesce("in_deg", F.lit(0)).cast("long")
                        .alias("in_deg"),
                        F.round("r", 6).alias("pr"))
                .orderBy("doc_id"))
    finally:
        edges.unpersist()


# ---------------------------------------------------------------- SQL

ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _oracle_n(sf_dir: str = ORACLE_SF_DIR) -> int:
    import pyarrow.parquet as pq_

    return pq_.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"]).num_rows


def link_pagerank_sql(iters: int = PR_ITERS, d: float = PR_D) -> str:
    """Generated finite-CTE chain reproducing link_pagerank exactly:
    the same planted edges, uniform start, and ``iters`` join+groupBy
    rounds (the BPE-oracle device — iteration count is a compile-time
    constant, so no recursive CTE is needed)."""
    n = _oracle_n()
    deg = len(LINK_RULES) + 1
    base = (1.0 - d) / n
    edge_parts = " union all ".join(
        [f"select doc_id as src, (doc_id * {m} + {c}) % {n} as dst "
         f"from documents" for m, c in LINK_RULES]
        + [f"select doc_id as src, "
           f"(doc_id % {PR_HUBS}) * 37 % {n} as dst from documents"])
    ctes = [f"e as ({edge_parts})",
            f"r0 as (select doc_id, {1.0 / n!r} as r from documents)"]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} as (
  select docs.doc_id,
         {base!r} + {d!r} * coalesce(c.x, 0.0) as r
  from (select doc_id from documents) docs
  left join (select e.dst, sum(p.r / {float(deg)!r}) as x
             from e join r{k - 1} p on p.doc_id = e.src
             group by e.dst) c on c.dst = docs.doc_id)""")
    chain = ",\n".join(ctes)
    return f"""
with {chain},
indeg as (select dst as doc_id, count(*) as in_deg from e group by 1)
select d.doc_id,
       cast(coalesce(i.in_deg, 0) as bigint) as in_deg,
       cast(round(r{iters}.r, 6) as double) as pr
from documents d
left join indeg i using (doc_id)
join r{iters} using (doc_id)
order by d.doc_id"""
