"""Distributed BPE vocabulary learning over the documents table — the
tokenizer-training stage of an LLM data pipeline (Sennrich et al. 2016,
arXiv:1508.07909; the merge loop HF `tokenizers` trains with).

Shape for 10^12 docs: the corpus first collapses to (word, count) —
ALL subsequent rounds run over the distinct-word table (vocabulary
cardinality, not corpus cardinality), which is the standard trick that
makes BPE training tractable at scale. Each round is then one pair-
count aggregation (shuffle keyed on the pair) plus a window-based merge
partitioned by word; the symbol rows stay hash-partitioned by word
across rounds (the first window's exchange is reused from the persisted
plan), and only the single argmax row comes back to the driver per
round — a driver-side loop is inherent to BPE (each merge depends on
the previous), exactly like the seeded k-means trainer in
ops/similarity.py.

Greedy left-to-right application (the BPE contract: 'aaaa' + merge
(a,a) -> 'aa aa', never the overlapping middle pair) is expressed
relationally: mark every position starting a top-pair occurrence,
group CONSECUTIVE marked positions into islands (overlap chains only
arise when left==right), and keep odd island ranks — identical
semantics in Spark windows, in the generated DuckDB oracle, and in the
pure-Python reference the tests pin against.
"""

from __future__ import annotations

BPE_MERGES = 12

# last trained symbol table, persisted; replaced on the next _learn
# call (same cache lifecycle as dedup._PERSISTED)
_PERSISTED: dict = {}


def _learn(spark, sf_dir, n_merges: int):
    """Run the merge loop; returns (merge list, final symbol rows —
    persisted and materialized, released on the next call)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .corpus import tokens

    w = (tokens(spark, sf_dir).groupBy("t")
         .agg(F.count("*").alias("cnt"))
         .withColumnRenamed("t", "word"))
    syms = (w.select(
        "word", "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"))
        .withColumn("sym", F.expr("substring(word, pos, 1)")))

    ww = Window.partitionBy("word").orderBy("pos")
    run = ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out, prev = [], None
    for r in range(1, n_merges + 1):
        syms = syms.persist()
        if prev is not None:
            prev.unpersist()
        prev = syms
        top = (syms.withColumn("nxt", F.lead("sym").over(ww))
               .filter(F.col("nxt").isNotNull())
               .groupBy("sym", "nxt").agg(F.sum("cnt").alias("total"))
               .orderBy(F.desc("total"), F.asc("sym"), F.asc("nxt"))
               .limit(1).collect())
        if not top:
            break
        x, y, total = top[0]["sym"], top[0]["nxt"], int(top[0]["total"])
        out.append((r, x, y, x + y, total))

        s = (syms.withColumn("nxt", F.lead("sym").over(ww))
             .withColumn("mk", F.coalesce(
                 (F.col("sym") == F.lit(x)) & (F.col("nxt") == F.lit(y)),
                 F.lit(False)))
             # islands of consecutive marks: pos - running mark count
             # is constant within an island (overlaps need left==right)
             .withColumn("grp", F.col("pos")
                         - F.sum(F.col("mk").cast("int")).over(run))
             # greedy left-to-right: keep odd ranks within the island
             .withColumn("keep", F.col("mk") & (
                 F.row_number().over(
                     Window.partitionBy("word", "grp", "mk")
                     .orderBy("pos")) % 2 == 1))
             .withColumn("dropped", F.coalesce(
                 F.lag("keep").over(ww), F.lit(False))))
        syms = (s.filter(~F.col("dropped"))
                .withColumn("sym", F.when(
                    F.col("keep"),
                    F.concat("sym", "nxt")).otherwise(F.col("sym")))
                .withColumn("pos", F.row_number().over(ww))
                .select("word", "cnt", "pos", "sym"))
    syms = syms.persist()
    syms.count()  # materialize before releasing the ancestor cache
    if prev is not None and prev is not syms:  # `is`: early break
        prev.unpersist()
    old = _PERSISTED.get("bpe_syms")
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    _PERSISTED["bpe_syms"] = syms
    return out, syms


def bpe_merges(spark, sf_dir, n_merges: int = BPE_MERGES):
    """Learn the first ``n_merges`` BPE merges; returns the merge
    table (rank, lft, rgt, merged, total) — ties broken by pair count
    desc, then lexicographic (binary UTF-8 in both engines)."""
    out, _ = _learn(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        out, schema="rank int, lft string, rgt string, "
                    "merged string, total bigint")


def bpe_token_counts(spark, sf_dir, n_merges: int = BPE_MERGES):
    """Apply the learned merges: per-document token counts under the
    trained BPE vocabulary — the pipeline's sequence-length /
    token-budget signal with a REAL learned tokenizer, not a
    whitespace proxy. Join shape: the per-word symbol-count table is
    vocabulary-sized (broadcastable at any corpus scale), so the cost
    is one broadcast join over the token stream + one doc_id
    aggregation — no extra shuffle beyond the count."""
    from pyspark.sql import functions as F

    from .corpus import tokens

    _, syms = _learn(spark, sf_dir, n_merges)
    wl = syms.groupBy("word").agg(F.count("*").alias("n_sym"))
    return (tokens(spark, sf_dir)
            .join(F.broadcast(wl), F.col("t") == F.col("word"))
            .groupBy("doc_id")
            .agg(F.sum("n_sym").alias("n_bpe_tokens"))
            .orderBy("doc_id"))


def _round_sql(r: int) -> str:
    """One BPE round as DuckDB CTEs: s{r-1} -> s{r} + t{r} (the chosen
    merge), mirroring the Spark windows line for line."""
    p = r - 1
    # MATERIALIZED is load-bearing: t{r} is referenced twice as a
    # scalar subquery — default CTE inlining would re-evaluate the
    # whole upstream round chain per reference (exponential in r)
    return f"""
n{r} as materialized (select word, cnt, pos, sym,
                lead(sym) over (partition by word order by pos) as nxt
         from s{p}),
t{r} as materialized (select sym as lft, nxt as rgt,
                cast(sum(cnt) as bigint) as total
         from n{r} where nxt is not null group by sym, nxt
         order by total desc, lft, rgt limit 1),
g{r} as (select word, cnt, pos, sym, nxt, mk,
                pos - sum(case when mk then 1 else 0 end)
                      over (partition by word order by pos
                            rows unbounded preceding) as grp
         from (select n{r}.*,
                      coalesce(sym = (select lft from t{r})
                               and nxt = (select rgt from t{r}),
                               false) as mk
               from n{r})),
k{r} as (select *, mk and (row_number() over
                (partition by word, grp, mk order by pos) % 2 = 1)
                as keep
         from g{r}),
d{r} as (select *, coalesce(lag(keep) over
                (partition by word order by pos), false) as dropped
         from k{r}),
s{r} as materialized (select word, cnt,
                row_number() over (partition by word order by pos)
                  as pos,
                case when keep then sym || nxt else sym end as sym
         from d{r} where not dropped)"""


def _head_sql(n_merges: int) -> str:
    """Shared oracle head: token CTE, the collapsed word table, the
    initial one-char symbol rows, and all n merge rounds."""
    from .corpus import DUCK_TOKS

    rounds = ",".join(_round_sql(r) for r in range(1, n_merges + 1))
    return f"""with {DUCK_TOKS},
w as (select t as word, count(*) as cnt from toks
      where t <> '' group by t),
s0 as (select word, cnt, pos, substr(word, pos, 1) as sym
       from (select word, cnt,
                    unnest(range(1, length(word) + 1)) as pos
             from w)),
{rounds}"""


def bpe_merges_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB SQL reproducing bpe_merges exactly: the same n rounds
    inlined as generated CTEs, the argmax selected inside SQL."""
    finals = "\nunion all ".join(
        f"select {r} as rank, lft, rgt, lft || rgt as merged, total "
        f"from t{r}" for r in range(1, n_merges + 1))
    return f"""{_head_sql(n_merges)}
select cast(rank as int) as rank, lft, rgt, merged, total
from ({finals}) order by rank"""


def bpe_token_counts_sql(n_merges: int = BPE_MERGES) -> str:
    """DuckDB SQL reproducing bpe_token_counts: the trained symbol
    table's per-word lengths joined back onto the token stream."""
    return f"""{_head_sql(n_merges)},
wl as (select word, count(*) as n_sym from s{n_merges}
       group by word)
select doc_id, cast(sum(n_sym) as bigint) as n_bpe_tokens
from toks join wl on toks.t = wl.word
group by doc_id order by doc_id"""
