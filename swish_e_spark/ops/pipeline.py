"""Corpus-curation operators for training-data pipelines: Gopher-style
repetition quality signals, eval-set contamination detection, per-domain
rollups, and deterministic stratified sampling.

All four are SQL-expressible, so the DuckDB oracle verifies them exactly
(full value compare in the driver gate), and all are computed with
built-in functions only — lead() windows, groupBy, joins — JVM-side,
whole-stage-codegen, no Python in the hot path.

Scale notes (100 TB):
- repetition + contamination shuffle once on doc_id (the lead() window)
  and once on the gram/bigram key; both keys are high-cardinality and
  skew-free by construction (word n-grams), so AQE handles sizing.
- the contamination eval-gram set is tiny relative to the corpus and
  broadcast by Spark's auto threshold; at 10^12 docs you'd join on
  xxhash64(gram) instead of the gram string to shrink shuffle width
  (the string join here keeps the DuckDB oracle exact).
- stratified sampling ranks within lang partitions; at 10^12 docs a
  single per-lang reducer is the bottleneck, so production would
  pre-filter by a key-prefix band sized to ~16x the quota before the
  window (two-phase sample). The window form here is the normative
  semantics the two-phase version must reproduce.
"""

from __future__ import annotations

from .corpus import documents, tokens, TOKEN_SPLIT

EVAL_MOD = 37        # doc_id % EVAL_MOD == 0 -> held-out eval split
STRAT_QUOTA = 20     # docs kept per language stratum
PASSAGE_W = 4        # tokens per passage window (production: ~50)
RARE_C = 2           # corpus count <= RARE_C -> "rare" token (LM tail)
DELTA_MOD = 5        # doc_id % DELTA_MOD == DELTA_MOD-1 -> "new crawl"
DUP_PLANT_MOD = 17   # doc_id % DUP_PLANT_MOD == 0 -> planted boilerplate
DUP_PLANT_K = 3      # number of distinct planted boilerplate bodies
MIX_MAX_UP = 3       # max upsampling factor when rebalancing a mixture


def quality_repetition(spark, sf_dir):
    """Gopher-style repetition signals per doc (Rae et al. 2112.11446
    §A1.1 analogues over the synthetic corpus): duplicate-word fraction
    (1 - types/tokens) and the top word-bigram's share of all bigram
    occurrences. High values flag boilerplate/spam for filtering."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tk = tokens(spark, sf_dir)
    base = tk.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("t").alias("n_types"))
    w = Window.partitionBy("doc_id").orderBy("p")
    bg = (tk.withColumn("nt", F.lead("t").over(w))
          .filter(F.col("nt").isNotNull())
          .select("doc_id",
                  F.concat_ws(" ", "t", "nt").alias("bigram")))
    bgc = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    wb = Window.partitionBy("doc_id").orderBy(
        F.desc("c"), F.asc("bigram"))
    top = (bgc.withColumn("rn", F.row_number().over(wb))
           .filter(F.col("rn") == 1)
           .select("doc_id", F.col("bigram").alias("top_bigram"),
                   F.col("c").alias("top_c")))
    nbg = bg.groupBy("doc_id").agg(F.count("*").alias("n_bigrams"))
    return (base.join(nbg, "doc_id", "left").join(top, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.round(1.0 - F.col("n_types") / F.col("n_tokens"), 4)
                .alias("dup_word_frac"),
                F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
                F.coalesce(
                    F.round(F.col("top_c") / F.col("n_bigrams"), 4),
                    F.lit(0.0)).alias("top_bigram_frac"))
            .orderBy("doc_id"))


def contamination_overlap(spark, sf_dir):
    """Train/eval contamination check: word 3-gram overlap of every
    train doc (doc_id % EVAL_MOD != 0) against the union of eval-split
    grams. Production pipelines use 8-13-gram xxhash64 keys; 3-grams
    over the synthetic vocabulary exercise the same join shape with a
    non-trivial hit rate."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tk = tokens(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("p")
    g = (tk.withColumn("t1", F.lead("t", 1).over(w))
         .withColumn("t2", F.lead("t", 2).over(w))
         .filter(F.col("t2").isNotNull())
         .select("doc_id",
                 F.concat_ws(" ", "t", "t1", "t2").alias("gram"))
         .distinct())
    ev = (g.filter(F.col("doc_id") % EVAL_MOD == 0)
          .select("gram").distinct()
          .withColumn("hit", F.lit(1)))
    tr = g.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (tr.join(ev, "gram", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                 .alias("n_contaminated"))
            .select("doc_id", "n_grams", "n_contaminated",
                    F.round(F.col("n_contaminated") / F.col("n_grams"),
                            4).alias("contamination"))
            .orderBy("doc_id"))


def domain_stats(spark, sf_dir):
    """Per-source corpus rollup (the per-domain audit every crawl
    pipeline runs before mixing): doc count, language spread, char
    volume, and each source's share of the corpus. The share divisor is
    a broadcast scalar (crossJoin of a 1-row agg), not a global
    window — no single-partition Exchange."""
    from pyspark.sql import functions as F

    d = documents(spark, sf_dir)
    total = d.agg(F.count("*").alias("total_docs"))
    agg = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"))
    return (agg.crossJoin(F.broadcast(total))
            .select("source", "n_docs", "n_langs", "avg_chars",
                    "total_chars",
                    F.round(F.col("n_docs") / F.col("total_docs"), 4)
                    .alias("doc_share"))
            .orderBy("source"))


def sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: the first STRAT_QUOTA docs per
    language, ordered by md5(doc_id) — a seedless uniform pseudo-random
    key that is identical in Spark and DuckDB, so the sample is
    reproducible across engines and runs (language-balancing step of a
    data-mixing pipeline)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = documents(spark, sf_dir)
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (d.withColumn("strat_rank", F.row_number().over(w))
            .filter(F.col("strat_rank") <= STRAT_QUOTA)
            .select("doc_id", "lang", "strat_rank", "n_chars")
            .orderBy("lang", "strat_rank"))


def _passages(spark, sf_dir):
    """(doc_id, win, passage): non-overlapping PASSAGE_W-token windows,
    complete windows only (the tail shorter than W is dropped, as in
    suffix-window dedup). Computed as a pure scan-side projection —
    split -> filter -> transform(sequence, slice, array_join) ->
    posexplode — so passage generation costs ZERO shuffles; only the
    downstream aggregations exchange data."""
    from pyspark.sql import functions as F

    W = PASSAGE_W
    return (documents(spark, sf_dir)
            .withColumn("toks_arr",
                        F.filter(F.split(F.lower("text"), TOKEN_SPLIT),
                                 lambda x: x != ""))
            .withColumn("nwin", (F.size("toks_arr") / W).cast("int"))
            .select("doc_id",
                    F.posexplode(F.expr(
                        f"case when nwin >= 1 then "
                        f"transform(sequence(1, nwin), i -> "
                        f"array_join(slice(toks_arr, (i-1)*{W}+1, {W}),"
                        f" ' ')) "
                        f"else array() end"
                    )).alias("win", "passage")))


def dup_passages(spark, sf_dir):
    """Passage-level exact-duplication rollup (the window-granularity
    analogue of Lee et al. 2107.06499's EXACTSUBSTR dedup): per doc,
    how many of its PASSAGE_W-token windows occur verbatim in at least
    one OTHER document, and the duplicated fraction. Production
    pipelines use ~50-token windows joined on xxhash64(passage);
    4-token windows over the synthetic vocabulary exercise the same
    shape with a non-trivial hit rate (~10% at sf0.01), and the string
    key keeps the DuckDB oracle exact."""
    from pyspark.sql import functions as F

    pas = _passages(spark, sf_dir)
    cnt = pas.groupBy("passage").agg(
        F.countDistinct("doc_id").alias("nd"))
    per = (pas.join(cnt, "passage")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_passages"),
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                .cast("long").alias("n_dup_passages")))
    d = documents(spark, sf_dir).select("doc_id")
    return (d.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_passages", F.lit(0)).cast("long")
                    .alias("n_passages"),
                    F.coalesce("n_dup_passages", F.lit(0)).cast("long")
                    .alias("n_dup_passages"),
                    F.coalesce(
                        F.round(F.col("n_dup_passages")
                                / F.col("n_passages"), 4),
                        F.lit(0.0)).alias("dup_passage_frac"))
            .orderBy("doc_id"))


def quality_unigram_lm(spark, sf_dir):
    """Per-doc cross-entropy under the corpus unigram LM — the
    SQL-expressible analogue of CCNet's KenLM-perplexity quality score
    (Wenzek et al. 1911.00359 §3.3): ``bits_per_token`` = mean
    -log2 p(t) with p(t) = corpus_count(t)/total_tokens, plus the
    fraction of token occurrences whose corpus count is <= RARE_C
    (gibberish/OOV signal). Low bits = templated boilerplate; high
    bits + high rare_frac = noise.

    Scale shape: the (doc_id, t) pre-aggregation does the heavy
    map-side combine, the LM itself is a second groupBy over that SAME
    dataframe (one scan feeds both), and the probability join runs on
    the per-doc DISTINCT term set — occurrences never cross the wire
    twice. Head-token skew in the join is AQE's skew-join case here;
    at 10^12 docs you'd broadcast the top-64k dictionary and shuffle
    only the tail."""
    from pyspark.sql import functions as F

    dt = (tokens(spark, sf_dir)
          .groupBy("doc_id", "t").agg(F.count("*").alias("tf")))
    lm = dt.groupBy("t").agg(F.sum("tf").alias("c"))
    tot = lm.agg(F.sum("c").alias("n_total"))
    per = (dt.join(lm, "t")
           .groupBy("doc_id")
           .agg(F.sum("tf").alias("n_tokens"),
                F.sum(F.col("tf") * F.log2("c")).alias("s_log2c"),
                F.sum(F.when(F.col("c") <= RARE_C, F.col("tf"))
                      .otherwise(0)).alias("n_rare")))
    return (per.crossJoin(F.broadcast(tot))
            .select("doc_id", "n_tokens",
                    F.round(F.log2("n_total")
                            - F.col("s_log2c") / F.col("n_tokens"), 4)
                    .alias("bits_per_token"),
                    F.round(F.col("n_rare") / F.col("n_tokens"), 4)
                    .alias("rare_frac"))
            .orderBy("doc_id"))


def incremental_dedup(spark, sf_dir):
    """Delta-vs-base exact dedup — the shape every rolling crawl
    pipeline actually runs at scale: you never re-dedup the 100 TB
    corpus, you join the NEW crawl (doc_id % DELTA_MOD == DELTA_MOD-1,
    ~20%) against the persisted content-hash catalog of the base and
    keep only unseen content. Returns every delta doc with its md5,
    whether the base already holds that content, the canonical base
    holder (min doc_id, -1 if fresh), and how many base docs share it.

    The synthetic corpus has no verbatim-identical texts, so — like
    the planted messy URLs in ops/weburl.py — docs with
    doc_id % DUP_PLANT_MOD == 0 get a deterministic shared boilerplate
    body (one of DUP_PLANT_K variants) in BOTH the Spark column math
    and the oracle SQL; those planted dups land on both sides of the
    base/delta split, so the catalog join provably fires.

    Scale shape: the catalog is ONE groupBy on a 32-hex key (in
    production it is a bucketed table persisted across crawls, so the
    per-crawl cost is a map-side hash join against the delta only);
    the delta join is a broadcast when the delta is small or a
    co-bucketed join when it is not. No full-corpus pass per crawl."""
    from pyspark.sql import functions as F

    body = F.when(
        F.col("doc_id") % DUP_PLANT_MOD == 0,
        F.concat(F.lit("boilerplate page "),
                 (F.col("doc_id") % DUP_PLANT_K).cast("string"))
    ).otherwise(F.col("text"))
    d = (documents(spark, sf_dir)
         .select("doc_id", F.md5(body).alias("content_md5")))
    is_delta = F.col("doc_id") % DELTA_MOD == DELTA_MOD - 1
    base_cat = (d.filter(~is_delta)
                .groupBy("content_md5")
                .agg(F.min("doc_id").alias("base_doc_id"),
                     F.count("*").alias("n_base_dups")))
    return (d.filter(is_delta)
            .join(base_cat, "content_md5", "left")
            .select("doc_id", "content_md5",
                    F.when(F.col("base_doc_id").isNotNull(), 1)
                    .otherwise(0).alias("is_dup"),
                    F.coalesce("base_doc_id", F.lit(-1))
                    .cast("long").alias("base_doc_id"),
                    F.coalesce("n_base_dups", F.lit(0))
                    .cast("long").alias("n_base_dups"))
            .orderBy("doc_id"))


def mixture_weights(spark, sf_dir):
    """Data-mixing rebalance toward a uniform per-language token
    budget (the mixture-reweighting step of a pretraining pipeline,
    cf. The Pile 2101.00027 §1 mixing weights): each language's
    effective token budget is min(MIX_MAX_UP x its tokens,
    total/n_langs) — upsampling is capped so a tiny language is not
    repeated into memorization — and ``mix_weight`` is the sampling
    rate that realizes the budget. eff_tokens stays in INTEGER
    arithmetic (min/div) so Spark and the oracle agree bit-for-bit.

    Scale shape: per-doc token counts are a scan-side projection
    (size(filter(split())) — zero shuffles), the rollup is one
    groupBy(lang) over ~10^2 keys, and the totals divisor is a
    broadcast 1-row crossJoin, not a global window."""
    from pyspark.sql import functions as F

    d = (documents(spark, sf_dir)
         .select("lang",
                 F.size(F.filter(F.split(F.lower("text"), TOKEN_SPLIT),
                                 lambda x: x != "")).alias("n_toks")))
    per = d.groupBy("lang").agg(F.count("*").alias("n_docs"),
                                F.sum("n_toks").alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("total_tokens"),
                  F.count("*").alias("n_langs"))
    return (per.crossJoin(F.broadcast(tot))
            .select("lang", "n_docs", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("total_tokens"),
                            4).alias("token_share"),
                    F.least(F.lit(MIX_MAX_UP) * F.col("n_tokens"),
                            F.expr("total_tokens div n_langs"))
                    .cast("long").alias("eff_tokens"))
            .withColumn("mix_weight",
                        F.round(F.col("eff_tokens") / F.col("n_tokens"),
                                4))
            .select("lang", "n_docs", "n_tokens", "token_share",
                    "mix_weight", "eff_tokens")
            .orderBy("lang"))


def dup_passage_catalog(spark, sf_dir):
    """The global duplicated-passage catalog (what you read before
    picking a dedup threshold): every PASSAGE_W-token window occurring
    in >=2 distinct docs, with distinct-doc and total occurrence
    counts, most-widespread first."""
    from pyspark.sql import functions as F

    pas = _passages(spark, sf_dir)
    return (pas.groupBy("passage")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .filter(F.col("n_docs") >= 2)
            .orderBy(F.desc("n_docs"), F.desc("n_occ"), "passage"))
