"""Deduplication operators for large-scale training-data pipelines:
exact, n-gram Jaccard, MinHash + LSH banding, SimHash.

Beyond the reference's scope (swish-e dedupes only by path at merge,
/root/reference/src/merge.c:77-400); these are the training-data ops the
task brief requires as first-class components.

Design notes for 100 TB scale:
- exact dedup: hash-groupBy — one shuffle on a 16-byte key.
- n-gram Jaccard: shingle explode → self-join on shingle → pair counts.
  The shingle join is the candidate generator; at scale you run it only
  within LSH buckets (below) instead of all-pairs.
- MinHash: md5-based hash family (stable across engines → DuckDB oracle
  can verify signatures EXACTLY, no recall heuristics in the gate);
  production swaps in xxhash64 for speed without changing shape.
- LSH: signatures banded; pairs sharing a band bucket are candidates,
  then exact-Jaccard verified. Banding is a groupBy, not an all-pairs
  join — the scale path.
"""

from __future__ import annotations

from .corpus import documents, tokens

N_HASHES = 8
N_BANDS = 4  # rows per band = N_HASHES / N_BANDS = 2


def dedup_exact(spark, sf_dir):
    """Exact-duplicate groups by md5(text)."""
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir)
            .select("doc_id", F.md5(F.col("text")).alias("h"))
            .groupBy("h").agg(F.count("*").alias("n"),
                              F.min("doc_id").alias("first_doc"))
            .orderBy("h").limit(200))


def _shingles(spark, sf_dir, n=3):
    """Distinct word-n-gram shingles per doc (positions from the shared
    SQL-expressible tokenizer)."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir)
    a, b, c = tk.alias("a"), tk.alias("b"), tk.alias("c")
    sh = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                 & (F.col("b.p") == F.col("a.p") + 1))
          .join(c, (F.col("a.doc_id") == F.col("c.doc_id"))
                & (F.col("c.p") == F.col("a.p") + 2))
          .select(F.col("a.doc_id").alias("doc_id"),
                  F.concat_ws(" ", "a.t", "b.t", "c.t").alias("sh")))
    return sh.distinct()


def ngram_jaccard_pairs(spark, sf_dir, threshold=0.8):
    """All-pairs word-3-gram Jaccard ≥ threshold (exact; the verify step
    of every near-dup pipeline)."""
    from pyspark.sql import functions as F

    sh = _shingles(spark, sf_dir).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    shared = (x.join(y, (F.col("x.sh") == F.col("y.sh"))
                     & (F.col("x.doc_id") < F.col("y.doc_id")))
              .groupBy(F.col("x.doc_id").alias("a"),
                       F.col("y.doc_id").alias("b"))
              .agg(F.count("*").alias("shared")))
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    out = (shared.join(na, "a").join(nb, "b")
           .withColumn("jac", F.round(
               F.col("shared")
               / (F.col("na") + F.col("nb") - F.col("shared")), 4))
           .filter(F.col("jac") >= threshold)
           .select("a", "b", "jac").orderBy("a", "b"))
    return out


def minhash_signatures(spark, sf_dir, n_hashes=N_HASHES):
    """Per-doc MinHash signature rows (doc_id, i, sig): sig = min over
    the doc's distinct tokens of md5(i || ':' || token). md5 keys make
    the signature engine-portable (DuckDB-verifiable)."""
    from pyspark.sql import functions as F

    tk = tokens(spark, sf_dir).select("doc_id", "t").distinct()
    hashes = spark.range(n_hashes).select(
        F.col("id").cast("int").alias("i"))
    return (tk.crossJoin(hashes)
            .select("doc_id", "i",
                    F.md5(F.concat(F.col("i").cast("string"),
                                   F.lit(":"), F.col("t"))).alias("h"))
            .groupBy("doc_id", "i").agg(F.min("h").alias("sig"))
            .orderBy("doc_id", "i"))


def lsh_candidate_pairs(spark, sf_dir, n_hashes=N_HASHES,
                        n_bands=N_BANDS):
    """MinHash-LSH banding: docs sharing any full band signature are
    candidate pairs (shingle→minhash→band→bucket-join). Deterministic,
    so the DuckDB oracle reproduces it exactly."""
    from pyspark.sql import functions as F

    rows = n_hashes // n_bands
    assert rows == 2, "band signature built for 2 rows per band"
    sig = minhash_signatures(spark, sf_dir, n_hashes)
    # ordered band signature via per-row conditional mins (collect_list
    # order would be nondeterministic)
    banded = (sig.withColumn("band",
                              F.floor(F.col("i") / rows).cast("int"))
              .groupBy("doc_id", "band")
              .agg(F.min(F.when(F.col("i") % rows == 0, F.col("sig")))
                   .alias("s0"),
                   F.min(F.when(F.col("i") % rows == 1, F.col("sig")))
                   .alias("s1"))
              .withColumn("bsig", F.concat_ws("|", "s0", "s1")))
    x = banded.alias("x")
    y = banded.alias("y")
    return (x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.bsig") == F.col("y.bsig"))
                   & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b"))
            .distinct().orderBy("a", "b"))


def simhash64(spark, sf_dir):
    """64-bit SimHash per doc from tf-weighted token hash bits
    (xxhash64-based; engine-internal, verified in pytest against a
    pure-Python reference — no SQL oracle)."""
    from pyspark.sql import functions as F

    tk = (tokens(spark, sf_dir).groupBy("doc_id", "t")
          .agg(F.count("*").alias("tf"))
          .withColumn("h", F.xxhash64("t")))
    bits = []
    for j in range(64):
        bit = F.when(F.col("h").bitwiseAND(F.lit(1 << j)
                                           if j < 63 else
                                           F.lit(-(1 << 63))) != 0,
                     F.col("tf")).otherwise(-F.col("tf"))
        bits.append(F.sum(bit).alias(f"b{j}"))
    agg = tk.groupBy("doc_id").agg(*bits)
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim + F.when(F.col(f"b{j}") > 0,
                           F.lit(1 << j) if j < 63
                           else F.lit(-(1 << 63))).otherwise(0)
    return (agg.select("doc_id", sim.alias("simhash"))
            .orderBy("doc_id"))
