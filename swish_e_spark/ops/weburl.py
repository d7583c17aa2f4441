"""Web-scale corpus hygiene operators: URL canonicalization, URL-level
dedup, PII scrubbing, the composed per-doc curation decision, and
budgeted shard packing.

The testdata ``documents`` table has no url or PII columns, so the URL
and PII ops *plant* deterministic inputs derived from doc_id (the same
pattern as ``embedding_near_duplicates``'s planted pairs): both the
Spark query and the DuckDB oracle synthesize the identical messy input,
then each runs its OWN canonicalize/scrub pipeline — the driver gate's
value compare therefore verifies the transformation itself, not just
the synthesis.

Everything here is built-in-function only (regexp_extract /
regexp_replace / split / array_sort / windows) — JVM-side,
whole-stage-codegen, zero Python in the hot path — and every regex is
written in the common Java-regex/RE2 subset (no lookaround, no
backrefs, ASCII classes only) so Spark and DuckDB agree byte-for-byte.

Scale notes (100 TB):
- url_canonicalize is a pure scan-side projection — zero shuffles
  beyond the presentation orderBy the driver gate convention adds
  (the gate value-compare sorts rows anyway).
- url_dedup shuffles once on canon_url (high-cardinality, skew-free);
  at 10^12 docs you'd group on xxhash64(canon_url) to shrink shuffle
  width — the string key here keeps the DuckDB oracle exact.
- pii_scrub is scan-side only (regex counts + replaces): zero shuffles
  beyond the presentation orderBy.
- curation_decisions joins per-doc signal tables on doc_id; every side
  is pre-aggregated to one row per doc, so after the first exchange the
  joins are co-partitioned on the same key. The 3-gram subtree is
  evaluated twice (eval-set and train sides of the self-join);
  production materializes it once (persist/checkpoint) — semantics
  identical, pinned by the oracle here.
- pack_shards uses a global ordered prefix-sum window (single-reducer
  by definition). The window form here is the NORMATIVE semantics; at
  10^12 docs production computes the same assignment as a two-phase
  range-partitioned prefix sum — per-partition totals, driver-side
  exclusive scan of the (tiny) offsets vector, broadcast back — which
  must reproduce these shard ids exactly.
"""

from __future__ import annotations

from .corpus import documents
from .pipeline import EVAL_MOD

SHARD_BUDGET = 4096      # chars per output shard (production: ~1 GiB)
MIN_TOKENS = 12          # curation: drop docs shorter than this
REP_MAX = 0.70           # curation: drop docs with dup_word_frac above
CONT_MAX = 0.60          # curation: drop docs with contamination above
BOILER_MOD, BOILER_RES = 23, 13   # planted boilerplate band
BOILER_TEXT = ("subscribe to our newsletter for weekly updates and "
               "follow us on social media channels today")

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


def _messy_url(F):
    """pyspark Column: the deterministic messy URL for one doc.

    Group identity rides on ``sid`` (docs with doc_id % 8 >= 4 share
    sid = doc_id // 4 in blocks of four; the rest are singletons), so
    canonical URLs collapse in mixed group sizes. Messiness rides on
    doc_id parity: even docs get uppercase scheme/host, an explicit
    default port, doubled path slashes, shuffled+tracking query params,
    and a fragment; odd docs get the plain form. One sid band
    (sid % 11 == 3) carries a real non-default port that canonical
    form must KEEP.
    """
    did = F.col("doc_id")
    sid = F.when(did % 8 >= 4, F.floor(did / 4)).otherwise(did)
    scheme = F.when(sid % 3 == 0, F.lit("https")).otherwise(
        F.lit("http"))
    defport = F.when(sid % 3 == 0, F.lit(":443")).otherwise(
        F.lit(":80"))
    host = F.concat(F.lit("www.d"), (sid % 17).cast("string"),
                    F.lit(".example.com"))
    port = F.when(sid % 11 == 3, F.lit(":8080")).otherwise(
        F.when(did % 2 == 0, defport).otherwise(F.lit("")))
    slash = F.when(did % 2 == 0, F.lit("//")).otherwise(F.lit("/"))
    path = F.concat(F.lit("/docs"), slash, F.lit("x"),
                    (sid % 50).cast("string"), F.lit("/"),
                    sid.cast("string"))
    qa = F.concat(F.lit("a="), (sid % 5).cast("string"))
    qb = F.concat(F.lit("b="), (sid % 7).cast("string"))
    query = F.when(
        did % 2 == 0,
        F.concat(F.lit("?"), qb, F.lit("&utm_source=feed&gclid=g"),
                 did.cast("string"), F.lit("&"), qa)
    ).otherwise(F.concat(F.lit("?"), qa, F.lit("&"), qb))
    frag = F.when(did % 2 == 0,
                  F.concat(F.lit("#sec"), did.cast("string"))
                  ).otherwise(F.lit(""))
    sch = F.when(did % 2 == 0, F.upper(scheme)).otherwise(scheme)
    hst = F.when(did % 2 == 0, F.upper(host)).otherwise(host)
    return F.concat(sch, F.lit("://"), hst, port, path, query, frag)


def url_canonicalize(spark, sf_dir):
    """(doc_id, url, canon_url): deterministic messy-URL synthesis +
    canonicalization (crawler-standard subset: lowercase scheme+host,
    strip the scheme's default port, collapse duplicate path slashes,
    drop the fragment, drop utm_*/gclid/fbclid tracking params, sort
    the surviving query params bytewise)."""
    from pyspark.sql import functions as F

    d = (documents(spark, sf_dir).select("doc_id")
         .withColumn("url", _messy_url(F)))
    u = F.col("url")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]*)", 1))
    host = F.when(scheme == F.lit("https"),
                  F.regexp_replace(hostport, r":443$", "")
                  ).when(scheme == F.lit("http"),
                         F.regexp_replace(hostport, r":80$", "")
                         ).otherwise(hostport)
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1),
        r"//+", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, r"\?([^#]*)", 1)
    keep = F.array_join(F.array_sort(F.filter(
        F.split(rawq, "&"),
        lambda x: (~x.startswith("utm_")) & (~x.startswith("gclid="))
        & (~x.startswith("fbclid=")) & (x != ""))), "&")
    canon = F.concat(scheme, F.lit("://"), host, path,
                     F.when(keep == "", F.lit("")).otherwise(
                         F.concat(F.lit("?"), keep)))
    return (d.select("doc_id", "url", canon.alias("canon_url"))
            .orderBy("doc_id"))


def url_dedup(spark, sf_dir):
    """URL-level dedup over the canonicalized corpus: every canonical
    URL claimed by >=2 docs, with the survivor (min doc_id) and all
    claimants as a comma-joined id list (ascending)."""
    from pyspark.sql import functions as F

    c = url_canonicalize(spark, sf_dir)
    ids = F.transform(F.array_sort(F.collect_list("doc_id")),
                      lambda x: x.cast("string"))
    return (c.groupBy("canon_url")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("survivor"),
                 F.array_join(ids, ",").alias("doc_ids"))
            .filter(F.col("n_docs") >= 2)
            .orderBy("canon_url"))


def _planted_text(F):
    """pyspark Column: doc text with deterministic planted PII —
    doc_id % 4 == 0 gets an email, 1 an IPv4, 2 a phone, 3 stays
    clean."""
    did = F.col("doc_id")
    m = did % 4
    planted = (
        F.when(m == 0, F.concat(F.lit(" contact user"),
                                did.cast("string"),
                                F.lit("@example.com now")))
        .when(m == 1, F.concat(F.lit(" server 10."),
                               (did % 200).cast("string"), F.lit("."),
                               ((did * 7) % 250).cast("string"),
                               F.lit("."),
                               (did % 100).cast("string"),
                               F.lit(" up")))
        .when(m == 2, F.concat(F.lit(" call 555-"),
                               F.lpad(((did * 37) % 10000)
                                      .cast("string"), 4, "0")))
        .otherwise(F.lit("")))
    return F.concat(F.col("text"), planted)


def pii_scrub(spark, sf_dir):
    """Per-doc PII census + redaction proof: counts of emails / IPv4s /
    phone numbers found, and md5 of the text after replacing them with
    <EMAIL> / <IP> / <PHONE> (the hash pins the exact redacted bytes
    without shipping them)."""
    from pyspark.sql import functions as F

    d = (documents(spark, sf_dir).select("doc_id", "text")
         .withColumn("full", _planted_text(F)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("full"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return (d.select(
        "doc_id",
        F.regexp_count("full", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("full", F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count("full", F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrub_md5"))
        .orderBy("doc_id"))


BP_DF = 5            # a line in >= BP_DF distinct docs is boilerplate
BP_NAV = "home about contact products navigation menu"
BP_PROMO = "follow us on social media and subscribe for updates"
BP_FOOTER = "copyright example com all rights reserved terms of service"


def _lined_text(F):
    """pyspark Column: the doc text wrapped in deterministic planted
    boilerplate LINES (nav header on even docs, promo band on
    doc_id % 5 < 2, footer on doc_id % 3 == 0) joined by newline —
    the line-structured corpus the strip operates on. The testdata
    text is a single line, so without the plant no line would repeat
    across docs and the strip would never fire."""
    did = F.col("doc_id")
    # straight concatenation (not join-of-nonempty-parts) so the
    # semantics match the SQL oracle verbatim even for a hypothetical
    # empty or newline-bearing text value
    nav = F.when(did % 2 == 0, F.lit(BP_NAV + "\n")).otherwise(
        F.lit(""))
    promo = F.when(did % 5 < 2, F.lit(BP_PROMO + "\n")).otherwise(
        F.lit(""))
    footer = F.when(did % 3 == 0, F.lit("\n" + BP_FOOTER)).otherwise(
        F.lit(""))
    return F.concat(nav, promo, F.col("text"), footer)


def _doc_lines(spark, sf_dir):
    """(doc_id, ln, line): 1-based line table over the planted
    line-structured corpus — a pure scan-side projection."""
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir)
            .select("doc_id",
                    F.posexplode(F.split(_lined_text(F), "\n"))
                    .alias("ln0", "line"))
            .withColumn("ln", F.col("ln0") + 1).drop("ln0"))


def boilerplate_strip(spark, sf_dir):
    """CCNet-style line-hash boilerplate removal (Wenzek et al.
    1911.00359 §3.1 dedup lines across shards; every crawl pipeline's
    nav/footer strip): count each distinct line's document frequency
    corpus-wide, DROP lines appearing in >= BP_DF distinct docs,
    rebuild the cleaned text in line order. Returns per doc
    (n_lines, n_dropped, clean_md5) — the md5 pins the exact cleaned
    bytes without shipping them (same device as pii_scrub).

    Scale shape: one groupBy on the line key for the df table (at
    10^12 docs: on xxhash64(line), and the df table is itself heavy-
    hitter-skewed — the boilerplate lines ARE the hot keys — so the
    join back is a broadcast of the >=threshold line set, not a full
    line-key shuffle of the corpus; the string join here keeps the
    DuckDB oracle exact), then one groupBy(doc_id) to reassemble."""
    from pyspark.sql import functions as F

    lines = _doc_lines(spark, sf_dir)
    dfc = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("ldf"))
    j = lines.join(dfc, "line")
    kept = (F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("ldf") < BP_DF,
                       F.struct("ln", "line")))),
            lambda s: s["line"]),
        "\n"))
    return (j.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.sum(F.when(F.col("ldf") >= BP_DF, 1).otherwise(0))
                 .cast("long").alias("n_dropped"),
                 F.md5(kept).alias("clean_md5"))
            .orderBy("doc_id"))


def boilerplate_catalog(spark, sf_dir):
    """The global boilerplate-line catalog (what you inspect before
    trusting the df threshold): every line in >= BP_DF distinct docs,
    with distinct-doc and occurrence counts, most widespread first."""
    from pyspark.sql import functions as F

    lines = _doc_lines(spark, sf_dir)
    return (lines.groupBy("line")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occ"))
            .filter(F.col("n_docs") >= BP_DF)
            .orderBy(F.desc("n_docs"), F.desc("n_occ"), "line"))


def _curated_docs(spark, sf_dir):
    """(doc_id, ctext): the corpus the curation decision runs over.
    The BOILER band (doc_id % BOILER_MOD == BOILER_RES) is replaced by
    one constant boilerplate string — the testdata corpus has zero
    exact-duplicate texts, so without the plant the exact_dup branch
    would never fire; with it the band collapses to one survivor and
    the rest drop as exact_dup, exactly like real crawl boilerplate."""
    from pyspark.sql import functions as F

    return (documents(spark, sf_dir)
            .select("doc_id",
                    F.when(F.col("doc_id") % BOILER_MOD == BOILER_RES,
                           F.lit(BOILER_TEXT))
                    .otherwise(F.col("text")).alias("ctext")))


def curation_decisions(spark, sf_dir):
    """The composed per-doc keep/drop decision a curation pipeline
    emits before writing the training corpus: each doc is kept unless
    one of the drop rules fires, and the FIRST firing rule (fixed
    priority) is recorded as the reason.

    Priority: exact_dup (not the min-doc_id owner of its md5(ctext)
    group) > eval_split (held out, doc_id % EVAL_MOD == 0) >
    too_short (< MIN_TOKENS tokens) > repetitive (dup_word_frac >
    REP_MAX) > contaminated (eval 3-gram overlap > CONT_MAX) > keep.
    All signals are computed over the planted corpus (_curated_docs)
    so the decision is consistent with what would be written out.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .corpus import TOKEN_SPLIT

    d = _curated_docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("ctext")).orderBy("doc_id")
    exact = d.select("doc_id",
                     (F.row_number().over(w) > 1).alias("is_dup"))
    tk = (d.select("doc_id",
                   F.posexplode(F.split(F.lower("ctext"), TOKEN_SPLIT))
                   .alias("p", "t"))
          .filter(F.col("t") != ""))
    rep = tk.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(1.0 - F.countDistinct("t") / F.count("*"), 4)
        .alias("dup_word_frac"))
    wp = Window.partitionBy("doc_id").orderBy("p")
    g = (tk.withColumn("t1", F.lead("t", 1).over(wp))
         .withColumn("t2", F.lead("t", 2).over(wp))
         .filter(F.col("t2").isNotNull())
         .select("doc_id",
                 F.concat_ws(" ", "t", "t1", "t2").alias("gram"))
         .distinct())
    ev = (g.filter(F.col("doc_id") % EVAL_MOD == 0)
          .select("gram").distinct().withColumn("hit", F.lit(1)))
    cont = (g.filter(F.col("doc_id") % EVAL_MOD != 0)
            .join(ev, "gram", "left")
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.coalesce("hit", F.lit(0)))
                         / F.count("*"), 4).alias("contamination")))
    did = F.col("doc_id")
    reason = (
        F.when(F.col("is_dup"), F.lit("exact_dup"))
        .when(did % EVAL_MOD == 0, F.lit("eval_split"))
        .when(F.coalesce(F.col("n_tokens"), F.lit(0)) < MIN_TOKENS,
              F.lit("too_short"))
        .when(F.coalesce(F.col("dup_word_frac"), F.lit(0.0)) > REP_MAX,
              F.lit("repetitive"))
        .when(F.coalesce(F.col("contamination"), F.lit(0.0)) > CONT_MAX,
              F.lit("contaminated"))
        .otherwise(F.lit("keep")))
    return (exact.join(rep, "doc_id", "left")
            .join(cont, "doc_id", "left")
            .select("doc_id", reason.alias("reason"))
            .withColumn("keep", F.col("reason") == "keep")
            .select("doc_id", "keep", "reason")
            .orderBy("doc_id"))


def pack_shards(spark, sf_dir):
    """Budgeted shard packing: docs in doc_id order are laid head-to-
    tail and each doc lands in the shard its STARTING char offset
    falls in (shard_id = exclusive-prefix-sum(n_chars) // budget) —
    the deterministic assignment step before writing token-budgeted
    training shards. Returns the per-shard manifest."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = documents(spark, sf_dir).select("doc_id", "n_chars")
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    return (d.withColumn("shard_id",
                         F.floor(start / SHARD_BUDGET).cast("long"))
            .groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("n_chars"),
                 F.min("doc_id").alias("doc_lo"),
                 F.max("doc_id").alias("doc_hi"))
            .orderBy("shard_id"))


# ---------------------------------------------------------------- oracles
# DuckDB oracle SQL for the driver gate. Every expression mirrors the
# Spark column math above byte-for-byte; regexes are the shared
# Java-regex/RE2 subset. Strings are built from the SAME module
# constants the Spark ops read, so a threshold change cannot desync
# engine and oracle.

_URL_SYNTH = """
base as (
  select doc_id,
    case when doc_id % 8 >= 4 then doc_id // 4 else doc_id end as sid
  from documents),
messy as (
  select doc_id,
    (case when doc_id % 2 = 0
          then upper(case when sid % 3 = 0 then 'https' else 'http' end)
          else (case when sid % 3 = 0 then 'https' else 'http' end) end)
    || '://'
    || (case when doc_id % 2 = 0
             then upper('www.d' || cast(sid % 17 as varchar)
                        || '.example.com')
             else 'www.d' || cast(sid % 17 as varchar)
                  || '.example.com' end)
    || (case when sid % 11 = 3 then ':8080'
             when doc_id % 2 = 0 then
               (case when sid % 3 = 0 then ':443' else ':80' end)
             else '' end)
    || '/docs' || (case when doc_id % 2 = 0 then '//' else '/' end)
    || 'x' || cast(sid % 50 as varchar) || '/' || cast(sid as varchar)
    || (case when doc_id % 2 = 0
             then '?b=' || cast(sid % 7 as varchar)
                  || '&utm_source=feed&gclid=g'
                  || cast(doc_id as varchar)
                  || '&a=' || cast(sid % 5 as varchar)
             else '?a=' || cast(sid % 5 as varchar)
                  || '&b=' || cast(sid % 7 as varchar) end)
    || (case when doc_id % 2 = 0
             then '#sec' || cast(doc_id as varchar) else '' end)
    as url
  from base)
"""

_URL_CANON = r"""
canon as (
  select doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) as scheme,
    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)) as hostport,
    regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) as rawpath,
    regexp_extract(url, '\?([^#]*)', 1) as rawq
  from messy),
canon2 as (
  select doc_id, url, scheme,
    case when scheme = 'https' then regexp_replace(hostport, ':443$', '')
         when scheme = 'http' then regexp_replace(hostport, ':80$', '')
         else hostport end as host,
    case when regexp_replace(rawpath, '//+', '/', 'g') = '' then '/'
         else regexp_replace(rawpath, '//+', '/', 'g') end as path,
    array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      x -> not (x like 'utm\_%' escape '\' or x like 'gclid=%'
                or x like 'fbclid=%') and x <> '')), '&') as keepq
  from canon),
curl as (
  select doc_id, url,
    scheme || '://' || host || path
    || (case when keepq = '' then '' else '?' || keepq end) as canon_url
  from canon2)
"""


def url_canonicalize_sql() -> str:
    return (f"with {_URL_SYNTH}, {_URL_CANON}\n"
            "select doc_id, url, canon_url from curl order by doc_id")


def url_dedup_sql() -> str:
    return (f"with {_URL_SYNTH}, {_URL_CANON}\n"
            "select canon_url, count(*) as n_docs,\n"
            "       min(doc_id) as survivor,\n"
            "       string_agg(cast(doc_id as varchar), ','\n"
            "                  order by doc_id) as doc_ids\n"
            "from curl group by canon_url having count(*) >= 2\n"
            "order by canon_url")


_PII_SQL = r"""
with pii_t as (
  select doc_id,
    text || (case doc_id % 4
      when 0 then ' contact user' || cast(doc_id as varchar)
                  || '@example.com now'
      when 1 then ' server 10.' || cast(doc_id % 200 as varchar) || '.'
                  || cast((doc_id * 7) % 250 as varchar) || '.'
                  || cast(doc_id % 100 as varchar) || ' up'
      when 2 then ' call 555-'
                  || lpad(cast((doc_id * 37) % 10000 as varchar),
                          4, '0')
      else '' end) as ftext
  from documents)
select doc_id,
  cast(len(regexp_extract_all(ftext,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint)
    as n_emails,
  cast(len(regexp_extract_all(ftext,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) as bigint) as n_ipv4,
  cast(len(regexp_extract_all(ftext, '\b555-\d{4}\b')) as bigint)
    as n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(ftext,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
    '\b555-\d{4}\b', '<PHONE>', 'g')) as scrub_md5
from pii_t order by doc_id"""


def pii_scrub_sql() -> str:
    return _PII_SQL


_CURATION_BODY = """
cdocs as (select doc_id,
                 case when doc_id % {BOILER_MOD} = {BOILER_RES}
                      then '{BOILER_TEXT}' else text end as ctext
          from documents),
ctoks as (
  select doc_id,
         unnest(regexp_split_to_array(lower(ctext), '[^a-z0-9]+')) as t,
         unnest(range(1, len(regexp_split_to_array(lower(ctext),
                '[^a-z0-9]+')) + 1)) as p
  from cdocs),
tk as (select doc_id, t, p from ctoks where t <> ''),
rep as (select doc_id, count(*) as n_tokens,
               cast(round(1.0 - count(distinct t) * 1.0 / count(*), 4)
                    as double) as dup_word_frac
        from tk group by doc_id),
gsrc as (select doc_id, t,
                lead(t, 1) over (partition by doc_id order by p) as t1,
                lead(t, 2) over (partition by doc_id order by p) as t2
         from tk),
g as (select distinct doc_id, t || ' ' || t1 || ' ' || t2 as gram
      from gsrc where t2 is not null),
ev as (select distinct gram, 1 as hit from g
       where doc_id % {EVAL_MOD} = 0),
cont as (select doc_id,
                cast(round(sum(coalesce(hit, 0)) * 1.0 / count(*), 4)
                     as double) as contamination
         from g left join ev using (gram)
         where doc_id % {EVAL_MOD} <> 0 group by doc_id),
exact as (select doc_id,
                 row_number() over (partition by md5(ctext)
                                    order by doc_id) > 1 as is_dup
          from cdocs),
dec as (
  select e.doc_id,
    case when e.is_dup then 'exact_dup'
         when e.doc_id % {EVAL_MOD} = 0 then 'eval_split'
         when coalesce(r.n_tokens, 0) < {MIN_TOKENS} then 'too_short'
         when coalesce(r.dup_word_frac, 0.0) > {REP_MAX}
           then 'repetitive'
         when coalesce(c.contamination, 0.0) > {CONT_MAX}
           then 'contaminated'
         else 'keep' end as reason
  from exact e left join rep r using (doc_id)
       left join cont c using (doc_id))
select doc_id, reason = 'keep' as keep, reason
from dec order by doc_id"""


def curation_decisions_sql() -> str:
    return "with " + _CURATION_BODY.format(
        EVAL_MOD=EVAL_MOD, MIN_TOKENS=MIN_TOKENS, REP_MAX=REP_MAX,
        CONT_MAX=CONT_MAX, BOILER_MOD=BOILER_MOD,
        BOILER_RES=BOILER_RES, BOILER_TEXT=BOILER_TEXT)


_LINES_CTE = """
lt as (select doc_id,
  (case when doc_id % 2 = 0 then '{BP_NAV}' || chr(10) else '' end)
  || (case when doc_id % 5 < 2 then '{BP_PROMO}' || chr(10)
           else '' end)
  || text
  || (case when doc_id % 3 = 0 then chr(10) || '{BP_FOOTER}'
           else '' end) as ltext
  from documents),
lines as (select doc_id,
         unnest(string_split(ltext, chr(10))) as line,
         unnest(range(1, len(string_split(ltext, chr(10))) + 1)) as ln
  from lt)"""


def _lines_cte() -> str:
    return _LINES_CTE.format(BP_NAV=BP_NAV, BP_PROMO=BP_PROMO,
                             BP_FOOTER=BP_FOOTER)


def boilerplate_strip_sql() -> str:
    return f"""
with {_lines_cte()},
dfc as (select line, count(distinct doc_id) as ldf
        from lines group by line)
select doc_id, cast(count(*) as bigint) as n_lines,
  cast(sum(case when ldf >= {BP_DF} then 1 else 0 end) as bigint)
    as n_dropped,
  md5(coalesce(string_agg(case when ldf < {BP_DF} then line end,
                          chr(10) order by ln), '')) as clean_md5
from lines join dfc using (line)
group by doc_id order by doc_id"""


def boilerplate_catalog_sql() -> str:
    return f"""
with {_lines_cte()}
select line, count(distinct doc_id) as n_docs,
       cast(count(*) as bigint) as n_occ
from lines group by line
having count(distinct doc_id) >= {BP_DF}
order by n_docs desc, n_occ desc, line"""


def pack_shards_sql() -> str:
    return """
select shard_id, count(*) as n_docs,
       cast(sum(n_chars) as bigint) as n_chars,
       min(doc_id) as doc_lo, max(doc_id) as doc_hi
from (select doc_id, n_chars,
        coalesce(sum(n_chars) over (order by doc_id
          rows between unbounded preceding and 1 preceding), 0)
        // {SHARD_BUDGET} as shard_id
      from documents)
group by shard_id order by shard_id""".format(SHARD_BUDGET=SHARD_BUDGET)
