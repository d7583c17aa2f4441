"""Filesystem walk source — the -S fs analogue (SURVEY.md §2.1).

The reference recursively walks directories applying IndexOnly suffix
filters and FileRules/FileMatch accept/reject regexes per file and per
directory (/root/reference/src/fs.c:139-500). Spark-first shape:
``spark.read.format("binaryFile")`` with ``recursiveFileLookup`` does
the walk (the file LISTING is scan metadata, so path predicates prune
files before their bytes are read), and the rule set becomes a
declarative filter column:

- IndexOnly suffixes and pathname/filename/dirname FileRules/FileMatch
  compile to ``rlike`` predicates evaluated JVM-side against the path
  (note: user 'regex' rules therefore run under Java regex semantics —
  identical for the overwhelmingly common literal/anchor/class forms).
- ``dircontains`` (FileRules directory) needs the sibling listing, so
  matching marker files are found first and their directories pruned
  as path prefixes — the subtree-skip the reference does during the
  walk (fs.c:328-340). Markers are found with the Hadoop FileSystem
  listing API (a driver-side metadata pass, the same cost class as
  Spark's own InMemoryFileIndex) because the binaryFile source never
  surfaces hidden (leading ``.``/``_``) or zero-length files — and
  marker files like ``.noindex`` are typically both.
- FileRules ``title`` can only be evaluated after parsing; it ships in
  ``IndexConfig.title_reject_rules`` and is applied inside the extract
  kernel (index/builder.py), exactly where the reference evaluates it
  (fs.c title check after parse_file).

ReplaceRules rewrite the file path into the stored document URL
(config.replace_url), and IndexContents/DefaultContents resolve the
per-file doctype column that the builder honors.
"""

from __future__ import annotations

import re


def _path_parts():
    from pyspark.sql import functions as F

    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    dirn = F.expr("substring(path, 1, length(path) - "
                  "length(element_at(split(path, '/'), -1)) - 1)")
    return fname, dirn


def _rule_predicate(rules, fname, dirn):
    """[(kind, regex)] → one OR-ed boolean Column (None if empty)."""
    from pyspark.sql import functions as F

    pred = None
    for kind, rx in rules:
        if kind == "pathname":
            p = F.col("path").rlike(rx)
        elif kind == "filename":
            p = fname.rlike(rx)
        elif kind == "dirname":
            p = dirn.rlike(rx)
        else:
            continue  # dircontains/title handled elsewhere
        pred = p if pred is None else (pred | p)
    return pred


def _marker_dirs(spark, dirs, patterns) -> set:
    """Directories containing a file whose NAME matches any pattern —
    via the Hadoop FileSystem recursive listing (sees hidden and
    zero-length files, works on any Hadoop-supported FS)."""
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    rxs = [re.compile(rx) for rx in patterns]
    out: set = set()
    for d in ([dirs] if isinstance(dirs, str) else dirs):
        path = jvm.org.apache.hadoop.fs.Path(d)
        fs = path.getFileSystem(hconf)
        it = fs.listFiles(path, True)
        while it.hasNext():
            p = it.next().getPath()
            if any(rx.search(p.getName()) for rx in rxs):
                out.add(p.getParent().toString())
    return out


def fs_pages_df(spark, dirs, conf=None, ts: str = "1970-01-01"):
    """Walk ``dirs`` and return a builder-ready pages DataFrame
    (url, warc_ts, html, text, lang [, doctype, no_contents]).

    ``conf`` is a :class:`swish_e_spark.config.SwishConfig` (or None
    for a bare walk). warc_ts is the file modification time. ``ts``
    is only the fallback for missing mtimes.
    """
    from pyspark.sql import functions as F

    from ..config import SwishConfig, doctype_rules_fn, replace_url
    from ..shipping import ship_package

    ship_package(spark)
    conf = conf or SwishConfig()
    raw = (spark.read.format("binaryFile")
           .option("recursiveFileLookup", "true")
           .load(list(dirs) if not isinstance(dirs, str) else dirs))

    fname, dirn = _path_parts()

    # IndexOnly suffix allowlist (fs.c suffix compare is
    # case-insensitive)
    if conf.index_only:
        suffix_ok = None
        for sfx in conf.index_only:
            p = F.lower(fname).endswith(sfx.lower())
            suffix_ok = p if suffix_ok is None else (suffix_ok | p)
    else:
        suffix_ok = F.lit(True)

    # FileMatch = force-include; FileRules = exclude (fs.c:353-420)
    m = _rule_predicate(conf.file_matches, fname, dirn)
    keep = suffix_ok if m is None else (suffix_ok | m)
    r = _rule_predicate(conf.file_rules, fname, dirn)
    if r is not None:
        keep = keep & ~r
    files = raw.filter(keep)

    # dircontains: directories holding a matching marker file are
    # pruned as whole subtrees. Marker dirs come from a Hadoop FS
    # listing (driver-side metadata, bounded by file count like any
    # listing) because binaryFile hides dot-files and empty files —
    # the usual shape of a marker.
    dc = [rx for kind, rx in conf.file_rules if kind == "dircontains"]
    if dc:
        for d in _marker_dirs(spark, dirs, dc):
            files = files.filter(~F.col("path").startswith(d + "/")
                                 & (dirn != d))

    resolve_doctype = doctype_rules_fn(conf)
    rules = tuple(conf.replace_rules)
    no_contents_pats = [re.compile(
        "(" + "|".join(re.escape(p).replace(r"\*", ".*")
                       for p in conf.no_contents) + ")$",
        re.IGNORECASE)] if conf.no_contents else []

    @F.pandas_udf("string")
    def _url_of(path):
        import pandas as pd

        return pd.Series([
            replace_url(p[len("file:"):] if p.startswith("file:")
                        else p, rules) for p in path])

    @F.pandas_udf("string")
    def _doctype_of(url):
        import pandas as pd

        return pd.Series([resolve_doctype(u) for u in url])

    @F.pandas_udf("boolean")
    def _nc_of(url):
        import pandas as pd

        return pd.Series([any(rx.search(u) for rx in no_contents_pats)
                          for u in url])

    out = (files
           .withColumn("url", _url_of(F.col("path")))
           .select(
               "url",
               F.coalesce(F.col("modificationTime"),
                          F.lit(ts).cast("timestamp")).alias("warc_ts"),
               F.col("content").alias("html"),
               F.lit("").alias("text"),
               F.lit("").alias("lang"),
               _doctype_of(F.col("url")).alias("doctype"),
               (_nc_of(F.col("url")) if no_contents_pats
                else F.lit(False)).alias("no_contents")))
    return out
