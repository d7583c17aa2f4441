"""Result surface — sorting, pagination, property columns, and output
formatting (SURVEY.md §2.8).

Reference surface:
- ``-s p1 asc p2 desc`` multi-key property sort with rank special-cased
  (init_sort_propIDs /root/reference/src/search.c:487-587,
  compare_results_single_index /root/reference/src/result_sort.c:67-133),
- ``-b``/``-m`` begin offset + max hits
  (/root/reference/src/swish.c:1150-1166),
- ``-p`` extra property columns, ``-d`` delimiter
  (/root/reference/src/swish.c:1197-1220),
- ``-x`` extended format: %r rank, %p path, %t title, %l size, %d
  description, %c reccount, plus ``<propname>`` property interpolation
  and ``\\n``/``\\t`` escapes (printTagAbbrevControl
  /root/reference/src/result_output.c:505-563, parsePropertyResultControl
  576-646),
- ``-k c`` keyword dump (OutputKeyChar
  /root/reference/src/keychar_out.c:63),
- ``-T``/``-H`` header introspection (/root/reference/src/dump.c,
  header_map /root/reference/src/headers.c:65-91).

Spark mapping: ranked results join the docs table for properties
(broadcast — a top-k result is tiny against the docs dim), property
sort is a native orderBy, and pagination is offset slicing of the
collected top page. A missing property sorts BEFORE present ones
(/root/reference/src/docprop.c:1139-1147) — Spark's default
``asc_nulls_first`` matches.
"""

from __future__ import annotations

import re

PROP_COLS = ["url", "title", "size", "warc_ts", "description", "lang",
             "doc_len"]

# %x abbreviations (/root/reference/src/result_output.c:505-563)
_TAG_MAP = {
    "r": "rank", "p": "url", "t": "title", "l": "size",
    "d": "description", "c": "reccount", "I": "doc_id", "%": "%",
}


def ranked_results(engine, q: str, k: int = 10, props=None,
                   sort=None, begin: int = 0, structure_mask=None,
                   limits=None):
    """Top results with property columns.

    ``sort`` = [(prop, 'asc'|'desc'), ...]; 'swishrank' means the BM25
    score (rank sort special-case, /root/reference/src/search.c:487-587)
    and 'swishdocpath' the url. ``begin`` is the -b offset (0-based).
    Returns a list of dicts.
    """
    from pyspark.sql import functions as F

    props = list(props) if props else ["url", "title"]
    sort = list(sort) if sort else [("swishrank", "desc")]
    rank_only = all(p == "swishrank" for p, _ in sort)

    if rank_only:
        # fast path: top-(begin+k) by score, then slice
        result = engine.search_df(q, begin + k, structure_mask, limits)
    else:
        result = engine.match_df(q, structure_mask, limits)

    docs = engine.handle.docs()
    user = user_props(engine.handle.cfg)  # name/alias -> (col, spec)
    needed = sorted({_prop_col(p) for p in props
                     if _prop_col(p) in set(PROP_COLS)}
                    | {user[p][0] for p in props if p in user}
                    | {_prop_col(p) for p, _ in sort
                       if _prop_col(p) in set(PROP_COLS)}
                    | {user[p][0] for p, _ in sort if p in user})
    joined = result.join(
        F.broadcast(docs.select("doc_id", *needed)) if needed
        else docs.select("doc_id"), "doc_id", "left")

    order = []
    for prop, direction in sort:
        if prop == "swishrank":
            col = F.col("score")
        elif prop in user:
            # IgnoreCase/CompareCase/SortKeyLength sort semantics
            # (Compare_Properties, docprop.c:1139-1200)
            from ..textproc.docprops import sort_col

            pcol, spec = user[prop]
            col = sort_col(spec, F.col(pcol))
        else:
            col = F.col(_prop_col(prop))
        order.append(col.desc() if direction.lower().startswith("d")
                     else col.asc())
    order.append(F.col("doc_id").asc())  # total order under ties
    rows = joined.orderBy(*order).limit(begin + k).collect()[begin:]

    import os as _os

    dbfile = _os.path.basename(
        _os.path.normpath(engine.handle.out_dir))
    out = []
    for i, r in enumerate(rows):
        d = {"doc_id": r["doc_id"], "rank": r["score"],
             "reccount": begin + i + 1,
             # swishfilenum = 1-based internal file number; swishdbfile
             # = the index name (result_output.c auto-properties)
             "filenum": int(r["doc_id"]) + 1, "dbfile": dbfile}
        for p in props:
            if p in user:
                from ..textproc.docprops import display

                pcol, spec = user[p]
                v = r[pcol] if pcol in r.__fields__ else None
                # dates render as the reference display string; other
                # kinds stay raw (numeric stays sortable/formattable)
                d[p] = (display(spec, v) if spec.kind == "date"
                        else v) if v is not None else None
            else:
                c = _prop_col(p)
                d[p] = r[c] if c in r.__fields__ else d.get(c)
        out.append(d)
    return out


def user_props(cfg) -> dict:
    """User-property resolution map for the result surface:
    {name_or_alias: (docs_column, PropSpec)} from the index config
    (PropertyNames + PropertyNameAlias)."""
    from ..textproc.docprops import specs_of

    if cfg is None:
        return {}
    specs = specs_of(getattr(cfg, "properties", ()))
    out = {name: (s.column, s) for name, s in specs.items()}
    for alias, base in getattr(cfg, "prop_aliases", ()) or ():
        if base in specs:
            s = specs[base]
            out[alias] = (s.column, s)
    return out


def _prop_col(prop: str) -> str:
    return {"swishdocpath": "url", "swishtitle": "title",
            "swishdocsize": "size", "swishlastmodified": "warc_ts",
            "swishdescription": "description",
            "swishreccount": "reccount",
            "swishfilenum": "filenum",  # 1-based internal file number
            "swishdbfile": "dbfile"}.get(prop, prop)


_FMT_RE = re.compile(r"%(.)|<([A-Za-z_][\w]*)(?:\s+fmt=/([^/]*)/)?>")


def format_results(rows: list[dict], fmt: str = '%r %p "%t" %l',
                   delimiter: str | None = None) -> list[str]:
    """Render result dicts with a swish-e -x/-d format string
    (printPropertyResultControl,
    /root/reference/src/result_output.c:659-777)."""
    fmt = fmt.replace("\\n", "\n").replace("\\t", "\t")
    if delimiter is not None:
        # -d replaces the separators BETWEEN output fields, never
        # spaces inside property values or inside <prop fmt=/.../>
        # controls (whose tag syntax REQUIRES whitespace): substitute
        # only outside <...> spans of the template
        parts = re.split(r"(<[^>]*>)", fmt)
        fmt = "".join(p if p.startswith("<")
                      else p.replace(" ", delimiter) for p in parts)
    out = []
    for row in rows:
        def sub(m):
            tag, prop, pfmt = m.group(1), m.group(2), m.group(3)
            if tag is not None:
                if tag == "%":
                    return "%"
                key = _TAG_MAP.get(tag)
                return _fmt_val(row.get(key) if key else None, None)
            return _fmt_val(row.get(_prop_col(prop), row.get(prop)),
                            pfmt)

        out.append(_FMT_RE.sub(sub, fmt))
    return out


def _fmt_val(v, pfmt) -> str:
    if v is None:
        return ""
    if pfmt:
        try:
            if "%" in pfmt and hasattr(v, "strftime"):
                return v.strftime(pfmt)
            return pfmt % v
        except (TypeError, ValueError):
            return str(v)
    if isinstance(v, float):
        return f"{v:.6g}"
    if hasattr(v, "strftime"):
        # default date rendering matches the binary: '%Y-%m-%d
        # %H:%M:%S UTC' (getResultPropValue date branch,
        # /root/reference/src/result_output.c:1074-1086)
        return v.strftime("%Y-%m-%d %H:%M:%S UTC")
    return str(v)


def keywords(handle, startswith: str = "", field=None, limit: int = 1000):
    """Sorted word list, optionally restricted to a prefix/field — the
    -k keyword dump (OutputKeyChar,
    /root/reference/src/keychar_out.c:63). Reads only the tiny terms
    summary table."""
    from pyspark.sql import functions as F

    tdf = handle.terms()
    if field is not None:
        tdf = tdf.filter(F.col("field") == field)
    if startswith:
        tdf = tdf.filter(F.col("term").startswith(startswith))
    rows = (tdf.groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .orderBy("term").limit(limit).collect())
    return [(r["term"], r["df"], r["cf"]) for r in rows]


def search_info(engine, q: str, k: int = 10, **kw) -> dict:
    """Search plus the reference's result headers (-H): search words,
    parsed words, removed stopwords, hits, and run time
    (display_result_headers, /root/reference/src/swish.c:1769-1800;
    resultHeaderOut usage /root/reference/src/swish.c:1595-1609)."""
    import time

    from .parser import parse_query_info

    _node, pinfo = parse_query_info(q, engine.cfg)
    t0 = time.time()
    results = engine.search(q, k=k, **kw)
    # the reference's "Number of hits" header is the TOTAL match
    # count, not the page size (display_result_headers,
    # /root/reference/src/swish.c:1769-1800) — only pay the count job
    # when the page came back full (otherwise len(results) IS it)
    n_hits = len(results)
    if n_hits == k:
        n_hits = int(engine.match_df(q, **kw).count())
    elapsed = time.time() - t0
    return {
        **pinfo,
        "number_of_hits": n_hits,
        "run_time_s": round(elapsed, 3),
        "results": results,
    }


def info(handle) -> dict:
    """Index header introspection — the -T/-H surface
    (/root/reference/src/dump.c; header_map
    /root/reference/src/headers.c:65-91)."""
    meta = handle.meta
    stats = handle.stats
    removed = handle.removed()
    return {
        "name": handle.out_dir,
        "doc_count": meta.get("doc_count"),
        "live_doc_count": stats["n_docs"],
        "removed_count": int(removed.count()) if removed is not None
        else 0,
        "token_count": meta.get("token_count"),
        "posting_count": meta.get("posting_count"),
        "avgdl": stats["avgdl"],
        "n_shards": meta.get("n_shards"),
        "shard_bases": meta.get("shard_bases", {}),
        "config": meta.get("config", {}),
        "merged_from": meta.get("merged_from"),
    }
