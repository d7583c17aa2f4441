"""swish-e command-line front-end (SURVEY.md §2.8).

Maps the reference binary's flag surface (usage()/get_command_line_
params, /root/reference/src/swish.c:266-1290) onto the Spark library:

    swish-e-spark -c swish.conf -i docs/ -f /idx         # index (-S fs)
    swish-e-spark -w 'pigs AND wolf' -f /idx -m 10       # search
    swish-e-spark -w wolf -f /idx -x '%r|%p\n' -R 1      # scheme 1
    swish-e-spark -k w -f /idx                           # keyword dump
    swish-e-spark -M /idx1 /idx2 /merged                 # merge
    swish-e-spark -u -S prog -i dump.bin -f /idx         # incremental
    swish-e-spark -w wolf -f /idx --as-of 3              # time travel
    swish-e-spark --snapshots -f /idx                    # list versions
    swish-e-spark --expire 2 -f /idx                     # snapshot GC

Parsing is hand-rolled like the reference's next_param loop (a flag
consumes values until the next ``-`` token) because ``-s prop asc
prop2 desc`` and ``-L prop lo hi`` are variadic/grouped in ways
argparse can't express. Exit codes: 0 ok, 1 usage/config error,
2 no such index.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field

VERSION = "swish-e-spark 4.0 (reference-compatible CLI)"


# -E error routing (set_error_handle, /root/reference/src/swish.c:
# 800-820): None → stderr; set per main() invocation, reset on entry
_error_out = None


class CliError(SystemExit):
    def __init__(self, msg: str, code: int = 1):
        sink = _error_out or sys.stderr
        print(f"err: {msg}", file=sink)
        sink.flush()  # -E sinks must be readable before process exit
        super().__init__(code)


@dataclass
class Params:
    """Accumulated flag state (SWISH_PARAMS analogue,
    /root/reference/src/swish.c:555-640)."""

    query: str | None = None          # -w
    index_files: list = field(default_factory=list)   # -f
    config_files: list = field(default_factory=list)  # -c
    index_dirs: list = field(default_factory=list)    # -i
    source: str = "fs"                # -S fs|prog|http
    max_hits: int = -1                # -m  (-1 = all)
    begin: int = 0                    # -b (1-based like the reference)
    structure: str | None = None      # -t HBthec letters
    sort: list = field(default_factory=list)   # -s (prop, dir) pairs
    props: list = field(default_factory=list)  # -p
    fmt: str | None = None            # -x
    delimiter: str | None = None      # -d
    limits: list = field(default_factory=list)  # -L (prop, lo, hi)
    rank_scheme: int = 0              # -R (0|1; 2 = BM25 extension)
    header_level: int = 1             # -H
    keyword_char: str | None = None   # -k
    merge: list = field(default_factory=list)   # -M srcs + out
    newer_than: str | None = None     # -N compare-file path
    update_mode: str | None = None    # -u update / -r remove
    verbose: int = 0                  # -v
    economy: bool = False             # -e (no-op: staged parquet)
    raw_rank: bool = False            # -a unscaled swishrank values
    phrase_delim: str = '"'           # -P phrase delimiter char
    debug_opts: list = field(default_factory=list)  # -T dumps
    version: bool = False             # -V
    # snapshot extensions (no reference analogue — the lakehouse side
    # of the index; see index/builder.py commit_manifest)
    as_of: int | None = None          # --as-of N (search a snapshot)
    show_snapshots: bool = False      # --snapshots (list versions)
    expire_keep: int | None = None    # --expire N (GC, keep newest N)


def _parse_argv(argv: list[str]) -> Params:
    p = Params()
    i = 0

    def vals(flag: str, at_least: int = 1) -> list[str]:
        nonlocal i
        out = []
        while i < len(argv) and not (argv[i].startswith("-")
                                     and len(argv[i]) > 1
                                     and not argv[i][1].isdigit()):
            out.append(argv[i])
            i += 1
        if len(out) < at_least:
            raise CliError(f"'-{flag}' requires "
                           f"{at_least} parameter(s)")
        return out

    while i < len(argv):
        a = argv[i]
        if not a.startswith("-") or len(a) < 2:
            raise CliError(f"unexpected argument {a!r}")
        flag = a[1:]
        i += 1
        if flag == "w":
            p.query = " ".join(vals("w"))
        elif flag == "f":
            p.index_files.extend(vals("f"))
        elif flag == "c":
            p.config_files.extend(vals("c"))
        elif flag == "i":
            p.index_dirs.extend(vals("i"))
        elif flag == "S":
            p.source = vals("S", 1)[0]
            if p.source not in ("fs", "prog", "http"):
                raise CliError(f"-S: unknown source {p.source!r}")
        elif flag == "m":
            v = vals("m", 1)[0]
            p.max_hits = -1 if v == "all" else int(v)
        elif flag == "b":
            p.begin = int(vals("b", 1)[0])
        elif flag == "t":
            p.structure = vals("t", 1)[0]
        elif flag == "s":
            words = vals("s")
            j = 0
            while j < len(words):
                prop = words[j]
                direction = "asc"
                if j + 1 < len(words) and words[j + 1].lower() in (
                        "asc", "desc"):
                    direction = words[j + 1].lower()
                    j += 1
                p.sort.append((prop, direction))
                j += 1
        elif flag == "p":
            p.props.extend(vals("p"))
        elif flag == "x":
            p.fmt = vals("x", 1)[0]
        elif flag == "d":
            p.delimiter = vals("d", 1)[0]
        elif flag == "L":
            w = vals("L", 3)
            if len(w) % 3:
                raise CliError("-L requires three parameters "
                               "<propname> <lorange> <highrange>")
            for j in range(0, len(w), 3):
                p.limits.append((w[j], w[j + 1], w[j + 2]))
        elif flag == "R":
            p.rank_scheme = int(vals("R", 1)[0])
            if p.rank_scheme not in (0, 1, 2):
                raise CliError("-R: rank scheme must be 0, 1 or "
                               "2 (BM25 extension)")
        elif flag == "H":
            p.header_level = int(vals("H", 1)[0])
        elif flag == "k":
            p.keyword_char = vals("k", 1)[0]
        elif flag == "M":
            p.merge = vals("M", 2)
        elif flag == "N":
            p.newer_than = vals("N", 1)[0]
        elif flag == "u":
            p.update_mode = "update"
        elif flag == "r":
            p.update_mode = "remove"
        elif flag == "v":
            w = vals("v", 0)
            p.verbose = int(w[0]) if w else 1
        elif flag == "e":
            p.economy = True  # staged parquet IS economy mode
        elif flag == "-as-of":
            p.as_of = int(vals("-as-of", 1)[0])
        elif flag == "-snapshots":
            p.show_snapshots = True
        elif flag == "-expire":
            p.expire_keep = int(vals("-expire", 1)[0])
        elif flag == "P":
            # -P: phrase delimiter char (swish.c:666-672; first char
            # of the param is used)
            w = vals("P", 1)[0]
            if not w:
                raise CliError("-P requires a delimiter character")
            p.phrase_delim = w[0]
        elif flag == "T":
            # -T index introspection dumps (dump.c; -T help lists)
            p.debug_opts.extend(w.lower() for w in vals("T", 1))
        elif flag == "a":
            # return unscaled swishrank values (SwishReturnRawRank,
            # /root/reference/src/swish.c:1278, docprop.c:371)
            vals("a", 0)
            p.raw_rank = True
        elif flag == "E":
            # route error output: -E file appends, bare -E → stderr
            # (/root/reference/src/swish.c:800-820)
            global _error_out
            w = vals("E", 0)
            if w:
                try:
                    _error_out = open(w[0], "a")
                except OSError as e:
                    raise CliError("Failed to open Error file "
                                   f"{w[0]!r} for appending: {e}") \
                        from None
            else:
                _error_out = None
        elif flag in ("l", "o", "W", "D"):
            vals(flag, 0)  # accepted for compat; no-op here
        elif flag == "V":
            p.version = True
        elif flag in ("h", "?"):
            print(__doc__)
            raise SystemExit(0)
        else:
            raise CliError(f"unknown switch -{flag}")
    return p


def _get_spark(spark=None):
    if spark is not None:
        return spark
    from pyspark.sql import SparkSession

    return (SparkSession.builder
            .master(os.environ.get("SPARK_MASTER", "local[*]"))
            .config("spark.sql.shuffle.partitions",
                    os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
            .appName("swish-e-spark").getOrCreate())


def _typed_limit(prop: str, lo: str, hi: str):
    """-L values arrive as strings; numeric/date doc columns need
    typed bounds (setlimit_params string/number/date dispatch,
    /root/reference/src/proplimit.c)."""
    numeric = {"size", "doc_len", "n_chars", "doc_id"}
    if prop in numeric:
        try:
            return (prop, (float(lo) if "." in lo else int(lo),
                           float(hi) if "." in hi else int(hi)))
        except ValueError as e:
            raise CliError(f"-L {prop}: {e}") from None
    return (prop, (lo, hi))


def _structure_mask(letters: str) -> int:
    from .textproc.extractor import STRUCTURE_LETTERS

    if letters == "a":
        return None  # IN_ALL = no filter
    mask = 0
    for c in letters:
        if c == "a":
            return None
        if c not in STRUCTURE_LETTERS:
            raise CliError(f"-t must only include HBthec. "
                           f"Found '{c}'")
        mask |= STRUCTURE_LETTERS[c]
    return mask


# ---------------------------------------------------------------- modes

def _run_search(p: Params, spark, out) -> int:
    from .index.builder import IndexHandle
    from .query.executor import SparkQueryEngine
    from .query.multi import search_multi
    from .query.output import format_results, ranked_results
    from .query.parser import QueryError, parse_query_info
    from .query.swishrank import spark_swish_search

    if not p.index_files:
        raise CliError("specify an index with -f")
    for d in p.index_files:
        if not os.path.isdir(d):
            raise CliError(f"could not open index file {d!r}", 2)
    try:
        engines = [SparkQueryEngine(
            spark, IndexHandle(spark, d, snapshot=p.as_of))
            for d in p.index_files]
    except ValueError as e:  # unknown/expired --as-of version
        raise CliError(str(e), 2) from None

    if p.phrase_delim != '"':
        # -P: the chosen char becomes the phrase delimiter at the
        # parser level and '"' rides into the word tokenizer as an
        # ordinary character (stripped unless it is a WordCharacter) —
        # no string rewriting, so a stray " can never split a token
        for eng in engines:
            eng.phrase_delim = p.phrase_delim
    mask = _structure_mask(p.structure) if p.structure else None
    limits = dict(_typed_limit(*t) for t in p.limits) or None
    from .query.output import user_props
    uprops = user_props(engines[0].handle.cfg)
    if limits:
        # -L on a user property: resolve the docs column and type the
        # bounds from the PropSpec (numeric/date need int epochs,
        # setlimit_params, /root/reference/src/proplimit.c). With
        # multiple -f indexes the property must resolve in EVERY index
        # (the reference resolves per index and errors on a miss) —
        # otherwise the filter column would not exist in some scan.
        for prop in list(limits):
            if any(prop in user_props(e.handle.cfg) for e in engines):
                for e in engines:
                    if prop not in user_props(e.handle.cfg):
                        raise CliError(
                            "Failed to setup limit by property: "
                            f"index {e.handle.out_dir!r} does not "
                            f"define property {prop!r}")
        lm = {}
        for prop, (lo, hi) in limits.items():
            if prop in uprops:
                col, spec = uprops[prop]
                if spec.kind != "string":
                    try:
                        lo, hi = int(lo), int(hi)
                    except (TypeError, ValueError) as e:
                        raise CliError(f"-L {prop}: {e}") from None
                lm[col] = (lo, hi)
            else:
                lm[prop] = (lo, hi)
        limits = lm
    k = (1 << 20) if p.max_hits < 0 else p.max_hits
    begin = max(0, p.begin - 1) if p.begin else 0  # -b is 1-based
    # -p appends quoted property values to the default line
    # (binary: '-p cat' prints '1000 path "title" size "Mango"')
    fmt = p.fmt if p.fmt is not None else (
        '%r %p "%t" %l' + "".join(f' "<{pr}>"' for pr in (p.props
                                                          or [])))
    props = list(dict.fromkeys(
        (p.props or ["url", "title"]) + _fmt_props(fmt)))

    try:
        _node, pinfo = parse_query_info(
            p.query, engines[0].cfg, phrase_delim=p.phrase_delim)
    except Exception as e:  # QueryError/WordsTooCommon → err: exit 1
        raise CliError(str(e)) from None
    if p.header_level >= 1:
        print(f"# {VERSION}", file=out)
        print(f"# Search words: {p.query}", file=out)
        print(f"# Parsed words: {pinfo['parsed_words']}", file=out)
        removed = _removed_words(p.query, engines[0].cfg)
        if removed:
            print("# Removed stopwords: " + " ".join(removed),
                  file=out)

    if len(engines) > 1:
        if p.rank_scheme != 2 or p.sort:
            raise CliError("multi-index search supports BM25 "
                           "(-R 2) without -s only")
        hits = search_multi(engines, p.query, k=begin + k,
                            structure_mask=mask, limits=limits)
        rows = _fetch_prop_rows(engines, hits[begin:begin + k], props)
    elif p.rank_scheme == 2:
        rows = ranked_results(engines[0], p.query, k=k, props=props,
                              sort=p.sort or None, begin=begin,
                              structure_mask=mask, limits=limits)
    else:
        # IgnoreTotalWordCountWhenRanking is recorded in the manifest
        # at build time (reference default 1): -R 0 ranks without the
        # word-count normalization and -R 1 refuses, exactly like the
        # binary ("must be 0 to use IDF ranking", rank.c getrankIDF —
        # pinned in tests/test_refbin.py). Parquet always stores
        # doc_len physically; this is a semantics switch, not storage.
        twc_ignored = bool(getattr(engines[0].handle.cfg,
                                   "ignore_total_word_count", True))
        try:
            # -a returns the UNSCALED swishrank (SwishReturnRawRank,
            # docprop.c:371-373) instead of the 1-1000 display scaling;
            # BM25 (-R 2) scores are raw by nature, so -a only affects
            # the swish schemes
            pairs = spark_swish_search(
                engines[0], p.query, k=begin + k,
                scheme=p.rank_scheme, scaled=not p.raw_rank,
                ignore_total_word_count=twc_ignored,
                structure_mask=mask, limits=limits)
        except QueryError as e:
            raise CliError(str(e)) from None
        hits = [(0, d, s) for d, s in pairs]
        rows = _fetch_prop_rows(engines, hits, props)
        if p.sort:
            from .textproc.docprops import sort_key

            for prop, direction in reversed(p.sort):
                key = prop if prop != "swishrank" else "rank"
                spec = uprops[prop][1] if prop in uprops else None
                if spec is not None:
                    rows.sort(key=lambda r, k2=key, s=spec:
                              sort_key(s, r.get(k2)),
                              reverse=direction.startswith("d"))
                else:
                    rows.sort(key=lambda r, k2=key: (r.get(k2) is None,
                                                     r.get(k2)),
                              reverse=direction.startswith("d"))
        rows = rows[begin:begin + k]
        for n, r in enumerate(rows):
            r["reccount"] = begin + n + 1

    if p.header_level >= 1:
        print(f"# Number of hits: {len(rows)}", file=out)
    if not rows:
        print("err: no results", file=out)
        print(".", file=out)
        return 0
    for line in format_results(rows, fmt, delimiter=p.delimiter):
        print(line, file=out)
    print(".", file=out)
    return 0


def _fmt_props(fmt: str) -> list[str]:
    """Properties a -x format string references (%-tags via _TAG_MAP,
    <propname> controls) so the fetch covers what the template
    prints."""
    from .query.output import _FMT_RE, _TAG_MAP, PROP_COLS, _prop_col

    out = []
    for m in _FMT_RE.finditer(fmt.replace("\\n", "\n")):
        tag, prop = m.group(1), m.group(2)
        name = _TAG_MAP.get(tag) if tag else prop
        # doc columns AND user properties (resolved later against the
        # index config); computed keys (rank/reccount) are already on
        # every hit row and must not be overwritten by a None fetch
        if name and name not in ("rank", "reccount", "%") \
                and (tag is None
                     or _prop_col(name) in set(PROP_COLS)):
            out.append(name)
    return out


def _removed_words(q: str, cfg) -> list[str]:
    """Display-only: which query words dropped as stopwords (the
    '# Removed stopwords:' header, display_result_headers
    /root/reference/src/swish.c:1769-1800). Re-tokenizes each word
    with the index config; the parser only keeps the count."""
    import re as _re

    from .textproc.tokenizer import tokenize_query_text

    out = []
    for w in _re.findall(r'[^\s()"=]+', q):
        if w.lower() in ("and", "or", "not", "near") \
                or w.lower().startswith("near") \
                or "*" in w or "?" in w:
            continue
        try:
            toks = tokenize_query_text(w, cfg)
        except Exception:
            continue
        if toks and all(t is None for t in toks):
            out.append(w.lower())
    return out


def _fetch_prop_rows(engines, hits, props) -> list[dict]:
    """doc-id hits → property dicts (one bounded IN-filter scan per
    index, like api.SwishSparkEngine._fetch_props). User properties
    (PropertyNames) resolve per-index and land in the row under the
    REQUESTED name, date values already display-rendered."""
    from .query.output import PROP_COLS, _prop_col, user_props
    from .textproc.docprops import display

    base_wanted = sorted({_prop_col(pr) for pr in props}
                         & set(PROP_COLS) | {"url", "title"})
    by_engine: dict = {}
    for i, d, _s in hits:
        by_engine.setdefault(i, []).append(int(d))
    lookup: dict = {}
    for i, ids in by_engine.items():
        u = user_props(engines[i].handle.cfg)
        upicks = {pr: u[pr] for pr in props if pr in u}
        wanted = sorted(set(base_wanted)
                        | {c for c, _ in upicks.values()})
        docs = engines[i].handle.docs()
        for r in (docs.filter(docs.doc_id.isin(ids))
                  .select("doc_id", *wanted).collect()):
            row = {c: r[c] for c in base_wanted}
            for pr, (col, spec) in upicks.items():
                v = r[col]
                # dates render as the reference's display string (ISO
                # order-preserving); ints stay raw so -s sorts numeric
                row[pr] = (display(spec, v) if spec.kind == "date"
                           else v) if v is not None else None
            lookup[(i, r["doc_id"])] = row
    rows = []
    for n, (i, d, s) in enumerate(hits):
        row = {"doc_id": d, "rank": s, "reccount": n + 1,
               "index": i, "filenum": int(d) + 1,
               "dbfile": os.path.basename(os.path.normpath(
                   engines[i].handle.out_dir))}
        row.update(lookup.get((i, d), {}))
        rows.append(row)
    return rows


def _run_index(p: Params, spark, out) -> int:
    from .config import SwishConfig, parse_config_file
    from .index.builder import build_index
    from .index.maintenance import (apply_ignore_limit,
                                    remove_documents)

    conf = SwishConfig()
    for cf in p.config_files:
        if not os.path.exists(cf):
            raise CliError(f"could not open config file {cf!r}")
        sub = parse_config_file(cf)
        _merge_conf(conf, sub)
    if p.verbose and conf.unknown:
        for d, v in conf.unknown:
            print(f"warning: unknown directive {d} {v}", file=sys.stderr)

    index_dir = (p.index_files[0] if p.index_files
                 else conf.index_file)
    if not index_dir:
        raise CliError("specify an output index with -f or IndexFile")
    dirs = p.index_dirs or conf.index_dirs
    if not dirs:
        raise CliError("specify input with -i or IndexDir")

    if p.update_mode == "remove":
        n = remove_documents(spark, index_dir, dirs)
        print(f"Removed {n} document(s).", file=out)
        return 0

    pages = _source_pages(p, spark, conf, dirs)
    if p.newer_than:
        from pyspark.sql import functions as F

        cutoff = os.path.getmtime(p.newer_than)
        pages = pages.filter(
            F.col("warc_ts").cast("double") > float(cutoff))

    if p.update_mode == "update":
        if p.source == "prog":
            from .sources.progfile import apply_prog_stream

            stats = apply_prog_stream(spark, dirs, index_dir)
            print(f"Updated {stats['updated']}, removed "
                  f"{stats['removed']} document(s).", file=out)
            return 0
        from .index.maintenance import update_documents

        update_documents(spark, pages.select(
            "url", "warc_ts", "html", "text", "lang"), index_dir)
        print("Index updated.", file=out)
        return 0

    cfg = conf.to_index_config()
    manifest = build_index(spark, pages, index_dir, cfg=cfg)
    if conf.ignore_limit:
        plimit, flimit = conf.ignore_limit
        stopped = apply_ignore_limit(spark, index_dir,
                                     plimit=plimit, flimit=flimit)
        if p.verbose:
            print(f"IgnoreLimit removed {len(stopped)} word(s)",
                  file=out)
    if p.verbose or p.header_level >= 1:
        print(f"Indexing done: {manifest['doc_count']} files, "
              f"{manifest['token_count']} words total", file=out)
    return 0


def _source_pages(p: Params, spark, conf, dirs):
    if p.source == "prog":
        from .sources.progfile import prog_pages_df

        return prog_pages_df(spark, dirs)
    if p.source == "http":
        from .sources.spider import (SpiderConfig, crawl_pages,
                                     urllib_fetcher)

        return crawl_pages(spark, dirs, urllib_fetcher,
                           SpiderConfig())
    from .sources.fswalk import fs_pages_df

    return fs_pages_df(spark, dirs, conf)


def _merge_conf(dst, src) -> None:
    """Later -c files override/extend earlier ones, reference order."""
    for f in ("index_dirs", "index_only", "index_contents",
              "no_contents", "file_rules", "file_matches",
              "replace_rules", "ignored", "unknown"):
        getattr(dst, f).extend(getattr(src, f))
    if src.index_file:
        dst.index_file = src.index_file
    if src.default_contents:
        dst.default_contents = src.default_contents
    if src.ignore_limit:
        dst.ignore_limit = src.ignore_limit
    dst.header.update(src.header)
    dst.kwargs.update(src.kwargs)


def _run_merge(p: Params, spark, out) -> int:
    from .index.maintenance import merge_indexes

    *srcs, dest = p.merge
    if len(srcs) < 2:
        raise CliError("-M requires at least two source indexes "
                       "and an output")
    merge_indexes(spark, srcs, dest)
    print(f"Merged {len(srcs)} indexes into {dest}", file=out)
    return 0


def _run_keywords(p: Params, spark, out) -> int:
    from .index.builder import IndexHandle
    from .query.output import keywords

    if not p.index_files:
        raise CliError("specify an index with -f")
    handle = IndexHandle(spark, p.index_files[0])
    prefix = "" if p.keyword_char == "*" else p.keyword_char
    for term, _df, _cf in keywords(handle, startswith=prefix,
                                   limit=1 << 20):
        print(term, file=out)
    return 0


_T_OPTS = ("index_header", "index_words", "index_words_only",
           "index_words_meta", "index_words_full", "index_stopwords",
           "index_files", "index_word_count", "index_metanames",
           "index_all", "list_fuzzy_modes", "help")


def _run_debug(p: Params, spark, out) -> int:
    """-T index introspection (dump.c surface). Formats follow the
    reference's shapes; metaIDs print as FIELD NAMES (this engine's
    postings carry names, not numeric ids — documented divergence)."""
    from .index.builder import IndexHandle
    from .query.output import info

    opts = set(p.debug_opts)
    unknown = opts - set(_T_OPTS)
    if unknown:
        raise CliError(f"-T: unknown option(s) {sorted(unknown)} "
                       f"(try -T help)")
    if "help" in opts:
        for o in _T_OPTS[:-1]:
            print(f"  {o.upper()}", file=out)
        return 0
    if "list_fuzzy_modes" in opts:
        from .config import _FUZZY_MODES

        for m in sorted(set(_FUZZY_MODES.values()) | {"none"}):
            print(m, file=out)
        opts.discard("list_fuzzy_modes")
        if not opts:
            return 0
    if not p.index_files:
        raise CliError("specify an index with -f")
    handle = IndexHandle(spark, p.index_files[0],
                         snapshot=p.as_of)
    if "index_all" in opts:
        opts |= {"index_header", "index_words", "index_stopwords",
                 "index_files", "index_word_count", "index_metanames"}
    if "index_header" in opts:
        i = info(handle)
        cfg = handle.cfg
        print(f"# Name: {i['config'].get('index_name', '')}", file=out)
        print(f"# Saved as: {handle.out_dir}", file=out)
        # "# Total Words" is the UNIQUE word count in the reference
        # header dump (verified: 14 uniques / 18 positions on a probe)
        n_terms = handle.terms().select("term").distinct().count()
        print(f"# Total Words: {n_terms}", file=out)
        print(f"# Total Files: {i['doc_count']}", file=out)
        print(f"# Removed Files: {i['removed_count']}", file=out)
        print(f"# Total Word Pos: {handle.stats['total_pos']}",
              file=out)
        print(f"# Shards: {i['n_shards']}", file=out)
        print(f"# FuzzyIndexingMode: {cfg.fuzzy or 'NoFuzzy'}",
              file=out)
        print(f"# MinWordLimit: {cfg.min_word_len}", file=out)
        print(f"# MaxWordLimit: {cfg.max_word_len}", file=out)
        print("# IgnoreTotalWordCountWhenRanking: "
              f"{int(bool(cfg.ignore_total_word_count))}", file=out)
    if "index_metanames" in opts:
        from .textproc.docprops import specs_of

        print(f"\n-----> METANAMES for {handle.out_dir} <-----",
              file=out)
        names = (["swishdefault"] + sorted(handle.cfg.metanames or ()))
        for n in dict.fromkeys(names):
            print(f"{n:>20} : META_INDEX", file=out)
        for a, b in handle.cfg.meta_aliases or ():
            print(f"{a:>20} : META_INDEX alias -> {b}", file=out)
        for s in specs_of(handle.cfg.properties).values():
            kind = {"string": "STRING", "int": "NUMBER",
                    "date": "DATE"}[s.kind]
            flags = "" if s.kind != "string" else (
                " META_IGNORE_CASE" if s.ignore_case else "")
            print(f"{s.name:>20} : META_PROP:{kind}{flags}", file=out)
    if "index_stopwords" in opts:
        from .textproc.stopwords import DEFAULT_STOPWORDS

        sw = (DEFAULT_STOPWORDS if handle.cfg.stopwords is None
              else handle.cfg.stopwords)
        for w in sorted(sw):
            print(w, file=out)
    if opts & {"index_words", "index_words_only", "index_words_meta",
               "index_words_full"}:
        from pyspark.sql import functions as F

        terms = handle.terms()
        if "index_words_only" in opts:
            for r in (terms.select("term").distinct()
                      .orderBy("term").collect()):
                print(r["term"], file=out)
        if "index_words_meta" in opts:
            for r in (terms.select("term", "field").distinct()
                      .orderBy("term", "field").collect()):
                print(f"{r['term']}\t{r['field']}", file=out)
        if opts & {"index_words", "index_words_full"}:
            print(f"\n-----> WORD INFO in index {handle.out_dir} "
                  f"<-----\n", file=out)
            rows = (terms.groupBy("term", "field")
                    .agg(F.sum("df").alias("df"),
                         F.sum("cf").alias("cf"))
                    .orderBy("term", "field").collect())
            for r in rows:
                print(f"{r['term']} [{r['field']} df={r['df']} "
                      f"cf={r['cf']}]", file=out)
    if "index_word_count" in opts:
        # per-file word totals (the reference refuses unless counts
        # were stored; this format always stores doc_len)
        for r in (handle.docs().select("url", "doc_len")
                  .orderBy("url").collect()):
            print(f"{r['doc_len']:8d} {r['url']}", file=out)
    if "index_files" in opts:
        from .query.output import PROP_COLS, user_props

        u = user_props(handle.cfg)
        ucols = sorted({c for c, _ in u.values()})
        print(f"\n-----> FILES in index {handle.out_dir} <-----",
              file=out)
        for r in (handle.docs()
                  .select("doc_id", *PROP_COLS, *ucols)
                  .orderBy("doc_id").collect()):
            print(f"Dumping File Properties for File Number: "
                  f"{r['doc_id'] + 1}", file=out)
            for c in PROP_COLS + ucols:
                v = r[c]
                if v is not None and v != "":
                    print(f"  {c}: {v}", file=out)
    return 0


def _run_snapshots(p: Params, out) -> int:
    """--snapshots: list committed versions of an index (driver-side
    manifest listing, no Spark session needed)."""
    import json

    from .index.builder import _manifest_dir, _snapshots_dir, \
        list_snapshots

    if not p.index_files:
        raise CliError("specify an index with -f")
    d = p.index_files[0]
    cur = json.load(open(os.path.join(_manifest_dir(d), "index.json")))
    for v in list_snapshots(d):
        m = json.load(open(os.path.join(_snapshots_dir(d),
                                        f"v{v}.json")))
        star = "*" if v == cur.get("snapshot") else " "
        print(f"{star} v{v}  docs={m.get('doc_count')} "
              f"shards={m.get('n_shards')} "
              f"removed={m.get('removed_total', 0)}", file=out)
    return 0


def _run_expire(p: Params, out) -> int:
    from .index.maintenance import expire_snapshots

    if not p.index_files:
        raise CliError("specify an index with -f")
    stats = expire_snapshots(p.index_files[0],
                             keep_last=p.expire_keep)
    print(f"Expired {stats['snapshots_deleted']} snapshot(s); "
          f"deleted {stats['dirs_deleted']} data dir(s), "
          f"{stats['files_deleted']} tombstone file(s)", file=out)
    return 0


def main(argv=None, spark=None, out=None) -> int:
    global _error_out
    _error_out = None  # -E routing is per-invocation
    argv = sys.argv[1:] if argv is None else argv
    out = out or sys.stdout
    if not argv:
        print(__doc__)
        return 1
    p = _parse_argv(list(argv))
    if p.version:
        print(VERSION, file=out)
        return 0
    try:
        if p.show_snapshots:
            return _run_snapshots(p, out)
        if p.expire_keep is not None:
            return _run_expire(p, out)
        if p.merge:
            return _run_merge(p, _get_spark(spark), out)
        if p.keyword_char is not None:
            return _run_keywords(p, _get_spark(spark), out)
        if p.debug_opts and p.query is None:
            if set(p.debug_opts) <= {"help", "list_fuzzy_modes"}:
                return _run_debug(p, None, out)
            return _run_debug(p, _get_spark(spark), out)
        if p.query is not None:
            return _run_search(p, _get_spark(spark), out)
        if p.index_dirs or p.config_files:
            return _run_index(p, _get_spark(spark), out)
    except CliError:
        raise
    raise CliError("nothing to do (need -w, -i/-c, -k, -M or -V)")


if __name__ == "__main__":
    sys.exit(main())
