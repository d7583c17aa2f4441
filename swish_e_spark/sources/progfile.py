"""-S prog external-program document source.

The reference reads documents from a generator program's stdout as a
header/body stream (extprog_indexpath,
/root/reference/src/extprog.c:224-490):

    Path-Name: <url>            (required)
    Content-Length: <bytes>     (required)
    Last-Mtime: <epoch secs>    (optional)
    Document-Type: TXT|HTML|XML|WML[2|*]   (optional, one doc only)
    No-Contents:                (optional flag, one doc only)
    Charset: ...                (parsed and ignored, extprog.c:379)
    Update-Mode: Index|Update|Remove       (optional, incremental)
    <blank line>
    <exactly Content-Length bytes of body>

Headers are matched case-insensitively by PREFIX (strncasecmp, so
"Content-Length-Foo:" still parses as Content-Length — preserved
verbatim), surrounding whitespace is trimmed, unknown headers are
ignored, and header state resets after every document.

Spark-first shape: a prog STREAM is inherently sequential (bodies are
length-delimited, no sync markers), so the unit of parallelism is the
FILE — many captured prog outputs (or WARC-style shards) fan out one
per task via binaryFile + mapInPandas, exactly how WARC corpora shard
at 100 TB. One giant stream should be split upstream; this module
parses each shard in one pass with zero copies of the body bytes.
"""

from __future__ import annotations

import re

_LEADING_INT = re.compile(rb"^\s*([+-]?\d+)")

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string, doctype string, "
                "no_contents boolean, update_mode string, "
                "source string, seq long")


class ProgProtocolError(ValueError):
    pass


def _strtol(raw: bytes) -> int:
    """C strtol: parse the leading integer, ignore trailing junk;
    no digits → 0 (extprog.c uses strtol(++x, NULL, 10))."""
    m = _LEADING_INT.match(raw)
    return int(m.group(1)) if m else 0


_DOC_TYPES = {"TXT": "txt", "HTML": "html", "XML": "xml", "WML": "xml",
              "TXT2": "txt", "HTML2": "html", "XML2": "xml",
              "TXT*": "txt", "HTML*": "html", "XML*": "xml"}


def _doc_type(raw: bytes) -> str:
    s = raw.decode("latin-1").strip().upper()
    if s not in _DOC_TYPES:
        raise ProgProtocolError(
            f"document type {s!r} not a valid document type")
    return _DOC_TYPES[s]


def parse_prog_stream(data: bytes):
    """Yield one dict per document: url, mtime (int epoch), body
    (bytes), doctype (str|None), no_contents (bool), update_mode
    ('index'|'update'|'remove'). Error semantics follow the
    reference's progerr calls: missing Path-Name / Content-Length and
    bad Document-Type raise."""
    pos, n = 0, len(data)
    path = None
    fsize = -1
    mtime = 0
    doctype = None
    no_contents = False
    update_mode = "index"
    while pos < n:
        eol = data.find(b"\n", pos)
        if eol == -1:
            eol = n
        line = data[pos:eol].strip()
        pos = eol + 1
        if not line:
            # blank line → body of exactly Content-Length bytes
            if path is None:
                raise ProgProtocolError(
                    "stream failed to return required header Path-Name:")
            if fsize == -1:
                raise ProgProtocolError(
                    f"stream failed to return required header "
                    f"Content-Length: for {path!r}")
            body = data[pos:pos + fsize]
            if len(body) != fsize:
                raise ProgProtocolError(
                    f"truncated body for {path!r}: wanted {fsize} "
                    f"bytes, got {len(body)}")
            pos += fsize
            yield {"url": path, "mtime": mtime, "body": body,
                   "doctype": doctype, "no_contents": no_contents,
                   "update_mode": update_mode}
            path, fsize, mtime = None, -1, 0
            doctype, no_contents, update_mode = None, False, "index"
            continue
        low = line.lower()
        if low.startswith(b"content-length"):
            i = line.find(b":")
            if i == -1:
                raise ProgProtocolError(
                    f"failed to parse Content-Length header {line!r}")
            fsize = _strtol(line[i + 1:])
        elif low.startswith(b"last-mtime"):
            i = line.find(b":")
            if i == -1:
                raise ProgProtocolError(
                    f"failed to parse Last-Mtime header {line!r}")
            mtime = _strtol(line[i + 1:])
        elif low.startswith(b"no-contents:"):
            no_contents = True
        elif low.startswith(b"charset"):
            pass  # parsed and discarded, like the reference
        elif low.startswith(b"path-name"):
            i = line.find(b":")
            if i == -1:
                raise ProgProtocolError(
                    f"failed to parse Path-Name header {line!r}")
            p = line[i + 1:].strip()
            if not p:
                raise ProgProtocolError(
                    f"failed to find path name in {line!r}")
            path = p.decode("utf-8", "replace")
        elif low.startswith(b"document-type"):
            i = line.find(b":")
            if i == -1:
                raise ProgProtocolError(
                    f"failed to parse Document-Type {line!r}")
            doctype = _doc_type(line[i + 1:])
        elif low.startswith(b"update-mode"):
            i = line.find(b":")
            mode = line[i + 1:].strip().lower().decode("latin-1") \
                if i != -1 else ""
            if mode not in ("index", "update", "remove"):
                raise ProgProtocolError(
                    f"unknown Update-Mode {mode!r}")
            update_mode = mode
        # unknown headers: ignored (the reference only special-cases
        # the above; anything else falls through the if-chain)
    if path is not None or fsize != -1:
        raise ProgProtocolError(
            "stream ended inside a header block (no body)")


def prog_pages_df(spark, paths):
    """Distributed prog-shard reader: one task per captured prog-output
    file, each parsed in one pass on the executor that holds the bytes.
    Returns a pages DataFrame ready for build_index (urls with a
    Document-Type override get a routing suffix honored by
    doctype_of_url only when the url itself doesn't already imply a
    type — the doctype column is authoritative for custom pipelines).
    ``(source, seq)`` records each document's stream position (shard
    path, index within shard) so incremental routing can reproduce the
    reference's sequential last-record-wins semantics."""
    import pandas as pd

    from ..shipping import ship_package

    ship_package(spark)
    raw = spark.read.format("binaryFile").load(paths) \
        .select("path", "content")

    def _parse(batches):
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for i, d in enumerate(parse_prog_stream(bytes(blob))):
                    rows.append((
                        d["url"],
                        pd.Timestamp(d["mtime"], unit="s")
                        if d["mtime"] else None,
                        d["body"],
                        "",
                        "",
                        d["doctype"],
                        d["no_contents"],
                        d["update_mode"],
                        path,
                        i))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text",
                                       "lang", "doctype", "no_contents",
                                       "update_mode", "source", "seq"])

    return raw.mapInPandas(_parse, schema=PAGES_SCHEMA)


def apply_prog_stream(spark, paths, index_dir: str):
    """Incremental prog ingest against an EXISTING index: Update-Mode
    routing — 'remove' tombstones by url (-r), 'index'/'update'
    becomes a replace shard (-u). Returns {'updated': n, 'removed': n}.

    The reference's per-doc Update-Mode switch (extprog.c:420-470)
    processes records sequentially, so later records for an url win.
    That end state is reproduced set-wise: keep only the LAST record
    per url — stream order is (shard path, position in shard), so
    shard filenames must sort in capture order — then route it: final
    'remove' → one tombstone pass, final 'index'/'update' → ONE
    update shard for the whole stream (at scale the per-doc switch is
    exactly what you don't want). Document-Type and No-Contents ride
    along into the shard build, so the incremental path parses a doc
    exactly like a full prog build would."""
    from pyspark.sql import Window, functions as F

    from ..index.maintenance import (remove_documents_df,
                                     update_documents)

    pages = prog_pages_df(spark, paths)
    w = Window.partitionBy("url").orderBy(F.desc("source"),
                                          F.desc("seq"))
    last = (pages.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn").persist())
    try:
        # removals stay a DataFrame end-to-end: a prog stream can carry
        # millions of Update-Mode: remove records, and the former
        # collect-to-list put every url on the driver AND in the plan
        n_removed = remove_documents_df(
            spark, index_dir,
            last.filter(F.col("update_mode") == "remove")
            .select("url"))
        upserts = (last.filter(F.col("update_mode") != "remove")
                   .select("url", "warc_ts", "html", "text", "lang",
                           "doctype", "no_contents"))
        n_up = upserts.count()
        if n_up:
            update_documents(spark, upserts, index_dir)
        return {"updated": int(n_up), "removed": int(n_removed)}
    finally:
        last.unpersist()
