"""Document filters — the FileFilter / FileFilterMatch analogue.

The reference forks an external program per matching document
(FilterOpen, /root/reference/src/filter.c:314-470) selected by
case-insensitive filename suffix or regex, first match wins
(hasfilter, /root/reference/src/filter.c:266-301). Forking a process
per document is exactly wrong on a 1000-executor cluster, so the
Spark-first shape is a NAMED in-process transform applied inside the
extract kernel (index/builder.py), Arrow batch by Arrow batch: the
filter runs where the bytes already are, no subprocess, no temp file
(the reference needs save_to_temp_file for the prog+filter combination,
extprog.c:318-325 — we never do).

Filters are configured as ``IndexConfig.file_filters = ((pattern,
name), ...)`` where ``name`` refers to this registry. Names serialize
into the index manifest (a callable would not); custom filters must be
re-registered before a config referencing them is rebuilt — the same
contract as the reference requiring the filter program on disk.

Pattern syntax mirrors the two reference directives:
- ``"re:<regex>"``  — FileFilterMatch: regex ``search`` on the url
- anything else     — FileFilter: case-insensitive suffix match

A suffix rule also STRIPS the suffix for document-type detection
(``report.html.gz`` filters through gzip, then parses as html) — the
analogue of the reference pairing FileFilter with an IndexContents
declaration for the inner type.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import re
import zlib


def _zlib_any(blob: bytes) -> bytes:
    """Raw zlib with a permissive window (accepts zlib and gzip wrap)."""
    return zlib.decompress(blob, wbits=zlib.MAX_WBITS | 32)


_REGISTRY: dict = {
    "gzip": gzip.decompress,
    "zlib": _zlib_any,
    "bzip2": bz2.decompress,
    "xz": lzma.decompress,
    "identity": lambda b: b,
}


def register_filter(name: str, fn) -> None:
    """Register a custom content filter: ``fn(blob: bytes) -> bytes``."""
    if not callable(fn):
        raise TypeError(f"filter {name!r} is not callable")
    _REGISTRY[name] = fn


def get_filter(name: str):
    """Resolve a filter name. Plain names hit the registry; an
    ``"exec:prog args..."`` name wraps an external converter command
    (external_filter — the reference's filters/ model); a
    ``"pkg.module:attr"`` name imports the callable. The exec: and
    import-path forms are self-describing, so they also resolve on
    EXECUTORS, whose Python workers import the shipped package fresh
    and never see driver-side register_filter calls — use them for
    custom filters in cluster mode."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name.startswith("exec:"):
        import shlex

        return external_filter(shlex.split(name[5:]))
    if ":" in name:
        mod_name, _, attr = name.partition(":")
        import importlib

        fn = getattr(importlib.import_module(mod_name), attr)
        if not callable(fn):
            raise TypeError(f"{name!r} resolved to a non-callable")
        return fn
    raise KeyError(
        f"unknown document filter {name!r}; register it with "
        f"swish_e_spark.sources.filters.register_filter or use an "
        f"import-path name 'pkg.module:callable'")


def external_filter(argv, timeout: float = 60.0):
    """Wrap an EXTERNAL converter program as a registry filter — the
    escape hatch for formats with no Python decoder, mirroring the
    converter scripts the reference ships (filters/swish_filter_*.pm
    fork pdftotext/catdoc/... per document, filter.c:314-470).

    The command must read the document bytes on stdin and write the
    converted bytes to stdout. The executable is resolved at CALL time
    (plan time when used with compile_rules), so a missing tool fails
    loudly on the driver, never per-document on executors.

    One subprocess per document is the reference's cost model, not
    Spark's — prefer an in-process transform when a Python decoder
    exists; when it doesn't, this at least runs the fork WHERE THE
    BYTES ARE (inside the Arrow batch kernel on the executor), with no
    temp files and no driver round-trip."""
    import shutil

    argv = [str(a) for a in argv]
    if not argv:
        raise ValueError("external_filter needs a command")
    if shutil.which(argv[0]) is None:
        raise FileNotFoundError(
            f"external filter program {argv[0]!r} not found on PATH")

    def fn(blob: bytes) -> bytes:
        import subprocess

        r = subprocess.run(argv, input=bytes(blob),
                           stdout=subprocess.PIPE,
                           stderr=subprocess.DEVNULL, timeout=timeout)
        if r.returncode != 0:
            raise RuntimeError(
                f"external filter {argv[0]!r} exited {r.returncode}")
        return r.stdout

    return fn


def pdftotext_filter():
    """Example converter, the reference's most-shipped pairing
    (filters/swish_filter_pdf2html.pm): PDF bytes → text via poppler's
    ``pdftotext - -`` stdin/stdout mode. Register it under a name and
    pair with a FileFilter rule::

        register_filter("pdf", pdftotext_filter())
        IndexConfig(file_filters=((".pdf", "pdf"),))

    Raises FileNotFoundError at plan time when pdftotext is not
    installed — the same contract as the reference requiring the
    filter program on disk."""
    return external_filter(["pdftotext", "-q", "-", "-"])


def compile_rules(rules) -> list:
    """((pattern, name), ...) → [(matcher, strip_suffix, fn)].
    Resolves every name eagerly so a config typo fails at plan time on
    the driver, not per-document on executors."""
    compiled = []
    for pattern, name in rules or ():
        fn = get_filter(name)
        if pattern.startswith("re:"):
            rx = re.compile(pattern[3:])
            compiled.append((rx.search, None, fn))
        else:
            suffix = pattern.lower()
            compiled.append(
                (lambda url, s=suffix: url.lower().endswith(s),
                 len(suffix), fn))
    return compiled


def apply_filters(url: str, blob: bytes, compiled) -> tuple:
    """First matching rule transforms the content (one filter per doc,
    like hasfilter's first-match-wins walk). Returns (blob,
    effective_url) where effective_url has a matched suffix stripped
    for doc-type detection."""
    for match, strip, fn in compiled:
        if match(url):
            out = fn(blob)
            if not isinstance(out, (bytes, bytearray)):
                raise TypeError(
                    f"filter returned {type(out).__name__}, not bytes, "
                    f"for {url!r}")
            return bytes(out), (url[:-strip] if strip else url)
    return blob, url
