"""Embedding API facade — the SWISH::API surface (SURVEY.md §2.8).

Mirrors the reference library lifecycle
(SwishInit → SwishQuery/SwishExecute → SwishNextResult/SwishSeekResult,
/root/reference/src/swish-e.h, /root/reference/src/search.c:764-1186,
perl SWISH::API usage /root/reference/perl/t/test.t) on top of the
Spark engine:

    sw = SwishSparkEngine(spark, ["/path/to/index", ...])
    results = sw.query("pigs AND wolf", k=20)
    while (r := results.next_result()) is not None:
        print(r["rank"], r["url"], r["title"])
    sw.fuzzy_word("Running")   # SwishFuzzyWord

Multi-index attach uses the tape merge (query/multi.py); properties are
fetched lazily per result page (getDocProperty,
/root/reference/src/docprop.c:346-417).
"""

from __future__ import annotations

from .index.builder import IndexHandle
from .query.executor import SparkQueryEngine
from .query.multi import search_multi
from .query.output import PROP_COLS, info
from .textproc.tokenizer import fuzzy_word


class Results:
    """Sequential result cursor (SwishNextResult / SwishSeekResult,
    /root/reference/src/search.c:1098-1186)."""

    def __init__(self, rows: list[dict]):
        self._rows = rows
        self._i = 0

    @property
    def hits(self) -> int:
        return len(self._rows)

    def next_result(self):
        if self._i >= len(self._rows):
            return None
        r = self._rows[self._i]
        self._i += 1
        return r

    def seek(self, n: int) -> None:
        if not 0 <= n <= len(self._rows):
            raise IndexError(f"seek({n}) out of range")
        self._i = n

    def __iter__(self):
        while (r := self.next_result()) is not None:
            yield r


class SwishSparkEngine:
    """SwishInit analogue: attach one or more indexes.

    ``snapshot`` pins every attached index to that committed version
    (time travel; no reference analogue — the single index file has no
    history). A pinned engine is immune to concurrent mutations until
    the version is expired, at which point it fails loudly."""

    def __init__(self, spark, index_dirs, snapshot: int | None = None):
        if isinstance(index_dirs, str):
            index_dirs = [index_dirs]
        self.spark = spark
        self.engines = [
            SparkQueryEngine(spark,
                             IndexHandle(spark, d, snapshot=snapshot))
            for d in index_dirs]

    def query(self, q: str, k: int = 10, structure_mask=None,
              limits=None, props=("url", "title")) -> Results:
        """SwishQuery/SwishExecute: ranked results with properties."""
        if len(self.engines) == 1:
            hits = [(0, d, s) for d, s in
                    self.engines[0].search(q, k=k,
                                           structure_mask=structure_mask,
                                           limits=limits)]
        else:
            hits = search_multi(self.engines, q, k=k,
                                structure_mask=structure_mask,
                                limits=limits)
        rows = self._fetch_props(hits, props)
        return Results(rows)

    def _fetch_props(self, hits, props):
        from pyspark.sql import functions as F

        wanted = [p for p in props if p in set(PROP_COLS)]
        by_engine: dict = {}
        for i, d, _s in hits:
            by_engine.setdefault(i, []).append(d)
        lookup: dict = {}
        for i, ids in by_engine.items():
            docs = self.engines[i].handle.docs()
            for r in (docs.filter(docs.doc_id.isin([int(x)
                                                    for x in ids]))
                      .select("doc_id", *wanted).collect()):
                lookup[(i, r["doc_id"])] = {p: r[p] for p in wanted}
        out = []
        for n, (i, d, s) in enumerate(hits):
            row = {"index": i, "doc_id": d, "rank": s,
                   "reccount": n + 1}
            row.update(lookup.get((i, d), {}))
            out.append(row)
        return out

    def fuzzy_word(self, word: str) -> str:
        """SwishFuzzyWord: run a word through the index's fuzzy mode."""
        return fuzzy_word(word, self.engines[0].cfg)

    def fuzzy_word_list(self, word: str) -> list:
        """The full SwishFuzzyWord word list — two entries for a
        DoubleMetaphone word with a distinct secondary code
        (FUZZY_WORD->word_list, /root/reference/src/stemmer.c:146-153;
        one entry for every other mode)."""
        from .textproc.tokenizer import fuzzy_word_list

        return fuzzy_word_list(word, self.engines[0].cfg)

    def header(self, i: int = 0) -> dict:
        """Index header introspection (SwishHeaderValue surface)."""
        return info(self.engines[i].handle)
