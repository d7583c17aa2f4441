"""Single-node reference oracle: inverted index + BM25 + boolean algebra.

This is the "reference oracle in pure Python" prescribed by SURVEY.md §5:
a deterministic, single-threaded dict-of-lists implementation of the full
pipeline (extract → tokenize → postings → BM25 top-k with the swish-e
boolean/phrase/NEAR algebra, /root/reference/src/search.c:2249-2637).
The Spark engine must match it rank-identically: same top-k doc ids, same
order, scores within 1e-6 relative (FIXTURES.md §4).

Scoring contract (BM25, the north-rule scheme; swish-e's own two integer
formulas are documented in SURVEY.md §2.7 and not used here):
- idf  = ln((N - df + 0.5)/(df + 0.5) + 1)      per (field, term)
- impact = tf(k1+1)/(tf + k1(1 - b + b·dl/avgdl)) with k1=1.2 b=0.75
- term score = idf · impact; AND/OR/phrase/NEAR combine by SUM over the
  distinct matched (field, term) leaves; unary NOT scores 1000.0
  (complement rank, notresultlist /root/reference/src/search.c:2514-2553)
- total order: (score desc, doc_id asc)
"""

from __future__ import annotations

import math
from bisect import bisect_left

from ..codec.postings import B, K1
from ..query.parser import (
    And, AndNot, Near, Not, Or, Pattern, Phrase, Prefix, Term,
    parse_query,
)
from ..textproc.extractor import DEFAULT_FIELD, extract
from ..textproc.tokenizer import TokenizerConfig, tokenize_doc


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_impact_scalar(tf: int, dl: int, avgdl: float,
                       k1: float = K1, b: float = B) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9)))


class OracleIndex:
    def __init__(self, cfg: TokenizerConfig | None = None,
                 index_comments: bool = False,
                 index_links: bool = False, index_alt: bool = False,
                 xml_attributes: bool = False,
                 xml_class_attributes: bool = False,
                 xml_nested_metanames: bool = False,
                 dont_bump_tags: frozenset = frozenset(),
                 metanames: frozenset | None = None,
                 extract_path: tuple = (),
                 extract_path_defaults: tuple = (),
                 properties: tuple = (),
                 prop_aliases: tuple = (),
                 store_description: tuple = (),
                 **extract_opts):
        self.cfg = cfg or TokenizerConfig()
        self.index_comments = index_comments
        self.index_links = index_links
        self.index_alt = index_alt
        self.xml_attributes = xml_attributes
        self.xml_class_attributes = xml_class_attributes
        self.xml_nested_metanames = xml_nested_metanames
        self.dont_bump_tags = dont_bump_tags
        self.metanames = metanames
        self.extract_path = extract_path
        self.extract_path_defaults = extract_path_defaults
        from ..textproc.docprops import specs_of

        self.properties = tuple(properties)  # PropSpec tuples
        self._prop_specs = specs_of(self.properties)
        self._prop_aliases = dict(prop_aliases)
        self._store_desc = {dt: (tag, size)
                            for dt, tag, size in store_description}
        self.extract_opts = extract_opts  # meta_aliases,
        # ignore_meta_tags, links_field, images_field, alt_field,
        # absolute_links — passed straight to extract() so the oracle
        # shares the directive surface with the Spark engine
        self._staged = []  # (url, html, doctype, props)
        self.docs = {}     # doc_id -> props dict (url, title, doc_len, …)
        self.url_to_id = {}
        self.postings = {}  # (field, term) -> {doc_id: ([positions], [structs])}
        self.n_docs = 0
        self.avgdl = 0.0
        self.total_positions = 0
        self._vocab = None  # sorted (field, term) list for prefix scans

    # -- build --

    def add(self, url: str, content, doctype: str = "html", **props):
        self._staged.append((url, content, doctype, props))

    def build(self):
        """Assign dense doc_ids ordered by url, tokenize, accumulate."""
        self._staged.sort(key=lambda r: r[0])
        for url, content, doctype, props in self._staged:
            sd = self._store_desc.get(doctype)
            sd_extra = ({"description_tag": sd[0],
                         "description_size": sd[1]}
                        if sd is not None and doctype != "txt" else {})
            doc = extract(content, doctype=doctype, **sd_extra,
                          index_comments=self.index_comments,
                          index_links=self.index_links,
                          index_alt=self.index_alt,
                          xml_attributes=self.xml_attributes,
                          xml_class_attributes=self.xml_class_attributes,
                          xml_nested_metanames=self.xml_nested_metanames,
                          dont_bump_tags=self.dont_bump_tags,
                          metanames=self.metanames,
                          doc_url=url,
                          properties=frozenset(self._prop_specs),
                          prop_aliases=self._prop_aliases,
                          **self.extract_opts)
            if doc.noindex:
                continue
            if sd is not None and doctype == "txt":
                doc.description = doc.body_text()[:sd[1]]
            doc_id = len(self.docs)
            postings, doc_len = tokenize_doc(doc, self.cfg)
            if self.extract_path:
                from ..textproc.pathparts import merge_path_postings

                merge_path_postings(postings, url, self.extract_path,
                                    self.extract_path_defaults,
                                    self.cfg)
            self.docs[doc_id] = {
                "url": url, "title": doc.title, "doc_len": doc_len,
                "description": doc.description, **props,
            }
            if self._prop_specs:
                from ..textproc.docprops import finalize_all

                self.docs[doc_id].update(
                    finalize_all(doc.prop_chunks, self._prop_specs))
            self.url_to_id[url] = doc_id
            for (field, term), p in postings.items():
                slot = self.postings.setdefault((field, term), {})
                slot[doc_id] = (p.positions, p.structures)
                self.total_positions += len(p.positions)
        self._staged = []
        self.n_docs = len(self.docs)
        total_len = sum(d["doc_len"] for d in self.docs.values())
        self.avgdl = total_len / self.n_docs if self.n_docs else 0.0
        self._vocab = sorted(self.postings.keys())
        return self

    # -- scoring helpers --

    def _term_entries(self, field, term, structure_mask=None):
        """{doc_id: (tf, positions)} for one term with optional structure
        mask (test_structure, /root/reference/src/search.c:1475-1494)."""
        slot = self.postings.get((field, term))
        if not slot:
            return {}
        out = {}
        for doc_id, (positions, structs) in slot.items():
            if structure_mask is None:
                out[doc_id] = (len(positions), positions)
            else:
                kept = [p for p, s in zip(positions, structs)
                        if s & structure_mask]
                if kept:
                    out[doc_id] = (len(kept), kept)
        return out

    def _score_term(self, entries):
        if not entries:
            return {}
        df = len(entries)
        idf = bm25_idf(self.n_docs, df)
        out = {}
        for doc_id, (tf, positions) in entries.items():
            dl = self.docs[doc_id]["doc_len"]
            out[doc_id] = (idf * bm25_impact_scalar(tf, dl, self.avgdl),
                           positions)
        return out

    # -- evaluation: node -> {doc_id: (score, sorted positions)} --

    def _eval(self, node, mask):
        if isinstance(node, Term):
            return self._score_term(self._term_entries(node.field, node.term, mask))
        if isinstance(node, Prefix):
            lo = bisect_left(self._vocab, (node.field, node.prefix))
            out = {}
            i = lo
            while i < len(self._vocab):
                f, t = self._vocab[i]
                if f != node.field or not t.startswith(node.prefix):
                    break
                for doc_id, (sc, pos) in self._score_term(
                        self._term_entries(f, t, mask)).items():
                    if doc_id in out:
                        s0, p0 = out[doc_id]
                        out[doc_id] = (s0 + sc, sorted(p0 + pos))
                    else:
                        out[doc_id] = (sc, pos)
                i += 1
            return out
        if isinstance(node, Pattern):
            # sorted-word scan bounded by the literal prefix, candidates
            # post-filtered against the pattern
            # (/root/reference/src/search.c:1662-1728)
            import re as _re

            rx = _re.compile(node.regex())
            pre = node.literal_prefix()
            lo = bisect_left(self._vocab, (node.field, pre))
            out = {}
            i = lo
            while i < len(self._vocab):
                f, t = self._vocab[i]
                if f != node.field or not t.startswith(pre):
                    break
                if rx.fullmatch(t):
                    for doc_id, (sc, pos) in self._score_term(
                            self._term_entries(f, t, mask)).items():
                        if doc_id in out:
                            s0, p0 = out[doc_id]
                            out[doc_id] = (s0 + sc, sorted(p0 + pos))
                        else:
                            out[doc_id] = (sc, pos)
                i += 1
            return out
        if isinstance(node, Phrase):
            return self._eval_phrase(node, mask)
        if isinstance(node, And):
            left = self._eval(node.left, mask)
            right = self._eval(node.right, mask)
            # concat UNSORTED, as the reference's andresultlists does
            # (CopyPositions l then r, /root/reference/src/search.c:
            # 2300-2304) — preserves NEAR series separators for an
            # enclosing NEAR
            return {
                d: (left[d][0] + right[d][0],
                    left[d][1] + right[d][1])
                for d in left.keys() & right.keys()
            }
        if isinstance(node, Or):
            left = self._eval(node.left, mask)
            right = self._eval(node.right, mask)
            # OR posdata is a PLAIN sorted merge: drop NEAR series
            # separators (sorting 0s to the front would make an
            # enclosing NEAR reject every doc via an empty series)
            out = {d: (sc, sorted(x for x in pos if x))
                   for d, (sc, pos) in left.items()}
            for d, (sc, pos) in right.items():
                flat = sorted(x for x in pos if x)
                if d in out:
                    s0, p0 = out[d]
                    out[d] = (s0 + sc, sorted(p0 + flat))
                else:
                    out[d] = (sc, flat)
            return out
        if isinstance(node, AndNot):
            left = self._eval(node.left, mask)
            right = self._eval(node.right, mask)
            return {d: v for d, v in left.items() if d not in right}
        if isinstance(node, Not):
            child = self._eval(node.child, mask)
            return {d: (1000.0, []) for d in self.docs if d not in child}
        if isinstance(node, Near):
            from ..query.positional import near_chain

            left = self._eval(node.left, mask)
            right = self._eval(node.right, mask)
            out = {}
            for d in left.keys() & right.keys():
                # left posdata may carry 0-separated series from an
                # earlier NEAR in the chain — the area rule
                # (/root/reference/src/search.c:1915-1975)
                merged = near_chain(left[d][1], right[d][1],
                                    node.distance)
                if merged is not None:
                    out[d] = (left[d][0] + right[d][0], merged)
            return out
        raise TypeError(f"unknown node {node!r}")

    def _eval_phrase(self, node: Phrase, mask):
        """Positional adjacency with stopword gaps: term i must appear at
        base+offset_i (phraseresultlists /root/reference/src/search.c:2561-2637
        with distance 1)."""
        seq = [(i, t) for i, t in enumerate(node.terms) if t is not None]
        entries = [self._term_entries(node.field, t, mask) for _, t in seq]
        if not entries or any(not e for e in entries):
            return {}
        common = set(entries[0])
        for e in entries[1:]:
            common &= e.keys()
        out = {}
        off0 = seq[0][0]
        for d in common:
            possets = [set(entries[j][d][1]) for j in range(len(seq))]
            matched = [
                p for p in entries[0][d][1]
                if all(p - off0 + off in possets[j]
                       for j, (off, _) in enumerate(seq))
            ]
            if matched:
                score = 0.0
                allpos = []
                for j, (_, term) in enumerate(seq):
                    df = len(entries[j])
                    idf = bm25_idf(self.n_docs, df)
                    tf, pos = entries[j][d]
                    dl = self.docs[d]["doc_len"]
                    score += idf * bm25_impact_scalar(tf, dl, self.avgdl)
                    allpos.extend(pos)
                out[d] = (score, sorted(allpos))
        return out

    # -- public API --

    def query(self, q: str, k: int = 10, structure_mask=None,
              limits: dict | None = None):
        """Top-k as list of (doc_id, score) with (score desc, doc_id asc)
        order. ``limits`` = {prop: (lo, hi)} inclusive range filters
        (LimitByProperty, /root/reference/src/proplimit.c)."""
        node = parse_query(q, self.cfg)
        results = self._eval(node, structure_mask)
        if limits:
            from ..query.proplimit import limits_value_ok

            results = {
                d: v for d, v in results.items()
                if limits_value_ok(self.docs[d], limits,
                                   self.properties)
            }
        ranked = sorted(results.items(), key=lambda kv: (-kv[1][0], kv[0]))
        return [(d, sc) for d, (sc, _) in ranked[:k]]

    def match_count(self, q: str) -> int:
        return len(self._eval(parse_query(q, self.cfg), None))
