"""Multi-index search (tape merge) and the -a alt query syntax.

- Multi-index: swish-e attaches several indexes and merges their
  per-index ranked streams at fetch time by sort key (SwishNextResult,
  /root/reference/src/search.c:1098-1186; compare_results
  /root/reference/src/result_sort.c:146-206). Scores are per-index
  (each index's own df/N statistics), exactly as the reference computes
  ranks per index before merging. For globally-consistent BM25 across
  sources, merge the indexes first (index/maintenance.merge_indexes).
- Alt "basic" syntax: ``+word -word word`` converted to the boolean
  language (/root/reference/src/search_alt.c): required (+) terms join
  with AND, bare terms join with OR, and every -term is appended as
  NOT term.
"""

from __future__ import annotations


def search_multi(engines, q: str, k: int = 10, structure_mask=None,
                 limits: dict | None = None):
    """Top-k across several SparkQueryEngine instances — the tape-merge
    analogue. Returns [(engine_idx, doc_id, score)] ordered by
    (score desc, engine_idx asc, doc_id asc)."""
    merged = []
    for i, eng in enumerate(engines):
        for doc_id, score in eng.search(q, k=k,
                                        structure_mask=structure_mask,
                                        limits=limits):
            merged.append((i, doc_id, score))
    merged.sort(key=lambda t: (-t[2], t[0], t[1]))
    return [(i, d, s) for i, d, s in merged[:k]]


def alt_to_boolean(q: str) -> str:
    """``+req -excl word`` → boolean query string
    (/root/reference/src/search_alt.c)."""
    required, excluded, optional = [], [], []
    for tok in q.split():
        if tok.startswith("+") and len(tok) > 1:
            required.append(tok[1:])
        elif tok.startswith("-") and len(tok) > 1:
            excluded.append(tok[1:])
        elif tok:
            optional.append(tok)
    parts = []
    if required:
        parts.append("(" + " AND ".join(required) + ")")
    if optional:
        parts.append("(" + " OR ".join(optional) + ")")
    out = " AND ".join(parts)
    for e in excluded:
        out = f"{out} NOT {e}" if out else f"NOT {e}"
    return out
