"""Batch query execution: score N queries in ONE shared Spark pipeline.

Training-data pipelines run thousands of probe queries; at local[32]
the per-job floor (~0.5-1.2 s) makes sequential ``engine.search()``
latency-bound, not decode-bound, and on a real cluster the scheduler
round-trips dominate the same way. The batch path amortizes everything
that is per-query fixed cost:

1. ONE partition-pruned segment scan covering the union of every
   query's leaves (terms + expanded prefixes/patterns),
2. ONE decode pass (positions only if some query is positional),
3. ONE shuffle co-locating each doc's leaf rows,
4. a per-partition evaluation kernel: non-positional queries (Term /
   Prefix / Pattern / AND / OR / AND-NOT) evaluate as numpy column
   arithmetic over factorized (doc, leaf) codes — zero Python per doc;
   queries with phrase/NEAR nodes fall back to a per-doc AST walk (the
   DAAT loop of the reference, /root/reference/src/search.c:2249-2637)
   restricted to the docs that contain at least one of their leaves,
5. per-partition top-k, then one tiny per-query merge.

The per-doc evaluator mirrors ``oracle.engine.OracleIndex._eval``
operator for operator (same float op order, same posdata separator
rules), so ``search_batch`` results are rank-identical to sequential
``search()`` and to the pure-Python oracle; every operator except
unary NOT is pointwise per doc, which is exactly why the per-doc
restriction is lossless. Unary-NOT queries (complement of the corpus)
are rejected — they need the full docs table, use ``search()``.

Scale shape at 100 TB: the scan stays partition-pruned no matter how
many queries are batched (leaf conds OR together), the doc_id shuffle
moves each posting once regardless of how many queries reference its
term, and the kernel emits at most k rows per (query, partition) so
the final merge sees ≤ k·P rows per query — no all-matches collect
anywhere.
"""

from __future__ import annotations

from ..codec.postings import B, K1
from .parser import (
    And, AndNot, Near, Not, Or, Pattern, Phrase, Prefix, Term,
    parse_query,
)

BATCH_RESULT_SCHEMA = "query_id string, doc_id long, score double"


def _has_not(node) -> bool:
    if isinstance(node, Not):
        return True
    if isinstance(node, (And, Or, AndNot, Near)):
        return _has_not(node.left) or _has_not(node.right)
    return False


def _expansion_key(node):
    if isinstance(node, Prefix):
        return ("prefix", node.field, node.prefix)
    return ("pattern", node.field, node.pattern)


def _collect_expandables(node, out):
    if isinstance(node, (Prefix, Pattern)):
        out.append(node)
    elif isinstance(node, (And, Or, AndNot, Near)):
        _collect_expandables(node.left, out)
        _collect_expandables(node.right, out)
    elif isinstance(node, Not):
        _collect_expandables(node.child, out)


def _query_leaves(node, expansions) -> set:
    """Every (field, term) the query can touch — the trigger set for
    candidate skipping in the kernel."""
    if isinstance(node, Term):
        return {(node.field, node.term)}
    if isinstance(node, (Prefix, Pattern)):
        return {(node.field, t)
                for t in expansions[_expansion_key(node)]}
    if isinstance(node, Phrase):
        return {(node.field, t) for t in node.terms if t is not None}
    if isinstance(node, (And, Or, AndNot, Near)):
        return _query_leaves(node.left, expansions) \
            | _query_leaves(node.right, expansions)
    if isinstance(node, Not):
        return _query_leaves(node.child, expansions)
    return set()


def _impact(tf: float, dl: float, avgdl: float) -> float:
    # identical float64 expression to oracle.engine.bm25_impact_scalar
    return tf * (K1 + 1.0) / (
        tf + K1 * (1.0 - B + B * dl / max(avgdl, 1e-9)))


def eval_doc(node, entries, dl, idf, avgdl, expansions):
    """Evaluate one query AST against ONE doc's leaf map.

    ``entries``: {(field, term): (tf, positions-or-None)}. Returns
    (score, posdata) or None — posdata may carry 0 separators from a
    NEAR series exactly like the oracle's per-doc values. Mirrors
    OracleIndex._eval case for case; keep the two in sync."""
    if isinstance(node, Term):
        e = entries.get((node.field, node.term))
        if e is None:
            return None
        tf, pos = e
        sc = idf[(node.field, node.term)] * _impact(tf, dl, avgdl)
        return (sc, list(pos) if pos is not None else [])
    if isinstance(node, (Prefix, Pattern)):
        out = None
        for t in expansions[_expansion_key(node)]:
            e = entries.get((node.field, t))
            if e is None:
                continue
            tf, pos = e
            sc = idf[(node.field, t)] * _impact(tf, dl, avgdl)
            pl = list(pos) if pos is not None else []
            if out is None:
                out = (sc, pl)
            else:
                out = (out[0] + sc, sorted(out[1] + pl))
        return out
    if isinstance(node, Phrase):
        seq = [(i, t) for i, t in enumerate(node.terms)
               if t is not None]
        if not seq:
            return None
        ent = [entries.get((node.field, t)) for _, t in seq]
        if any(e is None for e in ent):
            return None
        possets = [set(int(p) for p in e[1]) for e in ent]
        off0 = seq[0][0]
        matched = [
            p for p in ent[0][1]
            if all(int(p) - off0 + off in possets[j]
                   for j, (off, _) in enumerate(seq))]
        if not matched:
            return None
        score = 0.0
        allpos = []
        for j, (_, term) in enumerate(seq):
            tf, pos = ent[j]
            score += idf[(node.field, term)] * _impact(tf, dl, avgdl)
            allpos.extend(int(p) for p in pos)
        return (score, sorted(allpos))
    if isinstance(node, And):
        left = eval_doc(node.left, entries, dl, idf, avgdl, expansions)
        if left is None:
            return None
        right = eval_doc(node.right, entries, dl, idf, avgdl,
                         expansions)
        if right is None:
            return None
        # concat UNSORTED (CopyPositions l then r) — preserves NEAR
        # series separators for an enclosing NEAR
        return (left[0] + right[0], left[1] + right[1])
    if isinstance(node, Or):
        left = eval_doc(node.left, entries, dl, idf, avgdl, expansions)
        right = eval_doc(node.right, entries, dl, idf, avgdl,
                         expansions)
        # OR posdata is a PLAIN sorted merge: drop NEAR separators
        if left is not None:
            lflat = sorted(x for x in left[1] if x)
            if right is None:
                return (left[0], lflat)
            rflat = sorted(x for x in right[1] if x)
            return (left[0] + right[0], sorted(lflat + rflat))
        if right is None:
            return None
        return (right[0], sorted(x for x in right[1] if x))
    if isinstance(node, AndNot):
        left = eval_doc(node.left, entries, dl, idf, avgdl, expansions)
        if left is None:
            return None
        right = eval_doc(node.right, entries, dl, idf, avgdl,
                         expansions)
        return left if right is None else None
    if isinstance(node, Near):
        from .positional import near_chain

        left = eval_doc(node.left, entries, dl, idf, avgdl, expansions)
        if left is None:
            return None
        right = eval_doc(node.right, entries, dl, idf, avgdl,
                         expansions)
        if right is None:
            return None
        merged = near_chain([int(p) for p in left[1]],
                            [int(p) for p in right[1]], node.distance)
        if merged is None:
            return None
        return (left[0] + right[0], merged)
    raise TypeError(f"unsupported node in batch eval: {node!r}")


def _is_positional(node) -> bool:
    """True if the AST contains a Phrase or NEAR node anywhere —
    those need per-doc position arrays; everything else is pointwise
    arithmetic on (tf, dl) and vectorizes."""
    if isinstance(node, (Phrase, Near)):
        return True
    if isinstance(node, (And, Or, AndNot)):
        return _is_positional(node.left) or _is_positional(node.right)
    if isinstance(node, Not):
        return _is_positional(node.child)
    return False


def _leaf_vec(field, term, cols, n_docs, np):
    score = np.zeros(n_docs)
    present = np.zeros(n_docs, dtype=bool)
    e = cols.get((field, term))
    if e is not None:
        di, sc = e
        score[di] = sc
        present[di] = True
    return score, present


def _eval_vec(node, cols, n_docs, expansions, np):
    """Vectorized ``eval_doc`` over every doc in the partition at once.

    Returns (score: float64[n_docs], present: bool[n_docs]) with score
    zeroed wherever present is False. Float op order per doc is
    identical to the scalar walk: leaves scatter exact row scores,
    Prefix/Pattern accumulate members sequentially in the same sorted
    vocab order, and `x + 0.0 == x` makes the zero-filled absent sides
    of AND/OR additions bit-neutral (BM25 scores are finite, never
    -0.0)."""
    if isinstance(node, Term):
        return _leaf_vec(node.field, node.term, cols, n_docs, np)
    if isinstance(node, (Prefix, Pattern)):
        score = np.zeros(n_docs)
        present = np.zeros(n_docs, dtype=bool)
        for t in expansions[_expansion_key(node)]:
            s, m = _leaf_vec(node.field, t, cols, n_docs, np)
            score = score + s
            present |= m
        return score, present
    if isinstance(node, And):
        ls, lp = _eval_vec(node.left, cols, n_docs, expansions, np)
        rs, rp = _eval_vec(node.right, cols, n_docs, expansions, np)
        p = lp & rp
        return np.where(p, ls + rs, 0.0), p
    if isinstance(node, Or):
        ls, lp = _eval_vec(node.left, cols, n_docs, expansions, np)
        rs, rp = _eval_vec(node.right, cols, n_docs, expansions, np)
        # both sides are zeroed outside their own presence, so ls + rs
        # equals the present side exactly when only one matched
        return ls + rs, lp | rp
    if isinstance(node, AndNot):
        ls, lp = _eval_vec(node.left, cols, n_docs, expansions, np)
        _, rp = _eval_vec(node.right, cols, n_docs, expansions, np)
        p = lp & ~rp
        return np.where(p, ls, 0.0), p
    raise TypeError(f"non-vectorizable node in batch eval: {node!r}")


def _batch_kernel(batches, asts, idf, avgdl, expansions, trigger, k):
    """Per-partition kernel: numpy column evaluation for the
    non-positional queries, per-doc DAAT walk (restricted to trigger
    docs) for the positional ones; local top-k per query."""
    import numpy as np
    import pandas as pd

    parts = list(batches)
    if not parts:
        return
    df = pd.concat(parts, ignore_index=True)
    if not len(df):
        return
    vec_asts = [(qid, n) for qid, n in asts if not _is_positional(n)]
    pos_asts = [(qid, n) for qid, n in asts if _is_positional(n)]

    # factorize docs and leaves; exact per-row BM25 contribution
    doc_codes, doc_vals = pd.factorize(df["doc_id"])
    n_docs = len(doc_vals)
    tf = df["tf"].to_numpy(dtype=np.float64)
    dl = df["dl"].to_numpy(dtype=np.float64)
    ad = max(avgdl, 1e-9)
    impact = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / ad))

    # group rows by (field, term) leaf without string keys (pandas
    # str concat mangles control-char separators): combine the two
    # factorized code spaces into one integer leaf code
    f_codes, f_vals = pd.factorize(df["field"])
    t_codes, t_vals = pd.factorize(df["term"])
    nt = len(t_vals)
    leaf_code = f_codes.astype(np.int64) * nt + t_codes
    order = np.argsort(leaf_code, kind="stable")
    sk = leaf_code[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    ends = np.r_[starts[1:], len(sk)]
    dc_sorted = doc_codes[order]
    imp_sorted = impact[order]
    cols = {}  # (field, term) -> (doc_code[], exact row score[])
    for s0, e0 in zip(starts, ends):
        f = f_vals[sk[s0] // nt]
        t = t_vals[sk[s0] % nt]
        idfv = idf.get((f, t), 0.0)
        cols[(f, t)] = (dc_sorted[s0:e0], idfv * imp_sorted[s0:e0])

    per_query: dict = {qid: [] for qid, _ in asts}

    for qid, node in vec_asts:
        score, present = _eval_vec(node, cols, n_docs, expansions, np)
        sel = np.flatnonzero(present)
        if not len(sel):
            continue
        sc = score[sel]
        ids = doc_vals[sel]
        top = np.lexsort((ids, -sc))[:k]
        per_query[qid] = [(int(ids[i]), float(sc[i])) for i in top]

    if pos_asts:
        # per-doc walk only over docs holding ≥1 positional-query leaf
        pos_trigger = {}
        for qid, node in pos_asts:
            for leaf in _query_leaves(node, expansions):
                pos_trigger.setdefault(leaf, []).append(qid)
        cand = np.zeros(n_docs, dtype=bool)
        for leaf in pos_trigger:
            e = cols.get(leaf)
            if e is not None:
                cand[e[0]] = True
        ast_by_id = dict(pos_asts)
        sub = df[cand[doc_codes]]
        for doc_id, g in sub.groupby("doc_id", sort=False):
            entries = {}
            for f, t, tfv, pos in zip(g["field"], g["term"], g["tf"],
                                      g["positions"]):
                entries[(f, t)] = (int(tfv), pos)
            dlv = int(g["dl"].iloc[0])
            cands: set = set()
            for ekey in entries:
                cands.update(pos_trigger.get(ekey, ()))
            for qid in cands:
                r = eval_doc(ast_by_id[qid], entries, dlv, idf, avgdl,
                             expansions)
                if r is not None:
                    per_query[qid].append((int(doc_id), r[0]))
        for qid, _ in pos_asts:
            hits = per_query[qid]
            hits.sort(key=lambda h: (-h[1], h[0]))
            per_query[qid] = hits[:k]

    rows = []
    for qid, hits in per_query.items():
        rows.extend((qid, d, s) for d, s in hits)
    if rows:
        yield pd.DataFrame(rows,
                           columns=["query_id", "doc_id", "score"])


def _topk_merge(pdf, k):
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    return (pdf.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k))


def search_batch(engine, queries, k: int = 10):
    """Top-k of every query in ONE shared pipeline.

    ``queries``: {query_id: query string} (a list gets ids q000..).
    Returns a DataFrame (query_id, doc_id, score) — the same rows as
    ``[engine.search_df(q, k) for q in queries]``, bit-identical
    scores, in one scan + two bounded shuffles instead of N jobs.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    from ..oracle.engine import bm25_idf

    if not isinstance(queries, dict):
        queries = {f"q{i:03d}": q for i, q in enumerate(queries)}
    engine.handle.ensure_current()
    asts = []
    for qid, qs in queries.items():
        node = parse_query(qs, engine.cfg,
                           phrase_delim=getattr(engine, 'phrase_delim', '"'))
        if _has_not(node):
            raise ValueError(
                f"batch query {qid!r}: unary NOT (complement) is not "
                "batchable — it scores the whole corpus; use search()")
        asts.append((qid, node))
    if not asts:
        return engine.spark.createDataFrame([], BATCH_RESULT_SCHEMA)

    # union AST: drives the shared scan/decode/df planning only (an Or
    # root has no required leaves, so no conjunctive pruning applies)
    combined = reduce(Or, (n for _, n in asts))

    # driver-side prefix/pattern expansion (terms-table scan, cached)
    expansions: dict = {}
    expandables: list = []
    for _, node in asts:
        _collect_expandables(node, expandables)
    for nd in expandables:
        key = _expansion_key(nd)
        if key in expansions:
            continue
        by_bucket = (engine._expand_prefix(nd.field, nd.prefix)
                     if isinstance(nd, Prefix)
                     else engine._expand_pattern(nd))
        if by_bucket is None:
            raise ValueError(
                f"batch query wildcard {key} expands past "
                f"{engine.PREFIX_EXPAND_CAP} terms")
        # sorted == the oracle's vocab-order accumulation
        expansions[key] = sorted(
            t for ts in by_bucket.values() for t in ts)

    decoded = engine._decoded(combined, None)
    if decoded is None:
        return engine.spark.createDataFrame([], BATCH_RESULT_SCHEMA)
    stats = engine.handle.stats
    dfs = engine._term_stats(combined, decoded, None)
    avgdl = max(stats["avgdl"], 1e-9)
    idf = {key: bm25_idf(stats["n_docs"], df)
           for key, df in dfs.items()}

    trigger: dict = {}
    for qid, node in asts:
        for leaf in _query_leaves(node, expansions):
            trigger.setdefault(leaf, []).append(qid)

    local = decoded.repartition("doc_id").mapInPandas(
        lambda it: _batch_kernel(it, asts, idf, avgdl, expansions,
                                 trigger, k),
        schema=BATCH_RESULT_SCHEMA)
    return (local.groupBy("query_id")
            .applyInPandas(lambda pdf: _topk_merge(pdf, k),
                           schema=BATCH_RESULT_SCHEMA))
