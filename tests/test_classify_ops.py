"""Semantic pins for ops/classify.py beyond the DuckDB oracle gate:
pure-Python recompute of the Naive Bayes model/scores and the
leakage-safety invariant of the split assignment."""

import collections
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import classify
from swish_e_spark.ops.corpus import documents
from swish_e_spark.ops.pipeline import DUP_PLANT_K, DUP_PLANT_MOD

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _r4(x):
    return math.floor(x * 10000 + 0.5) / 10000


def _planted(docs):
    """doc_id -> token list over the spam-planted corpus."""
    out = {}
    for did, d in docs.items():
        text = d.text
        if did % classify.CLS_MOD in classify.NEG_RES:
            text = text + " " + classify.SPAM_TEXT
        out[did] = _toks(text)
    return out


def _py_model(tok):
    cp = collections.Counter()
    cn = collections.Counter()
    for did, toks in tok.items():
        band = did % classify.CLS_MOD
        if band in classify.POS_RES:
            cp.update(toks)
        elif band in classify.NEG_RES:
            cn.update(toks)
    vocab = set(cp) | set(cn)
    n_pos, n_neg, v = sum(cp.values()), sum(cn.values()), len(vocab)

    def llr(t):
        return (math.log((cp[t] + 1) / (n_pos + v))
                - math.log((cn[t] + 1) / (n_neg + v)))

    return cp, cn, vocab, llr


class TestQualityNbModel:
    def test_matches_pure_python(self, spark):
        docs = {r.doc_id: r for r in documents(spark, SF).collect()}
        tok = _planted(docs)
        cp, cn, vocab, llr = _py_model(tok)
        rows = classify.quality_nb_model(spark, SF).collect()
        assert len(rows) == 30
        ranked = sorted(vocab, key=lambda t: (_r4(llr(t)), t))[:30]
        assert [r.term for r in rows] == ranked
        for r in rows:
            assert r.c_pos == cp[r.term]
            assert r.c_neg == cn[r.term]
            assert abs(r.llr - _r4(llr(r.term))) < 1e-9

    def test_spam_tokens_most_indicative(self, spark):
        rows = classify.quality_nb_model(spark, SF).collect()
        top_terms = {r.term for r in rows[:15]}
        spam_toks = set(_toks(classify.SPAM_TEXT))
        # the planted vocabulary dominates the spammiest slots
        assert len(top_terms & spam_toks) >= 8
        assert all(r.llr < 0 for r in rows[:10])


class TestQualityNbScores:
    def test_matches_pure_python(self, spark):
        docs = {r.doc_id: r for r in documents(spark, SF).collect()}
        tok = _planted(docs)
        _, _, _, llr = _py_model(tok)
        rows = {r.doc_id: r
                for r in classify.quality_nb_scores(spark, SF)
                .collect()}
        assert set(rows) == set(docs)
        for did, toks in tok.items():
            s = sum(llr(t) for t in toks) / len(toks)
            r = rows[did]
            assert r.n_tokens == len(toks)
            assert abs(r.nb_score - _r4(s)) < 1e-9
            assert r.pred_spam == (1 if s < 0 else 0)

    def test_separates_planted_band(self, spark):
        rows = classify.quality_nb_scores(spark, SF).collect()
        neg = [r.nb_score for r in rows
               if r.doc_id % classify.CLS_MOD in classify.NEG_RES]
        clean = [r.nb_score for r in rows
                 if r.doc_id % classify.CLS_MOD not in classify.NEG_RES]
        assert sum(neg) / len(neg) < sum(clean) / len(clean)
        # every spam-planted doc is flagged (the suffix dominates the
        # mean at sf0.001 doc lengths)
        flagged = [r.pred_spam for r in rows
                   if r.doc_id % classify.CLS_MOD in classify.NEG_RES]
        assert sum(flagged) / len(flagged) > 0.9


class TestLeakageSafeSplits:
    def test_clusters_share_split(self, spark):
        rows = classify.leakage_safe_splits(spark, SF).collect()
        docs = {r.doc_id: r for r in documents(spark, SF).collect()}
        assert {r.doc_id for r in rows} == set(docs)
        # recompute the exact-content clusters
        groups = collections.defaultdict(list)
        for did, d in docs.items():
            if did % DUP_PLANT_MOD == 0:
                body = f"boilerplate page {did % DUP_PLANT_K}"
            else:
                body = d.text
            groups[body].append(did)
        canon = {}
        for members in groups.values():
            m = min(members)
            for did in members:
                canon[did] = m
        by_doc = {r.doc_id: r for r in rows}
        for did, c in canon.items():
            assert by_doc[did].canonical_id == c
        # leakage safety: one split per cluster
        for members in groups.values():
            splits = {by_doc[did].split for did in members}
            assert len(splits) == 1
        # at least one multi-member cluster exists (planted)
        assert any(len(m) > 1 for m in groups.values())

    def test_split_fractions(self, spark):
        rows = classify.leakage_safe_splits(spark, SF).collect()
        n = len(rows)
        frac = collections.Counter(r.split for r in rows)
        assert 0.80 <= frac["train"] / n <= 0.97
        assert frac["val"] > 0 and frac["test"] > 0

    def test_deterministic(self, spark):
        a = [tuple(r) for r in
             classify.leakage_safe_splits(spark, SF).collect()]
        b = [tuple(r) for r in
             classify.leakage_safe_splits(spark, SF).collect()]
        assert a == b
