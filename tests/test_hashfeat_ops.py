"""Semantic pins for ops/hashfeat.py beyond the DuckDB oracle gate:
pure-Python recompute of the hashed TF-IDF vectors and the cosine
search, plus the unit-norm invariant."""

import collections
import hashlib
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import hashfeat
from swish_e_spark.ops.corpus import documents

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _bucket(t, dim=hashfeat.DIM):
    low = int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                         "little")
    return low % dim


def _py_vectors(docs):
    tf = {did: collections.Counter(_toks(t))
          for did, t in docs.items()}
    df = collections.Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(docs)
    out = {}
    for did, c in tf.items():
        raw = collections.defaultdict(float)
        for t, f in c.items():
            idf = math.log((n + 1.0) / (df[t] + 1.0)) + 1.0
            raw[_bucket(t)] += f * idf
        norm = math.sqrt(sum(v * v for v in raw.values()))
        out[did] = {b: v / norm for b, v in raw.items()}
    return out


class TestHashedTfidf:
    def test_matches_pure_python(self, spark):
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        exp = _py_vectors(docs)
        rows = collections.defaultdict(dict)
        for r in hashfeat.hashed_tfidf(spark, SF).collect():
            rows[r.doc_id][r.bucket] = r.w
        assert set(rows) == set(exp)
        for did, vec in exp.items():
            assert set(rows[did]) == set(vec)
            for b, v in vec.items():
                assert abs(rows[did][b]
                           - math.floor(v * 10000 + 0.5) / 10000) \
                    < 1e-6

    def test_unit_norm(self, spark):
        sq = collections.defaultdict(float)
        for r in hashfeat.hashed_tfidf(spark, SF).collect():
            sq[r.doc_id] += r.w * r.w
        for did, s in sq.items():
            assert abs(s - 1.0) < 1e-2  # rounded components

    def test_cosine_topk_matches_pure_python(self, spark):
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        vecs = _py_vectors(docs)
        q = vecs[0]
        sims = {}
        for did, v in vecs.items():
            if did == 0:
                continue
            s = sum(w * q[b] for b, w in v.items() if b in q)
            sims[did] = math.floor(s * 10000 + 0.5) / 10000
        exp = sorted(sims, key=lambda x: (-sims[x], x))[:10]
        rows = hashfeat.tfidf_cosine_topk(spark, SF).collect()
        assert [r.doc_id for r in rows] == exp
        for r in rows:
            assert abs(r.cos - sims[r.doc_id]) < 1e-6
