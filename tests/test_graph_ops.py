"""Semantic pins for ops/graph.py beyond the DuckDB oracle gate:
pure-Python power-iteration recompute of the planted-graph PageRank,
plus mass-conservation and degree invariants."""

import collections
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import graph
from swish_e_spark.ops.corpus import documents

SF = "/root/testdata/sf0.001"


def _py_pagerank(n, iters=graph.PR_ITERS, d=graph.PR_D):
    edges = [(s, (s * m + c) % n)
             for s in range(n) for m, c in graph.LINK_RULES]
    edges += [(s, (s % graph.PR_HUBS) * 37 % n) for s in range(n)]
    deg = len(graph.LINK_RULES) + 1
    r = [1.0 / n] * n
    for _ in range(iters):
        nxt = [(1.0 - d) / n] * n
        for s, t in edges:
            nxt[t] += d * (r[s] / deg)
        r = nxt
    indeg = collections.Counter(t for _, t in edges)
    return r, indeg


class TestLinkPagerank:
    def test_matches_pure_python(self, spark):
        n = documents(spark, SF).count()
        # doc_ids are 0..n-1 in the testdata tables — the planted
        # modular rules rely on that; assert it rather than assume
        ids = sorted(r.doc_id
                     for r in documents(spark, SF)
                     .select("doc_id").collect())
        assert ids == list(range(n))
        exp_r, exp_deg = _py_pagerank(n)
        rows = {r.doc_id: r
                for r in graph.link_pagerank(spark, SF).collect()}
        assert set(rows) == set(range(n))
        for did in range(n):
            r = rows[did]
            assert r.in_deg == exp_deg.get(did, 0)
            assert abs(r.pr
                       - math.floor(exp_r[did] * 1e6 + 0.5) / 1e6) \
                < 1e-9, did

    def test_mass_conserved_and_rank_varies(self, spark):
        rows = graph.link_pagerank(spark, SF).collect()
        total = sum(r.pr for r in rows)
        assert abs(total - 1.0) < 1e-3
        # the gcd structure must create real rank spread, else the
        # test corpus would not exercise the iteration at all
        prs = [r.pr for r in rows]
        assert max(prs) > 1.5 * min(prs)
        degs = {r.in_deg for r in rows}
        assert len(degs) >= 2
