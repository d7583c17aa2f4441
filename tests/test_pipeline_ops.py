"""Semantic pins for the corpus-curation ops (ops/pipeline.py) beyond
the DuckDB oracle gate: pure-Python recompute of the repetition and
contamination definitions, and the determinism/quota invariants of the
stratified sample."""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import pipeline
from swish_e_spark.ops.corpus import documents

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _r4(x):
    """Half-up 4-dp rounding — Spark's round() and DuckDB's round()
    both round 0.03125 -> 0.0313; Python's round() is banker's."""
    import math
    return math.floor(x * 10000 + 0.5) / 10000


def _pydocs(spark):
    return {r.doc_id: r for r in documents(spark, SF).collect()}


class TestQualityRepetition:
    def test_matches_pure_python(self, spark):
        rows = {r.doc_id: r
                for r in pipeline.quality_repetition(spark, SF).collect()}
        docs = _pydocs(spark)
        assert set(rows) == set(docs)
        for did, d in docs.items():
            toks = _toks(d.text)
            r = rows[did]
            assert r.n_tokens == len(toks)
            exp_dup = _r4(1.0 - len(set(toks)) / len(toks))
            assert abs(r.dup_word_frac - exp_dup) < 1e-9
            bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            if bigrams:
                cnt = collections.Counter(bigrams)
                top_c = max(cnt.values())
                # tie-break: count desc, bigram asc
                top = min(b for b, c in cnt.items() if c == top_c)
                assert r.top_bigram == top
                exp_frac = _r4(top_c / len(bigrams))
                assert abs(r.top_bigram_frac - exp_frac) < 1e-9

    def test_fractions_bounded(self, spark):
        for r in pipeline.quality_repetition(spark, SF).collect():
            assert 0.0 <= r.dup_word_frac < 1.0
            assert 0.0 <= r.top_bigram_frac <= 1.0


class TestContaminationOverlap:
    def test_matches_pure_python(self, spark):
        out = {r.doc_id: r
               for r in pipeline.contamination_overlap(spark, SF)
               .collect()}
        docs = _pydocs(spark)
        ev_grams = set()
        for did, d in docs.items():
            if did % pipeline.EVAL_MOD == 0:
                toks = _toks(d.text)
                ev_grams |= {" ".join(toks[i:i + 3])
                             for i in range(len(toks) - 2)}
        for did, d in docs.items():
            if did % pipeline.EVAL_MOD == 0:
                assert did not in out  # eval split excluded
                continue
            toks = _toks(d.text)
            grams = {" ".join(toks[i:i + 3])
                     for i in range(len(toks) - 2)}
            r = out[did]
            assert r.n_grams == len(grams)
            assert r.n_contaminated == len(grams & ev_grams)


class TestSampleStratified:
    def test_quota_and_determinism(self, spark):
        df = pipeline.sample_stratified(spark, SF)
        rows = df.collect()
        per_lang = collections.Counter(r.lang for r in rows)
        lang_totals = collections.Counter(
            r.lang for r in documents(spark, SF).collect())
        for lang, n in per_lang.items():
            assert n == min(pipeline.STRAT_QUOTA, lang_totals[lang])
            ranks = sorted(r.strat_rank for r in rows if r.lang == lang)
            assert ranks == list(range(1, n + 1))
        again = pipeline.sample_stratified(spark, SF).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestDomainStats:
    def test_share_sums_to_one(self, spark):
        rows = pipeline.domain_stats(spark, SF).collect()
        total = documents(spark, SF).count()
        assert sum(r.n_docs for r in rows) == total
        assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-2


class TestQualityUnigramLm:
    def test_matches_pure_python(self, spark):
        import math
        docs = _pydocs(spark)
        lm = collections.Counter(
            t for d in docs.values() for t in _toks(d.text))
        n_total = sum(lm.values())
        rows = {r.doc_id: r
                for r in pipeline.quality_unigram_lm(spark, SF)
                .collect()}
        assert set(rows) == set(docs)
        for did, d in docs.items():
            toks = _toks(d.text)
            r = rows[did]
            assert r.n_tokens == len(toks)
            exp_bits = (math.log2(n_total)
                        - sum(math.log2(lm[t]) for t in toks)
                        / len(toks))
            assert abs(r.bits_per_token - exp_bits) < 1e-3
            exp_rare = sum(1 for t in toks
                           if lm[t] <= pipeline.RARE_C) / len(toks)
            assert abs(r.rare_frac - _r4(exp_rare)) < 1e-9

    def test_bits_positive_and_bounded(self, spark):
        # -log2 p is positive; p >= 1/N so bits <= log2(N)
        import math
        docs = _pydocs(spark)
        n_total = sum(len(_toks(d.text)) for d in docs.values())
        for r in pipeline.quality_unigram_lm(spark, SF).collect():
            assert 0.0 < r.bits_per_token <= math.log2(n_total) + 1e-9


class TestIncrementalDedup:
    def test_matches_pure_python(self, spark):
        import hashlib

        def _body(did, text):
            if did % pipeline.DUP_PLANT_MOD == 0:
                return f"boilerplate page {did % pipeline.DUP_PLANT_K}"
            return text

        docs = _pydocs(spark)
        m = pipeline.DELTA_MOD
        base = {}
        for did in sorted(docs):
            if did % m != m - 1:
                h = hashlib.md5(_body(did, docs[did].text)
                                .encode("utf-8")).hexdigest()
                e = base.setdefault(h, [did, 0])
                e[1] += 1
        rows = {r.doc_id: r
                for r in pipeline.incremental_dedup(spark, SF)
                .collect()}
        delta = {d for d in docs if d % m == m - 1}
        assert set(rows) == delta
        for did in delta:
            h = hashlib.md5(_body(did, docs[did].text)
                            .encode("utf-8")).hexdigest()
            r = rows[did]
            assert r.content_md5 == h
            if h in base:
                assert (r.is_dup, r.base_doc_id, r.n_base_dups) == \
                    (1, base[h][0], base[h][1])
            else:
                assert (r.is_dup, r.base_doc_id, r.n_base_dups) == \
                    (0, -1, 0)

    def test_finds_planted_dups(self, spark):
        # the synthetic corpus has exact-dup texts (dedup_exact relies
        # on them) — the delta must rediscover at least one
        rows = pipeline.incremental_dedup(spark, SF).collect()
        assert any(r.is_dup == 1 for r in rows)


class TestMixtureWeights:
    def test_budget_and_cap_invariants(self, spark):
        docs = _pydocs(spark)
        per = collections.defaultdict(lambda: [0, 0])
        for d in docs.values():
            e = per[d.lang]
            e[0] += 1
            e[1] += len(_toks(d.text))
        total = sum(v[1] for v in per.values())
        uniform = total // len(per)
        rows = pipeline.mixture_weights(spark, SF).collect()
        assert {r.lang for r in rows} == set(per)
        for r in rows:
            n_docs, n_tokens = per[r.lang]
            assert (r.n_docs, r.n_tokens) == (n_docs, n_tokens)
            exp_eff = min(pipeline.MIX_MAX_UP * n_tokens, uniform)
            assert r.eff_tokens == exp_eff
            assert abs(r.mix_weight - _r4(exp_eff / n_tokens)) < 1e-9
            # the cap bounds every weight
            assert 0.0 < r.mix_weight <= pipeline.MIX_MAX_UP + 1e-9


class TestDupPassages:
    def _expected(self, spark):
        W = pipeline.PASSAGE_W
        docs = _pydocs(spark)
        per_doc = {}
        owners = collections.defaultdict(set)
        for did, d in docs.items():
            toks = _toks(d.text)
            ps = [" ".join(toks[i:i + W])
                  for i in range(0, len(toks) - W + 1, W)]
            per_doc[did] = ps
            for p in ps:
                owners[p].add(did)
        return per_doc, owners

    def test_matches_pure_python(self, spark):
        per_doc, owners = self._expected(spark)
        rows = {r.doc_id: r
                for r in pipeline.dup_passages(spark, SF).collect()}
        assert set(rows) == set(per_doc)
        for did, ps in per_doc.items():
            r = rows[did]
            assert r.n_passages == len(ps)
            exp_dup = sum(1 for p in ps if len(owners[p]) >= 2)
            assert r.n_dup_passages == exp_dup
            if ps:
                assert abs(r.dup_passage_frac
                           - _r4(exp_dup / len(ps))) < 1e-9
            else:
                assert r.dup_passage_frac == 0.0

    def test_catalog_matches_pure_python(self, spark):
        per_doc, owners = self._expected(spark)
        occ = collections.Counter(
            p for ps in per_doc.values() for p in ps)
        exp = {p: (len(ds), occ[p])
               for p, ds in owners.items() if len(ds) >= 2}
        rows = pipeline.dup_passage_catalog(spark, SF).collect()
        assert {r.passage: (r.n_docs, r.n_occ) for r in rows} == exp
        # ordering pin: most-widespread first, deterministic tiebreaks
        keys = [(-r.n_docs, -r.n_occ, r.passage) for r in rows]
        assert keys == sorted(keys)
