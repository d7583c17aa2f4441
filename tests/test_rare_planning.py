"""Rare-leaf exact-doc planning, threshold caching, and the
exhaustive-path doc allowlist: losslessness + evidence counters.

These are the round-3 mechanisms that make block-max WAND and the
positional path pay on scattered rare terms: a df-64 term's single
128-posting block spans nearly the whole doc space, so range-granular
bounds can never prune around it — exact doc presence can."""

import pytest

from swish_e_spark.index.builder import (
    IndexConfig,
    IndexHandle,
    build_index,
    generate_pages_df,
)
from swish_e_spark.query.executor import SparkQueryEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rareplan"))
    pages = generate_pages_df(spark, 1200, partitions=8)
    build_index(spark, pages, out,
                IndexConfig(n_buckets=8, buzzwords=("c++",),
                            chunk_docs=32, salt_threshold=32,
                            flush_docs=50),
                n_shards=1)
    return SparkQueryEngine(spark, IndexHandle(spark, out))


class TestDictionaryCacheEviction:
    def test_cap_eviction_keeps_current_query_leaves(self, engine):
        """When inserting a new leaf trips the dictionary-cache cap,
        eviction must keep THIS query's already-cached leaves — the
        plan assembly reads every leaf of the query (regression: a
        blanket clear() left previously-cached leaves missing and the
        assembly raised KeyError)."""
        exact = engine.search_df("pigs OR wolf", 10,
                                 wand="off").collect()
        engine._chunk_meta_cache.clear()
        engine._chunk_meta_chunks = 0
        engine.search_df("pigs OR sugar", 10, wand="force").collect()
        assert engine._chunk_meta_cache  # warm: pigs + sugar
        engine._CHUNK_META_CACHE_CAP = 1  # next insert must evict
        try:
            got = engine.search_df("pigs OR wolf", 10,
                                   wand="force").collect()
        finally:
            del engine._CHUNK_META_CACHE_CAP
        key = [(r["doc_id"], round(r["score"], 9)) for r in exact]
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == key
        # the evicted-down cache still holds the query's own leaves
        assert ("swishdefault", "pigs") in engine._chunk_meta_cache
        assert ("swishdefault", "wolf") in engine._chunk_meta_cache
        engine._chunk_meta_cache.clear()
        engine._chunk_meta_chunks = 0


class TestThetaCache:
    @pytest.mark.parametrize("q", [
        "common0 OR wolf", "common0 OR tailterm0",
        "pigs AND wolf", "common0 NOT wolf"])
    def test_warm_repeat_identical_and_flagged(self, engine, q):
        engine._theta_cache.clear()
        cold = engine.search_df(q, 10, wand="force").collect()
        st_cold = dict(engine.last_wand_stats)
        warm = engine.search_df(q, 10, wand="force").collect()
        st_warm = dict(engine.last_wand_stats)
        exact = engine.search_df(q, 10, wand="off").collect()
        key = [(r["doc_id"], round(r["score"], 9)) for r in exact]
        assert [(r["doc_id"], round(r["score"], 9)) for r in cold] == key
        assert [(r["doc_id"], round(r["score"], 9)) for r in warm] == key
        assert st_cold["theta_cached"] is False
        assert st_warm["theta_cached"] is True

    def test_limits_bypass_the_cache(self, engine):
        # a θ cached from the unlimited query would over-prune the
        # limited result set — limits must never read or write it
        q = "common0 OR wolf"
        engine._theta_cache.clear()
        engine.search_df(q, 10, wand="force").collect()
        assert engine._theta_cache  # unlimited run populated it
        lim = {"lang": ("de", "de")}
        wand = engine.search_df(q, 10, limits=lim,
                                wand="force").collect()
        exact = engine.search_df(q, 10, limits=lim,
                                 wand="off").collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in wand] == \
            [(r["doc_id"], round(r["score"], 9)) for r in exact]


class TestRareExactPlanning:
    def test_rare_leaf_plans_with_exact_docs(self, engine):
        # tailterm0 df ≤ 3 « the rare cap: the planner must fetch its
        # exact docs and bound head blocks by presence, not range. At
        # 1,200 docs EVERY term is under the production cap (4,096),
        # so scale the cap to the corpus to single out the tail term.
        engine._theta_cache.clear()
        engine.RARE_EXACT_DF = 10
        try:
            wand = engine.search_df("common0 OR tailterm0", 10,
                                    wand="force").collect()
            st = engine.last_wand_stats
        finally:
            del engine.RARE_EXACT_DF
        assert st["exact_leaves"] >= 1
        exact = engine.search_df("common0 OR tailterm0", 10,
                                 wand="off").collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in wand] == \
            [(r["doc_id"], round(r["score"], 9)) for r in exact]

    def test_distributed_planner_uses_exact_docs(self, engine):
        # the many-chunks path (forced via WAND_MAX_CHUNKS=1) must
        # fetch the rare leaf's docs and refine head-block bounds by
        # presence inside the decode kernel — losslessly
        engine._theta_cache.clear()
        engine.WAND_MAX_CHUNKS = 1
        engine.RARE_EXACT_DF = 10
        try:
            wand = engine.search_df("common0 OR tailterm0", 10,
                                    wand="force").collect()
            st = dict(engine.last_wand_stats)
        finally:
            del engine.WAND_MAX_CHUNKS
            del engine.RARE_EXACT_DF
        assert st["mode"] == "distributed"
        assert st["exact_leaves"] == 1
        exact = engine.search_df("common0 OR tailterm0", 10,
                                 wand="off").collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in wand] == \
            [(r["doc_id"], round(r["score"], 9)) for r in exact]

    def test_all_rare_query_skips_exact_planning(self, engine):
        engine._theta_cache.clear()
        engine.search_df("tailterm0 OR tailterm1", 10,
                         wand="force").collect()
        assert engine.last_wand_stats["exact_leaves"] == 0


class TestExhaustiveAllowlist:
    @pytest.mark.parametrize("q", [
        "tailterm0 AND common0", "common0 NEAR5 tailterm0",
        "(tailterm0 AND common0) NOT wolf"])
    def test_allowlist_matches_unfiltered(self, engine, q):
        engine.exh_prune_min_docs = 10 ** 12  # allowlist off
        base = engine.search_df(q, 10, wand="off").collect()
        engine.exh_prune_min_docs = 0          # allowlist on
        try:
            out = engine.search_df(q, 10, wand="off").collect()
            st = engine.last_exh_stats
        finally:
            engine.exh_prune_min_docs = engine.EXH_PRUNE_MIN_DOCS
        assert [(r["doc_id"], round(r["score"], 9)) for r in out] == \
            [(r["doc_id"], round(r["score"], 9)) for r in base]
        assert st is not None and st.get("allow_docs", 0) >= 1

    def test_match_df_respects_allowlist_losslessly(self, engine):
        q = "tailterm0 AND common0"
        engine.exh_prune_min_docs = 10 ** 12
        base = sorted(r["doc_id"] for r in
                      engine.match_df(q).select("doc_id").collect())
        engine.exh_prune_min_docs = 0
        try:
            out = sorted(r["doc_id"] for r in
                         engine.match_df(q).select("doc_id").collect())
        finally:
            engine.exh_prune_min_docs = engine.EXH_PRUNE_MIN_DOCS
        assert out == base

    @pytest.mark.parametrize("q", [
        '"three little pigs"', "little NEAR5 wolf"])
    def test_cooccurring_leaves_skip_the_allowlist(self, engine, q):
        # phrase-template words appear only together: near-equal dfs
        # mean the filter would keep ~every posting — the benefit
        # gate must decline, and results stay correct either way
        engine.exh_prune_min_docs = 0
        try:
            out = engine.search_df(q, 10, wand="off").collect()
            st = engine.last_exh_stats
        finally:
            engine.exh_prune_min_docs = engine.EXH_PRUNE_MIN_DOCS
        assert not (st or {}).get("allow_docs")
        assert len(out) > 0

    def test_or_tree_gets_no_allowlist(self, engine):
        # OR has no required leaves: the allowlist must not engage
        engine.exh_prune_min_docs = 0
        try:
            engine.search_df("tailterm0 OR sugar", 10,
                             wand="off").collect()
            st = engine.last_exh_stats
        finally:
            engine.exh_prune_min_docs = engine.EXH_PRUNE_MIN_DOCS
        assert not (st or {}).get("allow_docs")
