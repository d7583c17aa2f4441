"""Chained-NEAR area semantics and tokenizer-config manifest
round-trip (VERDICT round-1 items 5 and 7)."""

import pandas as pd
import pytest

from swish_e_spark.index.builder import (
    IndexConfig, IndexHandle, build_index,
)
from swish_e_spark.oracle.engine import OracleIndex
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.query.positional import near_chain, split_series
from swish_e_spark.textproc.tokenizer import TokenizerConfig


def _pages(spark, rows):
    from pyspark.sql import functions as F

    return (spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"]))
        .select("url",
                F.lit("2024-01-01").cast("timestamp").alias("warc_ts"),
                F.encode("text", "utf-8").alias("html"),
                "text", F.lit("en").alias("lang")))


def _oracle(rows, cfg=None):
    oidx = OracleIndex(cfg or TokenizerConfig(stopwords=frozenset()))
    for url, text in rows:
        oidx.add(url, text.encode(), doctype="txt")
    return oidx.build()


class TestNearChainUnit:
    def test_split_series(self):
        assert split_series([1, 2, 3]) == [[1, 2, 3]]
        assert split_series([1, 0, 6]) == [[1], [6]]
        assert split_series([1, 2, 0, 6, 0, 9]) == [[1, 2], [6], [9]]

    def test_area_rule_rejects_pairwise_accept(self):
        """a@1 b@6 c@11, dist 5: each adjacent pair is within 5 but c
        is 10 from a — the reference's area rule rejects
        (KeepPos, /root/reference/src/search.c:1915-1975), while naive
        pairwise against merged {1,6} would accept."""
        step1 = near_chain([1], [6], 5)
        assert step1 == [1, 0, 6]
        assert near_chain(step1, [11], 5) is None

    def test_area_rule_accepts_tight_window(self):
        step1 = near_chain([1], [4], 5)
        assert near_chain(step1, [6], 5) is not None

    def test_kept_positions_filtered(self):
        # left positions not near any valid right position are dropped
        step1 = near_chain([1, 40], [4], 5)
        assert step1 == [1, 0, 4]


class TestNearChainEndToEnd:
    ROWS = [
        ("d0.txt", "alpha p q r s bravo p q r s charlie"),  # 1/6/11
        ("d1.txt", "alpha p q bravo charlie trailing words"),  # 1/4/5
        ("d2.txt", "alpha bravo p q r s s s s s charlie"),   # 1/2/11
        ("d3.txt", "charlie bravo alpha extra words here"),   # 3/2/1
        ("d4.txt", "alpha charlie p q r s bravo nothing"),    # 1/7/2
    ]

    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("nearchain"))
        build_index(spark, _pages(spark, self.ROWS), out,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        return SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_three_term_chain(self, engine):
        oracle = _oracle(self.ROWS)
        q = "alpha near5 bravo near5 charlie"
        want = oracle.query(q, k=10)
        got = engine.search(q, k=10)
        # d0 is the transcribed counterexample: adjacent pairs within
        # 5 but no 5-word area holds all three terms
        assert 0 not in {d for d, _ in want}
        assert {d for d, _ in want} == {1, 3}
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, es), (_, osc) in zip(got, want):
            assert es == pytest.approx(osc, rel=1e-6)

    def test_chain_through_and(self, engine):
        # AND's unsorted concat keeps series separators intact for an
        # enclosing NEAR; identity engine==oracle is the contract
        oracle = _oracle(self.ROWS)
        for q in ("alpha near3 bravo near3 charlie",
                  "alpha near10 bravo near10 charlie",
                  "alpha and bravo near5 charlie"):
            want = oracle.query(q, k=10)
            got = engine.search(q, k=10)
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (_, es), (_, osc) in zip(got, want):
                assert es == pytest.approx(osc, rel=1e-6)


class TestNearComposition:
    """NEAR composed with parenthesized NEAR and with OR: the posdata
    series separators (0s) must never be read as token positions.
    These are ABSOLUTE assertions, not engine==oracle identity — both
    sides share the kernels, so identity alone cannot catch a shared
    separator bug."""

    ROWS = [
        # doc 0: alpha near the start, bravo/charlie cluster far away
        ("r0.txt", "alpha " + "x " * 90 + "bravo charlie end"),
        # doc 1: alpha adjacent to the bravo/charlie cluster
        ("r1.txt", "filler " * 5 + "alpha bravo charlie end"),
        # doc 2: matches bravo near2 charlie; delta right next to it
        ("r2.txt", "pad pad bravo charlie delta tail words here"),
        # doc 3: matches via echo (the OR's other branch) next to delta
        ("r3.txt", "pad echo delta tail words here pad pad"),
        # doc 4: bravo/charlie pair but delta FAR away
        ("r4.txt", "bravo charlie " + "y " * 60 + "delta"),
    ]

    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("nearcomp"))
        build_index(spark, _pages(spark, self.ROWS), out,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        return SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_right_nested_near(self, engine):
        # alpha near5 (bravo near5 charlie): doc 0's alpha is 90+
        # words from the pair — a 0 separator in the right operand's
        # posdata must not be accepted as a matchable position
        oracle = _oracle(self.ROWS)
        q = "alpha near5 (bravo near5 charlie)"
        want = {d for d, _ in oracle.query(q, k=10)}
        got = {d for d, _ in engine.search(q, k=10)}
        assert want == {1}
        assert got == {1}

    def test_near_over_or(self, engine):
        # (bravo near2 charlie or echo) near3 delta: doc 2 matches via
        # the NEAR branch — its separator-carrying posdata must not be
        # sorted into an empty leading series; doc 3 via echo; doc 4's
        # delta is far from its pair
        oracle = _oracle(self.ROWS)
        q = "(bravo near2 charlie or echo) near3 delta"
        want = {d for d, _ in oracle.query(q, k=10)}
        got = {d for d, _ in engine.search(q, k=10)}
        assert want == {2, 3}
        assert got == {2, 3}

    def test_unit_right_separator_not_a_position(self):
        # |3 - 0| <= 5 must not match: 0 is a separator, not a token
        assert near_chain([3], [100, 0, 102], 5) is None
        assert near_chain([99], [100, 0, 102], 5) is not None


class TestTokenizerConfigRoundTrip:
    ROWS = [
        ("c0.txt", "naive cafe facade jalapeno supercalifragilistic"),
        ("c1.txt", "naïve café façade jalapeño"),
        ("c2.txt", "unrelated words entirely different"),
    ]

    def test_translate_and_word_len_persist(self, spark, tmp_path):
        """Custom TranslateCharacters map + max_word_len survive the
        build -> manifest -> reopen -> query round trip, so the query
        side tokenizes identically (VERDICT item 7; reference
        directive /root/reference/src/index.c:2632,
        /root/reference/src/config.h:203-215)."""
        out = str(tmp_path / "cfg")
        cfg = IndexConfig(n_buckets=4, stopwords=(),
                          translate_from="ïéçñ",
                          translate_to="ieco",  # ç -> c, ñ -> o (!)
                          max_word_len=12)
        build_index(spark, _pages(spark, self.ROWS), out, cfg,
                    n_shards=1)
        # reopen purely from the manifest — no in-memory cfg reuse
        handle = IndexHandle(spark, out)
        assert handle.cfg.translate_from == cfg.translate_from
        assert handle.cfg.max_word_len == 12
        eng = SparkQueryEngine(spark, handle)
        tok_cfg = handle.cfg.tokenizer_config()
        assert tok_cfg.max_word_len == 12
        oracle = _oracle(self.ROWS, tok_cfg)
        # the custom map folds the accented doc onto the ascii one,
        # but with ñ -> o (not the default n): query side must apply
        # the SAME map for jalapeoo to match doc 1
        # accented queries exercise the query-side map: with the
        # custom table "jalapeño" -> jalapeoo (doc 1 only), while the
        # default fold would give jalapeno (doc 0) — a divergence
        # between build-side and query-side maps fails the identity
        for q in ("naive", "cafe", "facade", "jalapeno",
                  "naïve", "café", "façade", "jalapeño"):
            want = oracle.query(q, k=10)
            got = eng.search(q, k=10)
            assert [d for d, _ in got] == [d for d, _ in want], q
        # 20-char word exceeds max_word_len=12 on BOTH sides: the
        # query tokenizer drops it, leaving an empty query
        from swish_e_spark.query.parser import QueryError

        with pytest.raises(QueryError):
            eng.search("supercalifragilistic", k=10)
        with pytest.raises(QueryError):
            oracle.query("supercalifragilistic", k=10)
        # sanity: with the default config that word WOULD index
        assert _oracle(self.ROWS).query("supercalifragilistic",
                                        k=10) != []
