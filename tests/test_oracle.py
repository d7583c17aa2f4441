"""Oracle engine behavior tests — the reference query set (FIXTURES.md §4)
evaluated on the deterministic synthetic corpus."""

import pytest

from swish_e_spark.datagen.pages import doctype_of_url, generate_rows
from swish_e_spark.oracle.engine import OracleIndex, bm25_idf
from swish_e_spark.query.parser import (
    And, AndNot, Near, Phrase, Prefix, QueryError, Term, WordsTooCommon,
    parse_query,
)
from swish_e_spark.textproc.tokenizer import TokenizerConfig


class TestParser:
    def test_implicit_and(self):
        node = parse_query("alpha beta")
        assert isinstance(node, And)

    def test_left_to_right_no_precedence(self):
        # (a OR b) AND c — reference has no precedence
        node = parse_query("alpha or beta gamma")
        assert isinstance(node, And)
        assert isinstance(node.left, type(parse_query("alpha or beta")))

    def test_not_rewrite_to_andnot(self):
        assert isinstance(parse_query("alpha not beta"), AndNot)
        assert isinstance(parse_query("alpha and not beta"), AndNot)

    def test_phrase_with_stopword_gap(self):
        # stopwords DROP from phrases with no positional gap — index
        # positions are transparent across stopwords (binary-verified:
        # "alpha the beta" matches adjacent alpha/beta)
        node = parse_query('"once upon a time"')
        assert isinstance(node, Phrase)
        assert node.terms == ("once", "upon", "time")

    def test_field_scope(self):
        node = parse_query("meta1=metatest1")
        assert node == Term("meta1", "metatest1")
        node = parse_query("meta1=(alpha or beta)")
        assert node.left == Term("meta1", "alpha")
        assert node.right == Term("meta1", "beta")

    def test_wildcard(self):
        assert parse_query("met*") == Prefix("swishdefault", "met")
        with pytest.raises(QueryError):
            parse_query("*met")

    def test_near(self):
        node = parse_query("alpha near5 beta")
        assert isinstance(node, Near) and node.distance == 5
        assert parse_query("alpha near beta").distance == 5

    def test_stopword_only_query(self):
        with pytest.raises(WordsTooCommon):
            parse_query("the and of")

    def test_stemmed_query(self):
        node = parse_query("running", TokenizerConfig(stem=True))
        assert node == Term("swishdefault", "run")


class TestOracleQueries:
    def test_single_term(self, oracle300):
        hits = oracle300.query("pigs", k=10)
        assert hits, "phrase docs contain pigs"
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)

    def test_and_subset_of_or(self, oracle300):
        a = {d for d, _ in oracle300.query("pigs AND wolf", k=1000)}
        o = {d for d, _ in oracle300.query("pigs OR wolf", k=1000)}
        assert a <= o and len(o) >= len(a)

    def test_andnot_excludes(self, oracle300):
        base = {d for d, _ in oracle300.query("common0", k=1000)}
        excl = {d for d, _ in oracle300.query("common0 NOT wolf", k=1000)}
        wolf = {d for d, _ in oracle300.query("wolf", k=1000)}
        assert excl == base - wolf

    def test_phrase_subset_of_and(self, oracle300):
        ph = {d for d, _ in oracle300.query('"three little pigs"', k=1000)}
        an = {d for d, _ in oracle300.query("three AND little AND pigs", k=1000)}
        assert ph and ph <= an

    def test_phrase_with_gap(self, oracle300):
        # "once upon a time" — 'a' is a stopword gap; template sentence
        # guarantees adjacency holds only with the gap respected
        ph = {d for d, _ in oracle300.query('"once upon a time"', k=1000)}
        assert ph

    def test_near_window(self, oracle300):
        n1 = {d for d, _ in oracle300.query("little NEAR5 wolf", k=1000)}
        n2 = {d for d, _ in oracle300.query("little NEAR50 wolf", k=1000)}
        an = {d for d, _ in oracle300.query("little AND wolf", k=1000)}
        assert n1 <= n2 <= an

    def test_field_scope(self, oracle300):
        m = {d for d, _ in oracle300.query("meta1=metatest1", k=1000)}
        assert m
        # those terms are not in the default field
        assert not oracle300.query("metatest1", k=1000)

    def test_prefix_wildcard(self, oracle300):
        m = {d for d, _ in oracle300.query("meta1=metatest*", k=1000)}
        assert m >= {d for d, _ in oracle300.query("meta1=metatest1", k=1000)}

    def test_head_term_skew(self, oracle300):
        hits = oracle300.query("common0", k=1000)
        assert len(hits) > oracle300.n_docs * 0.3

    def test_tail_term(self, oracle300):
        hits = oracle300.query("tailterm0", k=10)
        assert 1 <= len(hits) <= 3

    def test_words_too_common(self, oracle300):
        with pytest.raises(WordsTooCommon):
            oracle300.query("the")

    def test_latin1_fold(self, oracle300):
        # default keeps the accented form (reference WORDCHARS incl.
        # Latin-1; no default TranslateCharacters — binary-verified);
        # querying through the same tokenizer matches
        assert oracle300.query("espa\xf1a", k=10)
        assert not oracle300.query("espana", k=10)

    def test_buzzword(self, oracle300):
        assert oracle300.query("c++", k=10)

    def test_noindex_docs_absent(self, oracle300):
        # robots-noindex pages (noise template, doc_index % 40 == 9) skipped
        urls = {d["url"] for d in oracle300.docs.values()}
        from swish_e_spark.datagen.pages import page_url
        assert page_url(9) not in urls

    def test_limit_by_property(self, oracle300):
        all_hits = oracle300.query("common0", k=1000)
        lim = oracle300.query("common0", k=1000, limits={"lang": ("en", "en")})
        assert 0 < len(lim) <= len(all_hits)

    def test_deterministic_tiebreak(self, oracle300):
        h1 = oracle300.query("common0", k=50)
        h2 = oracle300.query("common0", k=50)
        assert h1 == h2

    def test_bm25_idf_monotonic(self):
        assert bm25_idf(1000, 1) > bm25_idf(1000, 100) > bm25_idf(1000, 999)


class TestStemmedIndex:
    def test_porter_identity(self):
        rows = list(generate_rows(80))
        idx = OracleIndex(TokenizerConfig(stem=True))
        for r in rows:
            idx.add(r["url"], r["html"], doctype=doctype_of_url(r["url"]))
        idx.build()
        run_docs = {d for d, _ in idx.query("run", k=1000)}
        running_docs = {d for d, _ in idx.query("running", k=1000)}
        assert run_docs and run_docs == running_docs
