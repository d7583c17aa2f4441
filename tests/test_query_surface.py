"""In-word ? wildcard (Pattern), multi-index tape merge, alt syntax."""

import pytest

from swish_e_spark.index.builder import (
    IndexConfig, IndexHandle, build_index, generate_pages_df,
)
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.query.multi import alt_to_boolean, search_multi
from swish_e_spark.query.parser import Pattern, QueryError, parse_query

CFG = dict(n_buckets=8, buzzwords=("c++",), chunk_docs=64,
           salt_threshold=32, flush_docs=50)


class TestPattern:
    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("pattern"))
        pages = generate_pages_df(spark, 300, partitions=6)
        build_index(spark, pages, out, IndexConfig(**CFG), n_shards=1)
        return SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_parse(self):
        node = parse_query("p?gs")
        assert isinstance(node, Pattern)
        assert node.pattern == "p?gs"
        assert node.regex() == "p.gs"
        assert node.literal_prefix() == "p"
        mid_star = parse_query("pi*s")
        assert isinstance(mid_star, Pattern)
        with pytest.raises(QueryError):
            parse_query("?pigs")

    @pytest.mark.parametrize("q", ["p?gs", "wol?", "pi*s",
                                   "meta1=metatest?", "p?g* AND wolf"])
    def test_rank_identity(self, q, engine, oracle300):
        got = engine.search(q, k=10)
        want = oracle300.query(q, k=10)
        assert len(got) == len(want)
        for (ed, es), (od, osc) in zip(got, want):
            assert ed == od
            assert es == pytest.approx(osc, rel=1e-6)

    def test_pattern_matches_terms(self, engine, oracle300):
        # sanity: p?gs expands to at least "pigs"
        got = engine.search("p?gs", k=10)
        assert got
        assert [d for d, _ in got] == \
            [d for d, _ in oracle300.query("p?gs", k=10)]

    def test_prefix_bypasses_stopwords_and_stemming(self, engine,
                                                    oracle300):
        """Trailing-* bodies expand against the word list verbatim
        (/root/reference/src/search.c:1662-1728): `the*` is NOT a
        stopword query, and a stemmed index is probed with the raw
        prefix, never its stem."""
        from swish_e_spark.query.parser import Prefix as PrefixNode

        node = parse_query("the*")  # default stopwords include 'the'
        assert isinstance(node, PrefixNode)
        assert node.prefix == "the"
        got = engine.search("the*", k=10)
        want = oracle300.query("the*", k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        # stemming must not rewrite the prefix body
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        stem_cfg = TokenizerConfig(fuzzy="porter")
        node = parse_query("running*", stem_cfg)
        assert isinstance(node, PrefixNode)
        assert node.prefix == "running"  # not the stem 'run'

    def test_number_of_hits_is_total_not_page(self, engine, oracle300):
        from swish_e_spark.query.output import search_info

        info = search_info(engine, "common0", k=5)
        assert len(info["results"]) == 5
        total = len(oracle300.query("common0", k=10 ** 6))
        assert info["number_of_hits"] == total > 5

    def test_delimiter_preserves_fmt_controls(self):
        from swish_e_spark.query.output import format_results

        import datetime

        rows = [{"rank": 1000, "url": "u", "title": "t",
                 "doc_len": 9,
                 "warc_ts": datetime.datetime(2024, 3, 1)}]
        out = format_results(rows, fmt="%r <warc_ts fmt=/%Y %m/>",
                             delimiter="|")
        assert out == ["1000|2024 03"]


class TestMultiIndexAndAlt:
    @pytest.fixture(scope="class")
    def engines(self, spark, tmp_path_factory):
        from pyspark.sql import functions as F

        base = tmp_path_factory.mktemp("multi")
        pages = generate_pages_df(spark, 300, partitions=6)
        urls = sorted(r.url for r in pages.select("url").collect())
        out = []
        for i, (lo, hi) in enumerate([(None, urls[150]),
                                      (urls[150], None)]):
            d = str(base / f"i{i}")
            sub = pages
            if lo:
                sub = sub.filter(F.col("url") >= lo)
            if hi:
                sub = sub.filter(F.col("url") < hi)
            build_index(spark, sub, d, IndexConfig(**CFG), n_shards=1)
            out.append(SparkQueryEngine(spark, IndexHandle(spark, d)))
        return out

    def test_tape_merge(self, engines):
        merged = search_multi(engines, "pigs", k=10)
        assert len(merged) == 10
        scores = [s for _, _, s in merged]
        assert scores == sorted(scores, reverse=True)
        # every merged row exists in its source engine's own top-10
        per = [dict(e.search("pigs", k=10)) for e in engines]
        for i, d, s in merged:
            assert per[i][d] == pytest.approx(s)
        # the merge is exactly the k best of the union
        union = sorted(((s, i, d) for i, p in enumerate(per)
                        for d, s in p.items()),
                       key=lambda t: (-t[0], t[1], t[2]))[:10]
        assert [(i, d, pytest.approx(s)) for s, i, d in union] == \
            [(i, d, pytest.approx(s)) for i, d, s in merged]

    def test_alt_syntax(self):
        assert alt_to_boolean("+pigs -wolf sugar") == \
            "(pigs) AND (sugar) NOT wolf"
        assert alt_to_boolean("pigs wolf") == "(pigs OR wolf)"
        assert alt_to_boolean("+a +b") == "(a AND b)"
        assert alt_to_boolean("-bad") == "NOT bad"

    def test_alt_end_to_end(self, engines):
        q = alt_to_boolean("+pigs -wolf sugar")
        r1 = engines[0].search(q, k=5)
        r2 = engines[0].search("(pigs) AND (sugar) NOT wolf", k=5)
        assert r1 == r2


class TestEdgeCorpora:
    def _pages_of(self, spark, rows):
        import pandas as pd
        from pyspark.sql import functions as F

        return (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))

    def test_empty_corpus(self, spark, tmp_path):
        out = str(tmp_path / "empty")
        pages = self._pages_of(spark, [("a.txt", "x")]) \
            .filter("url = 'zz'")
        meta = build_index(spark, pages, out, IndexConfig(n_buckets=4),
                           n_shards=1)
        assert meta["doc_count"] == 0
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        assert eng.search("anything", k=5) == []
        assert eng.handle.stats == {"n_docs": 0, "avgdl": 0.0,
                                    "total_len": 0, "total_pos": 0}

    def test_all_noindex_corpus(self, spark, tmp_path):
        out = str(tmp_path / "noidx")
        html = ('<html><head><meta name="robots" content="noindex">'
                '</head><body>x</body></html>')
        pages = self._pages_of(spark,
                               [(f"n{i}.html", html) for i in range(5)])
        meta = build_index(spark, pages, out, IndexConfig(n_buckets=4),
                           n_shards=1)
        assert meta["doc_count"] == 0
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        assert eng.search("x", k=5) == []

    def test_single_doc(self, spark, tmp_path):
        out = str(tmp_path / "one")
        pages = self._pages_of(spark, [("a.txt", "hello world")])
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        assert [d for d, _ in eng.search("hello", k=5)] == [0]


class TestLinksAlt:
    HTML = (b'<html><head><base href="https://ex.com/dir/">'
            b'<title>t</title></head><body>'
            b'<a href="page.html">anchor text</a> '
            b'<a href="https://other.org/x">ext</a> '
            b'<img src="i.png" alt="cute kitten"> body words'
            b'</body></html>')

    def test_extractor_links_alt(self):
        from swish_e_spark.textproc.extractor import (
            ALT_FIELD, LINKS_FIELD, extract,
        )

        doc = extract(self.HTML, index_links=True, index_alt=True)
        links = [e.text for e in doc.events
                 if e.field_name == LINKS_FIELD]
        # AbsoluteLinks defaults OFF: hrefs index VERBATIM even with a
        # <base> tag (extract_html_links only calls xmlBuildURI under
        # sw->AbsoluteLinks, /root/reference/src/parser.c:1845-1852)
        assert links == ["page.html", "https://other.org/x"]
        alts = [e.text for e in doc.events if e.field_name == ALT_FIELD]
        assert alts == ["cute kitten"]
        # AbsoluteLinks ON resolves against <base> (falling back to
        # the doc url when absent)
        fixed = extract(self.HTML, index_links=True, index_alt=True,
                        absolute_links=True, doc_url="http://me/a.html")
        flinks = [e.text for e in fixed.events
                  if e.field_name == LINKS_FIELD]
        assert flinks == ["https://ex.com/dir/page.html",
                          "https://other.org/x"]
        # off by default: no link/alt events, body text unchanged
        plain = extract(self.HTML)
        assert not [e for e in plain.events
                    if e.field_name in (LINKS_FIELD, ALT_FIELD)]

    def test_engine_field_scoped_link_search(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.oracle.engine import OracleIndex
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        rows = [("a.html", self.HTML),
                ("b.html", b"<html><body>no links here</body></html>")]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "blob"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.col("blob").alias("html"),
                    F.lit("").alias("text"), F.lit("en").alias("lang")))
        out = str(tmp_path / "links")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, stopwords=(),
                                index_links=True, index_alt=True),
                    n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        oidx = OracleIndex(TokenizerConfig(stopwords=frozenset()),
                           index_links=True, index_alt=True)
        for url, blob in rows:
            oidx.add(url, blob, doctype="html")
        oidx.build()
        for q in ["links=other", "alt=kitten", "links=ex*"]:
            got = eng.search(q, k=5)
            want = oidx.query(q, k=5)
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (_, es), (_, osc) in zip(got, want):
                assert es == pytest.approx(osc, rel=1e-6)
        assert [d for d, _ in eng.search("alt=kitten", k=5)] == [0]


class TestXmlAttributes:
    XML = (b'<?xml version="1.0"?><root>'
           b'<foo bar="bazval" class="kind">inner text</foo>'
           b'<plain>more words</plain></root>')

    def test_extractor(self):
        from swish_e_spark.textproc.extractor import extract

        doc = extract(self.XML, doctype="xml", xml_attributes=True,
                      xml_class_attributes=True)
        fields = [(e.field_name, e.text) for e in doc.events]
        assert ("foo.bar", "bazval") in fields
        assert ("foo.kind", "inner text") in fields
        assert ("plain", "more words") in fields
        # default: plain tag metanames, attrs ignored
        plain = extract(self.XML, doctype="xml")
        assert [(e.field_name, e.text) for e in plain.events] == \
            [("foo", "inner text"), ("plain", "more words")]

    def test_oracle_query_attr_metaname(self):
        from swish_e_spark.oracle.engine import OracleIndex
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        oidx = OracleIndex(TokenizerConfig(stopwords=frozenset()),
                           xml_attributes=True,
                           xml_class_attributes=True)
        oidx.add("d.xml", self.XML, doctype="xml")
        oidx.build()
        assert [d for d, _ in oidx.query("foo.bar=bazval", k=5)] == [0]
        assert [d for d, _ in oidx.query("foo.kind=inner", k=5)] == [0]
        assert oidx.query("foo.bar=missing", k=5) == []


class TestWordCharacters:
    def test_custom_word_chars_rank_identity(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.oracle.engine import OracleIndex
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        rows = [("a.txt", "don't stop the o'clock --dash-- word"),
                ("b.txt", "dont stop words apart"),
                ("c.txt", "o'clock strikes 'twice' tonight")]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))
        out = str(tmp_path / "wc")
        wc = "abcdefghijklmnopqrstuvwxyz0123456789'-"
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, stopwords=(),
                                word_chars=wc, ignore_first_chars="'-",
                                ignore_last_chars="'-"),
                    n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        oidx = OracleIndex(TokenizerConfig(
            stopwords=frozenset(), word_chars=wc,
            ignore_first_chars="'-", ignore_last_chars="'-"))
        for url, text in rows:
            oidx.add(url, text.encode(), doctype="txt")
        oidx.build()
        for q in ["don't", "o'clock", "dash", "twice"]:
            got = eng.search(q, k=5)
            want = oidx.query(q, k=5)
            assert [d for d, _ in got] == [d for d, _ in want], q
            for (_, es), (_, osc) in zip(got, want):
                assert es == pytest.approx(osc, rel=1e-6)
        # "don't" is ONE term now: doc b ("dont") must NOT match it
        assert 1 not in {d for d, _ in eng.search("don't", k=5)}
        # default config splits don't -> don, t
        out2 = str(tmp_path / "wc2")
        build_index(spark, pages, out2,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        e2 = SparkQueryEngine(spark, IndexHandle(spark, out2))
        assert {d for d, _ in e2.search("don", k=5)} == {0}


class TestNestedMetanames:
    XML = (b'<?xml version="1.0"?><doc><sec><para>nested words here'
           b'</para></sec><solo>alone</solo></doc>')

    def test_fan_out(self):
        from swish_e_spark.oracle.engine import OracleIndex
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        oidx = OracleIndex(TokenizerConfig(stopwords=frozenset()),
                           xml_nested_metanames=True)
        oidx.add("d.xml", self.XML, doctype="xml")
        oidx.build()
        # "nested" indexes under every open tag at the SAME position
        for field in ("doc", "sec", "para"):
            assert [d for d, _ in
                    oidx.query(f"{field}=nested", k=5)] == [0], field
        pos = {f: oidx.postings[(f, "nested")][0][0]
               for f in ("doc", "sec", "para")}
        assert len(set(tuple(p) for p in pos.values())) == 1
        # default: only the innermost tag names the field
        plain = OracleIndex(TokenizerConfig(stopwords=frozenset()))
        plain.add("d.xml", self.XML, doctype="xml")
        plain.build()
        assert ("para", "nested") in plain.postings
        assert ("doc", "nested") not in plain.postings


class TestEmbeddingApi:
    def test_swish_api_lifecycle(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from swish_e_spark.api import SwishSparkEngine

        pages = generate_pages_df(spark, 200, partitions=4)
        urls = sorted(r.url for r in pages.select("url").collect())
        d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
        build_index(spark, pages.filter(F.col("url") < urls[100]), d1,
                    IndexConfig(**CFG), n_shards=1)
        build_index(spark, pages.filter(F.col("url") >= urls[100]), d2,
                    IndexConfig(**CFG), n_shards=1)

        sw = SwishSparkEngine(spark, d1)
        res = sw.query("pigs", k=5)
        assert res.hits > 0
        first = res.next_result()
        assert first["reccount"] == 1 and first["url"]
        rest = list(res)
        assert len(rest) == res.hits - 1
        res.seek(0)
        again = res.next_result()
        assert again["doc_id"] == first["doc_id"]

        multi = SwishSparkEngine(spark, [d1, d2])
        mres = multi.query("pigs", k=6)
        ranks = [r["rank"] for r in mres]
        assert ranks == sorted(ranks, reverse=True)
        assert {r["index"] for r in mres} <= {0, 1}

        stemmy = sw.fuzzy_word("Running")
        assert stemmy == "running"  # stem off by default
        hdr = sw.header()
        assert hdr["doc_count"] > 0

    def test_swish_api_snapshot_pin(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from swish_e_spark.api import SwishSparkEngine
        from swish_e_spark.index.builder import IndexHandle
        from swish_e_spark.index.maintenance import remove_documents

        pages = generate_pages_df(spark, 80, partitions=2)
        d = str(tmp_path / "pin")
        build_index(spark, pages, d, IndexConfig(**CFG), n_shards=1)
        v1 = IndexHandle(spark, d).meta["snapshot"]

        pinned = SwishSparkEngine(spark, d, snapshot=v1)
        before = [(r["doc_id"], r["rank"])
                  for r in pinned.query("pigs", k=20)]
        victims = sorted(r.url for r in pages.select("url").collect()
                         )[:5]
        n = remove_documents(spark, d, victims)
        assert n >= 1
        # the pinned facade still serves the v1 result set
        assert [(r["doc_id"], r["rank"])
                for r in pinned.query("pigs", k=20)] == before
        # a fresh current facade sees the removal
        cur = SwishSparkEngine(spark, d)
        assert cur.query("pigs", k=20).hits <= len(before)
