"""User-defined document properties (PropertyNames family).

Every pinned value below was verified against the compiled reference
binary (swish-e 2.5.8, -x/<prop> dumps and -T index_words; build
recipe in scripts/gen_refbin_fixtures.py).
"""

import io

import pytest

from swish_e_spark.config import ConfigError, parse_config
from swish_e_spark.textproc.docprops import (
    PropSpec, display, finalize, parse_number, specs_of,
)
from swish_e_spark.textproc.extractor import extract

S = PropSpec  # shorthand


def chunks(html, props, aliases=None, **kw):
    doc = extract(html, properties=frozenset(props),
                  prop_aliases=aliases or {}, **kw)
    return doc.prop_chunks


class TestCapture:
    def test_meta_and_element_append(self):
        # binary: author = "First Person Second Inline Bob" — trimmed
        # per chunk, single-space joined, element text captured when
        # the tag is both MetaName and PropertyName
        html = (b'<html><head><title>T8</title></head><body>'
                b'<meta name="author" content="  First Person ">'
                b'<meta name="author" content="Second">'
                b"<author>Inline Bob</author> body</body></html>")
        ch = chunks(html, {"author"},
                    metanames=frozenset({"author"}))
        assert finalize(S("author"), ch["author"]) == \
            "First Person Second Inline Bob"

    def test_interior_whitespace_kept_junction_single(self):
        # binary: "Two   Spaces  kept? lead space" — interior runs in
        # ONE chunk survive; chunk junctions collapse to one space
        html = (b'<html><body>'
                b'<meta name="cat" content="  Two   Spaces  kept? ">'
                b"<cat>  lead space</cat> x</body></html>")
        ch = chunks(html, {"cat"})
        assert finalize(S("cat"), ch["cat"]) == \
            "Two   Spaces  kept? lead space"

    def test_chunk_boundaries_at_tags(self):
        # binary: <cat>a  <b>x</b>  c</cat> stores "a x c"
        html = b"<html><body><cat>a  <b>x</b>  c</cat> z</body></html>"
        ch = chunks(html, {"cat"})
        assert finalize(S("cat"), ch["cat"]) == "a x c"

    def test_property_only_tag_text_still_indexes_plain(self):
        # binary: property-only element/meta text indexes under
        # swishdefault AND captures (tokens fruit@13 apple@14,
        # metaval@18)
        html = (b'<html><head><title>P</title></head><body>'
                b"pre <cat>Fruit Apple</cat> post"
                b'<meta name="onlyprop" content="MetaVal">'
                b" words onlyprop</body></html>")
        doc = extract(html, properties=frozenset({"cat", "onlyprop"}),
                      metanames=None)
        assert finalize(S("cat"), doc.prop_chunks["cat"]) == \
            "Fruit Apple"
        assert finalize(S("onlyprop"),
                        doc.prop_chunks["onlyprop"]) == "MetaVal"
        body = " ".join(e.text for e in doc.events)
        assert "Fruit Apple" in body and "MetaVal" in body

    def test_ignored_section_not_captured(self):
        # binary: IgnoreMetaTags secret inside <cat> → "before after"
        html = (b"<html><body><cat>before <secret>insecret</secret>"
                b" after</cat> z</body></html>")
        ch = chunks(html, {"cat"},
                    ignore_meta_tags=frozenset({"secret"}))
        assert finalize(S("cat"), ch["cat"]) == "before after"

    def test_meta_content_captures_into_open_prop(self):
        # binary: cat="aa metacontent bb", other="metacontent"
        html = (b"<html><body><cat>aa "
                b'<meta name="other" content="metacontent"> bb</cat>'
                b" z</body></html>")
        ch = chunks(html, {"cat", "other"})
        assert finalize(S("cat"), ch["cat"]) == "aa metacontent bb"
        assert finalize(S("other"), ch["other"]) == "metacontent"

    def test_prop_alias_capture(self):
        html = (b'<html><body><meta name="kitty" content="v"> x'
                b"</body></html>")
        ch = chunks(html, {"cat"}, aliases={"kitty": "cat"})
        assert finalize(S("cat"), ch["cat"]) == "v"

    def test_implied_close_bounds_capture(self):
        # binary (PropertyNameAlias description td): unclosed <td>
        # cells close at the next <td>/</tr>, so the property is
        # 'one cell two cell' — NOT the trailing body text (libxml2
        # fires end callbacks for implied closes)
        html = (b"<html><body><table><tr><td>one cell<td>two cell"
                b"</tr></table> after tail</body></html>")
        ch = chunks(html, {"description"},
                    aliases={"td": "description"})
        assert finalize(S("description"), ch["description"]) == \
            "one cell two cell"

    def test_xml_mode_capture(self):
        doc = extract(b"<all><cat>apple pie</cat><t>z</t></all>",
                      doctype="xml", properties=frozenset({"cat"}))
        assert finalize(S("cat"), doc.prop_chunks["cat"]) == \
            "apple pie"


class TestEncode:
    def test_numeric_strtoul_semantics(self):
        # binary warns and drops "2004-07-01" (trailing garbage)
        assert parse_number("42") == 42
        assert parse_number("  42") == 42
        assert parse_number("2004-07-01") is None
        assert parse_number("42x") is None
        assert parse_number("-1") is None
        assert parse_number("") is None

    def test_numeric_duplicate_dropped(self):
        # first value wins (addDocProperty warns on duplicates)
        assert finalize(S("p", kind="int"), ["7", "42"]) == 7

    def test_max_length_truncates(self):
        # binary: MaxLength 3 over Mango/ZEBRA/apple → Man/ZEB/app
        sp = S("cat", max_len=3)
        assert finalize(sp, ["Mango"]) == "Man"
        assert finalize(sp, ["ZEBRA"]) == "ZEB"

    def test_max_length_append_boundary(self):
        # binary (Mango + apple): max 6 → "Mango" (append_property
        # skips when propLen + space >= max_len, docprop.c:945-952 —
        # NOT "Mango " with a trailing space); max 7 → "Mango a";
        # max 8 → "Mango ap"
        assert finalize(S("c", max_len=6), ["Mango", "apple"]) == \
            "Mango"
        assert finalize(S("c", max_len=7), ["Mango", "apple"]) == \
            "Mango a"
        assert finalize(S("c", max_len=8), ["Mango", "apple"]) == \
            "Mango ap"

    def test_numeric_plus_sign(self):
        # strtoul accepts a leading '+' (and leading whitespace)
        assert parse_number("+42") == 42
        assert parse_number(" +42") == 42
        assert parse_number("+") is None

    def test_control_chars_strip_vs_nostrip(self):
        assert finalize(S("c"), ["a\x01\x02b"]) == "a b"
        assert finalize(S("c", nostrip=True), ["a\x01b"]) == "a\x01b"

    def test_date_display(self):
        # binary: <when> renders '2004-07-01 02:46:40 UTC'
        assert display(S("when", kind="date"), 1088650000) == \
            "2004-07-01 02:46:40 UTC"


class TestConfig:
    CONF = ("PropertyNames cat\n"
            "PropertyNamesNumeric price\n"
            "PropertyNamesDate when\n"
            "PropertyNamesCompareCase cat\n"
            "PropertyNamesMaxLength 3 cat\n"
            "PropertyNamesSortKeyLength 2 longcat\n"
            "PropertyNameAlias cat kitty\n")

    def test_parse(self):
        conf = parse_config(self.CONF)
        specs = specs_of(conf.kwargs["properties"])
        assert specs["cat"].ignore_case is False
        assert specs["cat"].max_len == 3
        assert specs["price"].kind == "int"
        assert specs["when"].kind == "date"
        assert specs["longcat"].sort_len == 2
        assert dict(conf.kwargs["prop_aliases"]) == {"kitty": "cat"}
        conf.to_index_config()  # constructs cleanly

    def test_redefinition_refused(self):
        with pytest.raises(ConfigError):
            parse_config("PropertyNames a\nPropertyNamesNumeric a\n")

    def test_flag_on_nonstring_refused(self):
        with pytest.raises(ConfigError):
            parse_config("PropertyNamesNumeric n\n"
                         "PropertyNamesIgnoreCase n\n")

    def test_alias_of_missing_base_refused(self):
        with pytest.raises(ConfigError):
            parse_config("PropertyNameAlias nosuch x\n")

    def test_reference_shipped_configs_parse(self):
        # a reference user's config file works: the repo's own shipped
        # configs parse with ZERO unknown directives (example3 uses
        # 'UndefinedMetaNames', stale even for the 2.5.8 binary —
        # parse_conffile.c only accepts UndefinedMetaTags)
        import glob
        import os

        from swish_e_spark.config import parse_config_file

        confs = (glob.glob("/root/reference/conf/example[1-3].config")
                 + glob.glob("/root/reference/tests/*.config"))
        if not confs:
            pytest.skip("reference tree not available")
        for f in sorted(confs):
            conf = parse_config_file(f)
            unknown = [d for d, _ in conf.unknown
                       if d.lower() != "undefinedmetanames"]
            assert unknown == [], os.path.basename(f)

    def test_stopwords_synonym(self):
        conf = parse_config("StopWords foo bar\n")
        assert set(conf.kwargs["stopwords"]) == {"foo", "bar"}


DOC_A = (b'<html><head><title>A</title></head><body>'
         b'<meta name="cat" content="ZEBRA">'
         b'<meta name="price" content="7">'
         b'<meta name="when" content="1088700000">'
         b"common word</body></html>")
DOC_B = (b'<html><head><title>B</title></head><body>'
         b'<meta name="cat" content="apple">'
         b'<meta name="price" content="42">'
         b'<meta name="when" content="1088600000">'
         b"common word</body></html>")
DOC_C = (b'<html><head><title>C</title></head><body>'
         b'<meta name="cat" content="Mango">'
         b'<meta name="price" content="19">'
         b'<meta name="when" content="1088650000">'
         b"common word</body></html>")


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index,
        )

        rows = [("a.html", DOC_A), ("b.html", DOC_B), ("c.html", DOC_C)]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "blob"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.col("blob").alias("html"),
                    F.lit("").alias("text"), F.lit("en").alias("lang")))
        out = str(tmp_path_factory.mktemp("props") / "idx")
        cfg = IndexConfig(
            n_buckets=4, stopwords=(),
            properties=(S("cat").to_tuple(),
                        S("price", kind="int").to_tuple(),
                        S("when", kind="date").to_tuple()),
            prop_aliases=(("kitty", "cat"),))
        build_index(spark, pages, out, cfg, n_shards=1)
        return IndexHandle(spark, out)

    def test_docs_columns(self, built):
        rows = {r["url"]: r for r in built.docs().collect()}
        assert rows["a.html"]["prop_cat"] == "ZEBRA"
        assert rows["b.html"]["prop_price"] == 42
        assert rows["c.html"]["prop_when"] == 1088650000

    def test_sort_ignore_case(self, built, spark):
        # binary: apple < Mango < ZEBRA (IgnoreCase default)
        from swish_e_spark.query.executor import SparkQueryEngine
        from swish_e_spark.query.output import ranked_results

        eng = SparkQueryEngine(spark, built)
        rows = ranked_results(eng, "common", k=5,
                              props=["cat"], sort=[("cat", "asc")])
        assert [r["cat"] for r in rows] == ["apple", "Mango", "ZEBRA"]
        # alias resolves for sort + fetch
        rows = ranked_results(eng, "common", k=5,
                              props=["kitty"], sort=[("kitty", "desc")])
        assert [r["kitty"] for r in rows] == \
            ["ZEBRA", "Mango", "apple"]

    def test_limits(self, built, spark):
        from swish_e_spark.query.executor import SparkQueryEngine

        eng = SparkQueryEngine(spark, built)
        docs = built.docs()
        # -L price 10 50 → B(42), C(19) — binary-pinned
        got = eng.search("common", k=5,
                         limits={"prop_price": (10, 50)})
        urls = {r["url"] for r in docs.filter(
            docs.doc_id.isin([d for d, _ in got])).collect()}
        assert urls == {"b.html", "c.html"}
        # string range case-folds: -L cat a n → apple, Mango
        got = eng.search("common", k=5,
                         limits={"prop_cat": ("a", "n")})
        urls = {r["url"] for r in docs.filter(
            docs.doc_id.isin([d for d, _ in got])).collect()}
        assert urls == {"b.html", "c.html"}

    def test_oracle_parity(self, built, spark):
        from swish_e_spark.oracle.engine import OracleIndex
        from swish_e_spark.query.executor import SparkQueryEngine
        from swish_e_spark.textproc.tokenizer import TokenizerConfig

        oidx = OracleIndex(
            TokenizerConfig(stopwords=frozenset()),
            properties=(S("cat").to_tuple(),
                        S("price", kind="int").to_tuple(),
                        S("when", kind="date").to_tuple()),
            prop_aliases=(("kitty", "cat"),))
        for url, blob in [("a.html", DOC_A), ("b.html", DOC_B),
                          ("c.html", DOC_C)]:
            oidx.add(url, blob, doctype="html")
        oidx.build()
        assert oidx.docs[0]["prop_cat"] == "ZEBRA"
        assert oidx.docs[1]["prop_price"] == 42
        eng = SparkQueryEngine(spark, built)
        for lim in ({"prop_price": (10, 50)}, {"prop_cat": ("a", "n")},
                    {"prop_when": (1088600000, 1088660000)}):
            got = eng.search("common", k=5, limits=lim)
            want = oidx.query("common", k=5, limits=lim)
            assert [d for d, _ in got] == [d for d, _ in want], lim

    def test_update_and_compact_preserve_props(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index,
        )
        from swish_e_spark.index.maintenance import (
            compact_index, update_documents,
        )

        def pages(rows):
            return (spark.createDataFrame(
                pd.DataFrame(rows, columns=["url", "blob"]))
                .select("url",
                        F.lit("2024-01-01").cast("timestamp")
                        .alias("warc_ts"),
                        F.col("blob").alias("html"),
                        F.lit("").alias("text"),
                        F.lit("en").alias("lang")))

        out = str(tmp_path / "idx")
        cfg = IndexConfig(n_buckets=4, stopwords=(),
                          properties=(S("cat").to_tuple(),
                                      S("price",
                                        kind="int").to_tuple()))
        build_index(spark, pages([("a.html", DOC_A),
                                  ("b.html", DOC_B)]), out, cfg,
                    n_shards=1)
        # -u: replace b.html with new property values, add c.html
        DOC_B2 = DOC_B.replace(b'content="apple"', b'content="pear"')
        update_documents(spark, pages([("b.html", DOC_B2),
                                       ("c.html", DOC_C)]), out)
        h = IndexHandle(spark, out)
        d = h.docs()
        rem = h.removed()
        if rem is not None:
            d = d.join(rem.select("doc_id"), "doc_id", "left_anti")
        live = {r["url"]: r for r in d.collect()}
        assert live["b.html"]["prop_cat"] == "pear"
        assert live["c.html"]["prop_price"] == 19
        # compaction keeps the typed columns
        compact_index(spark, out)
        h2 = IndexHandle(spark, out)
        rows = {r["url"]: r for r in h2.docs().collect()}
        assert rows["b.html"]["prop_cat"] == "pear"
        assert rows["a.html"]["prop_cat"] == "ZEBRA"
        assert rows["c.html"]["prop_price"] == 19

    def test_cli_surface(self, built, spark):
        from swish_e_spark.cli import main

        idx = built.out_dir

        def run(args):
            out = io.StringIO()
            rc = main(args + ["-f", idx, "-H", "0"], spark=spark,
                      out=out)
            assert rc == 0
            return [l for l in out.getvalue().splitlines()
                    if l and l != "."]

        got = run(["-w", "common", "-s", "cat",
                   "-x", "<swishtitle>|<cat>\\n"])
        assert got == ["B|apple", "C|Mango", "A|ZEBRA"]
        got = run(["-w", "common", "-s", "price",
                   "-x", "<swishtitle>|<price>\\n"])
        assert got == ["A|7", "C|19", "B|42"]
        got = run(["-w", "common", "-L", "price", "10", "50",
                   "-x", "<swishtitle>|<price>\\n"])
        assert sorted(got) == ["B|42", "C|19"]
        got = run(["-w", "common", "-x", "<swishtitle>|<when>\\n"])
        assert "A|2004-07-01 16:40:00 UTC" in got
        # -p appends the quoted value to the default line (binary pin)
        got = run(["-w", "common", "-p", "cat"])
        assert any(l.endswith(' "ZEBRA"') for l in got)
