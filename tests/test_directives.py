"""Round-4 config-directive batch: MetaNameAlias, IgnoreMetaTags,
BumpPositionCounterCharacters, ExtractPath/ExtractPathDefault,
TruncateDocSize, HTMLLinksMetaName/ImageLinksMetaName/
IndexAltTagMetaName, AbsoluteLinks, IgnoreTotalWordCountWhenRanking.

Every absolute position pinned below was verified against the
compiled reference binary (swish-e 2.5.8, /tmp/swbuild — build recipe
in scripts/gen_refbin_fixtures.py) with -T index_words dumps; the
directive parse shapes against /root/reference/src/parse_conffile.c.
"""

import pytest

from swish_e_spark.config import ConfigError, parse_config
from swish_e_spark.textproc.extractor import IN_FILE, extract
from swish_e_spark.textproc.pathparts import (
    apply_op, merge_path_postings, path_part_events,
)
from swish_e_spark.textproc.tokenizer import TokenizerConfig, tokenize_doc

CFG = TokenizerConfig(stopwords=frozenset())


def _stream(doc, cfg=CFG):
    """[(field, term, pos)] sorted by position."""
    p, n = tokenize_doc(doc, cfg)
    out = [(f, t, pos) for (f, t), pl in p.items()
           for pos in pl.positions]
    return sorted(out, key=lambda x: x[2]), n


# --------------------------------------------------------------- ignore

class TestIgnoreMetaTags:
    def test_element_section(self):
        # binary: aa@5 bb@7 — section text dropped, bumps continue
        doc = extract(b"<html><body>aa <secret>x <b>y</b> z</secret>"
                      b" bb</body></html>",
                      ignore_meta_tags=frozenset({"secret"}))
        toks, _ = _stream(doc)
        assert toks == [("swishdefault", "aa", 5),
                        ("swishdefault", "bb", 7)]

    def test_meta_content_form(self):
        # binary: aa@4 bb@7 — content dropped, start+end bumps stay
        doc = extract(b'<html><body>aa <meta name="secret" '
                      b'content="x y z"> bb</body></html>',
                      ignore_meta_tags=frozenset({"secret"}))
        toks, _ = _stream(doc)
        assert toks == [("swishdefault", "aa", 4),
                        ("swishdefault", "bb", 7)]

    def test_known_html_tag_section(self):
        # binary (IgnoreMetaTags li): every list item's text drops —
        # including items closed IMPLICITLY by the next <li>/</ul> —
        # and the tail indexes at visible@10 tail@11
        doc = extract(b"<html><body><ul><li>secret words<li>second "
                      b"cell</ul> visible tail</body></html>",
                      ignore_meta_tags=frozenset({"li"}))
        toks, _ = _stream(doc)
        assert toks == [("swishdefault", "visible", 10),
                        ("swishdefault", "tail", 11)]

    def test_self_closing_section_closes_immediately(self):
        # binary: <meta2/> ≡ <meta2></meta2> (libxml2 fires start AND
        # end callbacks for self-closing tags in HTML mode) — alpha@5
        # bravo@7, NOT an ignore section left open dropping the rest
        # of the document
        for body in (b"alpha <meta2/> bravo", b"alpha <meta2></meta2> bravo"):
            doc = extract(b"<html><body>" + body + b"</body></html>",
                          ignore_meta_tags=frozenset({"meta2"}))
            toks, _ = _stream(doc)
            assert toks == [("swishdefault", "alpha", 5),
                            ("swishdefault", "bravo", 7)], body

    def test_self_closing_known_element_section(self):
        # binary (IgnoreMetaTags li): <li/> ≡ <li></li> — alpha@7
        # charlie@11 in both forms
        for li in (b"<li/>", b"<li></li>"):
            doc = extract(b"<html><body><ul>" + li +
                          b"alpha<li>bravo</li></ul> charlie"
                          b"</body></html>",
                          ignore_meta_tags=frozenset({"li"}))
            toks, _ = _stream(doc)
            assert toks == [("swishdefault", "alpha", 7),
                            ("swishdefault", "charlie", 11)], li

    def test_self_closing_emphasis_toggles_off(self):
        # binary: '<b/>bold' indexes bold WITHOUT the EM bit (the
        # immediate end callback closes the emphasis run)
        from swish_e_spark.textproc.extractor import IN_EMPHASIZED

        doc = extract(b"<html><body>alpha <b/>bold bravo"
                      b"</body></html>")
        assert not any(ev.structure & IN_EMPHASIZED
                       for ev in doc.events)

    def test_base_is_void_two_bumps(self):
        # binary: '<base>' == '<base/>' == '<base></base>' == +2 bumps
        # (void element: start and end callbacks both fire at the
        # open tag) — alpha@4 bravo@7 in all three forms
        for base in (b"<base>", b"<base/>", b"<base></base>"):
            doc = extract(b"<html><body>alpha " + base +
                          b" bravo</body></html>")
            toks, _ = _stream(doc)
            assert toks == [("swishdefault", "alpha", 4),
                            ("swishdefault", "bravo", 7)], base

    def test_nested_declared_meta_also_dropped(self):
        # text under a declared metaname inside the ignored section
        # is dropped too (the ignore stack wins)
        doc = extract(b"<html><body><secret><keep>inner</keep>"
                      b"</secret> out</body></html>",
                      ignore_meta_tags=frozenset({"secret"}),
                      metanames=frozenset({"keep"}))
        toks, _ = _stream(doc)
        assert [(f, t) for f, t, _ in toks] == [("swishdefault", "out")]


class TestKnownTagMetaScope:
    def test_declared_known_element_scopes(self):
        # binary (MetaNames li): item text indexes under field li with
        # the META bit — item@6 one@7 / item@10 two@11 (implicit
        # closes), plain@14 tail@15 back in swishdefault
        from swish_e_spark.textproc.extractor import IN_META

        doc = extract(b"<html><body><ul><li>item one<li>item two</ul>"
                      b" plain tail</body></html>",
                      metanames=frozenset({"li"}))
        toks, _ = _stream(doc)
        assert toks == [("li", "item", 6), ("li", "one", 7),
                        ("li", "item", 10), ("li", "two", 11),
                        ("swishdefault", "plain", 14),
                        ("swishdefault", "tail", 15)]
        p, _n = tokenize_doc(doc, CFG)
        assert p[("li", "item")].structures[0] & IN_META


class TestBumpPositionCounterChars:
    def test_binary_positions(self):
        # binary -T index_words over the same doc, chars ".,-":
        # aa@4 one@5 two@7 bb@8 cc@9 dd@11 ee@12 ff@14 gg@15 hh@17
        doc = extract(b"<html><body>aa one.two bb cc-dd ee ,ff gg.."
                      b" hh</body></html>")
        cfg = TokenizerConfig(stopwords=frozenset(),
                              bump_pos_chars=".,-")
        toks, n = _stream(doc, cfg)
        assert toks == [("swishdefault", w, p) for w, p in
                        [("aa", 4), ("one", 5), ("two", 7), ("bb", 8),
                         ("cc", 9), ("dd", 11), ("ee", 12), ("ff", 14),
                         ("gg", 15), ("hh", 17)]]
        assert n == 10  # bumps do not add to TotalWordsPerFile

    def test_dropped_token_still_bumps(self):
        # the bump applies even when the word itself is then dropped
        # (stopword / min length) — next_swish_word bumps before the
        # isokword/stopword checks (index.c:2444-2492)
        doc = extract(b"<html><body>aa the.the bb</body></html>")
        cfg = TokenizerConfig(stopwords=frozenset({"the"}),
                              bump_pos_chars=".")
        toks, _ = _stream(doc, cfg)
        assert toks == [("swishdefault", "aa", 4),
                        ("swishdefault", "bb", 6)]

    def test_off_means_identical_stream(self):
        raw = (b"<html><body>aa one.two bb cc-dd ee ,ff gg.. hh"
               b"</body></html>")
        base, n0 = _stream(extract(raw), CFG)
        cfg = TokenizerConfig(stopwords=frozenset(), bump_pos_chars="")
        off, n1 = _stream(extract(raw), cfg)
        assert off == base and n0 == n1


# ----------------------------------------------------------- metaalias

class TestMetaNameAlias:
    ALIASES = {"author2": "creator", "writer": "creator"}

    def test_meta_tag_resolves_to_base(self):
        doc = extract(b'<html><body><meta name="author2" '
                      b'content="alice smith">x</body></html>',
                      metanames=frozenset({"creator"}),
                      meta_aliases=self.ALIASES)
        fields = {ev.field_name for ev in doc.events}
        assert "creator" in fields and "author2" not in fields

    def test_element_form_resolves(self):
        doc = extract(b"<html><body><writer>bob</writer> y"
                      b"</body></html>",
                      metanames=frozenset({"creator"}),
                      meta_aliases=self.ALIASES)
        toks, _ = _stream(doc)
        assert ("creator", "bob") in {(f, t) for f, t, _ in toks}

    def test_xml_element_resolves(self):
        doc = extract(b"<all><writer>bob</writer><t>y</t></all>",
                      doctype="xml", metanames=frozenset({"creator"}),
                      meta_aliases=self.ALIASES)
        toks, _ = _stream(doc)
        assert ("creator", "bob") in {(f, t) for f, t, _ in toks}

    def test_query_parser_resolves(self):
        from swish_e_spark.query.parser import Term, parse_query

        cfg = TokenizerConfig(
            stopwords=frozenset(),
            meta_aliases=(("author2", "creator"),
                          ("writer", "creator")))
        node = parse_query("writer=bob", cfg)
        assert isinstance(node, Term) and node.field == "creator"


# --------------------------------------------------------- extractpath

class TestExtractPath:
    ENTRIES = (("pathmeta", ("regex", "!^.*/([^/]+)/[^/]+$!$1!")),
               ("othermeta", ("replace", "nomatch", "zzz")))
    DEFAULTS = (("othermeta", "defaultword"),)

    def test_binary_positions(self):
        # binary: deep@1(meta pathmeta) defaultword@2(meta othermeta),
        # structure IN_FILE, shared counter from 1, body from 5
        doc = extract(b"<html><body>aa <secret>x <b>y</b> z</secret>"
                      b" bb</body></html>")
        p, n = tokenize_doc(doc, CFG)
        merge_path_postings(p, "sub/deep/page.html", self.ENTRIES,
                            self.DEFAULTS, CFG)
        assert p[("pathmeta", "deep")].positions == [1]
        assert p[("pathmeta", "deep")].structures == [IN_FILE]
        assert p[("othermeta", "defaultword")].positions == [2]
        assert n == 5  # path words do not count toward doc_len

    def test_default_without_entry_indexes_nothing(self):
        evs = path_part_events("a/b.html", (),
                               (("othermeta", "dflt"),))
        assert evs == []

    def test_matched_entry_skips_default(self):
        evs = path_part_events(
            "x/nomatch/y.html",
            (("othermeta", ("replace", "nomatch", "zzz")),),
            (("othermeta", "dflt"),))
        assert [(e.field_name, e.text) for e in evs] == \
            [("othermeta", "x/zzz/y.html")]

    def test_ops(self):
        assert apply_op("a/b", "prepend", ("X",)) == ("Xa/b", True)
        assert apply_op("a/b", "append", ("X",)) == ("a/bX", True)
        assert apply_op("a/b", "remove", ("a/",)) == ("b", True)
        assert apply_op("a/b", "remove", ("zz",)) == ("a/b", False)
        out, m = apply_op("doc_12.html", "regex",
                          ("!_(\\d+)!-$1!",))
        assert (out, m) == ("doc-12.html", True)

    def test_shared_field_interleaves_sorted(self):
        # ExtractPath into a field the body also uses keeps position
        # lists sorted (shared per-doc position space)
        doc = extract(b"<html><body>deep words</body></html>")
        p, _ = tokenize_doc(doc, CFG)
        merge_path_postings(
            p, "sub/deep/page.html",
            (("swishdefault", ("regex", "!^.*/([^/]+)/[^/]+$!$1!")),),
            (), CFG)
        pl = p[("swishdefault", "deep")]
        assert pl.positions == sorted(pl.positions)
        assert len(pl.positions) == 2  # path@1 + body occurrence


# ------------------------------------------------------ links/alt/img

class TestLinksAltImages:
    RAW = (b'<html><body>pre words <a href="some/page.html">anchor '
           b'text</a> <img src="img/pic.png" alt="cute kitten"> post'
           b"</body></html>")

    def test_binary_positions_links_imgs_astext(self):
        # binary (HTMLLinksMetaName mylinks, ImageLinksMetaName
        # myimgs, IndexAltTagMetaName as-text): link words @4-6,
        # img src words @7-9, the buffered body run (incl. inline
        # alt) @10-16 — href/src index AT the tag, before the open
        # text run flushes, with no bumps and no META bit
        doc = extract(self.RAW, index_links=True, index_alt=True,
                      links_field="mylinks", images_field="myimgs",
                      alt_field=None,
                      metanames=frozenset({"mylinks", "myimgs"}))
        toks, n = _stream(doc)
        assert toks == [
            ("mylinks", "some", 4), ("mylinks", "page", 5),
            ("mylinks", "html", 6), ("myimgs", "img", 7),
            ("myimgs", "pic", 8), ("myimgs", "png", 9),
            ("swishdefault", "pre", 10), ("swishdefault", "words", 11),
            ("swishdefault", "anchor", 12),
            ("swishdefault", "text", 13), ("swishdefault", "cute", 14),
            ("swishdefault", "kitten", 15),
            ("swishdefault", "post", 16)]
        assert n == 13

    def test_binary_positions_named_alt(self):
        # binary (IndexAltTagMetaName myalt): run flushes @4-7, bump,
        # alt island @9-10 WITH the META bit, bump, post@12
        from swish_e_spark.textproc.extractor import IN_META

        doc = extract(self.RAW, index_alt=True, alt_field="myalt",
                      metanames=frozenset({"myalt"}))
        p, _ = tokenize_doc(doc, CFG)
        assert p[("myalt", "cute")].positions == [9]
        assert p[("myalt", "kitten")].positions == [10]
        assert p[("myalt", "cute")].structures[0] & IN_META
        assert p[("swishdefault", "post")].positions == [12]
        assert p[("swishdefault", "text")].positions == [7]

    def test_absolute_links(self):
        raw = (b'<html><head><base href="https://ex.com/dir/"></head>'
               b'<body><a href="page.html">x</a></body></html>')
        off = extract(raw, index_links=True)
        assert [e.text for e in off.events
                if e.field_name == "links"] == ["page.html"]
        on = extract(raw, index_links=True, absolute_links=True)
        assert [e.text for e in on.events
                if e.field_name == "links"] == \
            ["https://ex.com/dir/page.html"]
        # no <base>: the document url is the base (fprop->real_path)
        raw2 = b'<html><body><a href="p.html">x</a></body></html>'
        on2 = extract(raw2, index_links=True, absolute_links=True,
                      doc_url="http://h/d/i.html")
        assert [e.text for e in on2.events
                if e.field_name == "links"] == ["http://h/d/p.html"]


class TestStoreDescription:
    RAW = (b"<html><head><title>T</title></head><body>\n"
           b"intro words <desc>This is the Description text</desc>"
           b" outro words\n</body></html>")

    def test_tag_capture_byte_cap(self):
        # binary: 'StoreDescription HTML* <desc> 12' stores exactly
        # 'This is the ' (byte cap keeps the trailing space)
        d = extract(self.RAW, description_tag="desc",
                    description_size=12)
        assert d.description == "This is the "

    def test_body_tag_spans_children(self):
        # binary: '<body> 30' → 'intro words This is the Descri'
        d = extract(self.RAW, description_tag="body",
                    description_size=30)
        assert d.description == "intro words This is the Descri"

    def test_absent_tag_empty(self):
        d = extract(self.RAW, description_tag="nosuch",
                    description_size=30)
        assert d.description == ""

    def test_directive_parse(self):
        conf = parse_config("StoreDescription HTML* <desc> 12\n"
                            "StoreDescription TXT* 500\n")
        assert conf.kwargs["store_description"] == \
            (("html", "desc", 12), ("txt", None, 500))
        conf.to_index_config()

    def test_directive_requires_tag_for_html(self):
        with pytest.raises(ConfigError):
            parse_config("StoreDescription HTML 99\n")

    def test_xml_mode(self):
        d = extract(b"<all><summary>short text here</summary>"
                    b"<rest>more</rest></all>", doctype="xml",
                    description_tag="summary")
        assert d.description == "short text here"


class TestObeyRobotsNoIndex:
    RAW = (b'<html><head><meta name="robots" content="noindex">'
           b"</head><body>secretbody words</body></html>")

    def test_engine_default_obeys(self):
        assert extract(self.RAW).noindex is True

    def test_no_obey_indexes_with_binary_positions(self):
        # binary default (obeyRobotsNoIndex 0): page indexed,
        # secretbody@6 words@7, the robots meta bumps nothing
        doc = extract(self.RAW, obey_robots_noindex=False)
        assert doc.noindex is False
        toks, _ = _stream(doc)
        assert toks == [("swishdefault", "secretbody", 6),
                        ("swishdefault", "words", 7)]

    def test_directive(self):
        conf = parse_config("obeyRobotsNoIndex no\n")
        assert conf.kwargs["obey_robots_noindex"] is False
        assert not conf.unknown and not conf.ignored


class TestPhraseDelimiter:
    def test_cli_P(self, spark, tmp_path):
        # binary: -P \' makes 'aa bb' a phrase; a stray " is harmless
        import io

        from swish_e_spark.cli import main

        d = tmp_path / "docs"
        d.mkdir()
        (d / "x.html").write_bytes(
            b"<html><body>alpha beta gamma</body></html>")
        idx = str(tmp_path / "idx")
        assert main(["-i", str(d), "-f", idx], spark=spark,
                    out=io.StringIO()) == 0

        def hits(q, *extra):
            out = io.StringIO()
            rc = main(["-w", q, "-f", idx, "-H", "0", *extra],
                      spark=spark, out=out)
            assert rc == 0
            return [l for l in out.getvalue().splitlines()
                    if l and l != "." and not l.startswith("err")]

        assert hits("'alpha beta'", "-P", "'")        # adjacent
        assert not hits("'alpha gamma'", "-P", "'")   # not adjacent
        assert hits('alpha "beta', "-P", "'")         # stray " ok


class TestDebugDumps:
    def test_T_surface(self, spark, tmp_path):
        # -T introspection dumps (dump.c surface): header counts,
        # words-only byte order (numbers before letters, like the
        # binary), per-file word counts, metanames table
        import io

        from swish_e_spark.cli import main

        d = tmp_path / "docs"
        d.mkdir()
        (d / "x.html").write_bytes(
            b'<html><body><meta name="n" content="42">zeta alpha 9'
            b"</body></html>")
        idx = str(tmp_path / "idx")
        conf = tmp_path / "c"
        conf.write_text("PropertyNamesNumeric n\nMetaNames m\n"
                        "MetaNameAlias m malias\n")
        assert main(["-c", str(conf), "-i", str(d), "-f", idx],
                    spark=spark, out=io.StringIO()) == 0

        def run(*t):
            out = io.StringIO()
            assert main(["-f", idx, *t], spark=spark, out=out) == 0
            return out.getvalue().splitlines()

        words = run("-T", "index_words_only")
        assert words == sorted(words)           # byte order
        assert "42" in words and "zeta" in words
        hdr = run("-T", "index_header")
        assert any(l.startswith("# Total Words: ") for l in hdr)
        assert any(l == "# Total Files: 1" for l in hdr)
        wc = run("-T", "index_word_count")
        assert wc and wc[0].strip().startswith("4 ")  # 42 zeta alpha 9
        meta = run("-T", "index_metanames")
        assert any("META_PROP:NUMBER" in l for l in meta)
        assert any("alias -> m" in l for l in meta)
        files = run("-T", "index_files")
        assert any("File Number: 1" in l for l in files)
        assert any("prop_n: 42" in l for l in files)
        # unknown option refused like the binary
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            main(["-f", idx, "-T", "bogus_opt"], spark=spark,
                 out=io.StringIO())


class TestAutoProperties:
    def test_fmt_val_date_default(self):
        # binary default date rendering: '%Y-%m-%d %H:%M:%S UTC'
        # (getResultPropValue, result_output.c:1074-1086)
        import datetime as dt

        from swish_e_spark.query.output import _fmt_val

        v = dt.datetime(2026, 8, 19, 9, 10, 19, 328000)
        assert _fmt_val(v, None) == "2026-08-19 09:10:19 UTC"
        assert _fmt_val(v, "%Y") == "2026"

    def test_prop_col_auto_names(self):
        from swish_e_spark.query.output import _prop_col

        assert _prop_col("swishfilenum") == "filenum"
        assert _prop_col("swishdbfile") == "dbfile"
        assert _prop_col("swishlastmodified") == "warc_ts"


# ------------------------------------------------------------- config

class TestConfigDirectives:
    def test_full_batch(self):
        conf = parse_config(
            "MetaNames creator subject\n"
            "MetaNameAlias creator author2 writer\n"
            "IgnoreMetaTags secret nav\n"
            "BumpPositionCounterCharacters .,-\n"
            "TruncateDocSize 5000\n"
            "AbsoluteLinks yes\n"
            "IgnoreTotalWordCountWhenRanking 0\n"
            "ExtractPath pathmeta regex !^.*/([^/]+)/[^/]+$!$1!\n"
            "ExtractPathDefault pathmeta top\n"
            "HTMLLinksMetaName mylinks\n"
            "ImageLinksMetaName myimgs\n"
            "IndexAltTagMetaName myalt\n")
        kw = conf.kwargs
        assert dict(kw["meta_aliases"]) == {"author2": "creator",
                                            "writer": "creator"}
        assert set(kw["ignore_meta_tags"]) == {"secret", "nav"}
        assert kw["bump_pos_chars"] == ".,-"
        assert kw["truncate_doc_size"] == 5000
        assert kw["absolute_links"] is True
        assert kw["ignore_total_word_count"] is False
        assert kw["extract_path"] == \
            (("pathmeta", ("regex", "!^.*/([^/]+)/[^/]+$!$1!")),)
        assert kw["extract_path_defaults"] == (("pathmeta", "top"),)
        assert kw["index_links"] and kw["links_field"] == "mylinks"
        assert kw["images_field"] == "myimgs"
        assert kw["index_alt"] and kw["alt_field"] == "myalt"
        # addMetaEntry-style directives imply declared metanames
        assert {"pathmeta", "mylinks", "myimgs"} <= set(kw["metanames"])
        assert not conf.unknown
        cfg = conf.to_index_config()  # must construct cleanly
        assert dict(cfg.meta_aliases)["writer"] == "creator"

    def test_alt_as_text(self):
        conf = parse_config("IndexAltTagMetaName as-text\n")
        assert conf.kwargs["index_alt"] is True
        assert conf.kwargs["alt_field"] is None

    def test_alias_of_alias_refused(self):
        with pytest.raises(ConfigError):
            parse_config("MetaNames a\nMetaNameAlias a b\n"
                         "MetaNameAlias b c\n")

    def test_alias_base_must_be_metaname(self):
        with pytest.raises(ConfigError):
            parse_config("MetaNames a\nMetaNameAlias nosuch b\n")

    def test_alias_name_collision_refused(self):
        with pytest.raises(ConfigError):
            parse_config("MetaNames a b\nMetaNameAlias a b\n")

    def test_extract_path_default_redefinition_refused(self):
        with pytest.raises(ConfigError):
            parse_config("ExtractPathDefault m one\n"
                         "ExtractPathDefault m two\n")

    def test_extract_path_bad_op(self):
        with pytest.raises(ConfigError):
            parse_config("ExtractPath m frobnicate x\n")


# ------------------------------------------------------------ engine

class TestEndToEnd:
    DOCS = [
        ("sub/deep/a.html",
         b'<html><body><meta name="author2" content="alice smith">'
         b"aa <secret>hidden gold</secret> one.two bb"
         b'<a href="ln/x.html">t</a></body></html>'),
        ("sub/flat/b.html",
         b"<html><body><writer>bob</writer> gold cc.dd ee"
         b"</body></html>"),
        ("top.html",
         b"<html><body>plain gold text</body></html>"),
    ]

    @pytest.fixture(scope="class")
    def built(self, spark, tmp_path_factory):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index,
        )
        from swish_e_spark.query.executor import SparkQueryEngine

        cfg_kw = dict(
            stopwords=(),
            metanames=("creator", "pathmeta", "mylinks"),
            meta_aliases=(("author2", "creator"),
                          ("writer", "creator")),
            ignore_meta_tags=("secret",),
            bump_pos_chars=".",
            index_links=True, links_field="mylinks",
            extract_path=(
                ("pathmeta", ("regex", "!^.*/([^/]+)/[^/]+$!$1!")),),
            extract_path_defaults=(("pathmeta", "rootdoc"),),
        )
        pages = (spark.createDataFrame(
            pd.DataFrame(self.DOCS, columns=["url", "blob"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.col("blob").alias("html"),
                    F.lit("").alias("text"), F.lit("en").alias("lang")))
        out = str(tmp_path_factory.mktemp("dirx") / "idx")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, **cfg_kw), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        return eng, cfg_kw

    @pytest.fixture(scope="class")
    def oracle(self, built):
        from swish_e_spark.oracle.engine import OracleIndex

        _, cfg_kw = built
        oidx = OracleIndex(
            TokenizerConfig(stopwords=frozenset(),
                            meta_aliases=cfg_kw["meta_aliases"],
                            bump_pos_chars="."),
            index_links=True,
            metanames=frozenset(cfg_kw["metanames"]),
            meta_aliases=dict(cfg_kw["meta_aliases"]),
            ignore_meta_tags=frozenset(("secret",)),
            links_field="mylinks",
            extract_path=cfg_kw["extract_path"],
            extract_path_defaults=cfg_kw["extract_path_defaults"])
        for url, blob in self.DOCS:
            oidx.add(url, blob, doctype="html")
        oidx.build()
        return oidx

    @pytest.mark.parametrize("q", [
        "writer=alice", "author2=smith", "creator=bob", "gold",
        "creator=hidden", "pathmeta=deep", "pathmeta=rootdoc",
        "mylinks=ln*", '"one two"', "aa near2 bb",
    ])
    def test_engine_matches_oracle(self, built, oracle, q):
        eng, _ = built
        got = eng.search(q, k=10)
        want = oracle.query(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-6)

    def test_semantics(self, oracle):
        # alias + ignore + extractpath base expectations
        assert [d for d, _ in oracle.query("creator=alice", k=5)] == [0]
        assert oracle.query("creator=hidden", k=5) == []  # ignored
        assert oracle.query("hidden", k=5) == []
        # deep/a.html + flat/b.html match their dir part; top.html
        # takes the default
        assert [d for d, _ in oracle.query("pathmeta=deep", k=5)] == [0]
        assert [d for d, _ in oracle.query("pathmeta=flat", k=5)] == [1]
        assert [d for d, _ in
                oracle.query("pathmeta=rootdoc", k=5)] == [2]

    def test_truncate_doc_size(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index,
        )
        from swish_e_spark.query.executor import SparkQueryEngine

        # 14-byte cap over 'aaa bbb ccc ddd eee' keeps the partial
        # word 'dd' (binary-verified mid-word cut)
        rows = [("t.txt", b"aaa bbb ccc ddd eee")]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "blob"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.col("blob").alias("html"),
                    F.lit("").alias("text"), F.lit("en").alias("lang")))
        out = str(tmp_path / "trunc")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, stopwords=(),
                                truncate_doc_size=14), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        assert eng.search("dd", k=5)
        assert not eng.search("ddd", k=5)
        assert not eng.search("eee", k=5)
