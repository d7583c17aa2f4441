"""Unit tests for the text pipeline: Porter, extractor, tokenizer.

Edge cases transcribed from the reference semantics (SURVEY.md §2.2-2.3);
fixture shapes mirror /root/reference/tests/*.html|txt|xml.
"""

from swish_e_spark.textproc.extractor import (
    DEFAULT_FIELD, IN_BODY, IN_COMMENTS, IN_EMPHASIZED, IN_FILE,
    IN_HEAD, IN_HEADER, IN_TITLE, TITLE_FIELD, extract,
)
from swish_e_spark.textproc.porter import porter_stem, stem_series
from swish_e_spark.textproc.tokenizer import TokenizerConfig, tokenize_doc


class TestPorter:
    def test_known_vectors(self):
        vectors = {
            "caresses": "caress", "ponies": "poni", "cats": "cat",
            "feed": "feed", "agreed": "agre", "plastered": "plaster",
            "motoring": "motor", "hopping": "hop", "falling": "fall",
            "happy": "happi", "relational": "relat", "rational": "ration",
            "operator": "oper", "feudalism": "feudal", "formative": "form",
            "electrical": "electr", "hopeful": "hope", "goodness": "good",
            "adjustable": "adjust", "replacement": "replac",
            "adoption": "adopt", "activate": "activ", "effective": "effect",
            "rate": "rate", "cease": "ceas", "roll": "roll",
            "running": "run", "runs": "run", "run": "run",
            "connection": "connect", "connected": "connect",
            "connecting": "connect", "differently": "differ",
        }
        for w, expected in vectors.items():
            assert porter_stem(w) == expected, w

    def test_short_words_unchanged(self):
        for w in ("a", "is", "be", ""):
            assert porter_stem(w) == w

    def test_stem_series_matches_scalar(self):
        toks = ["running", "runs", "connection", "running", "cats"]
        assert list(stem_series(toks)) == [porter_stem(t) for t in toks]


class TestExtractor:
    def test_title_and_body(self):
        doc = extract(b"<html><head><title>My Title</title></head>"
                      b"<body><p>hello world</p></body></html>")
        assert doc.title == "My Title"
        assert doc.body_text() == "hello world"

    def test_inline_tag_keeps_word_whole(self):
        # so<b>me</b>thing stays ONE token (flush-to-last-word,
        # /root/reference/src/parser.c:793-812)
        doc = extract(b"<body><p>so<b>me</b>thing else</p></body>")
        assert doc.body_text() == "something else"

    def test_block_tag_breaks_word(self):
        doc = extract(b"<body><p>fir</p><p>st</p></body>")
        assert doc.body_text() == "fir\nst"

    def test_structure_bits(self):
        # binary-verified bits: title words carry HEAD|TITLE (and live
        # in swishdefault — swishtitle is a property); h1 carries
        # HEADER|BODY (HEAD is the <head> element, not headings)
        doc = extract(b"<html><head><title>tw</title></head><body>"
                      b"<h1>hw</h1><p>pw <em>ew</em></p></body></html>")
        evs = {(ev.text.strip(), ev.structure) for ev in doc.events}
        assert ("tw", IN_FILE | IN_TITLE | IN_HEAD) in evs
        assert ("hw", IN_FILE | IN_BODY | IN_HEADER) in evs
        assert any(t.startswith("ew") and st & IN_EMPHASIZED
                   and st & IN_BODY for t, st in evs)

    def test_entities_decoded_and_latin1(self):
        doc = extract(b"<body><p>Espa&ntilde;a &amp; more \xe2\x82\xac</p></body>")
        text = doc.body_text()
        assert "Espa\xf1a" in text
        assert "&" in text
        # euro sign is not Latin-1 → replaced by space, collapsed
        assert "€" not in text
        # byte-identity artifact encodes clean to latin-1
        text.encode("latin-1")

    def test_meta_tags_become_fields(self):
        doc = extract(b'<head><meta name="meta1" content="metatest1 foo">'
                      b"</head><body>body</body>")
        fields = {ev.field_name for ev in doc.events}
        assert "meta1" in fields

    def test_robots_noindex(self):
        doc = extract(b'<head><meta name="robots" content="noindex"></head>'
                      b"<body>secret</body>")
        assert doc.noindex

    def test_noindex_comment_toggle(self):
        doc = extract(b"<body>seen <!-- noindex -->hidden<!-- index --> "
                      b"also</body>")
        assert "hidden" not in doc.body_text()
        assert "seen" in doc.body_text() and "also" in doc.body_text()

    def test_comment_indexing_flag(self):
        html = b"<body>x <!--keywords secretword--> y</body>"
        assert "secretword" not in extract(html).body_text()
        doc = extract(html, index_comments=True)
        comment_evs = [ev for ev in doc.events if ev.structure & IN_COMMENTS]
        assert comment_evs and "secretword" in comment_evs[0].text

    def test_script_style_content_indexed(self):
        # the reference has NO script/style special-casing: their text
        # is indexed; script is inline (isinline=2, no flush) so
        # adjacent text merges, style is non-inline (boundary+bump)
        doc = extract(b"<body>w1<script>var x=1;</script>"
                      b"<style>.a{}</style>visible</body>")
        txt = doc.body_text()
        assert "w1var" in txt and "visible" in txt and "a{}" in txt

    def test_self_closing_script_opens_no_scope(self):
        # XHTML-style <script src=.../> must not swallow the rest of
        # the document (regression: the start incremented the ignore
        # depth and no end ever closed it)
        doc = extract(b'<html><head><script src="app.js"/></head>'
                      b"<body><p>before</p><p>after</p></body></html>")
        assert "before" in doc.body_text()
        assert "after" in doc.body_text()

    def test_meta_inside_noindex_suppressed(self):
        # meta content inside a <!-- noindex --> section is dropped
        # like body text; robots-noindex still acts document-wide
        doc = extract(b'<body><!-- noindex -->'
                      b'<meta name="author" content="secret">'
                      b"<p>hidden</p><!-- index --><p>shown</p></body>")
        texts = {ev.text for ev in doc.events}
        assert not any("secret" in t for t in texts)
        assert any("shown" in t for t in texts)

    def test_unquoted_attr_trailing_slash(self):
        # '<a href=foo/>' is a START tag with value 'foo/' per
        # html.parser (HTML5 unquoted-value rules): both lexer paths
        # must agree — the fast path bails to html.parser here
        doc = extract(b"<body><a href=foo/>x</a> tail</body>",
                      index_links=True)
        links = [ev.text for ev in doc.events
                 if ev.field_name == "links"]
        assert links == ["foo/"]
        assert "x" in doc.body_text()

    def test_xml_tags_are_fields(self):
        doc = extract(b"<all><meta3>metatest3 word</meta3>"
                      b"<desc>descword</desc></all>", doctype="xml")
        fields = {ev.field_name for ev in doc.events}
        assert {"meta3", "desc"} <= fields
        assert "descword" in doc.body_text()

    def test_txt_lines(self):
        # TXT is ONE continuous stream (no bumps across lines —
        # binary-verified); body_text collapses whitespace
        doc = extract(b"line one\nline two\n", doctype="txt")
        assert doc.body_text() == "line one line two"
        assert doc.events[0].structure == IN_FILE

    def test_description_capped(self):
        doc = extract(("<body>" + "word " * 200 + "</body>").encode())
        assert len(doc.description) <= 200


class TestTokenizer:
    def test_positions_and_gaps(self):
        # stopwords are positionally TRANSPARENT (binary-verified:
        # alpha/beta stay adjacent); positions carry the structural
        # bumps (implied html +1, body +2, p +1 → first word at 5)
        doc = extract(b"<body><p>alpha the beta</p></body>")
        postings, doc_len = tokenize_doc(doc, TokenizerConfig())
        assert doc_len == 2  # indexed words only
        assert postings[(DEFAULT_FIELD, "alpha")].positions == [5]
        assert postings[(DEFAULT_FIELD, "beta")].positions == [6]
        assert (DEFAULT_FIELD, "the") not in postings

    def test_hard_break_bumps_position(self):
        doc = extract(b"<body><p>one</p><p>two</p></body>")
        postings, _ = tokenize_doc(doc, TokenizerConfig())
        p1 = postings[(DEFAULT_FIELD, "one")].positions[0]
        p2 = postings[(DEFAULT_FIELD, "two")].positions[0]
        assert p2 - p1 == 3  # </p> +1, <p> +1, plus the word gap —
        #                      phrases cannot cross blocks

    def test_max_word_len_dropped(self):
        doc = extract(("<body>" + "y" * 41 + " ok</body>").encode())
        postings, _ = tokenize_doc(doc, TokenizerConfig())
        terms = {t for _, t in postings}
        assert "y" * 41 not in terms and "ok" in terms

    def test_buzzword_bypasses_split(self):
        cfg = TokenizerConfig(buzzwords=frozenset({"c++"}))
        doc = extract(b"<body>c++ rocks</body>")
        postings, _ = tokenize_doc(doc, cfg)
        assert (DEFAULT_FIELD, "c++") in postings
        # without buzzword, c++ → "c"
        postings2, _ = tokenize_doc(doc, TokenizerConfig())
        assert (DEFAULT_FIELD, "c") in postings2

    def test_accent_fold(self):
        # the reference DEFAULT keeps accented letters (WORDCHARS
        # includes Latin-1, no default TranslateCharacters — binary
        # verified); the :ascii7:-style fold is opt-in
        from swish_e_spark.textproc.tokenizer import ASCII7_TRANSLATE

        doc = extract(b"<body><p>Espa&ntilde;a</p></body>")
        postings, _ = tokenize_doc(doc, TokenizerConfig())
        assert (DEFAULT_FIELD, "espa\xf1a") in postings
        postings2, _ = tokenize_doc(
            doc, TokenizerConfig(translate=ASCII7_TRANSLATE))
        assert (DEFAULT_FIELD, "espana") in postings2

    def test_stemming(self):
        doc = extract(b"<body>running runs</body>")
        postings, _ = tokenize_doc(doc, TokenizerConfig(stem=True))
        assert postings[(DEFAULT_FIELD, "run")].positions == [4, 5]

    def test_global_position_counter_across_fields(self):
        # one global per-doc counter (addword,
        # /root/reference/src/index.c:2396-2405)
        doc = extract(b"<html><head><title>tword</title></head>"
                      b"<body>bword</body></html>")
        postings, doc_len = tokenize_doc(doc, TokenizerConfig())
        pt = postings[(TITLE_FIELD, "tword")].positions[0]
        pb = postings[(DEFAULT_FIELD, "bword")].positions[0]
        assert pt < pb and doc_len >= 2


class TestBuzzAndUseWordSemantics:
    """BuzzWords and UseWords follow the reference's whole-word
    bypass semantics (/root/reference/src/index.c:2590-2625): matched
    words index VERBATIM, skipping stopwords, stemming, length and
    sanity checks; buzzword comparison happens after the
    Ignore{Last,First}Chars strip; UseWords checks the lowercased
    whitespace word before any sub-split."""

    def test_buzzwords_bypass_stopwords_and_stemming(self):
        from swish_e_spark.textproc.extractor import extract
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_doc, tokenize_query_text,
        )

        cfg = TokenizerConfig(
            buzzwords=frozenset({"the", "running", "c++"}),
            fuzzy="porter")
        doc = extract(b"the running order c++ works", doctype="txt")
        postings, doc_len = tokenize_doc(doc, cfg)
        terms = {t for (_f, t) in postings}
        assert {"the", "running", "c++", "order", "work"} <= terms
        assert "run" not in terms  # buzzword escaped the stemmer
        assert doc_len == 5
        assert tokenize_query_text("the running", cfg) == \
            ["the", "running"]

    def test_buzzword_matches_after_ignore_char_strip(self):
        from swish_e_spark.textproc.extractor import extract
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_doc,
        )

        cfg = TokenizerConfig(buzzwords=frozenset({"c++"}),
                              ignore_last_chars=".,")
        doc = extract(b"see c++. now", doctype="txt")
        postings, _ = tokenize_doc(doc, cfg)
        assert "c++" in {t for (_f, t) in postings}

    def test_use_words_whole_word_verbatim(self):
        from swish_e_spark.textproc.extractor import extract
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_doc, tokenize_query_text,
        )

        # 'foo-bar' is in the allowlist: the reference checks the
        # whole whitespace word, so it must index as one verbatim
        # term, never sub-split into foo/bar; 'running' stays
        # unstemmed even with a stemmer configured
        cfg = TokenizerConfig(
            use_words=frozenset({"foo-bar", "running"}),
            fuzzy="porter")
        doc = extract(b"foo-bar and running daily", doctype="txt")
        postings, doc_len = tokenize_doc(doc, cfg)
        got = {t: p.positions for (_f, t), p in postings.items()}
        # non-listed words are positionally transparent
        assert got == {"foo-bar": [1], "running": [2]}
        assert doc_len == 2
        assert tokenize_query_text("foo-bar running", cfg) == \
            ["foo-bar", "running"]


class TestTokenFilters:
    def test_use_words_allowlist(self):
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_query_text,
        )

        cfg = TokenizerConfig(stopwords=frozenset(),
                              use_words=frozenset({"spark", "hash"}))
        # non-listed words behave like stopword gaps
        assert tokenize_query_text("spark beats hash", cfg) == \
            ["spark", None, "hash"]

    def test_number_chars_drop(self):
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_query_text,
        )

        cfg = TokenizerConfig(stopwords=frozenset(),
                              number_chars="0123456789")
        assert tokenize_query_text("abc 123 a1b 456", cfg) == \
            ["abc", "a1b"]

    def test_begin_end_chars(self):
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_query_text,
        )

        cfg = TokenizerConfig(
            stopwords=frozenset(),
            begin_chars="abcdefghijklmnopqrstuvwxyz",
            end_chars="abcdefghijklmnopqrstuvwxyz0123456789")
        assert tokenize_query_text("good 9bad also2ok", cfg) == \
            ["good", "also2ok"]

    def test_doc_path_positions_consistent(self):
        from swish_e_spark.textproc.extractor import extract
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_doc,
        )

        cfg = TokenizerConfig(stopwords=frozenset(),
                              use_words=frozenset({"spark", "hash"}))
        doc = extract(b"spark beats hash daily", doctype="txt")
        postings, doc_len = tokenize_doc(doc, cfg)
        # only listed words index or consume positions
        assert doc_len == 2
        got = {t: p.positions for (f, t), p in postings.items()}
        assert got == {"spark": [1], "hash": [2]}

    def test_isokword_sanity(self):
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_query_text,
        )

        cfg = TokenizerConfig(stopwords=frozenset(), max_word_len=500,
                              max_consec=10, max_repeat=5)
        assert tokenize_query_text(
            "normal aaaaaaaaaaaaaaa bcdfgbcdfgbcd xxxxxxx ok", cfg) == \
            ["normal", "ok"]
        # defaults (60/100) leave realistic words alone
        d = TokenizerConfig(stopwords=frozenset())
        assert tokenize_query_text("supercalifragilistic", d) == \
            ["supercalifragilistic"]

    def test_isokword_reference_edges(self):
        """check.c:90-130 edge parity: a run of exactly
        IGNORESAME+1 identical chars is ACCEPTED (the counter counts
        repeats and rejects only > IGNORESAME); punctuation is
        TRANSPARENT to the vowel/consonant/digit row counters but not
        to the same-char counter."""
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_query_text,
        )

        cfg = TokenizerConfig(stopwords=frozenset(), max_word_len=500,
                              word_chars="abcdefghijklmnopqrstuvwxyz.-",
                              max_consec=10, max_repeat=5)
        # run of 6 (same-counter 5 = IGNORESAME): accepted;
        # run of 7 (counter 6 > IGNORESAME): rejected
        assert tokenize_query_text("koffffff kofffffff",
                                   cfg) == ["koffffff"]
        # 8 vowels split by '.' still counts as one 8-vowel row > 10?
        # no: 8 <= 10, accepted; 12 vowels with '.' gaps: rejected
        assert tokenize_query_text("baaaa.aaaab", cfg) == \
            ["baaaa.aaaab"]
        assert tokenize_query_text("baaaaaa.aaaaaab", cfg) == []

    def test_dont_bump_tags(self):
        from swish_e_spark.textproc.extractor import extract
        from swish_e_spark.textproc.tokenizer import (
            TokenizerConfig, tokenize_doc,
        )

        # DontBumpPositionOnMetaTags applies to META tags (unknown
        # elements), not to known html elements like <div>
        # (isDontBumpMetaName is checked only in start/end_metaTag,
        # /root/reference/src/parser.c:986-989,1117)
        html = b"<html><body>one<foo>two</foo>three</body></html>"
        cfg = TokenizerConfig(stopwords=frozenset())
        p_default, _ = tokenize_doc(extract(html), cfg)
        p_nobump, _ = tokenize_doc(
            extract(html, dont_bump_tags=frozenset({"foo"})), cfg)
        d = {t: p.positions for (f, t), p in p_default.items()}
        n = {t: p.positions for (f, t), p in p_nobump.items()}
        assert d["two"][0] - d["one"][0] == 2   # bumped: phrase gap
        assert n["two"][0] - n["one"][0] == 1   # adjacent
