"""Differential validation of the fast HTML lexer vs the stdlib
html.parser path: identical ExtractedDoc output on the datagen corpus,
on adversarial fragments (which mostly bail to html.parser), and under
random mutation fuzz."""

import random

import pytest

from swish_e_spark.datagen.pages import generate_rows
from swish_e_spark.textproc.extractor import (
    _SwishHTMLParser, _fast_feed, extract_html,
)


def _slow_doc(raw, **kw):
    p = _SwishHTMLParser(**kw)
    p.feed(raw)
    p.close()
    p._flush()
    return p.doc


def _fast_doc(raw, **kw):
    p = _SwishHTMLParser(**kw)
    if not _fast_feed(p, raw):
        return None
    p._flush()
    return p.doc


def _events(doc):
    return [(e.field_name, e.text, e.structure, e.hard_break, e.fields)
            for e in doc.events]


def _assert_same(raw, **kw):
    fast = _fast_doc(raw, **kw)
    slow = _slow_doc(raw, **kw)
    if fast is not None:
        assert _events(fast) == _events(slow), raw[:200]
        assert fast.noindex == slow.noindex


class TestDatagenCorpus:
    def test_corpus_identical_and_mostly_fast(self):
        n_fast = 0
        rows = list(generate_rows(1500))
        for r in rows:
            raw = r["html"].decode("utf-8", "replace")
            fast = _fast_doc(raw)
            slow = _slow_doc(raw)
            if fast is not None:
                n_fast += 1
                assert _events(fast) == _events(slow), r["url"]
                assert fast.noindex == slow.noindex
        # the fast path must actually cover the corpus, not just exist
        assert n_fast / len(rows) > 0.9, n_fast

    def test_extract_html_end_to_end_unchanged(self):
        # public surface: title/description/events through extract_html
        for r in generate_rows(200):
            doc = extract_html(r["html"])
            ref = _slow_doc(r["html"].decode("utf-8", "replace"))
            assert _events(doc) == _events(ref)


ADVERSARIAL = [
    "a < b and c > d",
    "<b>unclosed bold and more",
    "text <",
    "<p>x</p><!-- noindex -->hidden<!-- index -->shown",
    "<!-- never closed",
    "<![CDATA[ raw <b>stuff</b> ]]>after",
    "<!DOCTYPE html><p>ok</p>",
    "<!DOCTYPE html [ <!ENTITY x 'y'> ]><p>subset</p>",
    "<?php echo '>'; ?><p>pi</p>",
    '<a href="x>y">weird</a>',
    "<p title='it''s'>quotes</p>",
    "<script>if (a<b && c>d) {}</script><p>after</p>",
    "<script>never closed",
    "<style>p > em { color: red }</style><p>css</p>",
    "<br/><hr />self<img/>",
    "<p>&amp; &lt;tag&gt; &#65; &#x42; &unknown; &amp</p>",
    "<P><EM>CASE</EM></P>",
    "<meta name=\"keywords\" content=\"a &amp; b\"><p>m</p>",
    "<meta name=robots content=noindex><p>gone</p>",
    "<title>t &amp; t</title><h1>h</h1>body",
    "<div\nclass='x'\n>multiline</div>",
    "<3 hearts",
    "</weird attr>tolerant?",
    "", "   ", "plain text only",
    "<em>flush<b>to</b>last</em> word",
]


class TestAdversarial:
    @pytest.mark.parametrize("raw", ADVERSARIAL)
    def test_fragment(self, raw):
        _assert_same(raw)

    @pytest.mark.parametrize("raw", ADVERSARIAL)
    def test_fragment_with_options(self, raw):
        _assert_same(raw, index_comments=True)
        _assert_same(raw, index_links=True, index_alt=True)


class TestMutationFuzz:
    def test_random_mutations(self):
        """Mutate real corpus docs with risky edits; every doc the fast
        path ACCEPTS must match html.parser exactly."""
        rng = random.Random(20260817)
        frags = ["<", ">", "&", "&#65;", "<!--x-->", "<b>", "</b>",
                 '<a href="u">', "<!doctype html>", "<?pi?>", "\x00",
                 "<script>x<y</script>", "'", '"', "<em>", "</em>",
                 "<meta name=a content=b>"]
        rows = [r["html"].decode("utf-8", "replace")
                for r in generate_rows(60)]
        checked = accepted = 0
        for raw in rows:
            for _ in range(6):
                i = rng.randrange(len(raw))
                mutated = raw[:i] + rng.choice(frags) + raw[i:]
                fast = _fast_doc(mutated)
                checked += 1
                if fast is None:
                    continue
                accepted += 1
                slow = _slow_doc(mutated)
                assert _events(fast) == _events(slow), mutated[:300]
        assert checked == 360 and accepted > 100
