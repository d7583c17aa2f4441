"""HTML/XML/TXT text extraction — the byte-identical surface.

Re-expresses the reference parser semantics (libxml2 SAX push parser,
/root/reference/src/parser.c) as a pure-Python, dependency-free extractor
built on stdlib ``html.parser``. Semantics reproduced (SURVEY.md §2.2):

- structure bits per token: IN_FILE / IN_TITLE / IN_HEAD / IN_BODY /
  IN_COMMENTS / IN_HEADER / IN_EMPHASIZED / IN_META
  (reference bit flags: /root/reference/src/swish.h:305-324, maintained in
  check_html_tag /root/reference/src/parser.c:1153-1317),
- a word split by inline markup stays ONE token (``so<b>me</b>thing`` →
  ``something``), with emphasized bits OR-ed over the token's characters
  (flush-to-last-word semantics, /root/reference/src/parser.c:793-812),
- position bumping at block-level tag boundaries, title/body and meta
  transitions, and comments, so phrases never match across structure
  (/root/reference/src/parser.c:988,1117-1118,1229,1241,1298-1310),
- ``<meta name= content=>`` becomes a searchable field; ``robots noindex``
  aborts the document (/root/reference/src/parser.c:1482-1527),
- ``<!-- noindex -->`` / ``<!-- index -->`` comment toggles; optional
  comment-text indexing (/root/reference/src/parser.c:1671-1721),
- UTF-8 → Latin-1 lossy conversion with unconvertible characters replaced
  by a space (Convert_to_latin1, /root/reference/src/parser.c:851-958),
- entity decoding (stdlib convert_charrefs replaces
  /root/reference/src/entities.c),
- StoreDescription-style capture of the first N chars of body text
  (/root/reference/src/parser.c:116-124,1080-1096).

This module is pure Python and single-doc; the Spark engine parallelizes
it inside an Arrow-batched ``mapInPandas`` kernel (swish_e_spark.index).
The oracle calls the very same function — byte-identity of extracted text
per url between engine and oracle therefore holds by construction, which
is the mitigation SURVEY.md §7 prescribes for libxml2 version drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Structure bits (values mirror the reference flag semantics, not the
# exact bit layout — /root/reference/src/swish.h:305-324).
IN_FILE = 1
IN_TITLE = 2
IN_HEAD = 4
IN_BODY = 8
IN_COMMENTS = 16
IN_HEADER = 32
IN_EMPHASIZED = 64
IN_META = 128

STRUCTURE_LETTERS = {  # for the -t HBthec style structure mask
    "H": IN_HEAD,
    "B": IN_BODY,
    "t": IN_TITLE,
    "h": IN_HEADER,
    "e": IN_EMPHASIZED,
    "c": IN_COMMENTS,
    "f": IN_FILE,
    "m": IN_META,
}

DEFAULT_FIELD = "swishdefault"
TITLE_FIELD = "swishtitle"
LINKS_FIELD = "links"  # a@href targets (extract_html_links,
                       # /root/reference/src/parser.c:1820-1866)
ALT_FIELD = "alt"      # img alt text (index_alt_tab,
                       # /root/reference/src/parser.c:1786-1808)

_INLINE_TAGS = frozenset(
    "a abbr acronym b big cite code em font i kbd label q s samp small span "
    "strike strong sub sup tt u var".split()
)
_HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "h7", "h8", "h9"})
_EMPH_TAGS = frozenset({"b", "i", "em", "strong"})
_IGNORE_CONTENT_TAGS = frozenset({"script", "style"})

DESCRIPTION_MAX = 200  # StoreDescription cap (chars of body text)


_NON_LATIN1_RE = re.compile("[^\x00-\xff]")


def to_latin1_text(s: str) -> str:
    """Lossy UTF-8/Unicode → Latin-1 text: any char not representable in
    ISO-8859-1 becomes a single space (ENCODE_ERROR_CHAR = ' ',
    /root/reference/src/config.h:84). C-speed regex sub — identical
    output to the per-char form (one space per unconvertible char)."""
    return _NON_LATIN1_RE.sub(" ", s)


@dataclass
class Event:
    """One extraction event: a run of text in one field with one
    structure-bit context. ``hard_break`` marks a position bump BEFORE
    this event (token adjacency broken). ``fields`` (when non-empty)
    lists EVERY in-scope metaname for nested-metaname fan-out — tokens
    index once per field at the SAME position (addword loop,
    /root/reference/src/index.c:2400-2402, build_metaID_list
    /root/reference/src/index.c:2501-2542)."""

    field_name: str
    text: str
    structure: int
    hard_break: bool
    fields: tuple = ()


@dataclass
class ExtractedDoc:
    title: str = ""
    description: str = ""
    events: list = field(default_factory=list)
    noindex: bool = False
    xml: bool = False

    def body_text(self) -> str:
        """Canonical extracted text (the byte-identity artifact): body
        (default-field) events — all tag fields in XML mode — whitespace
        collapsed within an event, hard breaks rendered as newline."""
        parts: list[str] = []
        for ev in self.events:
            if ev.structure & IN_COMMENTS:
                continue
            if not self.xml and ev.field_name != DEFAULT_FIELD:
                continue
            chunk = " ".join(ev.text.split())
            if not chunk:
                continue
            if parts:
                parts.append("\n" if ev.hard_break else " ")
            parts.append(chunk)
        return "".join(parts)


class _SwishHTMLParser(HTMLParser):
    """HTML mode: fixed tag vocabulary. XML mode (xml_mode=True): every
    tag is a metaname — the innermost tag names the field
    (parse_XML, /root/reference/src/parser.c:227-242)."""

    def __init__(self, index_comments: bool = False,
                 xml_mode: bool = False, index_links: bool = False,
                 index_alt: bool = False,
                 xml_attributes: bool = False,
                 xml_class_attributes: bool = False,
                 xml_nested_metanames: bool = False,
                 dont_bump_tags: frozenset = frozenset()) -> None:
        super().__init__(convert_charrefs=True)
        self.index_comments = index_comments
        self.index_links = index_links
        self.index_alt = index_alt
        self.xml_attributes = xml_attributes
        self.xml_class_attributes = xml_class_attributes
        self.xml_nested_metanames = xml_nested_metanames
        self.dont_bump_tags = dont_bump_tags  # DontBumpPositionOnMetaTags
                            # (/root/reference/src/parser.c:1298-1310)
        self._base_url: str | None = None
        self.xml_mode = xml_mode
        self._xml_stack: list[str] = []
        self.doc = ExtractedDoc()
        self._in_title = False
        self._header_depth = 0
        self._emph_depth = 0
        self._ignore_depth = 0
        self._noindex_toggle = False
        self._pending_break = True  # document start is a boundary
        self._buf: list[str] = []
        self._buf_bits = 0
        self._buf_field = DEFAULT_FIELD
        self._buf_break = True

    # -- buffering: consecutive character data in the same field merges
    # into one event; inline tags OR their bits into the open buffer so a
    # tag-split word stays one token with merged bits.

    def _bits(self) -> int:
        b = IN_FILE
        if self._in_title:
            b |= IN_TITLE
        else:
            b |= IN_BODY
        if self._header_depth:
            b |= IN_HEAD | IN_HEADER
        if self._emph_depth:
            b |= IN_EMPHASIZED
        return b

    def _flush(self) -> None:
        if self._buf:
            text = "".join(self._buf)
            if text.strip():
                fields = ()
                if (self.xml_mode and self.xml_nested_metanames
                        and len(self._xml_stack) > 1
                        and self._buf_field == self._xml_stack[-1]):
                    fields = tuple(dict.fromkeys(self._xml_stack))
                self.doc.events.append(
                    Event(self._buf_field, to_latin1_text(text),
                          self._buf_bits, self._buf_break, fields)
                )
                self._buf_break = False
            self._buf = []
            self._buf_bits = 0

    def _field_now(self) -> str:
        if self._in_title:
            return TITLE_FIELD
        if self.xml_mode and self._xml_stack:
            return self._xml_stack[-1]
        return DEFAULT_FIELD

    def handle_data(self, data: str) -> None:
        if self._ignore_depth or self._noindex_toggle:
            return
        fld = self._field_now()
        if self._pending_break or fld != self._buf_field:
            self._flush()
            self._buf_field = fld
            self._buf_break = self._buf_break or self._pending_break
            self._pending_break = False
        self._buf.append(data)
        self._buf_bits |= self._bits()

    def handle_starttag(self, tag, attrs) -> None:
        tag = tag.lower()
        if self.xml_mode:
            self._flush()
            self._pending_break = True
            field_name = tag
            attrs_d = dict(attrs)
            if self.xml_class_attributes and attrs_d.get("class"):
                # <foo class=bar> content indexes under foo.bar
                # (start_XML_ClassAttributes,
                #  /root/reference/src/parser.c:1325-1376)
                field_name = f"{tag}.{attrs_d['class']}"
            self._xml_stack.append(field_name)
            if self.xml_attributes:
                # <foo bar="baz"> -> "baz" under metaname foo.bar
                # (index_XML_attributes,
                #  /root/reference/src/parser.c:1413-1472)
                for k, v in attrs:
                    if v and not (self.xml_class_attributes
                                  and k == "class"):
                        self.doc.events.append(
                            Event(f"{tag}.{k}", to_latin1_text(v),
                                  IN_FILE | IN_META, True))
            return
        if tag in _IGNORE_CONTENT_TAGS:
            self._ignore_depth += 1
            return
        if tag == "meta":
            d = dict(attrs)
            name = (d.get("name") or "").lower()
            content = d.get("content") or ""
            if name == "robots" and "noindex" in (content or "").lower():
                self.doc.noindex = True  # doc-level abort: always acts
            elif name and content and not self._ignore_depth \
                    and not self._noindex_toggle:
                # meta content is its own positional island; inside a
                # <!-- noindex --> section or ignored scope it is
                # suppressed like body text (and the a-href / img-alt
                # branches below)
                self._flush()
                self.doc.events.append(
                    Event(name, to_latin1_text(content), IN_FILE | IN_META, True)
                )
                self._pending_break = True
            return
        if tag == "base":
            href = dict(attrs).get("href")
            if href:
                self._base_url = href  # <base> fixup
                # (/root/reference/src/parser.c:1820-1866)
            return
        if tag == "a" and self.index_links:
            href = dict(attrs).get("href")
            if href and not self._ignore_depth \
                    and not self._noindex_toggle:
                if self._base_url:
                    from urllib.parse import urljoin

                    href = urljoin(self._base_url, href)
                self._flush()
                self.doc.events.append(
                    Event(LINKS_FIELD, to_latin1_text(href),
                          IN_FILE | IN_META, True))
                self._pending_break = True
            return
        if tag == "img" and self.index_alt:
            alt = dict(attrs).get("alt")
            if alt and not self._ignore_depth \
                    and not self._noindex_toggle:
                self._flush()
                self.doc.events.append(
                    Event(ALT_FIELD, to_latin1_text(alt),
                          IN_FILE | IN_META, True))
                self._pending_break = True
                return
            # no alt: fall through to the block-level default below
        if tag == "title":
            self._flush()
            self._in_title = True
            self._pending_break = True
            return
        if tag in _EMPH_TAGS:
            # inline: do NOT flush — the open token keeps accumulating;
            # bits OR in (flush-to-last-word semantics)
            self._emph_depth += 1
            self._buf_bits |= self._bits() if self._buf else 0
            return
        if tag in _INLINE_TAGS:
            return
        # block-level: token boundary + position bump (suppressed for
        # DontBumpPositionOnMetaTags entries — still a token boundary)
        self._flush()
        if tag not in self.dont_bump_tags:
            self._pending_break = True
        if tag in _HEADER_TAGS:
            self._header_depth += 1

    def handle_endtag(self, tag) -> None:
        tag = tag.lower()
        if self.xml_mode:
            self._flush()
            self._pending_break = True
            if self._xml_stack and (
                    self._xml_stack[-1] == tag
                    or self._xml_stack[-1].startswith(tag + ".")):
                self._xml_stack.pop()
            return
        if tag in _IGNORE_CONTENT_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if tag == "title":
            self._flush()
            self._in_title = False
            self._pending_break = True
            return
        if tag in _EMPH_TAGS:
            # defer bit-off: nothing to do buffer-side; depth drops
            self._emph_depth = max(0, self._emph_depth - 1)
            return
        if tag in _INLINE_TAGS:
            return
        self._flush()
        if tag not in self.dont_bump_tags:
            self._pending_break = True
        if tag in _HEADER_TAGS:
            self._header_depth = max(0, self._header_depth - 1)

    def handle_startendtag(self, tag, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in _IGNORE_CONTENT_TAGS or self.xml_mode:
            # an empty <script/>/<style/> opens no content scope (the
            # start above incremented _ignore_depth — without this end
            # every later text node in the doc would be dropped); XML
            # self-closing tags likewise pop their metaname scope
            self.handle_endtag(tag)

    def handle_comment(self, data: str) -> None:
        directive = data.strip().lower()
        if directive == "noindex":
            self._flush()
            self._noindex_toggle = True
            self._pending_break = True
            return
        if directive == "index":
            self._noindex_toggle = False
            self._pending_break = True
            return
        if self.index_comments and not self._noindex_toggle:
            self._flush()
            self.doc.events.append(
                Event(DEFAULT_FIELD, to_latin1_text(data),
                      IN_FILE | IN_COMMENTS, True)
            )
            self._pending_break = True


def _decode_bytes(html: bytes) -> str:
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


# ---------------------------------------------------------------------
# Fast lexer: one regex pass over the well-formed-HTML subset, feeding
# the SAME _SwishHTMLParser handler methods as the stdlib html.parser
# lexer — only tokenization is replaced, never semantics. ANY surprise
# (stray '<', unterminated construct, quote-imbalanced attributes,
# CDATA section, exotic declaration) bails the whole document back to
# html.parser, so behavior stays identical by construction; the
# differential suite (tests/test_fast_lexer.py) pins equality over the
# datagen corpus, the fixture docs and adversarial fragments.
# Round-1 verdict item 8: extraction was ~40% of build CPU.
# ---------------------------------------------------------------------

_FAST_TOKEN_RE = re.compile(
    r"(?P<text>[^<]+)"
    r"|<!--(?P<comment>.*?)-->"
    r"|<!(?P<decl>[^>]*)>"
    r"|<\?(?P<pi>[^>]*)>"
    r"|</(?P<end>[a-zA-Z][a-zA-Z0-9.\-_:]*)\s*>"
    r"|<(?P<start>[a-zA-Z][a-zA-Z0-9.\-_:]*)"
    r"(?P<attrs>[^<>]*?)(?P<selfclose>/?)>",
    re.S)

_DECL_OK_RE = re.compile(r"(?i)^doctype[^>\[]*$")

# the only HTML-mode tags whose attributes the handlers actually read;
# everything else skips attribute parsing entirely
_ATTR_TAGS = frozenset({"meta", "base", "a", "img"})

_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.I)
    for t in ("script", "style")
}


def _fast_attrs(s: str):
    """Attribute parsing byte-compatible with HTMLParser.parse_starttag
    (same tolerant regex, same lowercasing/unquoting/unescaping)."""
    from html import unescape as _unescape
    from html.parser import attrfind_tolerant

    attrs = []
    k = 0
    n = len(s)
    while k < n:
        # consume separators first (html.parser's tagfind/attrfind do
        # this with their trailing (?:\s|/(?!>))* classes); attrfind's
        # lookbehind then sees the separator char
        while k < n and (s[k].isspace() or s[k] == "/"):
            k += 1
        if k == 0 or k >= n:
            break
        m = attrfind_tolerant.match(s, k)
        if not m:
            break
        attrname, rest, attrvalue = m.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (attrvalue[:1] == "'" == attrvalue[-1:]
              or attrvalue[:1] == '"' == attrvalue[-1:]):
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = _unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = m.end()
    return attrs


def _fast_feed(p: "_SwishHTMLParser", raw: str) -> bool:
    """Tokenize ``raw`` into ``p``'s handler methods. Returns False on
    any construct outside the fast subset — the caller then reparses
    the WHOLE document with html.parser on a fresh parser instance."""
    from html import unescape as _unescape

    pos = 0
    n = len(raw)
    handle_data = p.handle_data
    handle_start = p.handle_starttag
    handle_end = p.handle_endtag
    # group indices: 1=text 2=comment 3=decl 4=pi 5=end 6=start
    # 7=attrs 8=selfclose; for the start alternative lastindex is 8
    # (the selfclose group participates even when empty)
    it = _FAST_TOKEN_RE.finditer(raw)
    while True:
        m = next(it, None)
        if m is None:
            break
        if m.start() != pos:
            return False  # stray '<' / unterminated construct
        pos = m.end()
        g = m.lastindex
        if g == 1:
            text = m[1]
            handle_data(_unescape(text) if "&" in text else text)
        elif g == 8 or g == 7 or g == 6:
            attrs_s = m[7]
            if attrs_s and not (attrs_s[0].isspace()
                                or attrs_s[0] == "/"):
                # html.parser's tag-name charset is broader (anything
                # but whitespace / '/' / '>'): '<a@x=y>' is the tag
                # name 'a@x=y' there — bail rather than diverge
                return False
            if ("'" in attrs_s or '"' in attrs_s) and (
                    attrs_s.count('"') % 2 or attrs_s.count("'") % 2):
                # a quoted value containing '>' would have been split
                # wrongly above — quote imbalance detects it
                return False
            if m[8] and attrs_s and not attrs_s[-1].isspace() \
                    and attrs_s[-1] not in "\"'":
                # '<a href=foo/>': html.parser folds the '/' into the
                # unquoted value and sees a plain start tag — the
                # regex already split it as self-close; bail so the
                # html.parser path keeps byte-identity
                return False
            tag = m[6].lower()
            attrs = _fast_attrs(attrs_s) \
                if (tag in _ATTR_TAGS and attrs_s.strip()) else []
            handle_start(tag, attrs)
            # self-closing: mirror handle_startendtag — no synthetic
            # end for structure tags ('<b/>' opens emphasis like the
            # html.parser path), but ignore-content scopes and XML
            # metaname scopes close immediately
            if m[8]:
                if tag in _IGNORE_CONTENT_TAGS or p.xml_mode:
                    handle_end(tag)
            elif tag in _CDATA_CLOSE:
                # html.parser CDATA content mode: raw until the close
                # tag, no charref conversion
                cm = _CDATA_CLOSE[tag].search(raw, pos)
                if cm is None:
                    return False
                if cm.start() > pos:
                    handle_data(raw[pos:cm.start()])
                handle_end(tag)
                pos = cm.end()
                it = _FAST_TOKEN_RE.finditer(raw, pos)
        elif g == 5:
            handle_end(m[5].lower())
        elif g == 2:
            p.handle_comment(m[2])
        elif g == 3:
            if not _DECL_OK_RE.match(m[3]):
                return False  # CDATA section / internal subset / bogus
        # g == 4: PI — handle_pi is a no-op for this parser
    return pos == n


def extract_html(html: bytes | str, index_comments: bool = False,
                 xml_mode: bool = False, index_links: bool = False,
                 index_alt: bool = False, xml_attributes: bool = False,
                 xml_class_attributes: bool = False,
                 xml_nested_metanames: bool = False,
                 dont_bump_tags: frozenset = frozenset()) -> ExtractedDoc:
    """Extract an HTML/XML document into ordered field/structure events."""
    raw = _decode_bytes(html) if isinstance(html, (bytes, bytearray)) else html

    def _mk():
        return _SwishHTMLParser(
            index_comments=index_comments, xml_mode=xml_mode,
            index_links=index_links, index_alt=index_alt,
            xml_attributes=xml_attributes,
            xml_class_attributes=xml_class_attributes,
            xml_nested_metanames=xml_nested_metanames,
            dont_bump_tags=dont_bump_tags)

    p = _mk()
    ok = False if xml_mode else _fast_feed(p, raw)
    if not ok:
        # outside the fast subset: reparse from scratch with the
        # stdlib lexer (the fast attempt may have emitted events)
        p = _mk()
        p.feed(raw)
        p.close()
    p._flush()
    doc = p.doc
    doc.xml = xml_mode
    title_parts = [
        " ".join(ev.text.split()) for ev in doc.events
        if ev.field_name == TITLE_FIELD
    ]
    doc.title = " ".join(t for t in title_parts if t)
    body = doc.body_text()
    doc.description = body[:DESCRIPTION_MAX]
    return doc


def extract_txt(text: bytes | str) -> ExtractedDoc:
    """TXT passthrough (parse_TXT, /root/reference/src/parser.c:280-312):
    each line is an event; line breaks are hard breaks."""
    raw = _decode_bytes(text) if isinstance(text, (bytes, bytearray)) else text
    doc = ExtractedDoc()
    for line in raw.splitlines():
        if line.strip():
            doc.events.append(
                Event(DEFAULT_FIELD, to_latin1_text(line), IN_FILE | IN_BODY, True)
            )
    body = doc.body_text()
    doc.description = body[:DESCRIPTION_MAX]
    return doc


def extract(content: bytes | str, doctype: str = "html",
            index_comments: bool = False, index_links: bool = False,
            index_alt: bool = False, xml_attributes: bool = False,
            xml_class_attributes: bool = False,
            xml_nested_metanames: bool = False,
            dont_bump_tags: frozenset = frozenset()) -> ExtractedDoc:
    if doctype == "txt":
        return extract_txt(content)
    if doctype == "xml":
        return extract_html(content, index_comments=index_comments,
                            xml_mode=True,
                            xml_attributes=xml_attributes,
                            xml_class_attributes=xml_class_attributes,
                            xml_nested_metanames=xml_nested_metanames,
                            dont_bump_tags=dont_bump_tags)
    return extract_html(content, index_comments=index_comments,
                        index_links=index_links, index_alt=index_alt,
                        dont_bump_tags=dont_bump_tags)
