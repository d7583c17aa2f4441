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

# libxml2 html40ElementTable isinline flags, dumped from the installed
# libxml2 via htmlTagLookup (see scripts/gen_refbin_fixtures.py build
# recipe). parser.c bumps word_pos only for elements whose
# isinline == 0 (check_html_tag, /root/reference/src/parser.c:1293-1308);
# isinline 1 (true inline) and 2 ("special": applet button del iframe
# ins map object script) leave the token run untouched — text on both
# sides of <span>/<script> CONCATENATES into one word, verified against
# the compiled binary's -T INDEXED_WORDS stream.
_INLINE_TAGS = frozenset(
    "a abbr acronym applet b basefont bdo big br button cite code del dfn "
    "em embed font i iframe img input ins kbd label map object q s samp "
    "script select small span strike strong sub sup textarea tt u var"
    .split())
# all elements libxml2's table knows (isinline 0, 1 or 2); anything
# else is an "unknown" tag and takes the metaname bump path
_KNOWN_HTML_TAGS = _INLINE_TAGS | frozenset(
    "address area base blockquote body caption center col colgroup dd "
    "dir div dl dt fieldset form frame frameset h1 h2 h3 h4 h5 h6 head "
    "hr html isindex legend li link menu meta noframes noscript ol "
    "optgroup option p param pre style table tbody td tfoot th thead "
    "title tr ul".split())
# elements that live in <head>: seeing one at top level implies <head>
_HEAD_TAGS = frozenset({"title", "meta", "link", "base", "isindex"})

# libxml2 implied end tags (HTML4 omitted closers): starting `new`
# auto-closes an open `old` when old is in _AUTO_CLOSE and new is in
# its closer set ("*block*" = any non-inline element). Each implied
# close bumps the position like an explicit one — verified against
# the binary ('<p>a1<p>a2' puts a2 at +3, not +2).
_AUTO_CLOSE = {
    "p": None,  # None = closed by ANY non-inline start
    "li": frozenset({"li"}),
    "td": frozenset({"td", "th", "tr"}),
    "th": frozenset({"td", "th", "tr"}),
    "tr": frozenset({"tr"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "option": frozenset({"option", "optgroup"}),
}
# containers whose END tag implicitly closes any _AUTO_CLOSE child
_CONTAINER_ENDS = frozenset({"ul", "ol", "table", "tr", "tbody",
                             "thead", "tfoot", "dl", "select", "body",
                             "html", "div", "form", "blockquote"})
_HEADER_RE = re.compile(r"^h[1-9]$")  # structure bit: any h<digit>
                                      # (parser.c:1249-1253)
_EMPH_TAGS = frozenset({"b", "i", "em", "strong"})
# script/style content is lexed raw (CDATA) but IS indexed — the
# reference has no special-casing for them (verified: '<script>var
# x=1;</script>' indexes 'var', 'x', '1')
_CDATA_TAGS = frozenset({"script", "style"})

DESCRIPTION_MAX = 200  # default description cap (chars of body text)
DESC_KEY = "\x00desc"  # internal prop_chunks key for StoreDescription
#                        capture (cannot collide with a PropertyName)


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
    structure-bit context. ``bumps`` counts the word positions skipped
    BEFORE this event — the reference increments word_pos per
    structural tag boundary (title/body count double: their branch
    bump plus the generic non-inline bump, check_html_tag
    /root/reference/src/parser.c:1229-1241,1293-1308), so positions
    carry gaps that phrases can never match across. ``bumps`` == 0
    still ends a token run only at whitespace — adjacent events merge
    into one word when the source had no separator (verified against
    the compiled binary: 'w2<span>s1</span>w3' indexes as 'w2s1w3').
    ``fields`` (when non-empty) lists EVERY in-scope field for
    fan-out — tokens index once per field at the SAME position
    (build_metaID_list /root/reference/src/index.c:2501-2542)."""

    field_name: str
    text: str
    structure: int
    bumps: int
    fields: tuple = ()

    @property
    def hard_break(self) -> bool:
        return self.bumps > 0


@dataclass
class ExtractedDoc:
    title: str = ""
    description: str = ""
    events: list = field(default_factory=list)
    noindex: bool = False
    xml: bool = False
    prop_chunks: dict = field(default_factory=dict)  # user property
    # capture (PropertyNames): base name -> raw flush-unit chunks, in
    # document order; finalized by textproc/docprops.py

    def body_text(self) -> str:
        """Canonical extracted text (the byte-identity artifact): body
        (default-field) events — all tag fields in XML mode — whitespace
        collapsed within an event, hard breaks rendered as newline.
        Title/head/meta content is excluded (it is not body text even
        though it now indexes under swishdefault like the reference)."""
        parts: list[str] = []
        for ev in self.events:
            if ev.structure & (IN_COMMENTS | IN_TITLE | IN_HEAD | IN_META):
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
    """HTML/XML extraction with the compiled reference binary's exact
    position-bump and field model (fitted against -T INDEXED_WORDS
    micro-fixtures; see tests/fixtures/refbin/):

    - word positions post-increment per indexed word; every structural
      tag boundary adds bumps (title/body: 2 each on start AND end;
      other non-inline elements: 1 each; unknown tags: 1, bumped
      BEFORE the pending token run flushes; libxml2-implied html(+1)/
      head(+1)/body(+2)/bare-text-p(+1) elements bump too),
    - inline tags (libxml2 isinline != 0, incl. script) are fully
      transparent: no flush, no space — 'w2<span>s1</span>w3' is ONE
      word,
    - comments never flush the open token run; with IndexComments the
      comment words index at the CURRENT position (+1 each side) while
      the interrupted run continues,
    - <meta name=X content=Y>: declared metaname → field X with
      IN_META (+1 before content, +1 after); undeclared → swishdefault
      with no META bit (+2 before content),
    - title words index under swishdefault with HEAD|TITLE structure
      (the reference's swishtitle is a property, not an index field,
      unless declared in MetaNames),
    - XML mode: declared metanames scope their subtree; everything
      else is swishdefault; structure is IN_FILE only; +1 per start
      tag, declared-end flushes before its +1, undeclared-end after.

    ``metanames=None`` (auto) keeps this engine's permissive legacy
    surface: every html <meta> / XML tag is a searchable field and
    title fans out to (swishdefault, swishtitle) — the reference's
    UndefinedMetaTags=auto analogue. Position accounting is identical
    in both modes.
    """

    def __init__(self, index_comments: bool = False,
                 xml_mode: bool = False, index_links: bool = False,
                 index_alt: bool = False,
                 xml_attributes: bool = False,
                 xml_class_attributes: bool = False,
                 xml_nested_metanames: bool = False,
                 dont_bump_tags: frozenset = frozenset(),
                 metanames: frozenset | None = None,
                 meta_aliases: dict | None = None,
                 ignore_meta_tags: frozenset = frozenset(),
                 links_field: str = LINKS_FIELD,
                 images_field: str | None = None,
                 alt_field: str | None = ALT_FIELD,
                 absolute_links: bool = False,
                 doc_url: str | None = None,
                 properties: frozenset = frozenset(),
                 prop_aliases: dict | None = None,
                 obey_robots_noindex: bool = True,
                 description_tag: str | None = None) -> None:
        super().__init__(convert_charrefs=True)
        self.description_tag = description_tag  # StoreDescription
        # <tag>: swishdescription = text captured under this element
        # via the SAME summary/property append machinery
        # (SUMMARY_INFO rides addDocProperty, parser.c:1631-1639);
        # None keeps this engine's body-prefix default
        self.obey_robots_noindex = obey_robots_noindex
        # obeyRobotsNoIndex (process_htmlmeta, parser.c:1507-1516;
        # default set in swish.c). The BINARY defaults to NO-obey;
        # this engine deliberately defaults to obey=True — a web-scale
        # pipeline must respect robots by default — and the directive
        # restores either behavior. Either way the robots meta itself
        # emits nothing and bumps nothing (binary-pinned positions).
        self.properties = properties      # PropertyNames base names
        self.prop_aliases = prop_aliases or {}  # PropertyNameAlias
        self._open_props: list = []       # [(endtag, base), ...] open
        # property elements. Property values capture the SAME text
        # buffer the indexer flushes (addDocProperties is called from
        # flush_buffer with buf->buffer, parser.c:1627), so capture
        # rides on _flush(): one chunk per emitted event, for every
        # open property. Binary-verified consequences: text inside an
        # IgnoreMetaTags section is NOT captured (the ignored flush
        # never runs), and <meta content=...> captures into both the
        # named property and every enclosing open property.
        self.index_comments = index_comments
        self.index_links = index_links
        self.index_alt = index_alt
        self.meta_aliases = meta_aliases or {}  # alias -> base
                            # (MetaNameAlias; getMetaNameByName follows
                            # ->alias, /root/reference/src/metanames.c:
                            # 347-358 — both index and query side)
        self.ignore_meta_tags = ignore_meta_tags  # IgnoreMetaTags:
                            # content dropped, tag bumps stay
                            # (isIgnoreMetaName check BEFORE the
                            # metaname lookup, parser.c:994-1006;
                            # checked on the RAW tag, not the alias)
        self.links_field = links_field    # HTMLLinksMetaName
        self.images_field = images_field  # ImageLinksMetaName
        self.alt_field = alt_field        # IndexAltTagMetaName; None =
                                          # "as-text" (alt joins the
                                          # open token run)
        self.absolute_links = absolute_links  # AbsoluteLinks: OFF
                            # indexes hrefs verbatim — even with a
                            # <base> tag present (extract_html_links,
                            # parser.c:1845-1852: xmlBuildURI only
                            # under sw->AbsoluteLinks)
        self.doc_url = doc_url  # AbsoluteLinks base fallback when no
                                # <base> (fprop->real_path analogue)
        self._ignore_stack: list[str] = []  # open IgnoreMetaTags
                                            # sections (endtag names)
        self.xml_attributes = xml_attributes
        self.xml_class_attributes = xml_class_attributes
        self.xml_nested_metanames = xml_nested_metanames
        self.dont_bump_tags = dont_bump_tags  # DontBumpPositionOnMetaTags
                            # (/root/reference/src/parser.c:986-989,1117)
        self.metanames = metanames  # None = auto (every tag a field)
        self._base_url: str | None = None
        self.xml_mode = xml_mode
        self._xml_stack: list[str] = []        # all open xml tags
        self._xml_meta_stack: list[str] = []   # open DECLARED fields
        self._html_meta_stack: list[str] = []  # declared metaname tags
                                               # open in HTML mode
                                               # (<meta3>…</meta3>)
        self.doc = ExtractedDoc()
        self._in_title = False
        self._header_depth = 0
        self._em_depth = 0
        self._em_defer = 0       # </b> with a partial token: bit stays
                                 # on until the next word boundary
                                 # (flush_word, parser.c:1272-1280)
        self._noindex_depth = 0  # <!-- noindex --> counter (NESTS:
                                 # parser.c:1693-1703 ++/--)
        self._html_seen = xml_mode
        self._head_open = False
        self._body_open = xml_mode
        self._body_implied = False
        self._p_implied = False
        self._open_blocks: list[str] = []  # for implied-close emulation
        self._pending = 0        # bumps owed to the NEXT emitted event
        self._buf: list[str] = []
        self._buf_bits = 0
        self._buf_field = DEFAULT_FIELD

    def _alias(self, name: str) -> str:
        """MetaNameAlias resolution: index under the BASE metaname
        (one level — the reference refuses alias-of-alias,
        parse_conffile.c:571-581)."""
        return self.meta_aliases.get(name, name)

    def _declared(self, name: str) -> bool:
        return self.metanames is None or name in self.metanames \
            or self._alias(name) in self.metanames

    def _prop_of(self, name: str):
        """PropertyNameAlias resolution against the RAW tag name
        (getPropNameByName follows ->alias in the property namespace,
        separate from the metaname namespace)."""
        base = self.prop_aliases.get(name, name)
        return base if base in self.properties else None

    def _prop_capture(self, text: str, named: str | None = None) -> None:
        """Out-of-buffer capture (meta ``content=``): the value chunks
        into the named property AND every enclosing open property
        (binary: <cat>aa <meta name=other content=mc> bb</cat> gives
        cat='aa mc bb', other='mc')."""
        lat = to_latin1_text(text)
        if not lat.strip():
            return
        for _t, base in self._open_props:
            self.doc.prop_chunks.setdefault(base, []).append(lat)
        if named is not None and all(b != named
                                     for _t, b in self._open_props):
            self.doc.prop_chunks.setdefault(named, []).append(lat)

    def _bits(self) -> int:
        b = IN_FILE
        if self.xml_mode:
            return b
        if self._in_title:
            b |= IN_TITLE | IN_HEAD
        elif self._head_open:
            b |= IN_HEAD
        elif self._body_open:
            b |= IN_BODY
        if self._header_depth:
            b |= IN_HEADER
        if self._em_depth or self._em_defer:
            b |= IN_EMPHASIZED
        if self._html_meta_stack:
            b |= IN_META
        return b

    # -- buffering: one token RUN per event. Consecutive character
    # data concatenates (inline tags and comments never flush, so
    # tag-split words stay one token); a flush only happens where the
    # reference calls flush_buffer, and the event then carries every
    # position bump accumulated since the previous event.

    def _flush(self) -> None:
        if self._buf:
            text = "".join(self._buf)
            if text.strip():
                fields = self._fan_fields()
                lat = to_latin1_text(text)
                self.doc.events.append(
                    Event(self._buf_field, lat,
                          self._buf_bits, self._pending, fields))
                self._pending = 0
                if self._open_props:
                    # properties capture the flushed buffer
                    # (addDocProperties from flush_buffer,
                    # parser.c:1627); finalize() trims each chunk and
                    # joins with single spaces (binary-pinned)
                    for _t, base in self._open_props:
                        self.doc.prop_chunks.setdefault(
                            base, []).append(lat)
            self._buf = []
            self._buf_bits = 0
        if self._em_defer:  # a flush is a word boundary
            self._em_depth = max(0, self._em_depth - self._em_defer)
            self._em_defer = 0

    def _fan_fields(self) -> tuple:
        if self.xml_mode:
            if self.xml_nested_metanames and len(self._xml_stack) > 1 \
                    and self._buf_field == self._xml_stack[-1]:
                return tuple(dict.fromkeys(self._xml_stack))
            return ()
        if self._in_title and self.metanames is None \
                and self._buf_field == DEFAULT_FIELD:
            # auto mode: title searchable via swishtitle= too (the
            # reference does this when MetaNames declares swishtitle,
            # parser.c:1221-1224)
            return (DEFAULT_FIELD, TITLE_FIELD)
        return ()

    def _emit_island(self, field_name: str, text: str, bits: int,
                     bumps_before: int, bumps_after: int) -> None:
        """A positional island (meta content, link href, img alt):
        indexed at current position + bumps_before; the trailing bump
        lands on whatever comes next."""
        if text.strip():
            self.doc.events.append(
                Event(field_name, to_latin1_text(text), bits,
                      self._pending + bumps_before))
            self._pending = bumps_after
        else:
            self._pending += bumps_before + bumps_after

    def _field_now(self) -> str:
        if self.xml_mode:
            return self._xml_meta_stack[-1] if self._xml_meta_stack \
                else DEFAULT_FIELD
        if self._html_meta_stack:
            return self._html_meta_stack[-1]
        return DEFAULT_FIELD

    def _ensure_html(self) -> None:
        if not self._html_seen:
            self._html_seen = True
            self._pending += 1

    def _open_head(self) -> None:
        self._ensure_html()
        if not self._head_open and not self._body_open:
            self._head_open = True
            self._pending += 1

    def _ensure_body(self, implied_p_for_text: bool = False) -> None:
        self._ensure_html()
        if self._head_open:
            self._head_open = False
            self._pending += 1  # implied </head>
        if not self._body_open:
            self._body_open = True
            self._body_implied = True
            self._pending += 2  # implied <body> (branch + element)
        if implied_p_for_text and self._body_implied \
                and not self._open_blocks and not self._p_implied:
            self._p_implied = True
            self._pending += 1

    def _close_implied_p(self) -> None:
        if self._p_implied:
            self._p_implied = False
            self._pending += 1

    def _implied_close_for_start(self, new_tag: str) -> None:
        """libxml2 implied end tags: a new block start closes open
        <p>/<li>/<td>/... elements; each implied close flushes and
        bumps exactly like an explicit one."""
        while self._open_blocks:
            top = self._open_blocks[-1]
            if top not in _AUTO_CLOSE:
                break
            closers = _AUTO_CLOSE[top]
            if closers is None or new_tag in closers:
                self._open_blocks.pop()
                self._flush()
                # libxml2 fires the end-element callback for implied
                # closes too, so an open property element (e.g. an
                # aliased <td>) and an open IgnoreMetaTags section
                # close here as well
                self._prop_pop(top)
                if self._ignore_stack and self._ignore_stack[-1] == top:
                    self._ignore_stack.pop()
                if self._html_meta_stack \
                        and self._html_meta_stack[-1] == \
                        self._alias(top):
                    self._html_meta_stack.pop()
                self._pending += 1
            else:
                break

    def _close_down_to(self, tag: str) -> None:
        """An explicit end tag implicitly closes unclosed AUTO_CLOSE
        children above it on the stack (</ul> closes an open <li>)."""
        if tag not in self._open_blocks:
            return
        while self._open_blocks and self._open_blocks[-1] != tag:
            top = self._open_blocks[-1]
            if top not in _AUTO_CLOSE:
                break
            self._open_blocks.pop()
            self._flush()
            self._prop_pop(top)  # implied close ends its capture too
            if self._ignore_stack and self._ignore_stack[-1] == top:
                self._ignore_stack.pop()
            if self._html_meta_stack \
                    and self._html_meta_stack[-1] == self._alias(top):
                self._html_meta_stack.pop()
            self._pending += 1
        if self._open_blocks and self._open_blocks[-1] == tag:
            self._open_blocks.pop()

    def handle_data(self, data: str) -> None:
        if self._noindex_depth or self._ignore_stack:
            return  # IgnoreMetaTags: text inside the section is
                    # dropped (including under nested declared
                    # metanames — verified against the binary); tag
                    # bumps continue normally via the tag handlers
        if self.xml_mode:
            fld = self._field_now()
            if fld != self._buf_field and "".join(self._buf).strip():
                self._flush()
            self._buf_field = fld
        else:
            if data.strip() and not self._in_title:
                # bare text outside <title> implicitly closes an open
                # head and opens body (+p when body is implied)
                self._ensure_body(implied_p_for_text=True)
            self._buf_field = self._field_now() if not self._buf \
                else self._buf_field
        if self._em_defer and self._buf:
            # deferred emphasis-off resolves at the next whitespace:
            # the emphasized run flushes as its OWN event (bumps 0 —
            # positions stay adjacent) so following words don't
            # inherit the bit
            ws = _WS_SEARCH(data)
            if ws is not None:
                head, tail = data[:ws.end()], data[ws.end():]
                if head:
                    self._buf.append(head)
                    self._buf_bits |= self._bits()
                self._flush()  # also resolves the deferred em-off
                if tail:
                    self._buf.append(tail)
                    self._buf_bits |= self._bits()
                return
        self._buf.append(data)
        self._buf_bits |= self._bits()

    def _xml_start(self, tag: str, attrs) -> None:
        if tag not in self.dont_bump_tags:
            self._pending += 1
        self._flush()
        self._prop_push(tag)
        if tag in self.ignore_meta_tags:
            # IgnoreMetaTags section: tags inside keep bumping, text
            # is dropped until the matching end tag (start_metaTag
            # ignore push, parser.c:994-1006)
            self._ignore_stack.append(tag)
        field_name = self._alias(tag)
        attrs_d = dict(attrs)
        if self.xml_class_attributes and attrs_d.get("class"):
            # <foo class=bar> content indexes under foo.bar
            # (start_XML_ClassAttributes, parser.c:1325-1376)
            field_name = self._alias(f"{tag}.{attrs_d['class']}")
        self._xml_stack.append(field_name)
        if self._declared(field_name):
            self._xml_meta_stack.append(field_name)
        if self.xml_attributes and not self._ignore_stack:
            # <foo bar="baz"> -> "baz" under metaname foo.bar
            # (index_XML_attributes, parser.c:1413-1472)
            for k, v in attrs:
                if v and not (self.xml_class_attributes
                              and k == "class"):
                    self._emit_island(self._alias(f"{tag}.{k}"), v,
                                      IN_FILE | IN_META, 1, 1)

    def _xml_end(self, tag: str) -> None:
        if self._ignore_stack and self._ignore_stack[-1] == tag:
            self._ignore_stack.pop()
        rt = self._alias(tag)
        declared_top = bool(self._xml_meta_stack) and self._xml_stack \
            and self._xml_stack[-1] == self._xml_meta_stack[-1] \
            and (self._xml_stack[-1] in (tag, rt)
                 or self._xml_stack[-1].startswith((tag + ".",
                                                    rt + ".")))
        if declared_top:
            # pop of an open meta flushes its content BEFORE the end
            # bump (pop_stack → flush, end_metaTag parser.c:1100-1121)
            self._flush()
            if tag not in self.dont_bump_tags:
                self._pending += 1
        else:
            if tag not in self.dont_bump_tags:
                self._pending += 1
            self._flush()
        self._prop_pop(tag)  # after the end-tag flush above
        if self._xml_stack and (
                self._xml_stack[-1] in (tag, rt)
                or self._xml_stack[-1].startswith((tag + ".",
                                                   rt + "."))):
            popped = self._xml_stack.pop()
            if self._xml_meta_stack \
                    and self._xml_meta_stack[-1] == popped:
                self._xml_meta_stack.pop()

    def handle_starttag(self, tag, attrs) -> None:
        if self._noindex_depth:
            return
        tag = tag.lower()
        if self.xml_mode:
            self._xml_start(tag, attrs)
            return
        if tag == "html":
            if not self._html_seen:
                self._html_seen = True
                self._pending += 1
            return
        if tag == "meta":
            if not attrs:
                # bare <meta>: plain non-inline element (parser.c:632
                # requires attrs for process_htmlmeta)
                self._flush()
                self._open_head()
                self._pending += 1
                return
            self._open_head()  # libxml2 implies <head> around a
                               # top-level <meta> even when its
                               # name/content do nothing
            d = dict(attrs)
            name = (d.get("name") or "").lower()
            content = d.get("content") or ""
            if name == "robots" and "noindex" in content.lower():
                if self.obey_robots_noindex:
                    self.doc.noindex = True  # doc-level abort
                return  # the robots meta never indexes or bumps
                # (process_htmlmeta returns before start_metaTag)
            if name and content and name in self.ignore_meta_tags:
                # IgnoreMetaTags: content dropped, start+end bumps stay
                # (start_metaTag ignore push + end_metaTag,
                # parser.c:994-1006; verified: +2, nothing indexed)
                self._flush()
                self._pending += 2
                return
            if name and content:
                self._flush()
                bits = self._bits()
                if not self._ignore_stack:
                    # property capture: content chunks into the named
                    # property (raw-name lookup in the PROPERTY alias
                    # namespace) and every enclosing open property;
                    # an ignored section suppresses capture (binary:
                    # doc in tests/test_properties_user.py)
                    self._prop_capture(content, self._prop_of(name))
                name = self._alias(name)
                if self._ignore_stack:
                    # meta inside an ignored section: bumps only
                    self._pending += 2
                elif self._declared(name):
                    self._emit_island(name, content, bits | IN_META,
                                      1, 1)
                else:
                    # UndefinedMetaTags default: plain text, no field,
                    # no META bit; both bumps land before the content
                    # (end_metaTag bumps before its flush)
                    self._emit_island(DEFAULT_FIELD, content, bits,
                                      2, 0)
            # name/content missing: process_htmlmeta does nothing
            return
        if tag == "base":
            href = dict(attrs).get("href")
            if href:
                self._base_url = href  # <base> fixup (parser.c:1860)
            self._flush()
            # base is a void element: libxml2 fires start AND end at
            # the open tag, so both bumps land here (binary-verified:
            # '<base>' == '<base/>' == '<base></base>' == +2) and the
            # end handler ignores the tag
            self._pending += 2
            return
        if tag == "a" and self.index_links:
            href = dict(attrs).get("href")
            if href and not self._ignore_stack:
                # href words take positions at the TAG, before the
                # open token run flushes, with NO extra bumps and NO
                # META bit (extract_html_links → indexstring directly,
                # parser.c:1820-1867; verified: link@5-7, run@8+).
                # AbsoluteLinks OFF indexes the href verbatim — the
                # <base> fixup only applies when the directive is on.
                if self.absolute_links:
                    from urllib.parse import urljoin

                    base = self._base_url or self.doc_url
                    if base:
                        href = urljoin(base, href)
                self._emit_island(self.links_field, href,
                                  self._bits(), 0, 0)
            return
        if tag == "img" and (self.index_alt or self.images_field):
            d = dict(attrs)
            alt = d.get("alt") if self.index_alt else None
            if alt and not self._ignore_stack:
                if self.alt_field is None:
                    # "as-text": alt joins the open token run with no
                    # flush and no bumps (index_alt_tab char_hndl path,
                    # parser.c:1800-1817)
                    self._buf.append(alt)
                    self._buf_bits |= self._bits()
                elif self._declared(self.alt_field):
                    # named metaname: flush, then the island indexes
                    # under the field like a declared meta
                    self._flush()
                    self._emit_island(self._alias(self.alt_field), alt,
                                      self._bits() | IN_META, 1, 1)
                else:
                    # named but undeclared: undeclared-meta semantics
                    # (plain text, both bumps before the content)
                    self._flush()
                    self._emit_island(DEFAULT_FIELD, alt,
                                      self._bits(), 2, 0)
            src = d.get("src") if self.images_field else None
            if src and not self._ignore_stack:
                # img src via the same link path as <a href>
                # (extract_html_links with sw->images_meta,
                # parser.c:653-657), AFTER the alt handling
                if self.absolute_links:
                    from urllib.parse import urljoin

                    base = self._base_url or self.doc_url
                    if base:
                        src = urljoin(base, src)
                self._emit_island(self.images_field, src,
                                  self._bits(), 0, 0)
            self._buf.append(" ")  # img still separates words
            return
        if tag == "title":
            self._flush()
            self._prop_push(tag)
            self._open_head()
            self._in_title = True
            self._pending += 2  # title branch + non-inline element
            return
        if tag == "head":
            self._flush()
            self._prop_push(tag)
            self._open_head()
            return
        if tag == "body":
            self._flush()
            self._prop_push(tag)
            self._ensure_html()
            if self._head_open:
                self._head_open = False
                self._pending += 1  # implied </head>
            if not self._body_open:
                self._body_open = True
                self._pending += 2  # body branch + non-inline element
            return
        if tag in ("br", "img"):
            self._buf.append(" ")  # word boundary, NO bump
            return
        if tag in _EMPH_TAGS:
            self._em_toggle_on()
            return
        if tag in _INLINE_TAGS:
            return  # fully transparent (isinline != 0)
        header = _HEADER_RE.match(tag) is not None
        if tag in _KNOWN_HTML_TAGS or header:
            # known non-inline: flush FIRST, then bump
            self._flush()
            # a known html element can be a property, the
            # StoreDescription tag (PropertyNameAlias description td…),
            # or an IgnoreMetaTags section (binary: 'IgnoreMetaTags li'
            # drops every list item's text)
            self._prop_push(tag)
            if tag in self.ignore_meta_tags:
                self._ignore_stack.append(tag)
            if tag in _HEAD_TAGS or (tag == "style"
                                     and self._head_open):
                self._open_head()
            else:
                self._close_implied_p()
                self._implied_close_for_start(tag)
                self._ensure_body()
                if tag not in self.ignore_meta_tags \
                        and self.metanames is not None \
                        and (tag in self.metanames
                             or self._alias(tag) in self.metanames):
                    # a DECLARED metaname that is also a known html
                    # element scopes its subtree (binary: MetaNames li
                    # puts item text under field li with IN_META)
                    self._html_meta_stack.append(self._alias(tag))
                self._open_blocks.append(tag)
            self._pending += 1
            if header:
                self._header_depth += 1
            return
        # unknown tag: metaname path — bump BEFORE the pending run
        # flushes (start_metaTag, parser.c:986-989)
        self._close_implied_p()
        self._implied_close_for_start(tag)
        self._ensure_body()
        if header:
            self._header_depth += 1
        if tag not in self.dont_bump_tags:
            self._pending += 1
        self._flush()
        self._prop_push(tag)
        if tag in self.ignore_meta_tags:
            # IgnoreMetaTags element section: bumps continue, text
            # drops until the matching end tag (parser.c:994-1006)
            self._ignore_stack.append(tag)
        elif self.metanames is not None \
                and (tag in self.metanames
                     or self._alias(tag) in self.metanames):
            # a DECLARED metaname as an html element scopes its
            # subtree (start_metaTag with a metaEntry): words index
            # under the field with IN_META (verified: <meta3> inside
            # an html doc → field meta3, struct META|BODY|FILE);
            # aliases resolve to the BASE field
            self._html_meta_stack.append(self._alias(tag))
        self._open_blocks.append(tag)

    def handle_endtag(self, tag) -> None:
        if self._noindex_depth:
            return
        tag = tag.lower()
        if self.xml_mode:
            self._xml_end(tag)
            return
        if tag == "html":
            return
        if tag == "meta":
            return  # closed at start (end_hndl, parser.c:730-734)
        if tag == "base":
            return  # void element: both bumps landed at the start tag
        if tag == "title":
            self._flush()
            self._prop_pop(tag)
            self._in_title = False
            self._pending += 2
            return
        if tag == "head":
            self._flush()
            self._prop_pop(tag)
            self._head_open = False
            self._pending += 1
            return
        if tag == "body":
            self._flush()
            self._prop_pop(tag)
            self._pending += 2
            return
        if tag in _EMPH_TAGS:
            self._em_toggle_off()
            return
        if tag in _INLINE_TAGS or tag in ("br", "img"):
            return
        header = _HEADER_RE.match(tag) is not None
        if tag in _KNOWN_HTML_TAGS or header:
            self._flush()
            self._prop_pop(tag)
            if self._ignore_stack and self._ignore_stack[-1] == tag:
                self._ignore_stack.pop()
            if self._html_meta_stack \
                    and self._html_meta_stack[-1] == self._alias(tag):
                self._html_meta_stack.pop()
            if header:
                self._header_depth = max(0, self._header_depth - 1)
            self._close_down_to(tag)  # implied </li> etc. bump first
            self._pending += 1
            return
        if self._ignore_stack and self._ignore_stack[-1] == tag:
            # end of an IgnoreMetaTags section: pop on the FIRST
            # matching end tag (pop_stack_ifMatch), normal end bump
            self._ignore_stack.pop()
            self._close_down_to(tag)
            if tag not in self.dont_bump_tags:
                self._pending += 1
            self._flush()
            self._prop_pop(tag)
            return
        if self._html_meta_stack \
                and self._html_meta_stack[-1] == self._alias(tag):
            # declared-meta pop flushes the scoped content BEFORE the
            # end bump (pop_stack → flush, end_metaTag)
            self._flush()
            self._prop_pop(tag)
            self._html_meta_stack.pop()
            self._close_down_to(tag)
            if tag not in self.dont_bump_tags:
                self._pending += 1
            return
        # unknown end tag: bump then flush (end_metaTag)
        self._close_down_to(tag)
        if tag not in self.dont_bump_tags:
            self._pending += 1
        self._flush()
        self._prop_pop(tag)

    def _prop_push(self, tag: str) -> None:
        """Open property / StoreDescription capture for ``tag`` (one
        tag can open both — e.g. the desc tag is also a declared
        property)."""
        pb = self._prop_of(tag)
        if pb is not None:
            self._open_props.append((tag, pb))
        if tag == self.description_tag:
            self._open_props.append((tag, DESC_KEY))

    def _prop_pop(self, tag: str) -> None:
        """Close capture on the FIRST matching end tag, AFTER the
        end-tag flush captured the final chunk. At most one property
        entry and one description entry pop per end tag (nested
        same-name elements each own their pop)."""
        popped_desc = popped_prop = False
        while self._open_props and self._open_props[-1][0] == tag:
            is_desc = self._open_props[-1][1] == DESC_KEY
            if is_desc and not popped_desc:
                self._open_props.pop()
                popped_desc = True
            elif not is_desc and not popped_prop:
                self._open_props.pop()
                popped_prop = True
            else:
                break

    def _em_toggle_on(self) -> None:
        # flush completed words; a partial token stays open and will
        # carry the emphasis bit for its whole length
        text = "".join(self._buf)
        if text and not text[-1].isspace():
            m = _LAST_WS_RE.search(text)
            if m is not None:
                done, tail = text[:m.end()], text[m.end():]
                bits = self._buf_bits
                self._buf = [done]
                self._buf_bits = bits
                self._flush()
                self._buf = [tail]
                self._buf_bits = bits
            # else: single partial token — keep whole buffer
        else:
            self._flush()
        self._em_depth += 1

    def _em_toggle_off(self) -> None:
        text = "".join(self._buf)
        if text and not text[-1].isspace():
            self._em_defer += 1  # bit off at next word boundary
        else:
            self._em_depth = max(0, self._em_depth - 1)

    def handle_startendtag(self, tag, attrs) -> None:
        # <tag/> ≡ <tag></tag> in BOTH modes: libxml2 fires the start
        # AND end element callbacks for self-closing tags even in HTML
        # mode (binary-verified: IgnoreMetaTags `<meta2/>`,
        # `IgnoreMetaTags li` with `<li/>`, and `<base/>` all produce
        # positions identical to the explicit open+close form) — a
        # start-only handling would leave an IgnoreMetaTags section
        # open and silently drop the rest of the document
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def parse_bogus_comment(self, i, report=1):
        """libxml2 passes a bogus declaration (`<!META ...>`, the
        legacy swish meta-section markup) through as TEXT content
        minus the delimiters (verified against the binary);
        html.parser would report it as a comment."""
        rawdata = self.rawdata
        pos = rawdata.find(">", i + 2)
        if pos == -1:
            return -1
        if report:
            self.handle_data(rawdata[i + 2:pos])
        return pos + 1

    def handle_comment(self, data: str) -> None:
        directive = data.strip().lower()
        if directive in ("noindex", "swishcommand noindex"):
            # directive comments neither flush nor bump: the open
            # token run continues across the whole hidden section;
            # noindex NESTS (counter ++/--, parser.c:1693-1703)
            self._noindex_depth += 1
            return
        if directive in ("index", "swishcommand index"):
            if self._noindex_depth:
                self._noindex_depth -= 1
            return
        if self.index_comments and not self._noindex_depth:
            # comment words index at the current position (+1 each
            # side) WITHOUT flushing the interrupted run
            # (parser.c:1710-1719)
            if data.strip():
                self.doc.events.append(
                    Event(DEFAULT_FIELD, to_latin1_text(data),
                          self._bits() | IN_COMMENTS,
                          self._pending + 1))
                self._pending = 1
            else:
                self._pending += 2


_WS_RE_SEARCH = re.compile(r"\s+")


def _WS_SEARCH(s: str):
    return _WS_RE_SEARCH.search(s)


_LAST_WS_RE = re.compile(r"\s(?=\S*$)")


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
            # self-closing: mirror handle_startendtag — <tag/> fires
            # the end callback immediately in BOTH modes (libxml2
            # behavior, binary-verified: '<b/>' toggles emphasis on
            # and straight off, an IgnoreMetaTags '<x/>' section
            # closes before any text drops)
            if m[8]:
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
                decl = m[3]
                if decl.startswith(("[", "-")) \
                        or decl[:7].lower() == "doctype":
                    # CDATA section / malformed comment / doctype with
                    # an internal subset: html.parser lexes these
                    # differently — bail to the slow path
                    return False
                # bogus declaration -> literal text (libxml2 behavior;
                # raw — matches the parse_bogus_comment override)
                handle_data(decl)
        # g == 4: PI — handle_pi is a no-op for this parser
    return pos == n


def extract_html(html: bytes | str, index_comments: bool = False,
                 xml_mode: bool = False, index_links: bool = False,
                 index_alt: bool = False, xml_attributes: bool = False,
                 xml_class_attributes: bool = False,
                 xml_nested_metanames: bool = False,
                 dont_bump_tags: frozenset = frozenset(),
                 metanames: frozenset | None = None,
                 **opts) -> ExtractedDoc:
    """Extract an HTML/XML document into ordered field/structure events.

    ``opts`` passes through to :class:`_SwishHTMLParser` — the
    directive-shaped options (``meta_aliases``, ``ignore_meta_tags``,
    ``links_field``, ``images_field``, ``alt_field``,
    ``absolute_links``, ``doc_url``)."""
    raw = _decode_bytes(html) if isinstance(html, (bytes, bytearray)) else html
    desc_size = opts.pop("description_size", None)  # StoreDescription
    # byte cap — applied to the captured chunks below, not in the
    # parser (the binary caps at append time; same algorithm as
    # property MaxLength, docprops.finalize)

    def _mk():
        return _SwishHTMLParser(
            index_comments=index_comments, xml_mode=xml_mode,
            index_links=index_links, index_alt=index_alt,
            xml_attributes=xml_attributes,
            xml_class_attributes=xml_class_attributes,
            xml_nested_metanames=xml_nested_metanames,
            dont_bump_tags=dont_bump_tags, metanames=metanames,
            **opts)

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
        if ev.structure & IN_TITLE
    ]
    doc.title = " ".join(t for t in title_parts if t)
    if p.description_tag is not None:
        # StoreDescription <tag> [size]: swishdescription = text
        # captured under the tag, byte-capped exactly like a property
        # append (binary: '<desc> 12' over 'This is the Description
        # text' stores 'This is the ' — trailing space kept)
        from .docprops import PropSpec, finalize

        doc.description = finalize(
            PropSpec("swishdescription", max_len=desc_size),
            doc.prop_chunks.pop(DESC_KEY, ())) or ""
    else:
        body = doc.body_text()
        doc.description = body[:DESCRIPTION_MAX]
    return doc


def extract_txt(text: bytes | str) -> ExtractedDoc:
    """TXT passthrough (parse_TXT, /root/reference/src/parser.c:280-312):
    one continuous token stream — positions are sequential with NO
    bumps across lines or blank lines, structure is IN_FILE only
    (verified against the compiled binary)."""
    raw = _decode_bytes(text) if isinstance(text, (bytes, bytearray)) else text
    doc = ExtractedDoc()
    if raw.strip():
        doc.events.append(
            Event(DEFAULT_FIELD, to_latin1_text(raw), IN_FILE, 0))
    body = doc.body_text()
    doc.description = body[:DESCRIPTION_MAX]
    return doc


def extract(content: bytes | str, doctype: str = "html",
            index_comments: bool = False, index_links: bool = False,
            index_alt: bool = False, xml_attributes: bool = False,
            xml_class_attributes: bool = False,
            xml_nested_metanames: bool = False,
            dont_bump_tags: frozenset = frozenset(),
            metanames: frozenset | None = None,
            **opts) -> ExtractedDoc:
    if doctype == "txt":
        return extract_txt(content)
    if doctype == "xml":
        return extract_html(content, index_comments=index_comments,
                            xml_mode=True,
                            xml_attributes=xml_attributes,
                            xml_class_attributes=xml_class_attributes,
                            xml_nested_metanames=xml_nested_metanames,
                            dont_bump_tags=dont_bump_tags,
                            metanames=metanames, **opts)
    return extract_html(content, index_comments=index_comments,
                        index_links=index_links, index_alt=index_alt,
                        dont_bump_tags=dont_bump_tags,
                        metanames=metanames, **opts)
