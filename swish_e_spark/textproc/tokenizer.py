"""Tokenizer / term pipeline — shared by the oracle and the Spark UDFs.

Re-expresses the reference's single tokenizer ``indexstring``
(/root/reference/src/index.c:2554-2761) and its stages (SURVEY.md §2.3):

1. whitespace split (next_word, /root/reference/src/index.c:2411-2440)
2. lowercase (/root/reference/src/index.c:2595)
3. BuzzWords exact-match bypass (/root/reference/src/index.c:2611-2625)
4. TranslateCharacters map (/root/reference/src/index.c:2632)
5. sub-split on non-WordCharacters (next_swish_word,
   /root/reference/src/index.c:2444-2492)
6. Ignore{First,Last}Char strip (/root/reference/src/swish_words.c:1238-1295)
7. stopword + min/max length checks (isokword,
   /root/reference/src/check.c:56-150; limits
   /root/reference/src/config.h:203-215)
8. optional Porter stemming (fuzzy_convert dispatch,
   /root/reference/src/stemmer.c:156-165)
9. one global per-doc position counter across all fields (addword,
   /root/reference/src/index.c:2396-2405)

Position semantics in this engine (verified against the compiled
reference binary's -T INDEXED_WORDS stream): ONLY indexed words consume
positions — stopwords, length/sanity rejects, and UseWords drops are
positionally transparent, so a phrase matches across a removed
stopword ("alpha the beta" ≡ "alpha beta"); each extraction
event carries an integer bump count matching the reference parser's
word_pos increments at structural tag boundaries, so phrases never
match across structure and positions equal the compiled binary's
-T INDEXED_WORDS stream. doc_len is the number of position-consuming
tokens (TotalWordsPerFile), NOT the final position counter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .extractor import ExtractedDoc
from .porter import porter_stem
from .stopwords import DEFAULT_STOPWORDS

MIN_WORD_LEN = 1   # /root/reference/src/config.h:203
MAX_WORD_LEN = 40  # /root/reference/src/config.h:215

# default WordCharacters = the reference's WORDCHARS
# (/root/reference/src/config.h:253): 0-9 a-z plus the Latin-1 letters
# aspell's iso8859-1.dat lists (ª µ º and À-ÿ minus × ÷). Accented
# words index as-is by default — there is NO default translate fold
# (TranslateCharacters is a config directive, not a default).
_WORD_RE = re.compile(
    "[0-9a-z\xaa\xb5\xba\xc0-\xd6\xd8-\xf6\xf8-\xff]+")


def _lat_lower(s: str) -> str:
    """Latin-1 strtolower: Python's .lower() maps µ (0xB5) to Greek μ
    (U+03BC), which the C locale does not — undo that one aberration
    so term bytes match the reference binary."""
    low = s.lower()
    if "\u03bc" in low:
        low = low.replace("\u03bc", "\xb5")
    return low
_WS_RE = re.compile(r"\s+")

_SANITY_CACHE: dict = {}


def _sanity_re(max_consec: int, max_repeat: int):
    """Regex matching isokword-rejected shapes: too many consecutive
    vowels, consonants, or digits, or one char repeated too often
    (/root/reference/src/check.c:56-150; limits 60/100)."""
    key = (max_consec, max_repeat)
    rx = _SANITY_CACHE.get(key)
    if rx is None:
        n = max_consec
        # runs reject at > IGNOREROW chars; same-char runs reject at
        # > IGNORESAME+1 (the reference counts REPEATS: check.c:90-96
        # increments `same` from the second identical char). Vowel/
        # consonant/digit row counters treat punctuation as
        # TRANSPARENT (check.c's else-if chain never resets rows on
        # ispunct), hence the [^a-z0-9]* gaps; the same-char rule uses
        # plain adjacency (lastchar updates on every char).
        rx = _SANITY_CACHE[key] = re.compile(
            "(?:[aeiou][^a-z0-9]*){%d,}"
            "|(?:[bcdfghjklmnpqrstvwxyz][^a-z0-9]*){%d,}"
            "|(?:[0-9][^a-z0-9]*){%d,}"
            r"|(.)\1{%d,}" % (n + 1, n + 1, n + 1, max_repeat + 1))
    return rx

_STEM_CACHE: dict = {}   # per-process: mode -> {word: stem}
_STEM_CACHE_CAP = 200_000

# the :ascii7: TranslateCharacters directive analogue (swish.h:580) —
# OPT-IN, not a default
DEFAULT_TRANSLATE = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿðø",
    "aaaaaaceeeeiiiinooooouuuuyydo",
)


@dataclass(frozen=True)
class TokenizerConfig:
    stem: bool = False
    stopwords: frozenset = DEFAULT_STOPWORDS
    buzzwords: frozenset = frozenset()
    min_word_len: int = MIN_WORD_LEN
    max_word_len: int = MAX_WORD_LEN
    translate: dict | None = None  # TranslateCharacters (None = no
                     # fold — the reference default; ASCII7_TRANSLATE
                     # is the :ascii7: directive analogue)
    fuzzy: str = ""  # FuzzyIndexingMode: ""(derive from stem)/"none"/
                     # "porter"/"soundex"/"metaphone" (fuzzy_opts
                     # dispatch, /root/reference/src/stemmer.c:117-165)
    word_chars: str | None = None  # WordCharacters: chars that form a
                     # word (None = the reference default set incl.
                     # Latin-1 letters, /root/reference/src/config.h:
                     # 253). Regex-escaped
                     # char set; sub-split happens on anything else
                     # (next_swish_word, /root/reference/src/index.c:2444)
    ignore_first_chars: str = ""  # IgnoreFirstChar iterative strip
    ignore_last_chars: str = ""   # IgnoreLastChar
                     # (/root/reference/src/swish_words.c:1238-1295)
    use_words: frozenset | None = None  # UseWords allowlist: when set,
                     # only listed words index; dropped words are
                     # positionally transparent like stopwords
                     # (/root/reference/src/index.c:2598-2607)
    number_chars: str = ""  # NumberChars: words made ONLY of these
                     # chars are skipped (/root/reference/src/index.c:2644)
    begin_chars: str = ""   # BeginCharacters: first char must be in set
    end_chars: str = ""     # EndCharacters: last char must be in set
                     # (/root/reference/src/index.c:2662-2666)

    max_consec: int = 60   # max consecutive vowels/consonants/digits
    max_repeat: int = 100  # max times one char may repeat
                     # (isokword sanity, /root/reference/src/check.c:56-150)
    meta_aliases: tuple = ()  # ((alias, base), ...) MetaNameAlias:
                     # the query parser resolves a field= alias to its
                     # base exactly like the index side
                     # (getMetaNameByName follows ->alias,
                     # /root/reference/src/metanames.c:347-358)
    bump_pos_chars: str = ""  # BumpPositionCounterCharacters: one
                     # extra position bump per next_swish_word
                     # extraction that saw any of these chars in its
                     # leading separator run or inside the word — at
                     # most ONE per extraction, applied even when the
                     # token is later dropped, query side unaffected
                     # (/root/reference/src/index.c:2444-2492)

    def char_checks_ok(self, tok: str) -> bool:
        """NumberChars / Begin/EndCharacters / isokword sanity filters."""
        if self.number_chars and all(c in self.number_chars
                                     for c in tok):
            return False
        if self.begin_chars and tok[:1] not in set(self.begin_chars):
            return False
        if self.end_chars and tok[-1:] not in set(self.end_chars):
            return False
        if len(tok) > min(self.max_consec, self.max_repeat) \
                and _sanity_re(self.max_consec,
                               self.max_repeat).search(tok):
            return False
        return True

    def word_re(self):
        if self.word_chars is None:
            return _WORD_RE
        return re.compile("[" + re.escape(self.word_chars) + "]+")

    def _cached(self, mode: str, fn):
        """Worker-lifetime stem cache (the STEMCACHE hash,
        /root/reference/src/index.c:2690-2721, /root/reference/src/
        config.h:366): Zipf token streams hit the same words
        constantly, so each executor process memoizes stem results
        per fuzzy mode, capped to bound memory."""
        cache = _STEM_CACHE.setdefault(mode, {})

        def cached(word, _c=cache, _f=fn):
            v = _c.get(word)
            if v is None:
                v = _f(word)
                if len(_c) < _STEM_CACHE_CAP:
                    _c[word] = v
            return v

        return cached

    def fuzzy_fn(self):
        """The per-token single-output fuzzy transform, or None.

        Mode names mirror fuzzy_opts (/root/reference/src/stemmer.c:
        116-141): "metaphone" = Double Metaphone PRIMARY code only
        (the reference's Metaphone mode runs DoubleMetaphone too,
        stemmer.c:121,389-392), "doublemetaphone" additionally emits
        the secondary code (see fuzzy_multi_fn), "snowball_XX" the
        per-language Snowball stemmers (XX in de dk en1 en2 es fi fr
        hu it nl no pt ro ru se). "metaphone_classic" keeps the
        original 1990 single-code Metaphone as an extra.
        """
        mode = self.fuzzy or ("porter" if self.stem else "none")
        if mode == "porter":
            return self._cached(mode, porter_stem)
        if mode == "soundex":
            from .soundex import soundex

            return self._cached(mode, soundex)
        if mode in ("metaphone", "doublemetaphone"):
            from .dmetaphone import double_metaphone

            def dm_primary(w):
                p = double_metaphone(w)[0]
                # empty code -> word passes through unchanged
                # (/root/reference/src/stemmer.c:378-383). Codes are
                # stored UPPERCASE exactly as the binary indexes them
                # (fuzzy_convert output goes to addword verbatim,
                # index.c:2725-2747 — pinned by tokens_dm.tsv)
                return p if p else w

            return self._cached(mode, dm_primary)
        if mode == "metaphone_classic":
            from .metaphone import metaphone

            return self._cached(mode,
                                lambda w: metaphone(w).lower())
        if mode.startswith("snowball_"):
            from .snowball import snowball_fn

            return self._cached(
                mode, snowball_fn(mode[len("snowball_"):]))
        if mode == "none":
            return None
        raise ValueError(f"unknown fuzzy mode {mode!r}")

    def fuzzy_multi_fn(self):
        """Multi-output fuzzy transform (word -> tuple of terms, all
        indexed at ONE position — /root/reference/src/index.c:
        2728-2747), or None for single-output modes. Only
        DoubleMetaphone emits two terms (primary + differing
        secondary, /root/reference/src/stemmer.c:394-400)."""
        if (self.fuzzy or "") != "doublemetaphone":
            return None
        from .dmetaphone import double_metaphone

        def dm_both(w):
            p, s = double_metaphone(w)
            if not p:
                return (w,)
            if s and s != p:
                return (p, s)
            return (p,)

        return self._cached("doublemetaphone_multi", dm_both)


def fuzzy_word(word: str, cfg: TokenizerConfig) -> str:
    """The SwishFuzzyWord API analogue
    (/root/reference/src/swish-e.h, perl/t/test.t stemming asserts)."""
    fn = cfg.fuzzy_fn()
    return fn(word.lower()) if fn else word.lower()


def fuzzy_word_list(word: str, cfg: TokenizerConfig) -> list:
    """Full word list like the reference's FUZZY_WORD->word_list —
    two entries for a DoubleMetaphone word with a distinct secondary
    code (/root/reference/src/stemmer.c:146-153)."""
    multi = cfg.fuzzy_multi_fn()
    if multi is not None:
        return list(multi(word.lower()))
    return [fuzzy_word(word, cfg)]


class Posting:
    """One (field, term) occurrence list within a single document
    (__slots__ + hand-rolled __init__: this is the build hot path and
    dataclass default_factory construction showed up in profiles)."""

    __slots__ = ("field_name", "term", "positions", "structures")

    def __init__(self, field_name, term, positions=None,
                 structures=None):
        self.field_name = field_name
        self.term = term
        self.positions = [] if positions is None else positions
        self.structures = [] if structures is None else structures

    def __eq__(self, other):
        return (self.field_name, self.term, self.positions,
                self.structures) == (other.field_name, other.term,
                                     other.positions, other.structures)


def normalize_token(tok: str, cfg: TokenizerConfig) -> str | None:
    """Stages 6-8 for one already-split subword: length checks, stopword
    check, stemming. Returns None if the token is dropped."""
    if tok in cfg.buzzwords:
        return tok  # buzzwords index verbatim, bypassing every check
                    # (/root/reference/src/index.c:2611-2625)
    if not (cfg.min_word_len <= len(tok) <= cfg.max_word_len):
        return None
    if not cfg.char_checks_ok(tok):
        return None
    if tok in cfg.stopwords:
        return None
    if cfg.use_words is not None and tok not in cfg.use_words:
        return None
    fn = cfg.fuzzy_fn()
    return fn(tok) if fn else tok


def split_words(text: str, cfg: TokenizerConfig):
    """Stages 1-6: whitespace split, lowercase, buzzword bypass,
    translate, word-character sub-split, Ignore{First,Last}Char strip.
    Yields raw subword tokens in order; buzzwords come through verbatim
    (lowercased)."""
    word_re = cfg.word_re()
    strip_f, strip_l = cfg.ignore_first_chars, cfg.ignore_last_chars
    for word in _WS_RE.split(text):
        if not word:
            continue
        low = _lat_lower(word)
        if cfg.buzzwords:
            # the reference strips Ignore{Last,First}Chars BEFORE the
            # buzzword comparison (index.c:2611-2620): 'c++.' with
            # IgnoreLastChar '.' matches buzzword 'c++'
            sw = low
            if strip_l:
                sw = sw.rstrip(strip_l)
            if strip_f:
                sw = sw.lstrip(strip_f)
            if sw in cfg.buzzwords:
                yield sw
                continue
        if cfg.translate is not None:
            low = low.translate(cfg.translate)
        for tok in word_re.findall(low):
            if strip_f:
                tok = tok.lstrip(strip_f)
            if strip_l:
                tok = tok.rstrip(strip_l)
            if tok:
                yield tok


def _split_words_bumps(text: str, cfg: TokenizerConfig):
    """``split_words`` with BumpPositionCounterCharacters parity
    (next_swish_word, /root/reference/src/index.c:2444-2492): yields
    ``(token_or_None, bumps)`` pairs. Each extraction call consumes
    one [separator-run][wordchar-run]; it owes ONE bump when any bump
    char appears in either part (bump_flag saturates at 1), applied
    even when the token is later dropped by length/stopword checks. A
    trailing separator run gets a final bump-only call (token None).
    Buzzwords take the addword shortcut before any splitting — no
    bump (index.c:2598-2625)."""
    bump = set(cfg.bump_pos_chars)
    word_re = cfg.word_re()
    strip_f, strip_l = cfg.ignore_first_chars, cfg.ignore_last_chars
    for word in _WS_RE.split(text):
        if not word:
            continue
        low = _lat_lower(word)
        if cfg.buzzwords:
            sw = low
            if strip_l:
                sw = sw.rstrip(strip_l)
            if strip_f:
                sw = sw.lstrip(strip_f)
            if sw in cfg.buzzwords:
                yield sw, 0
                continue
        if cfg.translate is not None:
            low = low.translate(cfg.translate)
        i, n = 0, len(low)
        while i < n:
            m = word_re.search(low, i)
            if m is None:
                # trailing separators: final call, bump check only
                yield None, int(any(c in bump for c in low[i:]))
                break
            b = int(any(c in bump for c in low[i:m.end()]))
            tok = m.group()
            if strip_f:
                tok = tok.lstrip(strip_f)
            if strip_l:
                tok = tok.rstrip(strip_l)
            yield (tok if tok else None), b
            i = m.end()


def tokenize_query_text(text: str, cfg: TokenizerConfig):
    """Tokenize a query word through the same pipeline; stopwords return
    None placeholders so phrase matching can keep positional gaps
    (parse_swish_words, /root/reference/src/swish_words.c:296-362)."""
    if cfg.use_words is not None:
        # UseWords is whole-word + verbatim (index.c:2598-2607): the
        # lowercased whitespace word is checked against the allowlist
        # directly — no translate, sub-split, or stemming; non-listed
        # words are positional gaps
        return [_lat_lower(w) if _lat_lower(w) in cfg.use_words else None
                for w in _WS_RE.split(text) if w]
    out = []
    fn = cfg.fuzzy_fn()
    multi = cfg.fuzzy_multi_fn()
    for tok in split_words(text, cfg):
        if tok in cfg.buzzwords:
            out.append(tok)  # verbatim, bypassing every check
            continue
        if not (cfg.min_word_len <= len(tok) <= cfg.max_word_len):
            continue
        if not cfg.char_checks_ok(tok):
            continue
        if tok in cfg.stopwords:
            out.append(None)
            continue
        if multi is not None:
            # DoubleMetaphone: a tuple entry expands to (a OR b) in
            # the compiler (/root/reference/src/swish_words.c:342-353)
            terms = multi(tok)
            out.append(terms[0] if len(terms) == 1 else terms)
        else:
            out.append(fn(tok) if fn else tok)
    return out


def tokenize_doc(doc: ExtractedDoc, cfg: TokenizerConfig):
    """Tokenize an extracted document.

    Returns ``(postings, doc_len)`` where postings is a dict
    ``(field_name, term) -> Posting`` with sorted positions, and doc_len
    is the number of position-consuming tokens (BM25 length;
    setTotalWordsPerFile analogue /root/reference/src/db_write.c:773).

    Hot path: when no buzzword can occur in an event, stages 1-5
    collapse to ONE regex pass over the lowercased+translated event text
    — token-stream-identical to the word-at-a-time path (the regex
    splits at whitespace exactly like the whitespace pre-split). A
    substring hit on any buzzword falls back to the exact slow path.
    """
    by_field: dict = {}
    pos = 0
    ntok = 0  # position-consuming tokens (TotalWordsPerFile analogue,
              # /root/reference/src/db_write.c:773) — NOT the position
              # counter, which additionally carries structural bump gaps
    if cfg.use_words is not None:
        # UseWords mode (index.c:2598-2607): whole whitespace words,
        # lowercased and checked verbatim against the allowlist —
        # translate, sub-split, stemming, and every other check are
        # bypassed; non-listed words still consume a position
        for ev in doc.events:
            pos += ev.bumps
            fan = ev.fields if ev.fields else (ev.field_name,)
            for word in _WS_RE.split(ev.text):
                if not word:
                    continue
                low = _lat_lower(word)
                if low not in cfg.use_words:
                    continue
                pos += 1
                ntok += 1
                for f2 in fan:
                    fd = by_field.setdefault(f2, {})
                    p = fd.get(low)
                    if p is None:
                        fd[low] = Posting(f2, low, [pos],
                                          [ev.structure])
                    else:
                        p.positions.append(pos)
                        p.structures.append(ev.structure)
        return ({(f, t): p for f, fd in by_field.items()
                 for t, p in fd.items()}, ntok)
    stop = cfg.stopwords
    fuzzy_fn = cfg.fuzzy_fn()
    multi_fn = cfg.fuzzy_multi_fn()
    minl, maxl = cfg.min_word_len, cfg.max_word_len
    trans = cfg.translate
    buzz = cfg.buzzwords
    custom_split = (cfg.word_chars is not None or cfg.ignore_first_chars
                    or cfg.ignore_last_chars)
    char_checks = bool(cfg.number_chars or cfg.begin_chars
                       or cfg.end_chars)
    sanity_len = min(cfg.max_consec, cfg.max_repeat)  # tokens longer
                                 # than this get the isokword sanity regex
    findall = cfg.word_re().findall
    # hot-path eligibility: no dual-emission, no allowlist, no
    # per-token char checks — the inner loop then has no per-token
    # branching beyond length/stopword (build throughput path)
    bump_mode = bool(cfg.bump_pos_chars)
    plain = (multi_fn is None and not char_checks and not bump_mode)
    for ev in doc.events:
        pos += ev.bumps  # structural position gaps (never matchable)
        field = ev.field_name
        fan_fields = ev.fields if ev.fields else None
        structure = ev.structure
        low = _lat_lower(ev.text)
        if bump_mode:
            toks = None  # dedicated (token, bump) path below
        elif custom_split or (buzz and any(b in low for b in buzz)):
            toks = split_words(ev.text, cfg)
        else:
            toks = findall(low if trans is None else low.translate(trans))
        if toks is not None and plain and fan_fields is None:
            fdict = by_field.get(field)
            if fdict is None:
                fdict = by_field[field] = {}
            fget = fdict.get
            for raw in toks:
                if buzz and raw in buzz:
                    # verbatim, bypassing length/sanity/stopword/stem
                    # (/root/reference/src/index.c:2611-2625)
                    pos += 1
                    ntok += 1
                    p = fget(raw)
                    if p is None:
                        fdict[raw] = Posting(field, raw, [pos],
                                             [structure])
                    else:
                        p.positions.append(pos)
                        p.structures.append(structure)
                    continue
                lr = len(raw)
                if lr < minl or lr > maxl:
                    continue
                if lr > sanity_len and not cfg.char_checks_ok(raw):
                    continue
                if raw in stop:
                    continue
                pos += 1
                ntok += 1
                term = fuzzy_fn(raw) if fuzzy_fn else raw
                p = fget(term)
                if p is None:
                    fdict[term] = Posting(field, term, [pos],
                                          [structure])
                else:
                    p.positions.append(pos)
                    p.structures.append(structure)
            continue
        pairs = (_split_words_bumps(ev.text, cfg) if bump_mode
                 else ((t, 0) for t in toks))
        fdict = None
        for raw, bmp in pairs:
            pos += bmp  # BumpPositionCounterCharacters gap — applies
            #             even when the token is dropped below
            if raw is None:
                continue
            if buzz and raw in buzz:
                # verbatim buzzword: bypasses every check and stem
                pos += 1
                ntok += 1
                for f2 in ((field,) if fan_fields is None
                           else fan_fields):
                    fd = by_field.setdefault(f2, {})
                    p = fd.get(raw)
                    if p is None:
                        fd[raw] = Posting(f2, raw, [pos], [structure])
                    else:
                        p.positions.append(pos)
                        p.structures.append(structure)
                continue
            if not minl <= len(raw) <= maxl:
                continue
            if (char_checks or len(raw) > sanity_len) \
                    and not cfg.char_checks_ok(raw):
                continue
            if raw in stop:
                continue
            pos += 1
            ntok += 1
            # DoubleMetaphone dual-emission: every code indexes at the
            # SAME position (the reference decrements the position
            # counter between codes, /root/reference/src/index.c:
            # 2728-2747); single-output modes skip the tuple loop
            terms = multi_fn(raw) if multi_fn is not None else None
            term = terms[0] if terms is not None \
                else (fuzzy_fn(raw) if fuzzy_fn else raw)
            while True:
                for f2 in ((field,) if fan_fields is None
                           else fan_fields):
                    # nested-metaname fan-out: one posting per
                    # in-scope field, SAME position (addword loop,
                    # /root/reference/src/index.c:2400-2402)
                    fd = by_field.get(f2)
                    if fd is None:
                        fd = by_field[f2] = {}
                    p = fd.get(term)
                    if p is None:
                        fd[term] = Posting(f2, term, [pos],
                                           [structure])
                    else:
                        p.positions.append(pos)
                        p.structures.append(structure)
                if terms is None or len(terms) == 1 \
                        or term == terms[1]:
                    break
                term = terms[1]
    postings = {(f, t): p for f, fd in by_field.items()
                for t, p in fd.items()}
    return postings, ntok


ASCII7_TRANSLATE = DEFAULT_TRANSLATE  # :ascii7: directive alias
