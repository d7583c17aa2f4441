"""Query language compiler — swish-e query surface (SURVEY.md §2.5).

Grammar (reference: tokenize_query_string
/root/reference/src/swish_words.c:525-698, operator words
/root/reference/src/config.h:180-187):

  expr    := unit ( (AND|OR|NOT|NEAR<d>|<implicit AND>) unit )*
  unit    := [field '='] atom
  atom    := word | word'*' | '"' phrase '"' | '(' expr ')'

Semantics preserved from the reference:
- left-to-right evaluation, NO precedence
  (parseterm, /root/reference/src/search.c:1200-1392),
- default conjunction between adjacent units is AND
  (AND_RULE default, /root/reference/src/config.h:189),
- ``a NOT b`` rewrites to AND-NOT (anti-join) instead of materializing a
  complement (fixnot1, /root/reference/src/swish_words.c:1090-1115),
- phrases expand to positional adjacency chains (expandphrase,
  /root/reference/src/swish_words.c:1184-1229),
- query words run through the SAME tokenizer/stemmer as indexing
  (parse_swish_words, /root/reference/src/swish_words.c:296-362);
  stopwords inside phrases are dropped with no positional gap
  (stopwords are positionally transparent in the index too),
- stopword-only queries raise WORDS_TOO_COMMON
  (/root/reference/src/swish_words.c:809-1004),
- leading wildcard rejected (/root/reference/src/search.c:1552-1561),
- ``field=atom`` and ``field=(expr)`` scope terms to a metaname
  (fixmetanames, /root/reference/src/swish_words.c:1012-1068).

The compiler is pure Python and runs on the driver; both the oracle
evaluator and the Spark executor consume the same AST.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..textproc.extractor import DEFAULT_FIELD
from ..textproc.tokenizer import TokenizerConfig, tokenize_query_text


# wildcard token charset: the default WordCharacters incl. Latin-1
# letters (tokenizer._WORD_RE) plus the wildcard metachars
_WILD_CHARS = "[a-z0-9\xaa\xb5\xba\xc0-\xd6\xd8-\xf6\xf8-\xff?*]"
_PREFIX_CHARS = "[a-z0-9\xaa\xb5\xba\xc0-\xd6\xd8-\xf6\xf8-\xff]"


class QueryError(ValueError):
    pass


class WordsTooCommon(QueryError):
    """All query words were stopwords (WORDS_TOO_COMMON)."""


# ----- AST -----

@dataclass(frozen=True)
class Term:
    field: str
    term: str


@dataclass(frozen=True)
class Prefix:
    field: str
    prefix: str  # trailing-* wildcard


@dataclass(frozen=True)
class Pattern:
    """In-word wildcard: ``?`` matches one char, ``*`` any run —
    candidate words post-filtered against the pattern during the
    sorted-word scan (/root/reference/src/search.c:1662-1728)."""
    field: str
    pattern: str

    def regex(self) -> str:
        import re as _re

        return "".join(
            "." if c == "?" else ".*" if c == "*" else _re.escape(c)
            for c in self.pattern)

    def literal_prefix(self) -> str:
        for i, c in enumerate(self.pattern):
            if c in "?*":
                return self.pattern[:i]
        return self.pattern


@dataclass(frozen=True)
class Phrase:
    field: str
    terms: tuple  # query terms in order (stopwords already dropped)


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


@dataclass(frozen=True)
class AndNot:
    left: object
    right: object


@dataclass(frozen=True)
class Not:
    child: object  # unary complement (rank=1000 semantics)


@dataclass(frozen=True)
class Near:
    left: object
    right: object
    distance: int


_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|=|[^\s()=]+')
_NEAR_RE = re.compile(r"^near(\d*)$", re.IGNORECASE)


def _token_re(delim: str):
    """-P swaps the phrase delimiter (swish.c:666-672): the chosen
    char delimits phrases and '"' becomes an ordinary character that
    rides into the word tokenizer (stripped unless it is a
    WordCharacter — no string rewriting, so it can never split or
    merge tokens)."""
    if delim == '"':
        return _TOKEN_RE
    d = re.escape(delim)
    return re.compile(d + "[^" + d + "]*" + d + r"|\(|\)|=|[^\s()=]+")


def _lex(q: str, delim: str = '"'):
    if q.count(delim) % 2:
        # the reference refuses unterminated phrase quotes
        # (parse_swish_query syntax error; pinned against the compiled
        # binary: err "missing end quote or unbalanced parenthesis")
        raise QueryError("syntax error: missing end quote")
    return _token_re(delim).findall(q)


class _Parser:
    def __init__(self, tokens, cfg: TokenizerConfig, default_field: str,
                 phrase_delim: str = '"'):
        self.toks = tokens
        self.i = 0
        self.cfg = cfg
        self.phrase_delim = phrase_delim
        self.default_field = default_field
        self.dropped_stopwords = 0
        self.kept_terms = 0
        self._aliases = dict(cfg.meta_aliases)  # MetaNameAlias: query
        # field= resolves to the base metaname like the index side
        # (getMetaNameByName, /root/reference/src/metanames.c:347)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # expr := unit (op unit)*  — left-to-right, no precedence
    def parse_expr(self, field):
        first = self.peek()
        if first is not None and first.lower() == "not":
            # leading NOT → unary complement of the first unit
            # (notresultlist, /root/reference/src/search.c:2514-2553);
            # previously the operator word fell into parse_unit and
            # vanished as a stopword
            self.next()
            node = self._combine_andnot(None, self.parse_unit(field))
        else:
            node = self.parse_unit(field)
        while True:
            t = self.peek()
            if t is None or t == ")":
                return node
            op = t.lower()
            m = _NEAR_RE.match(op)
            if op == "and":
                self.next()
                nxt = self.peek()
                if nxt and nxt.lower() == "not":  # "and not" → andnot
                    self.next()
                    rhs = self.parse_unit(field)
                    node = self._combine_andnot(node, rhs)
                else:
                    rhs = self.parse_unit(field)
                    node = self._combine(And, node, rhs)
            elif op == "or":
                self.next()
                rhs = self.parse_unit(field)
                node = self._combine(Or, node, rhs)
            elif op == "not":
                self.next()
                rhs = self.parse_unit(field)
                node = self._combine_andnot(node, rhs)
            elif m:
                self.next()
                d = int(m.group(1)) if m.group(1) else 5
                rhs = self.parse_unit(field)
                if node is None or rhs is None:
                    node = node or rhs
                elif d == 0:
                    # near0 degrades to plain AND
                    # (/root/reference/src/search.c:1997-1999)
                    node = And(node, rhs)
                else:
                    node = Near(node, rhs, d)
            else:
                rhs = self.parse_unit(field)  # implicit AND
                node = self._combine(And, node, rhs)

    @staticmethod
    def _combine(cls, left, right):
        if left is None:
            return right
        if right is None:
            return left
        return cls(left, right)

    @staticmethod
    def _combine_andnot(left, right):
        if right is None:
            return left
        if left is None:
            return Not(right)  # dangling NOT → unary complement
        return AndNot(left, right)

    def parse_unit(self, field):
        t = self.peek()
        if t is None or t == ")":
            return None
        self.next()
        if t == "(":
            node = self.parse_expr(field)
            if self.peek() != ")":
                # the binary errors on unbalanced parens (pinned)
                raise QueryError("syntax error: unbalanced parenthesis")
            self.next()
            return node
        if t == "=":
            raise QueryError("syntax error: dangling '='")
        # field= scoping
        if self.peek() == "=":
            self.next()
            fname = t.lower()
            fname = self._aliases.get(fname, fname)
            nxt = self.peek()
            if nxt == "(":
                self.next()
                node = self.parse_expr(fname)
                if self.peek() != ")":
                    raise QueryError(
                        "syntax error: unbalanced parenthesis")
                self.next()
                return node
            if nxt is None:
                raise QueryError("syntax error: field= with no term")
            self.next()
            return self._atom(nxt, fname)
        return self._atom(t, field)

    def _atom(self, tok, field):
        if tok.startswith(self.phrase_delim):
            words = tokenize_query_text(tok.strip(self.phrase_delim),
                                        self.cfg)
            self.dropped_stopwords += sum(1 for w in words if w is None)
            # inside phrases a dual-code word (DoubleMetaphone) keeps
            # its primary code — positional adjacency over an OR
            # expansion has no reference semantics to mirror
            words = [w[0] if isinstance(w, tuple) else w
                     for w in words]
            # stopwords DROP from phrases with no positional gap —
            # index positions are transparent across stopwords, so
            # "alpha the beta" matches adjacent alpha/beta (verified
            # against the compiled reference binary)
            words = [w for w in words if w is not None]
            if not words:
                return None
            self.kept_terms += sum(1 for w in words if w is not None)
            if len(words) == 1:
                return Term(field, words[0])
            return Phrase(field, tuple(words))
        if tok.startswith("*") or tok.startswith("?"):
            raise QueryError(f"leading wildcard not allowed: {tok!r}")
        if "?" in tok or "*" in tok[:-1]:
            # in-word wildcard: normalize literal chars through the same
            # lowercase+translate stages, keep ?/* verbatim; wildcard
            # words bypass stemming/stopwords like the reference's
            # sorted-word scan (/root/reference/src/search.c:1662-1728)
            pat = tok.lower()
            if self.cfg.translate is not None:
                pat = pat.translate(self.cfg.translate)
            if not re.fullmatch(_WILD_CHARS + r"+", pat):
                raise QueryError(f"bad wildcard token: {tok!r}")
            self.kept_terms += 1
            return Pattern(field, pat)
        if tok.endswith("*"):
            # trailing-* prefix: like in-word wildcards, the body
            # bypasses stemming AND stopword removal — the reference
            # expands wildcards against the index's sorted word list
            # verbatim (/root/reference/src/search.c:1662-1728), so
            # `the*` matches theory/them and a stemmed index is probed
            # with the raw prefix, not its stem
            body = tok[:-1].lower()
            if self.cfg.translate is not None:
                body = body.translate(self.cfg.translate)
            if not re.fullmatch(_PREFIX_CHARS + r"+", body):
                raise QueryError(f"bad wildcard token: {tok!r}")
            self.kept_terms += 1
            return Prefix(field, body)
        words = [w for w in tokenize_query_text(tok, self.cfg)]
        if not words:
            return None
        if all(w is None for w in words):
            self.dropped_stopwords += len(words)
            return None
        words = [w for w in words if w is not None]
        self.kept_terms += len(words)
        if len(words) == 1:
            w0 = words[0]
            if isinstance(w0, tuple):
                # DoubleMetaphone query expansion: word -> (a OR b)
                # (/root/reference/src/swish_words.c:342-353)
                return Or(Term(field, w0[0]), Term(field, w0[1]))
            return Term(field, w0)
        # a token like "mother-in-law" sub-splits: implicit phrase
        # (dual-code words keep the primary, as in quoted phrases)
        words = [w[0] if isinstance(w, tuple) else w for w in words]
        return Phrase(field, tuple(words))


def parse_query(q: str, cfg: TokenizerConfig | None = None,
                default_field: str = DEFAULT_FIELD,
                phrase_delim: str = '"'):
    """Compile a query string to an AST. Raises WordsTooCommon if every
    word was a stopword, QueryError on syntax errors. ``phrase_delim``
    is the -P override (swish.c:666-672)."""
    node, _info = parse_query_info(q, cfg, default_field, phrase_delim)
    return node


def parse_query_info(q: str, cfg: TokenizerConfig | None = None,
                     default_field: str = DEFAULT_FIELD,
                     phrase_delim: str = '"'):
    """parse_query plus the parse metadata the reference reports in its
    result headers (Search words / Parsed words / Removed stopwords,
    display_result_headers /root/reference/src/swish.c:1769-1800)."""
    cfg = cfg or TokenizerConfig()
    toks = _lex(q, phrase_delim)
    if not toks:
        raise QueryError("empty query")
    p = _Parser(toks, cfg, default_field, phrase_delim)
    node = p.parse_expr(default_field)
    if p.peek() is not None:
        # a stray ")" (parse_expr stops without consuming it) — the
        # binary treats any unbalanced paren as a syntax error
        raise QueryError("syntax error: unbalanced parenthesis")
    if node is None:
        if p.dropped_stopwords and not p.kept_terms:
            raise WordsTooCommon("all query words are stopwords")
        raise QueryError("empty query after parsing")
    info = {
        "search_words": q,
        "parsed_words": sorted({t for _, t in collect_terms(node)}
                               | {f"{pre}*" for _, pre in
                                  collect_prefixes(node)}),
        "removed_stopwords": p.dropped_stopwords,
    }
    return node, info


def collect_terms(node):
    """All (field, term) leaves (Prefix excluded) — used for posting
    prefetch planning."""
    out = []

    def walk(n):
        if isinstance(n, Term):
            out.append((n.field, n.term))
        elif isinstance(n, Phrase):
            out.extend((n.field, t) for t in n.terms if t is not None)
        elif isinstance(n, (And, Or, AndNot, Near)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out


def collect_prefixes(node):
    out = []

    def walk(n):
        if isinstance(n, Prefix):
            out.append((n.field, n.prefix))
        elif isinstance(n, (And, Or, AndNot, Near)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out


def collect_patterns(node):
    out = []

    def walk(n):
        if isinstance(n, Pattern):
            out.append(n)
        elif isinstance(n, (And, Or, AndNot, Near)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Not):
            walk(n.child)

    walk(node)
    return out
