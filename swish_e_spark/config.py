"""swish-e configuration-file front-end.

Parses the reference's ``swish.conf`` directive language
(parse_conffile.c — one directive per line, ``#`` comment lines,
double-quoted values, ``IncludeConfigFile`` recursion) and maps it
onto :class:`swish_e_spark.index.builder.IndexConfig` plus the
source-selection state the CLI needs (IndexDir/IndexFile/IndexOnly/
IndexContents/FileRules/ReplaceRules/...).

This is the compatibility surface that lets a reference user bring
their existing config file: every directive either maps onto an
engine feature, is harmless-by-design under the Spark architecture
(recorded in ``ignored``), or is collected in ``unknown`` so the CLI
can warn instead of silently mis-indexing. Directive names are
case-insensitive like the reference (strcasecmp throughout
parse_conffile.c).
"""

from __future__ import annotations

import os
import re
import shlex
from dataclasses import asdict, dataclass, field

from .index.builder import IndexConfig


class ConfigError(ValueError):
    pass


# FuzzyIndexingMode names (fuzzy_opts, /root/reference/src/
# stemmer.c:116-141) -> tokenizer mode strings
_FUZZY_MODES = {
    "nofuzzy": "none",
    "soundex": "soundex",
    "metaphone": "metaphone",
    "doublemetaphone": "doublemetaphone",
    # "Stem"/"Stemming"/"Stemming_en" are deprecated aliases of
    # Stemming_en1 (stemmer.c:280-284)
    "stem": "snowball_en1",
    "stemming": "snowball_en1",
    "stemming_en": "snowball_en1",
}
for _lang in ("de", "dk", "en1", "en2", "es", "fi", "fr", "hu", "it",
              "nl", "no", "pt", "ro", "ru", "se"):
    _FUZZY_MODES[f"stemming_{_lang}"] = f"snowball_{_lang}"

# Directives that are intentionally no-ops here: presentation knobs,
# or knobs whose concern the Spark architecture handles structurally
# (compression levels, temp paths, economy mode ⇒ staged parquet).
_IGNORED = {
    "indexreport", "indexverbose", "parserwarnlevel",
    "compresspositions", "propcompressionlevel", "tmpdir",
    "indexpointer", "followsymlinks",
    "swishsearchoperators", "swishsearchdefaultrule",
    "resultextformatname", "filerules directory",
}

_DOC_TYPES = {"txt": "txt", "html": "html", "html2": "html",
              "xml": "xml", "xml2": "xml", "txt2": "txt",
              "wml": "xml", "txt*": "txt", "html*": "html",
              "xml*": "xml"}


@dataclass
class SwishConfig:
    """Parsed configuration: engine kwargs + source directives."""

    index_file: str | None = None          # IndexFile / -f
    index_dirs: list = field(default_factory=list)   # IndexDir / -i
    index_only: list = field(default_factory=list)   # suffix allowlist
    index_contents: list = field(default_factory=list)  # (doctype, pat)
    default_contents: str | None = None
    no_contents: list = field(default_factory=list)  # suffix patterns
    file_rules: list = field(default_factory=list)   # (kind, regex) REJECT
    file_matches: list = field(default_factory=list)  # (kind, regex) ACCEPT
    replace_rules: list = field(default_factory=list)  # (op, args)
    ignore_limit: tuple | None = None      # (plimit, flimit)
    header: dict = field(default_factory=dict)  # IndexName/Admin/...
    kwargs: dict = field(default_factory=dict)  # IndexConfig fields
    ignored: list = field(default_factory=list)
    unknown: list = field(default_factory=list)

    def to_index_config(self, **overrides) -> IndexConfig:
        kw = dict(self.kwargs)
        kw.update(overrides)
        return IndexConfig(**kw)


def _prop_find(kw, name: str):
    """Declared PropSpec by name from kw['properties'], or None."""
    from .textproc.docprops import spec_of

    for t in kw.get("properties") or ():
        s = spec_of(t)
        if s.name == name:
            return s
    return None


def _prop_upsert(kw, name: str, **changes) -> None:
    """Create or update one property spec in kw['properties']."""
    from dataclasses import replace

    from .textproc.docprops import PropSpec, spec_of

    out, found = [], False
    for t in kw.get("properties") or ():
        s = spec_of(t)
        if s.name == name:
            s = replace(s, **changes)
            found = True
        out.append(s.to_tuple())
    if not found:
        out.append(PropSpec(name, **changes).to_tuple())
    kw["properties"] = tuple(out)


def _words(value: str) -> list[str]:
    """Reference value tokenization: whitespace-split with
    double-quoted strings kept whole (build_string_list,
    /root/reference/src/string_list.c)."""
    lex = shlex.shlex(value, posix=True)
    lex.whitespace_split = True
    lex.commenters = ""  # '#' inside a value is literal
    lex.escape = ""  # the reference splitter has no backslash
    #                  processing, only double-quote grouping
    #                  (build_string_list, string_list.c)
    return list(lex)


def _yesno(directive: str, w: str) -> bool:
    v = w.lower()
    if v in ("yes", "on", "1", "true"):
        return True
    if v in ("no", "off", "0", "false"):
        return False
    raise ConfigError(f"{directive}: expected yes/no, got {w!r}")


def _word_list(words: list[str], base_dir: str) -> list[str]:
    """Expand ``File: path`` word-list includes (the reference's
    IgnoreWords/UseWords/BuzzWords file form, parse_conffile.c
    get_stringlist + readwordsfile)."""
    out: list[str] = []
    i = 0
    while i < len(words):
        w = words[i]
        if w.lower() in ("file:",) and i + 1 < len(words):
            out.extend(_read_words_file(os.path.join(base_dir,
                                                     words[i + 1])))
            i += 2
            continue
        if w.lower().startswith("file:") and len(w) > 5:
            out.extend(_read_words_file(os.path.join(base_dir, w[5:])))
            i += 1
            continue
        out.append(w)
        i += 1
    return out


def _read_words_file(path: str) -> list[str]:
    with open(path, encoding="latin-1") as f:
        return [w for line in f
                if not line.lstrip().startswith("#")
                for w in line.split()]


def _rule_regex(directive: str, mode: str, pattern: str) -> str:
    """FileRules/FileMatch ``is|contains|regex`` pattern → one Python
    regex (fs.c:200-246 via add_regex_patterns: 'is' anchors the whole
    string, 'contains' substring-searches, 'regex' is verbatim)."""
    if mode == "is":
        return "^" + re.escape(pattern).replace(r"\*", ".*") + "$"
    if mode == "contains":
        return pattern  # re.search semantics = contains
    if mode == "regex":
        return pattern
    raise ConfigError(
        f"{directive} must be followed by [is|contains|regex], "
        f"got {mode!r}")


def parse_config(text: str, base_dir: str = ".") -> SwishConfig:
    """Parse swish.conf text into a SwishConfig."""
    conf = SwishConfig()
    _parse_into(conf, text, base_dir, depth=0)
    # UseStemming/UseSoundex are legacy switches that lose to an
    # explicit FuzzyIndexingMode (the reference warns and overrides)
    kw = conf.kwargs
    if kw.get("metanames") is not None:
        # directives that addMetaEntry() implicitly make their target
        # a declared MetaName (ExtractPath/ExtractPathDefault
        # parse_conffile.c:510,527; ImageLinksMetaName :680;
        # HTMLLinksMetaName parser.c links_meta lookup-or-add) —
        # order-independent, so resolved after the full parse
        implied = [m for m, _ in kw.get("extract_path", ())]
        implied += [m for m, _ in kw.get("extract_path_defaults", ())]
        if kw.get("images_field"):
            implied.append(kw["images_field"])
        if kw.get("index_links"):
            implied.append(kw.get("links_field", "links"))
        have = set(kw["metanames"])
        kw["metanames"] += tuple(m for m in dict.fromkeys(implied)
                                 if m not in have)
    return conf


def parse_config_file(path: str) -> SwishConfig:
    with open(path, encoding="latin-1") as f:
        text = f.read()
    return parse_config(text, base_dir=os.path.dirname(
        os.path.abspath(path)))


def _parse_into(conf: SwishConfig, text: str, base_dir: str,
                depth: int) -> None:
    if depth > 10:
        raise ConfigError("IncludeConfigFile nesting too deep")
    kw = conf.kwargs
    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        d, _, value = line.partition(" ")
        d0, dl = d, d.lower()
        value = value.strip()

        try:
            words = _words(value)
        except ValueError as e:
            raise ConfigError(f"line {lineno}: {d0}: {e}") from None

        def need(n, exact=False):
            if (len(words) != n) if exact else (len(words) < n):
                raise ConfigError(
                    f"line {lineno}: {d0} requires "
                    f"{'exactly' if exact else 'at least'} {n} value(s)")

        if dl == "includeconfigfile":
            need(1)
            p = os.path.join(base_dir, words[0])
            with open(p, encoding="latin-1") as f:
                _parse_into(conf, f.read(),
                            os.path.dirname(os.path.abspath(p)),
                            depth + 1)
        elif dl == "indexfile":
            need(1)
            conf.index_file = os.path.join(base_dir, words[0]) \
                if not os.path.isabs(words[0]) else words[0]
        elif dl == "indexdir":
            need(1)
            conf.index_dirs.extend(words)
        elif dl == "indexonly":
            need(1)
            conf.index_only.extend(w.lower() for w in words)
        elif dl == "indexcontents":
            need(2)
            t = words[0].lower()
            if t not in _DOC_TYPES:
                raise ConfigError(
                    f"line {lineno}: IndexContents: bad type {words[0]!r}")
            conf.index_contents.extend(
                (_DOC_TYPES[t], p) for p in words[1:])
        elif dl == "defaultcontents":
            need(1, exact=True)
            t = words[0].lower()
            if t not in _DOC_TYPES:
                raise ConfigError(
                    f"line {lineno}: DefaultContents: bad type "
                    f"{words[0]!r}")
            conf.default_contents = _DOC_TYPES[t]
        elif dl == "nocontents":
            need(1)
            conf.no_contents.extend(words)
        elif dl in ("filerules", "filematch"):
            need(3)
            kind = words[0].lower()
            if kind == "directory":  # dircontains: subtree pruning
                kind = "dircontains"
            if kind not in ("pathname", "filename", "dirname", "title",
                            "dircontains"):
                raise ConfigError(
                    f"line {lineno}: {d0}: invalid parameter "
                    f"{words[0]!r}")
            dest = (conf.file_rules if dl == "filerules"
                    else conf.file_matches)
            for pat in words[2:]:
                dest.append((kind, _rule_regex(d0, words[1].lower(),
                                               pat)))
        elif dl == "replacerules":
            need(2)
            op = words[0].lower()
            if op not in ("replace", "remove", "prepend", "append",
                          "regex"):
                raise ConfigError(
                    f"line {lineno}: ReplaceRules: bad op {words[0]!r}")
            if op == "replace" and len(words) != 3:
                raise ConfigError(
                    f"line {lineno}: ReplaceRules replace needs "
                    f"old new")
            conf.replace_rules.append((op, tuple(words[1:])))
        elif dl in ("filefilter", "filefiltermatch"):
            # FileFilter .sfx prog  |  FileFilterMatch prog opts regex
            # (filter.c:266-301). External programs don't exist here:
            # the program name must resolve in the in-process filter
            # registry (sources/filters.py) — checked at build time.
            need(2)
            if dl == "filefilter":
                kw.setdefault("file_filters", ())
                kw["file_filters"] += ((words[0].lower(), words[1]),)
            else:
                need(3)
                kw.setdefault("file_filters", ())
                kw["file_filters"] += (("re:" + words[2], words[0]),)
        elif dl == "metanames":
            need(1)
            kw["metanames"] = tuple(kw.get("metanames") or ()) + tuple(
                w.lower() for w in words)
        elif dl == "metanamealias":
            # MetaNameAlias <base> <alias>... — aliases resolve to the
            # base on BOTH sides; alias-of-alias and redefining an
            # existing name are refused (parse_conffile.c:571-581)
            need(2)
            base = words[0].lower()
            cur = dict(kw.get("meta_aliases") or ())
            if base in cur:
                raise ConfigError(
                    f"line {lineno}: MetaNameAlias: name {base!r} "
                    f"must not be an alias")
            declared = kw.get("metanames")
            if declared is not None and base not in declared:
                raise ConfigError(
                    f"line {lineno}: MetaNameAlias: name {base!r} "
                    f"not a MetaName")
            for w in words[1:]:
                a = w.lower()
                if a in cur or a == base \
                        or (declared is not None and a in declared):
                    raise ConfigError(
                        f"line {lineno}: MetaNameAlias: name {a!r} is "
                        f"already a MetaName or MetaNameAlias")
                cur[a] = base
            kw["meta_aliases"] = tuple(cur.items())
        elif dl == "ignoremetatags":
            # IgnoreMetaTags <name>... — section content dropped, tag
            # bumps stay (parser.c:994-1006)
            need(1)
            kw["ignore_meta_tags"] = tuple(
                kw.get("ignore_meta_tags") or ()) + tuple(
                w.lower() for w in words)
        elif dl == "bumppositioncountercharacters":
            need(1)
            kw["bump_pos_chars"] = value
        elif dl == "truncatedocsize":
            need(1, exact=True)
            kw["truncate_doc_size"] = int(words[0])
        elif dl == "obeyrobotsnoindex":
            # the engine default is yes (web pipeline); the directive
            # restores the binary's no-obey (parse_conffile.c:481 area;
            # checked in process_htmlmeta, parser.c:1507-1516)
            need(1, exact=True)
            kw["obey_robots_noindex"] = _yesno(d0, words[0])
        elif dl == "absolutelinks":
            need(1, exact=True)
            kw["absolute_links"] = _yesno(d0, words[0])
        elif dl == "ignoretotalwordcountwhenranking":
            need(1, exact=True)
            kw["ignore_total_word_count"] = _yesno(d0, words[0])
        elif dl == "extractpath":
            # ExtractPath <metaname> <op> <args...> — one list entry
            # per directive, walked in order (parse_conffile.c:502-557)
            need(3)
            meta = words[0].lower()
            op = words[1].lower()
            if op not in ("replace", "remove", "prepend", "append",
                          "regex"):
                raise ConfigError(
                    f"line {lineno}: ExtractPath: bad op {words[1]!r}")
            if op == "replace" and len(words) != 4:
                raise ConfigError(
                    f"line {lineno}: ExtractPath replace needs old new")
            kw.setdefault("extract_path", ())
            kw["extract_path"] += ((meta, (op,) + tuple(words[2:])),)
        elif dl == "extractpathdefault":
            # ExtractPathDefault <metaname> <default_value> — exactly
            # two values, redefinition refused (parse_conffile.c:
            # 520-533)
            need(2, exact=True)
            meta = words[0].lower()
            if meta in dict(kw.get("extract_path_defaults") or ()):
                raise ConfigError(
                    f"line {lineno}: ExtractPathDefault already "
                    f"defined for meta {meta!r}")
            kw.setdefault("extract_path_defaults", ())
            kw["extract_path_defaults"] += ((meta, words[1]),)
        elif dl == "metanamesrank":
            # MetaNamesRank <bias> <name>... (parse_conffile.c)
            need(2)
            bias = int(words[0])
            kw.setdefault("rank_biases", ())
            kw["rank_biases"] += tuple((w.lower(), bias)
                                       for w in words[1:])
        elif dl in ("propertynames", "propertynamesnumeric",
                    "propertynamesdate"):
            # user doc properties: typed docs-table columns
            # (parse_conffile.c:709-880 — redefinition refused)
            need(1)
            kind = {"propertynames": "string",
                    "propertynamesnumeric": "int",
                    "propertynamesdate": "date"}[dl]
            for w in words:
                nm = w.lower()
                if _prop_find(kw, nm) is not None:
                    raise ConfigError(
                        f"line {lineno}: {d0} - name {nm!r} is "
                        f"already a PropertyName")
                _prop_upsert(kw, nm, kind=kind)
            conf.header.setdefault("property_names", []).extend(
                w.lower() for w in words)
        elif dl in ("propertynamesignorecase",
                    "propertynamescomparecase",
                    "propertynamesusestrcoll",
                    "propertynamesnostripchars",
                    "propertynamesstripchars"):
            # string-prop flags; auto-create if unseen
            # (parse_conffile.c:726-850)
            need(1)
            flag = {"propertynamesignorecase": ("ignore_case", True),
                    "propertynamescomparecase": ("ignore_case", False),
                    "propertynamesusestrcoll": ("use_strcoll", True),
                    "propertynamesnostripchars": ("nostrip", True),
                    "propertynamesstripchars": ("nostrip", False)}[dl]
            for w in words:
                nm = w.lower()
                sp = _prop_find(kw, nm)
                if sp is not None and sp.kind != "string":
                    raise ConfigError(
                        f"line {lineno}: {d0} - name {nm!r} is not a "
                        f"STRING type of Property")
                _prop_upsert(kw, nm, **{flag[0]: flag[1]})
        elif dl in ("propertynamesmaxlength",
                    "propertynamessortkeylength"):
            # <length> <name>... (parse_conffile.c:931-1006)
            need(2)
            length = int(words[0])
            attr = ("max_len" if dl == "propertynamesmaxlength"
                    else "sort_len")
            for w in words[1:]:
                nm = w.lower()
                sp = _prop_find(kw, nm)
                if sp is not None and sp.kind != "string":
                    raise ConfigError(
                        f"line {lineno}: {d0} - name {nm!r} is not a "
                        f"STRING type of Property")
                _prop_upsert(kw, nm, **{attr: length})
        elif dl == "propertynamealias":
            # <base> <alias>... — base must exist and not be an alias
            # (parse_conffile.c:887-918)
            need(2)
            base = words[0].lower()
            cur = dict(kw.get("prop_aliases") or ())
            if _prop_find(kw, base) is None or base in cur:
                raise ConfigError(
                    f"line {lineno}: PropertyNameAlias - name "
                    f"{base!r} not a PropertyName")
            for w in words[1:]:
                a = w.lower()
                if a in cur or _prop_find(kw, a) is not None:
                    raise ConfigError(
                        f"line {lineno}: PropertyNameAlias - name "
                        f"{a!r} is already a PropertyName or "
                        f"PropertyNameAlias")
                cur[a] = base
            kw["prop_aliases"] = tuple(cur.items())
        elif dl in ("dontbumppositiononmetatags",
                    "dontbumppositiononstarttags",
                    "dontbumppositiononendtags"):
            need(1)
            kw.setdefault("dont_bump_tags", ())
            kw["dont_bump_tags"] += tuple(w.lower() for w in words)
        elif dl == "swishprogparameters":
            # arguments handed to the -S prog program (grabCmdOptions,
            # /root/reference/src/extprog.c:100)
            need(1)
            conf.header.setdefault("prog_parameters", []).extend(words)
        elif dl in ("delay", "maxdepth", "spiderdirectory",
                    "equivalentserver"):
            # -S http spider knobs (/root/reference/src/http.c);
            # consumed by sources/spider.py policy
            need(1)
            conf.header.setdefault("spider", {})[dl] = (
                int(words[0]) if dl in ("delay", "maxdepth")
                else value)
        elif dl in ("ignorewords", "stopwords"):
            need(1)
            if len(words) == 1 and words[0].lower() == "swishdefault":
                pass  # the engine default list IS SwishDefault
            else:
                kw["stopwords"] = tuple(kw.get("stopwords") or ()) + \
                    tuple(w.lower() for w in _word_list(words, base_dir))
        elif dl == "usewords":
            need(1)
            kw["use_words"] = tuple(kw.get("use_words") or ()) + tuple(
                w.lower() for w in _word_list(words, base_dir))
        elif dl == "buzzwords":
            need(1)
            kw["buzzwords"] = tuple(kw.get("buzzwords") or ()) + tuple(
                w.lower() for w in _word_list(words, base_dir))
        elif dl == "wordcharacters":
            need(1)
            kw["word_chars"] = value
        elif dl == "begincharacters":
            need(1)
            kw["begin_chars"] = value
        elif dl == "endcharacters":
            need(1)
            kw["end_chars"] = value
        elif dl == "ignorefirstchar":
            need(1)
            kw["ignore_first_chars"] = value
        elif dl == "ignorelastchar":
            need(1)
            kw["ignore_last_chars"] = value
        elif dl == "ignorenumberchars":
            need(1)
            kw["number_chars"] = value
        elif dl == "translatecharacters":
            # "TranslateCharacters :ascii7:" or "from to"
            need(1)
            if words[0] == ":ascii7:":
                kw["translate_from"] = ":ascii7:"
            else:
                need(2, exact=True)
                if len(words[0]) != len(words[1]):
                    raise ConfigError(
                        f"line {lineno}: TranslateCharacters: from/to "
                        f"length mismatch")
                kw["translate_from"] = words[0]
                kw["translate_to"] = words[1]
        elif dl == "minwordlimit":
            need(1, exact=True)
            kw["min_word_len"] = int(words[0])
        elif dl == "maxwordlimit":
            need(1, exact=True)
            kw["max_word_len"] = int(words[0])
        elif dl == "usestemming":
            need(1, exact=True)
            if _yesno(d0, words[0]):
                kw.setdefault("fuzzy", "snowball_en1")
        elif dl == "usesoundex":
            need(1, exact=True)
            if _yesno(d0, words[0]):
                kw.setdefault("fuzzy", "soundex")
        elif dl == "fuzzyindexingmode":
            need(1, exact=True)
            m = words[0].lower()
            if m not in _FUZZY_MODES:
                raise ConfigError(
                    f"line {lineno}: FuzzyIndexingMode: unknown mode "
                    f"{words[0]!r}")
            kw["fuzzy"] = _FUZZY_MODES[m]  # explicit mode always wins
        elif dl == "ignorelimit":
            need(2, exact=True)
            conf.ignore_limit = (float(words[0]), int(words[1]))
        elif dl == "indexcomments":
            need(1, exact=True)
            kw["index_comments"] = _yesno(d0, words[0])
        elif dl == "htmllinksmetaname":
            # HTMLLinksMetaName <name>: href words index under <name>
            # (sw->links_meta, parser.c:640-652)
            need(1, exact=True)
            kw["index_links"] = True
            kw["links_field"] = words[0].lower()
        elif dl == "imagelinksmetaname":
            # ImageLinksMetaName <name>: <img src> under <name>
            # (sw->images_meta, parser.c:653-657)
            need(1, exact=True)
            kw["images_field"] = words[0].lower()
        elif dl == "indexalttagmetaname":
            # IndexAltTagMetaName <name|as-text>: alt text under a
            # metaname, or inline into the open token run
            # (sw->IndexAltTag/IndexAltTagMeta, parser.c:1800-1817)
            need(1, exact=True)
            kw["index_alt"] = True
            v = words[0].lower()
            kw["alt_field"] = None if v == "as-text" else v
        elif dl == "undefinedmetatags":
            need(1, exact=True)
            v = words[0].lower()
            if v == "auto":
                kw["metanames"] = None
            elif v in ("error", "ignore", "index"):
                pass  # declared-only semantics (builder default when
                # MetaNames is set); 'error'/'ignore'/'index' differ
                # only in what happens to undeclared tag text, which
                # the extractor already folds into swishdefault
            else:
                raise ConfigError(
                    f"line {lineno}: UndefinedMetaTags: possible "
                    f"values are error, ignore, index or auto")
        elif dl == "undefinedxmlattributes":
            need(1, exact=True)
            kw["xml_attributes"] = words[0].lower() in ("auto", "index")
        elif dl == "xmlclassattributes":
            need(1, exact=True)
            kw["xml_class_attributes"] = _yesno(d0, words[0])
        elif dl in ("indexname", "indexdescription", "indexadmin"):
            need(1)
            conf.header[dl[len("index"):]] = value
        elif dl == "storedescription":
            # StoreDescription HTML* <desc> [size]: swishdescription
            # = text captured under <desc>, byte-capped
            # (parse_conffile.c StoreDescription → SUMMARY_INFO,
            # parser.c:1631-1639). TXT form has no tag: first n bytes.
            need(2)
            t = words[0].lower()
            if t not in _DOC_TYPES:
                raise ConfigError(
                    f"line {lineno}: StoreDescription: bad type "
                    f"{words[0]!r}")
            dt = _DOC_TYPES[t]
            tag, size = None, None
            rest = words[1:]
            if rest and rest[0].startswith("<"):
                tag = rest[0].strip("<>").lower()
                rest = rest[1:]
            if rest:
                size = int(rest[0])
            if dt != "txt" and tag is None:
                raise ConfigError(
                    f"line {lineno}: StoreDescription {words[0]}: "
                    f"needs a <tag>")
            kw.setdefault("store_description", ())
            kw["store_description"] += ((dt, tag, size),)
            conf.header.setdefault("store_description", []).append(
                tuple(words))
        elif dl in _IGNORED or f"{dl} {value.split(' ')[0].lower()}" \
                in _IGNORED:
            conf.ignored.append((d0, value))
        else:
            conf.unknown.append((d0, value))


def replace_url(url: str, rules) -> str:
    """Apply ReplaceRules in order (fs.c path→URL rewriting via
    string/regex replace, /root/reference/src/parse_conffile.c
    ReplaceRules + docprops path): replace old new | remove s |
    prepend s | append s | regex /search/replace/flags."""
    for op, args in rules:
        if op == "replace":
            url = url.replace(args[0], args[1])
        elif op == "remove":
            url = url.replace(args[0], "")
        elif op == "prepend":
            url = args[0] + url
        elif op == "append":
            url = url + args[0]
        elif op == "regex":
            spec = args[0]
            sep = spec[0]
            parts = spec.split(sep)
            # /search/replace/[flags] → ['', search, replace, flags]
            if len(parts) < 3:
                raise ConfigError(f"ReplaceRules regex: bad spec "
                                  f"{spec!r}")
            search, repl = parts[1], parts[2]
            flags = parts[3] if len(parts) > 3 else ""
            count = 0 if "g" in flags else 1
            rx = re.compile(search,
                            re.IGNORECASE if "i" in flags else 0)
            # swish regex replace uses $1..$9 backrefs
            url = rx.sub(re.sub(r"\$(\d)", r"\\\1", repl), url,
                         count=count)
    return url


def doctype_rules_fn(conf: SwishConfig):
    """(url) -> doctype|None resolver from IndexContents /
    DefaultContents (getDocTypeOrAbort + suffix walk,
    /root/reference/src/fs.c). Returns None when neither matches so
    the builder's own url-suffix detection applies."""
    compiled = [(t, _suffix_matcher(p)) for t, p in conf.index_contents]
    default = conf.default_contents

    def resolve(url: str):
        for t, m in compiled:
            if m(url):
                return t
        return default
    return resolve


def _suffix_matcher(pattern: str):
    """IndexContents patterns are shell-ish suffix globs
    (``.htm*``, ``*.txt``); match case-insensitively on the filename
    like the reference's matchARegex on the suffix list."""
    import fnmatch

    pat = pattern.lower()
    if not pat.startswith("*"):
        pat = "*" + pat

    def m(url: str) -> bool:
        return fnmatch.fnmatch(url.lower().rsplit("/", 1)[-1], pat)
    return m


def summarize(conf: SwishConfig) -> str:
    """One-paragraph human summary for the CLI -v output."""
    parts = [f"IndexConfig: {asdict(conf.to_index_config())}"]
    if conf.ignored:
        parts.append("ignored (no-op under Spark): "
                     + ", ".join(d for d, _ in conf.ignored))
    if conf.unknown:
        parts.append("UNKNOWN directives: "
                     + ", ".join(d for d, _ in conf.unknown))
    return "\n".join(parts)
