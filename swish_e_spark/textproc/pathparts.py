"""ExtractPath / ExtractPathDefault: index parts of the document PATH
under a metaname (index_path_parts, /root/reference/src/index.c:
1537-1577; directive parse /root/reference/src/parse_conffile.c:
502-557).

Semantics verified against the compiled binary:
- each ExtractPath directive is one list entry (metaname, op); entries
  are walked in directive order with ONE SHARED position counter
  starting at 1 (``positionMeta`` in index.c:1543 is local to the doc,
  shared across entries),
- an entry whose expression matched indexes the TRANSFORMED path
  string under its metaname; an entry that did not match indexes its
  metaname's ExtractPathDefault instead (when one is set),
- a metaname with a default but NO ExtractPath entry indexes nothing
  (the walk only visits entries),
- the words carry structure IN_FILE only and do NOT count toward
  TotalWordsPerFile (index_path_parts discards indexstring's count),
- positions live in the same per-doc position space as body words
  (both start near 1) — the reference does the same; field scoping is
  what keeps phrase matching meaningful.
"""

from __future__ import annotations

import re

from .extractor import IN_FILE, Event


def apply_op(path: str, op: str, args: tuple) -> tuple[str, bool]:
    """One ReplaceRules-style expression applied to ``path`` →
    ``(result, matched)``. The reference compiles every op to a regex
    (add_regex_patterns), so 'matched' means the pattern occurred:
    replace/remove match when the needle occurs, prepend/append always
    match (their regexes are ^ / $)."""
    if op == "replace":
        old, new = args[0], args[1]
        return path.replace(old, new), old in path
    if op == "remove":
        return path.replace(args[0], ""), args[0] in path
    if op == "prepend":
        return args[0] + path, True
    if op == "append":
        return path + args[0], True
    if op == "regex":
        spec = args[0]
        sep = spec[0]
        parts = spec.split(sep)
        if len(parts) < 3:
            raise ValueError(f"ExtractPath regex: bad spec {spec!r}")
        search, repl = parts[1], parts[2]
        flags = parts[3] if len(parts) > 3 else ""
        count = 0 if "g" in flags else 1
        rx = re.compile(search, re.IGNORECASE if "i" in flags else 0)
        matched = rx.search(path) is not None
        out = rx.sub(re.sub(r"\$(\d)", r"\\\1", repl), path,
                     count=count)
        return out, matched
    raise ValueError(f"ExtractPath: unknown op {op!r}")


def merge_path_postings(postings: dict, url: str, entries, defaults,
                        tok_cfg) -> None:
    """Tokenize the ExtractPath events through the SAME tokenizer
    pipeline (indexstring parity: stopwords, word chars, fuzzy, bump
    chars all apply) and merge them into ``postings`` in place. The
    path words do not contribute to doc_len (the reference discards
    indexstring's count, index.c:1556). Position lists stay sorted —
    a shared field (e.g. ExtractPath into swishdefault) interleaves
    path and body positions exactly like the reference's shared
    per-doc position space."""
    from .extractor import ExtractedDoc
    from .tokenizer import tokenize_doc

    events = path_part_events(url, entries, defaults)
    if not events:
        return
    extra, _n = tokenize_doc(ExtractedDoc(events=events), tok_cfg)
    for key, p in extra.items():
        cur = postings.get(key)
        if cur is None:
            postings[key] = p
        else:
            pairs = sorted(zip(cur.positions + p.positions,
                               cur.structures + p.structures))
            cur.positions[:] = [a for a, _ in pairs]
            cur.structures[:] = [b for _, b in pairs]


def path_part_events(url: str, entries, defaults) -> list:
    """ExtractPath events for one document: ``entries`` is
    ``((metaname, (op, args...)), ...)`` in directive order,
    ``defaults`` is ``((metaname, default), ...)``. Returns a list of
    Events suitable for ``tokenize_doc`` — one per indexed string, no
    bumps, IN_FILE structure (the shared position counter emerges from
    tokenizing them as one event stream)."""
    dflt = dict(defaults)
    events = []
    for field, rule in entries:
        op, args = rule[0], tuple(rule[1:])
        out, matched = apply_op(url, op, args)
        if matched:
            events.append(Event(field, out, IN_FILE, 0))
        elif field in dflt:
            events.append(Event(field, dflt[field], IN_FILE, 0))
    return events
