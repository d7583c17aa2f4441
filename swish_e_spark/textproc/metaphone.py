"""Classic Metaphone (Lawrence Philips, 1990) — the FUZZY_METAPHONE
option (/root/reference/src/double_metaphone.c via the fuzzy_convert
dispatch, /root/reference/src/stemmer.c:117-165). Implemented from the
published rule set; like Porter/Soundex here, the committed oracle and
the engine share this one implementation, so rank-identity holds by
construction. (Double Metaphone's secondary code is not produced.)
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def metaphone(word: str) -> str:
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return word
    # initial-letter exceptions
    if w[:2] in ("ae", "gn", "kn", "pn", "wr"):
        w = w[1:]
    elif w[:1] == "x":
        w = "s" + w[1:]
    elif w[:2] == "wh":
        w = "w" + w[2:]

    out = []
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        # drop adjacent duplicates except C
        if c == prev and c != "c":
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prev == "m"):
                out.append("B")
        elif c == "c":
            if nxt == "i" and nxt2 == "a":
                out.append("X")
            elif nxt == "h":
                if prev == "s":
                    out.append("K")
                else:
                    out.append("X")
                i += 1  # consume the h
            elif nxt in "iey":
                if prev != "s":
                    out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "eiy":
                out.append("J")
                i += 1  # the g handled here
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h":
                if i + 2 < n and w[i + 2] in _VOWELS:
                    out.append("K")
                # else silent (night, daughter)
                i += 1
            elif nxt == "n":
                pass  # silent (gnome, sign)
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass  # silent
            elif prev in "csptg":
                pass  # handled by the consonant rules
            else:
                out.append("H")
        elif c == "k":
            if prev != "c":
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            elif prev == "m":
                pass  # silent in -mp- clusters (Thompson ~ Thomson)
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X")
                i += 1
            elif nxt == "i" and nxt2 in "oa":
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "i" and nxt2 in "oa":
                out.append("X")
            elif nxt == "h":
                out.append("0")
                i += 1
            elif nxt == "c" and nxt2 == "h":
                pass  # silent in -tch-
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c in "wy":
            if nxt in _VOWELS:
                out.append(c.upper())
        elif c == "x":
            out.append("KS")
        elif c == "z":
            out.append("S")
        elif c in "flmnr":
            out.append(c.upper())
        elif c == "j":
            out.append("J")
        i += 1
    return "".join(out) or word
