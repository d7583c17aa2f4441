"""Snowball German stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_de.c
via tests/fixtures/snowball_de.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe4\xf6\xfc"  # a e i o u y ä ö ü

_S_ENDING = "bdfghklmnrt"
_ST_ENDING = "bdfghklmnt"


def _mark_regions(word: str):
    r1 = len(word)
    r2 = len(word)
    for i in range(len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    for i in range(r1, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break
    return max(r1, 3), r2


def stem(word: str) -> str:
    word = word.replace("\xdf", "ss")  # ß -> ss
    # mark u/y between vowels as consonants
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        if chars[i] == "y" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _mark_regions(word)

    # step 1
    best = ""
    for suf in ("e", "em", "en", "ern", "er", "es", "s"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            best = suf
    if best == "s":
        if len(word) >= 2 and word[-2] in _S_ENDING:
            word = word[:-1]
    elif best:
        word = word[:-len(best)]

    # step 2
    best = ""
    for suf in ("en", "er", "est", "st"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            best = suf
    if best == "st":
        if (len(word) >= 6 and word[-3] in _ST_ENDING):
            word = word[:-2]
    elif best:
        word = word[:-len(best)]

    # step 3: d-suffixes
    best = ""
    for suf in ("end", "ung", "ig", "ik", "isch", "lich", "heit",
                "keit"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r2:
            best = suf
    if best in ("end", "ung"):
        word = word[:-len(best)]
        if (word.endswith("ig") and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")):
            word = word[:-2]
    elif best in ("ig", "ik", "isch"):
        if len(word) - len(best) < 1 \
                or word[-len(best) - 1] != "e":
            word = word[:-len(best)]
    elif best in ("lich", "heit"):
        word = word[:-len(best)]
        for pre in ("er", "en"):
            if word.endswith(pre) and len(word) - 2 >= r1:
                word = word[:-2]
                break
    elif best == "keit":
        word = word[:-len(best)]
        for pre in ("lich", "ig"):
            if word.endswith(pre) and len(word) - len(pre) >= r2:
                word = word[:-len(pre)]
                break

    # postlude: unmark U/Y, fold umlauts
    out = []
    for c in word:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "\xe4":
            out.append("a")
        elif c == "\xf6":
            out.append("o")
        elif c == "\xfc":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)
