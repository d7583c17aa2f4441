"""Snowball Dutch stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_nl.c
via tests/fixtures/snowball_nl.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe8"  # a e i o u y è

_FOLD = str.maketrans("\xe4\xeb\xef\xf6\xfc\xe1\xe9\xed\xf3\xfa",
                      "aeiouaeiou")


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


def _undouble(word: str) -> str:
    for suf in ("kk", "dd", "tt"):
        if word.endswith(suf):
            return word[:-1]
    return word


def stem(word: str) -> str:
    word = word.translate(_FOLD)
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
        elif (chars[i] == "i" and chars[i - 1] in _VOWELS
                and i + 1 < len(chars) and chars[i + 1] in _VOWELS):
            chars[i] = "I"
    word = "".join(chars)
    r1, r2 = _mark_regions(word)

    def en_ok(w, n):
        """valid en-ending: non-vowel, not gem-"""
        stem_ = w[:-n]
        return (len(w) - n >= r1 and stem_
                and stem_[-1] not in _VOWELS
                and not stem_.endswith("gem"))

    # step 1
    best = ""
    for suf in ("heden", "en", "ene", "s", "se"):
        if len(suf) > len(best) and word.endswith(suf):
            best = suf
    if best == "heden":
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif best in ("en", "ene"):
        if en_ok(word, len(best)):
            word = _undouble(word[:-len(best)])
    elif best in ("s", "se"):
        stem_ = word[:-len(best)]
        if (len(word) - len(best) >= r1 and stem_
                and stem_[-1] not in _VOWELS and stem_[-1] != "j"):
            word = stem_
    e_found = False
    # step 2
    if (word.endswith("e") and len(word) - 1 >= r1
            and len(word) >= 2 and word[-2] not in _VOWELS):
        e_found = True
        word = _undouble(word[:-1])
    # step 3a
    if (word.endswith("heid") and len(word) - 4 >= r2
            and (len(word) < 5 or word[-5] != "c")):
        word = word[:-4]
        if word.endswith("en") and en_ok(word, 2):
            word = _undouble(word[:-2])
    # step 3b
    best = ""
    for suf in ("end", "ing", "ig", "lijk", "baar", "bar"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r2:
            best = suf
    if best in ("end", "ing"):
        word = word[:-3]
        if (word.endswith("ig") and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")):
            word = word[:-2]
        else:
            word = _undouble(word)
    elif best == "ig":
        if len(word) < 3 or word[-3] != "e":
            word = word[:-2]
    elif best == "lijk":
        word = word[:-4]
        if (word.endswith("e") and len(word) - 1 >= r1
                and len(word) >= 2 and word[-2] not in _VOWELS):
            word = _undouble(word[:-1])
    elif best == "baar":
        word = word[:-4]
    elif best == "bar":
        if e_found:
            word = word[:-3]
    # step 4: undouble vowel
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (c not in _VOWELS and v1 == v2
                and v1 in "aeou" and d not in _VOWELS and d != "I"):
            word = word[:-2] + word[-1]
    # postlude
    return word.replace("Y", "y").replace("I", "i")
