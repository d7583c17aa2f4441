"""Soundex fuzzy mode — the classic 4-character algorithm, matching the
reference's FUZZY_SOUNDEX option (/root/reference/src/soundex.c via the
fuzzy_convert dispatch, /root/reference/src/stemmer.c:156-165).

Standard rules: keep the first letter; map the rest through the digit
table (b f p v→1, c g j k q s x z→2, d t→3, l→4, m n→5, r→6); letters
mapped to the same digit as their predecessor collapse (h/w are
transparent for that comparison, a e i o u y break runs); drop vowels;
pad/truncate to 4 chars. Non-alphabetic tokens pass through unchanged.
"""

from __future__ import annotations

_CODE = {}
for letters, digit in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                       ("l", "4"), ("mn", "5"), ("r", "6")):
    for ch in letters:
        _CODE[ch] = digit


def soundex(word: str) -> str:
    w = word.lower()
    if not w or not w[0].isalpha():
        return word
    out = [w[0]]
    prev = _CODE.get(w[0], "")
    for ch in w[1:]:
        if ch in "hw":
            continue  # transparent: do not break a same-digit run
        code = _CODE.get(ch)
        if code is None:  # vowels and non-letters break runs
            prev = ""
            continue
        if code != prev:
            out.append(code)
            prev = code
        if len(out) == 4:
            break
    return "".join(out).ljust(4, "0")
