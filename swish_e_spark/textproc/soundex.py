"""Soundex fuzzy mode — byte-faithful to the reference's
FUZZY_SOUNDEX implementation (/root/reference/src/soundex.c via the
fuzzy_convert dispatch, /root/reference/src/stemmer.c:156-165), which
deviates from "textbook" soundex in ways the binary pin
(tests/fixtures/refbin/tokens_snd.tsv) makes observable:

- words shorter than 3 chars pass through unchanged (STEM_TOO_SMALL,
  soundex.c:143-147) — "me" stays "me", not "m000";
- a word whose FIRST char is not a C-locale (ASCII) letter passes
  through unchanged (STEM_NOT_ALPHA, soundex.c:131-135);
- H and W are 0 in soundTable (soundex.c:93,108) — they BREAK
  same-digit runs exactly like vowels, with no h/w transparency;
- non-ASCII-letter chars are STRIPPED before coding (C-locale tolower
  then keep 97..122, soundex.c:168-176), so two same-digit letters
  separated only by a digit or accented char collapse into one;
- the first letter's own digit seeds the run suppressor
  (soundex.c:185), so a second letter sharing the first letter's code
  emits nothing;
- the code is zero-padded to exactly 4 chars (soundCode initialised
  to "0000", soundex.c:83) with the first letter kept lowercase.
"""

from __future__ import annotations

_CODE = {}
for letters, digit in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                       ("l", "4"), ("mn", "5"), ("r", "6")):
    for ch in letters:
        _CODE[ch] = digit

_MAXWORDLEN = 1000  # /root/reference/src/swish.h:284


def soundex(word: str) -> str:
    if len(word) >= _MAXWORDLEN:
        return word  # STEM_WORD_TOO_BIG
    if not word or not ("a" <= word[0] <= "z"
                        or "A" <= word[0] <= "Z"):
        return word  # STEM_NOT_ALPHA (C-locale isalpha: ASCII only)
    if len(word) < 3:
        return word  # STEM_TOO_SMALL
    # C-locale tolower (ASCII only), then strip non-ASCII-letters
    w = "".join(c.lower() if "A" <= c <= "Z" else c for c in word)
    w = "".join(c for c in w if "a" <= c <= "z")
    out = ["0", "0", "0", "0"]
    out[0] = w[0]
    prev = _CODE.get(w[0], "")  # first letter seeds the suppressor
    j = 1
    for ch in w[1:]:
        if j >= 4:
            break
        code = _CODE.get(ch, "")  # vowels, h, w, y -> 0 (break runs)
        if code != prev:
            if code:
                out[j] = code
                j += 1
            prev = code
    return "".join(out)
