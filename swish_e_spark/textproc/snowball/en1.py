"""Snowball "porter" English stemmer — the reference's en1 mode
(public algorithm, snowballstem.org; reference vintage pinned by
/root/reference/src/snowball/stem_en1.c via
tests/fixtures/snowball_en1.tsv).

This is the Snowball rendering of Porter's 1980 algorithm, which
deliberately differs from the textbook implementation in
textproc/porter.py on edge cases (explicit undouble list without
cc/ll/ss/zz, y-consonant marking via 'Y', R1/R2 instead of
measures), so it is implemented separately rather than aliased.
"""

from __future__ import annotations

_V = "aeiouy"
_V_WXY = _V + "wxY"

_STEP2 = [  # a_3 — R1
    ("ational", "ate"), ("ization", "ize"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("entli", "ent"),
    ("anci", "ance"), ("enci", "ence"), ("abli", "able"),
    ("alli", "al"), ("izer", "ize"), ("ator", "ate"),
    ("eli", "e"),
]

_STEP3 = [  # a_4 — R1
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = [  # a_5 — R2; "ion" only after s/t
    "ement", "ance", "ence", "able", "ible", "ment",
    "ion", "ism", "ate", "iti", "ous", "ant", "ent",
    "ic", "al", "er", "ou", "ive", "ize",
]
_STEP4 = sorted(_STEP4, key=len, reverse=True)

# step 1b undouble list — enumerated in the algorithm (no cc/ll/ss/zz)
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _shortv(w: str, n: int) -> bool:
    """non-vWXY . vowel . non-vowel ending at index n."""
    return (n >= 3 and w[n - 1] not in _V_WXY and w[n - 2] in _V
            and w[n - 3] not in _V)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)

    def _next(start: int) -> int:
        j = start
        while j < n and w[j] not in _V:
            j += 1
        j += 1
        while j < n and w[j] in _V:
            j += 1
        j += 1
        return j if j <= n else n + 1

    r1 = _next(0)
    if r1 > n:
        return n, n
    r2 = _next(r1)
    return r1, n if r2 > n else r2


def stem(word: str) -> str:
    w = word
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    # mark every y preceded by a vowel as consonant 'Y'
    out = list(w)
    for j in range(1, len(out)):
        if out[j] == "y" and out[j - 1] in _V:
            out[j] = "Y"
            y_found = True
    w = "".join(out)
    r1, r2 = _regions(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith("ies"):
        w = w[:-3] + "i"
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-3] + "ee"
    else:
        for suf in ("ing", "ed"):
            if w.endswith(suf):
                stem_part = w[:-len(suf)]
                if any(ch in _V for ch in stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif len(w) == r1 and _shortv(w, len(w)):
                        w += "e"
                break

    # step 1c: y -> i when a vowel precedes it somewhere in the stem
    if w.endswith(("y", "Y")) and any(ch in _V for ch in w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, repl in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[:-len(suf)] + repl
            break

    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[:-len(suf)] + repl
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf != "ion" or (len(w) > len(suf)
                                    and w[-4] in "st"):
                    w = w[:-len(suf)]
            break

    # step 5a
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _shortv(w, len(w) - 1):
            w = w[:-1]

    # step 5b
    if w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w
