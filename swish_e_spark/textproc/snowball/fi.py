"""Snowball Finnish stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_fi.c
via tests/fixtures/snowball_fi.tsv).

Limit semantics mirrored from the generated code: the suffix amongs
match within R1/R2 but their switch-case conditions run with the
limit RESTORED (unrestricted), while the per-entry VI/LONG functions
of den/tten/siin/seen run DURING matching (limit-restricted) and
fall back to the parent entry 'n' when they fail; the tidy
sub-steps are wholly limit-restricted except the final undouble.
"""

from __future__ import annotations

_V1 = "aeiouy\xe4\xf6"       # full vowels
_V2 = "aeiou\xe4\xf6"        # vowels minus y (for Vi test)
_AEI = "aei\xe4"
_PARTICLE_END = _V1 + "nt"
_LONG = ("aa", "ee", "ii", "oo", "uu", "\xe4\xe4", "\xf6\xf6")

_CASE_PLAIN = ["lla", "na", "ssa", "ta", "lta", "sta", "lle", "ine",
               "ksi", "ll\xe4", "n\xe4", "ss\xe4", "t\xe4",
               "lt\xe4", "st\xe4"]
_CASE_H = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "h\xe4n": "\xe4", "h\xf6n": "\xf6"}

_OTHER_COND = ["mma", "mpa", "mmi", "mpi", "mm\xe4", "mp\xe4"]
_OTHER_PLAIN = ["imma", "impa", "immi", "impi", "imm\xe4",
                "imp\xe4", "eja", "ej\xe4"]


def _regions(word: str):
    n = len(word)
    r1 = r2 = n
    for i in range(n - 1):
        if word[i] in _V1 and word[i + 1] not in _V1:
            r1 = i + 2
            break
    for i in range(r1, n - 1):
        if word[i] in _V1 and word[i + 1] not in _V1:
            r2 = i + 2
            break
    return r1, r2


def stem(word: str) -> str:
    r1, r2 = _regions(word)
    ending_removed = False

    # particle etc (among in R1; conditions unrestricted)
    best = ""
    for suf in ("kin", "kaan", "k\xe4\xe4n", "ko", "k\xf6", "han",
                "h\xe4n", "pa", "p\xe4", "sti"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            best = suf
    if best == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif best:
        pos = len(word) - len(best)
        if pos >= 1 and word[pos - 1] in _PARTICLE_END:
            word = word[:pos]

    # possessive (among in R1; conditions unrestricted)
    best = ""
    for suf in ("nsa", "ns\xe4", "mme", "nne", "ni", "si", "an",
                "\xe4n", "en"):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            best = suf
    if best:
        pos = len(word) - len(best)
        if best == "si":
            if not (pos >= 1 and word[pos - 1] == "k"):
                word = word[:pos]
        elif best == "ni":
            word = word[:pos]
            if word.endswith("kse"):
                word = word[:-1] + "i"
        elif best in ("nsa", "ns\xe4", "mme", "nne"):
            word = word[:pos]
        elif best == "an":
            if any(word[:pos].endswith(p) for p in
                   ("lla", "na", "ssa", "ta", "lta", "sta")):
                word = word[:pos]
        elif best == "\xe4n":
            if any(word[:pos].endswith(p) for p in
                   ("ll\xe4", "n\xe4", "ss\xe4", "t\xe4",
                    "lt\xe4", "st\xe4")):
                word = word[:pos]
        elif best == "en":
            if any(word[:pos].endswith(p) for p in ("lle", "ine")):
                word = word[:pos]

    # case ending (among in R1; han-family/a/tta conditions
    # unrestricted; VI/LONG functions restricted + backtrack to 'n')
    def vi_ok(pos):
        return (pos - 2 >= r1 and word[pos - 1] == "i"
                and word[pos - 2] in _V2)

    def long_ok(pos):
        return pos - 2 >= r1 and word[pos - 2:pos] in _LONG

    best = ""
    for suf in (_CASE_PLAIN + list(_CASE_H)
                + ["den", "tten", "siin", "seen", "n", "a", "\xe4",
                   "tta", "tt\xe4"]):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            pos = len(word) - len(suf)
            if suf in ("den", "tten", "siin") and not vi_ok(pos):
                continue  # function fails -> backtrack toward 'n'
            if suf == "seen" and not long_ok(pos):
                continue
            best = suf
    if best:
        pos = len(word) - len(best)
        ok = False
        extra = 0
        if best in _CASE_H:
            ok = pos >= 1 and word[pos - 1] == _CASE_H[best]
        elif best in ("den", "tten", "siin", "seen"):
            ok = True
        elif best == "n":
            ok = True
            if word[:pos].endswith(_LONG) \
                    or word[:pos].endswith("ie"):
                extra = 1
        elif best in ("a", "\xe4"):
            ok = (pos >= 2 and word[pos - 1] in _V1
                  and word[pos - 2] not in _V1)
        elif best in ("tta", "tt\xe4"):
            ok = pos >= 1 and word[pos - 1] == "e"
        else:
            ok = True
        if ok:
            word = word[: pos - extra]
            ending_removed = True

    # other endings (R2)
    best = ""
    for suf in (_OTHER_COND + _OTHER_PLAIN):
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r2:
            best = suf
    if best:
        pos = len(word) - len(best)
        if best in _OTHER_COND:
            if not word[:pos].endswith("po"):
                word = word[:pos]
        else:
            word = word[:pos]

    if ending_removed:
        # i plural (R1)
        if word and word[-1] in "ij" and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        # t plural: final t (in R1) preceded by a vowel (a vowel
        # right before an in-R1 t is always in R1 itself)
        if (word.endswith("t") and len(word) - 1 >= r1
                and len(word) >= 2 and word[-2] in _V1):
            word = word[:-1]
            if word.endswith("imma") and len(word) - 4 >= r2:
                word = word[:-4]
            elif word.endswith("mma") and len(word) - 3 >= r2 \
                    and not word[:-3].endswith("po"):
                word = word[:-3]

    # tidy (every read limit-restricted to R1)
    if len(word) - 2 >= r1 and word.endswith(_LONG):
        word = word[:-1]
    if (len(word) - 2 >= r1 and len(word) >= 2
            and word[-1] in _AEI and word[-2] not in _V1):
        word = word[:-1]
    if len(word) - 2 >= r1 and word.endswith(("oj", "uj")):
        word = word[:-1]
    if len(word) - 2 >= r1 and word.endswith("jo"):
        word = word[:-1]
    # final undouble (unrestricted): double consonant + trailing
    # vowels
    i = len(word) - 1
    while i >= 0 and word[i] in _V1:
        i -= 1
    if i >= 1 and word[i] not in _V1 and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1:]
    return word
