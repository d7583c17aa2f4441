"""Snowball Danish stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_dk.c
via tests/fixtures/snowball_dk.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe6\xe5\xf8"  # a e i o u y æ å ø

_STEP1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
     "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret"],
    key=len, reverse=True)

_S_ENDING = "abcdfghjklmnoprtvyz\xe5"

_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _r1(word: str) -> int:
    for i in range(len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return max(i + 2, 3)
    return len(word)


def stem(word: str) -> str:
    r1 = _r1(word)

    # step 1
    for suf in _STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-len(suf)]
            break
    else:
        if (word.endswith("s") and len(word) - 1 >= r1
                and len(word) >= 2 and word[-2] in _S_ENDING):
            word = word[:-1]

    # step 2
    for suf in ("gd", "dt", "gt", "kt"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-1]
            break

    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    matched = False
    for suf in ("elig", "lig", "els", "ig"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-len(suf)]
            matched = True
            break
    if matched:
        # repeat step 2
        for suf in ("gd", "dt", "gt", "kt"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[:-1]
                break
    elif word.endswith("l\xf8st") and len(word) - 4 >= r1:
        word = word[:-1]

    # step 4: undouble — two identical consonants at the end, the
    # second of which is in R1
    if (len(word) >= 2 and word[-1] == word[-2]
            and word[-1] in _CONSONANTS and len(word) - 1 >= r1):
        word = word[:-1]
    return word
