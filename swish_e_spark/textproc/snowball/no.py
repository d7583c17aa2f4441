"""Snowball Norwegian stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_no.c
via tests/fixtures/snowball_no.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe6\xe5\xf8"  # a e i o u y æ å ø

_STEP1 = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
     "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
     "ast"], key=len, reverse=True)

_S_ENDING = "bcdfghjlmnoprtvyz"

_STEP3 = sorted(["leg", "eleg", "ig", "eig", "lig", "elig", "els",
                 "lov", "elov", "slov", "hetslov"],
                key=len, reverse=True)


def _r1(word: str) -> int:
    for i in range(len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return max(i + 2, 3)
    return len(word)


def stem(word: str) -> str:
    r1 = _r1(word)

    # step 1: ONE longest-match among over deletions, erte/ert -> er,
    # and the conditional s
    best = ""
    for suf in _STEP1 + ["erte", "ert", "s"]:
        if len(suf) > len(best) and word.endswith(suf) \
                and len(word) - len(suf) >= r1:
            best = suf
    if best in ("erte", "ert"):
        word = word[:len(word) - len(best)] + "er"
    elif best == "s":
        if ((len(word) >= 2 and word[-2] in _S_ENDING)
                or (len(word) >= 3 and word[-2] == "k"
                    and word[-3] not in _VOWELS)):
            word = word[:-1]
    elif best:
        word = word[:-len(best)]

    # step 2
    if (word.endswith("dt") or word.endswith("vt")) \
            and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3
    for suf in _STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-len(suf)]
            break
    return word
