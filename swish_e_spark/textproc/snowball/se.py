"""Snowball Swedish stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_se.c
via tests/fixtures/snowball_se.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe4\xe5\xf6"  # a e i o u y ä å ö

_STEP1 = sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
     "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
     "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
     "het", "ast"], key=len, reverse=True)

_S_ENDING = "bcdfghjklmnoprtvy"

_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _r1(word: str) -> int:
    """Start of R1, adjusted to at least 3 chars of stem."""
    for i in range(len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            return max(i + 2, 3)
    return len(word)


def stem(word: str) -> str:
    r1 = _r1(word)

    # step 1: a-likes, or s after a valid s-ending
    for suf in _STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-len(suf)]
            break
    else:
        if (word.endswith("s") and len(word) - 1 >= r1
                and len(word) >= 2 and word[-2] in _S_ENDING):
            word = word[:-1]

    # step 2: shorten characteristic double-consonant endings
    for suf in _STEP2:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-1]
            break

    # step 3
    if word.endswith("fullt") and len(word) - 5 >= r1:
        word = word[:-1]
    elif word.endswith("l\xf6st") and len(word) - 4 >= r1:
        word = word[:-1]
    else:
        for suf in ("lig", "els", "ig"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[:-len(suf)]
                break
    return word
