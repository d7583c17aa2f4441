"""Snowball English ("Porter2") stemmer (public algorithm,
snowballstem.org; reference vintage pinned by
/root/reference/src/snowball/stem_en2.c via
tests/fixtures/snowball_en2.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy"

_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_LI_ENDING = "cdeghkmnrt"

_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("abli", "able"), ("entli", "ent"),
    ("izer", "ize"), ("ization", "ize"), ("ational", "ate"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("aliti", "al"), ("alli", "al"), ("fulness", "ful"),
    ("ousli", "ous"), ("ousness", "ous"), ("iveness", "ive"),
    ("iviti", "ive"), ("biliti", "ble"), ("bli", "ble"),
    ("ogi", "og"), ("fulli", "ful"), ("lessli", "less"),
    ("li", ""),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""), ("ative", None),
]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
          "ize", "ion"]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _mark_regions(word: str):
    r1 = len(word)
    r2 = len(word)
    if word.startswith("gener") or word.startswith("arsen"):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        for i in range(len(word) - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                r1 = i + 2
                break
    for i in range(r1, len(word) - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break
    return r1, r2


def _short_syllable_at_end(word: str) -> bool:
    """word ends in a short syllable."""
    n = len(word)
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        if (v in _VOWELS and c2 not in _VOWELS and c2 not in "wxY"
                and c1 not in _VOWELS):
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = frozenset(["inning", "outing", "canning", "herring",
                         "earring", "proceed", "exceed", "succeed"])


def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    # prelude: y marking
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _mark_regions(word)

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_ = word[:-len(suf)]
                if any(c in _VOWELS for c in stem_):
                    word = stem_
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # step 1c
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _VOWELS):
        word = word[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[:-len(suf)] + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if rep is None:  # ative: delete in R2
                    if len(word) - len(suf) >= r2:
                        word = word[:-len(suf)]
                else:
                    word = word[:-len(suf)] + rep
            break

    # step 4
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[:-len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif (len(word) - 1 >= r1
              and not _short_syllable_at_end(word[:-1])):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


def _is_short(word: str, r1: int) -> bool:
    """word is short: ends in short syllable and R1 is null."""
    return r1 >= len(word) and _short_syllable_at_end(word)
