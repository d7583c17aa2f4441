"""Snowball Hungarian stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_hu.c
via tests/fixtures/snowball_hu.tsv).

Letters are the Latin-2 repertoire the reference's byte tables
address (0xF5 = ő, 0xFB = ű).  Unlike the Scandinavian stemmers the
generated Hungarian code checks R1 AFTER the longest suffix match
(no setlimit): if the longest among match starts before R1 the
routine fails without retrying a shorter suffix — each table below
is therefore scanned longest-first and only the FIRST endswith hit
is tested against R1.
"""

from __future__ import annotations

_VOWELS = "aeiou\xe1\xe9\xed\xf3\xf6ő\xfa\xfcű"

_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")

# a_2: double consonants (instrum/factive precondition); undoubling
# drops the second-to-last char, turning e.g. ccs -> cs
_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
            "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm",
            "nn", "pp", "rr", "ss", "tt", "vv", "zz")

# suffix tables: suffix -> action (None = delete, else replacement)
_CASE = [  # a_4 (all delete; v_ending runs after)
    "k\xe9ppen", "ank\xe9nt", "enk\xe9nt", "onk\xe9nt", "k\xe9pp",
    "k\xe9nt", "nak", "nek", "val", "vel", "n\xe1l", "n\xe9l",
    "b\xf3l", "r\xf3l", "t\xf3l", "ből", "ről", "től",
    "ban", "ben", "kor", "\xe9rt", "hez", "hoz", "h\xf6z", "ba",
    "ra", "be", "re", "ig", "ul", "\xfcl", "an", "en", "on",
    "\xf6n", "at", "et", "ot", "\xf6t", "v\xe1", "v\xe9", "n", "t",
]

_CASE_SPECIAL = [  # a_5
    ("\xe1nk\xe9nt", "a"), ("\xe1n", "a"), ("\xe9n", "e"),
]

_CASE_OTHER = [  # a_6
    ("astul", None), ("\xe1stul", "a"), ("est\xfcl", None),
    ("\xe9st\xfcl", "e"), ("stul", None), ("st\xfcl", None),
]

_OWNED = [  # a_9
    ("\xe1\xe9i", "a"), ("\xe9\xe9i", "e"), ("ak\xe9", None),
    ("ek\xe9", None), ("ok\xe9", None), ("\xe1k\xe9", "a"),
    ("\xe9k\xe9", "e"), ("\xf6k\xe9", None), ("\xe9i", None),
    ("k\xe9", None), ("\xe9\xe9", "e"), ("\xe9", None),
]

_SING_OWNER = [  # a_10
    ("\xe1juk", "a"), ("\xe9j\xfck", "e"), ("unk", None),
    ("\xe1nk", "a"), ("\xe9nk", "e"), ("\xfcnk", None),
    ("juk", None), ("j\xfck", None), ("ja", None), ("je", None),
    ("ad", None), ("ed", None), ("od", None), ("\xe1d", "a"),
    ("\xe9d", "e"), ("\xf6d", None), ("nk", None), ("uk", None),
    ("\xfck", None), ("am", None), ("em", None), ("om", None),
    ("\xe1m", "a"), ("\xe9m", "e"), ("a", None), ("d", None),
    ("e", None), ("m", None), ("o", None), ("\xe1", "a"),
    ("\xe9", "e"),
]

_PLUR_OWNER = [  # a_11 (only the á/é-initial forms restore a vowel)
    ("jeitek", None), ("jaitok", None), ("jaink", None),
    ("jeink", None), ("eitek", None), ("\xe9itek", "e"),
    ("aitok", None), ("\xe1itok", "a"), ("itek", None),
    ("jaid", None), ("jeid", None), ("jaik", None),
    ("jeik", None), ("jaim", None), ("jeim", None),
    ("aink", None), ("eink", None),
    ("\xe1ink", "a"), ("\xe9ink", "e"), ("aid", None),
    ("eid", None), ("\xe1id", "a"), ("\xe9id", "e"), ("jai", None),
    ("jei", None), ("aik", None), ("eik", None), ("\xe1ik", "a"),
    ("\xe9ik", "e"), ("ink", None), ("aim", None), ("eim", None),
    ("\xe1im", "a"), ("\xe9im", "e"), ("id", None), ("ai", None),
    ("ei", None), ("\xe1i", "a"), ("\xe9i", "e"), ("ik", None),
    ("im", None), ("i", None),
]

_PLURAL = [  # a_8
    ("\xe1k", "a"), ("\xe9k", "e"), ("ak", None), ("ek", None),
    ("ok", None), ("\xf6k", None), ("k", None),
]


def _r1(word: str) -> int:
    """R1 per the Hungarian definition: vowel-initial words mark
    after the first consonant (or consonant digraph); consonant-
    initial words mark after the first vowel; else end of word."""
    if not word or word[0] not in _VOWELS:
        for i in range(1, len(word)):
            if word[i] in _VOWELS:
                return i + 1
        return len(word)
    i = 1
    while i < len(word) and word[i] in _VOWELS:
        i += 1
    if i >= len(word):
        return len(word)
    for d in _DIGRAPHS:
        if word.startswith(d, i):
            return i + len(d)
    return i + 1


def _longest(word: str, table) -> tuple[str, object] | None:
    """First (longest) endswith hit — no retry on R1 failure."""
    for entry in table:
        suf, action = entry if isinstance(entry, tuple) \
            else (entry, None)
        if word.endswith(suf):
            return suf, action
    return None


def _apply(word: str, r1: int, table) -> str:
    hit = _longest(word, table)
    if hit is None:
        return word
    suf, action = hit
    if len(word) - len(suf) < r1:
        return word
    return word[:-len(suf)] + (action or "")


def _double_undouble(word: str, r1: int, sufs: tuple) -> str:
    """instrum / factive: delete ``suf`` if the preceding text ends
    with a double consonant, then undouble (drop the second-to-last
    char, so ccs -> cs)."""
    for suf in sufs:
        if word.endswith(suf):
            stem_part = word[:-len(suf)]
            if (len(word) - len(suf) >= r1
                    and stem_part.endswith(_DOUBLES)):
                return stem_part[:-2] + stem_part[-1]
            return word
    return word


def _v_ending(word: str, r1: int) -> str:
    if word.endswith("\xe1") and len(word) - 1 >= r1:
        return word[:-1] + "a"
    if word.endswith("\xe9") and len(word) - 1 >= r1:
        return word[:-1] + "e"
    return word


def stem(word: str) -> str:
    r1 = _r1(word)
    word = _double_undouble(word, r1, ("al", "el"))   # instrum
    hit = _longest(word, _CASE)                       # case
    if hit is not None and len(word) - len(hit[0]) >= r1:
        word = word[:-len(hit[0])]
        word = _v_ending(word, r1)
    word = _apply(word, r1, _CASE_SPECIAL)
    word = _apply(word, r1, _CASE_OTHER)
    word = _double_undouble(word, r1, ("\xe1", "\xe9"))  # factive
    word = _apply(word, r1, _OWNED)
    word = _apply(word, r1, _SING_OWNER)
    word = _apply(word, r1, _PLUR_OWNER)
    word = _apply(word, r1, _PLURAL)
    return word
