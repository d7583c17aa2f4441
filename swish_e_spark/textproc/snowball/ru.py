"""Snowball Russian stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_ru.c —
KOI8-R there, unicode Cyrillic here — via
tests/fixtures/snowball_ru.tsv)."""

from __future__ import annotations

_VOWELS = "аеиоуыэюя"

_PGERUND_1 = ["в", "вши", "вшись"]            # after а/я
_PGERUND_2 = ["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"]

_ADJECTIVE = ["ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий",
              "ый", "ой", "ем", "им", "ым", "ом", "его", "ого",
              "ему", "ому", "их", "ых", "ую", "юю", "ая", "яя",
              "ою", "ею"]

_PARTICIPLE_1 = ["ем", "нн", "вш", "ющ", "щ"]  # after а/я
_PARTICIPLE_2 = ["ивш", "ывш", "ующ"]

_VERB_1 = ["ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
           "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно"]
_VERB_2 = ["ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
           "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило",
           "ыло", "ено", "ят", "ует", "уют", "ит", "ыт", "ены",
           "ить", "ыть", "ишь", "ую", "ю"]

_NOUN = ["а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами",
         "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям",
         "ям", "ием", "ем", "ам", "ом", "о", "у", "ах", "иях",
         "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я"]


def _match(word, suffixes, rv, preceded_ay=False):
    """Longest suffix (entirely within RV); with preceded_ay the
    preceding а/я must also be within RV. Returns suffix or None."""
    best = None
    for suf in suffixes:
        if (best is None or len(suf) > len(best)) \
                and word.endswith(suf):
            pos = len(word) - len(suf)
            if pos < rv:
                continue
            if preceded_ay:
                if pos - 1 < rv or pos < 1 \
                        or word[pos - 1] not in "ая":
                    continue
            best = suf
    return best


def stem(word: str) -> str:
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break

    # step 1: perfective gerund, else (reflexive +
    # adjectival|verb|noun)
    g1 = _match(word, _PGERUND_1, rv, preceded_ay=True)
    g2 = _match(word, _PGERUND_2, rv)
    g = g1 if (g2 is None or (g1 and len(g1) >= len(g2))) else g2
    if g1 and g2:
        g = g1 if len(g1) + 1 >= len(g2) else g2  # longest match
        # (а/я counts toward the match length in the among)
    if g:
        word = word[: len(word) - len(g)]
    else:
        r = _match(word, ["ся", "сь"], rv)
        if r:
            word = word[: len(word) - len(r)]
        a = _match(word, _ADJECTIVE, rv)
        if a:
            word = word[: len(word) - len(a)]
            p1 = _match(word, _PARTICIPLE_1, rv, preceded_ay=True)
            p2 = _match(word, _PARTICIPLE_2, rv)
            p = p1 if (p2 is None or (p1 and len(p1) + 1
                                      >= len(p2))) else p2
            if p:
                word = word[: len(word) - len(p)]
        else:
            v1 = _match(word, _VERB_1, rv, preceded_ay=True)
            v2 = _match(word, _VERB_2, rv)
            v = v1 if (v2 is None or (v1 and len(v1) + 1
                                      >= len(v2))) else v2
            if v:
                word = word[: len(word) - len(v)]
            else:
                nn = _match(word, _NOUN, rv)
                if nn:
                    word = word[: len(word) - len(nn)]

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2 \
                and len(word) - len(suf) >= rv:
            word = word[: len(word) - len(suf)]
            break

    # step 4: superlative / нн / ь
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        e = _match(word, ["ейш", "ейше"], rv)
        if e:
            word = word[: len(word) - len(e)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word
