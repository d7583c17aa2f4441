"""Snowball Italian stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_it.c
via tests/fixtures/snowball_it.tsv)."""

from __future__ import annotations

_VOWELS = "aeiou\xe0\xe8\xec\xf2\xf9"

_ACUTE2GRAVE = str.maketrans("\xe1\xe9\xed\xf3\xfa",
                             "\xe0\xe8\xec\xf2\xf9")

_PRONOUNS = sorted(
    ["ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti",
     "vi", "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
     "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
     "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
     "vele", "veli", "velo", "vene"], key=len, reverse=True)

_S1_DELETE = ["ica", "osa", "ista", "anza", "ice", "atrice", "iche",
              "abile", "ibile", "ose", "ante", "mente", "iste",
              "anze", "ici", "atrici", "ichi", "abili", "ibili",
              "ismi", "osi", "anti", "isti", "ico", "ismo", "oso",
              "ist\xe0", "ist\xe8", "ist\xec"]

_S2_VERB = sorted(
    ["isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
     "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire",
     "asse", "ate", "avate", "evate", "ivate", "ete", "erete",
     "irete", "ite", "ereste", "ireste", "ute", "erai", "irai",
     "isci", "endi", "erei", "irei", "assi", "ati", "iti",
     "eresti", "iresti", "uti", "avi", "evi", "ivi", "isco",
     "ando", "endo", "Yamo", "iamo", "avamo", "evamo", "ivamo",
     "eremo", "iremo", "assimo", "ammo", "emmo", "eremmo",
     "iremmo", "immo", "ano", "iscano", "avano", "evano", "ivano",
     "eranno", "iranno", "ono", "iscono", "arono", "erono",
     "irono", "erebbero", "irebbero", "assero", "essero", "issero",
     "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir",
     "er\xe0", "ir\xe0", "er\xf2", "ir\xf2"],
    key=len, reverse=True)


def _regions(word: str):
    n = len(word)
    r1 = r2 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break
    rv = n
    if n >= 2:
        if word[1] not in _VOWELS:
            for i in range(2, n):
                if word[i] in _VOWELS:
                    rv = i + 1
                    break
        elif word[0] in _VOWELS and word[1] in _VOWELS:
            for i in range(2, n):
                if word[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def stem(word: str) -> str:
    # prelude: acute -> grave, qu -> qU, u/i between vowels -> U/I
    word = word.translate(_ACUTE2GRAVE)
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    r1, r2, rv = _regions(word)

    # step 0: attached pronoun
    for pro in _PRONOUNS:
        if word.endswith(pro):
            base = word[: len(word) - len(pro)]
            if any(base.endswith(p) and len(base) - len(p) >= rv
                   for p in ("ando", "endo")):
                word = base
            elif any(base.endswith(p) and len(base) - len(p) >= rv
                     for p in ("ar", "er", "ir")):
                word = base + "e"
            break

    altered = False

    # step 1: standard suffixes
    best = ""
    groups = (_S1_DELETE
              + ["logia", "logie", "iva", "ive", "ivi", "ivo",
                 "enza", "enze", "usione", "azione", "uzione",
                 "atore", "usioni", "azioni", "uzioni", "atori",
                 "amente", "amenti", "imenti", "amento", "imento",
                 "it\xe0"])
    for suf in groups:
        if len(suf) > len(best) and word.endswith(suf):
            best = suf
    if best:
        pos = len(word) - len(best)
        if best in ("amento", "amenti", "imento", "imenti"):
            if pos >= rv:
                word = word[:pos]
                altered = True
        elif best == "amente":
            if pos >= r1:
                word = word[:pos]
                altered = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("ic", "os", "abil"):
                        if word.endswith(pre) \
                                and len(word) - len(pre) >= r2:
                            word = word[:-len(pre)]
                            break
        elif best in ("azione", "azioni", "atore", "atori"):
            if pos >= r2:
                word = word[:pos]
                altered = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif best in ("logia", "logie"):
            if pos >= r2:
                word = word[:pos] + "log"
                altered = True
        elif best in ("usione", "uzione", "usioni", "uzioni"):
            if pos >= r2:
                word = word[:pos] + "u"
                altered = True
        elif best in ("enza", "enze"):
            if pos >= r2:
                word = word[:pos] + "ente"
                altered = True
        elif best == "it\xe0":
            if pos >= r2:
                word = word[:pos]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) \
                            and len(word) - len(pre) >= r2:
                        word = word[:-len(pre)]
                        break
        elif best in ("ivo", "ivi", "iva", "ive"):
            if pos >= r2:
                word = word[:pos]
                altered = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]
        else:  # plain delete group
            if pos >= r2:
                word = word[:pos]
                altered = True

    # step 2: verb suffixes (only if step 1 did nothing)
    if not altered:
        best = ""
        for suf in _S2_VERB:
            if len(suf) > len(best) and word.endswith(suf) \
                    and len(word) - len(suf) >= rv:
                best = suf
        if best:
            word = word[: len(word) - len(best)]

    # step 3a: final vowel
    for suf in ("a", "e", "i", "o", "\xe0", "\xe8", "\xec",
                "\xf2"):
        if word.endswith(suf) and len(word) - 1 >= rv:
            word = word[:-1]
            if word.endswith("i") and len(word) - 1 >= rv:
                word = word[:-1]
            break

    # step 3b: ch -> c, gh -> g (the whole digraph within RV)
    if (word.endswith("ch") or word.endswith("gh")) \
            and len(word) - 2 >= rv:
        word = word[:-1]

    # postlude
    return word.replace("I", "i").replace("U", "u")
