"""Snowball Spanish stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_es.c
via tests/fixtures/snowball_es.tsv)."""

from __future__ import annotations

_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xfc"  # a e i o u á é í ó ú ü

_DEACCENT = str.maketrans("\xe1\xe9\xed\xf3\xfa", "aeiou")

_PRONOUNS = sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"], key=len, reverse=True)

_PRE_ACC = sorted(["i\xe9ndo", "\xe1ndo", "\xe1r", "\xe9r", "\xedr"],
                  key=len, reverse=True)
_PRE_PLAIN = sorted(["iendo", "ando", "ar", "er", "ir"],
                    key=len, reverse=True)

_S1_DELETE = sorted(
    ["anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
     "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
     "osos", "osas", "amiento", "amientos", "imiento", "imientos"],
    key=len, reverse=True)

_S1_ADOR = sorted(["adora", "ador", "aci\xf3n", "adoras", "adores",
                   "aciones", "ante", "antes", "ancia", "ancias"],
                  key=len, reverse=True)

_S2B_BIG = sorted(
    ["ar\xedan", "ar\xedas", "ar\xe1n", "ar\xe1s", "ar\xedais",
     "ar\xeda", "ar\xe9is", "ar\xedamos", "aremos", "ar\xe1",
     "ar\xe9", "er\xedan", "er\xedas", "er\xe1n", "er\xe1s",
     "er\xedais", "er\xeda", "er\xe9is", "er\xedamos", "eremos",
     "er\xe1", "er\xe9", "ir\xedan", "ir\xedas", "ir\xe1n",
     "ir\xe1s", "ir\xedais", "ir\xeda", "ir\xe9is", "ir\xedamos",
     "iremos", "ir\xe1", "ir\xe9", "aba", "ada", "ida", "\xeda",
     "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste",
     "an", "aban", "\xedan", "aran", "ieran", "asen", "iesen",
     "aron", "ieron", "ado", "ido", "ando", "iendo", "i\xf3", "ar",
     "er", "ir", "as", "abas", "adas", "idas", "\xedas", "aras",
     "ieras", "ases", "ieses", "\xeds", "\xe1is", "abais", "\xedais",
     "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
     "ados", "idos", "amos", "\xe1bamos", "\xedamos", "imos",
     "\xe1ramos", "i\xe9ramos", "i\xe9semos", "\xe1semos"],
    key=len, reverse=True)

_S2A_Y = sorted(["ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                 "y\xf3", "yas", "yes", "yais", "yamos"],
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
    # RV
    rv = n
    if n >= 2:
        if word[1] not in _VOWELS:
            # next vowel after position 1
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
    r1, r2, rv = _regions(word)

    def in_r(pos, r):
        return pos >= r

    # step 0: attached pronoun
    for pro in _PRONOUNS:
        if word.endswith(pro):
            base = word[: len(word) - len(pro)]
            done = False
            for pre in _PRE_ACC:
                if base.endswith(pre) \
                        and len(base) - len(pre) >= rv:
                    word = base.translate(_DEACCENT)
                    done = True
                    break
            if not done:
                for pre in _PRE_PLAIN:
                    if base.endswith(pre) \
                            and len(base) - len(pre) >= rv:
                        word = base
                        done = True
                        break
            if not done and base.endswith("yendo") \
                    and len(base) >= 6 and base[-6] == "u":
                word = base
            break

    n0 = len(word)

    # step 1: standard suffixes
    best = ""
    groups = (_S1_DELETE + _S1_ADOR
              + ["log\xeda", "log\xedas", "uci\xf3n", "uciones",
                 "encia", "encias", "amente", "mente", "idad",
                 "idades", "iva", "ivo", "ivas", "ivos"])
    for suf in groups:
        if len(suf) > len(best) and word.endswith(suf):
            best = suf
    s1_removed = False
    if best:
        pos = len(word) - len(best)
        if best in _S1_DELETE:
            if in_r(pos, r2):
                word = word[:pos]
                s1_removed = True
        elif best in _S1_ADOR:
            if in_r(pos, r2):
                word = word[:pos]
                s1_removed = True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif best in ("log\xeda", "log\xedas"):
            if in_r(pos, r2):
                word = word[:pos] + "log"
                s1_removed = True
        elif best in ("uci\xf3n", "uciones"):
            if in_r(pos, r2):
                word = word[:pos] + "u"
                s1_removed = True
        elif best in ("encia", "encias"):
            if in_r(pos, r2):
                word = word[:pos] + "ente"
                s1_removed = True
        elif best == "amente":
            if in_r(pos, r1):
                word = word[:pos]
                s1_removed = True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) \
                                and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif best == "mente":
            if in_r(pos, r2):
                word = word[:pos]
                s1_removed = True
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) \
                            and len(word) - len(pre) >= r2:
                        word = word[:-len(pre)]
                        break
        elif best in ("idad", "idades"):
            if in_r(pos, r2):
                word = word[:pos]
                s1_removed = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) \
                            and len(word) - len(pre) >= r2:
                        word = word[:-len(pre)]
                        break
        elif best in ("iva", "ivo", "ivas", "ivos"):
            if in_r(pos, r2):
                word = word[:pos]
                s1_removed = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 did nothing)
    s2a_removed = False
    if not s1_removed:
        for suf in _S2A_Y:
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                if (len(word) - len(suf) >= 1
                        and word[len(word) - len(suf) - 1] == "u"):
                    word = word[: len(word) - len(suf)]
                    s2a_removed = True
                break

    # step 2b: other verb suffixes
    if not s1_removed and not s2a_removed:
        best = ""
        for suf in _S2B_BIG + ["en", "es", "\xe9is", "emos"]:
            if len(suf) > len(best) and word.endswith(suf) \
                    and len(word) - len(suf) >= rv:
                best = suf
        if best:
            word = word[: len(word) - len(best)]
            if best in ("en", "es", "\xe9is", "emos") \
                    and word.endswith("gu"):
                word = word[:-1]

    # step 3: residual suffix
    for suf in ("os", "a", "o", "\xe1", "\xed", "\xf3"):
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            word = word[: len(word) - len(suf)]
            break
    else:
        for suf in ("e", "\xe9"):
            if word.endswith(suf) and len(word) - 1 >= rv:
                word = word[:-1]
                if word.endswith("gu") and len(word) - 1 >= rv:
                    word = word[:-1]
                break

    return word.translate(_DEACCENT)
