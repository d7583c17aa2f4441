"""Snowball Portuguese stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_pt.c
via tests/fixtures/snowball_pt.tsv)."""

from __future__ import annotations

_VOWELS = "aeiou\xe1\xe9\xed\xf3\xfa\xe2\xea\xf4"

_S1_DELETE = sorted(
    ["eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
     "\xe1vel", "\xedvel", "ista", "istas", "oso", "osa", "osos",
     "osas", "amento", "amentos", "imento", "imentos"],
    key=len, reverse=True)

_S1_ADOR = sorted(["adora", "ador", "a\xe7a~o", "adoras", "adores",
                   "a\xe7o~es"], key=len, reverse=True)
# NOTE: in this vintage the ador/ante group is a plain R2 delete with
# no ic-chase, and \xe2ncia sits in the same delete group
# (a_5 case 1, /root/reference/src/snowball/stem_pt.c)

_S2_BIG = sorted(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ar\xe1", "ara",
     "er\xe1", "era", "ir\xe1", "ava", "asse", "esse", "isse",
     "aste", "este", "iste", "ei", "arei", "erei", "irei", "am",
     "iam", "ariam", "eriam", "iriam", "aram", "eram", "iram",
     "avam", "em", "arem", "erem", "irem", "assem", "essem",
     "issem", "ado", "ido", "ira", "ando", "endo", "indo", "ara~o",
     "era~o", "ira~o", "ou", "iu", "eu", "ir", "ar", "er", "as",
     "adas", "idas", "ias", "arias", "erias", "irias", "ar\xe1s",
     "aras", "er\xe1s", "eras", "ir\xe1s", "iras", "avas", "es", "ardes",
     "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
     "isses", "astes", "estes", "istes", "is", "ais", "\xedeis",
     "ar\xedeis", "er\xedeis", "ir\xedeis", "\xe1reis", "areis",
     "\xe9reis", "ereis", "\xedreis", "ireis", "\xe1sseis",
     "\xe9sseis", "\xedsseis", "\xe1veis", "ados", "idos",
     "\xe1mos", "amos", "\xedamos", "ar\xedamos", "er\xedamos",
     "ir\xedamos", "\xe1ramos", "\xe9ramos", "\xedramos",
     "\xe1vamos", "emos", "aremos", "eremos", "iremos",
     "\xe1ssemos", "\xeassemos", "\xedssemos", "imos", "armos",
     "ermos", "irmos", "eis"],
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
    # prelude: nasalised vowel forms to two-char markers
    word = word.replace("\xe3", "a~").replace("\xf5", "o~")
    r1, r2, rv = _regions(word)

    n0 = len(word)
    altered = False

    # step 1: standard suffixes
    best = ""
    groups = (_S1_DELETE + _S1_ADOR
              + ["\xe2ncia", "log\xeda", "log\xedas", "uci\xf3n",
                 "uciones", "\xeancia", "\xeancias", "amente",
                 "mente", "idade", "idades", "iva", "ivo", "ivas",
                 "ivos", "ira", "iras"])
    for suf in groups:
        if len(suf) > len(best) and word.endswith(suf):
            best = suf
    if best:
        pos = len(word) - len(best)
        if best in _S1_DELETE or best in _S1_ADOR \
                or best == "\xe2ncia":
            if pos >= r2:
                word = word[:pos]
                altered = True
        elif best in ("log\xeda", "log\xedas"):
            if pos >= r2:
                word = word[:pos] + "log"
                altered = True
        elif best in ("uci\xf3n", "uciones"):
            if pos >= r2:
                word = word[:pos] + "u"
                altered = True
        elif best in ("\xeancia", "\xeancias"):
            if pos >= r2:
                word = word[:pos] + "ente"
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
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) \
                                and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif best == "mente":
            if pos >= r2:
                word = word[:pos]
                altered = True
                for pre in ("ante", "avel", "\xedvel"):
                    if word.endswith(pre) \
                            and len(word) - len(pre) >= r2:
                        word = word[:-len(pre)]
                        break
        elif best in ("idade", "idades"):
            if pos >= r2:
                word = word[:pos]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) \
                            and len(word) - len(pre) >= r2:
                        word = word[:-len(pre)]
                        break
        elif best in ("iva", "ivo", "ivas", "ivos"):
            if pos >= r2:
                word = word[:pos]
                altered = True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif best in ("ira", "iras"):
            if pos >= rv and pos >= 1 and word[pos - 1] == "e":
                word = word[:pos] + "ir"
                altered = True

    # step 2: verb suffixes (only if step 1 changed nothing)
    if not altered:
        best = ""
        for suf in _S2_BIG:
            if len(suf) > len(best) and word.endswith(suf) \
                    and len(word) - len(suf) >= rv:
                best = suf
        if best:
            word = word[: len(word) - len(best)]
            altered = True

    # step 3: i preceded by c (only if step 1 or 2 altered)
    if altered and word.endswith("i") and len(word) - 1 >= rv \
            and len(word) >= 2 and word[-2] == "c":
        word = word[:-1]

    # step 4: residual suffix (only if steps 1 & 2 did nothing)
    if not altered:
        for suf in ("os", "a", "i", "o", "\xe1", "\xed", "\xf3"):
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                word = word[: len(word) - len(suf)]
                break

    # step 5: final e
    for suf in ("e", "\xe9", "\xea"):
        if word.endswith(suf) and len(word) - 1 >= rv:
            word = word[:-1]
            if ((word.endswith("gu") and len(word) - 1 >= rv)
                    or (word.endswith("ci") and len(word) - 1 >= rv)):
                word = word[:-1]
            break
    else:
        if word.endswith("\xe7"):
            word = word[:-1] + "c"

    # postlude: restore nasal vowels; accents are KEPT (unlike
    # Spanish)
    return word.replace("a~", "\xe3").replace("o~", "\xf5")
