"""Snowball French stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_fr.c
via tests/fixtures/snowball_fr.tsv)."""

from __future__ import annotations

_VOWELS = "aeiouy\xe2\xe0\xeb\xe9\xea\xe8\xef\xee\xf4\xfb\xf9"

_S1_PLAIN = ["iqUe", "able", "isme", "iste", "eux", "iqUes",
             "ables", "ismes", "istes", "ance", "ances"]

_S2A_I = sorted(
    ["ira", "ie", "isse", "issante", "i", "irai", "ir", "iras",
     "ies", "\xeemes", "isses", "issantes", "\xeetes", "is",
     "irais", "issais", "irions", "issions", "irons", "issons",
     "issants", "it", "irait", "issait", "issant", "iraIent",
     "issaIent", "irent", "issent", "iront", "\xeet", "iriez",
     "issiez", "irez", "issez"], key=len, reverse=True)

_S2B_ER = ["\xe9e", "\xe9es", "\xe9s", "\xe8rent", "er", "era",
           "erai", "eraIent", "erais", "erait", "eras", "erez",
           "eriez", "erions", "erons", "eront", "ez", "iez",
           "\xe9"]
_S2B_A = ["\xe2t", "\xe2mes", "\xe2tes", "a", "ai", "aIent",
          "ais", "ait", "ant", "ante", "antes", "ants", "as",
          "asse", "assent", "asses", "assiez", "assions"]

_KEEP_WITH_S = "aiou\xe8s"


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
    # RV: after third letter if word starts with two vowels or with
    # par/col/tap; else after the first vowel not at position 0
    rv = n
    if n >= 3 and word[0] in _VOWELS and word[1] in _VOWELS:
        rv = 3
    elif word[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        for i in range(1, n):
            if word[i] in _VOWELS:
                rv = i + 1
                break
    return r1, r2, rv


def stem(word: str) -> str:
    # prelude — ordered-alternative scan, exactly the snowball
    # `repeat goto` with y ∈ v:
    #   (v [u] v -> U | v [i] v -> I | v [y] -> Y)
    #   or ([y] v -> Y)  or  (q [u] -> U)
    # marks are consonants for every later test
    # cursor semantics: slice_from resets the cursor to the end of
    # the REPLACED slice, so a trailing v test does not advance the
    # scan past the next character
    chars = list(word)
    n = len(chars)
    p = 0
    while p < n:
        c = chars[p]
        if c in _VOWELS and p + 1 < n:
            nxt = chars[p + 1]
            if nxt == "u" and p + 2 < n and chars[p + 2] in _VOWELS:
                chars[p + 1] = "U"
                p += 2
                continue
            if nxt == "i" and p + 2 < n and chars[p + 2] in _VOWELS:
                chars[p + 1] = "I"
                p += 2
                continue
            if nxt == "y":
                chars[p + 1] = "Y"
                p += 2
                continue
        if c == "y" and p + 1 < n and chars[p + 1] in _VOWELS:
            chars[p] = "Y"
            p += 1
            continue
        if c == "q" and p + 1 < n and chars[p + 1] == "u":
            chars[p + 1] = "U"
            p += 2
            continue
        p += 1
    word = "".join(chars)
    r1, r2, rv = _regions(word)

    changed = False

    def try_suffix_chain(w):
        """standard_suffix; returns (new_word, status) with status:
        1 = success (skip verbs), 0 = no match / condition fail,
        -1 = changed-but-fail (amment/emment/ment: verbs still run)"""
        best = ""
        groups = (_S1_PLAIN
                  + ["atrice", "atrices", "ation", "ations",
                     "ateur", "ateurs", "logie", "logies", "usion",
                     "ution", "usions", "utions", "ence", "ences",
                     "ement", "ements", "it\xe9", "it\xe9s", "if",
                     "ive", "ifs", "ives", "eaux", "aux", "euse",
                     "euses", "issement", "issements", "amment",
                     "emment", "ment", "ments"])
        for suf in groups:
            if len(suf) > len(best) and w.endswith(suf):
                best = suf
        if not best:
            return w, 0
        pos = len(w) - len(best)
        if best in _S1_PLAIN:
            if pos < r2:
                return w, 0
            return w[:pos], 1
        if best in ("atrice", "atrices", "ation", "ations",
                    "ateur", "ateurs"):
            if pos < r2:
                return w, 0
            w = w[:pos]
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            return w, 1
        if best in ("logie", "logies"):
            if pos < r2:
                return w, 0
            return w[:pos] + "log", 1
        if best in ("usion", "ution", "usions", "utions"):
            if pos < r2:
                return w, 0
            return w[:pos] + "u", 1
        if best in ("ence", "ences"):
            if pos < r2:
                return w, 0
            return w[:pos] + "ent", 1
        if best in ("ement", "ements"):
            if pos < rv:
                return w, 0
            w = w[:pos]
            # chase: iv(+at) / eus / abl,iqU / ièr,Ièr
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif w.endswith("eus"):
                if len(w) - 3 >= r2:
                    w = w[:-3]
                elif len(w) - 3 >= r1:
                    w = w[:-3] + "eux"
            elif (w.endswith("abl") or w.endswith("iqU")) \
                    and len(w) - 3 >= r2:
                w = w[:-3]
            elif (w.endswith("i\xe8r") or w.endswith("I\xe8r")) \
                    and len(w) - 3 >= rv:
                w = w[:-3] + "i"
            return w, 1
        if best in ("it\xe9", "it\xe9s"):
            if pos < r2:
                return w, 0
            w = w[:pos]
            if w.endswith("abil"):
                if len(w) - 4 >= r2:
                    w = w[:-4]
                else:
                    w = w[:-4] + "abl"
            elif w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            elif w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
            return w, 1
        if best in ("if", "ive", "ifs", "ives"):
            if pos < r2:
                return w, 0
            w = w[:pos]
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            return w, 1
        if best == "eaux":
            return w[:-4] + "eau", 1
        if best == "aux":
            if pos < r1:
                return w, 0
            return w[:pos] + "al", 1
        if best in ("euse", "euses"):
            if pos >= r2:
                return w[:pos], 1
            if pos >= r1:
                return w[:pos] + "eux", 1
            return w, 0
        if best in ("issement", "issements"):
            if pos >= r1 and pos >= 1 \
                    and w[pos - 1] not in _VOWELS:
                return w[:pos], 1
            return w, 0
        if best == "amment":
            if pos < rv:
                return w, 0
            return w[:pos] + "ant", -1
        if best == "emment":
            if pos < rv:
                return w, 0
            return w[:pos] + "ent", -1
        if best in ("ment", "ments"):
            if pos >= 1 and w[pos - 1] in _VOWELS \
                    and pos - 1 >= rv:
                return w[:pos], -1
            return w, 0
        return w, 0

    word2, status = try_suffix_chain(word)
    word = word2
    if status == 1:
        changed = True
    else:
        # step 2a: verb suffixes beginning i (in RV); preceding
        # non-vowel also within RV
        done2a = False
        best = ""
        for suf in _S2A_I:
            if len(suf) > len(best) and word.endswith(suf) \
                    and len(word) - len(suf) >= rv:
                best = suf
        if best:
            pos = len(word) - len(best)
            if pos - 1 >= rv and pos >= 1 \
                    and word[pos - 1] not in _VOWELS:
                word = word[:pos]
                changed = True
                done2a = True
        if not done2a:
            # step 2b: other verb suffixes (in RV)
            best = ""
            for suf in (_S2B_ER + _S2B_A + ["ions"]):
                if len(suf) > len(best) and word.endswith(suf) \
                        and len(word) - len(suf) >= rv:
                    best = suf
            if best == "ions":
                if len(word) - 4 >= r2:
                    word = word[:-4]
                    changed = True
            elif best in _S2B_ER:
                word = word[: len(word) - len(best)]
                changed = True
            elif best in _S2B_A:
                word = word[: len(word) - len(best)]
                changed = True
                if word.endswith("e") and len(word) - 1 >= rv:
                    word = word[:-1]

    if changed:
        # Y -> i / ç -> c at the very end
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("\xe7"):
            word = word[:-1] + "c"
    else:
        # step 4: residual suffix
        if word.endswith("s") and len(word) >= 2 \
                and word[-2] not in _KEEP_WITH_S:
            word = word[:-1]
        best = ""
        for suf in ("ion", "ier", "Ier", "i\xe8re", "I\xe8re", "e",
                    "\xeb"):
            if len(suf) > len(best) and word.endswith(suf) \
                    and len(word) - len(suf) >= rv:
                best = suf
        if best == "ion":
            if len(word) - 3 >= r2 and len(word) >= 4 \
                    and word[-4] in "st":
                word = word[:-3]
        elif best in ("ier", "Ier", "i\xe8re", "I\xe8re"):
            word = word[: len(word) - len(best)] + "i"
        elif best == "e":
            word = word[:-1]
        elif best == "\xeb":
            if word.endswith("gu\xeb"):
                word = word[:-1]

    # un_double: ends enn onn ett ell eill -> remove last letter
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(suf):
            word = word[:-1]
            break

    # un_accent: é/è followed by at least one trailing non-vowel -> e
    i = len(word) - 1
    k = 0
    while i >= 0 and word[i] not in _VOWELS:
        i -= 1
        k += 1
    if k >= 1 and i >= 0 and word[i] in "\xe9\xe8":
        word = word[:i] + "e" + word[i + 1:]

    # postlude
    return (word.replace("I", "i").replace("U", "u")
            .replace("Y", "y"))
