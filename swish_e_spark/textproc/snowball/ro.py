"""Snowball Romanian stemmer (public algorithm, snowballstem.org;
reference vintage pinned by /root/reference/src/snowball/stem_ro.c
via tests/fixtures/snowball_ro.tsv).

Letters are the ISO-8859-2 repertoire the reference's byte tables
address (0xE3 = ă, 0xBA = ş, 0xFE = ţ).  step_0 / the standard
suffixes / vowel_suffix check their region AFTER the longest among
match (no retry of a shorter suffix on failure); verb_suffix is the
one routine generated with setlimit, so there matching itself is
restricted to RV and shorter suffixes DO get tried.
"""

from __future__ import annotations

_V = "aeiou\xe2\xeeă"  # a e i o u â î ă

_STEP0 = [  # a_1 — R1; replacement None = delete
    ("iilor", "i"),
    ("ului", None), ("aţia", "aţi"), ("aţie", "aţi"),
    ("atei", "at"), ("elor", "e"), ("ilor", "i"), ("iile", "i"),
    ("aua", "a"), ("iua", "i"), ("iei", "i"), ("ele", "e"),
    ("ile", "i"),  # fails outright when preceded by "ab"
    ("ii", "i"), ("ea", "e"), ("ul", None),
]

_COMBO = [  # a_2 — R1; repeated until no hit
    ("abilitate", "abil"), ("abilitati", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"),
    ("abilităi", "abil"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităţi", "ic"),
    ("icatori", "ic"), ("ivitate", "iv"), ("ivitati", "iv"),
    ("ivităţi", "iv"),
    ("icităi", "ic"), ("ivităi", "iv"), ("aţiune", "at"),
    ("iţiune", "it"), ("atoare", "at"), ("itoare", "it"),
    ("ătoare", "at"), ("icator", "ic"),
    ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"), ("iciva", "ic"), ("icive", "ic"),
    ("icivi", "ic"), ("icivă", "ic"), ("ativa", "at"),
    ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
    ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("atori", "at"), ("itori", "it"),
    ("ători", "at"),
    ("ical", "ic"), ("iciv", "ic"), ("ativ", "at"),
    ("itiv", "it"), ("ator", "at"), ("itor", "it"),
    ("ător", "at"),
]

_DEL = 1
_TIUNE = 2
_IST = 3

_STANDARD = [  # a_3 — R2
    ("abila", _DEL), ("abile", _DEL), ("abili", _DEL),
    ("abilă", _DEL), ("ibila", _DEL), ("ibile", _DEL),
    ("ibili", _DEL), ("ibilă", _DEL), ("atori", _DEL),
    ("itate", _DEL), ("itati", _DEL), ("ităţi", _DEL),
    ("oasa", _DEL), ("oase", _DEL), ("oasă", _DEL),
    ("anta", _DEL), ("ante", _DEL), ("anti", _DEL),
    ("antă", _DEL), ("isme", _IST), ("iune", _TIUNE),
    ("iuni", _TIUNE), ("ista", _IST), ("iste", _IST),
    ("isti", _IST), ("istă", _IST), ("işti", _IST),
    ("ităi", _DEL), ("ator", _DEL),
    ("ica", _DEL), ("ice", _DEL), ("ici", _DEL), ("ică", _DEL),
    ("ata", _DEL), ("ate", _DEL), ("ati", _DEL), ("ată", _DEL),
    ("ita", _DEL), ("ite", _DEL), ("iti", _DEL), ("ită", _DEL),
    ("uta", _DEL), ("ute", _DEL), ("uti", _DEL), ("ută", _DEL),
    ("iva", _DEL), ("ive", _DEL), ("ivi", _DEL), ("ivă", _DEL),
    ("osi", _DEL), ("oşi", _DEL), ("ism", _IST), ("ist", _IST),
    ("abil", _DEL), ("ibil", _DEL),
    ("ic", _DEL), ("os", _DEL), ("at", _DEL), ("it", _DEL),
    ("iv", _DEL), ("ant", _DEL), ("ut", _DEL),
]

# a_4 is _VERB_TABLE at the bottom of this module — matched under
# the RV setlimit; action 1 = delete when the preceding char (still
# inside RV) is a non-vowel or a literal 'u', action 2 = delete
# unconditionally

_VOWEL = [  # a_5 — RV, all delete
    "ie", "a", "e", "i", "ă",
]

# find_among_b is longest-match: enforce it structurally rather than
# by hand-ordering (within a length, entries are mutually exclusive)
_STEP0 = sorted(_STEP0, key=lambda t: len(t[0]), reverse=True)
_COMBO = sorted(_COMBO, key=lambda t: len(t[0]), reverse=True)
_STANDARD = sorted(_STANDARD, key=lambda t: len(t[0]), reverse=True)
_VOWEL = sorted(_VOWEL, key=len, reverse=True)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    rv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    rv = j + 1
            else:
                j = 2
                while j < n and w[j] in _V:
                    j += 1
                if j < n:
                    rv = j + 1
        else:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                if j < n:
                    rv = j + 1
            elif n >= 3:
                rv = 3

    def _next_region(start: int) -> int:
        j = start
        while j < n and w[j] not in _V:
            j += 1
        j += 1
        while j < n and w[j] in _V:
            j += 1
        j += 1
        return j if j <= n else n + 1

    r1 = _next_region(0)
    if r1 > n:
        return rv, n, n
    r2 = _next_region(r1)
    return rv, r1, n if r2 > n else r2


def _prelude(w: str) -> str:
    out = list(w)
    for j in range(len(out) - 2):
        if out[j] in _V and out[j + 2] in _V:
            if out[j + 1] == "u":
                out[j + 1] = "U"
            elif out[j + 1] == "i":
                out[j + 1] = "I"
    return "".join(out)


def stem(word: str) -> str:
    w = _prelude(word)
    rv, r1, r2 = _regions(w)

    # step 0
    for suf, repl in _STEP0:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ile" and w.endswith("abile"):
                    break
                w = w[:-len(suf)] + (repl or "")
            break

    # standard suffixes: repeat combo, then one a_3 pass under R2
    removed = False
    changed = True
    while changed:
        changed = False
        for suf, repl in _COMBO:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[:-len(suf)] + repl
                    removed = True
                    changed = True
                break
    for suf, action in _STANDARD:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if action == _DEL:
                    w = w[:-len(suf)]
                    removed = True
                elif action == _IST:
                    w = w[:-len(suf)] + "ist"
                    removed = True
                elif w.endswith("ţ" + suf):
                    w = w[:-len(suf) - 1] + "t"
                    removed = True
            break

    if not removed:
        w = _verb_suffix(w, rv)

    # vowel suffix (RV, longest match, single check)
    for suf in _VOWEL:
        if w.endswith(suf):
            if len(w) - len(suf) >= rv:
                w = w[:-len(suf)]
            break

    return w.replace("I", "i").replace("U", "u")


def _verb_suffix(w: str, rv: int) -> str:
    sub = w[rv:]
    for suf, action in _VERB_TABLE:
        if sub.endswith(suf):
            if action == 2:
                return w[:-len(suf)]
            idx = len(w) - len(suf) - 1
            if idx >= rv and (w[idx] not in _V or w[idx] == "u"):
                return w[:-len(suf)]
            return w
    return w


# a_4 in full, longest-first (action 2 entries are the se-/persoana
# forms deleted unconditionally; everything else is action 1)
_VERB_TABLE = sorted([
    ("ea", 1), ("ia", 1), ("esc", 1), ("ăsc", 1), ("ind", 1),
    ("ând", 1), ("are", 1), ("ere", 1), ("ire", 1), ("âre", 1),
    ("se", 2), ("ase", 1), ("sese", 2), ("ise", 1), ("use", 1),
    ("âse", 1), ("eşte", 1), ("ăşte", 1), ("eze", 1), ("ai", 1),
    ("eai", 1), ("iai", 1), ("sei", 2), ("eşti", 1), ("ăşti", 1),
    ("ui", 1), ("ezi", 1), ("aşi", 1), ("seşi", 2), ("aseşi", 1),
    ("seseşi", 2), ("iseşi", 1), ("useşi", 1), ("âseşi", 1),
    ("işi", 1), ("uşi", 1), ("âşi", 1), ("âi", 1), ("aţi", 2),
    ("eaţi", 1), ("iaţi", 1), ("eţi", 2), ("iţi", 2), ("âţi", 2),
    ("arăţi", 1), ("serăţi", 2), ("aserăţi", 1), ("seserăţi", 2),
    ("iserăţi", 1), ("userăţi", 1), ("âserăţi", 1), ("irăţi", 1),
    ("urăţi", 1), ("ârăţi", 1), ("am", 1), ("eam", 1), ("iam", 1),
    ("em", 2), ("asem", 1), ("sesem", 2), ("isem", 1), ("usem", 1),
    ("âsem", 1), ("im", 2), ("âm", 2), ("ăm", 2), ("arăm", 1),
    ("serăm", 2), ("aserăm", 1), ("seserăm", 2), ("iserăm", 1),
    ("userăm", 1), ("âserăm", 1), ("irăm", 1), ("urăm", 1),
    ("ârăm", 1), ("au", 1), ("eau", 1), ("iau", 1), ("indu", 1),
    ("ându", 1), ("ez", 1), ("ească", 1), ("ară", 1), ("seră", 2),
    ("aseră", 1), ("seseră", 2), ("iseră", 1), ("useră", 1),
    ("âseră", 1), ("iră", 1), ("ură", 1), ("âră", 1), ("ează", 1),
], key=lambda t: len(t[0]), reverse=True)
