#!/usr/bin/env python
"""Generate differential-pin fixtures from the COMPILED reference
binary (VERDICT r3 item 1: engine and oracle share kernels, so
rank-identity alone cannot catch a shared semantic bug — the real
swish-e binary is the independent ground truth).

Usage:
    SWISH_BIN=/path/to/swish-e python scripts/gen_refbin_fixtures.py

Build recipe for the binary (from the read-only reference tree):
    cp -r /root/reference /tmp/swbuild/refsrc && cd /tmp/swbuild/refsrc
    # modern zlib ships its own uncompress2(); rename the internal one
    cd src && sed -i 's/\\buncompress2\\b/sw_uncompress2/g' \
        $(grep -rln uncompress2 *.c *.h) && cd ..
    ./configure --disable-shared && make -j8   # needs libxml2 headers

Outputs (committed under tests/fixtures/refbin/):
  tokens_ref.tsv / tokens_gen.tsv   file, field, word, pos, structhex
    — the -T INDEXED_WORDS stream: the real parser+tokenizer ground
    truth (libxml2 HTML/XML/TXT paths, comments, metas, stopword
    position bumping).
  queries_ref.tsv / queries_gen.tsv qid, rank, docpath (output order)
  battery_ref.json / battery_gen.json  qid -> cli arg spec
  manifest_gen.tsv                  filename -> url (docs re-derivable
    from swish_e_spark.datagen.pages — the files themselves are not
    committed).

Corpus A ("ref"): the reference repo's own tests/*.{html,txt,xml} with
its tests/test.config (no stopwords, IndexComments yes).
Corpus B ("gen"): 300 deterministic datagen pages, config mapped to
our engine defaults (DEFAULT_STOPWORDS as IgnoreWords, MetaNames
meta1-3, IndexComments no = IndexConfig default).
Corpus C ("stem"): the SAME 300 pages indexed with
FuzzyIndexingMode Stemming_en1 (the Snowball porter variant — our
fuzzy="snowball_en1") — pins index-side stemming, query-side
stemming, stopword-before-stem ordering, and stem-aware ranking
end-to-end against the binary.
Corpus D ("dm"): the same pages with FuzzyIndexingMode
DoubleMetaphone — pins dual-code emission at one position, query
(primary OR secondary) expansion, and phonetic phrase/NEAR matching.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "tests", "fixtures", "refbin")
SWISH = os.environ.get("SWISH_BIN", "/tmp/swbuild/refsrc/src/swish-e")
REF_TESTS = "/root/reference/tests"

ADD_RE = re.compile(
    r"Adding:\[\d+:(\w+)\(\d+\)\]\s+'(.*)'\s+Pos:(\d+)\s+"
    r"Stuct:(0x[0-9a-f]+)")
FILE_RE = re.compile(r'^Indexing "(.+)"')

# battery specs: qid -> cli args beyond -w; "w" is the query
BATTERY_REF = {
    "and": {"w": "three AND pigs"},
    "or": {"w": "apples OR oranges"},
    "implicit": {"w": "three little"},
    "andnot": {"w": "time NOT pigs"},
    "leadnot": {"w": "not pigs"},
    "phrase": {"w": '"three little pigs"'},
    "phrase_gap": {"w": '"once upon a time"'},
    "near": {"w": "little NEAR5 wolf"},
    "near_wide": {"w": "once NEAR9 pigs"},
    "meta": {"w": "meta1=metatest1"},
    "meta_or": {"w": "meta2=(metatest2 or bla)"},
    "wild": {"w": "meta*"},
    "wild_title": {"w": "t*"},
    "term_r1": {"w": "pigs", "R": "1"},
    "and_r1": {"w": "three AND pigs", "R": "1"},
    "phrase_r1": {"w": '"three little pigs"', "R": "1"},
    "sort_path": {"w": "the OR a OR test", "s": "swishdocpath"},
    "limit_title": {"w": "test OR pigs OR apples",
                    "L": ["swishtitle", "a", "zz"]},
    "struct_title": {"w": "test", "t": "t"},
    "struct_emph": {"w": "bold OR italic", "t": "e"},
}

BATTERY_GEN = {
    "term_head": {"w": "common0"},
    "term_mid": {"w": "lituce"},
    "and": {"w": "three AND pigs"},
    "and_head": {"w": "common0 AND common1"},
    "implicit": {"w": "lituce sopu"},
    "or": {"w": "pigs OR sugar"},
    "andnot": {"w": "common1 NOT wolf"},
    "leadnot": {"w": "not common0"},
    "phrase": {"w": '"three little pigs"'},
    "phrase_gap": {"w": '"once upon a time"'},
    "near": {"w": "little NEAR5 wolf"},
    "near_chain": {"w": "little NEAR5 wolf NEAR5 pigs"},
    "meta": {"w": "meta1=metatest1"},
    "meta2": {"w": "meta2=(metatest2 or kidovu)"},
    "meta_xml": {"w": "meta3=metatest3"},
    "wild": {"w": "wol*"},
    "wild_comm": {"w": "comm*"},
    "term_r1": {"w": "common1", "R": "1"},
    "and_r1": {"w": "three AND pigs", "R": "1"},
    "near_r1": {"w": "little NEAR5 wolf", "R": "1"},
    "phrase_r1": {"w": '"three little pigs"', "R": "1"},
    "struct_title": {"w": "lituce", "t": "t"},
    "struct_emph": {"w": "lituce", "t": "e"},
    "limit_title": {"w": "common0", "L": ["swishtitle", "a", "m"]},
    "sort_path": {"w": "sugar OR pigs", "s": "swishdocpath"},
}

# corpus C: the binary stems BOTH the indexed words and the query
# words, so "run" must match docs containing running/runs (but not
# "ran" — porter keeps it) and the inflections all collide at rank time
BATTERY_STEM = {
    "stem_base": {"w": "run"},
    "stem_inflected": {"w": "running"},
    "stem_family": {"w": "connection"},
    "stem_family2": {"w": "hoping OR hopped"},
    "stem_and": {"w": "running AND sugar"},
    "stem_andnot": {"w": "tested NOT wolf"},
    "stem_phrase": {"w": '"three little pigs"'},
    "stem_phrase_stems": {"w": '"run running"'},
    "stem_near": {"w": "running NEAR5 sugar"},
    "stem_meta": {"w": "meta1=metatest1"},
    "stem_wild": {"w": "runn*"},   # trailing-* bypasses stemming
    "stem_r1": {"w": "running", "R": "1"},
    "stem_struct_title": {"w": "running", "t": "t"},
    "stem_limit": {"w": "run", "L": ["swishtitle", "a", "m"]},
    "stem_sort": {"w": "runs OR sugar", "s": "swishdocpath"},
}

# corpus E: Soundex — first letter kept + 3 digits, heaviest
# collapsing of the three modes (drops vowels entirely)
BATTERY_SND = {
    "snd_exact": {"w": "wolf"},
    "snd_homophone": {"w": "wolph"},
    "snd_misspell": {"w": "shugar OR sugar"},
    "snd_vowelless": {"w": "wlf OR wolf"},
    "snd_and": {"w": "wolf AND sugar"},
    "snd_phrase": {"w": '"little pig"'},
    "snd_near": {"w": "little NEAR5 wolf"},
    "snd_meta": {"w": "meta1=metatest1"},
    "snd_r1": {"w": "wolf", "R": "1"},
    "snd_struct_title": {"w": "lituce", "t": "t"},
    "snd_sort": {"w": "wolf OR sugar", "s": "swishdocpath"},
}

# corpus D: phonetic codes on both sides — misspellings that share a
# DoubleMetaphone code with corpus words must match them
BATTERY_DM = {
    "dm_exact": {"w": "wolf"},
    "dm_homophone": {"w": "wulf"},
    "dm_misspell": {"w": "shugar"},
    "dm_misspell2": {"w": "conection"},
    "dm_and": {"w": "wolf AND sugar"},
    "dm_or": {"w": "wulf OR runing"},
    "dm_phrase": {"w": '"little pig"'},
    "dm_near": {"w": "little NEAR5 wolf"},
    "dm_meta": {"w": "meta1=metatest1"},
    "dm_r1": {"w": "wolf", "R": "1"},
    "dm_struct_title": {"w": "lituce", "t": "t"},
    "dm_sort": {"w": "wolf OR sugar", "s": "swishdocpath"},
}


# corpus F ("dir"): the same 300 pages indexed with the round-4
# directive surface active — MetaNameAlias (query via alias),
# IgnoreMetaTags (meta2 content dropped, bumps stay),
# BumpPositionCounterCharacters (token-stream positions shift),
# ExtractPath/ExtractPathDefault (path-derived metanames over the
# fixture FILENAMES), PropertyNames meta1 (-L/-s on the captured
# property), IgnoreTotalWordCountWhenRanking 0 (enables -R 1).
BATTERY_DIR = {
    "dir_alias_q": {"w": "m1alias=metatest1"},
    "dir_alias_q2": {"w": "m1alias=common0"},
    "dir_base_q": {"w": "meta1=metatest1"},
    "dir_ignored_meta": {"w": "meta2=metatest2"},
    "dir_path_seg0": {"w": "pathmeta=d0"},
    "dir_path_seg1": {"w": "pathmeta=d1"},
    "dir_path_seg2": {"w": "pathmeta=d2"},
    "dir_path_default": {"w": "rootm=everydoc"},
    "dir_phrase_bump": {"w": '"three little pigs"'},
    "dir_near_bump": {"w": "little NEAR5 wolf"},
    "dir_and": {"w": "common0 AND common1"},
    "dir_rank_r1": {"w": "common1", "R": "1"},
    "dir_sort_prop": {"w": "meta1=metatest1", "s": "meta1"},
    "dir_limit_prop": {"w": "meta1=metatest1",
                   "L": ["meta1", "metatest1 a", "metatest1 m"]},
    "dir_limit_all": {"w": "meta1=metatest1",
                  "L": ["meta1", "a", "z"]},
}


def run(args, **kw):
    # swish-e output is Latin-1 (it folds UTF-8 input to Latin-1)
    return subprocess.run(args, capture_output=True, text=True,
                          encoding="latin-1", **kw)


def index_corpus(workdir, config_text, files):
    cfg = os.path.join(workdir, "pin.config")
    with open(cfg, "w") as f:
        f.write(config_text)
    # token dump comes from a separate indexing run (-T writes to
    # stdout interleaved with progress; index output itself unused)
    dump = run([SWISH, "-c", cfg, "-i", *files, "-f",
                os.path.join(workdir, "dumpidx"),
                "-T", "INDEXED_WORDS"], cwd=workdir)
    tokens = []
    cur = None
    for line in dump.stdout.splitlines():
        m = FILE_RE.match(line.strip())
        if m:
            cur = os.path.basename(m.group(1))
            continue
        m = ADD_RE.search(line)
        if m and cur is not None:
            field, word, pos, struct = m.groups()
            tokens.append((cur, field, word, int(pos), struct))
    r = run([SWISH, "-c", cfg, "-i", *files, "-f",
             os.path.join(workdir, "idx")], cwd=workdir)
    if "Indexing done!" not in r.stdout:
        raise RuntimeError(f"indexing failed:\n{r.stdout}\n{r.stderr}")
    # the -T dump logs Adding lines even for docs later ABORTED (robots
    # noindex kills the whole doc including its already-dumped title
    # words) — keep only docs present in the final index
    # the probe word must survive EVERY fuzzy mode unchanged: a pure
    # number has an empty DoubleMetaphone code, so fuzzy_convert passes
    # it through verbatim (stemmer.c:378-383) — an alphabetic probe
    # like "zzzqqnosuchword" gets fuzzied and its tiny phonetic code
    # space collides with real corpus words, silently dropping docs
    # from the kept set
    lst = run([SWISH, "-f", os.path.join(workdir, "idx"),
               "-w", "not 987654321987",
               "-x", "<swishdocpath>\\n", "-H", "0"], cwd=workdir)
    kept = {os.path.basename(line.strip())
            for line in lst.stdout.splitlines()
            if line.strip() and line != "." and not
            line.startswith(("#", "err:"))}
    return [t for t in tokens if t[0] in kept]


def run_battery(workdir, battery):
    rows = []
    for qid, spec in sorted(battery.items()):
        args = [SWISH, "-f", os.path.join(workdir, "idx"),
                "-w", spec["w"], "-R", spec.get("R", "0"),
                "-x", "<swishrank>\\t<swishdocpath>\\n", "-H", "0"]
        if "s" in spec:
            args += ["-s", spec["s"]]
        if "L" in spec:
            args += ["-L", *spec["L"]]
        if "t" in spec:
            args += ["-t", spec["t"]]
        r = run(args, cwd=workdir)
        for line in r.stdout.splitlines():
            if line == "." or line.startswith("#") or not line.strip():
                continue
            if line.startswith("err:"):
                rows.append((qid, "ERR", line.strip()))
                break
            rank, path = line.split("\t")
            rows.append((qid, rank, os.path.basename(path)))
    return rows


def write_tsv(path, rows):
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(str(x) for x in row) + "\n")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)

    # ---- corpus A: the reference's own test files + test.config ----
    wa = tempfile.mkdtemp(prefix="refpin_a_")
    files_a = []
    for name in sorted(os.listdir(REF_TESTS)):
        if name.endswith((".html", ".txt", ".xml")):
            shutil.copy(os.path.join(REF_TESTS, name), wa)
            files_a.append(name)
    cfg_a = open(os.path.join(REF_TESTS, "test.config")).read()
    tokens = index_corpus(wa, cfg_a, files_a)
    write_tsv(os.path.join(OUT_DIR, "tokens_ref.tsv"), tokens)
    write_tsv(os.path.join(OUT_DIR, "queries_ref.tsv"),
              run_battery(wa, BATTERY_REF))
    json.dump(BATTERY_REF,
              open(os.path.join(OUT_DIR, "battery_ref.json"), "w"),
              indent=1)

    # ---- corpus B: 300 deterministic datagen pages ----
    from swish_e_spark.datagen.pages import generate_rows
    from swish_e_spark.index.builder import doctype_of_url
    from swish_e_spark.textproc.stopwords import DEFAULT_STOPWORDS

    wb = tempfile.mkdtemp(prefix="refpin_b_")
    manifest = []
    files_b = []
    for i, row in enumerate(generate_rows(300)):
        ext = doctype_of_url(row["url"])
        ext = {"html": "html", "txt": "txt", "xml": "xml"}[ext]
        name = f"{i:06d}.{ext}"
        with open(os.path.join(wb, name), "wb") as f:
            f.write(row["html"])
        manifest.append((name, row["url"]))
        files_b.append(name)
    stop = " ".join(sorted(DEFAULT_STOPWORDS))
    cfg_b = f"""
IndexOnly .html .txt .xml
MetaNames meta1 meta2 meta3
PropertyNames meta1 meta2 meta3
IndexContents TXT* .txt
IndexContents XML* .xml
IndexContents HTML* .htm .html
obeyRobotsNoIndex yes
IgnoreWords {stop}
"""
    tokens = index_corpus(wb, cfg_b, files_b)
    write_tsv(os.path.join(OUT_DIR, "tokens_gen.tsv"), tokens)
    write_tsv(os.path.join(OUT_DIR, "queries_gen.tsv"),
              run_battery(wb, BATTERY_GEN))
    json.dump(BATTERY_GEN,
              open(os.path.join(OUT_DIR, "battery_gen.json"), "w"),
              indent=1)
    write_tsv(os.path.join(OUT_DIR, "manifest_gen.tsv"), manifest)

    # ---- corpora C/D: same pages, fuzzy indexing modes ----
    for tag, mode, battery in (
            ("stem", "Stemming_en1", BATTERY_STEM),
            ("dm", "DoubleMetaphone", BATTERY_DM),
            ("snd", "Soundex", BATTERY_SND)):
        wf = tempfile.mkdtemp(prefix=f"refpin_{tag}_")
        for name in files_b:
            shutil.copy(os.path.join(wb, name), wf)
        cfg_f = cfg_b + f"FuzzyIndexingMode {mode}\n"
        tokens = index_corpus(wf, cfg_f, files_b)
        write_tsv(os.path.join(OUT_DIR, f"tokens_{tag}.tsv"), tokens)
        write_tsv(os.path.join(OUT_DIR, f"queries_{tag}.tsv"),
                  run_battery(wf, battery))
        json.dump(battery,
                  open(os.path.join(OUT_DIR, f"battery_{tag}.json"),
                       "w"), indent=1)
    # ---- corpus F: same pages, round-4 directive surface ----
    wd = tempfile.mkdtemp(prefix="refpin_dir_")
    for name in files_b:
        shutil.copy(os.path.join(wb, name), wd)
    cfg_d = f"""
IndexOnly .html .txt .xml
MetaNames meta1 meta2 meta3
MetaNameAlias meta1 m1alias
IgnoreMetaTags meta2
BumpPositionCounterCharacters .-
ExtractPath pathmeta regex !^000([0-9]).*$!d$1!
ExtractPath rootm replace neverzzz yyy
ExtractPathDefault rootm everydoc
PropertyNames meta1
IgnoreTotalWordCountWhenRanking 0
IndexContents TXT* .txt
IndexContents XML* .xml
IndexContents HTML* .htm .html
obeyRobotsNoIndex yes
IgnoreWords {stop}
"""
    tokens = index_corpus(wd, cfg_d, files_b)
    write_tsv(os.path.join(OUT_DIR, "tokens_dir.tsv"), tokens)
    write_tsv(os.path.join(OUT_DIR, "queries_dir.tsv"),
              run_battery(wd, BATTERY_DIR))
    json.dump(BATTERY_DIR,
              open(os.path.join(OUT_DIR, "battery_dir.json"), "w"),
              indent=1)
    print(f"fixtures written to {OUT_DIR}")


if __name__ == "__main__":
    main()
