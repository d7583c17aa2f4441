"""Differential pin against the COMPILED reference binary.

Engine and oracle share tokenizer/extractor/rank kernels, so
rank-identity alone cannot catch a shared semantic bug (two such bugs
were found by hand in round 3).  The committed fixtures under
``tests/fixtures/refbin/`` were produced by
``scripts/gen_refbin_fixtures.py`` driving the REAL ``swish-e`` binary
compiled from ``/root/reference`` (recipe in that script's docstring):

  tokens_{ref,gen}.tsv   the binary's -T INDEXED_WORDS stream
                         (file, field, word, pos, structhex) — the
                         ground truth for parser+tokenizer+positions
  queries_{ref,gen}.tsv  ranked output (qid, displayrank, docpath) for
                         a battery covering AND/OR/NOT/and-not/phrase/
                         NEAR<d>/meta/wildcard/-t/-L/-s/-R 0 and 1
  battery_{ref,gen}.json qid -> cli arg spec (the same battery specs
                         this suite replays through our oracle/engine)

Corpus "ref" = /root/reference/tests/*.{html,txt,xml} with the
reference's own tests/test.config (no stopwords, IndexComments yes,
IgnoreTotalWordCountWhenRanking 0).  Corpus "gen" = 300 deterministic
``datagen.pages`` docs (re-derived here, not committed) with
DEFAULT_STOPWORDS and MetaNames meta1-3.

Within-rank tie ORDER is storage-order-dependent in the reference
(unstable qsort over hash-table order), so the pin compares the SET of
(display_rank, docpath) pairs per query — rank VALUES (1-1000 scaled,
scheme 0 and 1) must match exactly.
"""

import collections
import json
import os

import pytest

from swish_e_spark.datagen.pages import doctype_of_url, generate_rows
from swish_e_spark.oracle.engine import OracleIndex
from swish_e_spark.query.swishrank import oracle_swish_query
from swish_e_spark.textproc.extractor import (
    STRUCTURE_LETTERS, extract,
)
from swish_e_spark.textproc.stopwords import DEFAULT_STOPWORDS
from swish_e_spark.textproc.tokenizer import TokenizerConfig, tokenize_doc

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refbin")
REF_TESTS = "/root/reference/tests"
META = frozenset({"meta1", "meta2", "meta3"})
PROP_MAP = {"swishtitle": "title", "swishdocpath": "url",
            "meta1": "prop_meta1"}  # corpus "dir" user property
ALLK = 1 << 20  # the battery ran with no -m cap: return everything


def _load_tokens(path):
    by_file = collections.defaultdict(list)
    with open(path, encoding="utf-8") as f:
        for line in f:
            fname, field, word, pos, struct = line.rstrip("\n").split("\t")
            by_file[fname].append((field, word, int(pos), int(struct, 16)))
    return by_file


def _gen_name_of_url():
    """url -> fixture filename, from the committed manifest (the
    generator wrote each doc as {i:06d}.{doctype-ext}, which differs
    from the url basename for txt/xml docs)."""
    out = {}
    with open(os.path.join(FIX, "manifest_gen.tsv")) as f:
        for line in f:
            name, url = line.rstrip("\n").split("\t")
            out[url] = name
    return out


def _load_battery(tag):
    spec = json.load(open(os.path.join(FIX, f"battery_{tag}.json")))
    expect = collections.defaultdict(set)
    with open(os.path.join(FIX, f"queries_{tag}.tsv")) as f:
        for line in f:
            qid, rank, path = line.rstrip("\n").split("\t")
            expect[qid].add((int(rank), path))
    return spec, expect


def _our_stream(doc, cfg):
    if doc.noindex:
        return []
    postings, _dl = tokenize_doc(doc, cfg)
    ours = []
    for (field, term), plist in postings.items():
        for pos, st in zip(plist.positions, plist.structures):
            ours.append((field, term, int(pos), int(st)))
    ours.sort(key=lambda t: (t[2], t[0], t[1]))
    return ours


def _spec_to_kwargs(spec):
    kw = {"k": ALLK, "scheme": int(spec.get("R", "0"))}
    if "t" in spec:
        mask = 0
        for ch in spec["t"]:
            mask |= STRUCTURE_LETTERS[ch]
        kw["structure_mask"] = mask
    if "L" in spec:
        prop, lo, hi = spec["L"]
        kw["limits"] = {PROP_MAP[prop]: (lo, hi)}
    return spec["w"], kw


@pytest.fixture(scope="module")
def gen_corpus():
    return list(generate_rows(300))


@pytest.fixture(scope="module")
def gen_oracle(gen_corpus):
    idx = OracleIndex(TokenizerConfig(stopwords=DEFAULT_STOPWORDS),
                      metanames=META)
    for i, row in enumerate(gen_corpus):
        idx.add(row["url"], row["html"],
                doctype=doctype_of_url(row["url"]))
    return idx.build()


@pytest.fixture(scope="module")
def ref_files():
    return sorted(n for n in os.listdir(REF_TESTS)
                  if n.endswith((".html", ".txt", ".xml")))


@pytest.fixture(scope="module")
def ref_oracle(ref_files):
    idx = OracleIndex(TokenizerConfig(stopwords=frozenset()),
                      index_comments=True, metanames=META)
    for name in ref_files:
        raw = open(os.path.join(REF_TESTS, name), "rb").read()
        idx.add(name, raw, doctype=name.rsplit(".", 1)[1])
    return idx.build()


class TestTokenStream:
    """Byte/position/structure identity of the indexed-word stream."""

    def test_gen_corpus(self, gen_corpus):
        fix = _load_tokens(os.path.join(FIX, "tokens_gen.tsv"))
        cfg = TokenizerConfig(stopwords=DEFAULT_STOPWORDS)
        mismatched = []
        for i, row in enumerate(gen_corpus):
            dt = doctype_of_url(row["url"])
            name = f"{i:06d}.{dt}"
            doc = extract(row["html"], doctype=dt, metanames=META)
            ours = _our_stream(doc, cfg)
            theirs = sorted(fix.get(name, []),
                            key=lambda t: (t[2], t[0], t[1]))
            if ours != theirs:
                mismatched.append(name)
        assert mismatched == []

    def test_ref_corpus(self, ref_files):
        fix = _load_tokens(os.path.join(FIX, "tokens_ref.tsv"))
        cfg = TokenizerConfig(stopwords=frozenset())
        for name in ref_files:
            raw = open(os.path.join(REF_TESTS, name), "rb").read()
            doc = extract(raw, doctype=name.rsplit(".", 1)[1],
                          index_comments=True, metanames=META)
            ours = _our_stream(doc, cfg)
            theirs = sorted(fix[name], key=lambda t: (t[2], t[0], t[1]))
            assert ours == theirs, name


class TestBatteryOracle:
    """Ranked battery vs the binary, through the pure-Python oracle."""

    def _run(self, oidx, tag, id_to_name, ignore_twc=True):
        from swish_e_spark.query.parser import QueryError

        spec, expect = _load_battery(tag)
        for qid, s in sorted(spec.items()):
            q, kw = _spec_to_kwargs(s)
            if kw["scheme"] == 1 and ignore_twc:
                # the binary refuses -R 1 on an IgnoreTotalWordCount=1
                # index ("must be 0 to use IDF ranking") — the fixture
                # has no rows for these qids and we must refuse too
                assert expect[qid] == set(), qid
                with pytest.raises(QueryError):
                    oracle_swish_query(oidx, q, scaled=True,
                                       ignore_total_word_count=True,
                                       **kw)
                continue
            got = oracle_swish_query(
                oidx, q, scaled=True,
                ignore_total_word_count=ignore_twc, **kw)
            ours = {(rank, id_to_name[d]) for d, rank in got}
            assert ours == expect[qid], qid

    def test_gen(self, gen_oracle):
        nm = _gen_name_of_url()
        id_to_name = {d: nm[p["url"]]
                      for d, p in gen_oracle.docs.items()}
        self._run(gen_oracle, "gen", id_to_name)

    def test_ref(self, ref_oracle):
        # test.config sets IgnoreTotalWordCountWhenRanking 0
        id_to_name = {d: p["url"] for d, p in ref_oracle.docs.items()}
        self._run(ref_oracle, "ref", id_to_name, ignore_twc=False)


class TestSyntaxErrorParity:
    """The binary refuses malformed queries with a syntax error
    (probed directly: err "missing end quote or unbalanced
    parenthesis"); our parser must refuse the same inputs."""

    @pytest.mark.parametrize("q", ["test)", '"three little',
                                   "test ( a or b", "(unbalanced"])
    def test_unbalanced(self, q):
        from swish_e_spark.query.parser import QueryError, parse_query

        with pytest.raises(QueryError):
            parse_query(q)


class TestBatteryEngine:
    """Same battery through the REAL Spark engine (index build via
    builder, distributed swish-rank execution)."""

    @pytest.fixture(scope="class")
    def gen_engine(self, spark, tmp_path_factory):
        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index, generate_pages_df,
        )
        from swish_e_spark.query.executor import SparkQueryEngine

        out = str(tmp_path_factory.mktemp("refbin_idx"))
        pages = generate_pages_df(spark, 300, partitions=6)
        cfg = IndexConfig(n_buckets=8,
                          metanames=("meta1", "meta2", "meta3"))
        build_index(spark, pages, out, cfg, n_shards=2)
        return SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_gen(self, gen_engine):
        from swish_e_spark.query.parser import QueryError
        from swish_e_spark.query.swishrank import spark_swish_search

        nm = _gen_name_of_url()
        docs = {r["doc_id"]: nm[r["url"]]
                for r in gen_engine.handle.docs().collect()}
        spec, expect = _load_battery("gen")
        for qid, s in sorted(spec.items()):
            q, kw = _spec_to_kwargs(s)
            if kw["scheme"] == 1:
                assert expect[qid] == set(), qid
                with pytest.raises(QueryError):
                    spark_swish_search(gen_engine, q, scaled=True, **kw)
                continue
            got = spark_swish_search(gen_engine, q, scaled=True, **kw)
            ours = {(rank, docs[d]) for d, rank in got}
            assert ours == expect[qid], qid


# ---- fuzzy-mode corpora: Stemming_en1 ("stem") / DoubleMetaphone
# ("dm") — the SAME 300 pages indexed by the binary with
# FuzzyIndexingMode set; pins index-side fuzzying, query-side
# fuzzying, stopword-before-fuzzy ordering, dual-code emission, and
# fuzzy-aware ranking end-to-end. Mode map per
# /root/reference/src/stemmer.c:116-141: Stemming_en1 is the Snowball
# porter variant (our "snowball_en1").

FUZZY_OF_TAG = {"stem": "snowball_en1", "dm": "doublemetaphone",
                "snd": "soundex"}


def _fuzzy_cfg(tag):
    return TokenizerConfig(stopwords=DEFAULT_STOPWORDS,
                           fuzzy=FUZZY_OF_TAG[tag])


@pytest.fixture(scope="module", params=["stem", "dm", "snd"])
def fuzzy_tag(request):
    if not os.path.exists(os.path.join(
            FIX, f"tokens_{request.param}.tsv")):
        pytest.skip(f"fixtures for {request.param} not generated")
    return request.param


@pytest.fixture(scope="module")
def fuzzy_oracle(fuzzy_tag, gen_corpus):
    idx = OracleIndex(_fuzzy_cfg(fuzzy_tag), metanames=META)
    for row in gen_corpus:
        idx.add(row["url"], row["html"],
                doctype=doctype_of_url(row["url"]))
    return fuzzy_tag, idx.build()


class TestFuzzyTokenStream:
    def test_stream_matches_binary(self, fuzzy_tag, gen_corpus):
        fix = _load_tokens(os.path.join(FIX,
                                        f"tokens_{fuzzy_tag}.tsv"))
        cfg = _fuzzy_cfg(fuzzy_tag)
        mismatched = []
        for i, row in enumerate(gen_corpus):
            dt = doctype_of_url(row["url"])
            name = f"{i:06d}.{dt}"
            doc = extract(row["html"], doctype=dt, metanames=META)
            ours = _our_stream(doc, cfg)
            theirs = sorted(fix.get(name, []),
                            key=lambda t: (t[2], t[0], t[1]))
            if ours != theirs:
                mismatched.append(name)
        assert mismatched == []


class TestFuzzyBatteryOracle:
    _run = TestBatteryOracle._run

    def test_fuzzy(self, fuzzy_oracle):
        tag, oidx = fuzzy_oracle
        nm = _gen_name_of_url()
        id_to_name = {d: nm[p["url"]] for d, p in oidx.docs.items()}
        self._run(oidx, tag, id_to_name)


class TestFuzzyBatteryEngine:
    """Fuzzy battery through the REAL Spark engine (fuzzy mode plumbed
    through IndexConfig into the distributed tokenize kernel)."""

    @pytest.fixture(scope="class", params=["stem", "dm", "snd"])
    def fuzzy_engine(self, request, spark, tmp_path_factory):
        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index, generate_pages_df,
        )
        from swish_e_spark.query.executor import SparkQueryEngine

        tag = request.param
        if not os.path.exists(os.path.join(FIX,
                                           f"tokens_{tag}.tsv")):
            pytest.skip(f"fixtures for {tag} not generated")
        out = str(tmp_path_factory.mktemp(f"refbin_{tag}_idx"))
        pages = generate_pages_df(spark, 300, partitions=6)
        cfg = IndexConfig(n_buckets=8, fuzzy=FUZZY_OF_TAG[tag],
                          metanames=("meta1", "meta2", "meta3"))
        build_index(spark, pages, out, cfg, n_shards=2)
        return tag, SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_fuzzy(self, fuzzy_engine):
        from swish_e_spark.query.parser import QueryError
        from swish_e_spark.query.swishrank import spark_swish_search

        tag, engine = fuzzy_engine
        nm = _gen_name_of_url()
        docs = {r["doc_id"]: nm[r["url"]]
                for r in engine.handle.docs().collect()}
        spec, expect = _load_battery(tag)
        for qid, s in sorted(spec.items()):
            q, kw = _spec_to_kwargs(s)
            if kw["scheme"] == 1:
                assert expect[qid] == set(), qid
                with pytest.raises(QueryError):
                    spark_swish_search(engine, q, scaled=True, **kw)
                continue
            got = spark_swish_search(engine, q, scaled=True, **kw)
            ours = {(rank, docs[d]) for d, rank in got}
            assert ours == expect[qid], qid


# ---- directive corpus ("dir"): the SAME 300 pages indexed by the
# binary with the round-4 directive surface active — MetaNameAlias,
# IgnoreMetaTags, BumpPositionCounterCharacters, ExtractPath/
# ExtractPathDefault (over the fixture FILENAMES, so docs here index
# under their file name, not their url), PropertyNames meta1 (-L/-s on
# the captured property), IgnoreTotalWordCountWhenRanking 0 (-R 1 on).

DIR_META_ALIASES = (("m1alias", "meta1"),)
DIR_IGNORE_TAGS = frozenset({"meta2"})
DIR_BUMP_CHARS = ".-"
DIR_EXTRACT_PATH = (("pathmeta", ("regex", "!^000([0-9]).*$!d$1!")),
                    ("rootm", ("replace", "neverzzz", "yyy")))
DIR_EXTRACT_DEFAULTS = (("rootm", "everydoc"),)


def _dir_props():
    from swish_e_spark.textproc.docprops import PropSpec

    return (PropSpec("meta1").to_tuple(),)


def _dir_cfg():
    return TokenizerConfig(stopwords=DEFAULT_STOPWORDS,
                           meta_aliases=DIR_META_ALIASES,
                           bump_pos_chars=DIR_BUMP_CHARS)


def _gen_names(gen_corpus):
    return [f"{i:06d}.{doctype_of_url(row['url'])}"
            for i, row in enumerate(gen_corpus)]


@pytest.fixture(scope="module")
def dir_oracle(gen_corpus):
    if not os.path.exists(os.path.join(FIX, "tokens_dir.tsv")):
        pytest.skip("fixtures for dir not generated")
    idx = OracleIndex(_dir_cfg(), metanames=META,
                      meta_aliases=dict(DIR_META_ALIASES),
                      ignore_meta_tags=DIR_IGNORE_TAGS,
                      extract_path=DIR_EXTRACT_PATH,
                      extract_path_defaults=DIR_EXTRACT_DEFAULTS,
                      properties=_dir_props())
    for name, row in zip(_gen_names(gen_corpus), gen_corpus):
        # url = the fixture FILE NAME (ExtractPath operates on it)
        idx.add(name, row["html"],
                doctype=doctype_of_url(row["url"]))
    return idx.build()


class TestDirectiveTokenStream:
    def test_stream_matches_binary(self, gen_corpus):
        if not os.path.exists(os.path.join(FIX, "tokens_dir.tsv")):
            pytest.skip("fixtures for dir not generated")
        from swish_e_spark.textproc.pathparts import (
            merge_path_postings,
        )

        fix = _load_tokens(os.path.join(FIX, "tokens_dir.tsv"))
        cfg = _dir_cfg()
        mismatched = []
        for name, row in zip(_gen_names(gen_corpus), gen_corpus):
            dt = name.rsplit(".", 1)[1]
            doc = extract(row["html"], doctype=dt, metanames=META,
                          meta_aliases=dict(DIR_META_ALIASES),
                          ignore_meta_tags=DIR_IGNORE_TAGS)
            if doc.noindex:
                ours = []
            else:
                postings, _dl = tokenize_doc(doc, cfg)
                merge_path_postings(postings, name,
                                    DIR_EXTRACT_PATH,
                                    DIR_EXTRACT_DEFAULTS, cfg)
                ours = sorted(
                    ((f, t, int(pos), int(st))
                     for (f, t), pl in postings.items()
                     for pos, st in zip(pl.positions, pl.structures)),
                    key=lambda t: (t[2], t[0], t[1]))
            theirs = sorted(fix.get(name, []),
                            key=lambda t: (t[2], t[0], t[1]))
            if ours != theirs:
                mismatched.append(name)
        assert mismatched == []


class TestDirectiveBatteryOracle:
    _run = TestBatteryOracle._run

    def test_dir(self, dir_oracle):
        # IgnoreTotalWordCountWhenRanking 0: R 0 normalizes by word
        # count and R 1 is allowed — like corpus "ref"
        id_to_name = {d: p["url"] for d, p in dir_oracle.docs.items()}
        self._run(dir_oracle, "dir", id_to_name, ignore_twc=False)


class TestDirectiveBatteryEngine:
    @pytest.fixture(scope="class")
    def dir_engine(self, spark, gen_corpus, tmp_path_factory):
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.index.builder import (
            IndexConfig, IndexHandle, build_index,
        )
        from swish_e_spark.query.executor import SparkQueryEngine

        if not os.path.exists(os.path.join(FIX, "tokens_dir.tsv")):
            pytest.skip("fixtures for dir not generated")
        rows = [(name, bytes(row["html"]))
                for name, row in zip(_gen_names(gen_corpus),
                                     gen_corpus)]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "blob"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.col("blob").alias("html"),
                    F.lit("").alias("text"), F.lit("en").alias("lang")))
        out = str(tmp_path_factory.mktemp("refbin_dir_idx"))
        cfg = IndexConfig(
            n_buckets=8, metanames=("meta1", "meta2", "meta3"),
            meta_aliases=DIR_META_ALIASES,
            ignore_meta_tags=tuple(DIR_IGNORE_TAGS),
            bump_pos_chars=DIR_BUMP_CHARS,
            extract_path=DIR_EXTRACT_PATH,
            extract_path_defaults=DIR_EXTRACT_DEFAULTS,
            properties=_dir_props(),
            ignore_total_word_count=False)
        build_index(spark, pages, out, cfg, n_shards=2)
        return SparkQueryEngine(spark, IndexHandle(spark, out))

    def test_dir(self, dir_engine):
        from swish_e_spark.query.swishrank import spark_swish_search

        docs = {r["doc_id"]: r["url"]
                for r in dir_engine.handle.docs()
                .select("doc_id", "url").collect()}
        spec, expect = _load_battery("dir")
        for qid, s in sorted(spec.items()):
            q, kw = _spec_to_kwargs(s)
            got = spark_swish_search(dir_engine, q, scaled=True,
                                     ignore_total_word_count=False,
                                     **kw)
            ours = {(rank, docs[d]) for d, rank in got}
            assert ours == expect[qid], qid
