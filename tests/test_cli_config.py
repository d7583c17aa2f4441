"""Config-file front-end + filesystem-walk source + CLI (SURVEY.md
§2.1/§2.8): swish.conf directive parsing (parse_conffile.c), the -S fs
walk with IndexOnly/FileRules/FileMatch/ReplaceRules (fs.c:139-500),
and the reference flag surface end-to-end (swish.c usage)."""

import io
import os

import pytest

from swish_e_spark.config import (
    ConfigError, SwishConfig, doctype_rules_fn, parse_config,
    parse_config_file, replace_url,
)
from swish_e_spark.index.builder import IndexConfig, IndexHandle
from swish_e_spark.query.executor import SparkQueryEngine


# --------------------------------------------------------------------
# config parsing (pure python)
# --------------------------------------------------------------------

class TestConfigParse:
    def test_core_directives(self):
        c = parse_config("""
# a comment line
IndexFile ./idx
IndexDir docs more_docs
IndexOnly .html .htm
FuzzyIndexingMode Stemming_en1
IgnoreWords a the of
MetaNames author subject
MetaNamesRank 5 author
MinWordLimit 2
MaxWordLimit 20
IndexComments yes
""")
        assert c.index_file.endswith("idx")
        assert c.index_dirs == ["docs", "more_docs"]
        assert c.index_only == [".html", ".htm"]
        kw = c.kwargs
        assert kw["fuzzy"] == "snowball_en1"
        assert kw["stopwords"] == ("a", "the", "of")
        assert kw["metanames"] == ("author", "subject")
        assert kw["rank_biases"] == (("author", 5),)
        assert kw["min_word_len"] == 2 and kw["max_word_len"] == 20
        assert kw["index_comments"] is True
        cfg = c.to_index_config()
        assert isinstance(cfg, IndexConfig) and cfg.fuzzy == \
            "snowball_en1"

    def test_directives_case_insensitive(self):
        c = parse_config("fuzzyindexingmode Soundex\nINDEXDIR x\n")
        assert c.kwargs["fuzzy"] == "soundex"
        assert c.index_dirs == ["x"]

    def test_fuzzy_aliases_and_languages(self):
        # Stem/Stemming/Stemming_en are deprecated aliases of
        # Stemming_en1 (stemmer.c:280-284); each Snowball language maps
        for alias in ("Stem", "Stemming", "Stemming_en"):
            assert parse_config(
                f"FuzzyIndexingMode {alias}").kwargs["fuzzy"] == \
                "snowball_en1"
        assert parse_config(
            "FuzzyIndexingMode Stemming_fr").kwargs["fuzzy"] == \
            "snowball_fr"
        with pytest.raises(ConfigError):
            parse_config("FuzzyIndexingMode Klingon")

    def test_usestemming_loses_to_explicit_mode(self):
        c = parse_config("FuzzyIndexingMode Metaphone\n"
                         "UseStemming yes\n")
        assert c.kwargs["fuzzy"] == "metaphone"
        c2 = parse_config("UseStemming yes\n")
        assert c2.kwargs["fuzzy"] == "snowball_en1"

    def test_file_rules_modes(self):
        # is anchors with * as glob; contains searches; regex verbatim
        # (fs.c add_regex_patterns semantics)
        c = parse_config('FileRules filename is Draft*\n'
                         'FileRules pathname contains /tmp/\n'
                         'FileRules dirname regex ^/private\n'
                         'FileMatch filename contains keepme\n')
        assert ("filename", "^Draft.*$") in c.file_rules
        assert ("pathname", "/tmp/") in c.file_rules
        assert ("dirname", "^/private") in c.file_rules
        assert ("filename", "keepme") in c.file_matches
        with pytest.raises(ConfigError):
            parse_config("FileRules filename matches x")
        with pytest.raises(ConfigError):
            parse_config("FileRules bogus is x")

    def test_quoted_values_and_title_rule(self):
        c = parse_config(
            'FileRules title contains "Do Not Index"\n')
        assert c.file_rules == [("title", "Do Not Index")]

    def test_replace_rules(self):
        c = parse_config("ReplaceRules replace /docs/ /web/\n"
                         "ReplaceRules remove .orig\n"
                         "ReplaceRules prepend http://h\n"
                         "ReplaceRules append #frag\n")
        url = replace_url("/docs/a.orig.html", c.replace_rules)
        assert url == "http://h/web/a.html#frag"

    def test_replace_rules_regex_backrefs(self):
        c = parse_config(
            "ReplaceRules regex /(\\w+)\\.html/$1.htm/g\n")
        assert replace_url("a.html b.html",
                           c.replace_rules) == "a.htm b.htm"

    def test_index_contents_and_default(self):
        c = parse_config("IndexContents TXT* .txt .text\n"
                         "DefaultContents HTML*\n")
        resolve = doctype_rules_fn(c)
        assert resolve("x.txt") == "txt"
        assert resolve("y.TEXT") == "txt"
        assert resolve("z.unknown") == "html"
        with pytest.raises(ConfigError):
            parse_config("IndexContents PDF .pdf")

    def test_word_list_file_include(self, tmp_path):
        wf = tmp_path / "stop.txt"
        wf.write_text("# comment\nalpha beta\ngamma\n")
        c = parse_config(f"IgnoreWords File: {wf.name}\n",
                         base_dir=str(tmp_path))
        assert c.kwargs["stopwords"] == ("alpha", "beta", "gamma")

    def test_include_config_file(self, tmp_path):
        (tmp_path / "inner.conf").write_text("MinWordLimit 4\n")
        (tmp_path / "outer.conf").write_text(
            "IncludeConfigFile inner.conf\nMaxWordLimit 9\n")
        c = parse_config_file(str(tmp_path / "outer.conf"))
        assert c.kwargs["min_word_len"] == 4
        assert c.kwargs["max_word_len"] == 9

    def test_translate_characters(self):
        c = parse_config("TranslateCharacters àé ae\n")
        assert c.kwargs["translate_from"] == "àé"
        assert c.kwargs["translate_to"] == "ae"
        assert parse_config("TranslateCharacters :ascii7:\n") \
            .kwargs["translate_from"] == ":ascii7:"
        with pytest.raises(ConfigError):
            parse_config("TranslateCharacters abc x\n")

    def test_unknown_and_ignored_recorded(self):
        c = parse_config("BogusThing 1\nIndexReport 3\n")
        assert c.unknown == [("BogusThing", "1")]
        assert ("IndexReport", "3") in c.ignored

    def test_ignore_limit(self):
        assert parse_config("IgnoreLimit 50 100\n").ignore_limit == \
            (50.0, 100)

    def test_file_filter_maps_to_registry_rules(self):
        c = parse_config("FileFilter .gz gunzip\n")
        assert c.kwargs["file_filters"] == ((".gz", "gunzip"),)
        c2 = parse_config("FileFilterMatch gunzip opts \\.gz$\n")
        assert c2.kwargs["file_filters"] == ((r"re:\.gz$", "gunzip"),)


# --------------------------------------------------------------------
# filesystem walk source
# --------------------------------------------------------------------

@pytest.fixture(scope="module")
def doc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("docs")
    (root / "sub").mkdir()
    (root / "skipdir").mkdir()
    (root / "a.html").write_bytes(
        b"<html><head><title>Alpha</title></head>"
        b"<body>wolf canyon</body></html>")
    (root / "b.html").write_bytes(
        b"<html><head><title>Beta</title></head>"
        b"<body>river wolf</body></html>")
    (root / "notes.txt").write_bytes(b"plain zebra text")
    (root / "temp_c.html").write_bytes(b"<html>junk</html>")
    (root / "sub" / "d.html").write_bytes(
        b"<html><head><title>Draft page</title></head>"
        b"<body>hidden wolf</body></html>")
    (root / "skipdir" / "nodoc.marker").write_bytes(b"")
    (root / "skipdir" / "e.html").write_bytes(
        b"<html><body>should be pruned</body></html>")
    (root / "f.bak").write_bytes(b"backup junk")
    return str(root)


class TestFsWalk:
    def _urls(self, df):
        return sorted(r["url"].rsplit("/", 1)[-1]
                      for r in df.select("url").collect())

    def test_bare_walk_lists_everything(self, spark, doc_tree):
        from swish_e_spark.sources.fswalk import fs_pages_df

        names = self._urls(fs_pages_df(spark, doc_tree))
        assert "a.html" in names and "notes.txt" in names \
            and "f.bak" in names

    def test_index_only_and_filerules(self, spark, doc_tree):
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config("IndexOnly .html\n"
                            "FileRules filename contains ^temp_\n")
        names = self._urls(fs_pages_df(spark, doc_tree, conf))
        assert "notes.txt" not in names and "f.bak" not in names
        assert "temp_c.html" not in names
        assert {"a.html", "b.html", "d.html"} <= set(names)

    def test_filematch_overrides_suffix(self, spark, doc_tree):
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config("IndexOnly .html\n"
                            "FileMatch filename contains notes\n")
        names = self._urls(fs_pages_df(spark, doc_tree, conf))
        assert "notes.txt" in names

    def test_dircontains_prunes_subtree(self, spark, doc_tree):
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config(
            "IndexOnly .html\n"
            "FileRules dircontains is nodoc.marker\n")
        names = self._urls(fs_pages_df(spark, doc_tree, conf))
        assert "e.html" not in names

    def test_replace_rules_rewrite_urls(self, spark, doc_tree):
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config("IndexOnly .html\n"
                            f"ReplaceRules replace {doc_tree} "
                            "http://example.com\n")
        urls = [r["url"] for r in fs_pages_df(spark, doc_tree, conf)
                .select("url").collect()]
        assert urls and all(u.startswith("http://example.com/")
                            for u in urls)

    def test_title_rule_rejects_after_parse(self, spark, doc_tree,
                                            tmp_path):
        from swish_e_spark.index.builder import build_index
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config("IndexOnly .html\n"
                            "FileRules title contains ^Draft\n")
        cfg = conf.to_index_config(
            title_reject_rules=tuple(
                rx for kind, rx in conf.file_rules
                if kind == "title"),
            n_buckets=4)
        idx = str(tmp_path / "idx_title")
        build_index(spark, fs_pages_df(spark, doc_tree, conf), idx,
                    cfg=cfg)
        h = IndexHandle(spark, idx)
        titles = {r["title"] for r in
                  h.docs().select("title").collect()}
        assert "Alpha" in titles and "Draft page" not in titles

    def test_doctype_column_honored(self, spark, doc_tree, tmp_path):
        # IndexContents TXT .html forces txt parsing of html files:
        # tags then index as literal-ish text tokens
        from swish_e_spark.index.builder import build_index
        from swish_e_spark.sources.fswalk import fs_pages_df

        conf = parse_config("IndexOnly .html\n"
                            "IndexContents TXT* .html\n")
        idx = str(tmp_path / "idx_doctype")
        build_index(spark, fs_pages_df(spark, doc_tree, conf), idx,
                    cfg=IndexConfig(n_buckets=4))
        eng = SparkQueryEngine(spark, IndexHandle(spark, idx))
        # txt parsing sees raw markup: "html" occurs as a word
        assert eng.search("html", k=5)


# --------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------

@pytest.fixture(scope="module")
def cli_index(spark, doc_tree, tmp_path_factory):
    from swish_e_spark.cli import main

    root = tmp_path_factory.mktemp("cli")
    conf = root / "swish.conf"
    conf.write_text("IndexOnly .html\n"
                    "FileRules filename contains ^temp_\n"
                    "IgnoreWords the a of\n"
                    # stored word counts: -R 1 allowed (the reference
                    # default 1 makes -R 1 refuse, pinned below)
                    "IgnoreTotalWordCountWhenRanking 0\n")
    idx = str(root / "idx")
    out = io.StringIO()
    rc = main(["-c", str(conf), "-i", doc_tree, "-f", idx, "-v", "1"],
              spark=spark, out=out)
    assert rc == 0
    assert "Indexing done" in out.getvalue()
    return idx


class TestCli:
    def _run(self, spark, argv):
        from swish_e_spark.cli import main

        out = io.StringIO()
        rc = main(argv, spark=spark, out=out)
        return rc, out.getvalue()

    def test_version(self, spark):
        rc, out = self._run(spark, ["-V"])
        assert rc == 0 and "swish-e-spark" in out

    def test_search_default_line(self, spark, cli_index):
        rc, out = self._run(spark, ["-w", "wolf", "-f", cli_index])
        assert rc == 0
        lines = out.splitlines()
        assert lines[0].startswith("# swish-e-spark")
        assert any(l.startswith("# Number of hits:") for l in lines)
        body = [l for l in lines
                if not l.startswith("#") and l != "."]
        assert len(body) == 3  # a.html b.html d.html
        # default -x: rank path "title" size
        assert '"Alpha"' in out and '"Beta"' in out
        assert lines[-1] == "."

    def test_search_no_results(self, spark, cli_index):
        rc, out = self._run(spark,
                            ["-w", "qqqnosuchword", "-f", cli_index])
        assert rc == 0 and "err: no results" in out

    def test_search_custom_format_and_scheme1(self, spark, cli_index):
        rc, out = self._run(spark, ["-w", "wolf", "-f", cli_index,
                                    "-x", "%r|%p\\n", "-R", "1",
                                    "-H", "0"])
        assert rc == 0
        rows = [l for l in out.splitlines() if l and l != "."]
        assert all("|" in l for l in rows)
        ranks = [int(l.split("|")[0]) for l in rows]
        assert ranks == sorted(ranks, reverse=True)
        assert all(1 <= r <= 1000 for r in ranks)

    def test_r1_refused_on_ignore_twc_index(self, spark, doc_tree,
                                            tmp_path):
        # an index built WITHOUT IgnoreTotalWordCountWhenRanking 0
        # (reference default 1) refuses -R 1 like the binary
        # ("must be 0 to use IDF ranking", rank.c getrankIDF)
        from swish_e_spark.cli import main

        idx = str(tmp_path / "twc_idx")
        rc = main(["-i", doc_tree, "-f", idx], spark=spark,
                  out=io.StringIO())
        assert rc == 0
        with pytest.raises(SystemExit):
            main(["-w", "wolf", "-f", idx, "-R", "1"],
                 spark=spark, out=io.StringIO())
        # -R 0 still ranks (without the word-count normalization)
        out = io.StringIO()
        rc = main(["-w", "wolf", "-f", idx, "-R", "0", "-H", "0"],
                  spark=spark, out=out)
        assert rc == 0
        assert any(l and l != "." for l in out.getvalue().splitlines())

    def test_search_bm25_sort_and_begin(self, spark, cli_index):
        rc, out = self._run(spark, [
            "-w", "wolf", "-f", cli_index, "-R", "2",
            "-s", "swishdocpath", "asc", "-H", "0",
            "-x", "<swishdocpath>\\n"])
        paths = [l for l in out.splitlines() if l and l != "."]
        assert paths == sorted(paths)
        rc2, out2 = self._run(spark, [
            "-w", "wolf", "-f", cli_index, "-R", "2", "-b", "2",
            "-s", "swishdocpath", "asc", "-H", "0",
            "-x", "<swishdocpath>\\n"])
        paths2 = [l for l in out2.splitlines() if l and l != "."]
        assert paths2 == paths[1:]

    def test_structure_mask_title_only(self, spark, cli_index):
        # 'wolf' never appears in a title ⇒ -t t yields nothing
        rc, out = self._run(spark, ["-w", "wolf", "-f", cli_index,
                                    "-t", "t", "-H", "0"])
        assert "err: no results" in out
        rc2, out2 = self._run(spark, ["-w", "alpha", "-f", cli_index,
                                      "-t", "t", "-H", "0"])
        assert "err: no results" not in out2

    def test_limit_by_property(self, spark, cli_index):
        rc, out = self._run(spark, [
            "-w", "wolf", "-f", cli_index, "-H", "0",
            "-L", "title", "A", "Azzz",
            "-x", "<swishtitle>\\n"])
        titles = [l for l in out.splitlines() if l and l != "."]
        assert titles == ["Alpha"]

    def test_raw_rank_flag(self, spark, cli_index):
        # -a returns UNSCALED swishrank values (SwishReturnRawRank,
        # swish.c:1278, docprop.c:371-373) instead of 1-1000 display
        from swish_e_spark.query.swishrank import spark_swish_search

        rc, out = self._run(spark, ["-w", "wolf", "-f", cli_index,
                                    "-R", "1", "-a", "-x", "%r\\n",
                                    "-H", "0"])
        assert rc == 0
        got = [int(l) for l in out.splitlines() if l and l != "."]
        eng = SparkQueryEngine(spark, IndexHandle(spark, cli_index))
        want = [r for _, r in spark_swish_search(
            eng, "wolf", k=10, scheme=1, scaled=False,
            ignore_total_word_count=False)]
        assert got == want
        # without -a: display scaling pins the top hit at 1000
        rc2, out2 = self._run(spark, ["-w", "wolf", "-f", cli_index,
                                      "-R", "1", "-x", "%r\\n",
                                      "-H", "0"])
        scaled = [int(l) for l in out2.splitlines() if l and l != "."]
        assert scaled and scaled[0] == 1000 and got != scaled

    def test_phrase_delim_flag(self, spark, cli_index):
        # -P ' : the quote becomes the phrase delimiter (swish.c:666)
        rc, out = self._run(spark, [
            "-w", "'river wolf'", "-P", "'", "-H", "0",
            "-x", "<swishtitle>\\n", "-f", cli_index])
        assert rc == 0
        titles = [l for l in out.splitlines() if l and l != "."]
        assert titles == ["Beta"]
        # '"' is now an ordinary character the tokenizer strips — a
        # quoted-looking query degrades to the two bare words
        rc2, out2 = self._run(spark, [
            "-w", '"river wolf"', "-P", "'", "-H", "0",
            "-x", "<swishtitle>\\n", "-f", cli_index])
        assert rc2 == 0
        titles2 = [l for l in out2.splitlines() if l and l != "."]
        assert titles2 == ["Beta"]
        # empty -P value is a usage error, not an IndexError
        with pytest.raises(SystemExit):
            self._run(spark, ["-w", "wolf", "-P", "", "-f",
                              cli_index])

    def test_error_file_routing(self, spark, cli_index, tmp_path):
        # -E file appends error output there (set_error_handle,
        # swish.c:800-820)
        efile = str(tmp_path / "err.log")
        with pytest.raises(SystemExit):
            self._run(spark, ["-E", efile, "-w", "wolf", "-f",
                              str(tmp_path / "nosuchindex")])
        with open(efile) as f:
            assert "could not open index file" in f.read()

    def test_multi_index_user_prop_limit_validates(
            self, spark, doc_tree, cli_index, tmp_path):
        # -L on a user property defined in only ONE of the -f indexes
        # must be a clean CLI error (the reference resolves properties
        # per index), not a raw AnalysisException from a missing column
        from swish_e_spark.cli import main

        conf = tmp_path / "p.conf"
        conf.write_text("IndexOnly .html\nPropertyNames cat\n")
        idx2 = str(tmp_path / "idx2")
        rc = main(["-c", str(conf), "-i", doc_tree, "-f", idx2],
                  spark=spark, out=io.StringIO())
        assert rc == 0
        with pytest.raises(SystemExit) as ei:
            main(["-w", "wolf", "-f", idx2, cli_index, "-R", "2",
                  "-L", "cat", "a", "z"], spark=spark,
                 out=io.StringIO())
        assert ei.value.code == 1

    def test_keyword_dump(self, spark, cli_index):
        rc, out = self._run(spark, ["-k", "w", "-f", cli_index])
        words = out.split()
        assert "wolf" in words
        assert all(w.startswith("w") for w in words)
        rc2, out2 = self._run(spark, ["-k", "*", "-f", cli_index])
        assert "wolf" in out2.split() and "river" in out2.split()

    def test_merge(self, spark, cli_index, doc_tree,
                   tmp_path_factory):
        from swish_e_spark.cli import main

        root = tmp_path_factory.mktemp("cli_merge")
        # same config as cli_index: merge (rightly) refuses indexes
        # whose semantic IndexConfig differs
        conf = root / "swish.conf"
        conf.write_text("IndexOnly .html\n"
                        "FileRules filename contains ^temp_\n"
                        "IgnoreWords the a of\n"
                        "IgnoreTotalWordCountWhenRanking 0\n")
        idx2 = str(root / "idx2")
        out = io.StringIO()
        assert main(["-c", str(conf), "-i", doc_tree, "-f", idx2,
                     "-S", "fs"], spark=spark, out=out) == 0
        merged = str(root / "merged")
        rc, out2 = self._run(spark,
                             ["-M", cli_index, idx2, merged])
        assert rc == 0 and os.path.isdir(merged)
        rc3, out3 = self._run(spark, ["-w", "wolf", "-f", merged,
                                      "-H", "0"])
        # newest-wins by url: same doc set, not doubled
        body = [l for l in out3.splitlines()
                if l and not l.startswith("#") and l != "."]
        assert len(body) == 3

    def test_snapshot_verbs(self, spark, doc_tree, tmp_path_factory):
        """--snapshots / --as-of / --expire: the lakehouse surface.
        After a -r removal, the current search loses the doc but
        --as-of the build snapshot still sees it; --expire 1 GCs the
        old version and --as-of then fails loudly (exit 2)."""
        from swish_e_spark.cli import main
        from swish_e_spark.index.builder import IndexHandle
        from swish_e_spark.index.maintenance import remove_documents

        root = tmp_path_factory.mktemp("cli_snap")
        conf = root / "swish.conf"
        conf.write_text("IndexOnly .html\n"
                        "FileRules filename contains ^temp_\n")
        idx = str(root / "idx")
        out = io.StringIO()
        assert main(["-c", str(conf), "-i", doc_tree, "-f", idx],
                    spark=spark, out=out) == 0

        rc, out1 = self._run(spark, ["--snapshots", "-f", idx])
        assert rc == 0 and out1.startswith("* v1")

        victim = next(
            r["url"] for r in IndexHandle(spark, idx).docs()
            .select("url").collect() if r["url"].endswith("a.html"))
        remove_documents(spark, idx, [victim])

        rc, cur = self._run(spark, ["-w", "wolf", "-f", idx, "-H", "0"])
        rc2, old = self._run(spark, ["-w", "wolf", "-f", idx,
                                     "-H", "0", "--as-of", "1"])
        body = [l for l in cur.splitlines()
                if l and not l.startswith("#") and l != "."]
        body_old = [l for l in old.splitlines()
                    if l and not l.startswith("#") and l != "."]
        assert rc == rc2 == 0
        assert len(body) == 2 and len(body_old) == 3

        rc, listing = self._run(spark, ["--snapshots", "-f", idx])
        assert listing.count("\n") == 2 and "* v2" in listing

        rc, msg = self._run(spark, ["--expire", "1", "-f", idx])
        assert rc == 0 and "Expired 1 snapshot(s)" in msg
        with pytest.raises(SystemExit) as ei:
            main(["-w", "wolf", "-f", idx, "--as-of", "1"],
                 spark=spark, out=io.StringIO())
        assert ei.value.code == 2

    def test_bad_flag_and_missing_index(self, spark):
        from swish_e_spark.cli import main

        with pytest.raises(SystemExit):
            main(["-Z"], spark=spark)
        with pytest.raises(SystemExit) as ei:
            main(["-w", "x", "-f", "/nonexistent/idx"], spark=spark)
        assert ei.value.code == 2

    def test_stopword_header(self, spark, cli_index):
        rc, out = self._run(spark,
                            ["-w", "the wolf", "-f", cli_index])
        assert "# Removed stopwords: the" in out
