"""Soundex fuzzy mode and IgnoreLimit auto-stopwords."""

import pandas as pd
import pytest

from swish_e_spark.datagen.pages import doctype_of_url
from swish_e_spark.index.builder import (
    IndexConfig, IndexHandle, build_index, generate_pages_df,
)
from swish_e_spark.index.maintenance import apply_ignore_limit
from swish_e_spark.oracle.engine import OracleIndex
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.textproc.soundex import soundex
from swish_e_spark.textproc.stopwords import DEFAULT_STOPWORDS
from swish_e_spark.textproc.tokenizer import TokenizerConfig, fuzzy_word


class TestSoundex:
    @pytest.mark.parametrize("word,code", [
        # codes confirmed by probing the COMPILED reference binary
        # (FuzzyIndexingMode Soundex, -T INDEXED_WORDS): its soundTable
        # maps H and W to 0 like vowels (soundex.c:93,108 — no h/w
        # transparency, so Ashcraft is a226, NOT the textbook A261),
        # words under 3 chars pass through unchanged (STEM_TOO_SMALL),
        # and non-letters are stripped before run collapsing
        ("Robert", "r163"), ("Rupert", "r163"), ("Ashcraft", "a226"),
        ("Ashcroft", "a226"), ("Tymczak", "t522"), ("Pfister", "p236"),
        ("Honeyman", "h555"), ("a", "a"), ("me", "me"),
        ("b1b", "b000"), ("ab1b", "a100"),
    ])
    def test_classic_examples(self, word, code):
        assert soundex(word) == code

    def test_fuzzy_word_api(self):
        cfg = TokenizerConfig(fuzzy="soundex")
        assert fuzzy_word("Robert", cfg) == fuzzy_word("rupert", cfg)
        cfg_p = TokenizerConfig(stem=True)
        assert fuzzy_word("running", cfg_p) == fuzzy_word("runs", cfg_p)

    def test_soundex_index_end_to_end(self, spark, tmp_path):
        rows = [("a0.txt", "robert likes spark"),
                ("a1.txt", "rupert hates hadoop"),
                ("a2.txt", "nothing relevant here")]
        from pyspark.sql import functions as F

        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))
        out = str(tmp_path / "sdx")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, fuzzy="soundex",
                                stopwords=()), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        # "robert" matches both robert and rupert docs (same code R163)
        hits = {d for d, _ in eng.search("robert", k=10)}
        assert hits == {0, 1}

        oracle = OracleIndex(TokenizerConfig(fuzzy="soundex",
                                             stopwords=frozenset()))
        for url, text in rows:
            oracle.add(url, text.encode(), doctype="txt")
        oracle.build()
        got = eng.search("rupert", k=10)
        want = oracle.query("rupert", k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, es), (_, osc) in zip(got, want):
            assert es == pytest.approx(osc, rel=1e-6)


class TestIgnoreLimit:
    def test_auto_stopwords_rank_identity(self, spark, tmp_path,
                                          corpus300):
        out = str(tmp_path / "il")
        pages = generate_pages_df(spark, 300, partitions=6)
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=8, buzzwords=("c++",)),
                    n_shards=1)
        stopped = apply_ignore_limit(spark, out, plimit=30, flimit=5)
        assert stopped  # the synthetic corpus has >30%-df terms
        assert "common0" in stopped

        # compaction drops the stopped postings AND renumbers
        # positions (adjustWordPositions parity): the index is then
        # identical to one built with the stopped words as index-time
        # stopwords — which is exactly the oracle built below
        from swish_e_spark.index.maintenance import compact_index

        compact_index(spark, out)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        oracle = OracleIndex(TokenizerConfig(
            buzzwords=frozenset({"c++"}),
            stopwords=DEFAULT_STOPWORDS | frozenset(stopped)))
        for r in corpus300:
            oracle.add(r["url"], r["html"],
                       doctype=doctype_of_url(r["url"]))
        oracle.build()
        for q in ["pigs AND wolf", '"three little pigs"',
                  "pigs OR sugar"]:
            got = eng.search(q, k=10)
            want = oracle.query(q, k=10)
            assert [d for d, _ in got] == [d for d, _ in want]
            for (_, es), (_, osc) in zip(got, want):
                assert es == pytest.approx(osc, rel=1e-6)

    def test_multi_field_docs_do_not_overcount(self, spark, tmp_path):
        """IgnoreLimit counts DISTINCT files (the reference's
        tfrequency), not field-fanned df sums: a word indexed under
        several XML metanames of the same doc is still one file. At
        the reference's 'off' default (plimit=101) nothing can ever
        be stopped — a field-summed count used to push multi-field
        words past 100% of files."""
        import datetime

        rows = []
        for i in range(20):
            xml = ("<?xml version='1.0'?><root><a><b>dupfield "
                   f"filler{i}</b></a></root>")
            rows.append((f"https://x.example/d/{i:05d}.xml",
                         datetime.datetime(2020, 1, 1), xml.encode(),
                         "", "en"))
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
        out = str(tmp_path / "mf")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4,
                                xml_nested_metanames=True),
                    n_shards=1)
        # every doc fans dupfield into multiple XML metanames
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        fanned = (eng.handle.terms()
                  .filter("term = 'dupfield'").count())
        assert fanned > 1  # the overcount hazard is real in this index
        assert apply_ignore_limit(spark, out, plimit=101,
                                  flimit=1) == []
        stopped = apply_ignore_limit(spark, out, plimit=90, flimit=1)
        assert "dupfield" in stopped

    def test_position_gap_renumbered_at_compaction(self, spark,
                                                    tmp_path):
        """IgnoreLimit position semantics (reference parity since the
        binary-verified tokenizer rework — index-time stopwords never
        consume positions):

        - TRANSITIONAL window (after apply_ignore_limit, before
          compaction): the index still carries the stopped word's
          position slot but queries drop it gaplessly, so phrases
          spanning the stopped word match NEITHER spelled with nor
          without it.
        - after compact_index: positions renumber (adjustWordPositions,
          /root/reference/src/index.c:1824-1924) and the adjacency
          phrase matches exactly as the reference would."""
        import pandas as pd
        from pyspark.sql import functions as F

        rows = [("a0.txt", "alpha filler beta")] + [
            (f"a{i}.txt", f"filler word{i}") for i in range(1, 6)]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))
        out = str(tmp_path / "ilgap")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, stopwords=()), n_shards=1)
        stopped = apply_ignore_limit(spark, out, plimit=30, flimit=5)
        assert stopped == ["filler"]
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        # transitional window: the gap is in the index but not in the
        # query — no phrase across the stopped word matches either way
        assert eng.search('"alpha filler beta"', k=5) == []
        assert eng.search('"alpha beta"', k=5) == []
        # compaction renumbers: adjacency matches (reference parity)
        from swish_e_spark.index.maintenance import compact_index

        compact_index(spark, out)
        eng2 = SparkQueryEngine(spark, IndexHandle(spark, out))
        assert [d for d, _ in eng2.search('"alpha beta"', k=5)] == [0]
        assert [d for d, _ in
                eng2.search('"alpha filler beta"', k=5)] == [0]

    def test_stopped_word_query_raises(self, spark, tmp_path):
        from swish_e_spark.query.parser import WordsTooCommon

        out = str(tmp_path / "il2")
        pages = generate_pages_df(spark, 200, partitions=4)
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=8), n_shards=1)
        stopped = apply_ignore_limit(spark, out, plimit=30, flimit=5)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        with pytest.raises(WordsTooCommon):
            eng.search(stopped[0], k=5)


class TestMetaphone:
    @pytest.mark.parametrize("a,b", [
        ("Thompson", "Thomson"), ("phone", "fone"),
        ("night", "knight")])
    def test_collisions(self, a, b):
        from swish_e_spark.textproc.metaphone import metaphone

        assert metaphone(a) == metaphone(b)

    def test_distinct_words_differ(self):
        from swish_e_spark.textproc.metaphone import metaphone

        assert metaphone("school") != metaphone("ghost")
        assert metaphone("judge") == "JJ"

    def test_metaphone_index_end_to_end(self, spark, tmp_path):
        # reference Metaphone mode = DoubleMetaphone PRIMARY code
        # (/root/reference/src/stemmer.c:121,389-392): night and
        # knight share primary NT
        import pandas as pd
        from pyspark.sql import functions as F

        rows = [("a0.txt", "night falls quickly"),
                ("a1.txt", "knight rides slowly"),
                ("a2.txt", "unrelated words")]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))
        out = str(tmp_path / "mp")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, fuzzy="metaphone",
                                stopwords=()), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        hits = {d for d, _ in eng.search("night", k=10)}
        assert hits == {0, 1}


class TestDoubleMetaphone:
    def test_fixture_parity(self):
        """Byte parity with the reference encoder over the committed
        oracle-generated fixture (tests/fixtures/dmetaphone.tsv)."""
        import os

        from swish_e_spark.textproc.dmetaphone import double_metaphone

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "dmetaphone.tsv")
        n = 0
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                word, pri, sec = (line.rstrip("\n").split("\t")
                                  + ["", ""])[:3]
                assert double_metaphone(word) == (pri, sec), word
                n += 1
        assert n > 3000

    def test_word_list_api(self):
        from swish_e_spark.textproc.tokenizer import fuzzy_word_list

        cfg = TokenizerConfig(fuzzy="doublemetaphone")
        # smith: primary SM0, secondary XMT -> two terms
        # (UPPERCASE: stored exactly as the binary indexes them)
        assert fuzzy_word_list("smith", cfg) == ["SM0", "XMT"]
        # thomas: primary == secondary -> one term
        assert fuzzy_word_list("thomas", cfg) == ["TMS"]

    def test_dual_emission_end_to_end(self, spark, tmp_path):
        """smith's secondary code equals schmidt's primary, so with
        DoubleMetaphone a query for smith matches a schmidt doc via
        the (primary OR secondary) expansion
        (/root/reference/src/swish_words.c:342-353) and dual
        emission (/root/reference/src/index.c:2728-2747)."""
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.oracle.engine import OracleIndex

        rows = [("a0.txt", "smith forges iron"),
                ("a1.txt", "schmidt brews beer"),
                ("a2.txt", "unrelated words")]
        pages = (spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "text"]))
            .select("url",
                    F.lit("2024-01-01").cast("timestamp")
                    .alias("warc_ts"),
                    F.encode("text", "utf-8").alias("html"),
                    "text", F.lit("en").alias("lang")))
        out = str(tmp_path / "dmp")
        build_index(spark, pages, out,
                    IndexConfig(n_buckets=4, fuzzy="doublemetaphone",
                                stopwords=()), n_shards=1)
        eng = SparkQueryEngine(spark, IndexHandle(spark, out))
        hits = {d for d, _ in eng.search("smith", k=10)}
        assert hits == {0, 1}
        # single-mode metaphone would NOT match schmidt
        oracle = OracleIndex(TokenizerConfig(fuzzy="doublemetaphone",
                                             stopwords=frozenset()))
        for url, text in rows:
            oracle.add(url, text.encode(), doctype="txt")
        oracle.build()
        got = eng.search("smith", k=10)
        want = oracle.query("smith", k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, es), (_, osc) in zip(got, want):
            assert es == pytest.approx(osc, rel=1e-6)
