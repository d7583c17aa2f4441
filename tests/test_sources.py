"""Document sources (SURVEY.md §2.1): FileFilter/FileFilterMatch
document filters, the -S prog header/body protocol, and the spider's
distributed crawl — each pinned to the reference's observable
semantics (filter.c, extprog.c, http.c/spider.pl) and exercised
end-to-end through build_index + SparkQueryEngine."""

import gzip
import os

import pandas as pd
import pytest

from swish_e_spark.index.builder import (
    IndexConfig, IndexHandle, build_index,
)
from swish_e_spark.query.executor import SparkQueryEngine
from swish_e_spark.sources.filters import (
    apply_filters, compile_rules, get_filter, register_filter,
)
from swish_e_spark.sources.progfile import (
    ProgProtocolError, apply_prog_stream, parse_prog_stream,
    prog_pages_df,
)
from swish_e_spark.sources.spider import (
    DictFetcher, FileFetcher, SpiderConfig, crawl, crawl_pages,
    parse_robots,
)

CFG = dict(n_buckets=4, stopwords=())


def _pages_df(spark, rows, ts="2024-01-01", extra_cols=()):
    """rows: (url, html_bytes[, extras...]) → builder-shaped frame."""
    from pyspark.sql import functions as F

    cols = ["url", "html", *extra_cols]
    pdf = pd.DataFrame(rows, columns=cols)
    df = spark.createDataFrame(pdf)
    return df.select(
        "url", F.lit(ts).cast("timestamp").alias("warc_ts"),
        F.col("html").cast("binary").alias("html"),
        F.lit("").alias("text"), F.lit("en").alias("lang"),
        *extra_cols)


def _urls_scores(spark, idx, q, **kw):
    engine = SparkQueryEngine(spark, IndexHandle(spark, idx))
    got = engine.search(q, k=20, **kw)
    ddf = engine.handle.docs()
    urls = {r["doc_id"]: r["url"]
            for r in ddf.select("doc_id", "url").collect()}
    return [(urls[d], s) for d, s in got]


# --------------------------------------------------------------------
# prog protocol (pure python)
# --------------------------------------------------------------------

class TestProgStream:
    def test_basic_two_docs(self):
        data = (b"Path-Name: /a.html\n"
                b"Content-Length: 11\n"
                b"Last-Mtime: 1700000000\n"
                b"\n"
                b"hello world"
                b"Path-Name: /b.txt\n"
                b"Content-Length: 3\n"
                b"\n"
                b"abc")
        docs = list(parse_prog_stream(data))
        assert [d["url"] for d in docs] == ["/a.html", "/b.txt"]
        assert docs[0]["body"] == b"hello world"
        assert docs[0]["mtime"] == 1700000000
        assert docs[1]["body"] == b"abc"
        assert docs[1]["mtime"] == 0  # header state resets per doc

    def test_header_prefix_match_and_strtol_junk(self):
        # strncasecmp prefix matching + strtol ignoring trailing junk
        # (extprog.c:330-360)
        data = (b"path-name-extra: /x\n"
                b"CONTENT-LENGTHS: 5 bytes\n"
                b"\n"
                b"12345")
        (d,) = parse_prog_stream(data)
        assert d["url"] == "/x"
        assert d["body"] == b"12345"

    def test_document_type_mapping(self):
        for raw, want in ((b"TXT", "txt"), (b"HTML*", "html"),
                          (b"WML", "xml"), (b"xml2", "xml")):
            data = (b"Path-Name: /d\nContent-Length: 1\n"
                    b"Document-Type: " + raw + b"\n\nx")
            (d,) = parse_prog_stream(data)
            assert d["doctype"] == want, raw

    def test_no_contents_and_update_mode(self):
        data = (b"Path-Name: /d\nContent-Length: 1\n"
                b"No-Contents:\nUpdate-Mode: Remove\n\nx")
        (d,) = parse_prog_stream(data)
        assert d["no_contents"] is True
        assert d["update_mode"] == "remove"

    @pytest.mark.parametrize("data", [
        b"Content-Length: 1\n\nx",            # missing Path-Name
        b"Path-Name: /d\n\nx",                # missing Content-Length
        b"Path-Name: /d\nContent-Length: 9\n\nxx",   # truncated body
        b"Path-Name: /d\nContent-Length: 1\n"
        b"Document-Type: PDF\n\nx",           # bad doc type
        b"Path-Name: /d\nContent-Length: 1\n"
        b"Update-Mode: Zap\n\nx",             # bad update mode
        b"Path-Name: /d\nContent-Length: 1\n",  # EOF inside headers
    ])
    def test_protocol_errors(self, data):
        with pytest.raises(ProgProtocolError):
            list(parse_prog_stream(data))


# --------------------------------------------------------------------
# filters (pure python)
# --------------------------------------------------------------------

class TestFilters:
    def test_suffix_strip_and_first_match_wins(self):
        rules = compile_rules(
            ((".gz", "gzip"), (".gz", "identity")))  # 2nd never fires
        blob, url = apply_filters(
            "http://h/report.HTML.GZ", gzip.compress(b"<p>hi</p>"),
            rules)
        assert blob == b"<p>hi</p>"
        assert url == "http://h/report.HTML"  # suffix stripped

    def test_regex_rule_keeps_url(self):
        rules = compile_rules((("re:/zdir/", "zlib"),))
        import zlib as z

        blob, url = apply_filters(
            "http://h/zdir/a.html", z.compress(b"data"), rules)
        assert blob == b"data"
        assert url == "http://h/zdir/a.html"

    def test_no_match_passthrough(self):
        rules = compile_rules(((".gz", "gzip"),))
        blob, url = apply_filters("http://h/a.html", b"raw", rules)
        assert (blob, url) == (b"raw", "http://h/a.html")

    def test_custom_and_import_path_and_typo(self):
        register_filter("upper", lambda b: b.upper())
        blob, _ = apply_filters(
            "a.up", b"abc", compile_rules(((".up", "upper"),)))
        assert blob == b"ABC"
        assert get_filter("gzip") is not None
        assert get_filter("gzip:decompress")(gzip.compress(b"k")) == b"k"
        with pytest.raises(KeyError):
            compile_rules(((".x", "no_such_filter"),))

    def test_non_bytes_return_raises(self):
        register_filter("bad", lambda b: "not bytes")
        with pytest.raises(TypeError):
            apply_filters("a.bad", b"x",
                          compile_rules(((".bad", "bad"),)))


# --------------------------------------------------------------------
# robots.txt (pure python)
# --------------------------------------------------------------------

class TestRobots:
    def test_star_group_only(self):
        body = (b"User-agent: googlebot\nDisallow: /g\n\n"
                b"User-agent: *\nDisallow: /private\nDisallow: /tmp\n")
        assert parse_robots(body) == ["/private", "/tmp"]

    def test_consecutive_agents_share_rules(self):
        body = (b"User-agent: a\nUser-agent: *\nDisallow: /x\n"
                b"User-agent: b\nDisallow: /y\n")
        assert parse_robots(body) == ["/x"]

    def test_empty_disallow_and_comments(self):
        body = b"User-agent: *  # all\nDisallow:\nDisallow: /k # keep\n"
        assert parse_robots(body) == ["/k"]


# --------------------------------------------------------------------
# Spark end-to-end
# --------------------------------------------------------------------

class TestFilterBuild:
    def test_gzip_filter_build(self, spark, tmp_path):
        idx = str(tmp_path / "fidx")
        html = (b"<html><title>Zebra Report</title>"
                b"<body>quagga stripes</body></html>")
        rows = [("http://h/r.html.gz", gzip.compress(html)),
                ("http://h/plain.html",
                 b"<html><body>plain doc</body></html>")]
        cfg = IndexConfig(file_filters=((".gz", "gzip"),), **CFG)
        build_index(spark, _pages_df(spark, rows), idx, cfg)
        got = _urls_scores(spark, idx, "quagga")
        assert [u for u, _ in got] == ["http://h/r.html.gz"]
        # title parsed from DECOMPRESSED bytes, as html (suffix strip)
        from swish_e_spark.textproc.extractor import IN_TITLE

        engine = SparkQueryEngine(spark, IndexHandle(spark, idx))
        got_t = engine.search("zebra", k=5, structure_mask=IN_TITLE)
        assert len(got_t) == 1
        # source_size records the ORIGINAL (compressed) input size
        # (fprop->source_size, extprog.c:308)
        docs = {r["url"]: r for r in
                engine.handle.docs().collect()}
        assert docs["http://h/r.html.gz"]["size"] == len(
            gzip.compress(html))

    def test_external_converter_build(self, spark, tmp_path):
        """End-to-end external converter through the registry (the
        reference's filters/ model: fork a converter per document):
        a toy binary format converts to HTML via a subprocess and
        indexes, including title structure from the CONVERTED bytes."""
        import sys

        from swish_e_spark.sources.filters import (
            external_filter, register_filter,
        )

        conv = tmp_path / "docconv.py"
        conv.write_text(
            "import sys\n"
            "blob = sys.stdin.buffer.read()\n"
            "assert blob[:4] == b'DOC1'\n"
            "txt = blob[4:].decode()\n"
            "title, _, body = txt.partition('|')\n"
            "sys.stdout.write('<html><title>%s</title>"
            "<body>%s</body></html>' % (title, body))\n")
        # register locally too (driver-side path works the same way);
        # the exec: NAME is what ships to executors via the manifest
        register_filter(
            "docconv", external_filter([sys.executable, str(conv)]))
        idx = str(tmp_path / "xidx")
        rows = [("http://h/report.html.bin",
                 b"DOC1Walrus Report|tuskful paragraphs here"),
                ("http://h/plain.html",
                 b"<html><body>plain doc</body></html>")]
        cfg = IndexConfig(file_filters=(
            (".bin", f"exec:{sys.executable} {conv}"),), **CFG)
        build_index(spark, _pages_df(spark, rows), idx, cfg)
        got = _urls_scores(spark, idx, "tuskful")
        assert [u for u, _ in got] == ["http://h/report.html.bin"]
        from swish_e_spark.textproc.extractor import IN_TITLE

        engine = SparkQueryEngine(spark, IndexHandle(spark, idx))
        got_t = engine.search("walrus", k=5, structure_mask=IN_TITLE)
        assert len(got_t) == 1

    def test_external_converter_missing_tool(self, tmp_path):
        from swish_e_spark.sources.filters import external_filter

        with pytest.raises(FileNotFoundError):
            external_filter(["no-such-converter-xyz"])

    def test_filter_typo_fails_at_plan_time(self, spark, tmp_path):
        cfg = IndexConfig(file_filters=((".gz", "gzp"),), **CFG)
        with pytest.raises(KeyError):
            build_index(spark, _pages_df(
                spark, [("a.html", b"<p>x</p>")]),
                str(tmp_path / "t"), cfg)


class TestNoContents:
    def test_title_only_indexing(self, spark, tmp_path):
        idx = str(tmp_path / "ncidx")
        rows = [
            ("http://h/t.html",
             b"<html><title>Falcon Title</title>"
             b"<body>bodyonlyword</body></html>", True),
            ("http://h/n.txt", b"txtbodyword here", True),
            ("http://h/full.html",
             b"<html><body>fullbodyword</body></html>", False),
        ]
        build_index(
            spark,
            _pages_df(spark, rows, extra_cols=("no_contents",)),
            idx, IndexConfig(**CFG))
        # body words of no-contents docs are NOT indexed
        assert _urls_scores(spark, idx, "bodyonlyword") == []
        assert _urls_scores(spark, idx, "txtbodyword") == []
        # html no-contents: title words indexed
        assert [u for u, _ in _urls_scores(spark, idx, "falcon")] \
            == ["http://h/t.html"]
        # non-html no-contents: the url itself is the indexed text
        # (index_no_content, /root/reference/src/index.c:497-533)
        assert [u for u, _ in _urls_scores(spark, idx, "txt")] \
            == ["http://h/n.txt"]
        # normal docs unaffected
        assert [u for u, _ in _urls_scores(spark, idx, "fullbodyword")] \
            == ["http://h/full.html"]


class TestProgSource:
    def _write_stream(self, path, docs):
        out = b""
        for url, body, extra in docs:
            out += f"Path-Name: {url}\n".encode()
            out += f"Content-Length: {len(body)}\n".encode()
            out += extra
            out += b"\n" + body
        with open(path, "wb") as f:
            f.write(out)

    def test_prog_pages_end_to_end(self, spark, tmp_path):
        shard = str(tmp_path / "shard0.prog")
        self._write_stream(shard, [
            ("/data/a.dat", b"wombat burrow", b"Document-Type: TXT\n"),
            ("/w.html",
             b"<html><title>Osprey Dive</title>"
             b"<body>seahawk fishing</body></html>", b""),
            ("/skip.html",
             b"<html><title>Kestrel Hover</title>"
             b"<body>windhover body</body></html>", b"No-Contents:\n"),
        ])
        pages = prog_pages_df(spark, shard)
        assert pages.count() == 3
        idx = str(tmp_path / "pidx")
        build_index(spark, pages, idx, IndexConfig(**CFG))
        # Document-Type override: .dat parsed as TXT, body indexed
        assert [u for u, _ in _urls_scores(spark, idx, "wombat")] \
            == ["/data/a.dat"]
        assert [u for u, _ in _urls_scores(spark, idx, "seahawk")] \
            == ["/w.html"]
        # No-Contents html: title yes, body no
        assert [u for u, _ in _urls_scores(spark, idx, "kestrel")] \
            == ["/skip.html"]
        assert _urls_scores(spark, idx, "windhover") == []

    def test_apply_prog_stream_update_remove(self, spark, tmp_path):
        idx = str(tmp_path / "uidx")
        base = [("/a.txt", b"alpha words"), ("/b.txt", b"bravo words"),
                ("/c.txt", b"charlie words")]
        build_index(spark, _pages_df(spark, base), idx,
                    IndexConfig(**CFG))
        stream = str(tmp_path / "upd.prog")
        self._write_stream(stream, [
            ("/b.txt", b"bravo REVISED tango",
             b"Update-Mode: Update\n"),
            ("/d.txt", b"delta fresh", b"Update-Mode: Index\n"),
            ("/c.txt", b"", b"Update-Mode: Remove\n"),
        ])
        res = apply_prog_stream(spark, stream, idx)
        assert res == {"updated": 2, "removed": 1}
        assert [u for u, _ in _urls_scores(spark, idx, "tango")] \
            == ["/b.txt"]
        assert [u for u, _ in _urls_scores(spark, idx, "delta")] \
            == ["/d.txt"]
        assert _urls_scores(spark, idx, "charlie") == []
        # replace semantics: old content of /b gone
        assert len(_urls_scores(spark, idx, "words")) == 1  # only /a

    def test_apply_prog_stream_last_record_wins(self, spark, tmp_path):
        """The reference processes records sequentially (extprog.c:
        420-470): a later record for the same url supersedes an
        earlier one IN THE SAME STREAM. The set-wise routing must
        reproduce that end state, not index both copies."""
        idx = str(tmp_path / "lidx")
        base = [("/a.txt", b"alpha words"), ("/b.txt", b"bravo words")]
        build_index(spark, _pages_df(spark, base), idx,
                    IndexConfig(**CFG))
        stream = str(tmp_path / "dup.prog")
        self._write_stream(stream, [
            # /a updated twice in one stream — only the LAST lands
            ("/a.txt", b"alpha intermediate", b"Update-Mode: Update\n"),
            ("/a.txt", b"alpha final quokka", b"Update-Mode: Update\n"),
            # /b indexed then removed — end state absent
            ("/b.txt", b"bravo revived", b"Update-Mode: Update\n"),
            ("/b.txt", b"", b"Update-Mode: Remove\n"),
            # /e removed then (re)indexed — end state live
            ("/e.txt", b"", b"Update-Mode: Remove\n"),
            ("/e.txt", b"echo emu", b"Update-Mode: Index\n"),
        ])
        res = apply_prog_stream(spark, stream, idx)
        assert res == {"updated": 2, "removed": 1}
        assert [u for u, _ in _urls_scores(spark, idx, "quokka")] \
            == ["/a.txt"]
        assert _urls_scores(spark, idx, "intermediate") == []
        assert _urls_scores(spark, idx, "bravo") == []
        assert _urls_scores(spark, idx, "revived") == []
        assert [u for u, _ in _urls_scores(spark, idx, "emu")] \
            == ["/e.txt"]
        h = IndexHandle(spark, idx)
        live = h.live_docs()
        assert live.filter(live.url == "/a.txt").count() == 1

    def test_apply_prog_stream_honors_doc_headers(self, spark,
                                                  tmp_path):
        """Document-Type and No-Contents must survive the INCREMENTAL
        path: the same stream must index identically whether it goes
        through build_index or apply_prog_stream."""
        idx = str(tmp_path / "didx")
        build_index(spark, _pages_df(spark, [("/a.txt", b"alpha")]),
                    idx, IndexConfig(**CFG))
        stream = str(tmp_path / "dt.prog")
        # body looks like robots-noindex HTML; Document-Type: TXT must
        # force a literal-text parse (indexed), not an HTML parse
        # (which would abort the doc on the robots meta)
        noidx_html = (b"<html><head>"
                      b"<meta name='robots' content='noindex'></head>"
                      b"<body>numbat</body></html>")
        self._write_stream(stream, [
            ("/data/x.dat", noidx_html,
             b"Document-Type: TXT\nUpdate-Mode: Index\n"),
            ("/skip2.html",
             b"<html><title>Merlin Stoop</title>"
             b"<body>stoopbody</body></html>",
             b"No-Contents:\nUpdate-Mode: Index\n"),
        ])
        res = apply_prog_stream(spark, stream, idx)
        assert res["updated"] == 2
        assert [u for u, _ in _urls_scores(spark, idx, "numbat")] \
            == ["/data/x.dat"]
        # No-Contents html: title indexed, body not
        assert [u for u, _ in _urls_scores(spark, idx, "merlin")] \
            == ["/skip2.html"]
        assert _urls_scores(spark, idx, "stoopbody") == []


WEB = {
    "http://ex.com/robots.txt":
        ("text/plain", b"User-agent: *\nDisallow: /private\n"),
    "http://ex.com/":
        b"<html><body>home heron page"
        b"<a href='/a'>a</a>"
        b"<a href='/private/x'>p</a>"
        b"<a href='b.html'>b</a>"
        b"<a href='http://other.com/c'>off</a>"
        b"<a href='/dead'>d</a>"
        b"<a href='/noidx.html'>n</a>"
        b"<a href='/#frag'>self</a></body></html>",
    "http://ex.com/a":
        b"<html><body>alpha heron <a href='/'>home</a>"
        b"<a href='/deep1'>deeper</a></body></html>",
    "http://ex.com/b.html":
        b"<html><body>beta heron</body></html>",
    "http://ex.com/noidx.html":
        b"<html><head><meta name='robots' content='noindex'></head>"
        b"<body>secret <a href='/hidden'>h</a></body></html>",
    "http://ex.com/private/x": b"<html><body>private</body></html>",
    "http://ex.com/deep1":
        b"<html><body>deep1 heron <a href='/deep2'>d2</a></body></html>",
    "http://ex.com/deep2":
        b"<html><body>deep2 heron</body></html>",
    "http://ex.com/hidden": b"<html><body>hidden</body></html>",
    "http://other.com/c": b"<html><body>offsite</body></html>",
}


class TestSpider:
    def test_crawl_policy(self, spark):
        pages = crawl(spark, ["http://ex.com/"], DictFetcher(WEB),
                      SpiderConfig(max_depth=2))
        got = {r["url"]: r for r in pages.collect()}
        # depth-2 BFS: / (0), a+b (1), deep1 (2); robots blocks
        # /private/x, noindex page neither indexed nor followed
        # (so /hidden unseen), off-host skipped, 404 dropped,
        # deep2 is depth 3 > max_depth
        assert set(got) == {"http://ex.com/", "http://ex.com/a",
                            "http://ex.com/b.html",
                            "http://ex.com/deep1"}
        assert got["http://ex.com/a"]["depth"] == 1
        assert got["http://ex.com/deep1"]["depth"] == 2

    def test_crawl_max_docs(self, spark):
        pages = crawl(spark, ["http://ex.com/"], DictFetcher(WEB),
                      SpiderConfig(max_depth=5, max_docs=2))
        assert pages.count() == 2

    def test_crawl_to_index(self, spark, tmp_path):
        idx = str(tmp_path / "cidx")
        pages = crawl_pages(spark, ["http://ex.com/"],
                            DictFetcher(WEB),
                            SpiderConfig(max_depth=2))
        build_index(spark, pages, idx, IndexConfig(**CFG))
        urls = [u for u, _ in _urls_scores(spark, idx, "heron")]
        assert set(urls) == {"http://ex.com/", "http://ex.com/a",
                             "http://ex.com/b.html",
                             "http://ex.com/deep1"}
        assert _urls_scores(spark, idx, "secret") == []

    def test_crawl_per_host_cap_defers_not_drops(self, spark):
        """The politeness bound spreads a host's frontier over rounds;
        the final page set must equal the uncapped crawl's (regression:
        capped-out urls were dropped while already marked visited, so
        they could never re-enqueue — silent document loss)."""
        want = {r["url"] for r in
                crawl(spark, ["http://ex.com/"], DictFetcher(WEB),
                      SpiderConfig(max_depth=3)).collect()}
        got = {r["url"] for r in
               crawl(spark, ["http://ex.com/"], DictFetcher(WEB),
                     SpiderConfig(max_depth=3,
                                  max_per_host_per_round=2)).collect()}
        assert got == want
        assert "http://ex.com/deep2" in got  # depth 3 still reached

    def test_crawl_robots_on_discovered_hosts(self, spark):
        """With same_host_only=False, robots.txt of a host discovered
        mid-crawl must be fetched and honored — not silently skipped
        because only seed hosts were probed up front."""
        web = dict(WEB)
        web["http://other.com/robots.txt"] = (
            "text/plain", b"User-agent: *\nDisallow: /c\n")
        web["http://other.com/ok"] = b"<html><body>okpage</body></html>"
        web["http://ex.com/"] = (
            b"<html><body>home"
            b"<a href='http://other.com/c'>blocked</a>"
            b"<a href='http://other.com/ok'>fine</a></body></html>")
        got = {r["url"] for r in
               crawl(spark, ["http://ex.com/"], DictFetcher(web),
                     SpiderConfig(max_depth=2, same_host_only=False)
                     ).collect()}
        assert "http://other.com/ok" in got
        assert "http://other.com/c" not in got

    def test_crawl_robots_fetched_with_seed_scheme(self, spark):
        """An https-only host's robots.txt must be fetched over https;
        a forced-http probe would 404 and silently void the rules."""
        web = {
            "https://sec.com/robots.txt": (
                "text/plain", b"User-agent: *\nDisallow: /private\n"),
            "https://sec.com/":
                b"<html><body>shome"
                b"<a href='/private/x'>p</a>"
                b"<a href='/pub'>ok</a></body></html>",
            "https://sec.com/private/x":
                b"<html><body>sec</body></html>",
            "https://sec.com/pub": b"<html><body>pub</body></html>",
        }
        got = {r["url"] for r in
               crawl(spark, ["https://sec.com/"], DictFetcher(web),
                     SpiderConfig(max_depth=2)).collect()}
        assert got == {"https://sec.com/", "https://sec.com/pub"}

    def test_crawl_redirect_policy_and_identity(self, spark):
        """A redirected page's identity is the POST-redirect url (the
        reference spider indexes $response->base, prog-bin/spider.pl),
        host/robots policy re-applies to the landing url, and a target
        already linked directly collapses to ONE document."""
        web = dict(WEB)
        web["http://ex.com/"] = (
            b"<html><body>home heron"
            b"<a href='/moved'>m</a>"
            b"<a href='/offsite'>o</a>"
            b"<a href='/hidden2'>h</a>"
            b"<a href='/moved-target'>direct</a></body></html>")
        web["http://ex.com/moved-target"] = (
            b"<html><body>landed heron</body></html>")
        redirects = {
            "http://ex.com/moved": "http://ex.com/moved-target",
            "http://ex.com/offsite": "http://other.com/c",
            "http://ex.com/hidden2": "http://ex.com/private/x",
        }
        pages = crawl(spark, ["http://ex.com/"],
                      DictFetcher(web, redirects),
                      SpiderConfig(max_depth=2))
        rows = pages.collect()
        # off-host and robots-disallowed landing urls are dropped even
        # though the REDIRECTING url passed policy at enqueue time
        assert {r["url"] for r in rows} == {
            "http://ex.com/", "http://ex.com/moved-target"}
        assert len(rows) == 2  # no duplicate moved-target identity

    def test_crawl_redirect_lands_on_new_identity(self, spark):
        """A redirect to a never-linked url indexes under the landing
        url, keeps the hop's depth, and follows the landing page's
        links (resolved against the final base)."""
        web = {
            "http://ex.com/robots.txt": ("text/plain", b""),
            "http://ex.com/":
                b"<html><body>root <a href='/r'>r</a></body></html>",
            "http://ex.com/land":
                b"<html><body>landing "
                b"<a href='/next'>n</a></body></html>",
            "http://ex.com/next": b"<html><body>nextpage</body></html>",
        }
        pages = crawl(
            spark, ["http://ex.com/"],
            DictFetcher(web, {"http://ex.com/r": "http://ex.com/land"}),
            SpiderConfig(max_depth=3))
        got = {r["url"]: r["depth"] for r in pages.collect()}
        assert set(got) == {"http://ex.com/", "http://ex.com/land",
                            "http://ex.com/next"}
        assert got["http://ex.com/land"] == 1

    def test_file_fetcher(self, tmp_path):
        root = tmp_path / "web"
        os.makedirs(root / "sub")
        (root / "index.html").write_bytes(b"<p>root</p>")
        (root / "sub" / "p.html").write_bytes(b"<p>leaf</p>")
        f = FileFetcher(str(root))
        assert f("http://any/").body == b"<p>root</p>"
        assert f("http://any/sub/p.html").body == b"<p>leaf</p>"
        assert f("http://any/missing.html").status == 404
        assert f("http://any/../etc/passwd").status in (403, 404)

    def test_file_fetcher_containment(self, tmp_path, monkeypatch):
        """Prefix-sibling escape (root 'web' must not serve 'web2')
        and relative-root operation."""
        root = tmp_path / "web"
        sibling = tmp_path / "web2"
        os.makedirs(root)
        os.makedirs(sibling)
        (root / "index.html").write_bytes(b"<p>in</p>")
        (sibling / "secret.txt").write_bytes(b"leak")
        f = FileFetcher(str(root))
        assert f("http://h/../web2/secret.txt").status == 403
        monkeypatch.chdir(tmp_path)
        rel = FileFetcher("web")
        assert rel("http://h/").body == b"<p>in</p>"
        assert rel("http://h/../web2/secret.txt").status == 403
