"""Spider — the HTTP crawl source (SURVEY.md §2.1) with a pluggable
fetcher.

The reference crawls with a single-threaded recursive walk
(/root/reference/src/http.c and prog-bin/spider.pl): fetch a page,
parse links, respect robots.txt and a same-host/depth/doc-count
policy, enqueue unseen urls. That loop is re-expressed as distributed
breadth-first rounds:

    frontier(round d)  --mapInPandas fetch+extract-->  pages + links
    links  --normalize, policy filter, anti-join visited-->
    frontier(round d+1)

Each round fetches the whole frontier in parallel (the reference's
`delay` politeness knob becomes `max_per_host_per_round`, which bounds
concurrent load per host better than a per-process sleep ever did;
the overflow defers to later rounds, it is never dropped),
and the visited set is a DataFrame anti-join, not a driver-side hash —
the crawl state scales with the cluster, not the driver heap.

The FETCHER is pluggable and must be picklable (it runs on
executors): `DictFetcher` serves a deterministic in-memory web for
tests, `FileFetcher` serves a directory tree, and `urllib_fetcher`
does real HTTP via the stdlib for production use (never exercised in
this repo's tests — no network in CI).

robots.txt handling matches the crawl-relevant subset the reference
implements (http.c's robots support + spider.pl): the `User-agent: *`
group's `Disallow:` prefixes; an empty Disallow allows everything.
Pages whose <meta name=robots> says noindex are neither indexed nor
followed (the reference parser aborts such documents before link
extraction, /root/reference/src/parser.c robots handling).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urldefrag, urljoin, urlsplit

PAGES_SCHEMA = ("url string, depth int, status int, "
                "content_type string, html binary")

# JVM-side netloc/path extraction that matches urlsplit(): netloc is
# everything between :// and the first /?# (KEEPING userinfo and port —
# Spark's parse_url(..,'HOST') drops the port, so a robots map keyed by
# urlsplit netloc would never match it), path is the rest up to ?#.
_NETLOC_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


@dataclass
class FetchResult:
    status: int
    content_type: str
    body: bytes
    final_url: str | None = None  # after redirects


class DictFetcher:
    """Deterministic in-memory web: {url: (content_type, body)} or
    {url: body} (content type defaults to text/html). Missing → 404.
    ``redirects`` maps url → target; chains are followed (≤8 hops)
    and the landing url is reported as ``final_url``, like a real
    HTTP client that followed 3xx responses."""

    def __init__(self, mapping: dict, redirects: dict | None = None):
        self.mapping = {}
        for url, v in mapping.items():
            if isinstance(v, tuple):
                ct, body = v
            else:
                ct, body = "text/html", v
            if isinstance(body, str):
                body = body.encode("utf-8")
            self.mapping[url] = (ct, body)
        self.redirects = dict(redirects or {})

    def __call__(self, url: str) -> FetchResult:
        final = url
        for _ in range(8):
            nxt = self.redirects.get(final)
            if nxt is None:
                break
            final = nxt
        fin = final if final != url else None
        hit = self.mapping.get(final)
        if hit is None:
            return FetchResult(404, "text/plain", b"not found", fin)
        return FetchResult(200, hit[0], hit[1], fin)


class FileFetcher:
    """Serves ``http://<any-host>/<path>`` from ``root/<path>``;
    directory urls resolve to index.html. Content type by suffix."""

    def __init__(self, root: str):
        import os

        self.root = os.path.abspath(root)

    def __call__(self, url: str) -> FetchResult:
        import os

        path = urlsplit(url).path or "/"
        if path.endswith("/"):
            path += "index.html"
        full = os.path.normpath(os.path.join(
            self.root, path.lstrip("/")))
        # containment = root itself or strictly under root+separator;
        # a bare prefix test would let /data/web2 escape /data/web
        if full != self.root and not full.startswith(self.root + os.sep):
            return FetchResult(403, "text/plain", b"")  # no traversal
        try:
            with open(full, "rb") as f:
                body = f.read()
        except OSError:
            return FetchResult(404, "text/plain", b"")
        ct = ("text/html" if full.endswith((".html", ".htm"))
              else "text/xml" if full.endswith(".xml")
              else "text/plain")
        return FetchResult(200, ct, body)


def urllib_fetcher(url: str, timeout: float = 10.0) -> FetchResult:
    """Real HTTP via the stdlib — production fetcher (not exercised in
    tests: no network here)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": "swish-e-spark-spider/1.0"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            ct = resp.headers.get("Content-Type", "")
            return FetchResult(resp.status, ct.split(";")[0].strip(),
                               resp.read(), resp.geturl())
    except urllib.error.HTTPError as e:
        return FetchResult(e.code, "", b"")
    except (urllib.error.URLError, OSError):
        return FetchResult(-1, "", b"")


@dataclass
class SpiderConfig:
    max_depth: int = 5
    max_docs: int | None = None
    same_host_only: bool = True          # spider.pl default
    obey_robots: bool = True
    allowed_content: tuple = ("text/html", "text/xml", "text/plain")
    extra_hosts: tuple = ()              # allowed beyond seed hosts
    max_per_host_per_round: int | None = None  # politeness bound


def parse_robots(body: bytes) -> list[str]:
    """Disallow prefixes of the ``User-agent: *`` group(s). Empty
    Disallow lines allow everything (contribute no prefix)."""
    prefixes: list[str] = []
    cur_agents: list[str] = []
    in_agent_block = False
    for raw in body.decode("utf-8", "replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # consecutive User-agent lines accumulate into ONE group;
            # a User-agent after a rule line starts a new group
            if not in_agent_block:
                cur_agents = []
            cur_agents.append(val)
            in_agent_block = True
        else:
            in_agent_block = False
            if key == "disallow" and "*" in cur_agents and val:
                prefixes.append(val)
    return prefixes


def _normalize(base_url: str, href: str) -> str | None:
    """Resolve + canonicalize a link: join with the page url, strip
    the fragment, keep http(s) only."""
    try:
        absu = urljoin(base_url, href.strip())
    except ValueError:
        return None
    absu, _frag = urldefrag(absu)
    parts = urlsplit(absu)
    if parts.scheme not in ("http", "https") or not parts.netloc:
        return None
    return absu


def _fetch_extract_kernel(batches, fetcher, allowed_content):
    """Executor kernel: fetch each frontier url, extract links from
    parseable content (the extractor's links machinery, with <base>
    fixup), and return one row per page with its outlinks."""
    import pandas as pd

    from ..textproc.extractor import LINKS_FIELD, extract

    for pdf in batches:
        rows = []
        for url, depth in zip(pdf["url"], pdf["depth"]):
            r = fetcher(url)
            ct = (r.content_type or "").split(";")[0].strip().lower()
            final = None
            if r.final_url:
                f = _normalize(url, r.final_url)
                if f and f != url:
                    final = f
            links: list[str] = []
            indexable = False
            if r.status == 200 and ct in allowed_content:
                indexable = True
                if ct in ("text/html", "text/xml"):
                    doctype = "xml" if ct == "text/xml" else "html"
                    doc = extract(r.body, doctype=doctype,
                                  index_links=True)
                    if doc.noindex:
                        indexable = False  # noindex: don't follow either
                    else:
                        base = final or url
                        for ev in doc.events:
                            if ev.field_name != LINKS_FIELD:
                                continue
                            u = _normalize(base, ev.text)
                            if u:
                                links.append(u)
            rows.append((url, int(depth), int(r.status), ct,
                         r.body if indexable else None, links,
                         indexable, final))
        yield pd.DataFrame(rows, columns=[
            "url", "depth", "status", "content_type", "html", "links",
            "indexable", "final_url"])


def crawl(spark, seeds, fetcher, cfg: SpiderConfig | None = None):
    """Breadth-first distributed crawl. Returns a DataFrame
    (url, depth, status, content_type, html) of indexable pages,
    ready for build_index after adding warc_ts/text/lang columns
    (see crawl_pages)."""
    from pyspark.sql import functions as F

    from ..shipping import ship_package

    ship_package(spark)
    cfg = cfg or SpiderConfig()
    if (cfg.max_per_host_per_round is not None
            and cfg.max_per_host_per_round < 1):
        raise ValueError("max_per_host_per_round must be >= 1")
    seeds = [s for s in (_normalize(s, "") for s in seeds) if s]
    if not seeds:
        raise ValueError("no valid http(s) seed urls")
    seed_hosts = {urlsplit(s).netloc for s in seeds}
    allowed_hosts = seed_hosts | set(cfg.extra_hosts)

    # robots.txt once per host, cached on the driver and fetched the
    # first round a host appears — not just seed hosts: with
    # same_host_only=False every discovered host needs its rules too.
    # Fetched under the scheme the host was first seen with (an
    # https-only host would 404/-1 a forced-http probe and silently
    # lose its Disallow rules). The cache is per-host state, the same
    # shape the reference keeps (http.c robots handling).
    robots: dict[str, list[str]] = {}

    def _learn_robots(host_schemes):
        if not cfg.obey_robots:
            return
        for host, scheme in host_schemes:
            if host and host not in robots:
                r = fetcher(f"{scheme or 'http'}://{host}/robots.txt")
                robots[host] = (parse_robots(r.body)
                                if r.status == 200 else [])

    _learn_robots(sorted(
        {(urlsplit(s).netloc, urlsplit(s).scheme) for s in seeds}
        | {(h, "http") for h in cfg.extra_hosts}))

    def allowed(url: str) -> bool:
        parts = urlsplit(url)
        if cfg.same_host_only and parts.netloc not in allowed_hosts:
            return False
        for pref in robots.get(parts.netloc, ()):
            if (parts.path or "/").startswith(pref):
                return False
        return True

    allowed_content = tuple(c.lower() for c in cfg.allowed_content)
    kernel = (lambda it: _fetch_extract_kernel(
        it, fetcher, allowed_content))
    fetched_schema = ("url string, depth int, status int, "
                      "content_type string, html binary, "
                      "links array<string>, indexable boolean, "
                      "final_url string")

    def _apply_policy(df):
        """JVM-side host + robots policy on df['url'] (the crawl's hot
        path at scale — never a per-row Python UDF): host policy is an
        isin on the small allowed set; robots is a broadcast join of
        the host→Disallow-prefixes map with a vectorized prefix test."""
        out = (df
               .withColumn("_host",
                           F.regexp_extract("url", _NETLOC_RE, 1))
               .withColumn("_path", F.coalesce(
                   F.nullif(F.regexp_extract("url", _PATH_RE, 1),
                            F.lit("")), F.lit("/"))))
        if cfg.same_host_only:
            out = out.filter(F.col("_host").isin(sorted(allowed_hosts)))
        rob_rows = [(h, ps) for h, ps in sorted(robots.items()) if ps]
        if cfg.obey_robots and rob_rows:
            rob_df = spark.createDataFrame(
                rob_rows, "host string, prefixes array<string>")
            out = (out.join(F.broadcast(rob_df),
                            out["_host"] == rob_df["host"], "left")
                   .filter(~F.coalesce(
                       F.exists("prefixes",
                                lambda pfx:
                                F.col("_path").startswith(pfx)),
                       F.lit(False)))
                   .drop("host", "prefixes"))
        return out.drop("_host", "_path")

    frontier = spark.createDataFrame(
        [(u, 0) for u in sorted(set(seeds)) if allowed(u)],
        "url string, depth int")
    visited = frontier.select("url")
    pages = None
    n_pages = 0
    while True:
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        take, deferred = frontier, None
        if cfg.max_per_host_per_round is not None:
            # the politeness bound DEFERS a host's overflow to later
            # rounds — dropping it would silently lose documents (the
            # urls are already in visited and could never re-enqueue)
            from pyspark.sql import Window

            w = Window.partitionBy(
                F.regexp_extract("url", _NETLOC_RE, 1)) \
                .orderBy("depth", "url")
            ranked = (frontier
                      .withColumn("_rn", F.row_number().over(w))
                      .localCheckpoint())
            take = (ranked.filter(F.col("_rn")
                                  <= cfg.max_per_host_per_round)
                    .drop("_rn"))
            deferred = (ranked.filter(F.col("_rn")
                                      > cfg.max_per_host_per_round)
                        .drop("_rn"))
        fetched = (take.repartition(
            max(1, min(n_frontier, 64)), "url")
            .mapInPandas(kernel, schema=fetched_schema)
            .localCheckpoint())  # fetch exactly once per round
        if fetched.filter(F.col("final_url").isNotNull()) \
                .limit(1).count():
            # a redirected page's identity is the POST-redirect url
            # (the reference spider indexes $response->base,
            # prog-bin/spider.pl), so host/robots policy applies to
            # the landing url — a redirect must not smuggle a
            # disallowed host/path into the index or its links into
            # the frontier — and a target already fetched or queued
            # is a duplicate identity, not a new document
            plain = fetched.filter(F.col("final_url").isNull())
            redir = (fetched.filter(F.col("final_url").isNotNull())
                     .withColumn("url", F.col("final_url")))
            if cfg.obey_robots and not cfg.same_host_only:
                _learn_robots(sorted({(
                    urlsplit(r["url"]).netloc,
                    urlsplit(r["url"]).scheme)
                    for r in redir.select("url").distinct().collect()}))
            redir = (_apply_policy(redir)
                     .join(visited, "url", "left_anti"))
            from pyspark.sql import Window

            wdup = Window.partitionBy("url").orderBy("depth", "status")
            redir = (redir
                     .withColumn("_rn", F.row_number().over(wdup))
                     .filter(F.col("_rn") == 1).drop("_rn"))
            fetched = plain.unionByName(redir).localCheckpoint()
            # landing identities join the visited set so later links
            # to them are not re-enqueued (and re-indexed)
            visited = visited.unionByName(
                redir.select("url")).localCheckpoint()
        got = (fetched.filter("indexable")
               .select("url", "depth", "status", "content_type",
                       "html")
               .orderBy("url"))
        if cfg.max_docs is not None:
            got = got.limit(max(0, cfg.max_docs - n_pages))
        got = got.localCheckpoint()
        n_pages += got.count()
        pages = got if pages is None else pages.unionByName(got)
        if cfg.max_docs is not None and n_pages >= cfg.max_docs:
            break
        # candidate links: depth = 1 + nearest parent, depth-bounded,
        # never seen before
        cand = (fetched.select(F.explode("links").alias("url"),
                               (F.col("depth") + 1).alias("depth"))
                .groupBy("url").agg(F.min("depth").alias("depth"))
                .filter(F.col("depth") <= cfg.max_depth)
                .join(visited, "url", "left_anti")
                .localCheckpoint())
        # robots for hosts first seen this round: driver-side, one
        # fetch per NEW host ever (the collect is host-cardinality
        # metadata, not page data)
        if cfg.obey_robots and not cfg.same_host_only:
            hs = (cand.select(
                F.regexp_extract("url", _NETLOC_RE, 1).alias("h"),
                F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("s"))
                .distinct().collect())
            _learn_robots(sorted((r["h"], r["s"]) for r in hs))
        nxt = _apply_policy(cand).localCheckpoint()
        # every CANDIDATE is marked visited, allowed or not — robots
        # rules are fetched once, so a disallowed url stays disallowed
        # and re-examining it every round is pure waste
        visited = visited.unionByName(cand.select("url")) \
            .localCheckpoint()
        frontier = (nxt if deferred is None
                    else deferred.unionByName(nxt))
    if pages is None:
        return spark.createDataFrame([], PAGES_SCHEMA)
    return pages


def crawl_pages(spark, seeds, fetcher, cfg: SpiderConfig | None = None,
                ts: str = "2024-01-01 00:00:00"):
    """crawl() shaped for build_index: (url, warc_ts, html, text,
    lang). ``ts`` is the deterministic crawl timestamp (pass your own
    for real runs; determinism keeps the tests and oracles exact)."""
    from pyspark.sql import functions as F

    return (crawl(spark, seeds, fetcher, cfg)
            .select("url",
                    F.lit(ts).cast("timestamp").alias("warc_ts"),
                    "html",
                    F.lit("").alias("text"),
                    F.lit("").alias("lang")))
