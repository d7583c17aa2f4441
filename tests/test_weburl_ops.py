"""Semantic pins for the web-scale hygiene ops (ops/weburl.py) beyond
the DuckDB oracle gate: pure-Python recompute of the URL canonicalizer
and PII scrubber over the planted inputs, invariants of the dedup
groups, the curation decision priority, and shard-packing boundaries."""

import collections
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import weburl
from swish_e_spark.ops.corpus import documents

SF = "/root/testdata/sf0.001"


def _messy_url(did):
    sid = did // 4 if did % 8 >= 4 else did
    scheme = "https" if sid % 3 == 0 else "http"
    defport = ":443" if sid % 3 == 0 else ":80"
    host = f"www.d{sid % 17}.example.com"
    if sid % 11 == 3:
        port = ":8080"
    elif did % 2 == 0:
        port = defport
    else:
        port = ""
    slash = "//" if did % 2 == 0 else "/"
    path = f"/docs{slash}x{sid % 50}/{sid}"
    qa, qb = f"a={sid % 5}", f"b={sid % 7}"
    if did % 2 == 0:
        query = f"?{qb}&utm_source=feed&gclid=g{did}&{qa}"
        frag = f"#sec{did}"
        scheme, host = scheme.upper(), host.upper()
    else:
        query, frag = f"?{qa}&{qb}", ""
    return f"{scheme}://{host}{port}{path}{query}{frag}"


def _canon(u):
    u = re.sub("#.*$", "", u)
    m = re.match(r"^([A-Za-z]+)://([^/?#]*)([^?#]*)\??(.*)$", u)
    scheme, hostport, path, q = m.groups()
    scheme, hostport = scheme.lower(), hostport.lower()
    if scheme == "https":
        hostport = re.sub(":443$", "", hostport)
    elif scheme == "http":
        hostport = re.sub(":80$", "", hostport)
    path = re.sub("//+", "/", path) or "/"
    keep = sorted(p for p in q.split("&")
                  if p and not p.startswith(("utm_", "gclid=",
                                             "fbclid=")))
    return (f"{scheme}://{hostport}{path}"
            + ("?" + "&".join(keep) if keep else ""))


class TestUrlCanonicalize:
    def test_matches_pure_python(self, spark):
        rows = weburl.url_canonicalize(spark, SF).collect()
        dids = {r.doc_id for r in
                documents(spark, SF).select("doc_id").collect()}
        assert {r.doc_id for r in rows} == dids
        for r in rows:
            assert r.url == _messy_url(r.doc_id)
            assert r.canon_url == _canon(r.url)

    def test_tracking_and_fragment_gone(self, spark):
        for r in weburl.url_canonicalize(spark, SF).collect():
            assert "#" not in r.canon_url
            assert "utm_" not in r.canon_url
            assert "gclid" not in r.canon_url
            assert r.canon_url == r.canon_url.split("#")[0]
            # default ports stripped, the planted :8080 band kept
            assert ":443" not in r.canon_url
            assert ":80/" not in r.canon_url

    def test_idempotent(self, spark):
        # canonicalizing a canonical URL is a no-op
        for r in weburl.url_canonicalize(spark, SF).collect():
            assert _canon(r.canon_url) == r.canon_url


class TestUrlDedup:
    def test_groups_match_pure_python(self, spark):
        dids = [r.doc_id for r in
                documents(spark, SF).select("doc_id").collect()]
        groups = collections.defaultdict(list)
        for did in dids:
            groups[_canon(_messy_url(did))].append(did)
        exp = {u: ds for u, ds in groups.items() if len(ds) >= 2}
        rows = weburl.url_dedup(spark, SF).collect()
        assert {r.canon_url for r in rows} == set(exp)
        for r in rows:
            ds = sorted(exp[r.canon_url])
            assert r.n_docs == len(ds)
            assert r.survivor == ds[0]
            assert r.doc_ids == ",".join(map(str, ds))


class TestPiiScrub:
    def _planted(self, did, text):
        m = did % 4
        if m == 0:
            return f"{text} contact user{did}@example.com now"
        if m == 1:
            return f"{text} server 10.{did % 200}.{(did * 7) % 250}" \
                   f".{did % 100} up"
        if m == 2:
            return f"{text} call 555-{(did * 37) % 10000:04d}"
        return text

    def test_counts_and_hash(self, spark):
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        rows = {r.doc_id: r
                for r in weburl.pii_scrub(spark, SF).collect()}
        assert set(rows) == set(docs)
        for did, text in docs.items():
            full = self._planted(did, text)
            scrubbed = re.sub(weburl.PHONE_RE, "<PHONE>",
                              re.sub(weburl.IPV4_RE, "<IP>",
                                     re.sub(weburl.EMAIL_RE, "<EMAIL>",
                                            full)))
            r = rows[did]
            assert (r.n_emails, r.n_ipv4, r.n_phones) == (
                len(re.findall(weburl.EMAIL_RE, full)),
                len(re.findall(weburl.IPV4_RE, full)),
                len(re.findall(weburl.PHONE_RE, full)))
            assert r.scrub_md5 == hashlib.md5(
                scrubbed.encode()).hexdigest()
            # each planted class is found at least once
            m = did % 4
            if m < 3:
                assert [r.n_emails, r.n_ipv4, r.n_phones][m] >= 1


class TestCurationDecisions:
    def test_priority_and_signals(self, spark):
        rows = {r.doc_id: r for r in
                weburl.curation_decisions(spark, SF).collect()}
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        assert set(rows) == set(docs)
        # pure-Python recompute of every signal + the priority chain
        ctext = {d: (weburl.BOILER_TEXT
                     if d % weburl.BOILER_MOD == weburl.BOILER_RES
                     else t) for d, t in docs.items()}
        first = {}
        for d in sorted(ctext):
            first.setdefault(ctext[d], d)
        ev_grams = set()
        toks = {d: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
                for d, s in ctext.items()}
        for d, ts in toks.items():
            if d % weburl.EVAL_MOD == 0:
                ev_grams |= {" ".join(ts[i:i + 3])
                             for i in range(len(ts) - 2)}
        import math

        def r4(x):
            return math.floor(x * 10000 + 0.5) / 10000

        for d, r in rows.items():
            ts = toks[d]
            if first[ctext[d]] != d:
                exp = "exact_dup"
            elif d % weburl.EVAL_MOD == 0:
                exp = "eval_split"
            elif len(ts) < weburl.MIN_TOKENS:
                exp = "too_short"
            elif r4(1 - len(set(ts)) / len(ts)) > weburl.REP_MAX:
                exp = "repetitive"
            else:
                grams = {" ".join(ts[i:i + 3])
                         for i in range(len(ts) - 2)}
                cont = (r4(len(grams & ev_grams) / len(grams))
                        if grams else 0.0)
                exp = ("contaminated" if cont > weburl.CONT_MAX
                       else "keep")
            assert r.reason == exp, (d, r.reason, exp)
            assert r.keep == (exp == "keep")


class TestPackShards:
    def test_contiguous_and_budgeted(self, spark):
        docs = sorted((r.doc_id, r.n_chars) for r in
                      documents(spark, SF).collect())
        start, exp = 0, collections.defaultdict(
            lambda: [0, 0, None, None])
        for did, n in docs:
            s = start // weburl.SHARD_BUDGET
            e = exp[s]
            e[0] += 1
            e[1] += n
            e[2] = did if e[2] is None else e[2]
            e[3] = did
            start += n
        rows = weburl.pack_shards(spark, SF).collect()
        assert {r.shard_id for r in rows} == set(exp)
        for r in rows:
            assert ([r.n_docs, r.n_chars, r.doc_lo, r.doc_hi]
                    == exp[r.shard_id])
        # shards are contiguous doc_id ranges
        srt = sorted(rows, key=lambda r: r.shard_id)
        for a, b in zip(srt, srt[1:]):
            assert a.doc_hi < b.doc_lo


class TestBoilerplateStrip:
    def _lined(self, did, text):
        # concatenation semantics, mirroring _lined_text exactly
        out = ""
        if did % 2 == 0:
            out += weburl.BP_NAV + "\n"
        if did % 5 < 2:
            out += weburl.BP_PROMO + "\n"
        out += text
        if did % 3 == 0:
            out += "\n" + weburl.BP_FOOTER
        return out

    def test_matches_pure_python(self, spark):
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        lines = {did: self._lined(did, t).split("\n")
                 for did, t in docs.items()}
        ldf = collections.Counter()
        for ls in lines.values():
            for line in set(ls):
                ldf[line] += 1
        rows = {r.doc_id: r
                for r in weburl.boilerplate_strip(spark, SF).collect()}
        assert set(rows) == set(docs)
        for did, ls in lines.items():
            kept = [x for x in ls if ldf[x] < weburl.BP_DF]
            r = rows[did]
            assert r.n_lines == len(ls)
            assert r.n_dropped == len(ls) - len(kept)
            exp = hashlib.md5("\n".join(kept).encode()).hexdigest()
            assert r.clean_md5 == exp

    def test_strip_removes_planted_only(self, spark):
        docs = {r.doc_id: r.text
                for r in documents(spark, SF).collect()}
        rows = {r.doc_id: r
                for r in weburl.boilerplate_strip(spark, SF).collect()}
        planted = {weburl.BP_NAV, weburl.BP_PROMO, weburl.BP_FOOTER}
        for did, text in docs.items():
            # the content line always survives (unique per doc)
            exp = hashlib.md5(text.encode()).hexdigest()
            assert rows[did].clean_md5 == exp
        cat = {r.line for r in
               weburl.boilerplate_catalog(spark, SF).collect()}
        assert cat == planted
