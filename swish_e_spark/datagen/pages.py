"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1-2).

Schema matches BASELINE.json `input_hint` exactly:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Every row is a pure function of ``(seed, doc_index, n_docs)`` — generation
is embarrassingly parallel, so the Spark builder generates shards with
``mapInPandas`` over a range DataFrame while the oracle generates the same
rows sequentially; both see identical bytes. No external data.

Document templates mirror the reference test fixtures
(/root/reference/tests/*.html|txt|xml, /root/reference/perl/t/*.html):
plain-html, meta-tags, xml-doc, phrase-doc, txt-doc, stem-doc, noise-doc.

Vocabulary: 30,000 syllable words, Zipfian s=1.07, plus probe terms:
``common0`` planted in ~40% of docs (head-term skew), ``tailterm{i}``
each in exactly 1-3 docs.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

SEED = 42
VOCAB_SIZE = 30_000
ZIPF_S = 1.07
CORPUS_VERSION = 3  # bump when render_page bytes change (bench cache key)

# Crawl-segment score clustering (corpus v3): real crawls are fetched
# site-by-site, so doc-id order correlates with site "profile" — 20% of
# contiguous SEGMENT_DOCS-doc segments are content-farm-like (short
# pages stuffing the head term), the rest article-like (long pages,
# head term incidental). Block-max metadata is per doc-range, so this
# clustering is what gives BM25 block bounds their spread: a block
# inside an article segment bounds at satur(tf<=2, long dl), far below
# the θ set by farm pages, and prunes. A corpus where every 128-posting
# block mixes both profiles has every block's bound near the max —
# that was corpus v2's residual flatness.
SEGMENT_DOCS = 2048
FARM_FRAC = 0.2

_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu ga ge gi "
    "go gu ka ke ki ko ku la le li lo lu ma me mi mo mu na ne ni no nu pa "
    "pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu va ve vi vo "
    "vu za ze zi zo zu"
).split()

_TEMPLATES = ("plain", "meta", "xml", "phrase", "txt", "stem", "noise")

PHRASE_SENTENCE = "once upon a time there was three little pigs and the wolf"
STEM_SENTENCE = ("run running runs ran runner connection connected "
                 "connecting hopeful hoping hopped sugar tested testing")

_vocab_cache = None
_zipf_cdf_cache = None


def vocabulary() -> list:
    """Deterministic 30k-word list (module-level memoized)."""
    global _vocab_cache
    if _vocab_cache is None:
        rng = np.random.default_rng(SEED)
        syl = np.array(_SYLLABLES)
        words = set()
        out = []
        while len(out) < VOCAB_SIZE:
            k = int(rng.integers(2, 5))
            w = "".join(rng.choice(syl, size=k))
            if w not in words:
                words.add(w)
                out.append(w)
        _vocab_cache = out
    return _vocab_cache


def _zipf_cdf() -> np.ndarray:
    global _zipf_cdf_cache
    if _zipf_cdf_cache is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        _zipf_cdf_cache = np.cumsum(p / p.sum())
    return _zipf_cdf_cache


def _sample_words(rng, n) -> list:
    u = rng.random(n)
    idx = np.searchsorted(_zipf_cdf(), u)
    vocab = vocabulary()
    return [vocab[i] for i in idx]


def template_of(doc_index: int) -> str:
    """Template mix: 40% plain, 10% each of the rest."""
    r = doc_index % 10
    if r < 4:
        return "plain"
    return _TEMPLATES[r - 3]


def page_url(doc_index: int) -> str:
    site = doc_index % 100
    tmpl = template_of(doc_index)
    return f"https://site{site:04d}.example/{tmpl}/{doc_index:06d}.html"


def segment_is_farm(doc_index: int) -> bool:
    """Content-farm segment flag — a pure function of the crawl
    segment, drawn from its own seeded stream so probe/body draws stay
    independent of it."""
    seg = doc_index // SEGMENT_DOCS
    srng = np.random.default_rng((SEED, 977, seg))
    return bool(srng.random() < FARM_FRAC)


def _probe_terms(doc_index: int, rng, farm: bool) -> list:
    """Planted probe terms: head term + tails + midterms (FIXTURES.md
    §2).

    The head term's tf is segment-correlated (corpus v3): content-farm
    segments stuff it (1 + scaled Pareto draw, capped), article
    segments carry it incidentally (tf 1-2). Real web text has
    heavy-tailed, site-correlated term frequencies, and BM25 block-max
    pruning only pays when block score bounds VARY BY DOC RANGE — a
    flat tf corpus puts θ at every block's bound and makes WAND
    evidence unmeasurable (round-2 verdict).

    midterm{i} (i < 10) each land in ~1/15,259 of docs (df ≈ 64 at 1M)
    — rare enough for a huge idf, common enough that df ≥ k=10 keeps θ
    at the rare-term score level: the query class where block-max WAND
    pays hardest."""
    out = []
    if doc_index % 5 < 2:          # ~40% of docs carry the head term
        if farm:
            tf = 1 + min(63, int(rng.pareto(1.1) * 6))
        else:
            tf = int(rng.integers(1, 3))
        out.extend(["common0"] * tf)
    if doc_index % 7 == 0:
        out.append("common1")
    for i in range(10):
        if (doc_index + 7919 * i) % 15259 == 367:
            out.append(f"midterm{i}")
    # tailterm{i} appears in docs 17+29*i .. +(i%3): df ∈ {1,2,3}
    if doc_index >= 17 and (doc_index - 17) % 29 == 0:
        i = (doc_index - 17) // 29
        out.append(f"tailterm{i}")
    if doc_index >= 18 and (doc_index - 18) % 29 == 0:
        i = (doc_index - 18) // 29
        if i % 3 >= 1:
            out.append(f"tailterm{i}")
    if doc_index >= 19 and (doc_index - 19) % 29 == 0:
        i = (doc_index - 19) // 29
        if i % 3 == 2:
            out.append(f"tailterm{i}")
    return out


def _paragraphs(rng, probes, farm: bool = False) -> str:
    # log-normal doc length, segment-correlated (corpus v3): farm pages
    # short (median ~40 words), article pages long (median ~130).
    # Varied dl is the other half of BM25 score skew — short docs score
    # far above long ones at equal tf — and the segment correlation
    # keeps each block's min_dl representative of its range instead of
    # every block bottoming out at the global minimum.
    if farm:
        total = int(np.exp(rng.normal(np.log(40.0), 0.5)))
        total = max(20, min(total, 140))
    else:
        total = int(np.exp(rng.normal(np.log(130.0), 0.6)))
        total = max(60, min(total, 2500))
    n_par = max(1, total // 45)
    paras = []
    for i in range(n_par):
        n_w = total // n_par + (1 if i < total % n_par else 0)
        words = _sample_words(rng, n_w)
        paras.append(" ".join(words))
    if probes:
        # plant probes at deterministic spots inside the first paragraph
        w = paras[0].split()
        for j, p in enumerate(probes):
            w.insert((7 * j + 3) % (len(w) + 1), p)
        paras[0] = " ".join(w)
    return "\n".join(f"<p>{p}</p>" for p in paras)


def render_page(doc_index: int):
    """Generate one page row: (url, warc_ts, html bytes, lang)."""
    rng = np.random.default_rng((SEED, doc_index))
    tmpl = template_of(doc_index)
    farm = segment_is_farm(doc_index)
    probes = _probe_terms(doc_index, rng, farm)
    title_words = " ".join(_sample_words(rng, int(rng.integers(2, 6))))
    lang_u = rng.random()
    lang = "en" if lang_u < 0.95 else ("es", "fr", "de")[int(lang_u * 1000) % 3]

    if tmpl == "plain":
        body = _paragraphs(rng, probes, farm)
        extra = _sample_words(rng, 6)
        html = (
            f"<html><head><title>{title_words}</title></head><body>\n"
            f"<h1>{extra[0]} {extra[1]}</h1>\n{body}\n"
            f"<p>so<b>me</b>thing Espa&ntilde;a <em>{extra[2]}</em> "
            f"<strong>{extra[3]}</strong></p>\n"
            f"<!--keywords {extra[4]} {extra[5]}-->\n"
            f"<h2>section {extra[0]}</h2>\n</body></html>"
        )
    elif tmpl == "meta":
        body = _paragraphs(rng, probes, farm)
        mwords = _sample_words(rng, 3)
        html = (
            f"<html><head><title>{title_words}</title>\n"
            f'<meta name="meta1" content="metatest1 {mwords[0]}">\n'
            f'<meta name="meta2" content="metatest2 {mwords[1]} {mwords[2]}">\n'
            f"</head><body>\n{body}\n</body></html>"
        )
    elif tmpl == "xml":
        words = _sample_words(rng, 12)
        probes_s = " ".join(probes)
        html = (
            "<?xml version=\"1.0\"?>\n<all>\n"
            f"<meta3>metatest3 {words[0]} {words[1]}</meta3>\n"
            f"<desc>{' '.join(words[2:8])} {probes_s}</desc>\n"
            f"<note>{' '.join(words[8:12])}</note>\n</all>"
        )
    elif tmpl == "phrase":
        body = _paragraphs(rng, probes, farm)
        html = (
            f"<html><head><title>{title_words}</title></head><body>\n"
            f"<p>{PHRASE_SENTENCE}</p>\n{body}\n"
            f"<p>the wolf said little pig little pig let me come in</p>\n"
            f"</body></html>"
        )
    elif tmpl == "txt":
        lines = [" ".join(_sample_words(rng, int(rng.integers(5, 12))))
                 for _ in range(int(rng.integers(3, 7)))]
        if probes:
            lines.insert(0, " ".join(probes))
        html = "\n".join(lines)
    elif tmpl == "stem":
        body = _paragraphs(rng, probes, farm)
        html = (
            f"<html><head><title>{title_words}</title></head><body>\n"
            f"<p>{STEM_SENTENCE}</p>\n{body}\n</body></html>"
        )
    else:  # noise
        body = _paragraphs(rng, probes, farm)
        longtok = "x" * 45
        noindex_meta = (
            '<meta name="robots" content="noindex">' if doc_index % 40 == 9
            else ""
        )
        html = (
            f"<html><head><title>{title_words}</title>{noindex_meta}</head>"
            f"<body>\n<p>{longtok} 7 42 1234 c++ q</p>\n"
            f"<!-- noindex --><p>hiddenword{doc_index % 10}</p><!-- index -->\n"
            f"{body}\n</body></html>"
        )

    ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=doc_index)
    doctype = "txt" if tmpl == "txt" else ("xml" if tmpl == "xml" else "html")
    return {
        "url": page_url(doc_index),
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "lang": lang,
        "doctype": doctype,
    }


def doctype_of_url(url: str) -> str:
    if "/txt/" in url:
        return "txt"
    if "/xml/" in url:
        return "xml"
    return "html"


def generate_rows(n_docs: int, start: int = 0, end: int | None = None):
    """Yield page dicts for doc_index in [start, end) — the text column is
    filled with the normative extracted text (oracle extractor)."""
    from ..textproc.extractor import extract

    end = n_docs if end is None else min(end, n_docs)
    for i in range(start, end):
        row = render_page(i)
        doc = extract(row["html"], doctype=row["doctype"])
        row["text"] = doc.body_text()
        del row["doctype"]
        yield row
