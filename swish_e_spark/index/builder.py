"""Distributed inverted-index builder — the Spark rebuild of swish-e's
index path (cmd_index lifecycle, SURVEY.md §3.1).

Pipeline (one extraction pass per shard, per the north rule):

1. **Shard slicing** — the pages table is split into S url-range shards
   (boundaries sampled once, persisted in the manifest). Each shard is
   built and committed independently; a completed shard is never
   recomputed (checkpoint/resume ≈ the reference's atomic temp-file
   rename, /root/reference/src/config.h:107-129).
2. **Extract + tokenize** (`mapInPandas`, Arrow-batched): HTML/XML/TXT →
   per-doc row with nested postings. Dense doc_ids ordered by url are
   assigned from per-partition offsets computed over the *persisted*
   stage output, so the assignment is exact regardless of partitioner
   sampling: doc_id = shard_base + offset[pid] + local_idx.
3. **Partial pack** (map-side combine): within each partition, posting
   rows are packed into compressed chunk rows per (term, field) — the
   analogue of the reference's per-10k-doc chunk coalescing
   (coalesce_word_locations, /root/reference/src/index.c:2811-2994).
   Head terms thus ship as O(partitions) packed chunks, not O(docs) rows.
4. **Salted merge shuffle**: chunks shuffle on (term_bucket, salt) where
   heavy partial chunks get a spreading salt and light ones salt 0, so
   Zipf-head terms fan out across reducers while tail-term fragments
   consolidate (two-level combine-then-merge; north rule skew handling).
5. **Segment write**: parquet partitioned by term_bucket, rows sorted by
   (term, field, chunk_doc_lo) — term lookups prune on the bucket
   directory plus parquet min/max on term (the Spark equivalent of the
   reference's word-hash + sorted word list,
   /root/reference/src/search.c:1618-1629).

Every kernel is an Arrow-batched pandas iterator; there is no
row-at-a-time Python UDF and no driver-side collect of data rows.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import zlib
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd

from ..codec.postings import pack_posting_list, unpack_posting_list
from ..textproc.extractor import extract
from ..textproc.tokenizer import TokenizerConfig, tokenize_doc

TOKENIZED_SCHEMA = (
    "pid int, local_idx long, url string, title string, doc_len long, "
    "size long, warc_ts timestamp, description string, lang string, "
    "postings array<struct<field: string, term: string, "
    "positions: array<int>, structures: binary>>"
)

DOCS_SCHEMA_COLS = ["doc_id", "url", "title", "doc_len", "size",
                    "warc_ts", "description", "lang"]

CHUNK_SCHEMA = (
    "term_bucket int, term string, field string, doc_lo long, doc_hi long, "
    "df long, cf long, docs_bin binary, tfs_bin binary, dls_bin binary, "
    "pos_bin binary, structs_bin binary, block_doc_lo array<long>, "
    "block_doc_hi array<long>, block_max_tf array<int>, "
    "block_min_dl array<int>"
)


@dataclass
class IndexConfig:
    n_buckets: int = 16          # term-hash segment partitions
    chunk_docs: int = 32768      # max postings per chunk row
    salt_partitions: int = 8     # reducer fan-out for heavy chunks
    salt_threshold: int = 4096   # partial df at/above which salt applies
    stem: bool = False
    index_comments: bool = False
    buzzwords: tuple = ()
    stopwords: tuple | None = None  # None = DEFAULT_STOPWORDS
    flush_docs: int = 10000      # map-side combine flush interval
                                 # (INDEX_DEFAULT_CHUNK_SIZE,
                                 #  /root/reference/src/config.h:346)

    def tokenizer_config(self) -> TokenizerConfig:
        from ..textproc.stopwords import DEFAULT_STOPWORDS

        return TokenizerConfig(
            stem=self.stem,
            buzzwords=frozenset(self.buzzwords),
            stopwords=(DEFAULT_STOPWORDS if self.stopwords is None
                       else frozenset(self.stopwords)),
        )


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term → bucket hash, identical on build and query
    side (crc32 is stable across platforms/Python versions)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def doctype_of_url(url: str) -> str:
    if url.endswith(".txt") or "/txt/" in url:
        return "txt"
    if url.endswith(".xml") or "/xml/" in url:
        return "xml"
    return "html"


# --------------------------------------------------------------------
# Stage kernels (executed on executors via mapInPandas)
# --------------------------------------------------------------------

def _extract_tokenize_iter(batches, cfg: IndexConfig):
    """Stage-2 kernel: pages batches → tokenized per-doc rows."""
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    tok_cfg = cfg.tokenizer_config()
    local_idx = 0
    for pdf in batches:
        out = {k: [] for k in ("local_idx", "url", "title", "doc_len",
                               "size", "warc_ts", "description", "lang",
                               "postings")}
        for url, html, warc_ts, lang in zip(
                pdf["url"], pdf["html"], pdf["warc_ts"], pdf["lang"]):
            blob = bytes(html) if html is not None else b""
            doc = extract(blob, doctype=doctype_of_url(url),
                          index_comments=cfg.index_comments)
            if doc.noindex:
                continue
            postings, doc_len = tokenize_doc(doc, tok_cfg)
            plist = [
                {"field": f, "term": t,
                 "positions": np.asarray(p.positions, dtype=np.int32),
                 "structures": bytes(bytearray(p.structures))}
                for (f, t), p in postings.items()
            ]
            out["local_idx"].append(local_idx)
            out["url"].append(url)
            out["title"].append(doc.title)
            out["doc_len"].append(doc_len)
            out["size"].append(len(blob))
            out["warc_ts"].append(warc_ts)
            out["description"].append(doc.description)
            out["lang"].append(lang)
            out["postings"].append(plist)
            local_idx += 1
        if out["url"]:
            res = pd.DataFrame(out)
            res.insert(0, "pid", pid)
            yield res


class _RunPacker:
    """Streams sorted (term, field, doc_id) posting rows and emits packed
    chunk rows per (term, field) run, flushing at chunk_docs postings."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.key = None
        self.doc_ids: list = []
        self.tfs: list = []
        self.positions: list = []
        self.structs: list = []
        self.doc_lens: list = []
        self.rows: list = []

    def _flush(self):
        if not self.doc_ids:
            return
        term, field = self.key
        packed = pack_posting_list(
            np.asarray(self.doc_ids, dtype=np.int64),
            np.asarray(self.tfs, dtype=np.int64),
            np.concatenate(self.positions) if self.positions
            else np.empty(0, dtype=np.int64),
            np.frombuffer(b"".join(self.structs), dtype=np.uint8),
            np.asarray(self.doc_lens, dtype=np.int64),
        )
        self.rows.append({
            "term_bucket": term_bucket(term, self.cfg.n_buckets),
            "term": term, "field": field,
            "doc_lo": int(self.doc_ids[0]), "doc_hi": int(self.doc_ids[-1]),
            **packed,
        })
        self.doc_ids, self.tfs = [], []
        self.positions, self.structs, self.doc_lens = [], [], []

    def push(self, term, field, doc_id, positions, structures, doc_len):
        key = (term, field)
        if key != self.key:
            self._flush()
            self.key = key
        elif len(self.doc_ids) >= self.cfg.chunk_docs:
            self._flush()
        self.doc_ids.append(doc_id)
        self.tfs.append(len(positions))
        self.positions.append(np.asarray(positions, dtype=np.int64))
        self.structs.append(bytes(structures) if structures is not None
                            else b"")
        self.doc_lens.append(doc_len)

    def drain(self):
        rows, self.rows = self.rows, []
        if rows:
            return pd.DataFrame(rows)[[c.split(" ")[0].strip() for c in
                                       CHUNK_SCHEMA.split(", ")]]
        return None


def _partial_pack_iter(batches, cfg: IndexConfig):
    """Stage-3 kernel: sorted posting rows → packed partial chunk rows."""
    packer = _RunPacker(cfg)
    for pdf in batches:
        for term, field, doc_id, positions, structures, doc_len in zip(
                pdf["term"], pdf["field"], pdf["doc_id"],
                pdf["positions"], pdf["structures"], pdf["doc_len"]):
            packer.push(term, field, int(doc_id), positions, structures,
                        int(doc_len))
        if len(packer.rows) >= 64:
            out = packer.drain()
            if out is not None:
                yield out
    packer._flush()
    out = packer.drain()
    if out is not None:
        yield out


def _merge_chunks_iter(batches, cfg: IndexConfig):
    """Stage-4 kernel: partial chunks sorted by (term, field, doc_lo) →
    coalesced final chunks. Small adjacent chunks are decoded and
    re-packed together; chunks already ≥ chunk_docs/2 pass through
    untouched (sort-merge consolidation, the -M merge analogue,
    /root/reference/src/merge.c:77-400)."""
    half = cfg.chunk_docs // 2
    state = {"key": None, "buf": [], "buf_docs": 0, "out": []}

    def flush_buf():
        if not state["buf"]:
            return
        term, field = state["key"]
        if len(state["buf"]) == 1:
            row = state["buf"][0]
        else:
            d_all, t_all, p_all, s_all, dl_all = [], [], [], [], []
            for r in state["buf"]:
                d, t, p, s, dl = unpack_posting_list(
                    r["docs_bin"], r["tfs_bin"], r["pos_bin"],
                    r["structs_bin"], r["dls_bin"])
                d_all.append(d)
                t_all.append(t)
                p_all.append(p)
                s_all.append(s)
                dl_all.append(dl)
            doc_ids = np.concatenate(d_all)
            packed = pack_posting_list(
                doc_ids, np.concatenate(t_all), np.concatenate(p_all),
                np.concatenate(s_all), np.concatenate(dl_all))
            row = {"term_bucket": state["buf"][0]["term_bucket"],
                   "term": term, "field": field,
                   "doc_lo": int(doc_ids[0]), "doc_hi": int(doc_ids[-1]),
                   **packed}
        state["out"].append(row)
        state["buf"], state["buf_docs"] = [], 0

    cols = [c.split(" ")[0].strip() for c in CHUNK_SCHEMA.split(", ")]
    for pdf in batches:
        for rec in pdf.to_dict("records"):
            key = (rec["term"], rec["field"])
            if key != state["key"]:
                flush_buf()
                state["key"] = key
            if rec["df"] >= half:
                flush_buf()
                state["out"].append(rec)
                continue
            if state["buf_docs"] + rec["df"] > cfg.chunk_docs:
                flush_buf()
            state["buf"].append(rec)
            state["buf_docs"] += rec["df"]
        if len(state["out"]) >= 128:
            yield pd.DataFrame(state["out"])[cols]
            state["out"] = []
    flush_buf()
    if state["out"]:
        yield pd.DataFrame(state["out"])[cols]


# --------------------------------------------------------------------
# Driver orchestration
# --------------------------------------------------------------------

def _manifest_dir(out_dir):
    return os.path.join(out_dir, "_manifest")


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".temp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)  # the reference's .temp-rename discipline


def shard_boundaries(pages_df, n_shards: int):
    """Url-range shard boundaries from a seeded sample (driver-side,
    tiny). Returns sorted list of n_shards-1 boundary urls."""
    if n_shards <= 1:
        return []
    sample = [r.url for r in
              pages_df.select("url").sample(0.1, seed=42).limit(200000)
              .collect()]
    if len(sample) < n_shards:
        sample = [r.url for r in pages_df.select("url").collect()]
    sample.sort()
    step = len(sample) / n_shards
    return [sample[int(step * i)] for i in range(1, n_shards)]


def build_index(spark, pages_df, out_dir: str,
                cfg: IndexConfig | None = None,
                n_shards: int = 1, resume: bool = True,
                fail_after_shard: int | None = None):
    """Build the full inverted index at ``out_dir``.

    ``fail_after_shard`` aborts after committing shard i (kill/resume
    tests). Returns the manifest dict.
    """
    from pyspark.sql import functions as F

    from ..shipping import ship_package

    ship_package(spark)
    cfg = cfg or IndexConfig()
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    index_meta_path = os.path.join(_manifest_dir(out_dir), "index.json")

    if resume and os.path.exists(index_meta_path):
        meta = json.load(open(index_meta_path))
        if meta.get("complete"):
            return meta
        bounds = meta["shard_bounds"]
    else:
        bounds = shard_boundaries(pages_df, n_shards)
        meta = {"config": asdict(cfg), "n_shards": n_shards,
                "shard_bounds": bounds, "complete": False}
        _atomic_write_json(index_meta_path, meta)

    doc_base = 0
    total = {"docs": 0, "tokens": 0, "postings": 0}
    for shard_id in range(n_shards):
        shard_path = os.path.join(_manifest_dir(out_dir),
                                  f"shard_{shard_id}.json")
        if resume and os.path.exists(shard_path):
            sm = json.load(open(shard_path))
            doc_base += sm["doc_count"]
            for k in total:
                total[k] += sm.get(k.rstrip("s") + "_count",
                                   sm.get(k + "_count", 0))
            continue
        lo = bounds[shard_id - 1] if shard_id > 0 else None
        hi = bounds[shard_id] if shard_id < len(bounds) else None
        shard_df = pages_df
        if lo is not None:
            shard_df = shard_df.filter(F.col("url") >= lo)
        if hi is not None:
            shard_df = shard_df.filter(F.col("url") < hi)
        sm = _build_shard(spark, shard_df, out_dir, cfg, shard_id,
                          doc_base)
        _atomic_write_json(shard_path, sm)
        doc_base += sm["doc_count"]
        total["docs"] += sm["doc_count"]
        total["tokens"] += sm["token_count"]
        total["postings"] += sm["posting_count"]
        if fail_after_shard is not None and shard_id == fail_after_shard:
            raise RuntimeError(f"injected failure after shard {shard_id}")

    meta.update(complete=True, doc_count=total["docs"],
                token_count=total["tokens"],
                posting_count=total["postings"])
    _atomic_write_json(index_meta_path, meta)
    return meta


def _build_shard(spark, shard_df, out_dir, cfg: IndexConfig,
                 shard_id: int, doc_base: int):
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    n_parts = max(shard_df.rdd.getNumPartitions(), 1)

    # stage 2: extract + tokenize (one pass over html)
    sorted_pages = (shard_df
                    .repartitionByRange(n_parts, "url")
                    .sortWithinPartitions("url"))
    tokenized = sorted_pages.mapInPandas(
        lambda it: _extract_tokenize_iter(it, cfg), schema=TOKENIZED_SCHEMA)
    tokenized.persist(StorageLevel.DISK_ONLY)

    # dense doc_id = doc_base + offset[pid] + local_idx, offsets computed
    # over the persisted output (exact, partitioner-independent)
    counts = {r["pid"]: r["cnt"] for r in
              tokenized.groupBy("pid").agg(F.count("*").alias("cnt"))
              .collect()}
    offsets, acc = {}, doc_base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    doc_count = acc - doc_base
    offs_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "pid int, base long")
    with_ids = (tokenized.join(F.broadcast(offs_df), "pid")
                .withColumn("doc_id", F.col("base") + F.col("local_idx"))
                .drop("base"))

    # docs table
    docs = with_ids.select(*DOCS_SCHEMA_COLS)
    docs_tmp = os.path.join(out_dir, f"_tmp_docs_{shard_id}")
    docs.write.mode("overwrite").parquet(docs_tmp)
    _commit_dir(docs_tmp, os.path.join(out_dir, "docs", f"shard={shard_id}"))
    token_count = (docs.agg(F.sum("doc_len")).collect()[0][0] or 0)

    # stage 3+4: explode postings (JVM-side), partial pack, salted merge
    exploded = (with_ids
                .select("doc_id", "doc_len",
                        F.explode("postings").alias("p"))
                .select("doc_id", "doc_len",
                        F.col("p.field").alias("field"),
                        F.col("p.term").alias("term"),
                        F.col("p.positions").alias("positions"),
                        F.col("p.structures").alias("structures")))
    partials = (exploded
                .sortWithinPartitions("term", "field", "doc_id")
                .mapInPandas(lambda it: _partial_pack_iter(it, cfg),
                             schema=CHUNK_SCHEMA))
    n_reduce = max(cfg.n_buckets, n_parts)
    salted = partials.withColumn(
        "salt",
        F.when(F.col("df") >= cfg.salt_threshold,
               F.pmod(F.xxhash64("term", "doc_lo"),
                      F.lit(cfg.salt_partitions)))
        .otherwise(F.lit(0)))
    merged = (salted
              .repartition(n_reduce, "term_bucket", "salt")
              .drop("salt")
              .sortWithinPartitions("term", "field", "doc_lo")
              .mapInPandas(lambda it: _merge_chunks_iter(it, cfg),
                           schema=CHUNK_SCHEMA))

    seg_tmp = os.path.join(out_dir, f"_tmp_segments_{shard_id}")
    (merged.write.mode("overwrite")
     .partitionBy("term_bucket").parquet(seg_tmp))
    _commit_dir(seg_tmp,
                os.path.join(out_dir, "segments", f"shard={shard_id}"))

    seg_df = spark.read.parquet(
        os.path.join(out_dir, "segments", f"shard={shard_id}"))
    posting_count = seg_df.agg(F.sum("df")).collect()[0][0] or 0
    tokenized.unpersist()
    return {
        "shard_id": shard_id, "doc_base": doc_base,
        "doc_count": int(doc_count), "token_count": int(token_count),
        "posting_count": int(posting_count),
        "input_partitions": n_parts, "wall_s": round(time.time() - t0, 2),
    }


def _commit_dir(tmp: str, final: str) -> None:
    if os.path.exists(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(tmp, final)


# --------------------------------------------------------------------
# Read-side helpers
# --------------------------------------------------------------------

class IndexHandle:
    """Open index: lazy docs/segments DataFrames + global stats."""

    def __init__(self, spark, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        self.meta = json.load(open(os.path.join(_manifest_dir(out_dir),
                                                "index.json")))
        if not self.meta.get("complete"):
            raise ValueError(f"index at {out_dir} is incomplete")
        self.cfg = IndexConfig(**self.meta["config"])
        self._stats = None

    def docs(self):
        return self.spark.read.parquet(os.path.join(self.out_dir, "docs"))

    def segments(self):
        return self.spark.read.parquet(
            os.path.join(self.out_dir, "segments"))

    @property
    def stats(self):
        if self._stats is None:
            from pyspark.sql import functions as F

            row = self.docs().agg(
                F.count("*").alias("n"),
                F.sum("doc_len").alias("total_len")).collect()[0]
            n = row["n"] or 0
            self._stats = {
                "n_docs": int(n),
                "avgdl": float(row["total_len"] / n) if n else 0.0,
            }
        return self._stats


def generate_pages_df(spark, n_docs: int, partitions: int = 32):
    """Distributed deterministic pages table (datagen.pages, parallelized
    with mapInPandas over a range — every row is a pure function of its
    doc_index, FIXTURES.md §1)."""
    from ..shipping import ship_package

    ship_package(spark)

    def gen(batches):
        from ..datagen.pages import generate_rows

        for pdf in batches:
            for start, end in zip(pdf["start"], pdf["end"]):
                rows = list(generate_rows(n_docs, int(start), int(end)))
                if rows:
                    yield pd.DataFrame(rows)[
                        ["url", "warc_ts", "html", "text", "lang"]]

    step = math.ceil(n_docs / partitions)
    ranges = [(i, min(i + step, n_docs)) for i in range(0, n_docs, step)]
    rdf = spark.createDataFrame(ranges, "start long, end long") \
        .repartition(len(ranges))
    return rdf.mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, "
                    "text string, lang string")
