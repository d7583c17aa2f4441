"""Driver contract for the spark-graft builder (PySpark target).

Queries map SURVEY.md §2's operator inventory plus the training-data
pipeline ops (dedup / similarity / text analysis) onto the driver's
testdata tables. Every entry has an exactly-equivalent DuckDB oracle
(rows + schema + value hash).

The ``engine_*`` entries exercise the REAL segment-backed engine
(index build via swish_e_spark.index.builder + distributed executor via
swish_e_spark.query.executor) and are still SQL-verifiable because the
neutralized tokenizer matches the SQL token CTE exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from swish_e_spark.ops import (
    ann_oracle, bpe, classify, dedup, engineq, events, fulltext,
    graph, hashfeat, multimodal, pipeline, pq, similarity, textstats,
    weburl,
)
from swish_e_spark.ops.corpus import DUCK_TOKS

_K1, _B = 1.2, 0.75


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the documents corpus at sf0.001."""
    return fulltext.bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # §2.6 query operators (index-free, SQL-checkable form)
        "term_stats": fulltext.term_stats,
        "postings_tf": fulltext.postings_tf,
        "bool_and": fulltext.bool_and,
        "bool_or": fulltext.bool_or,
        "bool_andnot": fulltext.bool_andnot,
        "phrase_adjacent": fulltext.phrase_adjacent,
        "near_window": fulltext.near_window,
        "prefix_tf": fulltext.prefix_tf,
        "bm25_topk": fulltext.bm25_topk,
        "limit_by_property": fulltext.limit_by_property,
        "property_sort_rank": fulltext.property_sort_rank,
        "prop_limit_date": fulltext.prop_limit_date,
        # segment-engine-backed (real index build + executor)
        "engine_bm25_topk": engineq.engine_bm25_topk,
        "engine_or_topk": engineq.engine_or_topk,
        "engine_phrase_match": engineq.engine_phrase_match,
        "engine_near_match": engineq.engine_near_match,
        "engine_near_chain": engineq.engine_near_chain,
        "engine_phrase3_match": engineq.engine_phrase3_match,
        "engine_not_complement": engineq.engine_not_complement,
        "engine_wildcard_match": engineq.engine_wildcard_match,
        "engine_wand_topk": engineq.engine_wand_topk,
        "engine_wand_warm_topk": engineq.engine_wand_warm_topk,
        "engine_rare_and": engineq.engine_rare_and,
        "engine_keyword_dump": engineq.engine_keyword_dump,
        "engine_batch_topk": engineq.engine_batch_topk,
        "engine_swishrank0_topk": engineq.engine_swishrank0_topk,
        "engine_swishrank1_topk": engineq.engine_swishrank1_topk,
        # r4: structure mask / metaname scope / -s sort / stopwords on
        # the HTML-wrapped rich corpus; -r/-u lifecycle; -M merge;
        # multi-index tape merge — all SQL-derivable by construction
        "engine_struct_title": engineq.engine_struct_title,
        "engine_meta_scope": engineq.engine_meta_scope,
        "engine_sort_title": engineq.engine_sort_title,
        "engine_stopword_query": engineq.engine_stopword_query,
        "engine_lifecycle_match": engineq.engine_lifecycle_match,
        "engine_snapshot_asof": engineq.engine_snapshot_asof,
        "engine_snapshot_diff": engineq.engine_snapshot_diff,
        "engine_merged_bm25": engineq.engine_merged_bm25,
        "engine_multi_index": engineq.engine_multi_index,
        # r4 (late): user doc properties (PropertyNames family) —
        # typed docs columns captured from meta tags; -L typed ranges
        # with IgnoreCase fold; -s fold-sorted
        "engine_user_props": engineq.engine_user_props,
        "engine_prop_sort_user": engineq.engine_prop_sort_user,
        # training-data pipeline: dedup
        "dedup_exact": dedup.dedup_exact,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_signatures": dedup.minhash_signatures,
        "lsh_candidate_pairs": dedup.lsh_candidate_pairs,
        "lsh_near_duplicates": dedup.lsh_near_duplicates,
        "lsh_dedup_clusters": dedup.lsh_dedup_clusters,
        "simhash64": dedup.simhash64,
        "simhash_near_duplicates": dedup.simhash_near_duplicates,
        "embedding_near_duplicates": dedup.embedding_near_duplicates,
        # training-data pipeline: similarity search
        "embedding_topk": similarity.embedding_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "semantic_duplicates": similarity.semantic_duplicates,
        "semantic_dedup": similarity.semantic_dedup,
        # r5 final: product-quantization ANN — the memory-bound scale
        # path (codes table = the index; ADC probe + exact rerank)
        "pq_codes": pq.pq_codes,
        "ann_pq_topk": pq.ann_pq_topk,
        "ann_ivfpq_topk": pq.ann_ivfpq_topk,
        # training-data pipeline: tokenizer training + application
        "bpe_merges": bpe.bpe_merges,
        "bpe_token_counts": bpe.bpe_token_counts,
        # training-data pipeline: multimodal binary-column plumbing
        "media_features": multimodal.media_features_q,
        "media_frame_sample": multimodal.media_frame_sample_q,
        "media_mp4_info": multimodal.media_mp4_info_q,
        "media_mp3_info": multimodal.media_mp3_info_q,
        # training-data pipeline: text analysis
        # r5 final: model-free hashed-TF-IDF doc vectors + text-only
        # cosine search over them (ops/hashfeat.py)
        "hashed_tfidf": hashfeat.hashed_tfidf,
        "tfidf_cosine_topk": hashfeat.tfidf_cosine_topk,
        "langid_heuristic": textstats.langid_heuristic,
        "quality_score": textstats.quality_score,
        "token_count": textstats.token_count,
        "fingerprint": textstats.fingerprint,
        "docstats": textstats.docstats,
        # training-data pipeline: corpus curation
        "quality_repetition": pipeline.quality_repetition,
        "contamination_overlap": pipeline.contamination_overlap,
        "domain_stats": pipeline.domain_stats,
        "sample_stratified": pipeline.sample_stratified,
        "dup_passages": pipeline.dup_passages,
        "dup_passage_catalog": pipeline.dup_passage_catalog,
        "quality_unigram_lm": pipeline.quality_unigram_lm,
        "incremental_dedup": pipeline.incremental_dedup,
        "mixture_weights": pipeline.mixture_weights,
        # event telemetry: batch forms of the streaming session/window
        # aggregations (exact integer-ms oracles, ops/events.py)
        "sessionize": events.sessionize,
        "event_rollup": events.event_rollup,
        # r5 final: weak-supervision quality classifier + leakage-safe
        # split assignment (ops/classify.py)
        "quality_nb_model": classify.quality_nb_model,
        "quality_nb_scores": classify.quality_nb_scores,
        "leakage_safe_splits": classify.leakage_safe_splits,
        # r5: web-scale corpus hygiene (planted deterministic inputs,
        # see ops/weburl.py docstring)
        "url_canonicalize": weburl.url_canonicalize,
        "url_dedup": weburl.url_dedup,
        "pii_scrub": weburl.pii_scrub,
        "curation_decisions": weburl.curation_decisions,
        "pack_shards": weburl.pack_shards,
        # r5 final: CCNet-style line-hash boilerplate removal — the
        # cleaning TRANSFORM (not just the signal): global line df,
        # drop >= BP_DF lines, md5-pinned rebuilt text
        "boilerplate_strip": weburl.boilerplate_strip,
        "boilerplate_catalog": weburl.boilerplate_catalog,
        # r5 final: planted-link-graph PageRank (document prior /
        # crawl-frontier signal; generated k-round CTE oracle)
        "link_pagerank": graph.link_pagerank,
    }


def _bm25_sql(terms: str, require_all: int | None, k: int = 10) -> str:
    both = (f"having count(distinct t) = {require_all}"
            if require_all else "")
    return f"""
with {DUCK_TOKS},
dl as (select doc_id, count(*) as dl from toks where t <> ''
       group by doc_id),
st as (select (select count(*) from documents) as nd,
              (select avg(dl) from dl) as avgdl),
tf as (select doc_id, t, count(*) as tf from toks
       where t in ({terms}) group by doc_id, t),
idf as (select t, count(*) as df from tf group by t),
raw as (
  select tf.doc_id,
         sum( ln((st.nd - idf.df + 0.5)/(idf.df + 0.5) + 1.0)
              * tf.tf * ({_K1} + 1.0)
              / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / st.avgdl))
            ) as s
  from tf join idf using (t) join dl using (doc_id) cross join st
  group by tf.doc_id {both}
  order by s desc, tf.doc_id asc limit {k})
select doc_id, cast(round(s, 4) as double) as score from raw"""


def _batch_sql(k: int = 10) -> str:
    """DuckDB oracle for engine_batch_topk: one shared BM25 leaf-score
    CTE, then every battery query derived independently from it (the
    structural spec lives in engineq.BATCH_BATTERY — same source the
    engine battery runs). Every scored query has ≤2 leaves, so the SQL
    float sum is order-free (commutative)."""
    from swish_e_spark.ops.engineq import BATCH_BATTERY

    all_terms = sorted({t for spec in BATCH_BATTERY
                        for t in spec[3]})
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    ctes = []
    selects = []
    for spec in BATCH_BATTERY:
        qid, _, kind, terms = spec[0], spec[1], spec[2], spec[3]
        tl = ", ".join(f"'{t}'" for t in terms)
        if kind == "term":
            body = (f"select '{qid}' as query_id, doc_id, "
                    f"sum(s) as score from sc where t in ({tl}) "
                    f"group by doc_id")
        elif kind == "and":
            body = (f"select '{qid}' as query_id, doc_id, "
                    f"sum(s) as score from sc where t in ({tl}) "
                    f"group by doc_id having count(distinct t) = 2")
        elif kind == "or":
            body = (f"select '{qid}' as query_id, doc_id, "
                    f"sum(s) as score from sc where t in ({tl}) "
                    f"group by doc_id")
        elif kind == "andnot":
            body = (f"select '{qid}' as query_id, doc_id, "
                    f"sum(s) as score from sc where t = '{terms[0]}' "
                    f"and doc_id not in (select doc_id from toks "
                    f"where t = '{terms[1]}') group by doc_id")
        elif kind == "phrase":
            ctes.append(
                f"m{qid} as (select distinct a.doc_id from toks a "
                f"join toks b on a.doc_id = b.doc_id "
                f"and b.p = a.p + 1 "
                f"where a.t = '{terms[0]}' and b.t = '{terms[1]}')")
            body = (f"select '{qid}' as query_id, sc.doc_id, "
                    f"sum(s) as score from sc join m{qid} "
                    f"using (doc_id) where sc.t in ({tl}) "
                    f"group by sc.doc_id")
        elif kind == "near":
            dist = spec[4]
            ctes.append(
                f"m{qid} as (select distinct a.doc_id from toks a "
                f"join toks b on a.doc_id = b.doc_id "
                f"and abs(a.p - b.p) <= {dist} "
                f"where a.t = '{terms[0]}' and b.t = '{terms[1]}')")
            body = (f"select '{qid}' as query_id, sc.doc_id, "
                    f"sum(s) as score from sc join m{qid} "
                    f"using (doc_id) where sc.t in ({tl}) "
                    f"group by sc.doc_id")
        else:
            raise ValueError(kind)
        ctes.append(
            f"{qid} as (select query_id, doc_id, "
            f"cast(round(score, 4) as double) as score from ({body}) "
            f"order by score desc, doc_id asc limit {k})")
        selects.append(f"select * from {qid}")
    union = " union all ".join(selects)
    extra = ",\n".join(ctes)
    return f"""
with {DUCK_TOKS},
dl as (select doc_id, count(*) as dl from toks where t <> ''
       group by doc_id),
st as (select (select count(*) from documents) as nd,
              (select avg(dl) from dl) as avgdl),
tf as (select doc_id, t, count(*) as tf from toks
       where t in ({in_list}) group by doc_id, t),
idf as (select t, count(*) as df from tf group by t),
sc as (select tf.doc_id, tf.t,
              ln((st.nd - idf.df + 0.5)/(idf.df + 0.5) + 1.0)
              * tf.tf * ({_K1} + 1.0)
              / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / st.avgdl))
                as s
       from tf join idf using (t) join dl using (doc_id) cross join st),
{extra}
{union}
order by query_id, score desc, doc_id"""


def oracle_sql() -> dict[str, str]:
    toks = DUCK_TOKS
    stop = "'the','a','an','of','and','to','in','is','it','on'"
    # shared by lsh_near_duplicates and lsh_dedup_clusters (which takes
    # the transitive closure of these verified pairs)
    # shared by simhash64 and simhash_near_duplicates
    simhash_ctes = f"""with {toks},
tk as (select doc_id, t, count(*) as tf from toks where t <> ''
       group by doc_id, t),
h as (select doc_id, tf, md5_number_lower(t) as hu from tk),
bits as (select doc_id, j,
                sum(case when (hu >> j) & 1 = 1 then tf
                         else -tf end) as s
         from h cross join range(64) r(j) group by doc_id, j),
acc as (select doc_id,
               sum(case when s > 0 then
                        case when j = 63 then -9223372036854775808
                             else (cast(1 as bigint) << j) end
                   else cast(0 as bigint) end) as simhash
        from bits group by doc_id)"""
    lsh_pairs = f"""
with {toks},
sh0 as (select distinct a.doc_id,
              a.t || ' ' || b.t || ' ' || c.t as sh
       from toks a
       join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
       join toks c on a.doc_id = c.doc_id and c.p = a.p + 2
       where a.t <> '' and b.t <> '' and c.t <> ''),
sh as (select sh0.* from sh0
       join (select sh from sh0 group by sh having count(*) <= 100)
         using (sh)),
sig as (select doc_id, i,
               min(md5(cast(i as varchar) || ':' || sh)) as sig
        from sh cross join range(128) r(i) group by doc_id, i),
banded as (select doc_id, cast(i // 8 as int) as band,
                  min(case when i % 8 = 0 then sig end) as s0,
                  min(case when i % 8 = 1 then sig end) as s1,
                  min(case when i % 8 = 2 then sig end) as s2,
                  min(case when i % 8 = 3 then sig end) as s3,
                  min(case when i % 8 = 4 then sig end) as s4,
                  min(case when i % 8 = 5 then sig end) as s5,
                  min(case when i % 8 = 6 then sig end) as s6,
                  min(case when i % 8 = 7 then sig end) as s7
           from sig group by 1, 2),
cand as (select x.doc_id as a, y.doc_id as b from banded x
         join banded y on x.band = y.band and x.s0 = y.s0 and x.s1 = y.s1 and x.s2 = y.s2 and x.s3 = y.s3 and x.s4 = y.s4 and x.s5 = y.s5 and x.s6 = y.s6 and x.s7 = y.s7
                     and x.doc_id < y.doc_id
         group by 1, 2),
ds as (select doc_id, count(*) as n from sh group by doc_id),
shared as (select c.a, c.b, count(*) as shared from cand c
           join sh xa on xa.doc_id = c.a
           join sh xb on xb.doc_id = c.b and xb.sh = xa.sh
           group by 1, 2)
select s.a, s.b,
       cast(round(s.shared * 1.0 / (da.n + db.n - s.shared), 4)
            as double) as jac
from shared s
join ds da on da.doc_id = s.a
join ds db on db.doc_id = s.b
where s.shared * 1.0 / (da.n + db.n - s.shared) >= 0.8
order by s.a, s.b"""
    return {
        "term_stats": f"""
with {toks}
select t as term, count(distinct doc_id) as df, count(*) as cf
from toks where t <> '' group by t
order by cf desc, term asc limit 100""",
        "postings_tf": f"""
with {toks}
select doc_id, count(*) as tf from toks where t = 'join'
group by doc_id order by doc_id""",
        "bool_and": f"""
with {toks}
select doc_id from toks where t = 'hash'
intersect select doc_id from toks where t = 'join' order by doc_id""",
        "bool_or": f"""
with {toks}
select doc_id from toks where t = 'vector'
union select doc_id from toks where t = 'stream' order by doc_id""",
        "bool_andnot": f"""
with {toks}
select doc_id from toks where t = 'hash'
except select doc_id from toks where t = 'join' order by doc_id""",
        "phrase_adjacent": f"""
with {toks}
select distinct a.doc_id from toks a
join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
where a.t = 'hash' and b.t = 'join' order by a.doc_id""",
        "near_window": f"""
with {toks}
select distinct a.doc_id from toks a
join toks b on a.doc_id = b.doc_id and abs(a.p - b.p) <= 4
where a.t = 'merge' and b.t = 'batch' order by a.doc_id""",
        "prefix_tf": f"""
with {toks}
select doc_id, count(*) as tf_sum from toks where t like 'sc%'
group by doc_id order by doc_id""",
        "bm25_topk": _bm25_sql("'hash','join'", None),
        "limit_by_property": f"""
with {toks}
select d.doc_id, d.lang, d.n_chars from documents d
join (select distinct doc_id from toks where t = 'join') h
  using (doc_id)
where d.lang = 'en' and d.n_chars between 200 and 400
order by d.doc_id""",
        "property_sort_rank": """
select doc_id, n_chars,
       dense_rank() over (order by n_chars desc) as size_rank
from documents order by doc_id""",
        "prop_limit_date": """
select user_id, count(*) as n from events
where event_type = 'click'
  and ts >= timestamp '2024-01-10' and ts < timestamp '2024-01-20'
group by user_id order by n desc, user_id asc limit 20""",
        # engine-backed
        "engine_bm25_topk": _bm25_sql("'hash','join'", 2),
        "engine_or_topk": _bm25_sql("'vector','stream'", None),
        "engine_phrase_match": f"""
with {toks}
select distinct a.doc_id from toks a
join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
where a.t = 'hash' and b.t = 'join' order by a.doc_id""",
        "engine_near_match": f"""
with {toks}
select distinct a.doc_id from toks a
join toks b on a.doc_id = b.doc_id and abs(a.p - b.p) <= 4
where a.t = 'merge' and b.t = 'batch' order by a.doc_id""",
        "engine_near_chain": f"""
with {toks},
a as (select doc_id, p from toks where t = 'merge'),
b as (select doc_id, p from toks where t = 'batch'),
c as (select doc_id, p from toks where t = 'data'),
vb as (select distinct b.doc_id, b.p from b
       join a on a.doc_id = b.doc_id and abs(a.p - b.p) <= 4),
ka as (select distinct a.doc_id, a.p from a
       join vb on vb.doc_id = a.doc_id and abs(a.p - vb.p) <= 4)
select distinct c.doc_id from c
where exists (select 1 from ka
              where ka.doc_id = c.doc_id and abs(ka.p - c.p) <= 4)
  and exists (select 1 from vb
              where vb.doc_id = c.doc_id and abs(vb.p - c.p) <= 4)
order by c.doc_id""",
        "engine_phrase3_match": f"""
with {toks}
select distinct a.doc_id from toks a
join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
join toks c on a.doc_id = c.doc_id and c.p = a.p + 2
where a.t = 'stream' and b.t = 'table' and c.t = 'hash'
order by a.doc_id""",
        "engine_not_complement": f"""
with {toks}
select d.doc_id, cast(1000.0 as double) as score from documents d
where d.doc_id not in (select doc_id from toks where t = 'hash')
order by d.doc_id""",
        "engine_wildcard_match": f"""
with {toks}
select distinct doc_id from toks where t like 'sc%' order by doc_id""",
        "engine_wand_topk": _bm25_sql("'hash','join'", 2),
        "engine_wand_warm_topk": _bm25_sql("'hash','join'", 2),
        "engine_batch_topk": _batch_sql(),
        "engine_rare_and": f"""
with {toks}
select doc_id from toks where t = 'dup'
intersect select doc_id from toks where t = 'hash' order by doc_id""",
        "engine_keyword_dump": f"""
with {toks}
select t as term, count(distinct doc_id) as df, count(*) as cf
from toks where t like 'sc%' and t <> ''
group by t order by term""",
        "engine_swishrank0_topk": f"""
with {toks},
tf as (select doc_id, t, count(*) as tf from toks
       where t in ('hash','join') group by doc_id, t),
r as (select doc_id, t,
             cast(floor(ln(1.0 + tf) * 10000 + 0.5) as bigint) // 100
               as r from tf)
select a.doc_id,
       greatest((a.r + b.r) // 2, 1) as rank
from r a join r b on a.doc_id = b.doc_id
where a.t = 'hash' and b.t = 'join'
order by rank desc, a.doc_id asc limit 10""",
        "engine_swishrank1_topk": f"""
with {toks},
dl as (select doc_id, count(*) as dl from toks where t <> ''
       group by doc_id),
st as (select (select count(*) from documents) as nd,
              (select count(*) from toks where t <> '') as total_len),
tf as (select doc_id, t, count(*) as tf from toks
       where t in ('hash','join') group by doc_id, t),
dfs as (select t, count(*) as df from tf group by t),
r as (select tf.doc_id, tf.t,
             cast(floor(ln(greatest(
                 1 + (greatest(1, (greatest(st.total_len // st.nd, 1)
                                   * 1000 // dl.dl) * tf.tf)
                      * greatest(1, cast(floor(ln(greatest(
                            st.nd // dfs.df, 1)) * 1000) as bigint))
                      // 100) * tf.tf, 1)) * 10000 + 0.5) as bigint)
               as r
      from tf join dfs using (t) join dl using (doc_id) cross join st)
select a.doc_id,
       greatest((a.r + b.r) // 2, 1) as rank
from r a join r b on a.doc_id = b.doc_id
where a.t = 'hash' and b.t = 'join'
order by rank desc, a.doc_id asc limit 10""",
        # r4 engine entries over the rich (HTML-wrapped) corpus: title
        # = first three non-empty tokens, doclang meta = lang column,
        # index+query stopwords ('a','an','the')
        "engine_struct_title": f"""
with {toks},
nz as (select doc_id, t,
              row_number() over (partition by doc_id order by p) as rn
       from toks where t <> '')
select distinct doc_id from nz where t = 'hash' and rn <= 3
order by doc_id""",
        "engine_meta_scope": f"""
with {toks}
select distinct d.doc_id from documents d
join toks k on k.doc_id = d.doc_id and k.t = 'hash'
where d.lang = 'en' order by d.doc_id""",
        "engine_sort_title": f"""
with {toks},
nz as (select doc_id, t,
              row_number() over (partition by doc_id order by p) as rn
       from toks where t <> ''),
ttl as (select doc_id, string_agg(t, ' ' order by rn) as title
        from nz where rn <= 3 group by doc_id),
m as (select distinct doc_id from toks where t = 'hash')
select m.doc_id, ttl.title from m join ttl using (doc_id)
order by ttl.title asc, m.doc_id asc limit 20""",
        "engine_stopword_query": f"""
with {toks}
select distinct doc_id from toks where t = 'hash' order by doc_id""",
        # r4 lifecycle: every 7th doc removed (-r), every 11th doc's
        # body replaced by 'updatedmarker' (-u; replace wins over the
        # earlier removal for doc ids divisible by 77)
        "engine_lifecycle_match": f"""
with {toks}
select distinct doc_id from toks
where t = 'hash' and doc_id % 7 <> 0 and doc_id % 11 <> 0
union
select doc_id from documents where doc_id % 11 = 0
order by doc_id""",
        # r4 snapshot time travel: querying AS OF the pre-mutation
        # snapshot of the lifecycle index must see the ORIGINAL corpus
        # — the -r/-u mutations above are invisible through the pinned
        # v1 manifest, so the oracle is the plain full-corpus match set
        "engine_snapshot_asof": f"""
with {toks}
select distinct doc_id from toks where t = 'hash' order by doc_id""",
        # r4 snapshot CDC (build snapshot -> current): -r tombstoned
        # every 7th doc; -u re-added every 11th url under a NEW doc id
        # (so %77 docs — removed then replaced — report 'replaced')
        "engine_snapshot_diff": """
select doc_id, 'removed' as change from documents
where doc_id % 7 = 0 and doc_id % 11 <> 0
union all
select doc_id, 'replaced' as change from documents
where doc_id % 11 = 0
order by doc_id""",
        # r4 merge (-M): merged halves carry the SAME global stats as a
        # r4 (late): user properties — the prop index wraps doc_id <
        # 2000 with meta tags cat=lang-source (string, IgnoreCase),
        # nchars=n_chars (numeric), stamp=1000000000+doc_id (date
        # epoch); -L applies the numeric range AND the case-folded
        # string range (docprop.c:1139-1200)
        "engine_user_props": """
select doc_id,
       (lang || '-' || source) as prop_cat,
       n_chars as prop_nchars,
       (1000000000 + doc_id) as prop_stamp
from documents
where doc_id < 2000
  and n_chars between 200 and 400
  and lower(lang || '-' || source) between 'a' and 'm'
order by doc_id""",
        "engine_prop_sort_user": f"""
with {toks},
m as (select distinct doc_id from toks
      where t = 'hash' and doc_id < 2000)
select m.doc_id, (d.lang || '-' || d.source) as cat
from m join documents d using (doc_id)
order by lower(d.lang || '-' || d.source) asc, m.doc_id asc
limit 25""",
        # from-scratch build, so the oracle is engine_bm25_topk's SQL
        "engine_merged_bm25": _bm25_sql("'hash','join'", 2),
        # r4 multi-index tape merge: PER-INDEX statistics (each half's
        # own df/N/avgdl), h = doc_id % 2 is the source index
        "engine_multi_index": f"""
with {toks},
dl as (select doc_id, doc_id % 2 as h, count(*) as dl from toks
       where t <> '' group by 1, 2),
nds as (select doc_id % 2 as h, count(*) as nd from documents
        group by 1),
st as (select nds.h, nds.nd, avg(dl.dl) as avgdl from nds
       join dl on dl.h = nds.h group by 1, 2),
tf as (select doc_id, doc_id % 2 as h, count(*) as tf from toks
       where t = 'dup' group by 1, 2),
idf as (select h, count(*) as df from tf group by h)
select cast(tf.h as int) as engine_idx, tf.doc_id,
       cast(round(ln((st.nd - idf.df + 0.5)/(idf.df + 0.5) + 1.0)
            * tf.tf * ({_K1} + 1.0)
            / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / st.avgdl)),
            4) as double) as score
from tf join idf using (h) join st using (h) join dl using (doc_id)
order by tf.doc_id""",
        # dedup
        "dedup_exact": """
select md5(text) as h, count(*) as n, min(doc_id) as first_doc
from documents group by 1 order by h limit 200""",
        "ngram_jaccard_pairs": f"""
with {toks},
sh0 as (select distinct a.doc_id,
              a.t || ' ' || b.t || ' ' || c.t as sh
       from toks a
       join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
       join toks c on a.doc_id = c.doc_id and c.p = a.p + 2
       where a.t <> '' and b.t <> '' and c.t <> ''),
sh as (select sh0.* from sh0
       join (select sh from sh0 group by sh having count(*) <= 100)
         using (sh)),
ds as (select doc_id, count(*) as n from sh group by doc_id),
pairs as (select x.doc_id as a, y.doc_id as b, count(*) as shared
          from sh x join sh y
            on x.sh = y.sh and x.doc_id < y.doc_id
          group by 1, 2),
j as (select a, b,
             cast(round(shared * 1.0 / (da.n + db.n - shared), 4)
                  as double) as jac
      from pairs
      join ds da on da.doc_id = pairs.a
      join ds db on db.doc_id = pairs.b)
select a, b, jac from j where jac >= 0.8 order by a, b""",
        "minhash_signatures": f"""
with {toks},
sh0 as (select distinct a.doc_id,
              a.t || ' ' || b.t || ' ' || c.t as sh
       from toks a
       join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
       join toks c on a.doc_id = c.doc_id and c.p = a.p + 2
       where a.t <> '' and b.t <> '' and c.t <> ''),
sh as (select sh0.* from sh0
       join (select sh from sh0 group by sh having count(*) <= 100)
         using (sh))
select doc_id, cast(i as int) as i,
       min(md5(cast(i as varchar) || ':' || sh)) as sig
from sh cross join range(128) r(i)
group by doc_id, i order by doc_id, i""",
        "lsh_candidate_pairs": f"""
with {toks},
sh0 as (select distinct a.doc_id,
              a.t || ' ' || b.t || ' ' || c.t as sh
       from toks a
       join toks b on a.doc_id = b.doc_id and b.p = a.p + 1
       join toks c on a.doc_id = c.doc_id and c.p = a.p + 2
       where a.t <> '' and b.t <> '' and c.t <> ''),
sh as (select sh0.* from sh0
       join (select sh from sh0 group by sh having count(*) <= 100)
         using (sh)),
sig as (select doc_id, i,
               min(md5(cast(i as varchar) || ':' || sh)) as sig
        from sh cross join range(128) r(i) group by doc_id, i),
banded as (select doc_id, cast(i // 8 as int) as band,
                  min(case when i % 8 = 0 then sig end) as s0,
                  min(case when i % 8 = 1 then sig end) as s1,
                  min(case when i % 8 = 2 then sig end) as s2,
                  min(case when i % 8 = 3 then sig end) as s3,
                  min(case when i % 8 = 4 then sig end) as s4,
                  min(case when i % 8 = 5 then sig end) as s5,
                  min(case when i % 8 = 6 then sig end) as s6,
                  min(case when i % 8 = 7 then sig end) as s7
           from sig group by 1, 2)
select x.doc_id as a, y.doc_id as b from banded x
join banded y on x.band = y.band and x.s0 = y.s0 and x.s1 = y.s1 and x.s2 = y.s2 and x.s3 = y.s3 and x.s4 = y.s4 and x.s5 = y.s5 and x.s6 = y.s6 and x.s7 = y.s7
            and x.doc_id < y.doc_id
group by 1, 2 order by 1, 2""",
        "lsh_near_duplicates": lsh_pairs,
        "lsh_dedup_clusters": f"""
WITH RECURSIVE pairs AS ({lsh_pairs}),
nodes AS (SELECT a AS doc_id FROM pairs UNION SELECT b FROM pairs),
edges AS (SELECT a AS s, b AS d FROM pairs
          UNION SELECT b AS s, a AS d FROM pairs),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.doc_id)
SELECT doc_id, MIN(lbl) AS canonical_id
FROM reach GROUP BY doc_id ORDER BY doc_id""",
        "simhash64": f"""
{simhash_ctes}
select doc_id, cast(simhash as bigint) as simhash from acc
order by doc_id""",
        # exact all-pairs popcount filter: the engine's k+1-band
        # pigeonhole candidates are lossless for Hamming <= k, so the
        # brute-force oracle must agree row-for-row
        "simhash_near_duplicates": f"""
{simhash_ctes},
sim as (select doc_id, cast(simhash as bigint) as simhash from acc)
select a.doc_id as doc_id_a, b.doc_id as doc_id_b,
       cast(bit_count(xor(a.simhash, b.simhash)) as integer)
         as hamming
from sim a join sim b on a.doc_id < b.doc_id
where bit_count(xor(a.simhash, b.simhash)) <= 3
order by doc_id_a, doc_id_b""",
        # similarity — the ANN oracles re-derive the seeded hyperplanes
        # / k-means centroids as SQL literals (swish_e_spark/ops/
        # ann_oracle.py): both ANN paths are deterministic, so the gate
        # is an exact value compare, not a recall heuristic
        "ann_lsh_topk": ann_oracle.ann_lsh_topk_sql(),
        "ann_ivf_topk": ann_oracle.ann_ivf_topk_sql(),
        "semantic_duplicates": ann_oracle.semantic_duplicates_sql(),
        "semantic_dedup": ann_oracle.semantic_dedup_sql(),
        # PQ oracles inline the re-derived codebooks/luts as literals
        "pq_codes": pq.pq_codes_sql(),
        "ann_pq_topk": pq.ann_pq_topk_sql(),
        "ann_ivfpq_topk": pq.ann_ivfpq_topk_sql(),
        "bpe_merges": bpe.bpe_merges_sql(),
        "bpe_token_counts": bpe.bpe_token_counts_sql(),
        # embedding-cosine near-dup: the oracle replays the identical
        # deterministic augmentation + seeded LSH banding + exact
        # cosine verify (see dedup.embedding_near_duplicates docstring)
        "embedding_near_duplicates": ann_oracle.embedding_near_dup_sql(),
        "embedding_topk": """
with q as (select embedding::DOUBLE[] as v from embeddings
           where vec_id = 0)
select e.vec_id,
       cast(round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4)
            as double) as cos
from embeddings e, q where e.vec_id <> 0
order by cos desc, e.vec_id asc limit 10""",
        # multimodal plumbing
        "media_features": """
select doc_id as media_id,
       case cast(doc_id % 3 as int) when 0 then 'image'
            when 1 then 'audio' else 'video' end as kind,
       cast(octet_length(encode(text)) as bigint) as n_bytes,
       sha256(text) as sha256
from documents order by media_id""",
        "media_frame_sample": """
with v as (select doc_id, octet_length(encode(text)) as nb
           from documents where doc_id % 3 = 2),
f as (select doc_id as media_id,
             cast(unnest(range(0, greatest(nb // 64, 1), 4)) as int)
               as frame_idx
      from v)
select media_id, frame_idx, cast(frame_idx * 40 as int) as ts_ms
from f order by media_id, frame_idx""",
        # the Spark side BUILDS a valid one-track MP4 per video doc and
        # PARSES it back (box walk + stts/stsc/stsz/stco resolution);
        # the oracle re-derives the expected numbers from the same
        # doc_id arithmetic: n = 4 + doc_id%13 samples of size
        # 32 + (doc_id + 17*i)%64, 40 ms per sample
        "media_mp4_info": """
with v as (select doc_id from documents where doc_id % 3 = 2),
s as (select doc_id, unnest(range(0, 4 + doc_id % 13)) as i from v)
select v.doc_id as media_id,
       'isom' as brand,
       cast(4 + v.doc_id % 13 as int) as n_samples,
       cast((4 + v.doc_id % 13) * 40 as bigint) as duration_ms,
       (select sum(32 + (s.doc_id + 17 * s.i) % 64) from s
        where s.doc_id = v.doc_id) as media_bytes,
       cast(0 as bigint) as first_dts,
       cast((4 + v.doc_id % 13 - 1) * 40 as bigint) as last_dts
from v order by media_id""",
        # CBR MPEG-1 Layer III streams (8 + doc_id%24 frames, bitrate
        # index 1 + doc_id%14, samplerate index doc_id%3, mono when
        # doc_id is odd); the Spark side WALKS the frames to recover
        # these — the oracle inlines the public bitrate/samplerate
        # tables and the 1152-samples-per-frame duration arithmetic
        "media_mp3_info": """
with a as (select doc_id, 1 + doc_id % 14 as bi, doc_id % 3 as si,
                  8 + doc_id % 24 as nf
           from documents where doc_id % 3 = 1),
b as (select *,
        1000 * case bi when 1 then 32 when 2 then 40 when 3 then 48
          when 4 then 56 when 5 then 64 when 6 then 80 when 7 then 96
          when 8 then 112 when 9 then 128 when 10 then 160
          when 11 then 192 when 12 then 224 when 13 then 256
          else 320 end as br,
        case si when 0 then 44100 when 1 then 48000
          else 32000 end as sr
      from a)
select doc_id as media_id, cast(nf as int) as n_frames,
       cast(nf * 1152 * 1000 // sr as bigint) as duration_ms,
       cast(sr as int) as samplerate,
       cast(case doc_id % 2 when 1 then 1 else 2 end as int)
         as channels,
       cast(br as int) as bitrate
from b order by media_id""",
        # text analysis
        "langid_heuristic": f"""
with {toks},
sc as (
 select doc_id, 'en' as cand, count(*) as hits from toks
   where t in ('the','a','of','and','to','in','is') group by 1
 union all
 select doc_id, 'es', count(*) from toks
   where t in ('el','la','de','que','y','los') group by 1
 union all
 select doc_id, 'fr', count(*) from toks
   where t in ('le','la','et','les','des','un') group by 1
 union all
 select doc_id, 'de', count(*) from toks
   where t in ('der','die','und','das','ein','nicht') group by 1),
best as (select doc_id, cand, hits,
                row_number() over (partition by doc_id
                                   order by hits desc, cand asc) as rn
         from sc)
select d.doc_id, coalesce(b.cand, 'und') as pred_lang,
       coalesce(b.hits, 0) as hits
from documents d
left join (select * from best where rn = 1) b using (doc_id)
order by d.doc_id""",
        "quality_score": f"""
with {toks}
select doc_id, count(*) as n_tokens,
 cast(round(count(distinct t) * 1.0 / count(*), 4) as double) as ttr,
 cast(round(sum(case when t in ({stop}) then 1 else 0 end) * 1.0
            / count(*), 4) as double) as stop_ratio,
 cast(round(sum(length(t)) * 1.0 / count(*), 4) as double)
   as mean_tok_len
from toks where t <> '' group by doc_id order by doc_id""",
        "token_count": r"""
select doc_id,
 len(list_filter(regexp_split_to_array(text, '\s+'),
                 x -> x <> '')) as n_ws_tokens,
 len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> x <> '')) as n_re_tokens,
 length(text) as n_chars_exact
from documents order by doc_id""",
        "fingerprint": r"""
select doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) as fp
from documents order by doc_id""",
        "docstats": """
select lang, count(*) as n_docs,
       cast(round(avg(n_chars), 4) as double) as avg_chars,
       cast(sum(n_chars) as bigint) as total_chars
from documents group by lang order by lang""",
        # corpus curation
        "quality_repetition": f"""
with {toks},
tk as (select doc_id, t, p from toks where t <> ''),
base as (select doc_id, count(*) as n_tokens,
                count(distinct t) as n_types
         from tk group by doc_id),
bgsrc as (select doc_id, t,
                 lead(t) over (partition by doc_id order by p) as nt
          from tk),
bg as (select doc_id, t || ' ' || nt as bigram from bgsrc
       where nt is not null),
bgc as (select doc_id, bigram, count(*) as c from bg group by 1, 2),
top as (select doc_id, bigram as top_bigram, c as top_c from (
          select *, row_number() over (partition by doc_id
                    order by c desc, bigram asc) as rn from bgc)
        where rn = 1),
nbg as (select doc_id, count(*) as n_bigrams from bg group by 1)
select base.doc_id, n_tokens,
  cast(round(1.0 - n_types * 1.0 / n_tokens, 4) as double)
    as dup_word_frac,
  coalesce(top_bigram, '') as top_bigram,
  cast(coalesce(round(top_c * 1.0 / n_bigrams, 4), 0.0) as double)
    as top_bigram_frac
from base left join nbg using (doc_id) left join top using (doc_id)
order by base.doc_id""",
        "contamination_overlap": f"""
with {toks},
tk as (select doc_id, t, p from toks where t <> ''),
gsrc as (select doc_id, t,
                lead(t, 1) over (partition by doc_id order by p) as t1,
                lead(t, 2) over (partition by doc_id order by p) as t2
         from tk),
g as (select distinct doc_id, t || ' ' || t1 || ' ' || t2 as gram
      from gsrc where t2 is not null),
ev as (select distinct gram, 1 as hit from g
       where doc_id % {pipeline.EVAL_MOD} = 0)
select doc_id, count(*) as n_grams,
  cast(sum(coalesce(hit, 0)) as bigint) as n_contaminated,
  cast(round(sum(coalesce(hit, 0)) * 1.0 / count(*), 4) as double)
    as contamination
from g left join ev using (gram)
where doc_id % {pipeline.EVAL_MOD} <> 0
group by doc_id order by doc_id""",
        "domain_stats": """
select source, count(*) as n_docs,
  count(distinct lang) as n_langs,
  cast(round(avg(n_chars), 4) as double) as avg_chars,
  cast(sum(n_chars) as bigint) as total_chars,
  cast(round(count(*) * 1.0 / (select count(*) from documents), 4)
       as double) as doc_share
from documents group by source order by source""",
        "sample_stratified": f"""
select doc_id, lang, strat_rank, n_chars from (
  select doc_id, lang, n_chars,
         row_number() over (partition by lang
             order by md5(cast(doc_id as varchar)), doc_id)
           as strat_rank
  from documents)
where strat_rank <= {pipeline.STRAT_QUOTA}
order by lang, strat_rank""",
        "dup_passages": f"""
with {toks},
tk as (select doc_id, t, p from toks where t <> ''),
tkn as (select doc_id, t,
               row_number() over (partition by doc_id order by p) as q
        from tk),
pas as (select doc_id, (q-1)//{pipeline.PASSAGE_W} as win,
               string_agg(t, ' ' order by q) as passage,
               count(*) as wlen
        from tkn group by doc_id, (q-1)//{pipeline.PASSAGE_W}),
fp as (select doc_id, passage from pas
       where wlen = {pipeline.PASSAGE_W}),
cnt as (select passage, count(distinct doc_id) as nd
        from fp group by passage),
per as (select doc_id, count(*) as n_passages,
               sum(case when nd >= 2 then 1 else 0 end) as n_dup
        from fp join cnt using (passage) group by doc_id)
select d.doc_id,
       cast(coalesce(n_passages, 0) as bigint) as n_passages,
       cast(coalesce(n_dup, 0) as bigint) as n_dup_passages,
       cast(coalesce(round(n_dup * 1.0 / n_passages, 4), 0.0)
            as double) as dup_passage_frac
from documents d left join per using (doc_id)
order by d.doc_id""",
        "dup_passage_catalog": f"""
with {toks},
tk as (select doc_id, t, p from toks where t <> ''),
tkn as (select doc_id, t,
               row_number() over (partition by doc_id order by p) as q
        from tk),
pas as (select doc_id, (q-1)//{pipeline.PASSAGE_W} as win,
               string_agg(t, ' ' order by q) as passage,
               count(*) as wlen
        from tkn group by doc_id, (q-1)//{pipeline.PASSAGE_W}),
fp as (select doc_id, passage from pas
       where wlen = {pipeline.PASSAGE_W})
select passage, count(distinct doc_id) as n_docs,
       cast(count(*) as bigint) as n_occ
from fp group by passage
having count(distinct doc_id) >= 2
order by n_docs desc, n_occ desc, passage""",
        "quality_unigram_lm": f"""
with {toks},
tk as (select doc_id, t, p from toks where t <> ''),
dt as (select doc_id, t, count(*) as tf from tk group by 1, 2),
lm as (select t, sum(tf) as c from dt group by 1),
tot as (select sum(c) as n_total from lm),
per as (select doc_id, sum(tf) as n_tokens,
               sum(tf * log2(c)) as s_log2c,
               sum(case when c <= {pipeline.RARE_C} then tf else 0 end)
                 as n_rare
        from dt join lm using (t) group by doc_id)
select doc_id, cast(n_tokens as bigint) as n_tokens,
  cast(round(log2(n_total) - s_log2c / n_tokens, 4) as double)
    as bits_per_token,
  cast(round(n_rare * 1.0 / n_tokens, 4) as double) as rare_frac
from per cross join tot
order by doc_id""",
        "incremental_dedup": f"""
with d as (select doc_id,
             md5(case when doc_id % {pipeline.DUP_PLANT_MOD} = 0
                   then 'boilerplate page ' ||
                        cast(doc_id % {pipeline.DUP_PLANT_K} as varchar)
                   else text end) as content_md5
           from documents),
base as (select content_md5, min(doc_id) as base_doc_id,
                count(*) as n_base_dups
         from d where doc_id % {pipeline.DELTA_MOD}
                      <> {pipeline.DELTA_MOD - 1}
         group by 1)
select doc_id, content_md5,
  cast(case when base_doc_id is not null then 1 else 0 end as int)
    as is_dup,
  cast(coalesce(base_doc_id, -1) as bigint) as base_doc_id,
  cast(coalesce(n_base_dups, 0) as bigint) as n_base_dups
from d left join base using (content_md5)
where doc_id % {pipeline.DELTA_MOD} = {pipeline.DELTA_MOD - 1}
order by doc_id""",
        "mixture_weights": f"""
with d as (select lang,
             len(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+'), x -> x <> '')) as n_toks
           from documents),
per as (select lang, count(*) as n_docs, sum(n_toks) as n_tokens
        from d group by 1),
tot as (select sum(n_tokens) as total_tokens, count(*) as n_langs
        from per)
select lang, n_docs, cast(n_tokens as bigint) as n_tokens,
  cast(round(n_tokens * 1.0 / total_tokens, 4) as double)
    as token_share,
  cast(round(least({pipeline.MIX_MAX_UP} * n_tokens,
                   total_tokens // n_langs) * 1.0 / n_tokens, 4)
       as double) as mix_weight,
  cast(least({pipeline.MIX_MAX_UP} * n_tokens,
             total_tokens // n_langs) as bigint) as eff_tokens
from per cross join tot
order by lang""",
        # r5: web-scale corpus hygiene — the SQL lives next to the
        # Spark column math in ops/weburl.py so the planted-input
        # synthesis and thresholds come from one set of constants
        "sessionize": events.sessionize_sql(),
        "event_rollup": events.event_rollup_sql(),
        "quality_nb_model": classify.quality_nb_model_sql(),
        "quality_nb_scores": classify.quality_nb_scores_sql(),
        "leakage_safe_splits": classify.leakage_safe_splits_sql(),
        "url_canonicalize": weburl.url_canonicalize_sql(),
        "url_dedup": weburl.url_dedup_sql(),
        "pii_scrub": weburl.pii_scrub_sql(),
        "curation_decisions": weburl.curation_decisions_sql(),
        "pack_shards": weburl.pack_shards_sql(),
        "boilerplate_strip": weburl.boilerplate_strip_sql(),
        "boilerplate_catalog": weburl.boilerplate_catalog_sql(),
        "link_pagerank": graph.link_pagerank_sql(),
        "hashed_tfidf": hashfeat.hashed_tfidf_sql(),
        "tfidf_cosine_topk": hashfeat.tfidf_cosine_topk_sql(),
    }
