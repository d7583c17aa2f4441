"""Semantic pins for the PQ ANN path (ops/pq.py) beyond the DuckDB
oracle gate: the codes match an independent brute-force L2 argmin, the
quantizer actually compresses (reconstruction beats the global-mean
baseline), and the ADC probe's exact-rerank columns agree with the
true cosine."""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import pq
from swish_e_spark.ops.corpus import embeddings

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = (embeddings(spark, SF).select("vec_id", "embedding")
            .orderBy("vec_id").collect())
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


class TestPqCodes:
    def test_codes_match_bruteforce_l2(self, spark):
        ids, mat = _vectors(spark)
        books = pq.train_codebooks(mat)
        sub = mat.shape[1] // pq.PQ_M
        rows = {r.vec_id: r for r in pq.pq_codes(spark, SF).collect()}
        assert set(rows) == set(ids.tolist())
        for i, vid in enumerate(ids.tolist()):
            r = rows[vid]
            for j, cents in enumerate(books):
                x = mat[i, j * sub:(j + 1) * sub]
                # independent formula: true squared L2, first-min
                d = ((cents - x) ** 2).sum(axis=1)
                assert r[f"c{j}"] == int(np.argmin(d)), (vid, j)

    def test_reconstruction_beats_mean_baseline(self, spark):
        _, mat = _vectors(spark)
        books = pq.train_codebooks(mat)
        sub = mat.shape[1] // pq.PQ_M
        err_pq = 0.0
        err_mean = 0.0
        for j, cents in enumerate(books):
            xs = mat[:, j * sub:(j + 1) * sub]
            d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            err_pq += d.min(axis=1).sum()
            mu = xs.mean(axis=0)
            err_mean += ((xs - mu) ** 2).sum()
        assert err_pq < 0.7 * err_mean

    def test_train_deterministic(self):
        rng = np.random.default_rng(3)
        sample = rng.standard_normal((256, 64))
        a = pq.train_codebooks(sample)
        b = pq.train_codebooks(sample)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


class TestAnnPqTopk:
    def test_cos_column_is_exact(self, spark):
        ids, mat = _vectors(spark)
        by_id = {int(v): mat[i] for i, v in enumerate(ids)}
        q = by_id[0]
        rows = pq.ann_pq_topk(spark, SF, query_vec_id=0, k=10).collect()
        assert len(rows) == 10
        for r in rows:
            v = by_id[r.vec_id]
            cos = float(v @ q / (np.linalg.norm(v)
                                 * np.linalg.norm(q)))
            assert abs(r.cos - math.floor(cos * 10000 + 0.5) / 10000) \
                < 1e-6
        # ranked by exact cosine desc
        cs = [r.cos for r in rows]
        assert cs == sorted(cs, reverse=True)

    def test_ivfpq_candidates_confined_to_probed_cells(self, spark):
        from swish_e_spark.ops.similarity import ivf_assign

        assign, cents = ivf_assign(spark, SF)
        cells = {r.vec_id: r.cell for r in assign.collect()}
        ids, mat = _vectors(spark)
        by_id = {int(v): mat[i] for i, v in enumerate(ids)}
        q = by_id[0]
        qn = q / np.linalg.norm(q)
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        probe = set(np.argsort(-(cn @ qn))[:4].tolist())
        rows = pq.ann_ivfpq_topk(spark, SF, query_vec_id=0,
                                 k=10).collect()
        assert 0 < len(rows) <= 10
        for r in rows:
            assert cells[r.vec_id] in probe
            v = by_id[r.vec_id]
            cos = float(v @ q / (np.linalg.norm(v)
                                 * np.linalg.norm(q)))
            assert abs(r.cos - math.floor(cos * 10000 + 0.5) / 10000) \
                < 1e-6

    def test_candidates_come_from_adc_top(self, spark):
        ids, mat = _vectors(spark)
        books = pq.train_codebooks(mat)
        sub = mat.shape[1] // pq.PQ_M
        by_id = {int(v): mat[i] for i, v in enumerate(ids)}
        q = by_id[0]
        lut = pq._lut(q, books, sub)
        # python ADC over python codes
        adc = {}
        for i, vid in enumerate(ids.tolist()):
            if vid == 0:
                continue
            s = 0.0
            for j, cents in enumerate(books):
                x = mat[i, j * sub:(j + 1) * sub]
                d = ((cents - x) ** 2).sum(axis=1)
                s += lut[j][int(np.argmin(d))]
            adc[vid] = s
        topc = sorted(adc, key=lambda v: (-adc[v], v))[:pq.PQ_RERANK_C]
        rows = pq.ann_pq_topk(spark, SF, query_vec_id=0, k=10).collect()
        assert {r.vec_id for r in rows} <= set(topc)
        for r in rows:
            assert abs(r.adc
                       - math.floor(adc[r.vec_id] * 10000 + 0.5)
                       / 10000) < 1e-6
