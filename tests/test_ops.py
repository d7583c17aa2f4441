"""Tests for the training-data pipeline ops: dedup correctness against
pure-Python references, ANN recall sanity, multimodal plumbing."""

import hashlib
import struct

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


class TestDedup:
    def test_simhash_matches_pure_python(self, spark):
        from swish_e_spark.ops.corpus import documents
        from swish_e_spark.ops.dedup import simhash64

        got = {r["doc_id"]: r["simhash"]
               for r in simhash64(spark, SF).collect()}
        # pure-python reference: md5 lower-64 hash family computed
        # with hashlib (independent of both Spark and DuckDB)
        import hashlib

        from pyspark.sql import functions as F

        from swish_e_spark.ops.corpus import tokens

        tk = (tokens(spark, SF).groupBy("doc_id", "t")
              .agg(F.count("*").alias("tf"))).collect()
        acc = {}
        for r in tk:
            v = acc.setdefault(r["doc_id"], np.zeros(64, dtype=np.int64))
            digest = hashlib.md5(r["t"].encode()).digest()
            h = np.uint64(int.from_bytes(digest[8:], "little"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            v += np.where(bits == 1, r["tf"], -r["tf"])
        for doc_id, v in acc.items():
            expect = 0
            for j in range(64):
                if v[j] > 0:
                    expect |= (1 << j)
            expect = expect - (1 << 64) if expect >= (1 << 63) else expect
            assert got[doc_id] == expect, doc_id

    def test_simhash_near_duplicates_equals_brute_force(self, spark):
        """The k+1-band pigeonhole candidates are LOSSLESS for
        Hamming <= k: banding + verify must equal the all-pairs
        popcount filter exactly (pairs, order, distances)."""
        from swish_e_spark.ops.dedup import (
            simhash64, simhash_near_duplicates,
        )

        sims = [(r["doc_id"], r["simhash"])
                for r in simhash64(spark, SF).collect()]
        brute = sorted(
            (a, b, bin((sa ^ sb) & ((1 << 64) - 1)).count("1"))
            for (a, sa) in sims for (b, sb) in sims
            if a < b
            and bin((sa ^ sb) & ((1 << 64) - 1)).count("1") <= 3)
        got = [(r["doc_id_a"], r["doc_id_b"], r["hamming"])
               for r in simhash_near_duplicates(spark, SF).collect()]
        assert got == brute
        assert brute, "fixture should contain at least one near-dup"

    def test_lsh_pairs_superset_of_high_jaccard(self, spark):
        """LSH candidates must contain every pair with very high
        3-gram Jaccard (band recall sanity)."""
        from swish_e_spark.ops.dedup import (
            lsh_candidate_pairs, ngram_jaccard_pairs,
        )

        exact = {(r["a"], r["b"])
                 for r in ngram_jaccard_pairs(spark, SF, 0.9).collect()}
        cands = {(r["a"], r["b"])
                 for r in lsh_candidate_pairs(spark, SF).collect()}
        missing = exact - cands
        assert not missing, f"LSH missed near-dups: {missing}"

    def test_connected_components_transitive(self, spark):
        """Min-label propagation resolves chains, cycles, and isolated
        pairs into components labelled by their smallest doc id."""
        from swish_e_spark.ops.dedup import connected_components

        pairs = spark.createDataFrame(
            # chain 5-3-9-7 (given out of order), cycle 20-21-22-20,
            # isolated pair 40-41
            [(5, 3), (9, 7), (3, 9), (20, 21), (21, 22), (22, 20),
             (40, 41)],
            "a long, b long")
        got = {r["doc_id"]: r["canonical_id"]
               for r in connected_components(pairs).collect()}
        assert got == {3: 3, 5: 3, 7: 3, 9: 3,
                       20: 20, 21: 20, 22: 20, 40: 40, 41: 40}

    def test_connected_components_empty(self, spark):
        from swish_e_spark.ops.dedup import connected_components

        pairs = spark.createDataFrame([], "a long, b long")
        assert connected_components(pairs).collect() == []

    def test_cluster_canonical_is_component_min(self, spark):
        """lsh_dedup_clusters rows = exactly the docs in >=1 verified
        pair; every canonical id is the min over its component computed
        independently (pure-python union-find over the pair list)."""
        from swish_e_spark.ops.dedup import (
            lsh_dedup_clusters, lsh_near_duplicates,
        )

        pairs = [(r["a"], r["b"])
                 for r in lsh_near_duplicates(spark, SF).collect()]
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {x: find(x) for x in parent}
        got = {r["doc_id"]: r["canonical_id"]
               for r in lsh_dedup_clusters(spark, SF).collect()}
        assert got == expect


class TestSimilarity:
    def test_ann_recall_over_seeded_queries(self, spark):
        """LSH-ANN recall CONTRACT (not a skippable heuristic): over
        several seeded queries, Hamming-1 multiprobe must recover the
        brute-force top-1 for at least 3/5 and keep each list
        cosine-sorted."""
        from swish_e_spark.ops.similarity import ann_lsh_topk, embedding_topk

        hits = 0
        queries = (0, 7, 13, 21, 34)
        for qid in queries:
            bf = embedding_topk(spark, SF, query_vec_id=qid,
                                k=1).collect()
            ann = ann_lsh_topk(spark, SF, query_vec_id=qid,
                               k=10).collect()
            ann_ids = [r["vec_id"] for r in ann]
            assert ann_ids, qid
            sims = [r["cos"] for r in ann]
            assert sims == sorted(sims, reverse=True), qid
            if bf[0]["vec_id"] in ann_ids:
                hits += 1
        assert hits >= 3, f"LSH-ANN top-1 recall {hits}/{len(queries)}"

    def test_ivf_recall(self, spark):
        from swish_e_spark.ops.similarity import (
            ann_ivf_topk, embedding_topk,
        )

        bf = {r["vec_id"] for r in
              embedding_topk(spark, SF, query_vec_id=0, k=10).collect()}
        ann = ann_ivf_topk(spark, SF, query_vec_id=0, k=10,
                           nprobe=4).collect()
        ann_ids = [r["vec_id"] for r in ann]
        sims = [r["cos"] for r in ann]
        assert sims == sorted(sims, reverse=True)
        # probing 4/16 cells must recover a good share of the true top-10
        recall = len(bf & set(ann_ids)) / 10
        assert recall >= 0.5, f"IVF recall too low: {recall}"

    def test_semantic_duplicates_planted_pairs(self, spark):
        """SemDeDup within-cell pairs: the planted (i, i+OFFSET)
        copies are found (minus any that straddle a k-means cell
        boundary — the paper's own approximation), every emitted
        cosine re-verifies in numpy above the threshold, and no
        cross-cell or background pair sneaks in."""
        from swish_e_spark.ops.dedup import EMB_AUG_OFFSET, EMB_EPS
        from swish_e_spark.ops.similarity import (
            SEM_TAU, semantic_duplicates,
        )

        rows = semantic_duplicates(spark, SF).collect()
        assert rows, "planted pairs must be found"
        emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
               for r in spark.read.parquet(
                   f"{SF}/embeddings.parquet").collect()}
        n_raw = len(emb)
        planted = 0
        for r in rows:
            a, b = r["vec_id_a"], r["vec_id_b"]
            assert b == a + EMB_AUG_OFFSET, (a, b)
            planted += 1
            va = emb[a]
            vb = va + np.where((a * 31 + np.arange(len(va))) % 2 == 1,
                               EMB_EPS, -EMB_EPS)
            cos = float(va @ vb / (np.linalg.norm(va)
                                   * np.linalg.norm(vb)))
            assert cos >= SEM_TAU
            assert abs(round(cos, 4) - r["cos"]) <= 1e-4
        # boundary-straddle loss only: recall stays near-total
        assert planted >= 0.9 * n_raw

    def test_semantic_dedup_components(self, spark):
        """Survivor selection: each planted (i, i+OFFSET) pair becomes
        a component whose canonical id is the raw (minimum) vec_id."""
        from swish_e_spark.ops.dedup import EMB_AUG_OFFSET
        from swish_e_spark.ops.similarity import (
            semantic_dedup, semantic_duplicates,
        )

        pairs = {(r["vec_id_a"], r["vec_id_b"])
                 for r in semantic_duplicates(spark, SF).collect()}
        cc = {r["vec_id"]: r["canonical_id"]
              for r in semantic_dedup(spark, SF).collect()}
        assert set(cc) == {v for p in pairs for v in p}
        for a, b in pairs:
            assert cc[a] == a and cc[b] == a
            assert b == a + EMB_AUG_OFFSET

    def test_ivf_assignment_covers_all(self, spark):
        from swish_e_spark.ops.corpus import embeddings
        from swish_e_spark.ops.similarity import ivf_assign

        assign, cents = ivf_assign(spark, SF)
        n = embeddings(spark, SF).count()
        assert assign.count() == n
        assert assign.select("vec_id").distinct().count() == n
        n_cells = assign.select("cell").distinct().count()
        assert 2 <= n_cells <= len(cents)


class TestMultimodal:
    def test_feature_extraction_shape(self, spark):
        from swish_e_spark.ops.multimodal import (
            N_FEATURES, extract_features, synthesize_media_df,
        )

        media = synthesize_media_df(spark, n=24)
        feats = extract_features(media, fake=True).collect()
        assert len(feats) == 24
        for r in feats:
            assert len(r["feature"]) == N_FEATURES
            assert r["sha256"] and r["n_bytes"] > 0

    def test_decode_stub_raises_without_fake(self, spark):
        from swish_e_spark.ops.multimodal import _decode_stub

        with pytest.raises(NotImplementedError):
            _decode_stub(b"xx", "image", fake=False)

    def test_sha_matches_local(self, spark):
        from swish_e_spark.ops.multimodal import (
            extract_features, synthesize_media_df,
        )

        media = synthesize_media_df(spark, n=8)
        payloads = {r["media_id"]: bytes(r["payload"])
                    for r in media.collect()}
        feats = {r["media_id"]: r["sha256"]
                 for r in extract_features(media, fake=True).collect()}
        for mid, payload in payloads.items():
            assert feats[mid] == hashlib.sha256(payload).hexdigest()

    def test_frame_sampling(self, spark):
        from swish_e_spark.ops.multimodal import (
            frame_sample, synthesize_media_df,
        )

        media = synthesize_media_df(spark, n=24)
        frames = frame_sample(media, every_n=4).collect()
        assert frames
        assert all(r["frame_idx"] % 4 == 0 for r in frames)

    @staticmethod
    def _real_media_rows():
        import struct

        import numpy as np

        # 16-bit PCM mono WAV: 440 Hz sine at 8 kHz
        rate = 8000
        t = np.arange(1600) / rate
        sig = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
        wav = (b"RIFF" + struct.pack("<I", 36 + sig.nbytes) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                       rate * 2, 2, 16)
               + b"data" + struct.pack("<I", sig.nbytes)
               + sig.tobytes())
        # 24-bit bottom-up BMP gradient, 8x6
        w, h = 8, 6
        stride = (w * 3 + 3) & ~3
        rows = bytearray()
        for y in range(h):
            row = bytearray()
            for x in range(w):
                v = (y * 30 + x * 10) % 256
                row += bytes([v, v, v])
            row += b"\0" * (stride - len(row))
            rows += row
        bmp = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                             len(rows), 0, 0, 0, 0) + bytes(rows))
        ppm = b"P6\n4 2\n255\n" + bytes(range(24))
        rng = np.random.default_rng(11)
        png = TestMultimodal._png_bytes(
            rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8), 2)
        return [(0, "audio", wav), (1, "image", bmp), (2, "image", ppm),
                (3, "image", png)]

    @staticmethod
    def _png_filter_rows(samples, depth):
        """Filter a (H, W, ch) sample array into PNG scanline bytes;
        row y gets filter type y % 5, so one image exercises all five
        filters (None/Sub/Up/Average/Paeth). Filtering is byte-wise
        with the left neighbor at bytes-per-pixel distance (spec §6),
        which is what makes 16-bit depth a distinct case."""
        import numpy as np

        h, w, ch = samples.shape
        if depth < 8:  # packed gray/palette: MSB-first bit packing
            bpp = 1
            vals = samples.reshape(h, w).astype(np.uint8)
            bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1))
                    & 1).reshape(h, w * depth)
            rows_bytes = np.packbits(bits, axis=1).astype(np.int32)
            w_b = rows_bytes.shape[1]
            raw = bytearray()
            prev = np.zeros(w_b, dtype=np.int32)
            for y in range(h):
                cur = rows_bytes[y]
                f = y % 5
                raw.append(f)
                for x in range(w_b):
                    a = int(cur[x - 1]) if x >= 1 else 0
                    b2 = int(prev[x])
                    c = int(prev[x - 1]) if x >= 1 else 0
                    pred = [0, a, b2, (a + b2) // 2][f] if f < 4 else (
                        a if abs(a + b2 - c - a) <= abs(a + b2 - c - b2)
                        and abs(a + b2 - c - a) <= abs(a + b2 - c - c)
                        else (b2 if abs(a + b2 - c - b2)
                              <= abs(a + b2 - c - c) else c))
                    raw.append((int(cur[x]) - pred) & 0xFF)
                prev = cur
            return bytes(raw)
        nb = depth // 8
        bpp = ch * nb
        if nb == 1:
            rows_bytes = samples.reshape(h, w * ch).astype(np.int32)
        else:
            b = np.empty((h, w, ch, 2), dtype=np.int32)
            b[..., 0] = samples >> 8
            b[..., 1] = samples & 0xFF
            rows_bytes = b.reshape(h, w * bpp)
        raw = bytearray()
        prev = np.zeros(w * bpp, dtype=np.int32)
        for y in range(h):
            cur = rows_bytes[y]
            f = y % 5
            raw.append(f)
            for x in range(w * bpp):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b2 = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b2
                elif f == 3:
                    pred = (a + b2) // 2
                else:
                    p = a + b2 - c
                    pa, pb, pc = abs(p - a), abs(p - b2), abs(p - c)
                    pred = a if pa <= pb and pa <= pc \
                        else (b2 if pb <= pc else c)
                raw.append((int(cur[x]) - pred) & 0xFF)
            prev = cur
        return bytes(raw)

    @classmethod
    def _png_bytes(cls, px, ctype, plte=None, depth=8, interlace=0):
        """Minimal spec-following PNG encoder for tests: px is
        (H, W, ch) uint8 (or uint16 for depth=16). interlace=1 emits
        the seven Adam7 sub-images, each filtered independently."""
        import struct
        import zlib

        import numpy as np

        def chunk(cid, body):
            return (struct.pack(">I", len(body)) + cid + body
                    + struct.pack(">I",
                                  zlib.crc32(cid + body) & 0xFFFFFFFF))

        h, w, ch = px.shape
        if interlace == 0:
            raw = cls._png_filter_rows(px, depth)
        else:
            from swish_e_spark.ops.multimodal import _ADAM7

            raw = b""
            for x0, y0, dx, dy in _ADAM7:
                sub = px[y0::dy, x0::dx]
                if sub.shape[0] and sub.shape[1]:
                    raw += cls._png_filter_rows(sub, depth)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                           interlace)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        out += chunk(b"IDAT", zlib.compress(raw))
        return out + chunk(b"IEND", b"")

    def test_png_decode_all_filters_and_color_types(self):
        """decode_png inverts every scanline filter and every 8-bit
        color type against an independent spec-following encoder."""
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_png

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
        g = decode_png(self._png_bytes(px, 2))
        assert g.shape == (10, 9)
        assert np.allclose(
            g, px.astype(np.float32).mean(axis=2) / 255.0, atol=1e-6)

        pg = rng.integers(0, 256, size=(7, 5, 1), dtype=np.uint8)
        assert np.allclose(decode_png(self._png_bytes(pg, 0)),
                           pg[:, :, 0].astype(np.float32) / 255.0)

        pa = rng.integers(0, 256, size=(6, 6, 4), dtype=np.uint8)
        assert np.allclose(
            decode_png(self._png_bytes(pa, 6)),
            pa[:, :, :3].astype(np.float32).mean(axis=2) / 255.0)

        plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        pi = rng.integers(0, 16, size=(5, 8, 1), dtype=np.uint8)
        assert np.allclose(
            decode_png(self._png_bytes(pi, 3, plte=plte)),
            plte[pi[:, :, 0]].astype(np.float32).mean(axis=2) / 255.0)

        ga = rng.integers(0, 256, size=(4, 4, 2), dtype=np.uint8)
        assert np.allclose(decode_png(self._png_bytes(ga, 4)),
                           ga[:, :, 0].astype(np.float32) / 255.0)

    def test_png_16bit_and_adam7(self):
        """16-bit depth (byte-wise filtering at 2-byte pixel distance)
        and Adam7 interlace (seven independently filtered sub-images)
        decode exactly against the independent test encoder."""
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_png

        rng = np.random.default_rng(3)
        px16 = rng.integers(0, 65536, size=(9, 7, 3), dtype=np.uint16)
        g = decode_png(self._png_bytes(px16, 2, depth=16))
        assert g is not None and g.shape == (9, 7)
        assert np.allclose(
            g, px16.astype(np.float32).mean(axis=2) / 65535.0,
            atol=1e-6)

        px = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
        g = decode_png(self._png_bytes(px, 2, interlace=1))
        assert g is not None and g.shape == (13, 11)
        assert np.allclose(
            g, px.astype(np.float32).mean(axis=2) / 255.0, atol=1e-6)

        # 16-bit + Adam7 + gray-alpha together
        ga = rng.integers(0, 65536, size=(10, 6, 2), dtype=np.uint16)
        g = decode_png(self._png_bytes(ga, 4, depth=16, interlace=1))
        assert np.allclose(
            g, ga[:, :, 0].astype(np.float32) / 65535.0, atol=1e-6)

    def test_png_packed_depths_decode(self):
        """1/2/4-bit packed gray and palette PNGs decode for real,
        sequential and Adam7, against the independent test encoder."""
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_png

        rng = np.random.default_rng(3)
        for depth in (1, 2, 4):
            for interlace in (0, 1):
                hi = 1 << depth
                px = rng.integers(0, hi, size=(11, 13, 1),
                                  dtype=np.uint8)
                g = decode_png(self._png_bytes(px, 0, depth=depth,
                                               interlace=interlace))
                assert g is not None and g.shape == (11, 13), \
                    (depth, interlace)
                want = px[:, :, 0].astype(np.float32) / (hi - 1)
                assert np.allclose(g, want, atol=1e-6), \
                    (depth, interlace)
            # packed palette indices
            plte = rng.integers(0, 256, size=(hi, 3), dtype=np.uint8)
            pi = rng.integers(0, hi, size=(6, 9, 1), dtype=np.uint8)
            g = decode_png(self._png_bytes(pi, 3, plte=plte,
                                           depth=depth))
            want = plte[pi[:, :, 0]].astype(np.float32) \
                .mean(axis=2) / 255.0
            assert np.allclose(g, want, atol=1e-6), depth

    def test_png_malformed_palette_returns_none(self):
        """An index beyond the palette, or a PLTE whose length is not
        a multiple of 3, is malformed: None, never IndexError out of
        the Spark kernel."""
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_png

        rng = np.random.default_rng(5)
        plte = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
        pi = np.full((4, 4, 1), 3, dtype=np.uint8)  # index 3, 2 entries
        assert decode_png(self._png_bytes(pi, 3, plte=plte,
                                          depth=2)) is None
        # PLTE length not a multiple of 3
        ok = bytearray(self._png_bytes(
            np.zeros((4, 4, 1), np.uint8), 3, plte=plte, depth=2))
        i = bytes(ok).find(b"PLTE")
        bad = ok[:i - 4] + b"\x00\x00\x00\x05PLTE" + b"\x01" * 5 \
            + ok[i + 4 + 6 + 4:]
        assert decode_png(bytes(bad)) is None

    def test_png_packed_rgb_rejected(self):
        """Sub-byte depth is illegal for color type 2 (spec §11):
        decode returns None rather than mis-parsing."""
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_png

        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        data = bytearray(self._png_bytes(px, 2))
        data[24] = 4  # IHDR bit depth -> packed, ctype stays RGB
        assert decode_png(bytes(data)) is None

    def test_real_codecs_through_spark_plumbing(self, spark):
        """WAV/BMP/PPM/PNG payloads decode FOR REAL (stdlib+numpy)
        inside the Arrow-batched kernel — features equal a local
        reference computation, and fake=False no longer raises for
        these formats."""
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F

        from swish_e_spark.ops.multimodal import (
            MEDIA_SCHEMA, _decode_stub, extract_features,
        )

        rows = self._real_media_rows()
        media = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "kind", "payload"])
        ).select("media_id", "kind", "payload",
                 F.lit(0).alias("width"), F.lit(0).alias("height"),
                 F.lit(0).alias("sample_rate"))
        feats = {r["media_id"]: np.asarray(r["feature"])
                 for r in extract_features(media, fake=False).collect()}
        assert len(feats) == 4
        for mid, kind, payload in rows:
            decoded = _decode_stub(payload, kind, fake=False)
            grid = decoded.reshape(4, 8, 4, 8).mean(axis=(1, 3)) \
                .ravel()[:16]
            assert np.allclose(feats[mid], grid, atol=1e-6), mid
        # the WAV energy raster reflects the real signal amplitude
        wav_thumb = _decode_stub(rows[0][2], "audio", fake=False)
        assert 0.3 < float(wav_thumb.mean()) < 0.7

    def test_compressed_formats_still_stub(self):
        from swish_e_spark.ops.multimodal import _decode_stub

        jpeg_ish = b"\xff\xd8\xff\xe0" + b"\0" * 64
        with pytest.raises(NotImplementedError):
            _decode_stub(jpeg_ish, "image", fake=False)
        assert _decode_stub(jpeg_ish, "image", fake=True).shape == \
            (32, 32)


class TestWavEncodings:
    """Round-3 WAV coverage: IEEE float, G.711 u-law/A-law, and
    WAVE_FORMAT_EXTENSIBLE headers — all dependency-free decodes."""

    @staticmethod
    def _wav(fmt_code, bits, body, extensible=False):
        import struct

        if extensible:
            fmt = struct.pack("<HHIIHHH", 0xFFFE, 1, 8000,
                              8000 * bits // 8, bits // 8, bits, 22)
            fmt += struct.pack("<HI", bits, 0) + \
                struct.pack("<H", fmt_code) + b"\x00" * 14
        else:
            fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000,
                              8000 * bits // 8, bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(body))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(body)) + body)

    def test_ieee_float_roundtrip(self):
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_wav

        sig = (0.5 * np.sin(2 * np.pi * 440 *
                            np.arange(800) / 8000)).astype("<f4")
        out = decode_wav(self._wav(3, 32, sig.tobytes()))
        assert out is not None
        x, rate = out
        assert rate == 8000 and np.allclose(x, sig, atol=1e-6)

    @pytest.mark.parametrize("law,fmt_code", [("ulaw", 7), ("alaw", 6)])
    def test_g711_roundtrip_within_quantization(self, law, fmt_code):
        import numpy as np

        from swish_e_spark.ops.multimodal import (
            _g711_alaw_table, _g711_ulaw_table, decode_wav,
        )

        table = _g711_ulaw_table() if law == "ulaw" \
            else _g711_alaw_table()
        sig = 0.6 * np.sin(2 * np.pi * 440 * np.arange(800) / 8000)
        # companding encoder for the fixture: nearest codeword by the
        # decode table (G.711 quantization is exactly this inverse)
        codes = np.abs(sig[:, None] - table[None, :]).argmin(1)
        out = decode_wav(self._wav(fmt_code, 8,
                                   codes.astype(np.uint8).tobytes()))
        assert out is not None
        x, rate = out
        assert rate == 8000
        # G.711 is logarithmic 8-bit: ~2% worst-case step at this level
        assert float(np.abs(x - sig).max()) < 0.03

    def test_extensible_header_pcm16(self):
        import numpy as np

        from swish_e_spark.ops.multimodal import decode_wav

        sig = (20000 * np.sin(2 * np.pi * 100 *
                              np.arange(400) / 8000)).astype("<i2")
        out = decode_wav(self._wav(1, 16, sig.tobytes(),
                                   extensible=True))
        assert out is not None
        x, _ = out
        assert np.allclose(x, sig.astype(np.float32) / 32768.0)

    def test_unknown_format_stays_stubbed(self):
        from swish_e_spark.ops.multimodal import decode_wav

        assert decode_wav(self._wav(0x55, 8, b"\x00" * 64)) is None

    def test_g711_sign_conventions(self):
        """Absolute sign pins against the CCITT reference tables —
        the round-trip test derives its fixture from our own table,
        so it cannot catch a globally flipped sign. A-law: bit 7
        (after even-bit uninversion) SET means POSITIVE (0xD5 = +8);
        μ-law: the complemented byte's bit 7 SET means NEGATIVE
        (0xFE = +8, 0x7E = -8)."""
        from swish_e_spark.ops.multimodal import (
            _g711_alaw_table, _g711_ulaw_table,
        )

        alaw = _g711_alaw_table()
        assert alaw[0xD5] == pytest.approx(8 / 32768.0)
        assert alaw[0x55] == pytest.approx(-8 / 32768.0)
        ulaw = _g711_ulaw_table()
        assert ulaw[0xFE] == pytest.approx(8 / 32768.0)
        assert ulaw[0x7E] == pytest.approx(-8 / 32768.0)
        assert ulaw[0xFF] == pytest.approx(0.0)

    def test_truncated_fmt_chunk_returns_none(self):
        # a fmt chunk under 16 bytes must return None, not raise
        # struct.error through the Spark kernel
        import struct

        from swish_e_spark.ops.multimodal import decode_wav

        fmt = struct.pack("<HH", 1, 1)  # 4-byte fmt body
        wav = (b"RIFF" + struct.pack("<I", 24) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
        assert decode_wav(wav) is None

    @staticmethod
    def _ima_encode(sig_i16, block_align, channels=1):
        """Reference IMA ADPCM encoder (public IMA spec): the encoder
        simulates the decoder, so its tracked reconstruction is the
        EXACT expected decode — the round-trip assertion below is
        equality, not closeness."""
        import struct

        import numpy as np

        from swish_e_spark.ops.multimodal import _IMA_INDEX, _IMA_STEPS

        per_ch = sig_i16.reshape(-1, channels).T  # (C, n)
        spb = (block_align - 4 * channels) * 2 // channels + 1
        nblocks = per_ch.shape[1] // spb
        out = bytearray()
        recon = np.zeros((channels, nblocks * spb), np.int32)
        idx = [0] * channels
        for b in range(nblocks):
            nibs = [[] for _ in range(channels)]
            pred = [0] * channels
            for c in range(channels):
                pred[c] = int(per_ch[c, b * spb])
                out += struct.pack("<hBB", pred[c], idx[c], 0)
                recon[c, b * spb] = pred[c]
            for s in range(1, spb):
                for c in range(channels):
                    step = int(_IMA_STEPS[idx[c]])
                    diff = int(per_ch[c, b * spb + s]) - pred[c]
                    n = 0
                    if diff < 0:
                        n, diff = 8, -diff
                    if diff >= step:
                        n |= 4
                        diff -= step
                    if diff >= step >> 1:
                        n |= 2
                        diff -= step >> 1
                    if diff >= step >> 2:
                        n |= 1
                    d = (step >> 3) + ((step >> 2) if n & 1 else 0) \
                        + ((step >> 1) if n & 2 else 0) \
                        + (step if n & 4 else 0)
                    pred[c] += -d if n & 8 else d
                    pred[c] = max(-32768, min(32767, pred[c]))
                    idx[c] = max(0, min(88, idx[c]
                                        + int(_IMA_INDEX[n & 7])))
                    nibs[c].append(n)
                    recon[c, b * spb + s] = pred[c]
            # pack: 4-byte groups per channel, low nibble first
            for g in range((spb - 1) // 8):
                for c in range(channels):
                    for k in range(4):
                        lo = nibs[c][g * 8 + 2 * k]
                        hi = nibs[c][g * 8 + 2 * k + 1]
                        out.append(lo | (hi << 4))
        return bytes(out), recon[:, :nblocks * spb]

    @pytest.mark.parametrize("channels", [1, 2])
    def test_ima_adpcm_exact_roundtrip(self, channels):
        import struct

        import numpy as np

        from swish_e_spark.ops.multimodal import decode_wav

        rng = np.random.default_rng(11)
        n = 1024 * channels
        sig = (12000 * np.sin(2 * np.pi * 220 * np.arange(n) / 8000)
               + rng.normal(0, 400, n)).astype(np.int16)
        block_align = 4 * channels + 32 * channels  # 65 samples/block
        body, recon = self._ima_encode(sig, block_align, channels)
        fmt = struct.pack("<HHIIHH", 0x11, channels, 8000,
                          8000, block_align, 4)
        wav = (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(body))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
        out = decode_wav(wav)
        assert out is not None
        x, rate = out
        assert rate == 8000
        want = (recon.astype(np.float32) / 32768.0).mean(axis=0)
        assert x.shape == want.shape
        assert np.array_equal(x, want)  # bit-exact vs spec simulation
        # and the lossy codec still tracks the source signal once the
        # step size has adapted (block 0 carries the attack transient:
        # the index table walks up from step 7 toward the sine slope)
        src = (sig.reshape(-1, channels).astype(np.float32)
               .mean(axis=1) / 32768.0)[:len(x)]
        assert float(np.abs(x - src)[128:].max()) < 0.05


class TestMp4Container:
    """ISO-BMFF pins (ops/mp4.py): writer→parser round-trip, byte-level
    structure, sample-offset resolution, and untrusted-input rejection."""

    @staticmethod
    def _samples(did=2):
        n = 4 + did % 13
        return [bytes([i & 0xFF]) * (32 + (did + 17 * i) % 64)
                for i in range(n)]

    def test_build_parse_roundtrip(self):
        from swish_e_spark.ops.mp4 import build_mp4, parse_mp4

        samples = self._samples()
        buf = build_mp4(samples, timescale=1000, sample_delta=40)
        info = parse_mp4(buf)
        assert info["brand"] == "isom"
        assert info["timescale"] == 1000
        tr = info["tracks"][0]
        assert tr["handler"] == "vide" and tr["codec"] == "mp4v"
        assert tr["n_samples"] == len(samples)
        # per-sample size, contiguity, and dts ladder
        off0 = tr["samples"][0][0]
        want_off = off0
        for i, (off, size, dts) in enumerate(tr["samples"]):
            assert size == len(samples[i])
            assert off == want_off
            assert dts == 40 * i
            want_off += size

    def test_sample_extraction_is_exact_bytes(self):
        from swish_e_spark.ops.mp4 import build_mp4, mp4_sample

        samples = self._samples(did=5)
        buf = build_mp4(samples)
        for i, s in enumerate(samples):
            assert mp4_sample(buf, 0, i) == s

    def test_byte_structure_pin(self):
        # the writer is deterministic: pin the exact bytes of a small
        # build so any layout change is a conscious decision
        from swish_e_spark.ops.mp4 import build_mp4

        buf = build_mp4([b"A" * 8, b"BB" * 4], timescale=600,
                        sample_delta=25)
        assert hashlib.sha256(buf).hexdigest() == (
            "2b330ebac4bf2996ef35fcb8ba1b1f09"
            "7d4847bd77204310ed99f574e09a8220")
        # structural invariants a future layout change must preserve
        assert buf[4:8] == b"ftyp"
        assert b"mdat" in buf and b"moov" in buf
        assert buf.index(b"mdat") < buf.index(b"moov")

    @pytest.mark.parametrize("mutate", [
        lambda b: b[:20],                          # truncated box
        lambda b: b[:4] + b"junk" + b[8:],         # no ftyp
        lambda b: b"\x00\x00\x00\x03" + b[4:],     # size < 8
        lambda b: b[:-40],                         # moov truncated
    ])
    def test_malformed_rejected(self, mutate):
        from swish_e_spark.ops.mp4 import build_mp4, parse_mp4

        buf = build_mp4(self._samples())
        with pytest.raises(ValueError):
            parse_mp4(mutate(bytearray(buf)))

    def test_sample_overrun_rejected(self):
        # stsz inflated past the file end must not yield an offset
        # outside the payload
        from swish_e_spark.ops.mp4 import build_mp4, parse_mp4

        buf = bytearray(build_mp4([b"x" * 16] * 4))
        i = buf.index(b"stsz")
        # first size entry lives 12 bytes after the tag (ver/flags,
        # fixed=0, count): blow it up
        struct.pack_into(">I", buf, i + 16, 1 << 24)
        with pytest.raises(ValueError):
            parse_mp4(bytes(buf))

    def test_box_budget_enforced(self):
        from swish_e_spark.ops.mp4 import MAX_BOXES, parse_mp4

        flood = b"\x00\x00\x00\x08free" * (MAX_BOXES + 8)
        with pytest.raises(ValueError):
            parse_mp4(flood)


class TestMpegAudio:
    """MPEG audio frame-walk pins (ops/mpegaudio.py)."""

    REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/"
                "tests/test_data/test.mp3")

    def test_real_world_mp3(self):
        # a third-party MP3 found on this host (ID3v2 tag + MPEG-2
        # Layer III, 22.05 kHz mono): the walker must survive the tag
        # prefix and produce consistent stream info — the self-built
        # fixtures alone can't prove real-file robustness
        import os

        from swish_e_spark.ops.mpegaudio import (
            mpeg_audio_info, walk_frames,
        )

        if not os.path.exists(self.REAL_MP3):
            pytest.skip("host test.mp3 not available")
        raw = open(self.REAL_MP3, "rb").read()
        info = mpeg_audio_info(raw)
        assert info["layer"] == 3 and info["version"] == "2"
        assert info["samplerate"] == 22050 and info["channels"] == 1
        assert info["n_frames"] == 45
        assert info["duration_ms"] == 1175
        frames = list(walk_frames(raw))
        assert len(frames) == 45
        assert frames[0][0] == 32  # first frame right after the tag

    def test_build_walk_roundtrip(self):
        from swish_e_spark.ops.mpegaudio import build_mp3, walk_frames

        p = build_mp3(12, bitrate_idx=9, sr_idx=1, mono=True, seed=7)
        frames = list(walk_frames(p))
        assert len(frames) == 12
        h = frames[0][1]
        assert h["bitrate"] == 128000 and h["samplerate"] == 48000
        assert h["channels"] == 1 and h["layer"] == 3
        # frame offsets advance by exactly the computed frame size
        assert all(frames[i + 1][0] - frames[i][0] == h["size"]
                   for i in range(len(frames) - 1))

    def test_header_size_arithmetic(self):
        # public formula: Layer III MPEG-1 size = 144*br/sr + pad
        from swish_e_spark.ops.mpegaudio import parse_header

        word = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (9 << 12) | (0 << 10)  # 128 kbit/s, 44100 Hz, no pad
        h = parse_header(word)
        assert h["size"] == 144 * 128000 // 44100
        h2 = parse_header(word | (1 << 9))  # padding bit
        assert h2["size"] == h["size"] + 1

    def test_resync_across_garbage(self):
        from swish_e_spark.ops.mpegaudio import build_mp3, walk_frames

        p = build_mp3(6, seed=3)
        dirty = b"\xffthis is not audio\x00" * 3 + p
        frames = list(walk_frames(dirty))
        assert len(frames) == 6
        assert frames[0][0] == len(dirty) - len(p)

    def test_info_and_duration(self):
        from swish_e_spark.ops.mpegaudio import build_mp3, \
            mpeg_audio_info

        p = build_mp3(25, bitrate_idx=5, sr_idx=2, mono=False)
        info = mpeg_audio_info(p)
        assert info["n_frames"] == 25
        assert info["samplerate"] == 32000
        assert info["channels"] == 2
        assert info["duration_ms"] == 25 * 1152 * 1000 // 32000
        assert info["avg_bitrate"] == 64000
        assert info["vbr"] is False

    def test_non_audio_returns_none(self):
        from swish_e_spark.ops.mpegaudio import mpeg_audio_info

        assert mpeg_audio_info(b"GIF89a" + b"\x00" * 256) is None
        assert mpeg_audio_info(b"") is None

    def test_pseudo_sync_rejected_by_lookahead(self):
        # 0xFFF sync inside junk whose implied next frame is invalid
        # must not be accepted as a frame
        from swish_e_spark.ops.mpegaudio import build_mp3, walk_frames

        word = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (9 << 12)
        fake = struct.pack(">I", word) + b"\x00" * 500
        p = fake + build_mp3(4, seed=1)
        offs = [o for o, _ in walk_frames(p)]
        assert len(offs) == 4 and offs[0] >= len(fake)

    def test_frame_sample_uses_real_container_timestamps(self, spark):
        # a video row whose payload is a REAL MP4 gets frame rows from
        # the parsed sample tables, not the byte-length heuristic
        import pandas as pd

        from swish_e_spark.ops.mp4 import build_mp4
        from swish_e_spark.ops.multimodal import frame_sample

        buf = build_mp4([bytes([i]) * 40 for i in range(10)],
                        timescale=1000, sample_delta=40)
        pdf = pd.DataFrame([{
            "media_id": 1, "kind": "video", "payload": buf,
            "width": 64, "height": 48, "sample_rate": 0,
        }])
        media = spark.createDataFrame(pdf)
        rows = {r["frame_idx"]: r["ts_ms"]
                for r in frame_sample(media, every_n=4).collect()}
        assert rows == {0: 0, 4: 160, 8: 320}


class TestEmbeddingNearDup:
    """Embedding-cosine near-dup (dedup.embedding_near_duplicates):
    the LSH-banded pipeline against a pure-numpy exact computation."""

    def test_finds_all_planted_pairs_exactly(self, spark):
        from swish_e_spark.ops.dedup import (
            EMB_AUG_OFFSET, EMB_EPS, EMB_TAU, embedding_near_duplicates,
        )

        rows = embedding_near_duplicates(spark, SF).collect()
        got = {(r["vec_a"], r["vec_b"]): r["cos"] for r in rows}

        # exact numpy ground truth over the same augmented set
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"])
        v = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        signs = np.where((ids[:, None] * 31
                          + np.arange(v.shape[1])[None, :]) % 2 == 1,
                         EMB_EPS, -EMB_EPS)
        allv = np.vstack([v, v + signs])
        allids = np.concatenate([ids, ids + EMB_AUG_OFFSET])
        n = allv / np.linalg.norm(allv, axis=1, keepdims=True)
        s = n @ n.T
        iu = np.triu_indices(len(allids), k=1)
        want = {}
        for i, j in zip(*iu):
            a, b = int(allids[i]), int(allids[j])
            if a > b:
                a, b = b, a
            if s[i, j] >= EMB_TAU:
                want[(a, b)] = round(float(s[i, j]), 4)
        # every exact pair is found (LSH miss probability per pair
        # ~1.5e-6) and nothing else is reported
        assert set(got) == set(want)
        for k, cv in want.items():
            assert abs(got[k] - cv) <= 1e-4, k

    def test_no_all_pairs_join_in_plan(self, spark):
        # the candidate stage must join on (table, bucket) equality —
        # a cartesian/broadcast-nested-loop join would be the 100 TB
        # scale-killer
        from swish_e_spark.ops.dedup import embedding_near_duplicates

        plan = embedding_near_duplicates(spark, SF) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestBpe:
    @staticmethod
    def _ref_bpe(word_counts, n):
        """Independent reference: textbook greedy BPE (Sennrich 2016)
        — python lists, left-to-right merge application, ties broken
        by count desc then lexicographic pair."""
        import collections

        seqs = {w: list(w) for w in word_counts}
        merges = []
        for r in range(n):
            pc = collections.Counter()
            for w, c in word_counts.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += c
            if not pc:
                break
            (x, y), tot = min(pc.items(),
                              key=lambda kv: (-kv[1], kv[0]))
            merges.append((r + 1, x, y, x + y, tot))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if (i + 1 < len(s) and s[i] == x
                            and s[i + 1] == y):
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        return merges

    def test_bpe_merges_match_reference(self, spark):
        """The distributed window-parity merge equals textbook greedy
        BPE on the real corpus vocabulary."""
        from pyspark.sql import functions as F

        from swish_e_spark.ops.bpe import bpe_merges
        from swish_e_spark.ops.corpus import tokens

        wc = {r["t"]: r["cnt"] for r in
              tokens(spark, SF).groupBy("t")
              .agg(F.count("*").alias("cnt")).collect()}
        expect = self._ref_bpe(wc, 12)
        got = [(r["rank"], r["lft"], r["rgt"], r["merged"], r["total"])
               for r in bpe_merges(spark, SF).collect()]
        assert got == expect
        assert len(got) == 12

    def test_bpe_overlapping_run_semantics(self, spark):
        """'aaaa' with merge (a,a) must become 'aa aa' (greedy
        left-to-right), never the overlapping middle pair — pinned
        through a synthetic vocabulary."""
        import os
        import tempfile

        from swish_e_spark.ops.bpe import bpe_merges

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(0, "aaaa aaaa aaa zq", "en", "s", 16)],
                "doc_id long, text string, lang string, "
                "source string, n_chars long",
            ).write.parquet(os.path.join(td, "documents.parquet"))
            got = [(r["rank"], r["lft"], r["rgt"], r["total"])
                   for r in bpe_merges(spark, td, 3).collect()]
        # round 1: (a,a) count = 3+3+2 = 8 -> 'aa aa', 'aa a'
        # round 2: (aa,aa) count 2 beats (aa,a) 1 and (z,q) 1
        # round 3: lexicographic tie-break between (aa,a) and (z,q)
        assert got == [(1, "a", "a", 8), (2, "aa", "aa", 2),
                       (3, "aa", "a", 1)]

    def test_bpe_token_counts_match_reference(self, spark):
        """Applying the learned merges: per-doc BPE token counts equal
        the reference tokenizer's sequence lengths summed over the
        document's words."""
        import collections

        from pyspark.sql import functions as F

        from swish_e_spark.ops.bpe import bpe_token_counts
        from swish_e_spark.ops.corpus import tokens

        toks = tokens(spark, SF).collect()
        wc = collections.Counter(r["t"] for r in toks)
        # reference seqs after 12 merges
        seqs = {w: list(w) for w in wc}
        for _, x, y, _, _ in self._ref_bpe(dict(wc), 12):
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if (i + 1 < len(s) and s[i] == x
                            and s[i + 1] == y):
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        expect = collections.Counter()
        for r in toks:
            expect[r["doc_id"]] += len(seqs[r["t"]])
        got = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_token_counts(spark, SF).collect()}
        assert got == dict(expect)
