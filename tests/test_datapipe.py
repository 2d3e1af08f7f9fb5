"""Training-data operators: planted-fixture tests (the shared sf tables
contain no near-duplicates, so dedup recall is exercised here)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bank_statement_pdf_parser_ray.pipelines import datapipe as dp


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with planted near/exact dups + embeddings.parquet
    with planted high-cosine pairs."""
    d = tmp_path_factory.mktemp("planted")
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the rain falls gently on the old roof "
        "of the house near the river where children play every afternoon"
    )
    other = (
        "completely different content about distributed systems and arrow "
        "columnar formats streaming execution backpressure and object stores "
        "with zero copy batches flowing through typed pipelines at scale"
    )
    near = base.replace("lazy dog", "sleepy dog")  # high word-3-gram overlap
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [base, near, other, base, "tiny"],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": pa.array([len(base), len(near), len(other), len(base), 4], pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))

    rng = np.random.RandomState(0)
    vecs = rng.randn(6, 16).astype(np.float32)
    vecs[1] = vecs[0] + rng.randn(16).astype(np.float32) * 0.05  # near-dup pair (0,1)
    emb = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * 6, pa.int32()),
        }
    )
    pq.write_table(emb, str(d / "embeddings.parquet"))
    return str(d)


class TestMinHash:
    def test_finds_planted_near_dup(self, planted_dir):
        verified = dp.minhash_verified(planted_dir, threshold=0.5).to_pandas()
        pairs = set(zip(verified["doc_a"], verified["doc_b"]))
        assert (0, 1) in pairs  # near-dup survives Jaccard verification
        assert (0, 3) in pairs  # exact dup
        assert not any(2 in p for p in pairs)  # unrelated doc never pairs

    def test_candidates_superset_of_verified(self, planted_dir):
        cand = dp.minhash_candidates(planted_dir).to_pandas()
        cpairs = set(zip(cand["doc_a"], cand["doc_b"]))
        v = dp.minhash_verified(planted_dir, threshold=0.5).to_pandas()
        vpairs = set(zip(v["doc_a"], v["doc_b"]))
        assert vpairs <= cpairs

    def test_hot_bucket_star_cap(self, tmp_path):
        """1,000 identical docs: every LSH bucket they share is hot, so the
        candidate count must stay LINEAR (star pairs to the min-doc hub)
        instead of C(1000,2) ≈ 500k (round-1 VERDICT scale-killer)."""
        txt = "identical boilerplate footer text repeated across the entire web corpus every page"
        n = 1000
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": [txt] * n,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": pa.array([len(txt)] * n, pa.int64()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        cand = dp.minhash_candidates(str(tmp_path)).to_pandas()
        assert len(cand) == n - 1  # exactly the star pairs (hub=0)
        assert set(cand["doc_a"]) == {0}
        # connectivity preserved: every doc appears in some pair
        assert set(cand["doc_b"]) == set(range(1, n))


class TestCorpusClean:
    def test_gates_and_dedup(self, tmp_path):
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": [
                    "a perfectly ordinary document with enough words to pass",
                    "too few",  # < 5 tokens -> dropped
                    "!!!!! ..... ;;;;; what ????? spam punctuation " + "!" * 40,  # punct ratio -> dropped
                    "a perfectly ordinary document with enough words to pass",  # dup of 0 -> dropped
                ],
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        out = sorted(dp.corpus_clean(str(tmp_path)).to_pandas()["doc_id"])
        assert out == [0]


class TestDedupClusters:
    def test_component_labels(self, planted_dir):
        """Docs 0,1,3 form one near-dup component (0~1 near, 0~3 exact);
        2 and 4 are singletons. Min-label propagation must give every
        member the component-min cluster id."""
        out = dp.dedup_clusters(planted_dir, threshold=0.5).set_index("doc_id")["cluster_id"]
        assert out[0] == out[1] == out[3] == 0
        assert out[2] == 2 and out[4] == 4
        # "keep one per cluster" filter keeps exactly the 3 canonicals
        assert sorted(set(out.values)) == [0, 2, 4]

    def test_neardup_clean_keeps_cluster_minima(self, planted_dir):
        kept = sorted(dp.neardup_clean(planted_dir, threshold=0.5).to_pandas()["doc_id"])
        assert kept == [0, 2, 4]


class TestSimHash:
    def test_near_dup_small_hamming(self, planted_dir):
        sh = dp.simhash(planted_dir).to_pandas().set_index("doc_id")["simhash"]
        ham = bin(int(sh[0]) ^ int(sh[1])).count("1")
        ham_far = bin(int(sh[0]) ^ int(sh[2])).count("1")
        assert sh[0] == sh[3]  # identical text -> identical simhash
        assert ham < ham_far  # near-dup closer than unrelated


class TestEmbeddingOps:
    def test_neardup_pair_found(self, planted_dir):
        pairs = dp.embedding_neardup(planted_dir, threshold=0.9).to_pandas()
        assert (0, 1) in set(zip(pairs["vec_a"], pairs["vec_b"]))

    def test_neardup_router_small_exact_large_lsh(self, planted_dir):
        """One entry point, size-routed: under the broadcast budget the
        router returns the EXACT kernel's pairs verbatim; with the
        budget forced to 0 rows it engages the LSH composition, whose
        output is a subset at the same τ and still recalls the planted
        pair."""
        exact = dp.embedding_neardup_exact(planted_dir, threshold=0.9).to_pandas()
        routed_small = dp.embedding_neardup(planted_dir, threshold=0.9).to_pandas()
        assert sorted(map(tuple, routed_small.values.tolist())) == sorted(
            map(tuple, exact.values.tolist())
        )
        routed_large = dp.embedding_neardup(
            planted_dir, threshold=0.9, max_broadcast_rows=0
        ).to_pandas()
        large_pairs = set(zip(routed_large["vec_a"], routed_large["vec_b"]))
        assert large_pairs <= set(zip(exact["vec_a"], exact["vec_b"]))
        assert (0, 1) in large_pairs

    def test_neardup_lsh_subset_and_recall(self, planted_dir):
        """The wired LSH->verify composition: output ⊆ the exact
        all-pairs result by construction, and the OR-construction
        (24 tables x 4 planes) catches the planted high-cosine pair."""
        exact = dp.embedding_neardup(planted_dir, threshold=0.9).to_pandas()
        exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
        lsh = dp.embedding_neardup_lsh(planted_dir, threshold=0.9).to_pandas()
        lsh_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
        assert lsh_pairs <= exact_pairs
        assert (0, 1) in lsh_pairs  # planted near-dup recalled

    def test_knn_ivf_full_probe_is_exact(self, planted_dir):
        """nprobe == n_centroids degenerates IVF to exact brute force;
        the result must equal knn_cosine row for row."""
        exact = dp.knn_cosine(planted_dir, query_ids=(0,), k=3).to_pandas()
        ivf = dp.knn_cosine_ivf(
            planted_dir, query_ids=(0,), k=3, n_centroids=4, nprobe=4
        ).to_pandas()
        assert ivf.values.tolist() == exact.values.tolist()

    def test_knn_ivf_partial_probe_recalls_neardup(self, planted_dir):
        """The planted near-identical vector shares the query's centroid,
        so even nprobe=1 must recall it."""
        ivf = dp.knn_cosine_ivf(
            planted_dir, query_ids=(0,), k=3, n_centroids=3, nprobe=1
        ).to_pandas()
        assert 1 in ivf["vec_id"].tolist()
        assert 0 not in ivf["vec_id"].tolist()

    def test_knn_lsh_distributed_merge_shape(self, planted_dir):
        out = dp.knn_cosine_lsh(planted_dir, query_ids=(0,), k=3).to_pandas()
        assert list(out.columns) == ["query_id", "vec_id", "rank"]
        assert len(out) <= 3
        assert 0 not in out["vec_id"].tolist()  # query never returned
        # multi-probe (hamming<=1) must recall the planted near-identical
        # vector: its signature differs from the query's in at most ~0 bits
        assert 1 in out["vec_id"].tolist()

    def test_knn_pq_recalls_planted_pair(self, planted_dir):
        """6 sample points with 6 codes per subspace: the codebook
        saturates, encoding is exact, so PQ must equal the exact result
        row for row — pinning encode/ADC/re-rank/merge end to end."""
        exact = dp.knn_cosine(planted_dir, query_ids=(0,), k=3).to_pandas()
        got = dp.knn_cosine_pq(planted_dir, query_ids=(0,), k=3, m_sub=4, n_codes=8).to_pandas()
        assert got.values.tolist() == exact.values.tolist()
        assert 1 in got["vec_id"].tolist() and 0 not in got["vec_id"].tolist()

    def test_knn_pq_recall_floor_and_determinism(self):
        """Lossy regime (real table, 32 codes over 500 vectors): the
        ADC shortlist + exact re-rank must keep recall >= 0.8 vs the
        oracle-paired exact knn, and be bit-deterministic."""
        sf = "/root/testdata/sf0.001"
        exact = dp.knn_cosine(sf).to_pandas()
        ex = set(zip(exact["query_id"], exact["vec_id"]))
        got = dp.knn_cosine_pq(sf).to_pandas()
        ap = set(zip(got["query_id"], got["vec_id"]))
        assert list(got.columns) == ["query_id", "vec_id", "rank"]
        assert len(ex & ap) / len(ex) >= 0.8
        again = dp.knn_cosine_pq(sf).to_pandas()
        assert got.values.tolist() == again.values.tolist()

    def test_knn_matches_numpy_bruteforce(self, planted_dir):
        import pyarrow.dataset as pads

        got = dp.knn_cosine(planted_dir, query_ids=(0,), k=3).to_pandas()
        t = pads.dataset(f"{planted_dir}/embeddings.parquet").to_table()
        m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m[0]
        order = [i for i in np.argsort(-sims) if i != 0][:3]
        assert got["vec_id"].tolist() == [int(i) for i in order]
        assert got["rank"].tolist() == [1, 2, 3]


class TestExactDedup:
    def test_keeps_min_doc_id(self, planted_dir):
        out = dp.exact_dedup(planted_dir).to_pandas()
        assert 3 not in out["doc_id"].tolist()  # dup of doc 0 dropped
        assert 0 in out["doc_id"].tolist()
        assert len(out) == 4


class TestMediaPlumbing:
    def test_features_shape(self, planted_dir):
        out = dp.media_features(planted_dir).to_pandas().set_index("media_id").sort_index()
        assert len(out) == 5
        # doc_id % 6 == 5 -> unknown-codec stand-in -> fake path (target
        # dims); every other id carries a REAL format (PGM/BMP/JPEG/PNG/
        # GIF) and reports the 48x64 source raster dims
        for i in out.index:
            want = (32, 32) if (int(i) % 6) == 5 else (48, 64)
            assert (out.loc[i, "height"], out.loc[i, "width"]) == want, i
        assert out["feature"].map(len).eq(32).all()


class TestLangId:
    def test_classify_fixture_labels(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import LangIdActor

        c = LangIdActor()._classify
        assert c("the cat and the dog is in that house for a while") == "en"
        assert c("el perro y la casa de los niños que juegan con un globo") == "es"
        assert c("le chien et la maison des enfants du village que nous aimons") == "fr"
        assert c("der Hund und die Katze von dem Haus mit den Kindern ist ein") == "de"
        assert c("这是中文文本") == "zh"

    def test_never_silent_en(self):
        """Zero stopword hits must be 'und', never a default 'en'."""
        from bank_statement_pdf_parser_ray.pipelines.datapipe import LangIdActor

        c = LangIdActor()._classify
        assert c("zzz qqq xxx lorem7 42") == "und"
        assert c("") == "und"
        assert c("12345 !!! ???") == "und"


class TestSampling:
    def test_seeded_sample_is_deterministic(self):
        from bank_statement_pdf_parser_ray.pipelines.queries import sample_documents

        sf = "/root/testdata/sf0.001"
        a = sorted(sample_documents(sf).to_pandas()["doc_id"].tolist())
        b = sorted(sample_documents(sf).to_pandas()["doc_id"].tolist())
        assert a == b
        n_docs = 600  # sf0.001 documents table
        assert 0 < len(a) < n_docs


class TestHLL:
    def test_register_kernel_known_ranks(self):
        """clz kernel sanity: rank must equal 64-bit leading zeros of the
        post-avalanche suffix + 1, checked against a pure-Python clz."""
        from bank_statement_pdf_parser_ray.pipelines.datapipe import HLL_P, _hll_registers

        ids = np.arange(5000, dtype=np.int64)
        regs = _hll_registers(ids)
        assert regs.shape == (1 << HLL_P,)
        assert regs.max() >= 1
        # python reference for a few ids
        def ref(i):
            x = (i + 0x9E3779B97F4A7C15) % (1 << 64)
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % (1 << 64)
            x = x ^ (x >> 31)
            reg = x >> (64 - HLL_P)
            rest = ((x << HLL_P) | ((1 << HLL_P) - 1)) % (1 << 64)
            rank = 64 - rest.bit_length() + 1
            return reg, rank
        expected = {}
        for i in range(5000):
            r, k = ref(i)
            expected[r] = max(expected.get(r, 0), k)
        got = {int(r): int(regs[r]) for r in expected}
        assert got == expected

    def test_approx_distinct_within_5pct(self):
        import duckdb

        from bank_statement_pdf_parser_ray.pipelines.datapipe import approx_distinct_users

        sf = "/root/testdata/sf0.01"
        approx = approx_distinct_users(sf)["approx_distinct"][0]
        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        assert abs(approx - exact) / exact < 0.05, (approx, exact)


class TestApproxQuantiles:
    def test_error_bounded_by_bin_width(self):
        """The histogram-sketch estimate must sit within one bin width
        of the exact np.quantile over the finite values."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import approx_quantiles_events

        sf = "/root/testdata/sf0.01"
        out = approx_quantiles_events(sf)
        v = pq.read_table(f"{sf}/events.parquet", columns=["value"]).column("value")
        v = v.to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        w = (v.max() - v.min()) / 2048
        for q, est in zip(out["q"], out["value_est"]):
            exact = np.quantile(v, q)
            assert abs(est - exact) <= w + 1e-9, (q, est, exact, w)

    def test_degenerate_and_empty(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import approx_quantiles_events

        t = pa.table({"value": pa.array([7.5] * 10, pa.float64())})
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = approx_quantiles_events(str(tmp_path))
        assert (out["value_est"] == 7.5).all()
        t = pa.table({"value": pa.array([None, float("nan")], pa.float64())})
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = approx_quantiles_events(str(tmp_path))
        assert out["value_est"].isna().all()


class TestPrepCorpus:
    def test_composition_equals_stagewise(self):
        """prep_corpus must EQUAL the stagewise computation: survivors
        from corpus_clean, joined to lang, then the per-lang smallest-10
        md5 keys — frame equality, not just subset/caps."""
        import hashlib

        import pyarrow.dataset as pads

        from bank_statement_pdf_parser_ray.pipelines.datapipe import corpus_clean, prep_corpus

        sf = "/root/testdata/sf0.001"
        composed = (
            prep_corpus(sf).to_pandas().sort_values(["lang", "sample_key"]).reset_index(drop=True)
        )
        survivors = corpus_clean(sf).to_pandas()
        meta = pads.dataset(f"{sf}/documents.parquet").to_table(columns=["doc_id", "lang"]).to_pandas()
        staged = survivors.merge(meta, on="doc_id")
        staged["sample_key"] = staged["doc_id"].map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
        staged = (
            staged.sort_values(["lang", "sample_key"])
            .groupby("lang")
            .head(10)
            .sort_values(["lang", "sample_key"])
            .reset_index(drop=True)
        )
        assert composed[["doc_id", "lang", "sample_key"]].equals(staged[["doc_id", "lang", "sample_key"]])

    def test_write_partitioned_by_lang(self, tmp_path):
        import os

        from bank_statement_pdf_parser_ray.pipelines.datapipe import write_prep_corpus

        out = str(tmp_path / "prep")
        summary = write_prep_corpus("/root/testdata/sf0.001", out)
        assert summary["strata_written"] >= 1
        assert all(d.startswith("lang=") for d in os.listdir(out))


class TestMediaRealDecode:
    """The decode kernel REALLY decodes uncompressed rasters (PGM/PPM/
    BMP) with pure numpy; only codec formats fall back to the fake."""

    def _actor(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        return MediaDecodeActor(target_size=(4, 4))

    def test_pgm_roundtrip(self):
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        blob = b"P5\n# comment\n8 6\n255\n" + img.tobytes()
        out, sh, sw = self._actor()._decode(blob)
        assert (sh, sw) == (6, 8)
        assert out.shape == (4, 4)
        # nearest-neighbor sample of row 0: pixels (0,0),(0,2),(0,4),(0,6)
        assert np.allclose(out[0], img[0, [0, 2, 4, 6]] / 255.0)

    def test_ppm_gray_is_channel_mean(self):
        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        rgb[..., 0] = 90  # R
        rgb[..., 1] = 120  # G
        rgb[..., 2] = 150  # B
        blob = b"P6\n2 2\n255\n" + rgb.tobytes()
        out, sh, sw = self._actor()._decode(blob)
        assert (sh, sw) == (2, 2)
        assert np.allclose(out, 120 / 255.0)

    def test_bmp_bottom_up_and_padding(self):
        import struct

        w, h = 3, 2  # stride = 12 (3*3=9 padded to 12)
        rows = []
        # bottom-up storage: file row 0 is IMAGE row 1
        img = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)  # gray per pixel
        for y in (1, 0):
            row = b""
            for x in range(w):
                g = int(img[y, x])
                row += bytes([g, g, g])
            rows.append(row + b"\x00" * (12 - len(row)))
        pix = b"".join(rows)
        header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
        blob = header + dib + pix
        out, sh, sw = self._actor()._decode(blob)
        assert (sh, sw) == (2, 3)
        # top-left of the DECODED image must be img[0,0]=10
        assert abs(out[0, 0] - 10 / 255.0) < 1e-6

    def test_codec_formats_fall_back_to_fake(self):
        blob = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
        out, sh, sw = self._actor()._decode(blob)
        assert (sh, sw) == (4, 4)  # fake reports target dims
        assert out.shape == (4, 4)

    def test_pipeline_with_real_images(self, tmp_path):
        """media_features-shaped pipeline over a parquet of real PGMs."""
        import pyarrow.parquet as pq

        import ray.data

        from bank_statement_pdf_parser_ray.pipelines.datapipe import MediaDecodeActor

        blobs = []
        for i in range(8):
            img = np.full((5, 5), i * 30, dtype=np.uint8)
            blobs.append(b"P5\n5 5\n255\n" + img.tobytes())
        t = pa.table({"media_id": pa.array(range(8), pa.int64()), "media": pa.array(blobs, pa.binary())})
        pq.write_table(t, str(tmp_path / "media.parquet"))
        ds = ray.data.read_parquet(str(tmp_path / "media.parquet"))
        out = ds.map_batches(
            MediaDecodeActor, batch_format="pyarrow", zero_copy_batch=True, batch_size=4, concurrency=(1, 2)
        ).to_pandas()
        assert out["height"].tolist() == [5] * 8
        assert out["width"].tolist() == [5] * 8
        got = sorted(zip(out["media_id"], (np.array(f. tolist() if hasattr(f,'tolist') else f).mean() for f in out["feature"])))
        for i, m in got:
            assert abs(m - (i * 30) / 255.0) < 1e-6


class TestAudioDecode:
    def test_sine_features_closed_form(self):
        """A pure 440 Hz sine at amplitude 0.5: RMS = 0.5/sqrt(2),
        ZCR = 2f crossings/sec, duration = n/sr."""
        from bank_statement_pdf_parser_ray.pipelines.datapipe import AudioDecodeActor, _synth_wav
        import struct

        sr = 8000
        f = 440.0
        t = np.arange(sr, dtype=np.float64) / sr  # 1.0 s
        x = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype("<i2")
        data = x.tobytes()
        blob = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data)
        tb = pa.table({"media_id": pa.array([1], pa.int64()), "media": pa.array([blob], pa.binary())})
        out = AudioDecodeActor()(tb)
        assert out.column("sample_rate")[0].as_py() == sr
        assert abs(out.column("duration_s")[0].as_py() - 1.0) < 1e-9
        assert abs(out.column("rms")[0].as_py() - 0.5 / np.sqrt(2)) < 1e-3
        assert abs(out.column("zcr_hz")[0].as_py() - 2 * f) < 5

    def test_stereo_downmix_and_word_alignment(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import AudioDecodeActor
        import struct

        sr = 4000
        left = np.full(100, 16384, dtype="<i2")
        right = np.full(100, -16384, dtype="<i2")
        inter = np.empty(200, dtype="<i2"); inter[0::2] = left; inter[1::2] = right
        data = inter.tobytes()
        # an odd-sized junk chunk BEFORE fmt exercises word-aligned walking
        junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
        blob = (b"RIFF" + struct.pack("<I", 100) + b"WAVE" + junk
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
                + b"data" + struct.pack("<I", len(data)) + data)
        out = AudioDecodeActor()(pa.table({"media_id": pa.array([7], pa.int64()), "media": pa.array([blob], pa.binary())}))
        # L+R cancel -> silence
        assert out.column("rms")[0].as_py() == 0.0
        assert out.column("sample_rate")[0].as_py() == sr

    def test_compressed_yields_null_not_fake(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import AudioDecodeActor

        out = AudioDecodeActor()(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "media": pa.array([b"ID3\x04" + bytes(64)], pa.binary()),
        }))
        assert out.column("rms")[0].as_py() is None

    def test_synth_wav_roundtrip(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import AudioDecodeActor, _synth_wav

        blob = _synth_wav(12)
        dec = AudioDecodeActor._decode_wav(blob)
        assert dec is not None
        x, sr = dec
        assert sr == 8000 and len(x) == 2000


class TestVideoFrames:
    def _actor(self, n=4):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import VideoFrameSampleActor

        return VideoFrameSampleActor(n)

    def _table(self, blobs):
        return pa.table(
            {
                "media_id": pa.array(range(len(blobs)), pa.int64()),
                "media": pa.array(blobs, pa.binary()),
            }
        )

    def test_closed_form_luma_and_uniform_indices(self):
        """_synth_y4m(doc_id=3, n_frames=10): frame k is a constant
        plane of (3 + 13k) % 256; sampling 4 of 10 picks floor(i*10/4)
        = frames 0, 2, 5, 7."""
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _synth_y4m

        out = self._actor(4)(self._table([_synth_y4m(3, n_frames=10)]))
        assert out.column("frame_idx").to_pylist() == [0, 2, 5, 7]
        assert out.column("n_frames").to_pylist() == [10] * 4
        assert out.column("fps").to_pylist() == [25.0] * 4
        expect = [round(((3 + 13 * k) % 256) / 255.0, 6) for k in (0, 2, 5, 7)]
        assert out.column("mean_luma").to_pylist() == expect

    def test_short_video_yields_all_frames(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _synth_y4m

        out = self._actor(8)(self._table([_synth_y4m(1, n_frames=3)]))
        assert out.column("frame_idx").to_pylist() == [0, 1, 2]

    def test_c420_plane_offsets(self):
        """C420: each record is Y + 2 quarter chroma planes; the luma
        read must land on the Y plane of the right frame."""
        w, h = 8, 4
        chroma = bytes([99]) * (w * h // 2)
        parts = [b"YUV4MPEG2 W8 H4 F30:1 C420\n"]
        for k in (10, 200):
            parts.append(b"FRAME\n" + bytes([k]) * (w * h) + chroma)
        out = self._actor(2)(self._table([b"".join(parts)]))
        assert out.column("mean_luma").to_pylist() == [round(10 / 255.0, 6), round(200 / 255.0, 6)]
        assert out.column("width").to_pylist() == [8, 8]

    def test_frame_params_force_walk_path(self):
        """A FRAME record with params breaks the fixed-arithmetic fast
        path; the marker walk must still find both frames."""
        w, h = 4, 2
        blob = (
            b"YUV4MPEG2 W4 H2 F25:1 Cmono\n"
            + b"FRAME Xcustom\n" + bytes([50]) * (w * h)
            + b"FRAME\n" + bytes([100]) * (w * h)
        )
        out = self._actor(2)(self._table([blob]))
        assert out.column("mean_luma").to_pylist() == [round(50 / 255.0, 6), round(100 / 255.0, 6)]

    def test_codec_container_yields_null_not_fake(self):
        out = self._actor()(self._table([b"\x1aE\xdf\xa3" + bytes(64)]))  # EBML/webm magic
        assert out.num_rows == 1
        assert out.column("frame_idx")[0].as_py() is None
        assert out.column("mean_luma")[0].as_py() is None

    def test_truncated_tail_frame_dropped(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _synth_y4m

        blob = _synth_y4m(5, n_frames=4)
        out = self._actor(4)(self._table([blob[: len(blob) - 10]]))  # cut into last plane
        assert out.column("frame_idx").to_pylist() == [0, 1, 2]

    def test_pipeline_over_documents(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import video_frames

        t = video_frames("/root/testdata/sf0.001").materialize().take_all()
        assert len(t) > 0
        by_id = {}
        for r in t:
            by_id.setdefault(r["media_id"], []).append(r)
        for mid, rows in by_id.items():
            if mid % 5 == 4:
                # MP4 slot: one container-metadata row — real box parse
                # (geometry, sample count, fps), NULL frame features
                assert len(rows) == 1
                (r,) = rows
                assert r["frame_idx"] is None and r["mean_luma"] is None
                assert r["n_frames"] == 8 + mid % 17
                assert (r["width"], r["height"]) == (320, 240)
                assert abs(r["fps"] - 12.0) < 1e-9
                continue
            # y4m slots: every frame really decoded
            n_frames = 4 + mid % 13
            assert all(r["n_frames"] == n_frames for r in rows)
            assert len(rows) == min(4, n_frames)
            for r in rows:
                assert r["mean_luma"] == round(((mid + 13 * r["frame_idx"]) % 256) / 255.0, 6)


class TestCorpusGovernance:
    """Planted fixtures for the governance operators (pii_scrub,
    repetition_ratio, hash_split, decontaminate); cross-engine parity
    vs DuckDB is covered by test_driver_contract."""

    def _write(self, tmp_path, texts, langs=None):
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs or ["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(x) if x else 0 for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_pii_scrub_redacts_and_counts(self, tmp_path):
        d = self._write(
            tmp_path,
            [
                "contact alice.smith+x@example.co.uk or call 555-123-4567 now",
                "no pii here",
                None,
            ],
        )
        out = dp.pii_scrub(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out.loc[0, "scrubbed"] == "contact <EMAIL> or call <NUM> now"
        assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_nums"] == 1
        assert out.loc[1, "scrubbed"] == "no pii here"
        assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_nums"] == 0
        assert out.loc[2, "scrubbed"] is None or out.loc[2, "scrubbed"] != out.loc[2, "scrubbed"]

    def test_pii_scrub_email_digits_not_double_counted(self, tmp_path):
        # the account number INSIDE the address must not also count as a num
        d = self._write(tmp_path, ["acct 12345678 of u12345678@bank.com"])
        out = dp.pii_scrub(d).to_pandas()
        assert out.loc[0, "n_emails"] == 1
        assert out.loc[0, "n_nums"] == 1
        assert out.loc[0, "scrubbed"] == "acct <NUM> of <EMAIL>"

    def test_repetition_ratio_counts_duplicate_lines(self, tmp_path):
        d = self._write(tmp_path, ["a\nb\na\na", "x\ny", "", None])
        out = dp.repetition_ratio(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out.loc[0, "n_lines"] == 4 and out.loc[0, "n_distinct_lines"] == 2
        assert out.loc[0, "dup_line_ratio"] == 0.5
        assert out.loc[1, "dup_line_ratio"] == 0.0
        # empty text splits to [""] -> 1 line, 0 dups
        assert out.loc[2, "n_lines"] == 1 and out.loc[2, "dup_line_ratio"] == 0.0
        assert np.isnan(out.loc[3, "dup_line_ratio"])

    def test_hash_split_deterministic_and_complete(self, tmp_path):
        d = self._write(tmp_path, [f"doc {i}" for i in range(200)], langs=["en", "fr"] * 100)
        out1 = dp.hash_split(d)
        out2 = dp.hash_split(d)
        assert out1.equals(out2)  # deterministic
        assert out1["n_docs"].sum() == 200
        assert set(out1["split"]) <= {"train", "val", "test"}
        # train dominates by construction (~80%)
        train = out1[out1["split"] == "train"]["n_docs"].sum()
        assert train > 120

    def test_split_of_boundaries(self):
        assert dp._split_of("cc" + "0" * 30) == "train"
        assert dp._split_of("cd" + "0" * 30) == "val"
        assert dp._split_of("e5" + "0" * 30) == "val"
        assert dp._split_of("e6" + "0" * 30) == "test"
        assert dp._split_of("00" + "0" * 30) == "train"
        assert dp._split_of("ff" + "0" * 30) == "test"

    def test_decontaminate_flags_planted_overlap(self, tmp_path):
        bench = "alpha beta gamma delta epsilon zeta eta theta"  # doc_id 0 (0 % 41 == 0)
        leaked = "prefix words then alpha beta gamma delta epsilon and more"  # shares a 5-gram
        clean = "totally unrelated content with no shared phrases at all here"
        d = self._write(tmp_path, [bench, leaked, clean])
        out = dp.decontaminate(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        # benchmark doc itself is excluded from the output
        assert out["doc_id"].tolist() == [1, 2]
        assert bool(out.loc[0, "contaminated"]) and out.loc[0, "n_hits"] >= 1
        assert not bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] == 0


class TestPretrainAssembly:
    def _write(self, tmp_path, texts, sources=None):
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(sources or ["src0"] * n, pa.string()),
                "n_chars": pa.array([len(x) if x else 0 for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_mixture_sample_rates(self, tmp_path):
        n = 400
        srcs = (["src0"] * 100) + (["src2"] * 100) + (["srcX"] * 200)
        d = self._write(tmp_path, [f"doc {i}" for i in range(n)], sources=srcs)
        out = dp.mixture_sample(d).to_pandas()
        by = out.groupby("source").size()
        assert by.get("src0", 0) == 100  # rate 1.0 keeps everything
        assert 25 <= by.get("src2", 0) <= 75  # rate 0.5
        assert by.get("srcX", 0) <= 45  # default rate 0.1
        # deterministic
        out2 = dp.mixture_sample(d).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])

    def test_pack_sequences_invariants(self, tmp_path):
        rng = np.random.default_rng(3)
        texts = [" ".join(["w"] * int(rng.integers(1, 700))) for _ in range(300)]
        texts += ["", None]  # unpackable rows are skipped
        d = self._write(tmp_path, texts)
        out = dp.pack_sequences(d, seq_len=512).to_pandas()
        # capacity: no sequence exceeds seq_len
        assert (out["n_tokens"] <= 512).all()
        # conservation: truncated token mass is fully assigned
        expect = sum(min(len(t.split()), 512) for t in texts if t)
        assert out["n_tokens"].sum() == expect
        assert out["n_docs"].sum() == 300
        # greedy fill is high for random doc lengths
        assert out["fill"].mean() > 0.6
        # deterministic across runs
        out2 = dp.pack_sequences(d, seq_len=512).to_pandas()
        assert out.equals(out2)

    def test_pack_sequences_truncates_long_doc(self, tmp_path):
        d = self._write(tmp_path, [" ".join(["x"] * 2000)])
        out = dp.pack_sequences(d, seq_len=512).to_pandas()
        assert len(out) == 1 and out.loc[0, "n_tokens"] == 512 and out.loc[0, "fill"] == 1.0


class TestHeavyHitters:
    """Misra-Gries sketch guarantees vs exact counts on a skewed
    planted corpus: never overcounts, merged deficit within the
    2n/(counters+1) bound, and every word heavier than the bound
    survives the merge."""

    def _skewed_dir(self, tmp_path):
        rng = np.random.RandomState(3)
        # hot words with planted frequencies + a heavy unique tail
        hot = {"alpha": 900, "beta": 500, "gamma": 300}
        words = [w for w, n in hot.items() for _ in range(n)]
        words += [f"tail{i}" for i in range(4000)]
        rng.shuffle(words)
        docs, step = [], 40
        for i in range(0, len(words), step):
            docs.append(" ".join(words[i : i + step]))
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": docs,
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": pa.array([len(x) for x in docs], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path), hot, len(words)

    def test_guarantees_vs_exact(self, tmp_path):
        d, hot, n = self._skewed_dir(tmp_path)
        counters = 64
        out = dp.heavy_hitters(d, k=10_000, counters=counters)
        bound = 2 * n // (counters + 1)
        assert (out["err_bound"] == bound).all()
        est = dict(zip(out["word"], out["est_n"]))
        for w, true_n in hot.items():
            if true_n > bound:
                assert w in est, w                       # guaranteed survivor
            if w in est:
                assert est[w] <= true_n                   # never overcounts
                assert est[w] >= true_n - bound           # bounded deficit
        # tail words may survive, but never with an estimate above truth
        for w, e in est.items():
            if w.startswith("tail"):
                assert e <= 1

    def test_topk_and_determinism(self, tmp_path):
        d, hot, _ = self._skewed_dir(tmp_path)
        a = dp.heavy_hitters(d, k=3, counters=64)
        b = dp.heavy_hitters(d, k=3, counters=64)
        assert a.equals(b)
        assert a["word"].tolist() == ["alpha", "beta", "gamma"]


class TestCountMin:
    """MG+CM bracket: for every probed word the exact count lies in
    [lower_n (MG undercount), upper_n (CM overcount)], CM never
    undercounts, and the sketch pair is deterministic."""

    def test_bracket_contains_exact(self, tmp_path):
        d, hot, n = TestHeavyHitters()._skewed_dir(tmp_path)
        out = dp.count_min_freq(d, k=3, width=1024, depth=4)
        assert set(out["word"]) == set(hot)
        for _, r in out.iterrows():
            true_n = hot[r["word"]]
            assert r["lower_n"] <= true_n <= r["upper_n"], (r["word"], true_n, r["lower_n"], r["upper_n"])
            # CM overshoot within the eps*n bound (w.h.p.; depth=4 on a
            # 1024-slot table over <5k distinct words is far inside it)
            assert r["upper_n"] - true_n <= r["eps_n"]

    def test_determinism(self, tmp_path):
        d, _, _ = TestHeavyHitters()._skewed_dir(tmp_path)
        a = dp.count_min_freq(d, k=3, width=512, depth=3)
        b = dp.count_min_freq(d, k=3, width=512, depth=3)
        assert a.equals(b)


class TestSourceCap:
    def test_cap_and_rank(self, tmp_path):
        import pyarrow.parquet as pq

        # source "big" has 60 docs (> cap 50), "tiny" has 3; interleave
        # ids so per-batch partial cuts see both sources
        ids = list(range(63))
        srcs = ["big" if i % 21 != 20 else "tiny" for i in ids]
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "text": pa.array(["x"] * 63, pa.string()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        out = dp.source_cap(str(tmp_path)).to_pandas()
        big = out[out["source"] == "big"].sort_values("doc_id")
        tiny = out[out["source"] == "tiny"].sort_values("doc_id")
        assert len(big) == 50 and len(tiny) == 3
        # the 50 kept are the 50 SMALLEST big doc_ids, ranked 1..50
        big_ids = [i for i in ids if srcs[i] == "big"][:50]
        assert list(big["doc_id"]) == big_ids
        assert list(big["src_rank"]) == list(range(1, 51))
        assert list(tiny["src_rank"]) == [1, 2, 3]


class TestChunkDocuments:
    def _run(self, tmp_path, texts):
        import pyarrow.parquet as pq

        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        return dp.chunk_documents(str(tmp_path)).to_pandas()

    def test_overlap_and_boundaries(self, tmp_path):
        words = [f"w{i}" for i in range(100)]  # 100 tokens -> chunks at 0, 48, 96
        out = self._run(tmp_path, [" ".join(words), "short doc", "", None, "   "])
        d0 = out[out["doc_id"] == 0].sort_values("chunk_idx")
        assert list(d0["chunk_idx"]) == [0, 1, 2]
        assert list(d0["n_tokens"]) == [64, 52, 4]
        # overlap: chunk 1 starts at token 48, inside chunk 0's range
        assert d0.iloc[1]["chunk_text"].split()[0] == "w48"
        assert d0.iloc[2]["chunk_text"] == "w96 w97 w98 w99"
        d1 = out[out["doc_id"] == 1]
        assert len(d1) == 1 and d1.iloc[0]["chunk_text"] == "short doc"
        # empty / NULL / whitespace-only docs emit no chunks
        assert set(out["doc_id"]) == {0, 1}

    def test_unicode_whitespace_and_tabs(self, tmp_path):
        out = self._run(tmp_path, ["a\tb\n  c"])
        assert out.iloc[0]["chunk_text"] == "a b c"
        assert out.iloc[0]["n_tokens"] == 3


class TestCollocations:
    def test_pmi_favors_exclusive_pair(self, tmp_path):
        import pyarrow.parquet as pq

        # "foo bar" always co-occur (exclusive); "the cat" both appear
        # with many other partners -> lower PMI despite equal pair count
        texts = ["foo bar . the cat ."] * 5 + [f"the w{i} cat x{i} ." for i in range(20)]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(docs, str(tmp_path / "documents.parquet"))
        out = dp.collocations(str(tmp_path))
        pairs = list(zip(out["w1"], out["w2"]))
        assert ("foo", "bar") in pairs
        pmi = dict(zip(pairs, out["pmi"]))
        if ("the", "cat") in pmi:
            assert pmi[("foo", "bar")] > pmi[("the", "cat")]
        # min-support: every returned pair occurs >= 5 times
        assert (out["n2"] >= 5).all()


class TestImageNeardup:
    def _docs_table(self, texts):
        n = len(texts)
        return pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s or "") for s in texts], pa.int64()),
            }
        )

    def test_duplicate_texts_cluster(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import image_neardup

        texts = ["alpha beta gamma"] * 3 + ["a completely different body of pixels"] * 2 + [
            "unique third document payload xyz"
        ]
        pq.write_table(self._docs_table(texts), str(tmp_path / "documents.parquet"))
        out = image_neardup(str(tmp_path)).to_pandas().sort_values("media_id")
        # total output: clusters {0,1,2} and {3,4}, singleton 5 kept with size 1
        assert out["media_id"].tolist() == [0, 1, 2, 3, 4, 5]
        assert out[out["media_id"] < 3]["cluster_rep"].tolist() == [0, 0, 0]
        assert out[out["media_id"] < 3]["cluster_size"].tolist() == [3, 3, 3]
        assert out[out["media_id"].isin([3, 4])]["cluster_rep"].tolist() == [3, 3]
        assert out[out["media_id"] == 5]["cluster_size"].tolist() == [1]
        # the dedup filter: drop every non-representative member
        survivors = out[out["cluster_rep"] == out["media_id"]]
        assert survivors["media_id"].tolist() == [0, 3, 5]

    def test_ahash_brightness_invariant(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _ahash_bits

        rng = np.random.default_rng(3)
        img = rng.random((8, 8)).astype(np.float32)
        assert _ahash_bits(img) == _ahash_bits(img + 0.17)  # uniform shift
        other = rng.random((8, 8)).astype(np.float32)
        assert _ahash_bits(img) != _ahash_bits(other)

    def test_real_pgm_decode_feeds_hash(self):
        """The synthesized blobs must take the REAL P5 decode path, not
        the fake fallback: decoding by hand reproduces the hash."""
        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            MediaDecodeActor,
            _ahash_bits,
            _synth_pgm,
        )

        blob = _synth_pgm(7, "some deterministic text body")
        img = MediaDecodeActor._decode_image(blob)
        assert img is not None and img.shape == (48, 64)
        actor = MediaDecodeActor(target_size=(8, 8))
        resized, sh, sw = actor._decode(blob)
        assert (sh, sw) == (48, 64)
        assert _ahash_bits(resized) != 0


class TestAudioVideoNeardup:
    """Perceptual audio/video dedup: planted re-levelled / re-graded
    copies (doc_id % 4 == 1 copies doc_id - 1) collapse to their base's
    fingerprint; distinct bases stay distinct."""

    def _write_docs(self, tmp_path, n):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([6] * n, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))

    def test_audio_fp_volume_invariant(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _AudioFpActor, _synth_wav_nd

        t = pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "media": pa.array([_synth_wav_nd(i) for i in range(3)], pa.binary()),
            }
        )
        out = _AudioFpActor()(t)
        fps = dict(zip(out.column("media_id").to_pylist(), out.column("afp").to_pylist()))
        assert fps[0] == fps[1]  # half-volume copy collapses
        assert fps[0] != fps[2]  # distinct base envelope differs

    def test_video_fp_brightness_invariant(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _VideoFpActor, _synth_y4m_nd

        t = pa.table(
            {
                "media_id": pa.array([0, 1, 2], pa.int64()),
                "media": pa.array([_synth_y4m_nd(i) for i in range(3)], pa.binary()),
            }
        )
        out = _VideoFpActor()(t)
        fps = dict(zip(out.column("media_id").to_pylist(), out.column("vfp").to_pylist()))
        assert fps[0] == fps[1]  # re-graded copy collapses
        assert fps[0] != fps[2]  # distinct base pattern differs

    def test_audio_neardup_clusters(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import audio_neardup

        self._write_docs(tmp_path, 12)
        out = audio_neardup(str(tmp_path)).to_pandas().sort_values("media_id")
        assert out["media_id"].tolist() == list(range(12))
        rep = dict(zip(out["media_id"], out["cluster_rep"]))
        size = dict(zip(out["media_id"], out["cluster_size"]))
        for b in (0, 4, 8):  # planted pairs (b, b+1)
            assert rep[b + 1] == rep[b] == b and size[b] == size[b + 1] == 2
        for s in (2, 3, 6, 7, 10, 11):  # everyone else is a singleton
            assert rep[s] == s and size[s] == 1

    def test_video_neardup_clusters(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import video_neardup

        self._write_docs(tmp_path, 12)
        out = video_neardup(str(tmp_path)).to_pandas().sort_values("media_id")
        assert out["media_id"].tolist() == list(range(12))
        rep = dict(zip(out["media_id"], out["cluster_rep"]))
        size = dict(zip(out["media_id"], out["cluster_size"]))
        for b in (0, 4, 8):
            assert rep[b + 1] == rep[b] == b and size[b] == size[b + 1] == 2
        for s in (2, 3, 6, 7, 10, 11):
            assert rep[s] == s and size[s] == 1


class TestTemperatureMixture:
    def test_alpha_flattens_head_language(self, tmp_path):
        """UniMax semantics: at alpha=0.5 the minority language's share
        of the mix exceeds its natural corpus share."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import temperature_mixture

        langs = ["en"] * 90 + ["sw"] * 10
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(100), pa.int64()),
                "text": pa.array(["x"] * 100, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array(["t"] * 100),
                "n_chars": pa.array([1] * 100, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = temperature_mixture(str(tmp_path), m=20, alpha=0.5).to_pandas()
        got = out["lang"].value_counts().to_dict()
        # sqrt weights: en 9.487, sw 3.162 -> quotas floor(20*.75)=15, floor(20*.25)=5
        assert got == {"en": 15, "sw": 5}
        assert 5 / 20 > 10 / 100  # flattened share beats the natural share


class TestPerplexityBuckets:
    def test_rare_continuation_lands_in_tail(self, tmp_path):
        """The doc whose bigram is the rare continuation of a shared
        first word scores lowest and lands in tier 1 (CCNet tail);
        the dominant-continuation docs fill tier 3 (head)."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import perplexity_buckets

        texts = ["a b"] * 8 + ["a c"]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(9), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 9),
                "source": pa.array(["t"] * 9),
                "n_chars": pa.array([3] * 9, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = perplexity_buckets(str(tmp_path)).to_pandas().set_index("doc_id")
        assert out.loc[8, "tier"] == 1  # ln(1/9) — the rare continuation
        assert out.loc[7, "tier"] == 3  # ln(8/9), highest doc_id tiebreak
        assert np.isclose(out.loc[8, "lp"], np.log(1 / 9), atol=1e-6)
        assert np.isclose(out.loc[0, "lp"], np.log(8 / 9), atol=1e-6)


class TestCompressionRatio:
    def test_matches_zlib_and_orders_redundancy(self, tmp_path):
        import zlib

        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import compression_ratio

        texts = [
            "spam " * 400,                         # highly redundant -> tiny ratio
            "The quick brown fox jumps over the lazy dog. " * 20,
            "".join(chr(33 + c) for c in np.random.default_rng(4).integers(0, 90, 2000)),
            None,
            "",
        ]
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s or "") for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id")["zlib_ratio"]
        for i, s in enumerate(texts):
            if not s:
                assert np.isnan(out[i])
            else:
                raw = s.encode()
                assert out[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert max(out[0], out[1]) < out[2]  # repetitive text beats noise


class TestLeakageSafeSplit:
    def test_duplicates_co_assign(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import leakage_safe_split

        texts = ["same body"] * 40 + [f"unique {i}" for i in range(200)] + [None, None]
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s or "") for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = leakage_safe_split(str(tmp_path)).to_pandas()
        assert len(out) == n
        dup = out[out["doc_id"] < 40]
        assert dup["split"].nunique() == 1 and dup["cluster_rep"].unique().tolist() == [0]
        nulls = out[out["doc_id"] >= n - 2]
        assert nulls["split"].nunique() == 1  # null texts form ONE cluster
        # the unique docs spread across all three splits
        uniq = out[(out["doc_id"] >= 40) & (out["doc_id"] < n - 2)]
        assert set(uniq["split"]) == {"train", "val", "test"}


class TestFuzzyClusters:
    def test_components_over_edit_pairs(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import fuzzy_clusters

        base = "hello world this is a long document body"
        texts = [
            base,                         # 0
            base.replace("long", "lonX"), # 1: ~0 edits within prefix -> edge (0,1)
            base.replace("this", "thXs"), # 2: edge (0,2) -> component {0,1,2}
            "completely different text body here",  # 3: singleton
        ]
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = fuzzy_clusters(str(tmp_path)).set_index("doc_id")["cluster_id"]
        assert out[0] == out[1] == out[2] == 0
        assert out[3] == 3

    def test_no_pairs_all_singletons(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import fuzzy_clusters

        texts = ["alpha one body", "beta two body text", "gamma three different"]
        n = len(texts)
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = fuzzy_clusters(str(tmp_path)).set_index("doc_id")["cluster_id"]
        assert out.to_dict() == {0: 0, 1: 1, 2: 2}


class TestGroupedHLL:
    def test_per_type_within_5pct_with_nulls(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import approx_distinct_per_type

        rng = np.random.default_rng(9)
        # skewed per-type cardinalities + NULL type group + NULL users
        spec = {"view": 3000, "click": 400, "rare": 7, None: 150}
        types, users = [], []
        for tv, card in spec.items():
            n = card * 4
            types += [tv] * n
            users += rng.integers(0, card, n).tolist()
        users[0] = None  # NULL user: excluded from COUNT DISTINCT
        t = pa.table(
            {
                "event_id": pa.array(np.arange(len(types)), pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = approx_distinct_per_type(str(tmp_path))
        got = {
            (None if pd.isna(r.event_type) else r.event_type): r.approx_distinct
            for r in out.itertuples()
        }
        assert set(got) == set(spec)
        for tv, card in spec.items():
            exact = len(set(u for u, ty in zip(users, types) if ty == tv and u is not None))
            assert abs(got[tv] - exact) <= max(1, 0.05 * exact), (tv, got[tv], exact)


class TestSemanticDecontaminate:
    def test_planted_leak_flags(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import semantic_decontaminate

        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(24, 16)).astype(np.float32)
        # corpus vec 20 IS benchmark vec 3 (verbatim eval leak); corpus
        # vec 21 is a light paraphrase of benchmark 7; the rest random
        vecs[20] = vecs[3]
        vecs[21] = (vecs[7] + rng.normal(size=16).astype(np.float32) * 0.1).astype(np.float32)
        emb = pa.table(
            {
                "vec_id": pa.array(range(24), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 24, pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out = semantic_decontaminate(str(tmp_path), n_benchmark=16, threshold=0.9).set_index(
            "vec_id"
        )
        assert sorted(out.index.tolist()) == list(range(16, 24))  # one row per corpus vec
        assert bool(out.loc[20, "contaminated"]) and out.loc[20, "benchmark_id"] == 3
        assert bool(out.loc[21, "contaminated"]) and out.loc[21, "benchmark_id"] == 7
        clean = out.drop([20, 21])
        assert not clean["contaminated"].any()

    def test_sink_variant_streams_same_verdicts(self, tmp_path):
        """write_semantic_decontaminate streams to parquet without a
        driver collect; re-reading the sink must equal the DataFrame
        contract form row-for-row."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            semantic_decontaminate,
            write_semantic_decontaminate,
        )

        rng = np.random.default_rng(6)
        vecs = rng.normal(size=(24, 16)).astype(np.float32)
        vecs[22] = vecs[5]
        emb = pa.table(
            {
                "vec_id": pa.array(range(24), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 24, pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out_dir = str(tmp_path / "verdicts")
        summary = write_semantic_decontaminate(str(tmp_path), out_dir, n_benchmark=16, threshold=0.9)
        assert summary["rows"] == 8 and summary["files"] >= 1
        import pyarrow.dataset as pads

        sunk = (
            pads.dataset(out_dir).to_table().to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        want = semantic_decontaminate(str(tmp_path), n_benchmark=16, threshold=0.9)
        pd.testing.assert_frame_equal(sunk, want)

    def test_duplicate_benchmarks_tie_break_lowest_id(self, tmp_path):
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import semantic_decontaminate

        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(18, 8)).astype(np.float32)
        vecs[11] = vecs[2]          # duplicate benchmark pair (2, 11)
        vecs[17] = vecs[2] * 2.0    # corpus vec equidistant to both
        emb = pa.table(
            {
                "vec_id": pa.array(range(18), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 18, pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out = semantic_decontaminate(str(tmp_path), n_benchmark=16, threshold=0.99).set_index(
            "vec_id"
        )
        assert out.loc[17, "benchmark_id"] == 2  # exact tie -> lowest id
        assert bool(out.loc[17, "contaminated"])


class TestHardNegatives:
    def test_nearest_same_label_excluded(self, tmp_path):
        """The vector closest to the anchor shares its label and must be
        excluded; the closest different-label vector ranks first."""
        import pyarrow.parquet as pq

        rng = np.random.RandomState(3)
        vecs = rng.randn(10, 16).astype(np.float32)
        vecs[1] = vecs[0] + rng.randn(16).astype(np.float32) * 0.01  # same-label twin
        vecs[2] = vecs[0] + rng.randn(16).astype(np.float32) * 0.10  # closest negative
        labels = [0, 0, 1, 1, 1, 2, 2, 2, 2, 2]
        emb = pa.table(
            {
                "vec_id": pa.array(range(10), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
        out = dp.hard_negatives(str(tmp_path), anchor_ids=(0,), k=3).to_pandas()
        assert 1 not in out["vec_id"].tolist()  # same-label twin never a negative
        assert out.loc[out["rank"] == 1, "vec_id"].item() == 2
        # exact parity with a numpy brute force over the opposite-label set
        m = vecs.astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m[0]
        order = [i for i in np.argsort(-sims) if labels[i] != 0][:3]
        assert out["vec_id"].tolist() == [int(i) for i in order]


class TestMediaMixedFormats:
    def test_media_features_exercises_every_decoder(self, tmp_path):
        """media_features' corpus mixes PGM/BMP/JPEG/PNG/GIF/TIFF/unknown
        by doc_id: real decodes report the 48x64 SOURCE dims, the codec
        stand-in reports the 32x32 target dims (fake path)."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.datapipe import media_features

        texts = [f"document body number {i} with some words" for i in range(20)]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(20), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 20),
                "source": pa.array(["t"] * 20),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = media_features(str(tmp_path)).to_pandas().set_index("media_id").sort_index()
        assert len(out) == 20
        for i in range(20):
            if i % 7 == 6:  # unknown format -> fake path -> target dims
                assert (out.loc[i, "height"], out.loc[i, "width"]) == (32, 32)
            else:  # PGM/BMP/JPEG/PNG/GIF/TIFF all really decode -> source dims
                assert (out.loc[i, "height"], out.loc[i, "width"]) == (48, 64), i
        # lossless formats of the same raster must agree exactly on the
        # feature vector: PGM (id 0), BMP (id 1), PNG (id 3) rasters differ
        # per id, so compare PNG against a direct PGM of id 3's raster
        assert out.loc[2, "n_bytes"] > 100  # JPEG blob is non-trivial
        feats = np.array(out.loc[2, "feature"])
        assert feats.shape == (32,) and 0.0 <= feats.min() and feats.max() <= 1.0

    def test_png_row_matches_lossless_pgm(self):
        from bank_statement_pdf_parser_ray.core.png import encode_png_gray
        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            MediaDecodeActor,
            _synth_raster,
        )

        raster = _synth_raster(3, "png parity with pgm")
        img = np.frombuffer(raster, np.uint8).reshape(48, 64)
        via_png = MediaDecodeActor._decode_image(encode_png_gray(img))
        via_pgm = MediaDecodeActor._decode_image(b"P5 64 48 255\n" + raster)
        assert via_png is not None and via_pgm is not None
        assert np.array_equal(via_png, via_pgm)

    def test_synth_bmp_decodes_to_raster(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            MediaDecodeActor,
            _synth_bmp,
            _synth_raster,
        )

        raster = _synth_raster(5, "hello bmp world")
        img = MediaDecodeActor._decode_image(_synth_bmp(raster))
        assert img is not None and img.shape == (48, 64)
        assert np.allclose(img, np.frombuffer(raster, np.uint8).reshape(48, 64) / 255.0)
