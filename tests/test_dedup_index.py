"""Sharded cross-wave dedup index (state/dedup_index.py) + the
events_ewma blockwise scan — semantics the driver-contract oracle
parametrization can't isolate (actor statefulness, chunk boundaries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bank_statement_pdf_parser_ray.state.dedup_index import (
    DedupIndex,
    text_digests,
)


class TestDedupIndex:
    def test_check_and_add_first_sighting_semantics(self):
        idx = DedupIndex(n_shards=4)
        dg = text_digests(["a", "b", "a", "c", "b", "a"])
        got = idx.check_and_add(dg)
        # first sighting of each distinct text reads True, repeats False
        assert got == [True, True, False, True, False, False]
        # a later wave sees everything as known
        assert idx.check_and_add(text_digests(["a", "c", "d"])) == [False, False, True]
        assert idx.size() == 4

    def test_contains_is_readonly(self):
        idx = DedupIndex(n_shards=3)
        idx.add(text_digests(["x"]))
        assert idx.contains(text_digests(["x", "y"])) == [True, False]
        # probing did not record y
        assert idx.contains(text_digests(["y"])) == [False]
        assert idx.size() == 1

    def test_routing_spreads_and_preserves_order(self):
        idx = DedupIndex(n_shards=5)
        texts = [f"doc-{i}" for i in range(200)]
        idx.add(text_digests(texts))
        assert idx.size() == 200
        # per-shard sets partition the digest space (no double counting)
        import ray

        sizes = ray.get([s.size.remote() for s in idx.shards])
        assert sum(sizes) == 200
        assert max(sizes) < 200  # actually sharded, not all on one actor
        # order of a mixed probe is preserved through the fan-out/regather
        probe = ["doc-7", "nope", "doc-0", "also-no", "doc-199"]
        assert idx.contains(text_digests(probe)) == [True, False, True, False, True]

    def test_snapshot_restore_roundtrip(self, tmp_path):
        from bank_statement_pdf_parser_ray.state.dedup_index import (
            restore_index,
            snapshot_index,
        )

        idx = DedupIndex(n_shards=4)
        texts = [f"t-{i}" for i in range(57)]
        idx.add(text_digests(texts))
        p = str(tmp_path / "index.parquet")
        assert snapshot_index(idx, p) == 57
        # restore with a DIFFERENT shard count: resharding is a read
        back = restore_index(p, n_shards=3)
        assert back.size() == 57
        assert back.contains(text_digests(["t-0", "t-56", "nope"])) == [True, True, False]

    def test_ingest_dedup_matches_set_algebra(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import ingest_dedup

        sf = "/root/testdata/sf0.001"
        got = ingest_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        docs = docs[docs.text.notna()]
        import hashlib

        docs["h"] = [hashlib.md5(t.encode()).hexdigest() for t in docs.text]
        w1 = set(docs[docs.doc_id % 3 != 0].h)
        novel = docs[~docs.h.isin(w1)]
        exp = novel.groupby("h", as_index=False).doc_id.min()
        assert len(got) == len(exp)
        assert set(zip(got.doc_id, got.text_md5)) == set(zip(exp.doc_id, exp.h))


def _ewma_ref(xs: list[float], a: float = 0.3) -> list[float]:
    out, y = [], None
    for x in xs:
        y = x if y is None else a * x + (1 - a) * y
        out.append(y)
    return out


class TestEventsEwma:
    def test_block_boundary_long_history(self, tmp_path):
        # one user with 700 valid rows crosses two 256-row block
        # boundaries; a second short user interleaves to exercise the
        # per-run carry isolation; NULLs punched in to shift positions
        rng = np.random.default_rng(7)
        n = 700
        rows = []
        for i in range(n):
            rows.append((i * 2, 1, i * 1_000_000, float(rng.normal(10, 3))))
            if i % 50 == 0:
                rows.append((i * 2 + 1, 2, i * 1_000_000, None))  # NULL value rows
        for i in range(5):
            rows.append((10_000 + i, 2, i * 1_000_000 + 17, float(i)))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")

        from bank_statement_pdf_parser_ray.pipelines.windows import events_ewma

        got = events_ewma(str(tmp_path)).to_pandas()
        g1 = got[got.user_id == 1].sort_values(["ts", "event_id"])
        exp1 = _ewma_ref([r[3] for r in rows if r[1] == 1])
        np.testing.assert_allclose(g1.ewma.to_numpy(), np.round(np.asarray(exp1) + 1e-9, 6), atol=1e-9)
        g2 = got[(got.user_id == 2)].sort_values(["ts", "event_id"])
        valid2 = g2[g2.ewma.notna()]
        exp2 = _ewma_ref([float(i) for i in range(5)])
        np.testing.assert_allclose(valid2.ewma.to_numpy(), np.round(np.asarray(exp2) + 1e-9, 6), atol=1e-9)
        # the NULL-value rows emit NULL and do not disturb the state
        assert g2.ewma.isna().sum() == 14

    def test_nan_poisons_from_first_occurrence(self, tmp_path):
        vals = [1.0, 2.0, float("nan"), 3.0, 4.0]
        t = pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "user_id": pa.array([1] * 5, pa.int64()),
                "ts": pa.array([i * 1000 for i in range(5)], pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        from bank_statement_pdf_parser_ray.pipelines.windows import events_ewma

        got = events_ewma(str(tmp_path)).to_pandas().sort_values("event_id")
        e = got.ewma.to_numpy()
        np.testing.assert_allclose(e[:2], [1.0, 1.3], atol=1e-9)
        assert np.isnan(e[2:]).all()


class TestEvalGates:
    def test_minhash_eval_full_recall_on_fixtures(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import minhash_eval

        r = minhash_eval("/root/testdata/sf0.001").iloc[0]
        assert r.n_truth > 0  # the fixture plants near-dups
        assert r.recall == 1.0  # 16x4 bands at J>=0.8: theoretical 0.9998
        assert r.n_hit == r.n_truth

    def test_ann_recall_reports_all_legs(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import ann_recall

        r = ann_recall("/root/testdata/sf0.001")
        assert list(r.columns) == ["query_id", "recall_lsh", "recall_ivf", "recall_pq"]
        assert len(r) == 3
        assert (r[["recall_lsh", "recall_ivf", "recall_pq"]].to_numpy() >= 0).all()
        assert (r[["recall_lsh", "recall_ivf", "recall_pq"]].to_numpy() <= 1).all()


class TestIvfIndexed:
    def test_pruned_probe_matches_mask_variant_and_prunes(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import (
            knn_cosine_ivf,
            knn_cosine_ivf_indexed,
        )

        sf = "/root/testdata/sf0.001"
        a = knn_cosine_ivf_indexed(sf, nprobe=2).to_pandas()
        b = knn_cosine_ivf(sf, nprobe=2).to_pandas()
        key = ["query_id", "vec_id", "rank"]
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True)
        )

    def test_index_layout_prunes_files(self, tmp_path):
        import os

        import pyarrow.dataset as pads

        from bank_statement_pdf_parser_ray.pipelines.datapipe import vector_index_build

        out = str(tmp_path / "ivf")
        vector_index_build("/root/testdata/sf0.001", out, n_centroids=8)
        cells = [d for d in os.listdir(out) if d.startswith("cell=")]
        assert len(cells) >= 2  # partitioned layout actually split
        # a 2-cell read touches only those directories' rows
        full = pads.dataset(out, partitioning="hive").to_table(columns=["vec_id"]).num_rows
        import pyarrow.compute as pc

        two = (
            pads.dataset(out, partitioning="hive")
            .to_table(columns=["vec_id"], filter=pc.field("cell").isin([0, 1]))
            .num_rows
        )
        assert 0 < two < full
