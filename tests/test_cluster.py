"""Distributed spherical k-means + SemDeDup (pipelines/cluster.py):
exact parity vs an in-process numpy Lloyd's reference with identical
init/update rules, on planted well-separated blobs (so float summation
order across blocks cannot flip an assignment)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bank_statement_pdf_parser_ray.pipelines import cluster as cl
from bank_statement_pdf_parser_ray.pipelines import datapipe as dp


def _write_emb(tmp_path, vecs):
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _blobs(n_per=40, d=8, seed=3):
    """Three tight, well-separated unit-sphere blobs."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(3, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for c in centers:
        pts = c + rng.randn(n_per, d) * 0.02
        vecs.extend(pts)
    return np.array(vecs)


def _numpy_kmeans(x, k, iters):
    """The reference: same farthest-point init, argmax assignment
    (first-max tie rule), empty cluster keeps previous centroid."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    cent = cl._farthest_point_init(x[: cl._INIT_SAMPLE], k)
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-30)
    return cent, np.argmax(x @ cent.T, axis=1)


class TestKMeans:
    def test_matches_numpy_reference_on_blobs(self, tmp_path):
        vecs = _blobs()
        d = _write_emb(tmp_path, vecs)
        k, iters = 3, 4
        # the engine reads float32 parquet; feed the reference the same
        # round-tripped precision
        x32 = vecs.astype(np.float32).astype(np.float64)
        ref_cent, ref_assign = _numpy_kmeans(x32, k, iters)
        got_cent = cl.kmeans_centroids(d, k=k, iters=iters)
        assert np.allclose(got_cent, ref_cent, atol=1e-6)
        out = cl.kmeans_embeddings(d, k=k, iters=iters).to_pandas().sort_values("vec_id")
        assert out["cluster_id"].to_numpy().tolist() == ref_assign.tolist()
        # planted structure recovered: each blob is one pure cluster
        labels = out["cluster_id"].to_numpy()
        for b in range(3):
            blob = labels[b * 40 : (b + 1) * 40]
            assert len(set(blob.tolist())) == 1
        assert len(set(labels.tolist())) == 3

    def test_assignment_covers_every_vector(self, tmp_path):
        d = _write_emb(tmp_path, _blobs(n_per=10))
        out = cl.kmeans_embeddings(d, k=2, iters=2).to_pandas()
        assert sorted(out["vec_id"].tolist()) == list(range(30))
        assert (out["sim"] > 0.0).all()


class TestSemanticDedup:
    def test_subset_of_exact_and_planted_recall(self, tmp_path):
        rng = np.random.RandomState(0)
        vecs = rng.randn(30, 16)
        vecs[1] = vecs[0] + rng.randn(16) * 0.01  # planted near-dup (0, 1)
        vecs[11] = vecs[10] + rng.randn(16) * 0.01  # planted near-dup (10, 11)
        d = _write_emb(tmp_path, vecs)
        got = {
            (a, b)
            for a, b in cl.semantic_dedup(d, threshold=0.9, k=4, iters=3)
            .to_pandas()[["vec_a", "vec_b"]]
            .itertuples(index=False)
        }
        exact = {
            (a, b)
            for a, b in dp.embedding_neardup(d, threshold=0.9)
            .to_pandas()[["vec_a", "vec_b"]]
            .itertuples(index=False)
        }
        assert got <= exact
        # near-identical vectors share an argmax centroid -> both planted
        # pairs must be recalled
        assert (0, 1) in got and (10, 11) in got

    def test_no_pairs_below_threshold(self, tmp_path):
        rng = np.random.RandomState(5)
        d = _write_emb(tmp_path, rng.randn(20, 16))
        out = cl.semantic_dedup(d, threshold=0.999, k=2, iters=2).to_pandas()
        assert len(out) == 0


class TestClusterSample:
    def test_prototypes_are_max_sim_members(self, tmp_path):
        vecs = _blobs(n_per=40)
        d = _write_emb(tmp_path, vecs)
        k, iters, m = 3, 4, 5
        out = cl.cluster_sample(d, k=k, iters=iters, m=m)
        assign = (
            cl.kmeans_embeddings(d, k=k, iters=iters)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        # per-cluster size bound and exact agreement with a pandas
        # reference top-m over the full assignment
        for c, grp in assign.groupby("cluster_id"):
            expect = (
                grp.sort_values(["sim", "vec_id"], ascending=[False, True])
                .head(m)["vec_id"]
                .tolist()
            )
            got = out[out["cluster_id"] == c]["vec_id"].tolist()
            assert sorted(got) == sorted(expect), c

    def test_deterministic(self, tmp_path):
        d = _write_emb(tmp_path, _blobs(n_per=15, seed=9))
        a = cl.cluster_sample(d, k=2, iters=2, m=3)
        b = cl.cluster_sample(d, k=2, iters=2, m=3)
        assert a.equals(b)
