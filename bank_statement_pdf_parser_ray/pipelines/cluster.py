"""Distributed embedding clustering and semantic dedup.

``kmeans_embeddings`` is exact distributed spherical k-means (Lloyd's
iterations over the FULL table): each epoch is one streaming
``map_batches`` pass that reduces every block to at most k partial rows
(cluster, vector-sum, count), so the per-epoch driver traffic is
O(k x d x blocks) floats regardless of corpus size; centroids are
broadcast once per epoch via ``ray.put``. The bounded-sample fit
(pipelines/datapipe.py::_fit_centroids_sample) remains the cheap path
when epochs over 100 TB are not worth it; this is the exact path.

``semantic_dedup`` is the SemDeDup shape (Abbas et al. 2023,
arXiv:2303.09540): cluster with k-means, then search for cosine>=tau
pairs ONLY within a cluster — the pairwise work drops from O(n^2) to
sum over clusters of O(|c|^2), and each cluster's member matrix is the
unit that must fit one worker (the partitioning assumption, documented
here per SURVEY 2.10). Output is asserted a subset of the
oracle-paired exact ``embedding_neardup`` in pytest, with planted-pair
recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from bank_statement_pdf_parser_ray.pipelines.datapipe import _batch_vectors, _list_matrix

KMEANS_K = 8
KMEANS_ITERS = 5
_INIT_SAMPLE = 2048


def _farthest_point_init(x: np.ndarray, k: int) -> np.ndarray:
    """Deterministic greedy farthest-point init (the k-means++ max rule,
    RNG-free): start at row 0, then repeatedly take the sample point
    with the LOWEST maximum cosine to the centroids chosen so far.
    Unlike seeded random choice this cannot drop a well-separated blob
    (two picks inside one tight cluster would need a third point even
    farther from everything)."""
    chosen = [0]
    max_sim = x @ x[0]
    for _ in range(1, min(k, len(x))):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, x @ x[nxt])
    return x[chosen].copy()


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init from the lowest-vec_id sample (predicate
    pushdown keeps the read bounded at any corpus size)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["embedding"], filter=pc.field("vec_id") < _INIT_SAMPLE
    )
    x = _list_matrix(t.column("embedding"))
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return _farthest_point_init(x, k)


def _epoch_partials(ds: "ray.data.Dataset", cent_ref) -> list[tuple[np.ndarray, np.ndarray]]:
    """One epoch: per-block (k x d sum matrix, k counts) partials,
    fetched with ONE ray.get (a per-ref get loop serializes on driver
    round-trip latency — measured 2.5 s/epoch vs 0.5 s at sf0.1)."""

    def partial(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        _, m = _batch_vectors(t)
        assign = np.argmax(m @ cent.T, axis=1)
        k, d = cent.shape
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
            }
        )

    blocks = ray.get(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
        ).to_arrow_refs()
    )
    return [
        (_list_matrix(b.column("vsum")), b.column("n").to_numpy(zero_copy_only=False))
        for b in blocks
        if b.num_rows
    ]


def kmeans_centroids(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> np.ndarray:
    """Fit unit-norm centroids with exact distributed Lloyd's epochs.
    Empty clusters keep their previous centroid (the standard rule, and
    what the numpy reference in pytest replicates).

    The embedding table is materialized into the object store ONCE and
    every epoch maps over the cached blocks — re-reading parquet per
    epoch paid the scan `iters` times (and at 100 TB the iterated table
    is exactly the thing you want resident/spillable in the object
    store; were it too large even for spill, swap the materialize for
    the per-epoch re-read this replaced)."""
    cent = _init_centroids(sf_dir, k)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    for _ in range(iters):
        ref = ray.put(cent)
        sums = np.zeros_like(cent, dtype=np.float64)
        counts = np.zeros(len(cent), dtype=np.int64)
        for s, n in _epoch_partials(ds, ref):
            sums += s
            counts += n
        nz = counts > 0
        mean = sums[nz] / counts[nz, None]
        cent[nz] = (mean / np.maximum(np.linalg.norm(mean, axis=1, keepdims=True), 1e-30)).astype(
            cent.dtype
        )
    return cent


def kmeans_embeddings(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> "ray.data.Dataset":
    """Final per-vector assignment (vec_id, cluster_id, sim) as a
    streamed Dataset: one more broadcast + vectorized argmax pass."""
    cent_ref = ray.put(kmeans_centroids(sf_dir, k, iters))

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vec_ids, m = _batch_vectors(t)
        sims = m @ cent.T
        a = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "cluster_id": pa.array(a.astype(np.int64), pa.int64()),
                "sim": pa.array(np.round(sims[np.arange(len(a)), a], 6), pa.float64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096)


def semantic_dedup(
    sf_dir: str,
    threshold: float = 0.4,
    k: int = 4,
    iters: int = KMEANS_ITERS,
) -> "ray.data.Dataset":
    """SemDeDup: cosine>=threshold pairs found within k-means clusters
    only. Approximate by design (cross-cluster pairs are unseen);
    pytest asserts output SUBSET-OF the exact oracle-paired
    ``embedding_neardup`` plus planted-pair recall — near-identical
    vectors share an argmax centroid by construction.

    Scale shape: assignment streams (broadcast centroids); the single
    shuffle co-locates each CLUSTER, whose member matrix is the
    memory unit one worker must hold — k acts as the bucket count, so
    size k to keep max-cluster ~ n/k rows in a worker heap."""
    cent_ref = ray.put(kmeans_centroids(sf_dir, k, iters))

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vec_ids, m = _batch_vectors(t)
        a = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "cluster_id": pa.array(a, pa.int64()),
                "embedding": t.column("embedding"),
            }
        )

    def within_pairs(g: pa.Table) -> pa.Table:
        # Arrow shard kernel: a shard holds MANY whole clusters; the
        # per-cluster all-pairs matmul runs over contiguous runs of the
        # cluster-sorted shard (cluster count is model-sized, so the
        # per-run loop is bounded by k, not by rows).
        empty = pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.take(
            pc.sort_indices(g, sort_keys=[("cluster_id", "ascending"), ("vec_id", "ascending")])
        )
        cid = g.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        m = _list_matrix(g.column("embedding")).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        n = len(cid)
        first = np.ones(n, dtype=bool)
        first[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sims = m[s:e] @ m[s:e].T
            ai, bj = np.nonzero(sims >= threshold)
            keep = ai < bj  # ids sorted asc within the run
            a_out.append(ids[s:e][ai[keep]])
            b_out.append(ids[s:e][bj[keep]])
        if not a_out:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(a_out), pa.int64()),
                "vec_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return shard_map_groups(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096),
        ["cluster_id"],
        within_pairs,
    )


CLUSTER_SAMPLE_M = 5


def cluster_sample(
    sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS, m: int = CLUSTER_SAMPLE_M
) -> pd.DataFrame:
    """Cluster-balanced prototype selection: the m most prototypical
    vectors (highest cosine to their own centroid; ties broken by
    vec_id asc) from EACH k-means cluster — the diversity-preserving
    curation sample (one knob for 'keep the center of every mode').

    Scale shape: assignment streams; each batch pre-cuts to at most
    k x m rows before the shuffle, so the per-cluster merge sees
    O(k x m x blocks) rows, never the corpus."""
    cent_ref = ray.put(kmeans_centroids(sf_dir, k, iters))

    def partial(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        vec_ids, mat = _batch_vectors(t)
        sims = mat @ cent.T
        a = np.argmax(sims, axis=1).astype(np.int64)
        s = np.round(sims[np.arange(len(a)), a], 6)
        keep = np.zeros(len(a), dtype=bool)
        for c in np.unique(a):
            idx = np.flatnonzero(a == c)
            order = np.lexsort((vec_ids[idx], -s[idx]))
            keep[idx[order[:m]]] = True
        return pa.table(
            {
                "cluster_id": pa.array(a[keep], pa.int64()),
                "vec_id": pa.array(vec_ids[keep], pa.int64()),
                "sim": pa.array(s[keep], pa.float64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        # Arrow shard kernel: sort by (cluster, -sim, vec_id), keep the
        # first m rows of every cluster run — one pass, no per-group
        # pandas.
        n = g.num_rows
        if n == 0:
            return g
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("cluster_id", "ascending"),
                    ("sim", "descending"),
                    ("vec_id", "ascending"),
                ],
            )
        )
        cid = g.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pos = np.arange(n)
        first = np.ones(n, dtype=bool)
        first[1:] = cid[1:] != cid[:-1]
        keep = pos - np.maximum.accumulate(np.where(first, pos, 0)) < m
        return g.filter(pa.array(keep))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    out = shard_map_groups(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096),
        ["cluster_id"],
        merge,
    ).to_pandas()
    out["cluster_id"] = out["cluster_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.sort_values(["cluster_id", "vec_id"]).reset_index(drop=True)
