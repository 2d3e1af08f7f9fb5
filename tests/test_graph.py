"""PageRank: formula pinned on hand-built graphs, edge build + end-to-end
parity covered by the driver-contract oracle pair (test_driver_contract)."""

from __future__ import annotations

import numpy as np

from bank_statement_pdf_parser_ray.pipelines.graph import power_iteration


class TestPowerIteration:
    def test_cycle_is_uniform_fixed_point(self):
        # A->B->C->A with equal weights: uniform 1/3 is stationary at
        # every iteration count
        src = np.array([0, 1, 2])
        dst = np.array([1, 2, 0])
        w = np.ones(3)
        for iters in (1, 5, 50):
            r = power_iteration(3, src, dst, w, n_iters=iters)
            assert np.allclose(r, 1 / 3)

    def test_single_edge_hand_computed(self):
        # A->B only; B dangling (keeps the base term, mass not
        # redistributed — the formula the SQL oracle states)
        src, dst, w = np.array([0]), np.array([1]), np.array([1.0])
        r1 = power_iteration(2, src, dst, w, n_iters=1)
        assert np.isclose(r1[0], 0.15 / 2)
        assert np.isclose(r1[1], 0.15 / 2 + 0.85 * 0.5)
        r2 = power_iteration(2, src, dst, w, n_iters=2)
        assert np.isclose(r2[1], 0.15 / 2 + 0.85 * r1[0])

    def test_weights_split_proportionally(self):
        # A->B (w=3), A->C (w=1): B receives 3x C's share of A's rank
        src = np.array([0, 0])
        dst = np.array([1, 2])
        w = np.array([3.0, 1.0])
        r = power_iteration(3, src, dst, w, n_iters=1)
        base = 0.15 / 3
        assert np.isclose(r[1] - base, 3 * (r[2] - base))

    def test_matches_dense_matrix_reference(self):
        # independent dense-matrix restatement of the same recurrence
        rng = np.random.RandomState(7)
        n, m = 12, 40
        src = rng.randint(0, n, m)
        dst = rng.randint(0, n, m)
        w = rng.randint(1, 9, m).astype(float)
        P = np.zeros((n, n))
        for s, d, ww in zip(src, dst, w):
            P[s, d] += ww
        outw = P.sum(axis=1)
        T = np.divide(P, outw[:, None], out=np.zeros_like(P), where=outw[:, None] > 0)
        r_ref = np.full(n, 1 / n)
        for _ in range(10):
            r_ref = (1 - 0.85) / n + 0.85 * (T.T @ r_ref)
        got = power_iteration(n, src, dst, w, n_iters=10)
        assert np.allclose(got, r_ref, atol=1e-12)


class TestTriangleCount:
    def _count(self, n, edges):
        """Driver-leg restatement: boolean undirected adjacency, diag(A^3)/2."""
        a = np.zeros((n, n), dtype=np.int64)
        for s, d in edges:
            if s != d:
                a[s, d] = a[d, s] = 1
        return np.diagonal(a @ a @ a) // 2

    def test_single_triangle_plus_pendant(self):
        # 0-1-2 triangle, 3 hangs off node 0, 4 isolated
        tri = self._count(5, [(0, 1), (1, 2), (0, 2), (0, 3)])
        assert tri.tolist() == [1, 1, 1, 0, 0]

    def test_k4_every_node_in_three(self):
        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._count(4, edges).tolist() == [3, 3, 3, 3]

    def test_direction_and_self_loops_ignored(self):
        # same triangle given as mixed directions + a self loop
        tri = self._count(3, [(1, 0), (1, 2), (0, 2), (2, 2)])
        assert tri.tolist() == [1, 1, 1]

    def test_matches_brute_force_enumeration(self):
        rng = np.random.RandomState(11)
        n = 10
        edges = [(int(a), int(b)) for a, b in rng.randint(0, n, (25, 2))]
        got = self._count(n, edges)
        adj = np.zeros((n, n), dtype=bool)
        for s, d in edges:
            if s != d:
                adj[s, d] = adj[d, s] = True
        ref = np.zeros(n, dtype=np.int64)
        from itertools import combinations

        for x, y, z in combinations(range(n), 3):
            if adj[x, y] and adj[y, z] and adj[x, z]:
                ref[[x, y, z]] += 1
        assert got.tolist() == ref.tolist()
