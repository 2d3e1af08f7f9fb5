"""Graph analytics over the shared tables: distributed edge-list
construction + PageRank (SURVEY.md §2.11 extension; the iterative
companion to the connected-components engine in datapipe.dedup_clusters).

The canonical distributed-PageRank shape (Brin & Page 1998; the
Pregel/GraphX formulation): EDGES stay a distributed Dataset and each
iteration is one map_batches over edge blocks (current ranks broadcast —
the model-sized state, O(|nodes|)) followed by a dst-keyed sum. Here the
node set is the 25-nation trade graph, so after the one genuinely wide
step — the lineitem⋈orders big-big hash join that builds the edge list —
the aggregated edge table is model-sized (≤ nations²) and the power
iteration runs driver-side on numpy. The 100 TB shape is documented in
``pagerank_edges``: partial (src,dst) pre-aggregation inside every batch
keeps the exchange O(nations² × blocks) regardless of lineitem size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

DAMPING = 0.85
N_ITERS = 10


def _lut(sf_dir: str, table: str, key: str, val: str) -> pa.Table:
    import pyarrow.dataset as pads

    return pads.dataset(f"{sf_dir}/{table}.parquet").to_table(columns=[key, val]).combine_chunks()


def pagerank_edges(sf_dir: str) -> pd.DataFrame:
    """Edge list of the nation trade graph: one edge (src = customer's
    nation, dst = supplier's nation) per lineitem, weight = lineitem
    count. lineitem⋈orders is the honest big-big exchange — ONE
    coarse-shard cogroup on orderkey (stages/agg.py tagged union; an
    orderkey's rows all share a shard, so the in-shard Arrow join is
    globally complete). Customer/supplier nation LUTs are broadcast
    once and probed vectorized (pc.index_in + pc.take) INSIDE the shard
    kernel, which also pre-combines to ≤ nations² partial rows, so the
    final groupby moves O(nations² × shards)."""
    from bank_statement_pdf_parser_ray.pipelines.queries import _read
    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups
    from ray.data.aggregate import Sum

    cust = _lut(sf_dir, "customer", "c_custkey", "c_nationkey")
    supp = _lut(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    cust_ref, supp_ref = ray.put(cust), ray.put(supp)

    def li_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "o_custkey": pa.nulls(len(t), pa.int64()),
                "is_probe": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": t.column("o_orderkey"),
                "l_suppkey": pa.nulls(len(t), pa.int64()),
                "o_custkey": t.column("o_custkey"),
                "is_probe": pa.array(np.zeros(len(t), dtype=bool)),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        li_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def edge_shard(g: pa.Table) -> pa.Table:
        is_probe = g.column("is_probe")
        o = g.filter(pc.invert(is_probe)).select(["okey", "o_custkey"])
        l = g.filter(is_probe).select(["okey", "l_suppkey"])
        t = l.join(o, keys=["okey"], join_type="inner")
        cl, sl = ray.get(cust_ref), ray.get(supp_ref)
        ci = pc.index_in(t.column("o_custkey"), value_set=cl.column("c_custkey"))
        si = pc.index_in(t.column("l_suppkey"), value_set=sl.column("s_suppkey"))
        ok = pc.and_(pc.is_valid(ci), pc.is_valid(si))  # inner-join semantics
        src = pc.take(cl.column("c_nationkey"), ci.filter(ok))
        dst = pc.take(sl.column("s_nationkey"), si.filter(ok))
        g2 = pa.TableGroupBy(pa.table({"src": src, "dst": dst}), ["src", "dst"]).aggregate(
            [([], "count_all")]
        )
        return g2.rename_columns(["src", "dst", "p_w"])

    edges = shard_map_groups(li.union(orders), ["okey"], edge_shard)
    out = edges.groupby(["src", "dst"]).aggregate(Sum("p_w", alias_name="w")).to_pandas()
    out["w"] = out["w"].astype("int64")
    return out


def pagerank_nations(sf_dir: str) -> pd.DataFrame:
    """PageRank over the nation trade graph. Formula (pinned so the SQL
    oracle states the identical recurrence):

        r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_t(u) * w(u,v) / outw(u)

    d = 0.85, 10 iterations, r_0 = 1/N, N = |nation| (dangling nations —
    none in TPC-H-shaped data — keep the base term only; their mass is
    not redistributed, matching the oracle's LEFT JOIN + coalesce).
    The distributed work is the edge build (pagerank_edges); the
    iteration state is the model-sized rank vector, recomputed from the
    aggregated ≤ nations² edge table with vectorized np.add.at —
    at 100 TB the same split holds: edges aggregate once, ranks stay
    O(|nodes|) per iteration."""
    nation = _lut(sf_dir, "nation", "n_nationkey", "n_name")
    nkeys = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nkeys)
    nkeys = nkeys[order]
    nnames = nation.column("n_name").to_numpy(zero_copy_only=False)[order]
    n = len(nkeys)

    e = pagerank_edges(sf_dir)
    sv = e["src"].to_numpy(dtype=float)
    dv = e["dst"].to_numpy(dtype=float)
    w = e["w"].to_numpy(dtype=float)
    # dirty-dimension semantics, matching the oracle's join shape
    # (fuzz catch): NULL/dangling SRC edges contribute nothing (no rank
    # row joins them); a REAL src's edges toward a dangling dst still
    # count in its out-weight — that mass leaks, it is not renormalized
    m_src = np.isin(sv, nkeys)
    outw = np.zeros(n)
    np.add.at(outw, np.searchsorted(nkeys, sv[m_src]), w[m_src])
    m_tr = m_src & np.isin(dv, nkeys)
    src = np.searchsorted(nkeys, sv[m_tr])
    dst = np.searchsorted(nkeys, dv[m_tr])
    rank = power_iteration(n, src, dst, w[m_tr], outw=outw)
    return pd.DataFrame({"n_name": nnames, "pagerank": np.round(rank, 8)})


def power_iteration(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n_iters: int = N_ITERS,
    damping: float = DAMPING,
    outw: "np.ndarray | None" = None,
) -> np.ndarray:
    """The rank recurrence on 0..n-1 node ids (vectorized np.add.at
    scatter per iteration — the driver-side leg of the split; the edge
    arrays are the model-sized aggregate, never the raw graph).
    ``outw`` may be supplied when the out-weight denominator covers
    MORE edges than the transitions (mass toward dangling nodes)."""
    if outw is None:
        outw = np.zeros(n)
        np.add.at(outw, src, w)
    frac = w / outw[src]  # normalized edge transition weight
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        nxt = np.full(n, (1.0 - damping) / n)
        np.add.at(nxt, dst, damping * rank[src] * frac)
        rank = nxt
    return rank


def _pagerank_sql() -> str:
    """Unrolled fixed-iteration PageRank: the recurrence is a linear map,
    so N_ITERS chained CTEs state it exactly (no recursive-CTE
    aggregation restrictions to fight)."""
    head = """
WITH edges AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  GROUP BY src, dst
), outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
r0 AS (SELECT n_nationkey AS id, 1.0 / (SELECT n FROM nn) AS r FROM nation)"""
    step = """,
r{i} AS (
  SELECT nt.n_nationkey AS id,
         (1 - 0.85) / (SELECT n FROM nn)
         + 0.85 * coalesce(sum(p.r * e.w / o.ow), 0) AS r
  FROM nation nt
  LEFT JOIN edges e ON e.dst = nt.n_nationkey
  LEFT JOIN outw  o ON o.src = e.src
  LEFT JOIN r{j} p  ON p.id  = e.src
  GROUP BY nt.n_nationkey)"""
    body = "".join(step.format(i=i, j=i - 1) for i in range(1, N_ITERS + 1))
    tail = f"""
SELECT n_name, round(r{N_ITERS}.r, 8) AS pagerank
FROM r{N_ITERS} JOIN nation ON id = n_nationkey
"""
    return head + body + tail


PAGERANK_NATIONS_SQL = _pagerank_sql()

PAGERANK_EDGES_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey
GROUP BY src, dst
"""


def triangle_count(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle counts over the UNDIRECTED nation trade graph
    (self-loops dropped, direction collapsed) — the standard graph
    clustering primitive next to PageRank. Splits the same way:
    the one genuinely wide step is the distributed edge-list build
    (``pagerank_edges``: lineitem⋈orders coarse-shard cogroup with
    per-batch (src,dst) pre-aggregation), after which the aggregated
    edge set is model-sized (≤ nations²) and the triangle enumeration
    is exact dense linear algebra on the driver: n_tri(v) =
    (A³)vv / 2 for the boolean adjacency A. At web scale the same
    two-level shape holds with the driver leg replaced by the standard
    degree-ordered wedge join over the REDUCED edge table — noted here
    because the node set of this corpus never exceeds nations.
    Output: every nation, with 0 for triangle-free nodes (oracle's
    LEFT JOIN + coalesce)."""
    nation = _lut(sf_dir, "nation", "n_nationkey", "n_name")
    nkeys = nation.column("n_nationkey").to_numpy()
    order = np.argsort(nkeys)
    nkeys = nkeys[order]
    nnames = nation.column("n_name").to_numpy(zero_copy_only=False)[order]
    n = len(nkeys)

    e = pagerank_edges(sf_dir)
    sv = e["src"].to_numpy(dtype=float)
    dv = e["dst"].to_numpy(dtype=float)
    fin = ~np.isnan(sv) & ~np.isnan(dv)  # NULL endpoints never join (SQL)
    # the oracle's wedge enumeration runs over the RAW edge set, so a
    # triangle through a dangling (non-nation) vertex still counts for
    # its real corners: build the adjacency over the observed node
    # UNION, report only nation rows (dirty-dimension fuzz catch)
    nodes = np.unique(np.concatenate([nkeys.astype(np.float64), sv[fin], dv[fin]]))
    src = np.searchsorted(nodes, sv[fin])
    dst = np.searchsorted(nodes, dv[fin])
    m = len(nodes)
    a = np.zeros((m, m), dtype=np.int64)
    off = src != dst  # drop self-loops
    a[src[off], dst[off]] = 1
    a = np.maximum(a, a.T)  # undirected
    tri = np.diagonal(a @ a @ a) // 2
    tri_nation = tri[np.searchsorted(nodes, nkeys.astype(np.float64))]
    return pd.DataFrame({"n_name": nnames, "n_tri": tri_nation.astype(np.int64)})


TRIANGLE_COUNT_SQL = """
WITH e0 AS (
  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                  greatest(c.c_nationkey, s.s_nationkey) AS b
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n.n_name, coalesce(t.c, 0) AS n_tri
FROM nation n LEFT JOIN (
  SELECT v, count(*) AS c FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
) t ON t.v = n.n_nationkey
"""


def nation_hops(sf_dir: str, source: int = 0) -> pd.DataFrame:
    """BFS hop distance from ``source`` over the UNDIRECTED nation
    trade graph — the reachability/radius primitive next to PageRank
    and triangles (supply-chain distance between markets). Unreachable
    nations are omitted, like the oracle's recursive closure.

    Same two-level split as the rest of this module: the genuinely
    wide step is the distributed edge build (``pagerank_edges``:
    lineitem⋈orders coarse-shard cogroup, per-shard (src,dst)
    pre-aggregation), after which the REDUCED edge set is model-sized
    (≤ nations²) and the frontier iteration runs driver-side. At web
    scale the driver leg becomes the standard iterated
    frontier⋈edges distributed join (the label-propagation engine in
    ``dedup_clusters`` is exactly that machinery with min-label
    instead of min-hops); noted because this corpus's node set never
    exceeds nations."""
    edges = pagerank_edges(sf_dir)
    # NULL endpoints never join in the recursive closure; DANGLING ones
    # stay — the oracle's BFS walks through them (fuzz catch)
    edges = edges.dropna(subset=["src", "dst"])
    adj: dict[int, set[int]] = {}
    for s, d in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {int(source): 0}
    frontier = [int(source)]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    nation = _lut(sf_dir, "nation", "n_nationkey", "n_name")
    nk = nation.column("n_nationkey").to_numpy().astype(np.int64)
    names = nation.column("n_name").to_pylist()
    rows = [(int(k), names[i], dist[int(k)]) for i, k in enumerate(nk) if int(k) in dist]
    out = pd.DataFrame(rows, columns=["nation_key", "n_name", "hops"])
    return out.sort_values("nation_key").reset_index(drop=True).astype(
        {"nation_key": "int64", "hops": "int64"}
    )


NATION_HOPS_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey  = c.c_custkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
bfs(nk, d) AS (
  SELECT 0, 0
  UNION
  SELECT u.dst, b.d + 1 FROM bfs b JOIN und u ON u.src = b.nk WHERE b.d < 50
)
SELECT CAST(n.n_nationkey AS BIGINT) AS nation_key, n.n_name,
       CAST(best.hops AS BIGINT) AS hops
FROM (SELECT nk, min(d) AS hops FROM bfs GROUP BY nk) best
JOIN nation n ON n.n_nationkey = best.nk
ORDER BY nation_key
"""
