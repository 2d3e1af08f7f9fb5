"""Coarse-shard grouped execution: the one-exchange replacement for
``Dataset.groupby(keys)`` when the group count is large.

Ray's sort-based groupby pays per-GROUP overhead in its reduce — one
Python callback per key for ``map_groups``, per-group bookkeeping for
``aggregate`` (measured at sf0.1/32 cpus: 4.5 s for a 95k-group Sum
that the shard form finishes in 2.4 s, and 5.4 s vs 1.2 s for a
35k-group distinct). The shard form exchanges on ``hash(keys) %
n_shards`` instead — each reduce task gets one SHARD (many whole
groups) and processes it with a single vectorized kernel. Same-key
rows always share a shard, so any per-key semantics computed inside
the shard kernel (aggregate, EXISTS mask, hash join) is globally
correct.

Partitioning assumption at 100 TB (same contract as the flagship's
(part, bucket, salt) reduce and ``_pairs_by_bucket``): one shard —
``total_group_rows / n_shards`` — must fit a worker. Size ``n_shards``
from expected group cardinality when it outgrows the default.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data


def shard_map_groups(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    n_shards: int = 128,
) -> "ray.data.Dataset":
    """Hash-shard ``ds`` on ``keys`` and run ``fn`` ONCE per shard.

    ``fn`` receives a whole shard — many complete key groups — with the
    helper's ``shard`` column already dropped, and must implement the
    per-key semantics vectorized (e.g. ``pa.TableGroupBy``, ``pc.is_in``
    masks, or an in-shard ``pa.Table.join``). Rows hash by VALUE via
    polars ``hash_rows`` so NULL keys land in one shard together, like
    SQL GROUP BY. Key dtypes: anything polars can hash (ints, strings,
    dates)."""

    def add_shard(t: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(t.select(keys)).hash_rows(seed=0)
        shard = (h % n_shards).cast(pl.Int32).to_arrow()
        if isinstance(shard, pa.ChunkedArray):
            shard = shard.combine_chunks()
        return t.append_column("shard", shard)

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["shard"]))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return sharded.groupby("shard").map_groups(run, batch_format="pyarrow")


def shard_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: list[tuple],
    rename: list[str],
    n_shards: int = 128,
) -> "ray.data.Dataset":
    """One-exchange grouped aggregate of PRE-COMBINED partial rows.

    ``spec`` is a ``pa.TableGroupBy.aggregate`` spec over the partial
    columns (must be associative — the caller already emitted per-batch
    partials); ``rename`` names the output columns (keys first, then
    aggregates, pyarrow order)."""

    def agg(g: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(g, keys).aggregate(spec)
        return out.rename_columns(rename)

    return shard_map_groups(ds, keys, agg, n_shards=n_shards)
