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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 finalizer (public-domain constant mix from
    Steele et al.'s SplittableRandom): full-width avalanche so
    ``% n_shards`` sees uniform bits even for sequential int keys."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _int_castable(t: "pa.DataType") -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_boolean(t)
        or pa.types.is_temporal(t)
        or pa.types.is_date(t)
    )


def _numpy_shard(t: pa.Table, keys: list[str], n_shards: int) -> "pa.Array | None":
    """No-import shard ids for integer-like keys (int/bool/date/ts):
    per-column splitmix64, columns combined with xor-then-remix. NULL
    hashes like value 0 — harmless for sharding (a shard is a BAG of
    whole groups; group identity is re-derived from the actual values
    inside the kernel, so NULL and 0 sharing a shard merges nothing).
    Returns None when any key column needs the polars string path."""
    if not all(_int_castable(t.schema.field(k).type) for k in keys):
        return None
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t.column(k)
        if not pa.types.is_integer(col.type):
            col = col.cast(pa.int64())
        x = (
            pc.fill_null(col, 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64, copy=False)
        )
        acc = _splitmix64(acc ^ _splitmix64(x))
    return pa.array((acc % np.uint64(n_shards)).astype(np.int32))


_NULL_FILL = {
    "string": "", "large_string": "", "binary": b"", "large_binary": b"",
}


def null_safe_group(t: pa.Table, keys: list[str], spec: list[tuple]) -> pa.Table:
    """``pa.TableGroupBy(t, keys).aggregate(spec)`` with a workaround
    for a pyarrow (observed on 16.1) hash-grouper defect: MULTI-key
    grouping that mixes variable-width (string/binary) and fixed-width
    key columns emits DUPLICATE groups whenever any key column contains
    nulls (measured: ["str","int64"] over 500 rows with 20% nulls in
    either column yields 33 groups where 12 exist; single-key and
    same-width combinations are unaffected).

    Workaround: group on null-FREE keys — each nullable key column is
    replaced by (fill_null(zero), is_valid int8) pairs, the validity
    columns ride as extra keys, and the original nulls are restored on
    the grouped output. Zero overhead on the safe shapes (short-circuits
    to plain TableGroupBy)."""
    nullable = [k for k in keys if t.column(k).null_count > 0]
    mixed = len({
        "var" if pa.types.is_string(t.schema.field(k).type)
        or pa.types.is_large_string(t.schema.field(k).type)
        or pa.types.is_binary(t.schema.field(k).type)
        or pa.types.is_large_binary(t.schema.field(k).type) else "fix"
        for k in keys
    }) > 1
    if len(keys) < 2 or not nullable or not mixed:
        return pa.TableGroupBy(t, keys).aggregate(spec)
    # group on renamed null-free COPIES so aggregations over a key
    # column still see the original values (e.g. [("k", "count")] with
    # "k" also a key must keep counting nulls as missing)
    key_ext, vcols = [], []
    for k in keys:
        if k not in nullable:
            key_ext.append(k)
            continue
        col = t.column(k)
        typ = col.type
        fill = _NULL_FILL.get(str(typ))
        if fill is None and (
            pa.types.is_integer(typ) or pa.types.is_floating(typ)
            or pa.types.is_boolean(typ) or pa.types.is_temporal(typ)
        ):
            fill = False if pa.types.is_boolean(typ) else 0
        if fill is None:
            raise TypeError(f"null_safe_group: no null fill for key {k!r} of type {typ}")
        kk, v = f"__key_{k}", f"__valid_{k}"
        t = t.append_column(kk, pc.fill_null(col, pa.scalar(fill, typ))).append_column(
            v, pc.cast(pc.is_valid(col), pa.int8())
        )
        key_ext.append(kk)
        vcols.append((k, kk, v))
    out = pa.TableGroupBy(t, key_ext + [v for _, _, v in vcols]).aggregate(spec)
    for k, kk, v in vcols:
        restored = pc.if_else(
            pc.equal(out.column(v), pa.scalar(1, pa.int8())),
            out.column(kk),
            pa.scalar(None, out.schema.field(kk).type),
        )
        out = out.set_column(out.schema.get_field_index(kk), kk, restored)
    out = out.drop_columns([v for _, _, v in vcols])
    return out.rename_columns(
        [ {kk: k for k, kk, _ in vcols}.get(c, c) for c in out.column_names ]
    )


def shard_map_groups(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn: Callable[[pa.Table], pa.Table],
    n_shards: int = 128,
    coalesce_rows: int = 65_536,
) -> "ray.data.Dataset":
    """Hash-shard ``ds`` on ``keys`` and run ``fn`` ONCE per shard.

    ``fn`` receives a whole shard — many complete key groups — with the
    helper's ``shard`` column already dropped, and must implement the
    per-key semantics vectorized (e.g. ``pa.TableGroupBy``, ``pc.is_in``
    masks, or an in-shard ``pa.Table.join``). Integer-like keys shard
    via a numpy splitmix64 kernel (no polars import in the worker);
    string keys hash by VALUE via polars ``hash_rows`` so NULL keys land
    in one shard together, like SQL GROUP BY.

    ``coalesce_rows``: the shard-tag map's batch_size, which makes the
    executor BUNDLE small upstream blocks into few fat blocks before
    the exchange — the sort exchange pays per-block costs on BOTH sides
    (measured on the sf0.1 anti join: 128 tiny blocks = 2.2 s of Sort,
    coalesced = 0.4 s; same trick as the flagship's shuffle_block_rows).
    Callers whose rows carry megabyte payloads should pass a smaller
    value so a bundle stays within a worker's heap."""

    def add_shard(t: pa.Table) -> pa.Table:
        shard = _numpy_shard(t, keys, n_shards)
        if shard is None:
            import polars as pl

            h = pl.from_arrow(t.select(keys)).hash_rows(seed=0)
            shard = (h % n_shards).cast(pl.Int32).to_arrow()
            if isinstance(shard, pa.ChunkedArray):
                shard = shard.combine_chunks()
        return t.append_column("shard", shard)

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["shard"]))

    sharded = ds.map_batches(
        add_shard,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=coalesce_rows,
    )
    return sharded.groupby("shard").map_groups(run, batch_format="pyarrow")


def shard_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: list[tuple],
    rename: list[str],
    n_shards: int = 128,
    coalesce_rows: int = 65_536,
) -> "ray.data.Dataset":
    """One-exchange grouped aggregate of PRE-COMBINED partial rows.

    ``spec`` is a ``pa.TableGroupBy.aggregate`` spec over the partial
    columns (must be associative — the caller already emitted per-batch
    partials); ``rename`` names the output columns (keys first, then
    aggregates, pyarrow order)."""

    def agg(g: pa.Table) -> pa.Table:
        out = null_safe_group(g, keys, spec)
        return out.rename_columns(rename)

    return shard_map_groups(ds, keys, agg, n_shards=n_shards, coalesce_rows=coalesce_rows)
