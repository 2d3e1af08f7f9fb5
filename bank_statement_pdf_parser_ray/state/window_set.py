"""Sharded read-only membership service for the exact-substring-dedup
hot-window set — the fallback representation when the Lee et al. pass-1
result exceeds the broadcast byte budget.

Why an actor pool: `_dup_window_set`'s docstring bound (total_windows /
min_docs) is honest but NOT model-sized at 100 TB with min_docs=2 — the
hot set can approach corpus scale, and `ray.put` + per-batch
``pc.is_in`` would pin the whole set in every worker's heap.  Sharding
the set by window-hash over ``n_shards`` zero-CPU actors keeps each
shard at 1/n of the set, and pass-2 batches probe with ONE fan-out of
their DISTINCT windows per batch (dictionary-encoded, so the wire
carries each distinct window once, not once per occurrence).  This is
the same escape-hatch shape as ``state.dedup_index`` (SURVEY.md §2
"Custom operators" rule (c)): shared read-mostly state the Dataset API
cannot express without re-broadcasting it per stage.

Hash discipline: shard routing uses polars ``hash_rows(seed=0)`` — the
exact kernel `stages.agg.shard_map_groups` already relies on for
cross-process-stable string sharding — so the loader and every probe
agree on placement with no coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _win_hash(wins: pa.Array) -> np.ndarray:
    """Cross-process-stable uint64 hash of a string array (polars
    hash_rows, the shard_map_groups string-key kernel)."""
    import polars as pl

    h = pl.from_arrow(pa.table({"w": wins})).hash_rows(seed=0)
    return h.to_numpy().astype(np.uint64, copy=False)


@ray.remote(num_cpus=0, max_restarts=2)
class WindowSetShard:
    """One shard: its hash-slice of the hot-window set, answered with
    one vectorized ``pc.is_in`` per probe batch."""

    def __init__(self, shard_id: int, n_shards: int) -> None:
        self._id = shard_id
        self._n = n_shards
        self._wins: pa.Array = pa.array([], pa.string())

    def load(self, block_refs: list) -> int:
        """Filter this shard's rows out of the materialized hot-set
        blocks. Blocks are fetched ONE at a time so the shard's peak
        heap is (one block + its slice), not the whole set."""
        parts: list[pa.Array] = [self._wins]
        for ref in block_refs:
            t = ray.get(ref)
            if t.num_rows == 0:
                continue
            w = t.column("win").combine_chunks()
            mine = _win_hash(w) % np.uint64(self._n) == np.uint64(self._id)
            if mine.any():
                parts.append(w.filter(pa.array(mine)))
        self._wins = pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
        return len(self._wins)

    def contains(self, wins: pa.Array) -> np.ndarray:
        if len(self._wins) == 0:
            return np.zeros(len(wins), dtype=bool)
        return pc.is_in(wins, value_set=self._wins).to_numpy(zero_copy_only=False)

    def size(self) -> int:
        return len(self._wins)


class BroadcastWinSet:
    """Budget-fit representation: the whole hot set in one object-store
    entry, membership via local ``pc.is_in`` (zero RPC per batch)."""

    def __init__(self, wins: pa.Array) -> None:
        self._ref = ray.put(wins)

    def contains(self, wins: pa.Array) -> np.ndarray:
        hot: pa.Array = ray.get(self._ref)
        if len(hot) == 0 or len(wins) == 0:
            return np.zeros(len(wins), dtype=bool)
        return pc.is_in(wins, value_set=hot).to_numpy(zero_copy_only=False)

    def shutdown(self) -> None:  # uniform teardown API with ShardedWinSet
        pass


class ShardedWinSet:
    """Over-budget representation: probe the actor shards with the
    batch's DISTINCT windows, scatter flags back to occurrences."""

    def __init__(self, shards: list) -> None:
        self._shards = shards

    @classmethod
    def from_blocks(cls, block_refs: list, n_shards: int = 8) -> "ShardedWinSet":
        shards = [WindowSetShard.remote(i, n_shards) for i in range(n_shards)]
        ray.get([s.load.remote(list(block_refs)) for s in shards])
        return cls(shards)

    def contains(self, wins: pa.Array) -> np.ndarray:
        if len(wins) == 0:
            return np.zeros(0, dtype=bool)
        if isinstance(wins, pa.ChunkedArray):
            wins = wins.combine_chunks()
        distinct = pc.unique(wins)
        sh = _win_hash(distinct) % np.uint64(len(self._shards))
        futs, idx = [], []
        for a, actor in enumerate(self._shards):
            rows = np.flatnonzero(sh == np.uint64(a))
            if len(rows) == 0:
                continue
            futs.append(actor.contains.remote(distinct.take(pa.array(rows, pa.int64()))))
            idx.append(rows)
        dflags = np.zeros(len(distinct), dtype=bool)
        for rows, flags in zip(idx, ray.get(futs)):
            dflags[rows] = flags
        codes = pc.index_in(wins, value_set=distinct).to_numpy(zero_copy_only=False)
        return dflags[codes.astype(np.int64)]

    def shutdown(self) -> None:
        for a in self._shards:
            ray.kill(a)
        self._shards = []
