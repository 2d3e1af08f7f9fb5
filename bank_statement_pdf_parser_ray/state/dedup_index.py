"""Sharded cross-wave dedup index — the one stateful service in the
engine that is a RAW Ray actor pool rather than a Dataset stage.

Why not a Dataset: an ingest pipeline sees waves arrive over days; "is
this content new?" must be answered against EVERYTHING already
ingested without re-reading it. A Dataset anti-join could express one
wave-vs-history pass, but the history side would be re-scanned per
wave; a shared mutable index amortizes it to O(new digests) per wave.
This is exactly the escape hatch the Ray Data guide reserves for
shared mutable state (SURVEY.md §2 "Custom operators" rule (c)).

Scale shape:
- The index is SHARDED by digest prefix over ``n_shards`` actors, so
  memory and RPC load spread across the cluster (`num_cpus=0` lets the
  shards co-locate with workers; they are lookup tables, not compute).
- Only 16-byte md5 digests ever cross the network — a probe batch of
  4096 docs is ~64 KiB regardless of document size.
- Calls are BATCHED per map-task batch and fanned out per shard in one
  round (`ray.get` on n_shards futures), so the per-row overhead is
  amortized to ~nothing; the actor itself answers a batch with one
  set-intersection pass.
- Crash recovery: the index is rebuildable from committed manifests
  (it is a cache of history, not the source of truth); `max_restarts`
  keeps a shard alive through worker loss, and a restarted empty shard
  fails SAFE for dedup-as-optimization (false "new") — callers that
  need exactness re-verify inside their own wave like `ingest_dedup`
  does with its min-doc_id reduce.
"""

from __future__ import annotations

import hashlib

import ray


@ray.remote(num_cpus=0, max_restarts=2)
class DedupIndexShard:
    """One shard: a set of md5 digests with batched membership ops."""

    def __init__(self) -> None:
        self._seen: set[bytes] = set()

    def add(self, digests: list[bytes]) -> int:
        before = len(self._seen)
        self._seen.update(digests)
        return len(self._seen) - before

    def contains(self, digests: list[bytes]) -> list[bool]:
        seen = self._seen
        return [d in seen for d in digests]

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        """True = first sighting (now recorded). Within one call,
        duplicates after the first read False, matching stream order."""
        seen = self._seen
        out = []
        for d in digests:
            if d in seen:
                out.append(False)
            else:
                seen.add(d)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> list[bytes]:
        return list(self._seen)


def text_digests(texts: list[str | None]) -> list[bytes | None]:
    """md5 over UTF-8 text bytes — byte-identical to DuckDB ``md5(text)``
    (same convention as the oracle-paired ``doc_fingerprint`` family)."""
    return [
        None if t is None else hashlib.md5(t.encode("utf-8")).digest() for t in texts
    ]


class DedupIndex:
    """Driver-side handle bundle: create shards, route digest batches."""

    def __init__(self, n_shards: int = 8) -> None:
        self.n_shards = n_shards
        self.shards = [DedupIndexShard.remote() for _ in range(n_shards)]

    @staticmethod
    def shard_of(digest: bytes, n_shards: int) -> int:
        return digest[0] % n_shards

    def _route(self, digests: list[bytes]) -> tuple[list[list[bytes]], list[tuple[int, int]]]:
        per = [[] for _ in range(self.n_shards)]
        where = []
        for d in digests:
            s = self.shard_of(d, self.n_shards)
            where.append((s, len(per[s])))
            per[s].append(d)
        return per, where

    def _fanout(self, method: str, digests: list[bytes]) -> list[bool]:
        per, where = self._route(digests)
        futs = {
            s: getattr(self.shards[s], method).remote(batch)
            for s, batch in enumerate(per)
            if batch
        }
        got = dict(zip(futs, ray.get(list(futs.values()))))
        return [got[s][i] for s, i in where]

    def contains(self, digests: list[bytes]) -> list[bool]:
        return self._fanout("contains", digests)

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        return self._fanout("check_and_add", digests)

    def add(self, digests: list[bytes]) -> None:
        per, _ = self._route(digests)
        ray.get([self.shards[s].add.remote(b) for s, b in enumerate(per) if b])

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        """Kill the shard actors. Call once every probe that needs the
        index has MATERIALIZED (a lazy Dataset holding a probe closure
        would otherwise re-execute against dead actors); repeated
        bench/warm runs that skip this leak one live pool per
        invocation (r3 advice)."""
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def snapshot_index(idx: DedupIndex, path: str) -> int:
    """Persist the index as one parquet file of (shard, digest) rows —
    the warm-restart complement to rebuild-from-manifests (a rebuild
    re-hashes history; a snapshot restore is one columnar read).
    Returns the digest count written. Atomic via write-then-rename so
    a crashed snapshot never leaves a torn file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    per = ray.get([s.dump.remote() for s in idx.shards])
    shards = [i for i, ds in enumerate(per) for _ in ds]
    digests = [d for ds in per for d in ds]
    t = pa.table(
        {
            "shard": pa.array(shards, pa.int32()),
            "digest": pa.array(digests, pa.binary(16)),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return len(digests)


def restore_index(path: str, n_shards: int = 8) -> DedupIndex:
    """Rebuild a DedupIndex from a snapshot file. Digests re-route by
    the CURRENT shard function, so a restore may change n_shards
    freely (resharding is a read, not a migration)."""
    import pyarrow.parquet as pq

    idx = DedupIndex(n_shards=n_shards)
    t = pq.read_table(path, columns=["digest"])
    idx.add(t.column("digest").to_pylist())
    return idx
