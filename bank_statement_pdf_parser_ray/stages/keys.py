"""Partitioning / salting keys (SURVEY.md §4 skew row).

- ``part``   — stable output partition: blake2-based hash(conv_id) % n_parts.
  Drives resumable partitioned output (S5) and per-part lineage.
- ``salt``   — turn_idx // salt_chunk. Uniform chunk-salting needs NO
  pre-scan for hot keys: a mega-conversation (BASELINE.json: "skewed
  mega-conversations") spreads over ceil(n_turns / salt_chunk) reduce
  groups while normal conversations keep salt=0. Chunks have disjoint
  turn ranges, so per-chunk sorting preserves global per-conversation
  order by construction (merge-by-construction, SURVEY.md §7).
- ``bucket`` — hash(conv_id) sub-bucket within a part. The reduce group
  is (part, bucket, salt), so its size is bounded by
  part_size / n_buckets for ordinary (salt=0) data and by salt_chunk
  rows per conversation chunk for mega-conversations — a constant the
  operator controls via n_parts x n_buckets — while the number of
  Python map_groups calls stays ~n_parts x n_buckets, not one per
  conversation (the per-conversation variant cost 2x the extraction
  time in pure call overhead, BASELINE.md §3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bank_statement_pdf_parser_ray.core.hashing import stable_hash64

DEFAULT_SALT_CHUNK = 10_000
DEFAULT_N_PARTS = 64
DEFAULT_N_BUCKETS = 32


def conv_hash_arrays(conv_ids: pa.ChunkedArray | pa.Array, n_parts: int, n_buckets: int) -> tuple[pa.Array, pa.Array]:
    """Vectorized-ish (part, bucket) assignment: hash only the unique
    conv_ids in the batch (rows per conversation cluster heavily), then
    gather. bucket uses independent high bits of the same stable hash."""
    arr = conv_ids.combine_chunks() if isinstance(conv_ids, pa.ChunkedArray) else conv_ids
    # a null conv_id is malformed input but must not kill a 100 TB job:
    # hash it under a sentinel so the row lands in a deterministic part
    # (the output row keeps its null conv_id; the normalizing reader
    # sources/transcripts.py refuses null keys up front — this guards
    # the direct-parquet path). fill BEFORE dictionary_encode: nulls
    # otherwise get null dictionary indices and poison the code gather.
    if arr.null_count:
        arr = pc.fill_null(arr, "\x00<null-conv>")
    encoded = pc.dictionary_encode(arr)
    uniques = encoded.dictionary.to_pylist()
    hashes = np.array([stable_hash64(u) for u in uniques], dtype=np.uint64)
    part_lut = (hashes % n_parts).astype(np.int32)
    bucket_lut = ((hashes >> np.uint64(20)) % n_buckets).astype(np.int32)
    codes = encoded.indices.to_numpy(zero_copy_only=False)
    return pa.array(part_lut[codes], type=pa.int32()), pa.array(bucket_lut[codes], type=pa.int32())


def conv_part_array(conv_ids: pa.ChunkedArray | pa.Array, n_parts: int) -> pa.Array:
    return conv_hash_arrays(conv_ids, n_parts, 1)[0]


def add_keys(batch: pa.Table, n_parts: int, salt_chunk: int, n_buckets: int = DEFAULT_N_BUCKETS) -> pa.Table:
    part, bucket = conv_hash_arrays(batch.column("conv_id"), n_parts, n_buckets)
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch.column("turn_idx"), pa.float64()), salt_chunk)),
        pa.int32(),
    )
    # PART-MAJOR group key = (part, bucket, salt) packed into ONE int64
    # (part<<40 | bucket<<32 | salt):
    # - reduce group size is bounded (module docstring) and the ordering
    #   inside a group is ONE vectorized multi-key Arrow sort over many
    #   conversations (stages/order.py) — not a Python call per
    #   conversation (measured 72 s reduce vs 38 s extract, BASELINE §3);
    # - part-major numeric order keeps reduce output blocks contiguous
    #   in part, so the partitioned write emits ~1 file per (block,
    #   part) instead of fanning every block across all parts
    #   (small-file explosion: measured ~19k files, +50 s);
    # - int64 keys sort/compare cheaper than the round-1 zero-padded
    #   strings and move 8 B/row through the exchange instead of ~20 B.
    if n_parts > (1 << 23) or n_buckets > (1 << 8):
        raise ValueError("group key packing supports n_parts < 2^23, n_buckets <= 256")
    part64 = pc.cast(part, pa.int64())
    bucket64 = pc.cast(bucket, pa.int64())
    salt64 = pc.cast(salt, pa.int64())  # turn_idx:int32 // salt_chunk < 2^31
    group_key = pc.add(
        pc.add(
            pc.multiply(part64, pa.scalar(1 << 40, pa.int64())),
            pc.multiply(bucket64, pa.scalar(1 << 32, pa.int64())),
        ),
        salt64,
    )
    out = batch.append_column("part", part)
    out = out.append_column("salt", salt)
    return out.append_column("group_key", group_key)
