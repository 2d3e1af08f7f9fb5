"""Partitioning / salting keys (SURVEY.md §4 skew row).

- ``part``  — stable output partition: blake2-based hash(conv_id) % n_parts.
  Drives resumable partitioned output (S5) and per-part lineage.
- ``salt``  — turn_idx // salt_chunk. Uniform chunk-salting needs NO
  pre-scan for hot keys (unlike top-k detection): a mega-conversation
  (BASELINE.json: "skewed mega-conversations") spreads over
  ceil(n_turns / salt_chunk) reducers while normal conversations keep
  salt=0, so the shuffle group key is (conv_id, salt) and no reduce
  group ever exceeds salt_chunk rows. Chunks have disjoint turn ranges,
  so per-chunk sorting preserves global per-conversation order by
  construction (merge-by-construction, SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bank_statement_pdf_parser_ray.core.hashing import stable_hash64

DEFAULT_SALT_CHUNK = 10_000
DEFAULT_N_PARTS = 64


def conv_part_array(conv_ids: pa.ChunkedArray | pa.Array, n_parts: int) -> pa.Array:
    """Vectorized-ish part assignment: hash only the unique conv_ids in
    the batch (rows per conversation cluster heavily), then gather."""
    arr = conv_ids.combine_chunks() if isinstance(conv_ids, pa.ChunkedArray) else conv_ids
    encoded = pc.dictionary_encode(arr)
    uniques = encoded.dictionary.to_pylist()
    lut = np.array([stable_hash64(u) % n_parts for u in uniques], dtype=np.int32)
    codes = encoded.indices.to_numpy(zero_copy_only=False)
    return pa.array(lut[codes], type=pa.int32())


def add_keys(batch: pa.Table, n_parts: int, salt_chunk: int) -> pa.Table:
    part = conv_part_array(batch.column("conv_id"), n_parts)
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch.column("turn_idx"), pa.float64()), salt_chunk)),
        pa.int32(),
    )
    # COARSE PART-MAJOR group key = (part, salt):
    # - reduce group = one output partition's rows for one salt chunk —
    #   ~n_parts x max_salt groups instead of one per conversation chunk
    #   (per-conversation map_groups made ~1 Python call per conversation:
    #   measured 72 s reduce vs 38 s extract on a 2M-turn corpus; the
    #   per-conversation ordering happens VECTORIZED inside the group via
    #   a multi-key Arrow sort, stages/order.py);
    # - group size is bounded by part sizing (n_parts is the scale knob)
    #   and mega-conversations still spread across salt chunks;
    # - part-major lexicographic order (zero-padded) keeps reduce output
    #   blocks contiguous in part, so the partitioned write emits ~1 file
    #   per (block, part) instead of fanning every block across all parts
    #   (small-file explosion: measured ~19k files, +50 s).
    pad = len(str(max(n_parts - 1, 1)))
    part_str = pc.utf8_lpad(pc.cast(part, pa.string()), width=pad, padding="0")
    salt_str = pc.utf8_lpad(pc.cast(salt, pa.string()), width=9, padding="0")
    group_key = pc.binary_join_element_wise(part_str, salt_str, "\x1f")
    out = batch.append_column("part", part)
    out = out.append_column("salt", salt)
    return out.append_column("group_key", group_key)
