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
    # PART-MAJOR group key: the sort-based shuffle range-partitions by this
    # key, so each reduce output block holds contiguous parts and the
    # partitioned write emits ~1 file per (block, part) instead of
    # fanning every block out across all parts (small-file explosion:
    # measured ~19k files and +50s wall on a 2M-turn corpus without this).
    # Zero-padding keeps lexicographic order == numeric part order;
    # group equality is still exactly (conv_id, salt) since part is a
    # function of conv_id.
    pad = len(str(max(n_parts - 1, 1)))
    part_str = pc.utf8_lpad(pc.cast(part, pa.string()), width=pad, padding="0")
    group_key = pc.binary_join_element_wise(
        part_str,
        batch.column("conv_id"),
        pc.cast(salt, pa.string()),
        "\x1f",
    )
    out = batch.append_column("part", part)
    out = out.append_column("salt", salt)
    return out.append_column("group_key", group_key)
