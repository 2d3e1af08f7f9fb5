"""O1 stable turn ordering + D1 exact dedup, fused into ONE salted hash
shuffle (SURVEY.md §2.6 O1, §2.7 D1, §4 skew row).

This is the pipeline's single all-to-all exchange: group by
``group_key = (part, bucket, salt)`` (stages/keys.py — bounded group
size, part-major order for the partitioned write) and, per group, ONE
vectorized multi-key Arrow sort restores per-conversation turn order
for every conversation in the group while an adjacent-duplicate mask
drops replayed (conv_id, turn_idx) fragments (verbatim copies —
FIXTURES.md A.1). NOT a global ``ds.sort`` (ordering is only required
within a conversation) and NOT a per-conversation ``map_groups`` (one
Python call per conversation measured 2x the extraction cost,
BASELINE.md §3).

Salted chunks of one conversation have disjoint turn ranges, so
per-chunk sorting preserves global per-conversation order by
construction; duplicates share (conv_id, turn_idx) and therefore the
same (part, bucket, salt) group.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _sort_dedup_group(group: pa.Table) -> pa.Table:
    """One (part, bucket, salt) group: vectorized multi-key sort restores
    per-conversation turn order; adjacent-duplicate masking dedups
    replayed (conv_id, turn_idx) fragments. No Python loop over rows
    or conversations — Arrow kernels throughout.

    The sort indices and the dedup mask are computed on the two KEY
    columns only, then applied to the full table in ONE combined take:
    the payload columns (extracted_text, spans/transactions lists) are
    expensive to gather, and a sort_by-then-filter would gather them
    twice."""
    if group.num_rows <= 1:
        return group
    import numpy as np
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group.select(["conv_id", "turn_idx"]),
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
    )
    # null conv_ids (malformed rows keys.py deliberately lets through)
    # are filled with a sentinel BEFORE the adjacency compare: pc.equal
    # on null is Kleene (null result), which would make the keep mask an
    # object-dtype numpy array and crash the take below — and would
    # silently never dedup replayed null-conv fragments.
    conv = pc.take(
        pc.fill_null(group.column("conv_id").combine_chunks(), "\x00<null-conv>"), order
    )
    idx = pc.take(group.column("turn_idx").combine_chunks(), order)
    n = group.num_rows
    dup = pc.and_(
        pc.equal(conv.slice(1, n - 1), conv.slice(0, n - 1)),
        pc.equal(idx.slice(1, n - 1), idx.slice(0, n - 1)),
    )
    if pc.any(dup).as_py() is not True:
        return group.take(order)
    keep = np.concatenate(([True], pc.invert(dup).to_numpy(zero_copy_only=False)))
    return group.take(order.to_numpy(zero_copy_only=False)[keep])


def restore_order(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Requires the ``group_key`` column (stages/keys.add_keys).

    Shuffle strategy: Ray Data's default sort-based pull shuffle.
    A/B at num_cpus=32 on the 2M-turn corpus (round 2, BASELINE.md §3):
    pull-sort 41.0 s, push-based sort 41.4 s, HASH_SHUFFLE 85.4 s
    without the pre-shuffle coalesce and a timeout (>400 s) with it —
    hash aggregator actors also destroy part-contiguity of reduce
    output (1,886 output files vs 360), so sort-based stays the
    default. The decisive variable was never the strategy but the
    shuffle-object count (map_blocks x reduce_partitions): see
    ``build_extracted``'s streaming coalesce.
    """
    out = ds.groupby("group_key").map_groups(_sort_dedup_group, batch_format="pyarrow")
    return out.drop_columns(["group_key", "salt"])


def split_quarantine(ds: "ray.data.Dataset") -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """M10 quarantine side output (SURVEY.md §2.2 M10): rows whose
    extraction degraded (``error`` != "") are split to a quarantine
    dataset for inspection; clean rows continue. Both are lazy views
    over the same upstream (vectorized Arrow filters, no shuffle)."""
    import pyarrow.compute as pc

    ok = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("error"), "")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bad = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("error"), "")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ok, bad
