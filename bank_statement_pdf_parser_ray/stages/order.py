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
    """One (part, salt) group: vectorized multi-key sort restores
    per-conversation turn order; adjacent-duplicate masking dedups
    replayed (conv_id, turn_idx) fragments. No Python loop over rows
    or conversations — Arrow kernels throughout."""
    t = group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    if t.num_rows <= 1:
        return t
    import pyarrow.compute as pc

    conv = t.column("conv_id").combine_chunks()
    idx = t.column("turn_idx").combine_chunks()
    n = t.num_rows
    dup = pc.and_(
        pc.equal(conv.slice(1, n - 1), conv.slice(0, n - 1)),
        pc.equal(idx.slice(1, n - 1), idx.slice(0, n - 1)),
    )
    if pc.any(dup).as_py() is not True:
        return t
    keep = pa.chunked_array([pa.array([True]), pc.invert(dup)])
    return t.filter(keep)


def restore_order(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Requires the ``group_key`` column (stages/keys.add_keys).

    Shuffle strategy: Ray Data's default sort-based pull shuffle. The
    alternative ``DataContext.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE``
    (2.46+) avoids the global sort and may win on a real multi-node
    cluster, but it spawns one aggregator actor per partition — measured
    on the single-core sandbox it oversubscribes and loses badly, so the
    default stays sort-based; flip the context flag cluster-side to A/B.
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
