"""Skew-mitigated distributed join (ray_guide "Wide operations
shuffle ... salt hot keys", and the same lever the flagship ordering
shuffle uses in stages/keys.py — extended from groupby to JOIN).

``Dataset.join`` hash-partitions both sides by key, so one hot key
(web data always has one: the empty page, the boilerplate dup, the
null-ish user) lands its entire row mass on ONE aggregator. Salting
splits that mass: the PROBE side appends salt = row_index % n_salt to
its key, the BUILD side is replicated once per salt value, and the
join runs on (key, salt) — a hot key now spreads over n_salt
partitions. The cost is deliberate and stated: build-side bytes x
n_salt through the exchange, so salt the side that is big and skewed,
replicate the side that is small, and keep n_salt near the worker
count. The result is row-identical to the unsalted join (asserted on
a planted 90%-hot-key fixture in tests/test_join_salt.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

SALT_COL = "__salt"


def salted_inner_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str,
    n_salt: int = 8,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Inner join of ``left`` (big, possibly hot-keyed) with ``right``
    (small enough to replicate n_salt times) on equality of
    ``on`` == ``right_on``, hash-exchanged on (key, salt)."""

    def add_salt(t: pa.Table) -> pa.Table:
        # round-robin within the batch: a hot key's rows get all salts
        return t.append_column(
            SALT_COL, pa.array(np.arange(t.num_rows, dtype=np.int64) % n_salt, pa.int64())
        )

    def replicate(t: pa.Table) -> pa.Table:
        reps = []
        for s in range(n_salt):
            reps.append(
                t.append_column(SALT_COL, pa.array(np.full(t.num_rows, s), pa.int64()))
            )
        return pa.concat_tables(reps)

    salted_left = left.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    salted_right = right.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    joined = salted_left.join(
        salted_right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, SALT_COL),
        right_on=(right_on, SALT_COL),
    )
    return joined.drop_columns([SALT_COL])
