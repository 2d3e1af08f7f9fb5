"""Standardized transaction table (the engine's analogue of the
reference's final artifact — /root/reference/README.md:2 "outputs a
clean, standardized Excel file": one flat row per transaction).

Explodes the ``transactions`` list column of the flagship output into
(conv_id, turn_idx, txn_idx, date, description, debit, credit, balance,
dialect) rows — a vectorized Arrow explode (list flatten + parent
indices), no Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TXN_TABLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("txn_idx", pa.int32()),
        ("date", pa.string()),
        ("description", pa.string()),
        ("debit", pa.string()),
        ("credit", pa.string()),
        ("balance", pa.string()),
        ("dialect", pa.string()),
    ]
)


def explode_transactions_batch(t: pa.Table) -> pa.Table:
    col = t.column("transactions").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # parent row index of each exploded element + position within its list
    parents = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    import numpy as np

    lengths = np.diff(offsets)
    txn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lengths]) if len(flat) else np.array([], dtype=np.int32)
    take = lambda name: pc.take(t.column(name), parents)  # noqa: E731
    return pa.table(
        {
            "conv_id": take("conv_id"),
            "turn_idx": pc.cast(take("turn_idx"), pa.int32()),
            "txn_idx": pa.array(txn_idx, pa.int32()),
            "date": pc.struct_field(flat, "date"),
            "description": pc.struct_field(flat, "description"),
            "debit": pc.struct_field(flat, "debit"),
            "credit": pc.struct_field(flat, "credit"),
            "balance": pc.struct_field(flat, "balance"),
            "dialect": take("dialect"),
        }
    )


def transactions_table(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    """Flagship output Dataset -> standardized transaction rows."""
    ds = extracted.select_columns(["conv_id", "turn_idx", "transactions", "dialect"])
    return ds.map_batches(explode_transactions_batch, batch_format="pyarrow", zero_copy_batch=True)
