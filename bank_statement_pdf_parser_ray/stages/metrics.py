"""G1/G2 metric rollups (SURVEY.md §2.5) — partial-per-batch combine
before the small groupby, so the shuffle moves per-(batch,key) partials,
never raw rows."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def conv_rollup(extracted: "ray.data.Dataset"):
    """G1 per-conversation rollup: turns, extracted chars, transaction
    rows, balance violations."""

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_chars": pc.cast(pc.utf8_length(t.column("extracted_text")), pa.int64()),
                "n_txns": pc.cast(pc.list_value_length(t.column("transactions")), pa.int64()),
                "bal_bad": pc.cast(pc.invert(t.column("balance_ok")), pa.int64()),
                "one": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t2, ["conv_id"]).aggregate(
            [("one", "sum"), ("n_chars", "sum"), ("n_txns", "sum"), ("bal_bad", "sum")]
        )
        return g.rename_columns(["conv_id", "p_turns", "p_chars", "p_txns", "p_bad"])

    ds = extracted.select_columns(["conv_id", "extracted_text", "transactions", "balance_ok"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("conv_id").aggregate(
        Sum("p_turns", alias_name="n_turns"),
        Sum("p_chars", alias_name="n_chars"),
        Sum("p_txns", alias_name="n_txns"),
        Sum("p_bad", alias_name="n_balance_violations"),
    )


def job_metrics(extracted: "ray.data.Dataset") -> dict:
    """G2 global job metrics: one associative aggregate pass."""

    def partial(t: pa.Table) -> pa.Table:
        kinds = t.column("content_kind")
        return pa.table(
            {
                "p_rows": pa.array([t.num_rows], pa.int64()),
                "p_pdf": pa.array([pc.sum(pc.cast(pc.equal(kinds, "pdf_layout"), pa.int64())).as_py() or 0], pa.int64()),
                "p_html": pa.array([pc.sum(pc.cast(pc.equal(kinds, "html"), pa.int64())).as_py() or 0], pa.int64()),
                "p_plain": pa.array([pc.sum(pc.cast(pc.equal(kinds, "plain"), pa.int64())).as_py() or 0], pa.int64()),
                "p_err": pa.array([pc.sum(pc.cast(pc.not_equal(t.column("error"), ""), pa.int64())).as_py() or 0], pa.int64()),
                "p_txns": pa.array([pc.sum(pc.list_value_length(t.column("transactions"))).as_py() or 0], pa.int64()),
            }
        )

    ds = extracted.select_columns(["content_kind", "error", "transactions"])
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.aggregate(
        Sum("p_rows", alias_name="rows"),
        Sum("p_pdf", alias_name="pdf_layout"),
        Sum("p_html", alias_name="html"),
        Sum("p_plain", alias_name="plain"),
        Sum("p_err", alias_name="errors"),
        Sum("p_txns", alias_name="transactions"),
    )
    return dict(agg)
