"""S3 transcript sources (SURVEY.md §2.1 S3): read the input_hint table
from parquet (primary), JSONL, or an in-memory Arrow table, normalizing
everything to the canonical INPUT_SCHEMA so the flagship pipeline is
source-agnostic.

Projection is pushed to the source where the format supports it
(parquet ``columns=``); JSONL rows are normalized per batch (missing
``tool`` -> "", integer/iso ``ts`` -> timestamp[us], turn_idx -> int32).
"""

from __future__ import annotations

from typing import Union

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

from bank_statement_pdf_parser_ray.schema import INPUT_SCHEMA

INPUT_COLUMNS = [f.name for f in INPUT_SCHEMA]


class SchemaError(ValueError):
    pass


def _normalize_batch(t: pa.Table) -> pa.Table:
    """Coerce a raw batch into INPUT_SCHEMA (adds missing optional
    columns, casts types); raises SchemaError on missing required
    columns so a wrong input fails loudly at the first batch."""
    names = set(t.schema.names)
    required = {"conv_id", "turn_idx", "text"}
    missing = required - names
    if missing:
        raise SchemaError(
            f"transcript input is missing required columns {sorted(missing)}; "
            f"expected schema {INPUT_SCHEMA}"
        )
    for key_col in ("conv_id", "turn_idx"):
        col = t.column(key_col)
        if col.null_count or pa.types.is_null(col.type):
            raise SchemaError(
                f"transcript input has {col.null_count or t.num_rows} null values in "
                f"required key column '{key_col}' — keys must be non-null"
            )
    n = t.num_rows
    cols = {}
    cols["conv_id"] = pc.cast(t.column("conv_id"), pa.string())
    cols["turn_idx"] = pc.cast(t.column("turn_idx"), pa.int32())
    cols["role"] = (
        pc.cast(t.column("role"), pa.string()) if "role" in names else pa.array([""] * n, pa.string())
    )
    text = t.column("text")
    cols["text"] = pc.fill_null(pc.cast(text, pa.string()), "")
    cols["tool"] = (
        pc.fill_null(pc.cast(t.column("tool"), pa.string()), "")
        if "tool" in names
        else pa.array([""] * n, pa.string())
    )
    if "ts" in names and not pa.types.is_null(t.column("ts").type):
        ts = t.column("ts")
        if pa.types.is_timestamp(ts.type):
            cols["ts"] = pc.cast(ts, pa.timestamp("us"))
        elif pa.types.is_integer(ts.type):
            cols["ts"] = pc.cast(ts, pa.timestamp("us"))  # epoch micros
        elif pa.types.is_floating(ts.type):
            cols["ts"] = pc.cast(pc.round(ts).cast(pa.int64()), pa.timestamp("us"))
        else:
            # Arrow's string->timestamp cast parses full ISO-8601 incl.
            # fractional seconds; zone-suffixed strings ('Z', offsets)
            # need a tz-aware intermediate, then fold to naive UTC
            try:
                cols["ts"] = pc.cast(ts, pa.timestamp("us"))
            except pa.ArrowInvalid:
                cols["ts"] = pc.cast(pc.cast(ts, pa.timestamp("us", "UTC")), pa.timestamp("us"))
        cols["ts"] = pc.fill_null(cols["ts"], pa.scalar(0, pa.timestamp("us")))
    else:
        cols["ts"] = pa.array([0] * n, pa.timestamp("us"))
    return pa.table(cols, schema=INPUT_SCHEMA)


def _read_parquet_evolved(path: str) -> "ray.data.Dataset":
    """Parquet read that tolerates SCHEMA EVOLUTION across shard files —
    the normal state of a corpus written by producers over months
    (older shards missing ``tool``/``role``, ``ts`` as epoch int64 vs
    timestamp). A plain ``read_parquet(columns=INPUT_COLUMNS)`` fails
    on the first fragment whose footer lacks a projected column, and
    Arrow cannot unify int64-vs-timestamp footers even permissively.

    Plan (driver-side, METADATA-ONLY — footers, never data): list the
    fragments, read each footer schema on a thread pool, group files by
    the tuple of INPUT columns they carry + those columns' types. Each
    group becomes its own ``read_parquet`` with projection pruned to
    the columns that group actually has, normalized per batch to
    INPUT_SCHEMA (missing optionals -> defaults, int/string ts ->
    timestamp[us]); groups are then lazily ``union``-ed, so execution
    stays one streaming pipeline with per-group pushdown. Distinct
    schema groups are few by construction (producers change rarely);
    the footer scan is the same metadata pass any planner does."""
    import pyarrow.parquet as pq

    frag_files = pads.dataset(path, format="parquet").files
    if not frag_files:
        raise SchemaError(f"no parquet files under {path!r}")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(32, len(frag_files))) as pool:
        schemas = list(pool.map(pq.read_schema, frag_files))
    groups: dict[tuple, list[str]] = {}
    for f, s in zip(frag_files, schemas):
        sig = tuple((c, str(s.field(c).type)) for c in INPUT_COLUMNS if c in s.names)
        groups.setdefault(sig, []).append(f)

    parts = []
    for sig, files in sorted(groups.items()):
        cols = [c for c, _ in sig]
        ds = ray.data.read_parquet(files, columns=cols or None)
        parts.append(ds.map_batches(_normalize_batch, batch_format="pyarrow", zero_copy_batch=True))
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def read_transcripts(source: Union[str, pa.Table, "ray.data.Dataset"], fmt: str = "parquet") -> "ray.data.Dataset":
    """Canonical transcript Dataset from any supported source.

    - ``fmt="parquet"`` (default): projection pushdown to the columns
      each shard actually carries; schema evolution across shards
      (missing optional columns, int64/string timestamps) is unified
      per fragment group (see ``_read_parquet_evolved``).
    - ``fmt="json"``: JSONL files, one turn object per line.
    - ``fmt="csv"``: header row required; empty strings read as nulls
      and normalized like any other source.
    - a ``pa.Table`` / Dataset: normalized in place.
    """
    if isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
    elif isinstance(source, str):
        if fmt == "parquet":
            return _read_parquet_evolved(source)
        elif fmt == "json":
            ds = ray.data.read_json(source)
        elif fmt == "csv":
            ds = ray.data.read_csv(source)
        else:
            raise ValueError(f"unsupported transcript format: {fmt}")
    else:
        ds = source
    return ds.map_batches(_normalize_batch, batch_format="pyarrow", zero_copy_batch=True)
