"""Write-side data layout: Z-order (Morton) clustering for multi-column
scan pruning.

Parquet row-group pruning works per column independently: a file sorted
by user_id prunes user predicates but not time predicates, and vice
versa. Interleaving the bits of both keys (the Morton / Z-order curve —
the clustering primitive behind Delta Lake's OPTIMIZE ZORDER and
ClickHouse/Databricks layout tooling) gives every row group a tight
bounding box in BOTH dimensions, so a (user range x time range) box
query prunes on either predicate.

Scale shape: computing the Z-value is a streaming vectorized map; the
single all-to-all is the sort by Z (exactly the exchange a layout
rewrite is expected to pay — it replaces the recurring full-scan cost
of every future box query); the write is ordinary partitioned parquet.
``zorder_benefit`` measures the effect the way a table optimizer would:
row groups whose (min, max) statistics exclude the box are pruned
without reading, counted directly from the parquet footers."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

Z_BITS = 16  # per-dimension quantization (32-bit Morton code)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of x so there is a zero bit between each
    (the standard Morton interleave bit-twiddle, public domain)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def _morton(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (_part1by1(a) | (_part1by1(b) << np.uint64(1))).astype(np.int64)


def _quantize(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    span = max(hi - lo, 1.0)
    q = np.floor((v - lo) / span * ((1 << Z_BITS) - 1))
    return np.clip(q, 0, (1 << Z_BITS) - 1).astype(np.uint64)


def zorder_write(sf_dir: str, out_dir: str, rows_per_group: int = 4096) -> dict:
    """Rewrite events clustered on the Z-order of (user_id, ts).
    Quantization bounds come from the parquet footer statistics (no
    extra pass). Returns the written layout's bounds metadata."""
    meta = pq.read_metadata(f"{sf_dir}/events.parquet")
    los, his = {}, {}
    idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
    for col in ("user_id", "ts"):
        stats = [meta.row_group(g).column(idx[col]).statistics for g in range(meta.num_row_groups)]
        los[col] = min(s.min for s in stats)
        his[col] = max(s.max for s in stats)
    lo_u, hi_u = float(los["user_id"]), float(his["user_id"])
    lo_t = float(np.datetime64(los["ts"], "us").astype(np.int64))
    hi_t = float(np.datetime64(his["ts"], "us").astype(np.int64))

    def add_z(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.float64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        z = _morton(_quantize(u, lo_u, hi_u), _quantize(ts, lo_t, hi_t))
        return t.append_column("z", pa.array(z, pa.int64()))

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    ds = ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.sort("z").drop_columns(["z"]).write_parquet(
        out_dir, min_rows_per_file=rows_per_group, max_rows_per_file=rows_per_group
    )
    return {"lo_u": lo_u, "hi_u": hi_u, "lo_t": lo_t, "hi_t": hi_t}


def _groups_pruned(path_or_dir: str, u_rng: tuple[int, int], t_rng: tuple[int, int]) -> tuple[int, int, int]:
    """(total row groups, groups pruned by footer stats, rows in the
    surviving groups) for a (user range x time range) box — the exact
    arithmetic a parquet reader's predicate pushdown performs."""
    paths = (
        [path_or_dir]
        if os.path.isfile(path_or_dir)
        else [
            os.path.join(path_or_dir, f)
            for f in sorted(os.listdir(path_or_dir))
            if f.endswith(".parquet")
        ]
    )
    total = pruned = rows = 0
    for p in paths:
        meta = pq.read_metadata(p)
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            su = rg.column(idx["user_id"]).statistics
            st = rg.column(idx["ts"]).statistics
            t_min = np.datetime64(st.min, "us").astype(np.int64)
            t_max = np.datetime64(st.max, "us").astype(np.int64)
            total += 1
            if su.max < u_rng[0] or su.min > u_rng[1] or t_max < t_rng[0] or t_min > t_rng[1]:
                pruned += 1
            else:
                rows += rg.num_rows
    return total, pruned, rows


def zorder_benefit(sf_dir: str, rows_per_group: int = 1024) -> pa.Table:
    """Layout A/B across QUERY SHAPES: for each layout (input order,
    user_id-sorted rewrite, Z-order rewrite) and each of three
    canonical predicates — a (user x time) box, a user-range-only
    scan, a time-range-only scan (each range = the middle 25% of its
    dimension) — the row groups pruned by footer statistics and the
    rows that must be scanned.

    The textbook claim this measures: a single-key sort wins its own
    dimension and is USELESS in the other (time-only queries scan
    ~everything), while Z-order prunes meaningfully in BOTH — the
    balanced layout for a table serving mixed query shapes, which is
    why table optimizers cluster on the curve rather than one column."""
    base = "/tmp/bspp_zorder"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    bounds = zorder_write(sf_dir, f"{base}/z", rows_per_group=rows_per_group)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    ds.sort("user_id").write_parquet(
        f"{base}/bykey", min_rows_per_file=rows_per_group, max_rows_per_file=rows_per_group
    )

    lo_u, hi_u = bounds["lo_u"], bounds["hi_u"]
    lo_t, hi_t = bounds["lo_t"], bounds["hi_t"]
    u_mid = (int(lo_u + 0.375 * (hi_u - lo_u)), int(lo_u + 0.625 * (hi_u - lo_u)))
    t_mid = (int(lo_t + 0.375 * (hi_t - lo_t)), int(lo_t + 0.625 * (hi_t - lo_t)))
    u_all = (int(lo_u), int(hi_u))
    t_all = (int(lo_t), int(hi_t))
    shapes = {"box": (u_mid, t_mid), "user_range": (u_mid, t_all), "time_range": (u_all, t_mid)}

    layouts, qshapes, totals, pruneds, scanned = [], [], [], [], []
    for name, path in (
        ("input", f"{sf_dir}/events.parquet"),
        ("sorted_user", f"{base}/bykey"),
        ("zorder", f"{base}/z"),
    ):
        for shape, (u_rng, t_rng) in shapes.items():
            total, pruned, rows = _groups_pruned(path, u_rng, t_rng)
            layouts.append(name)
            qshapes.append(shape)
            totals.append(total)
            pruneds.append(pruned)
            scanned.append(rows)
    return pa.table(
        {
            "layout": pa.array(layouts, pa.string()),
            "query_shape": pa.array(qshapes, pa.string()),
            "row_groups": pa.array(totals, pa.int64()),
            "groups_pruned": pa.array(pruneds, pa.int64()),
            "rows_scanned": pa.array(scanned, pa.int64()),
        }
    )


def compact_files(sf_dir: str, target_rows_per_file: int = 65_536) -> pa.Table:
    """Small-file compaction — the table-maintenance op every lakehouse
    runs (Delta OPTIMIZE / Iceberg rewrite_data_files): rewrite a
    fragmented table into files of a target size WITHOUT changing its
    rows. Small files are the scale killer on the READ side: per-file
    open/footer costs dominate once files shrink below a few MB, and a
    10^6-file table can spend longer listing than scanning.

    Demonstrated by first fragmenting events into ~64-row files (the
    pathological state a streaming ingester leaves behind), then
    compacting with a plain streaming read -> write at
    ``target_rows_per_file`` — no shuffle: compaction only needs to
    coalesce, not re-order (combine with the Z-order rewrite when
    re-clustering is also wanted). Returns the before/after file
    inventory plus row-count/checksum equality so the rewrite is
    auditable; the XOR-of-row-hashes identity is order-insensitive
    because compaction preserves multiset, not order."""
    base = "/tmp/bspp_compact"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    src = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    src.write_parquet(f"{base}/fragmented", min_rows_per_file=64, max_rows_per_file=64)
    frag = ray.data.read_parquet(f"{base}/fragmented")
    frag.write_parquet(
        f"{base}/compacted",
        min_rows_per_file=target_rows_per_file,
        max_rows_per_file=target_rows_per_file,
    )

    def inventory(path: str) -> tuple[int, int, int, int]:
        n_files, n_bytes, n_rows, h = 0, 0, 0, 0
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            fp = os.path.join(path, name)
            n_files += 1
            n_bytes += os.path.getsize(fp)
            pf = pq.ParquetFile(fp)
            n_rows += pf.metadata.num_rows
            t = pf.read(columns=["event_id"])
            ids = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
            # order-insensitive multiset checksum: XOR of avalanched ids
            x = ids.astype(np.uint64)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            h ^= int(np.bitwise_xor.reduce(x)) if len(x) else 0
        return n_files, n_bytes, n_rows, h

    f_files, f_bytes, f_rows, f_hash = inventory(f"{base}/fragmented")
    c_files, c_bytes, c_rows, c_hash = inventory(f"{base}/compacted")
    assert f_rows == c_rows and f_hash == c_hash, "compaction changed the row multiset"
    return pa.table(
        {
            "stage": pa.array(["fragmented", "compacted"], pa.string()),
            "n_files": pa.array([f_files, c_files], pa.int64()),
            "n_bytes": pa.array([f_bytes, c_bytes], pa.int64()),
            "n_rows": pa.array([f_rows, c_rows], pa.int64()),
            "rows_per_file": pa.array(
                [f_rows // max(f_files, 1), c_rows // max(c_files, 1)], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Bucketed (SMB-style) co-partitioned layout + shuffle-free join
# ---------------------------------------------------------------------------


def bucketize_write(
    src_path: str, out_dir: str, key: str, n_buckets: int, columns: list[str]
) -> None:
    """Rewrite a parquet table hash-bucketed on ``key``: Hive-partitioned
    output ``out_dir/bucket=<b>/`` where b = splitmix64(key) % n_buckets.
    This is the write-side half of the sort-merge-bucket (SMB) join
    pattern (Hive/Spark bucketed tables, Iceberg bucket transforms):
    pay ONE layout pass per table at ingest time, then every future join
    on that key is shuffle-free — the "pick ONE partitioning key and
    reuse it across stages" lever at its strongest, since the reuse
    crosses JOBS, not just stages."""
    from bank_statement_pdf_parser_ray.stages.agg import _splitmix64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_splitmix64(k.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    ds = ray.data.read_parquet(src_path, columns=columns)
    ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["bucket"]
    )


def bucketed_join_revenue(sf_dir: str, n_buckets: int = 16) -> "pa.Table":
    """Shuffle-free big-big join over a pre-bucketed layout: orders and
    lineitem are first rewritten bucketed on the SAME (hash, n_buckets)
    of their orderkey (``bucketize_write``, cached across calls), then
    the join runs as one Ray task per bucket — each task reads ONLY its
    co-bucketed file sets from both sides, joins them in memory with the
    Arrow hash join, and emits a pre-aggregated partial. No all-to-all
    exchange happens at join time; the layout pass already paid it, once,
    at write time.

    Partitioning assumption (documented per SURVEY §2 custom-operator
    rule): both sides MUST be bucketed with the identical hash function
    and bucket count, and a bucket pair must fit one worker's heap
    (at 100 TB: raise n_buckets until it does — the task count scales
    with n_buckets, the per-task memory with 1/n_buckets). Contrast with
    ``hash_join_revenue``, which pays the exchange per query: bucketing
    wins whenever a table is joined on the same key more than ~once.
    """
    import hashlib as _hl

    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    src_o = os.path.abspath(f"{sf_dir}/orders.parquet")
    src_l = os.path.abspath(f"{sf_dir}/lineitem.parquet")
    st_o, st_l = os.stat(src_o), os.stat(src_l)
    fp = _hl.md5(
        f"{src_o}:{st_o.st_size}:{st_o.st_mtime_ns}:{src_l}:{st_l.st_size}:"
        f"{st_l.st_mtime_ns}:{n_buckets}".encode()
    ).hexdigest()[:12]
    base = f"/tmp/bspp_smb_{fp}"
    done = f"{base}/_layout_done"
    if not os.path.exists(done):
        shutil.rmtree(base, ignore_errors=True)
        bucketize_write(src_o, f"{base}/orders", "o_orderkey", n_buckets,
                        ["o_orderkey", "o_orderpriority"])
        bucketize_write(src_l, f"{base}/lineitem", "l_orderkey", n_buckets,
                        ["l_orderkey", "l_extendedprice", "l_discount"])
        with open(done, "w") as f:
            f.write("ok")

    def join_bucket(t: pa.Table) -> pa.Table:
        parts = []
        for b in t.column("id").to_pylist():
            od = f"{base}/orders/bucket={b}"
            ld = f"{base}/lineitem/bucket={b}"
            if not (os.path.isdir(od) and os.path.isdir(ld)):
                continue  # empty bucket on either side: no matches
            o = pads.dataset(od).to_table()
            li = pads.dataset(ld).to_table()
            j = li.join(o, keys=["l_orderkey"], right_keys=["o_orderkey"], join_type="inner")
            from bank_statement_pdf_parser_ray.pipelines.queries import _rev_units

            g = pa.TableGroupBy(
                pa.table({"o_orderpriority": j.column("o_orderpriority"), "rev": _rev_units(j)}),
                ["o_orderpriority"],
            ).aggregate([("rev", "sum"), ([], "count_all")])
            parts.append(g.rename_columns(["o_orderpriority", "p_sum", "p_n"]))
        if not parts:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "p_sum": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(parts)

    buckets = ray.data.range(n_buckets, override_num_blocks=n_buckets)
    partials = buckets.map_batches(
        join_bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
    out = (
        partials.groupby("o_orderpriority")
        .aggregate(Sum("p_sum", alias_name="revenue"), Sum("p_n", alias_name="n_items"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    from bank_statement_pdf_parser_ray.pipelines.queries import _units_to_currency

    out["revenue"] = _units_to_currency(out["revenue"])
    return out


from bank_statement_pdf_parser_ray.pipelines.queries import _REV_SUM_SQL as _RSQL

BUCKETED_JOIN_REVENUE_SQL = f"""
SELECT o_orderpriority, {_RSQL} AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""
