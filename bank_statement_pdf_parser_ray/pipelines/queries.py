"""SQL-checkable relational pipelines over the driver-shared tables
(SURVEY.md §2.5 G1/G2, §2.6 O1/O2, §2.4 J1-broadcast, §2.9 windows;
FIXTURES.md §B maps each engine operator to its natural host table).

Each function takes ``sf_dir`` and returns a Dataset / DataFrame /
pyarrow Table whose column NAMES match the paired oracle_sql exactly
(driver hashes values under sorted column names). Float aggregates are
rounded on BOTH sides so summation order can't flip the hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from bank_statement_pdf_parser_ray.stages.agg import null_safe_group


def _join_partitions(sf_dir: str, *tables: str, part_bytes: int = 32 << 20) -> int:
    """Size a Dataset.join's hash-partition count from the INPUT bytes
    instead of a constant: each partition is a shuffle aggregator with
    real fixed cost (measured at sf0.1/32cpus: the same join runs
    3.25 s at 4 partitions vs 17.2 s at 32 — pure per-partition
    overhead at small data), while at 100 TB the byte rule dominates
    and the clamp hands the join 2 partitions per CPU."""
    import os

    total = sum(os.path.getsize(f"{sf_dir}/{t}.parquet") for t in tables)
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(2 * cpus, -(-total // part_bytes)))


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _rev_units(t: pa.Table) -> "pa.Array":
    """Line revenue in EXACT integer ten-thousandths of currency:
    l_extendedprice has two decimals and l_discount has two, so
    ``price_cents * (100 - discount_pct)`` is the exact decimal product
    as an int64 — summing integers makes per-group revenue
    deterministic to the last cent. The float path it replaces
    (``sum(price * (1 - disc))`` rounded to 2) lands EXACTLY on .005
    half-cents often (products are multiples of 0.0001), where numpy's
    half-even and DuckDB's half-away rounding diverge by a whole cent —
    the seed-19/20 fuzz catch. NULL price/discount propagates to a NULL
    unit (SQL sum-skips semantics preserved)."""
    p = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
    d = pc.cast(pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))), pa.int64())
    return pc.multiply(p, pc.subtract(pa.scalar(100, pa.int64()), d))


def _units_to_currency(s: "pd.Series | np.ndarray") -> "np.ndarray":
    """Integer ten-thousandth sums -> 2-decimal currency, rounding
    half AWAY from zero in integer space (DuckDB round() semantics;
    the oracle does the same arithmetic: ``(sum + 50) // 100 / 100``).
    NaN (empty/all-NULL group) passes through."""
    a = np.asarray(s, dtype=np.float64)
    out = np.where(a >= 0, np.floor((a + 50) / 100), -np.floor((-a + 50) / 100)) / 100.0
    return np.where(np.isnan(a), np.nan, out)


# the same exact-integer revenue expression, for the DuckDB oracles
_REV_UNITS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)
_REV_SUM_SQL = f"CAST((sum({_REV_UNITS_SQL}) + 50) // 100 AS DOUBLE) / 100.0"


def lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """G2-style grouped aggregate with PARTIAL pre-aggregation: each
    batch combines into one row per key BEFORE the shuffle, so the
    all-to-all moves O(keys x blocks) rows, not O(rows) (ray_guide
    "Aggregation at scale")."""
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("rev", _rev_units(t))  # exact integer units
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            # count_all, not count(l_quantity): the oracle's count(*)
            # includes NULL-quantity rows (NULL-ts/price fuzz catch)
            [("l_quantity", "sum"), ("rev", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "p_qty", "p_rev", "p_n"])

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("p_qty", alias_name="sum_qty"), Sum("p_rev", alias_name="sum_rev"), Sum("p_n", alias_name="n_rows"))
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_rev"] = _units_to_currency(out["sum_rev"])
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


LINEITEM_AGG_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       {_REV_SUM_SQL} AS sum_rev,
       count(*)                                                    AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def filter_highvalue(sf_dir: str) -> "ray.data.Dataset":
    """M10 row predicate as a vectorized Arrow filter inside map_batches
    (cheaper than per-row ds.filter)."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(t.column("l_quantity"), pa.scalar(45.0)),
            pc.less(t.column("l_discount"), pa.scalar(0.02)),
        )
        return t.filter(mask).select(["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


FILTER_HIGHVALUE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
"""


def topk_users(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """O2 top-k with deterministic tie-break (count desc, user_id asc).
    Per-batch partial counts pre-combine before ONE coarse-shard
    exchange; each shard merges its users' counts and cuts to its own
    top-k, so the driver merges at most n_shards x k rows (no global
    sort exchange)."""

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["user_id"]), ["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "p_n"])

    def top_shard(g: pa.Table) -> pa.Table:
        m = pa.TableGroupBy(g, ["user_id"]).aggregate([("p_n", "sum")])
        m = m.rename_columns(["user_id", "n"])
        nn = m.column("n").to_numpy(zero_copy_only=False)
        uu = pc.fill_null(m.column("user_id"), 0).to_numpy(zero_copy_only=False)
        top = np.lexsort((uu, -nn))[:k]
        return m.take(pa.array(np.sort(top)))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    parts = _read(sf_dir, "events", ["user_id"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = shard_map_groups(parts, ["user_id"], top_shard).to_pandas()
    out = out.sort_values(["n", "user_id"], ascending=[False, True]).head(k)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


TOPK_USERS_SQL = """
SELECT user_id, count(*) AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
"""


def events_windowed(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped tumbling window (1h) per user: the window key is
    computed vectorized, then ONE partial-pre-aggregated groupby — no
    per-event shuffle of raw rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # float divide BEFORE floor: integer microsecond division truncates
        # toward zero, so pre-1970 (negative) timestamps would bucket off
        # by one vs the oracle's floor(epoch(ts)/3600) (ADVICE round 1)
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.int64()), pa.float64())
        win = pc.cast(pc.floor(pc.divide(ts_us, 3.6e9)), pa.int64())
        t = t.append_column("window_h", win)
        # Valid NaN values need explicit tracking: Ray's Sum over
        # partials treats a NaN partial as missing and SKIPS it (the
        # SQL sum would propagate NaN), so the partial sums are
        # NaN-stripped and a NaN counter re-poisons affected groups at
        # finalize (randomized-fuzz catch). count_all, not
        # ("value", "count"): Arrow's count skips NULLs but count(*)
        # does not.
        v = t.column("value")
        nan_mask = pc.and_(pc.is_valid(v), pc.is_nan(pc.fill_null(v, 0.0)))
        t = t.set_column(t.schema.get_field_index("value"), "value", pc.if_else(nan_mask, pa.scalar(0.0), v))
        t = t.append_column("is_nan", pc.cast(nan_mask, pa.int64()))
        g = pa.TableGroupBy(t, ["user_id", "window_h"]).aggregate(
            [("value", "sum"), ("is_nan", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["user_id", "window_h", "p_sum", "p_nan", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # coarse-shard aggregate: ~95k (user, window) groups at sf0.1 is the
    # many-group regime where Ray's sort aggregate pays per-group cost
    out = shard_aggregate(
        ds,
        ["user_id", "window_h"],
        [("p_sum", "sum"), ("p_nan", "sum"), ("p_n", "sum")],
        ["user_id", "window_h", "sum_value", "n_nan", "n_events"],
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out.loc[out["n_nan"] > 0, "sum_value"] = np.nan
    out["n_events"] = out["n_events"].astype("int64")
    return out.drop(columns=["n_nan"])


EVENTS_WINDOWED_SQL = """
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_h,
       round(sum(value), 2)                    AS sum_value,
       count(*)                                AS n_events
FROM events GROUP BY user_id, window_h
"""


def events_ordered(sf_dir: str) -> "ray.data.Dataset":
    """O1 analogue on the shared tables: per-user stable ordering by
    (ts, event_id), emitted as a row number so the ordering is
    hash-visible. Coarse-sharded (stages/agg.py): ONE Arrow sort +
    vectorized run-relative ranks per shard replaces one pandas call
    per user (~10k at sf0.1). NULL user_ids form one partition, like
    SQL PARTITION BY."""

    def number_shard(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(idx)
        uid = g.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])))
        pos = np.arange(len(uv))
        run_start = np.maximum.accumulate(np.where(new, pos, 0))
        rn = pos - run_start + 1
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": uid,
                "rn": pa.array(rn, pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return shard_map_groups(ds, ["user_id"], number_shard)


EVENTS_ORDERED_SQL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


def broadcast_join(sf_dir: str) -> pd.DataFrame:
    """J1-style broadcast lookup join: the small side (customer ->
    mktsegment) is ray.put once and read inside each batch — no shuffle
    of the big side (ray_guide "Joins and lookups")."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(columns=["c_custkey", "c_mktsegment"])
    lut_ref = ray.put(cust.combine_chunks())

    class SegmentJoin:
        def __init__(self) -> None:
            # Arrow-native LUT built once per actor: key array for
            # pc.index_in, value array for pc.take (vectorized probe —
            # the round-1 per-row dict.get loop was the VERDICT item 9)
            t = ray.get(lut_ref)
            self.keys = t.column("c_custkey").combine_chunks()
            self.vals = t.column("c_mktsegment").combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("o_custkey"), value_set=self.keys)
            # inner-join semantics: rows whose key is absent from the
            # lookup side are DROPPED, matching the SQL (ADVICE round 1)
            valid = pc.is_valid(idx)
            t = t.filter(valid)
            seg = pc.take(self.vals, idx.filter(valid))
            t = t.append_column("c_mktsegment", seg)
            g = pa.TableGroupBy(t, ["c_mktsegment"]).aggregate(
                [("o_totalprice", "sum"), ([], "count_all")]  # oracle count(*) incl. NULL prices
            )
            return g.rename_columns(["c_mktsegment", "p_sum", "p_n"])

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    ds = ds.map_batches(SegmentJoin, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)
    from ray.data.aggregate import Sum as _Sum

    out = (
        ds.groupby("c_mktsegment")
        .aggregate(_Sum("p_sum", alias_name="total_price"), _Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


BROADCAST_JOIN_SQL = """
SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total_price, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def distinct_langs(sf_dir: str) -> pd.DataFrame:
    """D-family distinct over one column (shuffle of unique values
    only). SELECT DISTINCT keeps one NULL row; None cannot join a
    Python sort, so it is appended after the sorted values."""
    vals = _read(sf_dir, "documents", ["lang"]).unique("lang")
    non_null = sorted(v for v in vals if v is not None)
    if len(non_null) < len(vals):
        non_null.append(None)
    return pd.DataFrame({"lang": pd.Series(non_null, dtype="object")})


DISTINCT_LANGS_SQL = "SELECT DISTINCT lang FROM documents"


def json_props_sum(sf_dir: str) -> pd.DataFrame:
    """F6 json_get over events.props: vectorized JSON field extraction
    then grouped sum (props is a JSON string like {"k": 87}).

    Final reduce is the hash-shard exchange (stages/agg.py), not Ray's
    sort-based groupby — the sort path cannot partition a nullable
    string key (NULL-event_type fuzz)."""
    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    def partial(t: pa.Table) -> pa.Table:
        extracted = pc.extract_regex(t.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        if isinstance(extracted, pa.ChunkedArray):
            extracted = extracted.combine_chunks()
        ks = pc.cast(pc.struct_field(extracted, "k"), pa.int64())
        t2 = pa.table({"event_type": t.column("event_type"), "k": ks})
        g = pa.TableGroupBy(t2, ["event_type"]).aggregate([("k", "sum")])
        return g.rename_columns(["event_type", "p_sum"])

    ds = _read(sf_dir, "events", ["event_type", "props"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        shard_aggregate(ds, ["event_type"], [("p_sum", "sum")], ["event_type", "sum_k"])
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # a group whose props never carry the field sums to SQL NULL; pandas
    # (like DuckDB's .df()) can only carry that as float64 NaN
    if not out["sum_k"].isna().any():
        out["sum_k"] = out["sum_k"].astype("int64")
    return out


JSON_PROPS_SUM_SQL = """
SELECT event_type, CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def events_sessionized(sf_dir: str) -> "ray.data.Dataset":
    """Gap-based sessionization (streaming-shaped, SURVEY.md §2.9 /
    ray_guide "Streaming-shaped workloads"): events of one user form a
    new session whenever the gap to the previous event exceeds 30min.
    Coarse-sharded (stages/agg.py): ONE Arrow sort per shard, then the
    session boundaries, per-session counts and sums all fall out of
    numpy cumsum/bincount over the whole shard — no per-user Python
    call. SQL oracle uses a window-function cumulative sum of gap
    markers.

    NaN note: valid NaN values are treated as missing in sum_value
    (indistinguishable from NULL in the float64 kernel) — declared
    semantics, asserted by the randomized fuzz against a NaN->NULL
    oracle."""

    GAP_US = 30 * 60 * 1_000_000

    def sessions_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(idx)
        uid = g.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        new_user = np.concatenate(([True], (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])))
        ts_valid = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts_us = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        gap = np.empty(len(ts_us), dtype=np.int64)
        gap[0] = GAP_US + 1
        gap[1:] = ts_us[1:] - ts_us[:-1]
        # oracle: new session iff lag(ts) IS NULL (first row of the
        # user OR previous row has NULL ts — NULLs sort last, so every
        # NULL-ts row after the first opens its own session) or the
        # valid-ts gap exceeds 30min. A NULL-ts row directly after a
        # valid one CONTINUES that session (NULL > gap is not true).
        prev_valid = np.concatenate(([False], ts_valid[:-1]))
        new_sess = new_user | ~prev_valid | (prev_valid & ts_valid & (gap > GAP_US))
        sid = np.cumsum(new_sess)  # global (within-shard) session index, 1-based
        pos = np.arange(len(uv))
        run_start = np.maximum.accumulate(np.where(new_user, pos, 0))
        session_id = sid - sid[run_start] + 1  # per-user session number
        n_sess = int(sid[-1])
        starts = np.flatnonzero(new_sess)
        n_events = np.bincount(sid, minlength=n_sess + 1)[1:]
        v = g.column("value").to_numpy(zero_copy_only=False)
        have = ~np.isnan(v)
        sums = np.bincount(sid[have], weights=v[have], minlength=n_sess + 1)[1:]
        cnt = np.bincount(sid[have], minlength=n_sess + 1)[1:]
        # an all-missing session sums to NULL like SQL, not 0.0
        sum_value = pa.array(np.round(sums, 2), pa.float64(), mask=cnt == 0)
        return pa.table(
            {
                "user_id": uid.take(pa.array(starts, pa.int64())),
                "session_id": pa.array(session_id[starts], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "sum_value": sum_value,
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], sessions_shard)


EVENTS_SESSIONIZED_SQL = """
WITH marked AS (
  SELECT user_id, value, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def hash_join_revenue(sf_dir: str) -> pd.DataFrame:
    """Large-large distributed hash join (SURVEY.md §2.4 J2 scale path):
    orders JOIN customer on custkey via Dataset.join (hash-partitioned
    on the key), then nation name attached via broadcast lookup and a
    partial-pre-aggregated groupby. Broadcast handles the small side;
    Dataset.join handles the big-big pair."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(columns=["n_nationkey", "n_name"])
    nlut_ref = ray.put(nation.combine_chunks())

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, "orders", "customer"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        # vectorized Arrow probe (pc.index_in + pc.take), not a per-row
        # dict.get loop (VERDICT round 1, item 9); dangling or NULL
        # nation keys DROP like the SQL inner join (dirty-dimension
        # fuzz catch — a None group key also crashes the sort exchange)
        lut = ray.get(nlut_ref)
        idx = pc.index_in(t.column("c_nationkey"), value_set=lut.column("n_nationkey").combine_chunks())
        valid = pc.is_valid(idx)
        t = t.filter(valid)
        names = pc.take(lut.column("n_name").combine_chunks(), idx.filter(valid))
        t2 = pa.table({"n_name": names, "o_totalprice": t.column("o_totalprice")})
        g = pa.TableGroupBy(t2, ["n_name"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]  # oracle count(*)
        )
        return g.rename_columns(["n_name", "p_sum", "p_n"])

    joined = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        joined.groupby("n_name")
        .aggregate(Sum("p_sum", alias_name="revenue"), Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


HASH_JOIN_REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def sample_documents(sf_dir: str) -> "ray.data.Dataset":
    """O3 deterministic ~10% Bernoulli sample: keep documents whose
    md5(doc_id) falls in the lowest tenth of the hash space (first 8
    hex chars < 0x1999999A, string-compared — fixed-width lowercase hex
    orders like the integer). Unlike RNG sampling this reproduces on
    ANY engine, so it carries a real SQL oracle (the same trade
    ``stratified_sample`` makes); shuffle-free streaming filter."""
    import hashlib as _hl

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        mask = pa.array(
            [_hl.md5(str(i).encode()).hexdigest()[:8] < "1999999a" for i in ids], pa.bool_()
        )
        return t.filter(mask)

    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


SAMPLE_DOCUMENTS_SQL = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '1999999a'
"""


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q5-shaped multi-hop join: lineitem -> supplier -> nation ->
    region, revenue per region. The three dimension hops are COMPOSED
    driver-side into one suppkey -> region-name LUT (supplier/nation/
    region are tiny vs lineitem), broadcast once via ray.put, probed
    vectorized with pc.index_in + pc.take inside map_batches, with
    partial pre-aggregation before the final small groupby — the big
    side never shuffles."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(columns=["s_suppkey", "s_nationkey"])
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(columns=["n_nationkey", "n_regionkey"])
    region = pads.dataset(f"{sf_dir}/region.parquet").to_table(columns=["r_regionkey", "r_name"])
    # compose suppkey -> r_name once (dimension sizes: O(nations*suppliers), tiny)
    n_idx = pc.index_in(supp.column("s_nationkey"), value_set=nation.column("n_nationkey").combine_chunks())
    regkey = pc.take(nation.column("n_regionkey").combine_chunks(), n_idx)
    r_idx = pc.index_in(regkey, value_set=region.column("r_regionkey").combine_chunks())
    rname = pc.take(region.column("r_name").combine_chunks(), r_idx)
    lut = pa.table({"s_suppkey": supp.column("s_suppkey"), "r_name": rname}).combine_chunks()
    # a supplier whose nation/region hop dangled has a NULL r_name: the
    # SQL inner joins drop it, so it must not survive as a None group
    lut = lut.filter(pc.is_valid(lut.column("r_name")))
    lut_ref = ray.put(lut)

    def partial(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        idx = pc.index_in(t.column("l_suppkey"), value_set=lu.column("s_suppkey").combine_chunks())
        valid = pc.is_valid(idx)  # inner-join semantics on every hop
        t = t.filter(valid)
        names = pc.take(lu.column("r_name").combine_chunks(), idx.filter(valid))
        t2 = pa.table({"r_name": names, "rev": _rev_units(t)})
        g = pa.TableGroupBy(t2, ["r_name"]).aggregate([("rev", "sum"), ([], "count_all")])
        return g.rename_columns(["r_name", "p_sum", "p_n"])

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        ds.groupby("r_name")
        .aggregate(Sum("p_sum", alias_name="revenue"), Sum("p_n", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = _units_to_currency(out["revenue"])
    out["n_items"] = out["n_items"].astype("int64")
    return out


Q5_REGION_REVENUE_SQL = f"""
SELECT r_name, {_REV_SUM_SQL} AS revenue, count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def part_brand_revenue(sf_dir: str) -> pd.DataFrame:
    """lineitem -> part broadcast join, revenue + quantity per brand
    (exercises the `part` dimension). Same broadcast/vectorized-probe/
    partial-pre-agg shape as q5_region_revenue; at a scale where `part`
    outgrows the object store, Dataset.join (hash_join_revenue's J2
    path) is the drop-in alternative."""
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    part = pads.dataset(f"{sf_dir}/part.parquet").to_table(columns=["p_partkey", "p_brand"]).combine_chunks()
    lut_ref = ray.put(part)

    def partial(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=lu.column("p_partkey").combine_chunks())
        valid = pc.is_valid(idx)
        t = t.filter(valid)
        brand = pc.take(lu.column("p_brand").combine_chunks(), idx.filter(valid))
        t2 = pa.table({"p_brand": brand, "rev": _rev_units(t), "l_quantity": t.column("l_quantity")})
        g = pa.TableGroupBy(t2, ["p_brand"]).aggregate(
            [("rev", "sum"), ("l_quantity", "sum"), ([], "count_all")]  # oracle count(*)
        )
        return g.rename_columns(["p_brand", "p_rev", "p_qty", "p_n"])

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        ds.groupby("p_brand")
        .aggregate(
            Sum("p_rev", alias_name="revenue"),
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_n", alias_name="n_items"),
        )
        .to_pandas()
    )
    out["revenue"] = _units_to_currency(out["revenue"])
    out["sum_qty"] = out["sum_qty"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out


PART_BRAND_REVENUE_SQL = f"""
SELECT p_brand,
       {_REV_SUM_SQL} AS revenue,
       round(sum(l_quantity), 2)                         AS sum_qty,
       count(*)                                          AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def _exists_cogroup(sf_dir: str, threshold: float, keep_matched: bool) -> pd.DataFrame:
    """Shared distributed EXISTS engine for the SEMI/ANTI join pair:
    customers WITH (semi) / WITHOUT (anti) an order above `threshold`.

    Scale shape — cogroup, not Dataset.join: the probe side collapses
    to DISTINCT matching keys per batch BEFORE the shuffle (the
    exchange moves int64 keys, never raw orders), both sides are tagged
    and unioned, and ONE hash shuffle co-locates each key's customer
    rows with any probe row; a vectorized per-group mask keeps or drops
    matched keys. No driver-side key set, no broadcast — both sides
    stream, so the plan survives a probe side whose distinct keys don't
    fit one machine (where the broadcast_join pattern would not). The
    cogroup also sidesteps a Dataset.join degeneracy: an ALL-EMPTY
    aggregated side yields schema-less blocks that Arrow's hash join
    rejects (ArrowInvalid on the key FieldRef) instead of returning all
    left rows — found by probing the zero-match case.

    The exchange is COARSE-SHARDED (stages/agg.py): keys hash into
    n_shards groups and one vectorized ``pc.is_in`` mask answers EXISTS
    for a whole shard, instead of Ray's per-key map_groups paying one
    Python call per customer (15k calls at sf0.1)."""

    def probe_keys(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("o_totalprice"), pa.scalar(threshold))
        keys = pc.unique(pc.filter(t.column("o_custkey"), keep))
        n = len(keys)
        return pa.table(
            {
                "c_custkey": keys,
                "c_mktsegment": pa.nulls(n, pa.string()),
                "is_probe": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "is_probe": pa.array(np.zeros(t.num_rows, dtype=bool)),
            }
        )

    probe = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        probe_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def select_shard(g: pa.Table) -> pa.Table:
        is_probe = g.column("is_probe")
        probe_k = pc.unique(pc.filter(g.column("c_custkey"), is_probe))
        custg = g.filter(pc.invert(is_probe))
        # NULL-safe EXISTS: a NULL customer key matches nothing (semi
        # drops it, anti KEEPS it) — fill before inverting so the anti
        # branch doesn't silently drop NULL-key rows
        mask = pc.fill_null(pc.is_in(custg.column("c_custkey"), value_set=probe_k), False)
        if not keep_matched:
            mask = pc.invert(mask)
        return custg.filter(mask).select(["c_custkey", "c_mktsegment"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    out = shard_map_groups(cust.union(probe), ["c_custkey"], select_shard).to_pandas()
    if "c_custkey" not in out.columns:  # all-empty result loses its schema
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"), "c_mktsegment": pd.Series([], dtype=object)}
        )
    return out


def anti_join_customers(sf_dir: str, threshold: float = 400_000.0) -> pd.DataFrame:
    """Distributed ANTI join (SURVEY.md §2.4 J4): customers with NO
    order above `threshold`; see `_exists_cogroup`. Non-trivial on the
    shared tables (FK integrity makes a plain no-orders anti join
    empty)."""
    return _exists_cogroup(sf_dir, threshold, keep_matched=False)


def semi_join_customers(sf_dir: str, threshold: float = 400_000.0) -> pd.DataFrame:
    """Distributed SEMI join (EXISTS): customers WITH at least one
    order above `threshold` — the complement of `anti_join_customers`,
    same single-shuffle cogroup; see `_exists_cogroup`."""
    return _exists_cogroup(sf_dir, threshold, keep_matched=True)


ANTI_JOIN_CUSTOMERS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


SEMI_JOIN_CUSTOMERS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


def left_join_big_orders(sf_dir: str, threshold: float = 400_000.0) -> pd.DataFrame:
    """Distributed LEFT OUTER join: every customer paired with each of
    their orders above `threshold`, or a NULL order if they have none —
    the join shape `Dataset.join` gets wrong on all-empty aggregated
    sides (see `_exists_cogroup`), built on the same tagged-union
    cogroup instead. The probe side is filtered at the parquet read
    (predicate pushdown), both sides stream into ONE hash shuffle on
    the key, and the exchange is coarse-sharded
    (stages/agg.py) with ONE in-shard Arrow hash join answering every
    key in a shard. No broadcast, no driver-side state — survives a
    right side of any size, and the in-shard join gives SQL's NULL-key
    semantics (never matches) exactly."""

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
        filter=pc.field("o_totalprice") > threshold,
    )

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_mktsegment": pa.nulls(len(t), pa.string()),
                "o_orderkey": t.column("o_orderkey"),
                "o_totalprice": t.column("o_totalprice"),
                "is_probe": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "o_orderkey": pa.nulls(len(t), pa.int64()),
                "o_totalprice": pa.nulls(len(t), pa.float64()),
                "is_probe": pa.array(np.zeros(len(t), dtype=bool)),
            }
        )

    probe = orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def join_shard(g: pa.Table) -> pa.Table:
        # one in-shard Arrow hash join answers every key in the shard
        # (the per-key map_groups it replaces paid one Python call per
        # customer); "left outer" drops orders referencing no customer
        # and NULL-pads customers with no qualifying order — exactly
        # the SQL plan's semantics
        is_probe = g.column("is_probe")
        left = g.filter(pc.invert(is_probe)).select(["c_custkey", "c_mktsegment"])
        right = g.filter(is_probe).select(["c_custkey", "o_orderkey", "o_totalprice"])
        out = left.join(right, keys=["c_custkey"], join_type="left outer")
        return out.select(["c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    return shard_map_groups(cust.union(probe), ["c_custkey"], join_shard).to_pandas()


LEFT_JOIN_BIG_ORDERS_SQL = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON o.o_custkey = c.c_custkey
"""


def full_outer_user_activity(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two per-user aggregates (click count vs
    purchase count): a user appears when EITHER side has rows, with
    NULL — not 0 — for the absent side. The two 'sides' never exist as
    separate shuffled tables: one pruned read filtered to the two event
    types, per-batch partial counts of each, ONE groupby summing both —
    the full-outer semantics fall out of mapping a zero partial count
    to NULL, because a user enters the pipeline only via rows of one of
    the two types. One shuffle moving two int64s per (user, batch)
    replaces SQL's two grouped subqueries plus an outer join."""

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        g = pa.TableGroupBy(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "p_clicks": pc.cast(pc.equal(et, "click"), pa.int64()),
                    "p_purch": pc.cast(pc.equal(et, "purchase"), pa.int64()),
                }
            ),
            ["user_id"],
        ).aggregate([("p_clicks", "sum"), ("p_purch", "sum")])
        return g.rename_columns(["user_id", "p_clicks", "p_purch"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )
    out = shard_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("p_clicks", "sum"), ("p_purch", "sum")],
        ["user_id", "n_clicks", "n_purchases"],
    ).to_pandas()
    out["n_clicks"] = out["n_clicks"].astype("Int64").replace(0, pd.NA)
    out["n_purchases"] = out["n_purchases"].astype("Int64").replace(0, pd.NA)
    return out


FULL_OUTER_USER_ACTIVITY_SQL = """
WITH c AS (
  SELECT user_id, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY user_id
), p AS (
  SELECT user_id, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id, c.n_clicks, p.n_purchases
FROM c FULL OUTER JOIN p ON c.user_id IS NOT DISTINCT FROM p.user_id
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot / one-hot aggregate (feature-engineering shape): per user,
    the count of each event_type as its own column. Pure partial
    pre-aggregation — each batch collapses to one row per in-batch user
    BEFORE the shuffle, then one small groupby sums the partials, so
    the exchange moves O(users x blocks) short int rows. Integer sums:
    bit-exact vs the CASE-WHEN SQL oracle."""
    cols = [f"n_{k}" for k in _EVENT_TYPES]

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        tbl = pa.table(
            {
                "user_id": t.column("user_id"),
                **{f"n_{k}": pc.cast(pc.equal(et, k), pa.int64()) for k in _EVENT_TYPES},
            }
        )
        g = pa.TableGroupBy(tbl, ["user_id"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["user_id", *cols])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_aggregate(
        ds, ["user_id"], [(c, "sum") for c in cols], ["user_id", *cols]
    ).to_pandas()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def events_stats(sf_dir: str) -> pd.DataFrame:
    """Distributed second-moment statistics per event_type: n, mean,
    sample stddev — computed from partial (n, Σv, Σv²) sums combined
    per batch before the shuffle, the classic one-pass distributed
    moments pattern (vs the oracle's streaming stddev_samp). UNROUNDED
    on both sides: rounding two independently-summed doubles to a fixed
    decimal flips at half-way boundaries (a 1e-13 summation difference
    becomes exactly 1e-6 — the seed-6 fuzz catch), while the raw
    moment-cancellation noise (~1e-10 at this value range) sits inside
    the compare tolerance. Final reduce via the hash-shard
    exchange — Ray's sort groupby cannot partition a nullable string
    key (NULL-event_type fuzz)."""
    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        tbl = pa.table(
            {
                "event_type": t.column("event_type"),
                # NaN values are treated as MISSING for the moments:
                # there is no SQL semantics to match — DuckDB's
                # stddev_samp literally raises OutOfRange on NaN input
                # (measured) — so the declared behavior is stats over
                # finite values, asserted by the fuzz against a
                # NaN->NULL oracle. NULL->NaN after to_numpy makes one
                # isnan test cover both.
                "v": pc.if_else(pc.is_nan(pc.fill_null(v, 0.0)), pa.scalar(None, pa.float64()), v),
                "v2": pc.if_else(
                    pc.is_nan(pc.fill_null(v, 0.0)),
                    pa.scalar(None, pa.float64()),
                    pc.multiply(v, v),
                ),
                # avg/stddev_samp divide by the NON-NULL count, while the
                # n column is count(*) — two separate counters, or NULL
                # values skew the mean (randomized-fuzz catch)
                "valid": pc.cast(
                    pc.and_(pc.is_valid(v), pc.invert(pc.is_nan(pc.fill_null(v, 0.0)))), pa.int64()
                ),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(tbl, ["event_type"]).aggregate(
            [("v", "sum"), ("v2", "sum"), ("valid", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["event_type", "p_v", "p_v2", "p_valid", "p_n"])

    ds = _read(sf_dir, "events", ["event_type", "value"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        shard_aggregate(
            ds,
            ["event_type"],
            [("p_v", "sum"), ("p_v2", "sum"), ("p_valid", "sum"), ("p_n", "sum")],
            ["event_type", "s_v", "s_v2", "n_valid", "n"],
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    nv = out["n_valid"].to_numpy(dtype=float)
    sv = out["s_v"].to_numpy(dtype=float)
    sv2 = out["s_v2"].to_numpy(dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(nv > 0, sv / np.maximum(nv, 1), np.nan)
        # stddev_samp needs >=2 NON-NULL rows, else NULL — the
        # np.maximum guards the divide, the where supplies SQL semantics
        var = np.where(nv > 1, np.maximum(sv2 - sv * sv / np.maximum(nv, 1), 0.0) / np.maximum(nv - 1, 1), np.nan)
    out = out.drop(columns=["n_valid"])
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "avg_value": mean,
            "stddev_value": np.sqrt(var),
        }
    )
    return res


EVENTS_STATS_SQL = """
SELECT event_type,
       count(*)               AS n,
       avg(value)             AS avg_value,
       stddev_samp(value)     AS stddev_value
FROM events GROUP BY event_type
"""


def union_event_slices(sf_dir: str) -> pd.DataFrame:
    """Set op: UNION ALL of two independently-filtered event slices
    (Dataset.union concatenates lazily — no shuffle, blocks from both
    inputs stream straight into the downstream partial pre-agg), then a
    per-type count/sum rollup."""
    from ray.data.aggregate import Count, Sum

    def _nan_to_null(t: pa.Table) -> pa.Table:
        # declared NaN-as-missing semantics (see the oracle note below);
        # mapping NaN -> NULL here also sidesteps Ray Sum's NaN-partial
        # skip, which would silently drop every VALID value sharing a
        # partial with one NaN (the events_windowed fuzz catch)
        v = t.column("value")
        nan_mask = pc.and_(pc.is_valid(v), pc.is_nan(pc.fill_null(v, 0.0)))
        return t.set_column(
            t.schema.get_field_index("value"), "value", pc.if_else(nan_mask, pa.scalar(None, pa.float64()), v)
        )

    def keep_high(t: pa.Table) -> pa.Table:
        t = _nan_to_null(t)
        return t.filter(pc.greater(pc.fill_null(t.column("value"), -1e308), pa.scalar(90.0)))

    def keep_clicks(t: pa.Table) -> pa.Table:
        t = _nan_to_null(t)
        return t.filter(pc.equal(t.column("event_type"), pa.scalar("click")))

    high = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        keep_high, batch_format="pyarrow", zero_copy_batch=True
    )
    clicks = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        keep_clicks, batch_format="pyarrow", zero_copy_batch=True
    )
    both = high.union(clicks)

    # per-batch combiner + hash-shard reduce (Ray's sort groupby cannot
    # partition a nullable string key — NULL-event_type fuzz); SQL
    # count(*) vs sum(value)-skips-NULL is preserved by the two partials
    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["event_type"]).aggregate([([], "count_all"), ("value", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_s"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    out = (
        shard_aggregate(
            both.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["event_type"],
            [("p_n", "sum"), ("p_s", "sum")],
            ["event_type", "n", "sum_value"],
        ).to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


# NaN policy stated IN the oracle: the engine's Arrow comparison follows
# IEEE (NaN > 90 is false) and Ray's Sum skips NaN partials, so the SQL
# declares NaN-as-missing explicitly (isnan gate + NaN->NULL in the sum).
# The shared driver tables are NaN-free, so the driver oracle is
# unaffected; the randomized fuzz exercises the NaN legs.
UNION_EVENT_SLICES_SQL = """
WITH u AS (
  SELECT event_type, value FROM events WHERE value > 90.0 AND NOT isnan(value)
  UNION ALL
  SELECT event_type, value FROM events WHERE event_type = 'click'
)
SELECT event_type, count(*) AS n,
       round(sum(CASE WHEN isnan(value) THEN NULL ELSE value END), 2) AS sum_value
FROM u GROUP BY event_type
"""


def union_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Set op: UNION (distinct) of two independently-filtered user-id
    slices — completes the §2.7 family next to UNION ALL / INTERSECT /
    EXCEPT. Each slice is a pruned, predicate-filtered read; the two
    streams concatenate lazily (`Dataset.union`, no shuffle), each
    batch pre-combines to its LOCAL distinct ids (`pc.unique` — the
    combiner that makes the exchange move distinct-per-block ids, not
    rows), and one `unique()` exchange finishes the global distinct.
    At 100 TB the shuffle volume is O(distinct_ids × blocks), the same
    bound as `distinct_langs`."""

    def local_unique(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("user_id").combine_chunks())
        return pa.table({"user_id": u})

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type"],
        filter=pc.field("event_type") == "click",
    ).map_batches(local_unique, batch_format="pyarrow", zero_copy_batch=True)
    high = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value"],
        filter=pc.field("value") > 90.0,
    ).map_batches(local_unique, batch_format="pyarrow", zero_copy_batch=True)
    vals = clicks.union(high).unique("user_id")
    # SQL UNION keeps NULL as one distinct value; pandas (like DuckDB's
    # .df()) carries a NULL BIGINT as float64 NaN, so use int64 only
    # for NULL-free results; sort NULLS LAST like the oracle's ORDER BY
    has_null = any(v is None for v in vals)
    out = pd.DataFrame({"user_id": pd.Series(vals, dtype="float64" if has_null else "int64")})
    return out.sort_values("user_id", na_position="last").reset_index(drop=True)


UNION_DISTINCT_USERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE value > 90.0
ORDER BY user_id
"""


def _user_type_flag_sets(sf_dir: str, want_click: int, want_view: int) -> pd.DataFrame:
    """Shared engine for INTERSECT/EXCEPT over event-type membership.
    Scale shape: instead of materializing two distinct sets and
    hash-joining them (two shuffles, and Ray's hash join chokes on the
    schema-less empty partitions a sparse key space produces), each
    batch collapses locally to one row per key carrying
    has_click/has_view flags, a SINGLE pre-combined groupby OR-merges
    the flags, and a streamed filter keeps keys matching the wanted bit
    pattern. Only unique (key, 2 bits) rows ever shuffle."""
    from ray.data.aggregate import Max

    def local_flags(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        is_click = pc.cast(pc.equal(et, pa.scalar("click")), pa.int8())
        is_view = pc.cast(pc.equal(et, pa.scalar("view")), pa.int8())
        flagged = pa.table(
            {"user_id": t.column("user_id"), "is_click": is_click, "is_view": is_view}
        ).filter(pc.or_(pc.equal(is_click, 1), pc.equal(is_view, 1)))
        # per-batch pre-combine: one row per key leaves the batch
        out = flagged.group_by(["user_id"]).aggregate([("is_click", "max"), ("is_view", "max")])
        return out.rename_columns(["user_id", "is_click", "is_view"])

    def keep_wanted(t: pa.Table) -> pa.Table:
        # the groupby emits schema-less empty blocks for empty key
        # ranges; rebuild them as typed empty tables
        if "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64())})
        m = pc.and_(
            pc.equal(t.column("has_click"), want_click), pc.equal(t.column("has_view"), want_view)
        )
        return pa.table({"user_id": t.filter(m).column("user_id").cast(pa.int64())})

    ds = (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(local_flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Max("is_click", alias_name="has_click"), Max("is_view", alias_name="has_view"))
        .map_batches(keep_wanted, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = ds.to_pandas()
    if "user_id" not in out.columns:  # empty to_pandas loses columns
        out = pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
    # SQL set ops treat NULL = NULL, so a NULL-user row can legitimately
    # survive the bit-pattern filter; pandas (like DuckDB's .df()) can
    # only carry a NULL BIGINT as float64 NaN, so keep int64 only when
    # the column is NULL-free (the shared driver tables always are).
    if not out["user_id"].isna().any():
        out = out.astype({"user_id": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


def intersect_users(sf_dir: str) -> pd.DataFrame:
    """Set op: user_ids appearing with BOTH event types (INTERSECT of
    two distinct projections); see `_user_type_flag_sets`."""
    return _user_type_flag_sets(sf_dir, want_click=1, want_view=1)


def except_users(sf_dir: str) -> pd.DataFrame:
    """Set op: user_ids with clicks but NO views (EXCEPT of two
    distinct projections); see `_user_type_flag_sets` — same single
    pre-combined shuffle, different wanted bit pattern."""
    return _user_type_flag_sets(sf_dir, want_click=1, want_view=0)


INTERSECT_USERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view'
"""


EXCEPT_USERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'view'
"""


def _orders_fine_agg(sf_dir: str) -> pd.DataFrame:
    """Finest-grain (priority, status) sum/count of orders with partial
    pre-aggregation — the ONE distributed reduction both `rollup_orders`
    and `cube_orders` derive every coarser grouping set from. At most
    |priorities| x |statuses| rows come back, trivially driver-sized at
    any data scale."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["o_orderpriority", "o_orderstatus", "o_totalprice"]),
            ["o_orderpriority", "o_orderstatus"],
        ).aggregate([("o_totalprice", "sum"), ([], "count_all")])  # oracle count(*)
        return g.rename_columns(["o_orderpriority", "o_orderstatus", "p_sum", "p_n"])

    return (
        _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("p_sum", alias_name="sum_price"), Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )


def _coarsen(fine: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    """One grouping set derived from the reduced finest-grain table;
    absent dimensions become NULL, as ROLLUP/CUBE emit them."""
    if by:
        lvl = fine.groupby(by, as_index=False).agg(
            sum_price=("sum_price", "sum"), n_orders=("n_orders", "sum")
        )
    else:
        lvl = pd.DataFrame(
            {"sum_price": [fine["sum_price"].sum()], "n_orders": [fine["n_orders"].sum()]}
        )
    for dim in ("o_orderpriority", "o_orderstatus"):
        if dim not in by:
            lvl[dim] = pd.array([None] * len(lvl), dtype=object)
    return lvl


def _levels_out(levels: list[pd.DataFrame]) -> pd.DataFrame:
    out = pd.concat(levels, ignore_index=True)[
        ["o_orderpriority", "o_orderstatus", "n_orders", "sum_price"]
    ]
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_price"] = out["sum_price"].round(2)
    return out.reset_index(drop=True)


def rollup_orders(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate (SQL ROLLUP): per (priority, status),
    per priority, and grand total in one result. Scale shape: ONE
    pre-combined shuffle at the finest grain only — the coarser levels
    are derived from the already-reduced finest-grain table (see
    `_orders_fine_agg`), so a 3-level rollup costs exactly one
    all-to-all."""
    fine = _orders_fine_agg(sf_dir)
    return _levels_out(
        [fine, _coarsen(fine, ["o_orderpriority"]), _coarsen(fine, [])]
    )


def cube_orders(sf_dir: str) -> pd.DataFrame:
    """Full CUBE over (priority, status): all four grouping sets —
    finest, each single dimension, and the grand total — still from the
    SINGLE finest-grain shuffle of `_orders_fine_agg`; the 2^d - 1
    coarser sets are pure driver arithmetic over the reduced table.
    This is the right CUBE shape at any scale where the finest grain's
    cardinality is bounded (categorical dims); high-cardinality CUBE
    dims would instead need one shuffle per grouping set."""
    fine = _orders_fine_agg(sf_dir)
    return _levels_out(
        [
            fine,
            _coarsen(fine, ["o_orderpriority"]),
            _coarsen(fine, ["o_orderstatus"]),
            _coarsen(fine, []),
        ]
    )


CUBE_ORDERS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


ROLLUP_ORDERS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""




def lineitem_corr(sf_dir: str) -> pd.DataFrame:
    """Distributed bivariate statistics — SQL ``corr`` /
    ``covar_samp``: Pearson correlation and sample covariance of
    (l_quantity, l_extendedprice) per return flag, from per-batch
    partial sums of (n, Σx, Σy, Σx², Σy², Σxy) — the standard one-pass
    distributed co-moment pattern; only one tiny pre-combined row per
    (key, block) crosses the shuffle.

    Rounding note: corr is dimensionless (rounded 6dp, far above
    cancellation noise at this value range); the covariance subtracts
    Σxy − ΣxΣy/n where both terms are ~1e10 at sf0.1, so it is rounded
    to 2dp to stay above the ~1e-5 one-pass-vs-streaming float gap."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("l_quantity").cast(pa.float64())
        y = t.column("l_extendedprice").cast(pa.float64())
        # SQL corr/covar use PAIRWISE deletion: a row where either side
        # is NULL contributes to count(*) but to none of the co-moment
        # sums (NULL-price fuzz catch)
        both = pc.and_(pc.is_valid(x), pc.is_valid(y))
        xm = pc.if_else(both, x, pa.scalar(0.0))
        ym = pc.if_else(both, y, pa.scalar(0.0))
        tbl = pa.table(
            {
                "k": t.column("l_returnflag"),
                "x": xm,
                "y": ym,
                "xx": pc.multiply(xm, xm),
                "yy": pc.multiply(ym, ym),
                "xy": pc.multiply(xm, ym),
                "pair": pc.cast(both, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(tbl, ["k"]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xx", "sum"), ("yy", "sum"), ("xy", "sum"), ("pair", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["l_returnflag", "p_x", "p_y", "p_xx", "p_yy", "p_xy", "p_pair", "p_n"])

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("p_x", alias_name="sx"),
            Sum("p_y", alias_name="sy"),
            Sum("p_xx", alias_name="sxx"),
            Sum("p_yy", alias_name="syy"),
            Sum("p_xy", alias_name="sxy"),
            Sum("p_pair", alias_name="n_pair"),
            Sum("p_n", alias_name="n"),
        )
        .to_pandas()
    )
    n = out["n_pair"].to_numpy(dtype=float)  # co-moments divide by PAIR count
    sx, sy = out["sx"].to_numpy(dtype=float), out["sy"].to_numpy(dtype=float)
    sxx, syy, sxy = (out[c].to_numpy(dtype=float) for c in ("sxx", "syy", "sxy"))
    with np.errstate(divide="ignore", invalid="ignore"):
        # sample co-moments need >=2 rows, else SQL NULL
        cov = np.where(n > 1, (sxy - sx * sy / np.maximum(n, 1)) / np.maximum(n - 1, 1), np.nan)
        vx = np.maximum(sxx - sx * sx / np.maximum(n, 1), 0.0)
        vy = np.maximum(syy - sy * sy / np.maximum(n, 1), 0.0)
        corr = np.where((n > 1) & (vx > 0) & (vy > 0), cov * (n - 1) / np.sqrt(vx * vy), np.nan)
    res = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "n": out["n"].astype("int64"),
            "corr_qty_price": np.round(corr, 6),
            "covar_qty_price": np.round(cov, 2),
        }
    ).sort_values("l_returnflag").reset_index(drop=True)
    return res


LINEITEM_CORR_SQL = """
SELECT l_returnflag,
       count(*)                                       AS n,
       round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def value_histogram(sf_dir: str, width: float = 10.0) -> pd.DataFrame:
    """Equi-width histogram of event values — the distributed
    frequency-table shape: each batch bins vectorized
    (floor(value/width)) and pre-combines to one row per (bin, block)
    with ``pa.TableGroupBy``, so the shuffle moves O(bins x blocks)
    rows no matter how large the input. NULLs and valid NaNs carry no
    bin and are excluded on both sides (floor(NaN) has no integer
    bin; the oracle states it with an isnan filter)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value")
        keep = pc.and_(pc.is_valid(v), pc.invert(pc.is_nan(pc.fill_null(v, 0.0))))
        v = v.filter(keep)
        bins = pc.cast(pc.floor(pc.divide(v, width)), pa.int64())
        g = pa.TableGroupBy(pa.table({"bin": bins}), ["bin"]).aggregate([([], "count_all")])
        return g.rename_columns(["bin", "p_n"])

    ds = _read(sf_dir, "events", ["value"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    if out.empty:  # empty to_pandas loses columns — anchor the schema
        return pd.DataFrame({"bin": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
    out = out.sort_values("bin").reset_index(drop=True)
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


VALUE_HISTOGRAM_SQL = """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS n
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY bin ORDER BY bin
"""


def user_top_event(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-user MODE: the most frequent event_type per
    user with a pinned tie-break (count desc, event_type asc — SQL
    mode() leaves ties unspecified, so the oracle ranks explicitly).

    Scale shape: per-batch partial (user, type) counts pre-combine
    BEFORE the shuffle, so the all-to-all moves O(users x types x
    blocks) rows; ONE coarse-shard exchange on user_id (stages/agg.py)
    then answers both the count merge and the per-user argmax with a
    single vectorized kernel per shard (the per-user pandas map_groups
    it replaces paid one Python call per user — 10k at sf0.1)."""

    def partial(t: pa.Table) -> pa.Table:
        g = null_safe_group(t, ["user_id", "event_type"], [([], "count_all")])
        return g.rename_columns(["user_id", "event_type", "p_n"])

    def top_shard(g: pa.Table) -> pa.Table:
        # merge partial counts, then run-first per user under the
        # pinned (n desc, event_type asc) order — all Arrow/numpy
        m = null_safe_group(g, ["user_id", "event_type"], [("p_n", "sum")])
        m = m.rename_columns(["user_id", "event_type", "n"])
        order = pc.sort_indices(
            m,
            sort_keys=[
                ("user_id", "ascending"),
                ("n", "descending"),
                ("event_type", "ascending"),
            ],
        )
        m = m.take(order)
        uid = m.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])))
        return m.filter(pa.array(first))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_map_groups(parts, ["user_id"], top_shard).to_pandas()
    out = out.rename(columns={"event_type": "top_event"})
    # the NULL-user group keeps its row (SQL GROUP BY); its key is only
    # representable as float64 NaN in pandas, matching DuckDB's .df()
    if not out["user_id"].isna().any():
        out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("user_id", na_position="last").reset_index(drop=True)


USER_TOP_EVENT_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT user_id, event_type AS top_event, n FROM r WHERE rk = 1 ORDER BY user_id
"""


def user_first_last(sf_dir: str) -> pd.DataFrame:
    """First and last event per user under the pinned total order
    (ts, event_id) — duplicate timestamps exist in the shared table, so
    the tie column is part of the contract on BOTH sides.

    Scale shape: each batch reduces to at most TWO rows per user
    (its local first and last) before the shuffle; the distributed
    ``map_groups`` then folds the per-block extremes, never the raw
    events."""

    def partial(t: pa.Table) -> pa.Table:
        # Arrow run-boundary pick (r3 verdict #7: no pandas partials):
        # sort the batch by (user, ts, event_id); each user-run's first
        # and last rows are its local extremes.
        n = t.num_rows
        if n == 0:
            return t
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        uid = t.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        # the "last" candidate under ts DESC NULLS LAST is the run's
        # last VALID-ts row (a NULL-ts row only wins an all-NULL run);
        # keep start, last-valid and run-end so the fold sees all three
        tsv = pc.is_valid(t.column("ts")).to_numpy(zero_copy_only=False)
        lastv = np.maximum.accumulate(np.where(tsv, np.arange(n), -1))[ends - 1]
        lastv = np.where(lastv >= starts, lastv, ends - 1)
        return t.take(
            pa.array(np.unique(np.concatenate([starts, lastv, ends - 1])), pa.int64())
        )

    def fold(g: pa.Table) -> pa.Table:
        # whole-shard fold: sort by (user, ts, event_id); the run's
        # first and last rows ARE the extremes (one Arrow pass for all
        # users in the shard)
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "first_event": pa.array([], pa.string()),
                    "first_ts": pa.array([], pa.timestamp("us")),
                    "last_event": pa.array([], pa.string()),
                    "last_ts": pa.array([], pa.timestamp("us")),
                }
            )
        uid = g.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        first[1:] = (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])
        s = np.flatnonzero(first)
        e = np.append(s[1:], n)
        # ts DESC NULLS LAST: last = last VALID-ts row of the run, the
        # run end only when every ts is NULL (then event_id DESC picks
        # the max id, which IS the run end under the asc sort)
        tsv = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        lastv = np.maximum.accumulate(np.where(tsv, np.arange(n), -1))[e - 1]
        starts = pa.array(s)
        lasts = pa.array(np.where(lastv >= s, lastv, e - 1))
        out = pa.table(
            {
                "user_id": uid.take(starts),
                "first_event": g.column("event_type").take(starts),
                "first_ts": g.column("ts").take(starts),
                "last_event": g.column("event_type").take(lasts),
                "last_ts": g.column("ts").take(lasts),
            }
        )
        # the oracle's self-join USING (user_id) never matches NULL, so
        # a NULL-user run emits nothing (pandas groupby dropped it too)
        return out.filter(pc.is_valid(out.column("user_id")))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=8192)
    out = shard_map_groups(parts, ["user_id"], fold).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


USER_FIRST_LAST_SQL = """
WITH r AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT a.user_id, a.event_type AS first_event, a.ts AS first_ts,
       d.event_type AS last_event, d.ts AS last_ts
FROM (SELECT user_id, event_type, ts FROM r WHERE ra = 1) a
JOIN (SELECT user_id, event_type, ts FROM r WHERE rd = 1) d USING (user_id)
ORDER BY a.user_id
"""


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type.

    Scale shape: each batch first reduces to its DISTINCT (type, user)
    pairs, so the one real shuffle moves O(distinct pairs x blocks)
    rows, never raw events; the pair dedup AND the per-type partial
    count both run inside ONE coarse-shard exchange on user_id (all of
    a user's pairs co-locate, so the in-shard pair distinct is globally
    exact), leaving an O(types x shards) final sum."""
    from ray.data.aggregate import Sum

    def pairs(t: pa.Table) -> pa.Table:
        # COUNT(DISTINCT user_id) excludes NULL users (NULL-uid fuzz)
        t = t.filter(pc.is_valid(t.column("user_id")))
        g = null_safe_group(t, ["event_type", "user_id"], [([], "count_all")])
        return g.select(["event_type", "user_id"])

    def distinct_count_shard(g: pa.Table) -> pa.Table:
        # global pair distinct (exact: a user's rows never split across
        # shards) then the per-type partial count, one Arrow pass each
        d = null_safe_group(g, ["event_type", "user_id"], [([], "count_all")])
        c = pa.TableGroupBy(d.select(["event_type"]), ["event_type"]).aggregate(
            [([], "count_all")]
        )
        return c.rename_columns(["event_type", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    parts = _read(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    out = (
        shard_aggregate(
            shard_map_groups(parts, ["user_id"], distinct_count_shard),
            ["event_type"],
            [("p_n", "sum")],
            ["event_type", "n_users"],
        ).to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


DISTINCT_USERS_PER_TYPE_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_by_month(sf_dir: str) -> pd.DataFrame:
    """Per-calendar-month event count and valid-value sum (date_trunc
    family). NULL and NaN values are excluded from the sum on BOTH
    sides; a month with zero valid values sums to NULL, matching the
    SQL FILTER semantics (engine tracks the valid count explicitly).

    Scale shape: one vectorized ``floor_temporal`` + per-batch partial
    (month, n, n_vals, total) rows; the shuffle moves O(months x
    blocks) rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t.column("ts"), unit="month")
        v = t.column("value").to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        g = pa.table(
            {
                "month": month,
                "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
                "is_valid": pa.array(valid.astype(np.int64), pa.int64()),
                "val": pa.array(np.where(valid, v, 0.0), pa.float64()),
            }
        )
        agg = pa.TableGroupBy(g, ["month"]).aggregate(
            [("one", "sum"), ("is_valid", "sum"), ("val", "sum")]
        )
        return agg.rename_columns(["month", "p_n", "p_valid", "p_total"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    # house exchange rather than ray groupby: a NULL month must stay
    # ONE group (the NULL-ts fuzz caught per-block NULL groups leaking
    # through the sort-based groupby)
    out = shard_aggregate(
        _read(sf_dir, "events", ["ts", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["month"],
        [("p_n", "sum"), ("p_valid", "sum"), ("p_total", "sum")],
        ["month", "n", "n_valid", "raw_total"],
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["total"] = np.where(out["n_valid"] > 0, np.round(out["raw_total"], 6), np.nan)
    out = out[["month", "n", "total"]]
    return out.sort_values("month").reset_index(drop=True)


EVENTS_BY_MONTH_SQL = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       count(*) AS n,
       round(sum(value) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)), 6) AS total
FROM events GROUP BY 1 ORDER BY 1
"""


def string_funcs(sf_dir: str) -> pd.DataFrame:
    """Scalar string-function surface (SURVEY 2.8) in one vectorized
    pass: upper, substr, strpos, concat, LIKE, regexp_extract — each a
    single Arrow kernel whose semantics is pinned to the SQL oracle
    (1-based find_substring+1, '' for no regex match, NULL text
    propagates)."""

    def f(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "up3": pc.utf8_upper(pc.utf8_slice_codeunits(txt, 0, 3)),
                # SQL strpos is 1-based in CHARACTERS (0 when absent);
                # Arrow find_substring reports BYTE offsets, which
                # diverges on multibyte text — derive the character
                # position from the length of the pre-match split head
                "pos_e": _strpos_chars(txt, "e"),
                "tagged": pc.binary_join_element_wise(
                    pc.cast(t.column("lang"), pa.string()), txt, ":"
                ),
                "has_the": pc.cast(pc.match_like(txt, "%the%"), pa.int64()),
                "first_word": pc.fill_null(_regexp_extract_first(txt), ""),
            }
        )

    out = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _strpos_chars(txt, needle: str):
    """Character-based 1-indexed first-occurrence position (SQL strpos):
    split once at the needle; a 2-element split means a hit at
    1 + charlen(head), else 0. NULL propagates."""
    lst = pc.split_pattern(txt, needle, max_splits=1)
    hit = pc.equal(pc.list_value_length(lst), 2)
    head_len = pc.utf8_length(pc.list_element(lst, 0))
    return pc.cast(
        pc.if_else(hit, pc.add(head_len, 1), pc.multiply(head_len, 0)), pa.int64()
    )


def _regexp_extract_first(txt: "pa.ChunkedArray") -> "pa.ChunkedArray":
    """regexp_extract(text, '^(\\S+)', 1) — first whitespace-free token
    or '' (DuckDB returns '' on no match but NULL on NULL input; the
    caller's fill_null matches DuckDB only for non-NULL text, so NULL
    text is mapped to '' on the oracle side too)."""
    m = pc.extract_regex(txt, pattern=r"^(?P<w>\S+)")
    return pc.struct_field(m, "w")


STRING_FUNCS_SQL = r"""
SELECT doc_id,
       upper(text[1:3]) AS up3,
       CAST(strpos(text, 'e') AS BIGINT) AS pos_e,
       lang || ':' || text AS tagged,
       CAST(text LIKE '%the%' AS BIGINT) AS has_the,
       coalesce(regexp_extract(text, '^(\S+)', 1), '') AS first_word
FROM documents
ORDER BY doc_id
"""


BLOOM_BITS = 1 << 17  # 16 KiB bitmap — trivially broadcastable


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 finalizer (public-domain constant mix) —
    uint64 in, uint64 out, wrap-around arithmetic throughout."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _bloom_positions(keys: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Two bit positions per key from one splitmix64 pass (low/high
    17-bit slices of independent mix output)."""
    h = _splitmix64(keys.astype(np.uint64))
    mask = np.uint64(BLOOM_BITS - 1)
    return (h & mask, (h >> np.uint64(20)) & mask)


def bloom_join_revenue(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter semi-join pruning in front of a big-big hash join —
    the standard 100 TB shuffle reducer when a join's build side is
    selective but too big to broadcast exactly: BUILDING-segment
    customers are folded into ONE 16 KiB Bloom bitmap (each build block
    emits its own bitmap; the driver ORs the per-block 16 KiB rows —
    the only bytes that cross besides the joined keys), the bitmap is
    broadcast once via ray.put, and orders are pre-filtered by a
    vectorized double-hash probe BEFORE the join exchange, so only
    probable matches pay the shuffle. False positives are then removed
    by an exact in-shard cogroup join (ONE coarse-shard exchange, the
    same tagged-union engine as ``left_join_big_orders``, measured ~3x
    faster than the Dataset.join actor round it replaces at sf0.1) —
    the Bloom stage is a pure bandwidth optimization and the result is
    bit-identical to the plain join (same oracle shape as
    hash_join_revenue, plus the segment filter). The nation-name lookup
    and the per-nation partial aggregate run INSIDE the shard kernel,
    so the final exchange moves O(nations x shards) partial rows.
    """
    from ray.data.aggregate import Sum

    import pyarrow.dataset as pads

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=(pc.field("c_mktsegment") == "BUILDING"),
    )

    def build(t: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
        p1, p2 = _bloom_positions(t.column("c_custkey").to_numpy())
        for p in (p1, p2):
            np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64), np.uint64(1) << (p & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    blk = cust.map_batches(build, batch_format="pyarrow", zero_copy_batch=True).take_all()
    bloom = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    for row in blk:  # O(16 KiB x blocks) driver work — sketch merge, not data
        bloom |= np.frombuffer(row["bits"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        p1, p2 = _bloom_positions(t.column("o_custkey").to_numpy())
        hit = np.ones(t.num_rows, dtype=bool)
        for p in (p1, p2):
            hit &= (bm[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) > 0
        return t.filter(pa.array(hit))

    def order_rows(t: pa.Table) -> pa.Table:
        t = probe(t)
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_nationkey": pa.nulls(len(t), pa.int64()),
                "o_totalprice": t.column("o_totalprice"),
                "is_probe": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    def cust_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "o_totalprice": pa.nulls(len(t), pa.float64()),
                "is_probe": pa.array(np.zeros(len(t), dtype=bool)),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    build_side = cust.map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(columns=["n_nationkey", "n_name"])
    nlut_ref = ray.put(nation.combine_chunks())

    def join_shard(g: pa.Table) -> pa.Table:
        # exact inner join within the shard removes Bloom false
        # positives; the nation lookup + per-nation partial aggregate
        # happen here too, so only (n_name, p_sum, p_n) partials leave
        is_probe = g.column("is_probe")
        left = g.filter(pc.invert(is_probe)).select(["c_custkey", "c_nationkey"])
        right = g.filter(is_probe).select(["c_custkey", "o_totalprice"])
        j = left.join(right, keys=["c_custkey"], join_type="inner")
        lut = ray.get(nlut_ref)
        idx = pc.index_in(
            j.column("c_nationkey").cast(pa.int32()),
            value_set=lut.column("n_nationkey").combine_chunks(),
        )
        # dangling/NULL nation keys drop like the SQL inner join (a
        # None group key would also crash the n_name sort exchange)
        valid = pc.is_valid(idx)
        j = j.filter(valid)
        names = pc.take(lut.column("n_name").combine_chunks(), idx.filter(valid))
        t2 = pa.table({"n_name": names, "o_totalprice": j.column("o_totalprice")})
        g2 = pa.TableGroupBy(t2, ["n_name"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")]  # oracle count(*)
        )
        return g2.rename_columns(["n_name", "p_sum", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    out = (
        shard_map_groups(build_side.union(orders), ["c_custkey"], join_shard)
        .groupby("n_name")
        .aggregate(Sum("p_sum", alias_name="revenue"), Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


BLOOM_JOIN_REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY n_name
"""


def date_funcs(sf_dir: str) -> pd.DataFrame:
    """Temporal scalar-function surface (SURVEY 2.8, the date twin of
    ``string_funcs``): year/month/day, ISO day-of-week, hour,
    microsecond epoch, interval arithmetic (+7 days) and day-boundary
    date_diff to a fixed anchor — one vectorized Arrow temporal pass,
    each kernel pinned to the SQL oracle's exact numbering (isodow
    Mon=1..Sun=7 = Arrow day_of_week(week_start=1, count_from_zero
    =False); epoch_us avoids the negative-timestamp floor-division trap
    fixed for events_windowed; days_between counts day boundaries like
    DuckDB date_diff('day', ...)). NULL ts propagates through every
    kernel on both sides."""
    ANCHOR = pa.scalar(np.datetime64("2024-01-01T00:00:00", "us"), pa.timestamp("us"))
    WEEK_US = np.int64(7 * 86_400_000_000)

    def f(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "y": pc.cast(pc.year(ts), pa.int64()),
                "m": pc.cast(pc.month(ts), pa.int64()),
                "d": pc.cast(pc.day(ts), pa.int64()),
                "isodow": pc.cast(
                    pc.day_of_week(ts, count_from_zero=False, week_start=1), pa.int64()
                ),
                "h": pc.cast(pc.hour(ts), pa.int64()),
                "epoch_us": pc.cast(ts, pa.int64()),
                "plus_week": pc.cast(
                    pc.add(pc.cast(ts, pa.int64()), WEEK_US), pa.timestamp("us")
                ),
                "days_to_anchor": pc.cast(pc.days_between(ts, ANCHOR), pa.int64()),
            }
        )

    out = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


DATE_FUNCS_SQL = """
SELECT event_id,
       CAST(year(ts) AS BIGINT) AS y,
       CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d,
       CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(hour(ts) AS BIGINT) AS h,
       epoch_us(ts) AS epoch_us,
       ts + INTERVAL 7 DAY AS plus_week,
       CAST(date_diff('day', ts, TIMESTAMP '2024-01-01') AS BIGINT) AS days_to_anchor
FROM events
ORDER BY event_id
"""


def unpivot_lineitem(sf_dir: str) -> "ray.data.Dataset":
    """Wide-to-long melt (SQL UNPIVOT), the inverse of events_pivot:
    each lineitem row explodes into one (metric, value) row per measure
    column. Pure streaming map — each batch emits its three stacked
    slices with zero-copy column reuse, no shuffle, output 3x rows.
    The metric column is dictionary-friendly constant runs per slice."""
    MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]

    def melt(t: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_linenumber": pc.cast(t.column("l_linenumber"), pa.int64()),
                    "metric": pa.array([m[2:]] * t.num_rows, pa.string()),
                    "value": t.column(m),
                }
            )
            for m in MEASURES
        ]
        return pa.concat_tables(parts)

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + MEASURES).map_batches(
        melt, batch_format="pyarrow", zero_copy_batch=True
    )


UNPIVOT_LINEITEM_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'discount', l_discount FROM lineitem
"""


def incremental_agg(sf_dir: str) -> pd.DataFrame:
    """Incremental aggregate maintenance — the ingestion-wave pattern a
    standing 100 TB pipeline needs: wave A (even order keys) is
    reduced to a tiny per-group state table of MERGEABLE partials
    (n, sum_qty, sum_rev — the same algebraic state lineitem_agg's
    combiner uses); when wave B (odd keys) arrives, ONLY wave B is
    scanned and its partials are merged into the saved state with a
    vectorized outer add — wave A's data is never re-read. The merged
    state finalizes to exactly the full-scan answer, so the oracle is
    lineitem_agg's own SQL over the whole table (proving the delta
    merge loses nothing). In production the state table is the
    partitioned-parquet manifest of prior waves; here both waves run
    in one call over predicate-pushed reads of the shared table."""
    from ray.data.aggregate import Sum

    def partials_for(parity: int) -> pd.DataFrame:
        def partial(t: pa.Table) -> pa.Table:
            t = t.append_column("rev", _rev_units(t))  # exact integer units
            g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
                [("l_quantity", "sum"), ("rev", "sum"), ([], "count_all")]  # oracle count(*)
            )
            return g.rename_columns(["l_returnflag", "l_linestatus", "p_qty", "p_rev", "p_n"])

        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
            filter=(pc.bit_wise_and(pc.field("l_orderkey"), 1) == parity),
        ).drop_columns(["l_orderkey"])
        return (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(
                Sum("p_qty", alias_name="sum_qty"),
                Sum("p_rev", alias_name="sum_rev"),
                Sum("p_n", alias_name="n_rows"),
            )
            .to_pandas()
        )

    state = partials_for(0)          # wave A: persisted mergeable state
    delta = partials_for(1)          # wave B: the only data scanned "today"
    keys = ["l_returnflag", "l_linestatus"]
    merged = (
        pd.concat([state, delta], ignore_index=True)
        .groupby(keys, as_index=False)[["sum_qty", "sum_rev", "n_rows"]]
        .sum()
    )
    merged["sum_qty"] = merged["sum_qty"].round(2)
    merged["sum_rev"] = _units_to_currency(merged["sum_rev"])
    merged["n_rows"] = merged["n_rows"].astype("int64")
    return merged.sort_values(keys).reset_index(drop=True)


def global_rank(sf_dir: str) -> "ray.data.Dataset":
    """Global total-order row numbering (SQL row_number() OVER (ORDER
    BY ts, event_id) with no partition) — the distributed primitive
    behind contiguous global IDs, pagination, and rank-based splits.

    Two-pass range-partition shape, no driver materialization of data:
    pass 1 reduces each batch to per-bucket COUNTS (bucket = hour(ts),
    a MONOTONE function of the sort key, so bucket order == key order)
    and the driver turns the tiny bucket histogram into exclusive
    prefix offsets, broadcast once; pass 2 is ONE hash shuffle of
    (event_id, ts) — 16 B/row — where each bucket group sorts locally
    and adds its offset. Correct because ranks within a bucket are
    local order + the count of everything in lower buckets. The
    per-worker bound is one bucket's rows (hour-width here; a sampled
    quantile splitter replaces the fixed width when key density is
    unknown). NULL ts rows are excluded on both sides (a total order
    over NULL keys is undefined)."""
    US_H = 3_600_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"],
        filter=pc.is_valid(pc.field("ts")),
    )

    def bucket_counts(t: pa.Table) -> pa.Table:
        b = np.floor_divide(t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False), US_H)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "p_n": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(bucket_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # O(buckets) rows — the histogram, not the data
        .sort_values("bucket")
    )
    off = dict(zip(hist["bucket"], np.cumsum(hist["n"].to_numpy()) - hist["n"].to_numpy()))
    off_ref = ray.put(off)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.floor_divide(t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False), US_H)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def rank_group(g: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        base = offs[int(g.column("bucket")[0].as_py())]
        rnk = np.empty(len(eid), dtype=np.int64)
        rnk[order] = base + 1 + np.arange(len(eid))
        return pa.table({"event_id": pa.array(eid, pa.int64()), "rnk": pa.array(rnk, pa.int64())})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
    )


GLOBAL_RANK_SQL = """
SELECT event_id, CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rnk
FROM events WHERE ts IS NOT NULL
"""


def profile_events(sf_dir: str) -> pd.DataFrame:
    """Column profiler (the engine's ANALYZE): per column of events —
    non-missing count, missing count, exact COUNT DISTINCT, numeric
    min/max (NULL for varchar columns; ts as epoch_us). Declared
    missing-ness: NULL everywhere, and valid NaN doubles are profiled
    as missing too (the engine's NaN-as-missing convention, stated in
    the oracle with isnan()->NULL).

    Scale shape, two exchanges total for ALL columns: (1) each batch
    emits ONE (col, n, n_null, min, max) partial row per column —
    O(cols x blocks) — merged by a tiny groupby; (2) each batch emits
    its DISTINCT (col, value-as-string) pairs (the string repr is
    engine-internal, only distinctness matters), so the count-distinct
    shuffle moves per-batch-distinct pairs, pre-combined the same way
    as distinct_users_per_type."""
    from ray.data.aggregate import Max, Min, Sum

    NUM = {"event_id": "i", "user_id": "i", "value": "f", "ts": "t"}
    COLS = ["event_id", "user_id", "event_type", "value", "ts", "props"]

    def _clean_np(t: pa.Table, c: str):
        a = t.column(c)
        if NUM.get(c) == "t":
            a = a.cast(pa.int64())
        v = a.to_numpy(zero_copy_only=False)
        if NUM.get(c) == "f":
            m = ~pd.isna(v)
        else:
            m = pd.notna(v)
        return v[m]

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in COLS:
            v = _clean_np(t, c)
            n = len(v)
            if c in NUM and n:
                mn, mx = float(np.min(v)), float(np.max(v))
            else:
                mn, mx = np.inf, -np.inf
            rows.append((c, n, t.num_rows - n, mn, mx))
        cols = list(zip(*rows))
        return pa.table(
            {
                "col": pa.array(cols[0], pa.string()),
                "p_n": pa.array(cols[1], pa.int64()),
                "p_null": pa.array(cols[2], pa.int64()),
                "p_min": pa.array(cols[3], pa.float64()),
                "p_max": pa.array(cols[4], pa.float64()),
            }
        )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # all-Arrow: pc.unique on a string cast — the earlier numpy
        # astype(str) + tolist() built one Python object per distinct
        # value (measured 10.7 s -> 6.0 s for this leg at sf0.1).
        # Only injectivity of the repr matters, not its format.
        parts = []
        for c in COLS:
            a = t.column(c)
            if NUM.get(c) == "t":
                a = a.cast(pa.int64())
            if NUM.get(c) == "f":
                a = a.filter(
                    pc.and_(pc.is_valid(a), pc.invert(pc.is_nan(pc.fill_null(a, 0.0))))
                )
            else:
                a = a.drop_null()
            u = pc.unique(pc.cast(a, pa.string()))
            parts.append(pa.table({"col": pa.array([c] * len(u), pa.string()), "v": u}))
        return pa.concat_tables(parts)

    ds = _read(sf_dir, "events", COLS)
    stats = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("p_n", alias_name="n_vals"),
            Sum("p_null", alias_name="n_null"),
            Min("p_min", alias_name="min_d"),
            Max("p_max", alias_name="max_d"),
        )
        .to_pandas()
    )
    # coarse-shard distinct (stages/agg.py): event_id alone is ~1M
    # distinct (col, v) groups at sf0.1 — one vectorized in-shard
    # distinct+count replaces Ray's per-group sort-aggregate reduce
    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    def shard_distinct(g: pa.Table) -> pa.Table:
        d = pa.TableGroupBy(g, ["col", "v"]).aggregate([([], "count_all")])
        out = pa.TableGroupBy(d.select(["col"]), ["col"]).aggregate([([], "count_all")])
        return out.rename_columns(["col", "p_distinct"])

    uniq = (
        shard_map_groups(
            ds.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True),
            ["col", "v"],
            shard_distinct,
        )
        .to_pandas()
        .groupby("col", as_index=False)["p_distinct"]
        .sum()
        .rename(columns={"p_distinct": "n_distinct"})
    )
    out = stats.merge(uniq, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out.loc[~out["col"].isin(NUM), ["min_d", "max_d"]] = np.nan
    out.loc[out["n_vals"] == 0, ["min_d", "max_d"]] = np.nan
    for c in ("n_vals", "n_null"):
        out[c] = out[c].astype("int64")
    return (
        out[["col", "n_vals", "n_null", "n_distinct", "min_d", "max_d"]]
        .sort_values("col")
        .reset_index(drop=True)
    )


PROFILE_EVENTS_SQL = """
WITH v AS (SELECT CASE WHEN isnan(value) THEN NULL ELSE value END AS value FROM events)
SELECT 'event_id' AS col, count(event_id) AS n_vals, count(*) - count(event_id) AS n_null,
       count(DISTINCT event_id) AS n_distinct,
       CAST(min(event_id) AS DOUBLE) AS min_d, CAST(max(event_id) AS DOUBLE) AS max_d FROM events
UNION ALL
SELECT 'user_id', count(user_id), count(*) - count(user_id), count(DISTINCT user_id),
       CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE) FROM events
UNION ALL
SELECT 'event_type', count(event_type), count(*) - count(event_type), count(DISTINCT event_type),
       NULL, NULL FROM events
UNION ALL
SELECT 'value', count(value), count(*) - count(value), count(DISTINCT value),
       min(value), max(value) FROM v
UNION ALL
SELECT 'ts', count(ts), count(*) - count(ts), count(DISTINCT ts),
       CAST(epoch_us(min(ts)) AS DOUBLE), CAST(epoch_us(max(ts)) AS DOUBLE) FROM events
UNION ALL
SELECT 'props', count(props), count(*) - count(props), count(DISTINCT props),
       NULL, NULL FROM events
ORDER BY col
"""


def value_quartiles(sf_dir: str) -> "ray.data.Dataset":
    """Global ntile(4) labels over the (value, event_id) total order —
    the quantile-bucket assignment behind stratified splits and
    outlier tiers. Reuses global_rank's monotone-bucket two-pass shape
    keyed on value (bucket = floor(value), monotone): the tiny bucket
    histogram gives both the exclusive prefix offsets AND the global n
    that SQL ntile needs (first n%4 tiles get one extra row), then ONE
    shuffle ranks each bucket locally and maps rank -> tile with the
    exact ntile arithmetic. NULL and valid-NaN values are excluded
    (NaN-as-missing, declared in the oracle)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"],
        filter=pc.is_valid(pc.field("value")),
    )

    def drop_nan(t: pa.Table) -> pa.Table:
        v = t.column("value")
        return t.filter(pc.invert(pc.is_nan(v)))

    ds = ds.map_batches(drop_nan, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_counts(t: pa.Table) -> pa.Table:
        b = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "p_n": pa.array(cnt, pa.int64())})

    hist = (
        ds.map_batches(bucket_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    n_total = int(hist["n"].sum())
    off = dict(zip(hist["bucket"], np.cumsum(hist["n"].to_numpy()) - hist["n"].to_numpy()))
    off_ref = ray.put((off, n_total))

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def tile_group(g: pa.Table) -> pa.Table:
        offs, n = ray.get(off_ref)
        v = g.column("value").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, v))
        r = np.empty(len(eid), dtype=np.int64)  # 0-based global rank
        r[order] = offs[int(g.column("bucket")[0].as_py())] + np.arange(len(eid))
        base, rem = divmod(n, 4)
        pivot = rem * (base + 1)
        tile = np.where(r < pivot, r // (base + 1), rem + (r - pivot) // base if base else 0) + 1
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "quartile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(tile_group, batch_format="pyarrow")
    )


VALUE_QUARTILES_SQL = """
SELECT event_id, CAST(ntile(4) OVER (ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events WHERE value IS NOT NULL AND NOT isnan(value)
"""


def orders_above_cust_avg(sf_dir: str) -> "ray.data.Dataset":
    """Correlated-scalar-subquery shape (orders priced above THEIR
    customer's average) as a distributed plan: ONE hash shuffle on
    o_custkey, then a per-group vectorized compare against the group
    mean — no second scan, no broadcast of a per-key aggregate table,
    because the co-grouped rows already hold everything the correlated
    predicate needs. The SQL oracle states it with a window AVG
    partitioned by the same key. Output: qualifying (o_orderkey,
    o_custkey, o_totalprice)."""

    def above_avg(g: pa.Table) -> pa.Table:
        # SQL semantics under NULLs (fuzz catch): the window avg IGNORES
        # NULL prices, a NULL price never satisfies `> a`, and the NULL
        # customer partition is a group of its own — rows selected with
        # Arrow take so NULL keys survive the output unchanged.
        price = g.column("o_totalprice")
        pv = pc.is_valid(price).to_numpy(zero_copy_only=False)
        v = price.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        m = v[pv].mean() if pv.any() else np.nan
        keep = pv & (v > m)
        return g.select(["o_orderkey", "o_custkey", "o_totalprice"]).take(
            pa.array(np.flatnonzero(keep), pa.int64())
        )

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .groupby("o_custkey")
        .map_groups(above_avg, batch_format="pyarrow")
    )


ORDERS_ABOVE_CUST_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS a
  FROM orders
) WHERE o_totalprice > a
"""


# --- key-skew profiler --------------------------------------------------------


def key_skew_profile(sf_dir: str) -> pd.DataFrame:
    """Distribution profile of the user_id group sizes — the planning
    query behind every salting/bucketing decision (SCALE.md §§10-11):
    how many keys, how big is the largest reduce group, how heavy the
    tail. Two tiny reductions: per-batch partial counts pre-combine the
    per-key sizes (the shuffle moves O(keys x blocks) pairs), then the
    size column itself collapses to one moments row per batch so the
    final exchange is O(blocks)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        # arrow group_by keeps NULL as ONE key (SQL GROUP BY semantics);
        # np.unique would turn each NULL into a distinct float NaN and
        # then fail the int64 cast.
        g = t.select(["user_id"]).group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "p_n"])

    sizes = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("p_n", alias_name="n"))
    )

    def moments(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "k": pa.array([len(n)], pa.int64()),
                "s": pa.array([n.sum()], pa.float64()),
                "s2": pa.array([(n * n).sum()], pa.float64()),
                "mn": pa.array([n.min()], pa.float64()),
                "mx": pa.array([n.max()], pa.float64()),
            }
        )

    m = sizes.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    k = int(m["k"].sum())
    s, s2 = float(m["s"].sum()), float(m["s2"].sum())
    var = (s2 - s * s / k) / (k - 1) if k > 1 else float("nan")
    return pd.DataFrame(
        {
            "n_keys": pd.Series([k], dtype="int64"),
            "n_rows": pd.Series([int(s)], dtype="int64"),
            "min_n": pd.Series([int(m["mn"].min())], dtype="int64"),
            "max_n": pd.Series([int(m["mx"].max())], dtype="int64"),
            "avg_n": [round(s / k, 6)],
            "sd_n": [round(var**0.5, 6)],
        }
    )


KEY_SKEW_PROFILE_SQL = """
WITH g AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(min(n) AS BIGINT) AS min_n,
       CAST(max(n) AS BIGINT) AS max_n,
       round(avg(n), 6) AS avg_n,
       round(stddev_samp(n), 6) AS sd_n
FROM g
"""


# --- IQR outlier filter --------------------------------------------------------


def _percentile_cont_values(
    sf_dir: str, probs: list[float], extra_filter=None
) -> tuple[dict[float, float], int]:
    """Exact INTERPOLATED percentiles (percentile_cont semantics,
    h = (n-1)*q) of events.value without a global sort — the shared
    engine behind `outlier_filter`, `winsorize_events` and
    `value_drift_psi`.

    Two streaming passes: (1) a floor(value) unit-bucket histogram
    (O(value-range) rows) locates which buckets hold the order
    statistics around each h and gives their exclusive prefix offsets;
    (2) a predicate-pushdown re-read of ONLY those buckets sorts a tiny
    slice locally and interpolates with the exact float expression the
    oracle uses. NULL and NaN excluded (NaN-as-missing).
    ``extra_filter``: optional pushed-down predicate restricting the
    population (e.g. a time slice). Returns ({prob: value}, n);
    n == 0 means no valid rows."""
    from ray.data.aggregate import Sum

    base_filter = pc.is_valid(pc.field("value"))
    if extra_filter is not None:
        base_filter = base_filter & extra_filter

    def drop_nan(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_nan(t.column("value"))))

    def bucket_counts(t: pa.Table) -> pa.Table:
        b = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "p_n": pa.array(cnt, pa.int64())})

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"], filter=base_filter)
        .map_batches(drop_nan, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucket_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    n = int(hist["n"].sum())
    if n == 0:
        return {}, 0
    cum = np.cumsum(hist["n"].to_numpy())
    starts = cum - hist["n"].to_numpy()  # exclusive prefix per bucket
    buckets = hist["bucket"].to_numpy()

    def order_stats(ranks: list[int]) -> dict[int, float]:
        """Exact order statistics at the given 0-based global ranks via
        one pruned read of only the buckets that contain them."""
        need = sorted(set(min(r, n - 1) for r in ranks))
        bidx = np.searchsorted(cum, np.array(need), side="right")
        want = sorted(set(int(buckets[i]) for i in bidx))
        inb = None
        for b in want:
            cond = (pc.field("value") >= float(b)) & (pc.field("value") < float(b + 1))
            inb = cond if inb is None else (inb | cond)
        slice_df = (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet", columns=["value"], filter=base_filter & inb
            )
            .map_batches(drop_nan, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        out: dict[int, float] = {}
        for b in want:
            inbucket = np.sort(
                slice_df["value"].to_numpy()[
                    (slice_df["value"].to_numpy() >= b) & (slice_df["value"].to_numpy() < b + 1)
                ]
            )
            off = int(starts[np.searchsorted(buckets, b)])
            for r in need:
                if off <= r < off + len(inbucket):
                    out[r] = float(inbucket[r - off])
        return out

    hs = {p: (n - 1) * p for p in probs}
    ranks: list[int] = []
    for h in hs.values():
        low = int(np.floor(h))
        ranks += [low, low + 1]
    vals = order_stats(ranks)
    out: dict[float, float] = {}
    for p, h in hs.items():
        low = int(np.floor(h))
        out[p] = vals[low] + (h - low) * (vals[min(low + 1, n - 1)] - vals[low])
    return out, n


def outlier_filter(sf_dir: str) -> "ray.data.Dataset":
    """Tukey-fence outlier detection over the global value distribution:
    rows outside [q1 - 1.5*IQR, q3 + 1.5*IQR] with INTERPOLATED
    quartiles via the shared no-global-sort percentile engine
    (_percentile_cont_values), then ONE vectorized filter pass."""
    base_filter = pc.is_valid(pc.field("value"))
    qs, n = _percentile_cont_values(sf_dir, [0.25, 0.75])
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"event_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())})
        )
    q1, q3 = qs[0.25], qs[0.75]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)

    def pick(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) & ((v < lo) | (v > hi))
        return pa.table(
            {
                "event_id": pa.array(t.column("event_id").to_numpy(zero_copy_only=False)[keep], pa.int64()),
                "value": pa.array(v[keep], pa.float64()),
            }
        )

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "value"], filter=base_filter
        )
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    # schema-pin: Ray's to_pandas() drops the column schema of an empty
    # Dataset, and "no outliers" is a legitimate result
    if not len(out.columns):
        out = pd.DataFrame(
            {"event_id": pd.Series(dtype="int64"), "value": pd.Series(dtype="float64")}
        )
    return out


OUTLIER_FILTER_SQL = """
WITH f AS (SELECT event_id, value FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
             percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
      FROM f)
SELECT event_id, value FROM f, s
WHERE value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1)
"""


# --- NULL-handling scalar surface ---------------------------------------------


def null_funcs(sf_dir: str) -> "ray.data.Dataset":
    """COALESCE / NULLIF / CASE over the messy `value` column — the
    NULL-vs-NaN branch surface every SQL engine trips on somewhere.
    Pure streaming map, one vectorized Arrow pass; the CASE ladder is
    nested if_else with the NULL test FIRST (a NaN test on a NULL slot
    is NULL, not false — order matters and is pinned by the oracle)."""

    def f(t: pa.Table) -> pa.Table:
        v = t.column("value")
        et = t.column("event_type")
        isnull = pc.is_null(v)
        isnan = pc.is_nan(pc.fill_null(v, 0.0))
        band = pc.if_else(
            isnull,
            pa.scalar("missing", pa.string()),
            pc.if_else(
                isnan,
                pa.scalar("nan", pa.string()),
                pc.if_else(
                    pc.greater(pc.fill_null(v, 0.0), 50.0),
                    pa.scalar("high", pa.string()),
                    pa.scalar("low", pa.string()),
                ),
            ),
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "v_coalesce": pc.fill_null(v, -1.0),
                "et_nullif": pc.if_else(
                    pc.equal(et, "view"), pa.scalar(None, pa.string()), et
                ),
                "v_band": band,
            }
        )

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


NULL_FUNCS_SQL = """
SELECT event_id,
       coalesce(value, -1.0) AS v_coalesce,
       nullif(event_type, 'view') AS et_nullif,
       CASE WHEN value IS NULL THEN 'missing'
            WHEN isnan(value) THEN 'nan'
            WHEN value > 50.0 THEN 'high'
            ELSE 'low' END AS v_band
FROM events
"""


# --- session statistics rollup ---------------------------------------------


def session_stats(sf_dir: str) -> pd.DataFrame:
    """Composition over gap-based sessionization: global statistics of
    the per-session (event count, duration) distribution — the query
    behind 'how long is a user session'. Same per-user hash shuffle as
    events_sessionized, but each group emits per-session partials
    (n_events, dur_us), which then collapse batch-locally to moment
    rows so the final exchange is O(blocks)."""
    GAP_US = 30 * 60 * 1_000_000

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow shard kernel (many whole users per shard): user-run
        # boundaries are validity-aware so NULL users form ONE SQL-style
        # partition; a session starts at a user boundary or a >30min gap,
        # and within a session ts is sorted, so duration is a boundary
        # pick — no per-group Python.
        from bank_statement_pdf_parser_ray.pipelines.windows import _sorted_shard, _uid_runs

        if g.num_rows == 0:
            return pa.table(
                {"n_events": pa.array([], pa.int64()), "dur_us": pa.array([], pa.int64())}
            )
        g = _sorted_shard(g)
        first_u, _ = _uid_runs(g.column("user_id"))
        ts_valid = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts_us = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = len(ts_us)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = GAP_US + 1
        gap[1:] = ts_us[1:] - ts_us[:-1]
        # same lag-IS-NULL convention as events_sessionized: a NULL-ts
        # row continues the previous session; every NULL-ts row AFTER
        # one opens its own
        prev_valid = np.concatenate(([False], ts_valid[:-1]))
        new_sess = first_u | ~prev_valid | (prev_valid & ts_valid & (gap > GAP_US))
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n)
        counts = ends - starts
        # SQL min/max(ts) ignore NULL: duration spans the session's
        # VALID timestamps; an all-NULL session has NULL duration
        # (excluded from the sum, still counted as a session)
        lo = np.minimum.reduceat(np.where(ts_valid, ts_us, np.iinfo(np.int64).max), starts)
        hi = np.maximum.reduceat(np.where(ts_valid, ts_us, np.iinfo(np.int64).min), starts)
        nvalid = np.add.reduceat(ts_valid.astype(np.int64), starts)
        dur = np.where(nvalid > 0, (hi - lo).astype(np.float64), np.nan)
        return pa.table(
            {
                "n_events": pa.array(counts, pa.int64()),
                "dur_us": pa.array(dur, pa.float64(), mask=nvalid == 0),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    per_sess = shard_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]), ["user_id"], sessions
    )

    def moments(t: pa.Table) -> pa.Table:
        n = t.column("n_events").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("dur_us").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "k": pa.array([len(n)], pa.int64()),
                "sn": pa.array([n.sum()], pa.float64()),
                "mx": pa.array([n.max() if len(n) else 0.0], pa.float64()),
                # SQL sum() skips the NULL durations of all-NULL-ts sessions
                "sd": pa.array([np.nansum(d)], pa.float64()),
            }
        )

    m = per_sess.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    k = int(m["k"].sum())
    return pd.DataFrame(
        {
            "n_sessions": pd.Series([k], dtype="int64"),
            # +1e-9 pushes exact-decimal .5 ties off the round boundary
            # (Python rounds half-even on the decimal repr, DuckDB half
            # away) — the module's EWMA convention, applied on BOTH sides
            "avg_events": [round(float(m["sn"].sum()) / k + 1e-9, 6)],
            "max_events": pd.Series([int(m["mx"].max())], dtype="int64"),
            "avg_dur_sec": [round(float(m["sd"].sum()) / k / 1000000.0 + 1e-9, 6)],
        }
    )


SESSION_STATS_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per AS (
  SELECT user_id, session_id, count(*) AS n_events,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sess GROUP BY user_id, session_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       round(CAST(sum(n_events) AS DOUBLE) / count(*) + 1e-9, 6) AS avg_events,
       CAST(max(n_events) AS BIGINT) AS max_events,
       round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1000000.0 + 1e-9, 6) AS avg_dur_sec
FROM per
"""


# --- skyline (Pareto frontier) ------------------------------------------------


def _skyline_cut(t: pa.Table) -> pa.Table:
    """Non-dominated rows of one block under (o_totalprice MAX,
    o_orderdate MAX). Vectorized: sort by (price desc, date desc),
    then per distinct price the group's max-date rows survive iff that
    date strictly beats every higher-price date (a running max over
    the sorted groups). Equal points never dominate each other, so
    duplicated frontier points all survive — exactly the SQL NOT
    EXISTS semantics."""
    if t.num_rows == 0:
        return t
    p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
    d = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((-d, -p))
    ps, ds = p[order], d[order]
    new_p = np.ones(len(ps), dtype=bool)
    new_p[1:] = ps[1:] != ps[:-1]
    grp = np.cumsum(new_p) - 1  # group index per row, by distinct price
    dmax = ds[new_p]  # first row of each group = its max date (sort order)
    # best date over all strictly-higher-price groups (exclusive running max)
    best_prev = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(dmax)[:-1]))
    keep = (ds == dmax[grp]) & (dmax[grp] > best_prev[grp])
    return t.take(pa.array(order[keep], pa.int64()))


def skyline_orders(sf_dir: str) -> "ray.data.Dataset":
    """Skyline / Pareto frontier of orders under (o_totalprice MAX,
    o_orderdate MAX) — "no other order is both at least as expensive
    and at least as recent, and strictly better in one" (Börzsönyi
    et al. 2001, "The Skyline Operator").

    Scale shape: local skyline per block is a CORRECT combiner
    (dominance is transitive, so a globally non-dominated row is
    non-dominated in its block), so each block first collapses to its
    own frontier; survivors — frontier-sized, not input-sized — meet
    in one final single-partition pass of the same kernel. No driver
    materialization. NULL-dimension rows are excluded on both sides
    (SQL three-valued NOT EXISTS would vacuously keep them)."""
    flt = pc.is_valid(pc.field("o_totalprice")) & pc.is_valid(pc.field("o_orderdate"))
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
        filter=flt,
    )
    partial = ds.map_batches(_skyline_cut, batch_format="pyarrow", zero_copy_batch=True)
    return partial.repartition(1).map_batches(
        _skyline_cut, batch_format="pyarrow", zero_copy_batch=True
    )


SKYLINE_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL AND NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_totalprice IS NOT NULL AND b.o_orderdate IS NOT NULL
    AND b.o_totalprice >= o.o_totalprice AND b.o_orderdate >= o.o_orderdate
    AND (b.o_totalprice > o.o_totalprice OR b.o_orderdate > o.o_orderdate)
)
"""


# --- TPC-H Q3-shaped three-way join --------------------------------------------

Q3_CUTOFF_US = 915_148_800_000_000  # 1999-01-01, mid-range of the synthetic dates


def q3_shipping(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H-Q3-shaped shipping-priority query: top-k unshipped-revenue
    orders for one market segment — the canonical SELECTIVE three-way
    join (customer ⋈ orders ⋈ lineitem) with predicates on all three
    tables.

    Plan, in 100 TB order of operations: (1) the BUILDING customer key
    set is small after its filter — broadcast it once (ray.put of a
    sorted int64 array, np.searchsorted probe) to pre-filter orders
    WITHOUT a shuffle; (2) the surviving orders ⋈ lineitem pair is the
    genuine big-big exchange — ONE coarse-shard cogroup on orderkey
    (stages/agg.py; an orderkey's rows all land in one shard, so the
    in-shard Arrow join + per-order revenue sum are globally complete);
    (3) each shard cuts to its own top-k, so the driver merges at most
    n_shards x k candidate rows. Revenue pre-aggregates per lineitem
    batch before the exchange; predicates are pushed into every parquet
    read."""
    import pyarrow.dataset as pads

    ckeys = (
        pads.dataset(f"{sf_dir}/customer.parquet")
        .to_table(columns=["c_custkey"], filter=pc.field("c_mktsegment") == "BUILDING")
        .column("c_custkey")
        .to_numpy()
    )
    ckeys_ref = ray.put(np.sort(ckeys))

    cutoff = pa.scalar(Q3_CUTOFF_US, pa.timestamp("us"))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cutoff,
    )

    def in_segment(t: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ck)
        return t.filter(pa.array(hit)).drop_columns(["o_custkey"])

    orders = orders.map_batches(in_segment, batch_format="pyarrow", zero_copy_batch=True)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cutoff,
    )

    def li_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"l_orderkey": t.column("l_orderkey"), "rev": _rev_units(t)}),
            ["l_orderkey"],
        ).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "p_rev"])

    li = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "p_rev": pa.nulls(len(t), pa.float64()),
                "is_probe": pa.array(np.zeros(len(t), dtype=bool)),
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_orderdate": pa.nulls(len(t), pa.timestamp("us")),
                "p_rev": t.column("p_rev"),
                "is_probe": pa.array(np.ones(len(t), dtype=bool)),
            }
        )

    orders = orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    li = li.map_batches(li_rows, batch_format="pyarrow", zero_copy_batch=True)

    def q3_shard(g: pa.Table) -> pa.Table:
        # every row of an orderkey is in this shard, so the join, the
        # per-order revenue sum AND the top-k cut are all final here
        is_probe = g.column("is_probe")
        o = g.filter(pc.invert(is_probe)).select(["l_orderkey", "o_orderdate"])
        l = g.filter(is_probe).select(["l_orderkey", "p_rev"])
        j = o.join(l, keys=["l_orderkey"], join_type="inner")
        g2 = pa.TableGroupBy(j, ["l_orderkey", "o_orderdate"]).aggregate([("p_rev", "sum")])
        g2 = g2.rename_columns(["l_orderkey", "o_orderdate", "revenue"])
        # exact integer units -> 2-decimal currency BEFORE the ranking
        # cut, so revenue ties (and the top-k boundary) are decided on
        # the same cents the oracle ranks on
        rev = _units_to_currency(g2.column("revenue").to_numpy(zero_copy_only=False))
        g2 = g2.set_column(2, "revenue", pa.array(rev, pa.float64()))
        od = g2.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        okey = g2.column("l_orderkey").to_numpy(zero_copy_only=False)
        top = np.lexsort((okey, od, -rev))[:k]
        return g2.take(pa.array(np.sort(top)))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    out = shard_map_groups(orders.union(li), ["l_orderkey"], q3_shard).to_pandas()
    if "revenue" not in out.columns:  # zero qualifying rows: schema-less empty
        return pd.DataFrame(
            {
                "l_orderkey": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "revenue": pd.Series([], dtype=float),
            }
        )
    out = out.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).head(k)
    return out.reset_index(drop=True)


Q3_SHIPPING_SQL = f"""
SELECT l_orderkey, o_orderdate, {_REV_SUM_SQL} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def cross_join_sweep(sf_dir: str) -> pd.DataFrame:
    """CROSS JOIN as a broadcast nested-loop: a literal parameter table
    (5 price thresholds) joined against every `orders` row — the
    parameter-sweep shape (sensitivity analysis, grid search) where the
    small side has no join key at all.

    Plan: the small side is a constant list compiled into the batch fn
    (the degenerate broadcast); each batch answers ALL thresholds from
    ONE np.sort + np.searchsorted + suffix-cumsum — O(n log n + k) per
    batch instead of the k*n the naive replicated cross join pays — and
    emits k partial rows. The exchange moves O(k x blocks) rows; the
    orders stream never replicates and never shuffles. NaN/NULL prices
    are excluded on both sides (DuckDB compares NaN greater than
    everything, so `>=` semantics would otherwise diverge)."""
    from ray.data.aggregate import Sum

    thresholds = [500.0, 1_000.0, 5_000.0, 10_000.0, 50_000.0]

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice")
        v = v.filter(pc.and_(pc.is_valid(v), pc.is_finite(pc.fill_null(v, 0.0))))
        x = np.sort(v.to_numpy(zero_copy_only=False))
        # suffix sums: total of all prices at-or-after each sorted slot
        suffix = np.concatenate((np.cumsum(x[::-1])[::-1], [0.0]))
        pos = np.searchsorted(x, np.asarray(thresholds), side="left")
        return pa.table(
            {
                "thr": pa.array(thresholds, pa.float64()),
                "p_n": pa.array((len(x) - pos).astype("int64"), pa.int64()),
                "p_sum": pa.array(suffix[pos], pa.float64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        ds.groupby("thr")
        .aggregate(Sum("p_n", alias_name="n_orders"), Sum("p_sum", alias_name="sum_price"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_price"] = out["sum_price"].round(2)
    return out


CROSS_JOIN_SWEEP_SQL = """
SELECT thr,
       CAST(count(*) FILTER (WHERE o_totalprice >= thr) AS BIGINT)      AS n_orders,
       round(sum(o_totalprice) FILTER (WHERE o_totalprice >= thr), 2)   AS sum_price
FROM (SELECT o_totalprice FROM orders
      WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)) o
CROSS JOIN (SELECT unnest([500.0, 1000.0, 5000.0, 10000.0, 50000.0]) AS thr) t
GROUP BY thr
"""


def merge_upsert(sf_dir: str) -> "ray.data.Dataset":
    """MERGE INTO — the lakehouse CDC apply: a delta stream of
    update / delete / insert ops merged into a base snapshot in ONE
    key-hash exchange (the row-level companion to the aggregate-level
    ``incremental_agg``). Base = orders before 1997; the delta is
    derived deterministically from orders itself (price updates for
    keys ≡0 mod 7, deletes for keys ≡1 mod 13, inserts under shifted
    keys for keys ≡3 mod 101), so the job is reproducible and the
    oracle can state the same delta in SQL.

    Shape: ONE pruned read of orders feeds both legs (in a real CDC
    job base and delta are distinct streams; here both derive from the
    same table, so a second scan would just re-read the same bytes) —
    each batch emits its tagged base slice (pre-1997, one vectorized
    filter) concatenated with its derived delta ops, then a
    coarse-shard cogroup on the order key (stages/agg.py) holds
    every key's base row and delta op in one shard; the MERGE decision
    table (matched+U -> update, matched+D -> drop, unmatched+I ->
    insert, anything else -> no-op) is applied with vectorized
    ``pc.index_in`` probes — no Python per-key work, and the exchange
    moves exactly one 17-byte row per base/delta record. At 100 TB the
    delta is normally << base, which is why MERGE-by-shuffle beats a
    full rewrite: only shards containing delta keys do more than a
    copy. The update arithmetic is an exact double add (+1000.0), so
    engine and oracle cannot diverge on rounding."""
    import numpy as np

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    cutoff = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def base_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), cutoff))
        return pa.table(
            {
                "okey": t.column("o_orderkey"),
                "price": t.column("o_totalprice"),
                "op": pa.nulls(t.num_rows, pa.string()),
            }
        )

    def delta_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey")
        p = t.column("o_totalprice")
        # arrow has no modulo kernel: k % m == k - (k // m) * m for non-negative keys
        mod7 = pc.subtract(k, pc.multiply(pc.divide(k, 7), 7))
        mod13 = pc.subtract(k, pc.multiply(pc.divide(k, 13), 13))
        mod101 = pc.subtract(k, pc.multiply(pc.divide(k, 101), 101))
        is_u = pc.and_(pc.equal(mod7, 0), pc.not_equal(mod13, 1))
        is_d = pc.equal(mod13, 1)
        is_i = pc.equal(mod101, 3)
        u = pa.table(
            {
                "okey": k.filter(is_u),
                "price": pc.add(p.filter(is_u), 1000.0),
                "op": pa.array(["U"] * pc.sum(pc.cast(is_u, pa.int64())).as_py(), pa.string()),
            }
        )
        d = pa.table(
            {
                "okey": k.filter(is_d),
                "price": pa.nulls(pc.sum(pc.cast(is_d, pa.int64())).as_py(), pa.float64()),
                "op": pa.array(["D"] * pc.sum(pc.cast(is_d, pa.int64())).as_py(), pa.string()),
            }
        )
        i = pa.table(
            {
                "okey": pc.add(k.filter(is_i), 100_000_000),
                "price": p.filter(is_i),
                "op": pa.array(["I"] * pc.sum(pc.cast(is_i, pa.int64())).as_py(), pa.string()),
            }
        )
        return pa.concat_tables([u, d, i])

    def both_legs(t: pa.Table) -> pa.Table:
        return pa.concat_tables([base_rows(t), delta_rows(t)])

    tagged = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(both_legs, batch_format="pyarrow", zero_copy_batch=True)

    def apply_merge(g: pa.Table) -> pa.Table:
        is_delta = pc.is_valid(g.column("op"))
        b = g.filter(pc.invert(is_delta))
        d = g.filter(is_delta)
        if d.num_rows == 0:
            return pa.table({"o_orderkey": b.column("okey"), "o_totalprice": b.column("price")})
        dk = d.column("okey").combine_chunks()
        idx = pc.index_in(b.column("okey"), value_set=dk)
        op_b = pc.take(d.column("op"), idx)  # null where the key has no delta
        upd = pc.fill_null(pc.equal(op_b, "U"), False)
        price = pc.if_else(upd, pc.take(d.column("price"), idx), b.column("price"))
        keep = pc.fill_null(pc.not_equal(op_b, "D"), True)
        kept = pa.table({"o_orderkey": b.column("okey"), "o_totalprice": price}).filter(keep)
        ins_mask = pc.and_(
            pc.equal(d.column("op"), "I"),
            pc.is_null(pc.index_in(d.column("okey"), value_set=b.column("okey").combine_chunks())),
        )
        ins = pa.table(
            {
                "o_orderkey": d.column("okey").filter(ins_mask),
                "o_totalprice": d.column("price").filter(ins_mask),
            }
        )
        return pa.concat_tables([kept, ins])

    return shard_map_groups(tagged, ["okey"], apply_merge)


MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate < DATE '1997-01-01'
), delta AS (
  SELECT o_orderkey, 'U' AS op, o_totalprice + 1000.0 AS new_price
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 1
  UNION ALL
  SELECT o_orderkey, 'D', NULL FROM orders WHERE o_orderkey % 13 = 1
  UNION ALL
  SELECT o_orderkey + 100000000, 'I', o_totalprice FROM orders WHERE o_orderkey % 101 = 3
)
SELECT b.o_orderkey, coalesce(d.new_price, b.o_totalprice) AS o_totalprice
FROM base b LEFT JOIN delta d ON b.o_orderkey = d.o_orderkey
WHERE d.op IS NULL OR d.op = 'U'
UNION ALL
SELECT d.o_orderkey, d.new_price AS o_totalprice
FROM delta d LEFT JOIN base b ON d.o_orderkey = b.o_orderkey
WHERE d.op = 'I' AND b.o_orderkey IS NULL
"""


def dq_checks(sf_dir: str) -> pd.DataFrame:
    """Data-quality assertion suite (the dbt-test / Deequ family): one
    (rule, n_bad) row per constraint — primary-key uniqueness, both FK
    shapes (dimension and big-big), value-range, and null/empty rules —
    so a 100 TB ingest can gate promotion on `n_bad == 0` without a
    second full read per rule.

    Scale shape, per rule family:
    - predicate rules: each batch emits ONE (rule, p_bad) partial row —
      vectorized masks, NULL counted as a violation explicitly (SQL
      three-valued logic drops NULL from both a predicate and its
      negation, so the oracle states `OR x IS NULL`);
    - PK uniqueness: per-batch (key, p_cnt) partials, one coarse-shard
      exchange, violations = Σ(cnt−1) per shard — duplicates counted
      without materializing keys on the driver;
    - FK to a dimension (orders→customer): the dimension keyset is
      broadcast ONCE via ray.put and probed with `pc.is_in`;
    - FK big-big (lineitem→orders): neither keyset is broadcastable at
      scale, so both sides pre-combine to distinct keys (+ probe row
      counts) per batch and meet in ONE tagged coarse-shard cogroup.
    The six rule pipelines execute concurrently (threaded drains — see
    the note at the bottom) and their model-sized partials meet in one
    driver-side grouped sum."""
    import pyarrow.dataset as pads

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    PART_SCHEMA = pa.schema([("rule", pa.string()), ("p_bad", pa.int64())])

    def one(rule: str, n: int) -> pa.Table:
        return pa.table({"rule": [rule], "p_bad": pa.array([n], pa.int64())})

    def pred_partials(t: pa.Table) -> pa.Table:
        """lineitem predicate rules: one partial row per rule per batch."""
        q = t.column("l_quantity")
        bad_q = pc.sum(
            pc.cast(
                pc.or_kleene(
                    pc.is_null(q), pc.or_(pc.less(q, pa.scalar(1.0)), pc.greater(q, pa.scalar(50.0)))
                ),
                pa.int64(),
            )
        ).as_py() or 0
        d = t.column("l_discount")
        bad_d = pc.sum(
            pc.cast(pc.or_kleene(pc.is_null(d), pc.greater(d, pa.scalar(0.05))), pa.int64())
        ).as_py() or 0
        return pa.concat_tables(
            [one("lineitem_qty_range", bad_q), one("lineitem_discount_le_005", bad_d)]
        )

    li_pred = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"]).map_batches(
        pred_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def ev_partials(t: pa.Table) -> pa.Table:
        v = t.column("value")
        bad = pc.sum(
            pc.cast(pc.or_kleene(pc.is_null(v), pc.greater(v, pa.scalar(90.0))), pa.int64())
        ).as_py() or 0
        return one("events_value_le_90", bad)

    ev_pred = _read(sf_dir, "events", ["value"]).map_batches(
        ev_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def doc_partials(t: pa.Table) -> pa.Table:
        s = t.column("text")
        bad = pc.sum(
            pc.cast(pc.or_kleene(pc.is_null(s), pc.equal(pc.utf8_length(s), 0)), pa.int64())
        ).as_py() or 0
        return one("documents_text_nonempty", bad)

    doc_pred = _read(sf_dir, "documents", ["text"]).map_batches(
        doc_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    # FK to dimension: customer keyset broadcast once
    cust_keys = ray.put(
        pads.dataset(f"{sf_dir}/customer.parquet").to_table(columns=["c_custkey"]).column("c_custkey").combine_chunks()
    )

    def fk_cust(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey")
        ok = pc.is_in(k, value_set=ray.get(cust_keys))
        bad = pc.sum(pc.cast(pc.or_kleene(pc.is_null(k), pc.invert(ok)), pa.int64())).as_py() or 0
        return one("orders_fk_customer", bad)

    fk_dim = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        fk_cust, batch_format="pyarrow", zero_copy_batch=True
    )

    # PK uniqueness: (key, p_cnt) partials -> shard -> sum(cnt-1)
    def pk_partials(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_orderkey"]), ["o_orderkey"]).aggregate(
            [("o_orderkey", "count")]
        )
        return g.rename_columns(["key", "p_cnt"])

    pk_parts = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        pk_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def pk_shard(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, ["key"]).aggregate([("p_cnt", "sum")])
        dups = pc.sum(pc.subtract(agg.column("p_cnt_sum"), pa.scalar(1, pa.int64()))).as_py() or 0
        return one("orders_pk_unique", int(dups))

    pk = shard_map_groups(pk_parts, ["key"], pk_shard)

    # FK big-big: lineitem keys (+ row counts) vs orders keys, one cogroup
    def li_keys(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["l_orderkey"]), ["l_orderkey"]).aggregate(
            [("l_orderkey", "count")]
        ).rename_columns(["key", "p_rows"])
        return g.append_column("is_probe", pa.array(np.ones(g.num_rows, dtype=bool)))

    def ord_keys(t: pa.Table) -> pa.Table:
        keys = pc.unique(t.column("o_orderkey").combine_chunks())
        return pa.table(
            {
                "key": keys,
                "p_rows": pa.nulls(len(keys), pa.int64()),
                "is_probe": pa.array(np.zeros(len(keys), dtype=bool)),
            }
        )

    li_side = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        li_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    ord_side = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        ord_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    def fk_shard(g: pa.Table) -> pa.Table:
        probe = g.filter(g.column("is_probe"))
        ref = pc.unique(g.filter(pc.invert(g.column("is_probe"))).column("key").combine_chunks())
        miss = pc.invert(pc.is_in(probe.column("key"), value_set=ref))
        bad = pc.sum(pc.filter(probe.column("p_rows"), miss)).as_py() or 0
        return one("lineitem_fk_orders", int(bad))

    fk_big = shard_map_groups(li_side.union(ord_side), ["key"], fk_shard)

    # Run the six rule pipelines CONCURRENTLY (one driver thread each)
    # instead of lazily union-ing them: Dataset.union drains its inputs
    # one after another, which serialized six sub-second DAGs into an
    # 8-10 s wall (measured at sf0.1/32 CPUs; ~3.1 s after this change).
    # Each leg's output is model-sized (one row per rule per block), so
    # the final grouped sum is a driver-side reduction over partials —
    # the same tiny-exchange shape, minus five DAG barriers.
    from concurrent.futures import ThreadPoolExecutor

    legs = [li_pred, ev_pred, doc_pred, fk_dim, pk, fk_big]
    with ThreadPoolExecutor(max_workers=len(legs)) as pool:
        frames = list(pool.map(lambda d: d.to_pandas(), legs))
    out = (
        pd.concat(frames, ignore_index=True)
        .groupby("rule", as_index=False)["p_bad"]
        .sum()
        .rename(columns={"p_bad": "n_bad"})
    )
    out["n_bad"] = out["n_bad"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)


DQ_CHECKS_SQL = """
SELECT 'documents_text_nonempty' AS rule,
       count(*) FILTER (WHERE text IS NULL OR length(text) = 0) AS n_bad FROM documents
UNION ALL
SELECT 'events_value_le_90', count(*) FILTER (WHERE value > 90.0 OR value IS NULL) FROM events
UNION ALL
SELECT 'lineitem_discount_le_005',
       count(*) FILTER (WHERE l_discount > 0.05 OR l_discount IS NULL) FROM lineitem
UNION ALL
SELECT 'lineitem_fk_orders',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem_qty_range',
       count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50 OR l_quantity IS NULL) FROM lineitem
UNION ALL
SELECT 'orders_fk_customer',
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey IS NULL
           OR NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'orders_pk_unique', count(*) - count(DISTINCT o_orderkey) FROM orders
ORDER BY rule
"""


def table_diff(sf_dir: str) -> "ray.data.Dataset":
    """Snapshot diff (the Delta-CDF / lakehouse table_changes shape —
    the INVERSE of `merge_upsert`, which applies a delta this op would
    derive): compare two deterministic snapshots of orders and emit one
    (o_orderkey, change, price_a, price_b) row per differing key,
    change ∈ {added, removed, changed}.

    Snapshot A = orders before 1997-07-01; snapshot B = orders before
    1998-01-01 with a price restatement (+1.00) for keys ≡ 0 mod 97 —
    both derived from the same table so the job is reproducible and the
    oracle states the identical pair of CTEs.

    Scale shape: ONE pruned scan feeds both legs (each batch emits its
    tagged A-slice and B-slice — in a real diff the snapshots are two
    manifests of mostly-shared files, so one physical read is the
    honest shape); a coarse-shard cogroup on the order key holds both
    versions of a key in one shard; classification is a vectorized
    null/inequality decision table. Unchanged keys — the overwhelming
    bulk at 100 TB — are dropped INSIDE the shard kernel, so only the
    delta leaves the exchange."""
    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    cut_a = pa.scalar(np.datetime64("1997-07-01", "us"), pa.timestamp("us"))
    cut_b = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    def both_snaps(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey")
        price = t.column("o_totalprice")
        in_a = pc.less(t.column("o_orderdate"), cut_a)
        in_b = pc.less(t.column("o_orderdate"), cut_b)
        a = pa.table(
            {
                "okey": pc.filter(key, in_a),
                "price": pc.filter(price, in_a),
                "is_b": pa.array(np.zeros(pc.sum(pc.cast(in_a, pa.int64())).as_py() or 0, dtype=bool)),
            }
        )
        kb = pc.filter(key, in_b)
        pb = pc.filter(price, in_b)
        # keys ≡ 0 mod 97 restate by +1.00 (integer divide-multiply mod —
        # pyarrow.compute has no modulo kernel)
        bump = pc.equal(
            pc.subtract(kb, pc.multiply(pc.divide(kb, pa.scalar(97, pa.int64())), pa.scalar(97, pa.int64()))),
            pa.scalar(0, pa.int64()),
        )
        pb = pc.if_else(bump, pc.add(pb, pa.scalar(1.0)), pb)
        b = pa.table(
            {
                "okey": kb,
                "price": pb,
                "is_b": pa.array(np.ones(len(kb), dtype=bool)),
            }
        )
        return pa.concat_tables([a, b])

    tagged = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(both_snaps, batch_format="pyarrow", zero_copy_batch=True)

    def classify(g: pa.Table) -> pa.Table:
        is_b = g.column("is_b")
        a = g.filter(pc.invert(is_b)).select(["okey", "price"]).rename_columns(["okey", "price_a"])
        b = g.filter(is_b).select(["okey", "price"]).rename_columns(["okey", "price_b"])
        # explicit presence flags: a NULL price must not masquerade as
        # an absent side (a NULL-price row present in both snapshots is
        # UNCHANGED, not 'added' — NULL-price fuzz catch)
        a = a.append_column("in_a", pa.array(np.ones(a.num_rows, dtype=bool)))
        b = b.append_column("in_b", pa.array(np.ones(b.num_rows, dtype=bool)))
        j = a.join(b, keys=["okey"], join_type="full outer")
        pa_, pb_ = j.column("price_a"), j.column("price_b")
        absent_a = pc.is_null(j.column("in_a"))
        absent_b = pc.is_null(j.column("in_b"))
        change = pc.if_else(
            absent_a,
            pa.scalar("added"),
            pc.if_else(absent_b, pa.scalar("removed"), pa.scalar("changed")),
        )
        keep = pc.or_kleene(pc.or_(absent_a, absent_b), pc.not_equal(pa_, pb_))
        out = pa.table(
            {
                "o_orderkey": j.column("okey"),
                "change": change,
                "price_a": pa_,
                "price_b": pb_,
            }
        )
        return out.filter(pc.fill_null(keep, False))

    return shard_map_groups(tagged, ["okey"], classify)


TABLE_DIFF_SQL = """
WITH a AS (
  SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderdate < DATE '1997-07-01'
),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS price
  FROM orders WHERE o_orderdate < DATE '1998-01-01'
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       a.price AS price_a, b.price AS price_b
FROM a FULL OUTER JOIN b USING (o_orderkey)
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price <> b.price
"""


def winsorize_events(sf_dir: str) -> pd.DataFrame:
    """Percentile winsorization (clamp to [p05, p95]) — the robust-ML
    companion to `standardize_events`: extreme values are capped, not
    dropped, before scaling/training. Interpolated percentile_cont
    bounds come from the shared no-global-sort percentile engine
    (_percentile_cont_values: unit-bucket histogram + pruned re-read of
    only the bound-holding buckets); the clamp itself is ONE shuffle-free
    vectorized pass. NULL/NaN values pass through unclamped
    (NaN-as-missing, stated in the oracle via the NULL-preserving
    CASE)."""
    bounds, n = _percentile_cont_values(sf_dir, [0.05, 0.95])
    if n == 0:
        return pd.DataFrame(
            {"event_id": pd.Series(dtype="int64"), "value_w": pd.Series(dtype="float64")}
        )
    lo, hi = bounds[0.05], bounds[0.95]

    def clamp(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        w = np.clip(v, lo, hi)  # NaN propagates through clip unchanged
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value_w": pa.array(w, pa.float64(), mask=np.isnan(w)),
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
        .map_batches(clamp, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


WINSORIZE_EVENTS_SQL = """
WITH f AS (SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
s AS (SELECT percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
      FROM f)
SELECT event_id,
       CASE WHEN value IS NULL OR isnan(value) THEN NULL
            WHEN value < s.lo THEN s.lo
            WHEN value > s.hi THEN s.hi
            ELSE value END AS value_w
FROM events, s
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Distribution drift monitoring (PSI)
# ---------------------------------------------------------------------------


def value_drift_psi(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index of the ``value`` distribution between
    the first and second half of the event time range — the standard
    production drift monitor a pipeline runs before retraining/refresh
    decisions (PSI > 0.2 = major shift). Reference slice = events before
    the midpoint timestamp; deciles of the reference define the 10
    buckets; PSI = Σ (p_cur - p_ref) · ln(p_cur / p_ref) with the usual
    1e-6 floor so an empty bucket stays finite.

    Scale shape: pass 1 is a model-sized ts min/max aggregate; pass 2
    computes reference deciles via the shared no-global-sort percentile
    engine (_percentile_cont_values, now slice-aware via pushdown);
    pass 3 is ONE streaming map over (ts, value) emitting per-batch
    (bucket, slice) count partials — 20 tiny rows per block cross the
    exchange, never the events. The PSI arithmetic runs on 10 rows at
    the driver. NULL ts rows belong to neither slice; NULL/NaN values
    are excluded everywhere (NaN-as-missing, as the percentile engine
    declares)."""
    from ray.data.aggregate import Max, Min, Sum

    path = f"{sf_dir}/events.parquet"
    bounds = (
        ray.data.read_parquet(path, columns=["ts"])
        .aggregate(Min("ts"), Max("ts"))
    )
    mn_us = pa.scalar(bounds["min(ts)"]).cast(pa.int64()).as_py()
    mx_us = pa.scalar(bounds["max(ts)"]).cast(pa.int64()).as_py()
    mid_us = mn_us + (mx_us - mn_us) // 2
    mid_ts = pa.scalar(mid_us, pa.timestamp("us"))

    probs = [round(0.1 * i, 1) for i in range(1, 10)]
    qs, n_ref_engine = _percentile_cont_values(
        sf_dir, probs, extra_filter=(pc.field("ts") < mid_ts)
    )
    if n_ref_engine == 0:
        raise ValueError("value_drift_psi: reference slice has no valid values")
    edges = np.array([qs[p] for p in probs])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = (
            pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False)
            & pc.is_valid(t.column("ts")).to_numpy(zero_copy_only=False)
            & ~np.isnan(v)
        )
        is_cur = ts >= mid_us
        bucket = np.searchsorted(edges, v, side="left")
        code = bucket + 10 * is_cur.astype(np.int64)
        cnt = np.bincount(code[ok], minlength=20)
        return pa.table(
            {
                "bucket": pa.array(np.arange(20) % 10, pa.int64()),
                "p_ref": pa.array(np.where(np.arange(20) < 10, cnt, 0), pa.int64()),
                "p_cur": pa.array(np.where(np.arange(20) >= 10, cnt, 0), pa.int64()),
            }
        )

    counts = (
        ray.data.read_parquet(path, columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_ref", alias_name="n_ref"), Sum("p_cur", alias_name="n_cur"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    nr = int(counts["n_ref"].sum())
    nc = int(counts["n_cur"].sum())
    p_ref = np.maximum(counts["n_ref"].to_numpy() / nr, 1e-6)
    p_cur = np.maximum(counts["n_cur"].to_numpy() / nc, 1e-6)
    term = (p_cur - p_ref) * np.log(p_cur / p_ref)
    return pd.DataFrame(
        {
            "bucket": counts["bucket"].astype("int64"),
            "n_ref": counts["n_ref"].astype("int64"),
            "n_cur": counts["n_cur"].astype("int64"),
            "psi_term": np.round(term, 6),
        }
    )


VALUE_DRIFT_PSI_SQL = """
WITH bnds AS (SELECT epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx FROM events),
mid AS (SELECT mn + (mx - mn) // 2 AS m FROM bnds),
pop AS (
  SELECT value, CAST(epoch_us(ts) >= m AS INT) AS cur
  FROM events, mid
  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL
),
q AS (
  SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
  FROM pop WHERE cur = 0
),
b AS (
  SELECT len(list_filter(qs, e -> e < value)) AS bucket, cur FROM pop, q
),
c AS (
  SELECT bucket,
         count(*) FILTER (cur = 0) AS n_ref,
         count(*) FILTER (cur = 1) AS n_cur
  FROM b GROUP BY bucket
),
g AS (SELECT unnest(range(0, 10)) AS bucket),
f AS (
  SELECT g.bucket,
         coalesce(c.n_ref, 0) AS n_ref,
         coalesce(c.n_cur, 0) AS n_cur
  FROM g LEFT JOIN c ON g.bucket = c.bucket
),
tot AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc FROM f)
SELECT bucket, n_ref, n_cur,
       round((greatest(n_cur / nc, 1e-6) - greatest(n_ref / nr, 1e-6))
             * ln(greatest(n_cur / nc, 1e-6) / greatest(n_ref / nr, 1e-6)), 6) AS psi_term
FROM f, tot
ORDER BY bucket
"""


def type_drift_chi2(sf_dir: str) -> pd.DataFrame:
    """Categorical drift between the two halves of the event time range
    (the sibling of `value_drift_psi` for discrete features): the
    chi-square homogeneity statistic over the event_type distribution,
    one row per type with both slice counts and the type's chi2
    contribution (Σ (obs - exp)²/exp over the type's two cells, with
    exp from the row/column marginals).

    Scale shape: ONE streaming map over (ts, event_type) emitting
    per-batch (type, slice) count partials — ≤ 2·|types| tiny rows per
    block cross the exchange; the chi-square arithmetic runs on
    |types| rows at the driver. NULL event_type is its own category
    (SQL GROUP BY semantics); NULL ts rows belong to neither slice."""
    from ray.data.aggregate import Max, Min, Sum

    path = f"{sf_dir}/events.parquet"
    bounds = ray.data.read_parquet(path, columns=["ts"]).aggregate(Min("ts"), Max("ts"))
    mn_us = pa.scalar(bounds["min(ts)"]).cast(pa.int64()).as_py()
    mx_us = pa.scalar(bounds["max(ts)"]).cast(pa.int64()).as_py()
    mid_us = mn_us + (mx_us - mn_us) // 2

    def partial(t: pa.Table) -> pa.Table:
        ts_valid = pc.is_valid(t.column("ts"))
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_cur = pa.array(np.where(np.asarray(ts_valid), ts >= mid_us, False))
        sub = pa.table(
            {
                "event_type": t.column("event_type"),
                "p_ref": pc.cast(pc.and_(ts_valid, pc.invert(is_cur)), pa.int64()),
                "p_cur": pc.cast(pc.and_(ts_valid, is_cur), pa.int64()),
            }
        )
        return sub.group_by("event_type").aggregate([("p_ref", "sum"), ("p_cur", "sum")]).rename_columns(
            ["event_type", "p_ref", "p_cur"]
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    counts = (
        shard_aggregate(
            ray.data.read_parquet(path, columns=["ts", "event_type"]).map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["event_type"],
            [("p_ref", "sum"), ("p_cur", "sum")],
            ["event_type", "n_ref", "n_cur"],
        ).to_pandas()
    )
    o_ref = counts["n_ref"].to_numpy(dtype=np.float64)
    o_cur = counts["n_cur"].to_numpy(dtype=np.float64)
    nr, nc = o_ref.sum(), o_cur.sum()
    grand = nr + nc
    n_t = o_ref + o_cur
    e_ref = n_t * nr / grand
    e_cur = n_t * nc / grand
    term = (o_ref - e_ref) ** 2 / e_ref + (o_cur - e_cur) ** 2 / e_cur
    out = pd.DataFrame(
        {
            "event_type": counts["event_type"],
            "n_ref": counts["n_ref"].astype("int64"),
            "n_cur": counts["n_cur"].astype("int64"),
            "chi2_term": np.round(term, 6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


TYPE_DRIFT_CHI2_SQL = """
WITH bnds AS (SELECT epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx FROM events),
mid AS (SELECT mn + (mx - mn) // 2 AS m FROM bnds),
c AS (
  SELECT event_type,
         count(*) FILTER (epoch_us(ts) < m)  AS n_ref,
         count(*) FILTER (epoch_us(ts) >= m) AS n_cur
  FROM events, mid WHERE ts IS NOT NULL
  GROUP BY event_type
),
tot AS (SELECT sum(n_ref) AS nr, sum(n_cur) AS nc, sum(n_ref) + sum(n_cur) AS grand FROM c),
e AS (
  SELECT event_type, n_ref, n_cur,
         CAST(n_ref + n_cur AS DOUBLE) * nr / grand AS e_ref,
         CAST(n_ref + n_cur AS DOUBLE) * nc / grand AS e_cur
  FROM c, tot
)
SELECT event_type, n_ref, n_cur,
       round((n_ref - e_ref) * (n_ref - e_ref) / e_ref
             + (n_cur - e_cur) * (n_cur - e_cur) / e_cur, 6) AS chi2_term
FROM e
ORDER BY event_type
"""


def _mad_value(sf_dir: str, med: float) -> float:
    """Median absolute deviation around ``med`` with percentile_cont
    interpolation, by the same two-pass no-global-sort plan as
    `_percentile_cont_values`, generalized to the DERIVED value
    ``av = abs(value - med)``: the unit-bucket histogram buckets on
    floor(av); the pruned re-read pushes down the pre-image of the
    wanted av-buckets (two value ranges mirrored around the median,
    widened one bucket each way so filter arithmetic can never disagree
    with the in-memory floor(av) at a boundary ulp)."""
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/events.parquet"
    base_filter = pc.is_valid(pc.field("value"))

    def bucket_counts(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        b = np.floor(np.abs(v - med)).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "p_n": pa.array(cnt, pa.int64())})

    hist = (
        ray.data.read_parquet(path, columns=["value"], filter=base_filter)
        .map_batches(bucket_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    n = int(hist["n"].sum())
    if n == 0:
        raise ValueError("robust_zscore: no valid values")
    cum = np.cumsum(hist["n"].to_numpy())
    starts = cum - hist["n"].to_numpy()
    buckets = hist["bucket"].to_numpy()
    h = (n - 1) * 0.5
    need = sorted(set(min(r, n - 1) for r in (int(np.floor(h)), int(np.floor(h)) + 1)))
    bidx = np.searchsorted(cum, np.array(need), side="right")
    want = sorted(set(int(buckets[i]) for i in bidx))
    wmin, wmax = max(want[0] - 1, 0), want[-1] + 1
    pre = (
        (pc.field("value") >= float(med + wmin)) & (pc.field("value") < float(med + wmax + 1))
    ) | ((pc.field("value") > float(med - wmax - 1)) & (pc.field("value") <= float(med - wmin)))
    slice_v = (
        ray.data.read_parquet(path, columns=["value"], filter=base_filter & pre)
        .to_pandas()["value"]
        .to_numpy()
    )
    av = np.abs(slice_v[~np.isnan(slice_v)] - med)
    vals: dict[int, float] = {}
    for b in want:
        inb = np.sort(av[(av >= b) & (av < b + 1)])
        off = int(starts[np.searchsorted(buckets, b)])
        for r in need:
            if off <= r < off + len(inb):
                vals[r] = float(inb[r - off])
    low = int(np.floor(h))
    return vals[low] + (h - low) * (vals[min(low + 1, n - 1)] - vals[low])


def robust_zscore(sf_dir: str) -> "ray.data.Dataset":
    """Median/MAD robust standardization of event values — the
    outlier-resistant sibling of `standardize_events` (mean/std breaks
    down when the tail is exactly what you're hunting): robust_z =
    (value - median) / (1.4826 · MAD). Two model-sized order-statistic
    plans (median via the shared percentile engine, MAD via its
    derived-value generalization `_mad_value`), then ONE vectorized
    streaming map — no global sort anywhere. NULL propagates; a valid
    NaN standardizes to NaN (both exactly as the SQL arithmetic)."""
    med = _percentile_cont_values(sf_dir, [0.5])[0][0.5]
    mad = _mad_value(sf_dir, med)
    denom = 1.4826 * mad

    def z(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value": t.column("value"),
                "robust_z": pa.array(
                    np.round((v - med) / denom, 6),
                    pa.float64(),
                    mask=~pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False),
                ),
            }
        )

    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"]).map_batches(
        z, batch_format="pyarrow", zero_copy_batch=True
    )


ROBUST_ZSCORE_SQL = """
WITH m AS (
  SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
  FROM events WHERE NOT isnan(value)
),
s AS (
  SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(value - med)) AS mad
  FROM events, m WHERE NOT isnan(value)
)
SELECT event_id, value,
       round((value - med) / (1.4826 * mad), 6) AS robust_z
FROM events, m, s
"""
