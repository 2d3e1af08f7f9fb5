"""Ordered per-key operators Ray Data has no primitive for: as-of
(temporal) join, trailing range-window aggregate, per-group top-k, and
per-group exact quantiles (SURVEY.md §2.9 extension; ray_guide "Custom
operators").

All four share one partitioning assumption, stated once: rows are
hash-partitioned by the grouping key (``groupby(key).map_groups``) and
each group is processed with vectorized numpy kernels over the
(ts, event_id)-sorted group. That is the canonical Ray Data shape for
windowed semantics — the shuffle co-locates a key's rows, the kernel
never crosses keys, and group size (one user's history) is the only
per-worker memory bound. At 100 TB the same plan holds as long as a
single key's rows fit one worker; a hotter key would need the salted
split used by the flagship shuffle (stages/keys.py).

Column names match the paired SQL oracles exactly; raw ``value``
columns are carried through un-rounded (no summation-order
nondeterminism), and only order-dependent float SUMS are rounded on
both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

US_PER_HOUR = 3_600_000_000


def _events(sf_dir: str, columns: list[str], flt=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns, filter=flt)


def _sorted_group(g: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(order, ts_us_sorted, event_id_sorted) for one key's rows, in the
    deterministic (ts, event_id) order every oracle uses."""
    ts = g.column("ts").cast(pa.int64()).to_numpy()
    eid = g.column("event_id").to_numpy()
    order = np.lexsort((eid, ts))
    return order, ts[order], eid[order]


# --- coarse-shard run machinery -------------------------------------------
#
# The ops below process ONE SHARD (stages/agg.py: many whole users) per
# Python call instead of one user: the shard is sorted once by
# (user_id, ts, event_id) and every per-user semantics is computed over
# RUN BOUNDARIES with numpy — the per-user map_groups form paid one
# Python call per user (10k at sf0.1; the difference between a reduce
# that finishes and one that doesn't at 10^8+ users, SCALE.md §13).


def _sorted_shard(g: pa.Table, keys=(("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending"))) -> pa.Table:
    return g.take(pc.sort_indices(g, sort_keys=list(keys)))


def _uid_runs(uid: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """(first-of-run mask, per-row run-start index) over a user_id
    column that is already sorted (NULLs grouped like SQL PARTITION BY:
    validity participates in the boundary test, so every NULL row joins
    ONE run)."""
    uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
    n = len(uv)
    first = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = (uv[1:] != uv[:-1]) | (un[1:] != un[:-1])
    pos = np.arange(n)
    run_start = np.maximum.accumulate(np.where(first, pos, 0))
    return first, run_start


def _ts_with_null_peers(ts_col: "pa.ChunkedArray | pa.Array", window_us: int) -> tuple[np.ndarray, np.ndarray]:
    """(int64 ts array, validity mask) where NULL timestamps become a
    shared sentinel BEYOND every valid window probe: SQL RANGE frames
    treat NULL order keys as one peer group (excluded from every
    non-NULL row's range, each NULL row's frame = the peer group), and
    a shared out-of-reach key reproduces exactly that under the usual
    searchsorted probes. Sorted order is preserved (NULLs already sort
    last within each run)."""
    valid = pc.is_valid(ts_col).to_numpy(zero_copy_only=False)
    raw = pc.fill_null(ts_col, 0).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    if valid.all():
        return raw, valid
    sent = (int(raw[valid].max()) if valid.any() else 0) + 2 * window_us
    return np.where(valid, raw, sent), valid


def _run_local_key(ts_s: np.ndarray, run_start: np.ndarray, window_us: int) -> np.ndarray:
    """Monotone int64 key that makes ONE global ``np.searchsorted``
    answer per-run window probes: ``run_id * spacing + (ts - run_min)``
    with spacing > max_rel + window, so ``key ± window`` can never cross
    into a neighboring run. Requires n_runs * spacing < 2^62 — at int64
    microseconds that is ~4e5 run-years per shard, far beyond any
    per-user history; asserted rather than silently wrapped."""
    first = np.zeros(len(ts_s), dtype=bool)
    first[run_start == np.arange(len(ts_s))] = True
    run_id = np.cumsum(first) - 1
    ts_rel = ts_s - ts_s[run_start]
    spacing = int(ts_rel.max() if len(ts_rel) else 0) + window_us + 2
    n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
    assert n_runs * spacing < (1 << 62), "run-local key overflow: shard too wide"
    return run_id * spacing + ts_rel


def asof_join_events(sf_dir: str) -> "ray.data.Dataset":
    """As-of join (most-recent-prior match), the classic trades⋈quotes
    temporal join: each ``purchase`` event picks up the value of the
    latest non-NULL-valued ``view`` event of the SAME user at-or-before
    it in (ts, event_id) order (a view whose value is NULL is no match
    — on either side).

    Plan: one pruned + predicate-pushed read of the two event streams,
    one hash shuffle on user_id, then a per-group vectorized sorted
    merge (forward-fill of view indices via ``np.maximum.accumulate``)
    — no row loops, no driver materialization. The SQL oracle spells
    the identical semantics with ``last_value(... IGNORE NULLS)`` over
    the same window order, which keeps the engine/oracle tie-breaking
    bit-identical (plain SQL ``ASOF JOIN`` leaves equal-timestamp ties
    implementation-defined, so we pin the order explicitly).
    """

    def merge(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        _, run_start = _uid_runs(g.column("user_id"))
        ts_col = g.column("ts")
        ts_valid = pc.is_valid(ts_col).to_numpy(zero_copy_only=False)
        ts_s = pc.fill_null(ts_col, 0).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        # Arrow-native mask (no per-row string objects); NULL-valued
        # views are NOT matches — mirroring the oracle, which skips
        # them for both the value (IGNORE NULLS) and the timestamp
        is_view = pc.and_(
            pc.equal(g.column("event_type"), "view"), pc.is_valid(g.column("value"))
        ).to_numpy(zero_copy_only=False)
        # global forward-fill of view indices; a fill from BEFORE this
        # row's run start belongs to another user and is masked out
        # (indices are global and monotone, so `< run_start` detects it)
        src = np.where(is_view, np.arange(n), -1)
        last_view = np.maximum.accumulate(src)
        last_view = np.where(last_view >= run_start, last_view, -1)
        # last_view_ts is the oracle's max(VALID ts) over prior matching
        # views — NULL-ts views (sorted last) update the VALUE fill but
        # never the timestamp fill
        src_ts = np.where(is_view & ts_valid, np.arange(n), -1)
        last_view_t = np.maximum.accumulate(src_ts)
        last_view_t = np.where(last_view_t >= run_start, last_view_t, -1)
        # explicit purchase mask — NOT ~is_view, which would sweep in
        # null-valued view rows excluded from the match mask above
        take = pc.equal(g.column("event_type"), "purchase").to_numpy(zero_copy_only=False)
        lv = last_view[take]
        lvt = last_view_t[take]
        has = lv >= 0
        has_t = lvt >= 0
        lv_safe = np.where(has, lv, 0)
        lvt_safe = np.where(has_t, lvt, 0)
        idx = pa.array(np.flatnonzero(take))
        return pa.table(
            {
                "event_id": g.column("event_id").take(idx),
                "user_id": g.column("user_id").take(idx),
                "ts": g.column("ts").take(idx),
                "last_view_ts": pa.array(ts_s[lvt_safe], pa.int64(), mask=~has_t).cast(pa.timestamp("us")),
                "last_view_value": pa.array(val_s[lv_safe], pa.float64(), mask=~has),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(
        sf_dir,
        ["event_id", "user_id", "ts", "event_type", "value"],
        flt=pc.field("event_type").isin(["purchase", "view"]),
    )
    return shard_map_groups(ds, ["user_id"], merge)


ASOF_JOIN_EVENTS_SQL = """
WITH s AS (
  SELECT event_id, user_id, ts, value, event_type
  FROM events WHERE event_type IN ('purchase', 'view')
), w AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value,
         max(CASE WHEN event_type = 'view' AND value IS NOT NULL THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
  FROM s
)
SELECT event_id, user_id, ts, last_view_ts, last_view_value
FROM w WHERE event_type = 'purchase'
"""


def events_rolling(sf_dir: str) -> "ray.data.Dataset":
    """Trailing 1-hour range-window sum per user (SQL ``RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``): for every event, the
    sum of the same user's values with ts in [ts-1h, ts] — INCLUDING
    equal-ts peers, exactly as a RANGE frame does.

    Per-group kernel: prefix sums + two ``np.searchsorted`` probes
    (window start 'left', equal-ts peers 'right') — O(n log n) per
    group, no Python loop. The float SUM is order-dependent, so it is
    rounded to 2 decimals on both sides like every other sum oracle.
    """

    def roll(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        _, run_start = _uid_runs(g.column("user_id"))
        ts_s, ts_valid = _ts_with_null_peers(g.column("ts"), US_PER_HOUR)
        key = _run_local_key(ts_s, run_start, US_PER_HOUR)
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(g.column("value")).to_numpy(zero_copy_only=False)
        # SQL sum() IGNORES NULLs and returns NULL only when the whole
        # window is NULL — a NaN inside a plain cumsum would instead
        # poison every later window (caught by the randomized fuzz).
        # A VALID NaN value is a third case: it must make exactly the
        # frames CONTAINING it NaN (SQL sums it), not every later one —
        # so it is excluded from the prefix sum and tracked by its own
        # prefix count (review catch).
        is_nan = valid & np.isnan(val_s)
        csum = np.concatenate(([0.0], np.cumsum(np.where(valid & ~is_nan, val_s, 0.0))))
        ccnt = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        cnan = np.concatenate(([0], np.cumsum(is_nan.astype(np.int64))))
        lo = np.searchsorted(key, key - US_PER_HOUR, side="left")
        hi = np.searchsorted(key, key, side="right")
        n_valid = ccnt[hi] - ccnt[lo]
        sums = np.round(csum[hi] - csum[lo], 2)
        sums = np.where(cnan[hi] - cnan[lo] > 0, np.nan, sums)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "rolling_1h": pa.array(sums, pa.float64(), mask=n_valid == 0),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], roll)


EVENTS_ROLLING_SQL = """
SELECT event_id, user_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
             2) AS rolling_1h
FROM events
"""


def _rank_in_runs(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its run of equal keys
    (input already sorted by key), vectorized via run-start
    subtraction."""
    n = len(sorted_keys)
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = sorted_keys[1:] != sorted_keys[:-1]
    starts = np.flatnonzero(is_start)
    run_id = np.cumsum(is_start) - 1
    return np.arange(n) - starts[run_id]


def _topk_order_rank(
    uid: np.ndarray, val: np.ndarray, eid: np.ndarray, valid: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(sort order, 0-based within-user rank) for the deterministic
    (value DESC, event_id ASC) per-user ordering — one lexsort, no
    Python loop.

    SQL ordering has THREE value classes, all distinct from each other
    (review catch): NULL sorts last (DuckDB default NULLS LAST), a
    valid NaN sorts as the GREATEST value (before +inf), numbers by
    value. numpy's native NaN-last would conflate the first two, so
    the key maps valid-NaN -> -inf (first under ASC of -val) and
    NULL -> +inf (last)."""
    key = -val
    is_nan = np.isnan(val)
    if valid is None:
        valid = ~is_nan
    key = np.where(is_nan & valid, -np.inf, key)  # valid NaN: greatest
    key = np.where(~valid, np.inf, key)  # NULL: after every value...
    # ...including a VALID -inf value whose key is also +inf — the
    # explicit null flag breaks that collision deterministically
    null_flag = (~valid).astype(np.int8)
    order = np.lexsort((eid, null_flag, key, uid))
    return order, _rank_in_runs(uid[order])


def grouped_topk_events(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-key top-k (top-3 events by value per user) — the grouped
    cousin of global O2 top-k. Two-level plan: each batch pre-cuts to
    ≤k rows per user BEFORE the shuffle (the all-to-all moves at most
    k × users × blocks rows, never the raw table), then one
    ``groupby(user_id).map_groups`` selects the final k and assigns the
    1-based rank. Tie-break (value DESC, event_id ASC) matches the
    oracle's ``row_number() OVER`` exactly."""

    def cut(t: pa.Table, with_rank: bool) -> pa.Table:
        # run codes, not raw ids: a NULL user_id becomes NaN under
        # to_numpy and NaN != NaN would split the null partition into
        # one run per row; np.unique collapses NaNs to ONE code
        uid_raw = t.column("user_id").to_numpy(zero_copy_only=False)
        uid = np.unique(uid_raw, return_inverse=True)[1].astype(np.int64)
        val = t.column("value").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy()
        valid = pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False)
        order, rank = _topk_order_rank(uid, val, eid, valid)
        keep = rank < k
        idx = order[keep]
        cols = {
            "user_id": t.column("user_id").take(pa.array(idx)),
            "event_id": pa.array(eid[idx], pa.int64()),
            # mask keeps NULL distinct from valid NaN ACROSS the shuffle
            # — a NULL flattened to NaN between partial and final would
            # be re-ranked as the greatest value instead of last
            "value": pa.array(val[idx], pa.float64(), mask=~valid[idx]),
        }
        if with_rank:
            cols["rn"] = pa.array(rank[keep] + 1, pa.int64())
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        return cut(t, with_rank=False)

    def final(g: pa.Table) -> pa.Table:
        return cut(g, with_rank=True)

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "value"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return shard_map_groups(ds, ["user_id"], final)


GROUPED_TOPK_EVENTS_SQL = """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


def user_value_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-user exact median and p90 of event value. One shuffle on
    user_id, then ``np.quantile(method='inverted_cdf')`` per group —
    DISCRETE quantiles (element selection, verified identical to SQL
    ``quantile_disc`` across parities), deliberately not interpolated:
    ``quantile_cont`` midpoints of 2-decimal values land exactly on
    round-half boundaries where Python (half-even) and DuckDB
    (half-away) disagree, so an interpolated oracle pair is
    hash-unstable by construction. Element selection returns a stored
    double bit-identically on both sides and needs no rounding.

    Scale note: exact per-key quantiles hold whenever one key's rows
    fit a worker (true for per-user/per-doc keys). For LOW-cardinality
    keys at 100 TB (e.g. 5 event_types over 10^12 rows) the exact path
    would sort a whole key on one node; the scale path there is a
    bounded-memory histogram/t-digest partial pre-agg — same pattern as
    lineitem_agg's partial sums — at the cost of approximation.
    """

    def q(g: pa.Table) -> pa.Table:
        # sort by (user, value): Arrow places NaN after all numbers and
        # NULL after NaN, so each run is [finite asc | NaN | NULL] and
        # the finite prefix length is the run's quantile population.
        # isnan-after-to_numpy drops BOTH NULLs (NaN placeholder) and
        # valid NaN values: measured DuckDB behavior — quantile_disc
        # ignores NaN exactly like NULL even though ORDER BY sorts NaN
        # as the greatest value (probed: quantile_disc(0.9) over
        # [1,2,NaN,3] = 3.0, not NaN)
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("value", "ascending")))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "median_value": pa.array([], pa.float64()),
                    "p90_value": pa.array([], pa.float64()),
                }
            )
        first, _ = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        val = g.column("value").to_numpy(zero_copy_only=False)
        finite = ~np.isnan(val)
        P = np.concatenate(([0], np.cumsum(finite.astype(np.int64))))
        n_valid = P[ends] - P[starts]
        has = n_valid > 0
        nv = np.maximum(n_valid, 1)
        # inverted_cdf selection: element at ceil(q*n)-1 of the finite
        # prefix (verified == quantile_disc across parities in pytest)
        med_idx = starts + np.ceil(0.5 * nv).astype(np.int64) - 1
        p90_idx = starts + np.ceil(0.9 * nv).astype(np.int64) - 1
        med = val[med_idx]
        p90 = val[p90_idx]
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "median_value": pa.array(med, pa.float64(), mask=~has),
                "p90_value": pa.array(p90, pa.float64(), mask=~has),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["user_id", "value"])
    return shard_map_groups(ds, ["user_id"], q)


USER_VALUE_QUANTILES_SQL = """
SELECT user_id,
       quantile_disc(value, 0.5) AS median_value,
       quantile_disc(value, 0.9) AS p90_value
FROM events GROUP BY user_id
"""


def events_lag_lead(sf_dir: str) -> "ray.data.Dataset":
    """Row-offset window functions (SQL ``lag``/``lead``): for every
    event, the previous and next value and the previous timestamp of
    the SAME user in (ts, event_id) order. Pure element shifts — no
    sums, so values are carried bit-exact with no rounding, and the
    NULL-vs-valid-NaN distinction must survive the shift (a lag of a
    NULL is NULL; a lag of a stored NaN is NaN).

    One coarse-shard exchange (stages/agg.py): the shard kernel sorts
    by (user, ts, event_id) once and applies the shifts over run
    boundaries — first/last rows of a RUN get NULL, exactly as SQL's
    default one-row offset with no fill does."""

    def shift(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        first, _ = _uid_runs(g.column("user_id"))
        last = np.concatenate((first[1:], [True]))
        ts_valid = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts_s = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        valid_s = pc.is_valid(g.column("value")).to_numpy(zero_copy_only=False)
        prev_val = np.concatenate(([0.0], val_s[:-1]))
        prev_valid = np.concatenate(([False], valid_s[:-1])) & ~first
        next_val = np.concatenate((val_s[1:], [0.0]))
        next_valid = np.concatenate((valid_s[1:], [False])) & ~last
        prev_ts = np.concatenate(([0], ts_s[:-1]))
        # lag(ts) of a NULL-ts neighbor is NULL even when the position
        # exists — validity shifts with the value
        has_prev = np.concatenate(([False], ts_valid[:-1])) & ~first
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "prev_value": pa.array(prev_val, pa.float64(), mask=~prev_valid),
                "next_value": pa.array(next_val, pa.float64(), mask=~next_valid),
                "prev_ts": pa.array(prev_ts, pa.int64(), mask=~has_prev).cast(pa.timestamp("us")),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], shift)


EVENTS_LAG_LEAD_SQL = """
SELECT event_id, user_id, ts,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       lag(ts)     OVER w AS prev_ts
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_cumsum(sf_dir: str) -> "ray.data.Dataset":
    """Running (cumulative) per-key aggregate — SQL ``sum/count OVER
    (... ROWS UNBOUNDED PRECEDING)`` with the pinned (ts, event_id)
    tie-break (a ROWS frame over an unpinned order would be
    nondeterministic on duplicate timestamps; the explicit event_id
    makes engine and oracle frame-identical).

    NULL/NaN contract mirrors ``events_rolling``: NULLs are skipped by
    the sum and counted by nothing; the running sum is NULL until the
    first valid value; a VALID NaN is summed by SQL into every frame
    containing it, so from its first occurrence onward the running sum
    is NaN — implemented as a separate NaN prefix count, not by letting
    NaN poison the cumsum arithmetic."""

    def cumulate(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        first, run_start = _uid_runs(g.column("user_id"))
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(g.column("value")).to_numpy(zero_copy_only=False)
        is_nan = valid & np.isnan(val_s)
        contrib = np.where(valid & ~is_nan, val_s, 0.0)
        # per-run running totals = global cumsum minus the value of the
        # global cumsum just BEFORE each run's first row
        s = np.cumsum(contrib)
        base_s = (s - contrib)[run_start]
        csum = np.round(s - base_s, 2)
        cv = np.cumsum(valid.astype(np.int64))
        n_valid = cv - (cv - valid.astype(np.int64))[run_start]
        cn = np.cumsum(is_nan.astype(np.int64))
        nan_seen = cn - (cn - is_nan.astype(np.int64))[run_start]
        csum = np.where(nan_seen > 0, np.nan, csum)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "cum_value": pa.array(csum, pa.float64(), mask=n_valid == 0),
                "cum_n": pa.array(n_valid, pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], cumulate)


EVENTS_CUMSUM_SQL = """
SELECT event_id, user_id, ts,
       round(sum(value) OVER w, 2) AS cum_value,
       count(value)     OVER w     AS cum_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


US_PER_5MIN = 300_000_000


def range_join_counts(sf_dir: str) -> "ray.data.Dataset":
    """Range (band) self-join, the third temporal-join shape after
    equi and as-of: for every event, the COUNT of the same user's other
    events with ts in [ts-5min, ts+5min]. Emitting the count rather
    than the pair list keeps the output linear in the input — a band
    join's pair set is quadratic in dense regions, which is exactly
    what kills naive implementations at scale.

    Per-group kernel: two ``np.searchsorted`` probes against the sorted
    ts array give each row its band [lo, hi) in O(log n); count =
    hi - lo - 1 (minus self). One hash shuffle on user_id, same
    partitioning contract as the rest of this module (SCALE.md §8a).
    The SQL oracle is a correlated range-predicate subquery."""

    def band(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        _, run_start = _uid_runs(g.column("user_id"))
        ts_s, ts_valid = _ts_with_null_peers(g.column("ts"), US_PER_5MIN)
        key = _run_local_key(ts_s, run_start, US_PER_5MIN)
        lo = np.searchsorted(key, key - US_PER_5MIN, side="left")
        hi = np.searchsorted(key, key + US_PER_5MIN, side="right")
        # _uid_runs groups NULL users into one run, but the oracle's
        # b.user_id = a.user_id never matches NULL: those rows count 0.
        # Likewise BETWEEN over a NULL ts (either side) never matches —
        # NULL-ts probe rows count 0, and the sentinel key keeps NULL-ts
        # rows out of every valid window.
        uvalid = pc.is_valid(g.column("user_id")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "n_near": pa.array(np.where(uvalid & ts_valid, hi - lo - 1, 0), pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    return shard_map_groups(ds, ["user_id"], band)


RANGE_JOIN_COUNTS_SQL = """
SELECT a.event_id, a.user_id,
       (SELECT count(*) FROM events b
        WHERE b.user_id = a.user_id AND b.event_id <> a.event_id
          AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts + INTERVAL 5 MINUTE) AS n_near
FROM events a
"""


def events_ranked(sf_dir: str, n_tiles: int = 4) -> "ray.data.Dataset":
    """Ranking window functions — SQL ``rank`` / ``dense_rank`` /
    ``ntile``: per user, the rank of each event by timestamp (ties on
    duplicate timestamps share a rank, exactly as SQL rank does) and
    its quartile bucket under the fully pinned (ts, event_id) order
    (``ntile`` is row-positional, so its ORDER BY must be total — an
    order with ties would make the bucket assignment
    implementation-defined on both sides).

    Per-group kernel on the sorted arrays: ts-run boundaries give rank
    (``maximum.accumulate`` of run-start positions) and dense_rank
    (``cumsum`` of boundaries); ntile is a ``searchsorted`` against the
    cumulative SQL bucket sizes (first ``n % k`` buckets get the extra
    row). Same one-shuffle plan and memory bound as the rest of this
    module."""

    def rank_group(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        first_u, run_start = _uid_runs(g.column("user_id"))
        # peer boundaries are validity-aware: SQL ranking treats all
        # NULL ts as ONE peer group (sorted last), whereas a bare NaN
        # comparison would make every NULL row its own peer
        tsv = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts_s = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        new = first_u.copy()
        new[1:] |= (ts_s[1:] != ts_s[:-1]) | (tsv[1:] != tsv[:-1])
        pos = np.arange(n)
        # global 1-based position of the last peer-group start at-or-
        # before each row; minus the user's offset = SQL rank. The
        # accumulated value is globally increasing, so it can never
        # leak a previous user's rank across a boundary.
        gmax = np.maximum.accumulate(np.where(new, pos + 1, 0))
        rnk = gmax - run_start
        c = np.cumsum(new)
        drnk = c - (c - new)[run_start]
        # ntile over the pinned (ts, event_id) row order: first n%k
        # tiles get the extra row
        ends = np.append(np.flatnonzero(first_u)[1:], n)
        n_user = (ends - np.flatnonzero(first_u))[np.cumsum(first_u) - 1]
        p = pos - run_start
        cut = n_user % n_tiles
        big = n_user // n_tiles + 1
        small = np.maximum(n_user // n_tiles, 1)
        in_big = p < cut * big
        tile = np.where(in_big, p // big, cut + (p - cut * big) // small) + 1
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    return shard_map_groups(ds, ["user_id"], rank_group)


EVENTS_RANKED_SQL = """
SELECT event_id, user_id, ts,
       rank()       OVER (PARTITION BY user_id ORDER BY ts) AS rnk,
       dense_rank() OVER (PARTITION BY user_id ORDER BY ts) AS drnk,
       ntile(4)     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tile
FROM events
"""


def events_percent_rank(sf_dir: str) -> "ray.data.Dataset":
    """Relative-position window functions — SQL ``percent_rank`` /
    ``cume_dist`` over each user's timestamp order: percent_rank =
    (rank−1)/(n−1) (0 for a single-row partition), cume_dist =
    (#rows ≤ current peer group)/n. Both are ratios of small integers
    evaluated as one double division, so the engine and the oracle are
    bit-identical by construction — no rounding pin needed (contrast
    the quantile_cont note on user_value_quantiles).

    Per-group kernel on the sorted ts array: ts-run boundaries give
    rank (``maximum.accumulate`` of run starts) and the run-END index
    gives cume_dist (every member of a peer group counts rows through
    the group's last row). Same one-shuffle per-user plan and memory
    bound as the rest of this module."""

    def pr_group(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        first_u, run_start = _uid_runs(g.column("user_id"))
        # validity-aware ts peers: all NULL ts form ONE peer group
        tsv = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts_s = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        new = first_u.copy()
        new[1:] |= (ts_s[1:] != ts_s[:-1]) | (tsv[1:] != tsv[:-1])
        pos = np.arange(n)
        gmax = np.maximum.accumulate(np.where(new, pos + 1, 0))
        rnk = gmax - run_start
        # per-user row count, broadcast per row
        u_starts = np.flatnonzero(first_u)
        u_ends = np.append(u_starts[1:], n)
        n_user = (u_ends - u_starts)[np.cumsum(first_u) - 1]
        # global index ONE PAST each row's ts-peer-group (backward fill
        # of peer-group last positions), then user-localized for cume
        last_of_run = np.append(new[1:], True)
        peer_end = np.minimum.accumulate(np.where(last_of_run, pos, n)[::-1])[::-1] + 1
        pr = np.where(n_user > 1, (rnk - 1) / np.maximum(n_user - 1, 1), 0.0)
        cume = (peer_end - run_start) / n_user
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "pct_rank": pa.array(pr, pa.float64()),
                "cume": pa.array(cume, pa.float64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    return shard_map_groups(ds, ["user_id"], pr_group)


EVENTS_PERCENT_RANK_SQL = """
SELECT event_id, user_id, ts,
       percent_rank() OVER (PARTITION BY user_id ORDER BY ts) AS pct_rank,
       cume_dist()    OVER (PARTITION BY user_id ORDER BY ts) AS cume
FROM events
"""


def user_event_paths(sf_dir: str) -> "ray.data.Dataset":
    """Ordered collect/concat aggregate — SQL ``string_agg(...  ORDER
    BY ...)``: each user's full event-type journey as one
    '>'-delimited string in (ts, event_id) order, plus the event
    count. The canonical session-path input for funnel analysis.

    A collect is inherently O(group-size) per output row — the path
    column holds one token per event — so the per-worker bound is the
    same single-key bound as every operator in this module; the output
    row count is |users|, tiny. NULL event_types are skipped by SQL
    string_agg (but still counted by count(*)); mirrored here with a
    validity mask before the join."""

    def concat_group(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "path": pa.array([], pa.string()),
                }
            )
        first_u, _ = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first_u)
        ends = np.append(starts[1:], n)
        et = g.column("event_type").combine_chunks()
        valid = pc.is_valid(et).to_numpy(zero_copy_only=False)
        # users are contiguous and filtering preserves order, so the
        # non-null tokens of user r occupy one contiguous slice of the
        # filtered values — a ListArray over those offsets turns the
        # whole shard's string_agg into ONE pc.binary_join kernel call
        P = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        n_valid = P[ends] - P[starts]
        offsets = np.concatenate(([0], np.cumsum(n_valid))).astype(np.int32)
        vals = et.filter(pa.array(valid))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals),
            ">",
        )
        path = pc.if_else(pa.array(n_valid > 0), joined, pa.scalar(None, pa.string()))
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "n_events": pa.array(ends - starts, pa.int64()),
                "path": path,
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    return shard_map_groups(ds, ["user_id"], concat_group)


USER_EVENT_PATHS_SQL = """
SELECT user_id, count(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM events
GROUP BY user_id
"""


def user_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered-stage funnel (view -> click -> purchase), the classic
    conversion query: per user, t1 = earliest view, t2 = earliest
    click STRICTLY after t1, t3 = earliest purchase strictly after t2,
    and the reached stage count. Strictly-after is on ``ts`` alone (an
    equal-timestamp event does not advance the funnel) — deterministic
    under duplicate timestamps and stateable in SQL as three min()
    reductions, so the oracle pins the exact semantics. NULL-ts events
    never start or advance a stage (declared on both sides); a NULL
    user_id group gets t2 = t3 = NULL exactly like the oracle's
    join-on-user_id, which never matches NULL.

    Plan: pruned read pushed down to the three event types, ONE hash
    shuffle of (user_id, ts, event_type) — same per-key co-location
    bound as every operator in this module — then a vectorized
    three-mask stage scan per group. Output is one row per user with
    at least one view; no driver materialization."""
    flt = pc.field("event_type").isin(["view", "click", "purchase"])
    ds = _events(sf_dir, ["user_id", "ts", "event_type"], flt=flt)

    def funnel(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g.column("ts")))
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("ts", "ascending")))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "t1": pa.array([], pa.timestamp("us")),
                    "t2": pa.array([], pa.timestamp("us")),
                    "t3": pa.array([], pa.timestamp("us")),
                    "stage": pa.array([], pa.int64()),
                }
            )
        first, run_start = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first)
        run_of = np.cumsum(first) - 1
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        uvalid = pc.is_valid(g.column("user_id")).to_numpy(zero_copy_only=False)
        BIG = np.iinfo(np.int64).max

        def run_min(mask: np.ndarray) -> np.ndarray:
            # per-run min of ts over masked rows; BIG = no row
            return np.minimum.reduceat(np.where(mask, ts, BIG), starts)

        t1 = run_min(et == "view")
        has1 = t1 < BIG
        # SQL join-on-NULL matches nothing: a NULL user never advances
        t2 = run_min((et == "click") & (ts > t1[run_of]) & uvalid)
        has2 = (t2 < BIG) & has1
        t3 = run_min((et == "purchase") & (ts > np.where(has2, t2, BIG)[run_of]) & uvalid)
        has3 = (t3 < BIG) & has2
        keep = has1
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts[keep])),
                "t1": pa.array(t1[keep], pa.int64()).cast(pa.timestamp("us")),
                "t2": pa.array(np.where(has2, t2, 0)[keep], pa.int64(), mask=~has2[keep]).cast(
                    pa.timestamp("us")
                ),
                "t3": pa.array(np.where(has3, t3, 0)[keep], pa.int64(), mask=~has3[keep]).cast(
                    pa.timestamp("us")
                ),
                "stage": pa.array(
                    (1 + has2.astype(np.int64) + has3.astype(np.int64))[keep], pa.int64()
                ),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    return shard_map_groups(ds, ["user_id"], funnel)


USER_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def events_resampled(sf_dir: str) -> "ray.data.Dataset":
    """Time-series resampling with gap filling: each user's activity
    re-gridded to a dense hourly series from their first to their last
    active hour, absent hours filled with 0.0 — the densification step
    in front of any windowed model. Generates rows that do not exist
    in the input, which no plain groupby can do; the oracle states it
    with generate_series + LEFT JOIN.

    Same one-shuffle per-key shape as the rest of this module; the
    per-worker bound is one user's SPAN in hours (not their event
    count), which is the operator's stated partitioning assumption.
    NULL-ts rows and NULL users are excluded (declared on both sides);
    NULL and valid-NaN values contribute 0 like the oracle's FILTER;
    sums are rounded(6) on both sides (order-dependent float sums)."""
    flt = pc.is_valid(pc.field("ts")) & pc.is_valid(pc.field("user_id"))
    ds = _events(sf_dir, ["user_id", "ts", "value"], flt=flt)

    def regrid(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("ts", "ascending")))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "total": pa.array([], pa.float64()),
                }
            )
        first, run_start = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # float divide BEFORE floor: negative timestamps floor correctly
        h = np.floor(ts / 3.6e9).astype(np.int64)
        v = g.column("value").to_numpy(zero_copy_only=False)
        v = np.where(np.isnan(v), 0.0, v)
        # ts-sorted runs ⇒ h sorted within run: h0/h1 at run bounds
        h0 = h[starts]
        h1 = h[ends - 1]
        lens = h1 - h0 + 1
        off = np.concatenate(([0], np.cumsum(lens)))  # grid offset per run
        total = np.zeros(int(off[-1]))
        run_of = np.cumsum(first) - 1
        np.add.at(total, off[run_of] + (h - h0[run_of]), v)
        # dense per-user hour grid, one arange over the whole shard
        grid_pos = np.arange(int(off[-1]))
        grid_run = np.searchsorted(off, grid_pos, side="right") - 1
        h_grid = h0[grid_run] + (grid_pos - off[grid_run])
        return pa.table(
            {
                "user_id": g.column("user_id")
                .take(pa.array(starts))
                .take(pa.array(grid_run)),
                "h": pa.array(h_grid, pa.int64()),
                "total": pa.array(np.round(total, 6), pa.float64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    return shard_map_groups(ds, ["user_id"], regrid)


EVENTS_RESAMPLED_SQL = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h, value
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), b AS (
  SELECT user_id, h,
         coalesce(sum(value) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)), 0) AS s
  FROM e GROUP BY user_id, h
), r AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY user_id
), g AS (
  SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM r
)
SELECT g.user_id, g.h, round(coalesce(b.s, 0), 6) AS total
FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h
"""


# --- CDC compaction: latest row per (user_id, event_type) -------------------


def _latest_cut(t: pa.Table) -> pa.Table:
    """Keep the argmax row per (user_id, event_type) by (ts DESC,
    event_id DESC) — rows selected with Arrow take so every column
    (timestamps, NULL/NaN values) survives bit-exact. NULL ts sorts
    last (DuckDB DESC default), encoded as int64 min."""
    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    # dictionary codes, NULL -> -1: lexsort only needs EQUAL types
    # adjacent (argmax grouping), and an object ndarray with None would
    # blow up the comparison (NULL-event_type fuzz)
    et = (
        pc.fill_null(pc.dictionary_encode(t.column("event_type").combine_chunks()).indices, -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
    )
    ts = t.column("ts").cast(pa.int64())
    # NULL ts must LOSE the argmax; the fill must survive the lexsort
    # negation below (negating int64 min wraps to itself, which made
    # NULL-ts rows SORT FIRST — caught by the NULL-ts fuzz)
    tsn = pc.fill_null(ts, -(1 << 62)).to_numpy(zero_copy_only=False)
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((-eid, -tsn, et, uid))
    u_s, e_s = uid[order], et[order]
    first = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        first[1:] = (u_s[1:] != u_s[:-1]) | (e_s[1:] != e_s[:-1])
    return t.take(pa.array(order[first], pa.int64()))


def latest_events(sf_dir: str) -> "ray.data.Dataset":
    """Upsert/compaction (the CDC 'latest record per key' pattern): the
    most recent event per (user_id, event_type), ties broken by larger
    event_id. Two-level argmax: each batch pre-compacts to one row per
    key pair BEFORE the shuffle (the exchange moves at most
    |key pairs| x blocks rows), then one groupby.map_groups picks the
    global winner. Same plan compacts a 100 TB changelog: the partial
    cut is the combiner, the shuffle carries only per-block winners."""
    def latest_final(g: pa.Table) -> pa.Table:
        # Arrow sort (null-safe run grouping: NULL keys sort together)
        # then run-first selection — one kernel for every key pair in
        # the shard
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("event_type", "ascending"),
                    ("ts", "descending"),
                    ("event_id", "descending"),
                ],
            )
        )
        n = g.num_rows
        if n == 0:
            return g
        first_u, _ = _uid_runs(g.column("user_id"))
        et = g.column("event_type").combine_chunks()
        codes = pc.dictionary_encode(et).indices
        ec = pc.fill_null(codes, -1).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        first = first_u.copy()
        if n > 1:
            first[1:] |= ec[1:] != ec[:-1]
        return g.filter(pa.array(first))

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    ds = ds.map_batches(_latest_cut, batch_format="pyarrow", zero_copy_batch=True)
    return shard_map_groups(ds, ["user_id"], latest_final)


LATEST_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


# --- per-key interpolated median ---------------------------------------------


def user_value_median(sf_dir: str) -> "ray.data.Dataset":
    """Interpolated per-user median (percentile_cont(0.5) semantics,
    h = (n-1)/2) — the continuous cousin of user_value_quantiles'
    discrete quantiles. One hash shuffle on user_id; each group sorts
    its finite values and interpolates in float64 with the exact oracle
    expression. NULL and NaN values are excluded; a user whose values
    are all missing medians to NULL (groups come from ALL rows, so the
    key set matches SQL GROUP BY)."""

    def med(g: pa.Table) -> pa.Table:
        # same run-offset layout as user_value_quantiles: sort by
        # (user, value) so finite values form each run's prefix, then
        # interpolate with vectorized index arithmetic
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("value", "ascending")))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "med": pa.array([], pa.float64())}
            )
        first, _ = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        val = g.column("value").to_numpy(zero_copy_only=False)
        finite = ~np.isnan(val)  # to_numpy maps NULL -> NaN too
        P = np.concatenate(([0], np.cumsum(finite.astype(np.int64))))
        nv = P[ends] - P[starts]
        has = nv > 0
        nv1 = np.maximum(nv, 1)
        h = (nv1 - 1) * 0.5
        l = np.floor(h).astype(np.int64)
        lo = val[starts + l]
        hi = val[starts + np.minimum(l + 1, nv1 - 1)]
        m = lo + (h - l) * (hi - lo)
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "med": pa.array(m, pa.float64(), mask=~has),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["user_id", "value"])
    return shard_map_groups(ds, ["user_id"], med)


USER_VALUE_MEDIAN_SQL = """
SELECT user_id,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
FROM (SELECT user_id, CASE WHEN isnan(value) THEN NULL ELSE value END AS value FROM events)
GROUP BY user_id
"""


# --- Markov transition counts ------------------------------------------------


def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """First-order Markov transition counts over each user's event
    stream: how often event type ``src`` is immediately followed by
    ``dst`` within the SAME user, in (ts, event_id) order — the
    behavioral-model / next-event-prediction building block (SQL:
    ``lead() OVER (PARTITION BY user_id ORDER BY ts, event_id)``).

    Plan: one hash shuffle on user_id; each group shifts its sorted
    type array by one and pre-counts its own (src, dst) pairs with an
    Arrow hash group-by, so the second exchange moves at most
    |types|^2 rows per user — model-sized partials, never events.
    Pairs whose NEXT type is NULL are dropped (SQL lead() makes the
    end-of-partition and a stored-NULL successor indistinguishable and
    the WHERE drops both); a NULL src forms its own group, exactly like
    SQL GROUP BY."""
    from ray.data.aggregate import Sum

    def trans(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        g = _sorted_shard(g)
        first, _ = _uid_runs(g.column("user_id"))
        et = g.column("event_type").combine_chunks()
        n = len(et)
        # adjacent pairs that do not cross a user boundary
        within = ~first[1:]
        pairs = pa.table({"src": et.slice(0, n - 1), "dst": et.slice(1)}).filter(
            pa.array(within)
        )
        pairs = pairs.filter(pc.is_valid(pairs.column("dst")))
        if pairs.num_rows == 0:
            return empty
        agg = pa.TableGroupBy(pairs, ["src", "dst"]).aggregate([([], "count_all")])
        return agg.rename_columns(["src", "dst", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    partial = shard_map_groups(ds, ["user_id"], trans)
    return partial.groupby(["src", "dst"]).aggregate(Sum("p_n", alias_name="n"))


EVENT_TRANSITIONS_SQL = """
WITH w AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n
FROM w WHERE dst IS NOT NULL GROUP BY src, dst
"""


# --- weekly cohort retention --------------------------------------------------

US_PER_WEEK = 604_800_000_000


def cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention (the classic product-analytics triangle): users
    are cohorted by the epoch-week of their FIRST event; for every
    (cohort_week, week_offset) the count of cohort users still active
    offset weeks later. week 0 row = cohort size.

    Plan: one hash shuffle on user_id; each user collapses to their
    distinct active weeks relative to their first week (at most
    |distinct weeks| rows — the combiner), then one triangle-sized
    (cohort_week, week_offset) count reduce. NULL ts / NULL user_id
    rows are excluded on both sides (a NULL user is not a user; the
    float-divide-then-floor keeps pre-1970 weeks exact)."""
    from ray.data.aggregate import Sum

    flt = pc.is_valid(pc.field("ts")) & pc.is_valid(pc.field("user_id"))
    ds = _events(sf_dir, ["user_id", "ts"], flt=flt)

    def per_user(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "cohort_week": pa.array([], pa.int64()),
                    "week_offset": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = np.floor(ts / float(US_PER_WEEK)).astype(np.int64)
        # distinct (user, week), then run boundaries give w0 per user
        d = pa.TableGroupBy(
            pa.table({"user_id": g.column("user_id"), "w": pa.array(w, pa.int64())}),
            ["user_id", "w"],
        ).aggregate([([], "count_all")])
        d = d.take(
            pc.sort_indices(
                d, sort_keys=[("user_id", "ascending"), ("w", "ascending")]
            )
        )
        first, run_start = _uid_runs(d.column("user_id"))
        wk = d.column("w").to_numpy(zero_copy_only=False)
        w0 = wk[run_start]
        return pa.table(
            {
                "cohort_week": pa.array(w0, pa.int64()),
                "week_offset": pa.array(wk - w0, pa.int64()),
                "p_n": pa.array(np.ones(len(wk), dtype=np.int64)),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    partial = shard_map_groups(ds, ["user_id"], per_user)
    return partial.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("p_n", alias_name="n_users")
    )


COHORT_RETENTION_SQL = """
WITH a AS (
  SELECT user_id, CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS w
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), f AS (
  SELECT user_id, min(w) AS w0 FROM a GROUP BY user_id
), d AS (
  SELECT DISTINCT a.user_id, f.w0 AS cohort_week, a.w - f.w0 AS week_offset
  FROM a JOIN f ON a.user_id = f.user_id
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM d GROUP BY cohort_week, week_offset
"""


# --- per-key linear regression -------------------------------------------------


def user_value_trend(sf_dir: str) -> "ray.data.Dataset":
    """Per-user least-squares trend of value over time (SQL
    ``regr_slope`` / ``regr_intercept`` with x = hours since epoch) —
    the per-entity drift signal behind anomaly detection and
    forecasting features.

    One hash shuffle on user_id; each group computes centered
    co-moments in float64 (shift-invariant, so centering is free
    numerical stability — the raw Σx² of microsecond epochs would
    cancel catastrophically). Rows where EITHER x or y is missing are
    excluded pairwise, exactly regr_*'s NULL semantics; a stored NaN
    value is declared missing on both sides (the NaN→NULL CASE in the
    oracle). Groups with <2 distinct x or zero x-variance emit NULL
    slope, like SQL. Both coefficients rounded(6) on both sides
    (order-dependent float sums)."""

    def trend(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g, keys=(("user_id", "ascending"),))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                }
            )
        first, run_start = _uid_runs(g.column("user_id"))
        starts = np.flatnonzero(first)
        run_of = np.cumsum(first) - 1
        ts = g.column("ts")
        v = g.column("value").to_numpy(zero_copy_only=False)
        ok = pc.is_valid(ts).to_numpy(zero_copy_only=False) & ~np.isnan(v)
        x = np.where(
            ok, pc.fill_null(ts.cast(pa.int64()), 0).to_numpy(zero_copy_only=False) / 3.6e9, 0.0
        )
        y = np.where(ok, v, 0.0)
        # two reduceat passes: per-run means, then centered co-moments
        # (centering per run keeps the numerics of the per-group kernel)
        cnt = np.add.reduceat(ok.astype(np.float64), starts)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        safe = np.maximum(cnt, 1.0)
        mx, my = sx / safe, sy / safe
        dx = np.where(ok, x - mx[run_of], 0.0)
        dy = np.where(ok, y - my[run_of], 0.0)
        sxx = np.add.reduceat(dx * dx, starts)
        sxy = np.add.reduceat(dx * dy, starts)
        has = (cnt >= 1.0) & (sxx > 0.0)
        slope = np.where(has, sxy / np.where(sxx > 0, sxx, 1.0), np.nan)
        intercept = my - slope * mx
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "slope": pa.array(np.round(slope, 6), pa.float64(), mask=~has),
                "intercept": pa.array(np.round(intercept, 6), pa.float64(), mask=~has),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], trend)


USER_VALUE_TREND_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) / 3600000000.0 AS x,
         CASE WHEN isnan(value) THEN NULL ELSE value END AS y
  FROM events
)
SELECT user_id,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept
FROM e GROUP BY user_id
"""


# --- interval-union coverage ---------------------------------------------------

SESSION_US = 1_800_000_000  # each event opens a 30-minute activity interval


def user_coverage(sf_dir: str) -> "ray.data.Dataset":
    """Per-user total covered time: each event opens a 30-minute
    interval; overlapping intervals merge (the interval-union /
    utilization primitive SQL needs a running-max window trick for).
    Exact integer-microsecond arithmetic end to end — the sum is an
    int64, so engine and oracle agree bit-for-bit with no rounding.

    One hash shuffle on user_id; each group sorts its start times and
    clips each interval by the running max of prior ends
    (``np.maximum.accumulate``) — vectorized, no row loop. NULL ts /
    NULL user rows are excluded on both sides."""

    def cover(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("ts", "ascending")))
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "covered_us": pa.array([], pa.int64())}
            )
        first, _ = _uid_runs(g.column("user_id"))
        s = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # fixed-length intervals sorted by start ⇒ ends are sorted too,
        # so the running max of prior ends is simply the PREVIOUS end:
        # each row covers min(s_i − s_{i−1}, L); a run's first covers L
        gap = np.empty(n, dtype=np.int64)
        gap[0] = SESSION_US
        gap[1:] = np.minimum(s[1:] - s[:-1], SESSION_US)
        gap[first] = SESSION_US
        starts = np.flatnonzero(first)
        P = np.concatenate(([0], np.cumsum(gap)))
        ends = np.append(starts[1:], n)
        covered = P[ends] - P[starts]
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "covered_us": pa.array(covered, pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    flt = pc.is_valid(pc.field("ts")) & pc.is_valid(pc.field("user_id"))
    ds = _events(sf_dir, ["user_id", "ts"], flt=flt)
    return shard_map_groups(ds, ["user_id"], cover)


USER_COVERAGE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv
)
SELECT user_id,
       CAST(sum(CASE WHEN pmax IS NULL OR pmax <= s THEN e - s
                     WHEN e > pmax THEN e - pmax ELSE 0 END) AS BIGINT) AS covered_us
FROM m GROUP BY user_id
"""


def events_hopping(sf_dir: str) -> "pa.Table":
    """Hopping (sliding) window aggregate: 1-hour windows advancing every
    15 minutes, keyed by the window's start expressed in hop units
    (``window_q``). Each event belongs to exactly size/hop = 4
    overlapping windows — the one streaming-window shape the tumbling
    ``events_windowed`` (queries.py) cannot express.

    Plan: the replicate-into-owning-windows step is a vectorized
    per-batch expansion (four Arrow column slices concatenated — no row
    loop), immediately pre-aggregated per (user, window) INSIDE the
    batch, so the exchange moves per-batch partial rows, never the
    4x-replicated event stream. At 100 TB the shuffled volume is
    O(users x windows x blocks), independent of per-window event
    counts. NaN/NULL semantics mirror events_windowed: Arrow sum skips
    NULLs exactly like SQL, and a NaN counter re-poisons groups whose
    sum SQL would make NaN (Ray's Sum-over-partials would silently skip
    them)."""
    def partial(t: pa.Table) -> pa.Table:
        # a NULL ts owns no window: the oracle's unnest over a NULL
        # series emits nothing, so the row drops here too (fuzz catch)
        t = t.filter(pc.is_valid(t.column("ts")))
        # float divide BEFORE floor so pre-1970 (negative) timestamps
        # bucket identically to the oracle's floor(epoch(ts)/900)
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.int64()), pa.float64())
        m = pc.cast(pc.floor(pc.divide(ts_us, 9.0e8)), pa.int64())
        v = t.column("value")
        nan_mask = pc.and_(pc.is_valid(v), pc.is_nan(pc.fill_null(v, 0.0)))
        base = pa.table(
            {
                "user_id": t.column("user_id"),
                "window_q": m,
                "value": pc.if_else(nan_mask, pa.scalar(0.0), v),
                "is_nan": pc.cast(nan_mask, pa.int64()),
            }
        )
        # window w (in hop units) contains ts iff w*hop <= ts < w*hop + 4*hop
        # => w in {m-3 .. m}: emit the four owning-window replicas
        reps = [
            base.set_column(1, "window_q", pc.subtract(m, pa.scalar(i, pa.int64())))
            for i in range(4)
        ]
        exp = pa.concat_tables(reps)
        g = pa.TableGroupBy(exp, ["user_id", "window_q"]).aggregate(
            [("value", "sum"), ("is_nan", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["user_id", "window_q", "p_sum", "p_nan", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    ds = _events(sf_dir, ["user_id", "ts", "value"])
    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_aggregate(
        ds,
        ["user_id", "window_q"],
        [("p_sum", "sum"), ("p_nan", "sum"), ("p_n", "sum")],
        ["user_id", "window_q", "sum_value", "n_nan", "n_events"],
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out.loc[out["n_nan"] > 0, "sum_value"] = np.nan
    out["n_events"] = out["n_events"].astype("int64")
    return out.drop(columns=["n_nan"])


EVENTS_HOPPING_SQL = """
SELECT user_id, window_q, round(sum(value), 2) AS sum_value, count(*) AS n_events
FROM (
  SELECT user_id, value,
         unnest(generate_series(CAST(floor(epoch(ts) / 900) AS BIGINT) - 3,
                                CAST(floor(epoch(ts) / 900) AS BIGINT))) AS window_q
  FROM events)
GROUP BY user_id, window_q
"""


def time_decay_agg(sf_dir: str, tau_us: float = 86_400_000_000.0) -> pd.DataFrame:
    """Exponentially time-decayed per-user value sum — the classic
    recency-weighted feature (decayed activity/engagement score):
    ``sum(value * exp(-(t_anchor - ts)/tau))`` with tau = 1 day and the
    anchor pinned to the corpus-wide max timestamp so both engines weigh
    every event identically.

    Scale shape: pass 1 is an O(1)-result distributed max; pass 2
    pre-combines decayed partials per (user, batch) — exp is applied
    element-wise against the broadcast anchor, so partial sums are
    exact and associative — and ONE coarse-shard exchange merges them.
    NULL value or NULL ts contributes NULL (skipped by sum, a user with
    no valid contribution reports NULL, like SQL SUM). Rounded to 6
    decimals: both engines compute the identical libm double per
    element; only the summation ORDER differs."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])
    anchor = ds.max("ts")
    anchor_us = pa.scalar(anchor, pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value")
        ok = pc.and_(pc.is_valid(v), pc.is_valid(t.column("ts"))).to_numpy(zero_copy_only=False)
        w = np.exp(-(anchor_us - ts_us.astype(np.float64)) / tau_us)
        contrib = v.to_numpy(zero_copy_only=False) * w
        g = pa.TableGroupBy(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "c": pa.array(np.where(ok, contrib, 0.0), pa.float64(), mask=~ok),
                }
            ),
            ["user_id"],
        ).aggregate([("c", "sum")])
        return g.rename_columns(["user_id", "p_sum"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_aggregate(parts, ["user_id"], [("p_sum", "sum")], ["user_id", "decayed_sum"]).to_pandas()
    out["decayed_sum"] = out["decayed_sum"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


TIME_DECAY_AGG_SQL = """
WITH a AS (SELECT max(epoch_us(ts)) AS t0 FROM events)
SELECT user_id,
       round(sum(value * exp(-(a.t0 - epoch_us(ts)) / 86400000000.0)), 6) AS decayed_sum
FROM events, a
GROUP BY user_id
ORDER BY user_id
"""


def events_gap_dedup(sf_dir: str, gap_us: int = 5_000_000) -> "ray.data.Dataset":
    """Window-gap event dedup — the standard double-fire/bot-burst
    filter in event pipelines: drop an event when the SAME user emitted
    the SAME event_type within the previous ``gap_us`` (lag-based, i.e.
    measured against the immediately preceding RAW event, exactly SQL's
    ``lag(ts) IS NULL OR ts - lag(ts) > INTERVAL``).

    ONE coarse-shard exchange on user_id; the shard kernel sorts by
    (user, type, ts, event_id) and computes the keep mask over run
    boundaries vectorized — no per-key Python. NULL semantics mirror
    the SQL exactly: a NULL-ts row never beats the gap test (NULL
    comparison is false) but IS kept when its predecessor's ts is NULL
    (lag(ts) IS NULL), with NULLS LAST ordering on both sides."""

    def dedup_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        g = g.take(order)
        n = g.num_rows
        if n == 0:
            return g
        uid = g.column("user_id")
        uv = pc.fill_null(uid, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        un = pc.is_valid(uid).to_numpy(zero_copy_only=False)
        et = g.column("event_type")
        # dictionary-encode the type so the run compare is int-vectorized
        codes = pc.dictionary_encode(et.combine_chunks()).indices
        ec = pc.fill_null(codes, -1).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        same_run = np.zeros(n, dtype=bool)
        if n > 1:
            same_run[1:] = (uv[1:] == uv[:-1]) & (un[1:] == un[:-1]) & (ec[1:] == ec[:-1])
        ts = g.column("ts")
        tv = pc.fill_null(pc.cast(ts, pa.int64()), 0).to_numpy(zero_copy_only=False)
        tn = pc.is_valid(ts).to_numpy(zero_copy_only=False)
        prev_ts_valid = np.concatenate(([False], tn[:-1]))
        gap_ok = np.zeros(n, dtype=bool)
        if n > 1:
            gap_ok[1:] = tn[1:] & tn[:-1] & ((tv[1:] - tv[:-1]) > gap_us)
        keep = (~same_run) | (~prev_ts_valid) | gap_ok
        return g.filter(pa.array(keep)).select(["event_id", "user_id", "event_type", "ts"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    return shard_map_groups(ds, ["user_id"], dedup_shard)


EVENTS_GAP_DEDUP_SQL = """
SELECT event_id, user_id, event_type, ts
FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 5 SECOND
"""


US_PER_10MIN = 600_000_000


def interval_join_events(sf_dir: str) -> "ray.data.Dataset":
    """Interval (stream-stream) join emitting the PAIR LIST: every
    ``click`` matched to the same user's ``view`` events with
    ``view.ts`` in ``[click.ts - 10min, click.ts]`` — the
    attribution-join shape (which impression led to this click).
    Complements ``range_join_counts``: that op returns band COUNTS
    (linear output, the safe default at scale); this one returns the
    pairs themselves, the right tool when the window is an attribution
    bound and the per-user event density is moderate. Output size is
    bounded by clicks x views-per-window; a pathological hot window
    should use the count variant or a tighter bound.

    Same one-exchange shape as the rest of this module: hash shard on
    user_id, shard sorted once by (user_id, ts, event_id), run-local
    monotone keys let TWO global ``np.searchsorted`` probes find every
    click's view band, and the pair list materializes with numpy
    repeat/arange index algebra — no Python per-row work. NULL user_id
    or ts rows are dropped up front (SQL inner-join/BETWEEN semantics:
    they can never match)."""

    def pairs(g: pa.Table) -> pa.Table:
        g = g.filter(
            pc.and_(pc.is_valid(g.column("user_id")), pc.is_valid(g.column("ts")))
        )
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "click_id": pa.array([], pa.int64()),
                "view_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        g = _sorted_shard(g)
        first, run_start = _uid_runs(g.column("user_id"))
        ts_s = g.column("ts").cast(pa.int64()).to_numpy()
        key = _run_local_key(ts_s, run_start, US_PER_10MIN)
        et = g.column("event_type")
        is_click = pc.fill_null(pc.equal(et, "click"), False).to_numpy(zero_copy_only=False)
        is_view = pc.fill_null(pc.equal(et, "view"), False).to_numpy(zero_copy_only=False)
        if not is_click.any() or not is_view.any():
            return empty
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cpos, vpos = np.flatnonzero(is_click), np.flatnonzero(is_view)
        ckey, vkey = key[cpos], key[vpos]
        lo = np.searchsorted(vkey, ckey - US_PER_10MIN, side="left")
        hi = np.searchsorted(vkey, ckey, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        crep = np.repeat(cpos, cnt)
        starts = np.cumsum(cnt) - cnt
        vsel = vpos[np.arange(total) - np.repeat(starts, cnt) + np.repeat(lo, cnt)]
        return pa.table(
            {
                "user_id": pc.take(g.column("user_id"), pa.array(crep, pa.int64())),
                "click_id": pa.array(eid[crep], pa.int64()),
                "view_id": pa.array(eid[vsel], pa.int64()),
                "gap_us": pa.array(ts_s[crep] - ts_s[vsel], pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    return shard_map_groups(ds, ["user_id"], pairs)


INTERVAL_JOIN_EVENTS_SQL = """
SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id,
       epoch_us(a.ts) - epoch_us(b.ts) AS gap_us
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'view'
  AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts
"""


US_PER_15MIN = 900_000_000
_LATE_BUCKET = 4096  # arrival-id bucket width (ids are a dense ingestion sequence)
_TS_NEG_INF = -(1 << 62)


def late_events(sf_dir: str) -> "ray.data.Dataset":
    """Watermark / late-data labeling — the streaming-ingestion
    primitive Flink calls *allowed lateness*: treating ``event_id`` as
    the arrival (ingestion) sequence, the watermark when a row arrives
    is max(event-time of everything that arrived STRICTLY before) minus
    a 15-minute allowed lateness; a row is LATE iff its own event time
    is behind that watermark. Emits the running pre-arrival max and the
    verdict, so downstream can route late rows to a correction path.

    Distributed as global_rank's two-pass monotone-bucket shape (a
    running max, like a rank, is a prefix scan): pass 1 reduces each
    batch to per-bucket MAX partials (bucket = arrival_id / 4096 — a
    monotone function of the scan order), the driver prefix-maxes the
    tiny histogram and broadcasts exclusive per-bucket watermark bases;
    pass 2 is ONE bucket shuffle where each group sorts by arrival id,
    ``np.maximum.accumulate``s its own times, shifts by one row, and
    folds in the broadcast base. NULL event times never advance the
    watermark (SQL max semantics) and are themselves never late
    (NULL < x is NULL -> false on both sides). Assumes arrival ids are
    unique — a ROWS frame over tied ORDER BY keys is nondeterministic
    in SQL too."""
    ds = _events(sf_dir, ["event_id", "ts"])

    def bucket_max(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts_i = t.column("ts").cast(pa.int64())
        valid = pc.is_valid(ts_i).to_numpy(zero_copy_only=False)
        ts_np = np.where(valid, pc.fill_null(ts_i, _TS_NEG_INF).to_numpy(zero_copy_only=False), _TS_NEG_INF)
        b = np.floor_divide(eid, _LATE_BUCKET)
        ub, inv = np.unique(b, return_inverse=True)
        mx = np.full(len(ub), _TS_NEG_INF, dtype=np.int64)
        np.maximum.at(mx, inv, ts_np)
        return pa.table({"bucket": pa.array(ub, pa.int64()), "p_max": pa.array(mx, pa.int64())})

    from ray.data.aggregate import Max

    hist = (
        ds.map_batches(bucket_max, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("p_max", alias_name="mx"))
        .to_pandas()  # O(buckets) rows — the histogram, never the data
        .sort_values("bucket")
    )
    mx = hist["mx"].to_numpy()
    # exclusive prefix max: the watermark base a bucket inherits from
    # every bucket strictly below it
    base = np.concatenate(([_TS_NEG_INF], np.maximum.accumulate(mx)[:-1]))
    bases = dict(zip(hist["bucket"].astype(int), base))
    base_ref = ray.put(bases)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.floor_divide(t.column("event_id").to_numpy(zero_copy_only=False), _LATE_BUCKET)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    def label(g: pa.Table) -> pa.Table:
        bases_l = ray.get(base_ref)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.argsort(eid)
        eid = eid[order]
        ts_i = g.column("ts").cast(pa.int64())
        valid = pc.is_valid(ts_i).to_numpy(zero_copy_only=False)[order]
        ts_np = np.where(
            valid, pc.fill_null(ts_i, _TS_NEG_INF).to_numpy(zero_copy_only=False)[order], _TS_NEG_INF
        )
        run = np.maximum.accumulate(ts_np)
        prev = np.concatenate(([_TS_NEG_INF], run[:-1]))
        prevmax = np.maximum(prev, bases_l.get(int(eid[0]) // _LATE_BUCKET, _TS_NEG_INF))
        has_prev = prevmax != _TS_NEG_INF
        late = valid & has_prev & (ts_np < prevmax - US_PER_15MIN)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "max_prev_ts": pa.array(prevmax, pa.int64(), mask=~has_prev).cast(
                    pa.timestamp("us")
                ),
                "is_late": pa.array(late.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(label, batch_format="pyarrow")
    )


LATE_EVENTS_SQL = """
SELECT event_id,
       max(ts) OVER w AS max_prev_ts,
       CAST(coalesce(ts < max(ts) OVER w - INTERVAL 15 MINUTE, FALSE) AS BIGINT) AS is_late
FROM events
WINDOW w AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def events_centered_mean(sf_dir: str) -> "ray.data.Dataset":
    """Centered positional rolling mean — SQL ``avg(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2
    PRECEDING AND 2 FOLLOWING)``: the smoothing frame (±2 ROWS, not a
    time RANGE) every trend dashboard uses. Complements
    ``events_rolling``: that is the trailing time-range frame; this is
    the centered row-count frame, whose window edges clamp at each
    user's run boundaries rather than at a time horizon.

    Same one-exchange coarse-shard kernel family: window sums come from
    the run-aware prefix arrays, and the positional [i-2, i+3) bounds
    are two clamps against the run extents — no searchsorted needed,
    the frame is positional by definition. NULL values are ignored
    (frame-of-only-NULLs -> NULL), a VALID NaN poisons exactly the
    frames containing it (the fuzz-pinned three-way convention of
    events_rolling), and the order-dependent float mean is rounded to 6
    on both sides."""

    def centered(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        first, run_start = _uid_runs(g.column("user_id"))
        pos = np.arange(n)
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n)
        run_id = np.cumsum(first) - 1
        run_end = ends[run_id]
        lo = np.maximum(run_start, pos - 2)
        hi = np.minimum(run_end, pos + 3)
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(g.column("value")).to_numpy(zero_copy_only=False)
        is_nan = valid & np.isnan(val_s)
        csum = np.concatenate(([0.0], np.cumsum(np.where(valid & ~is_nan, val_s, 0.0))))
        ccnt = np.concatenate(([0], np.cumsum((valid & ~is_nan).astype(np.int64))))
        cnan = np.concatenate(([0], np.cumsum(is_nan.astype(np.int64))))
        n_valid = ccnt[hi] - ccnt[lo] + (cnan[hi] - cnan[lo])
        with np.errstate(invalid="ignore", divide="ignore"):
            means = np.round((csum[hi] - csum[lo]) / np.maximum(n_valid, 1), 6)
        means = np.where(cnan[hi] - cnan[lo] > 0, np.nan, means)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "centered_avg": pa.array(means, pa.float64(), mask=n_valid == 0),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], centered)


EVENTS_CENTERED_MEAN_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS centered_avg
FROM events
"""


TOP_PATHS_K = 20


def top_paths(sf_dir: str, k: int = TOP_PATHS_K) -> pd.DataFrame:
    """Frequent behavior sequences — the top-k third-order event paths
    (e1 -> e2 -> e3 within one user, consecutive in (ts, event_id)
    order): the sequence-mining rollup behind "what do users do next"
    dashboards, one order above ``event_transitions``' Markov pairs.

    Same model-sized-partials plan: one user_id hash shuffle; each
    shard takes its sorted type column three ways (two zero-copy
    slices), masks trigrams that cross a user run boundary, and
    pre-counts its own (e1,e2,e3) triples with an Arrow group-by — the
    second exchange moves at most |types|^3 rows per shard. Rows with
    any NULL type are dropped (SQL's WHERE over two lead()s), and the
    final top-k is fully tie-pinned (n desc, then path asc)."""
    from ray.data.aggregate import Sum

    def tri(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "e1": pa.array([], pa.string()),
                "e2": pa.array([], pa.string()),
                "e3": pa.array([], pa.string()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 3:
            return empty
        g = _sorted_shard(g)
        first, _ = _uid_runs(g.column("user_id"))
        et = g.column("event_type").combine_chunks()
        n = len(et)
        within = (~first[1:-1]) & (~first[2:])  # i, i+1, i+2 share one user
        t = pa.table(
            {"e1": et.slice(0, n - 2), "e2": et.slice(1, n - 2), "e3": et.slice(2)}
        ).filter(pa.array(within))
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("e1")),
                pc.and_(pc.is_valid(t.column("e2")), pc.is_valid(t.column("e3"))),
            )
        )
        if t.num_rows == 0:
            return empty
        agg = pa.TableGroupBy(t, ["e1", "e2", "e3"]).aggregate([([], "count_all")])
        return agg.rename_columns(["e1", "e2", "e3", "p_n"])

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    out = (
        shard_map_groups(ds, ["user_id"], tri)
        .groupby(["e1", "e2", "e3"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # <= |types|^3 rows — the model, never the events
    )
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "e1", "e2", "e3"], ascending=[False, True, True, True])
    return out.head(k).reset_index(drop=True)


TOP_PATHS_SQL = """
WITH w AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM w WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
"""


def user_scd2(sf_dir: str) -> "ray.data.Dataset":
    """SCD Type-2 history build (the Kimball slowly-changing-dimension
    pattern a warehouse runs to turn a change stream into validity
    intervals): each user's event stream becomes one row per state
    change — (user_id, event_type, valid_from, valid_to, is_current) —
    where consecutive SAME-type events collapse into one interval and
    the open interval carries valid_to = NULL.

    Scale shape: the same ONE coarse-shard exchange as the other
    per-user window kernels (stages/agg.py — a user's rows never split
    across shards); the shard kernel sorts once by (user, ts, event_id)
    and finds state-change boundaries with one vectorized
    shift-compare, so intervals are numpy slices, not a Python loop
    over rows."""

    def intervals(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "valid_from": pa.array([], pa.timestamp("us")),
                    "valid_to": pa.array([], pa.timestamp("us")),
                    "is_current": pa.array([], pa.int64()),
                }
            )
        first, _ = _uid_runs(g.column("user_id"))
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        # a new interval starts at a user boundary or a type change
        change = first.copy()
        change[1:] |= et[1:] != et[:-1]
        starts = np.flatnonzero(change)
        # interval end = start of the next interval within the same user,
        # NULL (open) for each user's last interval
        last_of_user = np.concatenate((first[1:], [True]))
        interval_is_last = last_of_user[
            np.concatenate((starts[1:] - 1, [n - 1]))
        ]
        tsv = pc.is_valid(g.column("ts")).to_numpy(zero_copy_only=False)
        ts = (
            pc.fill_null(g.column("ts"), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # valid_from inherits the start row's (possibly NULL) ts;
        # valid_to is the NEXT start's ts — NULL when there is no next
        # start in the user OR that start has NULL ts, and the oracle's
        # is_current is literally `valid_to IS NULL` (NULL-ts fuzz)
        vt_idx = np.concatenate((starts[1:], [0]))
        valid_to_null = interval_is_last | ~tsv[vt_idx]
        return pa.table(
            {
                "user_id": g.column("user_id").take(pa.array(starts)),
                "event_type": pa.array(et[starts], pa.string()),
                "valid_from": pa.array(ts[starts], pa.int64(), mask=~tsv[starts]).cast(
                    pa.timestamp("us")
                ),
                "valid_to": pa.array(ts[vt_idx], pa.int64(), mask=valid_to_null).cast(
                    pa.timestamp("us")
                ),
                "is_current": pa.array(valid_to_null.astype(np.int64), pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    return shard_map_groups(ds, ["user_id"], intervals)


USER_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type,
         row_number() OVER w = 1 AS is_first
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  -- IS DISTINCT FROM, not <>: a NULL event_type is its own state (the
  -- engine's convention), so (a -> NULL) starts an interval and
  -- (NULL -> NULL) merges; plain <> would silently swallow NULL runs
  -- into the previous interval (NULL-event_type fuzz)
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM ordered
  WHERE is_first OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from, valid_to,
       CAST(valid_to IS NULL AS BIGINT) AS is_current
FROM starts
"""


# --- exponential smoothing (EWMA) ------------------------------------------

EWMA_ALPHA = 0.3


def events_ewma(sf_dir: str) -> "ray.data.Dataset":
    """Per-user exponentially weighted moving average of ``value`` in
    (ts, event_id) order — the classic recency-weighted feature
    (pandas ``ewm(alpha, adjust=False)`` semantics: ``y_1 = x_1``,
    ``y_i = a*x_i + (1-a)*y_{i-1}``). NULL values are skipped by the
    recursion and emit NULL; a valid NaN enters the state and poisons
    every later reading of that user, exactly as the oracle's weighted
    SUM does.

    The recursion is sequential per user, but the kernel loops over
    neither rows nor users: a first-order linear recurrence is a
    parallel prefix scan over (multiplier, addend) pairs, so the shard
    advances by Hillis–Steele doubling — ceil(log2(rows)) vectorized
    passes composing ``y_i = m·y_{i-d} + b``. Each run's first valid
    row is an ABSORBING seed (m = 0, b = x), which both encodes
    ``y_1 = x_1`` and guarantees no composition ever crosses a user
    boundary: an element at in-run position q freezes (m = 0) once
    d > q, and while d ≤ q the partner index stays inside the run by
    construction. No rescaled closed form is involved — an earlier
    blockwise ``x·c^-j`` cumsum variant lost ~1e-2 of precision to
    cross-segment cancellation (caught by the forced-2-shard fuzz);
    the scan's quantities all stay at the scale of y itself. One
    user_id hash shuffle, same partitioning contract as the rest of
    this module."""

    a = EWMA_ALPHA
    c = 1.0 - a

    def smooth(g: pa.Table) -> pa.Table:
        g = _sorted_shard(g)
        n = g.num_rows
        if n == 0:
            return g
        val_s = g.column("value").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(g.column("value")).to_numpy(zero_copy_only=False)
        out = np.full(n, np.nan)
        vidx = np.flatnonzero(valid)
        if len(vidx):
            x = val_s[vidx].astype(np.float64, copy=False)
            first, _ = _uid_runs(g.column("user_id").take(pa.array(vidx)))
            m_coef = np.where(first, 0.0, c)
            b = np.where(first, x, a * x)
            d = 1
            while d < len(x):
                m_prev = m_coef[:-d].copy()
                b_prev = b[:-d].copy()
                live = m_coef[d:] != 0.0  # frozen rows (incl. seeds) stay put
                # 0 * NaN is NaN, so the frozen guard also stops a NaN
                # poisoned run from leaking into the NEXT run's seed
                b[d:] = np.where(live, b[d:] + m_coef[d:] * b_prev, b[d:])
                m_coef[d:] = m_coef[d:] * m_prev
                d *= 2
            # +1e-9 tie-nudge before rounding, identically on both
            # sides: EWMA of 2-decimal inputs lands on EXACT decimal
            # .xxxxx5 ties at every shallow position (y_k has k+2 exact
            # decimals), where numpy (half-even) and DuckDB (half-away)
            # disagree — measured 2-7 flips per 10k rows at any fixed
            # rounding depth. The nudge moves every exact tie 1e-9 off
            # the boundary (ulp noise is ~1e-13), after which the
            # tie-break convention never engages.
            out[vidx] = np.round(b + 1e-9, 6)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "ewma": pa.array(out, pa.float64(), mask=~valid),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], smooth)


# Closed-form oracle: y_i = sum_j w_ij x_j with w = a*c^(i-j) (j>1) and
# c^(i-1) for the seed row — the j<=i self-join is O(run^2) per user,
# fine at oracle scale and exactly the recursion unrolled.
EVENTS_EWMA_SQL = f"""
WITH v AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM events WHERE value IS NOT NULL
),
e AS (
  SELECT a.user_id, a.event_id,
         sum(b.value * CASE WHEN b.p = 1 THEN power({1.0 - EWMA_ALPHA}, a.p - 1)
                            ELSE {EWMA_ALPHA} * power({1.0 - EWMA_ALPHA}, a.p - b.p) END) AS y
  FROM v a JOIN v b
    ON a.user_id IS NOT DISTINCT FROM b.user_id AND b.p <= a.p
  GROUP BY a.user_id, a.event_id
)
SELECT ev.event_id, ev.user_id, ev.ts, round(e.y + 1e-9, 6) AS ewma
FROM events ev LEFT JOIN e ON ev.event_id = e.event_id
"""


def events_ohlc(sf_dir: str) -> "ray.data.Dataset":
    """Per-(user, hour) OHLC resample — open/high/low/close of
    ``value`` within each user's hourly bucket under the pinned
    (ts, event_id) order, the classic time-series downsample feature.

    One user_id hash shuffle; inside the shard every (user, hour)
    group is a contiguous run of the (user, ts, event_id)-sorted rows,
    so open/close are run-boundary picks and high/low are
    ``np.maximum/minimum.reduceat`` over run starts — no Python loop
    over groups. NULL values are excluded everywhere (a group of only
    NULLs does not emit); NULL ts rows are excluded (no bucket). A
    valid NaN follows the SQL three-way convention: it is the GREATEST
    value (high = NaN when present, low picks the smallest real number
    unless the group is all-NaN), and open/close report it verbatim
    when it sits at the boundary."""

    def ohlc(g: pa.Table) -> pa.Table:
        g = g.filter(pc.and_(pc.is_valid(g.column("value")), pc.is_valid(g.column("ts"))))
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "open": pa.array([], pa.float64()),
                    "high": pa.array([], pa.float64()),
                    "low": pa.array([], pa.float64()),
                    "close": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = _sorted_shard(g)
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        hour = (ts // US_PER_HOUR) * US_PER_HOUR
        # Validity-aware boundary test (the _uid_runs idiom): a bare
        # to_numpy on a NULL-bearing int column yields float NaN, and
        # NaN != NaN would split every NULL user into singleton groups
        # (then crash the int64 cast below). fill_null + is_valid keeps
        # NULL users as ONE group per hour, like SQL GROUP BY.
        uid_col = g.column("user_id")
        uid = pc.fill_null(uid_col, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        uvalid = pc.is_valid(uid_col).to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        n = len(v)
        first = np.ones(n, dtype=bool)
        first[1:] = (uid[1:] != uid[:-1]) | (uvalid[1:] != uvalid[:-1]) | (hour[1:] != hour[:-1])
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n) - 1
        counts = np.append(starts[1:], n) - starts
        is_nan = np.isnan(v)
        # high: SQL max = NaN iff any NaN in the group, else true max
        hi = np.maximum.reduceat(np.where(is_nan, -np.inf, v), starts)
        any_nan = np.add.reduceat(is_nan.astype(np.int64), starts) > 0
        hi = np.where(any_nan, np.nan, hi)
        # low: SQL min skips NaN (NaN sorts greatest) unless all-NaN
        lo = np.minimum.reduceat(np.where(is_nan, np.inf, v), starts)
        all_nan = np.add.reduceat(is_nan.astype(np.int64), starts) == counts
        lo = np.where(all_nan, np.nan, lo)
        return pa.table(
            {
                "user_id": uid_col.take(pa.array(starts, pa.int64())).combine_chunks(),
                "hour": pa.array(hour[starts], pa.int64()).cast(pa.timestamp("us")),
                "open": pa.array(v[starts], pa.float64()),
                "high": pa.array(hi, pa.float64()),
                "low": pa.array(lo, pa.float64()),
                "close": pa.array(v[ends], pa.float64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    return shard_map_groups(ds, ["user_id"], ohlc)


EVENTS_OHLC_SQL = """
WITH w AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value, ts, event_id
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, hour ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC) AS rrn
  FROM w
)
SELECT user_id, hour,
       max(CASE WHEN rn = 1 THEN value END)  AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rrn = 1 THEN value END) AS close,
       count(*) AS n
FROM r GROUP BY user_id, hour
"""


def funnel_windowed(sf_dir: str) -> "ray.data.Dataset":
    """Time-bounded funnel conversion — for every user, how many
    purchases were preceded by a view of the SAME user within the
    previous hour (strictly before: ``view.ts < purchase.ts`` and
    ``view.ts >= purchase.ts - 1h``). The windowed sibling of
    `user_funnel`, whose stages only had to be ordered, not close in
    time — attribution windows are how real conversion metrics are
    defined.

    Per-shard kernel: views and purchases are pulled from the same
    (user, ts)-sorted shard; each purchase answers its window with two
    ``np.searchsorted`` probes against a composite ``(uid << 44) | rel_ts``
    key over the VIEW subset (rel_ts spans < 2^44 µs ≈ 557 years,
    asserted), with the window start clamped to the uid's own key block
    so a probe can never leak into the previous user's tail. NULL-ts
    rows belong to no window on either side; NULL-user purchases never
    convert (SQL ``v.user_id = p.user_id`` semantics) but still count
    in their NULL group."""

    def fun(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g.column("ts")))
        g = _sorted_shard(g, keys=(("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")))
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_purchase": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        et = g.column("event_type")
        # NULL event_type compares to NULL — fill to False or the numpy
        # view is an object array whose None entries break `&` (fuzz)
        is_p = pc.fill_null(pc.equal(et, "purchase"), False).to_numpy(zero_copy_only=False)
        is_v = pc.fill_null(pc.equal(et, "view"), False).to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        uid_valid = pc.is_valid(g.column("user_id")).to_numpy(zero_copy_only=False)
        uid = pc.fill_null(g.column("user_id"), -1).to_numpy(zero_copy_only=False).astype(np.int64)
        rel = ts - ts.min()
        assert rel.max() < (1 << 44), "ts span exceeds composite key budget"
        # uid occupies the top 20 bits (incl. sign headroom): uid << 44
        # wraps int64 silently at uid >= 2^19, which would corrupt vkey
        # ordering — assert the budget like _run_local_key does.
        assert uid.max() < (1 << 19), "user_id exceeds composite key budget"
        key = (uid << np.int64(44)) | rel
        vkey = key[is_v & uid_valid]  # NULL-user views can never match
        p_idx = np.flatnonzero(is_p)
        if len(p_idx) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_purchase": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        kp = key[p_idx]
        block_start = uid[p_idx] << np.int64(44)
        lo = np.searchsorted(vkey, np.maximum(kp - US_PER_HOUR, block_start), side="left")
        hi = np.searchsorted(vkey, kp, side="left")  # strict: view.ts < purchase.ts
        conv = (hi > lo) & uid_valid[p_idx]
        pu = g.column("user_id").take(pa.array(p_idx))
        first, _ = _uid_runs(pu)
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "user_id": pu.take(pa.array(starts)),
                "n_purchase": pa.array(np.append(starts[1:], len(p_idx)) - starts, pa.int64()),
                "n_converted": pa.array(np.add.reduceat(conv.astype(np.int64), starts), pa.int64()),
            }
        )

    from bank_statement_pdf_parser_ray.stages.agg import shard_map_groups

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    return shard_map_groups(ds, ["user_id"], fun)


FUNNEL_WINDOWED_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
),
v AS (
  SELECT user_id, ts FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL
),
c AS (
  SELECT p.user_id, p.event_id,
         EXISTS (SELECT 1 FROM v
                 WHERE v.user_id = p.user_id
                   AND v.ts < p.ts
                   AND v.ts >= p.ts - INTERVAL 1 HOUR) AS conv
  FROM p
)
SELECT user_id, count(*) AS n_purchase,
       CAST(coalesce(sum(CAST(conv AS BIGINT)), 0) AS BIGINT) AS n_converted
FROM c GROUP BY user_id
"""
