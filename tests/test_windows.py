"""Edge cases for the ordered per-key operators in pipelines/windows.py
(as-of join, rolling range window, grouped top-k, discrete quantiles).
The happy path vs DuckDB is covered by test_driver_contract; these pin
the corner semantics a SQL diff would only hit by luck: no-prior-match
nulls, equal-timestamp peers in a RANGE frame, ties at the top-k
boundary, and the inverted_cdf == quantile_disc convention."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from bank_statement_pdf_parser_ray.pipelines.windows import (
    _rank_in_runs,
    _topk_order_rank,
)


def _events_table(rows):
    """rows: (event_id, user_id, ts_us, event_type, value)"""
    eid, uid, ts, et, val = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(val, pa.float64()),
        }
    )


def _write_events(tmp_path, rows):
    import pyarrow.parquet as pq

    t = _events_table(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


class TestAsofJoin:
    def test_no_prior_view_is_null_and_equal_ts_included(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import asof_join_events

        H = 3_600_000_000
        rows = [
            # user 1: purchase BEFORE any view -> nulls
            (1, 1, 0 * H, "purchase", 5.0),
            (2, 1, 1 * H, "view", 10.0),
            # equal-ts view with SMALLER event_id sorts before the purchase
            (4, 1, 2 * H, "purchase", 6.0),
            (3, 1, 2 * H, "view", 20.0),
            # later view must not leak backwards
            (5, 1, 3 * H, "view", 30.0),
            # clicks are filtered out entirely
            (6, 1, 2 * H, "click", 99.0),
            # user 2: independent history
            (7, 2, 5 * H, "view", 1.5),
            (8, 2, 6 * H, "purchase", 2.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = asof_join_events(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == [1, 4, 8]
        assert np.isnan(out["last_view_value"][0])
        assert out["last_view_ts"].isna()[0]
        assert out["last_view_value"][1] == 20.0  # equal-ts, lower-eid view counts
        assert out["last_view_value"][2] == 1.5


class TestRolling:
    def test_range_frame_includes_equal_ts_peers(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import events_rolling

        H = 3_600_000_000
        rows = [
            (1, 1, 0, "view", 1.0),
            (2, 1, H // 2, "view", 2.0),
            # two events at the SAME ts: each must see the other (RANGE peers)
            (3, 1, H, "view", 4.0),
            (4, 1, H, "view", 8.0),
            # exactly 1h after t=H/2: window [t-1h, t] is CLOSED on the left
            (5, 1, H + H // 2, "view", 16.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = events_rolling(sf).to_pandas().sort_values("event_id")
        got = dict(zip(out["event_id"], out["rolling_1h"]))
        assert got[1] == 1.0
        assert got[2] == 3.0
        assert got[3] == 15.0  # 1+2+4+8: peer at same ts included
        assert got[4] == 15.0
        assert got[5] == 30.0  # 2+4+8+16: event at exactly ts-1h included

    def test_old_events_fall_out(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import events_rolling

        H = 3_600_000_000
        rows = [(1, 7, 0, "view", 100.0), (2, 7, 2 * H, "view", 1.0)]
        sf = _write_events(tmp_path, rows)
        out = events_rolling(sf).to_pandas().sort_values("event_id")
        assert out["rolling_1h"].tolist() == [100.0, 1.0]


class TestGroupedTopk:
    def test_value_ties_break_by_event_id(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import grouped_topk_events

        rows = [
            (10, 1, 0, "view", 5.0),
            (11, 1, 1, "view", 5.0),
            (12, 1, 2, "view", 5.0),
            (13, 1, 3, "view", 5.0),  # tied 4th: must lose to lower event_ids
            (20, 2, 0, "view", 1.0),  # group smaller than k kept whole
        ]
        sf = _write_events(tmp_path, rows)
        out = grouped_topk_events(sf, k=3).to_pandas().sort_values(["user_id", "rn"])
        u1 = out[out["user_id"] == 1]
        assert u1["event_id"].tolist() == [10, 11, 12]
        assert u1["rn"].tolist() == [1, 2, 3]
        assert out[out["user_id"] == 2]["rn"].tolist() == [1]

    def test_partial_cut_agrees_with_global(self, tmp_path):
        """Many small blocks (partial pre-cut per block) must give the
        same answer as one block."""
        from bank_statement_pdf_parser_ray.pipelines.windows import grouped_topk_events

        rng = np.random.default_rng(7)
        rows = [
            (int(i), int(rng.integers(0, 5)), int(i), "view", float(rng.integers(0, 20)))
            for i in range(200)
        ]
        sf = _write_events(tmp_path, rows)
        out = grouped_topk_events(sf, k=3).to_pandas()
        # oracle in numpy over the full table
        eid = np.array([r[0] for r in rows])
        uid = np.array([r[1] for r in rows])
        val = np.array([r[4] for r in rows])
        order, rank = _topk_order_rank(uid, val, eid)
        keep = rank < 3
        exp = sorted(zip(uid[order][keep], eid[order][keep], rank[keep] + 1))
        got = sorted(zip(out["user_id"], out["event_id"], out["rn"]))
        assert got == exp


class TestRankInRuns:
    def test_basic(self):
        assert _rank_in_runs(np.array([1, 1, 1, 4, 4, 9])).tolist() == [0, 1, 2, 0, 1, 0]

    def test_single_run(self):
        assert _rank_in_runs(np.array([3, 3, 3])).tolist() == [0, 1, 2]


class TestQuantiles:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 10, 11])
    def test_inverted_cdf_matches_quantile_disc(self, n):
        import duckdb

        rng = np.random.default_rng(n)
        vals = np.round(rng.uniform(0, 100, n), 2)
        con = duckdb.connect()
        vlist = ",".join(f"(CAST({v} AS DOUBLE))" for v in vals)
        for q in (0.5, 0.9):
            exp = con.sql(f"SELECT quantile_disc(x,{q}) FROM (VALUES {vlist}) t(x)").fetchone()[0]
            got = float(np.quantile(vals, q, method="inverted_cdf"))
            assert got == exp, (n, q)
            # the pipeline's manual ceil-selection (NaN-safe variant)
            # must agree with inverted_cdf on clean data
            v = np.sort(vals)
            manual = float(v[max(0, int(np.ceil(q * len(v))) - 1)])
            assert manual == exp, (n, q)
        con.close()


class TestAsofNullViews:
    def test_null_valued_view_is_not_a_match(self, tmp_path):
        """A view row with NULL value must be skipped (oracle IGNORE
        NULLS semantics), falling back to the previous non-null view."""
        from bank_statement_pdf_parser_ray.pipelines.windows import asof_join_events
        import pyarrow.parquet as pq

        H = 3_600_000_000
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([0, H, 2 * H], pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(["view", "view", "purchase"]),
                "value": pa.array([7.0, None, 1.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = asof_join_events(str(tmp_path)).to_pandas()
        assert out["last_view_value"].tolist() == [7.0]
        assert out["last_view_ts"].astype("int64").tolist() == [0]


class TestAntiJoinEmptyProbe:
    def test_no_matching_orders_returns_all_customers(self, tmp_path):
        """Zero orders above the threshold must yield EVERY customer —
        the Dataset.join formulation crashed here (schema-less empty
        aggregate blocks -> ArrowInvalid); the cogroup one must not."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.queries import anti_join_customers

        pq.write_table(
            pa.table({"o_custkey": pa.array([1, 2], pa.int64()), "o_totalprice": pa.array([10.0, 20.0])}),
            str(tmp_path / "orders.parquet"),
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64()), "c_mktsegment": pa.array(["A", "B", "C"])}),
            str(tmp_path / "customer.parquet"),
        )
        out = anti_join_customers(str(tmp_path))
        assert sorted(out["c_custkey"].tolist()) == [1, 2, 3]


class TestStatsSingleRowGroup:
    def test_stddev_of_one_row_is_null(self, tmp_path):
        """stddev_samp(n=1) is NULL in SQL — the engine must emit NaN,
        not 0.0."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.queries import events_stats

        t = pa.table(
            {
                "event_type": pa.array(["click", "view", "view"]),
                "value": pa.array([5.0, 1.0, 3.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = events_stats(str(tmp_path)).set_index("event_type")
        assert np.isnan(out.loc["click", "stddev_value"])
        # unrounded since round 5 (half-way flip class); exact here
        assert out.loc["view", "stddev_value"] == np.std([1.0, 3.0], ddof=1)


class TestListMatrix:
    def test_rejects_null_and_ragged(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _list_matrix

        ok = pa.chunked_array([pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))])
        m = _list_matrix(ok)
        assert m.shape == (2, 2) and m.dtype == np.float64
        with pytest.raises(ValueError, match="null"):
            _list_matrix(pa.chunked_array([pa.array([[1.0], None], pa.list_(pa.float32()))]))
        with pytest.raises(ValueError, match="ragged"):
            _list_matrix(pa.chunked_array([pa.array([[1.0], [1.0, 2.0]], pa.list_(pa.float32()))]))

    def test_empty(self):
        from bank_statement_pdf_parser_ray.pipelines.datapipe import _list_matrix

        assert _list_matrix(pa.chunked_array([pa.array([], pa.list_(pa.float32()))])).shape == (0, 0)


class TestRandomizedOracleParity:
    """Engine vs DuckDB on seeded RANDOM events tables that are messier
    than the shared fixtures: duplicate timestamps, NULL values, skewed
    user distribution, ties everywhere. Catches semantic drift the
    curated fixtures would only hit by luck."""

    OPS = [
        "asof_join_events",
        "events_rolling",
        "events_lag_lead",
        "events_cumsum",
        "grouped_topk_events",
        "user_value_quantiles",
        "range_join_counts",
        "interval_join_events",
        "late_events",
        "events_centered_mean",
        "top_paths",
        "events_ranked",
        "events_percent_rank",
        "user_event_paths",
        "user_funnel",
        "event_transitions",
        "cohort_retention",
        "user_value_trend",
        "user_coverage",
        "date_funcs",
        "global_rank",
        "events_resampled",
        "value_quartiles",
        "value_histogram",
        "events_windowed",
        "events_sessionized",
        "events_ordered",
        "topk_users",
        "events_pivot",
        "events_stats",
        "key_skew_profile",
        "outlier_filter",
        "latest_events",
        "user_value_median",
        "null_funcs",
        "session_stats",
        "union_event_slices",
        "intersect_users",
        "except_users",
        "full_outer_user_activity",
        "time_decay_agg",
        "events_gap_dedup",
        "events_ewma",
        "events_ohlc",
        "funnel_windowed",
        "value_drift_psi",
        "type_drift_chi2",
        "robust_zscore",
        # round-4 batch 2: enrolled after the NULL-ts sweep fixed them
        "ab_welch_ttest",
        "approx_distinct_per_type_checked",
        "approx_distinct_users_checked",
        "distinct_users_per_type",
        "events_by_month",
        "events_hopping",
        "json_props_sum",
        "profile_events",
        "standardize_events",
        "target_encode_events",
        "union_distinct_users",
        "user_first_last",
        "user_scd2",
        "user_top_event",
        "winsorize_events",
        # round-5: the histogram sketch's hard signal (bin-width bound
        # vs the engine's own exact rank statistic — a theorem, so
        # random data cannot flake it)
        "approx_quantiles_events_checked",
    ]

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_windows_family_matches_duckdb(self, seed, tmp_path):
        self._run_family(seed, tmp_path)

    @pytest.mark.parametrize("seed", [4, 5])
    def test_windows_family_multiuser_shards(self, seed, tmp_path, monkeypatch):
        """Same engine-vs-DuckDB parity with the shard count FORCED to 2,
        so every shard holds MANY whole users: exercises the run-boundary
        logic (run-start re-localization, cross-user leak guards) that a
        128-shard run over a handful of fuzz users mostly skips — each
        user would otherwise land alone in its shard."""
        from bank_statement_pdf_parser_ray.stages import agg

        orig = agg.shard_map_groups

        def forced(ds, keys, fn, n_shards=128, coalesce_rows=65_536):
            return orig(ds, keys, fn, n_shards=2, coalesce_rows=coalesce_rows)

        monkeypatch.setattr(agg, "shard_map_groups", forced)
        self._run_family(seed, tmp_path)

    def _run_family(self, seed, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq

        import importlib.util, os, sys

        spec = importlib.util.spec_from_file_location(
            "_entry_for_fuzz", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        rng = np.random.default_rng(seed)
        n = 400
        H = 3_600_000_000
        ts = rng.integers(0, 6 * H, n)          # dense: many in-window neighbors
        ts[rng.random(n) < 0.2] = ts[0]          # planted duplicate timestamps
        vals = np.round(rng.uniform(0, 100, n), 2).astype(object)
        null_mask = rng.random(n) < 0.1
        nan_mask = (rng.random(n) < 0.03) & ~null_mask  # VALID NaN values: a third class
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                # skewed few users, plus ~6% NULL user_id so every
                # kernel's validity-aware run-boundary path is exercised
                # (r3 advice: events_ohlc crashed on NULL user_id because
                # nothing here ever emitted one)
                "user_id": pa.array(
                    [None if m else int(u) for m, u in zip(rng.random(n) < 0.06, rng.integers(0, 4, n))],
                    pa.int64(),
                ),
                # ~4% NULL ts: window membership, ordering ties, and
                # session/run boundaries must all agree with the SQL
                # NULL conventions, not just on dense valid timestamps
                "ts": pa.array(
                    [None if m else int(v) for m, v in zip(rng.random(n) < 0.04, ts)],
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                # ~4% NULL event_type: GROUP BY's NULL-forms-its-own-group
                # convention must hold in every keyed kernel, and the
                # *_checked estimate/exact key normalization (r4 advice:
                # None-vs-NaN pandas index miss) gets exercised
                "event_type": pa.array(
                    [
                        None if m else str(v)
                        for m, v in zip(
                            rng.random(n) < 0.04, rng.choice(["purchase", "view", "click"], n)
                        )
                    ],
                    pa.string(),
                ),
                "value": pa.array(
                    [
                        None if m else (float("nan") if nm else float(v))
                        for m, nm, v in zip(null_mask, nan_mask, vals)
                    ],
                    pa.float64(),
                ),
                "props": pa.array(
                    [
                        None if rng.random() < 0.15 else '{"k": %d}' % rng.integers(0, 99)
                        for _ in range(n)
                    ],
                    pa.string(),
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
        Q, O = entry.queries(), entry.oracle_sql()
        # Engine policy: quantiles IGNORE valid NaN like NULL. DuckDB's
        # own quantile_disc over NaN-containing input is measured
        # inconsistent (selection UB: [1,2,3,NaN,NaN] -> q0.5=NaN but
        # q0.9=3.0), so the fuzz oracle maps NaN->NULL inside the
        # aggregate to state well-defined semantics; the driver oracle
        # is untouched (shared tables are NaN-free).
        O = dict(O)
        # Same declared-semantics override for the pandas-kernel
        # sessionizer: a pandas DataFrame cannot distinguish NULL from
        # a stored NaN double (both are NaN in a float64 column), so
        # events_sessionized treats valid NaN as missing — the oracle
        # states that by mapping NaN->NULL inside the sum.
        O["events_sessionized"] = O["events_sessionized"].replace(
            "sum(value)", "sum(CASE WHEN isnan(value) THEN NULL ELSE value END)"
        )
        O["events_stats"] = """
SELECT event_type, count(*) AS n,
       avg(CASE WHEN isnan(value) THEN NULL ELSE value END) AS avg_value,
       stddev_samp(CASE WHEN isnan(value) THEN NULL ELSE value END) AS stddev_value
FROM events GROUP BY event_type
"""
        O["user_value_quantiles"] = """
SELECT user_id,
       quantile_disc(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.5) AS median_value,
       quantile_disc(CASE WHEN isnan(value) THEN NULL ELSE value END, 0.9) AS p90_value
FROM events GROUP BY user_id
"""

        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if pd.api.types.is_datetime64_any_dtype(df[c]):
                    df[c] = df[c].astype("datetime64[us]")
                elif pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        for name in self.OPS:
            r = Q[name](str(tmp_path))
            got = canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())
            exp = canon(con.sql(O[name]).df())
            assert list(got.columns) == list(exp.columns), name
            assert len(got) == len(exp), (name, len(got), len(exp))
            for c in got.columns:
                if pd.api.types.is_float_dtype(exp[c]):
                    ga = got[c].to_numpy(dtype=float)
                    ea = exp[c].to_numpy(dtype=float)
                    assert (np.isnan(ga) == np.isnan(ea)).all(), (name, c)
                    assert np.allclose(np.nan_to_num(ga), np.nan_to_num(ea), rtol=0, atol=1e-9), (name, c)
                else:
                    assert got[c].tolist() == exp[c].tolist(), (name, c)
        con.close()


class TestEventPathsNullType:
    def test_null_event_type_skipped_but_counted(self, tmp_path):
        """string_agg skips NULL elements while count(*) counts the
        row; an all-NULL group yields a NULL path."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.windows import user_event_paths

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array([0, 1, 2, 0], pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(["view", None, "click", None]),
                "value": pa.array([1.0] * 4, pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = user_event_paths(str(tmp_path)).to_pandas().set_index("user_id")
        assert out.loc[1, "path"] == "view>click" and out.loc[1, "n_events"] == 3
        assert out.loc[2, "path"] is None and out.loc[2, "n_events"] == 1


class TestSessionizedAllNullSession:
    def test_all_null_session_sums_to_null(self, tmp_path):
        """A session whose every value is NULL must report NULL
        sum_value (SQL sum over no non-null inputs), not pandas' 0.0."""
        import duckdb
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.queries import events_sessionized

        H = 3_600_000_000
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                # two sessions: [1,2] (gap < 30min, both NULL), [3]
                "ts": pa.array([0, 60_000_000, 3 * H], pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(["view"] * 3),
                "value": pa.array([None, None, 5.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = events_sessionized(str(tmp_path)).to_pandas().sort_values("session_id")
        assert np.isnan(out.iloc[0]["sum_value"])
        assert out.iloc[1]["sum_value"] == 5.0


class TestRandomizedDocumentsParity:
    """Seeded engine-vs-DuckDB parity for the documents-hosted queries
    over messy text: exotic whitespace (NBSP, ideographic space, tabs),
    combining marks, empty strings, exact duplicates, mixed scripts.
    The per-string hypothesis fuzz covers kernel semantics; this covers
    the DISTRIBUTED composition (group-by-text shuffles, partial
    counts, stratified cuts) end-to-end."""

    OPS = [
        "normalize_ws",
        "token_count",
        "token_count_bpe",
        "quality_score",
        "row_hash_md5",
        "exact_dedup",
        "corpus_clean",
        "vocab_topk",
        "tfidf_topterms",
        "unigram_logprob",
        "stratified_sample",
        "sample_documents",
        "prep_corpus",
        "pii_scrub",
        "repetition_ratio",
        "hash_split",
        "decontaminate",
        "mixture_sample",
        "passage_dedup",
        "gopher_quality",
        "bm25_search",
        "string_funcs",
        "char_entropy",
        "weighted_sample",
        "budget_select",
        "bigram_logprob",
        "source_cap",
        "chunk_documents",
        "build_index",
        "collocations",
        "fuzzy_clusters",
    ]

    @pytest.mark.parametrize("seed", [11, 12])
    def test_documents_family_matches_duckdb(self, seed, tmp_path):
        import duckdb
        import importlib.util
        import os
        import pandas as pd
        import pyarrow.parquet as pq

        spec = importlib.util.spec_from_file_location(
            "_entry_for_doc_fuzz", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        rng = np.random.default_rng(seed)
        alphabet = list("abcdef XY.,!?09") + [
            "\u00a0", "", "\u3000", "\u0301", "\u6c49", "\u00df", "\t", "\n"
        ]
        n = 300
        texts = []
        for i in range(n):
            k = int(rng.integers(0, 40))
            texts.append("".join(rng.choice(alphabet, k)))
        # planted exact duplicates (dedup must collapse them)
        for j in range(0, 30, 3):
            texts[j + 1] = texts[j]
        # planted NULL texts: md5(NULL)=NULL, GROUP BY text keeps one
        # NULL group, counts/filters treat NULL per SQL
        for j in range(40, 52, 4):
            texts[j] = None
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(rng.choice(["en", "de", "zz"], n)),
                "source": pa.array(["fuzz"] * n),
                "n_chars": pa.array([0 if s is None else len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")
        Q, O = entry.queries(), entry.oracle_sql()

        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        for name in self.OPS:
            r = Q[name](str(tmp_path))
            got = canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())
            exp = canon(con.sql(O[name]).df())
            assert list(got.columns) == list(exp.columns), name
            assert len(got) == len(exp), (name, len(got), len(exp))
            for c in got.columns:
                if pd.api.types.is_float_dtype(exp[c]):
                    assert np.allclose(
                        got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float), rtol=0, atol=1e-9, equal_nan=True
                    ), (name, c)
                else:
                    assert got[c].tolist() == exp[c].tolist(), (name, c)
        con.close()


class TestRandomizedEmbeddingsParity:
    """Seeded engine-vs-DuckDB parity for the vector family over
    adversarial embeddings: planted exact duplicates (cos=1 ties),
    antipodal pairs, a zero vector (DuckDB list_cosine_similarity
    returns -1 for it, the engine treats it as all-zero sims — outputs
    must still agree), tiny norms, duplicate similarity values."""

    OPS = ["knn_cosine", "knn_cosine_filtered", "knn_cosine_ivf_full", "hard_negatives", "embedding_neardup", "vector_funcs", "explode_embedding", "embedding_dim_stats", "semantic_decontaminate", "knn_cosine_ivf_indexed", "label_centroids"]

    @pytest.mark.parametrize("seed", [21, 22])
    def test_embeddings_family_matches_duckdb(self, seed, tmp_path):
        import duckdb
        import importlib.util
        import os
        import pandas as pd
        import pyarrow.parquet as pq

        spec = importlib.util.spec_from_file_location(
            "_entry_for_emb_fuzz", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        rng = np.random.default_rng(seed)
        n, d = 120, 16
        m = rng.normal(size=(n, d))
        m[5] = m[3]                    # exact duplicate of a query vector
        m[7] = -m[3]                   # antipodal
        m[9] = 0.0                     # zero vector
        m[11] = m[2] * 1e-6            # tiny norm, same direction
        m[13] = m[4] + rng.normal(size=d) * 1e-3  # near-duplicate
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array([row.astype(np.float32).tolist() for row in m], pa.list_(pa.float32())),
                "label": pa.array((np.arange(n) % 2).astype(np.int32), pa.int32()),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')")
        Q, O = entry.queries(), entry.oracle_sql()

        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        for name in self.OPS:
            r = Q[name](str(tmp_path))
            got = canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())
            exp = canon(con.sql(O[name]).df())
            assert list(got.columns) == list(exp.columns), name
            if name == "semantic_decontaminate":
                # the planted parallel benchmarks (m[11] = m[2]*1e-6)
                # make the argmax MATHEMATICALLY tied; DuckDB's own
                # float32 summation noise orders the pair differently
                # per row, so no deterministic engine can match
                # benchmark_id here. The flag and coverage stay exact;
                # benchmark_id is hash-checked by the driver on the
                # shared tables, where the top1-top2 margin is >= 1e-4.
                got = got.drop(columns=["benchmark_id"])
                exp = exp.drop(columns=["benchmark_id"])
                got = got.sort_values(list(got.columns)).reset_index(drop=True)
                exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            assert len(got) == len(exp), (name, len(got), len(exp))
            for c in got.columns:
                assert got[c].tolist() == exp[c].tolist(), (name, c)
        con.close()


class TestUserFunnel:
    def test_stage_semantics(self, tmp_path):
        """Equal-timestamp events do not advance the funnel; stages are
        strictly ordered; users with no view are absent."""
        import importlib.util, os
        import pyarrow.parquet as pq
        import pandas as pd

        spec = importlib.util.spec_from_file_location(
            "_entry_funnel", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)

        def ev(eid, u, ts, et):
            return (eid, u, ts, et, 1.0)

        rows = [
            # user 1: click at t1's exact ts ignored; purchase before t2 ignored
            ev(0, 1, 10, "view"), ev(1, 1, 10, "click"), ev(2, 1, 20, "click"),
            ev(3, 1, 15, "purchase"), ev(4, 1, 30, "purchase"),
            # user 2: no view at all -> absent
            ev(5, 2, 5, "click"), ev(6, 2, 6, "purchase"),
            # user 3: purchase only BEFORE the first view -> stage 1
            ev(7, 3, 5, "purchase"), ev(8, 3, 10, "view"),
        ]
        t = _events_table(rows)
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = (
            entry.queries()["user_funnel"](str(tmp_path))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 3]
        assert out["stage"].tolist() == [3, 1]
        u1 = out.iloc[0]
        assert (u1["t1"], u1["t2"], u1["t3"]) == (
            pd.Timestamp(10, unit="us"), pd.Timestamp(20, unit="us"), pd.Timestamp(30, unit="us"),
        )
        assert pd.isna(out.iloc[1]["t2"]) and pd.isna(out.iloc[1]["t3"])


class TestBloomFilter:
    def test_no_false_negatives_and_low_fp(self):
        import numpy as np

        from bank_statement_pdf_parser_ray.pipelines.queries import BLOOM_BITS, _bloom_positions

        keys = np.arange(1000, dtype=np.int64)
        bits = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
        p1, p2 = _bloom_positions(keys)
        for p in (p1, p2):
            np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64), np.uint64(1) << (p & np.uint64(63)))

        def hits(ks):
            q1, q2 = _bloom_positions(ks)
            h = np.ones(len(ks), dtype=bool)
            for p in (q1, q2):
                h &= (bits[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) > 0
            return h

        assert hits(keys).all()  # a Bloom filter NEVER drops a member
        others = np.arange(10_000, 110_000, dtype=np.int64)
        assert hits(others).mean() < 0.01  # 2k bits set of 131k -> tiny FP rate


class TestKeySkewAndOutliers:
    def _write_events(self, tmp_path, user_ids, values):
        import pyarrow.parquet as pq

        n = len(user_ids)
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
                "user_id": pa.array(user_ids, pa.int64()),
                "event_type": pa.array(["view"] * n, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_key_skew_profile_known_sizes(self, tmp_path):
        import importlib.util, os

        # group sizes: user 1 -> 4 rows, user 2 -> 1, user 3 -> 1
        d = self._write_events(tmp_path, [1, 1, 1, 1, 2, 3], [0.0] * 6)
        from bank_statement_pdf_parser_ray.pipelines import queries as q

        out = q.key_skew_profile(d)
        assert out.iloc[0]["n_keys"] == 3
        assert out.iloc[0]["n_rows"] == 6
        assert out.iloc[0]["min_n"] == 1 and out.iloc[0]["max_n"] == 4
        assert out.iloc[0]["avg_n"] == 2.0
        assert out.iloc[0]["sd_n"] == round(float(np.std([4, 1, 1], ddof=1)), 6)

    def test_outlier_filter_tukey_fences(self, tmp_path):
        # values 1..11 plus planted outliers; q1=3.5, q3=8.5, iqr=5 ->
        # fences [-4, 16]: only -100 and 100 fall outside
        vals = [float(v) for v in range(1, 12)] + [-100.0, 100.0, None, float("nan")]
        d = self._write_events(tmp_path, list(range(len(vals))), vals)
        from bank_statement_pdf_parser_ray.pipelines import queries as q

        out = q.outlier_filter(d)
        assert sorted(out["value"].tolist()) == [-100.0, 100.0]


class TestLatestEventsAndMedian:
    def test_latest_per_key_tie_break(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import latest_events

        H = 3_600_000_000
        rows = [
            (1, 1, 0, "view", 1.0),
            (2, 1, 2 * H, "view", 2.0),  # latest view for user 1...
            (3, 1, 2 * H, "view", 3.0),  # ...same ts: larger event_id wins
            (4, 1, H, "click", 4.0),
            (5, 2, 0, "view", 5.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = latest_events(sf).to_pandas().sort_values(["user_id", "event_type"])
        assert out["event_id"].tolist() == [4, 3, 5]

    def test_median_interpolates_and_all_null_group(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import user_value_median

        rows = [
            (1, 1, 0, "view", 1.0),
            (2, 1, 1, "view", 2.0),
            (3, 1, 2, "view", 10.0),
            (4, 1, 3, "view", 20.0),  # even count: median = (2+10)/2 = 6
            (5, 2, 0, "view", None),  # all-missing group -> NULL median
            (6, 3, 0, "view", 7.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = user_value_median(sf).to_pandas().set_index("user_id")["med"]
        assert out[1] == 6.0
        assert np.isnan(out[2])
        assert out[3] == 7.0


class TestEventTransitions:
    def test_known_sequences(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import event_transitions

        H = 3_600_000_000
        rows = [
            # user 1: view -> click -> view -> purchase
            (0, 1, 0 * H, "view", 1.0),
            (1, 1, 1 * H, "click", 1.0),
            (2, 1, 2 * H, "view", 1.0),
            (3, 1, 3 * H, "purchase", 1.0),
            # user 2: view -> view (equal ts: event_id breaks the tie)
            (4, 2, 5 * H, "view", 1.0),
            (5, 2, 5 * H, "view", 1.0),
            # user 3: single event -> contributes nothing
            (6, 3, 9 * H, "click", 1.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = event_transitions(sf).to_pandas()
        got = {(r.src, r.dst): r.n for r in out.itertuples()}
        assert got == {
            ("view", "click"): 1,
            ("click", "view"): 1,
            ("view", "purchase"): 1,
            ("view", "view"): 1,
        }

    def test_null_next_type_dropped(self, tmp_path):
        """A stored-NULL successor is dropped exactly like SQL's
        WHERE lead(...) IS NOT NULL; a NULL src keeps its group."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.windows import event_transitions

        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "ts": pa.array([0, 1, 2], pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(["view", None, "click"], pa.string()),
                "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = event_transitions(str(tmp_path)).to_pandas()
        got = {(r.src, r.dst): r.n for r in out.itertuples()}
        # (view -> NULL) dropped; (NULL -> click) kept with NULL src
        assert got == {(None, "click"): 1}


class TestCohortRetention:
    def test_triangle(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import cohort_retention

        W = 604_800_000_000
        rows = [
            # user 1: weeks 0, 1, 3  (cohort 0)
            (0, 1, 0, "view", 1.0),
            (1, 1, 1 * W, "view", 1.0),
            (2, 1, 3 * W + 5, "view", 1.0),
            # user 2: weeks 0, 0 (dup), 1  (cohort 0)
            (3, 2, 10, "view", 1.0),
            (4, 2, 20, "view", 1.0),
            (5, 2, 1 * W + 7, "view", 1.0),
            # user 3: week 2 only (cohort 2)
            (6, 3, 2 * W, "view", 1.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = cohort_retention(sf).to_pandas()
        got = {(r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()}
        assert got == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (2, 0): 1}


class TestSkyline:
    def test_planted_frontier(self, tmp_path):
        """Hand-built frontier incl. a duplicated frontier point (both
        copies survive: equal points never dominate) and a same-price
        tie where only the later date survives."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.queries import skyline_orders

        D = 86_400_000_000
        rows = [  # (key, price, day)
            (1, 100.0, 5),   # frontier (max price)
            (2, 100.0, 3),   # dominated by 1 (same price, older)
            (3, 90.0, 9),    # frontier
            (4, 90.0, 9),    # duplicate frontier point -> survives too
            (5, 80.0, 9),    # dominated by 3 (same date, cheaper)
            (6, 70.0, 12),   # frontier (most recent)
            (7, 60.0, 1),    # dominated by everything
        ]
        t = pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([1] * len(rows), pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[2] * D for r in rows], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1"] * len(rows)),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        out = skyline_orders(str(tmp_path)).to_pandas()
        assert sorted(out["o_orderkey"].tolist()) == [1, 3, 4, 6]

    def test_block_cut_matches_single_block(self, tmp_path):
        """Random data split into many blocks must give the same
        frontier as the brute-force O(n^2) dominance check."""
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.queries import skyline_orders

        rng = np.random.default_rng(13)
        n = 400
        price = np.round(rng.uniform(0, 50, n), 0)  # coarse -> many ties
        day = rng.integers(0, 40, n)
        t = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), pa.int64()),
                "o_custkey": pa.array(np.zeros(n), pa.int64()),
                "o_orderstatus": pa.array(["F"] * n),
                "o_totalprice": pa.array(price, pa.float64()),
                "o_orderdate": pa.array(day * 86_400_000_000, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1"] * n),
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        got = sorted(skyline_orders(str(tmp_path)).to_pandas()["o_orderkey"].tolist())
        dominated = [
            any(
                (price[j] >= price[i]) and (day[j] >= day[i])
                and ((price[j] > price[i]) or (day[j] > day[i]))
                for j in range(n)
            )
            for i in range(n)
        ]
        exp = [i for i in range(n) if not dominated[i]]
        assert got == exp


class TestUserValueTrend:
    def test_known_line(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import user_value_trend

        H = 3_600_000_000
        # user 1: y = 2x + 1 exactly (x in hours); user 2: flat ts -> NULL slope
        rows = [
            (0, 1, 0 * H, "view", 1.0),
            (1, 1, 1 * H, "view", 3.0),
            (2, 1, 2 * H, "view", 5.0),
            (3, 2, 4 * H, "view", 7.0),
            (4, 2, 4 * H, "view", 9.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = user_value_trend(sf).to_pandas().set_index("user_id")
        assert out.loc[1, "slope"] == 2.0 and out.loc[1, "intercept"] == 1.0
        assert np.isnan(out.loc[2, "slope"]) and np.isnan(out.loc[2, "intercept"])


class TestUserCoverage:
    def test_merge_and_gap(self, tmp_path):
        from bank_statement_pdf_parser_ray.pipelines.windows import user_coverage

        M = 60_000_000  # one minute in us
        rows = [
            # user 1: overlapping pair (0-30, 10-40 -> 40 min) + distant (100-130)
            (0, 1, 0 * M, "view", 1.0),
            (1, 1, 10 * M, "view", 1.0),
            (2, 1, 100 * M, "view", 1.0),
            # user 2: duplicate timestamps merge to one interval
            (3, 2, 0, "view", 1.0),
            (4, 2, 0, "view", 1.0),
        ]
        sf = _write_events(tmp_path, rows)
        out = user_coverage(sf).to_pandas().set_index("user_id")["covered_us"]
        assert out[1] == 70 * M
        assert out[2] == 30 * M


class TestGapDedupPlanted:
    """events_gap_dedup on planted bursts: verifies rows actually DROP
    (the shared tables are too sparse to exercise the gap) and pins the
    lag-vs-kept-row semantics: a chain at 3 s intervals keeps only the
    first row of each (user, type) run-start, but a row 3 s after a
    DROPPED row is still dropped only by its RAW predecessor (SQL lag),
    not by the last KEPT row."""

    def test_bursts_and_chains(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from bank_statement_pdf_parser_ray.pipelines.windows import (
            EVENTS_GAP_DEDUP_SQL,
            events_gap_dedup,
        )

        S = 1_000_000  # 1 second in us
        rows = [
            # burst: 0, 3s, 6s -> lag semantics keep ONLY the first
            (0, 1, "click", 0 * S),
            (1, 1, "click", 3 * S),
            (2, 1, "click", 6 * S),
            # next event 10s after the previous RAW row -> kept
            (3, 1, "click", 16 * S),
            # same user, different type at the same instants -> its own run
            (4, 1, "view", 0 * S),
            (5, 1, "view", 3 * S),
            # different user, same type/instant -> kept
            (6, 2, "click", 3 * S),
            # duplicate timestamp pair -> second dropped (diff 0 <= gap)
            (7, 2, "view", 50 * S),
            (8, 2, "view", 50 * S),
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = sorted(
            events_gap_dedup(str(tmp_path)).to_pandas()["event_id"].tolist()
        )
        # lag semantics: event 2 is 3s after event 1 (dropped), still dropped
        assert got == [0, 3, 4, 6, 7]
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
        exp = sorted(con.execute(EVENTS_GAP_DEDUP_SQL).fetchdf()["event_id"].tolist())
        assert got == exp


class TestTimeDecayAgg:
    def test_anchor_and_null_semantics(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        import pandas as pd

        from bank_statement_pdf_parser_ray.pipelines.windows import (
            TIME_DECAY_AGG_SQL,
            time_decay_agg,
        )

        D = 86_400_000_000  # 1 day in us
        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "user_id": pa.array([1, 1, 2, 3], pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                # user 1: anchor-day event (weight 1) + one-day-old (1/e)
                "ts": pa.array([2 * D, 1 * D, 2 * D, 1 * D], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array([10.0, 10.0, 5.0, None], pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = time_decay_agg(str(tmp_path))
        by_user = got.set_index("user_id")["decayed_sum"].to_dict()
        assert abs(by_user[1] - round(10.0 + 10.0 * np.exp(-1.0), 6)) < 1e-9
        assert by_user[2] == 5.0
        assert pd.isna(by_user[3])  # all-NULL contributions -> NULL, like SQL SUM
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
        exp = con.execute(TIME_DECAY_AGG_SQL).fetchdf()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestIntervalJoin:
    def test_planted_pairs(self, tmp_path):
        import pyarrow.parquet as pq
        from bank_statement_pdf_parser_ray.pipelines.windows import interval_join_events

        S = 1_000_000  # us per second
        rows = [
            # (event_id, user_id, ts_s, type)
            (0, 1, 0, "view"),
            (1, 1, 300, "view"),
            (2, 1, 601, "view"),      # AFTER the click: excluded
            (3, 1, 600, "click"),     # window [0, 600]: views 0 and 1, plus boundary view 4
            (4, 1, 600, "view"),      # same-ts view: BETWEEN inclusive, gap 0
            (5, 2, 500, "view"),      # other user: never matches user 1's click
            (6, 2, 90000, "click"),   # no views within 10 min: no rows
            (7, 1, None, "view"),     # NULL ts can never satisfy BETWEEN
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [None if r[2] is None else r[2] * S for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": pa.array([r[3] for r in rows]),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = interval_join_events(str(tmp_path)).to_pandas()
        got = sorted(zip(out["click_id"], out["view_id"], out["gap_us"]))
        assert got == [(3, 0, 600 * S), (3, 1, 300 * S), (3, 4, 0)]


class TestLateEvents:
    def test_planted_late_and_bucket_boundary(self, tmp_path, monkeypatch):
        import pyarrow.parquet as pq
        from bank_statement_pdf_parser_ray.pipelines import windows as w

        monkeypatch.setattr(w, "_LATE_BUCKET", 4)  # force cross-bucket prefix max
        S = 1_000_000
        # arrival order = event_id; times in seconds
        rows = [
            (0, 0),        # first arrival: no previous -> never late
            (1, 10_000),   # advances the watermark far ahead
            (2, 9_500),    # 500 s behind the max: within 15 min -> on time
            (3, None),     # NULL event time: never late, never advances
            (4, 100),      # next bucket; 9_900 s behind -> LATE (prefix from bucket 0)
            (5, 10_001),
            (6, 8_000),    # 2001 s behind 10_001 -> LATE
        ]
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "ts": pa.array(
                    [None if r[1] is None else r[1] * S for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = w.late_events(str(tmp_path)).to_pandas().set_index("event_id")
        assert out["is_late"].to_dict() == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 1}
        assert pd.isna(out.loc[0, "max_prev_ts"])
        # the cross-bucket base: event 4 sees the bucket-0 max (10_000 s)
        assert out.loc[4, "max_prev_ts"].value == 10_000 * S * 1000  # pandas ns
