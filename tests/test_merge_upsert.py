"""MERGE INTO (CDC upsert/delete/insert apply) — decision-table tests on
a hand fixture where every MERGE case is planted, plus DuckDB parity of
the full oracle on the same fixture."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bank_statement_pdf_parser_ray.pipelines import queries as q


def _write_orders(tmp_path, rows):
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [np.datetime64(r[2], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


class TestMergeUpsert:
    def test_decision_table(self, tmp_path):
        rows = [
            # key, price, date          -> MERGE case
            (7, 100.0, "1996-05-01"),   # in base, U (7%7==0, 7%13!=1) -> price+1000
            (21, 50.0, "1997-06-01"),   # NOT in base (post-cutoff), U -> no-op, no row
            (1, 30.0, "1996-01-01"),    # in base, D (1%13==1)        -> deleted
            (27, 40.0, "1997-02-01"),   # not in base, D (27%13==1)   -> no-op
            (3, 70.0, "1996-07-01"),    # in base, also I-source (3%101==3): stays AND
                                        # spawns insert under key 100000003
            (5, 60.0, "1996-03-01"),    # in base, untouched          -> carried as-is
        ]
        sf = _write_orders(tmp_path, rows)
        out = (
            q.merge_upsert(sf)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        got = dict(zip(out["o_orderkey"], out["o_totalprice"]))
        assert got == {
            3: 70.0,
            5: 60.0,
            7: 1100.0,
            100000003: 70.0,
        }

    def test_matches_duckdb_on_fixture(self, tmp_path):
        rng = np.random.default_rng(3)
        keys = rng.choice(np.arange(1, 3000), 400, replace=False)
        rows = [
            (
                int(k),
                float(np.round(rng.uniform(10, 9000), 2)),
                "1996-06-01" if rng.random() < 0.6 else "1998-01-01",
            )
            for k in keys
        ]
        sf = _write_orders(tmp_path, rows)
        got = (
            q.merge_upsert(sf)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')"
        )
        exp = con.sql(q.MERGE_UPSERT_SQL).df().sort_values("o_orderkey").reset_index(drop=True)
        con.close()
        pd.testing.assert_frame_equal(got, exp)
