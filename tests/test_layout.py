"""Z-order layout (pipelines/layout.py): Morton-code properties and the
measured pruning claims."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bank_statement_pdf_parser_ray.pipelines.layout import (
    _morton,
    _part1by1,
    _quantize,
    zorder_benefit,
)


class TestMorton:
    def test_part1by1_spreads_bits(self):
        # 0b1111 -> 0b01010101
        assert _part1by1(np.array([0b1111]))[0] == 0b01010101
        assert _part1by1(np.array([0]))[0] == 0
        assert _part1by1(np.array([0xFFFF]))[0] == 0x55555555

    def test_morton_is_injective_and_locality_monotone(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 1 << 16, 4000).astype(np.uint64)
        b = rng.integers(0, 1 << 16, 4000).astype(np.uint64)
        z = _morton(a, b)
        assert len(np.unique(z)) == len(set(zip(a.tolist(), b.tolist())))
        # fixing one coordinate, z is monotone in the other
        ys = np.arange(100, dtype=np.uint64)
        z_row = _morton(np.full(100, 7, dtype=np.uint64), ys)
        assert (np.diff(z_row) > 0).all()

    def test_quantize_clips_and_spans(self):
        q = _quantize(np.array([-5.0, 0.0, 50.0, 100.0, 999.0]), 0.0, 100.0)
        assert q[0] == 0 and q[1] == 0 and q[-1] == (1 << 16) - 1
        assert 0 < q[2] < (1 << 16) - 1


class TestZorderBenefit:
    def test_pruning_claims(self, tmp_path):
        """On a uniform grid of (user, time) events, the Z layout must
        (a) beat the unsorted input on the box query and (b) beat the
        single-key layout on the time-only query, while (c) the
        single-key layout stays near-unable to prune time-only."""
        rng = np.random.default_rng(9)
        n = 20_000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(rng.integers(0, 3_600_000_000_000, n), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "user_id": pa.array(rng.integers(0, 5000, n), pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(rng.random(n), pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=n)
        out = zorder_benefit(str(tmp_path), rows_per_group=512).to_pandas()
        s = out.set_index(["layout", "query_shape"])["rows_scanned"]
        assert s[("zorder", "box")] < 0.5 * s[("input", "box")]
        assert s[("zorder", "time_range")] < 0.7 * s[("sorted_user", "time_range")]
        assert s[("sorted_user", "time_range")] > 0.9 * n  # single key can't prune time
        assert s[("sorted_user", "user_range")] < 0.5 * n  # ... but wins its own dim


class TestCompactFiles:
    def test_rows_preserved_files_reduced(self, tmp_path):
        import pyarrow.parquet as pq
        from bank_statement_pdf_parser_ray.pipelines.layout import compact_files

        n = 2000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(np.arange(n) % 17, pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = compact_files(str(tmp_path), target_rows_per_file=1000).to_pandas().set_index("stage")
        assert out.loc["fragmented", "n_rows"] == out.loc["compacted", "n_rows"] == n
        assert out.loc["fragmented", "n_files"] > out.loc["compacted", "n_files"]
        assert out.loc["compacted", "n_files"] <= 3
        assert out.loc["compacted", "rows_per_file"] >= 500


class TestBucketedJoin:
    def _fixture(self, tmp_path, n_orders=200, items_per=3):
        rng = np.random.default_rng(13)
        ok = np.arange(n_orders, dtype=np.int64)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(ok, pa.int64()),
                    "o_orderpriority": pa.array(
                        [f"{i % 5 + 1}-PRIO" for i in ok], pa.string()
                    ),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        lk = np.repeat(ok, items_per)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(lk, pa.int64()),
                    "l_extendedprice": pa.array(rng.uniform(10, 1000, len(lk))),
                    "l_discount": pa.array(rng.uniform(0, 0.1, len(lk))),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )

    def test_matches_plain_join(self, tmp_path):
        import duckdb

        from bank_statement_pdf_parser_ray.pipelines.layout import (
            BUCKETED_JOIN_REVENUE_SQL,
            bucketed_join_revenue,
        )

        self._fixture(tmp_path)
        got = bucketed_join_revenue(str(tmp_path), n_buckets=7)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'")
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'")
        want = (
            con.execute(BUCKETED_JOIN_REVENUE_SQL)
            .df()
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        want["revenue"] = want["revenue"].round(2)
        assert got["o_orderpriority"].tolist() == want["o_orderpriority"].tolist()
        assert got["n_items"].tolist() == want["n_items"].tolist()
        assert np.allclose(got["revenue"], want["revenue"], atol=0.02)

    def test_layout_copartitioned_and_cached(self, tmp_path):
        import glob
        import os

        import pyarrow.dataset as pads

        from bank_statement_pdf_parser_ray.pipelines.layout import bucketed_join_revenue

        self._fixture(tmp_path, n_orders=60)
        bucketed_join_revenue(str(tmp_path), n_buckets=5)
        bases = glob.glob("/tmp/bspp_smb_*")
        base = max(bases, key=os.path.getmtime)
        # every orderkey lives in exactly ONE bucket, the SAME on both sides
        seen: dict[int, int] = {}
        for b in range(5):
            od = f"{base}/orders/bucket={b}"
            if not os.path.isdir(od):
                continue
            for k in pads.dataset(od).to_table().column("o_orderkey").to_pylist():
                assert k not in seen
                seen[k] = b
        assert len(seen) == 60
        for b in range(5):
            ld = f"{base}/lineitem/bucket={b}"
            if not os.path.isdir(ld):
                continue
            for k in set(pads.dataset(ld).to_table().column("l_orderkey").to_pylist()):
                assert seen[k] == b  # co-partitioned: join needs no shuffle
        # second call must REUSE the layout, not rewrite it
        marker = os.path.getmtime(f"{base}/_layout_done")
        bucketed_join_revenue(str(tmp_path), n_buckets=5)
        assert os.path.getmtime(f"{base}/_layout_done") == marker
