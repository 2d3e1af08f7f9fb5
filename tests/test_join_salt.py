"""Salted join == plain join on a planted 90%-hot-key fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from bank_statement_pdf_parser_ray.stages.join import salted_inner_join


def _fixture():
    rng = np.random.default_rng(5)
    n = 5_000
    keys = rng.integers(0, 50, n)
    keys[: int(n * 0.9)] = 7  # one hot key carries 90% of the rows
    left = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(0, 40, dtype=np.int64)),  # keys 40..49 unmatched
            "name": pa.array([f"n{i}" for i in range(40)], pa.string()),
        }
    )
    return left, right


class TestSaltedJoin:
    def test_matches_plain_join(self):
        left_t, right_t = _fixture()
        left = ray.data.from_arrow(left_t).repartition(8)
        right = ray.data.from_arrow(right_t)
        got = (
            salted_inner_join(left, right, on="k", right_on="rk", n_salt=4)
            .to_pandas()
            .sort_values(["k", "x", "name"])
            .reset_index(drop=True)
        )
        exp = (
            left_t.to_pandas()
            .merge(right_t.to_pandas(), left_on="k", right_on="rk", how="inner")
            .sort_values(["k", "x", "name"])
            .reset_index(drop=True)[got.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, exp)

    def test_hot_key_spreads_over_salts(self):
        left_t, _ = _fixture()
        from bank_statement_pdf_parser_ray.stages.join import SALT_COL

        # the salting function itself: a hot key's rows carry every salt
        import pyarrow.compute as pc

        n_salt = 4
        salted = pa.table(
            {
                "k": left_t.column("k"),
                SALT_COL: pa.array(np.arange(left_t.num_rows) % n_salt, pa.int64()),
            }
        )
        hot = salted.filter(pc.equal(salted.column("k"), 7))
        assert len(np.unique(hot.column(SALT_COL).to_numpy())) == n_salt
