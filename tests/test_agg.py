"""Direct tests of the coarse-shard grouped-execution machinery
(stages/agg.py) — the shared exchange behind the many-group
aggregates, EXISTS joins, and vectorized per-key kernels.

Contract under test: same-key rows always land in one shard, NULL
keys group together (SQL GROUP BY semantics), results equal Ray's
native groupby / a pandas reference for any associative spec, and
n_shards never changes the answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from bank_statement_pdf_parser_ray.stages.agg import shard_aggregate, shard_map_groups


def _table(n: int, seed: int, with_nulls: bool = True) -> pa.Table:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, max(2, n // 3), n).astype(object)
    vals = rng.integers(-50, 50, n)
    if with_nulls:
        keys[rng.random(n) < 0.1] = None
    return pa.table(
        {
            "k": pa.array(list(keys), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )


def _expected(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    out = df.groupby("k", dropna=False, as_index=False)["v"].agg(["sum", "min"])
    out.columns = ["k", "s", "m"]
    return out.sort_values("k", na_position="last").reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("k", na_position="last").reset_index(drop=True)


class TestShardAggregate:
    def test_matches_pandas_including_null_keys(self):
        t = _table(5_000, seed=1)
        ds = ray.data.from_arrow(t).repartition(7)
        got = _canon(
            shard_aggregate(ds, ["k"], [("v", "sum"), ("v", "min")], ["k", "s", "m"]).to_pandas()
        )
        exp = _expected(t)
        pd.testing.assert_frame_equal(
            got.astype({"s": "int64", "m": "int64"}), exp.astype({"s": "int64", "m": "int64"})
        )

    def test_n_shards_invariant(self):
        t = _table(2_000, seed=2)
        ds = ray.data.from_arrow(t).repartition(5)
        a = _canon(shard_aggregate(ds, ["k"], [("v", "sum")], ["k", "s"], n_shards=3).to_pandas())
        b = _canon(shard_aggregate(ds, ["k"], [("v", "sum")], ["k", "s"], n_shards=64).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    def test_string_keys(self):
        t = pa.table(
            {
                "k": pa.array(["a", "b", None, "a", None, "b", "b"], pa.string()),
                "v": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        got = shard_aggregate(ds, ["k"], [("v", "sum")], ["k", "s"]).to_pandas()
        got = got.set_index("k")["s"].to_dict()
        assert got["a"] == 5 and got["b"] == 15
        # both NULL keys merged into ONE group, like SQL GROUP BY
        nulls = [v for k, v in got.items() if pd.isna(k)]
        assert nulls == [8]


class TestShardMapGroups:
    def test_whole_groups_per_shard(self):
        """Every key's rows arrive in exactly one fn call (the
        correctness precondition for in-shard per-key kernels)."""
        t = _table(3_000, seed=3, with_nulls=False)
        ds = ray.data.from_arrow(t).repartition(6)

        def keys_seen(g: pa.Table) -> pa.Table:
            ks = g.column("k").unique()
            return pa.table({"k": ks, "n": pa.array([len(g)] * len(ks), pa.int64())})

        out = shard_map_groups(ds, ["k"], keys_seen, n_shards=16).to_pandas()
        # each key appears in exactly one shard's output
        assert out["k"].is_unique

    def test_in_shard_join_matches_pandas(self):
        """A per-key LEFT JOIN computed with one pa.Table.join per
        shard equals the pandas merge (the left_join_big_orders
        pattern)."""
        rng = np.random.default_rng(4)
        left = pa.table(
            {
                "k": pa.array(np.arange(200), pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(200)], pa.string()),
                "r_val": pa.nulls(200, pa.int64()),
                "is_probe": pa.array([False] * 200),
            }
        )
        rk = rng.integers(0, 300, 150)  # some keys match nothing on the left
        right = pa.table(
            {
                "k": pa.array(rk, pa.int64()),
                "payload": pa.nulls(150, pa.string()),
                "r_val": pa.array(np.arange(150), pa.int64()),
                "is_probe": pa.array([True] * 150),
            }
        )
        both = ray.data.from_arrow(pa.concat_tables([left, right])).repartition(4)

        def join_shard(g: pa.Table) -> pa.Table:
            is_probe = g.column("is_probe")
            import pyarrow.compute as pc

            lhs = g.filter(pc.invert(is_probe)).select(["k", "payload"])
            rhs = g.filter(is_probe).select(["k", "r_val"])
            out = lhs.join(rhs, keys=["k"], join_type="left outer")
            return out.select(["k", "payload", "r_val"])

        got = (
            shard_map_groups(both, ["k"], join_shard, n_shards=8)
            .to_pandas()
            .sort_values(["k", "r_val"], na_position="last")
            .reset_index(drop=True)
        )
        exp = (
            left.to_pandas()[["k", "payload"]]
            .merge(right.to_pandas()[["k", "r_val"]], on="k", how="left")
            .sort_values(["k", "r_val"], na_position="last")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == exp["k"].tolist()
        assert got["payload"].tolist() == exp["payload"].tolist()
        assert got["r_val"].fillna(-1).tolist() == exp["r_val"].fillna(-1).tolist()


class TestNumpyShardPath:
    """The splitmix64 integer-key fast path (no polars import) added
    late round 2: range validity, same-key determinism, fallback."""

    def test_numpy_shard_range_and_determinism(self):
        from bank_statement_pdf_parser_ray.stages.agg import _numpy_shard

        t = _table(4_000, seed=11)  # int64 keys with NULLs
        s1 = _numpy_shard(t, ["k"], 16)
        s2 = _numpy_shard(t, ["k"], 16)
        assert s1 is not None
        a = s1.to_numpy(zero_copy_only=False)
        assert ((a >= 0) & (a < 16)).all()
        assert (a == s2.to_numpy(zero_copy_only=False)).all()
        # same key value -> same shard
        df = pd.DataFrame({"k": t.column("k").to_pandas(), "s": a})
        assert (df.groupby("k", dropna=False)["s"].nunique() == 1).all()

    def test_numpy_shard_timestamp_and_multikey(self):
        from bank_statement_pdf_parser_ray.stages.agg import _numpy_shard

        ts = pa.array(
            np.array([0, 10**15, -(10**12), 0], dtype="datetime64[us]"),
            pa.timestamp("us"),
        )
        t = pa.table({"a": ts, "b": pa.array([1, 1, 2, 1], pa.int64())})
        s = _numpy_shard(t, ["a", "b"], 8)
        assert s is not None
        a = s.to_numpy(zero_copy_only=False)
        assert ((a >= 0) & (a < 8)).all()
        assert a[0] == a[3]  # identical (a, b) pair -> identical shard

    def test_string_key_falls_back_to_polars(self):
        from bank_statement_pdf_parser_ray.stages.agg import _numpy_shard

        t = pa.table(
            {"k": pa.array(["x", "y"], pa.string()), "i": pa.array([1, 2], pa.int64())}
        )
        assert _numpy_shard(t, ["k"], 8) is None
        assert _numpy_shard(t, ["k", "i"], 8) is None  # any string key disables it

    def test_multikey_int_aggregate_matches_pandas(self):
        rng = np.random.default_rng(21)
        t = pa.table(
            {
                "k1": pa.array(rng.integers(0, 40, 3000), pa.int64()),
                "k2": pa.array(rng.integers(0, 5, 3000), pa.int32()),
                "v": pa.array(rng.integers(-9, 9, 3000), pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(5)
        got = (
            shard_aggregate(ds, ["k1", "k2"], [("v", "sum")], ["k1", "k2", "s"])
            .to_pandas()
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        exp = (
            t.to_pandas()
            .groupby(["k1", "k2"], as_index=False)["v"]
            .sum()
            .rename(columns={"v": "s"})
            .sort_values(["k1", "k2"])
            .reset_index(drop=True)
        )
        assert got["s"].tolist() == exp["s"].tolist()


class TestNullSafeGroup:
    """Direct coverage of the pyarrow mixed-width null-key workaround
    (stages/agg.py null_safe_group) — the fuzz families exercise it
    end-to-end; these pin the helper itself."""

    def _mk(self, n=8000, seed=7):
        rng = np.random.default_rng(seed)
        s = pa.array(
            [None if rng.random() < 0.2 else f"s{v}" for v in rng.integers(0, 3, n)],
            pa.string(),
        )
        k = pa.array(
            [None if rng.random() < 0.2 else int(v) for v in rng.integers(0, 3, n)],
            pa.int64(),
        )
        v = pa.array(rng.uniform(0, 1, n), pa.float64())
        return pa.table({"s": s, "k": k, "v": v})

    def test_reproduces_the_pyarrow_defect(self):
        # plain TableGroupBy over-counts groups on this shape (the bug
        # this helper exists for); if pyarrow fixes it this test tells
        # us the workaround can go
        from bank_statement_pdf_parser_ray.stages.agg import null_safe_group

        t = self._mk()
        plain = pa.TableGroupBy(t, ["s", "k"]).aggregate([]).num_rows
        exp = len(t.to_pandas().groupby(["s", "k"], dropna=False))
        assert exp == 16
        fixed = null_safe_group(t, ["s", "k"], []).num_rows
        assert fixed == exp
        assert plain > exp  # the defect is real on this pyarrow

    def test_values_and_null_restoration(self):
        from bank_statement_pdf_parser_ray.stages.agg import null_safe_group

        t = self._mk()
        got = (
            null_safe_group(t, ["s", "k"], [("v", "sum"), ([], "count_all")])
            .to_pandas()
            .sort_values(["s", "k"])
            .reset_index(drop=True)
        )
        exp = (
            t.to_pandas()
            .groupby(["s", "k"], dropna=False)
            .agg(v_sum=("v", "sum"), count_all=("v", "size"))
            .reset_index()
            .sort_values(["s", "k"])
            .reset_index(drop=True)
        )
        assert list(got.columns) == ["s", "k", "v_sum", "count_all"]
        assert got["count_all"].tolist() == exp["count_all"].tolist()
        assert np.allclose(got["v_sum"], exp["v_sum"])
        # NULL keys restored as real nulls, not sentinel values
        assert got["s"].isna().sum() == exp["s"].isna().sum()
        assert got["k"].isna().sum() == exp["k"].isna().sum()

    def test_agg_over_key_column_sees_original_nulls(self):
        from bank_statement_pdf_parser_ray.stages.agg import null_safe_group

        t = self._mk()
        got = null_safe_group(t, ["s", "k"], [("s", "count")]).to_pandas()
        exp = (
            t.to_pandas().groupby(["s", "k"], dropna=False)["s"].count().reset_index(name="s_count")
        )
        m = got.sort_values(["s", "k"]).reset_index(drop=True)
        e = exp.sort_values(["s", "k"]).reset_index(drop=True)
        # count('s') skips nulls: the NULL-s groups must count 0, which
        # only happens if the aggregation reads the ORIGINAL column
        assert m["s_count"].tolist() == e["s_count"].tolist()
        assert (m.loc[m["s"].isna(), "s_count"] == 0).all()

    def test_safe_shapes_short_circuit(self):
        from bank_statement_pdf_parser_ray.stages.agg import null_safe_group

        t = self._mk()
        # same-width keys (str+str / int+int) and null-free tables take
        # the plain path and still agree with pandas
        t2 = pa.table({"a": t.column("s"), "b": t.column("s"), "v": t.column("v")})
        got = null_safe_group(t2, ["a", "b"], [([], "count_all")]).num_rows
        assert got == len(t2.to_pandas().groupby(["a", "b"], dropna=False))
        t3 = t.filter(pa.compute.and_(pa.compute.is_valid(t.column("s")), pa.compute.is_valid(t.column("k"))))
        assert null_safe_group(t3, ["s", "k"], []).num_rows == 9
