"""Replicates the driver's queries() vs oracle_sql() check at sf0.001
(SURVEY.md §5.5): row-count + schema + order-insensitive value compare."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_spec = importlib.util.spec_from_file_location("__ray_entry__", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py"))
entry_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("__ray_entry__", entry_mod)
_spec.loader.exec_module(entry_mod)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    con = _duck()
    exp = _canon(con.sql(ORACLES[name]).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    for c in got.columns:
        if pd.api.types.is_float_dtype(exp[c]):
            # equal_nan: a NULL on both sides (e.g. as-of join with no
            # prior match) is a MATCH, as in the DuckDB comparison
            assert np.allclose(
                got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float), rtol=0, atol=1e-9, equal_nan=True
            ), c
        else:
            assert got[c].tolist() == exp[c].tolist(), c


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_pandas(QUERIES[name](SF_DIR))
    assert len(got) >= 0
    assert len(got.columns) > 0


def test_entry_smoke():
    ds = entry_mod.entry()
    assert ds.count() > 0
    assert "extracted_text" in ds.schema().names
