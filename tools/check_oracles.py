"""Engine-vs-DuckDB compare of EVERY oracle-paired query at an
arbitrary scale factor — the driver runs its hash compare at sf0.01
while the pytest contract parametrizes sf0.001, and rounding-boundary
ties can be scale-dependent (events_ewma's exact-decimal ties only
materialized at sf0.01). Run before shipping a new oracle pair:

    python tools/check_oracles.py [/root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    spec = importlib.util.spec_from_file_location("__ray_entry__", os.path.join(root, "__ray_entry__.py"))
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    queries, oracles = em.queries(), em.oracle_sql()
    names = sys.argv[2:] or sorted(oracles)
    fails = 0
    for name in names:
        try:
            r = queries[name](sf)
            got = canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())
            con = duckdb.connect()
            for t in TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
            exp = canon(con.sql(oracles[name]).df())
            con.close()
            ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
            why = "" if ok else f"shape {got.shape} vs {exp.shape}"
            if ok:
                for c in got.columns:
                    # Driver-exact dtype gate: the driver's value hash is
                    # representation-sensitive (int64 3 vs float64 3.0 hash
                    # differently), so a post-canon dtype mismatch is a FAIL
                    # here even when the values compare equal.  This is the
                    # class that let funnel_windowed slip through in r3
                    # (DuckDB sum(BIGINT) -> HUGEINT -> pandas float64).
                    if got[c].dtype != exp[c].dtype:
                        ok, why = False, f"dtype col {c}: engine {got[c].dtype} vs oracle {exp[c].dtype}"
                        break
                    if pd.api.types.is_float_dtype(exp[c]):
                        ga = got[c].to_numpy(dtype=float)
                        ea = exp[c].to_numpy(dtype=float)
                        if not (
                            (np.isnan(ga) == np.isnan(ea)).all()
                            and np.allclose(np.nan_to_num(ga), np.nan_to_num(ea), rtol=0, atol=1e-9)
                        ):
                            ok, why = False, f"float col {c}"
                            break
                    elif got[c].tolist() != exp[c].tolist():
                        ok, why = False, f"col {c}"
                        break
            if not ok:
                fails += 1
                print(f"FAIL {name}: {why}", flush=True)
        except Exception as e:  # surface, keep sweeping
            fails += 1
            print(f"ERR  {name}: {str(e)[:120]}", flush=True)
    print(f"checked {len(names)} pairs at {sf}: {fails} failures")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
