"""Local mimic of the driver's correctness gate: run each queries() entry
and compare against oracle_sql() via DuckDB (row count, schema-insensitive
sorted-column value compare). Usage:
    PYTHONPATH=/root/repo python tools/check_queries.py [sf_dir] [only...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_df(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols).reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df


def compare(name, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA MISMATCH got={sorted(got.columns)} exp={sorted(exp.columns)}"
    g, e = canon(got), canon(exp)
    # The driver's value hash is dtype-KIND-sensitive (observed r02:
    # int-vs-float and nullable-Int64-vs-float64 hash differently, while
    # int32-vs-int64 and ns-vs-us datetimes hash the same). Flag kind
    # differences only.
    dt_bad = [c for c in g.columns if g[c].dtype.kind != e[c].dtype.kind]
    if dt_bad:
        return ("DTYPE MISMATCH " + ", ".join(
            f"{c}: got={g[c].dtype} exp={e[c].dtype}" for c in dt_bad))
    if len(g) != len(e):
        return f"ROWCOUNT {len(g)} != {len(e)}"
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            ok = np.allclose(gv.astype(float).fillna(-9e99),
                             ev.astype(float).fillna(-9e99), rtol=0, atol=1e-9)
        elif gv.dtype == object or ev.dtype == object:
            ok = list(gv.fillna("<null>")) == list(ev.fillna("<null>"))
        else:
            try:
                ok = (gv.fillna(-987654321).to_numpy() ==
                      ev.fillna(-987654321).to_numpy()).all()
            except Exception:
                ok = list(gv) == list(ev)
        if not ok:
            bad = None
            for i in range(len(gv)):
                a, b = gv.iloc[i], ev.iloc[i]
                if (pd.isna(a) != pd.isna(b)) or (
                        not pd.isna(a) and a != b):
                    bad = (i, a, b)
                    break
            return f"VALUE MISMATCH col={c} first={bad}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_df(fn(sf_dir))
        except Exception as ex:
            results[name] = f"QUERY ERROR: {type(ex).__name__}: {ex}"
            print(f"{name:28s} {results[name]}", flush=True)
            continue
        dt = time.time() - t0
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows ({dt:.1f}s)"
        else:
            try:
                exp = con.sql(oracles[name]).df()
            except Exception as ex:
                results[name] = f"ORACLE SQL ERROR: {ex}"
                print(f"{name:28s} {results[name]}", flush=True)
                continue
            results[name] = compare(name, got, exp) + f" ({len(got)} rows, {dt:.1f}s)"
        print(f"{name:28s} {results[name]}", flush=True)

    bad = [n for n, r in results.items()
           if not (r.startswith("OK") or r.startswith("rows-only"))]
    print("\nFAILED:" if bad else "\nALL OK", bad if bad else "")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
