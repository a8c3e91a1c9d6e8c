"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle SQL side-by-side, compare row count, schema (column
names) and order-insensitive values. Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df):
    import pandas as pd

    if not isinstance(df, pd.DataFrame):
        try:
            df = df.to_pandas()
        except AttributeError:
            df = pd.DataFrame(df)
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order for comparison; float columns sort on rounded
    # values so sub-tolerance noise cannot mis-pair rows between the ray
    # and sql sides
    keys = {}
    for c in df.columns:
        keys[c] = (df[c].round(6) if pd.api.types.is_float_dtype(df[c])
                   else df[c])
    order = pd.DataFrame(keys).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if list(ray_df.columns) != list(sql_df.columns):
        problems.append(f"schema: ray={list(ray_df.columns)} sql={list(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    if problems:
        return problems
    import pandas as pd

    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        try:
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                # absolute OR relative tolerance: large aggregates differ
                # by summation order at ~1e-16 relative
                tol = 1e-9 + 1e-9 * b.abs()
                ok = ((a.isna() & b.isna()) | ((a - b).abs() <= tol)).all()
            else:
                ok = (a.astype(str) == b.astype(str)).all()
        except Exception as e:
            ok = False
            problems.append(f"col {c}: compare error {e}")
            continue
        if not ok:
            bad = (a.astype(str) != b.astype(str))
            i = bad[bad].index[0] if bad.any() else 0
            problems.append(f"col {c}: first diff at row {i}: "
                            f"ray={a.iloc[i]!r} sql={b.iloc[i]!r}")
    return problems


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"valid: {sorted(qs)}")
        sys.exit(2)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = normalize(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL {name}: ray query raised: {e}")
            failures += 1
            continue
        if name in oracles:
            try:
                sql_df = normalize(con.execute(oracles[name]).df())
            except Exception as e:
                print(f"FAIL {name}: oracle sql raised: {e}")
                failures += 1
                continue
            problems = compare(name, ray_df, sql_df)
            if problems:
                failures += 1
                print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
            else:
                print(f"ok   {name} ({time.time()-t0:.1f}s) rows={len(ray_df)}")
        else:
            print(f"ok   {name} ({time.time()-t0:.1f}s) rows={len(ray_df)} [rows-only]")

    if not only:        # skip the flagship run when filtering to names
        try:
            print("entry():", len(normalize(entry_mod.entry())), "rows")
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"FAIL entry(): {e}")
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
