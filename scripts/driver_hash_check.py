#!/usr/bin/env python3
"""Emulation of the DRIVER's correctness comparator (pandas-hash based).

The driver (per CORRECTNESS_r01 evidence) loads the Spark parquet and the
DuckDB oracle result into pandas, sorts columns by name, sorts rows by all
columns, and compares hashes of the values — so dtype-level drift (Spark
parquet DECIMAL → object vs oracle float64) or unhashable cells (arrays,
maps) fail even when values are equal. local_oracle.py is the strict
value/type gate; THIS script guards the emitted-schema canonicalization
rules (SURVEY §7.3 R6: no DECIMAL/ARRAY/MAP in emitted schemas).

Usage: python3 scripts/driver_hash_check.py <sfDir> <verifyOutDir> [key ...]
Exit code = number of failing keys.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for key in sorted(oracle):
        if only and key not in only:
            continue
        try:
            exp = canon(con.execute(oracle[key]).df())
            got = canon(pd.read_parquet(f"{out_dir}/{key}"))
            if sorted(exp.columns) != sorted(got.columns):
                fails.append(key)
                print(f"FAIL {key}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
                continue
            if len(exp) != len(got):
                fails.append(key)
                print(f"FAIL {key}: rows exp={len(exp)} got={len(got)}")
                continue
            he = pd.util.hash_pandas_object(exp, index=False)
            hg = pd.util.hash_pandas_object(got, index=False)
            if list(he) != list(hg):
                fails.append(key)
                bad = next(i for i, (a, b) in enumerate(zip(he, hg)) if a != b)
                print(f"FAIL {key}: hash mismatch, first at row {bad}:")
                print(f"  exp {exp.iloc[bad].to_dict()}")
                print(f"  got {got.iloc[bad].to_dict()}")
                print(f"  dtypes exp={dict(exp.dtypes.astype(str))}")
                print(f"  dtypes got={dict(got.dtypes.astype(str))}")
            else:
                print(f"ok   {key} ({len(exp)} rows)")
        except Exception as e:  # noqa: BLE001
            fails.append(key)
            print(f"FAIL {key}: {type(e).__name__}: {e}")
    print(f"{len(oracle) - len(fails) if not only else len(only) - len(fails)}"
          f"/{len(only) if only else len(oracle)} passed")
    sys.exit(len(fails))


if __name__ == "__main__":
    main()
