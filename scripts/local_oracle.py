#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §5.2 T2).

Usage: python3 scripts/local_oracle.py <sfDir> <verifyOutDir> [key ...]

For every key in <verifyOutDir>/oracle_sql.json (or just the keys given):
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - load the Spark result parquet from <verifyOutDir>/<key>/
  - STRICT compare: column-name sets, DuckDB-reported column types (python
    value equality is type-insensitive across numerics), and row-by-row
    ordered tuple equality — values, row ORDER, and types must all match.

Exit code = number of failing keys.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: requested keys not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(1)
    fails = []
    for key in sorted(oracle):
        if only and key not in only:
            continue
        sql = oracle[key]
        try:
            con.execute(f"CREATE OR REPLACE VIEW _exp AS {sql}")
            con.execute(
                "CREATE OR REPLACE VIEW _got AS SELECT * FROM "
                f"read_parquet('{out_dir}/{key}/*.parquet')")
            exp_cols = [r[0] for r in con.execute("DESCRIBE _exp").fetchall()]
            got_cols = [r[0] for r in con.execute("DESCRIBE _got").fetchall()]
            if sorted(exp_cols) != sorted(got_cols):
                fails.append(key)
                print(f"FAIL {key}: columns exp={sorted(exp_cols)} got={sorted(got_cols)}")
                continue
            # Column TYPES must match the oracle exactly (python == is
            # type-insensitive for numerics: 1 == 1.0, Decimal('1') == 1 —
            # so value compare alone would miss decimal/double/int drift,
            # and tz-aware timestamps would slip through as equal values).
            exp_types = {r[0]: r[1] for r in con.execute("DESCRIBE _exp").fetchall()}
            got_types = {r[0]: r[1] for r in con.execute("DESCRIBE _got").fetchall()}
            tdiff = {c: (exp_types[c], got_types[c]) for c in exp_types
                     if exp_types[c] != got_types[c]}
            if tdiff:
                fails.append(key)
                print(f"FAIL {key}: column type mismatch {tdiff}")
                continue
            collist = ", ".join(f'"{c}"' for c in sorted(exp_cols))
            # strict: values, row ORDER, and python-level types must match
            exp = con.execute(f"SELECT {collist} FROM _exp").fetchall()
            got = con.execute(f"SELECT {collist} FROM _got").fetchall()
            if len(exp) != len(got):
                fails.append(key)
                print(f"FAIL {key}: rows exp={len(exp)} got={len(got)}")
            elif exp != got:
                i = next(i for i, (a, b) in enumerate(zip(exp, got)) if a != b)
                fails.append(key)
                print(f"FAIL {key}: first diff at row {i}:")
                print(f"  exp {exp[i]}")
                print(f"  got {got[i]}")
            else:
                print(f"ok   {key} ({len(exp)} rows)")
        except Exception as e:  # noqa: BLE001
            fails.append(key)
            print(f"FAIL {key}: {type(e).__name__}: {e}")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} passed" +
          (f"; FAILING: {' '.join(fails)}" if fails else ""))
    sys.exit(len(fails))


if __name__ == "__main__":
    main()
