#!/usr/bin/env python3
"""Dev-only oracle simulator (mirrors the driver's t2 check; NOT part of
the engine — the engine is pure Scala/Spark). Usage:

  python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from oracle_sql.json in DuckDB against the sfDir tables, and compares
row count, sorted-column values, and a value hash.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def cell(v):
    if isinstance(v, float):
        return f"{v!r}"
    return repr(v)


def frame_repr(df: pd.DataFrame) -> list[str]:
    return ["|".join(cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})").df())
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); n_rowsonly += 1
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        g, w = frame_repr(got), frame_repr(want)
        bad = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"  spark:  {g[i][:300]}")
            print(f"  duckdb: {w[i][:300]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
