#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir tables, and
compares: row count, column names, and values (columns sorted by name, rows
sorted by all columns; exact match required — the Spark/SQL sides are
expected to round floats identically).

Floats are compared BIT-EXACTLY (struct-packed), matching the driver's
byte-hash gate: -0.0 != +0.0 here, deliberately — the queries normalize
the sign of zero on both engines (`round(x, n) + 0.0`, see
src/main/scala/graft/contract/Norm.scala). The single exception is NaN,
which is canonicalized (engines may emit different NaN payloads).
"""
import sys, os, json, math, struct
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "\x00__NULL__"  # sortable alongside any type via repr below
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f64", struct.pack("<d", v).hex())  # bit-exact: -0.0 != +0.0
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def sort_key(row):
    return tuple((type(v).__name__, repr(v)) for v in row)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_match = n_mismatch = n_err = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"[MISSING-SPARK] {name}: no parquet dir")
            n_err += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        except Exception as e:
            print(f"[ERR-READ] {name}: {e}")
            n_err += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR-ORACLE] {name}: {type(e).__name__}: {e}")
            n_err += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"[SCHEMA] {name}: spark={gc} oracle={wc}")
            n_mismatch += 1
            continue
        gt = [str(got[c].dtype) for c in gc]
        wt = [str(want[c].dtype) for c in wc]
        if gt != wt:
            print(f"[DTYPES] {name}: spark={list(zip(gc, gt))} oracle={list(zip(wc, wt))}")
            n_mismatch += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
            n_mismatch += 1
            continue
        g = sorted((tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False, name=None)), key=sort_key)
        w = sorted((tuple(norm(v) for v in row) for row in want[wc].itertuples(index=False, name=None)), key=sort_key)
        if g == w:
            print(f"[MATCH] {name}: {len(got)} rows")
            n_match += 1
        else:
            bad = sum(1 for a, b in zip(g, w) if a != b)
            print(f"[VALUES] {name}: {bad}/{len(g)} differing rows (sorted)")
            for a, b in list(zip(g, w))[:2000]:
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
                    break
            n_mismatch += 1
    # queries with no oracle -> rows-only
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"[ROWS-ONLY] {name}: {n} rows")
    print(f"\nSUMMARY match={n_match} mismatch={n_mismatch} err={n_err}")
    sys.exit(0 if n_mismatch == 0 and n_err == 0 else 1)

if __name__ == "__main__":
    main()
