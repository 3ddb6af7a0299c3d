#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and diff. Usage:
    python3 tools/check_gate.py [sfdir] [outdir]
(driver-side tooling only — the Scala library never depends on this)"""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation noise after the queries' own rounding
        return repr(round(v + 0.0, 9))
    return v

def frame_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    declared = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    for name in declared:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)"); n_ok += 1; continue
        try:
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        sc, sr = frame_key(sdf)
        dc, dr = frame_key(ddf)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_bad += 1; continue
        if sr == dr:
            print(f"ok   {name}: {len(sr)} rows match"); n_ok += 1
        else:
            n_bad += 1
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows; first diffs: {diffs}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
