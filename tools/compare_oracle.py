#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each <outDir>/<name> parquet result against its oracle SQL executed by DuckDB
over the same source tables. Columns sorted by name, rows sorted by all
columns, values hash-compared (mirrors the driver's described procedure).

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import duckdb, glob, hashlib, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        # repr gives shortest round-trip; normalize -0.0
        if val == 0.0:
            val = 0.0
        return repr(float(val))
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, bytes):
        return val.hex()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def frame_hash(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return cols, len(rows), h.hexdigest(), rows

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        res_glob = os.path.join(out_dir, name, "*.parquet")
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no spark result parquet at {res_glob}")
            failures += 1
            continue
        scols, srows, shash, sdata = frame_hash(
            con, f"SELECT * FROM read_parquet('{res_glob}')")
        ocols, orows, ohash, odata = frame_hash(con, oracle[name])
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            failures += 1
        elif srows != orows:
            print(f"FAIL {name}: rowcount spark={srows} oracle={orows}")
            failures += 1
        elif shash != ohash:
            diff = [(a, b) for a, b in zip(sdata, odata) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diff}")
            failures += 1
        else:
            print(f"OK   {name}: rows={srows}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
