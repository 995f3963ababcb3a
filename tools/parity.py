#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and strictly compare with the parquet
Verify dumped. Columns sorted by name, rows sorted by all columns, values
compared exactly (floats bitwise). Usage: parity.py <sfdir> <verify_out>."""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(con, rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad += 1
            continue
        try:
            got = canon(con, con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            bad += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            bad += 1
            continue
        mismatch = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (w, g) in enumerate(zip(wv, gv)):
                same = (w == g) or (w is None and g is None)
                try:
                    if isinstance(w, float) and isinstance(g, float):
                        same = (w == g) or (math.isnan(w) and math.isnan(g))
                except Exception:
                    pass
                if not same:
                    mismatch = (c, i, w, g)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, w, g = mismatch
            print(f"FAIL {name}: col={c} row={i} want={w!r} got={g!r}")
            bad += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
