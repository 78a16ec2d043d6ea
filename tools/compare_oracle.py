#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Spark result
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same scale dir, and diff values (column names sorted, rows sorted).
Usage: tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0: v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s = con.execute(f"select * from '{spark_path}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if len(cs) != len(co):
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}")
            n_fail += 1; continue
        if cs != co:
            bad = [i for i, (a, b) in enumerate(zip(cs, co)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted-rows {bad}")
            for i in bad[:2]:
                print(f"  spark : {cs[i][:300]}")
                print(f"  oracle: {co[i][:300]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(cs)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
