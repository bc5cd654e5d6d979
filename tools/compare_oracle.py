#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each query's
parquet dump (written by `sbt "runMain graft.Verify <sfDir> <outDir>"`),
run the corresponding oracle SQL in DuckDB over the same sf tables, and
compare values (columns sorted by name, rows sorted, 1e-9 tolerance on
floats). Usage: compare_oracle.py <sfDir> <outDir>
"""
import duckdb, json, sys, glob, math, os

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["documents", "embeddings", "events", "lineitem", "orders",
          "customer", "nation", "region", "part", "supplier"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

fails = 0
for name in sorted(set(list(oracle.keys()) + [os.path.basename(p) for p in glob.glob(out_dir + "/q*")])):
    pq = os.path.join(out_dir, name)
    if not os.path.isdir(pq):
        print(f"{name}: MISSING spark dump"); fails += 1; continue
    spark_rel = con.execute(f"SELECT * FROM parquet_scan('{pq}/*.parquet')")
    scols = [d[0] for d in spark_rel.description]
    srows = spark_rel.fetchall()
    if name not in oracle:
        print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
        continue
    try:
        orel = con.execute(oracle[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); fails += 1; continue
    if sorted(scols) != sorted(ocols):
        print(f"{name}: COLUMN MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
        fails += 1; continue
    # Type-strict like the driver's hash gate: a DuckDB HUGEINT sum vs a
    # Spark BIGINT hashes differently even when values match (round-1
    # q04/q06/q24 bug class). duckdb exposes the type name in description.
    stypes = {d[0]: str(d[1]) for d in spark_rel.description}
    otypes = {d[0]: str(d[1]) for d in orel.description}
    tdiff = [c for c in stypes if stypes[c] != otypes.get(c)]
    if tdiff:
        print(f"{name}: TYPE MISMATCH " +
              ", ".join(f"{c}: spark={stypes[c]} oracle={otypes.get(c)}" for c in tdiff))
        fails += 1; continue
    a, b = canon(srows, scols), canon(orows, ocols)
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
        print("  spark head:", a[:2]); print("  oracle head:", b[:2])
        fails += 1; continue
    diff = [(x, y) for x, y in zip(a, b) if x != y]
    if diff:
        print(f"{name}: VALUE MISMATCH ({len(diff)}/{len(a)} rows)")
        for x, y in diff[:3]:
            print("   spark :", x); print("   oracle:", y)
        fails += 1
    else:
        print(f"{name}: OK ({len(a)} rows)")

print(f"\n{'FAIL' if fails else 'ALL OK'} ({fails} failures)")
sys.exit(1 if fails else 0)
