#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (testing aid only;
the engine itself is pure Scala/Spark). Usage:
    python3 tools/compare.py [sfDir] [verifyOutDir]
"""
import duckdb, json, sys, os

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/target/verify_sf0.001'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    d = f'{out}/{name}'
    if not os.path.isdir(d):
        print(f'{name}: MISSING spark output'); fails.append(name); continue
    try:
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    except Exception as e:
        print(f'{name}: cannot read spark output: {str(e)[:200]}'); fails.append(name); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {str(e)[:300]}'); fails.append(name); continue
    g = got.reindex(sorted(got.columns), axis=1)
    e_ = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e_.columns):
        print(f'{name}: SCHEMA mismatch {list(g.columns)} vs {list(e_.columns)}')
        fails.append(name); continue
    if list(map(str, g.dtypes)) != list(map(str, e_.dtypes)):
        print(f'{name}: DTYPE mismatch {list(zip(g.columns, g.dtypes, e_.dtypes))}')
    if len(g) != len(e_):
        print(f'{name}: ROWCOUNT {len(g)} vs {len(e_)}'); fails.append(name); continue
    gs = g.astype(str).values.tolist()
    es = e_.astype(str).values.tolist()
    if gs != es:
        for i, (a, b) in enumerate(zip(gs, es)):
            if a != b:
                print(f'{name}: VALUE diff at row {i}:\n  spark:  {a}\n  oracle: {b}')
                break
        fails.append(name); continue
    print(f'{name}: OK ({len(g)} rows)')
print('FAILED:', fails if fails else 'none')
sys.exit(1 if fails else 0)
