#!/usr/bin/env python3
"""Self-produced twin of the driver's CORRECTNESS_r{N}.json (round 14:
the driver's artifact came back empty `{}` two rounds running even though
the dump fits its window — this emits the same per-query verdicts from the
builder's own dump so the round always has a tracked correctness number).

Usage:
    python3 tools/correctness_artifact.py [sfDir] [verifyOutDir] [outJson]

Writes `{outJson}` as {"<query>": {"rows_match": bool, "schema_match":
bool, "hash_match": bool, "err": str|null}, ...} — one entry per oracle
query. Same compare semantics as tools/compare.py: columns sorted by name,
values stringified, exact row-order equality after each side's canonical
ORDER BY.
"""
import duckdb, hashlib, json, sys, os

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/target/verify_sf0.01'
dst = sys.argv[3] if len(sys.argv) > 3 else '/root/repo/CORRECTNESS_full_latest.json'

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def vhash(df):
    h = hashlib.sha256()
    for row in df.astype(str).values.tolist():
        h.update('\x1f'.join(row).encode() + b'\x1e')
    return h.hexdigest()


oracle = json.load(open(f'{out}/oracle_sql.json'))
res = {}
for name, sql in sorted(oracle.items()):
    r = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
    res[name] = r
    d = f'{out}/{name}'
    if not os.path.isdir(d):
        r["err"] = "missing spark output"
        continue
    try:
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    except Exception as e:
        r["err"] = f"cannot read spark output: {str(e)[:200]}"
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        r["err"] = f"oracle sql error: {str(e)[:200]}"
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e_ = exp.reindex(sorted(exp.columns), axis=1)
    r["rows_match"] = len(g) == len(e_)
    r["schema_match"] = list(g.columns) == list(e_.columns)
    r["hash_match"] = (r["rows_match"] and r["schema_match"]
                       and vhash(g) == vhash(e_))

ok = sum(1 for r in res.values() if r["hash_match"])
total = len(res)
# provenance rides IN the artifact (round-15 advice): a consumer must be
# able to tell this builder-graded twin from the driver's independently
# produced CORRECTNESS_r{N}.json without reading any docs
try:
    import subprocess
    sha = subprocess.run(['git', '-C', os.path.dirname(os.path.abspath(__file__)),
                          'rev-parse', 'HEAD'],
                         capture_output=True, text=True).stdout.strip() or 'unknown'
except Exception:
    sha = 'unknown'
res['_provenance'] = {
    "producer": "builder tools/correctness_artifact.py (self-graded twin, "
                "NOT the driver's artifact)",
    "git_sha": sha, "sf_dir": sf, "verify_dump": out,
    "hash_match": ok, "total": total}
with open(dst, 'w') as f:
    json.dump(res, f, indent=0, sort_keys=True)
    f.write('\n')
print(f'{ok}/{total} hash-match -> {dst}')
sys.exit(0 if ok == total else 1)
