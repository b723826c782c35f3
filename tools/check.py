#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify (Spark) at a given SF, then executes each oracle SQL in
DuckDB over the same parquet tables, sorts columns by name + rows, and
compares values. Usage:

    python3 tools/check.py [sfdir] [outdir] [--skip-verify] [names...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
flags = [a for a in sys.argv[3:] if a.startswith("--")]
only = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in flags:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write("\n".join(
        l for l in (r.stdout + r.stderr).splitlines()
        if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

fails = []
names = only or sorted(oracle.keys())
for name in names:
    if name not in oracle:
        print(f"{name:28s} NO-ORACLE (rows-only)"); continue
    pdir = Path(f"{OUT}/{name}")
    if not pdir.exists():
        print(f"{name:28s} MISSING spark output"); fails.append(name); continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
        gcols, grows = canon(got.fetchall(), [d[0] for d in got.description])
        exp = con.sql(oracle[name])
        ecols, erows = canon(exp.fetchall(), [d[0] for d in exp.description])
    except Exception as e:
        print(f"{name:28s} ERROR {e}"); fails.append(name); continue
    if gcols != ecols:
        print(f"{name:28s} SCHEMA MISMATCH spark={gcols} oracle={ecols}")
        fails.append(name); continue
    if len(grows) != len(erows):
        print(f"{name:28s} ROWS {len(grows)} vs {len(erows)}")
        fails.append(name); continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"{name:28s} VALUES {len(bad)}/{len(grows)} differ; first @{i}:")
        print(f"    cols : {gcols}\n    spark: {a}\n    duck : {b}")
        fails.append(name)
    else:
        print(f"{name:28s} OK ({len(grows)} rows)")

print(f"\n{len(names)-len(fails)}/{len(names)} OK")
sys.exit(1 if fails else 0)
