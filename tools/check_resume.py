#!/usr/bin/env python3
"""Resumable single-query variant of check.py with a DuckDB memory cap:
a blown-up oracle FAILS its row instead of OOM-killing the whole gate.
Usage: check_resume.py <sfDir> <outDir> <remaining.json> <log>
"""
import json, sys, os, subprocess

sf_dir, out_dir, rem_path, log_path = sys.argv[1:5]
remaining = json.load(open(rem_path))
for name in remaining:
    # one subprocess per query: an OOM kill loses only that query
    code = f'''
import duckdb, json, sys
sys.path.insert(0, "{os.path.dirname(os.path.abspath(__file__))}")
from check import connect, norm
import numpy as np
con = connect("{sf_dir}")
con.sql("SET memory_limit='24GB'")
oracle = json.load(open("{out_dir}/oracle_sql.json"))
name = "{name}"
sql = oracle[name]
res_dir = "{out_dir}/" + name
try:
    o = con.sql(sql).df()
except Exception as e:
    print(f"FAIL {{name}}: oracle error: {{e}}"); sys.exit(0)
s = con.sql(f"SELECT * FROM read_parquet('{{res_dir}}/*.parquet')").df()
o, s = norm(o), norm(s)
if list(o.columns) != list(s.columns):
    print(f"FAIL {{name}}: columns oracle={{list(o.columns)}} spark={{list(s.columns)}}"); sys.exit(0)
if len(o) != len(s):
    print(f"FAIL {{name}}: rows oracle={{len(o)}} spark={{len(s)}}"); sys.exit(0)
ok = True
for c in o.columns:
    a, b = o[c], s[c]
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        aa = a.astype(float).values; bb = b.astype(float).values
        bad = ~((aa == bb) | (np.isnan(aa) & np.isnan(bb)))
        if bad.any():
            d = np.nanmax(np.abs(aa - bb)); print(f"FAIL {{name}}: col {{c}} max|delta|={{d}}"); ok = False; break
    else:
        if not (a.astype(str).values == b.astype(str).values).all():
            print(f"FAIL {{name}}: col {{c}} value mismatch"); ok = False; break
if ok: print(f"PASS {{name}} ({{len(s)}} rows)")
'''
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
        out = (r.stdout + r.stderr).strip()
        line = out if out.startswith(("PASS", "FAIL")) else f"FAIL {name}: subprocess rc={r.returncode}: {out[-300:]}"
    except subprocess.TimeoutExpired:
        out = ""
        line = f"FAIL {name}: oracle timed out after 3600s"
    # keep only the verdict line
    for l in out.splitlines():
        if l.startswith(("PASS", "FAIL")):
            line = l
            break
    print(line, flush=True)
    with open(log_path, "a") as f:
        f.write(line + "\n")
