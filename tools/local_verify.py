#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/local_verify.py [sfdir] [outdir] [--skip-spark]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_spark():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUTDIR}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[error]" in l or "failed" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and fold float32/float64 repr noise at 1e-9 grain
        v = v + 0.0
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
    return str(v)


def canon(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    pydict = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    rows = [tuple(norm_val(pydict[c][i]) for c in cols) for i in range(n)]
    return cols, rows, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    oracle = json.loads(Path(f"{OUTDIR}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

    results = {}
    spark_dirs = [p for p in Path(OUTDIR).iterdir() if p.is_dir()]
    for qdir in sorted(spark_dirs):
        name = qdir.name
        files = list(qdir.glob("*.parquet"))
        if not files:
            results[name] = "SPARK-EMPTY-OUTPUT"
            continue
        spark_tbl = pq.read_table(qdir)
        if name not in oracle:
            results[name] = f"rows-only: {spark_tbl.num_rows} rows"
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        sc, sraw, sr = canon(spark_tbl)
        dc, draw, dr = canon(duck_tbl)
        if sc != dc:
            results[name] = f"SCHEMA-MISMATCH spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first-diffs={diffs}"
        elif sraw != draw:
            # sorted-equal but order differs: hash-safe only if the driver
            # sorts rows; flag it so the ORDER BY gets fixed.
            results[name] = f"ORDER-DIFF ({len(sr)} rows; sorted rows equal)"
        else:
            results[name] = f"OK ({len(sr)} rows)"
    for name in sorted(oracle):
        if name not in results:
            results[name] = "MISSING-SPARK-OUTPUT"

    width = max(len(n) for n in results) if results else 0
    ok = True
    for name in sorted(results):
        status = results[name]
        if not (status.startswith("OK") or status.startswith("rows-only")):
            ok = False
        print(f"{name:<{width}}  {status}")
    print("ALL GREEN" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
