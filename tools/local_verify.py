#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify (already-built classes via java, or sbt runMain),
then executes each oracle_sql.json entry in DuckDB over the same
testdata parquet and compares to the Spark parquet output:
column names (sorted), dtypes, row count, and values row-by-row.

Usage: python3 tools/local_verify.py [sfdir] [outdir] [--skip-spark]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def run_spark():
    import subprocess
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=1800)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit(1)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(name, sql, con):
    out = Path(OUT_DIR) / name
    if not out.exists():
        return f"MISSING spark output"
    spark = con.execute(
        f"SELECT * FROM read_parquet('{out}/*.parquet')").fetchdf()
    oracle = con.execute(sql).fetchdf()
    s_cols, o_cols = sorted(spark.columns), sorted(oracle.columns)
    if s_cols != o_cols:
        return f"COLS spark={s_cols} oracle={o_cols}"
    if len(spark) != len(oracle):
        return f"ROWS spark={len(spark)} oracle={len(oracle)}"
    spark, oracle = spark[s_cols], oracle[s_cols]
    st = [str(t) for t in spark.dtypes]
    ot = [str(t) for t in oracle.dtypes]
    mismatch_t = [f"{c}:{a}!={b}" for c, a, b in zip(s_cols, st, ot) if a != b]
    for i in range(len(spark)):
        for c in s_cols:
            a, b = norm(spark[c].iloc[i]), norm(oracle[c].iloc[i])
            an = a is None or (isinstance(a, float) and math.isnan(a))
            bn = b is None or (isinstance(b, float) and math.isnan(b))
            if an and bn:
                continue
            if a != b:
                return (f"VALUE row {i} col {c}: spark={a!r} oracle={b!r}"
                        + (f" [dtypes: {mismatch_t}]" if mismatch_t else ""))
    if mismatch_t:
        return f"DTYPES {mismatch_t} (values match)"
    return None


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    oracles = json.loads((Path(OUT_DIR) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    fails = 0
    rows_only = []
    for name in sorted(Path(OUT_DIR).iterdir()):
        if not name.is_dir():
            continue
        q = name.name
        if q not in oracles:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{name}/*.parquet')"
            ).fetchone()[0]
            rows_only.append(f"{q} (rows={n})")
            continue
        err = compare(q, oracles[q], con)
        if err:
            fails += 1
            print(f"FAIL {q}: {err}")
        else:
            print(f"ok   {q}")
    print(f"\nrows-only (no oracle): {rows_only}")
    print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
