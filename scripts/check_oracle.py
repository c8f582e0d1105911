#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first:
<outDir>/<query>/ parquet dirs + <outDir>/oracle_sql.json. Mimics the driver:
registers each testdata parquet as a DuckDB view named after the table, runs
each oracle SQL, sorts columns by name, sorts rows, and compares cell values
EXACTLY — floats included (the old 1e-9-relative tolerance masked precisely
the failure class that survives to the driver — VERDICT r11 §3; q_f42's diff
was ~2600 ulp and this script called it a match).

One measured concession: floats differing by <= 2 ulp WARN but pass. Seven
queries publishing raw libm-bearing doubles (ln/exp/float-OLS: e15, e24,
f16, f20, f30, x128, x99) differ from DuckDB 1.0.0 at exactly the last ulp
on this box yet have been hash-GREEN on the driver for many rounds — so the
driver's hash provably absorbs last-ulp drift while catching everything
bigger. Anything beyond 2 ulp is a FAIL here, exactly like the driver.
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        # EXACT: equal reprs == bit-identical doubles.
        if repr(fa) == repr(fb):
            return True
        # <= 2 ulp: driver-tolerated libm noise — warn, don't fail
        lo, hi = (fa, fb) if fa < fb else (fb, fa)
        if math.nextafter(lo, math.inf) >= hi or \
                math.nextafter(math.nextafter(lo, math.inf),
                               math.inf) >= hi:
            return "ulp"
        return False
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        qdir = Path(out_dir, name)
        if not qdir.exists():
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            got = norm(pq.read_table(str(qdir)).to_pandas())
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1; continue
        bad = []
        ulps = 0
        for i in range(len(got)):
            for c in got.columns:
                r = cmp_cell(got.at[i, c], exp.at[i, c])
                if r == "ulp":
                    ulps += 1
                elif not r:
                    bad.append((i, c, got.at[i, c], exp.at[i, c]))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: first diffs {bad}")
            failures += 1
        elif ulps:
            print(f"WARN {name} ({len(got)} rows, {ulps} cells within "
                  "2 ulp — driver-tolerated libm noise)")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
