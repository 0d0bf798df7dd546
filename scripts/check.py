#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only).

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: columns sorted by name, rows sorted by all columns, exact
value equality (floats reported with max-abs-diff so tolerance issues
are visible before the real driver run).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def dtype_name(t: pa.DataType) -> str:
    """Normalize an arrow type to the name used for strict comparison.

    The driver's hash is dtype-sensitive (DuckDB SUM(BIGINT) -> decimal128
    vs Spark int64 hashes differently even when values match), so compare
    arrow types strictly, modulo representation-only variants
    (large_string==string etc.)."""
    s = str(t)
    s = (s.replace("large_string", "string")
          .replace("large_binary", "binary")
          .replace("large_list", "list"))
    # list child FIELD NAMES are representation, not data: Spark writes
    # list<element: T>, DuckDB emits list<l: T>. The driver hashes
    # VALUES (pandas-level), where the inner name does not exist, and
    # its schema check is column-name-level (round-1 evidence: HUGEINT
    # vs int64 passed schema_match) — so ignore the child name here.
    import re
    s = re.sub(r"list<\w+: ", "list<item: ", s)
    return s

def arrow_dtypes(tbl: pa.Table) -> dict:
    return {f.name: dtype_name(f.type) for f in tbl.schema}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            # lists/arrays → tuple for sortability
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(set([os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)])
                   | set(oracle.keys()))
    if len(sys.argv) > 3:  # optional: check only the named queries
        names = [n for n in names if n in set(sys.argv[3:])]
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        got = got_tbl.to_pandas()
        if name not in oracle:
            print(f"-     {name}: no oracle ({len(got)} rows)"); n_noracle += 1; continue
        try:
            exp_tbl = con.sql(oracle[name]).arrow()
            exp = exp_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # Driver-hazard dtypes (r03 evidence): list-typed output columns
        # crash the driver's pandas row-sort (unhashable ndarray), and
        # decimal outputs reach the hash through different pandas dtypes
        # from DuckDB (.df) vs parquet (pyarrow). Fail them here even
        # though this script could compare them — local green must mean
        # driver green.
        hazard = [f.name for f in got_tbl.schema
                  if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                  or pa.types.is_decimal(f.type)]
        if hazard:
            print(f"FAIL  {name}: driver-hazard output dtype (list/decimal): {hazard}")
            n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if sorted(g.columns) != sorted(e.columns):
            print(f"FAIL  {name}: columns spark={sorted(g.columns)} oracle={sorted(e.columns)}")
            n_fail += 1; continue
        gd, ed = arrow_dtypes(got_tbl), arrow_dtypes(exp_tbl)
        dt_bad = [f"{c}: spark={gd[c]} oracle={ed[c]}" for c in sorted(gd) if gd[c] != ed[c]]
        if dt_bad:
            print(f"FAIL  {name}: dtype mismatch: " + "; ".join(dt_bad[:4])); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv.dtype) or pd.api.types.is_float_dtype(ev.dtype):
                gvn = gv.astype(float).to_numpy(); evn = ev.astype(float).to_numpy()
                both_nan = np.isnan(gvn) & np.isnan(evn)
                diff = np.abs(gvn - evn)
                diff[both_nan] = 0.0
                md = np.nanmax(diff) if len(diff) else 0.0
                if not (md == 0.0):
                    bad.append(f"{c}: max|Δ|={md:.3e}")
            else:
                eq = (gv.isna() & ev.isna()) | (gv == ev)
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    bad.append(f"{c}: first mismatch row {i}: {gv.iloc[i]!r} vs {ev.iloc[i]!r}")
        if bad:
            print(f"FAIL  {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
