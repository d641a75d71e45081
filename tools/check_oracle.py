#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: for each query dir
written by graft.Verify, run the oracle SQL in DuckDB over the same
parquet tables and compare row count, schema (column names), and a
value hash (columns sorted by name, rows sorted by all columns, values
rounded like the driver presumably does — we compare exactly and also
with 1e-9 relative tolerance fallback per cell).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Dev-only tool; not part of the Scala library.
"""
import sys, json, glob, os
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (a directory of part files), e.g. the
            # sf1 replica corpus from BenchScaleUp/VerifyScaleUp
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(spark_df)} rows)")
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, ora_df)
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def compare(a, b):
    import pandas as pd
    ca, cb = sorted(a.columns), sorted(b.columns)
    if ca != cb:
        return False, f"schema mismatch: spark={ca} oracle={cb}"
    if len(a) != len(b):
        return False, f"row count: spark={len(a)} oracle={len(b)}"
    a = a[ca].copy()
    b = b[ca].copy()
    # normalize dtypes for sort/compare
    for c in ca:
        # int-vs-float dtype skew is a driver-hash failure even when the
        # values agree: the driver hashes rendered strings, so int64 32
        # vs HUGEINT-degraded-to-float 32.0 mismatch ("32" != "32.0").
        # Seen live in round 2 (q_seq_pack/q_curate: DuckDB window
        # sum(BIGINT) is HUGEINT -> pandas float64). Flag it hard here.
        ia = str(a[c].dtype).startswith(("int", "uint"))
        ib = str(b[c].dtype).startswith(("int", "uint"))
        fa = str(a[c].dtype).startswith("float")
        fb = str(b[c].dtype).startswith("float")
        if (ia and fb) or (fa and ib):
            return False, (f"col {c} dtype skew: spark={a[c].dtype} vs "
                           f"oracle={b[c].dtype} — driver string-hash would "
                           f"mismatch (CAST the oracle column)")
        if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
            a[c] = a[c].astype("float64")
            b[c] = b[c].astype("float64")
        if a[c].dtype == object:
            a[c] = a[c].astype(str)
            b[c] = b[c].astype(str)
    a = a.sort_values(ca, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(ca, kind="mergesort").reset_index(drop=True)
    for c in ca:
        if a[c].dtype == "float64":
            import numpy as np
            aa, bb = a[c].to_numpy(), b[c].to_numpy()
            nan_ok = (pd.isna(aa) == pd.isna(bb)).all()
            m = ~pd.isna(aa)
            close = np.allclose(aa[m], bb[m], rtol=1e-9, atol=1e-12)
            exact = (aa[m] == bb[m]).all()
            if not (nan_ok and close):
                i = int(np.argmax(~np.isclose(aa, bb, rtol=1e-9, atol=1e-12, equal_nan=True)))
                return False, f"col {c} differs at sorted row {i}: {aa[i]} vs {bb[i]}"
            if not exact:
                print(f"  (note: col {c} matches only within 1e-9 tolerance — driver hash may flag)")
        else:
            # NaT == NaT and None == None must count as equal (datetime
            # columns with nulls otherwise always "differ")
            eq = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
            if not eq.all():
                i = int((~eq).to_numpy().argmax())
                return False, f"col {c} differs at sorted row {i}: {a[c][i]!r} vs {b[c][i]!r}"
    return True, ""

if __name__ == "__main__":
    main()
