#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: tools/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers each fixture parquet as a DuckDB view named like the table,
runs every oracle_sql.json entry, and compares against the Spark result
parquet: columns sorted by name, rows sorted by all columns, exact value
equality (NaN==NaN, None==None).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in idx], out

import re

def canon_type(t):
    # collapse 8/16/32/64-bit ints (handles nested types too: BIGINT[]);
    # HUGEINT and UBIGINT deliberately NOT in the list — neither fits
    # int64, so values above 2^63-1 would genuinely diverge from any
    # Spark column and must surface as a dtype mismatch, not be papered
    # over by width normalization. Timestamps compare by family
    # (unit divergence shows up in VALUES, which the row diff catches).
    t = re.sub(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT|UTINYINT|USMALLINT|UINTEGER)\b",
               "INT", t)
    t = re.sub(r"\bTIMESTAMP(_NS|_MS|_S| WITH TIME ZONE)?\b", "TIMESTAMP", t)
    return t

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql)
            dcols = [c for c in duck.columns]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sp = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        scols = [c for c in sp.columns]
        srows = sp.fetchall()
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns differ duck={sorted(dcols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # Dtype gate: the driver's hash is dtype-sensitive (HUGEINT vs
        # BIGINT, DECIMAL width), so a value-equal result with a diverging
        # oracle dtype still fails the round. Catch that class locally by
        # comparing DuckDB's oracle result types against the Spark parquet
        # schema (as DuckDB reads it) column-by-column. Integer widths up
        # to 64 bits are equivalent at the driver (int32 and int64 values
        # hash the same — r10 evidence: 21 INTEGER-vs-BIGINT queries were
        # hash-green while the HUGEINT one failed), so normalize those;
        # HUGEINT (int128, no faithful 64-bit repr), DECIMAL width, and
        # float width stay distinct.
        dtypes = {c: canon_type(str(t)) for c, t in zip(dcols, duck.types)}
        stypes = {c: canon_type(str(t)) for c, t in zip(scols, sp.types)}
        bad = [c for c in dtypes if dtypes[c] != stypes[c]]
        if bad:
            print(f"FAIL {name}: dtypes differ on "
                  + ", ".join(f"{c} duck={dtypes[c]} spark={stypes[c]}" for c in bad))
            n_fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dr == sr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(dr)} duck rows vs {len(sr)} spark rows")
            for i, (a, b) in enumerate(zip(dr, sr)):
                if a != b:
                    print(f"  first diff at row {i} (cols {dc}):\n    duck : {a}\n    spark: {b}")
                    break
            else:
                if len(dr) != len(sr):
                    lim = min(len(dr), len(sr))
                    print(f"  extra rows from {lim}: "
                          f"{'duck' if len(dr) > len(sr) else 'spark'} has more; "
                          f"first extra: {(dr + sr)[lim]}")
    # rows-only checks for oracle-less queries
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle and not (only and name not in only):
            n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
