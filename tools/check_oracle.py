#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, registers every testdata table as a
DuckDB view over <sf_dir>/<table>.parquet, runs each oracle SQL, and compares
against the Spark result parquet at <verify_out_dir>/<name>/ — columns sorted
by name, rows sorted by all columns, values stringified then hashed.
Prints per-query PASS/FAIL with first-diff details on mismatch.

Dev-loop tool only (duckdb/pandas are driver-side deps, not library deps).
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rel):
    """DuckDB relation -> (sorted col names, sorted row tuples of strings)."""
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [cols[i] for i in order], rows


def table_hash(cols, rows):
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()[:16]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = nskip = 0
    import os
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols, srows = canon(spark_rel)
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            nskip += 1
            continue
        try:
            ocols, orows = canon(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            nfail += 1
            continue
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        if sh == oh:
            print(f"PASS {name} ({len(srows)} rows)")
            npass += 1
        else:
            nfail += 1
            print(f"FAIL {name}: hash {sh} != {oh} "
                  f"(spark {len(srows)} rows, oracle {len(orows)} rows)")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"  first diff at sorted-row {i}:")
                    print(f"    spark : {a}")
                    print(f"    oracle: {b}")
                    break
            else:
                n = min(len(srows), len(orows))
                if len(srows) != len(orows):
                    extra = srows[n:n + 2] if len(srows) > n else orows[n:n + 2]
                    print(f"  row-count diff; first extra: {extra}")
    print(f"== {npass} pass, {nfail} fail, {nskip} no-oracle")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
