#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Mirrors the driver's comparator asymmetry (the round-2 lesson): the
SPARK side is read from the result parquet via pandas/pyarrow — decimal
columns surface as Decimal objects, arrays as numpy.ndarray — while the
ORACLE side runs through DuckDB's .df() conversion, where decimals
become float64. Reading both sides through DuckDB (the old version of
this tool) normalized those representations and hid 13 real failures.

Rules enforced here, matching the driver:
  * columns sorted by name, rows sorted after stringification;
  * Decimal vs float renders differently → FAIL (queries must cast
    decimals to DOUBLE at the output boundary — Verify.sanitize);
  * ndarray/list/dict cells → loud FAIL (they crash the driver's
    pandas sort with "unhashable type: numpy.ndarray").

Dev-loop tool only (duckdb/pandas are driver-side deps, not library deps).
"""
import datetime
import glob
import json
import hashlib
import os
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class Unhashable(Exception):
    pass


def norm_cell(v):
    # numpy scalar -> python scalar first so isinstance checks fire
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # Deliberately NOT collapsed to int when integral: the r03 driver
        # gate failed q_sql_recursive on int64 (Spark) vs float64 (DuckDB
        # HUGEINT via .df()) with equal values — the old collapse here
        # rendered both as "6" and hid it. An int-typed column vs a
        # float-typed column must FAIL locally too (cast the oracle:
        # CAST(sum(x) AS BIGINT)).
        return repr(v)
    if isinstance(v, Decimal):
        # Deliberately NOT normalized to float: the driver's comparator
        # sees the textual Decimal repr, so a decimal reaching this point
        # must fail against the oracle's float rendering.
        return "Decimal(" + str(v) + ")"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        raise Unhashable(type(v).__name__)
    if isinstance(v, pd.Timestamp):
        s = v.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, datetime.datetime):
        s = v.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon(df):
    """pandas DataFrame -> (sorted col names, sorted row tuples of strings)."""
    cols = sorted(df.columns)
    sub = df[cols]
    rows = [tuple(norm_cell(x) for x in tup)
            for tup in sub.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def table_hash(cols, rows):
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()[:16]


def read_spark(result_dir):
    files = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    if not files:
        raise RuntimeError(f"no parquet files under {result_dir}")
    return pd.concat([pd.read_parquet(f, engine="pyarrow") for f in files],
                     ignore_index=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = nskip = 0
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        try:
            scols, srows = canon(read_spark(os.path.join(out_dir, name)))
        except Unhashable as e:
            print(f"FAIL {name}: spark output has array/map cell ({e}) — "
                  f"would crash the driver comparator; emit array_join strings")
            nfail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            nskip += 1
            continue
        try:
            ocols, orows = canon(con.sql(oracle[name]).df())
        except Unhashable as e:
            print(f"FAIL {name}: oracle output has array/map cell ({e}) — "
                  f"would crash the driver comparator; emit array_to_string")
            nfail += 1
            continue
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
