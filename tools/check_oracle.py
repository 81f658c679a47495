"""Local mimic of the driver's correctness gate: run each __spark_entry__
query and its DuckDB oracle side by side at a given sf dir, compare
row-count, column-name set, and order-insensitive canonical values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import struct
import sys
import time

import duckdb
from pyspark.sql import types as ST

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if val is None:
        return "\x00"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return struct.pack("<d", val).hex()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = ["|".join(canon(r[c]) for c in cols) for _, r in pdf.iterrows()]
    rows.sort()
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from embulk_output_databricks_spark.session import build_session

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # the DRIVER harness canonicalizes via pandas sort_values,
            # where list/dict cells raise "unhashable type" (round-1
            # cdc_token_lookup): reject complex-typed output columns here
            # so the local gate catches them before the driver does
            complex_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType,
                              (ST.ArrayType, ST.MapType, ST.StructType))]
            if complex_cols:
                raise TypeError(
                    f"harness-unsafe output columns {complex_cols}: project "
                    "arrays through portable.f_tokens_fingerprint (or "
                    "another scalarizer) in BOTH the query and its oracle")
            sdf = df.toPandas()
        except Exception as ex:
            fails.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            fails.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if not problems:
            a, b = canon_rows(sdf), canon_rows(odf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            fails.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {problems}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} queries pass")
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
