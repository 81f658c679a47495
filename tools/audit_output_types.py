"""Audit every registered query's OUTPUT schema for driver-harness-unsafe
column types.

The driver canonicalizes Spark and DuckDB results through pandas
``DataFrame.sort_values`` before hashing; list-, map-, and struct-typed
cells become Python list/dict objects there and raise
``TypeError: unhashable type`` (observed: cdc_token_lookup, round 1).
Safe outputs therefore expose only atomic columns — project arrays
through ``portable.f_tokens_fingerprint`` (Spark) /
``portable.sql_tokens_fingerprint`` (DuckDB) or another scalarizer.

Usage: python tools/audit_output_types.py [sf_dir] [query ...]
Exit 1 if any registered query returns a complex-typed column.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from embulk_output_databricks_spark.session import build_session

    spark = build_session("audit-output-types")
    bad, errs = [], []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            errs.append((name, repr(e)[:200]))
            continue
        complex_cols = [f"{f.name}:{f.dataType.simpleString()}"
                        for f in df.schema.fields
                        if isinstance(f.dataType, COMPLEX)]
        if complex_cols:
            bad.append((name, complex_cols))
            print(f"UNSAFE {name}: {complex_cols}", flush=True)
        else:
            print(f"ok     {name}", flush=True)
    for name, e in errs:
        print(f"ERROR  {name}: {e}", flush=True)
    print(f"\n{len(bad)} unsafe, {len(errs)} errored", flush=True)
    sys.exit(1 if bad or errs else 0)


if __name__ == "__main__":
    main()
