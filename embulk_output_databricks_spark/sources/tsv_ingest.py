"""Staged TSV ingest — the reference's row->TSV->COPY INTO leg re-expressed
as one declarative scan+cast plan (SURVEY.md A4/B1).

The reference buffers rows into PostgreSQL-COPY-escaped TSV files and runs
    COPY INTO t FROM (SELECT _c0::<type> <name>, ... FROM '<file>')
    FILEFORMAT = CSV FORMAT_OPTIONS('nullValue' = '\\N', 'delimiter' = '\t')
(reference DatabricksOutputConnection.java:96-122; golden SQL
TestDatabricksOutputConnection.java:46-54). Null semantics are pinned by
the reference's README.md:76 + TestDatabricksOutputPluginByNullOrEmptyString
.java:19-49: `\\N` is NULL, a bare empty field is NULL, and only an
explicitly quoted "" survives as empty string.

Spark's CSV source reproduces those exact semantics with
nullValue='\\N' (probed and pinned in tests/test_ingest.py), and the
per-column cast/rename projection collapses into the scan, so the whole
leg is one distributed job — no local buffer files, no upload pool
(the reference's A6/A7/A8 thread machinery maps to Spark task parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.typemap import normalize_type_name

NULL_SENTINEL = "\\N"
DELIMITER = "\t"


def read_staged_tsv(spark: SparkSession, path: str, n_cols: int) -> DataFrame:
    """Scan a staged TSV as all-string columns _c0.._cN — the analog of the
    reference's raw `SELECT _c0, _c1 ... FROM '<file>'` inner scan."""
    schema = ", ".join(f"_c{i} string" for i in range(n_cols))
    return (
        spark.read
        .option("sep", DELIMITER)
        .option("nullValue", NULL_SENTINEL)
        .option("quote", '"')
        .schema(schema)
        .csv(path)
    )


def copy_cast(df: DataFrame, columns: list[tuple[str, str]],
              skip: set[str] | None = None) -> DataFrame:
    """The COPY projection: positional _cN -> cast(type) AS name, skipping
    skip-columns exactly as buildCopySQL elides them
    (DatabricksOutputConnection.java:100-115). `columns` is the ordered
    target (name, sql_type) list; type names pass through the reference's
    normalization (CLOB->STRING etc)."""
    skip = skip or set()
    out = []
    for i, (name, sql_type) in enumerate(columns):
        if name in skip:
            continue
        out.append(F.col(f"_c{i}").cast(normalize_type_name(sql_type)).alias(name))
    return df.select(*out)


def write_staged_tsv(df: DataFrame, path: str) -> None:
    """Writer twin (round-trip testing + interoperability): emits the same
    dialect the reader consumes — \\N nulls, tab delimiter, minimal quoting
    so an empty string is written as "" and survives the round trip."""
    (
        df.select([F.col(c).cast("string").alias(c) for c in df.columns])
        .write
        .option("sep", DELIMITER)
        .option("nullValue", NULL_SENTINEL)
        .option("emptyValue", '""')
        .option("quote", '"')
        .mode("overwrite")
        .csv(path)
    )
