"""Type-conversion matrix + ruby-strftime translation (SURVEY.md A4/A5).

Mirrors three reference behaviors:

1. value_type coercions — the per-column intermediate representation knob
   (reference README.md:42; matrix test
   TestDatabricksOutputPluginByOutputValueType.java:11-34). Here each
   value_type is a Column->Column cast/format (JVM-side, no Python).

2. SQL type-name normalization — CLOB->STRING, DOUBLE PRECISION->DOUBLE,
   FLOAT(n)->FLOAT (DatabricksOutputConnection.java:251-262).

3. Ruby strftime -> Spark datetime pattern translation for
   timestamp_format/timezone column options (reference README.md:39,43-44,
   default `%Y-%m-%d %H:%M:%S.%6N`; timezone-shift semantics pinned by
   TestDatabricksOutputPluginByOutputType.java:61-96, e.g. the UTC->
   Asia/Tokyo day rollover at :79-83).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- 2. names

_TYPE_NORMALIZE = {
    "clob": "string",
    "double precision": "double",
    "text": "string",
    "varchar": "string",
    "bigint": "bigint",
}

_FLOAT_N = re.compile(r"^float\s*\(\s*\d+\s*\)$")


def normalize_type_name(sql_type: str) -> str:
    """Reference type-name fixes + passthrough to Spark DDL type names."""
    t = sql_type.strip().lower()
    if _FLOAT_N.match(t):
        return "float"
    return _TYPE_NORMALIZE.get(t, t)


# ---------------------------------------------------------------- 3. strftime

# ruby token -> Spark (java.time) pattern fragment
_STRFTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%k": "H", "%I": "hh", "%M": "mm", "%S": "ss",
    "%L": "SSS", "%N": "SSSSSSSSS",
    "%3N": "SSS", "%6N": "SSSSSS", "%9N": "SSSSSSSSS",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%p": "a", "%z": "xx", "%:z": "xxx", "%Z": "zzz", "%%": "'%'",
}

_TOKEN = re.compile("|".join(re.escape(k) for k in sorted(_STRFTIME, key=len, reverse=True)))


def ruby_to_spark_format(fmt: str) -> str:
    """Translate a ruby strftime string to a Spark datetime pattern,
    quoting literal runs that contain letters (java.time requirement)."""
    out: list[str] = []
    pos = 0
    for m in _TOKEN.finditer(fmt):
        if m.start() > pos:
            out.append(_quote_literal(fmt[pos:m.start()]))
        out.append(_STRFTIME[m.group(0)])
        pos = m.end()
    if pos < len(fmt):
        out.append(_quote_literal(fmt[pos:]))
    return "".join(out)


def _quote_literal(s: str) -> str:
    if re.search(r"[A-Za-z]", s):
        return "'" + s.replace("'", "''") + "'"
    return s


DEFAULT_TIMESTAMP_FORMAT = "%Y-%m-%d %H:%M:%S.%6N"  # reference README.md:39


def format_timestamp(col: Column, ruby_fmt: str = DEFAULT_TIMESTAMP_FORMAT,
                     timezone: str = "UTC") -> Column:
    """Render a (UTC-stored) timestamp as text in the per-column timezone —
    the reference's column_options timestamp_format/timezone leg. The
    session zone is pinned UTC (session.py), so the zone shift is explicit."""
    shifted = F.from_utc_timestamp(col, timezone) if timezone != "UTC" else col
    return F.date_format(shifted, ruby_to_spark_format(ruby_fmt))


# ---------------------------------------------------------------- 1. matrix

VALUE_TYPES = {
    "byte", "short", "int", "long", "double", "float", "boolean", "string",
    "nstring", "date", "time", "timestamp", "decimal", "json", "null", "pass",
}


def coerce_value(col: Column, value_type: str,
                 timestamp_format: str = DEFAULT_TIMESTAMP_FORMAT,
                 timezone: str = "UTC") -> Column:
    """Apply one value_type coercion (README.md:42 matrix). `pass` is
    identity; `null` forces NULL; `time` renders clock time as text (the
    closest analog of the reference's TIME intermediate, which Databricks
    also stores as string); decimal pins scale like the JDBC default."""
    vt = value_type.lower()
    if vt not in VALUE_TYPES:
        raise ValueError(f"unknown value_type {value_type!r}")
    if vt == "pass":
        return col
    if vt == "null":
        return F.lit(None)
    if vt in ("byte", "short", "int", "long", "double", "float", "boolean"):
        spark_t = {"byte": "tinyint", "short": "smallint", "int": "int",
                   "long": "bigint", "double": "double", "float": "float",
                   "boolean": "boolean"}[vt]
        return col.cast(spark_t)
    if vt in ("string", "nstring", "json"):
        return col.cast("string")
    if vt == "date":
        return col.cast("date")
    if vt == "time":
        return F.date_format(col.cast("timestamp"), "HH:mm:ss.SSSSSS")
    if vt == "timestamp":
        return format_timestamp(col.cast("timestamp"), timestamp_format, timezone)
    if vt == "decimal":
        return col.cast("decimal(38,9)")
    raise AssertionError(vt)  # pragma: no cover
