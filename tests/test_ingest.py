"""Staged TSV ingest + type-conversion matrix — reference parity for the
row->TSV->COPY leg (SURVEY.md A4/A5/B1).

Mirrored fixtures:
  null vs empty string      TestDatabricksOutputPluginByNullOrEmptyString.java:19-49
  COPY cast projection      golden SQL TestDatabricksOutputConnection.java:46-54
  value_type matrix         TestDatabricksOutputPluginByOutputValueType.java:11-34
  timestamp format/zone     TestDatabricksOutputPluginByOutputType.java:61-96
                            (incl. the UTC->Asia/Tokyo day rollover :79-83)
  type-name normalization   DatabricksOutputConnection.java:251-262
"""

import datetime

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.functions.typemap import (
    coerce_value,
    format_timestamp,
    normalize_type_name,
    ruby_to_spark_format,
)
from embulk_output_databricks_spark.sources.tsv_ingest import (
    copy_cast,
    read_staged_tsv,
    write_staged_tsv,
)


class TestNullEmptyString:
    """README.md:76: empty input -> NULL; only a quoted "" survives."""

    def test_read_semantics(self, spark, tmp_path):
        p = tmp_path / "in.tsv"
        p.write_text('a\t\\N\tx\n\t""\ty\n')
        df = read_staged_tsv(spark, str(p), 3)
        rows = [tuple(r) for r in df.collect()]
        assert ("a", None, "x") in rows
        assert (None, "", "y") in rows

    def test_roundtrip(self, spark, tmp_path):
        src = spark.createDataFrame(
            [("a", None), (None, "b"), ("", "c")], "x string, y string"
        )
        out = str(tmp_path / "rt")
        write_staged_tsv(src, out)
        back = read_staged_tsv(spark, out, 2)
        got = sorted([tuple(r) for r in back.collect()], key=str)
        assert got == sorted([("a", None), (None, "b"), ("", "c")], key=str)


class TestCopyCast:
    def test_projection_cast_rename_skip(self, spark, tmp_path):
        p = tmp_path / "c.tsv"
        p.write_text("1\t2.5\ttrue\tskipme\n\\N\t\\N\t\\N\tskipme\n")
        raw = read_staged_tsv(spark, str(p), 4)
        out = copy_cast(
            raw,
            [("id", "BIGINT"), ("v", "DOUBLE PRECISION"), ("ok", "BOOLEAN"),
             ("dead", "CLOB")],
            skip={"dead"},
        )
        assert [f.name for f in out.schema.fields] == ["id", "v", "ok"]
        types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert types == {"id": "bigint", "v": "double", "ok": "boolean"}
        rows = sorted([tuple(r) for r in out.collect()], key=str)
        assert (1, 2.5, True) in rows and (None, None, None) in rows

    def test_type_name_normalization(self):
        # DatabricksOutputConnection.java:251-262
        assert normalize_type_name("CLOB") == "string"
        assert normalize_type_name("DOUBLE PRECISION") == "double"
        assert normalize_type_name("FLOAT(10)") == "float"
        assert normalize_type_name("INT") == "int"


class TestValueTypeMatrix:
    @pytest.mark.parametrize("vt,src,expect", [
        ("byte", "7", 7), ("short", "7", 7), ("int", "7", 7), ("long", "7", 7),
        ("double", "2.5", 2.5), ("float", "2.5", 2.5),
        ("boolean", "true", True),
        ("string", "abc", "abc"), ("nstring", "abc", "abc"),
        ("json", '{"k":1}', '{"k":1}'),
        ("date", "2020-01-02", datetime.date(2020, 1, 2)),
        ("null", "whatever", None),
        ("pass", "asis", "asis"),
    ])
    def test_coercions(self, spark, vt, src, expect):
        df = spark.createDataFrame([(src,)], "c string")
        got = df.select(coerce_value(F.col("c"), vt).alias("o")).collect()[0]["o"]
        assert got == expect

    def test_decimal(self, spark):
        df = spark.createDataFrame([("1.5",)], "c string")
        out = df.select(coerce_value(F.col("c"), "decimal").alias("o"))
        assert out.schema["o"].dataType.simpleString() == "decimal(38,9)"
        assert float(out.collect()[0]["o"]) == 1.5

    def test_time(self, spark):
        df = spark.createDataFrame([("2020-01-02 03:04:05.123456",)], "c string")
        got = df.select(coerce_value(F.col("c"), "time").alias("o")).collect()[0]["o"]
        assert got == "03:04:05.123456"

    def test_unknown_value_type_rejected(self, spark):
        df = spark.createDataFrame([("x",)], "c string")
        with pytest.raises(ValueError):
            df.select(coerce_value(F.col("c"), "blob"))


class TestTimestampFormat:
    def test_ruby_pattern_translation(self):
        assert ruby_to_spark_format("%Y-%m-%d %H:%M:%S.%6N") == "yyyy-MM-dd HH:mm:ss.SSSSSS"
        assert ruby_to_spark_format("%Y/%m/%d") == "yyyy/MM/dd"
        # literal letters must be quoted for java.time
        assert ruby_to_spark_format("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH"

    def test_default_format_render(self, spark):
        df = spark.createDataFrame(
            [(datetime.datetime(2020, 1, 2, 3, 4, 5, 123456),)], "ts timestamp"
        )
        got = df.select(format_timestamp(F.col("ts")).alias("o")).collect()[0]["o"]
        assert got == "2020-01-02 03:04:05.123456"

    def test_tokyo_day_rollover(self, spark):
        """UTC 2020-01-01 23:30 renders as 2020-01-02 in Asia/Tokyo
        (reference TestDatabricksOutputPluginByOutputType.java:79-83)."""
        df = spark.createDataFrame(
            [(datetime.datetime(2020, 1, 1, 23, 30, 0),)], "ts timestamp"
        )
        got = df.select(
            format_timestamp(F.col("ts"), "%Y-%m-%d", "Asia/Tokyo").alias("o")
        ).collect()[0]["o"]
        assert got == "2020-01-02"
