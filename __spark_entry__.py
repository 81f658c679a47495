"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full checkpointed CDC replay (binlog tail ->
                LWW dedup -> fenced copy-on-write MERGE) at sf0.001,
                returning the final table state.
queries()     — one entry per operator from SURVEY.md §2 (CDC load modes,
                fence/evolution, dedup family, ANN, text analysis,
                relational/streaming-analog parity).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (same column names);
                built next to each Spark plan in
                embulk_output_databricks_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from embulk_output_databricks_spark.queries import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from embulk_output_databricks_spark.queries import q_cdc_fence_idempotent

    return q_cdc_fence_idempotent(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
