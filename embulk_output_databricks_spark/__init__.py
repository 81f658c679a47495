"""embulk_output_databricks_spark — a from-scratch PySpark-native CDC /
incremental-ingest engine with the query and load-mode capabilities of
trocco-io/embulk-output-databricks, re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is an Embulk output plugin
whose relational work is SQL text shipped to Databricks: staged bulk loads
committed via insert / truncate_insert / replace / merge
(reference: src/main/java/org/embulk/output/databricks/DatabricksOutputConnection.java:137-248).
This package implements those load modes natively on Spark over its own
snapshot-based lake table format (no Iceberg/Delta jar dependency), plus the
CDC replay loop (binlog tail -> LWW dedup -> fenced exactly-once MERGE) the
north rule requires, plus the large-scale training-data operators
(dedup family, similarity search, text analysis, multimodal plumbing).

Layout:
  config.py      typed job config + validation  (ref DatabricksOutputPlugin.java:24-122)
  session.py     SparkSession builder (AQE, Arrow, UTC)
  schema.py      StructTypes: sequences / binlog events / checkpoint / lineage
  synth.py       deterministic seeded binlog generator (spark.range-based)
  sources/       lake table storage format (snapshot manifests, atomic commit)
  plans/         apply-mode planning: append/truncate/replace/merge, schema evolution
  operators/     LWW dedup, dedup family (minhash/simhash/...), ANN, text analysis
  functions/     portable column-expression library (hashes shared with DuckDB oracles)
  streaming/     checkpointed micro-batch replay driver, fence, lineage
"""

__version__ = "0.1.0"
