"""Cross-engine parity: every portable op must produce identical values in
Spark and DuckDB on the real documents/embeddings tables — this is the same
comparison the driver's correctness gate performs, pinned per primitive.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import embulk_output_databricks_spark.functions.portable as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return con


def compare(spark_df, duck, sql):
    got = [tuple(r) for r in spark_df.collect()]
    exp = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == exp, f"first diff: {next(((g, e) for g, e in zip(got, exp) if g != e), None)}"


@pytest.mark.parametrize(
    "fcol,sqlexpr",
    [
        (lambda c: P.f_token_count(c), P.sql_token_count("text")),
        (lambda c: P.f_fingerprint(c), P.sql_fingerprint("text")),
        (lambda c: P.f_quality(c), P.sql_quality("text")),
        (lambda c: P.f_langid(c), P.sql_langid("text")),
        (lambda c: P.f_simhash32(c), P.sql_simhash32("text")),
        (lambda c: F.concat_ws("", P.f_words(c)), f"array_to_string({P.sql_words('text')}, chr(1))"),
        (lambda c: F.concat_ws("", P.f_shingles(c, 3)), f"array_to_string({P.sql_shingles('text', 3)}, chr(1))"),
        (lambda c: F.concat_ws("", P.f_minhash(c, 8, 3)), f"array_to_string({P.sql_minhash('text', 8, 3)}, chr(1))"),
        (
            lambda c: F.concat_ws("", P.f_lsh_bands(P.f_minhash(c, 8, 3), 4, 2)),
            f"array_to_string({P.sql_lsh_bands(P.sql_minhash('text', 8, 3), 4, 2)}, chr(1))",
        ),
    ],
    ids=["token_count", "fingerprint", "quality", "langid", "simhash32",
         "words", "shingles", "minhash", "lsh_bands"],
)
def test_text_ops_parity(docs, duck, fcol, sqlexpr):
    sdf = docs.select("doc_id", fcol(F.col("text")).alias("v")).orderBy("doc_id")
    compare(sdf, duck, f"SELECT doc_id, {sqlexpr} AS v FROM documents ORDER BY doc_id")


def test_jaccard_parity(spark, docs, duck):
    sdf = (
        docs.alias("a").crossJoin(docs.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.col("a.doc_id") < 5)
        .select(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"),
            P.f_jaccard_words(F.col("a.text"), F.col("b.text")).alias("jw"),
            P.f_jaccard_shingles(F.col("a.text"), F.col("b.text"), 3).alias("js"),
        )
        .orderBy("i", "j")
    )
    compare(
        sdf, duck,
        f"""SELECT a.doc_id AS i, b.doc_id AS j,
               {P.sql_jaccard_words('a.text', 'b.text')} AS jw,
               {P.sql_jaccard_shingles('a.text', 'b.text', 3)} AS js
            FROM documents a, documents b
            WHERE a.doc_id < b.doc_id AND a.doc_id < 5
            ORDER BY i, j""",
    )


def test_vector_ops_parity(spark, duck):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sdf = (
        emb.alias("a").crossJoin(emb.alias("b"))
        .filter((F.col("a.vec_id") < F.col("b.vec_id")) & (F.col("a.vec_id") < 3))
        .select(
            F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"),
            P.f_dot(F.col("a.embedding"), F.col("b.embedding")).alias("dot"),
            P.f_cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .orderBy("i", "j")
    )
    compare(
        sdf, duck,
        f"""SELECT a.vec_id AS i, b.vec_id AS j,
               {P.sql_dot('a.embedding', 'b.embedding')} AS dot,
               {P.sql_cosine('a.embedding', 'b.embedding')} AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id AND a.vec_id < 3
            ORDER BY i, j""",
    )
