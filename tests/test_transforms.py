"""Token-array transforms: JVM expression vs Arrow/pandas kernel parity,
chunking semantics, greedy packing invariants (SURVEY.md §2.C UDF surface;
north_star: vectorized token transforms, token-array equality)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.functions import portable as P
from embulk_output_databricks_spark.transforms import (
    MOD,
    MULT,
    chunk_tokens,
    chunk_tokens_arrow,
    pack_sequences,
    tokens_fingerprint_arrow,
)
from tests.conftest import SF001


@pytest.fixture(scope="module")
def doc_tokens(spark):
    d = spark.read.parquet(f"{SF001}/documents.parquet")
    return d.select("doc_id", P.f_word_ids(F.col("text")).alias("tokens")).cache()


def _py_fingerprint(tokens):
    h = 0
    for t in tokens:
        h = (h * MULT + int(t)) % MOD
    return h


class TestFingerprint:
    def test_arrow_matches_jvm(self, doc_tokens):
        both = doc_tokens.select(
            "doc_id",
            P.f_tokens_fingerprint(F.col("tokens")).alias("jvm"),
            tokens_fingerprint_arrow(F.col("tokens")).alias("arrow"),
        )
        bad = both.filter(F.col("jvm") != F.col("arrow")).count()
        assert bad == 0 and both.count() > 0

    def test_matches_python_reference(self, spark):
        rows = [(1, [1, 2, 3]), (2, []), (3, None), (4, list(range(500)))]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        got = {r["doc_id"]: r["fp"] for r in
               df.select("doc_id", tokens_fingerprint_arrow("tokens").alias("fp")).collect()}
        assert got[1] == _py_fingerprint([1, 2, 3])
        assert got[2] == 0 and got[3] == 0
        assert got[4] == _py_fingerprint(range(500))


class TestChunking:
    def test_jvm_semantics(self, spark):
        df = spark.createDataFrame(
            [(1, list(range(70))), (2, list(range(32))), (3, []), (4, None)],
            "doc_id long, tokens array<int>",
        )
        out = chunk_tokens(df, 32).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert sorted(by_doc) == [1, 2]  # empty/null rows vanish
        c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
        assert [r["n_tok"] for r in c1] == [32, 32, 6]
        assert c1[0]["tokens"] == list(range(32))
        assert c1[2]["tokens"] == list(range(64, 70))
        assert by_doc[2][0]["n_tok"] == 32 and by_doc[2][0]["chunk_id"] == 0

    def test_arrow_matches_jvm(self, doc_tokens):
        a = chunk_tokens(doc_tokens, 32)
        b = chunk_tokens_arrow(doc_tokens, 32)
        assert a.count() == b.count() > 0
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestPacking:
    def test_invariants(self, doc_tokens):
        seq_len = 128
        packed = pack_sequences(doc_tokens, seq_len=seq_len, n_groups=8)
        rows = packed.collect()
        assert rows
        # capacity respected; n_tok consistent with payload
        for r in rows:
            assert r["n_tok"] <= seq_len
            assert len(r["tokens"]) == r["n_tok"]
        # token conservation: every input token lands in exactly one sequence
        # (inputs shorter than seq_len are never truncated here)
        in_total = doc_tokens.select(
            F.sum(F.least(F.size("tokens"), F.lit(seq_len)))
        ).collect()[0][0]
        assert sum(r["n_tok"] for r in rows) == in_total
        # n_docs accounting
        n_in = doc_tokens.filter(F.size("tokens") > 0).count()
        assert sum(r["n_docs"] for r in rows) == n_in

    def test_deterministic_across_parallelism(self, doc_tokens):
        one = pack_sequences(doc_tokens.repartition(1), 128, n_groups=8)
        many = pack_sequences(doc_tokens.repartition(7), 128, n_groups=8)
        assert one.exceptAll(many).count() == 0
        assert many.exceptAll(one).count() == 0


class TestWordIds:
    def test_range_and_determinism(self, doc_tokens):
        stats = doc_tokens.select(
            F.min(F.array_min("tokens")).alias("lo"),
            F.max(F.array_max("tokens")).alias("hi"),
        ).collect()[0]
        assert stats["lo"] >= 0 and stats["hi"] < P.VOCAB
