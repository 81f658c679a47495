"""Scale-shaped pair generation: pigeonhole Hamming banding (SimHash),
AND-OR SRP LSH candidates (embedding near-dup), and the minhash hot-band
cap. These replace the round-1 cartesian/theta joins (VERDICT items 2-4):
every candidate join here must be an EQUI-join.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.functions import portable as P
from embulk_output_databricks_spark.operators.dedupe import (
    hamming_band_pairs,
    minhash_lsh_pairs,
    simhash_docs,
    simhash_pairs,
)
from embulk_output_databricks_spark.operators.similarity import (
    srp_neardup_pairs,
)
from tests.conftest import SF001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet").cache()


def _pairs(df):
    return sorted((r[0], r[1]) for r in df.collect())


class TestHammingBanding:
    def test_matches_bruteforce(self, docs):
        """Pigeonhole banding is EXACT: identical output to the all-pairs
        theta join, for several max_hamming values."""
        s = simhash_docs(docs)
        a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
        b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
        for mh in (1, 3, 6):
            brute = (
                a.join(b, F.col("doc_a") < F.col("doc_b"))
                .withColumn("hamming",
                            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
                .filter(F.col("hamming") <= mh)
                .select("doc_a", "doc_b", "hamming")
            )
            banded = hamming_band_pairs(s, max_hamming=mh, bits=32,
                                        sig_col="simhash")
            assert _pairs(banded) == _pairs(brute), f"max_hamming={mh}"

    def test_hamming_values_correct(self, docs):
        out = hamming_band_pairs(simhash_docs(docs), max_hamming=6,
                                 sig_col="simhash")
        sig = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()}
        for r in out.collect():
            expect = bin(sig[r["doc_a"]] ^ sig[r["doc_b"]]).count("1")
            assert r["hamming"] == expect <= 6

    def test_simhash_pairs_plan_has_no_cartesian(self, docs):
        plan = simhash_pairs(docs, max_hamming=6) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_zero_hamming_only_exact_dupes(self, spark):
        d = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
             (3, "something else entirely")],
            "doc_id long, text string")
        out = simhash_pairs(d, max_hamming=0)
        assert _pairs(out) == [(1, 2)]


class TestSrpNeardup:
    def test_matches_exact_predicate(self, emb):
        """The LSH-candidate + cosine-confirm output equals the brute-force
        evaluation of the SAME predicate (shared-bucket OR across tables,
        cos >= tau) — the candidate generation loses nothing it claims."""
        planes, tables, tau = 4, 2, 0.4
        cols = [P.f_srp_bucket(F.col("embedding"), planes, 64,
                               offset=t * planes).alias(f"b{t}")
                for t in range(tables)]
        z = emb.select("vec_id", "embedding", *cols)
        a = z.select(F.col("vec_id").alias("vec_a"),
                     F.col("embedding").alias("va"),
                     *[F.col(f"b{t}").alias(f"ab{t}") for t in range(tables)])
        b = z.select(F.col("vec_id").alias("vec_b"),
                     F.col("embedding").alias("vb"),
                     *[F.col(f"b{t}").alias(f"bb{t}") for t in range(tables)])
        shared = F.lit(False)
        for t in range(tables):
            shared = shared | (F.col(f"ab{t}") == F.col(f"bb{t}"))
        brute = (
            a.join(b, F.col("vec_a") < F.col("vec_b"))
            .filter(shared)
            .withColumn("cos", P.f_cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= tau)
            .select("vec_a", "vec_b")
        )
        fast = srp_neardup_pairs(emb, tau=tau, planes=planes, tables=tables)
        assert _pairs(fast.select("vec_a", "vec_b")) == _pairs(brute)

    def test_plan_is_equi_join(self, emb):
        plan = srp_neardup_pairs(emb, tau=0.4) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_planted_neardup_found(self, spark, emb):
        """A vector and its tiny perturbation share every SRP bucket with
        near-certainty and have cos ~ 1: the pair must surface."""
        base = emb.limit(1).select("embedding").first()["embedding"]
        pert = [v * 1.001 for v in base]  # scaling preserves every SRP sign
        d = spark.createDataFrame(
            [(1, base), (2, pert)], "vec_id long, embedding array<float>")
        out = srp_neardup_pairs(d, tau=0.9)
        assert _pairs(out.select("vec_a", "vec_b")) == [(1, 2)]


class TestMinhashBandCap:
    def test_cap_bounds_hot_band(self, spark):
        """N identical docs put N rows in one band bucket -> N(N-1)/2
        candidate pairs; the cap keeps the smallest `cap` doc_ids per
        bucket, bounding the blowup to cap*(cap-1)/2."""
        n, cap = 20, 4
        d = spark.createDataFrame(
            [(i, "the exact same document text repeated") for i in range(n)],
            "doc_id long, text string")
        uncapped = minhash_lsh_pairs(d)
        assert uncapped.count() == n * (n - 1) // 2
        capped = minhash_lsh_pairs(d, max_band_bucket=cap)
        assert capped.count() == cap * (cap - 1) // 2
        # deterministic survivor rule: the smallest ids
        assert _pairs(capped) == [(i, j) for i in range(cap)
                                  for j in range(i + 1, cap)]

    def test_cap_off_by_default_and_no_loss_on_cold_bands(self, docs):
        """With bucket sizes below the cap, capped == uncapped."""
        d = docs.limit(40)
        assert _pairs(minhash_lsh_pairs(d, max_band_bucket=1000)) == \
            _pairs(minhash_lsh_pairs(d))


class TestSimhash64:
    def test_64bit_matches_bruteforce(self, docs):
        """The 64-bit signature rides the bigint sign bit; banding must
        still return exactly the brute-force pair set."""
        from embulk_output_databricks_spark.operators.dedupe import (
            simhash_docs as sd,
        )
        s = sd(docs, bits=64)
        a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
        b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
        brute = (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming",
                        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= 6)
            .select("doc_a", "doc_b", "hamming")
        )
        banded = hamming_band_pairs(s, max_hamming=6, bits=64,
                                    sig_col="simhash")
        assert _pairs(banded) == _pairs(brute)

    def test_wider_hash_is_more_selective(self, docs):
        n32 = simhash_pairs(docs, max_hamming=6, bits=32).count()
        n64 = simhash_pairs(docs, max_hamming=6, bits=64).count()
        assert n64 < n32  # 64 bits separate non-dups at the same radius

    def test_sign_bit_values(self):
        from embulk_output_databricks_spark.functions.portable import (
            _bit_value,
        )
        assert _bit_value(62) == 1 << 62
        assert _bit_value(63) == -(1 << 63)  # two's-complement top bit


class TestMultiprobe:
    def test_multiprobe_recall_dominates(self, emb):
        """Multi-probe candidates are a strict superset of single-probe:
        measured recall must not decrease, and both are bounded by the
        exact pair count."""
        from embulk_output_databricks_spark.operators.similarity import (
            cosine_topk,
            srp_bucketed_topk,
            srp_multiprobe_topk,
        )
        brute = cosine_topk(emb, 16, 5).select("query_id", "neighbor_id")
        def hits(df):
            return brute.join(df.select("query_id", "neighbor_id"),
                              ["query_id", "neighbor_id"]).count()
        possible = brute.count()
        h_lsh = hits(srp_bucketed_topk(emb, 16, 5, planes=4))
        h_mp = hits(srp_multiprobe_topk(emb, 16, 5, planes=4))
        assert h_lsh <= h_mp <= possible
