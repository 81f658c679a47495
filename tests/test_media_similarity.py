"""Multimodal binary-column plumbing + ANN similarity operators."""

import hashlib

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators.media import (
    decode_media,
    decode_media_real,
    frame_sample,
    media_from_docs,
    resize_media,
)
from embulk_output_databricks_spark.operators.similarity import (
    cosine_topk,
    srp_bucketed_topk,
)
from tests.conftest import SF001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet").cache()


class TestMedia:
    def test_payload_roundtrip(self, docs):
        m = media_from_docs(docs)
        row = m.orderBy("media_id").first()
        txt = docs.orderBy("doc_id").first()["text"]
        assert bytes(row["payload"]).decode("utf-8") == txt
        assert row["kind"] in ("image", "audio", "video")

    def test_decode_stub_matches_reference_hash(self, docs):
        m = media_from_docs(docs.limit(5))
        out = {r["media_id"]: r for r in decode_media(m).collect()}
        for r in docs.limit(5).collect():
            h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
            d = out[r["doc_id"]]
            assert d["width"] == 16 + int(h[0:4], 16) % 2032
            assert d["height"] == 16 + int(h[4:8], 16) % 2032
            assert d["n_frames"] == 1 + int(h[8:10], 16) % 64
            assert d["n_bytes"] == len(r["text"].encode("utf-8"))

    def test_null_payload_yields_null_props(self, spark):
        m = spark.createDataFrame(
            [(1, "image", None, None)],
            "media_id long, kind string, payload binary, meta map<string,string>",
        )
        r = decode_media(m).first()
        assert r["width"] is None and r["n_frames"] is None

    def test_frame_sample(self, docs):
        d = decode_media(media_from_docs(docs))
        fs = frame_sample(d, every=10)
        joined = fs.join(d, "media_id").select("frame_idx", "n_frames", "kind")
        assert joined.filter(F.col("kind") != "video").count() == 0
        assert joined.filter(F.col("frame_idx") >= F.col("n_frames")).count() == 0
        assert joined.filter(F.col("frame_idx") % 10 != 0).count() == 0

    def test_resize_dims_and_digest(self, docs):
        m = media_from_docs(docs)
        out = resize_media(m, max_dim=64).collect()
        assert out, "sf0.001 must contain image rows"
        decoded = {r["media_id"]: r for r in decode_media(m).collect()}
        payloads = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}
        for r in out:
            assert r["kind"] == "image"
            d = decoded[r["media_id"]]
            assert (r["width"], r["height"]) == (d["width"], d["height"])
            assert 1 <= r["out_w"] <= 64 and 1 <= r["out_h"] <= 64
            if max(r["width"], r["height"]) <= 64:  # never upscales
                assert (r["out_w"], r["out_h"]) == (r["width"], r["height"])
            else:  # integer fit-within-box, long edge pinned to max_dim
                assert max(r["out_w"], r["out_h"]) == 64
            want = hashlib.md5(
                payloads[r["media_id"]] + f":{r['out_w']}x{r['out_h']}".encode()
            ).hexdigest()
            assert r["resized_md5"] == want

    def test_resize_skips_null_payload_and_non_images(self, spark):
        m = spark.createDataFrame(
            [(1, "image", None, None), (2, "audio", b"zz", None)],
            "media_id long, kind string, payload binary, meta map<string,string>",
        )
        assert resize_media(m).count() == 0

    def test_real_decode_null_dims_for_opaque_payloads(self, docs):
        """decode_media_real now really decodes (PNG/GIF/WAV headers,
        stdlib-only; Pillow fallback when present — tests/test_media_real.py
        exercises valid payloads). The synthetic text payloads here are no
        known container format, so every row decodes to NULL dimensions —
        the quarantine-not-crash semantics — while n_bytes stays real."""
        out = decode_media_real(media_from_docs(docs)).collect()
        assert out and all(r["width"] is None and r["n_frames"] is None
                           and r["n_bytes"] is not None for r in out)


class TestANN:
    def test_bruteforce_shape(self, emb):
        out = cosine_topk(emb, n_queries=4, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert sorted(by_q) == [0, 1, 2, 3]
        for q, rows in by_q.items():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == [1, 2, 3]
            # descending cosine, no self-match
            assert all(rows[i]["cos"] >= rows[i + 1]["cos"] for i in range(len(rows) - 1))
            assert all(r["neighbor_id"] != q for r in rows)

    def test_lsh_is_subset_of_bucket_and_agrees_on_hits(self, emb):
        """Every LSH hit must be an exact cosine agreeing with brute force
        for the same (query, neighbor) pair."""
        bf = {(r["query_id"], r["neighbor_id"]): r["cos"]
              for r in cosine_topk(emb, 8, 50).collect()}
        lsh = srp_bucketed_topk(emb, 8, 5, planes=2).collect()
        assert lsh
        for r in lsh:
            key = (r["query_id"], r["neighbor_id"])
            if key in bf:
                assert abs(bf[key] - r["cos"]) < 1e-12

    def test_lsh_recall_reasonable(self, emb):
        """With few planes the top-1 neighbor should usually share the
        query's bucket (statistical, but deterministic for this data)."""
        bf = {r["query_id"]: r["neighbor_id"]
              for r in cosine_topk(emb, 16, 1).collect()}
        lsh = srp_bucketed_topk(emb, 16, 5, planes=2)
        hits = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
        recall = sum((q, n) in hits for q, n in bf.items()) / len(bf)
        assert recall >= 0.5


class TestIVF:
    def test_ivf_agrees_with_bruteforce_on_hits(self, emb):
        from embulk_output_databricks_spark.operators.similarity import ivf_topk

        bf = {(r["query_id"], r["neighbor_id"]): r["cos"]
              for r in cosine_topk(emb, 8, 50).collect()}
        out = ivf_topk(emb, n_queries=8, k=5, n_centroids=4).collect()
        assert out
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
            if (r["query_id"], r["neighbor_id"]) in bf:
                assert abs(bf[(r["query_id"], r["neighbor_id"])] - r["cos"]) < 1e-12
        for q, rows in by_q.items():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))


class TestEmbed:
    def test_embed_matches_reference_hash_and_feeds_ann(self, spark, docs):
        from embulk_output_databricks_spark.operators.media import (
            embed_media, media_from_docs)

        m = media_from_docs(docs.limit(8))
        out = {r["media_id"]: r["emb"] for r in embed_media(m).collect()}
        for r in docs.limit(8).collect():
            h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
            assert out[r["doc_id"]] == [
                int(h[2 * i:2 * i + 2], 16) for i in range(8)]
        # NULL payload -> NULL vector (encoder-failure semantics)
        nm = spark.createDataFrame(
            [(1, "image", None, None)],
            "media_id long, kind string, payload binary, meta map<string,string>",
        )
        assert embed_media(nm).first()["emb"] is None
        # the signature vector rides the similarity operators unchanged
        from embulk_output_databricks_spark.operators.similarity import (
            cosine_topk)

        vecs = embed_media(media_from_docs(docs.limit(64))).select(
            F.col("media_id").alias("vec_id"),
            F.col("emb").cast("array<float>").alias("embedding"))
        top = cosine_topk(vecs, n_queries=2, k=3)
        assert top.count() == 2 * 3
