"""Approximate-nearest-neighbor search over embedding columns.

Task-brief surface (no reference counterpart): brute-force cosine top-k as
the correctness baseline, and an LSH-bucketed variant as the scale path.

Scale analysis (the reason both exist):
  * brute force is a broadcast-cross-join — O(Q x N) cosine evaluations.
    Right answer for small query sets; dies when Q ~ N (all-pairs at 10^9
    vectors is off the table).
  * srp_bucketed_topk hashes every vector ONCE into a 2^planes-bucket space
    with sign-random-projections (portable.f_srp_bucket — deterministic
    hyperplanes shared with the DuckDB oracle), then the candidate join is
    an equi-join on bucket id: shuffle-partitionable, AQE-skew-splittable,
    and the pairwise cosine work drops to sum of per-bucket squares
    (~N^2 / 2^planes for uniform buckets). Recall is tunable by `planes`
    (fewer planes -> bigger buckets -> higher recall, more work) — the
    standard LSH knob. Multi-probe / multi-table extensions drop in by
    unioning bucket ids; kept single-table here because the oracle must
    stay expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P


def cosine_topk(emb: DataFrame, n_queries: int, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against all vectors.
    (query_id, neighbor_id, rank, cos); deterministic tie-break by id."""
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    n = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q).crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", P.f_cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_topk(emb: DataFrame, n_queries: int, k: int, n_centroids: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style approximate top-k: every vector is assigned to its nearest
    centroid (deterministic seed centroids: the first n_centroids vectors;
    a k-means refinement would slot in here), then search runs only inside
    the query's cell. The assignment is one broadcast-cross-join against
    n_centroids rows + a rank; the candidate join is an equi-join on cell id
    — the same shuffle-partitionable shape as the LSH variant, with cell
    count (and a multi-probe extension) as the recall/work knob."""
    cent = emb.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    scored = emb.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", P.f_cosine(F.col(vec_col), F.col("cv"))
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    q = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cid"
    )
    n = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cid"
    )
    pairs = (
        q.join(n, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", P.f_cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def srp_multiprobe_topk(emb: DataFrame, n_queries: int, k: int,
                        planes: int = 4, dim: int = 64,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Multi-probe LSH top-k (Lv et al.): each query probes its own SRP
    bucket AND every bucket one plane-flip away (Hamming 1 on the bucket
    id) — planes+1 probes. The standard recall lever that costs probe
    count, not extra hash tables: a near neighbor that landed just across
    ONE hyperplane is recovered. Still an equi-join on bucket id (the
    query side explodes into its probe set; each neighbor has exactly one
    bucket so no candidate duplicates), same shuffle-partitionable shape
    as the single-probe variant."""
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        P.f_srp_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    probes = F.array(*([F.col("bucket")]
                       + [F.col("bucket").bitwiseXOR(F.lit(1 << p))
                          for p in range(planes)]))
    q = (b.filter(F.col(id_col) < n_queries)
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qv"),
                 F.explode(probes).alias("bucket")))
    n = b.select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("nv"), "bucket")
    scored = (
        q.join(n, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", P.f_cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def srp_neardup_pairs(emb: DataFrame, tau: float,
                      planes: int = 4, tables: int = 2, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= tau) with
    LSH candidate generation — the scale replacement for the all-pairs
    theta join (O(n^2) at any scale; the round-1 shape this retires).

    AND-OR amplification, the standard production near-dup scheme: each of
    `tables` independent hash tables buckets every vector by `planes`
    sign-random-projections (disjoint plane families via the offset
    parameter of portable.srp_weights); candidates are pairs sharing ANY
    table's bucket (equi-join on (table, bucket) — shuffle-partitionable,
    AQE-skew-splittable), then the exact cosine confirms. The SEMANTIC is
    the candidate predicate too — the DuckDB oracle evaluates the same
    shared-bucket disjunction, so the gate is exact. Recall against the
    ideal all-pairs output is the documented LSH tradeoff: collision prob
    per pair is 1-(1-p^planes)^tables with p = 1 - theta/pi — raise
    `tables` (more work) or lower `planes` (bigger buckets) to push it up;
    genuine near-dups (cos -> 1) collide with prob -> 1. Work per bucket
    is sum of squares of bucket sizes ~ n^2/2^planes for uniform data;
    `max_bucket` caps a degenerate hot bucket like minhash_lsh_pairs."""
    b = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                P.f_srp_bucket(F.col(vec_col), planes, dim,
                               offset=t * planes).alias("bkt"))
            for t in range(tables)])).alias("x"),
    ).select("__id", "__v", "x.t", "x.bkt")
    if max_bucket is not None:
        w = Window.partitionBy("t", "bkt").orderBy("__id")
        b = (b.withColumn("__rk", F.row_number().over(w))
             .filter(F.col("__rk") <= max_bucket).drop("__rk"))
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.bkt") == F.col("b.bkt"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("vec_a"), F.col("b.__id").alias("vec_b"),
                F.col("a.__v").alias("__va"), F.col("b.__v").alias("__vb"))
        .distinct()
        .withColumn("cos", P.f_cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= tau)
        .select("vec_a", "vec_b", "cos")
    )


def srp_bucketed_topk(emb: DataFrame, n_queries: int, k: int,
                      planes: int = 4, dim: int = 64,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed approximate top-k: candidates are vectors sharing the
    query's sign-random-projection bucket; exact cosine + rank only within
    the bucket. Output shape matches cosine_topk (queries with < k in-bucket
    neighbors return fewer rows — approximate by design)."""
    b = emb.select(
        F.col(id_col),
        F.col(vec_col),
        P.f_srp_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    q = b.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    n = b.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket")
    scored = (
        q.join(n, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", P.f_cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
