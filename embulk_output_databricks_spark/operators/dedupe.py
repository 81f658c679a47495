"""Deduplication family for training-data pipelines (task brief; no
counterpart in the reference, which only ever deduplicates implicitly via
MERGE keys — DatabricksOutputConnection.java:180-232).

Semantics are pinned by functions/portable.py (the same definitions have
DuckDB SQL twins used as oracles). The implementations here are the
SCALE versions: instead of nested higher-order expressions evaluated
row-at-a-time, shingle/permutation work is exploded into rows so the whole
pipeline is whole-stage-codegen hash aggregates + shuffles — the shape that
survives 100 TB (explode -> partial agg -> shuffle on (doc, perm) fits the
map-side combine pattern; the candidate join is an equi-join on band
digests that AQE can plan as shuffled-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions import portable as P


def exact_dupes(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct content
    with the keeper (min id) and duplicate count."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def minhash_band_digests(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id, band, digest) rows of a k-permutation MinHash/LSH signature.

    Row-exploded plan: ONE md5 per (doc, shingle) row (the universal-hash
    family of functions/portable.py — permutations are int64 maps, not
    digests), k permuted rows per base hash, min-reduced per
    (doc, permutation) with map-side partial aggregation, then band digests
    assembled per (doc, band). Value-identical to the expression form
    P.f_minhash/P.f_lsh_bands (sentinel MINHASH_P for empty docs) — pinned
    by tests against the DuckDB twin.
    """
    rows = k // bands
    a_arr = F.array(*[F.lit(a) for a in P.MINHASH_A[:k]])
    b_arr = F.array(*[F.lit(b) for b in P.MINHASH_B[:k]])
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(P.f_shingles(F.col(text_col), n)).alias("sh"),
    )
    # null shingle (empty doc) -> null base hash -> null perm -> sentinel
    base = sh.select("doc_id", P.f_shingle_hash(F.col("sh")).alias("h"))
    per = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        "h",
    ).select(
        "doc_id",
        "i",
        ((F.element_at(a_arr, F.col("i") + 1) * F.col("h")
          + F.element_at(b_arr, F.col("i") + 1)) % P.MINHASH_P).alias("hp"),
    )
    sig = per.groupBy("doc_id", "i").agg(F.min("hp").alias("mh"))
    by_band = sig.withColumn("b", (F.col("i") / rows).cast("int"))
    assembled = by_band.groupBy("doc_id", "b").agg(
        F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("xs")
    )
    return assembled.select(
        "doc_id",
        "b",
        F.md5(
            F.concat(
                F.col("b").cast("string"),
                F.lit("#"),
                F.concat_ws("|", F.transform(
                    F.col("xs"),
                    lambda x: F.coalesce(x["mh"], F.lit(P.MINHASH_P)).cast("string"))),
            )
        ).alias("digest"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) sharing any LSH band.

    `max_band_bucket` caps the degenerate hot band: N identical docs land
    in ONE (band, digest) bucket and would emit N^2 candidate pairs — at
    corpus scale a single boilerplate page can be millions of rows. With
    the cap, each band bucket keeps only its `max_band_bucket` smallest
    doc ids (deterministic window rank, one extra shuffle on the bucket
    key) before pairing, bounding per-bucket work to cap^2. Capped-out
    docs still dedup transitively through the connected-components step
    as long as the kept representatives chain. None = exact candidates
    (the oracle-checked default)."""
    e = minhash_band_digests(docs, text_col, id_col, k, n, bands)
    if max_band_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("b", "digest").orderBy("doc_id")
        e = (e.withColumn("__rk", F.row_number().over(w))
             .filter(F.col("__rk") <= max_band_bucket).drop("__rk"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Confirmed near-dups: LSH candidates filtered by exact shingle-set
    Jaccard >= threshold (pairwise work only on candidates, never all-pairs)."""
    pairs = minhash_lsh_pairs(docs, text_col, id_col, k, n, bands)
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    j = (
        pairs.join(d.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "ta"), "doc_a")
        .join(d.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "tb"), "doc_b")
        .withColumn("jaccard", P.f_jaccard_shingles(F.col("ta"), F.col("tb"), n))
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def simhash_docs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash per document (expression form; near-dup cluster key).
    `bits` widens the signature (64 = the Manku/production width): at the
    same max_hamming, pigeonhole blocks get bits/(k+1) wide, so block
    buckets shrink by 2^(extra bits per block) — the selectivity knob for
    hamming_band_pairs at corpus scale."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        P.f_simhash(F.col(text_col), bits).alias("simhash"),
    )


def hamming_band_pairs(sigs: DataFrame, max_hamming: int, bits: int = 32,
                       id_col: str = "doc_id",
                       sig_col: str = "simhash") -> DataFrame:
    """EXACT Hamming-distance pair search (id_a < id_b, distance <=
    max_hamming) as an equi-join — the Manku/Google simhash block scheme.

    Pigeonhole: split the `bits`-wide signature into max_hamming+1 bit
    blocks; two signatures within Hamming distance max_hamming disagree
    in at most max_hamming blocks, so they agree EXACTLY on at least one
    block. Candidates are therefore pairs sharing (block_idx,
    block_value) for any block — a plain equi-join the planner shuffles
    on the block key (AQE-skew-splittable) — then the exact popcount
    filter keeps true pairs and `distinct` collapses multi-block hits.
    Identical output to the O(n^2) theta join, never materializing it.

    Scale knobs: selectivity per block is 2^(bits/(max_hamming+1))
    buckets — wider signatures (64/128-bit) buy exponentially thinner
    buckets at the same max_hamming, which is how production simhash
    (64-bit, k=3 -> 4 blocks of 16 bits) keeps block buckets tiny."""
    blocks = max_hamming + 1
    if blocks > bits:
        raise ValueError(f"max_hamming {max_hamming} needs {blocks} blocks "
                         f"but the signature has only {bits} bits")
    bounds = [round(i * bits / blocks) for i in range(blocks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(blocks)]
    sig = F.col(sig_col).cast("bigint")
    e = sigs.select(
        F.col(id_col).alias("__id"),
        sig.alias("__sig"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(sig, lo)
                .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
            for i, (lo, w) in enumerate(spans)])).alias("x"),
    ).select("__id", "__sig", "x.blk", "x.bv")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("doc_a"),
                F.col("b.__id").alias("doc_b"),
                F.bit_count(F.col("a.__sig").bitwiseXOR(F.col("b.__sig")))
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  bits: int = 32) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance — exact output via the
    pigeonhole block banding above (no all-pairs join at any scale)."""
    return hamming_band_pairs(
        simhash_docs(docs, text_col, id_col, bits=bits),
        max_hamming=max_hamming, bits=bits, id_col="doc_id",
        sig_col="simhash")


def neardup_components(
    pairs: DataFrame,
    vertices: DataFrame,
    max_rounds: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (doc_id,
    cluster_id) where cluster_id is the min doc_id of the component.
    Singletons (vertices with no pair) are their own cluster.

    pairs: (doc_a, doc_b) rows, doc_a < doc_b. vertices: one `doc_id` col.

    Algorithm: distributed min-label propagation with pointer jumping.
    Each round does (1) neighbor-min — every vertex adopts the smallest
    label among itself and its neighbors (one shuffle on vertex id), and
    (2) pointer jump — label := label(label), which doubles the hop
    distance covered per round, so chains of length L converge in
    O(log L) rounds rather than O(L) (the hash-to-min bound; the
    large-star/small-star refinement tightens constants but has the same
    plan shape). Lineage is cut with localCheckpoint per round to keep
    the plan O(1) deep no matter how many rounds run.

    The reference has no graph story at all; this is the keeper-selection
    step a dedup pipeline needs once near-dup PAIRS exist (pairs alone
    don't tell you which rows to drop when A~B and B~C but A!~C).
    """
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    lab = vertices.select(
        F.col("doc_id").cast("bigint").alias("v"),
        F.col("doc_id").cast("bigint").alias("comp"),
    ).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nbr = (
            sym.join(lab, sym["src"] == lab["v"])
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = (
            lab.join(nbr, lab["v"] == nbr["v2"], "left")
            .select("v", F.col("comp").alias("old_comp"),
                    F.least("comp", F.coalesce("nbr_min", "comp")).alias("comp"))
        )
        # pointer jump: comp := comp(comp)
        parent = stepped.select(
            F.col("v").alias("pv"), F.col("comp").alias("pcomp"))
        # convergence check rides the SAME job as the round's materialize
        # (Observation over the jumped rows, counted while localCheckpoint
        # writes them) — one Spark job per round, not a second join+count
        # pass over the labels
        obs = Observation()
        jd = (
            stepped.join(parent, stepped["comp"] == parent["pv"], "left")
            .select("v", "old_comp",
                    F.least("comp", F.coalesce("pcomp", "comp")).alias("comp"))
            .observe(obs, F.sum(
                (F.col("comp") != F.col("old_comp")).cast("long")).alias("changed"))
            .select("v", "comp")
        )
        from ..plans.audit_tap import tap
        tap("neardup_components.round", jd)  # the per-round join+agg plan
        jumped = jd.localCheckpoint(eager=True)
        lab = jumped
        if int(obs.get["changed"] or 0) == 0:
            break
    else:
        raise RuntimeError(f"components did not converge in {max_rounds} rounds")
    return lab.select(F.col("v").alias("doc_id"), F.col("comp").alias("cluster_id"))
