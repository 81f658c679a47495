"""Vectorized token-array transforms (SURVEY.md §2.C UDF surface).

The reference has no UDF surface at all — its only extension point is
merge_rule SQL strings (reference DatabricksOutputConnection.java:207-213).
The north rule makes token arrays the payload and mandates that every
transform over them runs vectorized (pandas/Arrow batches, "no per-row
Python" in the hot path — BASELINE.json input_hint). This module provides
the engine's token kernels in two interchangeable forms:

  JVM expression form    whole-stage-codegen higher-order functions —
                         the default 100 TB path (zero Python in the plan).
  Arrow/pandas form      @pandas_udf / mapInPandas / applyInPandas kernels
                         operating on numpy buffers per Arrow batch — used
                         where the semantics are genuinely stateful
                         (sequence packing) and as a tested equivalence
                         witness that the Arrow round-trip of array<int>
                         is lossless (tests/test_transforms.py).

Kernels:
  tokens_fingerprint_arrow  batch-vectorized polynomial hash of token arrays
                            (== portable.f_tokens_fingerprint bit-for-bit)
  chunk_tokens              re-chunk sequences to max_len (JVM posexplode)
  chunk_tokens_arrow        same semantics via mapInPandas (Arrow batches)
  pack_sequences            greedy fixed-capacity packing of docs into
                            training sequences via applyInPandas (grouped
                            by hash bucket — distributed, deterministic)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MOD = 1_000_000_007
MULT = 131


def _poly_hash_batch(tokens: pd.Series) -> np.ndarray:
    """Batch polynomial hash: h = fold (h*131 + tok) mod 1e9+7 per row,
    computed with flat numpy buffers (no per-row Python arithmetic):
    h = sum(tok[j] * 131^(L-1-j)) mod M via one reduceat over the
    concatenated batch. Safe for rows up to ~1e5 tokens (int64 headroom:
    term < 5e13, sum < 5e18)."""
    n = len(tokens)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    arrs = [np.asarray(t, dtype=np.int64) if t is not None else np.empty(0, np.int64)
            for t in tokens]
    lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
    nonempty = np.flatnonzero(lens > 0)
    if nonempty.size == 0:
        return out
    flat = np.concatenate([arrs[i] for i in nonempty])
    ne_lens = lens[nonempty]
    starts = np.zeros(ne_lens.size, dtype=np.int64)
    np.cumsum(ne_lens[:-1], out=starts[1:])
    maxlen = int(ne_lens.max())
    pows = np.ones(maxlen, dtype=np.int64)
    for i in range(1, maxlen):
        pows[i] = (pows[i - 1] * MULT) % MOD
    within = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, ne_lens)
    exp = np.repeat(ne_lens - 1, ne_lens) - within
    terms = (flat % MOD) * pows[exp] % MOD
    out[nonempty] = np.add.reduceat(terms, starts) % MOD
    return out


@pandas_udf(T.LongType())
def tokens_fingerprint_arrow(tokens: pd.Series) -> pd.Series:
    """Arrow-vectorized twin of portable.f_tokens_fingerprint /
    sql_tokens_fingerprint — pinned equal in tests/test_transforms.py."""
    return pd.Series(_poly_hash_batch(tokens))


# ---------------------------------------------------------------- chunking

def chunk_tokens(df: DataFrame, max_len: int, id_col: str = "doc_id",
                 tokens_col: str = "tokens") -> DataFrame:
    """Re-chunk each row's token array into consecutive chunks of at most
    max_len: (id, chunk_id, tokens, n_tok) rows. Pure JVM higher-order
    expressions (slice + posexplode) — the scale path. Empty/null token
    arrays produce no rows."""
    toks = F.col(tokens_col)
    n = F.size(toks)
    nchunks = F.ceil(n / F.lit(float(max_len))).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), nchunks - F.lit(1)),
            lambda i: F.slice(toks, i * max_len + 1, max_len),
        ),
    ).otherwise(F.array().cast("array<array<int>>"))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "tokens"))
        .withColumn("n_tok", F.size("tokens"))
    )


def chunk_tokens_arrow(df: DataFrame, max_len: int, id_col: str = "doc_id",
                       tokens_col: str = "tokens") -> DataFrame:
    """mapInPandas twin of chunk_tokens (same output, Arrow batch path).
    Kept as the template for transforms that genuinely need Python
    (e.g. a real BPE re-tokenizer); numpy-splits each batch."""
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("chunk_id", T.IntegerType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cids, chunks = [], [], []
            for rid, t in zip(pdf[id_col].to_numpy(), pdf[tokens_col]):
                if t is None or len(t) == 0:
                    continue
                a = np.asarray(t, dtype=np.int32)
                parts = np.split(a, range(max_len, a.size, max_len))
                ids.extend([rid] * len(parts))
                cids.extend(range(len(parts)))
                chunks.extend(parts)
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "chunk_id": pd.Series(cids, dtype="int32"),
                "tokens": chunks,
                "n_tok": pd.Series([c.size for c in chunks], dtype="int32"),
            })

    return df.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------- packing

def pack_sequences(df: DataFrame, seq_len: int, n_groups: int = 64,
                   id_col: str = "doc_id", tokens_col: str = "tokens",
                   group_expr: "F.Column | None" = None) -> DataFrame:
    """Greedy packing of documents into fixed-capacity training sequences —
    the canonical pre-training batch prep step. Stateful-per-group, so it
    runs as applyInPandas over hash-bucketed groups: deterministic (docs
    sorted by id within a group), distributed (n_groups independent tasks;
    scale n_groups with the cluster), and Arrow-batched end-to-end.

    Rules: docs are taken in id order; a doc longer than seq_len is
    truncated; a doc that would overflow the current sequence starts a new
    one (no doc splitting across sequences).

    Output: (group_id, seq_id, tokens, n_tok, n_docs) — seq_id unique
    within a group; global id = group_id * 2^40 + seq_id if needed.
    """
    out_schema = T.StructType([
        T.StructField("group_id", T.IntegerType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("n_docs", T.IntegerType()),
    ])

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        arrs = [np.asarray(t, dtype=np.int32)[:seq_len]
                for t in pdf[tokens_col] if t is not None and len(t) > 0]
        seqs: list[np.ndarray] = []
        ndocs: list[int] = []
        cur: list[np.ndarray] = []
        cur_len = 0
        for a in arrs:  # integer bookkeeping only; payload moves via numpy
            if cur and cur_len + a.size > seq_len:
                seqs.append(np.concatenate(cur))
                ndocs.append(len(cur))
                cur, cur_len = [], 0
            cur.append(a)
            cur_len += a.size
        if cur:
            seqs.append(np.concatenate(cur))
            ndocs.append(len(cur))
        return pd.DataFrame({
            "group_id": pd.Series([key[0]] * len(seqs), dtype="int32"),
            "seq_id": pd.Series(range(len(seqs)), dtype="int64"),
            "tokens": seqs,
            "n_tok": pd.Series([s.size for s in seqs], dtype="int32"),
            "n_docs": pd.Series(ndocs, dtype="int32"),
        })

    # group assignment: xxhash64 by default; callers needing an
    # engine-portable grouping (oracle checks) pass their own expression
    grp = group_expr if group_expr is not None else \
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
    g = df.select(
        grp.cast("int").alias("__g"),
        F.col(id_col),
        F.col(tokens_col),
    )
    return g.groupBy("__g").applyInPandas(pack, out_schema)
