"""Per-file Bloom filters for equality-predicate file skipping.

Min/max bounds (the Iceberg column-bounds analog in laketable.py) prune
RANGE scans, but an equality lookup on a high-cardinality, unclustered
column — "fetch this doc by content hash" — finds every file's [min,max]
spanning the whole value space and prunes nothing. Parquet's own bloom
filters / Iceberg puffin blobs exist for exactly this; the engine's analog
is a small fixed-size bloom per (file, column), harvested at write from
the file's distinct values and stored base64 in the manifest entry.

Safety: a bloom can only produce FALSE POSITIVES (keep a file the value
isn't in), never false negatives, so skipping is always conservative —
same contract as bounds ("absence means cannot-skip"). The write-side
hash and the read-side probe share one normalization, and both run in
plain Python over per-file DISTINCT values (thousands, not rows).

Sizing: default m=8192 bits (1 KiB/file/column), k=6 hashes -> ~1%
false-positive rate at ~850 distinct values; beyond that the filter
degrades toward keep-everything, which is correct, just less selective —
matching how Iceberg treats saturated blooms. The table property
`bloom_bits` overrides m at write time (the probe side derives m from the
stored blob's length, so mixed-size blobs coexist across files): a
TOKEN-element bloom wants m ~ 10x the expected distinct elements per file,
e.g. 2^19 bits = 64 KiB for ~50k distinct tokens.

ARRAY columns are supported element-wise: the write side flattens the
file's arrays and hashes distinct ELEMENTS, and read(eq_filter={col: v})
on an array column means "array contains v" — the token point-lookup path
("which sequences contain token X") that would otherwise scan 100 TB.
"""

from __future__ import annotations

import base64
import hashlib

BLOOM_M = 8192  # bits; power of two
BLOOM_K = 6


def _normalize(v) -> bytes:
    """One canonical byte encoding per logical value, shared by write and
    probe. Integral floats hash like their int (Spark and pyarrow may
    surface a bigint column as either across versions)."""
    if isinstance(v, bool):
        return b"b1" if v else b"b0"
    if isinstance(v, float):
        if v.is_integer():
            return str(int(v)).encode()
        return repr(v).encode()
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, bytes):
        return v
    raise TypeError(f"bloom does not support values of type {type(v).__name__}")


def _positions(v, m: int = BLOOM_M) -> list[int]:
    d = hashlib.md5(_normalize(v)).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd -> full-cycle stride
    return [(h1 + i * h2) % m for i in range(BLOOM_K)]


def build(values, m: int = BLOOM_M) -> str:
    """Base64 bloom over an iterable of non-null distinct values; `m` bits
    (multiple of 8 — the probe recovers it from the blob length)."""
    bits = bytearray(m // 8)
    for v in values:
        for p in _positions(v, m):
            bits[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bits)).decode("ascii")


def might_contain(blob: str, v) -> bool:
    bits = base64.b64decode(blob)
    m = len(bits) * 8  # self-describing size: mixed-size blobs coexist
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _positions(v, m))


def distinct_column_values(parquet_file, column: str):
    """Distinct non-null values of one column of an open
    pyarrow.parquet.ParquetFile — the write-side harvest input. ARRAY
    columns flatten to their distinct ELEMENTS (contains-semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = parquet_file.read(columns=[column]).column(0).combine_chunks()
    while pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        col = col.flatten()
    out = []
    for chunkval in pc.unique(col).to_pylist():
        if chunkval is not None:
            out.append(chunkval)
    return out
