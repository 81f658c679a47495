"""Z-order (Morton) clustering key — multi-dimensional layout for
compaction (the OPTIMIZE ... ZORDER BY analog; Delta/Iceberg use the same
space-filling-curve trick).

Lexicographic `cluster_by=[a, b]` builds a range index that prunes on `a`
but leaves `b` spanning the full range in every file. Interleaving the
bits of quantized column values makes every file cover a small HYPERCUBE
of the value space, so per-file min/max bounds (sources/laketable.py
`_footer_stats`) become selective on EVERY clustered dimension at once.

All pure JVM-side expressions (shift/and/or inside whole-stage codegen) —
the key costs one projection, no UDF, no extra shuffle beyond the
bucket-routing repartition the write already does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Bounds = dict[str, tuple[float, float]]


def zorder_key(bounds: Bounds, bits: int = 16) -> Column:
    """Morton key over numeric columns. `bounds` maps column name ->
    (min, max) observed over the rows being rewritten (exact bounds are
    not required for correctness — only for balance — since the key is a
    LAYOUT hint; reads never consult it). Each value is linearly quantized
    to `bits` bits (NULLs sort first as 0, out-of-bounds clamp), then the
    per-column bits are interleaved LSB-first into one non-negative long.

    k * bits must fit a signed long; 16 bits x up to 3 columns is the
    sweet spot (finer quantization than file count buys nothing)."""
    k = len(bounds)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    top = (1 << bits) - 1
    quant = []
    for name, (lo, hi) in bounds.items():
        # an all-NULL column has no observed bounds; it quantizes to 0
        lo = float(lo) if lo is not None else 0.0
        hi = float(hi) if hi is not None else 0.0
        span = (hi - lo) if hi > lo else 1.0
        c = F.col(name).cast("double")
        q = F.floor((c - F.lit(lo)) / F.lit(span) * F.lit(float(top)))
        q = F.when(c.isNull(), F.lit(0)).otherwise(
            F.least(F.greatest(q, F.lit(0)), F.lit(top))).cast("long")
        quant.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quant):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z
