"""K-minimum-values (KMV) distinct-count sketches, per data file.

Iceberg records column NDV in Puffin files (Apache DataSketches Theta
sketches) so engine CBOs can answer "how many distinct values" without a
table scan; Delta keeps the same stat from ANALYZE. The reference has no
statistics story at all (write-only sink, DatabricksOutputPlugin.java:
166-186), but at 100 TB a `COUNT(DISTINCT col)` — the input to join
planning, dictionary-encoding decisions, skew diagnostics — must not
cost a corpus scan. This module is the Puffin analog on this engine's
manifest: each data file carries a small sketch of one column's distinct
values, harvested at write time from the same per-file distinct pass the
bloom index uses, and `LakeTable.analyze()` folds them into a table NDV
with zero data IO.

KMV, not HLL, because the properties that matter here come for free:

  * mergeable and ORDER-FREE: the union of two KMV sets, re-truncated to
    the k smallest, IS the KMV of the concatenated inputs — so per-file
    sketches fold up associatively and `merge(file blobs)` is
    bit-identical to `build(all values)`;
  * EXACT below k: with <= k distinct values the sketch retains every
    distinct hash and is flagged exact — low-cardinality columns
    (languages, sources, enum tags) get precise answers;
  * bounded error above k: stderr ~ 1/sqrt(k-2), ~3% at the default
    k=1024 (8 KiB raw per file per column — opt-in via `ndv_columns`).

Blob format: base64( flag_byte(1=exact) + sorted little-endian uint64[] ).
Self-describing (length gives the retained count), so sketches built
under different `ndv_k` settings coexist; merge() degrades k to the
smallest truncated input, which keeps the estimator unbiased.

Hashing reuses bloom._normalize so the typed-byte semantics (int/float
unification, UTF-8 strings) are identical to the equality-skip index;
NULLs are excluded — NDV means COUNT(DISTINCT col), which ignores NULL.
ARRAY columns sketch their distinct ELEMENTS (the same contract as
bloom: token vocabularies, not array identities).
"""

from __future__ import annotations

import base64
import hashlib
import struct

from .bloom import _normalize

KMV_K = 1024


def _h64(v) -> int:
    d = hashlib.md5(_normalize(v)).digest()
    return int.from_bytes(d[:8], "little")


def _pack(hs: list[int], exact: bool) -> str:
    return base64.b64encode(
        struct.pack("<B", 1 if exact else 0)
        + struct.pack(f"<{len(hs)}Q", *hs)).decode("ascii")


def _decode(blob: str) -> tuple[bool, list[int]]:
    raw = base64.b64decode(blob)
    n = (len(raw) - 1) // 8
    return raw[0] == 1, list(struct.unpack(f"<{n}Q", raw[1:1 + 8 * n]))


def build(values, k: int = KMV_K) -> str:
    """Sketch an iterable of non-null values; exact when the distinct
    count fits in k."""
    hs = sorted({_h64(v) for v in values})
    exact = len(hs) <= k
    return _pack(hs[:k], exact)


def merge(blobs, k: int = KMV_K) -> str:
    """Union sketches. Exactness survives only if every input was exact
    and the union still fits; a truncated input degrades the effective k
    to its retained size (its k-th smallest hash bounds the region where
    its retained set is complete — beyond it the union would be missing
    that input's values)."""
    u: set[int] = set()
    k_eff = k
    exact_all = True
    for b in blobs:
        ex, hs = _decode(b)
        u.update(hs)
        if not ex:
            exact_all = False
            k_eff = min(k_eff, len(hs))
    hs = sorted(u)
    exact = exact_all and len(hs) <= k_eff
    return _pack(hs[:k_eff], exact)


def estimate(blob: str) -> tuple[float, bool]:
    """(ndv_estimate, is_exact). Exact sketches return their true count;
    truncated ones use the classic KMV estimator (k-1)/R with R the k-th
    smallest hash mapped to (0,1]."""
    ex, hs = _decode(blob)
    if ex:
        return float(len(hs)), True
    r = (hs[-1] + 1) / 2.0**64
    return (len(hs) - 1) / r, False
