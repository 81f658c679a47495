"""Portable expression library: every op has a Spark Column builder (f_*)
and a DuckDB SQL-text builder (sql_*) that compute bit-identical results.

This is how the engine's analytics operators (dedup family, text analysis,
similarity) stay oracle-checkable: the driver runs the Spark plan and the
DuckDB SQL side by side and hash-compares values (CORRECTNESS gate), so both
sides are generated from this single module and verified pairwise in
tests/test_portable.py.

Everything is built-in JVM-side Spark (whole-stage codegen; higher-order
array functions) — no Python UDFs anywhere on this path.

Verified primitive equivalences (probed on pyspark 4.1.2 / duckdb 1.0):
  ascii(char)           == unicode-code-point on both sides
  md5(string)           == same hex string
  split(text,'')        == string_split(text,'')   (per-char)
  aggregate/transform   == list_reduce/list_transform
  instr(hay,needle)     == strpos(hay,needle)      (1-based, 0 if absent)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # fits h*131+cp in int64 with huge headroom
WORD_RE = "[^a-z0-9]+"
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


# ---------- tokenization ----------

def f_words(c: Column) -> Column:
    """Lowercased alphanumeric word array."""
    return F.filter(F.split(F.lower(c), WORD_RE), lambda x: x != "")


def sql_words(e: str) -> str:
    return f"list_filter(string_split_regex(lower({e}), '{WORD_RE}'), w -> w <> '')"


def f_token_count(c: Column) -> Column:
    return F.size(f_words(c))


def sql_token_count(e: str) -> str:
    return f"len({sql_words(e)})"


# ---------- rolling fingerprint (char-level polynomial hash) ----------

def f_fingerprint(c: Column) -> Column:
    """h = fold chars: (h*131 + codepoint) mod 1e9+7 — document fingerprint
    (deterministic, order-sensitive, portable)."""
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("bigint"),
        lambda h, ch: F.pmod(h * F.lit(131) + F.ascii(ch), F.lit(MOD)),
    )


def sql_fingerprint(e: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({e}, ''), ch -> unicode(ch)::BIGINT)), "
        f"(h, c) -> (h * 131 + c) % {MOD})"
    )


# ---------- shingles / n-grams ----------

def f_shingles(c: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined); empty array if < n words.
    The short-doc case needs an explicit guard: Spark's sequence(1, 0) is
    the DESCENDING [1, 0] (slice then rejects start=0), while DuckDB's
    range(1, 1) is already empty."""
    w = f_words(c)
    return F.when(
        F.size(w) >= F.lit(n),
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_shingles(e: str, n: int = 3) -> str:
    w = sql_words(e)
    # duckdb list_slice(l, b, e) is inclusive of both ends (1-based)
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' '))"
    )


# ---------- minhash ----------

# Universal-hash MinHash family: ONE md5 per shingle (base hash h =
# first-15-hex-digits mod P), then permutation i is the integer map
# (A[i]*h + B[i]) mod P. 16x fewer digests than hashing per (perm,
# shingle) — the md5 is the dominant cost at corpus scale — and exactly
# portable: Spark conv(substr(md5,1,15),16,10) == DuckDB
# ('0x'||substr(md5,1,15))::BIGINT, and the rest is int64 arithmetic
# (products < 2^62, no overflow). Empty docs get sentinel P (> any value).
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
import random as _random  # noqa: E402

_rng = _random.Random(0x5EED)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(64)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(64)]
del _rng


def f_shingle_hash(s: Column) -> Column:
    """Base int64 hash of one shingle (mod P)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % MINHASH_P


def sql_shingle_hash(e: str) -> str:
    return f"(('0x' || substr(md5({e}), 1, 15))::BIGINT % {MINHASH_P})"


def f_perm_hash(h: Column, i: int) -> Column:
    """Permutation i of a base hash (int64 arithmetic, no digest)."""
    return (h * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P


def sql_perm_hash(h: str, i: int) -> str:
    return f"(({h}) * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}"


def f_minhash(c: Column, k: int = 16, n: int = 3) -> Column:
    """k-permutation MinHash signature (array<bigint>) over n-word
    shingles; see the family note above. Expression form — the row-exploded
    scale path lives in operators/dedupe.py and computes identical values.
    """
    assert k <= len(MINHASH_A)
    hs = F.transform(f_shingles(c, n), f_shingle_hash)

    def perm(i):
        # closure factory: a 2-arg lambda would make transform() pass the
        # array INDEX as the second argument
        return lambda h: f_perm_hash(h, i)

    return F.array(*[
        F.coalesce(F.array_min(F.transform(hs, perm(i))), F.lit(MINHASH_P))
        for i in range(k)
    ])


def sql_minhash(e: str, k: int = 16, n: int = 3) -> str:
    assert k <= len(MINHASH_A)
    hs = f"list_transform({sql_shingles(e, n)}, s -> {sql_shingle_hash('s')})"
    elems = ", ".join(
        f"coalesce(list_aggregate(list_transform(hs, h -> {sql_perm_hash('h', i)}),"
        f" 'min'), {MINHASH_P})"
        for i in range(k)
    )
    return f"(SELECT [{elems}] FROM (SELECT {hs} AS hs))"


def f_lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """Band digests of a MinHash signature: md5 of each band's concatenated
    signature elements. Two docs sharing any band digest are LSH candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat(b.cast("string"), F.lit("#"),
                     F.concat_ws("|", F.transform(
                         F.slice(sig, b * rows + 1, rows),
                         lambda x: x.cast("string"))))
        ),
    )


def sql_lsh_bands(sig: str, bands: int, rows: int) -> str:
    # hoisted through a scalar subquery: sig may itself be a subquery
    # (sql_minhash), which DuckDB cannot evaluate inside a lambda
    return (
        f"(SELECT list_transform(range(0, {bands}), "
        f"b -> md5(b::VARCHAR || '#' || "
        f"array_to_string(list_slice(sig_, b*{rows} + 1, b*{rows} + {rows}), '|')))"
        f" FROM (SELECT {sig} AS sig_))"
    )


# ---------- simhash (32-bit, from per-word md5) ----------

_HEX = "0123456789abcdef"


def _bit_value(b: int) -> int:
    """Signed-int64 value of bit b (two's complement: bit 63 is the sign
    bit, emitted as the negative literal so neither engine overflows a
    left shift — DuckDB raises on 1::BIGINT << 63)."""
    return (1 << b) if b < 63 else -(1 << 63)


def f_simhash(c: Column, bits: int = 32) -> Column:
    """`bits`-wide SimHash over words (bits <= 64): bit b is the sign of
    sum over words of (bit b of md5(word) ? +1 : -1). Bits come from the
    first bits/4 hex chars. Static expression tree (bit positions are
    compile-time ints). Wider hashes buy exponentially thinner pigeonhole
    blocks in hamming_band_pairs (production simhash is 64-bit for this
    reason, Manku et al.); Hamming math is sign-agnostic (xor+popcount on
    the two's-complement representation)."""
    if not 0 < bits <= 64:
        raise ValueError(f"simhash bits must be in 1..64, got {bits}")
    w = f_words(c)
    total = F.lit(0).cast("bigint")
    for b in range(bits):
        pos, sh = b // 4 + 1, b % 4

        def contrib(word, pos=pos, sh=sh):
            hv = F.conv(F.substring(F.md5(word), pos, 1), 16, 10).cast("int")
            return (F.shiftright(hv, sh) % F.lit(2)) * F.lit(2) - F.lit(1)

        bsum = F.aggregate(w, F.lit(0), lambda acc, word: acc + contrib(word))
        total = total + F.when(bsum > 0,
                               F.lit(_bit_value(b)).cast("bigint")).otherwise(F.lit(0))
    return total


def f_simhash32(c: Column) -> Column:
    """32-bit SimHash (see f_simhash)."""
    return f_simhash(c, 32)


def sql_simhash(e: str, bits: int = 32) -> str:
    if not 0 < bits <= 64:
        raise ValueError(f"simhash bits must be in 1..64, got {bits}")
    w = sql_words(e)
    bit = (
        f"((strpos('{_HEX}', substr(md5(word), (b // 4) + 1, 1)) - 1) >> (b % 4)) % 2"
    )
    bit_sum = f"list_reduce(list_prepend(0, list_transform({w}, word -> {bit} * 2 - 1)), (a, x) -> a + x)"
    # bit values as literals: DuckDB overflows on 1::BIGINT << 63, and the
    # signed top-bit literal keeps the running sum in int64 range. The
    # negative literal must be parenthesized BEFORE ::BIGINT — cast binds
    # tighter than unary minus, so -92...08::BIGINT would cast +2^63 first
    # and raise out-of-range.
    vals = "[" + ", ".join(f"({_bit_value(b)})::BIGINT"
                           for b in range(bits)) + "]"
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, {bits}), "
        f"b -> CASE WHEN {bit_sum} > 0 THEN ({vals})[b + 1] ELSE 0::BIGINT END)), "
        f"(a, x) -> a + x)"
    )


def sql_simhash32(e: str) -> str:
    return sql_simhash(e, 32)


# ---------- set similarity ----------

def f_jaccard_words(a: Column, b: Column) -> Column:
    """Jaccard over distinct word sets, as exact rational via counts.
    Returned as (intersection, union) packed — callers divide; we keep
    integers portable and do one final double division identically."""
    sa, sb = F.array_distinct(f_words(a)), F.array_distinct(f_words(b))
    inter = F.size(F.array_intersect(sa, sb))
    uni = F.size(sa) + F.size(sb) - inter
    return (inter.cast("double") / uni.cast("double"))


def sql_jaccard_words(a: str, b: str) -> str:
    sa, sb = f"list_distinct({sql_words(a)})", f"list_distinct({sql_words(b)})"
    inter = f"len(list_intersect({sa}, {sb}))"
    return (
        f"({inter}::DOUBLE / (len({sa}) + len({sb}) - {inter})::DOUBLE)"
    )


def f_jaccard_shingles(a: Column, b: Column, n: int = 3) -> Column:
    sa = F.array_distinct(f_shingles(a, n))
    sb = F.array_distinct(f_shingles(b, n))
    inter = F.size(F.array_intersect(sa, sb))
    uni = F.size(sa) + F.size(sb) - inter
    return inter.cast("double") / uni.cast("double")


def sql_jaccard_shingles(a: str, b: str, n: int = 3) -> str:
    sa = f"list_distinct({sql_shingles(a, n)})"
    sb = f"list_distinct({sql_shingles(b, n)})"
    inter = f"len(list_intersect({sa}, {sb}))"
    return f"({inter}::DOUBLE / (len({sa}) + len({sb}) - {inter})::DOUBLE)"


# ---------- vector ops (embeddings: array<float>) ----------

def f_dot(a: Column, b: Column) -> Column:
    """Sequential left-fold double dot product (identical association order
    on both engines -> bit-identical doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )


def f_norm(a: Column) -> Column:
    return F.sqrt(f_dot(a, a))


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def f_cosine(a: Column, b: Column) -> Column:
    return f_dot(a, b) / (f_norm(a) * f_norm(b))


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"


# ---------- derived tokens (deterministic md5 tokenizer) ----------

VOCAB = 50257
KNUTH = 2654435761  # Knuth multiplicative hash constant (public)


def f_word_ids(c: Column, vocab: int = VOCAB) -> Column:
    """Deterministic BPE-ish tokenizer: each word hashes to a vocab id via
    the first 8 hex chars of md5 — the portable stand-in for a real tokenizer
    so token-array operators are oracle-checkable on text-only tables."""
    return F.transform(
        f_words(c),
        lambda w: (F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("bigint")
                   % F.lit(vocab)).cast("int"),
    )


def sql_word_ids(e: str, vocab: int = VOCAB) -> str:
    hexint = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split(substr(md5(w), 1, 8), ''), "
        f"ch -> (strpos('{_HEX}', ch) - 1)::BIGINT)), (a, x) -> a * 16 + x)"
    )
    return f"list_transform({sql_words(e)}, w -> ({hexint} % {vocab})::INTEGER)"


def f_tokens_fingerprint(c: Column) -> Column:
    """Validation hash of a token array: left fold h=(h*131+tok) mod 1e9+7 —
    the row-equality check for token payloads (north rule: token-array
    equality) in a portable scalar."""
    return F.aggregate(
        c,
        F.lit(0).cast("bigint"),
        lambda h, t: F.pmod(h * F.lit(131) + t.cast("bigint"), F.lit(MOD)),
    )


def sql_tokens_fingerprint(e: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({e}, t -> t::BIGINT)), "
        f"(h, t) -> (h * 131 + t) % {MOD})"
    )


# ---------- sign-random-projection LSH (ANN scale path) ----------

def srp_weights(planes: int = 8, dim: int = 64,
                offset: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1000, 1000]: shared
    Python-side constants embedded as literals on both engines. `offset`
    selects a disjoint plane family (planes offset..offset+planes-1) so
    multi-table LSH (OR-amplification) gets independent hash tables from
    the same generator."""
    return [
        [float((((p + offset) * KNUTH + j * 40503) % 2001) - 1000)
         for j in range(dim)]
        for p in range(planes)
    ]


def f_srp_bucket(vec: Column, planes: int = 8, dim: int = 64,
                 offset: int = 0) -> Column:
    """LSH bucket id: bit p of the id is sign(dot(vec, plane_p)) — cosine
    neighbors collide with high probability; bucket count = 2^planes."""
    ws = srp_weights(planes, dim, offset)
    bucket = F.lit(0)
    for p in range(planes):
        wa = F.array(*[F.lit(w) for w in ws[p]])
        dot = F.aggregate(
            F.zip_with(vec, wa, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def sql_srp_bucket(e: str, planes: int = 8, dim: int = 64,
                   offset: int = 0) -> str:
    ws = srp_weights(planes, dim, offset)
    parts = []
    for p in range(planes):
        arr = "[" + ", ".join(f"{w}::DOUBLE" for w in ws[p]) + "]"
        dot = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(1, {dim} + 1), i -> {e}[i]::DOUBLE * ({arr})[i])), "
            f"(a, v) -> a + v)"
        )
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


# ---------- text quality / language heuristics ----------

def f_quality(c: Column) -> Column:
    """Quality score in [0,1]: mix of length band, stopword ratio and
    alphanumeric ratio — the standard cheap pre-filter for training data.
    Integer/thousandths arithmetic keeps it bit-portable."""
    w = f_words(c)
    n = F.size(w)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    total = F.length(c)
    len_ok = F.when((n >= 20) & (n <= 10000), F.lit(1)).otherwise(F.lit(0))
    # thousandths as integers, then one double division at the end
    stop_k = F.when(n > 0, (stop_hits * 1000) / n).otherwise(F.lit(0)).cast("bigint")
    alnum_k = F.when(total > 0, (alnum * 1000) / total).otherwise(F.lit(0)).cast("bigint")
    score_k = len_ok * 400 + F.least(stop_k * 2, F.lit(300)) + alnum_k * 300 / 1000
    return score_k.cast("bigint")


def sql_quality(e: str) -> str:
    w = sql_words(e)
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n = f"len({w})"
    stop_hits = f"len(list_filter({w}, x -> list_contains({stops}, x)))"
    alnum = f"length(regexp_replace(lower({e}), '[^a-z0-9]', '', 'g'))"
    total = f"length({e})"
    len_ok = f"(CASE WHEN {n} BETWEEN 20 AND 10000 THEN 1 ELSE 0 END)"
    stop_k = f"(CASE WHEN {n} > 0 THEN ({stop_hits} * 1000) // {n} ELSE 0 END)"
    alnum_k = f"(CASE WHEN {total} > 0 THEN ({alnum} * 1000) // {total} ELSE 0 END)"
    return f"({len_ok} * 400 + least({stop_k} * 2, 300) + {alnum_k} * 300 // 1000)::BIGINT"


LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
}


def f_langid(c: Column) -> Column:
    """Stopword-marker language guess: the language with the most marker
    hits wins; ties and zero hits -> 'und'. Deterministic tie-break by
    language code order."""
    w = f_words(c)

    def marker_hits(markers):
        # one-arg lambda only: F.filter treats a second param as the index
        return F.size(F.filter(w, lambda x: x.isin(*markers)))

    scores = [(lang, marker_hits(markers)) for lang, markers in sorted(LANG_MARKERS.items())]
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, n in scores:
        hit = n > best_n
        best = F.when(hit, F.lit(lang)).otherwise(best)
        best_n = F.when(hit, n).otherwise(best_n)
    return best


def sql_langid(e: str) -> str:
    w = sql_words(e)
    parts_n = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        m = "[" + ", ".join(f"'{s}'" for s in markers) + "]"
        parts_n.append((lang, f"len(list_filter({w}, x -> list_contains({m}, x)))"))
    expr = "'und'"
    best_n = "0"
    for lang, n in parts_n:
        expr = f"(CASE WHEN {n} > {best_n} THEN '{lang}' ELSE {expr} END)"
        best_n = f"greatest({best_n}, {n})"
    return expr
