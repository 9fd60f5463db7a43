"""Stable hashing primitives shared by dedup operators.

Everything is built on ``md5`` (bit-identical across Spark and DuckDB, so
oracle SQL can reproduce results exactly). MinHash permutations use the
classic ``(a*h + b) mod p`` family over the Mersenne prime 2^31-1 with
deterministic coefficients — all products stay < 2^62, safe under Spark's
ANSI integer overflow checks — so signatures are reproducible
run-to-run and across engines.

Reference analog: the INEI organizer dedupes documentation files by
SHA-256 content hash (perustats/inei/organizer.py:207-231); here content
hashing generalizes to exact/near dedup over document text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = (1 << 31) - 1  # Mersenne prime 2^31-1


def md5_hash64(col: Column) -> Column:
    """First 15 hex chars of md5 → non-negative int64.

    ``conv(hex, 16, 10)`` returns an unsigned decimal string; a
    15-hex-char slice (60 bits) always fits in int64.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_hash31(col: Column) -> Column:
    """md5-derived hash reduced into [0, 2^31-1)."""
    return md5_hash64(col) % F.lit(P31)


def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs in [1, P31) for k permutations."""
    coeffs = []
    a, b = seed, seed * 31 + 17
    for _ in range(k):
        a = (a * 1103515245 + 12345) % P31
        b = (b * 69069 + 1) % P31
        coeffs.append((a | 1, b))
    return coeffs


def minhash_signature_from_hashes(hashes: Column, k: int = 32, seed: int = 7) -> Column:
    """Signature from a pre-hashed int31 array column.

    Splitting hashing from permuting lets callers materialize the hash
    array once (e.g. persist) instead of Catalyst inlining the md5
    pipeline into all k permutation expressions."""
    sig = []
    for a, b in minhash_coeffs(k, seed):
        sig.append(
            F.array_min(
                F.transform(hashes, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(P31))
            )
        )
    return F.array(*sig)


def minhash_signature(shingles: Column, k: int = 32, seed: int = 7) -> Column:
    """Array of k min-hash values for an array-of-string shingle column.

    Per-row and zero-shuffle: hash each shingle once via md5→int31, then
    for each permutation take ``array_min(transform(...))`` of
    ``(a*h + b) mod P31`` — all inside codegen. ``a*h + b`` < 2^62 so
    ANSI-mode int64 arithmetic never overflows.
    """
    base = F.transform(shingles, lambda s: md5_hash31(s))
    sig = []
    for a, b in minhash_coeffs(k, seed):
        sig.append(
            F.array_min(
                F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(P31))
            )
        )
    return F.array(*sig)


def simhash64(toks: Column) -> Column:
    """63-bit SimHash of an array-of-string token column.

    For each bit position, sum +1/-1 votes over token hashes and set the
    bit if the vote is positive — aggregate over the token array per
    bit, JVM-side, per-row. 63 bits keeps the result non-negative.
    """
    from pyperustats_spark.functions.text import let

    def body(hashes):
        out = F.lit(0).cast("bigint")
        for bit in range(63):
            mask = F.lit(1 << bit).cast("bigint")
            # bind mask via an outer closure: pyspark inspects the
            # lambda's arity, so a default-arg trick would read as a
            # 3-arg function
            merge = (lambda mm: lambda acc, h: acc
                     + F.when(h.bitwiseAND(mm) > 0, F.lit(1)).otherwise(F.lit(-1)))(mask)
            vote = F.aggregate(hashes, F.lit(0).cast("bigint"), merge)
            out = out + F.when(vote > 0, mask).otherwise(F.lit(0).cast("bigint"))
        return out

    # let-bind the token-hash array: each of the 63 per-bit aggregates
    # reads the bound array instead of recomputing n × md5 per bit
    return let(F.transform(toks, lambda t: md5_hash64(t)), body)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
