"""Driver-built Bloom filters as row-local Spark expressions.

A Bloom bitmap over a key set, built with ONE partially-aggregated
shuffle of at most ``m_bits/32`` (word, mask) rows per task (the keys
themselves never move) and an O(m_bits/32) driver collect — 16 KB at
the default m, the same transfer class as the IVF centroid seeds. The
membership test compiles to pure integer arithmetic inside whole-stage
codegen: the bitmap rides the expression tree as ONE let-bound array
literal, never a Python callback.

Guarantees: NO false negatives ever; false-positive rate ≈ occupancy^k
(~ (1 - e^(-k·n/m))^k). That asymmetry is what makes the filter
composable into joins and anti-joins without changing their results —
see :func:`pyperustats_spark.operators.skew.bloom_prefilter_join`,
:func:`pyperustats_spark.operators.dedup.dedup_incremental_bloom` and
:func:`pyperustats_spark.operators.textops.contamination_flags_bloom`.

This is the explicit, reusable form of what Spark's runtime
bloom-filter join (``spark.sql.optimizer.runtime.bloomFilter.*``)
injects automatically for some equi-joins: build it yourself when the
optimizer won't (anti/semi shapes it skips, driver-known key sets) or
when one filter should prefilter MANY scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyperustats_spark.functions.text import let


def _bloom_pos(col, r: int, m_bits: int):
    """Hash-row r's bit position for a key: xxhash64(key, r) mod m."""
    return F.pmod(F.xxhash64(col, F.lit(r)), F.lit(m_bits))


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 16,
                k: int = 3) -> list[int]:
    """Aggregate *key_col*'s values into an *m_bits* Bloom bitmap,
    packed 32 bits per bigint word. One partial-aggregated shuffle of
    at most m_bits/32 (word, mask) rows per task — the key set itself
    never moves — then an O(m_bits/32) driver collect (16 KB at the
    default m: the IVF-centroid transfer class). Masks are
    ``CAST(pow(2, bit) AS BIGINT)`` with bit ≤ 31 (exact in a double),
    OR-merged JVM-side by ``bit_or``. Duplicates in *keys* are
    harmless (they OR the same bits), so no distinct pass is spent.

    NOTE: this is an ACTION — it scans *keys* now. Callers that reuse
    the same DataFrame lazily afterwards scan it twice; by design the
    bloom side is the small one, so that second scan is the cheap one.
    """
    entries = []
    for r in range(k):
        entries.append(let(
            _bloom_pos(F.col(key_col), r, m_bits),
            lambda p: F.struct(
                ((p - p % F.lit(32)) / 32).cast("int").alias("word"),
                F.pow(F.lit(2.0), (p % F.lit(32)).cast("double"))
                .cast("bigint").alias("mask"))))
    pairs = keys.select(F.explode(F.array(*entries)).alias("e")) \
        .select("e.word", "e.mask")
    agg = pairs.groupBy("word").agg(F.bit_or("mask").alias("m")).collect()
    bitmap = [0] * (m_bits // 32)
    for row in agg:
        bitmap[int(row["word"])] = int(row["m"])
    return bitmap


def bloom_member(col, bitmap: list[int], m_bits: int = 1 << 16,
                 k: int = 3):
    """Row-local membership test against a :func:`bloom_build` bitmap:
    true iff all *k* hash rows' bits are set. No false negatives ever;
    false-positive rate ≈ occupancy^k. The bitmap literal is let-bound
    ONCE (a single m_bits/32-element array in the expression tree, not
    one copy per hash row), each position hash is let-bound against
    CollapseProject re-evaluation, and the whole test is integer
    arithmetic inside whole-stage codegen."""
    arr = F.array(*[F.lit(int(w)) for w in bitmap])

    def body(a):
        out = None
        for r in range(k):
            c = let(
                _bloom_pos(col, r, m_bits),
                lambda p: F.element_at(
                    a, ((p - p % F.lit(32)) / 32).cast("int") + 1)
                .bitwiseAND(
                    F.pow(F.lit(2.0), (p % F.lit(32)).cast("double"))
                    .cast("bigint")) != F.lit(0))
            out = c if out is None else out & c
        return out

    return let(arr, body)
