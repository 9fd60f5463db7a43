"""Driver-built Bloom filters as row-local Spark expressions.

A Bloom bitmap over a key set, built with ONE partially-aggregated
shuffle of at most ``m_bits/64`` (word, mask) rows per task (the keys
themselves never move) and an O(m_bits/64) driver collect — 8 KB at
the default m, the same transfer class as the IVF centroid seeds. The
membership test compiles to pure integer arithmetic inside whole-stage
codegen: the bitmap is an array of literals that ConstantFolding
collapses to ONE Literal, never a Python callback. Deliberately
let-free: `let` compiles to a higher-order transform() that is
evaluated OUTSIDE codegen (interpreted, measured ~3x wall on a 60M-row
probe side), so the cheap xxhash64 is simply written twice per hash
row (word index + mask) and the whole test stays in codegen.

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

def _bloom_pos(col, r: int, m_bits: int):
    """Hash-row r's bit position for a key: xxhash64(key, r) mod m."""
    return F.pmod(F.xxhash64(col, F.lit(r)), F.lit(m_bits))


def _mask(p):
    """shiftleft(1L, p % 64) with a COLUMN shift amount (the PySpark
    wrapper only accepts a Python int there, so go through
    call_function to reach the SQL form)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (p % F.lit(64)).cast("int"))


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 16,
                k: int = 3) -> list[int]:
    """Aggregate *key_col*'s values into an *m_bits* Bloom bitmap,
    packed 64 bits per bigint word. One partial-aggregated shuffle of
    at most m_bits/64 (word, mask) rows per task — the key set itself
    never moves — then an O(m_bits/64) driver collect (8 KB at the
    default m: the IVF-centroid transfer class). Masks are exact
    integer ``shiftleft(1L, bit)`` (bit ≤ 63 — including the sign
    bit, which bit_or/bitwiseAND treat as just another bit),
    OR-merged JVM-side by ``bit_or``. Duplicates in *keys* are
    harmless (they OR the same bits), so no distinct pass is spent.

    Sizing: fp_rate ≈ (1 - e^(-k·n/m))^k — keep m_bits ≥ ~10·n for
    ~1% fp at k=3. The bitmap rides the expression tree as an
    m_bits/64-element array literal, so this explicit form is for
    BOUNDED key sets (daily crawl batches, eval benchmarks, a
    quarter's order keys: n up to ~10^5–10^6, m up to ~2^20 / 16k
    literals). For filter sets beyond that, lean on Spark's runtime
    bloom-filter join, which builds its filter distributed instead of
    as a plan literal.

    NOTE: this is an ACTION — it scans *keys* now. Callers that reuse
    the same DataFrame lazily afterwards scan it twice; by design the
    bloom side is the small one, so that second scan is the cheap one.
    """
    entries = []
    for r in range(k):
        p = _bloom_pos(F.col(key_col), r, m_bits)
        entries.append(F.struct(
            F.shiftrightunsigned(p, 6).cast("int").alias("word"),
            _mask(p).alias("mask")))
    pairs = keys.select(F.explode(F.array(*entries)).alias("e")) \
        .select("e.word", "e.mask")
    agg = pairs.groupBy("word").agg(F.bit_or("mask").alias("m")).collect()
    bitmap = [0] * (m_bits // 64)
    for row in agg:
        bitmap[int(row["word"])] = int(row["m"])
    return bitmap


def bloom_member(col, bitmap: list[int], m_bits: int = 1 << 16,
                 k: int = 3):
    """Row-local membership test against a :func:`bloom_build` bitmap:
    true iff all *k* hash rows' bits are set. No false negatives ever;
    false-positive rate ≈ occupancy^k. The bitmap array of literals is
    constant-folded to a single Literal (costless per reference —
    CollapseProject duplication doesn't apply to constants), and the
    whole test is integer arithmetic inside whole-stage codegen; see
    the module docstring for why this is deliberately let-free."""
    # ONE array<bigint> literal expression string, not m/64 F.lit py4j
    # round-trips (the per-element form measured whole seconds of
    # driver time at 16 KB)
    from pyperustats_spark.functions.vectors import lit_longs
    arr = lit_longs(bitmap)
    out = None
    for r in range(k):
        p = _bloom_pos(col, r, m_bits)
        c = (F.element_at(arr, F.shiftrightunsigned(p, 6).cast("int") + 1)
             .bitwiseAND(_mask(p)) != F.lit(0))
        out = c if out is None else out & c
    return out
