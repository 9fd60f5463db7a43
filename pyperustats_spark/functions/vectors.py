"""Vector math over ``array<float>`` columns using higher-order functions.

All JVM-side (``zip_with`` / ``aggregate``) — no UDF, no serialization to
Python — so similarity scans stay inside codegen and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def norm_nn(a: Column) -> Column:
    """Non-NULLABLE hoisted norm for score columns that feed a filter.

    A band/threshold predicate on a computed cosine makes Catalyst
    infer ``IsNotNull`` constraints and push them below the join —
    substituting the WHOLE O(dim) norm fold into a Filter under each
    scan, so every corpus row pays the fold twice (the ivf_cell /
    dedup ``_nrm`` class). Coalescing the norm with 0.0 makes the
    column provably non-null and the inferred constraint vanishes.

    Semantics unchanged: norm() is NULL only for a NULL array / NULL
    element, in which case the dot fold is NULL too and
    ``try_divide(NULL, 0.0 * nq)`` still yields a NULL cosine that the
    band filter drops exactly as before."""
    return F.coalesce(norm(a), F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for zero-norm vectors.

    ``try_divide`` instead of ``/``: under ANSI mode a single all-zero
    embedding anywhere in the corpus would otherwise fail the whole job
    with DIVIDE_BY_ZERO (found by hypothesis in tests/test_properties)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def lit_doubles(xs) -> Column:
    """array<double> literal built as ONE SQL expression string.

    ``F.lit(list)`` converts element-by-element over py4j (~0.03 s per
    64-float array, ~0.2 s per nested list — measured); a driver that
    embeds codebooks/centroids/hyperplanes as literals pays that per
    OPERATOR CALL, which dominated the similarity family's wall time
    at small SF. ``repr(float)`` is shortest-round-trip decimal and
    both Python and the JVM parse it correctly rounded, so the doubles
    are bit-identical to the F.lit form. Raises on non-finite values
    (SQL literals can't express nan/inf; upstream data is finite by
    construction)."""
    parts = []
    for x in xs:
        x = float(x)
        if x != x or x in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite literal {x!r}")
        parts.append(repr(x) + "D")
    return F.expr("array(" + ",".join(parts) + ")")


def lit_double_matrix(mat) -> Column:
    """array<array<double>> literal as ONE SQL expression string (see
    :func:`lit_doubles`)."""
    rows = []
    for r in mat:
        parts = []
        for x in r:
            x = float(x)
            if x != x or x in (float("inf"), float("-inf")):
                raise ValueError(f"non-finite literal {x!r}")
            parts.append(repr(x) + "D")
        rows.append("array(" + ",".join(parts) + ")")
    return F.expr("array(" + ",".join(rows) + ")")


def lit_longs(xs) -> Column:
    """array<bigint> literal as ONE SQL expression string (see
    :func:`lit_doubles`)."""
    return F.expr(
        "array(" + ",".join(str(int(x)) + "L" for x in xs) + ")")
