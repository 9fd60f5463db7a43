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


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL for zero-norm vectors.

    ``try_divide`` instead of ``/``: under ANSI mode a single all-zero
    embedding anywhere in the corpus would otherwise fail the whole job
    with DIVIDE_BY_ZERO (found by hypothesis in tests/test_properties)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
