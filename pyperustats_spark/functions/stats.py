"""Exact fixed-point regression core.

OLS normal-equation sums over INTEGER-valued x/y columns, accumulated
as DECIMAL(38,0) so every sum is exact and merge-order-free — the
CLAUDE.md fixed-point rule applied to regression. The combined terms
(num = n·Sxy−Sx·Sy, denx = n·Sxx−Sx², deny = n·Syy−Sy²) stay exact
integers and convert to double ONCE; a SQL oracle doing the same sums
in HUGEINT converts the same exact integers and lands on identical
bits, so slope/intercept/r2 ship RAW (never round derived doubles).

Callers encode their units as integers (cents, ln-micros, plain
indices) and pass the scale factors; the final divisions mirror the
oracle expression ORDER exactly (``num/denx/(y_scale/x_scale)`` — two
sequential divisions, and identity ops like ``/1.0`` are bit-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_exact(
    df: DataFrame,
    group_cols: list[str],
    x: str = "_x",
    y: str = "_y",
    x_scale: float = 1.0,
    y_scale: float = 1.0,
) -> DataFrame:
    """Per-group OLS of integer column *y* on integer column *x*.

    Returns (group_cols..., n_obs, slope, intercept, r2) where slope /
    intercept are expressed in (y / y_scale) per (x / x_scale) units.
    Degenerate groups (n = 1, or zero y-variance for r2) yield NULL via
    guarded division. One shuffle on the group key."""

    def dec(c):
        return c.cast("decimal(38,0)")

    s = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(dec(F.col(x))).alias("_sx"),
        F.sum(dec(F.col(x)) * F.col(x)).alias("_sxx"),
        F.sum(dec(F.col(y))).alias("_sy"),
        F.sum(dec(F.col(x)) * F.col(y)).alias("_sxy"),
        F.sum(dec(F.col(y)) * F.col(y)).alias("_syy"),
    )
    n = dec(F.col("n_obs"))
    c = s.select(
        *group_cols,
        "n_obs",
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("double").alias("_num"),
        (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        .cast("double").alias("_denx"),
        (n * F.col("_syy") - F.col("_sy") * F.col("_sy"))
        .cast("double").alias("_deny"),
        F.col("_sx").cast("double").alias("_sxd"),
        F.col("_sy").cast("double").alias("_syd"),
        F.col("n_obs").cast("double").alias("_nd"),
    )
    slope = F.when(F.col("_denx") != 0.0,
                   F.col("_num") / F.col("_denx")
                   / F.lit(float(y_scale) / float(x_scale)))
    return c.select(
        *group_cols,
        "n_obs",
        slope.alias("slope"),
        (F.col("_syd") / (F.lit(float(y_scale)) * F.col("_nd"))
         - slope * (F.col("_sxd")
                    / (F.lit(float(x_scale)) * F.col("_nd"))))
        .alias("intercept"),
        F.when((F.col("_denx") != 0.0) & (F.col("_deny") != 0.0),
               F.col("_num") * F.col("_num")
               / (F.col("_denx") * F.col("_deny"))).alias("r2"),
    )
