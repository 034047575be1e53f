"""Shared helpers for operator implementations."""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

TMP_ROOT = os.environ.get("SPARK_GRAFT_TMP", "/tmp/spark_graft")


def workdir(sf_dir: str, name: str) -> str:
    """Deterministic scratch dir per (scale factor, operator)."""
    d = os.path.join(TMP_ROOT, os.path.basename(os.path.normpath(sf_dir)), name)
    os.makedirs(d, exist_ok=True)
    return d


def money(col: str | Column) -> Column:
    """Exact-arithmetic money column. DECIMAL sums are associative, so
    Spark's unordered partial aggregation stays deterministic and
    hash-matches the oracle (SURVEY.md §7.3 trap #2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return money("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")


# The same expression for DuckDB oracles.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))"
)


def h32(col):
    """Deterministic 32-bit string hash identical in Spark and DuckDB:
    first 8 hex chars of md5, parsed as an integer. DuckDB twin:
    ``('0x' || substring(md5(x), 1, 8))::BIGINT``. The single source
    of truth for every cross-engine hash in the package."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def dot(a, b):
    """Double-precision sequential dot product as a pure JVM array
    expression (zip_with + aggregate) — bit-identical to DuckDB's
    list_dot_product over DOUBLE[] because both fold left-to-right.
    The single source of truth for every cross-engine dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def spread(df):
    """Fan a small-file scan out to all cores before CPU-heavy narrow
    maps (hashing, dot products, Python batches). A few-MB parquet
    file arrives as ONE partition under maxPartitionBytes, which
    serializes per-row-expensive work; one tiny round-robin shuffle
    unlocks full parallelism. At cluster scale, inputs arrive in many
    splits and this becomes a no-op-sized cost."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
