"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``database_scan_spark``; this module is a
thin view over its query registry (``database_scan_spark/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_scan_spark.registry import SPECS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The 6-step candidate-entity traversal (reference spec at
    /root/reference/x2.2.py:238-247) over the fixture star schema —
    see database_scan_spark/plans/candidate_parts.py.
    """
    from database_scan_spark.plans.candidate_parts import candidate_parts

    return candidate_parts(spark, "/root/testdata/sf0.001")


def _released(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Release the PREVIOUS query's cached intermediates on entry.

    Operators persist() intermediates they consume more than once;
    those caches are correct to drop the moment the query's result
    has been read, but a lazily-returned DataFrame can't unpersist
    behind itself. Bounding the session to AT MOST ONE query's
    caches at the contract boundary instead: the driver runs queries
    strictly sequentially (collect, then next), so clearing on entry
    drops exactly the finished query's caches. Uncaching is
    plan-shape only — a cleared DataFrame recomputes correctly if
    re-collected. See SCALE.md "Cache lifecycle".
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star extension ops). Keys are SURVEY §2 Op ids."""
    return {s.name: _released(s.fn) for s in SPECS}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible query; non-SQL
    ops (streaming state, LSH internals) are omitted → rows-only."""
    return {s.name: s.oracle for s in SPECS if s.oracle is not None}
