"""Session cache lifecycle at the driver contract boundary.

VERDICT r4 "persist hygiene": operators persist() intermediates and
cannot unpersist behind their own lazily-returned result, so the
lifetime contract is session-level — `__spark_entry__.queries()`
releases the previous query's engine-tracked persists on each query's
entry, bounding a sequential sweep to at most one query's cached
relations (SCALE.md "Cache lifecycle").

ADVICE r5 upgrade: the release is TRACKED, not `clearCache()` — a
cache the CALLER created (e.g. a pre-cached input table) must survive
engine queries running around it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"

# A spec that persists intermediates (graph fixpoints do), followed by
# any second spec: after B starts, A's caches must be gone.
_PERSISTING = "graph_pagerank"
_NEXT = "agg_count"


def _cached_relations(spark) -> int:
    # InMemoryRelations materialize RDD storage lazily; storage info is
    # the observable (it is what OOMs a long sweep). Count cached RDDs.
    return len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])


def test_second_query_releases_first_querys_caches(spark):
    qs = entry_mod.queries()

    spark.catalog.clearCache()
    a = qs[_PERSISTING](spark, SF)
    a_rows = a.count()  # materialize: A's persists are now resident
    assert a_rows > 0
    resident_after_a = _cached_relations(spark)
    assert resident_after_a > 0, (
        "probe spec no longer persists anything — pick another spec "
        "or this test is vacuous"
    )

    b = qs[_NEXT](spark, SF)
    # Entry into B must have released A's caches (before B builds its
    # own): the resident set cannot ACCUMULATE across sequential
    # queries through the contract surface.
    resident_at_b_entry = _cached_relations(spark)
    assert resident_at_b_entry == 0, (
        f"query entry leaked {resident_at_b_entry} cached relations "
        f"from the previous query (was {resident_after_a} after it ran)"
    )
    assert b.count() > 0

    # And the raw spec path (bench/tests) is untouched: no implicit
    # clear when calling spec.fn directly.
    from database_scan_spark.registry import get

    spark.catalog.clearCache()
    get(_PERSISTING).fn(spark, SF).count()
    direct = _cached_relations(spark)
    get(_NEXT).fn(spark, SF).count()
    assert _cached_relations(spark) >= direct, (
        "direct spec.fn path must not implicitly clear caches"
    )
    spark.catalog.clearCache()


def test_caller_caches_survive_engine_queries(spark):
    """A cache the CALLER owns is not collateral of the engine's
    release discipline (ADVICE r5: the r4-r5 clearCache() dropped it).
    """
    from database_scan_spark.catalog import load

    qs = entry_mod.queries()
    spark.catalog.clearCache()

    caller_df = load(spark, SF, "nation").persist()
    assert caller_df.count() > 0  # materialize the caller's cache
    assert caller_df.storageLevel.useMemory

    # Run a persisting engine query, then a second one (whose entry
    # releases the first's tracked persists).
    qs[_PERSISTING](spark, SF).count()
    qs[_NEXT](spark, SF).count()

    # The caller's cache is still marked persistent and still resident.
    assert caller_df.storageLevel.useMemory, (
        "engine query entry unpersisted a caller-owned cache"
    )
    assert _cached_relations(spark) >= 1
    caller_df.unpersist()
    spark.catalog.clearCache()


def test_persist_intercept_is_scoped(spark):
    """DataFrame.persist is intercepted only WHILE an engine query
    builds its plan — after queries() returns, a caller persist must
    not be tracked (and so must survive the next engine entry)."""
    from pyspark.sql import DataFrame

    from database_scan_spark.catalog import load

    qs = entry_mod.queries()
    orig = DataFrame.persist
    qs[_NEXT](spark, SF).count()
    assert DataFrame.persist is orig, (
        "persist intercept leaked past the query-construction scope"
    )
    # A caller persist made now must not enter the engine's tracked set.
    before = list(entry_mod._ENGINE_PERSISTS)
    caller_df = load(spark, SF, "region").persist()
    assert len(entry_mod._ENGINE_PERSISTS) == len(before)
    caller_df.unpersist()
    spark.catalog.clearCache()
