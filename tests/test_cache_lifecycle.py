"""Session cache lifecycle at the driver contract boundary.

VERDICT r4 "persist hygiene": operators persist() intermediates and
cannot unpersist behind their own lazily-returned result, so the
lifetime contract is session-level — `__spark_entry__.queries()`
clears the cache on each query's entry, bounding a sequential sweep
to at most one query's cached relations (SCALE.md "Cache lifecycle").
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
