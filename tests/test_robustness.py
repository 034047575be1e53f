"""Driver-contract robustness probes (mirrors the verify recipe's
"worth probing" list): re-entrancy, bad paths, temp-view bleed."""

from __future__ import annotations

import pytest

from conftest import SF_CORRECTNESS, SF_SMOKE


def test_entry_twice_same_session(spark):
    """entry() must be re-runnable in one session (temp-view or
    cached-table name collisions would break the second call)."""
    import __spark_entry__ as e

    n1 = e.entry(spark).count()
    n2 = e.entry(spark).count()
    assert n1 == n2 > 0


def test_bad_sf_dir_raises_cleanly(spark):
    from database_scan_spark.operators.relational import src_parquet_scan
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        src_parquet_scan(spark, "/root/testdata/sf_nope").collect()


def test_query_after_param_bind(spark):
    """param_bind registers a session-global temp view named orders;
    subsequent path-loading queries must not be shadowed by it."""
    from database_scan_spark.operators.relational import agg_group_sums, param_bind
    from database_scan_spark.testing import assert_match, run_oracle
    from database_scan_spark.operators.relational import AGG_GROUP_SUMS_ORACLE

    param_bind(spark, SF_SMOKE).collect()  # leaves 'orders' view behind
    pdf = agg_group_sums(spark, SF_CORRECTNESS).toPandas()
    assert_match(pdf, run_oracle(AGG_GROUP_SUMS_ORACLE, SF_CORRECTNESS), "agg_group_sums")
