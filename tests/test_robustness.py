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


def test_json_permissive_quarantines_planted_corrupt_rows(spark):
    """Every planted corrupt line must land in the corrupt-record
    column — none dropped, none crashing the read."""
    import os

    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.operators.relational import (
        _N_CORRUPT_PLANTED,
        src_json_permissive,
    )
    from pyspark.sql import functions as F

    src_json_permissive(spark, SF_SMOKE).collect()  # ensures files exist
    path = workdir(SF_SMOKE, "src_json_permissive")
    raw = (
        spark.read.schema(
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, _corrupt STRING"
        )
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .cache()  # Spark disallows querying ONLY the corrupt column off raw files
    )
    try:
        assert raw.filter(F.col("_corrupt").isNotNull()).count() == _N_CORRUPT_PLANTED
    finally:
        raw.unpersist()


def test_jsonl_sink_abort_leaves_no_committed_output(spark):
    """The Python DataSource writer's commit protocol under task
    failure: a write job with one injected failing partition must (a)
    fail the job, (b) commit NOTHING — no _SUCCESS manifest and no
    part files outside _staging — because abort() runs instead of
    commit(). Readers honoring the manifest therefore see
    all-or-nothing output."""
    import glob
    import os
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from database_scan_spark.catalog import load
    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.sources.jsonl_sink import make_jsonl_sink

    try:
        spark.dataSource.register(make_jsonl_sink())
    except Exception:
        pass  # already registered in this session
    out_dir = workdir(SF_SMOKE, "jsonl_sink_abort_test")
    shutil.rmtree(out_dir, ignore_errors=True)
    df = (
        load(spark, SF_SMOKE, "orders")
        .filter(F.col("o_custkey") < 50)
        .select("o_orderkey", "o_custkey")
        .repartition(4)
    )
    with pytest.raises(Exception, match="injected failure"):
        (
            df.write.format("edges_jsonl")
            .option("path", out_dir)
            .option("fail_partition", "2")
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    assert glob.glob(os.path.join(out_dir, "part-*.jsonl")) == []


def test_mor_staging_idempotent(spark):
    """storage_merge_on_read must be invocation-idempotent: a second
    call reuses the staged table (marker file) and returns identical
    audits — re-staging on every call would rewrite the delta log the
    compaction op depends on mid-flight."""
    from database_scan_spark.operators.storage import storage_merge_on_read

    a = storage_merge_on_read(spark, SF_SMOKE).toPandas()
    b = storage_merge_on_read(spark, SF_SMOKE).toPandas()
    assert a.sort_values("layer").to_dict("records") == b.sort_values(
        "layer"
    ).to_dict("records")


def test_mor_compact_preserves_merged_view(spark):
    """Compaction must be an equivalence transform: the compacted
    base's audit row equals the live merged view's, column for
    column."""
    from database_scan_spark.operators.storage import storage_mor_compact

    pdf = storage_mor_compact(spark, SF_SMOKE).toPandas().set_index("layer")
    for col in ("n_rows", "sum_price", "key_checksum"):
        assert pdf.loc["compacted", col] == pdf.loc["merged", col]


def test_csv_corrupt_recovery_restages_cleanly(spark):
    """A second invocation must read the already-staged CSV (marker)
    and corrupt-row counts must be stable."""
    from database_scan_spark.operators.sources_sinks import (
        src_csv_corrupt_recovery,
    )

    a = src_csv_corrupt_recovery(spark, SF_SMOKE).toPandas()
    b = src_csv_corrupt_recovery(spark, SF_SMOKE).toPandas()
    assert a["_corrupt"].notna().sum() == b["_corrupt"].notna().sum() == 8
    assert len(a) == len(b) == 25


def test_session_global_state_does_not_bleed(spark):
    """The three session-global binding mechanisms — param_bind's temp
    view, fn_sql_udf's SQL UDF, and param_execute_immediate's session
    variable — must interleave in ONE session without corrupting each
    other, and each must be idempotent on re-run."""
    from database_scan_spark.registry import SPECS

    specs = {sp.name: sp for sp in SPECS}
    first = {}
    order = ["param_bind", "fn_sql_udf", "param_execute_immediate"]
    for name in order:
        first[name] = specs[name].fn(spark, SF_SMOKE).toPandas()
    # re-run in reverse order: every result identical to its first run
    for name in reversed(order):
        again = specs[name].fn(spark, SF_SMOKE).toPandas()
        assert again.equals(first[name]), name
