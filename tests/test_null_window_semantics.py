"""NULL-path semantics for the sharded (two-pass) running sum.

The driver fixtures carry no NULL ``events.value``, so the oracle gate
never exercises the NULL branch of ``win_running_sum_sharded``'s
chunk-recombination. ADVICE r9 flagged exactly that latent divergence:
an all-NULL within-chunk prefix made ``chunk_offset + NULL`` NULL,
erasing prior chunks' totals, where SQL's running SUM is NULL only
while the whole frame (across chunks) has seen zero non-NULL values.
This test pins the fixed semantics on a hand-built NULL-bearing
events table, hash-compared against DuckDB running the registered
oracle on the same parquet.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest


def _events_with_nulls(tmpdir: str) -> str:
    """Write an events.parquet whose value column exercises every NULL
    shape the recombination must handle:

    user 1: day-1 all NULL, day-2 starts NULL then real values
            (leading NULL span must stay NULL across a chunk boundary,
            then start at the first non-NULL — not at 0).
    user 2: day-1 real values, day-2 all-NULL prefix
            (the r9 bug: prior chunks' total must carry, not go NULL).
    user 3: every value NULL (whole timeline stays NULL).
    user 4: no NULLs (control — identical to the plain path).
    """
    day1 = dt.datetime(2024, 3, 1)
    day2 = dt.datetime(2024, 3, 2)
    rows = [
        # (event_id, ts, user_id, value)
        (1, day1, 1, None),
        (2, day1 + dt.timedelta(hours=1), 1, None),
        (3, day2, 1, None),
        (4, day2 + dt.timedelta(hours=1), 1, 5.0),
        (5, day2 + dt.timedelta(hours=2), 1, 2.5),
        (6, day1, 2, 10.0),
        (7, day1 + dt.timedelta(hours=3), 2, 1.25),
        (8, day2, 2, None),
        (9, day2 + dt.timedelta(hours=1), 2, None),
        (10, day2 + dt.timedelta(hours=2), 2, 4.0),
        (11, day1, 3, None),
        (12, day2, 3, None),
        (13, day1, 4, 7.0),
        (14, day2, 4, 3.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "value"]
    ).assign(event_type="t", props="{}")
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    path = os.path.join(tmpdir, "events.parquet")
    pdf.to_parquet(path, index=False)
    return path


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("null_events_sf"))
    _events_with_nulls(d)
    return d


def test_sharded_running_sum_null_exact(spark, null_sf_dir):
    from database_scan_spark.operators.windows import (
        WIN_RUNNING_SUM_SHARDED_ORACLE,
        win_running_sum_sharded,
    )
    from database_scan_spark.testing import assert_match

    spdf = win_running_sum_sharded(spark, null_sf_dir).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{os.path.join(null_sf_dir, 'events.parquet')}')"
        )
        oracle = con.execute(WIN_RUNNING_SUM_SHARDED_ORACLE).df()
    finally:
        con.close()
    assert_match(spdf, oracle, "win_running_sum_sharded[null fixture]")

    # Spot-pin the three decisive cells so a future oracle change
    # can't silently relax them.
    got = {
        int(r.event_id): (None if pd.isna(r.running_value) else float(r.running_value))
        for r in spdf.itertuples()
    }
    assert got[3] is None, "leading all-NULL span must stay NULL across chunks"
    assert got[4] == 5.0, "first non-NULL starts the sum, not 0"
    assert got[9] == 11.25, "NULL prefix in a later chunk must carry prior total"
    assert got[12] is None, "an all-NULL user never leaves NULL"
