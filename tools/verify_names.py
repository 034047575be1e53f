#!/usr/bin/env python
"""Verify named queries against their DuckDB oracles through the
driver contract — the per-change re-verification loop of the
optimization round.

    python tools/verify_names.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from database_scan_spark.testing import assert_match, run_oracle
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from verify_scale import materialize_ctes

    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    for name in args.names:
        t0 = time.perf_counter()
        try:
            got = qs[name](spark, args.sf).toPandas()
            want = run_oracle(materialize_ctes(oracles[name]), args.sf)
            assert_match(got, want, name)
            print(f"  OK {name} ({len(got)} rows, {time.perf_counter()-t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {str(exc)[:400]}")
    print(f"{len(args.names) - len(fails)}/{len(args.names)} green; fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
