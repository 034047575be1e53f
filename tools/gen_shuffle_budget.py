#!/usr/bin/env python
"""Per-query shuffle-budget ratchet (round 7, fourth plan-audit class).

Every `groupBy`/`join`/`distinct`/`repartition` is a shuffle, and at
100 TB the shuffle count IS the cost model — so each registered
query's shuffle-Exchange count in its initial physical plan is frozen
here as a BUDGET. tests/test_plan_audit.py fails any query whose plan
grows a NEW shuffle (plan decay: an edit that re-partitions twice, a
lost broadcast, a dropped partitioning reuse). Broadcast exchanges are
deliberately NOT counted — replacing a shuffle join with a broadcast
join must never read as a regression.

    python tools/gen_shuffle_budget.py          # regenerate the budget
    python tools/gen_shuffle_budget.py --diff   # show changes vs file

Budgets are counted at the test fixture scale (sf0.001) on the
AQE-initial plan — deterministic for a given fixture (join strategy
choices depend only on static file-size stats), EXCEPT the
unrolled-fixpoint giants (1000+ exchanges) whose counts move ±8 with
async-unpersist timing of cached subtrees; the test grants plans over
100 exchanges 2% headroom for that. Lower a budget when an
optimization removes a shuffle; raising one requires the same hand
audit the broadcast ratchet demands (document why the extra exchange
is fundamental, not decay).
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "shuffle_budget.json")
SF = "/root/testdata/sf0.001"

# Shuffle exchanges only: "Exchange hashpartitioning(...)",
# "Exchange rangepartitioning(...)", "Exchange SinglePartition".
# BroadcastExchange / ReusedExchange deliberately unmatched.
SHUFFLE_RE = re.compile(
    r"(?<![A-Za-z])Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
)


def count_shuffles(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    return len(SHUFFLE_RE.findall(plan))


def main() -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from database_scan_spark.registry import SPECS

    budget: dict[str, int] = {}
    for s in SPECS:
        spark.catalog.clearCache()
        budget[s.name] = count_shuffles(s.fn(spark, SF))
    budget = dict(sorted(budget.items()))
    if "--diff" in sys.argv and os.path.exists(OUT):
        with open(OUT) as fh:
            old = json.load(fh)
        for k in sorted(set(old) | set(budget)):
            if old.get(k) != budget.get(k):
                print(f"{k}: {old.get(k)} -> {budget.get(k)}")
        return
    with open(OUT, "w") as fh:
        json.dump(budget, fh, indent=0, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(budget)} budgets, "
          f"total shuffles {sum(budget.values())}")


if __name__ == "__main__":
    main()
