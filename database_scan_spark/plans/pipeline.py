"""Workflow operators — SURVEY.md §2.11: staged checkpoint/resume.

The reference persists every pipeline stage to CSV and can resume
from disk instead of recrawling (`load_from_files=True` —
`/root/reference/x2.2.py:249-256,341-406`). Spark-first: each stage
is written once as parquet into a deterministic stage directory; a
resumed run re-reads the checkpoint instead of recomputing the
lineage. (Intra-job, `df.persist()`/`checkpoint()` fill the same
role; the on-disk form is what survives process death — the crash
recovery a 100 TB crawl actually needs.)

The reference's known-broken resume artifacts (`candidate_drug_set`
"don't use it", pandas index-column leak — `x2.2.py:265,310-312`)
are deliberately NOT replicated (SURVEY §7.3 #4): parquet is typed
and index-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators._helpers import workdir
from ..spec import QuerySpec

SEED_SEGMENT = "MACHINERY"


def _stage(
    spark: SparkSession, wd: str, name: str, build, resume: bool
) -> DataFrame:
    """Write-once stage checkpoint: build + persist on first run,
    re-read on resume."""
    path = os.path.join(wd, name)
    marker = os.path.join(path, "_SUCCESS")
    if not (resume and os.path.exists(marker)):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_pipeline(spark: SparkSession, sf_dir: str, resume: bool = False) -> DataFrame:
    """Three checkpointed hops mirroring §3.2 Mode A/B: seed scan →
    per-seed order edges → supplier aggregation; the final report
    joins checkpointed stages like x2.2.py:330-338's resume-mode
    merge."""
    wd = workdir(sf_dir, "wf_pipeline")

    def seed():
        return (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == SEED_SEGMENT)
            .select("c_custkey", "c_nationkey")
        )

    seed_df = _stage(spark, wd, "stage1_seed", seed, resume)

    def edges():
        orders = load(spark, sf_dir, "orders")
        return seed_df.join(orders, seed_df.c_custkey == orders.o_custkey).select(
            "c_custkey", "o_orderkey", "o_totalprice"
        )

    edges_df = _stage(spark, wd, "stage2_edges", edges, resume)

    def supplier_rollup():
        li = load(spark, sf_dir, "lineitem")
        return (
            edges_df.join(li, edges_df.o_orderkey == li.l_orderkey)
            .groupBy("l_suppkey")
            .agg(
                F.countDistinct("c_custkey").alias("n_customers"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
        )

    rollup_df = _stage(spark, wd, "stage3_supplier_rollup", supplier_rollup, resume)

    supplier = load(spark, sf_dir, "supplier")
    return rollup_df.join(
        F.broadcast(supplier), rollup_df.l_suppkey == supplier.s_suppkey
    ).select("l_suppkey", "s_name", "n_customers", "revenue")


def wf_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the pipeline fresh (populating checkpoints), then run it
    again in resume mode — the returned plan reads ONLY checkpoints,
    proving the resume path end to end."""
    run_pipeline(spark, sf_dir, resume=False).write.format("noop").mode(
        "overwrite"
    ).save()
    return run_pipeline(spark, sf_dir, resume=True)


WF_CHECKPOINT_RESUME_ORACLE = f"""
SELECT l_suppkey, s_name,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE c_mktsegment = '{SEED_SEGMENT}'
GROUP BY l_suppkey, s_name
"""


SPECS = [
    QuerySpec(
        "wf_checkpoint_resume",
        wf_checkpoint_resume,
        WF_CHECKPOINT_RESUME_ORACLE,
        doc="staged parquet checkpoint + resume (x2.2.py Mode A/B analog)",
        tags=("workflow",),
    ),
]
