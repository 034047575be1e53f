"""Connected-components clustering of near-duplicate pairs — the
iterative-algorithm capability (ROADMAP #3): true duplicate CLUSTERS
instead of pairwise drops, so a chain a~b~c collapses to one
survivor even when a~c was never directly detected.

Spark-first iterative shape: driver-controlled fixed-point loop of
min-label propagation (the alternating-star idea specialized to tiny
diameters), each iteration one join + one aggregate; convergence via
a `count` action on changed labels. Iteration count is bounded by
component diameter — near-dup clusters are shallow (pairs come from
a similarity threshold), so 2-4 iterations in practice. Each
iteration localCheckpoint-free: plans stay small because labels are
re-persisted per round.

The oracle is a DuckDB RECURSIVE CTE computing the transitive
closure and taking min reachable id per doc — an INDEPENDENT
derivation of the same fixed point, which is exactly what an
iterative job needs checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import JACCARD_THRESHOLD, dedup_ngram_jaccard
from ..spec import QuerySpec

MAX_ITERS = 20  # safety bound; diameter of near-dup clusters is tiny


def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every doc that appears in a verified
    near-dup pair; cluster_id = min doc_id in the connected component."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .dropDuplicates(["doc_id"])
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    changed = -1
    for _ in range(MAX_ITERS):
        # each node adopts min(own label, neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the count above materialized new_labels; the previous round's
        # cache is dead weight from here on
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # silent wrong answers are worse than failure: a component with
        # diameter > MAX_ITERS would keep non-minimal labels
        raise RuntimeError(
            f"connected components did not converge within {MAX_ITERS} "
            f"iterations ({changed} labels still changing) — raise MAX_ITERS"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


DEDUP_CLUSTER_CC_ORACLE = f"""
WITH RECURSIVE sh AS (
    SELECT doc_id,
           unnest(list_distinct([
               t[i] || ' ' || t[i+1] || ' ' || t[i+2]
               FOR i IN generate_series(1, greatest(len(t) - 2, 0))
           ])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS c
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(c * 1.0 / (sa.n + sb.n - c), 6) >= {JACCARD_THRESHOLD}
),
undirected AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
    SELECT a, a FROM undirected
    UNION
    SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
"""


SPECS = [
    QuerySpec(
        "dedup_cluster_cc",
        dedup_cluster_cc,
        DEDUP_CLUSTER_CC_ORACLE,
        doc="iterative connected components over near-dup pairs vs recursive-CTE oracle",
        tags=("llm", "dedup", "iterative"),
    ),
]
