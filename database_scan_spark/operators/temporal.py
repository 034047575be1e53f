"""Temporal joins — as-of and range joins, the classic operators
vanilla Spark SQL lacks (SURVEY §2.5 'absent' row names them
explicitly). Both are implemented as compositions of existing
DataFrame ops with linear cost — no inequality-join blowup — and
both are oracle-checked against DuckDB's native implementations
(ASOF JOIN / optimized range join), which is exactly the kind of
independent check a hand-rolled operator needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..spec import QuerySpec


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event picks the latest order of its user with
    o_orderdate <= ts.

    Implementation is the scalable union+window trick: tag both
    streams, union them, sort within each key by (time, tag), and
    carry the most recent order attributes forward with
    last(ignorenulls) — ONE shuffle on the key, linear in rows,
    versus the naive inequality join's per-key cross product. Orders
    are first deduped to one per (custkey, orderdate) — max orderkey
    — because "the" as-of row must be unique for determinism
    (SURVEY §1.4 discipline).
    """
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    orders_d = (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("is_event"),
            "o_orderkey",
            "o_totalprice",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
        "value",
    )
    # order rows sort before event rows at equal time (asof uses <=)
    w = Window.partitionBy("key").orderBy(
        "t", "is_event", F.coalesce("event_id", F.lit(-1))
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = orders_d.unionByName(events).select(
        "key",
        "t",
        "is_event",
        "event_id",
        "value",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return (
        merged.filter((F.col("is_event") == 1) & F.col("asof_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("t").alias("ts"),
            "value",
            "asof_orderkey",
            "asof_totalprice",
        )
    )


JOIN_ASOF_ORACLE = """
WITH orders_d AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                               ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, e.ts, e.value,
       o.o_orderkey AS asof_orderkey,
       o.o_totalprice AS asof_totalprice
FROM events e
ASOF JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: pairs of same-user events within
    60 seconds of each other.

    Implementation is the banded range join: bucket time into
    60-second bands, explode ONE side to its neighbor bands, equi-join
    on (user, band), then apply the exact |Δt| predicate. Candidates
    per pair are generated exactly once (the exploded side covers
    band±1; the plain side has one band), so no dedup pass is needed.
    Cost is linear in band occupancy instead of the quadratic per-key
    cross product a raw inequality join plans as. DuckDB's optimized
    inequality join is the oracle.
    """
    band_us = 60 * 1_000_000
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    a = ev.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("t_us").alias("t_a"),
        F.explode(
            F.array(
                (F.floor(F.col("t_us") / band_us) - 1).cast("long"),
                F.floor(F.col("t_us") / band_us).cast("long"),
                (F.floor(F.col("t_us") / band_us) + 1).cast("long"),
            )
        ).alias("band"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("t_us").alias("t_b"),
        F.floor(F.col("t_us") / band_us).cast("long").alias("band"),
    )
    return (
        a.join(b, ["user_id", "band"])
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= band_us)
        )
        .select(
            "user_id",
            "event_a",
            "event_b",
            (F.abs(F.col("t_a") - F.col("t_b")) / 1_000_000.0).alias("gap_seconds"),
        )
    )


JOIN_RANGE_EVENTS_ORACLE = """
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       abs(epoch_us(a.ts) - epoch_us(b.ts)) / 1000000.0 AS gap_seconds
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60 * 1000000
"""


SPECS = [
    QuerySpec(
        "join_asof",
        join_asof,
        JOIN_ASOF_ORACLE,
        doc="as-of join via union+window (vs DuckDB native ASOF JOIN)",
        tags=("temporal",),
    ),
    QuerySpec(
        "join_range_events",
        join_range_events,
        JOIN_RANGE_EVENTS_ORACLE,
        doc="banded range self-join (vs DuckDB inequality join)",
        tags=("temporal",),
    ),
]
