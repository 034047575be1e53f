"""Schema registry + snapshot-table catalog.

The reference's "catalog" is a 1,580-line GraphQL SDL file
(``/root/reference/opentargets.schema``) describing strongly-typed
remote entity/edge tables; its scripts consume them schema-on-read
(SURVEY.md §1.2). Here the catalog is explicit ``StructType``
constants over the fixture star schema, and tables are snapshot
parquet — exactly the shape the reference's own CSV-resume mode
materializes (``/root/reference/x2.2.py:249-256``).

Scale notes:

- Schemas are declared, not inferred: at 100 TB an inferSchema pass
  is a full extra scan.
- ``load`` is a plain ``spark.read.parquet`` so Catalyst keeps
  predicate pushdown / column pruning / partition pruning.
- Entity-graph mapping (SURVEY §7.0): customer≈disease, part≈drug,
  supplier≈target, orders+lineitem≈scored association edges,
  nation/region≈ontology dims, events≈activity stream,
  documents/embeddings≈LLM-pipeline columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_DIMS = {"region", "nation", "supplier"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one snapshot table. Plain parquet read → pushdown-friendly.

    ``events.ts`` has shipped as TIMESTAMP(NANOS) in some fixture
    generations (which Spark's vectorized reader only surfaces as a
    raw long via ``nanosAsLong``) and as TIMESTAMP(MICROS) in others
    (surfaced as TIMESTAMP_NTZ). Normalize both to a session-zone
    microsecond TimestampType so every downstream time computation —
    and the timezone-less DuckDB oracle — sees the same wall-clock
    values.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
    # Fixture timestamps are naive wall-clock values; every time
    # computation (date_trunc, window(), session_window) must agree
    # with the timezone-less oracle, so pin the session to UTC — a
    # runtime conf the engine may set even on a caller-owned session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Let AQE coalesce/re-plan persisted intermediates (off by
    # default). The engine's own session sets this too, but operators
    # also run inside CALLER-owned vanilla sessions (the driver
    # contract), where a pinned pre-AQE cache partitioning makes every
    # cached stage run shuffle.partitions tasks and blocks codegen
    # fusion around InMemoryTableScans — measured 30x on a cached
    # multi-consumer self-join (analytic_market_basket, sf0.01:
    # 26-37 s pinned vs 0.7-3.3 s with this conf). Runtime-settable,
    # plan-shape only; results are unaffected.
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F  # noqa: PLC0415

        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # nanos fixture: micro-precision data, so div 1000 is lossless
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        # micros fixture: arrives as TIMESTAMP_NTZ; same wall-clock under UTC
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view (``spark.sql`` access),
    mirroring the DuckDB oracle's pre-registered views."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
