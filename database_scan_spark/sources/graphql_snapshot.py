"""Custom batch source via the Spark 4 Python DataSource API —
the connector shape SURVEY §2.1 prescribes for the reference's
GraphQL scan (`src_graphql_post`: "custom batch source … or Spark 4
Python DataSource API").

The reference fetches pages over HTTP (`requests.post` at
`/root/reference/query_opentargets.py:13`) and decodes JSON rows.
This source reads the same *shape* — a directory of JSON-lines
"response pages", one file per partition — through a first-class
DataSource: partition planning on the driver, per-partition readers
on executors, schema declared up front. Swapping the file read for
an HTTP POST (plus the token bucket from ``wf_rate_limit``) turns it
into the live connector without touching query code.

The DataSource classes are built inside ``make_datasource()`` so
cloudpickle serializes them BY VALUE: a registered module-level class
pickles by reference, and Spark's Python workers (whose sys.path the
driver controls, not us) cannot import this package.
"""

from __future__ import annotations

import os


def make_datasource():
    """Return the GraphQLSnapshot DataSource class, closure-defined so
    registration ships the code itself to workers."""
    import glob  # noqa: PLC0415
    import json  # noqa: PLC0415

    from pyspark.sql.datasource import (  # noqa: PLC0415
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _PagePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _SnapshotReader(DataSourceReader):
        def __init__(self, schema, options: dict):
            self.schema = schema
            self.path = options.get("path")
            if not self.path:
                raise ValueError("graphql_snapshot requires option 'path'")

        def partitions(self):
            # one "response page" file per partition — the layout a
            # live cursor-paged GraphQL crawl would produce
            files = sorted(
                glob.glob(os.path.join(self.path, "page=*", "part-*"))
                + glob.glob(os.path.join(self.path, "page-*.jsonl"))
            )
            return [_PagePartition(p) for p in files]

        def read(self, partition):
            field_names = [f.name for f in self.schema.fields]
            with open(partition.path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    yield tuple(rec.get(k) for k in field_names)

    class GraphQLSnapshotDataSource(DataSource):
        """``spark.read.format("graphql_snapshot").option("path", d)``:
        each response-page file is one partition of decoded rows."""

        @classmethod
        def name(cls) -> str:
            return "graphql_snapshot"

        def schema(self) -> str:
            return "entity_id bigint, edge_id bigint, score double"

        def reader(self, schema):
            return _SnapshotReader(schema, self.options)

    return GraphQLSnapshotDataSource


def materialize_pages(spark, sf_dir: str, out_dir: str, n_pages: int = 4) -> None:
    """Produce the JSON-lines 'response pages' this source reads, from
    the orders edge table (what a cursor-paged GraphQL crawl of the
    snapshot would have written). Deterministic page assignment by
    key mod; written distributed (partitionBy), no driver collect."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return
    from pyspark.sql import functions as F  # noqa: PLC0415

    (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_custkey") < 50)
        .select(
            F.col("o_custkey").alias("entity_id"),
            F.col("o_orderkey").alias("edge_id"),
            F.col("o_totalprice").alias("score"),
            (F.col("o_orderkey") % n_pages).alias("page"),
        )
        .repartition("page")
        .write.mode("overwrite")
        .partitionBy("page")
        .json(out_dir)
    )
