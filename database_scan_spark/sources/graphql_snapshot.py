"""Custom batch source via the Spark 4 Python DataSource API —
the connector shape SURVEY §2.1 prescribes for the reference's
GraphQL scan (`src_graphql_post`: "custom batch source … or Spark 4
Python DataSource API").

The reference fetches pages over HTTP (`requests.post` at
`/root/reference/query_opentargets.py:13`) and decodes JSON rows.
This source reads the same *shape* — a directory of JSON-lines
"response pages", one file per partition — through a first-class
DataSource: partition planning on the driver, per-partition readers
on executors, schema declared up front.

LIVE MODE (VERDICT r6 item 7): ``.option("mode", "live")`` swaps the
page-directory read for real HTTP POSTs — the reference's
``requests.post`` loop (`query_opentargets.py:13-16`) with its 1 rps
pacing (`x2.2.py:296-299`) as a token-bucket sleep between pages.
A cursor/offset-paged API cannot be fetched in parallel (page i+1's
cursor comes from page i, and the rate limit is API-global), so live
mode plans ONE serial partition — exactly the reference's loop shape;
the parallel path is the snapshot layout. Options:

- ``endpoint``   POST URL (required in live mode)
- ``query``      GraphQL document sent as ``{"query", "variables"}``
- ``page_size``  rows per page (default 100) — variables are
                 ``{"index": i, "size": page_size}``
- ``max_pages``  hard page cap (default 1000)
- ``rate_per_sec`` token-bucket rate (default 1.0, the reference's)
- ``rows_path``  dotted path to the row list inside the response
                 JSON (default ``data.rows``; OpenTargets-style
                 nesting like ``data.target.associatedDiseases.rows``
                 works)

Implemented on stdlib ``urllib.request`` so the connector has no
dependency the engine doesn't already carry. Tested against a
loopback HTTP server in tests/test_live_connectors.py.

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

    class _LiveCrawl(InputPartition):
        """The whole live crawl as ONE partition: cursor-paged APIs
        serialize page i+1 behind page i and the rate limit is
        API-global, so there is nothing to parallelize."""

        def __init__(self):
            super().__init__(value=None)

    class _SnapshotReader(DataSourceReader):
        def __init__(self, schema, options: dict):
            self.schema = schema
            self.mode = options.get("mode", "snapshot")
            self.path = options.get("path")
            self.endpoint = options.get("endpoint")
            self.query = options.get("query", "")
            self.page_size = int(options.get("page_size", "100"))
            self.max_pages = int(options.get("max_pages", "1000"))
            self.rate_per_sec = float(options.get("rate_per_sec", "1.0"))
            self.rows_path = options.get("rows_path", "data.rows")
            if self.mode == "live":
                if not self.endpoint:
                    raise ValueError(
                        "graphql_snapshot mode=live requires option 'endpoint'"
                    )
            elif not self.path:
                raise ValueError("graphql_snapshot requires option 'path'")

        def partitions(self):
            if self.mode == "live":
                return [_LiveCrawl()]
            # one "response page" file per partition — the layout a
            # live cursor-paged GraphQL crawl would produce
            files = sorted(
                glob.glob(os.path.join(self.path, "page=*", "part-*"))
                + glob.glob(os.path.join(self.path, "page-*.jsonl"))
            )
            return [_PagePartition(p) for p in files]

        def read(self, partition):
            field_names = [f.name for f in self.schema.fields]
            if isinstance(partition, _LiveCrawl):
                yield from self._read_live(field_names)
                return
            with open(partition.path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    yield tuple(rec.get(k) for k in field_names)

        def _read_live(self, field_names):
            """The reference loop: POST page, pace, repeat until an
            empty page (query_opentargets.py:13-16; pacing
            x2.2.py:296-299 — a token-bucket sleep, so a slow API
            response already 'spends' the token)."""
            import time  # noqa: PLC0415
            import urllib.request  # noqa: PLC0415

            interval = 1.0 / self.rate_per_sec
            last = float("-inf")
            for page in range(self.max_pages):
                wait = interval - (time.monotonic() - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                body = json.dumps(
                    {
                        "query": self.query,
                        "variables": {"index": page, "size": self.page_size},
                    }
                ).encode()
                req = urllib.request.Request(
                    self.endpoint,
                    data=body,
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=60) as resp:
                    payload = json.loads(resp.read())
                rows = payload
                for key in self.rows_path.split("."):
                    rows = (rows or {}).get(key)
                if not rows:
                    return
                for rec in rows:
                    yield tuple(rec.get(k) for k in field_names)
                if len(rows) < self.page_size:
                    return

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
