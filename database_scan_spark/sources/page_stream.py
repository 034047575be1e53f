"""Custom STREAMING source via the Spark 4 Python DataSource API
(`SimpleDataSourceStreamReader`) — the live-crawl shape of the
reference's cursor-paged GraphQL loop (`requests.post` + cursor at
`/root/reference/query_opentargets.py:13-16`,
`opentargets_client_api.py:138-292`) as a first-class Structured
Streaming source: each micro-batch consumes ONE response page, the
offset {"page": i} is the cursor, and replay after failure goes
through `readBetweenOffsets` (the exactly-once contract: committed
offset ranges must be re-readable).

Batch twin: `src_python_datasource` (operators/sources_sinks.py)
reads the same page layout through the batch DataSource API.

The class is built inside a factory so cloudpickle serializes it BY
VALUE — registered module-level classes pickle by reference, and
Spark's Python workers can't import this package (the driver's cwd
isn't guaranteed to be /root/repo). Same rule as
`sources/graphql_snapshot.py`.
"""

from __future__ import annotations


def make_page_stream_source():
    """Return the page_stream DataSource class (closure-defined so
    registration ships the code itself to workers)."""
    import glob  # noqa: PLC0415
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from pyspark.sql.datasource import (  # noqa: PLC0415
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _PageStreamReader(SimpleDataSourceStreamReader):
        """One response-page file per micro-batch; offset = page index.

        `read(start)` advances the cursor by exactly one page (a live
        connector would POST the next cursor here); `readBetweenOffsets`
        re-serves any committed range deterministically from the same
        files, which is what makes checkpoint recovery exactly-once.
        """

        def __init__(self, schema, options: dict):
            self.field_names = [f.name for f in schema.fields]
            self.path = options.get("path")
            if not self.path:
                raise ValueError("page_stream requires option 'path'")

        def _pages(self) -> list[str]:
            return sorted(
                glob.glob(os.path.join(self.path, "page=*", "part-*"))
            )

        def initialOffset(self) -> dict:
            return {"page": 0}

        def read(self, start: dict):
            pages = self._pages()
            i = start["page"]
            if i >= len(pages):
                return iter([]), start
            return iter(self._read_page(pages[i])), {"page": i + 1}

        def readBetweenOffsets(self, start: dict, end: dict):
            pages = self._pages()
            rows: list[tuple] = []
            for i in range(start["page"], min(end["page"], len(pages))):
                rows.extend(self._read_page(pages[i]))
            return iter(rows)

        def _read_page(self, path: str) -> list[tuple]:
            with open(path) as fh:
                return [
                    tuple(json.loads(line).get(k) for k in self.field_names)
                    for line in fh
                ]

    class PageStreamDataSource(DataSource):
        """``spark.readStream.format("page_stream").option("path", d)``:
        a directory of cursor-paged JSON-lines response pages served
        one page per micro-batch."""

        @classmethod
        def name(cls) -> str:
            return "page_stream"

        def schema(self) -> str:
            return "entity_id bigint, edge_id bigint, score double"

        def simpleStreamReader(self, schema):
            return _PageStreamReader(schema, self.options)

    return PageStreamDataSource
