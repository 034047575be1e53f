"""database_scan_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``brettin/Database-Scan`` (a scored-entity-graph traversal /
set-algebra dataflow, surveyed in SURVEY.md), plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming) the
reference's domain implies at 100 TB scale.

Design stance (SURVEY.md §7.0):

- Declarative DataFrame / SQL plans; Catalyst + AQE own physical
  strategy (predicate pushdown, column pruning, join selection).
- Entity/edge tables are snapshot parquet; hops are equi-joins.
- Order-dependent reference semantics (first-occurrence dedup,
  ``rows[0]`` picks) get explicit deterministic orderings.
- Python only at the edges: Arrow pandas UDFs, never row-at-a-time.
"""

__version__ = "0.1.0"
