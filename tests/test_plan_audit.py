"""Engine-wide plan audit: build the physical plan of EVERY registered
query and reject scale smells — the automated version of "explain and
iterate until it's the plan you'd want".

- BatchEvalPython = row-at-a-time Python UDF: forbidden everywhere
  (the engine's Python paths are Arrow-batched: ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas).
- CartesianProduct: forbidden except where the operator deliberately
  demonstrates a nested-loop shape.
"""

from __future__ import annotations

import pytest

from database_scan_spark.registry import SPECS

from conftest import SF_SMOKE

# operators whose *point* is a nested-loop / cross shape
CARTESIAN_OK = {"join_lookup_nested_loop"}

# streaming jobs materialize via their own harness; building their
# batch-reproduction plan still works, so no exclusions needed.
_ALL = [s for s in SPECS]


# --- unpartitioned-window gate (VERDICT r5 item 4) -------------------------
#
# The r5 hand audit classified every unpartitioned Window site as bounded
# by construction; this turns the audit into a permanent mechanical gate:
# a Window node with an EMPTY partition spec whose subtree reaches a
# fact-table scan without crossing an Aggregate or Limit is a single-task
# sort over unbounded input — rejected. Aggregate/Limit between the
# window and the scan is accepted as a bound (value-dictionary /
# calendar / bucket relations); the residual data-dependent-cardinality
# class was retrofitted onto global_order in r5/r6 and is separately
# pinned by test_scale_posture.test_no_raw_entity_unpartitioned_windows.

# Column names that mark a leaf as a FACT (corpus/fact-scaled) relation.
# nation (n_) / region (r_) are fixed-cardinality dims; everything else
# in the fixture star scales with SF. Staged scratch relations re-expose
# these names, so derived parquet reads classify correctly too.
_FACT_MARKERS = frozenset(
    ["l_orderkey", "o_orderkey", "event_id", "doc_id", "vec_id",
     "c_custkey", "s_suppkey", "p_partkey"]
)

# Logical nodes that bound the cardinality of everything above them.
_BOUNDING = frozenset(["Aggregate", "GlobalLimit", "LocalLimit"])

# Specs with a KNOWN-BOUNDED unpartitioned window the mechanical rule
# cannot see (each with the structural reason). Keep this list justified
# or empty — a new entry needs the same hand proof the r5 audit used.
_UNPARTITIONED_WINDOW_OK: dict[str, str] = {}


def _children(node):
    ch = node.children()
    for i in range(ch.size()):
        yield ch.apply(i)


def _reaches_fact_unbounded(node) -> bool:
    """True if a fact-table leaf is reachable from ``node`` without
    crossing a bounding (Aggregate/Limit) node."""
    name = node.getClass().getSimpleName()
    if name in _BOUNDING:
        return False
    if not node.children().isEmpty():
        return any(_reaches_fact_unbounded(c) for c in _children(node))
    # leaf: LocalRelation (in-memory battery) / Range are bounded;
    # a file relation is a fact iff it exposes a fact marker column
    out = node.output()
    cols = {out.apply(i).name() for i in range(out.size())}
    return name == "LogicalRelation" and bool(cols & _FACT_MARKERS)


def _unpartitioned_fact_windows(node, hits: list) -> None:
    name = node.getClass().getSimpleName()
    if name == "Window" and node.partitionSpec().isEmpty():
        if any(_reaches_fact_unbounded(c) for c in _children(node)):
            hits.append(node.simpleString(200))
    for c in _children(node):
        _unpartitioned_fact_windows(c, hits)
    try:  # windows inside subquery plans count too
        sq = node.subqueries()
        for i in range(sq.size()):
            _unpartitioned_fact_windows(sq.apply(i), hits)
    except Exception:  # noqa: BLE001 - subqueries() absent on some nodes
        pass


@pytest.mark.parametrize("spec", _ALL, ids=[s.name for s in _ALL])
def test_no_plan_smells(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    assert "BatchEvalPython" not in plan, f"{spec.name}: row-at-a-time Python UDF"
    if spec.name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{spec.name}: cartesian product"
    if spec.name not in _UNPARTITIONED_WINDOW_OK:
        hits: list = []
        _unpartitioned_fact_windows(df._jdf.queryExecution().optimizedPlan(), hits)
        assert not hits, (
            f"{spec.name}: unpartitioned Window over an unbounded "
            f"fact-table subtree (single-task sort at scale): {hits}"
        )


def test_unpartitioned_window_gate_catches_bad_plan(spark):
    """Gate self-test (non-vacuousness): an unpartitioned window keyed
    directly on a fact column MUST be flagged, and the same window
    above an Aggregate (bounded dictionary) must NOT be."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_scan_spark.catalog import load

    ev = load(spark, SF_SMOKE, "events")
    bad = ev.withColumn(
        "rk", F.row_number().over(Window.orderBy("event_id"))
    )
    hits: list = []
    _unpartitioned_fact_windows(bad._jdf.queryExecution().optimizedPlan(), hits)
    assert hits, "gate missed a raw unpartitioned window over the fact"

    ok = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(Window.orderBy("event_type")))
    )
    hits2: list = []
    _unpartitioned_fact_windows(ok._jdf.queryExecution().optimizedPlan(), hits2)
    assert not hits2, f"gate flagged a bounded post-aggregate window: {hits2}"
