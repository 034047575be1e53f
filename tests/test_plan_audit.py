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


@pytest.mark.parametrize("spec", _ALL, ids=[s.name for s in _ALL])
def test_no_plan_smells(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    assert "BatchEvalPython" not in plan, f"{spec.name}: row-at-a-time Python UDF"
    if spec.name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{spec.name}: cartesian product"
