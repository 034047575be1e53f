"""Local differential-oracle harness.

Mimics the driver's correctness gate (``__spark_entry__.py``
docstring): run the Spark DataFrame and the DuckDB oracle SQL on the
same parquet fixtures and compare row count + schema + an
order-insensitive canonical form of every value. Used by
``tests/test_parity.py`` so oracle drift is caught before the driver
runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from .catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Execute oracle SQL with every fixture table registered as a view."""
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    # numpy scalars -> python
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, int, bool)):
        return _canon_cell(item())
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Columns sorted by name; rows as canonical string tuples, sorted."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False))
    return cols, rows


def assert_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        assert sr == orow, (
            f"{name}: first differing canonical row #{i}:\n  spark ={sr}\n  oracle={orow}"
        )
