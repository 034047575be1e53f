"""Unit tests for tools/verify_scale.py's CTE-materialization rewrite.

The 10x differential sweep rewrites oracle CTEs to AS MATERIALIZED
(DuckDB inlines multiply-referenced CTEs per reference — exponential
at 10x). The rewrite must hit every top-level CTE definition, leave
WINDOW clauses alone, and never change RESULTS — pinned here so a
regex regression can't silently turn the 10x correctness stamp into
a check of different SQL."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from verify_scale import materialize_ctes  # noqa: E402


def test_rewrites_every_cte_definition():
    sql = (
        "WITH a AS (\n  SELECT 1\n),\n"
        "b AS (\n  SELECT 2\n)\n"
        "SELECT * FROM a JOIN b ON true"
    )
    out = materialize_ctes(sql)
    assert out.count("AS MATERIALIZED (") == 2
    assert "WITH a AS MATERIALIZED (" in out


def test_recursive_keyword_preserved():
    out = materialize_ctes("WITH RECURSIVE t AS (\nSELECT 1)\nSELECT * FROM t")
    assert "WITH RECURSIVE t AS MATERIALIZED (" in out


def test_window_clauses_untouched():
    sql = (
        "WITH c AS (\n  SELECT 1 AS x\n)\n"
        "SELECT RANK() OVER w FROM c\n"
        "WINDOW w AS (PARTITION BY x ORDER BY x)"
    )
    out = materialize_ctes(sql)
    assert "WINDOW w AS (PARTITION BY x" in out
    assert out.count("AS MATERIALIZED (") == 1


def test_multiline_window_clause_second_definition_untouched():
    # ADVICE r9: a continuation window definition starts its own line
    # and must NOT be rewritten (that would be a syntax error).
    sql = (
        "WITH c AS (\n  SELECT 1 AS x\n)\n"
        "SELECT RANK() OVER w1, SUM(x) OVER w2 FROM c\n"
        "WINDOW w1 AS (PARTITION BY x ORDER BY x),\n"
        "       w2 AS (ORDER BY x ROWS BETWEEN 1 PRECEDING AND CURRENT ROW),\n"
        "       w3 AS (w1)"
    )
    out = materialize_ctes(sql)
    assert "w2 AS (ORDER BY x" in out
    assert "w3 AS (w1)" in out
    assert out.count("AS MATERIALIZED (") == 1


def test_inline_subqueries_untouched():
    # a parenthesized subquery on its own is not a CTE definition
    sql = "SELECT * FROM (\n  SELECT 1\n) t"
    assert materialize_ctes(sql) == sql


@pytest.mark.parametrize(
    "name", ["pipeline_corpus_prep", "dedup_minhash_lsh", "dedup_cluster_cc"]
)
def test_results_unchanged_at_fixture_scale(name):
    sys.path.insert(0, REPO)
    from database_scan_spark.registry import get
    from database_scan_spark.testing import canonicalize, run_oracle

    sf = "/root/testdata/sf0.001"
    oracle = get(name).oracle
    assert canonicalize(run_oracle(oracle, sf)) == canonicalize(
        run_oracle(materialize_ctes(oracle), sf)
    )
