"""Unit tests for tools/gen_skew_fixture.py — the hot-key fixture
behind SCALE.md's skew rehearsal. The rehearsal's claim ("answers and
runtimes survive a dominant key") is only as good as the fixture's
contract: equal volume, identical schemas, one hot PRE-EXISTING key
per fact table carrying ~40% of rows, every other byte unchanged, and
FKs still resolving. Pinned here on a tiny build from sf0.001."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

SKEWED = {
    "events": ("user_id", "event_id"),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_custkey", "o_orderkey"),
}
UNTOUCHED = (
    "region", "nation", "customer", "supplier", "part",
    "documents", "embeddings",
)


def _build(tmp_path_factory, tag: str) -> str:
    out = str(tmp_path_factory.mktemp("skewfix") / tag)
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "gen_skew_fixture.py"),
            "--src", SRC, "--out", out,
        ],
        check=True,
        capture_output=True,
    )
    return out


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return _build(tmp_path_factory, "a")


def _con():
    return duckdb.connect()


def test_equal_volume_and_schema(fixture_dir):
    con = _con()
    for t in tuple(SKEWED) + UNTOUCHED:
        a = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        b = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchall()
        assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], t
        na, nb = (
            con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')"
            ).fetchone()[0]
            for d in (SRC, fixture_dir)
        )
        assert na == nb, f"{t}: row count changed"


def test_untouched_tables_identical(fixture_dir):
    con = _con()
    for t in UNTOUCHED:
        diff = con.execute(
            f"""SELECT count(*) FROM (
                SELECT * FROM read_parquet('{SRC}/{t}.parquet')
                EXCEPT ALL
                SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet'))"""
        ).fetchone()[0]
        assert diff == 0, f"{t}: modified but not in the skew plan"


def test_hot_key_dominates_and_preexists(fixture_dir):
    con = _con()
    for t, (col, _) in SKEWED.items():
        hot, frac = con.execute(
            f"""SELECT {col}, count(*) * 1.0 / (
                    SELECT count(*)
                    FROM read_parquet('{fixture_dir}/{t}.parquet'))
                FROM read_parquet('{fixture_dir}/{t}.parquet')
                GROUP BY 1 ORDER BY 2 DESC LIMIT 1"""
        ).fetchone()
        # modal key of the source plus the 40% remap; the modal key's own
        # original share pushes it slightly above 0.40
        assert 0.38 <= frac <= 0.60, f"{t}: hot share {frac}"
        exists = con.execute(
            f"""SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')
                WHERE {col} = ?""",
            [hot],
        ).fetchone()[0]
        assert exists > 0, f"{t}: hot key {hot} not in the source domain"


def test_other_columns_unchanged(fixture_dir):
    """Only the skewed column may differ; every other column must match
    the source row-for-row (joined on a row identity)."""
    con = _con()
    checks = {
        # table: (row identity cols, untouched col sample)
        "events": ("event_id", ("ts", "event_type", "value", "props")),
        "orders": ("o_orderkey", ("o_orderstatus", "o_totalprice",
                                  "o_orderdate", "o_orderpriority")),
    }
    for t, (pk, cols) in checks.items():
        clauses = " OR ".join(
            f"a.{c} IS DISTINCT FROM b.{c}" for c in cols
        )
        bad = con.execute(
            f"""SELECT count(*)
                FROM read_parquet('{SRC}/{t}.parquet') a
                JOIN read_parquet('{fixture_dir}/{t}.parquet') b
                USING ({pk}) WHERE {clauses}"""
        ).fetchone()[0]
        assert bad == 0, f"{t}: non-skew columns drifted"


def test_foreign_keys_still_resolve(fixture_dir):
    con = _con()
    for fact, fk, dim, pk in (
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ):
        dangling = con.execute(
            f"""SELECT count(*)
                FROM read_parquet('{fixture_dir}/{fact}.parquet') f
                LEFT JOIN read_parquet('{fixture_dir}/{dim}.parquet') d
                ON f.{fk} = d.{pk} WHERE d.{pk} IS NULL"""
        ).fetchone()[0]
        assert dangling == 0, f"{fk}: dangling after skew remap"


def test_deterministic(fixture_dir, tmp_path_factory):
    other = _build(tmp_path_factory, "b")
    con = _con()
    for t in SKEWED:
        diff = con.execute(
            f"""SELECT count(*) FROM (
                SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')
                EXCEPT ALL
                SELECT * FROM read_parquet('{other}/{t}.parquet'))"""
        ).fetchone()[0]
        assert diff == 0, f"{t}: two builds differ (non-deterministic)"
