"""Unit tests for tools/gen_scale_fixture.py — the 10x fixture behind
SCALE.md's empirical scaling exponents. If the generator silently broke
shard disjointness or FK consistency, the exponents would measure a
different workload (e.g. joins fanning out across shards), so the
fixture's structural contract is pinned here on a tiny 2x build from
the sf0.001 source."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scalefix") / "x2")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "gen_scale_fixture.py"),
            "--src", SRC, "--out", out, "--copies", "2",
        ],
        check=True,
        capture_output=True,
    )
    return out


def _con():
    return duckdb.connect()


def test_schema_and_rowcounts(fixture_dir):
    con = _con()
    for t in ("region", "nation"):  # fixed dims: unchanged
        a = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        b = con.execute(
            f"SELECT count(*) FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert a == b
    for t in (
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    ):
        a = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        b = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchall()
        assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], t
        na = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        nb = con.execute(
            f"SELECT count(*) FROM read_parquet('{fixture_dir}/{t}.parquet')"
        ).fetchone()[0]
        assert nb == 2 * na, t


def test_shard_zero_is_source_byte_for_byte(fixture_dir):
    con = _con()
    for t, key in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ):
        mx = con.execute(
            f"SELECT max({key}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        diff = con.execute(
            f"""SELECT count(*) FROM (
                SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')
                WHERE {key} <= {mx}
                EXCEPT
                SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"""
        ).fetchone()[0]
        assert diff == 0, f"{t}: shard 0 diverged from the source"


def test_foreign_keys_stay_shard_local(fixture_dir):
    """Every lineitem/orders FK must resolve — and resolve within its
    own shard's key range, or join fan-out would differ from real data
    growth."""
    con = _con()
    for fk, dim, pk in (
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
        ("l_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ):
        fact = "lineitem" if fk.startswith("l_") else "orders"
        dangling = con.execute(
            f"""SELECT count(*) FROM
                read_parquet('{fixture_dir}/{fact}.parquet') f
                LEFT JOIN read_parquet('{fixture_dir}/{dim}.parquet') d
                ON f.{fk} = d.{pk} WHERE d.{pk} IS NULL"""
        ).fetchone()[0]
        assert dangling == 0, f"{fk}: dangling FKs in scaled fixture"
        # shard-local: fact shard (key div stride) == dim shard
        stride = con.execute(
            f"SELECT max({pk}) + 1 FROM read_parquet('{SRC}/{dim}.parquet')"
        ).fetchone()[0]
        fact_stride = con.execute(
            f"SELECT max(o_orderkey) + 1 FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0]
        if fact == "lineitem":
            cross = con.execute(
                f"""SELECT count(*) FROM
                    read_parquet('{fixture_dir}/{fact}.parquet')
                    WHERE ({fk} // {stride}) != (l_orderkey // {fact_stride})"""
            ).fetchone()[0]
            assert cross == 0, f"{fk}: FK crosses shard boundary"


def test_perturbation_not_degenerate(fixture_dir):
    """Shard 1 documents must be mostly NOT exact clones of shard 0
    (else near-dup families measure a degenerate 2x-twin corpus), yet
    remain same-length-order perturbations (token swaps, not garbage).
    Embeddings likewise: perturbed, but within the noise envelope."""
    con = _con()
    n, clones = con.execute(
        f"""SELECT count(*),
               sum(CASE WHEN a.text = b.text THEN 1 ELSE 0 END)
            FROM read_parquet('{fixture_dir}/documents.parquet') a
            JOIN read_parquet('{fixture_dir}/documents.parquet') b
              ON b.doc_id = a.doc_id + (
                 SELECT max(doc_id) + 1
                 FROM read_parquet('{SRC}/documents.parquet'))
            WHERE a.doc_id <= (
                 SELECT max(doc_id)
                 FROM read_parquet('{SRC}/documents.parquet'))"""
    ).fetchone()
    assert n > 0 and clones / n < 0.5, "shard 1 is mostly exact clones"
    bad = con.execute(
        f"""SELECT count(*) FROM (
            SELECT a.embedding AS ea, b.embedding AS eb
            FROM read_parquet('{fixture_dir}/embeddings.parquet') a
            JOIN read_parquet('{fixture_dir}/embeddings.parquet') b
              ON b.vec_id = a.vec_id + (
                 SELECT max(vec_id) + 1
                 FROM read_parquet('{SRC}/embeddings.parquet'))
            WHERE a.vec_id <= (
                 SELECT max(vec_id)
                 FROM read_parquet('{SRC}/embeddings.parquet')))
            WHERE ea = eb
               OR len(list_filter(list_zip(ea, eb),
                      p -> abs(p[1] - p[2]) > 0.051)) > 0"""
    ).fetchone()[0]
    assert bad == 0, "embedding noise outside the +/-0.05 envelope or absent"


def test_n_chars_matches_rewritten_text(fixture_dir):
    con = _con()
    bad = con.execute(
        f"""SELECT count(*)
            FROM read_parquet('{fixture_dir}/documents.parquet')
            WHERE n_chars != length(text)"""
    ).fetchone()[0]
    assert bad == 0
