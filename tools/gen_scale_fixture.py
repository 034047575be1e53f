#!/usr/bin/env python
"""Deterministic 10x scale-up of the sf0.1 fixture into an sf1-shaped
fixture for SCALE.md rehearsals (VERDICT r8 item 5).

NOT driver data — the driver's /root/testdata is read-only; this
writes to ``--out`` (default /tmp/testdata_sf1). Shard k in 0..9
remaps every key family into a disjoint range (foreign keys stay
consistent within a shard, so join selectivities are preserved) and
deterministically perturbs text and embeddings (DuckDB hash(), no
RNG) so dedup/similarity structure scales instead of collapsing into
exact 10x clones — 10x exact clones would make every near-dup family
degenerate (each doc would have 9 trivial twins) and overstate
candidate-pair growth.

Shard 0 is the original data byte-for-byte, so sf1 strictly contains
sf0.1: any query's sf1 result restricted to shard-0 keys equals its
sf0.1 result, which makes wall-time ratios interpretable as pure
data-volume scaling.

Fixed dimensions (region=5, nation=25) are copied unchanged — TPC-H
semantics: dimension cardinality does not grow with SF.

Usage:
    python tools/gen_scale_fixture.py               # 10x -> /tmp/testdata_sf1
    python tools/gen_scale_fixture.py --copies 4 --out /tmp/testdata_sf04
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"

# key column -> offset stride is (max+1) of the source column, so every
# shard's keys land in a disjoint range and FK joins stay shard-local.
KEYED_TABLES: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# which source table owns each key family (stride must be consistent
# across referencing tables: lineitem.l_partkey uses part's stride).
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--out", default="/tmp/testdata_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE shards AS SELECT unnest(range({args.copies})) AS k")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def emit(t: str, select_sql: str) -> None:
        out = f"{args.out}/{t}.parquet"
        con.execute(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")

    # fixed dimensions: copy unchanged
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    # key strides: (max+1) of the OWNING table's column, shared by every
    # referencing column so FK joins stay shard-local
    stride: dict[str, int] = {
        col: stride_of(con, args.src, owner, owner_col)
        for col, (owner, owner_col) in KEY_OWNER.items()
    }

    # relational tables: shift keys per shard, keep every value column
    # (price/date/segment distributions — and so filter selectivities —
    # are identical in every shard)
    for t, keys in KEYED_TABLES.items():
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()
        ]
        sel = ", ".join(
            f"({c} + k * {stride[c]})::BIGINT AS {c}" if c in keys else c
            for c in cols
        )
        emit(t, f"SELECT {sel} FROM {src(t)} CROSS JOIN shards")

    # documents: shift doc_id; shard k>0 rewrites ~15% of tokens to a
    # hash-chosen vocabulary token (position- and shard-seeded), so the
    # n-gram / minhash / simhash neighborhood structure of each shard is
    # a perturbed sibling of shard 0, not an exact clone.
    doc_stride = stride_of(con, args.src, "documents", "doc_id")
    emit(
        "documents",
        f"""
        WITH vocab AS (
            SELECT list(DISTINCT tok) AS v
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM {src("documents")})
        ),
        scaled AS (
            SELECT (doc_id + k * {doc_stride})::BIGINT AS doc_id,
                   CASE WHEN k = 0 THEN text ELSE
                       array_to_string(
                           list_transform(
                               string_split(text, ' '),
                               (tok, i) -> CASE
                                   WHEN hash(doc_id * 1000003 + i * 101 + k)
                                        % 100 < 15
                                   THEN v[(1 + hash(doc_id * 31 + i * 7 + k)
                                           % len(v))::BIGINT]
                                   ELSE tok END),
                           ' ')
                   END AS text,
                   lang, source
            FROM {src("documents")} CROSS JOIN shards, vocab
        )
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM scaled
        """,
    )

    # embeddings: shift vec_id; shard k>0 adds deterministic +/-0.05
    # element noise so cosine neighborhoods are perturbed siblings.
    emit(
        "embeddings",
        f"""
        SELECT (vec_id + k * {stride_of(con, args.src, "embeddings", "vec_id")}
               )::BIGINT AS vec_id,
               CASE WHEN k = 0 THEN embedding ELSE
                   list_transform(
                       embedding,
                       (e, i) -> (e + ((hash(vec_id * 131 + i * 17 + k)
                                        % 2001)::DOUBLE - 1000.0)
                                      / 20000.0)::FLOAT)
               END AS embedding,
               label
        FROM {src("embeddings")} CROSS JOIN shards
        """,
    )


def stride_of(con, src_dir: str, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT max({col}) FROM read_parquet('{src_dir}/{table}.parquet')"
    ).fetchone()[0]
    return int(mx) + 1


if __name__ == "__main__":
    main()
