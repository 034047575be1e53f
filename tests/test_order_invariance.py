"""Input-order-invariance audit class (r8): the DuckDB oracle cannot
catch order-dependent results (both engines scan the same parquet in
the same physical row order), but at 100 TB input order is
nondeterministic — splits arrive in any order — so an order-dependent
result is a latent scale bug even with every oracle green.

The full sweep is tools/audit_order_invariance.py (all 464 specs, run
per-round); this file keeps the machinery honest in CI:

- a NEGATIVE control: a deliberately positional query (limit without a
  total order) must be FLAGGED — if the harness can't catch the bug
  class it exists for, a green sweep means nothing;
- a POSITIVE control: one representative spec per major family is
  invariant at sf0.001 on every test run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from database_scan_spark.testing import canonicalize  # noqa: E402
from tools.audit_order_invariance import stage_shuffled  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    from database_scan_spark.registry import SPECS

    return {s.name: s for s in SPECS}


def _shuffled() -> str:
    import hashlib

    tag = hashlib.sha256(os.path.abspath(SF).encode()).hexdigest()[:12]
    return stage_shuffled(SF, os.path.join("/tmp", f"order_shuffled_{tag}"))


def test_shuffled_fixture_same_rows_different_order(spark):
    """The staged copy is a permutation: identical canonical rows,
    different physical order (otherwise the audit compares a dir to
    itself and proves nothing)."""
    shuf = _shuffled()
    for table in ("orders", "documents"):
        base_df = spark.read.parquet(os.path.join(SF, f"{table}.parquet"))
        shuf_df = spark.read.parquet(os.path.join(shuf, f"{table}.parquet"))
        assert canonicalize(base_df.toPandas()) == canonicalize(
            shuf_df.toPandas()
        ), f"{table}: shuffled copy is not a permutation"
        first_base = [tuple(r) for r in base_df.limit(20).collect()]
        first_shuf = [tuple(r) for r in shuf_df.limit(20).collect()]
        assert first_base != first_shuf, (
            f"{table}: shuffled copy kept the original physical order"
        )


def test_negative_control_positional_query_is_flagged(spark):
    """A limit WITHOUT a total order is the canonical order-dependent
    bug; the audit's canonical-form comparison must see it differ
    across the permuted input."""
    shuf = _shuffled()

    def positional(sf_dir: str):
        return (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select("o_orderkey")
            .limit(5)
        )

    base = canonicalize(positional(SF).toPandas())
    got = canonicalize(positional(shuf).toPandas())
    assert base != got, (
        "negative control failed: the audit machinery cannot detect a "
        "positional limit — a green sweep would be meaningless"
    )


def test_representative_specs_are_order_invariant(spark, specs):
    """One spec per major family, run on the original and the permuted
    fixtures — canonical results must be identical. The full 464-spec
    sweep runs per-round via tools/audit_order_invariance.py."""
    shuf = _shuffled()
    names = (
        "agg_group_sums",          # core aggregation
        "topk_per_group",          # window/rank with tie discipline
        "dedup_exact",             # keyed dedup
        "join_multi_hop",          # join chain
        "win_running_sum",         # window functions
        "sample_hash_bernoulli",   # hash-based sampling
        "split_train_test",        # hash-based splits
        "text_quality",            # document scoring
        "limit_first_hit",         # the reference's first-hit shape
        "paginate",                # the reference's pagination shape
        "topk_first",              # the reference's head-of-sort shape
    )
    for name in names:
        fn = specs[name].fn
        base = canonicalize(fn(spark, SF).toPandas())
        got = canonicalize(fn(spark, shuf).toPandas())
        assert base == got, f"{name}: result depends on input row order"
