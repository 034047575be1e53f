#!/usr/bin/env python
"""Deterministic SKEWED-KEY variant of the sf0.1 fixture (round 9).

The 10x fixture (gen_scale_fixture.py) answers "does wall-time scale
with VOLUME"; this one answers the other 100 TB question: "does the
plan survive a HOT KEY". Three tables get a single dominant key while
every row count, schema, and the remaining columns stay byte-identical:

- ``events``:   40% of rows remapped to the modal ``user_id``
                (hot partition for groupBys AND for window functions
                partitioned by user — a window partition cannot be
                split across tasks, so this is the worst legal shape).
- ``lineitem``: 40% of rows remapped to one existing ``l_orderkey``
                (~240k rows on one join key at sf0.1 vs a mean of ~4 —
                the classic AQE skew-join shape for orders ⋈ lineitem).
- ``orders``:   40% of rows remapped to the modal ``o_custkey``
                (customer ⋈ orders skew, tpch_q13's count-distribution).

Row selection is md5-hash-deterministic (no RNG, stable across runs and
machines); the hot keys are values that already exist, so FK joins stay
valid. All other tables are copied unchanged. Correctness on the skewed
data is still checked differentially (DuckDB reads the SAME files), so
`tools/verify_window.py --sf /tmp/testdata_skew` proves answers don't
depend on key distribution, and tools/skew_rehearsal.py times the
skew-sensitive queries at equal volume to expose any runtime cliff.

    python tools/gen_skew_fixture.py            # -> /tmp/testdata_skew
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

SKEW_FRACTION = 0.4  # of rows remapped onto the hot key


def _mask(keys: np.ndarray, salt: str) -> np.ndarray:
    """Deterministic per-row selection: md5(salt|key) % 10 < 4."""
    return np.array(
        [
            int(hashlib.md5(f"{salt}|{k}".encode()).hexdigest()[:8], 16) % 10
            < int(SKEW_FRACTION * 10)
            for k in keys
        ]
    )


def _skew_column(tbl: pa.Table, col: str, sel_col: str, salt: str) -> pa.Table:
    """Remap SKEW_FRACTION of rows' `col` to the modal existing value."""
    vals = tbl.column(col).to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(vals, return_counts=True)
    hot = uniq[counts.argmax()]
    sel = tbl.column(sel_col).to_numpy(zero_copy_only=False)
    mask = _mask(sel, salt)
    out = vals.copy()
    out[mask] = hot
    idx = tbl.schema.get_field_index(col)
    arr = pa.array(out, type=tbl.schema.field(col).type)
    n_hot = int((out == hot).sum())
    print(
        f"  {col}: hot key {hot!r} now carries {n_hot}/{len(out)} rows "
        f"({100.0 * n_hot / len(out):.0f}%)"
    )
    return tbl.set_column(idx, tbl.schema.field(col), arr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata_skew")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    plans = {
        # table -> (skewed col, row-selection col, salt)
        "events": ("user_id", "event_id", "ev"),
        "lineitem": ("l_orderkey", "l_orderkey", "li"),
        "orders": ("o_custkey", "o_orderkey", "od"),
    }
    for name in TABLES:
        src = os.path.join(args.src, f"{name}.parquet")
        dst = os.path.join(args.out, f"{name}.parquet")
        if name not in plans:
            shutil.copyfile(src, dst)
            continue
        col, sel, salt = plans[name]
        tbl = pq.read_table(src)
        print(f"{name}:")
        # lineitem selects on the key itself so ALL lines of a sampled
        # order move together (order-level skew, not row-shredding)
        tbl = _skew_column(tbl, col, sel, salt)
        pq.write_table(tbl, dst)
    print(f"skew fixture -> {args.out}")


if __name__ == "__main__":
    main()
