#!/usr/bin/env python
"""Empirical scale rehearsal (VERDICT r8 item 5): run the heaviest
headliners at sf0.1 and at the 10x fixture from gen_scale_fixture.py
in ONE warm session each, and report per-query wall-time ratios and
log10 scaling exponents. Exponent 1.0 = linear in data volume; the
banded/blocked operators should sit near 1 (candidate pairs grow
linearly when shards are disjoint); anything >1.5 is a super-linear
surprise worth a plan read.

    python tools/gen_scale_fixture.py          # once, builds /tmp/testdata_sf1
    python tools/scale_rehearsal.py            # prints the SCALE.md table

Protocol matches bench.py: noop sink, warm pass per query (JIT,
fixture staging), then two timed runs, min kept. Same session confs as
the engine bench so ratios isolate DATA volume, not tuning.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The ten heaviest r8 headliners (BENCH_DETAIL.json) + the two biggest
# minhash variants — one representative per heavy family.
HEAVIES = [
    "pipeline_corpus_prep",
    "dedup_semdedup",
    "dedup_cluster_cc",
    "dedup_cluster_cc_twostar",
    "dedup_minhash_oph",
    "dedup_minhash_lsh",
    "graph_label_propagation",
    "graph_kcore",
    "pipeline_media_curation",
    "pipeline_model_eval",
    "mm_phash_pairs",
    "sim_ivfpq",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/testdata_sf1")
    ap.add_argument("--factor", type=float, default=10.0,
                    help="data-volume ratio big/small (for the exponent)")
    ap.add_argument("--queries", nargs="*", default=HEAVIES)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from database_scan_spark.session import get_spark

    spark = get_spark("database-scan-spark-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # Through the driver contract, same as bench.py: the _released
    # wrapper bounds the session to one query's persisted caches, so
    # later queries time their plans rather than earlier queries' GC
    # pressure.
    import __spark_entry__ as _entry

    qfns = _entry.queries()

    def timed(name: str, sf_dir: str) -> float:
        def one() -> float:
            t0 = time.perf_counter()
            qfns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        one()  # warm
        return min(one(), one())

    rows = []
    for name in args.queries:
        t_small = timed(name, args.small)
        t_big = timed(name, args.big)
        ratio = t_big / t_small
        exponent = math.log(ratio) / math.log(args.factor)
        rows.append(
            {
                "query": name,
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                "ratio": round(ratio, 2),
                "exponent": round(exponent, 2),
            }
        )
        print(
            f"{name:28s} sf0.1 {t_small:6.2f}s  10x {t_big:7.2f}s  "
            f"ratio {ratio:5.2f}  exp {exponent:5.2f}",
            flush=True,
        )

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(rows, fh, indent=1)
            fh.write("\n")


if __name__ == "__main__":
    main()
