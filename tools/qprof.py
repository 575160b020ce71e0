#!/usr/bin/env python
"""Per-query profiling harness for optimization rounds.

Times individual registry queries at $SPARK_GRAFT_SF_DIR with the bench's
methodology (best-of-2 ``count()``; optional noop-sink passes via
``--noop`` to time full-column computation per guide §1.4), and writes
``.explain("formatted")`` to a plans directory with ``--plans DIR --tag
before|after``.

Usage:
    python tools/qprof.py q130_pagerank_fixedpoint q140_kcore_decomposition
    python tools/qprof.py --noop --plans plans/r17 --tag before q91_minhash_lsh
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink pass (all columns)")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explains")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from palletjack_spark import get_spark
    from palletjack_spark.queries import REGISTRY

    spark = get_spark(app_name="qprof", cpus=CPUS)
    sc = spark.sparkContext

    # same warmups as bench.py's cheap subset so first-query Janino/worker
    # costs don't pollute the numbers
    REGISTRY["q13_pushdown_prune"].fn(spark, SF_DIR).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        sc.setJobDescription(f"qprof:{name}")
        rec: dict = {"count_passes": [], "noop_passes": []}
        for _ in range(args.passes):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, SF_DIR)
            n = df.count()
            rec["count_passes"].append(round(time.perf_counter() - t0, 4))
            rec["rows"] = n
            spark.catalog.clearCache()
            import gc
            gc.collect()
        if args.noop:
            for _ in range(args.passes):
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                rec["noop_passes"].append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
                import gc
                gc.collect()
        rec["count_best"] = min(rec["count_passes"])
        if rec["noop_passes"]:
            rec["noop_best"] = min(rec["noop_passes"])
        out[name] = rec
        print(f"# {name}: count {rec['count_best']:.3f}s"
              + (f", noop {rec['noop_best']:.3f}s" if rec["noop_passes"] else "")
              + f" ({rec['rows']} rows)", file=sys.stderr)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = REGISTRY[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        sc.setJobDescription(None)
    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
