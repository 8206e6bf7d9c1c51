#!/usr/bin/env python
"""bench_extra.py — side measurement harness for optimization rounds.

NOT part of the driver contract (bench.py is frozen): this isolates each
declared query with the noop sink (spark_optimization_guide §1.4) so the
computation is timed without the sink or count()-style column pruning, and
captures .explain("formatted") per query for the plans/ evidence dirs.

Usage:
  python bench_extra.py --queries minhash_lsh_pairs,text_quality
  python bench_extra.py --all --plans-dir plans/r07 --suffix before
  python bench_extra.py --all --repeat 2      # timing runs after 1 warmup

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()

    from frontier_engine.queries import REGISTRY
    from frontier_engine.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = (
        list(REGISTRY)
        if args.all
        else [n for n in args.queries.split(",") if n]
    )
    spark = get_spark(f"local[{cpus}]", app="bench-extra")
    out: dict = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            p = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                ))
        if args.skip_timing:
            continue
        spark.sparkContext.setJobDescription(f"warm: {name}")
        df.write.format("noop").mode("overwrite").save()
        secs = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"timed: {name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
        out[name] = min(secs)
        print(f"  {name}: {min(secs)} s  (all {secs})", flush=True)
    spark.stop()
    print("EXTRAJSON " + json.dumps({"sf_dir": sf_dir, "noop_secs": out}))


if __name__ == "__main__":
    main()
