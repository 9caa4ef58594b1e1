"""Ad-hoc per-query isolation bench + plan capture (guide §1.1/§1.4).

NOT the driver's metric — bench.py stays the frozen measurement
harness. This file exists so optimization work can (a) time a single
query with the noop sink without paying for the whole suite, (b) dump
``explain("formatted")`` before/after a change into plans/r07/, and
(c) label jobs so the event log is readable.

Usage:
    python bench_extra.py q1 q2 ...            # time the named queries
    python bench_extra.py --plans q1 q2 ...    # also write plans/r07/<q>_<tag>.txt
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_BENCH_REPEATS=3 \
        python bench_extra.py --tag after impute_knn
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entrymod
from recipys_spark.sources.io import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans = "--plans" in args
    tag = "before"
    if "--tag" in args:
        tag = args[args.index("--tag") + 1]
        args.remove("--tag")
        args.remove(tag)
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark(parallelism=cpus, app_name="bench_extra",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JVM/codegen) — same shape as bench.py
    spark.read.parquet(f"{sf_dir}/events.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    queries = entrymod.queries()
    out = {}
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        if plans:
            df = queries[name](spark, sf_dir)
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        for _ in range(repeats):
            df = queries[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        walls.sort()
        out[name] = walls
        print(name, walls, flush=True)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "walls": out}))
    spark.stop()


if __name__ == "__main__":
    main()
