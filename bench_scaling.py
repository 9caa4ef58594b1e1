"""Two-parallelism scaling evidence (BASELINE.md protocol).

The north rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so per the driver's
protocol we run the IDENTICAL recipe-bake job on the IDENTICAL parquet
input at local[N] and local[4N] (shuffle partitions scaled
proportionally) and report throughput at both plus efficiency
= (throughput@4N / throughput@N) / 4.

Each run is a fresh SparkSession (sequential, never concurrent — the
box has 32 cores and concurrent runs would contend). The input is
generated once, written to parquet, and reused by both runs; the
generator is deterministic, so rows are identical. Determinism of the
RESULT across parallelism is asserted too (checksum of feature
columns) — exact decimal accumulation makes it bit-identical.

The sandbox VM's cores are host-overcommitted: a raw-CPU control
(multiprocessing busy loops, no Spark) measures the parallel speedup
the HARDWARE can deliver between the two levels; the engine's
efficiency is reported both absolute and relative to that ceiling.
(On this box 8→32 threads caps at ~2.7×/4× for any workload, so the
default pair is N=2 → 4N=8 where the hardware ceiling is ~0.87.)

Usage: python bench_scaling.py [--convs 2000000] [--n 2] [--runs 3]
Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from bench import bake_recipe, materialize
from recipys_spark.sources.io import get_spark, synthetic_transcripts


def checksum(df) -> tuple:
    """Order-independent exact checksum of the feature columns."""
    # decimal sums: order-independent and overflow-free (ANSI mode
    # rejects long-sum overflow of int64 hashes)
    agg = df.agg(
        F.sum(
            F.xxhash64("conv_id", "turn_idx", "session_id").cast("decimal(38,0)")
        ).alias("h1"),
        F.sum(
            F.xxhash64(
                F.format_number(F.col("value_mean"), 9),
                F.format_number(F.col("value_lag_1"), 9),
            ).cast("decimal(38,0)")
        ).alias("h2"),
        F.count("*").alias("n"),
    ).first()
    return (agg.h1, agg.h2, agg.n)


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def hardware_ceiling(n: int, n4: int, total: int = 160_000_000) -> float:
    """Raw-CPU (no Spark) parallel speedup the box delivers n → 4n."""
    import multiprocessing as mp

    def bench(procs: int) -> float:
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [total // procs] * procs)
        return time.time() - t0

    bench(n4)  # warm
    return bench(n) / bench(n4)


def stage_walls(log_dir: str) -> dict:
    """Per-stage wall times from the Spark event log (the BASELINE.md
    protocol's per-stage evidence): {stage name: [count, total wall s]},
    aggregated over the whole app (warmups + timed runs)."""
    import glob

    agg: dict = {}
    # Spark 4 may write one DIRECTORY per app (rolling event logs)
    paths = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        + glob.glob(os.path.join(log_dir, "*"))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in set(paths):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev.get("Stage Info", {})
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if not sub or not comp:
                    continue
                name = si.get("Stage Name", "?").split(" at ")[0]
                a = agg.setdefault(name, [0, 0.0])
                a[0] += 1
                a[1] += (comp - sub) / 1000.0
    return agg


def run_once(cores: int, tdir: str, runs: int, with_checksum: bool, parts: int):
    """One session per level: two untimed warmup materializations
    (JIT + page cache), then `runs` timed materializations.

    Shuffle partitions are FIXED (same at both levels) so the physical
    plan — partition count, per-task data, spill behavior — is
    identical and the two runs differ ONLY in parallelism. Scaling the
    partition count with cores instead makes the small level spill
    (4 huge partitions vs 16 small ones) and inflates efficiency past
    1.0 — a measurement artifact, not scaling."""
    import shutil

    log_dir = f"/tmp/recipys_scaling_eventlog_{cores}"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        parallelism=cores,
        app_name=f"recipys_scaling_{cores}",
        shuffle_partitions=parts,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            # plain single-file JSON so stage_walls can parse it
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(tdir)
    n_turns = df.count()
    baked = bake_recipe(df)
    materialize(baked)  # warmup 1: JIT + page cache, untimed
    materialize(baked)  # warmup 2: steady state, untimed
    walls = []
    for _ in range(runs):
        t0 = time.time()
        materialize(baked)
        walls.append(time.time() - t0)
    cs = checksum(bake_recipe(df)) if with_checksum else ()
    spark.stop()
    return walls, n_turns, cs, stage_walls(log_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=2, help="small parallelism (4N = big)")
    ap.add_argument("--runs", type=int, default=4, help="timed runs per level")
    args = ap.parse_args()

    tdir = f"/tmp/recipys_scaling_transcripts_{args.convs}"
    if not os.path.exists(tdir):
        spark = get_spark(parallelism=32, app_name="recipys_scaling_gen")
        spark.sparkContext.setLogLevel("ERROR")
        synthetic_transcripts(
            spark, n_convs=args.convs, skew=True, skew_factor=100, with_features=True
        ).repartition(256).write.mode("overwrite").parquet(tdir)
        spark.stop()

    parts = args.n * 8  # fixed at BOTH levels: identical physical plan
    results = {}
    checksums = {}
    stages = {}
    for cores in (args.n, args.n * 4):
        walls, n_turns, cs, st = run_once(
            cores, tdir, args.runs, with_checksum=True, parts=parts
        )
        checksums[cores] = cs
        stages[cores] = st
        best = min(walls)  # steady-state wall (host-overcommit noise is one-sided)
        results[cores] = {
            "wall_s": [round(w, 2) for w in walls],
            "best_wall_s": round(best, 2),
            "turns_per_sec": round(n_turns / best, 1),
        }

    n, n4 = args.n, args.n * 4
    speedup = results[n4]["turns_per_sec"] / results[n]["turns_per_sec"]
    eff = speedup / 4
    hw = hardware_ceiling(n, n4)
    deterministic = checksums.get(n) == checksums.get(n4)
    out = {
        "metric": "recipe-bake scaling efficiency local[N] -> local[4N]",
        "n_turns": n_turns,
        "N": n,
        "4N": n4,
        "throughput": {str(k): v["turns_per_sec"] for k, v in results.items()},
        "walls": {str(k): v["wall_s"] for k, v in results.items()},
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "hardware_ceiling_speedup": round(hw, 3),
        "efficiency_vs_hardware": round(speedup / hw, 3),
        "bit_identical_across_parallelism": deterministic,
    }
    print(json.dumps(out))

    runs = args.runs
    by_total = sorted(
        set(stages[n]) | set(stages[n4]),
        key=lambda s: -(
            stages[n].get(s, [0, 0.0])[1] + stages[n4].get(s, [0, 0.0])[1]
        ),
    )
    rows = []
    for s in by_total[:8]:
        cn, wn = stages[n].get(s, [0, 0.0])
        c4, w4 = stages[n4].get(s, [0, 0.0])
        rows.append(f"| {s} | {cn} × {wn:.1f} s | {c4} × {w4:.1f} s |")
    stage_table = (
        f"| stage | local[{n}] (count × total wall) | "
        f"local[{n4}] (count × total wall) |\n|---|---|---|\n"
        + "\n".join(rows)
    )

    # preserve every section after the scaling block (skew crossovers,
    # headline suite, vectorized-signature measurements) — this script
    # owns only the top section
    tail = ""
    if os.path.exists("BENCH.md"):
        existing = open("BENCH.md").read()
        idx = existing.find("\n## ")
        if idx != -1:
            tail = existing[idx:]

    with open("BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — two-parallelism scaling evidence

Protocol per BASELINE.md: the identical recipe-bake job (expanding
mean + expanding max + forward-fill + lag + sessionization over
`Window.partitionBy(conv_id)`) on the identical parquet transcript
input, at `local[{n}]` vs `local[{n4}]`, with a FIXED shuffle
partition count ({n * 8}) at both levels so the physical plan (per-task
data, spill behavior) is identical and only the parallelism differs.
Best of {args.runs} runs after two untimed warmups per level (the
host-overcommitted VM adds one-sided noise).

| parallelism | walls (s) | best wall (s) | throughput (turns/s) |
|---|---|---|---|
| local[{n}] | {results[n]['wall_s']} | {results[n]['best_wall_s']} | {results[n]['turns_per_sec']:,} |
| local[{n4}] | {results[n4]['wall_s']} | {results[n4]['best_wall_s']} | {results[n4]['turns_per_sec']:,} |

- input: {n_turns:,} turns, {args.convs:,} conversations (ragged 4–11
  turns + one {100}×-median skew conversation), deterministic seed=42
- **scaling efficiency = (throughput@{n4} / throughput@{n}) / 4 =
  {eff:.3f}** (target ≥ 0.8)
- **hardware ceiling control**: raw-CPU busy loops (no Spark) speed up
  {hw:.2f}×/4× between the same two levels on this host-
  overcommitted VM; the engine achieves {speedup:.2f}× —
  **{speedup / hw:.0%} of what the hardware allows**.
- result determinism across parallelism: checksums of
  (session_id, value_mean, value_lag_1) at both levels
  {'**bit-identical**' if deterministic else 'DIFFER (investigate!)'} —
  exact decimal accumulation (recipys_spark/functions/deterministic.py)
  makes feature values independent of partitioning.

Caveats: single-JVM local mode shares one heap and one host's memory
bandwidth — at real cluster scale each executor adds its own memory
and disks, so local-mode efficiency is a lower bound on cluster
efficiency for this shuffle-light plan (one window stage per conv
partition, AQE-coalesced); see SURVEY.md §4 for the shuffle budget.

### Per-stage wall time (Spark event log, whole app = 2 warmups + {runs} timed runs + checksum)

{stage_table}
"""
            + tail
        )


if __name__ == "__main__":
    main()
