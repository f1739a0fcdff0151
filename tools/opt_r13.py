"""Round-13 optimization harness: per-query timing + plan capture.

Usage:
  python tools/opt_r13.py time  [--runs N] [--action count|noop] name [name ...]
  python tools/opt_r13.py plans [--tag before|after] name [name ...]
  python tools/opt_r13.py headline [--runs N]        # all 22 headline queries

Timing uses the tuned session (same as bench.py: $SPARK_GRAFT_CPUS /
$SPARK_GRAFT_SF_DIR), reports per-query wall median + process-tree CPU
delta per run, and warms the JVM the same way bench.py does so numbers are
comparable to the official methodology. `--action noop` times the full
materialization of every column via the noop sink (guide §1.4) instead of
the bench's count() action — use it to isolate computation cost from the
count-path plan pruning.

Plan capture writes `plans/r13/<name>_<tag>.txt` with explain("formatted").
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_ci_flink_spark.queries import QUERIES  # noqa: E402
from flink_ci_flink_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from bench import HEADLINE  # noqa: E402 - one source of truth for the frozen set


def _warm(spark) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.filter("l_quantity > 0").groupBy("l_returnflag").count().count()
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev.groupBy("event_type").count().count()
    od = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    j = li.join(
        F.broadcast(od.select("o_orderkey", "o_custkey")),
        li.l_orderkey == F.col("o_orderkey"),
    )
    j.groupBy("o_custkey").agg(F.sum("l_quantity").alias("q")).select(
        F.sum(F.col("q")).alias("s")
    ).count()
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    li.select(F.row_number().over(w).alias("rn")).filter("rn <= 3").count()
    li.rollup("l_returnflag", "l_linestatus").count().count()
    ev.select(
        F.min("value")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        .alias("m")
    ).filter("m > 0").count()


def _cpu() -> float | None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    return bench._proc_tree_cpu_sec()


def cmd_time(names: list[str], runs: int, action: str) -> None:
    spark = get_spark("opt_r13")
    _warm(spark)
    totals_wall: dict[str, float] = {}
    totals_cpu: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        walls, cpus = [], []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"opt_r13:{name}")
            c0 = _cpu()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = time.perf_counter() - t0
            c1 = _cpu()
            walls.append(dt)
            if c0 is not None and c1 is not None:
                cpus.append(c1 - c0)
            print(
                f"# run{r + 1} {name}: {dt:.3f}s wall"
                + (f" {cpus[-1]:.3f}s cpu" if cpus else "")
                + (f" ({n} rows)" if n >= 0 else ""),
                file=sys.stderr,
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)
        totals_wall[name] = statistics.median(walls)
        if cpus:
            totals_cpu[name] = statistics.median(cpus)
    print(f"\n== medians over {runs} runs (action={action}, sf_dir={SF_DIR}) ==")
    for name in names:
        cpu = totals_cpu.get(name)
        print(
            f"{totals_wall[name]:8.3f}s wall "
            + (f"{cpu:8.3f}s cpu  " if cpu is not None else " " * 16)
            + name
        )
    print(
        f"{sum(totals_wall.values()):8.3f}s wall "
        f"{sum(totals_cpu.values()):8.3f}s cpu  TOTAL"
    )


def cmd_plans(names: list[str], tag: str) -> None:
    spark = get_spark("opt_r13_plans")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    from flink_ci_flink_spark.plans import plan_text

    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        txt = plan_text(df, "formatted")
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["time", "plans", "headline"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--action", choices=["count", "noop"], default="count")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()
    if args.cmd == "headline":
        cmd_time(HEADLINE, args.runs, args.action)
    elif args.cmd == "time":
        cmd_time(args.names, args.runs, args.action)
    else:
        cmd_plans(args.names, args.tag)


if __name__ == "__main__":
    main()
