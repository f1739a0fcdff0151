"""PERF_SF1_r12: 10x scale rung (sf0.1 -> .benchdata/sf1x10) for the
round-10 batch-10 shapes PERF_SF1_r11 missed (round-11 judge task #6 —
above_avg_of_sums' decimal(38,0) scalar threshold, disjunctive_bands,
cross_nation_basket) plus the round-12 batch-11 and batch-12 shapes and
the shared-index delta-dedup query. Same methodology as PERF_SF1_r07/r09/r10/r11:
fresh JVM per (scale, round), 3 interleaved rounds, medians and mins
reported. The r11 rung ran at load1 9.68; this one SETTLE-WAITS up
front (the r12 bench.py discipline) so the medians are readable, not
just the ratios."""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

OPS = [
    # judge task #6: the batch-10 trio the r11 rung missed
    "tpcds_shape_above_avg_of_sums",
    "tpcds_shape_disjunctive_bands",
    "tpcds_shape_cross_nation_basket",
    # round-12 batch 11
    "tpcds_shape_return_lag_bands",
    "tpcds_shape_promo_scalar_ratio",
    "tpcds_shape_null_channel_union",
    "tpcds_shape_threeway_return_ratio",
    "tpcds_shape_demographic_band_lookup",
    # round-12: one-index/two-consumers contract chain
    "pipe_delta_dedup_shared_index",
    # round-12 batch 12
    "tpcds_shape_intersect_prefix_gate",
    "tpcds_shape_second_fact_band_gate",
    "tpcds_shape_rollup_of_means",
    "tpcds_shape_cross_dim_disjunct",
]

INNER = r'''
import json, sys, time
sys.path.insert(0, "%s")
from flink_ci_flink_spark.session import get_spark
from flink_ci_flink_spark.queries import QUERIES
sf_dir, names = sys.argv[1], json.loads(sys.argv[2])
spark = get_spark("sf1rung", cpus=16)
out = {}
for n in names:
    t0 = time.perf_counter()
    QUERIES[n].fn(spark, sf_dir).count()
    out[n] = round(time.perf_counter() - t0, 3)
print("RESULT " + json.dumps(out))
''' % str(REPO)


def run_once(sf_dir: str) -> dict[str, float]:
    p = subprocess.run(
        [sys.executable, "-c", INNER, sf_dir, json.dumps(OPS)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT for {sf_dir}: {p.stderr[-2000:]}")


def settle_wait(gate: float, max_wait: float = 600.0) -> tuple[float, bool]:
    """Bounded poll until load1 AND load5 clear the gate (r12 bench.py
    discipline). Returns (waited_sec, exhausted)."""
    t0 = time.monotonic()
    while True:
        load1, load5, _ = os.getloadavg()
        if load1 < gate and load5 < gate:
            return round(time.monotonic() - t0, 1), False
        if time.monotonic() - t0 >= max_wait:
            return round(time.monotonic() - t0, 1), True
        time.sleep(20)


def main() -> None:
    small, big = "/root/testdata/sf0.1", str(REPO / ".benchdata/sf1x10")
    gate = max(2.0, 0.15 * (os.cpu_count() or 1))
    waited, exhausted = settle_wait(gate)
    load1 = round(os.getloadavg()[0], 2)
    samples: dict[str, dict[str, list[float]]] = {
        sf: {n: [] for n in OPS} for sf in (small, big)
    }
    for _ in range(3):  # interleave scales round-by-round
        for sf in (small, big):
            for n, t in run_once(sf).items():
                samples[sf][n].append(t)
    lines = [
        "# PERF_SF1_r12 — 10x scale rung: batch-10 trio + batches 11-12 + shared index",
        "",
        "Methodology: fresh JVM per (scale, round), 3 interleaved rounds,",
        "sf0.1 vs `.benchdata/sf1x10` (10x id-shifted, per-copy text-salted",
        "replica — near-dup structure linear, never quadratic). Medians",
        "with mins in parentheses; the 10x data factor is the bar.",
        f"Settle-wait before the rung: {waited}s"
        f"{' (EXHAUSTED — ran anyway)' if exhausted else ''}; "
        f"1-min load at start: {load1}, gate {gate:.1f}",
        "(BASELINE.md bench methodology rule 4).",
        "",
        "| query | sf0.1 med (min) | sf1 med (min) | scale-up med | min/min |",
        "|---|---|---|---|---|",
    ]
    for n in OPS:
        a, b = samples[small][n], samples[big][n]
        am, bm = statistics.median(a), statistics.median(b)
        lines.append(
            f"| {n} | {am:.2f} ({min(a):.2f}) | {bm:.2f} ({min(b):.2f}) "
            f"| **{bm / am:.2f}x** | {min(b) / min(a):.2f}x |"
        )
    lines += [
        "",
        "Every rung below ~10x is sublinear at 10x data; values near 1x are",
        "overhead-dominated at these local scales (plan shapes linear).",
        "pipe_delta_dedup_shared_index includes fixed per-run streaming",
        "scaffolding (index write, staging, checkpoint setup, micro-batch",
        "floors), so its rung reads as chain cost + a large constant.",
    ]
    (REPO / "PERF_SF1_r12.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
