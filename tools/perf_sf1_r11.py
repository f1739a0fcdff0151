"""PERF_SF1_r11: 10x scale rung (sf0.1 -> .benchdata/sf1x10) for the
round-11 additions plus the two v5 chains the r10 rung missed (judge task
#7) — same methodology as PERF_SF1_r07/r09/r10: fresh JVM per (scale,
round), 3 interleaved rounds, medians and mins reported (this box's
first-sample variance is large; see bench_adjudications)."""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

OPS = [
    # judge task #7: the composed curation v5 chain + its streaming twin
    # (postdated the r10 settled rung)
    "pipe_e2e_curation_v5",
    "streaming_curation_v5_replay",
    # round-11 batch 9 shapes
    "tpcds_shape_max_channel_compose",
    "tpcds_shape_channel_pl_report",
    "tpcds_shape_exists_not_exists",
    "tpcds_shape_triple_fact_stats",
    "tpcds_shape_line_net_returns",
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


def main() -> None:
    small, big = "/root/testdata/sf0.1", str(REPO / ".benchdata/sf1x10")
    load1 = round(os.getloadavg()[0], 2)
    samples: dict[str, dict[str, list[float]]] = {
        sf: {n: [] for n in OPS} for sf in (small, big)
    }
    for _ in range(3):  # interleave scales round-by-round
        for sf in (small, big):
            for n, t in run_once(sf).items():
                samples[sf][n].append(t)
    lines = [
        "# PERF_SF1_r11 — 10x scale rung: curation v5 chains + batch-9 shapes",
        "",
        "Methodology: fresh JVM per (scale, round), 3 interleaved rounds,",
        "sf0.1 vs `.benchdata/sf1x10` (10x id-shifted, per-copy text-salted",
        "replica — near-dup structure linear, never quadratic). Medians",
        "with mins in parentheses; the 10x data factor is the bar.",
        f"Pre-run 1-min load average: {load1} (BASELINE.md bench methodology).",
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
        "The streaming v5 replay includes fixed per-run stream scaffolding",
        "(staging, checkpoint setup, micro-batch scheduling floors), so its",
        "rung reads as chain cost + a large constant.",
    ]
    (REPO / "PERF_SF1_r11.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
