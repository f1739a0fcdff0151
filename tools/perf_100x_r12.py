"""100x rehearsal for the ROUND-12 composed chains: the pieces whose
plans changed in rounds 11-12 (single-scan PMI, two-pass heavy hitters)
and the round-12 one-index/two-consumers delta-dedup contract, plus the
curation-v5 composite that stacks them. PERF_100X_r10.md rehearsed the
r9/r10 train/serve loops; this is the same methodology over this
round's surface.

Usage: python tools/perf_100x_r12.py [factor]   (default 100)
Fixture: .benchdata/sf100x — documents+embeddings only (reused from the
r10 rehearsal when present); TPC-H tables symlink to unscaled sf0.1.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_ci_flink_spark.benchscale import ensure_scaled_dir
from flink_ci_flink_spark.queries import QUERIES
from flink_ci_flink_spark.session import get_spark

CHAIN = [
    # r11 plan-changed ops: one corpus scan / two bounded passes
    "pipe_pmi_collocations",
    "pipe_heavy_hitters",
    # r11-official trainer loop (one train scan + map-only serve)
    "pipe_langid_confusion",
    # r12: caller-owned index materialized once, probed by batch AND
    # the streaming ingest twin (includes fixed streaming scaffolding)
    "pipe_delta_dedup_shared_index",
    # the composed curation chain that stacks delta dedup + the trained
    # language gate
    "pipe_e2e_curation_v5",
]


def run(spark, sf_dir: str, tag: str = "") -> dict[str, float]:
    out: dict[str, float] = {}
    for name in CHAIN:
        t0 = time.perf_counter()
        n = QUERIES[name].fn(spark, sf_dir).count()
        out[name] = time.perf_counter() - t0
        print(
            f"# {tag}{sf_dir.split('/')[-1]:10s} {name:30s} "
            f"{out[name]:8.2f}s ({n} rows)",
            file=sys.stderr,
            flush=True,
        )
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    src = "/root/testdata/sf0.1"
    spark = get_spark("perf-100x-r12", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = Path(__file__).resolve().parent.parent / ".benchdata"
    t0 = time.perf_counter()
    big = ensure_scaled_dir(
        spark,
        src,
        str(base / f"sf{factor}x"),
        factor,
        tables=["documents", "embeddings"],
        perturb_embeddings=True,
    )
    print(f"# fixture ready in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    for t in "region nation customer supplier part orders lineitem events".split():
        dst = Path(big) / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"{src}/{t}.parquet", dst)

    # Untimed warm-up pass: the first chain in a fresh JVM pays codegen /
    # classloading / parquet-footer costs that a cached fixture no longer
    # amortizes (observed: cold small-side PMI 22.5s vs 10.8s at 100x on
    # the same settled box). Warm at sf0.1, then time both sides.
    run(spark, src, tag="warmup ")
    load1 = round(os.getloadavg()[0], 2)
    small = run(spark, src)
    large = run(spark, big)

    n_docs = spark.read.parquet(f"{src}/documents.parquet").count()
    lines = [
        f"# PERF_100X_r12 — round-12 composed chains at {factor}x documents",
        "",
        f"Fixture: `{factor}`x id-shifted, per-copy-salted replica of sf0.1",
        "documents (+ epsilon-perturbed embeddings), built by",
        "`benchscale.ensure_scaled_dir` — within-copy near-dup structure",
        "preserved, cross-copy similarity destroyed, so work grows linearly.",
        f"Rows: documents {n_docs * factor:,} (sf0.1: {n_docs:,}).",
        f"Box: local[32]; 1-min load at timing start: {load1}. One UNTIMED",
        "warm-up pass of the whole chain at sf0.1 precedes timing (cold-JVM",
        "codegen otherwise lands entirely on the small side and flatters the",
        "ratios), then one timed run per side (fresh-JVM medians are the",
        "per-round bench's job; this is the composed-chain rehearsal).",
        "",
        f"| chain stage | sf0.1 (s) | {factor}x (s) | scale-up | "
        f"per-{factor}x-row ratio |",
        "|---|---|---|---|---|",
    ]
    for name in CHAIN:
        s, l = small[name], large[name]
        lines.append(
            f"| {name} | {s:.2f} | {l:.2f} | {l / s:.1f}x | "
            f"{l / s / factor:.3f} |"
        )
    lines += [
        "",
        "Reading: `scale-up` is wall-clock at 100x data over 1x; the last",
        "column divides that by the data factor — values well under 1.0",
        "mean strongly sublinear growth (fixed overhead amortizing and",
        "parallelism engaging), ~1.0 linear compute, materially over 1.0",
        "would flag a quadratic corner. `pipe_delta_dedup_shared_index`",
        "and `pipe_e2e_curation_v5` include fixed streaming scaffolding",
        "(index write, staging, checkpoint setup, micro-batch floors) in",
        "BOTH columns, so their small-side numbers are overhead-dominated.",
    ]
    out_path = Path(__file__).resolve().parent.parent / "PERF_100X_r12.md"
    out_path.write_text("\n".join(lines) + "\n")
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
