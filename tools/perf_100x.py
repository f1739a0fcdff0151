"""100x rehearsal for the COMPOSED offline-train / online-serve chains
(round-9 VERDICT "Next" #8): the individual operators are spot-checked at
10x in the per-round bench; this one-off drives the three train/serve
loops (IVF-PQ ANN, quality classifier, DSIR) plus the composed
`pipe_e2e_curation_v4` chain at a 100x documents+embeddings slice and
records per-stage scale-ups into PERF_100X_r10.md.

Usage: python tools/perf_100x.py [factor]   (default 100)
Fixture: .benchdata/sf100x — documents+embeddings only (the chains touch
no TPC-H fact table; skipping the 1 GB lineitem union keeps the build
minutes, not tens of minutes). Embeddings get a per-copy epsilon so the
ANN corpus isn't `factor` exact clones of every vector.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_ci_flink_spark.benchscale import ensure_scaled_dir
from flink_ci_flink_spark.queries import QUERIES
from flink_ci_flink_spark.session import get_spark

CHAIN = [
    # train loops
    "pipe_quality_perceptron",  # batch perceptron training report
    "pipe_classifier_eval",  # train + confusion-matrix eval
    "pipe_dsir_select",  # DSIR bucket model + importance resample
    "pipe_ivfpq_ann",  # IVF-PQ train + probe
    "pipe_ivfpq_recall",  # IVF-PQ vs exact recall eval
    # composed curation chain (heuristics + model gate + DSIR)
    "pipe_e2e_curation_v4",
]


def run(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in CHAIN:
        t0 = time.perf_counter()
        n = QUERIES[name].fn(spark, sf_dir).count()
        out[name] = time.perf_counter() - t0
        print(f"# {sf_dir.split('/')[-1]:10s} {name:28s} {out[name]:8.2f}s ({n} rows)",
              file=sys.stderr, flush=True)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    src = "/root/testdata/sf0.1"
    spark = get_spark("perf-100x", cpus=32)
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

    # load_tables registers views for every table; the chains only read
    # documents/embeddings, so the rest resolve to unscaled sf0.1 symlinks
    import os

    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        dst = Path(big) / f"{t}.parquet"
        if not dst.exists():
            os.symlink(f"{src}/{t}.parquet", dst)

    small = run(spark, src)
    large = run(spark, big)

    n_docs = spark.read.parquet(f"{src}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{src}/embeddings.parquet").count()
    lines = [
        f"# PERF_100X_r10 — composed train/serve chains at {factor}x documents",
        "",
        f"Fixture: `{factor}`x id-shifted, per-copy-salted replica of sf0.1",
        "documents (+ epsilon-perturbed embeddings), built by",
        "`benchscale.ensure_scaled_dir` — within-copy near-dup structure",
        "preserved, cross-copy similarity destroyed, so work grows linearly.",
        f"Rows: documents {n_docs * factor:,} (sf0.1: {n_docs:,}), embeddings",
        f"{n_vecs * factor:,} (sf0.1: {n_vecs:,}). Box: local[32]. One timed",
        "run each (fresh-JVM medians are the per-round bench's job; this is",
        "the composed-chain rehearsal).",
        "",
        "| chain stage | sf0.1 (s) | "
        f"{factor}x (s) | scale-up | per-{factor}x-row ratio |",
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
        "column divides that by the data factor — values well under 1.0 mean",
        "strongly sublinear wall-clock growth (fixed overhead amortizing and",
        "parallelism engaging), ~1.0 means linear compute, and anything",
        "materially over 1.0 would flag a superlinear (quadratic-corner)",
        "stage. See the committed table for the measured values.",
    ]
    out_path = Path(__file__).resolve().parent.parent / "PERF_100X_r10.md"
    out_path.write_text("\n".join(lines) + "\n")
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
