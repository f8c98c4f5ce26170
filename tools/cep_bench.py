"""CEP benchmark → BENCH/cep.json.

Two questions, measured on the same deterministic skewed corpus the
scaling benches use (tools/scaling_bench.generate_input):

1. Batch row-pattern throughput: plans/cep.match_pattern strict and skip
   over N rows — the window-function plans' rows/sec (input cached so the
   measurement is the operator, not the parquet scan — the r4 lesson).

2. Streaming matcher overhead: the full sharded pipeline (run_pipeline
   subprocess, fresh JVM per leg) with and without --pattern, INTERLEAVED
   off/on × reps (box drift makes solo numbers meaningless —
   BENCH/BASELINE.md round-5 note). The pattern u=user,a=assistant,c=tool
   matches every role cycle (~n/3 matches) — a worst-case match volume, so
   the reported overhead is an upper bound.

Usage: python tools/cep_bench.py [--rows 4000000] [--convs 20000]
       [--cpus 32] [--reps 3] [--workdir /dev/shm/cepbench]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _stream_leg(src: str, cpus: int, workdir: str, pattern: str | None) -> dict:
    out = os.path.join(workdir, "out-leg")
    ckpt = os.path.join(workdir, "ckpt-leg")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--source", src,
        "--out", out,
        "--checkpoint", ckpt,
        "--available-now",
        "--max-files-per-trigger", "8",
        "--master", f"local[{cpus}]",
        "--engine", "sharded",
        "--n-shards", "256",
    ]
    if pattern:
        cmd += ["--pattern", pattern]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"leg failed: {proc.stderr[-2000:]}")
    r = json.loads(lines[-1])
    # tmpfs IS RAM — remove leg outputs immediately
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from scaling_bench import generate_input

    workdir = args.workdir or tempfile.mkdtemp(prefix="cepbench-")
    src = os.path.join(workdir, "src")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        n = generate_input(src, args.rows, args.convs, cpus=args.cpus)
        print(f"generated {n} rows at {src}", file=sys.stderr)

    # ---- batch legs (one session; input cached + materialized first)
    from dataflow_ordered_processing_spark.operators.cep_core import Step
    from dataflow_ordered_processing_spark.plans.cep import match_pattern
    from dataflow_ordered_processing_spark.session import get_spark

    spark = get_spark(
        "cep-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    df = spark.read.parquet(src).repartition(args.cpus).cache()
    n_rows = df.count()  # materialize the cache

    strict_steps = [
        Step("u", role="user"),
        Step("a", role="assistant"),
        Step("t", role="tool"),
    ]
    skip_steps = [
        Step("u", role="user"),
        Step("s", role="tool", tool="search"),
        Step("a", role="assistant"),
    ]

    batch = {}
    for name, plan in (
        ("strict", lambda: match_pattern(df, strict_steps, mode="strict")),
        ("skip", lambda: match_pattern(df, skip_steps, mode="skip", within=100_000)),
    ):
        walls, matches = [], None
        for _ in range(args.reps):
            t0 = time.time()
            matches = plan().count()
            walls.append(round(time.time() - t0, 2))
        med = statistics.median(walls)
        batch[name] = {
            "walls_s": walls,
            "median_s": med,
            "rows_per_sec": round(n_rows / med, 1),
            "matches": matches,
        }
        print(f"batch {name}: {batch[name]}", file=sys.stderr)
    spark.stop()

    # ---- streaming overhead: interleaved off/on reps, fresh JVM per leg
    legs = {"off": [], "on": []}
    for _ in range(args.reps):
        for key, pattern in (("off", None), ("on", "u=user,a=assistant,c=tool")):
            r = _stream_leg(src, args.cpus, workdir, pattern)
            legs[key].append(r["turns_per_sec"])
            print(f"stream {key}: {r}", file=sys.stderr)
    med_off = statistics.median(legs["off"])
    med_on = statistics.median(legs["on"])

    result = {
        "rows": n_rows,
        "convs": args.convs,
        "cpus": args.cpus,
        "reps": args.reps,
        "batch": batch,
        "stream_turns_per_sec_off": legs["off"],
        "stream_turns_per_sec_on": legs["on"],
        "stream_median_off": med_off,
        "stream_median_on": med_on,
        "stream_matcher_overhead_pct": round(100.0 * (1 - med_on / med_off), 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cep.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
