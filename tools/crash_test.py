"""Kill -9 resilience: start the pipeline as a subprocess, SIGKILL it
mid-stream, restart from the same checkpoint, and verify the sink is
exactly-once and oracle-equal (north_rule: resumable from checkpoint).

Usage: python tools/crash_test.py [--rows 200000] [--convs 2000]
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--convs", type=int, default=2_000)
    ap.add_argument("--kill-after", type=float, default=25.0)
    ap.add_argument("--engine", choices=["classic", "sharded"], default="classic")
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument(
        "--merge-on-key", action="store_true",
        help="crash-test the paranoid merge path (keyidx high-watermark filter)",
    )
    args = ap.parse_args()

    from tools.scaling_bench import generate_input  # noqa: E402

    workdir = tempfile.mkdtemp(prefix="crash-")
    src = os.path.join(workdir, "src")
    n_input = generate_input(src, args.rows, args.convs, cpus=8)

    out = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "run_pipeline.py"),
        "--source", src,
        "--out", out,
        "--checkpoint", ckpt,
        "--available-now",
        "--max-files-per-trigger", "4",
        "--master", "local[8]",
        "--engine", args.engine,
        "--n-shards", str(args.n_shards),
    ]
    if args.merge_on_key:
        cmd.append("--merge-on-key")

    # leg 1: SIGKILL mid-run (no cleanup, no shutdown hooks)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    time.sleep(args.kill_after)
    crashed = proc.poll() is None
    if crashed:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    # count committed EPOCH IDS through the compaction-aware view (review
    # r5 #5: with default-on compaction, counting raw epoch= dirs
    # under-reports once folds begin — a compact=L-lo-hi dir covers
    # hi-lo+1 epochs)
    from dataflow_ordered_processing_spark.streaming.sinks import _visible_entries

    committed_mid = sum(
        hi - lo + 1 for _, lo, hi, _p in _visible_entries(os.path.join(out, "data"))
    )

    # leg 2: restart from the same checkpoint, run to completion
    proc2 = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    result_line = [l for l in proc2.stdout.splitlines() if l.startswith("{")][-1]
    leg2 = json.loads(result_line)

    # verify exactly-once + completeness
    from dataflow_ordered_processing_spark.session import get_spark
    from dataflow_ordered_processing_spark.streaming.sinks import read_sink

    spark = get_spark("crash-verify", master="local[8]", shuffle_partitions=8)
    data = read_sink(spark, os.path.join(out, "data"))
    n_rows = data.count()
    n_unique = data.select("conv_id", "turn_idx").distinct().count()
    verdict = {
        "killed_mid_run": crashed,
        "epochs_committed_before_kill": committed_mid,
        "input_rows": n_input,
        "sink_rows": n_rows,
        "sink_unique_keys": n_unique,
        "exactly_once": n_rows == n_unique == n_input,
        "leg2": leg2,
    }
    print(json.dumps(verdict))
    spark.stop()
    return 0 if verdict["exactly_once"] and crashed else 1


if __name__ == "__main__":
    raise SystemExit(main())
