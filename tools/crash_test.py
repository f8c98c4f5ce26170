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
    ap.add_argument(
        "--pattern", default=None,
        help="crash-test the CEP path: run with this pattern and verify the "
        "sink's match rows are exactly-once and equal the batch operator "
        "over the recovered ordered output",
    )
    ap.add_argument("--pattern-mode", choices=("strict", "skip"), default="strict")
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
    if args.pattern:
        cmd += ["--pattern", args.pattern, "--pattern-mode", args.pattern_mode]

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
    if args.pattern:
        # matches must ALSO be exactly-once across the crash replay and
        # equal the batch operator over the recovered ordered table
        sys.path.insert(0, os.path.join(REPO, "jobs"))
        from run_pipeline import parse_pattern

        from dataflow_ordered_processing_spark.operators.cep_core import Times
        from dataflow_ordered_processing_spark.plans.cep import match_pattern

        steps = list(parse_pattern(args.pattern))
        got_df = read_sink(spark, os.path.join(out, "data"), table="matches")
        got = sorted(
            got_df.select("conv_id", "start_idx", "end_idx")
            .toPandas()
            .itertuples(index=False, name=None)
        )
        exp_m = match_pattern(data, steps, mode=args.pattern_mode)
        if args.pattern_mode == "strict":
            sel = ["conv_id", "CAST(start_idx AS BIGINT)", "CAST(end_idx AS BIGINT)"]
        else:
            first, last = steps[0], steps[-1]
            end_col = (
                f"{last.name}_end_idx" if isinstance(last, Times) else f"{last.name}_idx"
            )
            sel = ["conv_id", f"CAST({first.name}_idx AS BIGINT)",
                   f"CAST({end_col} AS BIGINT)"]
        exp_df = exp_m.selectExpr(
            *sel, *( [f"{end_col} AS _e"] if args.pattern_mode == "skip" else [] )
        )
        if args.pattern_mode == "skip" and isinstance(steps[-1], Times):
            # the generator's conversations never complete (no end
            # sentinel), so a quantified FINAL run touching a conversation's
            # last delivered turn stays OPEN forever on the stream — the
            # matcher correctly never emits it (maximality unproven), while
            # the batch operator treats table-end as the run end. Exclude
            # that class from the expectation; every run closed by a later
            # row (incl. all the micro-batch-boundary deferrals the
            # hi_match sink watermark exists for) stays in.
            from pyspark.sql import functions as FF

            mx = data.groupBy("conv_id").agg(
                FF.max(FF.col("turn_idx").cast("long")).alias("_mx")
            )
            exp_df = (
                exp_df.join(mx, "conv_id")
                .filter(FF.col("_e") < FF.col("_mx"))
                .drop("_mx")
            )
        exp = sorted(
            exp_df.drop("_e").toPandas().itertuples(index=False, name=None)
        )
        verdict["matches"] = {
            "pattern": args.pattern,
            "mode": args.pattern_mode,
            "sink_matches": len(got),
            "batch_matches": len(exp),
            "exactly_once_and_batch_equal": got == exp and len(got) > 0,
        }
        verdict["exactly_once"] = bool(
            verdict["exactly_once"]
            and verdict["matches"]["exactly_once_and_batch_equal"]
        )
    print(json.dumps(verdict))
    spark.stop()
    return 0 if verdict["exactly_once"] and crashed else 1


if __name__ == "__main__":
    raise SystemExit(main())
