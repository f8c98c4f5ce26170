"""Hardware scaling ceiling: the same per-key pandas/numpy workload the
ordering operator runs, in plain multiprocessing at two process counts —
isolates what the MACHINE gives from what Spark achieves
(cited in BENCH/BASELINE.md).

Usage: python tools/hw_ceiling.py [n 4n] (default 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np
import pandas as pd


def work(n: int) -> float:
    t0 = time.time()
    for _ in range(n):
        df = pd.DataFrame(
            {
                "turn_idx": np.random.default_rng(1).permutation(100),
                "text": ["x" * 40] * 100,
                "role": ["user", "assistant", "tool", "user"] * 25,
            }
        )
        idx = df["turn_idx"].to_numpy()
        order = np.argsort(idx, kind="stable")
        df = df.iloc[order]
        np.cumsum(df["role"].to_numpy() == "user")
        df["text"].str.len().sum()
    return time.time() - t0


def bench(procs: int, total: int = 40000) -> float:
    with mp.Pool(procs) as p:
        p.map(work, [1] * procs)  # warm the pool
        t0 = time.time()
        p.map(work, [total // procs] * procs)
        return time.time() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    four_n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tn, t4n = bench(n), bench(four_n)
    eff = (tn / t4n) / (four_n / n)
    print(
        json.dumps(
            {
                "procs_n": n,
                "procs_4n": four_n,
                "wall_n_s": round(tn, 2),
                "wall_4n_s": round(t4n, 2),
                "hw_scaling_efficiency": round(eff, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
