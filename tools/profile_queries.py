"""Round-8 profiling harness (guide §1): time each declared query twice in
one session (cold → warm) to separate one-time JVM/codegen/Python-worker
warmup from steady-state cost, using the noop sink so the full plan runs
without sink effects. Not part of the frozen bench.

Usage: python tools/profile_queries.py [query ...]  (default: the heavy set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "ordered_emit",
    "ordered_salted",
    "ordered_status",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "dedup_pipeline",
    "training_mix",
    "multimodal_features",
    "ivf_topk",
    "stream_dedup",
    "cep_strict",
    "cep_funnel",
    "cep_times",
    "user_assistant_pairs",
    "session_windows",
    "lsh_topk",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from dataflow_ordered_processing_spark.session import get_spark

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=cpus)

    fns = {
        "ordered_emit": E._q_ordered_emit,
        "ordered_salted": E._q_ordered_emit_salted,
        "ordered_status": E._q_ordered_status,
        "dedup_exact": E._q_dedup_exact,
        "minhash_lsh_pairs": E._q_minhash_pairs,
        "ngram_jaccard": E._q_ngram_jaccard,
        "dedup_pipeline": E._q_dedup_pipeline,
        "training_mix": E._q_training_mix,
        "multimodal_features": E._q_multimodal_features,
        "ivf_topk": E._q_ivf_topk,
        "stream_dedup": E._q_stream_dedup,
        "cep_strict": E._q_cep_strict,
        "cep_funnel": E._q_cep_funnel,
        "cep_times": E._q_cep_times,
        "user_assistant_pairs": E._q_user_assistant,
        "session_windows": E._q_session,
        "lsh_topk": E._q_lsh_topk,
        "tumbling_tool_counts": E._q_tumbling,
        "sliding_turn_rate": E._q_sliding,
        "events_sessionize": E._q_events_sessionize,
        "role_rollup": E._q_role_rollup,
        "trailing_avg": E._q_trailing_avg,
        "simhash": E._q_simhash,
        "vocab_topk": E._q_vocab_topk,
        "ivf_topk_indexed": E._q_ivf_topk_indexed,
        "brute_force_topk": E._q_brute_topk,
        "pricing_summary": E._q_pricing_summary,
        "revenue_by_nation": E._q_revenue_by_nation,
    }
    names = sys.argv[1:] or HEAVY
    out = {}
    for name in names:
        fn = fns[name]
        times = []
        for rep in range(2):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name}: cold={times[0]} warm={times[1]}", flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
