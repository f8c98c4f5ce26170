"""Sharded-state streaming engine: row-level parity with the classic
per-key operator across the scenario suite (same data rows, same statuses,
same duplicate/TTL/capped-drain semantics)."""

import pandas as pd
import pytest

from dataflow_ordered_processing_spark.sources.scenarios import scenario, serial_oracle
from dataflow_ordered_processing_spark.streaming import OrderedStreamConfig

from streaming_utils import run_to_memory

CMP = ["conv_id", "turn_idx", "role", "text", "tool", "emit_seq"]
STATUS_CMP = [
    "conv_id",
    "last_emitted",
    "buffered_count",
    "earliest_buffered",
    "latest_buffered",
    "received_count",
    "result_count",
    "duplicate_count",
    "last_event_received",
]


def _rows(spark, name, row_type, sort_cols):
    return (
        spark.sql(f"SELECT * FROM {name} WHERE row_type = '{row_type}'")
        .toPandas()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "scen",
    ["perfect_order", "reverse_order", "duplicates", "random_permutation",
     "multi_conversation", "skewed", "gap_never_arrives"],
)
def test_sharded_matches_serial_oracle(spark, tmp_path, scen):
    batches = scenario(scen)
    q, name, _ = run_to_memory(spark, str(tmp_path), batches, engine="sharded")
    try:
        got = _rows(spark, name, "data", ["conv_id", "turn_idx"])[CMP]
        want = (
            serial_oracle(batches)[CMP]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        got["turn_idx"] = got["turn_idx"].astype("int64")
        want["turn_idx"] = want["turn_idx"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
    finally:
        q.stop()


def test_sharded_statuses_match_classic(spark, tmp_path):
    """Status rows (the per-batch snapshots) must be identical between the
    two engines, batch for batch."""
    batches = scenario("multi_conversation")
    qa, na, _ = run_to_memory(spark, str(tmp_path) + "/a", batches, engine="classic")
    qb, nb, _ = run_to_memory(spark, str(tmp_path) + "/b", batches, engine="sharded")
    try:
        key = ["conv_id", "received_count"]
        a = _rows(spark, na, "status", key)[STATUS_CMP]
        b = _rows(spark, nb, "status", key)[STATUS_CMP]
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)
    finally:
        qa.stop()
        qb.stop()


def test_sharded_duplicate_counts(spark, tmp_path):
    # default tombstone config: post-completion re-delivery is discarded and
    # counted (with cleanup_on_complete=True it would re-emit, like classic)
    batches = scenario("duplicates")
    q, name, _ = run_to_memory(spark, str(tmp_path), batches, engine="sharded")
    try:
        st = _rows(spark, name, "status", ["received_count"])
        last = st.iloc[-1]
        assert last["duplicate_count"] == 2
        assert last["received_count"] == 5
        assert last["result_count"] == 3
    finally:
        q.stop()


def test_sharded_capped_drain(spark, tmp_path):
    """O9: max_emit_per_batch caps each batch's drain; the remainder emits on
    subsequent arrivals (same contract as the classic engine)."""
    batches = scenario("reverse_order")  # 3,2,1 → full drain on 3rd arrival
    q, name, _ = run_to_memory(
        spark,
        str(tmp_path),
        batches,
        cfg=OrderedStreamConfig(max_emit_per_batch=2),
        engine="sharded",
    )
    try:
        data = _rows(spark, name, "data", ["emit_seq"])
        # capped at 2 on the draining batch; turn 3 stays buffered (no later
        # arrival or timer in this staged run flushes it)
        assert list(data["turn_idx"].astype(int)) == [1, 2]
        st = _rows(spark, name, "status", ["received_count"])
        assert int(st.iloc[-1]["buffered_count"]) == 1
    finally:
        q.stop()
