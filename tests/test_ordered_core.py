"""Unit tests for the pure-pandas ordering state machine — the layer-1 tests
of SURVEY.md §5 (reference analog: MatcherTest / pipeline test expectations in
OrderBookProcessingPipelineTest.java:128-132,180-191)."""

import numpy as np
import pandas as pd
import pytest

from dataflow_ordered_processing_spark.operators.ordered_core import (
    OrderedState,
    apply_batch,
    status_dict,
)
from dataflow_ordered_processing_spark.sources.scenarios import (
    SCENARIOS,
    scenario,
    serial_oracle,
)


def _to_core(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000)


def _run(batches):
    states: dict[str, OrderedState] = {}
    emitted = []
    for b in batches:
        for conv_id, grp in b.groupby("conv_id"):
            st = states.setdefault(conv_id, OrderedState())
            out = apply_batch(st, _to_core(grp))
            out["conv_id"] = conv_id
            emitted.append(out)
    return states, pd.concat(emitted, ignore_index=True)


def test_perfect_order_processes_every_event_on_arrival():
    # reference: every event processed on arrival, buffered_count == 0
    # (OrderBookProcessingPipelineTest.java:128-132)
    st = OrderedState()
    batches = scenario("perfect_order")
    for i, b in enumerate(batches, start=1):
        out = apply_batch(st, _to_core(b))
        assert len(out) == 1
        assert st.last_emitted == i
        assert st.buffered_count == 0
        assert st.received_count == i
        assert st.result_count == i
        assert st.duplicate_count == 0


def test_reverse_order_buffers_then_drains():
    # reference: statuses (buffered=1, earliest=3) → (buffered=2, earliest=2)
    # → (last_emitted=3, buffered=0, result=3), all output on 3rd arrival
    # (OrderBookProcessingPipelineTest.java:180-191)
    st = OrderedState()
    b3, b2, b1 = scenario("reverse_order")

    out = apply_batch(st, _to_core(b3))
    assert len(out) == 0
    assert (st.buffered_count, st.earliest_buffered, st.latest_buffered) == (1, 3, 3)
    assert st.last_event_received  # turn 3 is the sentinel, detected on arrival

    out = apply_batch(st, _to_core(b2))
    assert len(out) == 0
    assert (st.buffered_count, st.earliest_buffered, st.latest_buffered) == (2, 2, 3)

    out = apply_batch(st, _to_core(b1))
    assert list(out["turn_idx"]) == [1, 2, 3]
    assert list(out["emit_seq"]) == [1, 2, 3]
    assert (st.last_emitted, st.buffered_count, st.result_count) == (3, 0, 3)
    assert st.complete


def test_duplicates_discarded_and_counted():
    # docs/pipeline-design.md:115-122
    st = OrderedState()
    for b in scenario("duplicates"):
        apply_batch(st, _to_core(b))
    assert st.result_count == 3
    assert st.duplicate_count == 2
    assert st.received_count == 5
    assert st.buffered_count == 0


def test_duplicate_inside_single_batch():
    b = scenario("batch_in_order")[0]
    doubled = pd.concat([b, b.iloc[[0, 2]]], ignore_index=True)
    st = OrderedState()
    out = apply_batch(st, _to_core(doubled))
    assert list(out["turn_idx"]) == [1, 2, 3]
    assert st.duplicate_count == 2


def test_gap_never_arrives_leaves_buffer():
    st = OrderedState()
    for b in scenario("gap_never_arrives"):
        apply_batch(st, _to_core(b))
    assert st.last_emitted == 2
    assert (st.earliest_buffered, st.latest_buffered, st.buffered_count) == (4, 5, 2)
    assert not st.complete  # sentinel (turn 5) received but gap remains
    s = status_dict("conv-000001", st)
    assert s["last_event_received"] is True and s["buffered_count"] == 2


def test_max_emit_caps_drain_but_resumes():
    df = pd.concat(scenario("random_permutation"), ignore_index=True)
    st = OrderedState()
    out1 = apply_batch(st, _to_core(df), max_emit=10)
    assert list(out1["turn_idx"]) == list(range(1, 11))
    assert st.buffered_count == 40
    out2 = apply_batch(st, _to_core(df.head(0)), max_emit=None)
    assert list(out2["turn_idx"]) == list(range(11, 51))
    assert st.result_count == 50


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_all_scenarios_match_serial_oracle(name):
    batches = scenario(name)
    _, emitted = _run(batches)
    oracle = serial_oracle(batches)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "emit_seq"]
    got = emitted[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = oracle[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_emit_seq_is_emission_order_across_batches():
    st = OrderedState()
    df = scenario("random_permutation")
    all_out = []
    for b in df:
        all_out.append(apply_batch(st, _to_core(b)))
    out = pd.concat(all_out, ignore_index=True)
    assert list(out["emit_seq"]) == list(range(1, 51))
    assert list(out["turn_idx"]) == list(range(1, 51))
    # within-conversation ts must be nondecreasing once ordered
    assert (np.diff(out["ts_us"].to_numpy()) >= 0).all()
