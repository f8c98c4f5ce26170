"""Property-based tests (hypothesis) for the ordering state machine — any
arrival permutation, any batching, any duplication/gap pattern must drain to
exactly the serial oracle. The reference has no property tests
(SURVEY.md §5); this goes beyond its example-based suite."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from dataflow_ordered_processing_spark.operators.ordered_core import (
    OrderedState,
    apply_batch,
)

T0 = datetime(2026, 1, 1)


def _rows(turn_idxs):
    return pd.DataFrame(
        {
            "turn_idx": pd.Series(turn_idxs, dtype="int64"),
            "role": ["user"] * len(turn_idxs),
            "text": [f"t{t}" for t in turn_idxs],
            "tool": [None] * len(turn_idxs),
            "ts_us": [int((T0 + timedelta(seconds=30 * t)).timestamp() * 1e6) for t in turn_idxs],
        }
    )


@st.composite
def arrival_plan(draw):
    """A set of turns (with a possible gap), duplicated arbitrarily,
    permuted, and split into arbitrary batches."""
    n = draw(st.integers(min_value=1, max_value=60))
    present = draw(
        st.sets(st.integers(min_value=1, max_value=n), min_size=1, max_size=n)
    )
    dups = draw(
        st.lists(st.sampled_from(sorted(present)), min_size=0, max_size=10)
    )
    seq = sorted(present) + dups
    perm = draw(st.permutations(seq))
    n_batches = draw(st.integers(min_value=1, max_value=6))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(perm)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(perm)]:
        batches.append(perm[prev:c])
        prev = c
    return present, seq, batches


@given(arrival_plan())
@settings(max_examples=200, deadline=None)
def test_any_arrival_plan_matches_serial_oracle(plan):
    present, seq, batches = plan
    st_ = OrderedState()
    emitted = []
    for b in batches:
        out = apply_batch(st_, _rows(b))
        emitted.extend(out["turn_idx"].tolist())

    # oracle: maximal contiguous prefix of the present set, in order
    expected = []
    t = 1
    while t in present:
        expected.append(t)
        t += 1
    assert emitted == expected
    # counters
    assert st_.received_count == len(seq)
    assert st_.result_count == len(expected)
    assert st_.duplicate_count == len(seq) - len(present)
    assert st_.buffered_count == len(present) - len(expected)
    # buffer holds exactly the non-drained turns, sorted
    assert st_.buffer["turn_idx"].tolist() == sorted(present - set(expected))
    # emit_seq/depth invariants
    if expected:
        assert st_.last_emitted == expected[-1]
        assert st_.n_user == len(expected)  # all rows are 'user' here
        assert st_.chars == sum(len(f"t{t}") for t in expected)


@given(arrival_plan(), st.integers(min_value=1, max_value=7))
@settings(max_examples=100, deadline=None)
def test_max_emit_never_changes_the_final_result(plan, cap):
    present, seq, batches = plan
    st_ = OrderedState()
    emitted = []
    for b in batches:
        out = apply_batch(st_, _rows(b), max_emit=cap)
        emitted.extend(out["turn_idx"].tolist())
    # keep draining with empty batches until the capped runs flush
    for _ in range(200):
        out = apply_batch(st_, _rows([]), max_emit=cap)
        if not len(out):
            break
        emitted.extend(out["turn_idx"].tolist())

    expected = []
    t = 1
    while t in present:
        expected.append(t)
        t += 1
    assert emitted == expected
    assert st_.duplicate_count == len(seq) - len(present)


# ------------------------- sharded engine: same properties, real func body
class _FakeGroupState:
    """Minimal GroupState stand-in to drive make_sharded_func directly —
    tests the exact production function body without a Spark session."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _shard_batch(conv_turns):
    """conv_turns: list of (conv_id, turn_idx) arrival rows, in order."""
    n = len(conv_turns)
    return pd.DataFrame(
        {
            "conv_id": [c for c, _ in conv_turns],
            "turn_idx": pd.Series([t for _, t in conv_turns], dtype="int32"),
            "role": ["user"] * n,
            "text": [f"t{t}" for _, t in conv_turns],
            "tool": [None] * n,
            "ts": [T0 + timedelta(seconds=30 * t) for _, t in conv_turns],
        }
    )


@given(st.lists(arrival_plan(), min_size=1, max_size=3), st.randoms())
@settings(max_examples=50, deadline=None)
def test_sharded_func_multi_conv_matches_serial_oracle(plans, rng):
    from dataflow_ordered_processing_spark.streaming.ordered_sharded import (
        make_sharded_func,
    )
    from dataflow_ordered_processing_spark.streaming.ordered_stream import (
        OrderedStreamConfig,
    )

    func = make_sharded_func(OrderedStreamConfig())
    state = _FakeGroupState()
    # interleave the per-conv batch lists into shared shard batches
    n_rounds = max(len(p[2]) for p in plans)
    emitted: dict[str, list] = {f"c{i}": [] for i in range(len(plans))}
    for r in range(n_rounds):
        rows = []
        for i, (_present, _seq, batches) in enumerate(plans):
            if r < len(batches):
                rows.extend((f"c{i}", t) for t in batches[r])
        rng.shuffle(rows)
        if not rows:
            continue
        for frame in func((0,), iter([_shard_batch(rows)]), state):
            data = frame[frame["row_type"] == "data"]
            for conv, t in zip(data["conv_id"], data["turn_idx"]):
                emitted[conv].append(int(t))

    for i, (present, _seq, _batches) in enumerate(plans):
        expected = []
        t = 1
        while t in present:
            expected.append(t)
            t += 1
        assert emitted[f"c{i}"] == expected, f"conv c{i}"


# --------------------- TWS engine: same properties, real processor body
@given(arrival_plan())
@settings(max_examples=100, deadline=None)
def test_tws_body_any_arrival_plan_matches_serial_oracle(plan):
    """Every arrival permutation/batching/duplication drains the
    transformWithState processor body to exactly the serial oracle —
    including the append-only in-buffer-duplicate divergence, which must
    CONVERGE once the gap closes (final emitted rows and final
    duplicate_count equal the classic engine's)."""
    from test_ordered_tws import FakeHandle
    from dataflow_ordered_processing_spark.streaming.ordered_tws import (
        OrderedProcessor,
    )

    present, seq, batches = plan
    p = OrderedProcessor()
    p.init(FakeHandle())
    emitted, last_status = [], None
    for b in batches:
        if not len(b):
            continue
        rows = _rows(b).rename(columns={"ts_us": "ts"})
        rows["ts"] = pd.to_datetime(rows["ts"], unit="us")
        rows.insert(0, "conv_id", "c")
        for frame in p.handleInputRows(("c",), iter([rows]), None):
            data = frame[frame["row_type"] == "data"]
            emitted.extend(int(t) for t in data["turn_idx"])
            status = frame[frame["row_type"] == "status"]
            if len(status):
                last_status = status.iloc[-1]

    expected = []
    t = 1
    while t in present:
        expected.append(t)
        t += 1
    assert emitted == expected
    if last_status is not None:
        assert last_status["received_count"] == len(seq)
        assert last_status["result_count"] == len(expected)
        # duplicates of EMITTED turns are counted on arrival; duplicates
        # still sitting in the pending buffer surface at drain time — if
        # the gap never closes they remain uncounted (documented
        # divergence), so the exact-count assertion applies when drained
        if len(expected) == len(present):  # everything drained
            assert last_status["duplicate_count"] == len(seq) - len(present)
