"""transformWithStateInPandas ordered processor: parity with the serial
oracle and the classic applyInPandasWithState operator.

Two tiers of evidence:

  1. RUNTIME tests (skipped in this image): the full Spark
     transformWithStateInPandas path needs `google.protobuf` on the Python
     side (pyspark's state-server protocol imports StateMessage_pb2).
     protobuf is not in the image, pip install is forbidden, and the sandbox
     has no network (maven/pypi DNS fails — re-verified 2026-08-16 round 3).
  2. BODY tests (run everywhere): OrderedProcessor's handleInputRows driven
     with a FAKE StatefulProcessorHandle (ValueState/ListState dict
     doubles) — the exact production class, every scenario, compared
     row-level to the serial oracle. Same trick test_property_ordering.py
     uses on the classic stateful func. These prove the engine's logic
     (append-only buffer, gap-close drain, duplicate surfacing, depth
     snapshots); only the Spark wire protocol remains untested.
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from dataflow_ordered_processing_spark.sources import scenarios
from dataflow_ordered_processing_spark.sources.scenarios import scenario, serial_oracle
from dataflow_ordered_processing_spark.streaming.ordered_tws import (
    ROCKSDB_PROVIDER,
    OrderedProcessor,
    TwsConfig,
    ordered_stream_tws,
    tws_available,
    tws_probe_error,
)

from streaming_utils import StagedStream

# Skip condition AND reason both come from the import probe: an image that
# gains protobuf makes tws_probe_error() return None and this tier runs with
# zero manual steps; until then the skip reason carries the actual error.
requires_tws = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs pyspark's protobuf-backed "
    f"state-server protocol; probe: {tws_probe_error()}",
)


def test_tws_cap_requires_explicit_ack():
    """ADVICE r3: a drain cap on the timerless TWS engine can strand a
    contiguous remainder forever; that semantics must be acknowledged at
    config time, not discovered in production."""
    with pytest.raises(ValueError, match="ack_arrivals_driven_drain"):
        TwsConfig(max_emit_per_batch=2)
    TwsConfig()  # no cap → no ack required
    TwsConfig(max_emit_per_batch=2, ack_arrivals_driven_drain=True)  # explicit opt-in

CMP = ["conv_id", "turn_idx", "role", "text", "tool", "emit_seq"]
DEPTH = ["n_user_cum", "n_assistant_cum", "n_tool_cum", "chars_cum"]


@pytest.fixture()
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield spark
    if old:
        spark.conf.set(key, old)
    else:
        spark.conf.unset(key)


def _run(spark, tmp_path, batches, name):
    st = StagedStream(spark, str(tmp_path))
    q = (
        ordered_stream_tws(st.source())
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    for b in batches:
        st.push(b)
        q.processAllAvailable()
    return q


@pytest.mark.parametrize(
    "scen", ["perfect_order", "reverse_order", "duplicates", "random_permutation",
             "multi_conversation", "gap_never_arrives", "skewed"]
)
@requires_tws
def test_tws_matches_serial_oracle(rocksdb, tmp_path, scen):
    spark = rocksdb
    batches = scenario(scen)
    q = _run(spark, tmp_path, batches, f"tws_{scen}")
    try:
        got = (
            spark.sql(f"SELECT * FROM tws_{scen} WHERE row_type='data'")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            serial_oracle(batches)
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        got["turn_idx"] = got["turn_idx"].astype("int64")
        want["turn_idx"] = want["turn_idx"].astype("int64")
        pd.testing.assert_frame_equal(got[CMP], want[CMP])
    finally:
        q.stop()


@requires_tws
def test_tws_status_and_final_counts(rocksdb, tmp_path):
    spark = rocksdb
    batches = scenario("duplicates")
    q = _run(spark, tmp_path, batches, "tws_status")
    try:
        st = spark.sql(
            "SELECT * FROM tws_status WHERE row_type='status' ORDER BY received_count"
        ).toPandas()
        last = st.iloc[-1]
        assert last["duplicate_count"] == 2
        assert last["received_count"] == 5
        assert last["result_count"] == 3
        assert last["buffered_count"] == 0
        assert last["last_event_received"]
    finally:
        q.stop()


@requires_tws
def test_tws_depth_snapshot(rocksdb, tmp_path):
    spark = rocksdb
    batches = scenario("random_permutation")
    q = _run(spark, tmp_path, batches, "tws_depth")
    try:
        got = (
            spark.sql("SELECT * FROM tws_depth WHERE row_type='data'")
            .toPandas()
            .sort_values("turn_idx")
            .reset_index(drop=True)
        )
        roles = got["role"]
        assert list(got["n_user_cum"]) == list((roles == "user").cumsum())
        assert list(got["chars_cum"]) == list(got["text"].str.len().cumsum())
    finally:
        q.stop()


# ----------------------------------------------------- body-level harness
# Fake StatefulProcessorHandle: dict-backed ValueState/ListState doubles
# matching pyspark.sql.streaming.stateful_processor's surface. Drives the
# PRODUCTION OrderedProcessor class without the protobuf wire protocol.


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeListState:
    def __init__(self):
        self._rows = []

    def exists(self):
        return bool(self._rows)

    def get(self):
        return iter(list(self._rows))

    def put(self, rows):
        self._rows = list(rows)

    def appendValue(self, v):
        self._rows.append(tuple(v))

    def appendList(self, rows):
        self._rows.extend(tuple(r) for r in rows)

    def clear(self):
        self._rows = []


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())


def _run_body(batches, cfg=None):
    """Feed scenario batches through one OrderedProcessor per key (state is
    per-key in real transformWithState); returns (data_rows, status_rows)."""
    procs: dict[str, OrderedProcessor] = {}

    def proc_for(conv_id):
        if conv_id not in procs:
            p = OrderedProcessor(cfg)
            p.init(FakeHandle())
            procs[conv_id] = p
        return procs[conv_id]

    data, status = [], []
    for batch in batches:
        for conv_id, g in batch.groupby("conv_id", sort=True):
            frames = list(
                proc_for(conv_id).handleInputRows(
                    (conv_id,), iter([g.reset_index(drop=True)]), None
                )
            )
            for f in frames:
                data.append(f[f["row_type"] == "data"])
                status.append(f[f["row_type"] == "status"])
    data = [d for d in data if len(d)]
    status = [s for s in status if len(s)]
    return (
        pd.concat(data, ignore_index=True) if data else pd.DataFrame(columns=CMP),
        pd.concat(status, ignore_index=True) if status else pd.DataFrame(),
    )


@pytest.mark.parametrize(
    "scen", ["perfect_order", "reverse_order", "duplicates", "random_permutation",
             "multi_conversation", "gap_never_arrives", "skewed"]
)
def test_tws_body_matches_serial_oracle(scen):
    batches = scenario(scen)
    got, _ = _run_body(batches)
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = serial_oracle(batches).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    got["emit_seq"] = got["emit_seq"].astype("int64")
    pd.testing.assert_frame_equal(got[CMP], want[CMP].astype({"emit_seq": "int64"}))


def test_tws_body_status_and_final_counts():
    _, st = _run_body(scenario("duplicates"))
    st = st.sort_values("received_count").reset_index(drop=True)
    last = st.iloc[-1]
    assert last["duplicate_count"] == 2
    assert last["received_count"] == 5
    assert last["result_count"] == 3
    assert last["buffered_count"] == 0
    assert last["last_event_received"]


def test_tws_body_depth_snapshot():
    got, _ = _run_body(scenario("random_permutation"))
    got = got.sort_values("turn_idx").reset_index(drop=True)
    roles = got["role"]
    assert list(got["n_user_cum"]) == list((roles == "user").cumsum())
    assert list(got["chars_cum"]) == list(got["text"].str.len().cumsum())


def test_tws_body_append_only_until_gap_closes():
    """The design point of this engine: arrivals beyond an open gap must
    APPEND to the ListState without reading it; the list is materialized
    only when the gap closes."""
    reads = []

    class SpyListState(FakeListState):
        def get(self):
            reads.append(len(self._rows))
            return super().get()

    class SpyHandle(FakeHandle):
        def getListState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, SpyListState())

    p = OrderedProcessor(TwsConfig())
    p.init(SpyHandle())
    import datetime

    def rows(*turns):
        return pd.DataFrame(
            {
                "conv_id": ["c"] * len(turns),
                "turn_idx": pd.Series(turns, dtype="int32"),
                "role": ["user"] * len(turns),
                "text": [f"t{t}" for t in turns],
                "tool": [None] * len(turns),
                "ts": [datetime.datetime(2026, 1, 1)] * len(turns),
            }
        )

    for turns in [(3,), (5,), (4,)]:  # all buffer behind the 1..2 gap
        list(p.handleInputRows(("c",), iter([rows(*turns)]), None))
    assert reads == []  # buffer never read while the gap is open
    out = list(p.handleInputRows(("c",), iter([rows(1, 2)]), None))
    assert reads == [3]  # exactly one materialization, at gap close
    data = pd.concat(out)
    emitted = data[data["row_type"] == "data"]["turn_idx"].astype(int).tolist()
    assert emitted == [1, 2, 3, 4, 5]


def test_tws_body_capped_drain_resumes_on_next_arrival():
    """O9: max_emit_per_batch caps each invocation's drain; the contiguous
    remainder drains on subsequent arrivals for the key (this engine has no
    timers — divergence documented in TwsConfig)."""
    import datetime

    p = OrderedProcessor(TwsConfig(max_emit_per_batch=2, ack_arrivals_driven_drain=True))
    p.init(FakeHandle())

    def rows(*turns):
        return pd.DataFrame(
            {
                "conv_id": ["c"] * len(turns),
                "turn_idx": pd.Series(turns, dtype="int32"),
                "role": ["user"] * len(turns),
                "text": [f"t{t}" for t in turns],
                "tool": [None] * len(turns),
                "ts": [datetime.datetime(2026, 1, 1)] * len(turns),
            }
        )

    def feed(*turns):
        out = []
        for f in p.handleInputRows(("c",), iter([rows(*turns)]), None):
            d = f[f["row_type"] == "data"]
            out.extend(int(t) for t in d["turn_idx"])
        return out

    assert feed(3, 1, 2, 4, 5) == [1, 2]  # capped at 2, rest buffered
    # a duplicate re-delivery is enough of an arrival to resume the drain
    assert feed(1) == [3, 4]
    assert feed(1) == [5]
    assert feed(6) == [6]  # back to normal flow once drained


@given(st.permutations([1, 2, 3, 4, 5, 6, 7]), st.integers(min_value=1, max_value=3))
@settings(max_examples=50, deadline=None)
def test_tws_body_cap_never_changes_final_result(perm, cap):
    """Property: any cap, any arrival order — once enough arrivals flush the
    remainder, the emitted sequence equals the uncapped serial result."""
    import datetime

    from hypothesis import assume

    p = OrderedProcessor(TwsConfig(max_emit_per_batch=cap, ack_arrivals_driven_drain=True))
    p.init(FakeHandle())
    emitted = []

    def feed(turns):
        frames = pd.DataFrame(
            {
                "conv_id": ["c"] * len(turns),
                "turn_idx": pd.Series(turns, dtype="int32"),
                "role": ["user"] * len(turns),
                "text": [f"t{t}" for t in turns],
                "tool": [None] * len(turns),
                "ts": [datetime.datetime(2026, 1, 1)] * len(turns),
            }
        )
        for f in p.handleInputRows(("c",), iter([frames]), None):
            d = f[f["row_type"] == "data"]
            emitted.extend(int(t) for t in d["turn_idx"])

    for t in perm:
        feed([t])
    for _ in range(10):  # duplicate re-deliveries flush the capped remainder
        if len(emitted) == 7:
            break
        feed([1])
    assert emitted == [1, 2, 3, 4, 5, 6, 7]


# ---------------------------------------------------------------- CEP (r6)
def _run_body_cep(batches, cfg):
    """Like _run_body but also collects row_type='match' frames and exposes
    the per-conv processors (to inspect carry state)."""
    procs: dict[str, OrderedProcessor] = {}

    def proc_for(conv_id):
        if conv_id not in procs:
            p = OrderedProcessor(cfg)
            p.init(FakeHandle())
            procs[conv_id] = p
        return procs[conv_id]

    matches = []
    for batch in batches:
        for conv_id, g in batch.groupby("conv_id", sort=True):
            for f in proc_for(conv_id).handleInputRows(
                (conv_id,), iter([g.reset_index(drop=True)]), None
            ):
                m = f[f["row_type"] == "match"]
                if len(m):
                    matches.append(m)
    out = (
        pd.concat(matches, ignore_index=True)
        if matches
        else pd.DataFrame(columns=["conv_id", "match_start_idx", "match_end_idx"])
    )
    return out, procs


def test_tws_cep_matches_equal_batch_matcher():
    """TWS engine body: strict matches across chunked out-of-order arrival
    equal the reference matcher over the whole conversation, each once."""
    from dataflow_ordered_processing_spark.operators.cep_core import (
        Step,
        empty_carry,
        match_strict,
    )

    steps = (
        Step("u", role="user"),
        Step("a", role="assistant"),
        Step("t", role="tool"),
    )
    full = scenarios.conversation(4, 13)
    b1 = full[full.turn_idx % 2 == 0]
    b2 = full[full.turn_idx % 2 == 1]
    cfg = TwsConfig(pattern=steps)
    got, _ = _run_body_cep([b1, b2], cfg)
    cols = {
        "turn_idx": full["turn_idx"].to_numpy(dtype="int64"),
        "role": full["role"].to_numpy(),
        "tool": full["tool"].to_numpy(),
        "ts_us": full["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
    }
    expect, _ = match_strict(steps, cols, empty_carry())
    assert sorted(
        zip(got["match_start_idx"].astype("int64"), got["match_end_idx"].astype("int64"))
    ) == sorted(zip(expect["start_idx"].tolist(), expect["end_idx"].tolist()))
    assert len(got) > 0


def test_tws_cep_carry_cleared_at_completion():
    from dataflow_ordered_processing_spark.operators.cep_core import Step

    steps = (Step("u", role="user"), Step("a", role="assistant"))
    full = scenarios.conversation(4, 6)
    cfg = TwsConfig(pattern=steps)
    _, procs = _run_body_cep([full.iloc[:4], full.iloc[4:]], cfg)
    proc = procs["conv-000004"]
    assert not proc.cep_state.exists()  # completion dropped the carry
