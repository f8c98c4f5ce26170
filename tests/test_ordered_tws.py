"""transformWithStateInPandas ordered processor: parity with the serial
oracle and the classic applyInPandasWithState operator."""

import pandas as pd
import pytest

from dataflow_ordered_processing_spark.sources.scenarios import scenario, serial_oracle
from dataflow_ordered_processing_spark.streaming.ordered_tws import (
    ROCKSDB_PROVIDER,
    ordered_stream_tws,
    tws_available,
)

from streaming_utils import StagedStream

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas requires the protobuf package "
    "(pyspark's state-server protocol); not present in this image",
)

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
