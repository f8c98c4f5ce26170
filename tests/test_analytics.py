"""Batch analytics (N1-N6, Q1-Q7 ports) against hand-computed and DuckDB
oracles on the F10 fixture and derived transcripts."""

import duckdb
import pandas as pd

from dataflow_ordered_processing_spark.operators.ordered_batch import (
    ordered_emit_batch,
    ordered_status_batch,
)
from dataflow_ordered_processing_spark.plans import analytics as A
from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA
from dataflow_ordered_processing_spark.sources.scenarios import scenario


def _f10(spark):
    return spark.createDataFrame(scenario("windows_joins")[0], schema=TRANSCRIPT_SCHEMA)


def test_tumbling_tool_counts(spark):
    df = _f10(spark)
    got = A.tumbling_tool_counts(df).toPandas()
    pdf = scenario("windows_joins")[0]
    # totals preserved
    assert got["n_turns"].sum() == len(pdf)
    assert got["n_tool_calls"].sum() == pdf["tool"].notna().sum()
    # every bucket start is 5-min aligned
    assert (got["window_start"].dt.minute % 5 == 0).all()
    assert (got["window_start"].dt.second == 0).all()


def test_sliding_windows_cover_each_row_five_times(spark):
    df = _f10(spark)
    got = A.sliding_turn_rate(df, "10 minutes", "2 minutes").toPandas()
    assert got["n_turns"].sum() == 5 * len(scenario("windows_joins")[0])


def test_session_windows_split_on_silence(spark):
    df = _f10(spark)
    got = A.session_windows(df, "30 minutes").toPandas()
    # F10: 3 bursts per conversation separated by 45-min silences
    assert (got.groupby("conv_id").size() == 3).all()
    assert got["n_turns"].sum() == len(scenario("windows_joins")[0])
    # oracle via gaps-and-islands in pandas
    pdf = scenario("windows_joins")[0].sort_values(["conv_id", "ts"])
    # NOTE: strict > verified empirically — Spark session_window MERGES two
    # events exactly gap apart into one session (boundary-touching windows)
    gaps = pdf.groupby("conv_id")["ts"].diff() > pd.Timedelta(minutes=30)
    n_sessions = int(gaps.sum()) + pdf["conv_id"].nunique()
    assert len(got) == n_sessions


def test_user_assistant_pairs(spark):
    df = _f10(spark)
    got = A.user_assistant_pairs(df, horizon_minutes=10).toPandas()
    # oracle in pandas
    pdf = scenario("windows_joins")[0]
    expected = 0
    for _, g in pdf.groupby("conv_id"):
        users = g[g["role"] == "user"]
        asst = g[g["role"] == "assistant"]
        for u in users.itertuples():
            m = asst[
                (asst["ts"] >= u.ts)
                & (asst["ts"] < u.ts + pd.Timedelta(minutes=10))
                & (asst["turn_idx"] > u.turn_idx)
            ]
            expected += 1 if len(m) else 0
    assert len(got) == expected
    assert (got["assistant_turn_idx"] > got["user_turn_idx"]).all()
    assert not got.duplicated(subset=["conv_id", "user_turn_idx"]).any()


def test_gap_report_and_rollup(spark):
    batches = scenario("gap_never_arrives")
    df = spark.createDataFrame(pd.concat(batches, ignore_index=True), schema=TRANSCRIPT_SCHEMA)
    status = ordered_status_batch(df)
    gaps = A.gap_report(status).toPandas()
    assert len(gaps) == 1
    assert gaps.iloc[0]["gap_size"] == 1  # turn 3 missing
    roll = A.completion_rollup(status).collect()[0]
    assert roll["n_conversations"] == 1
    assert roll["n_complete"] == 0
    assert roll["total_buffered"] == 2


def test_last_n_turns_per_key(spark):
    t = pd.concat(scenario("multi_conversation"), ignore_index=True)
    df = spark.createDataFrame(t, schema=TRANSCRIPT_SCHEMA)
    ordered = ordered_emit_batch(df, impl="sql")
    got = A.last_n_turns_per_key(ordered, 5).toPandas()
    assert (got.groupby("conv_id").size() == 5).all()
    want_max = t.groupby("conv_id")["turn_idx"].max()
    got_max = got.groupby("conv_id")["turn_idx"].max()
    assert (got_max.sort_index().to_numpy() == want_max.sort_index().to_numpy()).all()
