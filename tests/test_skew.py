"""Two-phase salted ordering (skew path) must produce byte-identical output
to the single-phase plan and the serial oracle — with and without gaps,
duplicates, and a mega-key."""

import pandas as pd
import pytest

from dataflow_ordered_processing_spark.operators.ordered_batch import ordered_emit_batch
from dataflow_ordered_processing_spark.operators.skew import (
    adaptive_ordered_emit_batch,
    salted_ordered_emit_batch,
)
from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA
from dataflow_ordered_processing_spark.sources.scenarios import (
    conversation,
    scenario,
    serial_oracle,
)

CMP = ["conv_id", "turn_idx", "role", "text", "tool", "emit_seq"]


def _cmp(got_df, want_pdf):
    got = got_df.select(*CMP).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want_pdf[CMP].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    want["emit_seq"] = want["emit_seq"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("name", ["skewed", "duplicates", "gap_never_arrives", "multi_conversation"])
@pytest.mark.parametrize("block", [4, 16, 1024])
def test_salted_matches_oracle(spark, name, block):
    batches = scenario(name)
    df = spark.createDataFrame(pd.concat(batches, ignore_index=True), schema=TRANSCRIPT_SCHEMA)
    _cmp(salted_ordered_emit_batch(df, block=block), serial_oracle(batches))


def test_mega_key_with_gap_and_block_boundary(spark):
    # 5000-turn conversation, gap exactly at a block boundary (turn 2049
    # missing with block=1024) plus a gap inside a block (turn 100 missing).
    conv = conversation(7, 5000)
    damaged = conv[~conv["turn_idx"].isin([100, 2049])]
    df = spark.createDataFrame(damaged, schema=TRANSCRIPT_SCHEMA)
    out = salted_ordered_emit_batch(df, block=1024).toPandas()
    # prefix stops at 99 (first gap), regardless of block structure
    assert out["turn_idx"].max() == 99
    assert len(out) == 99
    assert sorted(out["emit_seq"]) == list(range(1, 100))


def test_adaptive_routing_matches_single_phase(spark):
    batches = scenario("skewed")
    pdf = pd.concat(batches, ignore_index=True)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    adaptive = adaptive_ordered_emit_batch(df, hot_threshold=40, block=16)
    single = ordered_emit_batch(df, impl="sql")
    _cmp(adaptive, single.select(*CMP).toPandas())
