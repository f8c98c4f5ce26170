"""Round-5 regression tests: ADVICE r4/r5 findings.

  - _keyidx_compact must never write an all-empty compact generation
    (partitionBy on an empty DataFrame emits only _SUCCESS; schema
    inference on that generation then fails every later merge epoch).
  - _keyidx_raw must survive a LEGACY all-empty compact generation.
  - the hot-channel no-op fingerprint must distinguish raw states whose
    file CONTENT differs even when total committed bytes collide.
  - --reset-hot-channel must not delete unreleased rows of conversations
    absent from the new routed set (they are unrecoverable: the post-reset
    replay only regenerates routed keys).
"""

from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_ordered_processing_spark.streaming.sinks import (  # noqa: E402
    _keyidx_base,
    _keyidx_compact,
    _keyidx_raw,
    _write_keyidx_delta,
)

_TS = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _turn_rows(conv, turns):
    return [
        {
            "conv_id": conv,
            "turn_idx": t,
            "role": "user",
            "text": f"{conv}-{t}",
            "tool": None,
            "ts": _TS + datetime.timedelta(seconds=t),
        }
        for t in turns
    ]


def _turns_df(spark, rows):
    from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _empty_data(spark):
    return _turns_df(spark, []).select("conv_id", "turn_idx")


def test_keyidx_all_empty_fold_writes_no_compact(spark, tmp_path):
    """>_KEYIDX_COMPACT_AFTER all-empty deltas (cold start: only status
    rows commit) must NOT produce a compact generation — and the index must
    stay readable and correct once real data arrives."""
    data_path = str(tmp_path / "data")
    os.makedirs(data_path)
    for epoch in range(10):
        _write_keyidx_delta(_empty_data(spark), data_path, epoch)
    _keyidx_compact(spark, data_path)
    base = _keyidx_base(data_path)
    assert not [d for d in os.listdir(base) if d.startswith("compact=")]
    assert _keyidx_raw(spark, data_path).count() == 0

    # real data arrives: the next fold collects everything, correctly
    real = spark.createDataFrame(
        [("c1", 7)], "conv_id string, turn_idx int"
    )
    _write_keyidx_delta(real, data_path, 10)
    _keyidx_compact(spark, data_path)
    compacts = [d for d in os.listdir(base) if d.startswith("compact=")]
    assert compacts == ["compact=10"]
    idx = _keyidx_raw(spark, data_path).collect()
    assert [(r["conv_id"], r["hi_turn"]) for r in idx] == [("c1", 7)]


def test_keyidx_raw_survives_legacy_empty_compact(spark, tmp_path):
    """A legacy sink may already hold an all-empty compact generation
    (written before the skip guard): the explicit-schema read must return
    it as empty instead of failing parquet schema inference forever."""
    data_path = str(tmp_path / "data")
    legacy = os.path.join(_keyidx_base(data_path), "compact=5")
    os.makedirs(legacy)
    open(os.path.join(legacy, "_SUCCESS"), "w").close()
    assert _keyidx_raw(spark, data_path).count() == 0
    # and deltas written after the legacy empty generation are still seen
    real = spark.createDataFrame([("c2", 3)], "conv_id string, turn_idx int")
    _write_keyidx_delta(real, data_path, 6)
    idx = _keyidx_raw(spark, data_path).collect()
    assert [(r["conv_id"], r["hi_turn"]) for r in idx] == [("c2", 3)]


def test_hot_fingerprint_not_fooled_by_equal_totals(tmp_path):
    """Two raw-channel states with IDENTICAL (max_epoch, n_epochs, total
    bytes) but different file layouts must fingerprint differently (the
    r4 total-bytes fingerprint collided and silently skipped ordering)."""
    from dataflow_ordered_processing_spark.streaming.hotkey import _raw_state

    def build(root, sizes):
        ep = os.path.join(root, "epoch=0")
        os.makedirs(ep)
        open(os.path.join(ep, "_SUCCESS"), "w").close()
        for name, size in sizes.items():
            with open(os.path.join(ep, name), "wb") as f:
                f.write(b"x" * size)
        return root, [ep]

    a = _raw_state(*build(str(tmp_path / "a"), {"part-a.parquet": 3, "part-b.parquet": 5}))
    b = _raw_state(*build(str(tmp_path / "b"), {"part-a.parquet": 5, "part-b.parquet": 3}))
    assert a["raw_max_epoch"] == b["raw_max_epoch"]
    assert a["raw_epochs"] == b["raw_epochs"]
    assert a["raw_files_md5"] != b["raw_files_md5"]


def test_reset_refuses_to_lose_unreleased_removed_keys(spark, tmp_path):
    """--reset-hot-channel with a shrunk routed set: conv 'gap' has
    unreleasable rows (no turn 1) and is absent from the new set — the
    reset must refuse instead of deleting them; keeping it routed (or
    draining everything releasable) lets the reset proceed."""
    from jobs.run_pipeline import _check_hot_marker
    from dataflow_ordered_processing_spark.streaming.hotkey import read_hot_ordered

    out = str(tmp_path / "out")
    ckpt_hot = str(tmp_path / "ckpt-hot")
    hot_raw = os.path.join(out, "hot_raw")
    rows = _turn_rows("gap", [2, 3]) + _turn_rows("ok", [1, 2])
    _turns_df(spark, rows).write.parquet(os.path.join(hot_raw, "epoch=0"))

    with pytest.raises(ValueError, match="permanently lose"):
        _check_hot_marker(spark, out, ckpt_hot, hot_raw, {"ok"}, reset=True)
    # the refusing attempt still DRAINED what it could: 'ok' is released
    released = read_hot_ordered(spark, os.path.join(out, "hot_ordered"))
    assert released.filter("conv_id = 'ok'").count() == 2
    assert os.path.isdir(hot_raw)  # nothing was deleted

    # keeping the gapped conv routed makes the reset safe
    _check_hot_marker(spark, out, ckpt_hot, hot_raw, {"gap", "ok"}, reset=True)
    assert not os.path.isdir(hot_raw)
