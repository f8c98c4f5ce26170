"""The streaming ordered processor — applyInPandasWithState over conv_id.

This is the Spark-native reimplementation of Beam's OrderedEventProcessor as
used by the reference pipeline (OrderBookProducer.java:59-76, semantics from
docs/pipeline-design.md and OrderBookProcessingPipelineTest.java:91-195):

  - groupBy("conv_id") hash-partitions the stream so each conversation's
    state lives on exactly one partition (the GroupByKey the reference's
    keyed state implies).
  - Per key, state holds the last-emitted cursor, counters, and a sorted
    columnar buffer of pending out-of-sequence turns (STATE_SCHEMA).
  - Each micro-batch appends its rows to the buffer and drains the maximal
    contiguous run (ordered_core.apply_batch — all vectorized).
  - The same operator emits both ordered data rows and
    OrderedProcessingStatus rows, discriminated by `row_type` — the
    reference's dual-output (results + statuses,
    OrderBookProcessingPipeline.java:107-120).
  - A processing-time timeout emits heartbeat statuses for idle keys with
    buffered gaps (the reference's timer-driven status,
    OrderBookProcessingPipelineTest.java:214-215).
  - When a key's final event was seen and its buffer is empty, state is
    removed (cleanup on lastContractMessage,
    OrderBookEventExaminer.java:46-49).

At 100 TB: state is per-key O(pending gap), not O(history); the only shuffle
is the hash exchange on conv_id; the Python boundary is Arrow-batched and
every per-row operation is numpy. Mega-key skew is handled by the two-phase
salted variant in operators/skew.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..operators import cep_core
from ..operators import ordered_core as core
from ..schemas import (
    STATE_SCHEMA,
    STATE_SCHEMA_CEP,
    STATE_SCHEMA_CEP_SKIP,
    STATE_SCHEMA_CEP_SKIP_Q,
    STREAM_OUTPUT_SCHEMA,
    STREAM_OUTPUT_SCHEMA_CEP,
)

_DEPTH_COLS = ["n_user_cum", "n_assistant_cum", "n_tool_cum", "chars_cum"]
_DATA_COLS = ["turn_idx", "role", "text", "tool", "ts", "emit_seq", *_DEPTH_COLS]
_STATUS_COLS = [
    "last_emitted",
    "buffered_count",
    "earliest_buffered",
    "latest_buffered",
    "received_count",
    "result_count",
    "duplicate_count",
    "last_event_received",
]


@dataclass(frozen=True)
class OrderedStreamConfig:
    """Knobs mirroring the reference's OrderBookProducer options
    (OrderBookProducer.java:41-57)."""

    emit_status_every_batch: bool = True  # produceStatusUpdatesOnEveryEvent analog
    status_heartbeat_ms: int | None = None  # timer-driven status frequency (O10)
    max_emit_per_batch: int | None = None  # maxOutputElementsPerBundle analog (O9)
    initial_turn_idx: int = core.INITIAL_TURN_IDX
    # False (default): on completion keep a ~50-byte tombstone (cursor +
    # counters, empty buffer) so duplicates re-delivered AFTER the final turn
    # are still discarded+counted (docs/pipeline-design.md:115-122). True:
    # remove state eagerly like the reference's cleanup-on-last-event
    # (OrderBookEventExaminer.java:46-49) — then post-completion re-delivery
    # re-emits, and the sink's (conv_id, turn_idx) idempotent MERGE is what
    # guarantees exactly-once.
    cleanup_on_complete: bool = False
    # State TTL (bounds state for turns that never arrive — the reference
    # leaves this open, docs/pipeline-design.md:124-128): when set, a key
    # idle for this long (no arrivals between two timer firings) emits a
    # final status row and its state is EVICTED — pending buffered turns are
    # dropped. Requires status_heartbeat_ms (the timer that detects idleness).
    evict_idle_after_heartbeats: int | None = None
    # CEP (north rule "structured-streaming / CEP engine"): a tuple of
    # cep_core.Step — strict-contiguity pattern matched over the in-order
    # EMITTED turns, once per match even across micro-batch boundaries and
    # capped drains (a (k-1)-turn carry rides in the state; dropped when the
    # conversation completes — the final sentinel delimits pattern scope).
    # Exactly-once at the sink mirrors the data rows' contract: epoch
    # idempotency covers crash replay; under cleanup_on_complete=True (or a
    # TTL eviction) re-delivered turns re-emit AND re-match, and
    # SinkConfig.merge_on_key dedupes BOTH (a match whose end turn is at or
    # below the conversation's committed watermark is dropped with them).
    # Matches surface as row_type='match' rows; output/state use the *_CEP
    # schema variants, so enabling a pattern on an existing checkpoint is
    # refused by the state store's schema-compat check rather than silently
    # mismatching.
    pattern: tuple | None = None
    pattern_within_s: int | None = None  # FlinkCEP within() on first→last ts
    # "strict" (Flink `next`) or "skip" (Flink `followedBy` — the funnel
    # monitor mode, r7): skip state is a partial-match FRONTIER (one open
    # candidate per anchor, (anchor_idx, anchor_ts, next step awaited))
    # instead of the strict carry; matches still surface as row_type='match'
    # and the two modes use DIFFERENT state schemas so a checkpoint written
    # under one refuses the other. Bound open candidates with
    # pattern_within_s / pattern_within_turns for unbounded keys (unbounded
    # candidates otherwise live until the conversation completes).
    pattern_mode: str = "strict"
    pattern_within_turns: int | None = None  # skip: max last_idx - first_idx
    pattern_not_between: dict | None = None  # skip: {segment_i: Step} guards

    def __post_init__(self) -> None:
        # shared validation (raises on strict+skip-only knobs, bad mode,
        # non-Step guards) — fail at config time, not mid-stream; ONE
        # helper for every engine config (review r7b)
        cep_core.validate_pattern_knobs(
            self.pattern,
            self.pattern_mode,
            self.pattern_within_s,
            self.pattern_within_turns,
            self.pattern_not_between,
        )


def _state_to_tuple(st: core.OrderedState) -> tuple:
    # field order MUST match schemas.STATE_SCHEMA
    buf = st.buffer
    return (
        st.last_emitted,
        st.received_count,
        st.result_count,
        st.duplicate_count,
        st.last_event_received,
        st.n_user,
        st.n_assistant,
        st.n_tool,
        st.chars,
        core._col(buf, "turn_idx").tolist(),
        core._col(buf, "role").tolist(),
        core._col(buf, "text").tolist(),
        core._col(buf, "tool").tolist(),
        core._col(buf, "ts_us").tolist(),
        st.idle_heartbeats,
    )


def _state_from_tuple(t: tuple) -> core.OrderedState:
    buf = {
        "turn_idx": np.asarray(list(t[9] or []), dtype="int64"),
        "role": np.asarray(list(t[10] or []), dtype=object),
        "text": np.asarray(list(t[11] or []), dtype=object),
        "tool": np.asarray(list(t[12] or []), dtype=object),
        "ts_us": np.asarray(list(t[13] or []), dtype="int64"),
    }
    return core.OrderedState(
        last_emitted=int(t[0]),
        received_count=int(t[1]),
        result_count=int(t[2]),
        duplicate_count=int(t[3]),
        last_event_received=bool(t[4]),
        n_user=int(t[5]),
        n_assistant=int(t[6]),
        n_tool=int(t[7]),
        chars=int(t[8]),
        idle_heartbeats=int(t[14]) if len(t) > 14 and t[14] is not None else 0,
        buffer=buf,
    )


def _data_frame(conv_id: str, emitted: pd.DataFrame) -> pd.DataFrame:
    """STREAM_OUTPUT_SCHEMA frame of data rows — dict-of-arrays construction,
    no concat, int64-μs → datetime64[us] via view (zero-copy)."""
    n = len(emitted)
    nan = np.full(n, np.nan)
    none = np.full(n, None, dtype=object)
    return pd.DataFrame(
        {
            "row_type": np.full(n, "data", dtype=object),
            "conv_id": np.full(n, conv_id, dtype=object),
            "turn_idx": emitted["turn_idx"].to_numpy(dtype="int32", copy=False),
            "role": emitted["role"].to_numpy(copy=False),
            "text": emitted["text"].to_numpy(copy=False),
            "tool": emitted["tool"].to_numpy(copy=False),
            "ts": emitted["ts_us"].to_numpy(dtype="int64", copy=False).view("M8[us]"),
            "emit_seq": emitted["emit_seq"].to_numpy(dtype="int64", copy=False),
            **{
                c: emitted[c].to_numpy(dtype="int64", copy=False) for c in _DEPTH_COLS
            },
            "status_ts": pd.Series(np.full(n, None), dtype="datetime64[us]"),
            **{c: nan for c in _STATUS_COLS if c != "last_event_received"},
            "last_event_received": none,
        }
    )


def _status_frame(conv_id: str, status: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "row_type": ["status"],
            "conv_id": [conv_id],
            "turn_idx": [None],
            "role": [None],
            "text": [None],
            "tool": [None],
            "ts": pd.Series([None], dtype="datetime64[us]"),
            "emit_seq": [None],
            **{c: [None] for c in _DEPTH_COLS},
            "status_ts": pd.Series(
                [datetime.now(timezone.utc).replace(tzinfo=None)], dtype="datetime64[us]"
            ),
            **{c: [status[c]] for c in _STATUS_COLS},
        }
    )


def _pad_cep(df: pd.DataFrame) -> pd.DataFrame:
    """Add null match columns to a data/status frame (CEP schema variant)."""
    n = len(df)
    for c in ("match_start_idx", "match_end_idx", "match_span_us"):
        df[c] = np.full(n, np.nan)
    for c in ("match_ts_first", "match_ts_last"):
        df[c] = pd.Series(np.full(n, None), dtype="datetime64[us]")
    return df


def _match_frame(conv, matches: dict) -> pd.DataFrame:
    """STREAM_OUTPUT_SCHEMA_CEP frame of match rows. ``conv`` is a single
    conv_id (classic engine) or a per-match ndarray (sharded engine) — ONE
    builder so the match-row layout can never drift between engines."""
    n = len(matches["start_idx"])
    conv_arr = (
        conv if isinstance(conv, np.ndarray) else np.full(n, conv, dtype=object)
    )
    none = np.full(n, None, dtype=object)
    nan = np.full(n, np.nan)
    null_ts = pd.Series(np.full(n, None), dtype="datetime64[us]")
    return pd.DataFrame(
        {
            "row_type": np.full(n, "match", dtype=object),
            "conv_id": conv_arr,
            "turn_idx": nan,
            "role": none,
            "text": none,
            "tool": none,
            "ts": null_ts,
            "emit_seq": nan,
            **{c: nan for c in _DEPTH_COLS},
            "status_ts": null_ts,
            **{c: nan for c in _STATUS_COLS if c != "last_event_received"},
            "last_event_received": none,
            "match_start_idx": matches["start_idx"],
            "match_end_idx": matches["end_idx"],
            "match_ts_first": matches["ts_first_us"].view("M8[us]"),
            "match_ts_last": matches["ts_last_us"].view("M8[us]"),
            "match_span_us": matches["ts_last_us"] - matches["ts_first_us"],
        }
    )


def cfg_matcher(cfg: "OrderedStreamConfig") -> cep_core.StreamMatcher | None:
    """The config's pattern knobs → ONE StreamMatcher (shared with the
    sharded engine so mode dispatch can't drift)."""
    if cfg.pattern is None:
        return None
    return cep_core.stream_matcher(
        cfg.pattern,
        cfg.pattern_mode,
        cfg.pattern_within_s,
        cfg.pattern_within_turns,
        cfg.pattern_not_between,
    )


def make_ordered_func(cfg: OrderedStreamConfig):
    """Build the (key, pdf_iter, state) function for applyInPandasWithState."""

    matcher = cfg_matcher(cfg)
    has_cep = matcher is not None

    def _carry_from_tuple(t: tuple) -> dict:
        # CEP state fields start at position 15 (after idle_heartbeats) and
        # span matcher.n_state_fields (4 for strict carry / plain frontier,
        # 10 for the quantified frontier); absent/None → empty state
        if len(t) <= 15 or t[15] is None:
            return matcher.empty_state()
        return matcher.state_from_lists(*t[15:15 + matcher.n_state_fields])

    def _carry_fields(cstate: dict) -> tuple:
        return tuple(matcher.state_to_lists(cstate))

    def _cep_run(emitted: pd.DataFrame, cstate: dict, final: bool = False):
        run = {
            "turn_idx": emitted["turn_idx"].to_numpy(dtype="int64", copy=False),
            "role": emitted["role"].to_numpy(copy=False),
            "tool": emitted["tool"].to_numpy(copy=False),
            "ts_us": emitted["ts_us"].to_numpy(dtype="int64", copy=False),
        }
        return matcher.match(run, cstate, final=final)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return _pad_cep(df) if has_cep else df

    def func(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        conv_id = key[0]

        if state.hasTimedOut:
            t = tuple(state.get)
            st = _state_from_tuple(t)
            carry = _carry_from_tuple(t) if has_cep else None
            st.idle_heartbeats += 1
            # a capped drain (max_emit_per_batch) may have left a CONTIGUOUS
            # run in the buffer; the timer is the only guaranteed future
            # invocation for an idle key, so drain here too — otherwise the
            # remainder never reaches the sink
            emitted = core.apply_batch(
                st, core._EMPTY_BUFFER, max_emit=cfg.max_emit_per_batch
            )
            matches = None
            if has_cep and len(emitted):
                matches, carry = _cep_run(emitted, carry, final=st.complete)
            # A COMPLETED key (final seen, buffer drained) is a tombstone:
            # its counters are frozen, so a heartbeat status would only
            # repeat the completion snapshot already emitted on the final
            # arrival — emit nothing, and under a TTL evict silently (there
            # is no unresolved gap to report). Mirrors the sharded engine.
            is_tomb = st.complete and not len(emitted)
            status = None
            if not is_tomb:
                status = core.status_dict(conv_id, st)
                del status["conv_id"]
            evict = (
                cfg.evict_idle_after_heartbeats is not None
                and st.idle_heartbeats >= cfg.evict_idle_after_heartbeats
            )
            if evict and not len(emitted):
                # state TTL (SURVEY §7): gap never closed — drop pending
                # turns, free the state; for gapped keys the emitted status
                # is the tombstone record (gap_report picks it up downstream)
                state.remove()
            elif st.complete and cfg.cleanup_on_complete:
                # a timer-driven capped drain finished the conversation —
                # same eager-cleanup contract as the arrival path (review
                # r6d: this branch used to tombstone forever, diverging
                # from the arrival path and the sharded sweep)
                state.remove()
            else:
                t_new = _state_to_tuple(st)
                if has_cep and st.complete:
                    # completed conv = frozen tombstone; drop the CEP state
                    # so the tombstone stays compact (review r6c) — the
                    # final sentinel delimits pattern scope (skip mode: open
                    # candidates can never complete once the conv has)
                    carry = matcher.empty_state()
                state.update(t_new + _carry_fields(carry) if has_cep else t_new)
                if cfg.status_heartbeat_ms and (
                    not st.complete or cfg.evict_idle_after_heartbeats is not None
                ):
                    state.setTimeoutDuration(cfg.status_heartbeat_ms)
            if len(emitted):
                yield _finish(_data_frame(conv_id, emitted))
            if matches is not None and len(matches["start_idx"]):
                yield _match_frame(conv_id, matches)
            if status is not None:
                yield _finish(_status_frame(conv_id, status))
            return

        if state.exists:
            t = tuple(state.get)
            st = _state_from_tuple(t)
            carry = _carry_from_tuple(t) if has_cep else None
        else:
            st = core.OrderedState(last_emitted=cfg.initial_turn_idx - 1)
            carry = matcher.empty_state() if has_cep else None

        frames = list(pdfs)
        batch = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        emitted = core.apply_batch(st, batch, max_emit=cfg.max_emit_per_batch)
        st.idle_heartbeats = 0  # arrival resets the idle-eviction clock
        matches = None
        if has_cep and len(emitted):
            matches, carry = _cep_run(emitted, carry, final=st.complete)

        status = None
        if cfg.emit_status_every_batch:
            status = core.status_dict(conv_id, st)
            del status["conv_id"]

        if st.complete and cfg.cleanup_on_complete:
            state.remove()  # O4: eager cleanup on last event (examiner contract)
        else:
            t_new = _state_to_tuple(st)
            if has_cep and st.complete:
                carry = matcher.empty_state()  # compact tombstone (see timer path)
            state.update(t_new + _carry_fields(carry) if has_cep else t_new)
            # completed keys are frozen tombstones — re-arm the timer only
            # when a TTL exists to eventually evict them; otherwise heartbeat
            # timers would fire (and emit unchanged statuses) forever
            if cfg.status_heartbeat_ms and (
                not st.complete or cfg.evict_idle_after_heartbeats is not None
            ):
                state.setTimeoutDuration(cfg.status_heartbeat_ms)

        if len(emitted):
            yield _finish(_data_frame(conv_id, emitted))
        if matches is not None and len(matches["start_idx"]):
            yield _match_frame(conv_id, matches)
        if status is not None:
            yield _finish(_status_frame(conv_id, status))

    return func


def ordered_stream(df: DataFrame, cfg: OrderedStreamConfig | None = None) -> DataFrame:
    """Apply the ordered processor to a (streaming or batch) transcripts
    DataFrame. Returns the unified data+status stream (STREAM_OUTPUT_SCHEMA).
    """
    cfg = cfg or OrderedStreamConfig()
    timeout = "ProcessingTimeTimeout" if cfg.status_heartbeat_ms else "NoTimeout"
    has_cep = cfg.pattern is not None
    if has_cep:
        # per-mode state schema: the carry (strict), the frontier (skip),
        # and the quantified frontier have different field sets, so a
        # checkpoint written under one refuses the others via the
        # state-store schema-compat check
        m = cfg_matcher(cfg)
        if m.mode == "skip":
            state_schema = STATE_SCHEMA_CEP_SKIP_Q if m.quant else STATE_SCHEMA_CEP_SKIP
        else:
            state_schema = STATE_SCHEMA_CEP
    else:
        state_schema = STATE_SCHEMA
    return df.groupBy("conv_id").applyInPandasWithState(
        make_ordered_func(cfg),
        outputStructType=STREAM_OUTPUT_SCHEMA_CEP if has_cep else STREAM_OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def split_output(unified: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the unified stream into (ordered data rows, status rows) with
    their natural schemas — used inside foreachBatch so ONE stateful query
    feeds both sinks (SURVEY.md §7 'dual-output' resolution)."""
    data = unified.filter(unified.row_type == "data").select(
        "conv_id", *_DATA_COLS
    )
    status = unified.filter(unified.row_type == "status").select(
        "conv_id", "status_ts", *_STATUS_COLS
    )
    return data, status


def split_output_cep(unified: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """split_output + the match channel (row_type='match') with its natural
    schema — for streams built with cfg.pattern."""
    data, status = split_output(unified)
    matches = unified.filter(unified.row_type == "match").select(
        "conv_id",
        unified.match_start_idx.alias("start_idx"),
        unified.match_end_idx.alias("end_idx"),
        unified.match_ts_first.alias("ts_first"),
        unified.match_ts_last.alias("ts_last"),
        unified.match_span_us.alias("span_us"),
    )
    return data, status, matches
