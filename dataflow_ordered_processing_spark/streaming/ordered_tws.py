"""Ordered processor on transformWithStateInPandas (Spark 4 stateful v2).

Same contract as streaming/ordered_stream.py (O1–O10 + depth snapshots; see
that module and ordered_core.py for the semantics citations), but built on
the modern StatefulProcessor API with RocksDB state, which changes the state
I/O complexity:

  - cursor + counters + buffer STATISTICS live in a ValueState (tiny row);
  - pending out-of-order rows live in a ListState that is APPENDED
    incrementally — arrivals beyond an open gap never read or rewrite the
    existing buffer (applyInPandasWithState must rehydrate and rewrite the
    whole state every batch);
  - the buffer list is only materialized when an arrival actually closes
    the gap (turn last_emitted+1 shows up) — then it drains, and the
    remainder is rewritten once.

Divergence (documented): rows duplicated WITHIN the pending buffer are
detected at drain time, not arrival time, so duplicate_count on interim
status rows lags the classic operator and buffered_count is an UPPER BOUND
under re-delivery; the counts converge when the gap closes. For a gap that
NEVER closes, re-deliveries of buffered turns keep appending (the append-only
path is exactly what makes this engine O(arrival) instead of O(state)) —
bound that case with state_ttl_ms, which expires the whole key. The
reference declares in-buffer duplicate behavior unpredictable
(docs/pipeline-design.md:115-122).

Requires the RocksDB state store provider:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
AND the `protobuf` python package (pyspark's transform_with_state driver
worker imports StateMessage_pb2) — NOT present in this sandbox image, so
this module is import-gated: `tws_available()` reports usability, tests
skip when absent, and the classic applyInPandasWithState operator
(ordered_stream.py) remains the default engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..operators import cep_core
from ..operators import ordered_core as core
from ..schemas import STREAM_OUTPUT_SCHEMA, STREAM_OUTPUT_SCHEMA_CEP
from .ordered_stream import _data_frame, _match_frame, _pad_cep, _status_frame

CURSOR_SCHEMA = (
    "last_emitted long, received_count long, result_count long, "
    "duplicate_count long, last_event_received boolean, n_user long, "
    "n_assistant long, n_tool long, chars long, "
    "buf_count long, buf_min long, buf_max long"
)
BUFFER_SCHEMA = "turn_idx long, role string, text string, tool string, ts_us long"
# CEP carry (cfg.pattern): the trailing (k-1) emitted turns, columnar —
# one small ValueState row, rewritten only when the key actually emits
CEP_CARRY_SCHEMA = (
    "turn_idx array<long>, role array<string>, tool array<string>, "
    "ts_us array<long>"
)
# skip-mode (followedBy) partial-match frontier — a DIFFERENT state name and
# schema from the strict carry, so resuming a checkpoint under the other
# pattern mode is refused by the state store instead of mis-decoding
CEP_FRONTIER_SCHEMA = (
    "anchor_idx array<long>, anchor_ts_us array<long>, wait array<long>, "
    "next_expected long"
)
# quantified-skip frontier (r7): candidate cpos/guard_seen + per-quant-step
# open-run tracking — again its own name+schema so mode flips refuse
CEP_FRONTIER_Q_SCHEMA = (
    "anchor_idx array<long>, anchor_ts_us array<long>, wait array<long>, "
    "cpos array<long>, guard_seen array<long>, open_s array<long>, "
    "open_s_ts array<long>, open_e array<long>, open_e_ts array<long>, "
    "next_expected long"
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_probe_error() -> str | None:
    """Why transformWithStateInPandas cannot run here, or None if it can.
    The probe IS the skip condition for the Spark-runtime test tier: pyspark's
    state-server protocol imports StateMessage_pb2 (google.protobuf) on the
    Python side, so an image that gains protobuf flips this to None and the
    skipped tests auto-activate with zero manual steps."""
    try:
        import google.protobuf  # noqa: F401

        return None
    except ImportError as e:
        return f"{type(e).__name__}: {e}"


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf on the python side."""
    return tws_probe_error() is None


@dataclass(frozen=True)
class TwsConfig:
    emit_status_every_batch: bool = True
    initial_turn_idx: int = core.INITIAL_TURN_IDX
    state_ttl_ms: int | None = None  # native per-state TTL (bounds zombie keys)
    # O9 (maxOutputElementsPerBundle analog): cap each invocation's drain;
    # the CONTIGUOUS remainder stays buffered and drains on the key's next
    # arrival. Divergence from the classic engine (ENFORCED at config time,
    # see __post_init__): this engine runs timeMode="none", so a capped
    # remainder with NO further arrivals waits indefinitely — e.g. a bounded
    # availableNow run can end with buffered rows never emitted. Pair a cap
    # with arrivals-driven workloads and set ack_arrivals_driven_drain=True
    # to accept that, or use the classic engine whose heartbeat timer
    # flushes remainders.
    max_emit_per_batch: int | None = None
    # Explicit acknowledgement that capped remainders drain only on further
    # arrivals for the key (no timer flush in this engine). Required when
    # max_emit_per_batch is set — a silent strand is worse than a loud
    # config error.
    ack_arrivals_driven_drain: bool = False
    # CEP pattern (same contract as OrderedStreamConfig.pattern — matched
    # over the in-order emission, state in a ValueState: strict carries the
    # trailing k-1 turns, skip carries the partial-match frontier; matches
    # as row_type='match' in the *_CEP output schema)
    pattern: tuple | None = None
    pattern_within_s: int | None = None
    pattern_mode: str = "strict"  # "strict" (next) | "skip" (followedBy)
    pattern_within_turns: int | None = None  # skip: max last_idx - first_idx
    pattern_not_between: dict | None = None  # skip: {segment_i: Step} guards

    def __post_init__(self) -> None:
        cep_core.validate_pattern_knobs(
            self.pattern,
            self.pattern_mode,
            self.pattern_within_s,
            self.pattern_within_turns,
            self.pattern_not_between,
        )
        if self.max_emit_per_batch is not None and not self.ack_arrivals_driven_drain:
            raise ValueError(
                "TwsConfig(max_emit_per_batch=...) on the TWS engine drains "
                "capped remainders only when the key receives FURTHER "
                "ARRIVALS (timeMode='none': no heartbeat flush, so a bounded "
                "run can strand buffered rows). Pass "
                "ack_arrivals_driven_drain=True to accept that semantics, or "
                "use the classic/sharded engines whose heartbeat timers "
                "flush remainders."
            )


_DEFAULT_CURSOR = (0, 0, 0, 0, False, 0, 0, 0, 0, 0, 0, 0)


class OrderedProcessor(StatefulProcessor):
    def __init__(self, cfg: TwsConfig | None = None):
        self.cfg = cfg or TwsConfig()
        # ONE matcher builder shared with the other engines (review r7b)
        from .ordered_stream import cfg_matcher

        self.matcher = cfg_matcher(self.cfg)

    def init(self, handle: StatefulProcessorHandle) -> None:
        ttl = self.cfg.state_ttl_ms
        self.cursor = handle.getValueState("cursor", CURSOR_SCHEMA, ttl)
        self.buffer = handle.getListState("buffer", BUFFER_SCHEMA, ttl)
        if self.matcher is not None:
            # per-mode name AND schema: flipping pattern_mode on an existing
            # checkpoint is a state-store error, not a silent mis-decode
            if self.matcher.mode == "skip":
                self.cep_state = (
                    handle.getValueState(
                        "cep_frontier_q", CEP_FRONTIER_Q_SCHEMA, ttl
                    )
                    if self.matcher.quant
                    else handle.getValueState(
                        "cep_frontier", CEP_FRONTIER_SCHEMA, ttl
                    )
                )
            else:
                self.cep_state = handle.getValueState(
                    "cep_carry", CEP_CARRY_SCHEMA, ttl
                )

    def close(self) -> None:
        pass

    # ------------------------------------------------------------------
    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        cfg = self.cfg
        frames = list(rows)
        batch = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        n_in = len(batch)

        cur = tuple(self.cursor.get()) if self.cursor.exists() else None
        if cur is None:
            cur = (cfg.initial_turn_idx - 1,) + _DEFAULT_CURSOR[1:]
        (
            last_emitted,
            received,
            result,
            dups,
            last_event,
            n_user,
            n_assistant,
            n_tool,
            chars,
            buf_count,
            buf_min,
            buf_max,
        ) = cur
        received += n_in

        if bool(core.default_is_last(batch).any()):
            last_event = True

        # sort + dedupe the arrival batch, drop <= cursor (count dups)
        idx = batch["turn_idx"].to_numpy(dtype=np.int64, copy=True)
        order = np.argsort(idx, kind="stable")
        sidx = idx[order]
        fresh = np.empty(len(sidx), dtype=bool)
        if len(sidx):
            fresh[0] = sidx[0] > last_emitted
            np.greater(sidx[1:], sidx[:-1], out=fresh[1:])
            fresh[1:] &= sidx[1:] > last_emitted
        dups += int(len(sidx) - fresh.sum())
        keep = order[fresh]
        kidx = sidx[fresh]

        cols = {
            "turn_idx": kidx,
            "role": batch["role"].to_numpy(copy=False)[keep],
            "text": batch["text"].to_numpy(copy=False)[keep],
            "tool": batch["tool"].to_numpy(copy=False)[keep],
            "ts_us": core.ts_to_us(batch["ts"]).to_numpy()[keep],
        }

        cap = cfg.max_emit_per_batch
        # drain is possible when the arrival touches the cursor OR a capped
        # earlier drain left the buffer head contiguous (buf_min is exact:
        # an uncapped engine never buffers contiguous turns, a capped one
        # does precisely at the head)
        gap_closed = (len(kidx) > 0 and int(kidx[0]) == last_emitted + 1) or (
            buf_count > 0 and buf_min == last_emitted + 1
        )
        emitted_cols = None

        if buf_count == 0:
            # no pending buffer: drain the batch's own contiguous prefix
            expect = last_emitted + 1 + np.arange(len(kidx), dtype=np.int64)
            mismatch = np.nonzero(kidx != expect)[0]
            n_emit = int(mismatch[0]) if len(mismatch) else len(kidx)
            if cap is not None:
                n_emit = min(n_emit, cap)
            emitted_cols = {c: v[:n_emit] for c, v in cols.items()}
            rest = {c: v[n_emit:] for c, v in cols.items()}
            if len(rest["turn_idx"]):
                self.buffer.appendList(_tuples(rest))
                buf_count += len(rest["turn_idx"])
                buf_min = int(rest["turn_idx"].min())
                buf_max = int(rest["turn_idx"].max())
            if n_emit:
                last_emitted = int(kidx[n_emit - 1])
        elif not gap_closed:
            # arrival can't drain anything — APPEND ONLY, never read the list
            if len(kidx):
                self.buffer.appendList(_tuples(cols))
                buf_count += len(kidx)
                buf_min = int(min(buf_min, kidx.min())) if buf_count else int(kidx.min())
                buf_max = int(max(buf_max, kidx.max()))
        else:
            # the gap closes: materialize buffer once, merge, drain, rewrite
            pending = list(self.buffer.get())
            merged = {
                "turn_idx": np.concatenate(
                    [np.fromiter((p[0] for p in pending), dtype=np.int64, count=len(pending)), kidx]
                ),
                "role": np.concatenate(
                    [np.array([p[1] for p in pending], dtype=object), cols["role"]]
                ),
                "text": np.concatenate(
                    [np.array([p[2] for p in pending], dtype=object), cols["text"]]
                ),
                "tool": np.concatenate(
                    [np.array([p[3] for p in pending], dtype=object), cols["tool"]]
                ),
                "ts_us": np.concatenate(
                    [np.fromiter((p[4] for p in pending), dtype=np.int64, count=len(pending)), cols["ts_us"]]
                ),
            }
            midx = merged["turn_idx"]
            morder = np.argsort(midx, kind="stable")
            msidx = midx[morder]
            mfresh = np.empty(len(msidx), dtype=bool)
            mfresh[0] = msidx[0] > last_emitted
            np.greater(msidx[1:], msidx[:-1], out=mfresh[1:])
            mfresh[1:] &= msidx[1:] > last_emitted
            dups += int(len(msidx) - mfresh.sum())  # in-buffer dups surface here
            mkeep = morder[mfresh]
            mkidx = msidx[mfresh]
            expect = last_emitted + 1 + np.arange(len(mkidx), dtype=np.int64)
            mismatch = np.nonzero(mkidx != expect)[0]
            n_emit = int(mismatch[0]) if len(mismatch) else len(mkidx)
            if cap is not None:
                n_emit = min(n_emit, cap)
            emitted_cols = {c: v[mkeep[:n_emit]] for c, v in merged.items()}
            rest_ix = mkeep[n_emit:]
            if len(rest_ix):
                rest = {c: v[rest_ix] for c, v in merged.items()}
                self.buffer.put(_tuples(rest))
                buf_count = len(rest_ix)
                buf_min = int(rest["turn_idx"].min())
                buf_max = int(rest["turn_idx"].max())
            else:
                self.buffer.clear()
                buf_count, buf_min, buf_max = 0, 0, 0
            if n_emit:
                last_emitted = int(mkidx[n_emit - 1])

        # emission metadata + depth snapshot (produceResult analog)
        if emitted_cols is not None and len(emitted_cols["turn_idx"]):
            n_emit = len(emitted_cols["turn_idx"])
            emitted_cols["emit_seq"] = result + 1 + np.arange(n_emit, dtype=np.int64)
            roles = emitted_cols["role"]
            emitted_cols["n_user_cum"] = n_user + np.cumsum(roles == "user")
            emitted_cols["n_assistant_cum"] = n_assistant + np.cumsum(roles == "assistant")
            emitted_cols["n_tool_cum"] = n_tool + np.cumsum(roles == "tool")
            emitted_cols["chars_cum"] = chars + np.cumsum(
                np.array(
                    [len(t) if t is not None else 0 for t in emitted_cols["text"]],
                    dtype=np.int64,
                )
            )
            n_user = int(emitted_cols["n_user_cum"][-1])
            n_assistant = int(emitted_cols["n_assistant_cum"][-1])
            n_tool = int(emitted_cols["n_tool_cum"][-1])
            chars = int(emitted_cols["chars_cum"][-1])
            result += n_emit
            df_out = _data_frame(conv_id, pd.DataFrame(emitted_cols, copy=False))
            yield _pad_cep(df_out) if cfg.pattern is not None else df_out
            if self.matcher is not None:
                prior = (
                    tuple(self.cep_state.get()) if self.cep_state.exists() else None
                )
                nf = self.matcher.n_state_fields
                state_in = (
                    self.matcher.state_from_lists(*prior[:nf])
                    if prior is not None
                    else None
                )
                matches, cstate = self.matcher.match(
                    {c: emitted_cols[c] for c in cep_core.CEP_COLS},
                    state_in,
                    final=bool(last_event and buf_count == 0),
                )
                if last_event and buf_count == 0:
                    # completion: drop the CEP state like the other engines —
                    # the final sentinel delimits pattern scope (skip: open
                    # candidates can never complete once the conv has)
                    self.cep_state.clear()
                else:
                    self.cep_state.update(
                        tuple(self.matcher.state_to_lists(cstate))
                    )
                if len(matches["start_idx"]):
                    yield _match_frame(conv_id, matches)
        elif (
            self.matcher is not None
            and cfg.state_ttl_ms is not None
            and self.cep_state.exists()
        ):
            # TTL keep-alive (ADVICE r6): cursor/buffer are rewritten on
            # every arrival (fresh TTL) but the CEP state is only rewritten
            # when the key emits — a key buffering out-of-order turns past
            # the TTL would lose its carry/frontier (and the matches spanning
            # the last emission boundary) while staying live. Touch it so all
            # three states share one expiry clock.
            self.cep_state.update(tuple(self.cep_state.get()))

        self.cursor.update(
            (
                int(last_emitted),
                int(received),
                int(result),
                int(dups),
                bool(last_event),
                int(n_user),
                int(n_assistant),
                int(n_tool),
                int(chars),
                int(buf_count),
                int(buf_min),
                int(buf_max),
            )
        )

        if cfg.emit_status_every_batch:
            status_df = _status_frame(
                conv_id,
                {
                    "last_emitted": int(last_emitted) if result else None,
                    "buffered_count": int(buf_count),
                    "earliest_buffered": int(buf_min) if buf_count else None,
                    "latest_buffered": int(buf_max) if buf_count else None,
                    "received_count": int(received),
                    "result_count": int(result),
                    "duplicate_count": int(dups),
                    "last_event_received": bool(last_event),
                },
            )
            yield _pad_cep(status_df) if cfg.pattern is not None else status_df


def _tuples(cols: dict) -> list[tuple]:
    return list(
        zip(
            (int(x) for x in cols["turn_idx"]),
            cols["role"].tolist(),
            cols["text"].tolist(),
            cols["tool"].tolist(),
            (int(x) for x in cols["ts_us"]),
        )
    )


def ordered_stream_tws(df: DataFrame, cfg: TwsConfig | None = None) -> DataFrame:
    """Apply the transformWithStateInPandas ordered processor (requires the
    RocksDB state store provider on the session)."""
    cfg = cfg or TwsConfig()
    out_schema = (
        STREAM_OUTPUT_SCHEMA_CEP if cfg.pattern is not None else STREAM_OUTPUT_SCHEMA
    )
    return df.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=OrderedProcessor(cfg),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
