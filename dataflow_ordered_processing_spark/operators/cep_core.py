"""Vectorized CEP pattern matching over in-order per-key turn runs.

The north rule frames this engine as a "structured-streaming / CEP engine":
beyond windows/joins it must detect multi-turn *sequence patterns* inside a
conversation (the MATCH_RECOGNIZE / FlinkCEP capability class — public
semantics: SQL:2016 row-pattern recognition, Flink's strict-contiguity
`next` and skip-till-next `followedBy`). The reference repo itself stops at
per-key ordering; ordering is precisely what makes sequence patterns
well-defined, so CEP is the natural consumer of the ordered stream
(docs/pipeline-design.md's "results feed downstream analysis" role).

This module is the engine-side matcher: pure numpy over the columnar runs
that ``ordered_core.apply_batch`` emits — no per-row Python, no pandas.
Strict contiguity only (streaming skip-till-next needs unbounded lookahead;
the batch operator in ``plans/cep.py`` covers it where the full table is
available).

Match semantics (pinned by tests/test_cep.py against a pure-Python oracle):
  - a match starts at every row where step 0 holds and steps 1..k-1 hold on
    the next k-1 *consecutive* turns (ALL ROWS PER MATCH, overlapping
    matches allowed — SQL:2016 `AFTER MATCH SKIP TO NEXT ROW`).
  - matches never span a turn_idx gap (can only occur across state
    re-creation after a TTL eviction; the guard makes that a non-match
    rather than a wrong match).
  - ``within_us`` (FlinkCEP ``within`` analog) drops matches whose
    first→last timestamp span exceeds the bound.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_IDENT = re.compile(r"[A-Za-z0-9_.\-]+")

#: columns a matcher consumes — a subset of ordered_core.BUF_COLS
CEP_COLS = ("turn_idx", "role", "tool", "ts_us")


@dataclass(frozen=True)
class Step:
    """One pattern step: a structural predicate over a turn.

    Structural (field-equality) form so the SAME step drives both the numpy
    matcher (streaming engine) and a SQL predicate (batch operator + DuckDB
    oracle). ``tool`` may be a string (equality) — a step with ``tool`` set
    implies nothing about role unless ``role`` is also set.
    """

    name: str
    role: str | None = None
    tool: str | None = None

    def __post_init__(self):
        if self.role is None and self.tool is None:
            raise ValueError(f"step {self.name!r} matches every row — "
                             "set role and/or tool")
        # role/tool are identifier-class values; rejecting everything else
        # closes the SQL-literal injection surface COMPLETELY (review r6c/d:
        # quote-doubling alone left backslash escapes, and Spark and DuckDB
        # disagree on backslash semantics, so escaping can't be both safe
        # and cross-engine-identical — validation can)
        for field in (self.role, self.tool):
            if field is not None and not _IDENT.fullmatch(field):
                raise ValueError(
                    f"step {self.name!r}: value {field!r} is not a plain "
                    "identifier ([A-Za-z0-9_.-]+) — predicates are rendered "
                    "as SQL literals for the batch operator and oracles"
                )

    @property
    def sql(self) -> str:
        parts = []
        if self.role is not None:
            parts.append(f"role = '{self.role}'")
        if self.tool is not None:
            parts.append(f"tool = '{self.tool}'")
        return " AND ".join(parts)

    def mask(self, cols: dict) -> np.ndarray:
        n = len(cols["turn_idx"])
        m = np.ones(n, dtype=bool)
        if self.role is not None:
            m &= np.asarray(cols["role"], dtype=object) == self.role
        if self.tool is not None:
            m &= np.asarray(cols["tool"], dtype=object) == self.tool
        return m


def _concat(carry: dict | None, run: dict) -> dict:
    if carry is None or len(carry["turn_idx"]) == 0:
        return run
    return {c: np.concatenate([np.asarray(carry[c]), np.asarray(run[c])])
            for c in CEP_COLS}


def match_strict(
    steps: tuple[Step, ...],
    run: dict,
    carry: dict | None = None,
    within_us: int | None = None,
) -> tuple[dict, dict]:
    """Match a strict-contiguity pattern over one in-order emitted run.

    ``run``: dict of numpy arrays (CEP_COLS) for the newly emitted turns of
    one key, in turn_idx order. ``carry``: the previous ``len(steps)-1``
    emitted turns (contiguous with ``run`` by the engine's gap-free emission
    invariant) so matches spanning micro-batch boundaries are found exactly
    once. Returns ``(matches, new_carry)`` where matches has columns
    start_idx, end_idx, ts_first_us, ts_last_us (int64) and new_carry is
    the trailing ``len(steps)-1`` rows to carry into the next call.
    """
    k = len(steps)
    if k < 2:
        raise ValueError("a pattern needs at least 2 steps")
    full = _concat(carry, run)
    idx = np.asarray(full["turn_idx"], dtype=np.int64)
    n = len(idx)
    n_new = len(run["turn_idx"])
    empty = {
        "start_idx": np.empty(0, np.int64),
        "end_idx": np.empty(0, np.int64),
        "ts_first_us": np.empty(0, np.int64),
        "ts_last_us": np.empty(0, np.int64),
    }
    new_carry = {c: np.asarray(full[c])[max(0, n - (k - 1)):] for c in CEP_COLS}
    if n < k:
        return empty, new_carry

    masks = [s.mask(full) for s in steps]
    nwin = n - k + 1
    ok = masks[0][:nwin].copy()
    for i in range(1, k):
        ok &= masks[i][i:i + nwin]
    # contiguity guard: never match across a turn_idx gap (TTL re-creation)
    ok &= idx[k - 1:] - idx[:nwin] == k - 1
    # emit only matches whose LAST row is in the new run (carry-internal
    # windows were already emitted by the previous call)
    first_new_end = n - n_new  # smallest window-end position inside the run
    # INVARIANT (ADVICE r6): the incoming carry holds at most k-1 rows
    # (new_carry above is trimmed to k-1 on every call), so first_new_end
    # <= k-1 and the suppression branch below is currently DEAD —
    # cross-batch exactly-once rests on window geometry (no k-row window
    # fits inside a <k-row carry). The branch stays as defense-in-depth for
    # a future longer-carry change; this assert makes such a change fail
    # loudly instead of silently relying on the untested suppression path.
    assert first_new_end <= k - 1, (
        f"carry longer than k-1 ({first_new_end} rows, k={k}): the "
        "carry-boundary suppression below is untested — audit it first"
    )
    if first_new_end > k - 1:
        ok[: first_new_end - (k - 1)] = False
    ts = np.asarray(full["ts_us"], dtype=np.int64)
    if within_us is not None:
        ok &= ts[k - 1:] - ts[:nwin] <= within_us
    j = np.nonzero(ok)[0]
    matches = {
        "start_idx": idx[j],
        "end_idx": idx[j + k - 1],
        "ts_first_us": ts[j],
        "ts_last_us": ts[j + k - 1],
    }
    return matches, new_carry


def carry_from_lists(idx, role, tool, ts_us) -> dict:
    """Rebuild a carry dict from four (possibly-None) sequences — the ONE
    deserializer shared by every engine's state layer."""
    return {
        "turn_idx": np.asarray(list(idx or []), dtype="int64"),
        "role": np.asarray(list(role or []), dtype=object),
        "tool": np.asarray(list(tool or []), dtype=object),
        "ts_us": np.asarray(list(ts_us or []), dtype="int64"),
    }


def carry_to_lists(carry: dict) -> tuple[list, list, list, list]:
    """Carry dict → four plain lists (state-schema friendly)."""
    return (
        [int(x) for x in carry["turn_idx"]],
        list(carry["role"]),
        list(carry["tool"]),
        [int(x) for x in carry["ts_us"]],
    )


def empty_carry() -> dict:
    return {
        "turn_idx": np.empty(0, np.int64),
        "role": np.empty(0, object),
        "tool": np.empty(0, object),
        "ts_us": np.empty(0, np.int64),
    }
