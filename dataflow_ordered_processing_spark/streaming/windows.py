"""Streaming window aggregates and the stream-stream join (north_rule
N1–N5) with event-time watermarks.

The reference relies on sequence numbers, not watermarks (SURVEY.md §2.8);
these operators ADD event-time semantics over `ts`:

  - tumbling / sliding / session windows per conv_id with a watermark that
    bounds state and drops late rows (N4 policy: late rows are dropped by
    WINDOWS but not by the ordering operator — it orders by turn_idx, not
    time; divergence documented in SURVEY.md §2.9).
  - stream-stream interval join: user turns ↔ first assistant response
    within a horizon, both sides watermarked so join state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_tool_counts(
    transcripts: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", width).alias("w"))
        .agg(F.count("*").alias("n_turns"), F.count("tool").alias("n_tool_calls"))
        .select("conv_id", F.col("w.start").alias("window_start"), "n_turns", "n_tool_calls")
    )


def stream_sliding_turn_rate(
    transcripts: DataFrame,
    width: str = "10 minutes",
    slide: str = "2 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "n_turns")
    )


def stream_session_windows(
    transcripts: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_turns"), F.min("ts").alias("session_start"))
        .select("conv_id", "session_start", "n_turns")
    )


def stream_dedup_turns(
    transcripts: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked streaming deduplication on the idempotency key
    (conv_id, turn_idx) — an optional pre-ordering stage that sheds
    re-deliveries before they reach the (more expensive) stateful ordering
    operator. Dedup state is bounded by the watermark: a duplicate arriving
    later than the watermark delay passes through, where the ordering
    operator's own cursor still discards it (defense in depth)."""
    return transcripts.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def first_match_reduce(matches: DataFrame) -> DataFrame:
    """Reduce join matches to the FIRST assistant response per user turn:
    min (assistant_ts, assistant_turn_idx) per (conv_id, user_turn_idx).
    Associative + commutative, so it can run per-micro-batch AND again at
    read time with the same result — the parquet MERGE emulation below
    relies on exactly that."""
    return (
        matches.groupBy("conv_id", "user_turn_idx")
        .agg(F.min(F.struct("assistant_ts", "assistant_turn_idx", "user_ts")).alias("m"))
        .select(
            "conv_id",
            "user_turn_idx",
            F.col("m.assistant_turn_idx").alias("assistant_turn_idx"),
            F.col("m.user_ts").alias("user_ts"),
            F.col("m.assistant_ts").alias("assistant_ts"),
        )
    )


def first_match_merge_sink(path: str):
    """foreachBatch MERGE keeping the min assistant response per user turn
    (VERDICT round 1 #8): each epoch lands its LOCAL first-match reduction
    idempotently (epoch-named dir, replay = no-op); the global table is the
    read-time min over epochs (read_first_match). Because min is associative,
    stream output == batch user_assistant_pairs regardless of how arrivals
    were split into micro-batches."""
    from .sinks import _write_idempotent

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        _write_idempotent(first_match_reduce(batch_df), path, epoch_id)

    return write


def read_first_match(spark, path: str) -> DataFrame:
    """Global first-match table from the epoch-merged sink."""
    from .sinks import epoch_dirs

    df = spark.read.option("basePath", path).parquet(*epoch_dirs(path)).drop("epoch")
    return first_match_reduce(df)


_WM_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _watermark_seconds(watermark: str) -> float | None:
    """Parse a Spark delay-threshold string leniently: '10 minutes',
    '1 hour 30 minutes', 'interval 2 days'… Returns None for strings it
    cannot understand — the caller's state guard then FAILS OPEN (Spark
    itself will reject a truly invalid threshold), rather than rejecting a
    Spark-valid config with a confusing unpack error."""
    tokens = [t for t in watermark.replace(",", " ").split() if t.lower() != "interval"]
    if len(tokens) < 2 or len(tokens) % 2:
        return None
    total = 0.0
    for value, unit in zip(tokens[::2], tokens[1::2]):
        try:
            # lower() BEFORE rstrip('s'): 'HOURS'.rstrip('s') keeps the
            # uppercase S and would silently bypass the guard
            total += float(value) * _WM_UNITS[unit.lower().rstrip("s")]
        except (ValueError, KeyError):
            return None
    return total


def start_first_match_join_pipeline(
    source: DataFrame,
    path: str,
    checkpoint: str,
    horizon_minutes: int = 10,
    watermark: str = "10 minutes",
    bounded_input: bool = False,
):
    """Wire source → interval join → first-match MERGE sink; returns the
    running query. This is the streaming counterpart of
    plans.analytics.user_assistant_pairs with IDENTICAL output rows.

    The watermark bounds how long user turns are retained in join state: at
    100-TB stream scale a large watermark means effectively unbounded state
    and is a scale-killer. Watermarks over 1 hour are refused unless
    ``bounded_input=True`` (a finite replay/backfill, where retaining
    everything until the source drains is deliberate and safe)."""
    wm_s = _watermark_seconds(watermark)
    if not bounded_input and wm_s is not None and wm_s > 3600.0:
        raise ValueError(
            f"watermark {watermark!r} retains stream-stream join state for "
            "that entire horizon — unbounded state growth on a continuous "
            "stream. Pass bounded_input=True only for finite replays where "
            "holding all state until the source drains is intended."
        )
    joined = stream_user_assistant_join(source, horizon_minutes, watermark)
    return (
        joined.writeStream.outputMode("append")
        .foreachBatch(first_match_merge_sink(path))
        .option("checkpointLocation", checkpoint)
        .queryName("first-match-join")
        .start()
    )


def stream_user_assistant_join(
    transcripts: DataFrame, horizon_minutes: int = 10, watermark: str = "10 minutes"
) -> DataFrame:
    """N5: watermarked stream-stream interval join (SURVEY.md §2.8's added
    operator). Both sides carry watermarks; the time-range predicate bounds
    how long user turns wait in join state.

    SEMANTICS NOTE: this emits EVERY assistant turn within the horizon (an
    unbounded stream cannot rank-and-keep-first in append mode). The batch
    form (plans.analytics.user_assistant_pairs) additionally selects the
    FIRST match per user turn — apply the same first-match reduction
    downstream of this join (e.g. in foreachBatch or a later batch job) when
    that semantic is needed."""
    users = (
        transcripts.filter(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("u_conv_id"),
            F.col("turn_idx").alias("user_turn_idx"),
            F.col("ts").alias("user_ts"),
        )
        .withWatermark("user_ts", watermark)
    )
    assistants = (
        transcripts.filter(F.col("role") == "assistant")
        .select(
            F.col("conv_id").alias("a_conv_id"),
            F.col("turn_idx").alias("assistant_turn_idx"),
            F.col("ts").alias("assistant_ts"),
        )
        .withWatermark("assistant_ts", watermark)
    )
    # NB: Spark logs a per-batch WARN from StreamingJoinHelper ("Error
    # trying to extract state constraint ... Cannot evaluate expression
    # user_turn_idx") for the non-temporal conjunct — benign: the helper
    # simply can't derive an EXTRA state bound from `assistant_turn_idx >
    # user_turn_idx` and falls back to the watermark + time-range bound,
    # which is the real eviction mechanism here. (Writing the predicate as a
    # post-join filter doesn't help: Catalyst pushes it back into the join.)
    return users.join(
        assistants,
        F.expr(
            f"""
            u_conv_id = a_conv_id AND
            assistant_turn_idx > user_turn_idx AND
            assistant_ts >= user_ts AND
            assistant_ts < user_ts + INTERVAL {horizon_minutes} MINUTES
            """
        ),
        "inner",
    ).select(
        F.col("u_conv_id").alias("conv_id"),
        "user_turn_idx",
        "assistant_turn_idx",
        "user_ts",
        "assistant_ts",
    )
