"""Conversation sessionization — the custom STATEFUL streaming
operator (`applyInPandasWithState`), complementing the windowed-agg
surface in streaming/term_stats.py.

A "session" is a maximal run of turns in one conversation with no
inactivity gap ≥ `gap` between consecutive turns. Unlike the fixed
windows in term_stats, session boundaries depend on the data itself,
and the operator keeps *custom* per-conversation state (turn/token
counts, role mix, first/last timestamps) that it finalizes when the
event-time watermark passes `last_ts + gap` — exactly the contract
`GroupStateTimeout.EventTimeTimeout` provides.

Scale shape: state is one tiny fixed-width row per LIVE conversation
(closed sessions are emitted and removed), partitioned by conv_id —
the same key the transcript table is dense in, so the stateful
shuffle is the natural one. The Pandas function touches only counts,
never token arrays: grouped Arrow batches in, one 8-column row out.

Dual-path identity (pinned in tests/test_streaming.py): the stream's
emitted sessions equal a BATCH aggregation with Spark's native
`F.session_window(ts, gap)` over the same events — two unrelated
mechanisms (driver-managed group state vs Catalyst session windows)
must produce identical rows, which is what makes the custom operator
trustworthy.

Open sessions at end-of-stream are intentionally not emitted (their
gap has not elapsed); a final empty batch after the watermark passes
flushes them — availableNow + a later re-trigger does this, the same
late-data pattern term_stats tests use.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from blacklab_spark.sources.transcripts import TRANSCRIPT_SCHEMA

SESSION_SCHEMA = ("conv_id string, n_turns long, n_tokens long, "
                  "n_user long, n_assistant long, "
                  "first_ts timestamp, last_ts timestamp")
_STATE_SCHEMA = ("n_turns long, n_tokens long, n_user long, "
                 "n_assistant long, first_ts long, last_ts long")

_UNITS_MS = {"millisecond": 1, "second": 1000, "minute": 60_000,
             "hour": 3_600_000, "day": 86_400_000}


def _gap_ms(gap: str) -> int:
    """Parse '30 minutes' / '1 hour' (the watermark-duration subset we
    use) into milliseconds."""
    n, unit = gap.split()
    unit = unit.rstrip("s")
    if unit not in _UNITS_MS:
        raise ValueError(f"unsupported gap unit {unit!r} in {gap!r}")
    return int(n) * _UNITS_MS[unit]


def _ws_tokens(texts: pd.Series) -> pd.Series:
    """Whitespace token counts (a session activity metric, not the
    index tokenizer — sessions are an operational stat, decoupled
    from the frozen index tokenization)."""
    return texts.fillna("").str.split().str.len()


def _session_fn(gap_ms: int):
    def fn(key: Tuple[str], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n_turns, n_tokens, n_user, n_assist, first_ms, last_ms = \
                state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": key[0], "n_turns": n_turns,
                "n_tokens": n_tokens, "n_user": n_user,
                "n_assistant": n_assist,
                "first_ts": pd.Timestamp(first_ms, unit="ms"),
                "last_ts": pd.Timestamp(last_ms, unit="ms")}])
            return
        # fold the open session (if any) plus this batch's rows, in
        # event-time order, splitting whenever the gap is exceeded —
        # sub-sessions CLOSED by in-batch evidence are emitted now;
        # only the trailing open session stays in state, finalized by
        # the event-time timeout if nothing else arrives. (A late row
        # inside an already-folded span merges by count — the
        # watermark bounds how late such a row can be, the same
        # contract append-mode windows have.)
        cur = list(state.get) if state.exists else None
        batch = pd.concat([p for p in pdfs if len(p)],
                          ignore_index=True) if pdfs else None
        closed = []
        if batch is not None and len(batch):
            batch = batch.sort_values("ts", kind="mergesort")
            ts_ms = (batch["ts"].astype("int64") // 1_000_000).tolist()
            toks = _ws_tokens(batch["text"]).tolist()
            roles = batch["role"].tolist()
            for t, ntok, role in zip(ts_ms, toks, roles):
                row = [1, int(ntok), int(role == "user"),
                       int(role == "assistant"), int(t), int(t)]
                if cur is None:
                    cur = row
                elif t - cur[5] >= gap_ms:
                    closed.append(cur)
                    cur = row
                else:
                    cur = [cur[0] + 1, cur[1] + row[1],
                           cur[2] + row[2], cur[3] + row[3],
                           min(cur[4], int(t)), max(cur[5], int(t))]
        state.update(tuple(cur))
        state.setTimeoutTimestamp(cur[5] + gap_ms)
        if closed:
            yield pd.DataFrame([{
                "conv_id": key[0], "n_turns": c[0], "n_tokens": c[1],
                "n_user": c[2], "n_assistant": c[3],
                "first_ts": pd.Timestamp(c[4], unit="ms"),
                "last_ts": pd.Timestamp(c[5], unit="ms")}
                for c in closed])

    return fn


def conversation_sessions(stream: DataFrame,
                          gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization: one output row per CLOSED session
    (watermark passed last_ts + gap). Input must be a streaming frame
    with the transcript schema."""
    return (stream.withWatermark("ts", gap)
            .groupBy("conv_id")
            .applyInPandasWithState(
                _session_fn(_gap_ms(gap)), SESSION_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


def batch_sessions(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The batch oracle: Spark-native session windows + plain aggs.
    Computes ALL sessions (batch has no notion of 'still open')."""
    ws = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))),
                        "\\s+"))
    n_tok = F.when(F.length(F.trim(F.coalesce(F.col("text"),
                                              F.lit("")))) > 0,
                   ws).otherwise(F.lit(0))
    return (df.groupBy("conv_id", F.session_window("ts", gap))
            .agg(F.count("*").alias("n_turns"),
                 F.sum(n_tok).alias("n_tokens"),
                 F.sum(F.when(F.col("role") == "user", 1)
                       .otherwise(0)).alias("n_user"),
                 F.sum(F.when(F.col("role") == "assistant", 1)
                       .otherwise(0)).alias("n_assistant"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"))
            .select("conv_id", "n_turns", "n_tokens", "n_user",
                    "n_assistant", "first_ts", "last_ts"))


def stream_sessions(spark: SparkSession, source_dir: str, out_dir: str,
                    checkpoint_dir: str, gap: str = "30 minutes",
                    available_now: bool = True):
    """readStream → sessionize → append-mode parquet sink of closed
    sessions. Returns the started query (caller awaits/stops)."""
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(source_dir))
    out = conversation_sessions(stream, gap)
    writer = (out.writeStream.outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .format("parquet").option("path", out_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
