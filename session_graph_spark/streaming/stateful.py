"""Custom stateful streaming operator (SURVEY.md §2.9; brief: use
applyInPandasWithState where built-ins can't express the semantics).

`streaming_conversation_state` maintains per-conversation running state
over a turn stream — turn count, char count, last-activity timestamp —
and EMITS a conversation-summary row only when the conversation goes
quiet (processing-time timeout), i.e. the streaming analog of the
reference's stop-hook trigger ("session ended -> enqueue for
extraction", consumer path SURVEY §3.3). Watermark-windowed aggregation
can't express "emit once on inactivity with accumulated custom state",
so this is the honest applyInPandasWithState case.

State is one small tuple per active conversation; at 100TB the state
store is bounded by ACTIVE conversations (not history) and partitioned
by conv_id, which is exactly how GroupState shards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (n_turns long, n_chars long, last_ts string)
STATE_SCHEMA = "n_turns long, n_chars long, last_ts string"
OUTPUT_SCHEMA = ("conv_id string, n_turns long, n_chars long, "
                 "last_ts string, closed boolean")


def _make_update_fn(idle_timeout_ms: int):
    """Build the per-group update function with the idle gap baked into
    the closure (cloudpickle ships the closure to workers; a runtime
    attribute on a module-level function would not survive re-import)."""

    def _update_conversation(key: tuple, pdfs: Iterator[pd.DataFrame],
                             state: GroupState) -> Iterator[pd.DataFrame]:
        """Accumulate turn/char counts per conv_id; emit the summary row
        when the group times out (conversation idle past the gap)."""
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_chars, last_ts = state.get
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id, "n_turns": n_turns, "n_chars": n_chars,
                "last_ts": last_ts, "closed": True,
            }])
            return
        n_turns, n_chars, last_ts = state.get if state.exists else (0, 0, "")
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            # nulls dropped BEFORE the max: an all-null batch would yield
            # the string 'NaT', which sorts above every digit-prefixed
            # timestamp and would stick as the conversation's last_ts
            valid_ts = pdf["ts"].dropna()
            if len(valid_ts):
                last_ts = max(last_ts, str(valid_ts.max()))
        state.update((n_turns, n_chars, last_ts))
        # processing-time gap after which the conversation counts as ended
        state.setTimeoutDuration(idle_timeout_ms)
        # progress row (closed=False) so downstream sees live conversations
        yield pd.DataFrame([{
            "conv_id": conv_id, "n_turns": n_turns, "n_chars": n_chars,
            "last_ts": last_ts, "closed": False,
        }])

    return _update_conversation


def streaming_conversation_state(turn_stream, idle_timeout_ms: int = 1000):
    """turn_stream (streaming DataFrame with conv_id, text, ts) ->
    stateful per-conversation summaries (update mode). idle_timeout_ms is
    the processing-time quiet gap after which a conversation closes."""
    return turn_stream.groupBy("conv_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
