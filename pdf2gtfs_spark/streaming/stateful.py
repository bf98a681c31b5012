"""Custom stateful streaming: per-conversation reassembly with
``applyInPandasWithState`` (task brief §streaming).

Batch reassembly (plans.pipeline.reassemble_conversations) needs every
turn of a conversation in one shuffle; on an unbounded turn stream the
equivalent is a per-conversation GroupState that accumulates
(turn_idx, csv_text) pairs and emits the finalized conversation
document once the event-time watermark passes the conversation's last
turn timestamp plus ``gap`` (agent transcripts carry no end marker, so
watermarked quiescence is the close signal — session-window semantics
with custom state).

The emitted doc joins the CSVs in turn order with the same separators
the batch reassembly uses, so a conversation closed by the stream is
byte-equal to one produced by the batch path. State lives in the
streaming state store: a killed job resumes with its accumulated
conversations intact (complements the bucket-grain lineage in
plans.lineage).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

CONV_DOC_SEP = "\n\x1e\n"   # matches plans.pipeline.reassemble_conversations
TABLE_SEP = "\x1d"

STATE_SCHEMA = ("turn_idxs array<int>, csvs array<string>, "
                "last_ts_ms bigint")
OUTPUT_SCHEMA = ("conv_id string, n_turns int, n_tables int, "
                 "conversation_doc string")


def _reassemble_fn(gap_ms: int):
    from pyspark.sql.streaming.state import GroupState

    def fn(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idxs, csvs, _ = state.get
            pairs = sorted(zip(turn_idxs, csvs))
            by_turn: dict[int, list[str]] = {}
            for t, c in pairs:
                by_turn.setdefault(t, []).append(c)
            doc = CONV_DOC_SEP.join(
                TABLE_SEP.join(cs) for _, cs in sorted(by_turn.items()))
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id,
                "n_turns": len(by_turn),
                "n_tables": len(pairs),
                "conversation_doc": doc,
            }])
            return
        if state.exists:
            turn_idxs, csvs, last_ts = state.get
            turn_idxs, csvs = list(turn_idxs), list(csvs)
        else:
            turn_idxs, csvs, last_ts = [], [], 0
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000)
            for t, c, ms in zip(pdf["turn_idx"], pdf["csv_text"], ts_ms):
                if c is None:
                    continue
                turn_idxs.append(int(t))
                csvs.append(str(c))
                last_ts = max(last_ts, int(ms))
        state.update((turn_idxs, csvs, last_ts))
        # close when the watermark passes the last turn + gap
        state.setTimeoutTimestamp(last_ts + gap_ms)
        return
        yield  # pragma: no cover - keeps fn a generator

    return fn


def stream_reassemble(extracted_stream, gap: str = "10 minutes",
                      gap_ms: int = 10 * 60 * 1000):
    """(streaming DF of per-turn extraction rows incl. ``ts``) ->
    finalized conversation docs, one per conversation after its
    watermarked quiet gap."""
    return (extracted_stream
            .withWatermark("ts", gap)
            .groupBy("conv_id")
            .applyInPandasWithState(
                _reassemble_fn(gap_ms),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
