"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dedup_stream``: cross-micro-batch exact dedup — emits only the FIRST
occurrence of each id within a key group, remembering seen ids in group
state. The batch engine's ``operators.dedup.exact_dedup`` answers "which
rows are duplicates" over a closed dataset; this is the open-stream
version of the same semantics (a new document for an already-seen URL is
dropped, forever, no matter how many micro-batches later it arrives).

Scale design:

* State is partitioned by ``key_col`` (e.g. the URL host): the state
  store shards across executors with the stream's shuffle, so per-key
  state stays small even at 10^12 documents (state per host ≈ pages of
  that host, stored as 8-byte hashes, not strings).
* Ids are stored as 63-bit hashes — constant memory per id; at the scale
  where per-host sets grow unbounded, pass a ``ttl_minutes`` so idle
  hosts' state is evicted (ProcessingTimeTimeout), trading exactness for
  bounded state exactly like production stream dedup does.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _id_hash(v: str) -> int:
    return int.from_bytes(hashlib.sha1(str(v).encode()).digest()[:8], "big") >> 1


def dedup_stream(
    stream_df: DataFrame,
    key_col: str,
    id_col: str,
    payload_cols: list[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → streaming DataFrame with per-key first-seen
    dedup on ``id_col``. Output columns: key, id, payload_cols."""
    out_schema = ", ".join(
        [f"{key_col} string", f"{id_col} string"]
        + [f"{c} string" for c in payload_cols]
    )
    state_schema = "seen array<long>"
    cols = [key_col, id_col, *payload_cols]

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_mask = []
            for v in pdf[id_col]:
                h = _id_hash(v)
                if h in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(h)
                    fresh_mask.append(True)
            out = pdf.loc[fresh_mask, cols]
            if len(out):
                yield out
        state.update((list(seen),))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream_df.selectExpr(*[f"cast({c} as string) as {c}" for c in cols])
        .groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update", timeout)
    )
