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
  state stays small even at 10^12 documents.
* **Two-tier state, bounded for hot keys**: below ``exact_below`` seen
  ids the state is the exact id strings — dedup is EXACT, zero false
  drops. A key that crosses the threshold (a hot host) migrates once to
  a fixed-width Bloom bitmap (``bloom_bits`` bits, ``_BLOOM_K`` hashes):
  from then on that key's state is constant-size per batch (the bitmap is
  rewritten, but never grows), instead of an ever-growing array re-
  serialized wholesale every micro-batch.
* **Contract — the Bloom tier is probabilistic**: a Bloom false positive
  drops a never-before-seen document with no observable signal. With
  ``n`` ids inserted the false-drop rate is ``(1 - exp(-k*n/m))^k``
  (m=``bloom_bits``, k=4) — ~2.4e-3 at n = m/16 (e.g. 500k ids on the
  default 8M-bit/1MiB bitmap), ~2.4e-2 at n = m/8. Size ``bloom_bits``
  ≈ 10-16 bits per expected id per hot key, or raise ``exact_below`` /
  disable migration (``bloom_bits=None`` keeps exact ids forever) where
  false drops are unacceptable.
* ``ttl_minutes`` evicts idle keys' state (ProcessingTimeTimeout),
  trading exactness for bounded total state exactly like production
  stream dedup does.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_BLOOM_K = 4
DEFAULT_EXACT_BELOW = 4096
DEFAULT_BLOOM_BITS = 1 << 23  # 1 MiB bitmap per hot key


def _bloom_positions(v: str, m_bits: int) -> list[int]:
    """k=4 bit positions from one sha1: four independent 32-bit slices."""
    d = hashlib.sha1(str(v).encode()).digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "big") % m_bits for i in range(_BLOOM_K)]


def _bloom_contains(bits: np.ndarray, pos: list[int]) -> bool:
    return all(bits[p >> 3] & (1 << (p & 7)) for p in pos)


def _bloom_insert(bits: np.ndarray, pos: list[int]) -> None:
    for p in pos:
        bits[p >> 3] |= 1 << (p & 7)


def _dedup_step(
    ids: set[str] | None,
    bloom: np.ndarray | None,
    new_ids: Iterable[str],
    exact_below: int,
    bloom_bits: int | None,
) -> tuple[list[bool], set[str] | None, np.ndarray | None]:
    """Pure per-batch state transition (unit-testable without a stream):
    returns (fresh mask, ids', bloom'). Exactly one of ids/bloom is the
    live tier; migration exact→bloom happens at the ``exact_below``
    crossing and is one-way."""
    fresh: list[bool] = []
    if bloom is not None:
        for v in new_ids:
            pos = _bloom_positions(v, bloom_bits or DEFAULT_BLOOM_BITS)
            if _bloom_contains(bloom, pos):
                fresh.append(False)
            else:
                _bloom_insert(bloom, pos)
                fresh.append(True)
        return fresh, None, bloom
    ids = set() if ids is None else ids
    for v in new_ids:
        v = str(v)
        if v in ids:
            fresh.append(False)
        else:
            ids.add(v)
            fresh.append(True)
    if bloom_bits is not None and len(ids) > exact_below:
        bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
        for v in ids:
            _bloom_insert(bloom, _bloom_positions(v, bloom_bits))
        return fresh, None, bloom
    return fresh, ids, None


def dedup_stream(
    stream_df: DataFrame,
    key_col: str,
    id_col: str,
    payload_cols: list[str],
    ttl_minutes: int | None = None,
    exact_below: int = DEFAULT_EXACT_BELOW,
    bloom_bits: int | None = DEFAULT_BLOOM_BITS,
) -> DataFrame:
    """Streaming DataFrame → streaming DataFrame with per-key first-seen
    dedup on ``id_col``. Output columns: key, id, payload_cols.

    Dedup is exact while a key has seen <= ``exact_below`` ids (full id
    strings in state); beyond that the key migrates to a constant-size
    Bloom bitmap with the false-drop contract in the module docstring.
    ``bloom_bits=None`` disables migration (exact forever, unbounded hot
    keys)."""
    out_schema = ", ".join(
        [f"{key_col} string", f"{id_col} string"]
        + [f"{c} string" for c in payload_cols]
    )
    state_schema = "ids array<string>, bloom binary"
    cols = [key_col, id_col, *payload_cols]

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if state.hasTimedOut:
            state.remove()
            return
        ids: set[str] | None = None
        bloom: np.ndarray | None = None
        if state.exists:
            stored_ids, stored_bloom = state.get
            if stored_bloom is not None:
                bloom = np.frombuffer(bytearray(stored_bloom), dtype=np.uint8).copy()
            else:
                ids = set(stored_ids or [])
        for pdf in pdfs:
            fresh, ids, bloom = _dedup_step(
                ids, bloom, pdf[id_col].astype(str), exact_below, bloom_bits
            )
            out = pdf.loc[fresh, cols]
            if len(out):
                yield out
        if bloom is not None:
            state.update((None, bloom.tobytes()))
        else:
            state.update((sorted(ids or set()), None))

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
