"""Custom stateful streaming operators via ``applyInPandasWithState``.

Spark's built-in stateful operators (windowed aggs, ``dropDuplicates``,
session windows) cover commutative aggregations. Anything whose update
is a *sequential fold over event time* — where reordering inputs changes
the answer — needs user-managed state. This module holds those: the
state schema, timeout handling, and Arrow-batched group processing are
the Spark-side plumbing; the per-key fold is plain pandas/python over
one key's micro-batch slice (never row-at-a-time over the whole
stream).

At scale, state lives in the state store, hash-partitioned by key —
size is O(active keys) × a few scalars here, and ``timeout`` evicts
idle keys so the store cannot grow without bound.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stateful_ewma", "ewma_batch", "ewma_batch_reference", "stateful_funnel"]


def _lam(half_life_s: float) -> float:
    return math.log(2.0) / half_life_s


def stateful_ewma(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    half_life_s: float = 600.0,
    timeout_ms: Optional[int] = None,
) -> DataFrame:
    """Per-key time-decayed EWMA, maintained across micro-batches.

    ``s ← v + s·exp(−λ·Δt)`` with λ = ln2/``half_life_s`` — each new
    event adds its value to the key's score, and the score halves every
    ``half_life_s`` seconds of event-time gap. The irregular-gap decay
    makes the fold **order-sensitive**: no built-in streaming aggregate
    (all commutative/associative) can express it, which is exactly the
    ``applyInPandasWithState`` use case.

    Emits one row per key per micro-batch it appears in (update-mode
    shape): ``(key, ewma, n_events, last_ts)`` — the state after folding
    that batch. Rows *within* a batch are folded in event-time order;
    correctness across batches assumes per-key event-time-ordered
    arrival (replay in order, or accept the documented approximation —
    the standard contract for sequential stateful ops).

    ``timeout_ms`` > 0 evicts a key's state after that much processing
    time without new events (the eviction row is not emitted — the
    score simply restarts at 0 contribution).
    """

    def fold(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        lam = _lam(half_life_s)
        if state.exists:
            s, last_us, n = state.get
        else:
            s, last_us, n = 0.0, None, 0

        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(ts, kind="mergesort")  # stable within ties
        for t, v in zip(batch[ts], batch[value]):
            t_us = int(t.value // 1000)  # pandas ns → µs
            if last_us is not None:
                dt_s = max((t_us - last_us) / 1e6, 0.0)
                s = float(v) + s * math.exp(-lam * dt_s)
            else:
                s = float(v)
            last_us = t_us
            n += 1

        state.update((s, last_us, n))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "ewma": [s],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    key_type = dict(df.dtypes)[key]
    out_schema = f"{key} {key_type}, ewma double, n_events long, last_ts timestamp"
    state_schema = "ewma double, last_us long, n long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.select(key, ts, value)
        .groupBy(key)
        .applyInPandasWithState(fold, out_schema, state_schema, "update", timeout)
    )


def ewma_batch(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    half_life_s: float = 600.0,
) -> DataFrame:
    """Batch closed form of :func:`stateful_ewma`'s final per-key state.

    The sequential fold ``s ← v + s·exp(−λ·Δt)`` telescopes to
    ``s_final = Σᵢ vᵢ·exp(−λ·(t_last − tᵢ))`` — every event's value
    decayed by its age at the last event. The closed form is
    order-insensitive (ties contribute ``exp(0)=1`` regardless of fold
    order), so it is expressible as native aggregation — no state
    store, no Python: one window to attach ``t_last`` per key, then a
    map-side-combinable groupBy that reuses the window's hash
    partitioning (single shuffle total). Mathematically identical to
    replaying the stream in event-time order; floating-point summation
    order may differ in low bits (tests bound it at 1e-9 relative).

    Returns ``(key, ewma, n_events, last_us)`` — the same state
    ``stateful_ewma`` would emit after its final micro-batch, with
    ``last_ts`` as epoch microseconds for engine-portable comparison.
    """
    lam = _lam(half_life_s)
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(key)
    staged = df.select(F.col(key), t_us.alias("_t_us"), F.col(value).alias("_v"))
    staged = staged.withColumn("_last_us", F.max("_t_us").over(w))
    decayed = F.col("_v") * F.exp(
        F.lit(-lam) * (F.col("_last_us") - F.col("_t_us")) / F.lit(1e6)
    )
    return staged.groupBy(key).agg(
        F.sum(decayed).alias("ewma"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("_t_us").alias("last_us"),
    )


def ewma_batch_reference(
    rows: list[tuple],
    half_life_s: float = 600.0,
) -> float:
    """Driver-side reference fold for tests: ``rows`` = [(ts, value)]
    sorted by ts; returns the final EWMA. Same arithmetic as the
    streaming fold, no Spark."""
    lam = _lam(half_life_s)
    s, last = 0.0, None
    for t, v in rows:
        if last is not None:
            s = float(v) + s * math.exp(-lam * (t - last).total_seconds())
        else:
            s = float(v)
        last = t
    return s


def stateful_funnel(
    df: DataFrame,
    steps,
    key: str = "user_id",
    ts: str = "ts_ms",
    type_col: str = "event_type",
    timeout_ms: Optional[int] = None,
) -> DataFrame:
    """Per-key funnel progression maintained across micro-batches — the
    streaming counterpart of ``operators/funnel.py::funnel_steps``.

    State per key is the vector of chained-minimum step timestamps
    (step k = first event of its type at or after step k−1's time);
    each micro-batch folds its slice in (ts, step-position) order —
    exactly the batch operator's sort — so with per-key time-ordered
    arrival (replay in order: the standard sequential-stateful
    contract, same as ``stateful_ewma``; ties must not straddle a
    batch boundary) the final state equals the batch
    ``funnel_steps`` over the full history. The chained-min greedy is
    prefix-incremental, which is what makes the cross-batch fold sound:
    folding P then Q (all Q times ≥ all P times) equals folding P∪Q.

    Emits one row per key per micro-batch it appears in (update-mode
    shape): ``(key, step_reached, step_1_ms … step_m_ms, n_events)``
    — the state after that batch; ``n_events`` counts folded events so
    downstream can pick each key's latest row. Keys that have not yet
    performed step 1 still emit (step_reached = 0): a live funnel
    dashboard wants the denominator too — filter ``step_reached >= 1``
    for batch-parity.

    State size: m longs per active key; ``timeout_ms`` evicts idle
    keys (their funnel restarts — the eviction row is not emitted).
    """
    step_list = [str(s) for s in steps]
    m = len(step_list)
    if m == 0:
        raise ValueError("steps must be non-empty")
    positions: dict = {}
    for i, s in enumerate(step_list):
        positions.setdefault(s, []).append(i)

    def fold(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            got = state.get
            t = list(got[0])
            mask = got[1]  # bit k set = step k reached (a timestamp of
            # -1/any long stays a VALID value — no in-band sentinel,
            # preserving exact batch parity on the full long range)
            n = got[2]
        else:
            t, mask, n = [0] * m, 0, 0

        batch = pd.concat(list(pdfs))
        pairs = []
        for tv, ty in zip(batch[ts], batch[type_col]):
            for pos in positions.get(ty, ()):
                pairs.append((int(tv), pos))
        n += len(batch)
        # the batch operator's exact order: (ts, step position)
        for tv, k in sorted(pairs):
            unset = not (mask >> k) & 1
            prev_ok = k == 0 or (
                (mask >> (k - 1)) & 1 and tv >= t[k - 1]
            )
            if unset and prev_ok:
                t[k] = tv
                mask |= 1 << k

        state.update((t, mask, n))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        row = {key: [key_tuple[0]]}
        reached = 0
        for k in range(m):
            hit = (mask >> k) & 1
            row[f"step_{k + 1}_ms"] = [t[k] if hit else None]
            reached += hit
        row["step_reached"] = [reached]
        row["n_events"] = [n]
        yield pd.DataFrame(row)

    key_type = dict(df.dtypes)[key]
    step_cols = ", ".join(f"step_{k + 1}_ms long" for k in range(m))
    out_schema = (
        f"{key} {key_type}, {step_cols}, step_reached int, n_events long"
    )
    state_schema = "t array<long>, mask long, n long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.select(key, ts, type_col)
        .where(F.col(type_col).isin(step_list) & F.col(ts).isNotNull())
        .groupBy(key)
        .applyInPandasWithState(fold, out_schema, state_schema, "update", timeout)
    )
